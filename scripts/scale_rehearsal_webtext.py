"""sf1 scale rehearsal for the webtext analytics family (round-6
extension of scripts/scale_rehearsal.py, which covers dedup/CC, and
scale_rehearsal_ts.py, which covers the timeseries windows).

Synthesizes a deterministic 10x documents table from sf0.1 (copy k
shifts doc_id by k*N; odd copies get one appended token so the corpus
keeps both exact-dup and near-dup structure; source/lang/n_chars ride
along unchanged) and times the corpus-curation operators at both
scales. These are explode->hash-agg ladders, so the evidence sought is
linear-ish wall growth — the gram shuffle is the dominant term and it
grows with token mass, never quadratically.

Usage: python scripts/scale_rehearsal_webtext.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    from sprintz_spark import queries as Q
    from sprintz_spark.session import get_spark

    spark = get_spark(app="webtext-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    base_dir = "/root/testdata/sf0.1"
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    # shift by the id SPAN, not the row count — a sparse doc_id space
    # would otherwise collide ids across copies and merge unrelated docs
    # in the dedup structure this rehearsal measures
    n = docs.agg(F.max("doc_id")).first()[0] + 1

    big_dir = "/tmp/webtext_rehearsal_sf1"
    if not os.path.exists(f"{big_dir}/documents.parquet/_SUCCESS"):
        copies = spark.range(10).select(F.col("id").alias("k"))
        big = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("k") * n).alias("doc_id"),
            F.when(
                F.col("k") % 2 == 1,
                F.concat(
                    F.col("text"), F.lit(" variant"), F.col("k").cast("string")
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        big.repartition(64).write.mode("overwrite").parquet(
            f"{big_dir}/documents.parquet"
        )

    names = [
        "gopher_repetition",
        "vocab_stats",
        "curation_funnel",
        "quality_stats",
        "top_ngrams",
        "winnow_fingerprints",
        # round-7 additions: the TF-ISF ladder and the capped
        # inverted-index containment join (the df<=100 cap is the thing
        # under test at 10x: exact-dup copies multiply shingle df ~6x,
        # so boilerplate-like shingles start hitting the cap — recall
        # falls back to the rarer shingles, wall stays join-bounded)
        "distinctive_terms",
        "containment_dups",
    ]
    out = {}
    qs = Q.queries()

    def _time_pair(name: str) -> None:
        t0 = time.perf_counter()
        n_small = qs[name](spark, base_dir).count()
        t_small = time.perf_counter() - t0
        Q.release_query_caches()
        Q.release_shared_stages()
        t0 = time.perf_counter()
        n_big = qs[name](spark, big_dir).count()
        t_big = time.perf_counter() - t0
        Q.release_query_caches()
        Q.release_shared_stages()
        out[name] = {
            "rows_1x": n_small,
            "rows_10x": n_big,
            "secs_1x": round(t_small, 1),
            "secs_10x": round(t_big, 1),
            "wall_growth": round(t_big / t_small, 1),
        }

    for name in names:
        _time_pair(name)
    # --- embeddings at 10x: PQ encode+ADC search (round-7) -------------
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    ne = emb.agg(F.max("vec_id")).first()[0] + 1
    if not os.path.exists(f"{big_dir}/embeddings.parquet/_SUCCESS"):
        copies = spark.range(10).select(F.col("id").alias("k"))
        bige = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("k") * ne).alias("vec_id"), "embedding"
        )
        bige.repartition(16).write.mode("overwrite").parquet(
            f"{big_dir}/embeddings.parquet"
        )
    for name in ("pq_topk", "ivf_topk"):
        _time_pair(name)

    # --- 10x KEYS variant (round-8, verdict item 7): the copy corpus
    # above multiplies every shingle's df ~6x (sum(df^2) rises much
    # faster than token mass — the cap stress test). The open question
    # for the inverted-index family is the OTHER axis: 10x DISTINCT
    # keys at unchanged per-key df, i.e. a genuinely larger vocabulary,
    # which is what a larger real corpus mostly does. Prefixing every
    # word with its copy id makes all shingles distinct across copies:
    # 10x shingle/bigram keys, per-key df identical to 1x, so candidate
    # volume sum(df^2) grows linearly and wall should stay ~linear
    # (<= ~2x on underfilled cores).
    keys_dir = "/tmp/webtext_rehearsal_keys10x"
    if not os.path.exists(f"{keys_dir}/documents.parquet/_SUCCESS"):
        copies = spark.range(10).select(F.col("id").alias("k"))
        bigk = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("k") * n).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("c"), F.col("k").cast("string"), F.lit("$1")),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        bigk.repartition(64).write.mode("overwrite").parquet(
            f"{keys_dir}/documents.parquet"
        )
    for name in ("distinctive_terms", "containment_dups"):
        t0 = time.perf_counter()
        n_small = qs[name](spark, base_dir).count()
        t_small = time.perf_counter() - t0
        Q.release_query_caches()
        Q.release_shared_stages()
        t0 = time.perf_counter()
        n_big = qs[name](spark, keys_dir).count()
        t_big = time.perf_counter() - t0
        Q.release_query_caches()
        Q.release_shared_stages()
        out[f"{name}_keys10x"] = {
            "rows_1x": n_small,
            "rows_10x_keys": n_big,
            "secs_1x": round(t_small, 1),
            "secs_10x_keys": round(t_big, 1),
            "wall_growth": round(t_big / t_small, 1),
        }

    # --- 10x events: URL surface + cadence + packing (round-8 ext) -----
    # user_id shifts by k*U so the series count (revisit_intervals'
    # parallelism axis) grows 10x; hosts stay dim-scale (user_id % 17 —
    # the hot-host map-side-combine axis gets 10x rows per key).
    # pack_shards rehearses on the 10x documents copy: the prefix sum's
    # driver collect is bounded by max_buckets (4096) at ANY scale —
    # the evidence sought is linear wall with a constant-size collect.
    ev = spark.read.parquet(f"{base_dir}/events.parquet")
    nu = ev.agg(F.max("user_id")).first()[0] + 1
    nev = ev.agg(F.max("event_id")).first()[0] + 1
    if not os.path.exists(f"{big_dir}/events.parquet/_SUCCESS"):
        copies = spark.range(10).select(F.col("id").alias("k"))
        bigev = ev.crossJoin(copies).select(
            (F.col("event_id") + F.col("k") * nev).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("k") * nu).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        bigev.repartition(32).write.mode("overwrite").parquet(
            f"{big_dir}/events.parquet"
        )
    for name in ("host_stats", "url_normalize", "revisit_intervals",
                 "pack_shards"):
        _time_pair(name)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
