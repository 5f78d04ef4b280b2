"""10x scale rehearsal for the retention LIFECYCLE (ingest -> TTL expiry
-> compaction -> decoded read-back) — the north-star's core machinery.

The window/join/dedup families all have rehearsals (scale_rehearsal*.py);
this covers the remaining one: does the tier-store lifecycle — and in
particular its MANIFEST/metadata handling, just consolidated to
single-pass in expiry and compaction — stay linear when the store holds
10x the rows and 10x the chunks?

Corpus: the oracle-gated lifecycle recipe (queries._staged_lifecycle_store)
scaled on the 10x-KEYS axis — mult disjoint url sets carrying the 1x
timestamps (see build_pages). Per-series length is CONSTANT across
scales (~8.9k 1m-bucket rows/url over the Jan month), chunk_rows is
FIXED, so 10x input means 10x series and 10x encoded chunks: the axes
the manifest passes, expiry's chunk-metadata filter, and compaction's
merge planning actually cost on. Stages timed separately:

  ingest   run_retention x2 snapshots (split at a day boundary),
           per-series chunk format, tiers 1m/1h/1d, fixed chunk_rows
  expire   TTL-drop of s1's 1m chunks before the mid-month cutoff
           (chunk-granular staged-swap rewrite + manifest reconcile)
  compact  merge both snapshots newest-wins into one re-chunked
           container snapshot (single union metadata pass)
  read     read_tier_decoded('1h') full decode + count

Usage: python scripts/scale_rehearsal_lifecycle.py   (~5 min, idle box)
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SPLIT = dt.datetime(2024, 1, 16)
CUTOFF = dt.datetime(2024, 1, 15)
CHUNK_ROWS = 500  # fixed across scales: 10x series rows => 10x chunks


def build_pages(spark, mult: int):
    """mult copies of the 1x corpus on DISJOINT url sets: copy k maps to
    urls u{10k}..u{10k+9} with the 1x timestamps — 10x input = 10x series
    of identical shape (the 10x-keys axis), so series rows, chunk count,
    and manifest size all scale 10x while per-series length stays fixed."""
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    copies = spark.range(mult).select(F.col("id").alias("k"))
    return ev.crossJoin(copies).select(
        F.concat(
            F.lit("https://u"),
            (F.col("user_id") % 10) + F.col("k") * 10,
            F.lit(".example/"),
        ).alias("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.expr(
            "cast(repeat('x', cast(abs(cast(round(value*100, 0) as bigint)) % 997"
            " as int)) as binary)"
        ).alias("html"),
    )


def run_scale(spark, mult: int) -> dict:
    from sprintz_spark.plans import retention as RT

    pages = build_pages(spark, mult)
    out = tempfile.mkdtemp(prefix=f"lifecycle_rehearsal_{mult}x_")
    res: dict = {"mult": mult}
    t0 = time.perf_counter()
    RT.run_retention(
        pages.where(F.col("warc_ts") < F.lit(SPLIT)), out, snapshot_id="s1",
        n_buckets=8, chunk_rows=CHUNK_ROWS, container_tiers=(),
    )
    RT.run_retention(
        pages.where(F.col("warc_ts") >= F.lit(SPLIT)), out, snapshot_id="s2",
        n_buckets=8, chunk_rows=CHUNK_ROWS, container_tiers=(),
    )
    res["ingest_secs"] = round(time.perf_counter() - t0, 2)
    man = RT.read_manifest(spark, out)
    res["rows"] = int(
        man.where(F.col("tier") == "1m").agg(F.sum("n_rows")).first()[0]
    )
    res["chunks_pre"] = int(man.agg(F.sum("n_chunks")).first()[0])
    res["ingest_rows_per_sec"] = round(res["rows"] / res["ingest_secs"], 1)

    t0 = time.perf_counter()
    rep = RT.expire_tier(spark, out, "s1", "1m", older_than=CUTOFF)
    res["expire_secs"] = round(time.perf_counter() - t0, 2)
    res["expired_chunks"] = int(rep.get("chunks_dropped", 0))

    t0 = time.perf_counter()
    RT.compact_tiers(
        spark, out, ["s1", "s2"], "c1", n_buckets=8, chunk_rows=CHUNK_ROWS
    )
    res["compact_secs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    res["read_1h_rows"] = RT.read_tier_decoded(spark, out, "c1", "1h").count()
    res["read_secs"] = round(time.perf_counter() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)
    return res


def main() -> int:
    from sprintz_spark.session import get_spark

    spark = get_spark(app="lifecycle-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python worker pool so the 1x legs don't carry ~32 spawns
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    results = [run_scale(spark, 1), run_scale(spark, 10)]
    for r in results:
        print(json.dumps(r))
    a, b = results
    for stage in ("ingest_secs", "expire_secs", "compact_secs", "read_secs"):
        print(f"{stage}: {a[stage]} -> {b[stage]}  growth "
              f"{round(b[stage] / max(a[stage], 1e-9), 2)}x for 10x rows/chunks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
