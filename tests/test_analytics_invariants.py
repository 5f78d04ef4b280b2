"""Structural invariants for the round-6 analytics family
(time_weighted_avg, ohlc_1h, state_agg, gopher_repetition, vocab_stats)
that the DuckDB oracle equality cannot express — internal-consistency
identities that must hold for ANY input, checked on the sf0.001 tables.
The oracle gate (scripts/strict_parity.py, test_oracle_parity) remains
the cross-engine value check; these pin the operator semantics.
"""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    from sprintz_spark import queries as Q

    return Q.queries()[name]


def test_time_weighted_bucket_coverage(spark):
    # covered_us == the span from the first observation to bucket end,
    # and equals the sum of the per-step weights (the step function
    # tiles the covered span exactly, no overlap, no hole).
    out = _q("time_weighted_avg")(spark, SF)
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("bucket"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.min("us").alias("first_us"), F.count(F.lit(1)).alias("n"))
    )
    j = out.join(ev, ["user_id", "bucket"])
    end_us = F.unix_micros(F.col("bucket").cast("timestamp")) + F.lit(3_600_000_000)
    bad = j.where(
        (F.col("covered_us") != end_us - F.col("first_us"))
        | (F.col("n_obs") != F.col("n"))
        | (F.col("covered_us") <= 0)
        | (F.col("covered_us") > 3_600_000_000)
    )
    assert bad.count() == 0


def test_time_weighted_constant_series_identity(spark):
    # For a constant-valued series the time-weighted mean IS the value:
    # weighted_cents_us == cents * covered_us for single-value buckets.
    out = _q("time_weighted_avg")(spark, SF).where(F.col("n_obs") == 1)
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id",
        F.date_trunc("hour", "ts").alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    j = out.join(ev, ["user_id", "bucket"])
    bad = j.where(
        F.col("weighted_cents_us") != F.col("cents") * F.col("covered_us")
    )
    assert bad.count() == 0


def test_ohlc_bounds_and_degenerate_buckets(spark):
    out = _q("ohlc_1h")(spark, SF)
    assert (
        out.where(
            (F.col("high_cents") < F.col("low_cents"))
            | (F.col("open_cents") > F.col("high_cents"))
            | (F.col("open_cents") < F.col("low_cents"))
            | (F.col("close_cents") > F.col("high_cents"))
            | (F.col("close_cents") < F.col("low_cents"))
        ).count()
        == 0
    )
    # single-observation buckets: all four prices coincide
    one = out.where(F.col("n_obs") == 1)
    assert one.count() > 0
    assert (
        one.where(
            (F.col("open_cents") != F.col("close_cents"))
            | (F.col("open_cents") != F.col("high_cents"))
            | (F.col("open_cents") != F.col("low_cents"))
        ).count()
        == 0
    )


def test_ohlc_open_close_are_boundary_values(spark):
    # open/close equal the cents at the min/max (us, event_id) rows —
    # re-derived independently with a window rank instead of struct agg.
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id",
        F.date_trunc("hour", "ts").alias("bucket"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id", "bucket").orderBy("us", "event_id")
    first_last = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "rn_desc",
            F.row_number().over(
                Window.partitionBy("user_id", "bucket").orderBy(
                    F.desc("us"), F.desc("event_id")
                )
            ),
        )
        .groupBy("user_id", "bucket")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias("first_cents"),
            F.max(F.when(F.col("rn_desc") == 1, F.col("cents"))).alias("last_cents"),
        )
    )
    j = _q("ohlc_1h")(spark, SF).join(first_last, ["user_id", "bucket"])
    bad = j.where(
        (F.col("open_cents") != F.col("first_cents"))
        | (F.col("close_cents") != F.col("last_cents"))
    )
    assert bad.count() == 0


def test_state_agg_conserves_total_span(spark):
    # Dwell time is conserved: sum over states of in_state_us equals the
    # sum over users of (last_us - first_us) — the step function tiles
    # each user's active span exactly.
    out = _q("state_agg")(spark, SF)
    total_dwell = out.agg(F.sum("in_state_us")).first()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    spans = (
        ev.groupBy("user_id")
        .agg((F.max("us") - F.min("us")).alias("span"))
        .agg(F.sum("span"))
        .first()[0]
    )
    assert total_dwell == spans
    # entries conserved too: one per event
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert out.agg(F.sum("n_entries")).first()[0] == n_events


def test_gopher_flag_monotonicity(spark):
    # A doc that is ONE repeated word must trip all three flags; a
    # synthetic corpus with known composition pins the thresholds.
    rows = [
        (1, "s", "spam " * 50),          # one word 100% -> all flags
        (2, "s", " ".join(f"w{i}" for i in range(100))),  # all-distinct -> none
        (3, "s", ("a b c d e f g h i j " * 10)),  # every 5-gram repeats -> dup5
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    import tempfile

    d = tempfile.mkdtemp(prefix="gopher_probe_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = _q("gopher_repetition")(spark, d).first()
    assert out["n_docs"] == 3
    assert out["n_word_rep"] >= 1  # doc 1
    assert out["n_dup5"] >= 2      # docs 1 and 3
    # all-distinct doc contributes zero repeat mass of its own words
    assert out["words_total"] == 50 + 100 + 100


def test_vocab_stats_token_conservation(spark):
    # Unigram tokens across sources == total whitespace tokens in the
    # corpus; vocab <= tokens; hapax+dis <= vocab; simpson_num parity
    # (c*(c-1) is always even).
    out = _q("vocab_stats")(spark, SF)
    uni = out.where(F.col("kind") == "w")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.select(
        F.size(
            F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
        ).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert uni.agg(F.sum("tokens")).first()[0] == total
    bad = out.where(
        (F.col("vocab") > F.col("tokens"))
        | (F.col("hapax") + F.col("dis_legomena") > F.col("vocab"))
        | (F.col("max_cnt") > F.col("tokens"))
        | (F.col("simpson_num") % 2 != 0)
        | (F.col("simpson_num") < 0)
    )
    assert bad.count() == 0
