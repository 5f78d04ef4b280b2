"""sf1 scale rehearsal for the timeseries operator family (round-5
extension of scripts/scale_rehearsal.py, which covers dedup/CC).

Synthesizes a deterministic 10x events table from sf0.1 (copy k shifts
user_id by k*U; timestamps unchanged, so per-user series shape — the
thing the window operators cost on — is preserved) and times the core
window/join operators at both scales. Linear-ish wall growth with 10x
keys is the evidence the per-key window shapes (partitioned, never
SinglePartition) hold; results recorded in BASELINE.md.

Usage: python scripts/scale_rehearsal_ts.py
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

    spark = get_spark(app="ts-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    base_dir = "/root/testdata/sf0.1"
    ev = spark.read.parquet(f"{base_dir}/events.parquet")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1

    big_dir = "/tmp/ts_rehearsal_sf1"
    if not os.path.exists(f"{big_dir}/events.parquet/_SUCCESS"):
        copies = spark.range(10).select(F.col("id").alias("k"))
        big = ev.crossJoin(copies).select(
            (F.col("user_id") + F.col("k") * n_users).alias("user_id"),
            *[c for c in ev.columns if c != "user_id"],
        )
        big.repartition(64).write.mode("overwrite").parquet(
            f"{big_dir}/events.parquet"
        )

    names = [
        "gapfill_locf_1h",
        "gapfill_linear_1h",
        "sessionize",
        "asof_join",
        "m4_downsample",
        "counter_rate",
        "zscore_anomalies",
        "interval_coverage",
        "gap_report",
        "topk_heavy_users",
        # round-6 analytics family (events-only, so the synthesized
        # 10x table covers them)
        "time_weighted_avg",
        "ohlc_1h",
        "state_agg",
        "cohort_retention",
        "funnel_conversion",
    ]
    out = {}
    qs = Q.queries()
    for name in names:
        t0 = time.perf_counter()
        n_small = qs[name](spark, base_dir).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_big = qs[name](spark, big_dir).count()
        t_big = time.perf_counter() - t0
        out[name] = {
            "rows_1x": n_small,
            "rows_10x": n_big,
            "secs_1x": round(t_small, 1),
            "secs_10x": round(t_big, 1),
            "wall_growth": round(t_big / t_small, 1),
        }

    # --- hot-key skew leg (round-7 verdict item 8): the join-heavy
    # analytics pair at 10x rows where ONE user owns ~30% of all events.
    # cohort_retention joins per-user firsts back onto (user, day) pairs
    # and funnel_conversion chains three per-user min-aggs+joins — the
    # shapes where a hot build/probe key would serialize a task. The
    # rehearsal proves the aggregates stay map-side-combined (a hot
    # user's distinct (user, day) set collapses to <=#days rows before
    # the shuffle) and AQE splits anything left, so skew costs ~nothing
    # beyond the extra rows themselves.
    skew_dir = "/tmp/ts_rehearsal_sf1_skew"
    if not os.path.exists(f"{skew_dir}/events.parquet/_SUCCESS"):
        big = spark.read.parquet(f"{big_dir}/events.parquet")
        # reassign copies k in {1,2,3} of user 0..n_users to user 0:
        # user 0 now holds ~30% of all rows, everyone else unchanged
        skewed = big.withColumn(
            "user_id",
            F.when(
                (F.col("user_id") >= n_users) & (F.col("user_id") < 4 * n_users),
                F.lit(0).cast("long"),
            ).otherwise(F.col("user_id")),
        )
        skewed.repartition(64).write.mode("overwrite").parquet(
            f"{skew_dir}/events.parquet"
        )
    # interleaved best-of-2 on BOTH legs: a single-trial ratio in this
    # sandbox (+/-50% wall noise between minutes, BASELINE.md) can flip
    # sign on rerun — same discipline bench_scaling enforces
    for name in ("cohort_retention", "funnel_conversion"):
        t_uni = t_skew = float("inf")
        n_skew = None
        for _trial in range(2):
            t0 = time.perf_counter()
            qs[name](spark, big_dir).count()
            t_uni = min(t_uni, time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_skew = qs[name](spark, skew_dir).count()
            t_skew = min(t_skew, time.perf_counter() - t0)
        out[f"{name}_skew30pct"] = {
            "rows_10x_skew": n_skew,
            "secs_10x_uniform_best2": round(t_uni, 1),
            "secs_10x_skew_best2": round(t_skew, 1),
            "vs_uniform_10x": round(t_skew / t_uni, 2),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
