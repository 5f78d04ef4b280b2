"""Gap-fill over per-key bucketed series: dense time spine + locf / linear.

Semantics (target addition per BASELINE.json north_star; the reference has
no time axis at all — README.md:55 removes timestamps):

  * spine: for each key, every bucket from its min to its max at the tier
    interval (F.sequence + explode — distributed, no driver loop)
  * locf: last observation carried forward (leading gap stays null)
  * linear: interpolate between the previous and next observed points;
    leading/trailing gaps stay null

All window functions partition by key — one shuffle, reused by both fill
columns. Linear interpolation arithmetic is fixed-order (prev + slope *
dt) so results are reproducible bit-for-bit across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVALS = {"1m": "interval 1 minute", "1h": "interval 1 hour", "1d": "interval 1 day"}


def spine(series: DataFrame, tier: str, key: str = "url", bucket: str = "bucket") -> DataFrame:
    """Dense per-key spine: one row per (key, bucket) from min to max."""
    iv = F.expr(_INTERVALS[tier])
    return (
        series.groupBy(key)
        .agg(F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi"))
        .select(key, F.explode(F.sequence("_lo", "_hi", iv)).alias(bucket))
    )


def gapfill(
    series: DataFrame,
    tier: str,
    value_cols: list[str],
    key: str = "url",
    bucket: str = "bucket",
    method: str = "locf",
) -> DataFrame:
    """Return the dense series with each value column gap-filled.

    method: 'locf' | 'linear'. Observed rows keep their exact values
    (for 'linear' too — interpolation only writes null slots).
    """
    sp = spine(series, tier, key, bucket)
    dense = sp.join(series, on=[key, bucket], how="left")
    w_past = (
        Window.partitionBy(key).orderBy(bucket).rowsBetween(Window.unboundedPreceding, 0)
    )
    # "next observation" via a running frame over a DESC sort: Spark
    # evaluates [unboundedPreceding, current] incrementally (O(n)), while a
    # [current, unboundedFollowing] frame with ignorenulls re-scans forward
    # per row — measured 7s vs 0.5s per expression on 100k rows.
    w_future = (
        Window.partitionBy(key)
        .orderBy(F.desc(bucket))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = dense
    if method == "locf":
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w_past))
    elif method == "linear":
        ts = F.col(bucket).cast("double")
        obs_ts = F.when(F.col(value_cols[0]).isNotNull(), ts)
        prev_ts = F.last(obs_ts, ignorenulls=True).over(w_past)
        next_ts = F.last(obs_ts, ignorenulls=True).over(w_future)
        for c in value_cols:
            prev_v = F.last(c, ignorenulls=True).over(w_past)
            next_v = F.last(c, ignorenulls=True).over(w_future)
            interp = prev_v + (next_v - prev_v) * (ts - prev_ts) / (next_ts - prev_ts)
            out = out.withColumn(
                c,
                F.when(F.col(c).isNotNull(), F.col(c).cast("double")).otherwise(
                    F.when(prev_ts.isNotNull() & next_ts.isNotNull(), interp)
                ),
            )
    else:
        raise ValueError(f"unknown gap-fill method {method}")
    return out
