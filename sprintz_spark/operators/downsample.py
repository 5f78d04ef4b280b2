"""Visualization downsampling + counter semantics + rolling anomaly flags.

Timeseries-engine surface the reference's users expect around the codec
core (all public algorithms, all expressed as built-in Spark windows and
aggregations — no Python in any of these paths):

  * ``m4_downsample`` — the M4 aggregation (Jugel et al., VLDB'14): per
    (series, pixel-bucket) keep min, max, first, last. The standard
    error-free line-chart downsampler: a width-w chart drawn from M4
    tuples is pixel-identical to one drawn from the raw series. One
    hash aggregation; first/last via min_by/max_by on a caller-supplied
    total order.
  * ``counter_increase`` — PromQL-style counter rate semantics: per
    series, the non-negative increase between consecutive samples with
    COUNTER RESET handling (a drop means the counter restarted, so the
    post-reset value IS the increase), summed per time bucket. One
    window (lag) + one aggregation.
  * ``rolling_zscore_flags`` — anomaly flags from a trailing-window
    z-score, computed in EXACT INTEGER arithmetic so the flag is
    bit-reproducible across engines: |x - mean| > z*std over the
    previous ``window`` samples is equivalent to
    (n*x - s)^2 > z^2 * (n*ss - s^2)   [multiply through by n^2]
    with s = trailing sum, ss = trailing sum of squares — all BIGINT
    for cent-scale integers, no float rounding anywhere.

Scale notes: all three are single-shuffle shapes (hash partition by
series key); windows are per-key sorted ranges, M4 is an algebraic
aggregation with map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def m4_downsample(
    series: DataFrame,
    key_cols: list[str],
    bucket: Column,
    val_col: str,
    order: Column,
) -> DataFrame:
    """Per (key, bucket): (v_min, v_max, v_first, v_last, n) where
    first/last are taken along ``order`` (must be a total order within
    the series — pass a composite key when timestamps can tie)."""
    return (
        series.select(*key_cols, bucket.alias("bucket"), val_col, order.alias("_ord"))
        .groupBy(*key_cols, "bucket")
        .agg(
            F.min(val_col).alias("v_min"),
            F.max(val_col).alias("v_max"),
            F.min_by(val_col, "_ord").alias("v_first"),
            F.max_by(val_col, "_ord").alias("v_last"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def counter_increase(
    series: DataFrame,
    key_cols: list[str],
    bucket: Column,
    val_col: str,
    order: Column,
) -> DataFrame:
    """PromQL ``increase()`` semantics per (key, bucket): sum of
    max(x - prev, x if x < prev) over consecutive samples; the first
    sample of a series contributes nothing (no prev to diff against)."""
    w = Window.partitionBy(*key_cols).orderBy("_ord")
    prev = F.lag(val_col).over(w)
    inc = F.when(prev.isNull(), F.lit(0)).when(
        F.col(val_col) >= prev, F.col(val_col) - prev
    ).otherwise(F.col(val_col))
    return (
        series.select(*key_cols, bucket.alias("bucket"), val_col, order.alias("_ord"))
        .withColumn("_inc", inc)
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("_inc").alias("increase"), F.count(F.lit(1)).alias("n"))
    )


def rolling_zscore_flags(
    series: DataFrame,
    key_cols: list[str],
    val_col: str,
    order: Column,
    window: int = 20,
    min_points: int = 10,
    z: int = 3,
) -> DataFrame:
    """Per row: is |x - trailing_mean| > z * trailing_std, decided in
    exact integer arithmetic (``val_col`` must be integral, e.g. cents).
    Returns the input keys + bucketless per-row flags aggregated per key
    as (n_points, n_flagged)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ord")
        .rowsBetween(-window, -1)
    )
    x = F.col(val_col)
    n = F.count(val_col).over(w)
    s = F.sum(val_col).over(w)
    ss = F.sum(x * x).over(w)
    lhs = (n * x - s) * (n * x - s)
    rhs = F.lit(z * z) * (n * ss - s * s)
    flag = (n >= min_points) & (lhs > rhs)
    return (
        series.select(*key_cols, val_col, order.alias("_ord"))
        .withColumn("_flag", flag.cast("long"))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("_flag").alias("n_flagged"),
        )
    )
