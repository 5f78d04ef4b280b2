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


def lttb_downsample(
    series: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    n_out: int = 50,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    public MSc thesis / flot-downsample): per series keep ``n_out``
    points — endpoints always, and from each of the n_out-2 interior
    equal-count buckets the point forming the largest triangle with the
    previously SELECTED point and the next bucket's centroid. The
    shape-preserving line-chart downsampler (vs M4's pixel-exact one).

    The selection is inherently sequential per series (each choice feeds
    the next triangle), so the per-series scan runs in an applyInPandas
    stage — one shuffle on the series key, numpy inside, one udf call
    per series (grouped semantics). Output: key cols + (x, y) of
    selected points — EXACT input values with the INPUT column types
    (selection indexes the original arrays; x/y are never cast).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    keys = list(key_cols)
    in_fields = [series.schema[k] for k in keys]
    schema = StructType(
        in_fields
        + [
            StructField("x", series.schema[x_col].dataType),
            StructField("y", series.schema[y_col].dataType),
        ]
    )

    def pick(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
        n = len(x)
        if n <= n_out:
            return np.arange(n)
        # interior bucket boundaries: n_out-2 equal-count slices of [1, n-1)
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        sel = np.empty(n_out, dtype=np.int64)
        sel[0] = 0
        a = 0  # previously selected index
        xf = x.astype(np.float64)
        yf = y.astype(np.float64)
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
            cx, cy = xf[nlo:nhi].mean(), yf[nlo:nhi].mean()
            # 2x triangle area for every candidate in this bucket
            area = np.abs(
                (xf[a] - cx) * (yf[lo:hi] - yf[a])
                - (xf[a] - xf[lo:hi]) * (cy - yf[a])
            )
            a = lo + int(np.argmax(area))  # first max: deterministic
            sel[b + 1] = a
        sel[-1] = n - 1
        return sel

    def udf(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas calls once per group: key columns are constant
        if not len(pdf):
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        pdf = pdf.sort_values(x_col, kind="mergesort").reset_index(drop=True)
        x = pdf[x_col].to_numpy()
        y = pdf[y_col].to_numpy()
        idx = pick(x, y)
        frame = {k: pdf[k].iloc[0] for k in keys}
        frame["x"] = x[idx]
        frame["y"] = y[idx]
        return pd.DataFrame(frame)[[f.name for f in schema.fields]]

    return series.select(*keys, x_col, y_col).groupBy(*keys).applyInPandas(udf, schema)
