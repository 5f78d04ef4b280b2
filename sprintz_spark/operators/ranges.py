"""Range (interval-containment) join, binned for scale.

A naive ``l.ts BETWEEN r.lo AND r.hi`` join has no equi-key, so Spark
plans BroadcastNestedLoopJoin — quadratic and driver-bounded at scale.
The standard fix (the manual form of Databricks' range-join binning) is
to quantize time into coarse bins: the point side computes one bin, the
interval side explodes into every bin its span touches, both sides
equi-join on the bin (a plain hash shuffle join), and the exact
containment predicate filters the candidates. Each point matches an
interval in exactly one bin (the point's own), so no dedup is needed.

Bin width trades shuffle fan-out (intervals duplicate into span/bin + 1
bins) against candidate-filter selectivity; one bin ~ the typical
interval span is a good default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = 86400,
    key: str | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row containing its
    timestamp (``lo <= ts <= hi``, closed on both ends), optionally also
    matching on an equality ``key``. Output columns: all point columns
    then all interval columns (names must not collide except ``key``)."""
    bin_us = int(bin_seconds) * 1_000_000
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    p = points.withColumn("_bin", F.floor(us(ts_col) / bin_us)).alias("p")
    iv = (
        intervals.withColumn(
            "_bin", F.explode(F.sequence(F.floor(us(lo_col) / bin_us), F.floor(us(hi_col) / bin_us)))
        )
    ).alias("i")
    cond = F.col("p._bin") == F.col("i._bin")
    if key is not None:
        cond = cond & (F.col(f"p.{key}") == F.col(f"i.{key}"))
    joined = p.join(iv, cond).where(
        (F.col(f"p.{ts_col}") >= F.col(f"i.{lo_col}"))
        & (F.col(f"p.{ts_col}") <= F.col(f"i.{hi_col}"))
    )
    out_cols = [F.col(f"p.{c}") for c in points.columns]
    out_cols += [
        F.col(f"i.{c}") for c in intervals.columns if key is None or c != key
    ]
    return joined.select(*out_cols)
