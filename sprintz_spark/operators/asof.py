"""As-of join: for each left row, the most recent right row at or before
its timestamp (per key) — the classic time-series point-in-time join.

Spark-first implementation without a per-row UDF: union both sides tagged
by origin, sort within one window per key, and carry the last-seen right
payload forward (last ignorenulls over a running frame — the same O(n)
incremental frame the gap-fill uses). One shuffle on the key; no range
explosion, no skew-prone inequality join.

A tolerance variant drops matches older than ``tolerance`` (like pandas
merge_asof / QuestDB ASOF ... TOLERANCE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the latest right payload at-or-before left_ts per key
    (``direction='backward'``, the default), or the EARLIEST right payload
    at-or-after it (``direction='forward'`` — pandas merge_asof
    direction='forward'; same union+running-frame plan, reversed sort).

    Ties (equal timestamps) match, with the right row considered first —
    matching DuckDB's ASOF JOIN ``>=`` semantics."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lt = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, left_ts)],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    # right rows sort before left rows at equal timestamps so a same-ts
    # right row is visible to the left row
    u = lt.unionByName(rt)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}") for c in payload_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"),
    )
    out = filled.where(F.col("_is_left") == 1)
    keep = F.lit(True)
    if tolerance_seconds is not None:
        # exact µs integer comparison (works for TIMESTAMP and
        # TIMESTAMP_NTZ inputs alike; float-seconds casts do neither)
        us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
        gap = (
            us("_ts") - us("_f_ts")
            if direction == "backward"
            else us("_f_ts") - us("_ts")
        )
        keep = F.col("_f_ts").isNotNull() & (
            gap <= F.lit(round(tolerance_seconds * 1_000_000))
        )
    sel = [F.col(key), F.col("_ts").alias(left_ts)]
    sel += [F.col(c) for c in left.columns if c not in (key, left_ts)]
    sel += [F.when(keep, F.col(f"_f_{c}")).alias(c) for c in payload_cols]
    return out.select(*sel)
