"""Sessionization: split each key's event stream into sessions separated
by an inactivity gap — the classic event-analytics operator, expressed as
two window passes (lag -> boundary flag -> running sum), so Catalyst keeps
it one shuffle on the key with no Python in the path.

Scale: state is per-key ordering within partitions (spillable sort); no
cross-key traffic beyond the single hash exchange. For streaming, Spark's
session_window aggregation is the watermark-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Adds a per-key ``session_id`` (0-based, ordered by time): a new
    session starts when the gap since the previous event exceeds
    ``gap_minutes``."""
    w = Window.partitionBy(key).orderBy(ts_col)
    prev = F.lag(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    new_session = (
        prev.isNull() | (F.unix_micros(F.col(ts_col).cast("timestamp")) - prev > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-key session summary: session count, total events, largest
    session (events), and total in-session dwell microseconds (exact) (sum over
    sessions of last_ts - first_ts; single-event sessions contribute 0)."""
    s = sessionize(events, key, ts_col, gap_minutes)
    per_session = s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
            - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
        ).alias("dwell_us"),
    )
    return per_session.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("n_ev").alias("max_session_events"),
        F.sum("dwell_us").alias("dwell_us_sum"),
    )
