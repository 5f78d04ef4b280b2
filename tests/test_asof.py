"""As-of join operator (operators/asof.py), incl. the tolerance branch."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from sprintz_spark.operators.asof import asof_join


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_t(10), lid=1), Row(k="a", ts=_t(12), lid=2),
         Row(k="b", ts=_t(9), lid=3)]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=_t(9), v=100), Row(k="a", ts=_t(12), v=200),
         Row(k="b", ts=_t(11), v=300)]
    )
    out = {r["lid"]: r["v"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", payload_cols=["v"]
    ).collect()}
    # same-ts right row matches (>= semantics); future rows never do
    assert out == {1: 100, 2: 200, 3: None}


def test_asof_tolerance_drops_stale(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_t(10), lid=1),   # right at 9:00 -> 1h old: kept
         Row(k="a", ts=_t(11, 1), lid=2)]  # 2h01m old: dropped
    )
    right = spark.createDataFrame([Row(k="a", ts=_t(9), v=100)])
    out = {r["lid"]: r["v"] for r in asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload_cols=["v"], tolerance_seconds=3600.0,
    ).collect()}
    assert out == {1: 100, 2: None}


def test_asof_forward_and_tolerance(spark):
    """Forward direction: earliest right at-or-after left_ts; tolerance
    drops matches further than the bound AHEAD of the left row."""
    import datetime as dt

    from sprintz_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, "a"), (1, t0 + dt.timedelta(minutes=90), "b"), (2, t0, "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=30), 10), (1, t0 + dt.timedelta(minutes=200), 20)],
        "k long, ts timestamp, v long",
    )
    fwd = {
        (r["k"], r["tag"]): r["v"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            payload_cols=["v"], direction="forward",
        ).collect()
    }
    assert fwd == {(1, "a"): 10, (1, "b"): 20, (2, "c"): None}
    tol = {
        (r["k"], r["tag"]): r["v"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            payload_cols=["v"], direction="forward", tolerance_seconds=3600.0,
        ).collect()
    }
    # 'b' -> next right is 110 min ahead, beyond the 60-min tolerance
    assert tol == {(1, "a"): 10, (1, "b"): None, (2, "c"): None}

    import pytest as _pt

    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, key="k", left_ts="ts", right_ts="ts",
                  payload_cols=["v"], direction="sideways")
