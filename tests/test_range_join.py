"""Binned range join (operators/ranges.py): exact containment semantics
at bin boundaries, keyed variant, and the plan guarantee (hash join, not
BroadcastNestedLoop)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from sprintz_spark.operators.ranges import range_join_binned

T0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


def test_containment_and_bin_boundaries(spark):
    # bin = 1 day; intervals cross bin edges, points sit exactly on
    # lo/hi bounds and on the midnight bin boundary
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2, 3, 4, 5],
                      "ts": [_ts(0), _ts(23), _ts(24), _ts(30), _ts(49)]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({
            "iid": [10, 20, 30],
            "lo": [_ts(0), _ts(20), _ts(25)],
            "hi": [_ts(23), _ts(30), _ts(48)],
        })
    )
    got = (
        range_join_binned(pts, iv, "ts", "lo", "hi", bin_seconds=86400)
        .select("pid", "iid")
        .toPandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    # brute-force expectation
    p = pts.toPandas()
    i = iv.toPandas()
    rows = [
        (int(pr.pid), int(ir.iid))
        for pr in p.itertuples()
        for ir in i.itertuples()
        if ir.lo <= pr.ts <= ir.hi
    ]
    want = pd.DataFrame(sorted(rows), columns=["pid", "iid"])
    pd.testing.assert_frame_equal(want, got)
    # sanity on the cases: hi bound inclusive (pid=2 in iid=10? ts=23h
    # == hi -> yes), cross-bin interval matches next-day point
    assert (2, 10) in rows and (3, 20) in rows and (5, 30) not in rows


def test_keyed_variant(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", "b"], "ts": [_ts(1), _ts(5), _ts(1)]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "b"], "lo": [_ts(0), _ts(2)], "hi": [_ts(2), _ts(3)]})
    )
    got = (
        range_join_binned(pts, iv, "ts", "lo", "hi", bin_seconds=3600, key="k")
        .select("k", "ts")
        .toPandas()
    )
    # only ("a", 1h) matches: same key AND contained
    assert len(got) == 1 and got.iloc[0]["k"] == "a"


def test_plan_has_no_nested_loop(spark):
    pts = spark.range(100).select(
        F.col("id").alias("pid"),
        (F.lit(T0) + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
    )
    iv = spark.range(10).select(
        F.col("id").alias("iid"),
        (F.lit(T0) + F.make_interval(hours=(F.col("id") * 10).cast("int"))).alias("lo"),
        (F.lit(T0) + F.make_interval(hours=(F.col("id") * 10 + 5).cast("int"))).alias("hi"),
    )
    df = range_join_binned(pts, iv, "ts", "lo", "hi", bin_seconds=86400)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert df.count() == 60  # 10 intervals x 6 contained hours each
