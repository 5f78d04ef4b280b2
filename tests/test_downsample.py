"""M4 / counter-increase / rolling z-score (operators/downsample.py)."""

import numpy as np
import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprintz_spark.operators.downsample import (
    counter_increase,
    m4_downsample,
    rolling_zscore_flags,
)


def _series(spark, vals, key="a"):
    return spark.createDataFrame(
        [Row(k=key, i=i, v=int(v)) for i, v in enumerate(vals)]
    )


def test_m4_matches_pandas_reference(spark):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1000, 97)
    df = _series(spark, vals).withColumn("b", (F.col("i") / 10).cast("int"))
    out = (
        m4_downsample(df, ["k"], F.col("b"), "v", F.col("i"))
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame({"b": np.arange(97) // 10, "v": vals})
    ref = pdf.groupby("b")["v"].agg(["min", "max", "first", "last", "count"])
    assert list(out["v_min"]) == list(ref["min"])
    assert list(out["v_max"]) == list(ref["max"])
    assert list(out["v_first"]) == list(ref["first"])
    assert list(out["v_last"]) == list(ref["last"])
    assert list(out["n"]) == list(ref["count"])


def test_counter_increase_reset_semantics(spark):
    # 0,5,12,3(reset),4,1(reset) -> increases 0,5,7,3,1,1
    df = _series(spark, [0, 5, 12, 3, 4, 1]).withColumn("b", F.lit(0))
    out = counter_increase(df, ["k"], F.col("b"), "v", F.col("i")).collect()
    assert out[0]["increase"] == 0 + 5 + 7 + 3 + 1 + 1
    assert out[0]["n"] == 6


def test_rolling_zscore_flags_spike(spark):
    vals = [100] * 30 + [100000] + [100] * 9  # one huge spike
    df = _series(spark, vals)
    out = rolling_zscore_flags(df, ["k"], "v", F.col("i"), window=20).collect()
    assert out[0]["n_points"] == 40
    # constant history has zero variance; the spike trips the flag, the
    # constant rows never do, and post-spike rows have nonzero variance
    # but deviations under 3 sigma from the spike-inflated window
    assert out[0]["n_flagged"] == 1


def test_rolling_zscore_integer_identity(spark):
    """The integer inequality must equal the float z-score definition on
    random data (validates the multiply-through-by-n^2 algebra)."""
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 10_000, 300)
    df = _series(spark, vals)
    out = rolling_zscore_flags(df, ["k"], "v", F.col("i"), window=20).collect()
    flags = 0
    for t in range(len(vals)):
        lo = max(0, t - 20)
        w = vals[lo:t].astype(np.float64)
        if len(w) >= 10:
            mean, var = w.mean(), w.var()
            if (vals[t] - mean) ** 2 > 9 * var:
                flags += 1
    assert out[0]["n_flagged"] == flags


def test_lttb_properties_and_reference_parity(spark):
    """LTTB: endpoints kept, exact input points, right count — and the
    vectorized bucket scan matches a direct transliteration of the
    published algorithm (Steinarsson 2013, §4.2) on random series."""
    import numpy as np

    from sprintz_spark.operators.downsample import lttb_downsample

    rng = np.random.default_rng(3)
    rows = []
    for k in range(3):
        n = 500 + 37 * k
        x = np.cumsum(rng.integers(1, 5, n)).astype(np.int64)
        y = (np.cumsum(rng.normal(0, 10, n)) * 100).astype(np.int64)
        rows += [(f"s{k}", int(a), int(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "key string, x long, y long")
    out = lttb_downsample(df, ["key"], "x", "y", n_out=40).toPandas()

    def lttb_ref(x, y, n_out):
        # direct per-point transliteration of the published algorithm
        n = len(x)
        edges = np.linspace(1, n - 1, n_out - 1).astype(int)
        sel = [0]
        a = 0
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            best, best_area = lo, -1.0
            for i in range(lo, hi):
                area = abs(
                    (x[a] - cx) * (y[i] - y[a]) - (x[a] - x[i]) * (cy - y[a])
                )
                if area > best_area:
                    best, best_area = i, area
            sel.append(best)
            a = best
        sel.append(n - 1)
        return np.array(sel)

    for k in range(3):
        g = out[out["key"] == f"s{k}"].sort_values("x")
        xs = np.array([r for r in rows if r[0] == f"s{k}"])
        x = xs[:, 1].astype(np.int64)
        y = xs[:, 2].astype(np.int64)
        assert len(g) == 40
        assert g["x"].iloc[0] == x[0] and g["x"].iloc[-1] == x[-1]
        ref = lttb_ref(x.astype(float), y.astype(float), 40)
        np.testing.assert_array_equal(g["x"].to_numpy(), x[ref])
        np.testing.assert_array_equal(g["y"].to_numpy(), y[ref])
    # short series pass through untouched
    short = spark.createDataFrame(
        [("t", i, i * 2) for i in range(10)], "key string, x long, y long"
    )
    got = lttb_downsample(short, ["key"], "x", "y", n_out=40).toPandas()
    assert len(got) == 10


def test_lttb_preserves_float_values_exactly(spark):
    """Round-5 review fix: y keeps its input dtype — float series come
    back as exact input doubles, never int-truncated."""
    import numpy as np

    from sprintz_spark.operators.downsample import lttb_downsample

    rng = np.random.default_rng(9)
    y = np.round(np.cumsum(rng.normal(0, 1, 300)) + 0.99, 2)
    rows = [("f", i, float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "key string, x long, y double")
    out = lttb_downsample(df, ["key"], "x", "y", n_out=30).toPandas()
    assert out["y"].dtype == np.float64
    src = dict(enumerate(y))
    assert all(src[int(r["x"])] == r["y"] for _, r in out.iterrows())


def test_interval_coverage_matches_bruteforce(spark):
    """The running-max sweep in q_interval_coverage equals a brute-force
    union-of-intervals computation on random overlapping intervals."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    rows = []
    for u in range(5):
        starts = np.sort(rng.integers(0, 10_000, 40))
        lens = rng.integers(1, 900, 40)
        rows += [(u, int(s), int(s + l)) for s, l in zip(starts, lens)]
    df = spark.createDataFrame(rows, "user_id long, s long, e long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("e") - F.greatest(F.col("s"), F.coalesce(F.max("e").over(w), F.col("s"))),
    )
    got = {
        r["user_id"]: r["c"]
        for r in df.select("user_id", contrib.alias("c"))
        .groupBy("user_id")
        .agg(F.sum("c").alias("c"))
        .collect()
    }

    def brute(iv):
        pts = set()
        for s, e in iv:
            pts.update(range(s, e))
        return len(pts)

    for u in range(5):
        iv = [(s, e) for uu, s, e in rows if uu == u]
        assert got[u] == brute(iv), u
