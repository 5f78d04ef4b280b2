"""End-to-end engine tests: pages generation, series derivation, tier
cascade bit-exactness, salting equivalence, gap-fill semantics, and the
encode→decode→verify loop through Spark (the reference's
encode_measure_decode harness shape, python/dfsqueeze.py:133-231)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sprintz_spark.functions.text import extract_text
from sprintz_spark.operators import gapfill as GF
from sprintz_spark.operators import rollup as R
from sprintz_spark.operators.encode import decode_series, encode_series, query_encoded


def test_pages_deterministic_and_extractable(pages_small):
    pdf = pages_small.toPandas()
    assert len(pdf) > 2000
    assert set(pdf.columns) == {"url", "warc_ts", "html", "text", "lang"}
    # byte-identical extraction invariant (BASELINE.json input_hint)
    assert all(extract_text(h) == t for h, t in zip(pdf.html, pdf.text))
    # zipf skew: hottest url crawled much more than median
    vc = pdf.url.value_counts()
    assert vc.iloc[0] > 5 * vc.median()


def test_rollup_cascade_bit_exact(spark, pages_small):
    tiers = R.rollup_tiers(pages_small)
    t1h_direct = R.derive_series(pages_small, "1h").toPandas()
    t1h_cascade = tiers["1h"].toPandas()
    key = ["url", "bucket"]
    a = t1h_direct.sort_values(key).reset_index(drop=True)
    b = t1h_cascade.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])  # cascade == direct, exact
    t1d_direct = R.derive_series(pages_small, "1d").toPandas()
    c = tiers["1d"].toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        t1d_direct.sort_values(key).reset_index(drop=True), c[t1d_direct.columns]
    )


def test_salted_rollup_equivalence(spark, pages_small):
    plain = R.derive_series(pages_small, "1h").toPandas()
    salted = R.derive_series_salted(pages_small, "1h", n_salts=8).toPandas()
    key = ["url", "bucket"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True),
        salted.sort_values(key).reset_index(drop=True)[plain.columns],
    )


def _mk_series(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "bucket", "v"])
    )


def test_gapfill_locf_and_linear(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    # interior multi-gap + leading/trailing handled (FIXTURES.md F6)
    obs = _mk_series(
        spark,
        [("u", t(1), 10), ("u", t(4), 40), ("u", t(5), 50), ("u", t(8), 20)],
    )
    locf = (
        GF.gapfill(obs, "1h", ["v"], method="locf")
        .orderBy("bucket")
        .toPandas()
    )
    assert locf.v.tolist() == [10, 10, 10, 40, 50, 50, 50, 20]
    lin = (
        GF.gapfill(obs, "1h", ["v"], method="linear").orderBy("bucket").toPandas()
    )
    assert lin.v.tolist() == [10.0, 20.0, 30.0, 40.0, 50.0, 40.0, 30.0, 20.0]


def test_gapfill_leading_gap_stays_null(spark):
    t = lambda h: dt.datetime(2024, 1, 1, h)
    obs = _mk_series(spark, [("u", t(0), None), ("u", t(2), 7), ("u", t(3), 9)])
    locf = GF.gapfill(obs, "1h", ["v"], method="locf").orderBy("bucket").toPandas()
    assert pd.isna(locf.v.iloc[0]) and pd.isna(locf.v.iloc[1]) and locf.v.iloc[2] == 7


def test_encode_decode_roundtrip_spark(spark, pages_small):
    series = R.derive_series(pages_small, "1h")
    enc = encode_series(series, chunk_rows=64).cache()  # force multi-chunk
    dec = decode_series(enc)
    orig = series.toPandas().sort_values(["url", "bucket"]).reset_index(drop=True)
    back = dec.toPandas().sort_values(["url", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(orig[back.columns], back)
    # compression actually happens on the smooth byte-size series
    m = enc.agg(F.sum("raw_bytes").alias("r"), F.sum("comp_bytes").alias("c")).first()
    assert m["c"] < m["r"]


def test_query_encoded_matches_plain_agg(spark, pages_small):
    series = R.derive_series(pages_small, "1h")
    enc = encode_series(series)
    q = query_encoded(enc, "byte_size_sum").toPandas().set_index("url")
    plain = (
        series.groupBy("url")
        .agg(
            F.sum("byte_size_sum").alias("s"),
            F.max("byte_size_sum").alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
        .toPandas()
        .set_index("url")
    )
    for url, row in plain.iterrows():
        assert q.loc[url, "byte_size_sum_sum"] == row["s"]
        assert q.loc[url, "byte_size_sum_max"] == row["m"]
        assert q.loc[url, "n_points"] == row["n"]


def test_encode_float_gapfilled_series(spark):
    # linear-filled series are float64 → quantize-or-gorilla path
    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0 + dt.timedelta(hours=i), float(np.sin(i / 5) * 100))
            for i in range(200)]
    df = _mk_series(spark, rows)
    enc = encode_series(df, value_cols=["v"])
    back = (
        decode_series(enc, value_cols=["v"], value_types={"v": "double"})
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    orig = df.toPandas().sort_values("bucket").reset_index(drop=True)
    assert (back.v.to_numpy().view(np.uint64) == orig.v.to_numpy().view(np.uint64)).all()


def test_io_dispatch_roundtrip(spark, tmp_path):
    """read_table/write_table format dispatch (reference make_dfset /
    CsvDfSet / copy_from_csvs_dir parity)."""
    import pandas as pd

    from sprintz_spark.sources.io import copy_from_csv_dir, read_table, write_table

    df = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 3], "b": [1.5, 2.5, -3.0], "s": ["x", "y", "z"]})
    )
    for fmt in ("parquet", "csv", "json"):
        p = str(tmp_path / f"t_{fmt}")
        write_table(df, p, fmt=fmt, compression="none" if fmt == "parquet" else None)
        back = read_table(spark, p, fmt=fmt, schema=df.schema if fmt == "json" else None)
        got = back.toPandas().sort_values("a").reset_index(drop=True)
        want = df.toPandas().sort_values("a").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False)
    csv_dir = str(tmp_path / "t_csv")
    got = copy_from_csv_dir(spark, csv_dir).toPandas().sort_values("a").reset_index(drop=True)
    assert len(got) == 3 and set(got.columns) == {"a", "b", "s"}


def test_container_series_roundtrip(spark, pages_small):
    """Container encode (one blob per partition+column, many series) must
    round-trip the daily tier exactly and beat per-series blob sizes."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sprintz_spark.operators import rollup as R
    from sprintz_spark.operators.encode import (
        decode_series_container,
        encode_series,
        encode_series_container,
    )

    t1d = R.derive_series(pages_small, "1d")
    cols = ["crawl_count", "byte_size_sum", "byte_size_max", "byte_size_min"]
    enc = encode_series_container(t1d, key_cols=["url"], value_cols=cols)
    dec = decode_series_container(enc, key_cols=["url"], value_cols=cols)
    got = dec.toPandas().sort_values(["url", "bucket"]).reset_index(drop=True)
    want = t1d.toPandas().sort_values(["url", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # size win vs per-series blobs
    c_sizes = enc.agg(F.sum("comp_bytes"), F.sum("raw_bytes")).first()
    p = encode_series(t1d, key_cols=["url"], value_cols=cols)
    p_sizes = p.agg(F.sum("comp_bytes")).first()
    assert c_sizes[0] < p_sizes[0], (c_sizes[0], p_sizes[0])
    assert c_sizes[1] / c_sizes[0] > 2.0  # daily tier compresses now


def test_container_custom_part_col_passthrough(spark, pages_small):
    """A caller-named partition column (not literally 'part') must survive
    the container round trip on every decoded row."""
    from pyspark.sql import functions as F

    from sprintz_spark.operators import rollup as R
    from sprintz_spark.operators.encode import (
        decode_series_container,
        encode_series_container,
    )

    shard = F.pmod(F.xxhash64("url"), F.lit(4)).cast("int")
    t1d = R.derive_series(pages_small, "1d").withColumn("shard", shard)
    enc = encode_series_container(
        t1d, key_cols=["url"], value_cols=["crawl_count"], part_col="shard"
    )
    dec = decode_series_container(enc, key_cols=["url"], value_cols=["crawl_count"])
    assert "shard" in dec.columns
    bad = dec.where(F.col("shard") != shard).count()
    assert bad == 0


def test_query_encoded_container(spark, pages_small):
    """Fused aggregate over container blobs == aggregate over raw tier."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sprintz_spark.operators import rollup as R
    from sprintz_spark.operators.encode import (
        encode_series_container,
        query_encoded_container,
    )

    t1d = R.derive_series(pages_small, "1d")
    cols = ["crawl_count", "byte_size_sum", "byte_size_max", "byte_size_min"]
    enc = encode_series_container(t1d, key_cols=["url"], value_cols=cols)
    got = (
        query_encoded_container(enc, "byte_size_sum")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        t1d.groupBy("url").agg(
            F.sum("byte_size_sum").alias("byte_size_sum_sum"),
            F.max("byte_size_sum").alias("byte_size_sum_max"),
            F.min("byte_size_sum").alias("byte_size_sum_min"),
            F.count(F.lit(1)).alias("n_points"),
        ).toPandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_npy_feather_smart_dfsets(spark, tmp_path):
    """NpyDfSet/FeatherDfSet/SmartDfSet analogs (reference
    python/dfset.py:445-560): round-trips + the Smart numpy-vs-feather
    write rule."""
    import numpy as np
    from pyspark.sql import functions as F

    from sprintz_spark.sources.io import (
        read_npy,
        read_smart,
        read_table,
        write_smart,
        write_table,
    )

    df = spark.range(100).select(
        F.col("id").alias("value"), (F.col("id") * 2).cast("double").alias("d")
    )
    # npy: single numeric column
    p = str(tmp_path / "col.npy")
    write_table(df.select("value"), p, fmt="npy")
    back = read_npy(spark, p)
    assert back.toPandas()["value"].tolist() == list(range(100))

    # feather: whole frame, extension-dispatched
    p2 = str(tmp_path / "frame.feather")
    write_table(df, p2)
    back2 = read_table(spark, p2)
    assert back2.count() == 100 and set(back2.columns) == {"value", "d"}

    # smart: numeric -> .npy, strings -> .feather (reference write rule)
    base_num = str(tmp_path / "smart_num")
    chosen = write_smart(df, base_num, "value")
    assert chosen.endswith(".npy")
    assert read_smart(spark, base_num).count() == 100

    sdf = spark.range(10).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("value")
    )
    base_str = str(tmp_path / "smart_str")
    chosen2 = write_smart(sdf, base_str, "value")
    assert chosen2.endswith(".feather")
    got = read_smart(spark, base_str).toPandas()["value"].tolist()
    assert got[0] == "doc-0" and len(got) == 10


def test_spark_submit_py_files_package(tmp_path):
    """The north-star packaging claim, exercised for real: spark-submit
    --py-files <package zip> runs a driver script that imports the engine
    from the shipped zip (cwd outside the repo) and executes a query."""
    import subprocess
    import sys

    from sprintz_spark.session import package_zip

    zip_path = package_zip()
    script = tmp_path / "job.py"
    script.write_text(
        """
import json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from sprintz_spark.sources.pages import generate_pages
from sprintz_spark.operators import rollup as R
pages = generate_pages(spark, 2000)
n = R.derive_series(pages, "1m").count()
print(json.dumps({"rows": int(n)}))
spark.stop()
"""
    )
    res = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[2]",
            "--py-files", zip_path,
            str(script),
        ],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    import json as _json

    lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line; stderr tail: {res.stderr[-2000:]}"
    assert _json.loads(lines[-1])["rows"] > 0
