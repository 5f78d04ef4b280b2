"""Streaming rollup == batch rollup when events arrive in time order
(watermark semantics: out-of-order slices beyond the delay are dropped —
that's the documented late-data contract, so the test feeds ordered
slices and a watermark-advancing sentinel to flush the final windows)."""

import datetime as dt
import time

import pandas as pd
from pyspark.sql import functions as F

from sprintz_spark.operators import rollup as R
from sprintz_spark.operators.encode import decode_series
from sprintz_spark.streaming.rollup_stream import (
    encoded_stream_sink,
    stream_derive_series,
)


def test_stream_rollup_matches_batch(spark, pages_small, tmp_path):
    src = str(tmp_path / "pages_src")
    pages = pages_small.cache()
    qs = (
        pages.select(F.col("warc_ts").cast("double").alias("t"))
        .approxQuantile("t", [0.25, 0.5, 0.75], 0.01)
    )
    bounds = [None, *[dt.datetime.utcfromtimestamp(q) for q in qs], None]
    # time-ordered slices -> separate files with increasing mtimes so the
    # file source (oldest-first) replays history in order
    for i in range(4):
        sl = pages
        if bounds[i] is not None:
            sl = sl.where(F.col("warc_ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            sl = sl.where(F.col("warc_ts") < F.lit(bounds[i + 1]))
        sl.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)
    # sentinel far in the future: advances the watermark past every real
    # bucket so append mode emits them all
    max_ts = pages.agg(F.max("warc_ts")).first()[0]
    sentinel = spark.createDataFrame(
        [("zz-sentinel", max_ts + dt.timedelta(days=30), b"", "", "en")],
        schema=pages.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "enc_out")
    chk = str(tmp_path / "chk")
    series = stream_derive_series(stream, "1m", watermark="1 minute")
    q = encoded_stream_sink(series, out, chk, trigger={"availableNow": True})
    q.awaitTermination(300)

    got = (
        decode_series(
            spark.read.parquet(out),
            key_cols=["url"],
            value_cols=["crawl_count", "byte_size_sum", "byte_size_max", "byte_size_min"],
        )
        .where(F.col("url") != "zz-sentinel")
        .toPandas()
        .sort_values(["url", "bucket"])
        .reset_index(drop=True)
    )
    want = (
        R.derive_series(pages, "1m")
        .toPandas()
        .sort_values(["url", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(want[got.columns], got)
