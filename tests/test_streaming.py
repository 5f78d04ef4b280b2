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


def test_stateful_stream_encoder(spark, tmp_path):
    """applyInPandasWithState sprintz encoder: points buffered across
    micro-batches come back exactly after decode, and small early batches
    do NOT emit (buffering works) until min_rows or the flush marker."""
    import numpy as np

    from sprintz_spark.codecs import sprintz as sz

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in ("a", "b"):
        for i in range(90):
            rows.append((u, t0 + dt.timedelta(minutes=i), (i * 7) % 101, False))
    pdf = pd.DataFrame(rows, columns=["url", "bucket", "v", "flush"])
    src = str(tmp_path / "pts_src")
    sdf = spark.createDataFrame(pdf)
    # three ordered slices of 30 points/url: 30 pending after slice 1
    # (below min_rows=50, buffered), 60 after slice 2 (emitted), 30 after
    # slice 3 (buffered until the flush markers)
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        sl = sdf.where(
            (F.col("bucket") >= F.lit(t0 + dt.timedelta(minutes=lo)))
            & (F.col("bucket") < F.lit(t0 + dt.timedelta(minutes=hi)))
        )
        sl.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)
    markers = spark.createDataFrame(
        pd.DataFrame(
            [("a", t0, 0, True), ("b", t0, 0, True)],
            columns=["url", "bucket", "v", "flush"],
        ),
        schema=sdf.schema,
    )
    markers.coalesce(1).write.mode("append").parquet(src)

    from sprintz_spark.streaming.rollup_stream import stream_encode_stateful

    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    enc = stream_encode_stateful(stream, value_col="v", min_rows=50)
    out = str(tmp_path / "enc_out2")
    q = (
        enc.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk2"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).toPandas()
    # per url: first emit at 64+ pending (after slice 2), second at flush
    assert set(got["url"]) == {"a", "b"}
    for u in ("a", "b"):
        chunks = got[got["url"] == u].sort_values("start_bucket")
        assert chunks["n"].sum() == 90
        assert list(chunks["n"]) == [60, 30]  # mid-stream emit + flush
        ts_all, v_all = [], []
        for _, r in chunks.iterrows():
            ts_all.append(sz.decode_column(r["ts_blob"]).view(np.int64))
            v_all.append(sz.decode_column(r["value_blob"]).view(np.int64))
        ts_cat = np.concatenate(ts_all)
        v_cat = np.concatenate(v_all)
        want = pdf[(pdf["url"] == u) & (~pdf["flush"])].sort_values("bucket")
        np.testing.assert_array_equal(
            ts_cat, want["bucket"].astype("datetime64[us]").to_numpy().view(np.int64)
        )
        np.testing.assert_array_equal(v_cat, want["v"].to_numpy(np.int64))


def test_stream_exact_dedup(spark, tmp_path):
    """Streaming dedup emits exactly one row per distinct text; duplicate
    copies in later micro-batches are dropped within the watermark."""
    import datetime as dt

    from sprintz_spark.streaming.rollup_stream import stream_exact_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = str(tmp_path / "docs_src")
    batches = [
        [(1, t0, "alpha beta"), (2, t0, "gamma delta")],
        [(3, t0 + dt.timedelta(minutes=1), "alpha beta"),       # dup of 1
         (4, t0 + dt.timedelta(minutes=1), "epsilon zeta")],
        [(5, t0 + dt.timedelta(minutes=2), "gamma delta"),      # dup of 2
         (6, t0 + dt.timedelta(minutes=2), "alpha beta")],      # dup of 1
    ]
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, ts timestamp, text string") \
            .coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "dedup_out")
    q = (
        stream_exact_dedup(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_dedup"))
        .trigger(availableNow=True)
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas().sort_values("doc_id")
    assert sorted(got["text"]) == ["alpha beta", "epsilon zeta", "gamma delta"]
    assert len(got) == 3  # one survivor per distinct text


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Native session windows: streaming (availableNow, ordered slices,
    sentinel flush) == the same session_window aggregation run in batch."""
    from sprintz_spark.streaming.rollup_stream import stream_sessionize

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        # watermarks need TIMESTAMP (tz-aware); the testdata column is NTZ
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .cache()
    )
    src = str(tmp_path / "ev_src")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    ev.where(F.col("ts") < F.lit(mid)).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    ev.where(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    max_ts = ev.agg(F.max("ts")).first()[0]
    spark.createDataFrame(
        [(-999, max_ts + dt.timedelta(days=30))], schema="user_id long, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "sess_out")
    q = (
        stream_sessionize(stream, watermark="1 minute")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .where(F.col("user_id") != -999)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(want[got.columns], got)


def test_stream_m4_matches_batch(spark, tmp_path):
    """Streaming M4 (tumbling 1h min/max/first/last) == the batch
    m4_downsample over the same events, modulo the window-start bucket
    convention (both use date_trunc-aligned tumbling windows)."""
    from sprintz_spark.operators.downsample import m4_downsample
    from sprintz_spark.streaming.rollup_stream import stream_m4

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .cache()
    )
    src = str(tmp_path / "m4_src")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    ev.where(F.col("ts") < F.lit(mid)).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    ev.where(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    max_ts = ev.agg(F.max("ts")).first()[0]
    spark.createDataFrame(
        [(-999, max_ts + dt.timedelta(days=30), -1, 0)],
        schema="user_id long, ts timestamp, event_id long, cents long",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "m4_out")
    q = (
        stream_m4(stream, watermark="1 minute")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "m4_chk"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .where(F.col("user_id") != -999)
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    want = (
        m4_downsample(
            ev,
            key_cols=["user_id"],
            bucket=F.date_trunc("hour", "ts"),
            val_col="cents",
            order=F.struct(F.col("ts"), F.col("event_id")),
        )
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_stream_gap_alerts(spark, tmp_path):
    """Gap monitor: alerts fire exactly for inter-event gaps over the
    bound, including a gap that SPANS micro-batches (proving the 8-byte
    last_ts state carries across batches)."""
    import datetime as dt

    from sprintz_spark.streaming.rollup_stream import stream_gap_alerts

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    src = str(tmp_path / "gap_src")
    batches = [
        # u1: events at 0, 1, 2 min (no gap); u2: 0 min only
        [("u1", t0), ("u1", t0 + m), ("u1", t0 + 2 * m), ("u2", t0)],
        # u1 resumes at 62 min -> 60-min gap from 2 min (cross-batch);
        # u2 at 5 min -> 5-min gap, under the bound
        [("u1", t0 + 62 * m), ("u2", t0 + 5 * m)],
        # u1 at 63 min (no gap); u2 at 200 min -> 195-min gap
        [("u1", t0 + 63 * m), ("u2", t0 + 200 * m)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "url string, bucket timestamp") \
            .coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = str(tmp_path / "gap_out")
    q = (
        stream_gap_alerts(stream, max_gap_seconds=30 * 60)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_gap"))
        .trigger(availableNow=True)
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas().sort_values(["url", "gap_start"])
    alerts = [
        (r["url"], int(r["gap_us"] // 60_000_000))
        for _, r in got.iterrows()
    ]
    assert alerts == [("u1", 60), ("u2", 195)]
    # gap endpoints are the exact neighboring event times
    u1 = got[got["url"] == "u1"].iloc[0]
    assert u1["gap_start"] == t0 + 2 * m and u1["gap_end"] == t0 + 62 * m
