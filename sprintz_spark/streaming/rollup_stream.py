"""Streaming continuous aggregates: the 1m tier maintained incrementally.

Batch and streaming share semantics: a watermarked tumbling-window groupBy
whose window start equals date_trunc for aligned windows, so streamed tier
rows are bit-identical to the batch derivation once the watermark closes a
bucket (verified in tests with availableNow).

Late data: rows older than ``watermark`` relative to the max seen warc_ts
are dropped by the engine (documented retention-engine behavior); anything
newer updates its bucket before emission (append mode emits only finalized
buckets).

``encoded_stream_sink`` shows the full streaming path: each micro-batch's
finalized buckets are sprintz-encoded via the same batched UDFs as the
batch plan and appended to the tier store — streaming and batch produce
the same wire format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WINDOW = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def stream_derive_series(
    pages_stream: DataFrame, tier: str = "1m", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming analog of operators.rollup.derive_series."""
    win = _WINDOW[tier]
    return (
        pages_stream.select(
            "url", "warc_ts", F.length("html").cast("long").alias("nbytes")
        )
        .withWatermark("warc_ts", watermark)
        .groupBy("url", F.window("warc_ts", win).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("crawl_count"),
            F.sum("nbytes").alias("byte_size_sum"),
            F.max("nbytes").alias("byte_size_max"),
            F.min("nbytes").alias("byte_size_min"),
        )
        .select(
            "url",
            F.col("w.start").alias("bucket"),
            "crawl_count",
            "byte_size_sum",
            "byte_size_max",
            "byte_size_min",
        )
    )


def encoded_stream_sink(
    series_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    """writeStream via foreachBatch: sprintz-encode each micro-batch of
    finalized buckets and append to the tier store (same SZ1 blobs as the
    batch plan). Returns the StreamingQuery."""
    from sprintz_spark.operators.encode import encode_series

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        enc = encode_series(
            batch_df,
            key_cols=["url"],
            value_cols=[
                "crawl_count",
                "byte_size_sum",
                "byte_size_max",
                "byte_size_min",
            ],
        )
        enc.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    writer = (
        series_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
