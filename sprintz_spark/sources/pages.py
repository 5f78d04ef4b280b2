"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Every row is a pure function of (seed, row-id), generated *distributed*
(spark.range → column expressions → one Arrow-batched pandas UDF for
html/text), so the same code scales from 1k rows in tests to bench sizes
without a driver-side loop — at 100 TB this generator shape is exactly a
parallel range scan.

Properties engineered into the data (FIXTURES.md F1):
  * Zipf-skewed url frequencies — url_id drawn as floor(n_urls * u^2), so
    low url ids are crawled far more often (hot-prefix skew for salting).
  * Mostly-regular per-url crawl cadence (hourly slots, deterministic
    jitter) with ~20%% missing slots (gap-fill exercise) — rows for a url
    occupy a contiguous id range so the slot index is a closed form.
  * html length follows a smooth per-url wave (sprintz-friendly deltas).
  * text embeds per-language marker words so lang_id is exact; html is
    constructed such that functions.text.extract_text(html) == text
    byte-identically (comment padding only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from sprintz_spark.functions import text as T

EPOCH0 = "2024-01-01 00:00:00"
SLOT_SECONDS = 3600  # hourly crawl cadence

_VOCAB = {
    "en": "the quick crawl of data and pages with index shards tokens corpus web the and".split(),
    "de": "der schnelle crawl und die daten mit seiten der index und scherben korpus mit".split(),
    "fr": "le crawl rapide et les pages avec des jetons le corpus et les index avec".split(),
    "es": "el rastreo rápido y los datos con páginas el corpus y los índices con".split(),
    "zh": "的 快速 抓取 是 数据 在 页面 和 索引 的 语料 是 分片 和".split(),
}
_LANGS = list(_VOCAB)


def _mix(a: np.ndarray, b: int) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer, public constant set)."""
    b = (int(b) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF  # python-int mod 2^64
    z = a.astype(np.uint64) + np.uint64(b)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_HTML_SCHEMA = StructType(
    [StructField("html", BinaryType()), StructField("text", StringType())]
)


def _render_html(batch: pd.DataFrame) -> pd.DataFrame:
    """Arrow-batched renderer: (url_id, slot, target_len, lang) -> html/text."""
    url_ids = batch["url_id"].to_numpy(np.int64)
    slots = batch["slot"].to_numpy(np.int64)
    target = batch["target_len"].to_numpy(np.int64)
    langs = batch["lang"].tolist()
    htmls, texts = [], []
    for uid, slot, tlen, lang in zip(url_ids, slots, target, langs):
        vocab = _VOCAB[lang]
        h = _mix(np.arange(24, dtype=np.uint64), (uid << 20) ^ slot)
        n_words = 12 + int(h[0] % 12)
        words = [vocab[int(h[1 + j % 22] % len(vocab))] for j in range(n_words)]
        txt = f"page {uid} crawl {slot} " + " ".join(words)
        # no free text outside <article>: extract_text(html) must equal txt
        body = f'<html><head><meta name="p" content="{uid}"/></head><body><article>{txt}</article></body></html>'
        raw = body.encode("utf-8")
        pad = int(tlen) - len(raw)
        if pad > 7:
            raw += b"<!--" + b"x" * (pad - 7) + b"-->"
        htmls.append(raw)
        texts.append(txt)
    return pd.DataFrame({"html": htmls, "text": texts})


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    n_urls: int | None = None,
    n_sites: int | None = None,
    seed: int = 42,
    gap_frac: float = 0.2,
    partitions: int | None = None,
) -> DataFrame:
    """Build the pages DataFrame; fully deterministic in (seed, n_rows)."""
    n_urls = n_urls or max(1, n_rows // 50)
    n_sites = n_sites or max(5, n_urls // 20)
    partitions = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_rows, numPartitions=partitions)
    u = (F.col("id") + F.lit(0.5)) / F.lit(n_rows)  # uniform in (0,1)
    url_id = F.floor(F.lit(n_urls) * F.pow(u, F.lit(2.0))).cast("long")
    # rows of a url are a contiguous id range; slot index is id - first_id(url)
    first_id = F.ceil(F.sqrt(url_id.cast("double") / n_urls) * n_rows - 0.5).cast("long")
    slot = (F.col("id") - first_id).cast("long")
    h = F.xxhash64(F.col("id"), F.lit(seed))
    df = (
        ids.withColumn("url_id", url_id)
        .withColumn("slot", slot)
        .withColumn("h", h)
        # ~gap_frac of slots are never crawled (gap-fill exercise)
        .where(F.pmod(F.col("h"), 1000) >= int(gap_frac * 1000))
    )
    site_id = F.floor(F.lit(n_sites) * F.pow((F.col("url_id") + 0.5) / n_urls, F.lit(1.5)))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.pmod(F.xxhash64(site_id, F.lit(seed + 1)), len(_LANGS)) + 1).cast("int"),
    )
    jitter = F.pmod(F.col("h"), 600) - 300
    warc_ts = F.to_timestamp(F.lit(EPOCH0)) + F.make_interval(
        secs=(F.col("slot") * SLOT_SECONDS + jitter).cast("double")
    )
    # smooth per-url byte-size wave + small jitter (sprintz-friendly deltas)
    target_len = (
        F.lit(1200)
        + F.pmod(F.col("url_id") * 37, 800)
        + (F.lit(300) * F.sin(F.col("slot").cast("double") / 12.0)).cast("long")
        + F.pmod(F.col("h"), 32)
    ).cast("long")
    df = (
        df.withColumn("site_id", site_id)
        .withColumn("lang", lang)
        .withColumn("warc_ts", warc_ts)
        .withColumn("target_len", target_len)
        .withColumn("url", F.concat(F.lit("https://site"), site_id, F.lit(".example/p/"), F.col("url_id")))
    )
    rendered = df.withColumn(
        "page",
        F.pandas_udf(_render_html, _HTML_SCHEMA)(
            F.struct("url_id", "slot", "target_len", "lang")
        ),
    )
    return rendered.select(
        "url",
        "warc_ts",
        F.col("page.html").alias("html"),
        F.col("page.text").alias("text"),
        "lang",
    )
