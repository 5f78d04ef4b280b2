"""LSH hot-bucket cap: degenerate buckets must not go quadratic, and the
cap must be a no-op on a normal corpus."""

import time

import pytest
from pyspark.sql import functions as F

from sprintz_spark.operators.dedup import (
    embedding_near_dup,
    minhash_lsh_pairs,
    simhash_candidates,
)

SF_DIR = "/root/testdata/sf0.001"


def _mixed_corpus(spark, n_dupes=2000):
    """A few genuine near-dup docs + a degenerate pile of identical docs."""
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "completely different text about spark partitions and shuffles"),
    ]
    rows = base + [(100 + i, "spam spam spam") for i in range(n_dupes)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_hot_bucket_capped(spark):
    docs = _mixed_corpus(spark)
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        docs, min_est_jaccard=0.3, max_bucket=50, log_dropped=True
    ).collect()
    wall = time.perf_counter() - t0
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got  # the real near-dup survives
    assert all(a < 100 and b < 100 for a, b in got)  # no pair from the pile
    # 2000 identical docs uncapped would emit ~2M pairs; capped must be
    # bucket-bounded (wall sanity, generous for CI noise)
    assert wall < 60


def test_simhash_hot_bucket_capped(spark):
    docs = _mixed_corpus(spark, n_dupes=1000)
    pairs = simhash_candidates(docs, max_bucket=50).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert all(a < 100 and b < 100 for a, b in got)


@pytest.mark.parametrize(
    "fn,kw",
    [
        (minhash_lsh_pairs, {"min_est_jaccard": 0.3}),
        (simhash_candidates, {}),
    ],
)
def test_cap_noop_on_normal_corpus(spark, fn, kw):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    capped = fn(docs, **kw).collect()
    uncapped = fn(docs, max_bucket=10**9, log_dropped=False, **kw).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


def test_embedding_cap_noop(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    capped = embedding_near_dup(emb, threshold=0.3).collect()
    uncapped = embedding_near_dup(
        emb, threshold=0.3, max_bucket=10**9, log_dropped=False
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


def test_drop_stats_reported_as_data(spark):
    """Recall loss from the bucket cap is observable programmatically."""
    from pyspark.sql import functions as F

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("same text for every doc here").alias("text")
    )
    stats = {}
    pairs = minhash_lsh_pairs(
        docs, max_bucket=50, log_dropped=False, drop_stats=stats
    )
    pairs.count()
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_rows"] > 50
    assert stats["max_bucket"] == 50

    stats2 = {}
    distinct = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique words document number "), F.col("id").cast("string")).alias("text"),
    )
    minhash_lsh_pairs(distinct, max_bucket=50, drop_stats=stats2).count()
    assert stats2["dropped_buckets"] == 0 and stats2["dropped_rows"] == 0
