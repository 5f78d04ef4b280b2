"""IVF probe-set semantics (round-4 ADVICE: hamming_probe >= 3 used to
silently behave as 2, quietly lowering recall)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _candidates(emb, spark, h, n_planes=4, k=10**6):
    from sprintz_spark.operators.similarity import ivf_index, ivf_topk

    idx = ivf_index(emb, n_planes=n_planes)
    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_topk(idx, q, k=k, n_planes=n_planes, hamming_probe=h)
    return {(r["q_id"], r["vec_id"]) for r in out.collect()}


def test_probe_distance_monotone_and_exhaustive(emb, spark):
    """Larger hamming_probe probes a superset of cells; at h == n_planes
    every cell is probed, so the result equals exact brute force."""
    # k exceeds the corpus size so the output IS the candidate pool
    c2 = _candidates(emb, spark, 2)
    c3 = _candidates(emb, spark, 3)
    c4 = _candidates(emb, spark, 4)
    assert c2 <= c3 <= c4  # monotone candidate growth

    from sprintz_spark.operators.similarity import knn_bruteforce

    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["vec_id"]) for r in knn_bruteforce(emb, q, k=10**6).collect()
    }
    assert c4 == exact  # h == n_planes probes all 2^n_planes cells


def test_winnowing_guarantee(spark):
    """Winnowing's defining property (Schleimer et al. §2): any shared
    substring of length >= k + w - 1 = 11 chars produces at least one
    shared fingerprint; disjoint random texts share none."""
    from pyspark.sql import functions as F

    from sprintz_spark.functions.text import winnow_fingerprint_exprs

    hashes, winnow = winnow_fingerprint_exprs(k=8, w=4)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "zz unrelated prefix THE QUICK BROWN FOX JUMPS ok suffix"),
            (3, "完全不同的文本内容没有任何重叠可言零相似度九十一二三"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select(
            "doc_id",
            F.expr(r"regexp_replace(lower(trim(text)), '\\s+', ' ')").alias("_norm"),
        )
        .where(F.length("_norm") >= 11)
        .withColumn("_hashes", F.expr(hashes))
        .select("doc_id", F.expr(winnow).alias("fps"))
        .collect()
    }
    # docs 1 and 2 share "the quick brown fox jumps" (25 chars, lowercased)
    assert fps[1] & fps[2]
    # the zh doc shares nothing with either
    assert not (fps[3] & fps[1]) and not (fps[3] & fps[2])
