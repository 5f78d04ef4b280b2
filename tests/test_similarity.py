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


def test_pq_adc_matches_numpy_and_beats_random(spark):
    """PQ codebooks/encode/ADC: codes are m bytes; ADC distances equal a
    direct numpy computation; recall@10 on a planted-structure corpus is
    far above random chance."""
    import numpy as np
    from pyspark.sql import functions as F

    from sprintz_spark.operators.similarity import (
        knn_bruteforce,
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 32))
    # 400 vectors in 40 tight clusters -> PQ must recover cluster mates
    X = np.repeat(base, 10, axis=0) + rng.normal(scale=0.05, size=(400, 32))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))], "vec_id long, embedding array<double>"
    )
    books = pq_train(emb, m=8, ksub=16, sample=400)
    assert books.shape == (8, 16, 4)
    codes = pq_encode(emb, books).collect()
    assert all(len(r["pq_code"]) == 8 for r in codes)
    # ADC distance equals direct numpy for a spot row
    code_map = {r["vec_id"]: np.frombuffer(r["pq_code"], np.uint8) for r in codes}
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = pq_topk(pq_encode(emb, books), q, books, k=10)
    rows = {r["vec_id"]: r["adc_dist"] for r in top.collect()}
    qv = X[0]
    for vid, got in rows.items():
        want = sum(
            ((books[j][code_map[vid][j]] - qv[4 * j : 4 * j + 4]) ** 2).sum()
            for j in range(8)
        )
        assert abs(got - round(want, 6)) < 1e-9
    exact = {r["vec_id"] for r in knn_bruteforce(emb, q, k=10).collect()}
    recall = len(exact & set(rows)) / 10
    assert recall >= 0.7, recall  # clusters are tight; random would be ~0.025


def test_pq_guards_and_small_sample(spark):
    """Round-7 review fixes: ksub > 256 must raise (codes are single
    bytes), and a sample smaller than ksub must size the codebooks to
    what was trained — zero-filled phantom rows would win argmin for
    small-norm subvectors and encode to untrained centroids."""
    import numpy as np
    import pytest

    from sprintz_spark.operators.similarity import pq_encode, pq_train

    rng = np.random.default_rng(5)
    X = rng.normal(size=(40, 16))
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ksub"):
        pq_train(emb, m=4, ksub=512)
    books = pq_train(emb, m=4, ksub=256)  # only 40 sample vectors
    assert books.shape == (4, 40, 4)
    codes = pq_encode(emb, books).collect()
    assert all(max(r["pq_code"]) < 40 for r in codes)


def test_ivfpq_adc_matches_numpy_and_beats_random(spark):
    """IVF-PQ composition (round-8): codes are residual-space, the index
    carries (cell, pq_code), ADC against (q - centroid[cell]) equals a
    direct numpy computation, and recall@10 on a planted-structure corpus
    is far above chance with nprobe < k_coarse."""
    import numpy as np
    from pyspark.sql import functions as F

    from sprintz_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_topk,
        ivfpq_train,
        knn_bruteforce,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 32))
    X = np.repeat(base, 10, axis=0) + rng.normal(scale=0.05, size=(400, 32))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    cents, books = ivfpq_train(emb, k_coarse=4, m=8, ksub=16, sample=400)
    assert cents.shape == (4, 32) and books.shape == (8, 16, 4)
    idx = ivfpq_index(emb, cents, books).collect()
    assert all(len(r["pq_code"]) == 8 for r in idx)
    cell_map = {r["vec_id"]: r["cell"] for r in idx}
    code_map = {r["vec_id"]: np.frombuffer(r["pq_code"], np.uint8) for r in idx}
    # index cell == nearest centroid, code == PQ(residual) for a spot row
    for vid in (0, 7, 399):
        want_cell = ((cents - X[vid][None, :]) ** 2).sum(axis=1).argmin()
        assert cell_map[vid] == want_cell
        resid = X[vid] - cents[want_cell]
        for j in range(8):
            dj = ((books[j] - resid[4 * j : 4 * j + 4][None, :]) ** 2).sum(axis=1)
            assert code_map[vid][j] == dj.argmin()
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = ivfpq_topk(
        ivfpq_index(emb, cents, books), q, cents, books, k=10, nprobe=3
    )
    rows = {r["vec_id"]: r["adc_dist"] for r in top.collect()}
    qv = X[0]
    for vid, got in rows.items():
        resid_q = qv - cents[cell_map[vid]]
        want = sum(
            ((books[j][code_map[vid][j]] - resid_q[4 * j : 4 * j + 4]) ** 2).sum()
            for j in range(8)
        )
        assert abs(got - round(want, 6)) < 1e-9
    exact = {r["vec_id"] for r in knn_bruteforce(emb, q, k=10).collect()}
    recall = len(exact & set(rows)) / 10
    assert recall >= 0.7, recall


def test_ivfpq_empty_guards(spark):
    import pytest

    from sprintz_spark.operators.similarity import ivfpq_topk, ivfpq_train

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty embedding sample"):
        ivfpq_train(empty)
    import numpy as np

    eq = spark.createDataFrame([], "q_id long, q_vec array<double>")
    with pytest.raises(ValueError, match="empty query set"):
        ivfpq_topk(
            spark.createDataFrame([], "cell int, vec_id long, pq_code binary"),
            eq,
            np.zeros((4, 8)),
            np.zeros((2, 4, 4)),
        )


def test_ivfpq_refined_rerank_is_exact_on_shortlist(spark):
    """Two-stage retrieval: the refined top-k must equal brute force
    restricted to the ADC shortlist (exact cosine on shortlist ids), and
    on the planted-cluster corpus refinement must not lose recall vs the
    raw ADC ranking."""
    import numpy as np
    from pyspark.sql import functions as F

    from sprintz_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_topk,
        ivfpq_topk_refined,
        ivfpq_train,
        knn_bruteforce,
    )

    rng = np.random.default_rng(9)
    base = rng.normal(size=(40, 32))
    X = np.repeat(base, 10, axis=0) + rng.normal(scale=0.05, size=(400, 32))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents, books = ivfpq_train(emb, k_coarse=4, m=8, ksub=16, sample=400)
    idx = ivfpq_index(emb, cents, books)
    short_ids = {
        r["vec_id"]
        for r in ivfpq_topk(idx, q, cents, books, k=30, nprobe=3).collect()
    }
    got = ivfpq_topk_refined(
        idx, emb, q, cents, books, k=10, nprobe=3, shortlist=30
    ).collect()
    # refined ranks by exact cosine: recompute on the shortlist
    sims = sorted(
        ((round(float(X[i] @ X[0]), 6), -i) for i in short_ids), reverse=True
    )[:10]
    want = [(-negid, s) for s, negid in sims]
    assert [(r["vec_id"], r["sim"]) for r in sorted(got, key=lambda r: r["rnk"])] == want
    exact = {r["vec_id"] for r in knn_bruteforce(emb, q, k=10).collect()}
    adc = {r["vec_id"] for r in ivfpq_topk(idx, q, cents, books, k=10, nprobe=3).collect()}
    refined = {r["vec_id"] for r in got}
    assert len(exact & refined) >= len(exact & adc)
