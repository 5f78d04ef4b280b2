"""Deduplication operators over document tables (training-data pipeline).

All are target additions (the reference has no text layer); implemented
Spark-first:

  * exact_dedup            — hash groupBy, keep min id (one shuffle)
  * minhash_lsh_pairs      — word-shingle MinHash signatures (Arrow UDF,
                             vectorized numpy) → banded LSH bucket join →
                             candidate pairs with estimated Jaccard
  * ngram_jaccard_verify   — exact n-gram Jaccard on candidate pairs only
                             (never all-pairs; candidates bound the join)
  * simhash_candidates     — 64-bit SimHash, 4x16-bit band bucketing,
                             Hamming-verified pairs

Scale: every operator is shuffle-bounded by (band, bucket) group sizes,
not by n_docs^2; the verify joins are broadcast-friendly when the
candidate set is small and AQE-skew-safe otherwise.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from sprintz_spark.functions.text import simhash64

_MERSENNE = (1 << 61) - 1
log = logging.getLogger(__name__)

# Buckets larger than this are dropped from the LSH self-join: a degenerate
# bucket (boilerplate/empty docs at web scale) otherwise goes quadratic in
# rows AND bytes shuffled. Members of a dropped bucket are by definition
# massively duplicated — exact_dedup (hash groupBy, linear) is the right
# tool for them, so dropping loses only cross-bucket *near* (non-exact)
# matches of those pathological docs.
DEFAULT_MAX_BUCKET = 1000


def _cap_buckets(
    banded: DataFrame,
    max_bucket: int,
    op_name: str,
    log_dropped: bool,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Drop (band, bucket) groups with more than ``max_bucket`` members.

    The hot-bucket set is collected once (it is tiny by construction:
    <= n_rows/max_bucket groups, and a broadcast anti-join would have to
    materialize the same rows on the driver anyway). Collecting lets us
    (a) log the drop counts from the SAME pass — no extra eager job like
    the round-2 version's hot.count() — and (b) skip the anti-join
    entirely in the common no-hot-bucket case, so the cap is free unless
    it actually fires (no silent caps: drops are always logged)."""
    hot_rows = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .collect()
    )
    if drop_stats is not None:  # programmatic recall-loss observability
        drop_stats["dropped_buckets"] = len(hot_rows)
        drop_stats["dropped_rows"] = int(sum(r["n"] for r in hot_rows))
        drop_stats["max_bucket"] = max_bucket
    if not hot_rows:
        return banded
    if log_dropped:
        log.warning(
            "%s: dropped %d over-cap LSH buckets (%d rows, cap=%d); "
            "route their members through exact_dedup",
            op_name, len(hot_rows), sum(r["n"] for r in hot_rows), max_bucket,
        )
    hot = banded.sparkSession.createDataFrame(
        [(r["band"], r["bucket"]) for r in hot_rows], schema=["band", "bucket"]
    )
    return banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One surviving row per distinct text (min id wins)."""
    h = F.md5(F.col(text_col)).alias("_h")
    return (
        docs.select(F.col(id_col), h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("_h")
    )


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — vectorized MinHash over word shingles.

    Per-gram hash = first 8 bytes of md5 (big-endian) so the whole
    signature — permutations included, since numpy's uint64 wrap is
    (a*h+b) mod 2^64 which DuckDB reproduces in HUGEINT — is
    SQL-oracle-checkable (queries._minhash_sql)."""
    import hashlib

    a, b = _minhash_params(n_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = (t or "").lower().split()
            if len(words) < shingle:
                grams = [" ".join(words)] if words else [""]
            else:
                grams = [
                    " ".join(words[i : i + shingle])
                    for i in range(len(words) - shingle + 1)
                ]
            gset = set(grams)
            hv = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
                    for g in gset
                ),
                dtype=np.uint64,
                count=len(gset),
            )
            # k x n permutation hashes, min over shingles (one numpy shot)
            perm = (a[:, None] * hv[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            out.append(perm.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select(F.col(id_col), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    min_est_jaccard: float = 0.4,
    seed: int = 42,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b, est_jaccard) via banded LSH.

    est_jaccard = fraction of matching minhash components — the unbiased
    Jaccard estimator; pairs must collide in >=1 band AND pass the
    estimate threshold.

    Scale shape: the band self-join carries ONLY (band, bucket, id) — the
    512 B signatures never cross that shuffle; they are re-attached by id
    after pair dedup. Buckets over ``max_bucket`` members are dropped (and
    logged) before the join, bounding the worst bucket at cap^2 instead of
    letting one boilerplate bucket go quadratic over the corpus.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, shingle, seed).cache()
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    banded = _cap_buckets(banded, max_bucket, "minhash_lsh_pairs", log_dropped, drop_stats)
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .join(sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(n_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 4))
        .where(F.col("est_jaccard") >= min_est_jaccard)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
) -> DataFrame:
    """Exact word-shingle Jaccard for candidate pairs only."""
    texts = docs.select(F.col(id_col), F.col(text_col))
    joined = (
        pairs.join(texts.withColumnsRenamed({id_col: "doc_a", text_col: "text_a"}), "doc_a")
        .join(texts.withColumnsRenamed({id_col: "doc_b", text_col: "text_b"}), "doc_b")
    )

    @F.pandas_udf("double")
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        def grams(t):
            w = (t or "").lower().split()
            if len(w) < shingle:
                return {" ".join(w)} if w else set()
            return {" ".join(w[i : i + shingle]) for i in range(len(w) - shingle + 1)}

        out = []
        for x, y in zip(ta, tb):
            gx, gy = grams(x), grams(y)
            u = len(gx | gy)
            out.append(len(gx & gy) / u if u else 0.0)
        return pd.Series(out)

    return joined.select(
        "doc_a", "doc_b", "est_jaccard", F.round(jac("text_a", "text_b"), 4).alias("jaccard")
    )


def simhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
    drop_stats: dict | None = None,
) -> DataFrame:
    """SimHash near-dup candidates: 4x16-bit bands; pairs colliding in any
    band are Hamming-verified. Returns (doc_a, doc_b, hamming).

    Same scale shape as minhash_lsh_pairs: id-only band join, over-cap
    buckets dropped (logged), hashes re-attached by id afterwards."""

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [np.int64(np.uint64(simhash64(t or ""))) for t in texts], dtype="int64"
        )

    sigs = docs.select(F.col(id_col), sh(F.col(text_col)).alias("sh")).cache()
    bands = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sh", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "bucket"),
    )
    bands = _cap_buckets(bands, max_bucket, "simhash_candidates", log_dropped, drop_stats)
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .join(sigs.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sigs.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Cosine near-dup pairs via signed-random-projection LSH, then exact
    cosine verification inside buckets.

    Standard multi-table LSH: ``n_tables`` independent sets of ``n_planes``
    hyperplanes; a pair is a candidate if it collides in ANY table
    (recall ~= 1-(1-p^k)^L for collision prob p = 1 - acos(cos)/pi).
    Id-only bucket join with an over-cap drop (logged); vectors are
    re-attached by id for the exact-cosine verify."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.zeros((len(m), n_tables), dtype=np.int32)
        for t in range(n_tables):
            bits = (m @ planes[t].T) > 0
            code = np.zeros(len(m), dtype=np.int32)
            for i in range(n_planes):
                code |= bits[:, i].astype(np.int32) << i
            out[:, t] = code | (t << 24)  # table id in high bits
        return pd.Series(list(out))

    vecs = emb.select(F.col(id_col), F.col(vec_col)).cache()
    b = vecs.select(
        F.col(id_col),
        F.lit(0).alias("band"),  # table id already lives in bkt's high bits
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    b = _cap_buckets(b, max_bucket, "embedding_near_dup", log_dropped, drop_stats)
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])  # pairs may collide in >1 table
        .join(vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")), "id_a")
        .join(vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")), "id_b")
    )
    to_d = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(to_d("vec_a"), to_d("vec_b"), lambda a, c: a * c),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(to_d(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    sim = dot / (nrm("vec_a") * nrm("vec_b"))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 4).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )
