"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (broadcast query vectors, JVM-side
higher-order array functions — no Python in the hot path). Scale path:
IVF-style coarse quantization — k-means-free bucketing via signed random
projections; probes only matching buckets, cutting the scan by
~2^n_planes/probes at recall cost.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


def _cosine(vec_col, q_col):
    to_d = lambda c: F.transform(c, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(to_d(vec_col), to_d(q_col), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(to_d(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return dot / (nrm(vec_col) * nrm(q_col))


def knn_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k per query: broadcast(queries) x scan(emb), window top-k.

    At 100 TB the scan side stays partition-parallel; only k rows per
    (query, partition) survive the partial rank, so the final shuffle is
    tiny."""
    joined = emb.crossJoin(F.broadcast(queries))
    sim = _cosine(F.col(vec_col), F.col(q_vec_col))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        joined.select(q_id_col, id_col, F.round(sim, 6).alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )



# Below this plane-table size (flops/row), the codegen'd Catalyst dot
# products beat an Arrow round trip at any scale; ivf_index and ivf_topk
# MUST share it — mixed paths could assign a corpus vector and an
# identical query vector to different cells on an ulp-of-zero dot.
SRP_JVM_MAX_FLOPS = 2048


def _srp_cell_sql(planes, vec_col: str) -> str:
    """SQL expression for the SRP base cell of ``vec_col``: one dot
    product per plane (zip_with/aggregate over literal plane arrays),
    built as a single string so it costs ONE py4j round trip + one
    parse. Used by both the corpus indexer and the query probe."""
    vec_d = f"transform({vec_col}, x -> cast(x as double))"
    bits = []
    for i in range(len(planes)):
        arr = "array(" + ",".join(f"{float(v)!r}d" for v in planes[i]) + ")"
        dot = (
            f"aggregate(zip_with({vec_d}, {arr}, (a, b) -> a * b), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        )
        bits.append(f"if({dot} > 0, {1 << i}, 0)")
    return "cast((" + " + ".join(bits) + ") as int)"


def ivf_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Assign each vector to a signed-random-projection bucket (IVF cell).

    ``dim`` skips the one-row probe job when the caller already knows the
    embedding width (the probe is cheap but is a whole Spark job).

    Small plane tables (n_planes*dim <= 2048, ~hundreds of flops/row)
    compile to whole-stage-codegen'd Catalyst dot products — cheaper
    than an Arrow round trip at ANY scale for this arithmetic density;
    the vectorized pandas_udf remains the path for large plane tables
    where a real matmul wins. Both paths are individually deterministic
    (see ivf_topk's note on accumulation order)."""
    if dim is None:
        dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))

    if n_planes * dim <= SRP_JVM_MAX_FLOPS:
        return emb.withColumn(
            "cell", F.expr(_srp_cell_sql(planes, vec_col)).cast("int")
        )

    @F.pandas_udf(IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes.T) > 0
        vals = np.zeros(len(m), dtype=np.int64)
        for i in range(bits.shape[1]):
            vals |= bits[:, i].astype(np.int64) << i
        return pd.Series(vals.astype(np.int32))

    return emb.withColumn("cell", cell(F.col(vec_col)))


def ivf_topk(
    indexed: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    n_planes: int = 8,
    seed: int = 11,
    hamming_probe: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: scan only cells within ``hamming_probe`` bit
    flips of the query's cell (probes = sum_{i<=h} C(n_planes, i)).

    Probe-cell assignment is fully distributed: the same vectorized
    pandas_udf that indexes the corpus assigns each query its base cell
    plus all cells within ``hamming_probe`` bit flips, exploded into
    (query, cell) probe rows. No driver-side collect — the query side can
    itself be corpus-scale; only the probe rows that join are broadcast
    (still small: queries x sum_{i<=h} C(n_planes, i))."""
    if dim is None:
        dim = len(queries.select(q_vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    from itertools import combinations

    flips = np.left_shift(1, np.arange(n_planes, dtype=np.int32))
    masks = [0]
    for d in range(1, min(hamming_probe, n_planes) + 1):
        masks.extend(
            int(np.bitwise_or.reduce(flips[list(c)]))
            for c in combinations(range(n_planes), d)
        )
    mask_arr = np.asarray(masks, dtype=np.int32)

    if n_planes * dim <= SRP_JVM_MAX_FLOPS:
        # JVM path: n_planes dot products against literal plane arrays,
        # whole-stage-codegen'd — skips an entire Python-worker stage for
        # the (typically tiny relative to the corpus) query side. The
        # corpus indexer uses the IDENTICAL expression below the same
        # shared threshold, so corpus and query cell assignment agree
        # bit-for-bit (no near-zero accumulation-order divergence).
        base = _srp_cell_sql(planes, q_vec_col)
        cells = "array(" + ",".join(f"(_cell0 ^ {int(m)})" for m in mask_arr) + ")"
        probe = (
            queries.withColumn("_cell0", F.expr(base))
            .select(q_id_col, q_vec_col, F.explode(F.expr(cells)).alias("cell"))
        )
    else:

        @F.pandas_udf(ArrayType(IntegerType()))
        def probe_cells(vecs: pd.Series) -> pd.Series:
            m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            bits = (m @ planes.T) > 0
            base = (bits.astype(np.int32) << np.arange(n_planes, dtype=np.int32)).sum(
                axis=1, dtype=np.int32
            )
            cells = base[:, None] ^ mask_arr[None, :]
            return pd.Series([row.tolist() for row in cells])

        probe = queries.select(
            q_id_col, q_vec_col, F.explode(probe_cells(F.col(q_vec_col))).alias("cell")
        )
    joined = indexed.join(F.broadcast(probe), "cell")
    sim = _cosine(F.col(vec_col), F.col(q_vec_col))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        joined.select(q_id_col, id_col, F.round(sim, 6).alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


# --- k-means IVF (FAISS-style coarse quantizer) -----------------------------

def kmeans_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train IVF centroids with Lloyd iterations on a deterministic sample
    (FAISS practice: the coarse quantizer trains on a bounded sample, not
    the corpus — driver-side numpy on <= ``sample`` vectors is exact at any
    corpus scale)."""
    rows = (
        emb.orderBy(id_col).limit(sample).select(vec_col).collect()
    )
    if not rows:
        raise ValueError("kmeans_centroids: empty embedding sample")
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            sel = assign == c
            if sel.any():
                cents[c] = x[sel].mean(axis=0)
    return cents


def kmeans_ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids,
    one vectorized argmin per Arrow batch)."""
    cents = centroids

    @F.pandas_udf(IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return emb.withColumn("cell", cell(F.col(vec_col)))


def kmeans_ivf_topk(
    indexed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest cells, exact
    cosine rerank inside them. ``nprobe >= len(centroids)`` degenerates to
    exact brute force (used by the oracle-gated query); smaller nprobe
    trades recall for scanning only ~nprobe/k of the corpus."""
    cents = centroids
    spark = indexed.sparkSession

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, : min(nprobe, len(cents))]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = queries.withColumn("_cells", probe_cells(F.col(q_vec_col))).select(
        q_id_col, q_vec_col, F.explode("_cells").alias("cell")
    )
    cand = indexed.join(F.broadcast(q), on="cell")
    to_d = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(to_d(vec_col), to_d(q_vec_col), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(to_d(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # round BEFORE ranking, exactly like knn_bruteforce, so near-tie
    # similarities break ties identically across the IVF / brute-force /
    # oracle paths (sim desc, id asc)
    sim = F.round(dot / (norm(vec_col) * norm(q_vec_col)), 6).alias("sim")
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.select(q_id_col, id_col, sim)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


# --- Product Quantization (Jegou et al., PAMI 2011 / FAISS IndexPQ) ---------

def pq_train(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train PQ codebooks: split the d-dim space into ``m`` subspaces and
    run Lloyd k-means (``ksub`` centroids) independently in each, on the
    same deterministic bounded sample discipline as kmeans_centroids
    (FAISS practice — codebooks train on <= ``sample`` vectors driver-side;
    the corpus-scale work is encode/search, which stay distributed).
    Returns codebooks of shape (m, ksub, d//m) float64."""
    if not 1 <= ksub <= 256:
        # codes are single bytes end-to-end (pq_encode packs uint8);
        # a larger codebook would silently truncate ids mod 256
        raise ValueError(f"ksub must be in [1, 256], got {ksub}")
    rows = emb.orderBy(id_col).limit(sample).select(vec_col).collect()
    if not rows:
        raise ValueError("pq_train: empty embedding sample")
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return _pq_lloyd_books(x, m, ksub, iters, seed)


def _pq_lloyd_books(
    x: np.ndarray, m: int, ksub: int, iters: int, seed: int
) -> np.ndarray:
    """Subspace Lloyd k-means on a training matrix (shared by pq_train
    and ivfpq_train, which trains on coarse-cell residuals)."""
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    rng = np.random.default_rng(seed)
    # a sample smaller than ksub trains fewer centroids; size the books
    # to what was actually trained — zero-filled phantom rows would win
    # argmin for small-norm subvectors and encode to untrained centroids
    kk = min(ksub, len(x))
    books = np.zeros((m, kk, dsub))
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[rng.choice(len(xs), size=kk, replace=False)].copy()
        for _ in range(iters):
            # argmin of ||x-c||^2 == argmin of ||c||^2 - 2 x.c (the x^2
            # term is row-constant): one matmul instead of an
            # (n, ksub, dsub) broadcast temporary
            d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (xs @ cents.T)
            assign = d2.argmin(axis=1)
            # vectorized Lloyd update (bincount per dim) — the per-centroid
            # mask loop cost ~1s across m*ksub*iters at ksub=256
            counts = np.bincount(assign, minlength=kk).astype(np.float64)
            sums = np.stack(
                [
                    np.bincount(assign, weights=xs[:, t], minlength=kk)
                    for t in range(dsub)
                ],
                axis=1,
            )
            nonempty = counts > 0
            cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        books[j] = cents
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``m`` uint8 centroid ids (one binary column —
    a 64-dim float32 vector becomes 8 bytes, 32x smaller). Broadcast
    codebooks inside an Arrow-batched pandas_udf; one vectorized argmin
    per subspace per batch, no per-row Python."""
    from pyspark.sql.types import BinaryType

    books = codebooks
    m, _ksub, dsub = books.shape

    @F.pandas_udf(BinaryType())
    def codes(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=object)
        mtx = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(mtx), m), np.uint8)
        for j in range(m):
            xs = mtx[:, j * dsub : (j + 1) * dsub]
            # matmul expansion; the x^2 term is argmin-invariant
            d2 = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (xs @ books[j].T)
            out[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.Series([r.tobytes() for r in out])

    return emb.select(id_col, codes(F.col(vec_col)).alias("pq_code"))


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query a tiny
    (m x ksub) table of subspace distances is precomputed driver-side
    from the bounded query set and broadcast in the UDF closure; each
    corpus row then costs m table lookups + a sum — no decode, no float
    vectors in the scan. On unit-normalized embeddings the L2 ADC
    ranking equals the cosine ranking (||a-b||^2 = 2 - 2cos), which is
    what lets the recall gate compare against the cosine brute force.
    Ties break on (distance asc, id asc) after a 1e-6 round, mirroring
    knn_bruteforce's rounding discipline."""
    from pyspark.sql.types import DoubleType

    qrows = sorted(queries.select(q_id_col, q_vec_col).collect())
    m, ksub, dsub = codebooks.shape
    q_ids = [r[0] for r in qrows]
    tabs = np.stack(
        [
            np.stack(
                [
                    (
                        (codebooks[j] - np.asarray(r[1], np.float64)[
                            j * dsub : (j + 1) * dsub
                        ][None, :])
                        ** 2
                    ).sum(axis=1)
                    for j in range(m)
                ]
            )
            for r in qrows
        ]
    )  # (Q, m, ksub)
    jj = np.arange(m)

    @F.pandas_udf(ArrayType(DoubleType()))
    def adc(codes: pd.Series) -> pd.Series:
        cm = np.frombuffer(b"".join(codes), np.uint8).reshape(len(codes), m)
        # dists[q, i] = sum_j tabs[q, j, cm[i, j]] — one fancy-index
        # gather per batch: (1, m) x (n, m) index pair broadcasts to
        # (Q, n, m), summed over subspaces
        d = tabs[:, jj[None, :], cm].sum(axis=2)
        return pd.Series([d[:, i].tolist() for i in range(cm.shape[0])])

    qmap = F.array(*[F.lit(q) for q in q_ids])
    scored = (
        codes_df.select(id_col, F.posexplode(adc(F.col("pq_code"))))
        .select(
            qmap[F.col("pos")].alias(q_id_col),
            id_col,
            F.round(F.col("col"), 6).alias("adc_dist"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


# --- IVF-PQ (FAISS IndexIVFPQ: coarse quantizer + PQ on residuals) ----------

def ivfpq_train(
    emb: DataFrame,
    k_coarse: int = 8,
    m: int = 16,
    ksub: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 4096,
    coarse_iters: int = 8,
    pq_iters: int = 8,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the IndexIVFPQ pair on ONE bounded deterministic sample:
    Lloyd coarse centroids, then PQ codebooks on the sample's residuals
    to its nearest coarse centroid (FAISS trains PQ on residuals, not
    raw vectors — residual energy is what's left after the coarse
    quantizer, so the same code budget quantizes much finer). Returns
    (centroids (k, d), codebooks (m, ksub, d//m))."""
    if not 1 <= ksub <= 256:
        raise ValueError(f"ksub must be in [1, 256], got {ksub}")
    rows = emb.orderBy(id_col).limit(sample).select(vec_col).collect()
    if not rows:
        raise ValueError("ivfpq_train: empty embedding sample")
    x = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k_coarse, len(x)), replace=False)].copy()
    for _ in range(coarse_iters):
        d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            sel = assign == c
            if sel.any():
                cents[c] = x[sel].mean(axis=0)
    d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
    resid = x - cents[d2.argmin(axis=1)]
    books = _pq_lloyd_books(resid, m, ksub, pq_iters, seed)
    return cents, books


def ivfpq_index(
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index the corpus: (id, cell, pq_code) — nearest coarse cell plus
    the PQ code of the residual to that cell's centroid, in ONE
    Arrow-batched UDF (cell assignment and residual encode share the
    decoded float batch; nothing is materialized twice). At 100 TB the
    index is 4 + m bytes per vector and the scan never touches floats."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    cents, books = centroids, codebooks
    m, _ksub, dsub = books.shape
    out_t = StructType(
        [StructField("cell", IntegerType()), StructField("pq_code", BinaryType())]
    )

    @F.pandas_udf(out_t)
    def enc(vecs: pd.Series) -> pd.DataFrame:
        if vecs.empty:
            return pd.DataFrame({"cell": [], "pq_code": []})
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
        cell = d2.argmin(axis=1)
        resid = x - cents[cell]
        codes = np.empty((len(x), m), np.uint8)
        for j in range(m):
            rs = resid[:, j * dsub : (j + 1) * dsub]
            dj = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (rs @ books[j].T)
            codes[:, j] = dj.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "pq_code": [r.tobytes() for r in codes]}
        )

    s = enc(F.col(vec_col)).alias("_ivfpq")
    return emb.select(id_col, s.getField("cell").alias("cell"),
                      s.getField("pq_code").alias("pq_code"))


def ivfpq_topk(
    indexed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IndexIVFPQ search: each query probes its ``nprobe`` nearest coarse
    cells; within a probed cell the ADC table is built against
    (q - centroid[cell]) — the residual the codes were trained on — so
    distance is ||(q - c) - pq_recon||^2. Per (query, probed cell) the
    table is m x ksub doubles, precomputed driver-side from the bounded
    query set and broadcast in the UDF closure (Q x nprobe x m x ksub —
    O(1) state); the scan is an equi-join on cell (only ~nprobe/k_coarse
    of the corpus is read) followed by m uint8 table lookups per row.
    Ties break (adc_dist asc, id asc) after a 1e-6 round, the shared
    discipline of every ANN path here."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cents, books = centroids, codebooks
    m, ksub, dsub = books.shape
    qrows = sorted(queries.select(q_id_col, q_vec_col).collect())
    if not qrows:
        raise ValueError("ivfpq_topk: empty query set")
    nprobe = min(nprobe, len(cents))
    pairs = []  # (q_id, cell) in probe order
    tabs = np.empty((len(qrows) * nprobe, m, ksub))
    for qi, r in enumerate(qrows):
        qv = np.asarray(r[1], np.float64)
        d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
        for pi, c in enumerate(np.argsort(d2)[:nprobe]):
            p = qi * nprobe + pi
            resid = qv - cents[c]
            for j in range(m):
                tabs[p, j] = (
                    (books[j] - resid[j * dsub : (j + 1) * dsub][None, :]) ** 2
                ).sum(axis=1)
            pairs.append((r[0], int(c), p))
    spark = indexed.sparkSession
    probe_df = spark.createDataFrame(
        pairs,
        StructType(
            [
                StructField(q_id_col, LongType()),
                StructField("cell", IntegerType()),
                StructField("_pidx", IntegerType()),
            ]
        ),
    )
    cand = indexed.join(F.broadcast(probe_df), on="cell")
    jj = np.arange(m)

    @F.pandas_udf(DoubleType())
    def adc(codes: pd.Series, pidx: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=np.float64)
        cm = np.frombuffer(b"".join(codes), np.uint8).reshape(len(codes), m)
        p = pidx.to_numpy(np.int64)
        # per-row gather from that row's own (query, cell) table
        return pd.Series(tabs[p[:, None], jj[None, :], cm].sum(axis=1))

    scored = cand.select(
        q_id_col,
        id_col,
        F.round(adc(F.col("pq_code"), F.col("_pidx")), 6).alias("adc_dist"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def ivfpq_topk_refined(
    indexed: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Two-stage retrieval (FAISS IndexRefine over IndexIVFPQ — the shape
    a real embedding-dedup pipeline runs at corpus scale): stage 1 is the
    compressed ADC scan (ivfpq_topk with k=shortlist — 16 B/vector over
    ~nprobe/k_coarse of the corpus), stage 2 joins ONLY the shortlist ids
    back to the float table and reranks with exact cosine. The expensive
    exact math touches shortlist x |queries| rows instead of the corpus;
    the semi-join on id is the only place full vectors are read, and at
    100 TB that read is an id-pruned point lookup, not a scan. Ranking
    discipline as everywhere: round(sim, 6) desc, id asc."""
    short = ivfpq_topk(
        indexed,
        queries,
        centroids,
        codebooks,
        k=shortlist,
        nprobe=nprobe,
        id_col=id_col,
        q_id_col=q_id_col,
        q_vec_col=q_vec_col,
    ).select(q_id_col, id_col)
    cand = short.join(emb.select(id_col, vec_col), id_col).join(
        F.broadcast(queries.select(q_id_col, q_vec_col)), q_id_col
    )
    sim = F.round(_cosine(F.col(vec_col), F.col(q_vec_col)), 6).alias("sim")
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.select(q_id_col, id_col, sim)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
