"""HyperLogLog distinct-count sketch with CROSS-ENGINE-EXACT state.

At 100 TB "how many distinct urls/users/docs" cannot be a countDistinct
(full shuffle of every key); the standard answer is HyperLogLog
(Flajolet et al. 2007): hash each value, bucket by the first p bits,
keep the max leading-zero rank per bucket, estimate from the harmonic
mean of 2^-rank. The register state is algebraic (max per bucket), so
Spark computes it with one map-side-combined aggregation over the raw
stream — no distinct, no extra shuffle beyond the 2^p-row register agg.

Determinism design (what makes this oracle-gatable, unlike Spark's
built-in approx_count_distinct whose HLL++ state is engine-internal):

  * the hash is md5 of the value's decimal string — identical in DuckDB;
  * 60 hash bits are taken as the first 15 hex chars, so the BIGINT is
    always positive in both engines (conv() is signed in Spark);
  * the leading-zero rank is computed via the LENGTH OF THE BINARY
    STRING of the remainder (conv(x,10,2) / bin(x)) — pure string ops,
    no floating point, bit-identical everywhere;
  * the harmonic denominator is kept as an EXACT integer: sum of
    2^(W+1-rank) over registers (plus 2^(W+1) per empty register),
    bounded by 2^(W+1) * m = 2^61 for p=12 — no float summation order
    anywhere. Only the single final estimate expression touches floats,
    with the identical literal formula on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P_BITS = 12  # 4096 registers — the standard ~1.6% relative-error point
W_BITS = 48  # rank domain: hash bits after the bucket index
_M = 1 << P_BITS
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)  # Flajolet's alpha_m for m >= 128


def hll_registers(df: DataFrame, value: Column) -> DataFrame:
    """(bucket, r) register rows — only non-empty buckets appear."""
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    rem = h.bitwiseAND(F.lit((1 << W_BITS) - 1))
    rho = F.when(rem == 0, F.lit(W_BITS + 1)).otherwise(
        F.lit(W_BITS) - F.length(F.conv(rem.cast("string"), 10, 2)) + 1
    )
    return (
        df.select(
            F.shiftright(h, W_BITS).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(regs: DataFrame, extra_aggs: tuple = ()) -> DataFrame:
    """One row: (m, v_zero, s_harm, estimate [, extras]) from the
    register table. ``extra_aggs`` are extra ALIASED aggregate columns
    computed in the SAME single aggregation (e.g. a register checksum)
    so callers never scan the register table twice.

    s_harm = sum over ALL m registers of 2^(W+1-rank) with rank 0 for
    empty registers — an exact BIGINT. estimate applies the standard
    small-range (linear counting) correction."""
    two_w1 = 1 << (W_BITS + 1)
    # DataFrame-API shiftleft takes only a literal shift count; the SQL
    # form accepts a column expression
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {W_BITS + 1} - r)")
        ).alias("s_present"),
        *extra_aggs,
    )
    v = F.lit(_M) - F.col("n_regs")
    s = F.col("s_present") + v * F.lit(two_w1)
    raw = F.lit(_ALPHA * _M * _M * two_w1) / s
    lc = F.lit(float(_M)) * F.log(F.lit(float(_M)) / v)
    est = F.when((raw <= 2.5 * _M) & (v > 0), lc).otherwise(raw)
    passthrough = [c for c in agg.columns if c not in ("n_regs", "s_present")]
    return agg.select(
        F.lit(_M).alias("m"),
        v.cast("long").alias("v_zero"),
        s.cast("long").alias("s_harm"),
        F.round(est, 0).cast("long").alias("estimate"),
        *[F.col(c) for c in passthrough],
    )


# --- count-min sketch (frequency estimation) -------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1 << 10  # 1024 counters per row: eps ~ e/w ~ 0.27% of stream


def _salted_hash(prefix: str, value: Column) -> Column:
    """60-bit always-positive BIGINT: first 15 hex chars of
    md5('<prefix>:<value>') — the ONE hash expression every sketch
    (and its DuckDB oracle replica) derives from."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(prefix + ":"), value.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def _probe_rows(value: Column, prefixes: list[str], width: int) -> Column:
    """array<struct<row,cell>> of all salted-hash cells for one value —
    exploded by callers so the input is scanned ONCE, not once per hash
    row (measured 1.5-2.5x on the sketch queries)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (_salted_hash(p, value) % width).alias("cell"),
            )
            for r, p in enumerate(prefixes)
        ]
    )


def cms_cells(df: DataFrame, value: Column) -> DataFrame:
    """(row, cell, cnt) counter table of the count-min sketch (Cormode &
    Muthukrishnan 2005): DEPTH independent hashes via md5 of
    "<row>:<value>", each bucketed into WIDTH cells. Counters are sums,
    so the whole state is one map-side-combined aggregation over ONE
    scan of the stream; only DEPTH * WIDTH rows ever shuffle regardless
    of stream size."""
    prefixes = [str(r) for r in range(CMS_DEPTH)]
    return (
        df.select(F.explode(_probe_rows(value, prefixes, CMS_WIDTH)).alias("p"))
        .select(F.col("p.row").alias("row"), F.col("p.cell").alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(cells: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates: min over the DEPTH counters each key
    hashes to (never under-counts; over-counts by at most eps*N whp).

    Probes LEFT-join the counter table with the (bounded, <= DEPTH*WIDTH
    rows) sketch side broadcast, so a key whose probe cell holds no
    counter row contributes cnt=0 to the min — absent keys estimate 0
    instead of vanishing or over-estimating from their non-empty cells.
    The key list may itself be stream-scale; it is never broadcast."""
    prefixes = [str(r) for r in range(CMS_DEPTH)]
    probes = keys.select(
        F.col(key_col),
        F.explode(_probe_rows(F.col(key_col), prefixes, CMS_WIDTH)).alias("p"),
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.cell").alias("cell"))
    return (
        probes.join(F.broadcast(cells), ["row", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


# --- Bloom filter (set membership) -----------------------------------------

BLOOM_BITS = 1 << 13  # 8192 bits
BLOOM_K = 4


def bloom_bits(df: DataFrame, value: Column) -> DataFrame:
    """(bit,) rows — the set bit positions of a Bloom filter over the
    distinct values of ``value`` (Bloom 1970). K row-salted md5 hashes
    per value in ONE scan; the state is a distinct-set of at most
    BLOOM_BITS rows, map-side combined, so shuffle volume is bounded by
    the filter size regardless of stream size."""
    prefixes = [f"b{r}" for r in range(BLOOM_K)]
    return (
        df.select(F.explode(_probe_rows(value, prefixes, BLOOM_BITS)).alias("p"))
        .select(F.col("p.cell").alias("bit"))
        .distinct()
    )


def bloom_contains(bits: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """(key, maybe_present) — true iff ALL K probe bits are set (no
    false negatives; false positives at the standard (1-e^-kn/m)^k
    rate). The bit set is broadcast: it is at most BLOOM_BITS rows."""
    prefixes = [f"b{r}" for r in range(BLOOM_K)]
    probes = keys.select(
        F.col(key_col),
        F.explode(_probe_rows(F.col(key_col), prefixes, BLOOM_BITS)).alias("p"),
    ).select(key_col, F.col("p.cell").alias("bit"))
    hits = (
        probes.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("_set", F.lit(0)))).alias(
            "maybe_present"
        ))
    )
    return hits
