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


def hll_estimate(regs: DataFrame) -> DataFrame:
    """One row: (m, v_zero, s_harm, estimate) from the register table.

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
    )
    v = F.lit(_M) - F.col("n_regs")
    s = F.col("s_present") + v * F.lit(two_w1)
    raw = F.lit(_ALPHA * _M * _M * two_w1) / s
    lc = F.lit(float(_M)) * F.log(F.lit(float(_M)) / v)
    est = F.when((raw <= 2.5 * _M) & (v > 0), lc).otherwise(raw)
    return agg.select(
        F.lit(_M).alias("m"),
        v.cast("long").alias("v_zero"),
        s.cast("long").alias("s_harm"),
        F.round(est, 0).cast("long").alias("estimate"),
    )


# --- count-min sketch (frequency estimation) -------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1 << 10  # 1024 counters per row: eps ~ e/w ~ 0.27% of stream


def cms_cells(df: DataFrame, value: Column) -> DataFrame:
    """(row, cell, cnt) counter table of the count-min sketch (Cormode &
    Muthukrishnan 2005): DEPTH independent hashes via md5 of
    "<row>:<value>", each bucketed into WIDTH cells. Counters are sums,
    so the whole state is one map-side-combined aggregation; only
    DEPTH * WIDTH rows ever shuffle regardless of stream size."""
    rows = None
    for r in range(CMS_DEPTH):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), value.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        part = df.select(
            F.lit(r).alias("row"),
            (h % CMS_WIDTH).alias("cell"),
        )
        rows = part if rows is None else rows.unionByName(part)
    return rows.groupBy("row", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(cells: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates: min over the DEPTH counters each key
    hashes to (never under-counts; over-counts by at most eps*N whp).
    ``keys`` is broadcast — the sketch side is already tiny."""
    probes = None
    for r in range(CMS_DEPTH):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), F.col(key_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        p = keys.select(
            F.col(key_col), F.lit(r).alias("row"), (h % CMS_WIDTH).alias("cell")
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        cells.join(F.broadcast(probes), ["row", "cell"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


# --- Bloom filter (set membership) -----------------------------------------

BLOOM_BITS = 1 << 13  # 8192 bits
BLOOM_K = 4


def bloom_bits(df: DataFrame, value: Column) -> DataFrame:
    """(bit,) rows — the set bit positions of a Bloom filter over the
    distinct values of ``value`` (Bloom 1970). K row-salted md5 hashes
    per value; the state is a distinct-set of at most BLOOM_BITS rows,
    map-side combined, so shuffle volume is bounded by the filter size
    regardless of stream size."""
    rows = None
    for r in range(BLOOM_K):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{r}:"), value.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        p = df.select((h % BLOOM_BITS).alias("bit"))
        rows = p if rows is None else rows.unionByName(p)
    return rows.distinct()


def bloom_contains(bits: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """(key, maybe_present) — true iff ALL K probe bits are set (no
    false negatives; false positives at the standard (1-e^-kn/m)^k
    rate). The bit set is broadcast: it is at most BLOOM_BITS rows."""
    probes = None
    for r in range(BLOOM_K):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{r}:"), F.col(key_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        p = keys.select(F.col(key_col), (h % BLOOM_BITS).alias("bit"))
        probes = p if probes is None else probes.unionByName(p)
    hits = (
        probes.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("_set", F.lit(0)))).alias(
            "maybe_present"
        ))
    )
    return hits
