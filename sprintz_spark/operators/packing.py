"""Token-budget shard packing via a distributed prefix sum.

Training-data pipelines shard a curated corpus into fixed-token-budget
files (e.g. ~4096-token groups for sequence packing, or N-GB shards for
dataloader striping). The assignment rule used here is the standard
contiguous fill: walk documents in a deterministic order, keep a running
token total, and a document belongs to shard ``floor(start_offset /
capacity)`` where start_offset is the running total BEFORE the document.
Documents may straddle a boundary (their tail spills into the next
shard) — exactly how sequence packing with spillover behaves.

The only non-trivial part at scale is the running total itself: a global
``sum() OVER (ORDER BY doc_id)`` window has an empty PARTITION BY, which
Spark executes as a SINGLE task — the classic 100-TB scale-killer. So
``global_prefix_sum`` implements the textbook two-phase distributed scan
(the same shape Spark's own zipWithIndex uses):

  1. bucket rows by ``order_col`` range (``bucket = order // bucket_width``,
     width chosen so there are at most ``max_buckets`` buckets);
  2. one map-side-combined aggregation produces per-bucket subtotals —
     a frame no larger than ``max_buckets`` rows, collected to the driver
     and turned into EXCLUSIVE per-bucket offsets (a tiny Python scan);
  3. the offsets broadcast-join back, and the intra-bucket running sum is
     a window PARTITIONED BY bucket — every bucket scans in parallel.

Cost: one extra map-side-combined agg + one broadcast join versus the
single-task window; the collect is bounded by ``max_buckets`` (4096 rows
of (bucket, subtotal)), independent of table size. A skew guard
re-buckets any bucket holding > 8x the uniform row share at finer width
(one additional agg over hot rows only — see phase 1.5 in
``global_prefix_sum``), so a dense id cluster cannot serialize half the
window work in one task.

Reference parity: the reference engine has no sharding operator — this
belongs to the "operations a large-scale training-data pipeline needs"
surface (SURVEY §2 additions), like the dedup/ANN family.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    max_buckets: int = 4096,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``value_col`` in
    ``order_col`` order, without a global single-task window.

    ``order_col`` must be unique per row (doc_id-like) and non-null
    (a null has no place in a total order — we raise rather than let the
    bucket join silently drop the row); the result is identical to
    ``sum(value) OVER (ORDER BY order_col)``.

    The input is persisted (MEMORY_AND_DISK) for the duration: the
    algorithm reads it in three passes (range agg, bucket subtotals,
    final join) and the driver-side offsets are only correct if every
    pass sees the SAME rows — a nondeterministic upstream (sample,
    repartition-race) would otherwise disagree with itself. The cache
    also collapses three upstream evaluations into one. Callers may
    ``unpersist()`` the input after consuming the result.
    """
    spark = df.sparkSession
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    # bucket width from the key range; the same single pass counts nulls
    # (count(*) vs count(col)) and materializes the cache
    lo, hi, n_all, n_key = df.agg(
        F.min(order_col), F.max(order_col), F.count(F.lit(1)), F.count(order_col)
    ).first()
    if n_all != n_key:
        raise ValueError(
            f"global_prefix_sum: {n_all - n_key} null {order_col!r} rows — "
            "a running sum needs a total order; filter or fill them first"
        )
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    width = max(1, (int(hi) - int(lo)) // max_buckets + 1)
    # integer DIV, not double division: exact for keys beyond 2^53
    # (snowflake-style ids); operands are non-negative so DIV == floor
    bucketed = df.withColumn(
        "_psum_bucket", F.expr(f"({order_col} - {int(lo)}L) DIV {width}L")
    )
    # phase 1: per-bucket subtotals AND row counts (map-side combined,
    # <= max_buckets rows; the count is free in the same agg and drives
    # the hot-bucket refinement below)
    subtotals = sorted(
        bucketed.groupBy("_psum_bucket")
        .agg(
            F.sum(value_col).alias("_psum_sub"),
            F.count(F.lit(1)).alias("_psum_cnt"),
        )
        .collect(),
        key=lambda r: r["_psum_bucket"],
    )
    # phase 1.5 — hot-bucket refinement (skew guard): equal-WIDTH ranges
    # balance rows only when keys are ~uniform over their span. If the id
    # space is dense in one narrow range (snowflake ids from one hot
    # ingest hour), one bucket can hold half the table and its window
    # task becomes a straggler AQE cannot split (AQE never subdivides a
    # window partition; measured 1.5x wall at 40M rows with 50% in one
    # bucket, growing linearly — scripts/scale_rehearsal_packing.py).
    # Any bucket holding > 8x the uniform share is re-bucketed at finer
    # width sized to its own count, via ONE extra agg restricted to hot
    # rows. Collected rows stay bounded: sum(ceil(cnt/mean)) <=
    # ~2*max_buckets fine groups total. Keys repeating adversarially at
    # a SINGLE value cannot be split below width=1 (unique order_col
    # makes that a non-issue). No hot buckets -> no extra job, plan
    # identical to the unrefined path.
    mean = max(1, n_all // max_buckets)
    hot = {
        int(r["_psum_bucket"]): int(r["_psum_cnt"])
        for r in subtotals
        if r["_psum_cnt"] > 8 * mean and width > 1
    }
    fine_map: dict = {}
    if hot:
        spec = [
            (b, max(1, width // min(max_buckets, -(-cnt // mean))))
            for b, cnt in hot.items()
        ]
        spec_df = spark.createDataFrame(spec, "_psum_bucket long, _psum_fw long")
        sub_expr = F.expr(
            f"(({order_col} - {int(lo)}L) % {width}L) DIV _psum_fw"
        )
        fine = (
            bucketed.join(F.broadcast(spec_df), "_psum_bucket")
            .withColumn("_psum_sb", sub_expr)
            .groupBy("_psum_bucket", "_psum_sb")
            .agg(F.sum(value_col).alias("_psum_sub"))
            .collect()
        )
        for r in fine:
            fine_map.setdefault(int(r["_psum_bucket"]), []).append(
                (int(r["_psum_sb"]), int(r["_psum_sub"] or 0))
            )
        bucketed = (
            bucketed.join(F.broadcast(spec_df), "_psum_bucket", "left")
            .withColumn(
                "_psum_sb",
                F.when(F.col("_psum_fw").isNull(), F.lit(0)).otherwise(sub_expr),
            )
            .drop("_psum_fw")
        )
    else:
        bucketed = bucketed.withColumn("_psum_sb", F.lit(0).cast("long"))
    # phase 2: exclusive offsets via a driver-side scan of the tiny list
    run = 0
    offsets = []
    for r in subtotals:
        b = int(r["_psum_bucket"])
        if b in fine_map:
            for sb, subtot in sorted(fine_map[b]):
                offsets.append((b, sb, run))
                run += subtot
        else:
            offsets.append((b, 0, run))
            run += int(r["_psum_sub"] or 0)
    off_df = spark.createDataFrame(
        offsets, "_psum_bucket long, _psum_sb long, _psum_off long"
    )
    # phase 3: intra-(sub)bucket running sum, every bucket in parallel
    w = (
        Window.partitionBy("_psum_bucket", "_psum_sb")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(off_df), ["_psum_bucket", "_psum_sb"])
        .withColumn(out_col, F.sum(value_col).over(w) + F.col("_psum_off"))
        .drop("_psum_bucket", "_psum_sb", "_psum_off")
    )


def pack_shards(
    docs: DataFrame,
    capacity: int,
    order_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Assign each document to a fixed-token-budget shard (contiguous
    fill with spillover) and return per-shard packing stats:
    (shard_id, n_docs, tokens_sum, first_doc, last_doc).

    shard_id = floor(start_offset / capacity) where start_offset is the
    running token total before the document in ``order_col`` order."""
    cum = global_prefix_sum(docs, order_col, tokens_col, out_col="_cum")
    # start_offset DIV capacity (integer, exact past 2^53 total tokens;
    # start_offset >= 0 so DIV == floor, matching the oracle's floor())
    shard = F.expr(f"(_cum - {tokens_col}) DIV {int(capacity)}L")
    return (
        cum.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("tokens_sum"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )
