"""Retention tier writer: cascade rollups, sprintz-encode each tier, write
partitioned output + a per-partition checkpoint manifest, resume skipping
completed partitions.

Lineage model (north_star: "resumable from a per-partition checkpoint
manifest carrying lineage (source Iceberg snapshot-id, block offsets) and
encode-throughput metrics"): in this sandbox the source-of-truth table is
parquet, so ``snapshot_id`` is caller-supplied (in an Iceberg deployment it
is the snapshot being read; the manifest schema is identical). Per-chunk
"block offsets" (chunk index, row count, start bucket) live in the encoded
tier parquet; the manifest carries per-(tier, part) rollup metrics.

Resume semantics: a (tier, part, snapshot_id) row in the manifest means
that partition's output is complete. ``run_retention`` anti-joins pending
partitions against the manifest and rewrites ONLY those, using dynamic
partition overwrite — a crashed run leaves no manifest rows for its
unfinished partitions, so the re-run redoes exactly those and the final
output is byte-identical to a single clean run (verified in tests).

Scale notes: one Spark job per tier regardless of partition count; the
cascade encodes each tier from the materialized finer tier (1m parquet →
1h), so raw pages are scanned exactly once per snapshot.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sprintz_spark.operators import rollup as R
from sprintz_spark.operators.encode import (
    DEFAULT_CHUNK,
    decode_series,
    decode_series_container,
    encode_series,
    encode_series_container,
)

MEASURES = ["crawl_count", "byte_size_sum", "byte_size_max", "byte_size_min"]


def _recover_swap(path: str, staged_suffix: str, old_suffix: str) -> str | None:
    """Heal a staged+rename swap interrupted by a crash, making every
    expiry/GC entry point idempotent across the documented crash windows.

    Swap protocol: write <path><staged_suffix> fully, rename <path> ->
    <path><old_suffix>, rename staged -> <path>, rmtree old. Windows:
      a) crash before rename 1: canonical intact + complete staged dir
         -> drop the stale staged dir (the rerun recreates it);
      b) crash between renames: canonical ABSENT, staged (new state,
         fully written) + old (previous state) both present -> promote
         the staged dir (it is the completed new state), drop old;
      c) crash after rename 2, before the cleanup rmtree: canonical
         intact + old sibling -> drop old.
    Data is never destroyed before a complete replacement is in place.
    Object-store deployments swap a metadata pointer instead (same
    guard as lineage.json). Returns the action taken, for audit."""
    import shutil

    staged, old = path + staged_suffix, path + old_suffix
    action = None
    if not os.path.exists(path):
        if os.path.exists(staged):
            os.rename(staged, path)
            action = "promoted_staged"
        elif os.path.exists(old):
            os.rename(old, path)
            action = "restored_old"
    for p in (staged, old):
        if os.path.exists(p) and os.path.exists(path):
            shutil.rmtree(p)
            action = action or "dropped_stale"
    return action


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _manifest_path(out_dir)
    # cheap existence probe first: spark.read.parquet on a missing path logs
    # a JVM-side stack trace before we can catch the AnalysisException
    if "://" not in path and not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def _pending_parts(
    spark: SparkSession, out_dir: str, tier: str, snapshot_id: str, n_buckets: int
) -> list[int]:
    man = read_manifest(spark, out_dir)
    if man is None:
        return list(range(n_buckets))
    done = {
        r["part"]
        for r in man.where(
            (F.col("tier") == tier) & (F.col("snapshot_id") == snapshot_id)
        )
        .select("part")
        .collect()
    }
    return [p for p in range(n_buckets) if p not in done]


def run_retention(
    pages: DataFrame,
    out_dir: str,
    snapshot_id: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    n_buckets: int = 8,
    chunk_rows: int = DEFAULT_CHUNK,
    salted: bool = False,
    container_tiers: tuple[str, ...] = ("1m", "1h", "1d"),
) -> dict:
    """Execute the cascade; returns {tier: {parts_written, skipped, ...}}.

    ``salted=False`` by default: the tier measures are all algebraic, so
    Catalyst's map-side partial aggregation already combines hot
    (url, bucket) keys before the shuffle — measured, the explicit
    two-phase salt costs a second full shuffle for identical output. Set
    ``salted=True`` for non-algebraic extensions or pathological single-key
    skew; equivalence is oracle-verified (rollup_1d_salted query)."""
    spark = pages.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    report: dict = {}
    finer: DataFrame | None = None
    for tier in tiers:
        t0 = time.perf_counter()
        if finer is None:
            derive = R.derive_series_salted if salted else R.derive_series
            series = derive(pages, tier)
        else:
            series = R.cascade(finer, tier)
        series = series.withColumn(
            "part", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        # materialize the tier series once: feeds both this tier's encode
        # and the next tier's cascade (raw pages scanned exactly once)
        series_path = os.path.join(out_dir, f"snap={snapshot_id}", f"series_tier={tier}")
        series.write.mode("overwrite").parquet(series_path)
        series = spark.read.parquet(series_path)
        pending = _pending_parts(spark, out_dir, tier, snapshot_id, n_buckets)
        enc_path = os.path.join(out_dir, f"snap={snapshot_id}", f"encoded_tier={tier}")
        if pending:
            # the multi-series container amortizes blob framing across all
            # series of a partition AND gives the deflate post-pass
            # cross-series redundancy (measured: 1m 4.8->7.7x, 1h
            # 4.9->8.8x, 1d 1.7->4.7x). Pass container_tiers=() for
            # per-series rows when the store must serve single-url reads.
            encoder = (
                encode_series_container if tier in container_tiers else encode_series
            )
            enc = encoder(
                series.where(F.col("part").isin(pending)),
                key_cols=["url"],
                part_col="part",
                value_cols=MEASURES,
                chunk_rows=chunk_rows,
            )
            enc.write.partitionBy("part").mode("overwrite").parquet(enc_path)
            enc_done = spark.read.parquet(enc_path).where(F.col("part").isin(pending))
            stats = (
                enc_done.groupBy("part")
                .agg(
                    F.count(F.lit(1)).alias("n_chunks"),
                    F.sum("n").alias("n_rows"),
                    F.sum("raw_bytes").alias("raw_bytes"),
                    F.sum("comp_bytes").alias("comp_bytes"),
                    F.sum("encode_secs").alias("encode_secs"),
                    F.min("start_bucket").alias("min_bucket"),
                )
                .withColumn("tier", F.lit(tier))
                .withColumn("snapshot_id", F.lit(snapshot_id))
                .withColumn("wall_secs", F.lit(time.perf_counter() - t0))
            )
            stats.write.mode("append").parquet(_manifest_path(out_dir))
        report[tier] = {
            "parts_written": len(pending),
            "parts_skipped": n_buckets - len(pending),
            "series_path": series_path,
            "encoded_path": enc_path,
        }
        finer = series
    return report


def tier_ratio_report(spark: SparkSession, out_dir: str, snapshot_id: str) -> dict:
    """Compression ratio + throughput per tier from the manifest."""
    man = read_manifest(spark, out_dir)
    if man is None:
        return {}
    rows = (
        man.where(F.col("snapshot_id") == snapshot_id)
        .groupBy("tier")
        .agg(
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("comp_bytes").alias("comp"),
            F.sum("encode_secs").alias("enc_s"),
        )
        .collect()
    )
    return {
        r["tier"]: {
            "rows": r["rows"],
            "raw_bytes": r["raw"],
            "comp_bytes": r["comp"],
            "ratio": r["raw"] / r["comp"] if r["comp"] else None,
            "encode_rows_per_sec": r["rows"] / r["enc_s"] if r["enc_s"] else None,
        }
        for r in rows
    }


def read_tier_decoded(
    spark: SparkSession, out_dir: str, snapshot_id: str, tier: str
) -> DataFrame:
    """Read an encoded tier back as decoded rows, dispatching on the
    stored format (per-series chunks vs multi-series containers)."""
    enc = spark.read.parquet(
        os.path.join(out_dir, f"snap={snapshot_id}", f"encoded_tier={tier}")
    )
    if "keys" in enc.columns:  # container format
        return decode_series_container(enc, key_cols=["url"], value_cols=MEASURES)
    return decode_series(enc, key_cols=["url"], value_cols=MEASURES)


def query_tier(
    spark: SparkSession, out_dir: str, snapshot_id: str, tier: str, value_col: str
) -> DataFrame:
    """Per-url sum/max/min/count of a measure straight from the encoded
    tier store — query-on-compressed dispatching on the stored format;
    never materializes the decoded tier."""
    from sprintz_spark.operators.encode import query_encoded, query_encoded_container

    enc = spark.read.parquet(
        os.path.join(out_dir, f"snap={snapshot_id}", f"encoded_tier={tier}")
    )
    if "keys" in enc.columns:
        return query_encoded_container(enc, value_col, key_col="url")
    return query_encoded(enc, value_col, key_cols=["url"])


def compact_tiers(
    spark: SparkSession,
    out_dir: str,
    snapshot_ids: list[str],
    dest_snapshot_id: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    n_buckets: int = 8,
    chunk_rows: int = DEFAULT_CHUNK,
) -> dict:
    """Merge several snapshots' encoded tiers into one compacted snapshot.

    The small-files problem at scale: incremental retention runs write one
    snapshot per ingest slice, so a partition's series ends up split into
    many short chunks (each paying head + first-value overhead, and each a
    separate parquet row). Compaction decodes the source snapshots,
    merges, re-chunks at full ``chunk_rows``, and writes a single
    container-format snapshot — same read API (`read_tier_decoded` /
    `query_tier` / `read_tier_range`) afterwards.

    Conflict rule: ``snapshot_ids`` is oldest-to-newest; when the same
    (url, bucket) point exists in several source snapshots (re-crawl,
    backfill), the NEWEST snapshot's values win — resolved with one
    max_by aggregation (single shuffle), not a window.

    Lineage: the compacted snapshot appends normal manifest rows under
    ``dest_snapshot_id`` plus a ``lineage`` JSON (source snapshot ids,
    per-tier chunk counts before/after) at snap=<dest>/lineage.json.

    Returns {tier: {src_chunks, dst_chunks, rows}}.
    """
    import json as _json
    from urllib.parse import urlparse

    report: dict = {}
    lineage: dict = {"source_snapshots": list(snapshot_ids), "tiers": {}}
    # resume idempotence (mirrors run_retention's _pending_parts): a tier
    # whose (tier, dest_snapshot_id) manifest rows already exist was fully
    # compacted by a prior run — re-running must not append a second set
    # of rows (which would double-count bytes in tier_ratio_report)
    man = read_manifest(spark, out_dir)
    done_tiers: set = set()
    if man is not None:
        done_tiers = {
            r["tier"]
            for r in man.where(F.col("snapshot_id") == dest_snapshot_id)
            .select("tier")
            .distinct()
            .collect()
        }
    for tier in tiers:
        if tier in done_tiers:
            enc_done = spark.read.parquet(
                os.path.join(out_dir, f"snap={dest_snapshot_id}", f"encoded_tier={tier}")
            )
            agg = enc_done.agg(
                F.count(F.lit(1)).alias("c"), F.sum("n").alias("r")
            ).collect()[0]
            report[tier] = {
                "src_chunks": None,
                "dst_chunks": agg["c"],
                "rows": agg["r"],
                "skipped": True,
            }
            lineage["tiers"][tier] = report[tier]
            continue
        t0 = time.perf_counter()
        decs = []
        src_meta = None
        for ord_, sid in enumerate(snapshot_ids):
            enc = spark.read.parquet(
                os.path.join(out_dir, f"snap={sid}", f"encoded_tier={tier}")
            )
            m = enc.select(F.lit(1).alias("one"))
            src_meta = m if src_meta is None else src_meta.unionAll(m)
            dec = (
                decode_series_container(enc, key_cols=["url"], value_cols=MEASURES)
                if "keys" in enc.columns
                else decode_series(enc, key_cols=["url"], value_cols=MEASURES)
            )
            decs.append(dec.withColumn("_snap_ord", F.lit(ord_)))
        # one job counts source chunks across all snapshots (was one per)
        src_chunks = src_meta.count()
        merged = decs[0]
        for d in decs[1:]:
            merged = merged.unionByName(d)
        # newest-snapshot-wins per (url, bucket): one hash aggregation
        merged = merged.groupBy("url", "bucket").agg(
            *[F.max_by(c, "_snap_ord").alias(c) for c in MEASURES]
        )
        merged = merged.withColumn(
            "part", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        enc_path = os.path.join(
            out_dir, f"snap={dest_snapshot_id}", f"encoded_tier={tier}"
        )
        enc = encode_series_container(
            merged,
            key_cols=["url"],
            part_col="part",
            value_cols=MEASURES,
            chunk_rows=chunk_rows,
        )
        enc.write.partitionBy("part").mode("overwrite").parquet(enc_path)
        enc_done = spark.read.parquet(enc_path)
        stats = (
            enc_done.groupBy("part")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum("n").alias("n_rows"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("comp_bytes").alias("comp_bytes"),
                F.sum("encode_secs").alias("encode_secs"),
                F.min("start_bucket").alias("min_bucket"),
            )
            .withColumn("tier", F.lit(tier))
            .withColumn("snapshot_id", F.lit(dest_snapshot_id))
            .withColumn("wall_secs", F.lit(time.perf_counter() - t0))
        )
        # collect the per-part stats once (one pass over the chunk
        # metadata), append them to the manifest from local rows, and
        # derive the report's totals from the same rows — the prior
        # shape traversed enc_done twice (stats write + a second agg)
        stats_rows = stats.collect()
        spark.createDataFrame(stats_rows, stats.schema).write.mode(
            "append"
        ).parquet(_manifest_path(out_dir))
        report[tier] = {
            "src_chunks": src_chunks,
            "dst_chunks": sum(r["n_chunks"] for r in stats_rows),
            "rows": sum(r["n_rows"] for r in stats_rows),
        }
        lineage["tiers"][tier] = report[tier]
    lin_path = os.path.join(out_dir, f"snap={dest_snapshot_id}", "lineage.json")
    if urlparse(out_dir).scheme in ("", "file"):
        with open(lin_path, "w") as f:
            _json.dump(lineage, f)
    else:
        # object-store out_dir: a driver-local open() cannot write there;
        # route through Spark's Hadoop filesystem like every other artifact
        spark.createDataFrame(
            [(_json.dumps(lineage),)], "lineage string"
        ).coalesce(1).write.mode("overwrite").text(lin_path + ".d")
    return report


def read_tier_range(
    spark: SparkSession,
    out_dir: str,
    snapshot_id: str,
    tier: str,
    lo,
    hi,
) -> DataFrame:
    """Decoded tier rows restricted to [lo, hi]: blobs whose
    [start_bucket, end_bucket] window misses the range are pruned at the
    parquet scan (column min/max stats — no decode, no read of the blob
    bytes), then exact row filtering happens after decode."""
    enc = spark.read.parquet(
        os.path.join(out_dir, f"snap={snapshot_id}", f"encoded_tier={tier}")
    ).where((F.col("start_bucket") <= F.lit(hi)) & (F.col("end_bucket") >= F.lit(lo)))
    if "keys" in enc.columns:
        dec = decode_series_container(enc, key_cols=["url"], value_cols=MEASURES)
    else:
        dec = decode_series(enc, key_cols=["url"], value_cols=MEASURES)
    return dec.where((F.col("bucket") >= F.lit(lo)) & (F.col("bucket") <= F.lit(hi)))


def expire_tier(
    spark: SparkSession,
    out_dir: str,
    snapshot_id: str,
    tier: str,
    older_than,
    dry_run: bool = False,
) -> dict:
    """TTL expiry for one retention tier: drop encoded CHUNKS whose
    entire bucket range lies before ``older_than`` (e.g. keep the 1m
    tier 7 days, 1h 90 days, 1d forever — the standard tiered-retention
    policy this store exists for).

    Chunk-granular and conservative: a chunk straddling the cutoff is
    kept in full (no decode/re-encode, no data loss at the boundary);
    the filter is the same [start_bucket, end_bucket] metadata that
    read_tier_range prunes on, so expiry cost is a metadata-filtered
    parquet rewrite of the surviving chunks, never a codec pass.

    The rewrite is staged to a sibling directory and swapped in with two
    renames. NOT atomic, but SELF-HEALING: every entry first runs
    _recover_swap, which promotes a completed `.expiring` dir (or
    restores `.expired`) if a prior run crashed mid-swap, and a promoted
    store forces the manifest reconciliation below even when no further
    chunks expire — so rerunning after a crash at ANY point converges to
    the clean-run state (fault-injection tested in test_retention).
    Data is never destroyed before the new dir is in place.
    Object-store deployments would swap a metadata pointer instead
    (same guard as lineage.json). An audit row lands in
    <out_dir>/expiry_log, and the
    tier's manifest rows are recomputed from the surviving chunks so
    tier_ratio_report never counts expired bytes.
    """
    enc_path = os.path.join(out_dir, f"snap={snapshot_id}", f"encoded_tier={tier}")
    # heal any interrupted prior swap before reading (crash-idempotence).
    # NEVER from a dry run — a preview must not rename or delete anything;
    # if the store needs healing, tell the operator instead of mutating.
    if dry_run:
        recovery = None
        if not os.path.exists(enc_path) and (
            os.path.exists(enc_path + ".expiring")
            or os.path.exists(enc_path + ".expired")
        ):
            raise ValueError(
                f"{enc_path} has an interrupted expiry swap; run expire_tier "
                "without dry_run to heal it before previewing"
            )
    else:
        recovery = _recover_swap(enc_path, ".expiring", ".expired")
        _recover_swap(_manifest_path(out_dir), ".rewriting", ".old")
    enc = spark.read.parquet(enc_path)
    keep = enc.where(F.col("end_bucket") >= F.lit(older_than))
    # one metadata pass for total/kept/dropped (this frame is chunk
    # metadata — tiny — but at 10^12-doc scale it is still millions of
    # chunk rows; three separate jobs over it were pure scheduler tax)
    _dead = F.col("end_bucket") < F.lit(older_than)
    _m = enc.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(_dead, 1).otherwise(0)).alias("dropped"),
        F.sum(F.when(_dead, F.col("n"))).alias("r"),
        F.sum(F.when(_dead, F.col("raw_bytes"))).alias("b"),
    ).collect()[0]
    total = _m["total"]
    kept = total - int(_m["dropped"] or 0)
    dropped_rows = _m
    report = {
        "tier": tier,
        "chunks_total": total,
        "chunks_dropped": total - kept,
        "rows_dropped": int(dropped_rows["r"] or 0),
        "raw_bytes_dropped": int(dropped_rows["b"] or 0),
        "dry_run": dry_run,
    }
    # A prior run may have crashed after swapping the encoded dir but
    # before (or during) the manifest rewrite: the store already holds
    # the post-expiry chunks while the manifest still counts the expired
    # ones. Detect by comparing the manifest's chunk count for this
    # (tier, snapshot) against the store — disagreement (or a recovery
    # that promoted a staged dir) forces the reconciliation below even
    # when nothing further drops.
    man0 = read_manifest(spark, out_dir)
    man_stale = False
    if man0 is not None:
        man_chunks = (
            man0.where(
                (F.col("tier") == tier) & (F.col("snapshot_id") == snapshot_id)
            )
            .agg(F.sum("n_chunks"))
            .first()[0]
        )
        man_stale = man_chunks is not None and int(man_chunks) != total
    if dry_run or (
        total == kept and recovery != "promoted_staged" and not man_stale
    ):
        return report
    import shutil

    if total != kept:
        staged = enc_path + ".expiring"
        keep.write.mode("overwrite").parquet(staged)
        old = enc_path + ".expired"
        os.rename(enc_path, old)
        os.rename(staged, enc_path)
        shutil.rmtree(old)
    # recompute this (tier, snapshot)'s manifest rows from the surviving
    # chunks — otherwise tier_ratio_report and any manifest-vs-store
    # reconciliation keep counting the expired chunks' bytes and rows
    man = man0
    if man is not None:
        enc_done = spark.read.parquet(enc_path)
        fresh = (
            enc_done.groupBy("part")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum("n").alias("n_rows"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("comp_bytes").alias("comp_bytes"),
                F.sum("encode_secs").alias("encode_secs"),
                F.min("start_bucket").alias("min_bucket"),
            )
            .withColumn("tier", F.lit(tier))
            .withColumn("snapshot_id", F.lit(snapshot_id))
            .withColumn("wall_secs", F.lit(0.0))
        )
        others = man.where(
            ~((F.col("tier") == tier) & (F.col("snapshot_id") == snapshot_id))
        )
        staged_m = _manifest_path(out_dir) + ".rewriting"
        others.unionByName(fresh.select(*man.columns)).write.mode(
            "overwrite"
        ).parquet(staged_m)
        old_m = _manifest_path(out_dir) + ".old"
        os.rename(_manifest_path(out_dir), old_m)
        os.rename(staged_m, _manifest_path(out_dir))
        shutil.rmtree(old_m)
    log_row = [
        (
            tier,
            snapshot_id,
            str(older_than),
            report["chunks_dropped"],
            report["rows_dropped"],
            report["raw_bytes_dropped"],
            float(time.time()),
        )
    ]
    spark.createDataFrame(
        log_row,
        "tier string, snapshot_id string, cutoff string, chunks_dropped long,"
        " rows_dropped long, raw_bytes_dropped long, at double",
    ).write.mode("append").parquet(os.path.join(out_dir, "expiry_log"))
    return report


def expire_snapshots(
    spark: SparkSession, out_dir: str, keep_ids: list[str]
) -> dict:
    """Garbage-collect whole snapshots after compaction: rewrite the
    manifest WITHOUT the doomed snapshots' rows first, then delete their
    snap=<id> directories. Ordering matters for crash safety: a crash
    after the manifest swap but before the deletes leaves only orphan
    directories (harmless, re-runnable); the reverse order could leave
    manifest rows pointing at deleted data. The manifest swap itself is
    two renames — a crash between them leaves `.rewriting`/`.old`
    siblings to recover from, never a destroyed manifest. The compacted
    snapshot's lineage.json still records which sources it merged."""
    import shutil

    _recover_swap(_manifest_path(out_dir), ".rewriting", ".old")
    keep = set(keep_ids)
    doomed = [
        name.split("=", 1)[1]
        for name in sorted(os.listdir(out_dir))
        if name.startswith("snap=") and name.split("=", 1)[1] not in keep
    ]
    man = read_manifest(spark, out_dir)
    if man is not None and doomed:
        staged = _manifest_path(out_dir) + ".rewriting"
        man.where(F.col("snapshot_id").isin(list(keep))).write.mode(
            "overwrite"
        ).parquet(staged)
        old = _manifest_path(out_dir) + ".old"
        os.rename(_manifest_path(out_dir), old)
        os.rename(staged, _manifest_path(out_dir))
        shutil.rmtree(old)
    for sid in doomed:
        shutil.rmtree(os.path.join(out_dir, f"snap={sid}"))
    return {"dropped_snapshots": doomed, "kept": sorted(keep)}
