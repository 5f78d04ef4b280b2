"""Retention cascade + checkpoint/resume tests (FIXTURES.md F6 resume
fixture: run, truncate manifest after partition k, re-run, assert
byte-identical tier output and that completed partitions were skipped)."""

import glob
import os
import shutil

import pandas as pd
from pyspark.sql import functions as F

from sprintz_spark.operators.encode import decode_series
from sprintz_spark.plans import retention as RT


def _decode_tier(spark, out_dir, tier, snap="snapA"):
    df = RT.read_tier_decoded(spark, out_dir, snap, tier)
    return (
        df.toPandas()
        .sort_values(["url", "bucket"])
        .reset_index(drop=True)[["url", "bucket", *RT.MEASURES]]
    )


def test_retention_run_and_resume(spark, pages_small, tmp_path):
    out1 = str(tmp_path / "ret1")
    rep = RT.run_retention(pages_small, out1, snapshot_id="snapA", n_buckets=4)
    assert all(r["parts_written"] == 4 for r in rep.values())

    # tier outputs decode to exactly the plain rollup results
    from sprintz_spark.operators import rollup as R

    for tier in ("1m", "1h", "1d"):
        expect = (
            R.rollup_tiers(pages_small)[tier]
            .toPandas()
            .sort_values(["url", "bucket"])
            .reset_index(drop=True)
        )
        got = _decode_tier(spark, out1, tier)
        pd.testing.assert_frame_equal(expect[got.columns], got)

    # re-run same snapshot: everything skipped
    rep2 = RT.run_retention(pages_small, out1, snapshot_id="snapA", n_buckets=4)
    assert all(r["parts_written"] == 0 for r in rep2.values())

    # truncate manifest: drop rows for two 1h partitions -> only those rerun
    man_path = os.path.join(out1, "manifest")
    man = spark.read.parquet(man_path).toPandas()
    keep = man[~((man.tier == "1h") & (man.part.isin([0, 1])))]
    shutil.rmtree(man_path)
    spark.createDataFrame(keep).write.parquet(man_path)
    rep3 = RT.run_retention(pages_small, out1, snapshot_id="snapA", n_buckets=4)
    assert rep3["1h"]["parts_written"] == 2
    assert rep3["1m"]["parts_written"] == 0 and rep3["1d"]["parts_written"] == 0

    # resumed output is byte-identical to a clean single run
    out2 = str(tmp_path / "ret2")
    RT.run_retention(pages_small, out2, snapshot_id="snapA", n_buckets=4)
    for tier in ("1m", "1h", "1d"):
        a = _decode_tier(spark, out1, tier)
        b = _decode_tier(spark, out2, tier)
        pd.testing.assert_frame_equal(a, b)

    ratios = RT.tier_ratio_report(spark, out2, "snapA")
    assert set(ratios) == {"1m", "1h", "1d"}
    assert all(v["rows"] > 0 and v["ratio"] > 0 for v in ratios.values())


def test_query_tier_from_store(spark, pages_small, tmp_path):
    """query_tier answers per-url aggregates from the encoded store
    (container format) equal to aggregating the raw tier."""
    import pandas as pd

    from sprintz_spark.operators import rollup as R

    out = str(tmp_path / "retq")
    RT.run_retention(pages_small, out, snapshot_id="snapQ", n_buckets=4)
    got = (
        RT.query_tier(spark, out, "snapQ", "1h", "byte_size_sum")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        R.derive_series(pages_small, "1h")
        .groupBy("url")
        .agg(
            F.sum("byte_size_sum").alias("byte_size_sum_sum"),
            F.max("byte_size_sum").alias("byte_size_sum_max"),
            F.min("byte_size_sum").alias("byte_size_sum_min"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_read_tier_range_prunes_and_matches(spark, pages_small, tmp_path):
    """Time-range reads: blob-level pruning on [start_bucket, end_bucket]
    + exact post-decode filter equals filtering the raw tier."""
    import datetime as dt

    import pandas as pd

    from sprintz_spark.operators import rollup as R

    out = str(tmp_path / "retr")
    RT.run_retention(pages_small, out, snapshot_id="snapR", n_buckets=4)
    t = R.derive_series(pages_small, "1h").toPandas()
    lo = t["bucket"].quantile(0.3).to_pydatetime()
    hi = t["bucket"].quantile(0.6).to_pydatetime()
    got = (
        RT.read_tier_range(spark, out, "snapR", "1h", lo, hi)
        .toPandas().sort_values(["url", "bucket"]).reset_index(drop=True)
    )
    want = (
        t[(t["bucket"] >= lo) & (t["bucket"] <= hi)]
        .sort_values(["url", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # the predicate reaches the parquet scan (stats-based row-group skip)
    enc = spark.read.parquet(out + "/snap=snapR/encoded_tier=1h").where(
        (F.col("start_bucket") <= F.lit(hi)) & (F.col("end_bucket") >= F.lit(lo))
    )
    import io as sio, contextlib
    buf = sio.StringIO()
    with contextlib.redirect_stdout(buf):
        enc.explain("simple")
    assert "PushedFilters: [" in buf.getvalue()
    assert "LessThanOrEqual(start_bucket" in buf.getvalue()


def test_expire_tier_drops_old_chunks_conservatively(spark, pages_small, tmp_path):
    """TTL expiry: chunks fully before the cutoff disappear, a chunk
    straddling the cutoff survives in full, and the decoded remainder
    equals the rollup filtered by the surviving chunks' coverage."""
    from pyspark.sql import functions as F

    from sprintz_spark.plans import retention as RT

    out = str(tmp_path / "store")
    RT.run_retention(pages_small, out, snapshot_id="s1", n_buckets=2, chunk_rows=8)
    before = RT.read_tier_decoded(spark, out, "s1", "1h").toPandas()
    cutoff = sorted(before["bucket"].unique())[len(before["bucket"].unique()) // 2]

    dry = RT.expire_tier(spark, out, "s1", "1h", cutoff, dry_run=True)
    assert dry["dry_run"] and dry["chunks_dropped"] > 0
    # dry run changed nothing
    assert len(RT.read_tier_decoded(spark, out, "s1", "1h").toPandas()) == len(before)

    rep = RT.expire_tier(spark, out, "s1", "1h", cutoff)
    assert rep["chunks_dropped"] == dry["chunks_dropped"]
    after = RT.read_tier_decoded(spark, out, "s1", "1h").toPandas()
    # conservative: everything at/after the cutoff is still there
    want = before[before["bucket"] >= cutoff]
    assert len(after) >= len(want)
    got_keys = set(zip(after["url"], after["bucket"]))
    assert set(zip(want["url"], want["bucket"])) <= got_keys
    # nothing fully-expired survives: every remaining chunk's range ends
    # at or after the cutoff
    enc = spark.read.parquet(f"{out}/snap=s1/encoded_tier=1h")
    assert enc.where(F.col("end_bucket") < F.lit(cutoff)).count() == 0
    # audit row recorded
    log = spark.read.parquet(f"{out}/expiry_log").collect()
    assert log and log[0]["chunks_dropped"] == rep["chunks_dropped"]
    # manifest recomputed: no stale bytes from expired chunks
    man = RT.read_manifest(spark, out)
    man_raw = (
        man.where((F.col("tier") == "1h") & (F.col("snapshot_id") == "s1"))
        .agg(F.sum("raw_bytes"))
        .first()[0]
    )
    store_raw = enc.agg(F.sum("raw_bytes")).first()[0]
    assert man_raw == store_raw


def test_expire_snapshots_gc_after_compaction(spark, pages_small, tmp_path):
    import os

    from pyspark.sql import functions as F

    from sprintz_spark.plans import retention as RT

    out = str(tmp_path / "store")
    split = pages_small.agg(
        F.date_trunc("day", F.min("warc_ts")) + F.expr("INTERVAL 2 DAYS")
    ).collect()[0][0]
    RT.run_retention(
        pages_small.where(F.col("warc_ts") < F.lit(split)), out, "s1",
        n_buckets=2, chunk_rows=8,
    )
    RT.run_retention(
        pages_small.where(F.col("warc_ts") >= F.lit(split)), out, "s2",
        n_buckets=2, chunk_rows=8,
    )
    RT.compact_tiers(spark, out, ["s1", "s2"], "c1", n_buckets=2)
    full = RT.read_tier_decoded(spark, out, "c1", "1h").toPandas()

    rep = RT.expire_snapshots(spark, out, keep_ids=["c1"])
    assert sorted(rep["dropped_snapshots"]) == ["s1", "s2"]
    assert not os.path.exists(f"{out}/snap=s1")
    # compacted snapshot intact and readable
    still = RT.read_tier_decoded(spark, out, "c1", "1h").toPandas()
    assert len(still) == len(full)
    # manifest rewritten without the dropped snapshots' rows
    man = RT.read_manifest(spark, out)
    sids = {r["snapshot_id"] for r in man.select("snapshot_id").distinct().collect()}
    assert sids == {"c1"}


# --- fault injection: crash windows of the staged+rename swaps -------------

class _CrashAt:
    """Make os.rename raise on its Nth call (1-based), simulating a kill
    at that exact point of the swap protocol."""

    def __init__(self, n):
        self.n, self.calls, self.real = n, 0, os.rename

    def __call__(self, src, dst):
        self.calls += 1
        if self.calls == self.n:
            raise OSError(f"injected crash at rename #{self.n}: {src} -> {dst}")
        return self.real(src, dst)


def _expired_store(spark, pages_small, tmp_path, name):
    out = str(tmp_path / name)
    RT.run_retention(pages_small, out, snapshot_id="s1", n_buckets=2, chunk_rows=8)
    before = RT.read_tier_decoded(spark, out, "s1", "1h").toPandas()
    cutoff = sorted(before["bucket"].unique())[len(before["bucket"].unique()) // 2]
    return out, cutoff


def _tier_state(spark, out):
    enc = spark.read.parquet(f"{out}/snap=s1/encoded_tier=1h").toPandas()
    man = RT.read_manifest(spark, out).toPandas()
    return (
        enc.sort_values(["part", "chunk"]).reset_index(drop=True),
        man.sort_values(["tier", "snapshot_id", "part"]).reset_index(drop=True),
    )


def test_expire_tier_crash_windows_idempotent(spark, pages_small, tmp_path, monkeypatch):
    """Kill expire_tier at every rename of its two swaps; a plain rerun
    must converge to the clean-run state with the store readable at
    every intermediate point. Rename order: 1-2 = encoded-dir swap,
    3-4 = manifest swap."""
    # clean reference run
    ref_out, cutoff = _expired_store(spark, pages_small, tmp_path, "ref")
    ref_rep = RT.expire_tier(spark, ref_out, "s1", "1h", cutoff)
    ref_enc, ref_man = _tier_state(spark, ref_out)

    for n in (1, 2, 3, 4):
        out, cut = _expired_store(spark, pages_small, tmp_path, f"crash{n}")
        crash = _CrashAt(n)
        monkeypatch.setattr(RT.os, "rename", crash)
        try:
            RT.expire_tier(spark, out, "s1", "1h", cut)
            raise AssertionError(f"injected crash #{n} did not fire")
        except OSError as e:
            assert "injected crash" in str(e)
        finally:
            monkeypatch.setattr(RT.os, "rename", crash.real)
        # the store must still be fully readable right after the crash
        # (canonical dir OR a complete recoverable sibling)
        RT._recover_swap(f"{out}/snap=s1/encoded_tier=1h", ".expiring", ".expired")
        RT._recover_swap(RT._manifest_path(out), ".rewriting", ".old")
        assert len(RT.read_tier_decoded(spark, out, "s1", "1h").toPandas()) > 0
        # rerun heals and converges to the clean-run state
        rep = RT.expire_tier(spark, out, "s1", "1h", cut)
        enc, man = _tier_state(spark, out)
        pd.testing.assert_frame_equal(
            enc.drop(columns=["encode_secs"]), ref_enc.drop(columns=["encode_secs"])
        )
        agg_cols = ["tier", "snapshot_id", "part", "n_chunks", "n_rows", "raw_bytes"]
        pd.testing.assert_frame_equal(man[agg_cols], ref_man[agg_cols])
        # no stale swap siblings survive
        assert not os.path.exists(f"{out}/snap=s1/encoded_tier=1h.expiring")
        assert not os.path.exists(f"{out}/snap=s1/encoded_tier=1h.expired")
        assert not os.path.exists(RT._manifest_path(out) + ".rewriting")
        assert not os.path.exists(RT._manifest_path(out) + ".old")
        # second rerun is a no-op
        rep2 = RT.expire_tier(spark, out, "s1", "1h", cut)
        assert rep2["chunks_dropped"] == 0


def test_expire_snapshots_crash_windows_idempotent(spark, pages_small, tmp_path, monkeypatch):
    """Kill expire_snapshots at each manifest rename; rerun must leave
    exactly the kept snapshot, a consistent manifest, and no orphans."""
    for n in (1, 2):
        out = str(tmp_path / f"gc{n}")
        split = pages_small.agg(
            F.date_trunc("day", F.min("warc_ts")) + F.expr("INTERVAL 2 DAYS")
        ).collect()[0][0]
        RT.run_retention(
            pages_small.where(F.col("warc_ts") < F.lit(split)), out, "s1",
            n_buckets=2, chunk_rows=8,
        )
        RT.run_retention(
            pages_small.where(F.col("warc_ts") >= F.lit(split)), out, "s2",
            n_buckets=2, chunk_rows=8,
        )
        RT.compact_tiers(spark, out, ["s1", "s2"], "c1", n_buckets=2)
        full = RT.read_tier_decoded(spark, out, "c1", "1h").toPandas()

        crash = _CrashAt(n)
        monkeypatch.setattr(RT.os, "rename", crash)
        try:
            RT.expire_snapshots(spark, out, keep_ids=["c1"])
            raise AssertionError(f"injected crash #{n} did not fire")
        except OSError as e:
            assert "injected crash" in str(e)
        finally:
            monkeypatch.setattr(RT.os, "rename", crash.real)
        # crash happened BEFORE any snap dir delete (manifest-first
        # ordering): all data dirs still present
        assert os.path.exists(f"{out}/snap=s1") and os.path.exists(f"{out}/snap=c1")
        rep = RT.expire_snapshots(spark, out, keep_ids=["c1"])
        assert sorted(rep["dropped_snapshots"]) == ["s1", "s2"]
        assert not os.path.exists(f"{out}/snap=s1")
        still = RT.read_tier_decoded(spark, out, "c1", "1h").toPandas()
        assert len(still) == len(full)
        man = RT.read_manifest(spark, out)
        sids = {r["snapshot_id"] for r in man.select("snapshot_id").distinct().collect()}
        assert sids == {"c1"}
        assert not os.path.exists(RT._manifest_path(out) + ".rewriting")
        assert not os.path.exists(RT._manifest_path(out) + ".old")


def test_expire_tier_dry_run_never_mutates_interrupted_store(spark, pages_small, tmp_path, monkeypatch):
    """A dry run must not heal (rename/delete) an interrupted swap — it
    raises and tells the operator to run a real pass instead."""
    out, cut = _expired_store(spark, pages_small, tmp_path, "dryrun")
    crash = _CrashAt(2)  # between the encoded-dir renames
    monkeypatch.setattr(RT.os, "rename", crash)
    try:
        RT.expire_tier(spark, out, "s1", "1h", cut)
    except OSError:
        pass
    finally:
        monkeypatch.setattr(RT.os, "rename", crash.real)
    enc = f"{out}/snap=s1/encoded_tier=1h"
    state_before = {p: os.path.exists(enc + p) for p in ("", ".expiring", ".expired")}
    import pytest as _pt

    with _pt.raises(ValueError, match="interrupted expiry swap"):
        RT.expire_tier(spark, out, "s1", "1h", cut, dry_run=True)
    # nothing moved or was deleted
    assert state_before == {
        p: os.path.exists(enc + p) for p in ("", ".expiring", ".expired")
    }
    # a real run still heals
    RT.expire_tier(spark, out, "s1", "1h", cut)
    assert os.path.exists(enc) and not os.path.exists(enc + ".expiring")
