"""Phase-level profiling of the staged lifecycle/conflict stores and the
streaming gates (r10 optimization round, guide §1: measure first).

Not part of the bench contract — a scratch harness to attribute the
retention_lifecycle / snapshot_conflict / stream_* walls to phases.

Usage: python scripts/profile_lifecycle.py [lifecycle|conflict|stream]
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:42s} {time.perf_counter() - t0:7.2f} s", flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "lifecycle"
    from sprintz_spark.queries import _t, queries
    from sprintz_spark.session import get_spark

    spark = get_spark(app="profile", extra={"spark.ui.showConsoleProgress": "false"})
    # warm JVM + worker pool like bench.py
    qmap = queries()
    qmap["topk_heavy_users"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    from sprintz_spark.plans import retention as RT

    if which == "lifecycle":
        import tempfile

        pages = _t(spark, SF_DIR, "events").select(
            F.concat(
                F.lit("https://u"), F.col("user_id") % 10, F.lit(".example/")
            ).alias("url"),
            F.col("ts").cast("timestamp").alias("warc_ts"),
            F.expr(
                "cast(repeat('x', cast(abs(cast(round(value*100, 0) as bigint)) % 997"
                " as int)) as binary)"
            ).alias("html"),
        )
        split = dt.datetime(2024, 1, 16)
        cutoff = dt.datetime(2024, 1, 15)
        out = tempfile.mkdtemp(prefix="prof_lifecycle_")
        pages = pages.cache()
        chunk_rows = t("pages.count (cache fill)", lambda: max(8, pages.count() // 1200))
        t(
            "run_retention s1",
            lambda: RT.run_retention(
                pages.where(F.col("warc_ts") < F.lit(split)),
                out, snapshot_id="s1", n_buckets=4,
                chunk_rows=chunk_rows, container_tiers=(),
            ),
        )
        t(
            "run_retention s2",
            lambda: RT.run_retention(
                pages.where(F.col("warc_ts") >= F.lit(split)),
                out, snapshot_id="s2", n_buckets=4,
                chunk_rows=chunk_rows, container_tiers=(),
            ),
        )
        t(
            "expire_tier s1/1m",
            lambda: RT.expire_tier(spark, out, "s1", "1m", older_than=cutoff),
        )
        t(
            "compact_tiers",
            lambda: RT.compact_tiers(spark, out, ["s1", "s2"], "c1", n_buckets=4),
        )
        pages.unpersist()

        def read_back():
            cols = ["url", "bucket", *RT.MEASURES]
            t1m = (
                RT.read_tier_decoded(spark, out, "c1", "1m")
                .where(F.col("bucket") >= F.lit(cutoff))
                .select(F.lit("1m").alias("tier"), *cols)
            )
            t1h = RT.read_tier_decoded(spark, out, "c1", "1h").select(
                F.lit("1h").alias("tier"), *cols
            )
            t1d = RT.read_tier_decoded(spark, out, "c1", "1d").select(
                F.lit("1d").alias("tier"), *cols
            )
            t1m.unionByName(t1h).unionByName(t1d).write.format("noop").mode(
                "overwrite"
            ).save()

        t("read-back (query body, noop)", read_back)
        t("read-back again (warm)", read_back)

    elif which == "conflict":
        import tempfile

        lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 14)
        ev = _t(spark, SF_DIR, "events").select("user_id", "ts", "value").cache()

        def pages(nbytes_sql):
            return ev.select(
                F.concat(
                    F.lit("https://u"), F.col("user_id") % 10, F.lit(".example/")
                ).alias("url"),
                F.col("ts").cast("timestamp").alias("warc_ts"),
                F.expr(f"cast(repeat('x', cast({nbytes_sql} as int)) as binary)")
                .alias("html"),
            )

        base = "abs(cast(round(value*100, 0) as bigint)) % 997"
        s1 = pages(base)
        s2 = pages(f"{base} + 1000").where(
            (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") < F.lit(hi))
        )
        out = tempfile.mkdtemp(prefix="prof_conflict_")
        t("ev.count (cache fill)", lambda: ev.count())
        t(
            "run_retention s1 (1h,1d)",
            lambda: RT.run_retention(
                s1, out, snapshot_id="s1", tiers=("1h", "1d"), n_buckets=4
            ),
        )
        t(
            "run_retention s2 (1h,1d)",
            lambda: RT.run_retention(
                s2, out, snapshot_id="s2", tiers=("1h", "1d"), n_buckets=4
            ),
        )
        t(
            "compact_tiers (1h,1d)",
            lambda: RT.compact_tiers(
                spark, out, ["s1", "s2"], "c1", tiers=("1h", "1d"), n_buckets=4
            ),
        )
        ev.unpersist()

        def read_back():
            cols = ["url", "bucket", *RT.MEASURES]
            t1h = RT.read_tier_decoded(spark, out, "c1", "1h").select(
                F.lit("1h").alias("tier"), *cols
            )
            t1d = RT.read_tier_decoded(spark, out, "c1", "1d").select(
                F.lit("1d").alias("tier"), *cols
            )
            t1h.unionByName(t1d).write.format("noop").mode("overwrite").save()

        t("read-back (query body, noop)", read_back)

    elif which == "stream":
        for name in (
            "stream_rollup_1m",
            "stream_m4",
            "stream_sessionize",
            "stream_dedup_docs",
            "stream_gap_alerts",
        ):
            t(
                name,
                lambda n=name: qmap[n](spark, SF_DIR)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

    spark.stop()


if __name__ == "__main__":
    main()
