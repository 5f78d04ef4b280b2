"""Extra (non-driver) benchmarks for optimization A/Bs — guide §1.4.

bench.py is frozen for measurement, so targeted isolation harnesses live
here. Each mode prints one JSON line; nothing here is read by the driver.

Modes (first argv):
  decode    — replicate bench.py's decode-only region: fused-encode the
              cached 6M-row pages table once to parquet, then time the
              three per-tier decode_series jobs (noop sink), best-of-N.
  decode_container — container-format decode throughput on the 1d-shaped
              tiny-series slice (retention read-back / compact path).

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py;
     BENCH_EXTRA_TRIALS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from sprintz_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(f"local[{cpus}]")


def _pages(spark, n_rows: int):
    from sprintz_spark.sources.pages import generate_pages

    repo = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(repo, ".data", f"pages_bench_{n_rows}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        generate_pages(spark, n_rows).write.mode("overwrite").parquet(cache)
    return spark.read.parquet(cache)


def mode_decode() -> dict:
    from pyspark.sql import functions as F

    from sprintz_spark.plans.jobs import decode_fused_tier, fused_rollup_encode

    spark = _spark()
    big = _pages(spark, int(os.environ.get("BENCH_FUSED_ROWS", "6000000")))
    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "3"))
    with tempfile.TemporaryDirectory() as tmp:
        enc_path = os.path.join(tmp, "enc")
        fused_rollup_encode(big, codec="fire").write.parquet(enc_path)
        enc = spark.read.parquet(enc_path)
        n_points = enc.agg(F.sum("n")).first()[0]
        walls = []
        for _ in range(trials):
            t0 = time.perf_counter()
            for tier in ("1m", "1h", "1d"):
                decode_fused_tier(enc, tier).write.format("noop").mode(
                    "overwrite"
                ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        dw = min(walls)
    return {
        "metric": "decode_only",
        "decoded_points": int(n_points),
        "decode_points_per_sec": round(n_points / dw, 1),
        "walls": walls,
    }


def mode_decode_container() -> dict:
    from pyspark.sql import functions as F

    from sprintz_spark.operators.encode import (
        decode_series_container,
        encode_series_container,
    )
    from sprintz_spark.operators.rollup import derive_series

    spark = _spark()
    big = _pages(spark, int(os.environ.get("BENCH_FUSED_ROWS", "6000000")))
    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "3"))
    daily = derive_series(big, tier="1d")
    with tempfile.TemporaryDirectory() as tmp:
        enc_path = os.path.join(tmp, "enc")
        encode_series_container(daily).write.parquet(enc_path)
        enc = spark.read.parquet(enc_path)
        n_points = enc.agg(F.sum("n")).first()[0]
        walls = []
        for _ in range(trials):
            t0 = time.perf_counter()
            decode_series_container(enc).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
        dw = min(walls)
    return {
        "metric": "decode_container_only",
        "decoded_points": int(n_points),
        "decode_points_per_sec": round(n_points / dw, 1),
        "walls": walls,
    }


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "decode"
    out = {"decode": mode_decode, "decode_container": mode_decode_container}[
        mode
    ]()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
