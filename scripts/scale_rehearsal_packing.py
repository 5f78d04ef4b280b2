"""Skew rehearsal for pack_shards / global_prefix_sum (round-8 verdict
"next round" item 6: "one bucket holding 50% of tokens — does the
bucket-partitioned window leg stay balanced?").

global_prefix_sum buckets rows by equal-width ranges of order_col, and
the intra-bucket running sum is a window PARTITIONED BY bucket — one
task per bucket. Token-value skew is harmless (window work is per-ROW),
but id-DENSITY skew is the real axis: if half the corpus's doc_ids sit
in one narrow range (e.g. snowflake ids from one hot ingest hour) while
the rest spread over a range 4096x wider, the equal-width bucketing
drops ~half the rows into ONE bucket and its window task becomes the
straggler no AQE can split (AQE cannot subdivide a window partition).

This rehearsal synthesizes both shapes at the same row count and times
pack_shards end-to-end on each:

  * uniform  — ids 0..N-1 (every bucket ~N/4096 rows);
  * skewed   — N/2 ids packed into [0, R/4096) (bucket 0) and N/2
               spread over [R/4096, R), R = 4096 * N (so bucket 0
               holds ~50% of all rows AND ~50% of all tokens).

Verdict evidence sought: skewed wall <= ~1.5x uniform wall after the
hot-bucket refinement pass in global_prefix_sum (without refinement the
skewed leg serializes half the window work in one task).

Usage: python scripts/scale_rehearsal_packing.py [N_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synth(spark, n: int, skewed: bool):
    """Deterministic (doc_id, tokens) frame; tokens from a multiplicative
    hash so both shapes carry identical token mass per rank."""
    r = spark.range(n)  # id = 0..n-1
    if skewed:
        span = 4096 * n
        narrow = span // 4096  # == n: bucket-0 range at max_buckets=4096
        # even ranks -> dense cluster [0, n) stride 2; odd ranks -> sparse
        # tail over [narrow, span) stride ~2*4096. Disjoint, unique.
        doc_id = F.when(
            F.col("id") % 2 == 0, (F.col("id") / 2).cast("long") * 2
        ).otherwise(
            F.lit(narrow)
            + ((F.col("id") - 1) / 2).cast("long") * ((span - narrow) * 2 // n)
            + 1
        )
    else:
        doc_id = F.col("id")
    return r.select(
        doc_id.alias("doc_id"),
        (F.col("id") * F.lit(2654435761) % 997 + 3).alias("tokens"),
    )


def main() -> int:
    from sprintz_spark.operators.packing import pack_shards
    from sprintz_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(app="packing-skew-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for shape in ("uniform", "skewed"):
        df = synth(spark, n, skewed=(shape == "skewed")).persist()
        # persist + count so the timed region is pack_shards alone —
        # a bare count() let the optimizer skip materializing the synth
        # projection, which was then re-evaluated inside pack_shards'
        # persist pass (r9 ADVICE; affected both legs symmetrically, so
        # ratios were fair but absolute walls were inflated)
        df.count()
        t0 = time.time()
        out = pack_shards(df, capacity=4096)
        n_shards, tok = out.agg(
            F.count(F.lit(1)), F.sum("tokens_sum")
        ).first()
        wall = time.time() - t0
        results[shape] = wall
        df.unpersist()
        print(
            f"{shape:8s}: {wall:6.1f} s  shards={n_shards}  tokens={tok}",
            flush=True,
        )
    ratio = results["skewed"] / results["uniform"]
    print(f"skew/uniform wall ratio: {ratio:.2f} (target <= ~1.5)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
