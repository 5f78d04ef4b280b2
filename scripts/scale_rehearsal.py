"""sf1 scale rehearsal for the dedup/CC family (round-4 verdict item 7).

The 100-TB claims for LSH bucket capping and O(diameter) connected
components were extrapolated from sf0.1-sized corpora (5k docs). This
script synthesizes a deterministic 10x corpus (50k docs = sf1-equivalent)
from the sf0.1 documents table — copy 0 is the original; copies 1..9
shift doc_id by k*N with every odd copy's text perturbed (one appended
token), so the corpus carries 50k-doc-scale exact-dup clusters (size >=5)
AND near-dup structure — then runs the full pipeline and reports:

  * minhash_lsh_pairs wall time, candidate-pair count,
    bucket-cap drop counts (dropped_buckets / dropped_rows);
  * connected_components wall time, rounds to convergence, edges, nodes;
  * cluster-size histogram head.

Results go into BASELINE.md ("sf1 dedup/CC rehearsal").

Usage: python scripts/scale_rehearsal.py [n_copies]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from sprintz_spark.operators.dedup import minhash_lsh_pairs
    from sprintz_spark.operators.graph import connected_components
    from sprintz_spark.session import get_spark

    spark = get_spark(app="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = base.count()
    copies = spark.range(n_copies).select(F.col("id").alias("k"))
    docs = (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("k") * n).alias("doc_id"),
            F.when(
                F.col("k") % 2 == 1,
                F.concat(F.col("text"), F.lit(" variant"), F.col("k").cast("string")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(64, "doc_id")
        .cache()
    )
    n_docs = docs.count()

    drop_stats: dict = {}
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, drop_stats=drop_stats, log_dropped=False)
    pairs = pairs.cache()
    n_pairs = pairs.count()
    lsh_secs = time.perf_counter() - t0

    cc_stats: dict = {}
    t0 = time.perf_counter()
    comp = connected_components(
        pairs, src="doc_a", dst="doc_b", stats=cc_stats
    ).cache()
    n_labeled = comp.count()
    cc_secs = time.perf_counter() - t0

    sizes = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy(F.desc("sz"))
        .limit(8)
        .collect()
    )
    out = {
        "n_docs": n_docs,
        "lsh_secs": round(lsh_secs, 1),
        "n_candidate_pairs": n_pairs,
        "dropped_buckets": drop_stats.get("dropped_buckets", 0),
        "dropped_rows": drop_stats.get("dropped_rows", 0),
        "max_bucket": drop_stats.get("max_bucket"),
        "cc_secs": round(cc_secs, 1),
        "cc_rounds": cc_stats.get("rounds"),
        "cc_edges": cc_stats.get("edges"),
        "cc_nodes": cc_stats.get("nodes"),
        "n_labeled": n_labeled,
        "cluster_size_histogram_head": {int(r["sz"]): int(r["n_clusters"]) for r in sizes},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
