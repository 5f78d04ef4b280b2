"""Distributed connected components over a pair/edge DataFrame.

Target addition for the training-data pipeline (the reference has no
graph layer): near-duplicate PAIRS (from minhash/simhash/embedding LSH)
become DEDUP CLUSTERS — "keep one doc per component" is the step that
actually shrinks a corpus, and it needs transitive closure: a~b and b~c
put a, b, c in one cluster even if (a, c) never collided in any band.

Algorithm: iterative MIN-LABEL PROPAGATION — each round every node
adopts the minimum label among itself and its neighbors (one hash
aggregation + one join per round, all keyed shuffles, no driver data
movement), converging to the minimum node id of the component in
O(diameter) rounds. LSH dedup graphs are shallow (near-clique clusters,
diameter 2-4), so this simple variant beats the constant factor of the
O(log n) large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) that a deep-chain graph
would need; ``max_iter`` guards the pathological case. Convergence is
checked with a count of changed labels per round — the only driver-side
values are that scalar and the loop bound.

At 100 TB scale: shuffle volume per round is O(edges); star sizes are
bounded by LSH bucket caps upstream (operators/dedup.py drops degenerate
buckets), so no reducer sees a super-node. ``max_iter`` bounds the worst
case; the operator raises if labels have not converged by then rather
than silently returning a partial closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """(src, dst) pair rows -> (id, component) with component = min node
    id reachable through the pair graph. Nodes appearing only as
    singletons must be unioned in by the caller if desired (pairs carry
    no isolated vertices). ``stats``, if given, receives {'rounds': int,
    'edges': int, 'nodes': int} for scale-rehearsal reporting."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # label(x) starts as min(x, min direct neighbor) — one aggregation
    # over the symmetrized edge list
    # materialize the symmetrized edge list ONCE: every propagation round
    # joins against it, and without this the full upstream pair pipeline
    # (LSH + verify over the corpus) would re-execute per round
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    if stats is not None:
        # undirected edge count: canonicalize before counting (sym holds
        # each undirected edge 4x when the caller supplied BOTH
        # orientations of a pair, so sym.count()//2 would double-count)
        stats["edges"] = (
            sym.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .count()
        )
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select(
            F.col("a").alias("id"), F.least("mn", F.col("a")).alias("comp")
        )
    )
    for rounds in range(max_iter):
        # propagate: each node adopts the minimum label among itself and
        # its neighbors' labels (label propagation step == one round of
        # star contraction on the label graph)
        nbr = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .select(F.col("a").alias("id"), "nbr_comp")
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    "comp", F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                (F.coalesce("nbr_comp", F.col("comp")) < F.col("comp")).alias(
                    "_changed"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # cut lineage
        changed = new_labels.where("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            if stats is not None:
                stats["rounds"] = rounds + 1
                stats["nodes"] = labels.count()
            return labels.withColumnRenamed("comp", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster assignment for EVERY doc: component min-id for docs in the
    pair graph, the doc's own id for singletons. The "keep" row per
    cluster is the one where doc_id == cluster_id."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("cluster_id"),
        )
    )
