"""Connected components / dedup clusters (operators/graph.py)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprintz_spark.operators.graph import connected_components, dedup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_chain_and_clique(spark):
    # a 5-chain (needs transitive closure), a clique, a self-loop
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (7, 7)]
    out = {r["id"]: r["component"] for r in connected_components(_pairs(spark, edges)).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_matches_union_find_reference(spark):
    rng = np.random.default_rng(3)
    n = 200
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(300, 2)) if a != b]
    got = {r["id"]: r["component"]
           for r in connected_components(_pairs(spark, edges)).collect()}

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for a, b in edges:
        expect[a] = find(a)
        expect[b] = find(b)
    assert got == expect


def test_max_iter_raises_on_deep_chain(spark):
    edges = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, edges), max_iter=2)


def test_dedup_clusters_singletons(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    out = dedup_clusters(docs, _pairs(spark, [(1, 2), (2, 4)])).collect()
    m = {r["doc_id"]: r["cluster_id"] for r in out}
    assert m == {0: 0, 1: 1, 2: 1, 3: 3, 4: 1, 5: 5}
    keepers = {d for d, c in m.items() if d == c}
    assert keepers == {0, 1, 3, 5}


def test_connected_components_empty_pairs(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(4)])
    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(docs, empty).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}
