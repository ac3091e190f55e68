"""Connected components / dedup clusters (operators/graph.py): parity with
a driver-side union-find on random graphs, the pathological chain case
(worst case for naive label propagation), and singleton handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.graph import connected_components, dedup_clusters


def _uf(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = {}
    comp = {}
    for i in range(n_nodes):
        comp.setdefault(find(i), []).append(i)
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


@pytest.mark.parametrize("seed,n_edges", [(0, 60), (1, 150), (2, 300)])
def test_connected_components_matches_union_find(spark, seed, n_edges):
    rng = np.random.default_rng(seed)
    n = 120
    edges = [
        (int(rng.integers(n)), int(rng.integers(n))) for _ in range(n_edges)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _uf(n, edges)
    touched = {u for e in edges for u in e}
    assert got == {k: v for k, v in want.items() if k in touched}


def test_connected_components_chain(spark):
    # a path graph is the worst case for label propagation (O(n) rounds);
    # the star sequence must still converge in O(log n)
    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert len(got) == 301 and set(got.values()) == {0}


def test_dedup_clusters_singletons_and_canonicals(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 8)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = dedup_clusters(pairs, docs=docs).toPandas().sort_values("doc_id")
    by_id = dict(zip(out.doc_id, out.cluster_id))
    assert by_id[1] == by_id[2] == by_id[5] == 1
    assert by_id[7] == by_id[8] == 7
    for single in (0, 3, 4, 6, 9):
        assert by_id[single] == single
    canon = set(out[out.is_canonical].doc_id)
    assert canon == {0, 1, 3, 4, 6, 7, 9}


def test_connected_components_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = dedup_clusters(empty_pairs, docs=docs).toPandas()
    assert (out.doc_id == out.cluster_id).all() and out.is_canonical.all()
