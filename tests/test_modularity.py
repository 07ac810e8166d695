"""Modularity of a labelled partition vs a dense numpy oracle."""

import numpy as np
import pytest

from webgraph_spark.algos.labelprop import (
    label_propagation,
    label_propagation_numpy,
    modularity,
)
from webgraph_spark.datagen.graphs import erdos_renyi


def _modularity_np(adj: np.ndarray, labels: np.ndarray) -> float:
    sym = adj | adj.T
    np.fill_diagonal(sym, False)
    m = int(sym.sum())
    if m == 0:
        return 0.0
    within = sum(
        int(sym[u, v])
        for u in range(len(labels))
        for v in range(len(labels))
        if labels[u] == labels[v]
    )
    deg = sym.sum(axis=1)
    sum_d2 = sum(
        int(deg[labels == c].sum()) ** 2 for c in np.unique(labels[deg > 0])
    )
    return (m * within - sum_d2) / (m * m)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_modularity_matches_numpy(spark, seed):
    n, p = 60, 0.06
    edges = erdos_renyi(spark, n=n, p=p, seed=seed)
    adj = np.zeros((n, n), dtype=bool)
    for r in edges.collect():
        adj[r.src, r.dst] = True
    labels_np = label_propagation_numpy(adj, max_iter=3)
    res = label_propagation(edges, max_iter=3)
    got = modularity(edges, res.labels).collect()[0]
    want = _modularity_np(adj, labels_np)
    assert got.modularity == pytest.approx(round(want, 9), abs=1e-9)
    assert got.n_communities == len(np.unique(labels_np))


def test_modularity_perfect_partition(spark):
    # two disjoint triangles, each its own community -> Q = 1/2
    arcs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "node long, label long"
    )
    row = modularity(edges, labels).collect()[0]
    assert row.modularity == pytest.approx(0.5)
    assert row.n_communities == 2
    assert row.m_arcs == 12
