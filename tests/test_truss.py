"""k-truss and bipartite projection vs independent numpy/python oracles."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.truss import edge_support, ktruss
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy
from webgraph_spark.functions.mining import bipartite_project


def _np_truss(adj: np.ndarray, k: int):
    """Brute-force peel on a boolean adjacency matrix; returns dict
    {(u, v): support} of the k-truss, u < v."""
    sym = adj | adj.T
    np.fill_diagonal(sym, False)
    cur = sym.copy()
    while True:
        # support of (u,v) = common neighbours within cur
        common = cur.astype(np.int64) @ cur.astype(np.int64)
        keep = cur & (common >= k - 2)
        if (keep == cur).all():
            break
        cur = keep
    common = cur.astype(np.int64) @ cur.astype(np.int64)
    return {
        (u, v): int(common[u, v])
        for u, v in zip(*np.nonzero(np.triu(cur, k=1)))
    }


@pytest.mark.parametrize("seed,k", [(1, 3), (2, 4), (3, 5)])
def test_ktruss_matches_numpy_on_er(spark, seed, k):
    n, p = 60, 0.12
    edges = erdos_renyi(spark, n=n, p=p, seed=seed)
    adj = erdos_renyi_numpy(n=n, p=p, seed=seed)
    want = _np_truss(adj, k)
    got = {
        (r.src, r.dst): r.support
        for r in ktruss(edges, k=k, num_partitions=8).collect()
    }
    assert got == want


def test_ktruss_triangle_free_graph_is_empty(spark):
    # a path graph has no triangles -> empty 3-truss
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    assert ktruss(edges, k=3).count() == 0


def test_ktruss_complete_graph_keeps_everything(spark):
    n = 6
    edges = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(n) if i != j],
        "src long, dst long",
    )
    rows = ktruss(edges, k=n - 1).collect()  # support = n-2 everywhere
    assert len(rows) == n * (n - 1) // 2
    assert all(r.support == n - 2 for r in rows)


def test_ktruss_rejects_k_below_3(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        ktruss(edges, k=2)


def test_edge_support_counts(spark):
    # two triangles sharing edge (0,1): support((0,1)) = 2
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)], "src long, dst long"
    )
    sup = {(r.src, r.dst): r.sup for r in edge_support(edges).collect()}
    assert sup[(0, 1)] == 2
    assert sup[(0, 2)] == sup[(1, 2)] == sup[(0, 3)] == sup[(1, 3)] == 1


# ------------------------------------------------- bipartite projection


def test_bipartite_project_weights_and_guards(spark):
    pairs = spark.createDataFrame(
        [
            (0, "a"), (0, "b"), (0, "c"),
            (1, "a"), (1, "b"),
            (2, "b"), (2, "c"), (2, "c"),  # duplicate collapses
            (3, "hub"), (4, "hub"), (5, "hub"),
        ],
        "u long, a string",
    )
    out = {
        (r.src, r.dst): r.weight
        for r in bipartite_project(pairs, min_weight=1).collect()
    }
    assert out[(0, 1)] == 2 and out[(0, 2)] == 2 and out[(1, 2)] == 1
    assert out[(3, 4)] == out[(3, 5)] == out[(4, 5)] == 1
    # min_weight prunes coincidence edges
    out2 = {
        (r.src, r.dst)
        for r in bipartite_project(pairs, min_weight=2).collect()
    }
    assert out2 == {(0, 1), (0, 2)}
    # max_df drops the hub attribute before the join
    out3 = {
        (r.src, r.dst)
        for r in bipartite_project(pairs, min_weight=1, max_df=2).collect()
    }
    assert (3, 4) not in out3 and (0, 1) in out3
