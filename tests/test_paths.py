"""Weighted SSSP + DAG layering vs independent numpy recurrences."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from webgraph_spark.algos.paths import dag_layers, sssp
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy


def _weights(adj, seed):
    rng = np.random.RandomState(seed)
    w = rng.randint(1, 10, size=adj.shape)
    return np.where(adj, w, 0)


def _bellman_ford(wadj, sources, rounds=None):
    n = wadj.shape[0]
    INF = float("inf")
    dist = np.full(n, INF)
    dist[list(sources)] = 0.0
    r = rounds if rounds is not None else n
    for _ in range(r):
        new = dist.copy()
        for u in range(n):
            if dist[u] < INF:
                for v in np.nonzero(wadj[u])[0]:
                    new[v] = min(new[v], dist[u] + wadj[u, v])
        if (new == dist).all() and rounds is None:
            break
        dist = new
    return dist


@pytest.mark.parametrize("n,p,seed", [(50, 0.06, 21), (80, 0.04, 22)])
def test_sssp_vs_numpy(spark, n, p, seed):
    adj = erdos_renyi_numpy(n, p, seed=seed)
    wadj = _weights(adj, seed + 1)
    rows = [
        (int(u), int(v), int(wadj[u, v]))
        for u, v in zip(*np.nonzero(adj))
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    res = sssp(edges, [0, 1], weight_col="w")
    got = {r["node"]: r["dist"] for r in res.distances.collect()}
    want = _bellman_ford(wadj, [0, 1])
    for v in range(n):
        if np.isfinite(want[v]):
            assert got.get(v) == int(want[v]), f"node {v}"
        else:
            assert v not in got
    assert res.converged


def test_sssp_fixed_rounds_match_recurrence(spark):
    adj = erdos_renyi_numpy(40, 0.08, seed=23)
    wadj = _weights(adj, 24)
    rows = [(int(u), int(v), int(wadj[u, v])) for u, v in zip(*np.nonzero(adj))]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    res = sssp(edges, [0], weight_col="w", rounds=2)
    got = {r["node"]: r["dist"] for r in res.distances.collect()}
    want = _bellman_ford(wadj, [0], rounds=2)
    for v, d in got.items():
        assert d == int(want[v])


def _longest_path_layers(adj):
    n = adj.shape[0]
    layer = np.zeros(n, dtype=int)
    for _ in range(n):
        new = layer.copy()
        for u in range(n):
            for v in np.nonzero(adj[u])[0]:
                new[v] = max(new[v], layer[u] + 1)
        if (new == layer).all():
            break
        layer = new
    return layer


@pytest.mark.parametrize("n,p,seed", [(60, 0.08, 31)])
def test_dag_layers_vs_numpy(spark, n, p, seed):
    # DAG by construction: keep only u < v arcs of an ER digraph
    adj = np.triu(erdos_renyi_numpy(n, p, seed=seed), k=1)
    rows = [(int(u), int(v)) for u, v in zip(*np.nonzero(adj))]
    edges = spark.createDataFrame(rows, "src long, dst long")
    res = dag_layers(edges)
    got = {r["node"]: r["layer"] for r in res.layers.collect()}
    want = _longest_path_layers(adj)
    present = adj.any(axis=1) | adj.any(axis=0)
    for v in range(n):
        if present[v]:
            assert got[v] == want[v], f"node {v}"


def test_dag_layers_cycle_raises(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        dag_layers(edges, max_rounds=10)


def test_sssp_unweighted_matches_bfs(spark):
    edges = erdos_renyi(spark, 40, 0.1, seed=41)
    from webgraph_spark.algos.bfs import bfs

    got = {
        r["node"]: r["dist"]
        for r in sssp(edges, [3]).distances.collect()
    }
    want = {r["node"]: r["dist"] for r in bfs(edges, [3]).distances.collect()}
    assert got == {k: int(v) for k, v in want.items()}


def test_temporal_reachability_matches_python_and_respects_time(spark):
    """Earliest-arrival vs a pure-Python fixpoint replay; a node
    reachable statically but only via a time-DECREASING path must be
    unreachable temporally."""
    from webgraph_spark.algos.paths import temporal_reachability

    # 0 -(t5)-> 1 -(t3)-> 2 : 2 is statically reachable from 0 but the
    # path 0->1->2 is not time-respecting (3 < 5). 1 -(t7)-> 3 works.
    arcs = [(0, 1, 5), (1, 2, 3), (1, 3, 7), (3, 4, 7), (4, 5, 6)]
    df = spark.createDataFrame(arcs, "src long, dst long, t long")
    got = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(df, [0], max_rounds=16).collect()
    }

    def py_reach(arcs, src):
        LONG_MIN = -(1 << 62)
        arr = {src: LONG_MIN}
        while True:
            nxt = dict(arr)
            for u, v, t in arcs:
                if u in arr and t >= arr[u]:
                    nxt[v] = min(nxt.get(v, 1 << 62), t)
            if nxt == arr:
                return arr
            arr = nxt

    want = py_reach(arcs, 0)
    assert got == want
    assert 2 not in got          # time-decreasing path rejected
    assert got[4] == 7 and 5 not in got  # 4->5 at t6 < arrival 7
    # fixed schedule past the fixpoint is a no-op
    fx = {
        r["node"]: r["arrival"]
        for r in temporal_reachability(df, [0], fixed_rounds=9).collect()
    }
    assert fx == got
