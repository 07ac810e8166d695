"""Borůvka minimum spanning forest vs an independent union-find Kruskal
oracle (same (w, a, b) total order, so the forest is unique), plus the
fixed-schedule/to-fixpoint parity the SQL oracle twin relies on, a
pointer-depth stress (path graph), and forest invariants."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.msf import boruvka_msf


def kruskal(arcs):
    """Union-find Kruskal over directed weighted arcs; canonicalizes to
    undirected min-weight edges and returns the sorted forest list."""
    canon = {}
    for s, d, w in arcs:
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        canon[(a, b)] = min(canon.get((a, b), 1 << 60), w)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, a, b in sorted((w, a, b) for (a, b), w in canon.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.append((a, b, w))
    return sorted(forest)


def _run(spark, arcs, **kw):
    df = spark.createDataFrame(arcs, "src long, dst long, label long")
    res = boruvka_msf(df, "label", **kw)
    return sorted(tuple(r) for r in res.forest.collect()), res


def _er_arcs(seed, n, m, wmax=20):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, wmax, m)
    return [
        (int(s), int(d), int(x)) for s, d, x in zip(src, dst, w) if s != d
    ]


@pytest.mark.parametrize("seed", [7, 13, 99])
def test_msf_matches_kruskal_er(spark, seed):
    arcs = _er_arcs(seed, 120, 360)
    got, res = _run(spark, arcs)
    assert got == kruskal(arcs)
    assert res.converged


def test_msf_path_graph_pointer_depth(spark):
    # monotone-weight chain: round-1 chosen edges form one long pointer
    # chain, the worst case for the doubling merge
    arcs = [(i, i + 1, i + 1) for i in range(60)]
    got, res = _run(spark, arcs)
    assert got == kruskal(arcs)  # a tree already: MSF == the path itself
    assert len(got) == 60


def test_msf_disconnected_and_parallel_edges(spark):
    arcs = [
        (0, 1, 5), (1, 0, 2),  # parallel arcs collapse to min weight 2
        (1, 2, 9), (2, 2, 1),  # self-loop never enters
        (10, 11, 4), (11, 12, 4), (10, 12, 4),  # tie triangle: (w,a,b) order
    ]
    got, res = _run(spark, arcs)
    assert got == kruskal(arcs) == [
        (0, 1, 2), (1, 2, 9), (10, 11, 4), (10, 12, 4)
    ]
    # two components -> labels agree within, differ across
    lab = {r["node"]: r["comp"] for r in res.labels.collect()}
    assert lab[0] == lab[1] == lab[2]
    assert lab[10] == lab[11] == lab[12]
    assert lab[0] != lab[10]


def test_msf_fixed_schedule_matches_fixpoint(spark):
    arcs = _er_arcs(42, 200, 500)
    free, _ = _run(spark, arcs)
    pinned, res = _run(spark, arcs, fixed_rounds=8, jumps=8)
    assert free == pinned
    assert res.rounds == 8  # fixed schedule runs all rounds (idempotent)


def test_msf_empty_graph(spark):
    got, res = _run(spark, [(3, 3, 1)])  # only a self-loop: no forest
    assert got == []
    assert res.converged
