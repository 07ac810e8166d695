"""Densest-subgraph greedy peel vs an independent pure-Python twin
(same exact-integer peel test and cross-multiplied argmax), planted-
clique recovery, and fixed-schedule/to-fixpoint parity."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.densest import densest_subgraph


def py_densest(arcs):
    """Independent set-based reference for the eps=1/2 batched peel."""
    E = {(min(s, d), max(s, d)) for s, d in arcs if s != d}
    live = {}
    for a, b in E:
        live.setdefault(a, set()).add(b)
        live.setdefault(b, set()).add(a)

    def nm(lv):
        return len(lv), sum(len(ns) for ns in lv.values()) // 2

    snaps = [(*nm(live), set(live))]
    while snaps[-1][0] > 0:
        n, m, _ = snaps[-1]
        keep = {v for v, ns in live.items() if len(ns) * n > 3 * m}
        live = {
            v: {u for u in ns if u in keep}
            for v, ns in live.items()
            if v in keep
        }
        live = {v: ns for v, ns in live.items() if ns}
        snaps.append((*nm(live), set(live)))
    bi, bn, bm = 0, snaps[0][0], snaps[0][1]
    for i, (ni, mi, _) in enumerate(snaps):
        if ni > 0 and mi * bn > bm * ni:
            bi, bn, bm = i, ni, mi
    return bi, bn, bm, sorted(snaps[bi][2])


def _arcs(seed, n, m):
    rng = np.random.default_rng(seed)
    return [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]


@pytest.mark.parametrize("seed", [3, 17])
def test_densest_matches_python_twin(spark, seed):
    arcs = _arcs(seed, 200, 700)
    bi, bn, bm, nodes = py_densest(arcs)
    df = spark.createDataFrame(arcs, "src long, dst long")
    res = densest_subgraph(df)
    assert (res.best_round, res.n_nodes, res.m_edges) == (bi, bn, bm)
    assert sorted(r["node"] for r in res.nodes.collect()) == nodes


def test_densest_recovers_planted_clique(spark):
    # sparse background + a 15-clique: the clique IS the densest snapshot
    arcs = _arcs(9, 400, 600)
    clique = [(1000 + i, 1000 + j) for i in range(15) for j in range(i + 1, 15)]
    df = spark.createDataFrame(arcs + clique, "src long, dst long")
    res = densest_subgraph(df)
    got = sorted(r["node"] for r in res.nodes.collect())
    assert got == [1000 + i for i in range(15)]
    assert (res.n_nodes, res.m_edges) == (15, 105)


def test_densest_fixed_schedule_matches_fixpoint(spark):
    arcs = _arcs(21, 150, 500)
    df = spark.createDataFrame(arcs, "src long, dst long")
    free = densest_subgraph(df)
    pinned = densest_subgraph(df, fixed_rounds=free.rounds + 3)
    assert (free.n_nodes, free.m_edges, free.best_round) == (
        pinned.n_nodes,
        pinned.m_edges,
        pinned.best_round,
    )
    assert sorted(r["node"] for r in free.nodes.collect()) == sorted(
        r["node"] for r in pinned.nodes.collect()
    )
