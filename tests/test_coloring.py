"""Distributed greedy coloring vs independent pure-Python twins (same
md5 priorities), plus structural validity — no monochromatic edge,
every node colored, colors are a gap-free greedy choice — and the
fixed-schedule/to-fixpoint parity the SQL oracle twin relies on."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from webgraph_spark.algos.coloring import jp_coloring, speculative_coloring


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _adj(arcs):
    adj: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for s, d in arcs:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    return adj, nodes


def _mex(used):
    c = 0
    while c in used:
        c += 1
    return c


def py_jp(arcs):
    """Independent synchronous Jones-Plassmann replay: a node colors
    when it is the (p, node)-max among still-live neighbours."""
    adj, nodes = _adj(arcs)
    pri = {v: (_md5_long(f"jp:{v}"), v) for v in nodes}
    live, color, rnd, t = set(nodes), {}, {}, 0
    while live:
        t += 1
        frontier = {
            v
            for v in live
            if all(pri[v] > pri[u] for u in adj.get(v, ()) if u in live)
        }
        for v in frontier:
            used = {color[u] for u in adj.get(v, ()) if u in color}
            color[v] = _mex(used)
            rnd[v] = t
        live -= frontier
    return color, rnd, t, adj, nodes


def py_speculative(arcs):
    """Independent speculative replay: every live node picks the mex of
    FINAL neighbour colors; adjacent same-pick nodes conflict and the
    smaller (p, node) endpoint re-queues."""
    adj, nodes = _adj(arcs)
    pri = {v: (_md5_long(f"jp:{v}"), v) for v in nodes}
    live, color, rnd, t = set(nodes), {}, {}, 0
    while live:
        t += 1
        pick = {}
        for v in live:
            used = {color[u] for u in adj.get(v, ()) if u in color}
            pick[v] = _mex(used)
        losers = {
            v
            for v in live
            if any(
                u in live and pick[u] == pick[v] and pri[v] < pri[u]
                for u in adj.get(v, ())
            )
        }
        for v in live - losers:
            color[v] = pick[v]
            rnd[v] = t
        live &= losers
    return color, rnd, t, adj, nodes


def _arcs(seed, n, m):
    rng = np.random.default_rng(seed)
    return [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]


def _check(rows, color, rnd, adj, nodes):
    got = {r["node"]: (r["color"], r["round"]) for r in rows}
    assert set(got) == nodes
    assert got == {v: (color[v], rnd[v]) for v in nodes}
    for v, nbrs in adj.items():
        for u in nbrs:
            assert got[v][0] != got[u][0]


@pytest.mark.parametrize("seed", [11, 29])
def test_jp_matches_python_twin(spark, seed):
    arcs = _arcs(seed, 120, 300)
    color, rnd, rounds, adj, nodes = py_jp(arcs)
    df = spark.createDataFrame(arcs, "src long, dst long")
    res = jp_coloring(df)
    assert res.converged and res.rounds == rounds
    _check(res.colors.collect(), color, rnd, adj, nodes)


@pytest.mark.parametrize("seed", [11, 29])
def test_speculative_matches_python_twin(spark, seed):
    arcs = _arcs(seed, 150, 600)
    color, rnd, rounds, adj, nodes = py_speculative(arcs)
    df = spark.createDataFrame(arcs, "src long, dst long")
    res = speculative_coloring(df)
    assert res.converged and res.rounds == rounds
    _check(res.colors.collect(), color, rnd, adj, nodes)


def test_fixed_schedule_is_noop_past_fixpoint(spark):
    arcs = _arcs(43, 80, 200)
    df = spark.createDataFrame(arcs, "src long, dst long")
    free = speculative_coloring(df)
    fixed = speculative_coloring(df, fixed_rounds=free.rounds + 3)
    a = sorted(map(tuple, free.colors.collect()))
    b = sorted(map(tuple, fixed.colors.collect()))
    assert a == b


def test_isolated_and_loop_nodes_color_zero(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 3)], "src long, dst long"
    )
    res = speculative_coloring(df)
    got = {r["node"]: r["color"] for r in res.colors.collect()}
    assert got[1] == 0  # loop-only node is isolated: color 0
    assert sorted(got) == [1, 2, 3]
    assert got[2] != got[3]


def test_onion_layers_match_coreness(spark):
    """Onion peel k-at-removal equals the h-index coreness, layers
    partition the node set, and layer indices are contiguous."""
    from webgraph_spark.algos.kcore import coreness, onion_layers
    from webgraph_spark.datagen.graphs import erdos_renyi

    e = erdos_renyi(spark, n=300, p=0.03, seed=5)
    on = onion_layers(e, max_rounds=60)
    rows = on.collect()
    cor = {r["node"]: r["c"] for r in coreness(e).collect()}
    assert len(rows) == len(cor)
    layers = sorted({r["layer"] for r in rows})
    assert layers == list(range(1, len(layers) + 1))
    for r in rows:
        assert r["coreness"] == cor[r["node"]], r
