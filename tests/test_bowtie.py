"""Bowtie decomposition vs a pure-numpy reachability oracle."""

import numpy as np
import pytest

from webgraph_spark.algos.bowtie import bowtie
from webgraph_spark.datagen.graphs import erdos_renyi_numpy


def _reach(adj, seeds):
    n = adj.shape[0]
    vis = np.zeros(n, dtype=bool)
    vis[list(seeds)] = True
    frontier = list(seeds)
    while frontier:
        nxt = set()
        for u in frontier:
            for v in np.nonzero(adj[u])[0]:
                if not vis[v]:
                    vis[v] = True
                    nxt.add(v)
        frontier = list(nxt)
    return vis


def _py_bowtie(adj, pivot):
    n = adj.shape[0]
    has_arc = adj.any(axis=1) | adj.any(axis=0)
    fwd = _reach(adj, [pivot])
    bwd = _reach(adj.T, [pivot])
    core = fwd & bwd
    inn = bwd & ~core
    out = fwd & ~core
    weak = _reach(adj | adj.T, list(np.nonzero(core)[0]))
    tend = weak & ~fwd & ~bwd
    disc = has_arc & ~weak
    return {
        "core": int(core.sum()),
        "in": int(inn[has_arc].sum()),
        "out": int(out[has_arc].sum()),
        "tendrils_tubes": int(tend[has_arc].sum()),
        "disconnected": int(disc.sum()),
    }


@pytest.mark.parametrize("n,p,seed", [(80, 0.025, 51), (120, 0.015, 52)])
def test_bowtie_vs_numpy(spark, n, p, seed):
    adj = erdos_renyi_numpy(n, p, seed=seed)
    rows = [(int(u), int(v)) for u, v in zip(*np.nonzero(adj))]
    edges = spark.createDataFrame(rows, "src long, dst long")
    # pivot: a node in the largest SCC-ish area — pick the node with the
    # largest fwd∩bwd reach among the first 10 with arcs
    cands = sorted({u for u, _ in rows} | {v for _, v in rows})[:10]
    pivot = max(
        cands,
        key=lambda c: int((_reach(adj, [c]) & _reach(adj.T, [c])).sum()),
    )
    res = bowtie(edges, pivot=int(pivot), max_rounds=n + 2)
    got = {r["component"]: r["n_nodes"] for r in res.counts.collect()}
    want = _py_bowtie(adj, pivot)
    assert got == want
    # membership is a partition of the node set
    memb = res.membership.collect()
    assert len(memb) == len({r["node"] for r in memb}) == sum(want.values())


def test_bowtie_truncation_raises(spark):
    # a 12-node directed path needs 11 rounds; cap at 3 must raise
    rows = [(i, i + 1) for i in range(11)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    with pytest.raises(RuntimeError, match="truncated"):
        bowtie(edges, pivot=0, max_rounds=3)


def test_attack_tolerance_vs_numpy(spark):
    from webgraph_spark.algos.components import attack_tolerance

    adj = erdos_renyi_numpy(90, 0.04, seed=61)
    rows = [(int(u), int(v)) for u, v in zip(*np.nonzero(adj))]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["k"]: (r["n_nodes"], r["n_arcs"], r["largest_cc"], r["n_components"])
        for r in attack_tolerance(edges, ks=[0, 5, 15]).collect()
    }

    s = adj | adj.T
    np.fill_diagonal(s, False)
    deg = s.sum(axis=1)
    order = sorted(range(len(deg)), key=lambda v: (-deg[v], v))
    for k in [0, 5, 15]:
        keep = np.ones(len(deg), dtype=bool)
        keep[order[:k]] = False
        sk = s & keep[:, None] & keep[None, :]
        alive = np.nonzero(sk.any(axis=1))[0]
        # CC via BFS over survivors
        seen = set()
        comps = []
        for v in alive:
            if v in seen:
                continue
            stack, comp = [v], set()
            while stack:
                u = stack.pop()
                if u in comp:
                    continue
                comp.add(u)
                stack.extend(
                    w for w in np.nonzero(sk[u])[0] if w not in comp
                )
            seen |= comp
            comps.append(len(comp))
        want = (
            len(alive),
            int(sk.sum()),
            max(comps) if comps else 0,
            len(comps),
        )
        assert got[k] == want, f"k={k}: {got[k]} != {want}"
    # fragmentation is monotone in k for this fixture
    assert got[0][2] >= got[5][2] >= got[15][2]
