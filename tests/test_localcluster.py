"""PPR conductance sweep vs an independent pure-Python twin (same
rounded-rank ordering and exact integer cut/vol recurrences), plus a
planted-community recovery check."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.localcluster import ppr_sweep


def py_ppr(arcs, seeds, iters, alpha):
    nodes = sorted({x for a in arcs for x in a})
    out: dict[int, list[int]] = {}
    for s, d in arcs:
        out.setdefault(s, []).append(d)
    p = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    r = dict(p)
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out)
        c = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            share = r[s] / len(ds)
            for d in ds:
                c[d] += share
        r = {v: p[v] * ((1 - alpha) + alpha * dm) + alpha * c[v] for v in nodes}
    return {v: round(r[v], 9) for v in nodes}


def py_sweep(arcs, seeds, iters=5, alpha=0.85, k_max=300):
    E = {(min(s, d), max(s, d)) for s, d in arcs if s != d}
    adj: dict[int, set[int]] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    r = py_ppr(arcs, seeds, iters, alpha)
    deg = {v: len(ns) for v, ns in adj.items()}
    tot = sum(deg.values())
    cand = sorted(
        ((r[v] / deg[v], v) for v in deg if r.get(v, 0) > 0),
        key=lambda t: (-t[0], t[1]),
    )[:k_max]
    order = [v for _, v in cand]
    pos = {v: i + 1 for i, v in enumerate(order)}
    best, cut, vol = None, 0, 0
    for i, v in enumerate(order, 1):
        e = sum(1 for u in adj[v] if pos.get(u, 1 << 60) < i)
        cut += deg[v] - 2 * e
        vol += deg[v]
        mv = min(vol, tot - vol)
        if mv <= 0:
            continue
        phi = cut / mv
        if best is None or phi < best[0]:
            best = (phi, i)
    return best, order


@pytest.mark.parametrize("seed", [5, 23])
def test_sweep_matches_python_twin(spark, seed):
    rng = np.random.default_rng(seed)
    arcs = list(
        {
            (int(s), int(d))
            for s, d in zip(rng.integers(0, 150, 500), rng.integers(0, 150, 500))
        }
    )
    arcs += [(i, j) for i in range(8) for j in range(i + 1, 8)]
    seeds = {0, 1, 2}
    (phi, k), order = py_sweep(arcs, seeds)
    df = spark.createDataFrame(arcs, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    res = ppr_sweep(df, sdf)
    assert res.k == k
    assert abs(res.conductance - phi) < 1e-12
    assert sorted(r["node"] for r in res.members.collect()) == sorted(order[:k])


def test_sweep_recovers_planted_community(spark):
    # a 12-clique weakly tethered to a sparse background: sweeping from
    # inside the clique must cut exactly at the clique boundary
    rng = np.random.default_rng(31)
    bg = list(
        {
            (int(s) + 100, int(d) + 100)
            for s, d in zip(rng.integers(0, 200, 300), rng.integers(0, 200, 300))
            if s != d
        }
    )
    clique = [(i, j) for i in range(12) for j in range(i + 1, 12)]
    tether = [(0, 100)]
    df = spark.createDataFrame(bg + clique + tether, "src long, dst long")
    sdf = spark.createDataFrame([(0,), (1,)], "node long")
    res = ppr_sweep(df, sdf, iters=8)
    got = sorted(r["node"] for r in res.members.collect())
    # the whole clique is inside the best cut, little else rides along
    # (stray degree-1 background nodes with high ppr/deg may prefix-sort
    # inside the cut — the sweep can only cut along its own ordering)
    assert set(range(12)) <= set(got)
    assert len(got) <= 15
    # the cut is a low-conductance one, far below the background's
    assert res.conductance < 0.05
