"""Balanced partitioning (deterministic Spinner variant) vs an
independent pure-Python replay of the same recurrence, plus the
structural guarantees the operator sells: capacity never exceeded,
cut no worse than the seed assignment, assignment total and stable."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.partition import balanced_partition, partition_quality
from webgraph_spark.datagen.graphs import erdos_renyi_numpy


def erdos_renyi_arcs(n: int, p: float, seed: int) -> list[tuple[int, int]]:
    a = erdos_renyi_numpy(n, p, seed=seed)
    return [(int(s), int(d)) for s, d in zip(*np.nonzero(a))]


def py_partition(arcs, k, rounds, slack_pct):
    """Independent single-process replay: capacity-bounded synchronous
    LP, integer scores, rank-admission (gain DESC, node ASC)."""
    nodes = sorted({v for a in arcs for v in a})
    sym: dict[int, list[int]] = {}
    seen = set()
    for s, d in arcs:
        if s == d:
            continue
        for a, b in ((s, d), (d, s)):
            if (a, b) not in seen:
                seen.add((a, b))
                sym.setdefault(a, []).append(b)
    n = len(nodes)
    cap = (n * (100 + slack_pct) + 100 * k - 1) // (100 * k)
    assign = {v: v % k for v in nodes}
    for _ in range(rounds):
        load = {b: 0 for b in range(k)}
        for v in nodes:
            load[assign[v]] += 1
        movers = []
        for v in nodes:
            nbrs = sym.get(v)
            if not nbrs:
                continue
            cnt: dict[int, int] = {}
            for u in nbrs:
                cnt[assign[u]] = cnt.get(assign[u], 0) + 1
            # argmax: cnt DESC, load ASC, block ASC
            best = min(cnt, key=lambda b: (-cnt[b], load[b], b))
            cur = assign[v]
            gain = cnt[best] - cnt.get(cur, 0)
            if best != cur and gain > 0:
                movers.append((v, best, gain))
        by_tgt: dict[int, list[tuple[int, int]]] = {}
        for v, tgt, gain in movers:
            by_tgt.setdefault(tgt, []).append((v, gain))
        for tgt, lst in by_tgt.items():
            lst.sort(key=lambda t: (-t[1], t[0]))
            quota = max(0, cap - load[tgt])
            for v, _ in lst[:quota]:
                assign[v] = tgt
    return assign, cap


def _cut(arcs, assign):
    pairs = {(s, d) for s, d in arcs if s != d} | {
        (d, s) for s, d in arcs if s != d
    }
    return sum(1 for s, d in pairs if assign[s] != assign[d]), len(pairs)


@pytest.mark.parametrize("seed", [7, 19])
def test_partition_matches_python_twin(spark, seed):
    arcs = erdos_renyi_arcs(n=120, p=0.06, seed=seed)
    e = spark.createDataFrame(arcs, "src: long, dst: long")
    res = balanced_partition(e, k=4, rounds=4, slack_pct=5, num_partitions=8)
    got = {r["node"]: r["block"] for r in res.assignment.collect()}
    want, cap = py_partition(arcs, 4, 4, 5)
    assert res.cap == cap
    assert got == want


def test_partition_capacity_and_cut(spark):
    arcs = erdos_renyi_arcs(n=200, p=0.05, seed=3)
    e = spark.createDataFrame(arcs, "src: long, dst: long")
    res = balanced_partition(e, k=4, rounds=4, slack_pct=5, num_partitions=8)
    assign = {r["node"]: r["block"] for r in res.assignment.collect()}
    nodes = {v for a in arcs for v in a}
    assert set(assign) == nodes  # total assignment
    loads = np.bincount([assign[v] for v in nodes], minlength=4)
    assert loads.max() <= res.cap  # capacity respected
    cut, m = _cut(arcs, assign)
    seed_cut, _ = _cut(arcs, {v: v % 4 for v in nodes})
    assert cut <= seed_cut  # no worse than the seed partition
    q = partition_quality(e, res.assignment).collect()[0]
    assert (q["cut_arcs"], q["m_arcs"], q["max_load"], q["n_blocks"]) == (
        cut,
        m,
        int(loads.max()),
        int((loads > 0).sum()),
    )
