"""Luby maximal independent set vs an independent pure-Python twin
(same md5 priorities and tuple winner rule), plus the MIS properties —
independence and maximality — verified structurally, and the
fixed-schedule/to-fixpoint parity the SQL oracle twin relies on."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from webgraph_spark.algos.mis import luby_mis


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_luby(arcs):
    """Independent reference: set-based Luby with the identical
    priority stream; returns {node: round_selected} and the round count."""
    adj: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for s, d in arcs:
        nodes.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    live, sel, t = set(nodes), {}, 0
    while live:
        t += 1
        pri = {v: (_md5_long(f"mis{t}:{v}"), v) for v in live}
        winners = {
            v
            for v in live
            if all(pri[v] < pri[u] for u in adj.get(v, ()) if u in live)
        }
        sel.update({v: t for v in winners})
        removed = set(winners)
        for v in winners:
            removed |= adj.get(v, ()) & live
        live -= removed
    return sel, t, adj, nodes


def _arcs(seed, n, m):
    rng = np.random.default_rng(seed)
    return [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]


@pytest.mark.parametrize("seed", [11, 29])
def test_mis_matches_python_twin(spark, seed):
    arcs = _arcs(seed, 150, 450)
    exp, rounds, adj, nodes = py_luby(arcs)
    df = spark.createDataFrame(arcs, "src long, dst long")
    res = luby_mis(df)
    got = {r["node"]: r["round"] for r in res.selected.collect()}
    assert got == exp
    assert res.rounds == rounds and res.converged
    # structural MIS properties
    mis = set(got)
    assert all(not (adj.get(v, set()) & mis) for v in mis)  # independent
    assert all(v in mis or (adj.get(v, set()) & mis) for v in nodes)  # maximal


def test_mis_fixed_schedule_matches_fixpoint(spark):
    arcs = _arcs(5, 200, 700)
    df = spark.createDataFrame(arcs, "src long, dst long")
    free = {(r["node"], r["round"]) for r in luby_mis(df).selected.collect()}
    res = luby_mis(df, fixed_rounds=8)
    pinned = {(r["node"], r["round"]) for r in res.selected.collect()}
    assert free == pinned
    assert res.rounds == 8  # fixed schedule runs all rounds (no-ops past fixpoint)


def test_mis_loop_only_node_is_isolated(spark):
    # a node whose only arc is a self-loop is selected in round 1
    df = spark.createDataFrame(
        [(0, 0), (1, 2)], "src long, dst long"
    )
    got = {r["node"]: r["round"] for r in luby_mis(df).selected.collect()}
    assert got[0] == 1
    assert len(got) == 2
    # exactly one of {1, 2} is in the MIS
    assert (1 in got) != (2 in got)
