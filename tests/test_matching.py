"""Handshake maximal matching vs an independent pure-Python twin (same
md5 edge priorities), structural properties (node-disjointness and
maximality), and the 2-approx vertex cover it induces."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from webgraph_spark.algos.matching import maximal_matching, vertex_cover_2approx


def _md5l(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_matching(arcs):
    E = {(min(s, d), max(s, d)) for s, d in arcs if s != d}
    live, match, t = set(E), {}, 0
    while live:
        t += 1
        pri = {e: (_md5l(f"mm{t}:{e[0]}:{e[1]}"), *e) for e in live}
        pick = {}
        for v in {x for e in live for x in e}:
            pick[v] = min((e for e in live if v in e), key=lambda e: pri[e])
        shakes = {e for e in live if pick[e[0]] == e and pick[e[1]] == e}
        match.update({e: t for e in shakes})
        gone = {x for e in shakes for x in e}
        live = {e for e in live if e[0] not in gone and e[1] not in gone}
    return match, t


def _arcs(seed, n, m):
    rng = np.random.default_rng(seed)
    return [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]


@pytest.mark.parametrize("seed", [13, 37])
def test_matching_matches_python_twin(spark, seed):
    arcs = _arcs(seed, 150, 450)
    exp, rounds = py_matching(arcs)
    df = spark.createDataFrame(arcs, "src long, dst long")
    res = maximal_matching(df)
    got = {(r["a"], r["b"]): r["round"] for r in res.matching.collect()}
    assert got == exp
    assert res.rounds == rounds and res.converged
    # node-disjoint
    nodes = [x for e in got for x in e]
    assert len(nodes) == len(set(nodes))
    # maximal: every edge has a matched endpoint
    matched = set(nodes)
    assert all(
        s in matched or d in matched for s, d in arcs if s != d
    )


def test_matching_fixed_schedule_matches_fixpoint(spark):
    arcs = _arcs(8, 200, 600)
    df = spark.createDataFrame(arcs, "src long, dst long")
    free = {
        (r["a"], r["b"], r["round"])
        for r in maximal_matching(df).matching.collect()
    }
    res = maximal_matching(df, fixed_rounds=9)
    pinned = {(r["a"], r["b"], r["round"]) for r in res.matching.collect()}
    assert free == pinned and res.rounds == 9


def test_vertex_cover_covers_everything(spark):
    arcs = _arcs(51, 120, 400) + [(500, 501)]  # isolated edge must be covered
    df = spark.createDataFrame(arcs, "src long, dst long")
    cover = {r["node"] for r in vertex_cover_2approx(df).collect()}
    assert all(s in cover or d in cover for s, d in arcs if s != d)
    # a matching-based cover has even size by construction
    assert len(cover) % 2 == 0
