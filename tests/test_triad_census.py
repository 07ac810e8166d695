"""Triad census gates: (1) the 64-entry mask table matches the 16
hand-coded canonical Holland-Leinhardt examples (igraph's documented
convention), (2) the distributed wedge/triangle plan + completion
formulas match a brute-force all-triples enumeration on seeded ER
digraphs, (3) census identities hold (sum = C(n,3))."""

from __future__ import annotations

from itertools import combinations

import pytest

from webgraph_spark.algos.motifs import (
    TRIAD_CLASSES,
    triad_census,
    triad_mask_table,
)


def _mask(arcs):
    """Arcs over nodes {0,1,2} (already sorted p<q<r order)."""
    bit = {(0, 1): 1, (1, 0): 2, (0, 2): 4, (2, 0): 8, (1, 2): 16, (2, 1): 32}
    return sum(bit[a] for a in arcs)


CANONICAL = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)],           # A<-B->C
    "021U": [(0, 1), (2, 1)],           # A->B<-C
    "021C": [(0, 1), (1, 2)],           # A->B->C
    "111D": [(0, 1), (1, 0), (2, 1)],   # A<->B<-C
    "111U": [(0, 1), (1, 0), (1, 2)],   # A<->B->C
    "030T": [(0, 1), (2, 1), (0, 2)],   # A->B<-C, A->C
    "030C": [(1, 0), (2, 1), (0, 2)],   # A<-B<-C, A->C
    "201": [(0, 1), (1, 0), (1, 2), (2, 1)],
    "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],
    "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],
    "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],
    "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],
    "300": [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)],
}


def test_mask_table_canonical_examples():
    table = triad_mask_table()
    for name, arcs in CANONICAL.items():
        assert table[_mask(arcs)] == name, name
    assert set(table.values()) == set(TRIAD_CLASSES)


def _brute_census(n, arcset):
    table = triad_mask_table()
    census = {c: 0 for c in TRIAD_CLASSES}
    for p, q, r in combinations(range(n), 3):
        bit = 0
        if (p, q) in arcset:
            bit |= 1
        if (q, p) in arcset:
            bit |= 2
        if (p, r) in arcset:
            bit |= 4
        if (r, p) in arcset:
            bit |= 8
        if (q, r) in arcset:
            bit |= 16
        if (r, q) in arcset:
            bit |= 32
        census[table[bit]] += 1
    return census


def _er_digraph(n, seed, p_mod=11):
    """Deterministic dense-ish digraph: arc (i, j) present iff a
    simple integer hash lands below the modulus cut."""
    arcs = set()
    for i in range(n):
        for j in range(n):
            if i != j and (i * 7919 + j * 104729 + seed) % 97 < p_mod:
                arcs.add((i, j))
    return arcs


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_triad_census_matches_bruteforce(spark, seed):
    n = 30
    arcs = _er_digraph(n, seed)
    # every node appears as an endpoint (dense enough); assert to keep
    # the n used by the formulas equal to the brute-force n
    nodes = {x for a in arcs for x in a}
    assert nodes == set(range(n))
    df = spark.createDataFrame(sorted(arcs), "src long, dst long")
    got = {r.triad_class: r.n_triads for r in triad_census(df).collect()}
    want = _brute_census(n, arcs)
    assert got == want
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
