"""Motif counts vs dense numpy oracles (co-citation, coupling, quads,
reciprocity)."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.motifs import (
    common_neighbor_counts,
    quad_count,
    reciprocity,
)
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy


def _dense(adj: np.ndarray, mode: str) -> np.ndarray:
    a = adj.astype(np.int64)
    np.fill_diagonal(a, 0)
    if mode == "cocitation":
        return a.T @ a
    if mode == "coupling":
        return a @ a.T
    u = ((a + a.T) > 0).astype(np.int64)
    np.fill_diagonal(u, 0)
    return u @ u


@pytest.mark.parametrize("mode", ["cocitation", "coupling", "undirected"])
def test_common_neighbors_vs_numpy(spark, mode):
    n, p, seed = 30, 0.15, 3
    e = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    m = _dense(adj, mode)
    got = {
        (r["a"], r["b"]): r["common"]
        for r in common_neighbor_counts(e, mode=mode).collect()
    }
    want = {
        (i, j): int(m[i, j])
        for i in range(n)
        for j in range(i + 1, n)
        if m[i, j] > 0
    }
    assert got == want


def test_quad_count_vs_numpy(spark):
    n, p, seed = 25, 0.2, 5
    e = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    u = ((adj + adj.T) > 0).astype(np.int64)
    np.fill_diagonal(u, 0)
    # trace-based 4-cycle count: (tr(A^4) - 2m - sum deg(deg-1)*2) / 8
    a4 = np.linalg.matrix_power(u, 4)
    deg = u.sum(axis=1)
    m2 = u.sum()  # 2m
    closed4 = np.trace(a4)
    want = int(closed4 - m2 - 2 * (deg * (deg - 1)).sum()) // 8
    assert quad_count(e) == want


def test_quad_count_square_plus_tail(spark):
    # one rectangle 0-1-2-3 plus a pendant 3-4: exactly one 4-cycle
    arcs = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4)]
    e = spark.createDataFrame(arcs, "src long, dst long")
    assert quad_count(e) == 1


def test_center_degree_cap_drops_hub_wedges(spark):
    # star center 0 with 5 leaves: all common-neighbor pairs are centered
    # at the hub; capping below its degree empties the result
    arcs = [(0, i) for i in range(1, 6)]
    e = spark.createDataFrame(arcs, "src long, dst long")
    full = common_neighbor_counts(e, mode="undirected").count()
    capped = common_neighbor_counts(
        e, mode="undirected", max_center_degree=3
    ).count()
    assert full == 10 and capped == 0


def test_reciprocity(spark):
    arcs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 4)]
    e = spark.createDataFrame(arcs, "src long, dst long")
    row = reciprocity(e).collect()[0]
    # loop dropped: 5 arcs, 4 mutual (0<->1, 2<->3)
    assert row["arcs"] == 5 and row["mutual_arcs"] == 4
    assert abs(row["reciprocity"] - 0.8) < 1e-9


@pytest.mark.parametrize("seed", [3, 11])
def test_directed_triangle_profile_vs_numpy(spark, seed):
    # Fagiolo roles over ORDERED neighbour pairs == einsum contractions
    from webgraph_spark.algos.motifs import directed_triangle_profile

    n, p = 30, 0.15
    e = erdos_renyi(spark, n, p, seed=seed)
    a = erdos_renyi_numpy(n, p, seed=seed).astype(np.int64)
    np.fill_diagonal(a, 0)
    cyc = np.einsum("ij,jk,ki->i", a, a, a)
    mid = np.einsum("ji,ik,jk->i", a, a, a)
    tin = np.einsum("ji,ki,jk->i", a, a, a)
    tout = np.einsum("ij,ik,jk->i", a, a, a)
    got = {
        r["node"]: (r["t_cyc"], r["t_mid"], r["t_in"], r["t_out"])
        for r in directed_triangle_profile(e).collect()
    }
    touched = set(np.flatnonzero(a.sum(0) + a.sum(1)).tolist())
    assert set(got) == touched
    for i in touched:
        assert got[i] == (int(cyc[i]), int(mid[i]), int(tin[i]), int(tout[i]))
    # identity: every closed directed triple lands in exactly one role
    # at each corner -> totals each equal trace(A^3) = sum of cycles
    tot = np.array([cyc.sum(), mid.sum(), tin.sum(), tout.sum()])
    g = np.array(
        [sum(v[k] for v in got.values()) for k in range(4)], dtype=np.int64
    )
    assert (g == tot).all()


def test_directed_clustering_vs_numpy(spark):
    from webgraph_spark.algos.motifs import directed_clustering

    n, p, seed = 30, 0.15, 7
    e = erdos_renyi(spark, n, p, seed=seed)
    a = erdos_renyi_numpy(n, p, seed=seed).astype(np.int64)
    np.fill_diagonal(a, 0)
    cyc = np.einsum("ij,jk,ki->i", a, a, a)
    mid = np.einsum("ji,ik,jk->i", a, a, a)
    tin = np.einsum("ji,ki,jk->i", a, a, a)
    tout = np.einsum("ij,ik,jk->i", a, a, a)
    dout, din = a.sum(1), a.sum(0)
    dbi = (a * a.T).sum(1)
    got = {
        r["node"]: (r["c_cyc"], r["c_mid"], r["c_in"], r["c_out"])
        for r in directed_clustering(e).collect()
    }
    for i in got:
        dcm = din[i] * dout[i] - dbi[i]
        want = (
            cyc[i] / dcm if dcm > 0 else None,
            mid[i] / dcm if dcm > 0 else None,
            tin[i] / (din[i] * (din[i] - 1)) if din[i] > 1 else None,
            tout[i] / (dout[i] * (dout[i] - 1)) if dout[i] > 1 else None,
        )
        for g, w in zip(got[i], want):
            if w is None:
                assert g is None
            else:
                assert g is not None and abs(g - w) < 1e-12


def test_directed_clustering_precomputed_profile(spark):
    from webgraph_spark.algos.motifs import (
        directed_clustering,
        directed_triangle_profile,
    )

    e = erdos_renyi(spark, 25, 0.2, seed=5)
    prof = directed_triangle_profile(e)
    a = {r["node"]: r for r in directed_clustering(e).collect()}
    b = {r["node"]: r for r in directed_clustering(e, profile=prof).collect()}
    assert set(a) == set(b)
    for n in a:
        for c in ("c_cyc", "c_mid", "c_in", "c_out"):
            assert a[n][c] == b[n][c]


def test_directed_profile_degenerate(spark):
    from webgraph_spark.algos.motifs import (
        directed_clustering,
        directed_triangle_profile,
    )

    # empty graph
    empty = spark.createDataFrame([], "src long, dst long")
    assert directed_triangle_profile(empty).count() == 0
    assert directed_clustering(empty).count() == 0
    # single arc + self loop (loop dropped): no triangles, zeros
    e1 = spark.createDataFrame([(0, 1), (2, 2)], "src long, dst long")
    rows = {r["node"]: r for r in directed_triangle_profile(e1).collect()}
    assert set(rows) == {0, 1}
    assert all(
        rows[n][c] == 0
        for n in rows
        for c in ("t_cyc", "t_mid", "t_in", "t_out")
    )
    # complete reciprocal triangle: every corner has every role
    arcs = [(a, b) for a in range(3) for b in range(3) if a != b]
    e2 = spark.createDataFrame(arcs, "src long, dst long")
    prof = {r["node"]: r for r in directed_triangle_profile(e2).collect()}
    a = np.ones((3, 3), dtype=np.int64)
    np.fill_diagonal(a, 0)
    cyc = np.einsum("ij,jk,ki->i", a, a, a)
    mid = np.einsum("ji,ik,jk->i", a, a, a)
    tin = np.einsum("ji,ki,jk->i", a, a, a)
    tout = np.einsum("ij,ik,jk->i", a, a, a)
    for n in range(3):
        assert (
            prof[n]["t_cyc"], prof[n]["t_mid"], prof[n]["t_in"],
            prof[n]["t_out"],
        ) == (int(cyc[n]), int(mid[n]), int(tin[n]), int(tout[n]))
    # clustering of the complete reciprocal triangle is 1.0 in all roles
    dc = {r["node"]: r for r in directed_clustering(e2).collect()}
    for n in range(3):
        for c in ("c_cyc", "c_mid", "c_in", "c_out"):
            assert abs(dc[n][c] - 1.0) < 1e-12


@pytest.mark.parametrize("seed", [2, 9, 17])
def test_directed_profile_invariants_random(spark, seed):
    """Structural invariants on random digraphs: transitive triples hit
    mid/in/out exactly once each (equal totals), cycle corners come in
    threes, and participation nodes == nodes on >=1 support triangle."""
    from webgraph_spark.algos.motifs import directed_triangle_profile

    n, p = 40, 0.12
    e = erdos_renyi(spark, n, p, seed=seed)
    rows = directed_triangle_profile(e).collect()
    tot = [0, 0, 0, 0]
    participating = 0
    for r in rows:
        vals = (r["t_cyc"], r["t_mid"], r["t_in"], r["t_out"])
        for k in range(4):
            tot[k] += vals[k]
        if sum(vals) > 0:
            participating += 1
    assert tot[1] == tot[2] == tot[3]
    assert tot[0] % 3 == 0
    # cross-check participation with an independent numpy support count
    a = erdos_renyi_numpy(n, p, seed=seed).astype(np.int64)
    np.fill_diagonal(a, 0)
    u = ((a + a.T) > 0).astype(np.int64)
    tri_nodes = int(((u @ u) * u).sum(axis=1).astype(bool).sum())
    assert participating == tri_nodes
