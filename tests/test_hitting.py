"""Truncated hitting-time value iteration: integer-recurrence twin,
monotone convergence toward the exact linear-system solution."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webgraph_spark.algos.paths import hitting_time
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy

SCALE = 10**9


def hitting_numpy(adj: np.ndarray, targets: set[int], iters: int) -> np.ndarray:
    """Identical integer recurrence (units of 1e-9 steps, half-up div)."""
    sym = adj | adj.T
    np.fill_diagonal(sym, False)
    n = sym.shape[0]
    deg = sym.sum(axis=1).astype(np.int64)
    hs = np.zeros(n, dtype=np.int64)
    for k in range(1, iters + 1):
        nsum = sym @ hs
        new = np.empty(n, dtype=np.int64)
        for v in range(n):
            if v in targets:
                new[v] = 0
            elif deg[v] == 0:
                new[v] = k * SCALE
            else:
                new[v] = SCALE + (2 * int(nsum[v]) + int(deg[v])) // (2 * int(deg[v]))
        hs = new
    return hs / SCALE


@pytest.mark.parametrize("n,p,seed", [(40, 0.08, 3), (60, 0.05, 9)])
def test_hitting_vs_numpy(spark, n, p, seed):
    g = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    targets = {0, 1, 2}
    tgt = spark.createDataFrame([(t,) for t in targets], "node long")
    got = {
        r.node: r.hit for r in hitting_time(g, tgt, iters=5).collect()
    }
    want = hitting_numpy(adj, targets, iters=5)
    present = adj.any(axis=1) | adj.any(axis=0)
    for v in range(n):
        if present[v]:
            assert got[v] == pytest.approx(want[v], abs=0), f"node {v}"


def test_hitting_path_graph_converges_to_exact(spark):
    """Path 0-1-2-3-4 with target {0}: exact hitting times from the
    absorbing linear system are h(i) = i * (2*n - 1 - i) for a path of
    n+1 nodes... computed here by solving the system directly."""
    n = 6
    rows = [(i, i + 1) for i in range(n - 1)]
    g = spark.createDataFrame(rows, "src long, dst long")
    tgt = spark.createDataFrame([(0,)], "node long")
    # exact solution: h(0)=0; interior h(i)=1+(h(i-1)+h(i+1))/2; end
    # h(n-1)=1+h(n-2)
    A = np.zeros((n, n))
    b = np.zeros(n)
    A[0, 0] = 1.0
    for i in range(1, n - 1):
        A[i, i] = 1.0
        A[i, i - 1] = -0.5
        A[i, i + 1] = -0.5
        b[i] = 1.0
    A[n - 1, n - 1] = 1.0
    A[n - 1, n - 2] = -1.0
    b[n - 1] = 1.0
    exact = np.linalg.solve(A, b)
    got_200 = {r.node: r.hit for r in hitting_time(g, tgt, iters=200).collect()}
    got_10 = {r.node: r.hit for r in hitting_time(g, tgt, iters=10).collect()}
    assert got_200[0] == 0.0
    for i in range(1, n):
        # truncated iteration is a monotone lower-bound sequence
        assert got_10[i] <= got_200[i] <= exact[i] + 1e-6, f"node {i}"
    # convergence is diffusive (O(n^2) rounds on a path); 200 rounds
    # puts the 6-node path within 1e-2 of the linear-system solution
    for i in range(n):
        assert got_200[i] == pytest.approx(exact[i], abs=1e-2), f"node {i}"


def test_hitting_targets_and_isolated(spark):
    g = spark.createDataFrame(
        [(1, 2), (2, 1), (7, 7)], "src long, dst long"
    )  # component {1,2}; node 7 only self-loops (deg 0 after cleanup)
    tgt = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hit for r in hitting_time(g, tgt, iters=4).collect()}
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[7] == 4.0  # pinned to the truncation value
