"""Fused (job-chained, leaked-mass) PageRank vs the exact synchronous
path and the numpy oracle.

The fused variant iterates s <- alpha*A^T D^-1 s + (1-alpha)/n and
normalizes at the end; the normalized fixpoint is identical to the
dangling-redistribution PageRank (see pagerank_fused docstring for the
algebra). These tests pin that equivalence on graphs WITH dangling
nodes, across chain lengths, including the resume path.
"""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.pagerank import pagerank, pagerank_fused
from webgraph_spark.datagen.graphs import (
    complete_graph,
    directed_cycle,
    erdos_renyi,
    erdos_renyi_numpy,
    star,
)
from .oracles import pagerank_numpy


def _ranks_array(result, n: int) -> np.ndarray:
    pdf = result.ranks.toPandas().sort_values("node")
    out = np.zeros(n)
    out[pdf["node"].to_numpy()] = pdf["rank"].to_numpy()
    return out


def test_clique_uniform(spark):
    n = 6
    res = pagerank_fused(complete_graph(spark, n), tol=1e-9, chain=3)
    assert res.converged
    np.testing.assert_allclose(_ranks_array(res, n), np.full(n, 1.0 / n), atol=1e-8)


def test_star_dangling_matches_exact(spark):
    """Hub -> leaves: every leaf is dangling — the case where the
    leaked-mass reformulation could diverge from the exact path if the
    normalization identity were wrong."""
    k = 10
    edges = star(spark, k, out=True)
    res = pagerank_fused(edges, tol=1e-9, max_iter=300, chain=4)
    adj = np.zeros((k + 1, k + 1), dtype=bool)
    adj[0, 1:] = True
    want = pagerank_numpy(adj, tol=1e-9)
    np.testing.assert_allclose(_ranks_array(res, k + 1), want, atol=1e-6)


@pytest.mark.parametrize("chain", [1, 2, 5])
def test_erdos_renyi_chain_lengths(spark, chain):
    n, p, seed = 60, 0.05, 2
    edges = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    res = pagerank_fused(edges, tol=1e-8, max_iter=300, chain=chain)
    assert res.converged
    want = pagerank_numpy(adj, tol=1e-8, max_iter=300)
    got = _ranks_array(res, n)
    present = adj.any(axis=1) | adj.any(axis=0)
    np.testing.assert_allclose(got[present], want[present], atol=1e-6)


def test_fused_vs_exact_same_graph(spark):
    n, p, seed = 100, 0.05, 3
    edges = erdos_renyi(spark, n, p, seed=seed)
    exact = pagerank(edges, tol=1e-9, max_iter=400)
    fused = pagerank_fused(edges, tol=1e-9, max_iter=400, chain=4)
    a = _ranks_array(exact, n)
    b = _ranks_array(fused, n)
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_cycle_fixed_iterations(spark):
    n = 10
    res = pagerank_fused(directed_cycle(spark, n), fixed_iterations=8, chain=3)
    # 8 requested -> 3 chains of 3 = 9 executed (chain rounding up)
    assert res.iterations == 9
    np.testing.assert_allclose(_ranks_array(res, n), np.full(n, 1.0 / n), atol=1e-6)


def test_fused_resume_from_checkpoint(spark, tmp_path):
    """Kill after a few chains, restart with the same dir: the second run
    resumes from the last complete chain boundary and converges to the
    same vector."""
    n, p, seed = 60, 0.08, 5
    edges = erdos_renyi(spark, n, p, seed=seed)
    ckpt = str(tmp_path / "pr_fused")
    partial = pagerank_fused(
        edges, fixed_iterations=6, chain=2, checkpoint_dir=ckpt, run_id="r1"
    )
    assert partial.iterations == 6
    full = pagerank_fused(
        edges, tol=1e-9, max_iter=300, chain=2, checkpoint_dir=ckpt, run_id="r1"
    )
    assert full.converged
    want = pagerank_numpy(erdos_renyi_numpy(n, p, seed=seed), tol=1e-9, max_iter=400)
    got = _ranks_array(full, n)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    present = adj.any(axis=1) | adj.any(axis=0)
    np.testing.assert_allclose(got[present], want[present], atol=1e-6)
