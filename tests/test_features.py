"""Neighborhood mean-feature aggregation vs dense numpy."""

from __future__ import annotations

import numpy as np

from webgraph_spark.algos.features import neighborhood_mean_features
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy


def _numpy_layer(adj, X, direction, include_self):
    a = adj.astype(float)
    np.fill_diagonal(a, 0)
    if direction == "in":
        m = a.T  # row v: mask of in-neighbors of v
    else:
        m = a
    if include_self:
        m = m + np.eye(len(a))
    out = X.copy()
    for v in range(len(a)):
        nz = m[v] > 0
        if nz.any():
            out[v] = X[nz].mean(axis=0)
    return out


def _run(spark, n, p, seed, dim, hops, direction, include_self):
    rng = np.random.RandomState(seed + 100)
    X = np.round(rng.randn(n, dim), 6)
    feats = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "id long, vec array<double>",
    )
    e = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    got_df = neighborhood_mean_features(
        e, feats, hops=hops, direction=direction, include_self=include_self
    )
    got = {r["node"]: np.array(r["vec"]) for r in got_df.collect()}
    want = X.copy()
    for _ in range(hops):
        want = _numpy_layer(adj, want, direction, include_self)
    # nodes absent from the edge table keep identity (they are not in
    # the spark result set only if features cover them — they are)
    for v in range(n):
        np.testing.assert_allclose(got[v], want[v], atol=1e-9), v


def test_one_hop_in(spark):
    _run(spark, 25, 0.15, 7, 5, 1, "in", False)


def test_one_hop_out_with_self(spark):
    _run(spark, 25, 0.15, 8, 5, 1, "out", True)


def test_two_hops_stack(spark):
    _run(spark, 20, 0.2, 9, 4, 2, "in", False)


def test_isolated_node_keeps_identity(spark):
    feats = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [10.0, 20.0])],
        "id long, vec array<double>",
    )
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    out = {
        r["node"]: list(r["vec"])
        for r in neighborhood_mean_features(e, feats).collect()
    }
    assert out[1] == [1.0, 2.0]   # mean of in-neighbor {0}
    assert out[0] == [1.0, 2.0]   # no in-neighbors: identity
    assert out[2] == [10.0, 20.0]  # isolated: identity
