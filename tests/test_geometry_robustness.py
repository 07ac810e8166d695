"""Unit gates for the session-10 operators: random-failure robustness
(invariants + determinism under repartitioning) and the PCA top
component (known dominant axis recovered, explained ratio near 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ring_edges(spark, n=60):
    rows = [(i, (i + 1) % n) for i in range(n)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_random_failure_monotone_and_deterministic(spark):
    from webgraph_spark.algos.components import (
        attack_tolerance,
        random_failure_tolerance,
    )

    e = _ring_edges(spark)
    curve = {
        r.permille: r
        for r in random_failure_tolerance(e, [0, 300, 700]).collect()
    }
    # permille=0 is the intact graph: one ring component
    assert curve[0].n_nodes == 60
    assert curve[0].largest_cc == 60
    assert curve[0].n_components == 1
    # deletion is monotone in the coin threshold (same coin per node)
    assert curve[300].n_nodes >= curve[700].n_nodes
    assert curve[300].largest_cc >= curve[700].largest_cc
    # identical coin under different partitioning
    again = {
        r.permille: (r.n_nodes, r.largest_cc, r.n_components)
        for r in random_failure_tolerance(
            e.repartition(7), [0, 300, 700]
        ).collect()
    }
    for pm, r in curve.items():
        assert again[pm] == (r.n_nodes, r.largest_cc, r.n_components)
    # k=0 attack point agrees with permille=0 failure point
    atk0 = attack_tolerance(e, ks=[0]).collect()[0]
    assert (atk0.n_nodes, atk0.largest_cc) == (60, 60)


def test_pca_top_recovers_dominant_axis(spark):
    from webgraph_spark.functions.similarity import pca_top

    # variance concentrated on dim 2: x2 = +-10, tiny structured noise
    rows = []
    for i in range(40):
        sign = 1.0 if i % 2 == 0 else -1.0
        v = [0.01 * ((i * 7 + d) % 5 - 2) for d in range(8)]
        v[2] = sign * 10.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.pos: r for r in pca_top(emb, iters=12).collect()}
    assert len(out) == 8
    # sign canonicalization: the dominant loading is positive
    assert out[2].loading == pytest.approx(1.0, abs=1e-3)
    for p in range(8):
        if p != 2:
            assert abs(out[p].loading) < 0.05
    assert out[2].explained_ratio > 0.99
    assert out[2].eigenvalue > 0
