"""CutClos top-k geometric centrality vs the full computation.

Mirrors the reference's TopKGeometricCentralityTest posture: the pruned
algorithm must return the same top-k values as computing every node's
centrality, while visiting measurably fewer (source, node) pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph_spark.algos.centrality import geometric_centralities
from webgraph_spark.algos.topk import top_k_geometric
from webgraph_spark.datagen.graphs import erdos_renyi, two_cliques_bridge


def _full(spark, edges, col):
    return sorted(
        (
            (float(r[col]), int(r["source"]))
            for r in geometric_centralities(edges).collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )


@pytest.mark.parametrize("seed", [3, 19])
def test_topk_harmonic_matches_full_er(spark, seed):
    n, p, k = 400, 0.012, 10
    g = erdos_renyi(spark, n, p, seed=seed).persist()
    full = _full(spark, g, "harmonic")
    res = top_k_geometric(g, k, "harmonic", batch_size=64)
    want_vals = [v for v, _ in full[:k]]
    got_vals = [c for _, c in res.top_k]
    assert got_vals == pytest.approx(want_vals, rel=1e-9)
    # ids must match wherever values are unambiguous
    want_ids = {node for v, node in full[:k]}
    got_ids = {node for node, _ in res.top_k}
    boundary = full[k - 1][0]
    if sum(1 for v, _ in full if abs(v - boundary) < 1e-12) == 1:
        assert got_ids == want_ids
    g.unpersist()


def test_topk_visits_fewer_pairs(spark):
    """The verdict's done-criterion: top-10 on a 2,000-node ER graph
    matches the full computation while visiting measurably fewer
    (source, node) pairs than the all-pairs closure."""
    n, p, k = 2000, 0.0025, 10
    g = erdos_renyi(spark, n, p, seed=7).persist()
    full = _full(spark, g, "harmonic")
    all_pairs = int(
        geometric_centralities(g)
        .agg(F.sum("reachable").alias("s"))
        .collect()[0]["s"]
    )
    res = top_k_geometric(g, k, "harmonic", batch_size=256)
    assert [c for _, c in res.top_k] == pytest.approx(
        [v for v, _ in full[:k]], rel=1e-9
    )
    assert res.cut > 0
    assert res.visited_pairs < 0.8 * all_pairs, (
        f"visited {res.visited_pairs} vs full {all_pairs}"
    )
    g.unpersist()


def test_topk_exponential_and_lin(spark):
    n, p, k = 200, 0.02, 5
    g = erdos_renyi(spark, n, p, seed=23).persist()
    # exponential: exact values from the distance table
    from webgraph_spark.algos.betweenness import linear_geometric_centrality

    alpha = 0.5
    exact = {
        int(r["source"]): float(r["centrality"])
        for r in linear_geometric_centrality(g, lambda d: alpha**d).collect()
    }
    full = sorted(
        ((v, s) for s, v in exact.items()), key=lambda t: (-t[0], t[1])
    )
    res = top_k_geometric(g, k, "exponential", alpha=alpha, batch_size=64)
    assert [c for _, c in res.top_k] == pytest.approx(
        [v for v, _ in full[:k]], rel=1e-9
    )
    # lin
    full_lin = _full(spark, g, "lin")
    res_lin = top_k_geometric(g, k, "lin", batch_size=64)
    assert [c for _, c in res_lin.top_k] == pytest.approx(
        [v for v, _ in full_lin[:k]], rel=1e-9
    )
    g.unpersist()


def test_topk_disconnected_and_sinks(spark):
    g = two_cliques_bridge(spark, 6, 4, bridge=True)
    full = _full(spark, g, "harmonic")
    res = top_k_geometric(g, 3, "harmonic", batch_size=2)
    assert [c for _, c in res.top_k] == pytest.approx(
        [v for v, _ in full[:3]], rel=1e-9
    )


def test_topk_validates_args(spark):
    g = erdos_renyi(spark, 10, 0.2, seed=1)
    with pytest.raises(ValueError):
        top_k_geometric(g, 0)
    with pytest.raises(ValueError):
        top_k_geometric(g, 3, "nope")
    with pytest.raises(ValueError):
        top_k_geometric(g, 3, "exponential", alpha=1.5)


def test_topk_driver_state_is_scc_bounded(spark, monkeypatch):
    """No full-node collect on the CutClos path: with the condensation
    gate open, every driver collect is batch-sized or scc-sized — the
    node→scc map must stay distributed (round-3 verdict item)."""
    from pyspark.sql.classic.dataframe import DataFrame

    # two 30-node directed cycles + one bridge arc: n=60, n_scc=2
    c1 = [(i, (i + 1) % 30) for i in range(30)]
    c2 = [(30 + i, 30 + (i + 1) % 30) for i in range(30)]
    g = spark.createDataFrame(c1 + c2 + [(5, 35)], "src long, dst long").persist()
    n = 60

    sizes: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    res = top_k_geometric(g, 3, "harmonic", batch_size=8, scc_max=100)
    monkeypatch.undo()
    assert len(res.top_k) == 3
    assert sizes, "collect spy saw nothing"
    assert max(sizes) < n, f"driver collect of {max(sizes)} rows >= n={n}"
    g.unpersist()
