"""Louvain modularity moves: numpy-twin equality, planted communities,
multi-level contraction, and modularity improvement over singletons."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webgraph_spark.algos.labelprop import modularity
from webgraph_spark.algos.louvain import (
    contract,
    louvain,
    louvain_moves,
    louvain_moves_numpy,
    _weighted_sym,
)
from webgraph_spark.datagen.graphs import erdos_renyi, erdos_renyi_numpy


def _planted(spark, k: int = 6, blocks: int = 3):
    """`blocks` directed k-cliques chained by single bridge arcs."""
    rows = []
    for b in range(blocks):
        base = b * k
        rows += [
            (base + i, base + j) for i in range(k) for j in range(k) if i != j
        ]
        if b:
            rows.append((base - 1, base))
    return spark.createDataFrame(rows, "src long, dst long")


@pytest.mark.parametrize("n,p,seed,rounds", [(40, 0.06, 7, 2), (70, 0.04, 11, 3)])
def test_louvain_moves_vs_numpy(spark, n, p, seed, rounds):
    g = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    res = louvain_moves(g, rounds=rounds)
    want = louvain_moves_numpy(adj, rounds=rounds)
    got = {r.node: r.label for r in res.labels.collect()}
    present = adj.any(axis=1) | adj.any(axis=0)
    for i in range(n):
        if present[i]:
            assert got[i] == int(want[i]), f"node {i}"


def test_louvain_planted_blocks(spark):
    g = _planted(spark, k=6, blocks=3)
    res = louvain_moves(g, rounds=6)
    rows = res.labels.collect()
    # every clique collapses to one community, bridges don't merge them
    by_block: dict[int, set] = {}
    for r in rows:
        by_block.setdefault(int(r.node) // 6, set()).add(r.label)
    assert all(len(s) == 1 for s in by_block.values())
    assert len({next(iter(s)) for s in by_block.values()}) == 3


def test_louvain_beats_singletons(spark):
    g = _planted(spark, k=5, blocks=4)
    res = louvain_moves(g, rounds=6)
    q_moves = modularity(g, res.labels).collect()[0].modularity
    nodes = res.labels.select("node", F.col("node").alias("label"))
    q_single = modularity(g, nodes).collect()[0].modularity
    assert q_moves > q_single
    assert q_moves > 0.5  # near-disconnected cliques: strong structure


def test_louvain_multilevel_weighted_twin(spark):
    """Level-2 weighted moves on the contracted graph match the numpy
    twin run on the same integer weight matrix."""
    g = _planted(spark, k=4, blocks=4)
    l1 = louvain_moves(g, rounds=2)
    arcs = _weighted_sym(g)
    cg = contract(arcs, l1.labels)
    rows = cg.collect()
    ids = sorted({int(r.src) for r in rows} | {int(r.dst) for r in rows})
    idx = {c: i for i, c in enumerate(ids)}
    w = np.zeros((len(ids), len(ids)), dtype=np.int64)
    for r in rows:
        w[idx[int(r.src)], idx[int(r.dst)]] = int(r.w)
    want = louvain_moves_numpy(
        np.zeros_like(w, bool), rounds=2, weights=w, node_ids=np.array(ids)
    )
    res2 = louvain_moves(cg, rounds=2, weighted=True)
    got = {r.node: r.label for r in res2.labels.collect()}
    for c, i in idx.items():
        assert idx[got[c]] == int(want[i]), f"community {c}"


def test_louvain_multilevel_covers_all_nodes(spark):
    g = _planted(spark, k=5, blocks=3)
    res = louvain(g, levels=2, rounds=3)
    assert res.levels == 2
    n_nodes = (
        g.select(F.col("src").alias("n"))
        .unionByName(g.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    assert res.labels.count() == n_nodes
    assert res.labels.select("node").distinct().count() == n_nodes


def test_louvain_sql_twin_duckdb(spark):
    """The unrolled DuckDB oracle reproduces the Spark labels on a
    seeded ER graph loaded through the same edge-table shape."""
    import duckdb

    from webgraph_spark.graph import testdata as td

    n, p, seed = 50, 0.05, 13
    g = erdos_renyi(spark, n, p, seed=seed).persist()
    pdf = g.toPandas()
    con = duckdb.connect()
    con.register("test_edges", pdf)
    sql = td.louvain_sql(rounds=2)
    # the oracle builder opens with the shared TPC-H EDGES_CTE; swap in
    # the fixture table (same (src, dst) contract)
    sql = sql.replace(td.EDGES_CTE, "edges AS (SELECT src, dst FROM test_edges)")
    want = {
        int(r[0]): int(r[1]) for r in con.execute(sql).fetchall()
    }
    res = louvain_moves(g, rounds=2)
    got = {r.node: r.label for r in res.labels.collect()}
    assert got == want
    g.unpersist()


def test_community_conductance_two_cliques(spark):
    from webgraph_spark.algos.labelprop import community_conductance

    g = _planted(spark, k=5, blocks=2)  # one bridge arc between cliques
    labels = spark.createDataFrame(
        [(i, i // 5) for i in range(10)], "node long, label long"
    )
    out = community_conductance(g, labels, k=2).collect()
    by_label = {r.label: r for r in out}
    # sym graph: each clique has 5*4=20 internal arcs + 1 bridge
    # endpoint -> vol 21, cut 1; phi = 1/21
    for lbl in (0, 1):
        r = by_label[lbl]
        assert r.n_nodes == 5
        assert r.vol == 21 and r.cut == 1
        assert r.phi == round(1 / 21, 9)
