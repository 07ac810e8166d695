"""Physical full-BV format (operators/bvfull.py): roundtrip +
model-figure equality against the bvcomp dry-run."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from webgraph_spark.operators.bvfull import (
    bv_full_model_bits,
    pack_bv_full,
    unpack_bv_full,
)
from webgraph_spark.operators.bvcomp import bv_bits_per_link as model_bits
from webgraph_spark.operators.csr import pack_csr
from webgraph_spark.datagen.graphs import erdos_renyi


def _roundtrip(spark, edges):
    blocks = pack_bv_full(edges, num_blocks=4)
    back = unpack_bv_full(blocks).toPandas().sort_values(["src", "dst"])
    want = (
        edges.select("src", "dst")
        .distinct()
        .toPandas()
        .sort_values(["src", "dst"])
    )
    assert list(map(tuple, back.to_numpy())) == list(map(tuple, want.to_numpy()))
    return blocks


@pytest.mark.parametrize("seed", [1, 2])
def test_bvfull_roundtrip_er(spark, seed):
    g = erdos_renyi(spark, 300, 0.05, seed=seed)
    _roundtrip(spark, g)


def test_bvfull_roundtrip_copy_heavy(spark):
    """Near-identical SCATTERED lists (a shared random base set plus one
    per-node element): residual-coding the base from scratch is
    expensive, so the greedy must pick references and the copy-block +
    residual paths both roundtrip."""
    rng = np.random.RandomState(9)
    base = np.unique(rng.randint(1_000, 100_000, size=40))
    rows = []
    for i in range(200):
        for b in base:
            rows.append((i, int(b)))
        rows.append((i, 500 + i))  # one private element per node
    edges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()
    )
    blocks = _roundtrip(spark, edges)
    # references must actually fire on this fixture
    from webgraph_spark.operators.bitstream import gamma_decode

    row = blocks.orderBy("block_id").limit(1).collect()[0]
    refs = gamma_decode(row["ref_u"], row["ref_v"], int(row["n_lists"]))
    assert (refs > 0).any(), "no list chose a reference on a near-identical fixture"


def test_bvfull_roundtrip_interval_heavy(spark):
    """Consecutive-run-rich lists (node i -> [i+1 .. i+12] plus
    scattered extras) exercise the interval path; whether the greedy
    picks references here is cost-dependent, the roundtrip must hold
    either way."""
    rows = []
    rng = np.random.RandomState(9)
    for i in range(200):
        for d in range(1, 13):
            rows.append((i, i + d))
        for x in rng.randint(500, 5000, size=3):
            rows.append((i, int(x)))
    edges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()
    )
    _roundtrip(spark, edges)


@pytest.mark.parametrize("cap", [3, None])
def test_bvfull_model_figure_matches_dry_run(spark, cap):
    """The interleaved-BV model figure derived from the PHYSICAL pack's
    decoded token streams equals bvcomp's dry-run cost on the same
    edges and config — the stored bits are the modeled encoding, not a
    parallel approximation."""
    g = erdos_renyi(spark, 400, 0.04, seed=7)
    blocks = pack_bv_full(g, num_blocks=4, max_ref_count=cap)
    got = bv_full_model_bits(blocks).collect()[0]
    want = model_bits(
        pack_csr(g, num_blocks=4), max_ref_count=cap
    ).collect()[0]
    assert got["model_bits"] == want["bv_bits"], (
        got["model_bits"],
        want["bv_bits"],
    )
    assert got["n_arcs"] == want["n_arcs"]
    # the documented split overhead is bounded: src stream + <=1 bit per
    # residual + gamma-vs-unary refs can't exceed a few bits/link
    assert got["physical_bits"] < 2.0 * got["model_bits"] + 64


def test_bvfull_empty_and_singleton(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert unpack_bv_full(pack_bv_full(empty, num_blocks=2)).count() == 0
    one = spark.createDataFrame([(5, 9)], "src long, dst long")
    got = unpack_bv_full(pack_bv_full(one, num_blocks=2)).collect()
    assert [(r.src, r.dst) for r in got] == [(5, 9)]


def test_bvfull_random_access(spark):
    g = erdos_renyi(spark, 250, 0.05, seed=3)
    blocks = pack_bv_full(g, num_blocks=4).persist()
    from webgraph_spark.operators.bvfull import bv_full_successors

    pdf = g.toPandas()
    for s in pdf["src"].unique()[:10]:
        want = sorted(pdf[pdf["src"] == s]["dst"].tolist())
        assert bv_full_successors(blocks, int(s)) == want
    assert bv_full_successors(blocks, 10**9) == []


def test_bvfull_durable_roundtrip(spark, tmp_path):
    """Block table -> parquet store -> load -> decode: the format
    survives its durable representation (binary substream columns
    roundtrip through parquet exactly)."""
    from webgraph_spark.sources.storage import read_state, write_state

    g = erdos_renyi(spark, 200, 0.05, seed=11)
    blocks = pack_bv_full(g, num_blocks=3)
    path = str(tmp_path / "bvfull_blocks")
    write_state(blocks, path)
    loaded = read_state(spark, path)
    back = unpack_bv_full(loaded).toPandas().sort_values(["src", "dst"])
    want = g.toPandas().drop_duplicates().sort_values(["src", "dst"])
    assert list(map(tuple, back.to_numpy())) == list(map(tuple, want.to_numpy()))
