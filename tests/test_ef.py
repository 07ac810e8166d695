"""Elias–Fano pack round-trip + random access + skipTo
(EFGraphTest pattern: store -> load -> assertEquals over parameter
sweeps; EFGraph.java:1147 skipTo semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.datagen.graphs import directed_cycle, erdos_renyi, star
from webgraph_spark.operators.ef import (
    ef_bits_per_link,
    ef_decode_list,
    ef_encode_list,
    ef_successors,
    pack_ef,
    skip_to,
    unpack_ef,
)
from webgraph_spark.operators.transforms import graphs_equal


@pytest.mark.parametrize("k,u,seed", [(1, 10, 0), (5, 100, 1), (64, 1000, 2), (100, 120, 3), (7, 1 << 40, 4)])
def test_encode_decode_list(k, u, seed):
    rng = np.random.default_rng(seed)
    vals = np.sort(rng.choice(u, size=k, replace=False)).astype(np.int64)
    l, lo, up = ef_encode_list(vals, u)
    got = ef_decode_list(k, l, np.frombuffer(lo, np.uint8), np.frombuffer(up, np.uint8))
    assert np.array_equal(got, vals)


def test_encode_empty_and_dense():
    l, lo, up = ef_encode_list(np.empty(0, np.int64), 100)
    assert ef_decode_list(0, l, np.frombuffer(lo, np.uint8), np.frombuffer(up, np.uint8)).size == 0
    vals = np.arange(50, dtype=np.int64)  # u == k: l = 0, pure unary
    l, lo, up = ef_encode_list(vals, 50)
    assert l == 0
    got = ef_decode_list(50, l, np.frombuffer(lo, np.uint8), np.frombuffer(up, np.uint8))
    assert np.array_equal(got, vals)


@pytest.mark.parametrize(
    "n,p,seed,blocks", [(50, 0.1, 1, 1), (50, 0.1, 1, 4), (200, 0.05, 2, 8)]
)
def test_roundtrip_er(spark, n, p, seed, blocks):
    g = erdos_renyi(spark, n, p, seed=seed)
    assert graphs_equal(unpack_ef(pack_ef(g, num_blocks=blocks)), g)


def test_roundtrip_hub_skew(spark):
    g = star(spark, 300, out=True).unionByName(star(spark, 300, out=False))
    assert graphs_equal(unpack_ef(pack_ef(g, num_blocks=8)), g)


def test_duplicates_collapse(spark):
    g = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    got = sorted((r.src, r.dst) for r in unpack_ef(pack_ef(g, num_blocks=1)).collect())
    assert got == [(0, 1), (0, 2), (1, 2)]


def test_random_access_and_skipto(spark):
    g = erdos_renyi(spark, 120, 0.08, seed=9)
    blocks = pack_ef(g, num_blocks=4).cache()
    try:
        expected = {}
        for r in g.collect():
            expected.setdefault(r.src, []).append(r.dst)
        for node in list(expected)[:10]:
            succ = ef_successors(blocks, node)
            assert succ == sorted(set(expected[node]))
            arr = np.asarray(succ, dtype=np.int64)
            # skipTo: smallest successor >= bound; -1 past the end
            assert skip_to(arr, succ[0]) == succ[0]
            assert skip_to(arr, succ[-1] + 1) == -1
            mid = succ[len(succ) // 2]
            assert skip_to(arr, mid) == mid
        assert ef_successors(blocks, 10_000) == []
    finally:
        blocks.unpersist()


def test_ef_beats_raw_on_cycle(spark):
    """EF cost on a cycle (one successor per node) is ~2 + log2(u/1)
    bits/link << 64-bit raw; sanity-bound the exact accounting."""
    g = directed_cycle(spark, 256)
    row = ef_bits_per_link(pack_ef(g, num_blocks=2)).collect()[0]
    assert row["n_arcs"] == 256
    assert 2.0 <= row["bits_per_link"] <= 2 + np.log2(256) + 2


# ----------------------------- property tests (hypothesis, numpy-level)

from hypothesis import given, settings, strategies as st


@given(
    st.lists(st.integers(0, 2**40), min_size=1, max_size=200),
    st.integers(1, 2**20),
)
@settings(max_examples=80, deadline=None)
def test_ef_list_roundtrip_property(vals, slack):
    import numpy as np

    from webgraph_spark.operators.ef import (
        ef_decode_list,
        ef_encode_list,
        skip_to,
    )

    v = np.array(sorted(set(vals)), dtype=np.int64)
    u = int(v[-1]) + slack
    l, lowers, uppers = ef_encode_list(v, u)
    out = ef_decode_list(
        len(v),
        l,
        np.frombuffer(lowers, dtype=np.uint8),
        np.frombuffer(uppers, dtype=np.uint8),
    )
    assert np.array_equal(out, v)
    # skipTo returns the smallest successor >= bound, -1 past the end
    for bound in {0, int(v[0]), int(v[-1]), int(v[-1]) + 1,
                  int(v[len(v) // 2])}:
        got = skip_to(v, bound)
        geq = v[v >= bound]
        assert got == (int(geq[0]) if len(geq) else -1)
