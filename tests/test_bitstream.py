"""Split-γ bitstream codec + BV pack (operators/bitstream.py)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from webgraph_spark.operators.bitstream import (
    bv_bits_per_link,
    zeta_bits_vec,
    zeta_decode,
    zeta_encode,
    bv_successors,
    gamma_bits,
    gamma_decode,
    gamma_encode,
    pack_bv,
    unpack_bv,
)
from webgraph_spark.operators.csr import gamma_bits_per_link, pack_csr
from webgraph_spark.datagen.graphs import erdos_renyi


def _scalar_gamma_bits(values):
    # independent scalar reference: interleaved γ length 2*bitlen(v+1)-1
    return sum(2 * int(v + 1).bit_length() - 1 for v in values)


@given(
    st.lists(
        st.one_of(
            st.integers(0, 15),
            st.integers(0, 2**20),
            st.integers(0, 2**62 - 2),
        ),
        max_size=300,
    )
)
@settings(max_examples=60, deadline=None)
def test_gamma_roundtrip_property(vals):
    v = np.array(vals, dtype=np.int64)
    u, b = gamma_encode(v)
    assert np.array_equal(gamma_decode(u, b, len(v)), v)
    assert gamma_bits(v) == _scalar_gamma_bits(vals)


def test_gamma_rejects_negative():
    with pytest.raises(ValueError):
        gamma_encode(np.array([3, -1], dtype=np.int64))


def test_gamma_decode_underfull_stream():
    u, b = gamma_encode(np.array([5, 6], dtype=np.int64))
    with pytest.raises(ValueError):
        gamma_decode(u, b, 3)


def test_bv_pack_roundtrip_er(spark):
    edges = erdos_renyi(spark, n=400, p=0.02, seed=9)
    blocks = pack_bv(edges, num_blocks=7)
    back = unpack_bv(blocks).toPandas().sort_values(["src", "dst"])
    want = (
        edges.select("src", "dst").distinct().toPandas().sort_values(["src", "dst"])
    )
    assert list(map(tuple, back.to_numpy())) == list(map(tuple, want.to_numpy()))


def test_bv_bits_equals_entropy_model(spark):
    """The physically stored firsts+gaps payload must equal the CSR
    entropy model bit-for-bit on the same block bounds."""
    edges = erdos_renyi(spark, n=300, p=0.03, seed=4)
    from webgraph_spark.operators.csr import arc_balanced_bounds

    bounds = arc_balanced_bounds(edges, 5)
    model = gamma_bits_per_link(pack_csr(edges, bounds=bounds)).collect()[0]
    real = bv_bits_per_link(pack_bv(edges, bounds=bounds)).collect()[0]
    assert real["gamma_bits"] == model["gamma_bits"]
    assert real["n_arcs"] == model["n_arcs"]


def test_bv_hub_list_and_random_access(spark):
    """One node with a large successor list packs/decodes correctly and
    the pruned random-access query returns it sorted."""
    hub = pd.DataFrame(
        {"src": np.zeros(20000, np.int64), "dst": np.arange(1, 20001) * 3}
    )
    extra = pd.DataFrame({"src": [7, 7, 9], "dst": [1, 5, 2]})
    edges = spark.createDataFrame(pd.concat([hub, extra]))
    blocks = pack_bv(edges, num_blocks=3)
    assert bv_successors(blocks, 0) == (np.arange(1, 20001) * 3).tolist()
    assert bv_successors(blocks, 7) == [1, 5]
    assert bv_successors(blocks, 12345) == []


def test_bv_smaller_than_raw_csr(spark):
    """The point of the exercise: γ-packed payload is a small fraction
    of the raw int64 CSR buffers on a gap-friendly graph."""
    edges = erdos_renyi(spark, n=500, p=0.05, seed=2)
    bounds_args = dict(num_blocks=4)
    bv = pack_bv(edges, **bounds_args)
    csr = pack_csr(edges, **bounds_args)
    bv_bytes = (
        bv.select(
            sum(
                F.length(c)
                for c in ["deg_u", "deg_v", "src_u", "src_v",
                          "first_u", "first_v", "gap_u", "gap_v"]
            ).alias("b")
        )
        .agg(F.sum("b"))
        .collect()[0][0]
    )
    csr_bytes = (
        csr.select(
            sum(F.length(c) for c in ["srcs", "counts", "firsts", "gaps"]).alias("b")
        )
        .agg(F.sum("b"))
        .collect()[0][0]
    )
    assert bv_bytes < 0.25 * csr_bytes, (bv_bytes, csr_bytes)


@given(
    st.lists(
        st.one_of(st.integers(0, 7), st.integers(0, 2**30), st.integers(0, 2**62 - 2)),
        max_size=200,
    )
)
@settings(max_examples=50, deadline=None)
def test_delta_roundtrip_property(vals):
    from webgraph_spark.operators.bitstream import (
        delta_bits,
        delta_decode,
        delta_encode,
    )

    v = np.array(vals, dtype=np.int64)
    lu, lv, vb = delta_encode(v)
    assert np.array_equal(delta_decode(lu, lv, vb, len(v)), v)
    # scalar reference: delta(v) = gamma(bitlen(v+1)-1) + bitlen(v+1)-1
    ref = sum(
        2 * int((x + 1).bit_length()).bit_length() - 1 + (x + 1).bit_length() - 1
        for x in vals
    )
    assert delta_bits(v) == ref


def test_bv_delta_pack_roundtrip_and_bits(spark):
    """code="delta" roundtrips; on heavy-tailed gaps δ payload < γ."""
    from webgraph_spark.operators.bitstream import bv_bits_per_link

    rng = np.random.RandomState(6)
    # heavy-tailed successor gaps: sparse dsts over a wide id space
    pdf = pd.DataFrame(
        {
            "src": rng.randint(0, 50, 8000),
            "dst": (rng.pareto(0.5, 8000) * 50).astype(np.int64) % (2**30),
        }
    )
    edges = spark.createDataFrame(pdf)
    for code in ("gamma", "delta"):
        blocks = pack_bv(edges, num_blocks=4, code=code)
        back = unpack_bv(blocks).toPandas().sort_values(["src", "dst"])
        want = (
            edges.select("src", "dst").distinct().toPandas().sort_values(["src", "dst"])
        )
        assert list(map(tuple, back.to_numpy())) == list(map(tuple, want.to_numpy())), code
    g = bv_bits_per_link(pack_bv(edges, num_blocks=4, code="gamma")).collect()[0]
    d = bv_bits_per_link(pack_bv(edges, num_blocks=4, code="delta")).collect()[0]
    assert d["gamma_bits"] < g["gamma_bits"], (d["gamma_bits"], g["gamma_bits"])


def test_labelled_pack_roundtrip(spark):
    """γ-coded parallel label substream (BitStreamArcLabelledImmutable-
    Graph + GammaCodedIntLabel analog): store -> load preserves
    (src, dst, label) for both component codes; duplicate arcs and
    negative labels are rejected, unlabelled blocks carry empty
    streams."""
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "src": rng.randint(0, 40, 3000),
            "dst": rng.randint(0, 500, 3000),
        }
    )
    pdf = pdf.drop_duplicates()
    pdf["label"] = rng.randint(0, 10_000, len(pdf)).astype(np.int64)
    edges = spark.createDataFrame(pdf)
    want = sorted(map(tuple, pdf.to_numpy()))
    for code in ("gamma", "delta"):
        blocks = pack_bv(edges, num_blocks=4, code=code, label_col="label")
        back = unpack_bv(blocks, labelled=True).toPandas()
        assert sorted(map(tuple, back.to_numpy())) == want, code

    # duplicate arcs with labels must raise, not silently merge
    dup = spark.createDataFrame(
        pd.DataFrame({"src": [1, 1], "dst": [2, 2], "label": [3, 4]})
    )
    with pytest.raises(Exception, match="unique arcs"):
        unpack_bv(pack_bv(dup, num_blocks=1, label_col="label"), labelled=True).count()

    neg = spark.createDataFrame(
        pd.DataFrame({"src": [1], "dst": [2], "label": [-5]})
    )
    with pytest.raises(Exception, match="natural"):
        unpack_bv(pack_bv(neg, num_blocks=1, label_col="label"), labelled=True).count()

    # unlabelled pack stores empty label streams, roundtrip unchanged
    plain = pack_bv(edges.select("src", "dst"), num_blocks=4)
    row = plain.limit(1).collect()[0]
    assert row["lab_u"] == b"" and row["lab_v"] == b""
    assert unpack_bv(plain).count() == len(pdf)


@given(
    st.lists(st.integers(min_value=0, max_value=2**55 - 2), min_size=1, max_size=300)
)
@settings(max_examples=60, deadline=None)
def test_zeta_roundtrip_property(vals):
    v = np.array(vals, dtype=np.int64)
    for k in (2, 3, 4):
        u, f = zeta_encode(v, k=k)
        assert np.array_equal(zeta_decode(u, f, len(v), k=k), v), k


def test_zeta_bits_matches_bvcomp_scalar():
    """Vectorized interleaved-ζ cost == the bvcomp scalar model summed
    (the figure BVGraph's default ZETA_3 residuals would occupy)."""
    from webgraph_spark.operators.bvcomp import zeta_bits as zb_scalar

    rng = np.random.RandomState(5)
    v = np.concatenate(
        [np.arange(40), (rng.pareto(0.5, 500) * 100).astype(np.int64)]
    )
    for k in (2, 3, 5):
        assert zeta_bits_vec(v, k=k) == sum(zb_scalar(int(x), k) for x in v)


def test_pack_bv_zeta3(spark):
    """pack_bv(code='zeta3'): roundtrip holds and ζ₃ beats γ on the
    heavy-tailed gap fixture (the reason ZETA_3 is the reference's
    default residual code)."""
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "src": rng.randint(0, 50, 8000),
            "dst": (rng.pareto(0.5, 8000) * 50).astype(np.int64) % (2**30),
        }
    )
    edges = spark.createDataFrame(pdf)
    blocks = pack_bv(edges, num_blocks=4, code="zeta3")
    back = unpack_bv(blocks).toPandas().sort_values(["src", "dst"])
    want = (
        edges.select("src", "dst").distinct().toPandas().sort_values(["src", "dst"])
    )
    assert list(map(tuple, back.to_numpy())) == list(map(tuple, want.to_numpy()))
    z = bv_bits_per_link(blocks).collect()[0]
    g = bv_bits_per_link(pack_bv(edges, num_blocks=4, code="gamma")).collect()[0]
    assert z["gamma_bits"] < g["gamma_bits"], (z["gamma_bits"], g["gamma_bits"])


@given(
    st.lists(
        st.tuples(st.integers(0, 700), st.integers(0, 2**30)),
        min_size=1, max_size=300,
    )
)
@settings(max_examples=60, deadline=None)
def test_golomb_roundtrip_property(qr):
    """Quotient/remainder pairs keep the unary stream bounded — Golomb
    is only sane when b matches the value scale (the encoder fails
    fast otherwise, exercised in test_golomb_guard)."""
    from webgraph_spark.operators.bitstream import golomb_decode, golomb_encode

    for b in (1, 2, 3, 5, 8, 100):
        v = np.array([q * b + (r % b) for q, r in qr], dtype=np.int64)
        u, f = golomb_encode(v, b=b)
        assert np.array_equal(golomb_decode(u, f, len(v), b=b), v), b


def test_golomb_guard():
    from webgraph_spark.operators.bitstream import golomb_encode

    with pytest.raises(ValueError, match="far below the value scale"):
        golomb_encode(np.array([2**45], dtype=np.int64), b=2)


@given(
    st.lists(st.integers(min_value=0, max_value=2**55 - 2), min_size=1, max_size=300)
)
@settings(max_examples=60, deadline=None)
def test_nibble_roundtrip_property(vals):
    from webgraph_spark.operators.bitstream import nibble_decode, nibble_encode

    v = np.array(vals, dtype=np.int64)
    u, f = nibble_encode(v)
    assert np.array_equal(nibble_decode(u, f, len(v)), v)


def test_golomb_nibble_bits_match_interleaved_scalar():
    """Closed-form vector costs == per-value scalar bit counts derived
    from the dsiutils code definitions (the bvdisk BitWriter, which the
    golden-vector tests pin to the published grammar)."""
    from webgraph_spark.operators.bitstream import (
        golomb_bits_vec,
        nibble_bits_vec,
    )
    from webgraph_spark.sources.bvdisk import BitWriter

    rng = np.random.RandomState(9)
    v = np.concatenate(
        [np.arange(50), (rng.pareto(0.7, 400) * 40).astype(np.int64)]
    )
    for b in (2, 3, 4, 7):
        w = BitWriter()
        for x in v:
            w.write_golomb(int(x), b)
        assert golomb_bits_vec(v, b=b) == w.written, b
    w = BitWriter()
    for x in v:
        w.write_nibble(int(x))
    assert nibble_bits_vec(v) == w.written


def test_pack_bv_golomb_nibble(spark):
    """pack_bv with the remaining reference codes (RESIDUALS_GOLOMB /
    RESIDUALS_NIBBLE, BVGraph.java:791-816): exact roundtrip + measured
    stream bits equal to the closed-form models."""
    from webgraph_spark.operators.bitstream import (
        golomb_bits_vec,
        nibble_bits_vec,
    )

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "src": rng.randint(0, 60, 5000),
            "dst": rng.randint(0, 4000, 5000).astype(np.int64),
        }
    )
    edges = spark.createDataFrame(pdf)
    want = (
        edges.select("src", "dst").distinct().toPandas().sort_values(["src", "dst"])
    )
    for code in ("golomb3", "golomb8", "nibble"):
        blocks = pack_bv(edges, num_blocks=4, code=code)
        back = unpack_bv(blocks).toPandas().sort_values(["src", "dst"])
        assert list(map(tuple, back.to_numpy())) == list(
            map(tuple, want.to_numpy())
        ), code
