"""SQ8 scalar quantization and SemDeDup vs independent numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.functions.clustering import semdedup
from webgraph_spark.functions.similarity import (
    sq8_codes,
    sq8_dequantize,
    sq8_recall,
    sq8_stats,
    sq8_topk,
)

DIM = 8


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _rand_vecs(n, seed):
    rng = np.random.RandomState(seed)
    return rng.uniform(-2.0, 3.0, size=(n, DIM))


def _np_sq8(vecs):
    mn = vecs.min(axis=0)
    sc = (vecs.max(axis=0) - mn) / 255.0
    with np.errstate(divide="ignore", invalid="ignore"):
        codes = np.floor((vecs - mn) / np.where(sc > 0, sc, 1.0) + 0.5)
    codes = np.clip(np.where(sc > 0, codes, 0.0), 0, 255)
    return mn, sc, codes.astype(np.int64)


def test_sq8_codes_match_numpy(spark):
    vecs = _rand_vecs(60, seed=11)
    df = _mk_emb(spark, vecs)
    mins, scales = sq8_stats(df, dim=DIM)
    mn, sc, want = _np_sq8(vecs)
    assert np.allclose(mins, mn) and np.allclose(scales, sc)
    import pyspark.sql.functions as F

    got = {
        r.vec_id: r.codes
        for r in df.select(
            "vec_id", sq8_codes(F.col("embedding"), mins, scales).alias("codes")
        ).collect()
    }
    for i in range(len(vecs)):
        assert got[i] == list(want[i]), f"row {i}"


def test_sq8_reconstruction_error_bounded(spark):
    vecs = _rand_vecs(40, seed=5)
    df = _mk_emb(spark, vecs)
    mins, scales = sq8_stats(df, dim=DIM)
    import pyspark.sql.functions as F

    deq = {
        r.vec_id: np.array(r.v)
        for r in df.select(
            "vec_id",
            sq8_dequantize(
                sq8_codes(F.col("embedding"), mins, scales), mins, scales
            ).alias("v"),
        ).collect()
    }
    half = np.array(scales) / 2.0 + 1e-12
    for i, v in enumerate(vecs):
        assert np.all(np.abs(deq[i] - v) <= half), f"row {i}"


def test_sq8_constant_dimension_is_zero_code(spark):
    vecs = _rand_vecs(20, seed=3)
    vecs[:, 2] = 7.5  # degenerate dim: max == min -> scale 0 -> code 0
    df = _mk_emb(spark, vecs)
    mins, scales = sq8_stats(df, dim=DIM)
    assert scales[2] == 0.0
    import pyspark.sql.functions as F

    rows = df.select(
        sq8_dequantize(
            sq8_codes(F.col("embedding"), mins, scales), mins, scales
        )[2].alias("x")
    ).collect()
    assert all(abs(r.x - 7.5) < 1e-12 for r in rows)


def test_sq8_recall_perfect_on_separated_clusters(spark):
    # two tight, well-separated direction clusters: 8-bit noise cannot
    # flip any exact top-k membership
    rng = np.random.RandomState(42)
    a = np.array([10.0, 0, 0, 0, 0, 0, 0, 0])
    b = np.array([0, 10.0, 0, 0, 0, 0, 0, 0])
    vecs = np.vstack(
        [a + rng.uniform(-0.1, 0.1, DIM) for _ in range(10)]
        + [b + rng.uniform(-0.1, 0.1, DIM) for _ in range(10)]
    )
    df = _mk_emb(spark, vecs)
    import pyspark.sql.functions as F

    q = df.where(F.col("vec_id").isin([0, 10]))
    row = sq8_recall(df, q, k=5, dim=DIM).first()
    assert row.exact_pairs == 10 and row.recall_at_k == 1.0


def test_sq8_topk_ranks_match_float_ranking_numpy(spark):
    vecs = _rand_vecs(50, seed=9)
    df = _mk_emb(spark, vecs)
    got = sq8_topk(df, df.where("vec_id < 3"), k=4, dim=DIM).collect()
    mn, sc, codes = _np_sq8(vecs)
    deq = mn + codes * sc
    nrm = np.linalg.norm(deq, axis=1)
    for qid in range(3):
        sims = np.round(deq @ deq[qid] / (nrm * nrm[qid]), 6)
        order = sorted(
            (i for i in range(len(vecs)) if i != qid),
            key=lambda i: (-sims[i], i),
        )[:4]
        mine = [r.neighbor_id for r in got if r.query_id == qid]
        assert mine == order, f"query {qid}"


# ------------------------------------------------------------- semdedup


def _np_semdedup_kept(vecs, clusters, eps):
    nrm = np.linalg.norm(vecs, axis=1)
    kept = []
    for i in range(len(vecs)):
        pruned = any(
            clusters[j] == clusters[i]
            and j < i
            and round(float(vecs[i] @ vecs[j] / (nrm[i] * nrm[j])), 6) >= eps
            for j in range(len(vecs))
        )
        kept.append(0 if pruned else 1)
    return kept


def test_semdedup_prunes_near_dups_keeps_singletons(spark):
    rng = np.random.RandomState(1)
    base = rng.uniform(-1, 1, (4, DIM)) * 5
    vecs = []
    for c in range(4):
        for _ in range(6):
            vecs.append(base[c] + rng.uniform(-0.05, 0.05, DIM))
    vecs = np.array(vecs)
    df = _mk_emb(spark, vecs)
    out = semdedup(df, k=4, iters=3, eps=0.95, dim=DIM)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == len(vecs)
    clusters = [rows[i].cluster for i in range(len(vecs))]
    want = _np_semdedup_kept(vecs, clusters, eps=0.95)
    got = [rows[i].kept for i in range(len(vecs))]
    assert got == want
    # near-identical members collapse: within one k-means cluster, each
    # direction group (6 consecutive ids share a base vector) keeps
    # exactly one representative
    from collections import Counter

    keepers = Counter(
        (i // 6, clusters[i]) for i in range(len(vecs)) if got[i]
    )
    assert all(v == 1 for v in keepers.values())
    assert sum(got) < len(vecs)  # pruning actually happened


def test_semdedup_high_eps_keeps_everything(spark):
    vecs = _rand_vecs(30, seed=8)
    df = _mk_emb(spark, vecs)
    out = semdedup(df, k=3, iters=2, eps=1.1, dim=DIM)
    assert out.where("kept = 0").count() == 0
    assert out.count() == 30


@pytest.mark.parametrize("eps", [0.3, 0.6])
def test_semdedup_matches_numpy_rule(spark, eps):
    vecs = _rand_vecs(40, seed=21)
    df = _mk_emb(spark, vecs)
    out = semdedup(df, k=3, iters=2, eps=eps, dim=DIM)
    rows = {r.vec_id: r for r in out.collect()}
    clusters = [rows[i].cluster for i in range(len(vecs))]
    want = _np_semdedup_kept(vecs, clusters, eps=eps)
    assert [rows[i].kept for i in range(len(vecs))] == want


# ------------------------------------------------ product quantization


def test_pq_reconstructs_planted_prototypes(spark):
    """Corpus built from 4 per-subspace prototypes + tiny deterministic
    jitter: with codewords to spare (n_codes=6 > 4 prototypes; md5
    seeding can double up a class at exactly 4) training places
    codewords on every prototype, so reconstruction error is
    jitter-scale and every PQ neighbour is from the query's class.
    (recall@k WITHIN a class is intrinsically tie-broken — all class
    members share a codeword — so class purity, not recall, is the
    correct planted-corpus assertion.)"""
    from webgraph_spark.functions.similarity import (
        pq_reconstruct,
        pq_topk,
        pq_train,
    )
    import pyspark.sql.functions as F

    rng = np.random.RandomState(7)
    protos = rng.uniform(-1.0, 1.0, size=(4, DIM))
    vecs = []
    for i in range(48):
        base = protos[i % 4].copy()
        vecs.append(base + rng.uniform(-0.01, 0.01, size=DIM))
    df = _mk_emb(spark, np.array(vecs))

    books = pq_train(df, m=2, n_codes=6, iters=4, dim=DIM)
    assert len(books) == 2 and all(len(b) == 6 for b in books)
    assert all(len(cw) == DIM // 2 for b in books for cw in b)

    rec = df.select(
        "vec_id", pq_reconstruct(F.col("embedding"), books).alias("rv"),
        "embedding",
    ).collect()
    for r in rec:
        err = np.abs(np.array(r["rv"]) - np.array(r["embedding"])).max()
        assert err < 0.05  # jitter-scale, not prototype-scale

    queries = df.where(F.col("vec_id") < 6)
    top = pq_topk(df, queries, k=3, m=2, n_codes=6, iters=4, dim=DIM)
    for r in top.collect():
        assert r["neighbor_id"] % 4 == r["query_id"] % 4  # class purity


def test_pq_deterministic_across_parallelism(spark):
    from webgraph_spark.functions.similarity import pq_train

    vecs = _rand_vecs(40, seed=13)
    a = pq_train(_mk_emb(spark, vecs).repartition(1), m=2, n_codes=3,
                 iters=2, dim=DIM)
    b = pq_train(_mk_emb(spark, vecs).repartition(8), m=2, n_codes=3,
                 iters=2, dim=DIM)
    assert a == b


def test_truncated_recall_high_when_prefix_carries_energy(spark):
    """MRL-style vectors (prefix dims dominate) keep truncated recall
    near 1; uniform-energy vectors lose it — the gate discriminates."""
    import numpy as np

    from webgraph_spark.functions.similarity import truncated_recall

    rng = np.random.RandomState(11)
    n, dim, keep = 120, 64, 16

    def mk(scale_tail):
        vecs = rng.randn(n, dim)
        vecs[:, keep:] *= scale_tail
        return spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    mrl = mk(0.05)  # 0.25% of tail variance -> prefix carries ranking
    q = mrl.where("vec_id < 8")
    r = truncated_recall(mrl, q, k=5, dim_keep=keep).first()
    assert r["recall_at_k"] >= 0.9, r

    flat = mk(1.0)
    q2 = flat.where("vec_id < 8")
    r2 = truncated_recall(flat, q2, k=5, dim_keep=keep).first()
    assert r2["recall_at_k"] < r["recall_at_k"]
