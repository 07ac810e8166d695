"""Training-data operators: dedup / text / similarity / multimodal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from webgraph_spark.functions.dedup import (
    exact_dedup,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash16,
    word_shingles,
)
from webgraph_spark.functions.hashing import md5_long
from webgraph_spark.functions.similarity import cosine_topk, cosine_topk_lsh
from webgraph_spark.functions.text import text_stats, with_language


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_md5_long_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("abc",), ("hello world",)], "s string")
    got = {r.s: r.h for r in df.select("s", md5_long(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        want = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{s}'), 1, 15))::BIGINT"
        ).fetchone()[0]
        assert h == want


def test_exact_dedup(spark):
    d = _docs(spark)
    groups = exact_duplicate_groups(d, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_id"] == 0
    kept = exact_dedup(d, "doc_id", "text")
    assert kept.count() == 4
    assert 3 not in {r.doc_id for r in kept.collect()}


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string")
    out = df.select(word_shingles(F.col("text"), 3).alias("sh")).collect()
    assert out[0]["sh"] == ["a b c", "b c d"]
    assert out[1]["sh"] == ["x y"]  # shorter than n -> whole text


def test_minhash_near_dups_bucket_together(spark):
    d = _docs(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(d, "doc_id", "text").collect()
    }
    assert (0, 3) in pairs  # exact dups always collide
    # doc 2 shares nothing with 0/1/3
    assert not any(2 in p for p in pairs)


def test_jaccard_exact_values(spark):
    d = _docs(spark)
    pairs = spark.createDataFrame([(0, 3), (0, 1)], "id_a long, id_b long")
    j = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard(d, pairs, "doc_id", "text").collect()}
    assert j[(0, 3)] == 1.0
    # doc 0 vs 1: 9 words, 7 trigrams each, differing only in the last
    # word -> shared trigrams = 6, union = 8
    assert abs(j[(0, 1)] - 0.75) < 1e-9


def test_simhash_similarity_ordering(spark):
    d = _docs(spark)
    sh = {r.id: r.simhash for r in simhash16(d, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert sh[0] == sh[3]  # identical text -> identical simhash
    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])  # near-dup closer than distinct


def test_text_stats_basics(spark):
    d = _docs(spark)
    st = {r.doc_id: r for r in text_stats(d, "doc_id", "text").collect()}
    assert st[0].n_tokens == 9
    assert st[4].n_tokens == 2
    assert st[0].fingerprint == st[3].fingerprint
    assert 0.0 <= st[0].quality <= 1.0


def test_language_id(spark):
    rows = [
        (0, "the cat and the dog in the house"),
        (1, "los gatos que viven en la casa adornado"),
        (2, "这是一个中文句子"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lang_pred for r in with_language(df, "text").collect()}
    assert out[0] == "en"
    assert out[2] == "zh"


def _emb(spark, n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_cosine_topk_vs_numpy(spark):
    df, vecs = _emb(spark)
    q = df.where(F.col("vec_id") < 3)
    got = cosine_topk(df, q, k=4).toPandas()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for qid in range(3):
        s = sims[qid].copy()
        s[qid] = -np.inf
        want = list(np.argsort(-s)[:4])
        rows = got[got["query_id"] == qid].sort_values("rank")
        assert list(rows["neighbor_id"]) == want


def test_cosine_lsh_recall(spark):
    df, vecs = _emb(spark, n=60)
    q = df.where(F.col("vec_id") < 5)
    exact = cosine_topk(df, q, k=3).toPandas()
    approx = cosine_topk_lsh(df, q, k=3, n_planes=6, n_tables=6).toPandas()
    # recall@3 >= 0.5 on this tiny set (statistical, deterministic seed)
    hits = 0
    for qid in range(5):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits >= 8  # out of 15


def _planted_emb(spark, n_clusters=25, copies=5, dim=32, noise=0.12, seed=11):
    """Near-duplicate clusters: each base vector is repeated with small
    gaussian noise (pairwise sim ~>= 0.95) — the regime hyperplane LSH
    exists for (near-dup detection). On ISOTROPIC random data recall@k
    is meaningless: the top-k 'neighbours' sit ~2.5 sigma inside the
    bulk cosine distribution, so no sublinear method can find them —
    the acceptance gate below therefore measures planted structure."""
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_clusters, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(copies):
            v = base[c] + noise * rng.standard_normal(dim) / np.sqrt(dim)
            rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(pdf)


def test_ann_recall_gate_planted(spark):
    """Statistical acceptance of the ANN path (HyperBallTest.java:78-80
    posture): recall@4 >= 0.9 against the exact scorer on planted
    near-duplicate data, with default LSH parameters + multiprobe."""
    from webgraph_spark.functions.similarity import ann_recall

    df = _planted_emb(spark)
    q = df.where(F.col("vec_id") % 5 == 0)  # first member of each cluster
    row = ann_recall(df, q, k=4, dim=32, multiprobe=1).collect()[0]
    assert row["exact_pairs"] == 25 * 4
    assert row["recall_at_k"] >= 0.9, row["recall_at_k"]


def test_multiprobe_improves_recall(spark):
    """Hamming-1 multiprobe explodes only the broadcast query side and
    must dominate the plain candidate set (superset by construction)."""
    df = _planted_emb(spark, n_clusters=10, copies=4)
    q = df.where(F.col("vec_id") < 3)
    plain = cosine_topk_lsh(df, q, k=3, dim=32, n_tables=2).toPandas()
    probed = cosine_topk_lsh(df, q, k=3, dim=32, n_tables=2, multiprobe=1).toPandas()
    exact = cosine_topk(df, q, k=3).toPandas()

    def hits(approx):
        h = 0
        for qid in approx["query_id"].unique():
            e = set(exact[exact["query_id"] == qid]["neighbor_id"])
            a = set(approx[approx["query_id"] == qid]["neighbor_id"])
            h += len(e & a)
        return h

    assert hits(probed) >= hits(plain)


def test_multimodal_plumbing(spark):
    from webgraph_spark.functions.multimodal import (
        extract_features,
        frame_sample_plan,
        synthesize_media,
    )

    media = synthesize_media(spark, n=30)
    feats = extract_features(media, dim=16).toPandas()
    assert len(feats) == 30
    assert feats["ok"].all()
    assert all(len(f) == 16 for f in feats["feature"])
    # error path: empty payload -> ok=false, row preserved
    bad = spark.createDataFrame(
        [(999, "image", bytearray(b""), None, None, None, None)],
        "media_id long, kind string, payload binary, width int, height int, sample_rate int, n_frames int",
    )
    bf = extract_features(bad, dim=16).collect()[0]
    assert not bf.ok and "decoder" in bf.err
    frames = frame_sample_plan(media, every_n=10)
    assert frames.count() == 10 * 3  # 10 videos x ceil(30/10) frames


def test_lsh_max_bucket_guard(spark):
    """Hub-bucket cap: identical texts land in one bucket per band; a cap
    below the clone-cluster size drops those pairs, unrelated pairs
    unaffected."""
    from webgraph_spark.functions.dedup import minhash_lsh_candidates

    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(8)]
    rows += [(100, "a genuinely unique document about graphs"),
             (101, "a genuinely unique document about graphs!")]
    df = spark.createDataFrame(rows, "id long, text string")
    uncapped = minhash_lsh_candidates(df, "id", "text")
    capped = minhash_lsh_candidates(df, "id", "text", max_bucket=4)
    un = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in un and (100, 101) in cp
    assert any(a < 8 and b < 8 for a, b in un)
    assert not any(a < 8 and b < 8 for a, b in cp)
    # no silent caps: the dropped-bucket metrics twin reports the hub
    from webgraph_spark.functions.dedup import lsh_dropped_bucket_stats

    st = lsh_dropped_bucket_stats(df, "id", "text", max_bucket=4).collect()[0]
    assert st["dropped_buckets"] > 0 and st["dropped_members"] >= 8
    st_def = lsh_dropped_bucket_stats(df, "id", "text").collect()[0]
    assert st_def["dropped_buckets"] == 0  # default cap far above fixture


def test_embedding_near_dups_planted(spark):
    """Dense-vector dedup: planted near-dup clusters (sim >= ~0.95) are
    recovered with precision 1.0 (every emitted pair exactly verified)
    and high recall; the max_bucket hub cap only ever shrinks output."""
    from webgraph_spark.functions.similarity import embedding_near_dups

    df = _planted_emb(spark, n_clusters=10, copies=4, noise=0.08)
    got = embedding_near_dups(df, threshold=0.9, dim=32).toPandas()
    # precision: all reported pairs really clear the threshold and sit
    # inside one planted cluster (cluster id = vec_id // 4)
    assert (got["sim"] >= 0.9).all()
    assert (got["id_a"] // 4 == got["id_b"] // 4).all()
    # recall: most of the 10 * C(4,2) = 60 intra-cluster pairs found
    assert len(got) >= 0.8 * 60, len(got)
    capped = embedding_near_dups(df, threshold=0.9, dim=32, max_bucket=2).toPandas()
    assert len(capped) <= len(got)


def test_ivf_topk_planted_recall(spark):
    """IVF-Flat (ivf_train + ivf_topk): on planted clusters the coarse
    quantizer's cells align with the planted structure, so nprobe=2 of 6
    cells recovers >= 0.9 of the exact top-3; scanning all cells equals
    the exact scorer row-for-row."""
    from webgraph_spark.functions.similarity import ivf_topk, ivf_train

    df = _planted_emb(spark, n_clusters=12, copies=5, noise=0.08)
    q = df.where(F.col("vec_id") % 15 == 0)
    exact = cosine_topk(df, q, k=3).toPandas()
    cents = ivf_train(df, k=6, iters=2, dim=32)
    assert len(cents) == 6 and all(len(c) == 32 for c in cents)
    approx = ivf_topk(df, q, k=3, nprobe=2, dim=32, centroids=cents).toPandas()
    hits, total = 0, 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits >= 0.9 * total, (hits, total)
    # probing every cell == brute force (same rounding on both sides)
    full = ivf_topk(df, q, k=3, nprobe=6, dim=32, centroids=cents).toPandas()
    es = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    fs = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(es["neighbor_id"]) == list(fs["neighbor_id"])


def test_multimodal_resize(spark):
    from webgraph_spark.functions.multimodal import resize_images, synthesize_media

    media = synthesize_media(spark, n=30)  # 10 images, 64x64, 128-byte payloads
    out = resize_images(media, max_side=32).toPandas()
    assert len(out) == 10 and out["ok"].all()
    # aspect-preserving clamp: 64x64 -> 32x32, scale 0.5, stride-2 payload
    assert (out["width"] == 32).all() and (out["height"] == 32).all()
    assert (out["scale"] == 0.5).all()
    assert all(len(p) == 64 for p in out["payload"])
    # no-op path: already small
    small = resize_images(media, max_side=128).toPandas()
    assert (small["width"] == 64).all() and (small["scale"] == 1.0).all()
    assert all(len(p) == 128 for p in small["payload"])
    # error capture: zero dimensions
    bad = spark.createDataFrame(
        [(7, "image", bytearray(b"xy"), 0, 0, None, None)],
        "media_id long, kind string, payload binary, width int, height int, sample_rate int, n_frames int",
    )
    row = resize_images(bad).collect()[0]
    assert not row.ok and "dimensions" in row.err


def test_ivf_recall_gate_planted(spark):
    """Same statistical-acceptance gate as the LSH path, for IVF-Flat:
    recall@4 >= 0.9 on planted near-duplicate clusters — cluster members
    land in the same k-means cell, so nprobe search must recover them."""
    from webgraph_spark.functions.similarity import ivf_recall

    df = _planted_emb(spark)
    q = df.where(F.col("vec_id") % 5 == 0)
    row = ivf_recall(
        df, q, k=4, n_clusters=8, nprobe=3, iters=2, dim=32
    ).collect()[0]
    assert row["exact_pairs"] == 25 * 4
    assert row["recall_at_k"] >= 0.9, row["recall_at_k"]


def test_near_dup_clusters_transitive(spark):
    from webgraph_spark.functions.dedup import near_dup_clusters

    # a ~ b ~ c by one-word edits (transitive chain: a-c may or may not
    # be an LSH candidate, the CC closure must still place all three in
    # one cluster); d is unrelated; e is a singleton short doc
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, base),
        (11, base.replace("kappa", "lambda")),
        (12, base.replace("alpha", "omega")),
        (20, "totally different words nothing shared with the chain at all"),
        (30, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_dup_clusters(
        docs, "doc_id", "text", num_hashes=32, band_rows=2, shingle=2,
        seed=7, threshold=0.5,
    )
    got = {r.doc_id: (r.canonical_id, r.cluster_size) for r in out.collect()}
    assert set(got) == {10, 11, 12, 20, 30}
    # the whole chain collapses to the min id with size 3
    assert got[10] == (10, 3) and got[11] == (10, 3) and got[12] == (10, 3)
    # non-dups are their own canonical singletons
    assert got[20] == (20, 1) and got[30] == (30, 1)


def test_embedding_dedup_clusters_planted(spark):
    """Planted near-dup clusters collapse to their minimum vec_id via
    the star-CC closure; every vector appears exactly once."""
    from webgraph_spark.functions.similarity import embedding_dedup_clusters

    df = _planted_emb(spark, n_clusters=6, copies=4, noise=0.05)
    out = embedding_dedup_clusters(df, threshold=0.9, dim=32).toPandas()
    assert len(out) == 24 and out["vec_id"].nunique() == 24
    # canonical of every member is within its planted cluster and is
    # the cluster min (vec ids are cluster-contiguous: cluster c = 4c..4c+3)
    assert (out["canonical_id"] // 4 == out["vec_id"] // 4).all()
    by_cluster = out.groupby(out["vec_id"] // 4)["canonical_id"].nunique()
    assert (by_cluster == 1).all()
    # at noise 0.05 the planted clusters are tight: all 4 copies merge
    assert (out["cluster_size"] == 4).all()


def test_stratified_sample_k_deterministic(spark):
    """stratified_sample_k returns exactly min(k, |stratum|) rows per
    stratum, and the SAME rows regardless of input partitioning."""
    from webgraph_spark.functions.sampling import stratified_sample_k

    rows = [(i, "s%d" % (i % 3)) for i in range(200)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "key long, stratum string")
    out1 = stratified_sample_k(df, "stratum", 10, "key")
    got1 = sorted((r.key, r.stratum) for r in out1.collect())
    sizes = {}
    for _, s in got1:
        sizes[s] = sizes.get(s, 0) + 1
    assert sizes == {"s0": 10, "s1": 10, "s2": 10, "rare": 1}
    # repartitioned input draws the identical sample
    out2 = stratified_sample_k(df.repartition(13), "stratum", 10, "key")
    got2 = sorted((r.key, r.stratum) for r in out2.collect())
    assert got1 == got2


def test_stratified_sample_fraction_stable_superset(spark):
    """The fraction sampler is a pure row-key filter: a row's decision
    never changes, so sample(0.1) is a subset of sample(0.3), and the
    realized rate is near the target."""
    from webgraph_spark.functions.sampling import (
        stratified_sample_fraction,
    )

    df = spark.range(5000).selectExpr("id AS key", "'x' AS stratum")
    small = {r.key for r in
             stratified_sample_fraction(df, "stratum", 0.1, "key").collect()}
    big = {r.key for r in
           stratified_sample_fraction(df, "stratum", 0.3, "key").collect()}
    assert small <= big
    assert 0.05 < len(small) / 5000 < 0.15
    assert 0.25 < len(big) / 5000 < 0.36


def test_hash_split_disjoint_stable_under_growth(spark):
    """hash_split: buckets are disjoint and exhaustive for summing
    fractions, and a row's split NEVER changes when the corpus grows
    (the held-out-set guarantee)."""
    from webgraph_spark.functions.sampling import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.range(2000).selectExpr("id AS doc_id")
    got = {r.doc_id: r.split for r in hash_split(df, "doc_id", fr).collect()}
    assert set(got.values()) == {"train", "val", "test"}
    assert 0.7 < sum(v == "train" for v in got.values()) / 2000 < 0.9
    grown = spark.range(6000).selectExpr("id AS doc_id")
    got2 = {r.doc_id: r.split for r in hash_split(grown, "doc_id", fr).collect()}
    assert all(got2[k] == v for k, v in got.items())
    # fractions summing under 1 leave NULL leftovers
    part = hash_split(df, "doc_id", {"train": 0.5})
    n_null = part.where(F.col("split").isNull()).count()
    assert 0.4 < n_null / 2000 < 0.6


def test_pack_greedy_budget_and_order(spark):
    """pack_greedy: no multi-doc batch exceeds the budget, batches are
    contiguous in order, and the assignment matches a pure-python
    first-fit reference; pack_by_token_budget agrees with its own
    exclusive-cumsum definition."""
    from webgraph_spark.functions.packing import (
        pack_by_token_budget,
        pack_greedy,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, "s%d" % (i % 3), int(t))
        for i, t in enumerate(rng.randint(1, 900, size=300))
    ] + [(300, "s0", 5000)]  # oversized doc gets a batch alone
    df = spark.createDataFrame(rows, "doc_id long, shard string, tokens long")
    out = pack_greedy(df, "tokens", 2048, "shard", "doc_id").collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        # python first-fit reference
        bid, used = 0, 0
        for r in rs:
            if used > 0 and used + r.tokens > 2048:
                bid, used = bid + 1, 0
            used += r.tokens
            assert r.batch_id == bid, (shard, r.doc_id)
        # budget property: multi-doc batches never exceed the budget
        sums, counts = {}, {}
        for r in rs:
            sums[r.batch_id] = sums.get(r.batch_id, 0) + r.tokens
            counts[r.batch_id] = counts.get(r.batch_id, 0) + 1
        for b, s in sums.items():
            assert s <= 2048 or counts[b] == 1

    chunk = pack_by_token_budget(df, "tokens", 2048, "shard", "doc_id").collect()
    for shard in {"s0", "s1", "s2"}:
        rs = sorted((r for r in chunk if r.shard == shard), key=lambda r: r.doc_id)
        excl = 0
        for r in rs:
            assert r.batch_id == excl // 2048
            excl += r.tokens


def test_contamination_check_containment(spark):
    """An eval doc fully embedded in a training doc reaches containment
    1.0 even though symmetric Jaccard would be tiny; unrelated docs
    don't appear; self-pairs excluded."""
    from webgraph_spark.functions.dedup import contamination_check

    eval_text = "the quick brown fox jumps over dogs"
    train_text = ("lorem ipsum " * 20) + eval_text + (" dolor sit" * 20)
    docs = spark.createDataFrame(
        [
            (1, eval_text),            # the eval doc itself (self-pair)
            (2, train_text),           # contains the whole eval doc
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    ev = docs.where(F.col("doc_id") == 1)
    out = contamination_check(docs, ev, "doc_id", "text", shingle=3).collect()
    by_train = {r.train_id: r for r in out}
    assert 1 not in by_train, "self-pair leaked"
    assert 3 not in by_train
    assert by_train[2].containment == 1.0


def test_token_budget_sample_mixture(spark):
    """token_budget_sample: per-stratum token totals stay within budget
    + one straddling doc; every stratum contributes; the selection is
    identical under repartitioning."""
    from webgraph_spark.functions.sampling import token_budget_sample

    rows = [
        (i, "s%d" % (i % 4), 100 + (i * 37) % 400) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, stratum string, tok long")
    sel = token_budget_sample(df, "stratum", "tok", 2000, "doc_id")
    got = sel.groupBy("stratum").agg(
        F.sum("tok").alias("t"), F.max("tok").alias("mx"), F.count("*").alias("n")
    ).collect()
    assert len(got) == 4
    for r in got:
        assert r.n >= 1
        # exclusive-cumsum rule: total < budget + last doc's tokens
        assert r.t < 2000 + r.mx
    a = sorted(r.doc_id for r in sel.collect())
    b = sorted(
        r.doc_id
        for r in token_budget_sample(
            df.repartition(13), "stratum", "tok", 2000, "doc_id"
        ).collect()
    )
    assert a == b


def test_repetition_stats_planted(spark):
    """A doc that is one bigram repeated flags as repetitive; a
    no-repeat doc does not; a short doc gets zero fractions."""
    from webgraph_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "ab cd ab cd ab cd ab cd"),          # one bigram wall
            (2, "a b c d e f g h i j k l m n o p q r s t"),  # all grams unique
            (3, "x"),                                # shorter than any gram
            (4, "p q r p q r s t u v w z"),          # partial repetition
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    # doc 1: "ab cd" occurs 4 times among 7 bigrams -> 8/8 tokens covered
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["repetitive"] == 1
    # doc 1 trigram "ab cd ab" x3 + "cd ab cd" x3 -> all 6 duplicated
    assert out[1]["dup_trigram_frac"] == 1.0
    assert out[2]["top_bigram_frac"] == pytest.approx(2 / 20)
    assert out[2]["dup_trigram_frac"] == 0.0
    assert out[2]["repetitive"] == 0
    assert out[3]["top_bigram_frac"] == 0.0 and out[3]["dup_trigram_frac"] == 0.0
    # doc 4: "p q r" trigram twice among 10 -> 2/10 duplicated
    assert out[4]["dup_trigram_frac"] == pytest.approx(0.2)


def test_window_dedup_planted(spark):
    """Two docs sharing an 8-token run show duplicated windows; an
    unrelated doc shows none; sub-window docs get zero windows."""
    from webgraph_spark.functions.dedup import window_dedup_stats

    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),
            (2, "head0 " + shared),
            (3, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in window_dedup_stats(df, "doc_id", "text", k=8).collect()
    }
    # doc1 has 3 windows (10 tokens), exactly one (the shared run) duplicated
    assert out[1]["n_windows"] == 3 and out[1]["dup_windows"] == 1
    assert out[2]["n_windows"] == 2 and out[2]["dup_windows"] == 1
    assert out[3]["n_windows"] == 2 and out[3]["dup_windows"] == 0
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0
    assert out[1]["dup_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_pii_scrub_planted(spark):
    """Each PII class is counted and replaced; clean text untouched."""
    from webgraph_spark.functions.pii import pii_stats, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo.org and d@bar.io, ip 192.168.0.1, tel +44 20 7946 0958"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ip"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["n_email"] == 0 and out[2]["n_ip"] == 0 and out[2]["n_phone"] == 0
    scrubbed = df.select("doc_id", scrub_pii(F.col("text")).alias("s")).collect()
    s1 = next(r["s"] for r in scrubbed if r["doc_id"] == 1)
    assert "<EMAIL>" in s1 and "<IP>" in s1 and "<PHONE>" in s1
    assert "foo.org" not in s1 and "192.168" not in s1


def test_containment_asymmetric(spark):
    from webgraph_spark.functions.dedup import ngram_containment

    # doc 10 is a verbatim prefix of doc 11: every trigram of 10 is in
    # 11 -> c_ab = 1.0, while Jaccard would be 4/10 here.
    rows = [
        (10, "a b c d e f"),          # 4 trigrams
        (11, "a b c d e f g h i j k l"),  # 10 trigrams, superset
        (12, "x y z w v u"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(10, 11), (10, 12)], "id_a long, id_b long"
    )
    c = {
        (r.id_a, r.id_b): r
        for r in ngram_containment(d, pairs, "doc_id", "text").collect()
    }
    assert c[(10, 11)].c_ab == 1.0
    assert abs(c[(10, 11)].c_ba - 0.4) < 1e-9
    assert c[(10, 11)].containment == 1.0
    assert (10, 12) not in c  # no shared shingle -> omitted


def test_centroid_classify_separable(spark):
    from webgraph_spark.functions.clustering import centroid_classify

    # two orthogonal label cones -> perfect diagonal confusion
    rows = []
    for i in range(8):
        rows.append((i, [10.0 + (i % 3), 0.1 * i, 0.0, 0.0], 0))
        rows.append((100 + i, [0.0, 0.1 * i, 9.0 + (i % 2), 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r.label, r.assigned): r.n_vectors
        for r in centroid_classify(emb).collect()
    }
    assert out == {(0, 0): 8, (1, 1): 8}


def test_minhash_estimator_calibration(spark):
    """The signature-agreement estimate tracks exact Jaccard: equal
    docs agree on every hash (est exactly 1), and the 0.75-Jaccard
    near-dup pair estimates within the H=16 sampling band."""
    from webgraph_spark.functions.dedup import (
        minhash_signatures,
        ngram_jaccard,
    )

    d = _docs(spark)
    pairs = spark.createDataFrame([(0, 3), (0, 1)], "id_a long, id_b long")
    sigs = minhash_signatures(d, "doc_id", "text", 16, 3, 42)
    est = {}
    rows = sigs.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, {})[r.i] = r.minhash
    for a, b in [(0, 3), (0, 1)]:
        agree = sum(
            1 for i in range(16) if by_id[a][i] == by_id[b][i]
        )
        est[(a, b)] = agree / 16.0
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard(d, pairs, "doc_id", "text").collect()
    }
    assert exact[(0, 3)] == 1.0 and est[(0, 3)] == 1.0
    assert abs(est[(0, 1)] - exact[(0, 1)]) < 0.35  # ~3 sigma at H=16
