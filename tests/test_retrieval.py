"""BM25 and bigram-LM scoring vs independent Python models."""

import math
import re

import pytest

from webgraph_spark.functions.retrieval import bigram_lm_scores, bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark graph processing at scale with data frames"),
    (2, "model training data pipelines need dedup and quality"),
    (3, "graph model of the data; spark, spark, spark!"),
    (4, "tiny"),
    (5, ""),
    (6, "Data DATA data learning LEARNING"),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    toks = {d: _tok(t) for d, t in docs}
    dls = {d: len(ts) for d, ts in toks.items() if ts}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dls[d] / avgdl)
                )
    return scores


def test_bm25_vs_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_topk(df, ["data", "spark", "graph"], k=10).collect()
    want = _bm25_py(DOCS, ["data", "spark", "graph"])
    got = {r["doc_id"]: r["score"] for r in out}
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d] - s) < 1e-5
    # descending by score, doc_id tiebreak
    rows = [(r["score"], r["doc_id"]) for r in out]
    assert rows == sorted(rows, key=lambda t: (-t[0], t[1]))


def test_bm25_topk_cut(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_topk(df, ["data"], k=2).collect()
    assert len(out) == 2
    want = _bm25_py(DOCS, ["data"])
    best = sorted(want.items(), key=lambda t: (-round(t[1], 6), t[0]))[:2]
    assert [r["doc_id"] for r in out] == [d for d, _ in best]


def _bigram_py(docs):
    toks = {d: _tok(t) for d, t in docs}
    c2, c1 = {}, {}
    vocab = set()
    for ts in toks.values():
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
            vocab.add(w)
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(vocab)
    out = {}
    for d, ts in toks.items():
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            out[d] = (0, None)
            continue
        nll = [
            -math.log2((c2[(a, b)] + 1) / (c1[a] + v)) for a, b in bgs
        ]
        out[d] = (len(bgs), sum(nll) / len(nll))
    return out


def test_bigram_lm_vs_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_scores(df).collect()
    }
    want = _bigram_py(DOCS)
    assert set(out) == set(want)
    for d, (nb, sc) in want.items():
        assert out[d][0] == nb
        if sc is None:
            assert out[d][1] is None
        else:
            assert abs(out[d][1] - sc) < 1e-5


def test_bigram_lm_short_docs_null(spark):
    df = spark.createDataFrame(
        [(0, "one"), (1, ""), (2, "two words")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert out[0]["n_bigrams"] == 0 and out[0]["lm_score"] is None
    assert out[1]["n_bigrams"] == 0 and out[1]["lm_score"] is None
    assert out[2]["n_bigrams"] == 1 and out[2]["lm_score"] is not None


# ---------------------------------------------- TF-IDF pair similarity

def test_tfidf_pairs_vs_numpy(spark):
    import numpy as np
    from webgraph_spark.functions.retrieval import tfidf_pair_similarity

    texts = [
        "apple banana apple cherry",
        "apple banana cherry",
        "dog cat mouse",
        "dog cat mouse dog",
        "apple dog zebra",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_pair_similarity(df, min_sim=0.0).collect()
    }
    # numpy oracle
    vocab = sorted({w for t in texts for w in t.split()})
    n = len(texts)
    tf = np.zeros((n, len(vocab)))
    for i, t in enumerate(texts):
        for w in t.split():
            tf[i, vocab.index(w)] += 1
    dfreq = (tf > 0).sum(axis=0)
    keep = dfreq < n
    W = tf[:, keep] * np.log(n / dfreq[keep])
    nrm = np.sqrt((W * W).sum(axis=1))
    for i in range(n):
        for j in range(i + 1, n):
            c = float(W[i] @ W[j] / (nrm[i] * nrm[j]))
            if (i, j) in got:
                assert abs(got[(i, j)] - round(c, 6)) < 1e-9
            else:
                assert c < 1e-12  # absent pairs share no weighted term


def test_tfidf_max_df_drops_common_terms(spark):
    from webgraph_spark.functions.retrieval import tfidf_pair_similarity

    # "shared" appears in 3 of 4 docs; with max_df=2 it is dropped and
    # docs 2,3 (only linked through it) no longer pair
    texts = ["shared alpha", "shared beta", "shared gamma", "delta gamma"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    full = {(r["id_a"], r["id_b"]) for r in
            tfidf_pair_similarity(df, min_sim=0.0).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in
              tfidf_pair_similarity(df, min_sim=0.0, max_df=2).collect()}
    assert (0, 1) in full and (0, 1) not in capped
    assert (2, 3) in capped  # gamma (df=2) survives the cap


# ---------------------------------------------------------------- ngram_topk


def _ngrams_py(docs, n):
    from collections import Counter

    cnt, ndocs = Counter(), Counter()
    for d, t in docs:
        toks = _tok(t)
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        cnt.update(grams)
        ndocs.update(set(grams))
    return cnt, ndocs


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_topk_matches_python(spark, n):
    from webgraph_spark.functions.retrieval import ngram_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = ngram_topk(df, n=n, k=10).collect()
    cnt, ndocs = _ngrams_py(DOCS, n)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.ngram, r.cnt) for r in got] == want
    for r in got:
        assert r.n_docs == ndocs[r.ngram]


def test_ngram_topk_short_docs_drop_out(spark):
    from webgraph_spark.functions.retrieval import ngram_topk

    df = spark.createDataFrame(
        [(0, "one two"), (1, "x"), (2, "")], "doc_id long, text string"
    )
    rows = ngram_topk(df, n=3, k=5).collect()
    assert rows == []


def test_tfidf_dense_and_index_paths_agree(spark):
    """The blocked-GEMM dense path and the inverted-index path are two
    physical plans for the same operator — identical output."""
    from webgraph_spark.functions.retrieval import tfidf_pair_similarity

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma",
        "alpha beta epsilon zeta",
        "zeta eta theta",
        "completely different words here",
        "alpha", "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for min_sim in (0.0, 0.3, 0.9):
        dense = {
            (r.id_a, r.id_b, r.cosine)
            for r in tfidf_pair_similarity(df, min_sim=min_sim).collect()
        }
        index = {
            (r.id_a, r.id_b, r.cosine)
            for r in tfidf_pair_similarity(
                df, min_sim=min_sim, dense_vocab_max=0
            ).collect()
        }
        assert dense == index, f"paths diverge at min_sim={min_sim}"


# ------------------------------------------------------------------- RRF

def test_rrf_fuse_known_ranks(spark):
    from webgraph_spark.functions.retrieval import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank long")
    sem = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank long")
    out = rrf_fuse([lex, sem], k=10, c=60).collect()
    got = {r.doc_id: (r.rrf, r.rank_0, r.rank_1) for r in out}
    assert got[20] == (pytest.approx(1 / 62 + 1 / 61, abs=1e-9), 2, 1)
    assert got[10] == (pytest.approx(1 / 61, abs=1e-9), 1, 0)
    assert got[40] == (pytest.approx(1 / 62, abs=1e-9), 0, 2)
    # doc in both lists outranks any doc in one list at these depths
    order = [r.doc_id for r in out]
    assert order[0] == 20


def test_rrf_fuse_tie_breaks_by_doc_id(spark):
    from webgraph_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (5, 2)], "doc_id long, rank long")
    out = rrf_fuse([a, b], k=2, c=60).collect()
    # symmetric ranks -> equal rrf; ascending doc_id wins
    assert [r.doc_id for r in out] == [3, 5]


def test_hybrid_rrf_contains_lexical_and_semantic_hits(spark):
    import numpy as np
    from webgraph_spark.functions.retrieval import hybrid_rrf_topk

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(7, 8))
    vecs[2] = vecs[0] * 0.9 + 0.01  # vec 2 near the query vec 0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(7)],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_rrf_topk(
        docs, emb, ["spark", "graph"], query_vec_id=0, k=5, pool=5
    ).collect()
    ids = [r.doc_id for r in out]
    assert 3 in ids  # strongest lexical hit ("spark, spark, spark")
    assert 2 in ids  # strongest semantic hit (constructed neighbour)
    top = out[0]
    assert top.rrf >= out[-1].rrf


def test_anisotropy_matches_bruteforce(spark):
    import numpy as np
    from webgraph_spark.functions.similarity import anisotropy

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16))
    vecs[7] = 0.0  # one zero vector must be excluded and counted
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    row = anisotropy(emb).collect()[0]
    keep = [i for i in range(40) if i != 7]
    u = vecs[keep] / np.linalg.norm(vecs[keep], axis=1, keepdims=True)
    sims = u @ u.T
    n = len(keep)
    want = (sims.sum() - n) / (n * (n - 1))
    assert row.n_vectors == n and row.n_zero == 1
    assert row.mean_pairwise_cosine == pytest.approx(want, abs=1e-6)


def test_anisotropy_identical_vectors_is_one(spark):
    from webgraph_spark.functions.similarity import anisotropy

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    row = anisotropy(emb).collect()[0]
    assert row.mean_pairwise_cosine == pytest.approx(1.0, abs=1e-9)
