"""Trained lang-ID: learns a separable fixture; features match python."""

import hashlib
import re

import numpy as np

from webgraph_spark.functions.langid import (
    LANGS,
    langid_features,
    train_and_classify,
)

ALPHABETS = {
    "de": "fghij",
    "en": "abcde",
    "es": "klmno",
    "fr": "pqrst",
    "zh": "uvwxy",
}


def _mkdocs(n_per_lang=30, words=30, wlen=5, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    did = 0
    for lang in LANGS:
        alpha = ALPHABETS[lang]
        for _ in range(n_per_lang):
            ws = [
                "".join(alpha[i] for i in rng.randint(0, len(alpha), wlen))
                for _ in range(words)
            ]
            rows.append((did, " ".join(ws), lang))
            did += 1
    return rows


def test_langid_learns_separable_fixture(spark):
    rows = _mkdocs()
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    scored = train_and_classify(docs).collect()
    acc = sum(r["pred"] == r["lang_true"] for r in scored) / len(scored)
    assert acc >= 0.95, f"train accuracy {acc} below gate"
    # probabilities are probabilities
    assert all(0.0 <= r["p"] <= 1.0 for r in scored)


def test_langid_features_match_python(spark):
    rows = _mkdocs(n_per_lang=3)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    got = {r["doc_id"]: r for r in langid_features(docs).collect()}
    for did, text, lang in rows:
        t = text.strip().lower()
        grams = (
            [t[i : i + 3] for i in range(len(t) - 2)]
            if len(t) >= 3
            else [t]
        )
        bs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 32
            for g in grams
        ]
        tot = len(bs)
        r = got[did]
        assert r["x0"] == 1.0 and r["lang"] == lang
        for k in range(32):
            assert r[f"x{k + 1}"] == round(bs.count(k) / tot, 6), (did, k)
