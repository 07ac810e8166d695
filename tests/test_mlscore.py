"""In-engine logistic regression vs a numpy full-batch GD oracle."""

from __future__ import annotations

import numpy as np


from webgraph_spark.functions.mlscore import (
    logreg_accuracy,
    logreg_features,
    logreg_score,
    logreg_train,
)


def _numpy_gd(X, y, lr, iters):
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        s = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (s - y)) / len(y)
    return w


def _synthetic(spark, n=200, seed=4):
    rng = np.random.RandomState(seed)
    x1 = np.round(rng.rand(n), 6)
    x2 = np.round(rng.rand(n), 6)
    x3 = np.round(rng.rand(n) * 5, 6)
    y = (x1 + 2 * x2 - 0.2 * x3 > 1.0).astype(float)
    rows = [
        (i, float(x1[i]), float(x2[i]), float(x3[i]), float(y[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, x1 double, x2 double, x3 double, y double"
    )
    X = np.column_stack([np.ones(n), x1, x2, x3])
    return df, X, y


def test_train_matches_numpy(spark):
    df, X, y = _synthetic(spark)
    w = logreg_train(df, lr=1.0, iters=10)
    want = _numpy_gd(X, y, lr=1.0, iters=10)
    np.testing.assert_allclose(w, want, atol=1e-10)


def test_score_matches_numpy_and_learns(spark):
    df, X, y = _synthetic(spark)
    w = logreg_train(df, lr=1.0, iters=25)
    scored = logreg_score(df, w, round_to=9)
    pdf = scored.toPandas().sort_values("doc_id")
    want = 1.0 / (1.0 + np.exp(-(X @ _numpy_gd(X, y, 1.0, 25))))
    np.testing.assert_allclose(pdf["p"].to_numpy(), np.round(want, 9), atol=1e-9)
    assert logreg_accuracy(scored) > 0.75  # separable-ish data: learns


def test_documents_features_numpy_parity(spark):
    """On the real corpus the driver gate checks the DuckDB twin; here
    the same training run must match numpy GD on the extracted features.
    (The synthetic corpus's lang label is uncorrelated with its text, so
    learnability is asserted on the separable fixture above, not here.)"""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = logreg_features(docs)
    pdf = feats.toPandas().sort_values("doc_id")
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"], pdf["x2"], pdf["x3"]]
    )
    y = pdf["y"].to_numpy()
    w = logreg_train(feats, lr=1.0, iters=8)
    want = _numpy_gd(X, y, lr=1.0, iters=8)
    np.testing.assert_allclose(w, want, atol=1e-10)
    # degenerate-free: probabilities spread, not constant
    ps = logreg_score(feats, w).select("p").toPandas()["p"]
    assert ps.nunique() > 10
