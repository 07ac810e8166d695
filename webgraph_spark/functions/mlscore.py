"""Distributed model scoring for corpus curation: full-batch logistic
regression trained inside the engine.

Beyond-reference operator (SURVEY.md §2.12): the quality-classifier
stage of a training-data pipeline (fastText/C4-style binary filters)
reduced to engine-native arithmetic. The model is deliberately tiny
(a handful of scalar weights) while the DATA side is arbitrarily large:

- feature extraction is one JVM-expression projection over the corpus
  (no UDFs, fully codegen'd), cached once;
- each gradient-descent step is ONE map-side-combinable aggregation
  producing 4 scalars (sum of (sigmoid(w.x) - y) * x_j); driver state is
  the weight vector only, so 10^10 documents cost T scans with no
  shuffle at all — the classic "broadcast model, aggregate gradient"
  data-parallel layout (parameter-server-free);
- scoring is another pure projection with the final weights baked in as
  literals.

Cross-engine determinism: features are ROUNDed to 6 decimals before any
training arithmetic (so both engines iterate from identical float64
inputs), GD is a contraction for lr < 2/L (sum-order noise stays at
~1e-14), and emitted probabilities/weights are rounded. The SQL twin
(:func:`logreg_sql`) unrolls the same recurrence as chained CTEs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .text import punct_ratio, stopword_ratio, whitespace_token_count

N_FEATURES = 4  # bias, punct_ratio, stopword_ratio, log1p(n_tokens)


def logreg_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label: Column | None = None,
) -> DataFrame:
    """(doc_id, x1, x2, x3, y) feature table; label defaults to
    lang = 'en'. Features are rounded to 6 decimals (see module
    docstring)."""
    t = F.col(text_col)
    if label is None:
        label = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(punct_ratio(t), 6).alias("x1"),
        F.round(stopword_ratio(t), 6).alias("x2"),
        F.round(F.log1p(whitespace_token_count(t)), 6).alias("x3"),
        label.cast("double").alias("y"),
    )


def _margin(w: list[float]) -> Column:
    return (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )


def logreg_train(
    feats: DataFrame, lr: float = 1.0, iters: int = 8
) -> list[float]:
    """Full-batch gradient descent from w = 0; returns the weight vector
    [b, w1, w2, w3]. One 4-scalar aggregation job per iteration."""
    w = [0.0] * N_FEATURES
    cached = feats.select("x1", "x2", "x3", "y").persist()
    try:
        for _ in range(iters):
            s = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
            err = s - F.col("y")
            row = cached.agg(
                F.avg(err).alias("g0"),
                F.avg(err * F.col("x1")).alias("g1"),
                F.avg(err * F.col("x2")).alias("g2"),
                F.avg(err * F.col("x3")).alias("g3"),
            ).collect()[0]
            w = [w[j] - lr * float(row[j]) for j in range(N_FEATURES)]
    finally:
        cached.unpersist()
    return w


def logreg_score(
    feats: DataFrame, w: list[float], round_to: int = 6
) -> DataFrame:
    """(doc_id, y, p) — per-document probability under the trained
    model, a pure JVM projection."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
    return feats.select(
        "doc_id",
        F.col("y").cast("long").alias("y"),
        F.round(p, round_to).alias("p"),
    )


def train_and_score(
    docs: DataFrame, lr: float = 1.0, iters: int = 8, round_to: int = 6
) -> DataFrame:
    feats = logreg_features(docs)
    w = logreg_train(feats, lr=lr, iters=iters)
    return logreg_score(feats, w, round_to=round_to)


def logreg_accuracy(scored: DataFrame) -> float:
    """Training accuracy at the 0.5 threshold (model-sanity gate)."""
    row = scored.agg(
        F.avg(
            F.when(
                (F.col("p") >= 0.5) == (F.col("y") == 1), 1.0
            ).otherwise(0.0)
        ).alias("acc")
    ).collect()[0]
    return float(row["acc"])


def logreg_sql(
    table: str = "documents",
    stopwords_sql: str | None = None,
    lr: float = 1.0,
    iters: int = 8,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`train_and_score`: identical rounded
    features, the same GD recurrence unrolled as CTE chain."""
    if stopwords_sql is None:
        from .text import STOPWORDS_EN

        stopwords_sql = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"
    toks = "string_split_regex(trim(text), '\\s+')"
    low_toks = "string_split_regex(trim(lower(text)), '\\s+')"
    n_tok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({toks}) END"
    punct = (
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"
        " / length(text) END"
    )
    sw_ratio = (
        f"CASE WHEN len({low_toks}) = 0 THEN 0.0 ELSE "
        f"len(list_filter({low_toks}, x -> list_contains({stopwords_sql}, x)))"
        f" / len({low_toks}) END"
    )
    parts = [
        f"""feats AS MATERIALIZED (
  SELECT doc_id,
    ROUND({punct}, 6) AS x1,
    ROUND({sw_ratio}, 6) AS x2,
    ROUND(ln(1 + ({n_tok})), 6) AS x3,
    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM {table})""",
        "w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)",
    ]
    for k in range(1, iters + 1):
        prev = f"w{k - 1}"
        parts.append(f"""
g{k} AS (
  SELECT AVG(s - y) AS g0, AVG((s - y) * x1) AS g1,
         AVG((s - y) * x2) AS g2, AVG((s - y) * x3) AS g3
  FROM (SELECT 1.0 / (1.0 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2
                                  + w.w3 * f.x3))) AS s,
               f.y, f.x1, f.x2, f.x3
        FROM feats f CROSS JOIN {prev} w) t)""")
        parts.append(f"""
w{k} AS (SELECT w.b - {lr} * g.g0 AS b, w.w1 - {lr} * g.g1 AS w1,
               w.w2 - {lr} * g.g2 AS w2, w.w3 - {lr} * g.g3 AS w3
         FROM {prev} w CROSS JOIN g{k} g)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT f.doc_id, CAST(f.y AS BIGINT) AS y,
       ROUND(1.0 / (1.0 + exp(-(w.b + w.w1 * f.x1 + w.w2 * f.x2
                                + w.w3 * f.x3))), {round_to}) AS p
FROM feats f CROSS JOIN w{iters} w"""
    )


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
