"""Trained in-engine language identification: one-vs-rest logistic
regression over hashed character-trigram fractions.

Upgrades the declared heuristic stand-in in functions/text.py to a
REAL trained classifier with the same engine-native discipline as the
binary quality model (functions/mlscore.py):

- features: lowercase char trigrams hashed into ``n_buckets`` via the
  portable md5 hash, normalized to per-document fractions, ROUNDed to
  6 decimals so both engines train from identical float64 inputs —
  one JVM projection + one map-side-combinable aggregation per doc
  (the conditional-sum pivot keeps rows bounded: one output row per
  document regardless of length);
- training: full-batch GD, one (n_buckets+1)-scalar aggregation job
  per class per iteration, driver state = the weight matrix only
  (broadcast-model / aggregate-gradient — no shuffle, 10^10 docs cost
  T*K scans);
- scoring: a pure projection with the weights baked in as literals;
  argmax with a first-in-lang-order tie-break (an explicit CASE chain
  both engines share).

Cross-engine determinism rides the mlscore argument: rounded inputs,
GD as a contraction (sum-order noise stays ~1e-15 and is not
amplified), rounded outputs. The fixture labels in the driver's
synthetic corpus are uncorrelated with the text, so the driver query
gates DETERMINISM; the pytest trains on a separable fixture (distinct
vocab per language) and gates ACCURACY — learning is real when signal
exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import md5_long

N_BUCKETS = 32
LANGS = ["de", "en", "es", "fr", "zh"]


def _trigrams(text: Column) -> Column:
    t = F.lower(F.trim(text))
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: t.substr(i, F.lit(3)),
    )
    return F.when(n >= 3, grams).otherwise(F.array(t))


def langid_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, lang, x0=1.0, x1..x{B}) — bias + rounded trigram-bucket
    fractions. One explode + one conditional-sum pivot per doc."""
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(_trigrams(F.col(text_col))).alias("g"),
    ).select(
        "doc_id", "lang", (md5_long(F.col("g")) % n_buckets).alias("b")
    )
    aggs = [F.count("*").alias("tot")] + [
        F.sum(F.when(F.col("b") == k, 1).otherwise(0)).alias(f"c{k}")
        for k in range(n_buckets)
    ]
    counts = g.groupBy("doc_id", "lang").agg(*aggs)
    return counts.select(
        "doc_id",
        "lang",
        F.lit(1.0).alias("x0"),
        *[
            F.round(F.col(f"c{k}") / F.col("tot"), 6).alias(f"x{k + 1}")
            for k in range(n_buckets)
        ],
    )


def _margin(w: list[float], n_buckets: int) -> Column:
    m = F.lit(w[0]) * F.col("x0")
    for k in range(1, n_buckets + 1):
        m = m + F.lit(w[k]) * F.col(f"x{k}")
    return m


def langid_train(
    feats: DataFrame,
    langs: list[str] | None = None,
    lr: float = 5.0,
    iters: int = 8,
    n_buckets: int = N_BUCKETS,
) -> dict[str, list[float]]:
    """One-vs-rest weight vectors, GD from 0 — (B+1) avg-gradient
    scalars per class per iteration."""
    langs = langs or LANGS
    D = n_buckets + 1
    cached = feats.persist()
    models: dict[str, list[float]] = {}
    try:
        for c in langs:
            y = F.when(F.col("lang") == c, 1.0).otherwise(0.0)
            w = [0.0] * D
            for _ in range(iters):
                s = F.lit(1.0) / (
                    F.lit(1.0) + F.exp(-_margin(w, n_buckets))
                )
                err = s - y
                row = cached.agg(
                    *[
                        F.avg(err * F.col(f"x{k}")).alias(f"g{k}")
                        for k in range(D)
                    ]
                ).collect()[0]
                w = [w[k] - lr * float(row[k]) for k in range(D)]
            models[c] = w
    finally:
        cached.unpersist()
    return models


def langid_score(
    feats: DataFrame,
    models: dict[str, list[float]],
    n_buckets: int = N_BUCKETS,
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, lang_true, pred, p) — argmax over the rounded one-vs-
    rest probabilities, first-in-lang-order tie-break (explicit CASE
    chain; both engines evaluate the identical rule)."""
    langs = sorted(models)
    ps = {
        c: F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-_margin(models[c], n_buckets))),
            round_to,
        )
        for c in langs
    }
    mx = F.greatest(*[ps[c] for c in langs])
    pred = F.when(ps[langs[0]] == mx, F.lit(langs[0]))
    for c in langs[1:]:
        pred = pred.when(ps[c] == mx, F.lit(c))
    return feats.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        pred.alias("pred"),
        mx.alias("p"),
    )


def train_and_classify(
    docs: DataFrame,
    langs: list[str] | None = None,
    lr: float = 5.0,
    iters: int = 8,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    feats = langid_features(docs, n_buckets=n_buckets)
    models = langid_train(
        feats, langs=langs, lr=lr, iters=iters, n_buckets=n_buckets
    )
    return langid_score(feats, models, n_buckets=n_buckets)


def langid_sql(
    table: str = "documents",
    langs: list[str] | None = None,
    lr: float = 5.0,
    iters: int = 8,
    n_buckets: int = N_BUCKETS,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`train_and_classify`: identical rounded
    features, the same per-class GD recurrence unrolled as wide CTE
    chains, the same CASE-chain argmax."""
    langs = sorted(langs or LANGS)
    D = n_buckets + 1
    grams = (
        "CASE WHEN length(lower(trim(text))) >= 3 THEN "
        "list_transform(range(1, length(lower(trim(text))) - 1), "
        "i -> substr(lower(trim(text)), i, 3)) "
        "ELSE [lower(trim(text))] END"
    )
    csum = ",\n    ".join(
        f"SUM(CASE WHEN b = {k} THEN 1 ELSE 0 END) AS c{k}"
        for k in range(n_buckets)
    )
    xs = ",\n    ".join(
        f"ROUND(c{k} / tot, 6) AS x{k + 1}" for k in range(n_buckets)
    )
    parts = [
        f"""lg AS (
  SELECT doc_id, lang,
         (('0x' || substr(md5(g), 1, 15))::BIGINT % {n_buckets}) AS b
  FROM (SELECT doc_id, lang, unnest({grams}) AS g FROM {table}) t),
lcnt AS (SELECT doc_id, lang, COUNT(*) AS tot,
    {csum}
  FROM lg GROUP BY doc_id, lang),
lfeats AS MATERIALIZED (
  SELECT doc_id, lang, 1.0 AS x0,
    {xs}
  FROM lcnt)"""
    ]
    wcols = ", ".join(f"0.0 AS w{k}" for k in range(D))
    margin = " + ".join(f"w.w{k} * f.x{k}" for k in range(D))
    for ci, c in enumerate(langs):
        parts.append(f"w_{ci}_0 AS (SELECT {wcols})")
        for t in range(1, iters + 1):
            prev = f"w_{ci}_{t - 1}"
            gsel = ", ".join(
                f"AVG((s - y) * x{k}) AS g{k}" for k in range(D)
            )
            xsel = ", ".join(f"f.x{k}" for k in range(D))
            parts.append(f"""
g_{ci}_{t} AS (
  SELECT {gsel}
  FROM (SELECT 1.0 / (1.0 + exp(-({margin}))) AS s,
               CASE WHEN f.lang = '{c}' THEN 1.0 ELSE 0.0 END AS y,
               {xsel}
        FROM lfeats f CROSS JOIN {prev} w) t)""")
            wsel = ", ".join(
                f"w.w{k} - {lr} * g.g{k} AS w{k}" for k in range(D)
            )
            parts.append(
                f"w_{ci}_{t} AS (SELECT {wsel} "
                f"FROM {prev} w CROSS JOIN g_{ci}_{t} g)"
            )
    pcols = []
    for ci, c in enumerate(langs):
        m = " + ".join(
            f"m{ci}.w{k} * f.x{k}" for k in range(D)
        )
        pcols.append(
            f"ROUND(1.0 / (1.0 + exp(-({m}))), {round_to}) AS p_{c}"
        )
    mfrom = " CROSS JOIN ".join(
        f"w_{ci}_{iters} m{ci}" for ci in range(len(langs))
    )
    mx = "GREATEST(" + ", ".join(f"p_{c}" for c in langs) + ")"
    case = " ".join(
        f"WHEN p_{c} = mx THEN '{c}'" for c in langs
    )
    return (
        "WITH " + ",".join(parts)
        + f""",
scored AS (
  SELECT f.doc_id, f.lang AS lang_true, {", ".join(pcols)}
  FROM lfeats f CROSS JOIN {mfrom})
SELECT doc_id, lang_true, CASE {case} END AS pred, mx AS p
FROM (SELECT *, {mx} AS mx FROM scored) t"""
    )
