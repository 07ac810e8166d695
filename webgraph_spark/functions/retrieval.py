"""Corpus retrieval + statistical LM scoring for training-data pipelines.

Beyond-reference operators (SURVEY.md §2.12): the reference engine has no
text-retrieval surface, but a link-graph corpus user needs exactly these
two for quality filtering and search-style triage:

- :func:`bm25_topk` — Okapi BM25 ranking of a document corpus against a
  bag-of-terms query, built as an inverted-index DataFrame plan: tokenize
  -> explode -> per-(doc,term) tf -> per-term df -> score join. Every
  expression is a built-in JVM function; the tiny query-term table is
  broadcast, document-length stats are one map-side-combinable groupBy,
  and the score aggregation keys on doc_id (uniform shuffle, no hot
  keys). At 100 TB the only large shuffles are the two per-doc groupBys.
- :func:`bigram_lm_scores` — corpus-trained add-one-smoothed bigram
  language model, scoring each document by mean negative log2 bigram
  probability (the KenLM-style "perplexity filter" posture reduced to
  engine-portable arithmetic). Bigram/unigram count tables are plain
  groupBys; the per-document score is one hash join per table on the
  bigram/unigram string key.

Tokenizer: lowercase, split on runs of non-alphanumerics, drop empties —
expressible identically in Spark (`split` + `filter`) and DuckDB
(`string_split_regex` + unnest + WHERE), so every count is bit-equal
across engines; floating-point scores are ROUNDed on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_array(text: Column) -> Column:
    """Lowercased alphanumeric token array (engine-portable)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != "")


def tokens_array_sql(expr: str) -> str:
    """DuckDB twin of :func:`tokens_array`."""
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT}'),"
        " t -> t <> '')"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-k documents by Okapi BM25 against a constant bag of terms.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (the non-negative
    "plus" variant); score(d) = sum_t idf(t) * tf * (k1+1) /
    (tf + k1 * (1 - b + b * dl/avgdl)). Ties at the rounded score break
    by ascending doc_id, so the top-k frontier is deterministic.

    Returns (doc_id, score) with score rounded to ``round_to``.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_array(F.col(text_col))).alias("term"),
    )
    # document lengths over ALL tokens (one uniform groupBy on doc_id)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_avg = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # restrict to query terms early — constant predicate, pushed to scan
    qt = [t.lower() for t in query_terms]
    tf = (
        toks.where(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.crossJoin(F.broadcast(n_avg.select("n_docs"))).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_avg.select("avgdl")))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), round_to).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same recurrence, same rounding)."""
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT {id_col} AS doc_id, unnest({tokens_array_sql(text_col)}) AS term
  FROM {table}
),
dl AS MATERIALIZED (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
n_avg AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term,
         LN(1.0 + ((SELECT n_docs FROM n_avg) - df + 0.5) / (df + 0.5)) AS idf
  FROM df
),
scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(idf.idf * tf.tf * ({k1} + 1.0)
               / (tf.tf + {k1} * (1.0 - {b}
                  + {b} * dl.dl / (SELECT avgdl FROM n_avg)))), {round_to}) AS score
  FROM tf JOIN idf ON tf.term = idf.term JOIN dl ON tf.doc_id = dl.doc_id
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log2 bigram probability under an
    add-one-smoothed corpus bigram LM (trained on the same corpus).

    P(w2 | w1) = (c2(w1 w2) + 1) / (c1(w1) + V), V = |vocabulary|;
    score(d) = avg over d's bigram occurrences of -log2 P. Documents
    with fewer than 2 tokens score NULL (no bigrams). High scores flag
    improbable token sequences — the statistical-LM quality filter.

    Returns (doc_id, n_bigrams, lm_score).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_array(F.col(text_col)).alias("_t")
    )
    bigram = F.when(
        F.size("_t") >= 2,
        F.expr(
            "transform(sequence(1, size(_t) - 1),"
            " i -> concat(_t[i-1], ' ', _t[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = base.select("doc_id", F.explode(bigram).alias("bg"))
    uni = base.select("doc_id", F.explode("_t").alias("w"))
    c2 = bg.groupBy("bg").agg(F.count("*").alias("c2"))
    c1 = uni.groupBy("w").agg(F.count("*").alias("c1"))
    v = uni.agg(F.countDistinct("w").alias("v"))
    scored = (
        bg.join(c2, "bg")
        .withColumn("w1", F.split("bg", " ")[0])
        .join(c1, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            (
                -F.log2((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
            ).alias("nll"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("nll"), round_to).alias("lm_score"),
        )
    )
    # keep short documents in the frame with NULL score
    return (
        base.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "lm_score",
        )
    )


def bigram_lm_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores`."""
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS doc_id, {tokens_array_sql(text_col)} AS t FROM {table}
),
bg AS MATERIALIZED (
  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
    ELSE [] END) AS bg
  FROM base
),
uni AS MATERIALIZED (SELECT doc_id, unnest(t) AS w FROM base),
c2 AS MATERIALIZED (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
c1 AS MATERIALIZED (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
v AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
scored AS (
  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
         ROUND(AVG(-LOG2((c2.c2 + 1.0) / (c1.c1 + (SELECT v FROM v)))), {round_to})
           AS lm_score
  FROM bg JOIN c2 ON bg.bg = c2.bg
  JOIN c1 ON string_split(bg.bg, ' ')[1] = c1.w
  GROUP BY bg.doc_id
)
SELECT b.doc_id,
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.lm_score
FROM base b LEFT JOIN scored s ON b.doc_id = s.doc_id
"""


# ------------------------------------------- TF-IDF pair similarity

def tfidf_pair_similarity(
    docs: DataFrame,
    min_sim: float = 0.8,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """All document pairs with TF-IDF cosine >= ``min_sim`` — sparse
    lexical near-duplicate / similarity search via an inverted-index
    self-join (the exact counterpart of the MinHash-Jaccard pipeline in
    functions/dedup.py, under the cosine rather than Jaccard measure).

    Plan: tokenize -> (doc, term, tf) -> per-term df -> weight
    w = tf * ln(N / df) -> self-join on term -> groupBy-(pair) dot ->
    normalize. Skew control: terms present in EVERY document carry
    idf = 0 and are dropped BEFORE the join (an exact no-op on scores
    that removes precisely the highest-fanout join keys); ``max_df``
    optionally drops further high-df terms (then scores are exact over
    the retained vocabulary — same documented-cap posture as the LSH
    ``max_bucket`` guard). A term with df = d fans out C(d, 2) pairs, so
    the retained-df cap bounds join work at scale.

    The threshold compares the ROUNDed cosine on both engines, so the
    cross-engine frontier is identical up to sum-order noise at the
    6th decimal of an exact boundary value.

    Returns (id_a, id_b, cosine), id_a < id_b.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_array(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = tf.select("doc_id").distinct().count()
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    cap = max_df if max_df is not None else n_docs
    keep = df.where(F.col("df") < F.least(F.lit(cap + 1), F.lit(n_docs)))
    w = (
        tf.join(F.broadcast(keep), "term")
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col("doc_id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "term", F.col("w").alias("wb"))
    dot = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    out = (
        dot.join(nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), round_to).alias("cosine"),
        )
        .where(F.col("cosine") >= min_sim)
    )
    return out


def tfidf_pair_similarity_sql(
    min_sim: float = 0.8,
    max_df: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`tfidf_pair_similarity`."""
    cap_pred = f"AND d.df <= {max_df}" if max_df is not None else ""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT {id_col} AS doc_id, unnest({tokens_array_sql(text_col)}) AS term
  FROM {table}
),
tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
w AS MATERIALIZED (
  SELECT t.doc_id, t.term,
         t.tf * ln((SELECT n FROM nn) * 1.0 / d.df) AS w
  FROM tf t JOIN dfr d USING (term)
  WHERE d.df < (SELECT n FROM nn) {cap_pred}
),
nrm AS MATERIALIZED (
  SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
),
dot AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(dot / (na.nrm * nb.nrm), {round_to}) AS cosine
FROM dot
JOIN nrm na ON na.doc_id = id_a
JOIN nrm nb ON nb.doc_id = id_b
WHERE ROUND(dot / (na.nrm * nb.nrm), {round_to}) >= {min_sim}
"""
