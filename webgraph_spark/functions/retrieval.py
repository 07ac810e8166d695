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
    dense_vocab_max: int = 4096,
    n_blocks: int = 8,
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

    # Two physical plans for the same exact semantics, picked by vocab
    # shape. DENSE corpora (small vocabulary, high df everywhere — no
    # rare join keys to exploit) make the inverted-index self-join fan
    # out Σ_t C(df_t, 2) rows, which approaches |docs|²·|vocab| when
    # every term is common; there the blocked GEMM below does the same
    # dot products inside numpy with only an O(|docs|·n_blocks)
    # replication shuffle. SPARSE corpora (real text: huge vocabulary,
    # low df per term) keep the index join cheap and can't densify, so
    # they take the index path.
    vocab_size = keep.count()
    if vocab_size <= dense_vocab_max:
        pre = _tfidf_dense_pairs(
            w, nrm, vocab_size, min_sim, round_to, n_blocks
        )
        return pre.select(
            "id_a", "id_b", F.round("raw", round_to).alias("cosine")
        ).where(F.col("cosine") >= min_sim)

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


def _tfidf_dense_pairs(
    w: DataFrame,
    nrm: DataFrame,
    vocab_size: int,
    min_sim: float,
    round_to: int,
    n_blocks: int,
) -> DataFrame:
    """Blocked all-pairs cosine over dense per-doc TF-IDF vectors.

    Each doc's (term-id, normalized-weight) list is replicated to every
    block pair it participates in (n_blocks copies); one
    ``applyInPandas`` per (ba, bb) group runs the block GEMM and emits
    only pairs whose RAW cosine clears ``min_sim`` minus a guard, so
    the caller can apply the exact ROUND-then-threshold the index path
    and the SQL oracle use. An unordered doc pair materializes in
    exactly one group: same-block pairs only in (i, i), cross-block
    pairs only in (min, max). Returns (id_a, id_b, raw) with
    id_a < id_b.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    spark = w.sparkSession
    tid = w.select("term").distinct().withColumn(
        "tid",
        F.row_number().over(Window.orderBy("term")) - 1,
    )
    wn = (
        w.join(nrm, "doc_id")
        .join(F.broadcast(tid), "term")
        .select("doc_id", "tid", (F.col("w") / F.col("nrm")).alias("wn"))
    )
    docs_v = wn.groupBy("doc_id").agg(
        F.collect_list(F.struct("tid", "wn")).alias("s")
    ).withColumn("blk", F.pmod(F.xxhash64("doc_id"), F.lit(n_blocks)).cast("int"))
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ba int, bb int",
    )
    rep = docs_v.join(
        F.broadcast(bp),
        (F.col("blk") == F.col("ba")) | (F.col("blk") == F.col("bb")),
    )
    guard = min_sim - 10.0 ** (-round_to)
    V = vocab_size

    def _densify(sub: pd.DataFrame):
        ids = sub["doc_id"].to_numpy(dtype=np.int64)
        mat = np.zeros((len(ids), V), dtype=np.float64)
        for r, items in enumerate(sub["s"]):
            for it in items:
                mat[r, it["tid"]] = it["wn"]
        return ids, mat

    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "raw": pd.Series(dtype="float64"),
        }
    )

    def _gemm(key, pdf):
        ba, bb = key
        if ba == bb:
            ids, mat = _densify(pdf)
            if len(ids) < 2:
                return empty
            s = mat @ mat.T
            # s > 0 keeps parity with the index path / SQL oracle: a
            # pair sharing NO term never materializes there (weights
            # are strictly positive, so shared term <=> dot > 0)
            ia, ib = np.nonzero(np.triu((s >= guard) & (s > 0), k=1))
        else:
            left = pdf[pdf["blk"] == ba]
            right = pdf[pdf["blk"] == bb]
            if left.empty or right.empty:
                return empty
            ids_l, mat_l = _densify(left)
            ids_r, mat_r = _densify(right)
            s = mat_l @ mat_r.T
            ia, ib = np.nonzero((s >= guard) & (s > 0))
            ids, mat = None, None
        if len(ia) == 0:
            return empty
        if ba == bb:
            ua, ub = ids[ia], ids[ib]
        else:
            ua, ub = ids_l[ia], ids_r[ib]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ua, ub),
                "id_b": np.maximum(ua, ub),
                "raw": s[ia, ib],
            }
        )

    return rep.groupBy("ba", "bb").applyInPandas(
        _gemm, schema="id_a long, id_b long, raw double"
    )


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


def ngram_topk(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most frequent word ``n``-grams across the corpus —
    the corpus-statistics staple for training-data audits (template
    detection, boilerplate discovery, contamination fingerprints).

    Deterministic total order: count DESC, then the n-gram string ASC.
    Returns (ngram, cnt, n_docs). One explode + one groupBy shuffle;
    the top-k is a global sort of the (bounded) distinct-gram table —
    scale-safe (gram cardinality ≪ corpus size, and Spark's
    ``orderBy().limit(k)`` does a map-side partial top-k).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    terms = ", ".join(f"_t[i-{n - 1 - j}]" for j in range(n))
    grams = F.when(
        F.size("_t") >= n,
        F.expr(f"transform(sequence({n - 1}, size(_t) - 1),"
               f" i -> concat_ws(' ', {terms}))"),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_array(F.col(text_col)).alias("_t")
    )
    return (
        base.select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def ngram_topk_sql(
    n: int = 3,
    k: int = 20,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`ngram_topk` (1-indexed lists)."""
    terms = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS doc_id, {tokens_array_sql(text_col)} AS t FROM {table}
),
g AS MATERIALIZED (
  SELECT doc_id, unnest(CASE WHEN len(t) >= {n}
    THEN list_transform(range(1, len(t) - {n - 2}), i -> {terms})
    ELSE [] END) AS ngram
  FROM base
)
SELECT ngram, COUNT(*)::BIGINT AS cnt,
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs
FROM g GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT {k}"""


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    round_to: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke SIGIR'09) of any number
    of ranked candidate lists: rrf(d) = sum_lists 1 / (c + rank_d);
    a document missing from a list contributes 0 from it.

    Each input frame must carry (id_col, rank) with rank 1-based and
    deterministic (the house contract: every ranker here breaks score
    ties by ascending id). The fused score is a sum of CONSTANT-order
    terms — list i's term is coalesced at position i in one fixed
    expression — so it is bit-stable across engines and parallelism.
    Output: (doc_id, rrf, rank_0, rank_1, ...) with missing ranks as 0,
    top-k by (rrf desc, doc_id asc).

    Scale posture: each list is already top-pool sized (driver-bounded),
    so the fusion is a broadcast-sized multi-way outer join — the
    expensive part of hybrid retrieval stays in the rankers, which are
    each one scan + one bounded top-k.
    """
    assert ranked_lists, "need at least one ranked list"
    fused = None
    for i, lst in enumerate(ranked_lists):
        part = lst.select(
            F.col(id_col), F.col("rank").cast("long").alias(f"rank_{i}")
        )
        fused = part if fused is None else fused.join(part, id_col, "full_outer")
    rrf = None
    for i in range(len(ranked_lists)):
        term = F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"rank_{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        rrf = term if rrf is None else rrf + term
    out = fused.select(
        id_col,
        F.round(rrf, round_to).alias("rrf"),
        *[
            F.coalesce(F.col(f"rank_{i}"), F.lit(0)).alias(f"rank_{i}")
            for i in range(len(ranked_lists))
        ],
    )
    return out.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    c: int = 60,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 over ``docs.text`` and
    exact cosine over ``embeddings`` (vec_id is the doc_id — the
    document-embedding pairing of the test tables), each truncated to
    its top-``pool``, fused with reciprocal-rank fusion — the standard
    hybrid-search recipe for RAG / training-data retrieval stacks.

    The semantic query is the corpus vector ``query_vec_id`` (excluded
    from its own neighbour list by the cosine ranker; it may still
    surface through the lexical list, which is honest hybrid
    behaviour). Returns (doc_id, rrf, rank_0=lexical, rank_1=semantic).
    """
    from .similarity import cosine_topk

    from pyspark.sql import Window

    lex_scores = bm25_topk(docs, query_terms, k=pool)
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex = lex_scores.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("rank")
    )
    q = embeddings.where(F.col("vec_id") == query_vec_id)
    sem = cosine_topk(embeddings, q, k=pool).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, sem], k=k, c=c)


def hybrid_rrf_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    c: int = 60,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk` over the test tables."""
    bm25 = bm25_topk_sql(query_terms, k=pool)
    dot = (
        "list_reduce(list_transform(range(1, len(q.embedding) + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b)"
    )
    qnorm = (
        "sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    enorm = (
        "sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), "
        "(a, b) -> a + b))"
    )
    return f"""
WITH lexpool AS MATERIALIZED ({bm25}),
lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM lexpool
),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = {query_vec_id}),
sem_scored AS (
  SELECT e.vec_id AS doc_id,
         ROUND(({dot}) / (({qnorm}) * ({enorm})), 6) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.vec_id
),
sem AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id ASC) AS rank
    FROM sem_scored) t
  WHERE rank <= {pool}
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         ROUND(
           (CASE WHEN l.rank IS NOT NULL
                 THEN 1.0 / ({c}.0 + CAST(l.rank AS DOUBLE)) ELSE 0.0 END)
         + (CASE WHEN s.rank IS NOT NULL
                 THEN 1.0 / ({c}.0 + CAST(s.rank AS DOUBLE)) ELSE 0.0 END),
           {round_to}) AS rrf,
         CAST(COALESCE(l.rank, 0) AS BIGINT) AS rank_0,
         CAST(COALESCE(s.rank, 0) AS BIGINT) AS rank_1
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, rrf, rank_0, rank_1 FROM fused
ORDER BY rrf DESC, doc_id ASC LIMIT {k}
"""
