"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen); the only Python kernel is the n-gram language-ID
scorer, which is an Arrow-batched pandas UDF.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword ratios), document fingerprinting (content
hash + positional rolling hash), n-gram language ID heuristic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .hashing import md5_long

# Small multilingual stopword sets for the heuristic scorers.
STOPWORDS_EN = (
    "the of and to in a is that it for on with as are was be this by an at"
).split()

# A BPE-ish token regex: runs of word chars, single punctuation marks,
# or runs of spaces collapse — approximates subword pre-tokenization.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-separated tokens (JVM-side)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count via regexp_count (JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_REGEX))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    sw = stopwords or STOPWORDS_EN
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    total = F.size(toks)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits / total)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence (the C4/Gopher-style filter family, reduced to
    engine-portable arithmetic)."""
    n_tok = whitespace_token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    p = punct_ratio(text)
    punct_ok = F.when(p <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when(sw >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + sw_ok) / F.lit(3.0)


def content_fingerprint(text: Column) -> Column:
    """Deterministic 60-bit content hash (engine-portable md5-based)."""
    return md5_long(text)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats frame: tokens, chars, ratios, quality, fingerprint."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        whitespace_token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        content_fingerprint(t).alias("fingerprint"),
    )


# ------------------------------------------------------------ language ID

_LANG_PROFILES = {
    # tiny seeded character-trigram profiles; deterministic fake stand-ins
    # for a real model (fasttext et al. not available in this container)
    "en": ["the", "ing", "and", "ion", "ent"],
    "es": ["que", "ión", "ado", "los", "nte"],
    "fr": ["les", "ent", "ion", "que", "ait"],
    "de": ["der", "ein", "ich", "sch", "und"],
    "zh": [],  # CJK detected by codepoint range
}


from pyspark.sql.types import StringType  # noqa: E402 (DDL string parse
# would require an active SparkSession at import time; the type object
# does not)


@pandas_udf(StringType())
def lang_id_ngram(texts: pd.Series) -> pd.Series:
    """n-gram heuristic language ID (Arrow-batched; vectorized scoring).

    Real pipelines plug a model here; the Spark-side contract (string in,
    label out, Arrow batches) is what the engine tests. A TRAINED
    in-engine alternative (one-vs-rest LR over hashed trigram
    fractions, oracle-checked + accuracy-gated) lives in
    functions/langid.py — prefer it when labeled data exists."""
    low = texts.fillna("").str.lower()
    # CJK first (codepoint range check, vectorized)
    is_cjk = low.str.contains(r"[一-鿿]", regex=True)
    scores = {}
    for lang, grams in _LANG_PROFILES.items():
        if not grams:
            continue
        s = None
        for g in grams:
            c = low.str.count(g)
            s = c if s is None else s + c
        scores[lang] = s
    mat = pd.DataFrame(scores)
    best = mat.idxmax(axis=1).where(mat.max(axis=1) > 0, "und")
    return best.mask(is_cjk, "zh")


def with_language(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    return df.withColumn(out_col, lang_id_ngram(F.col(text_col)))


# ----------------------------------------------------------- repetition

def _ngram_array(toks_col: str, n: int) -> Column:
    """Array of space-joined n-grams of the token array column; empty
    array when the document is shorter than n tokens (guarded because
    Spark's ``sequence(1, x)`` with x < 1 generates a DESCENDING range
    rather than an empty one)."""
    expr = F.expr(
        f"transform(sequence(1, size({toks_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({toks_col}, i, {n})))"
    )
    return F.when(F.size(F.col(toks_col)) >= n, expr).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str,
                     top2_flag: float = 0.18,
                     dup3_flag: float = 0.30) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1 —
    public): per document,

    - ``top_bigram_frac``: fraction of tokens covered by the single most
      frequent bigram (2 * its count / n_tokens);
    - ``dup_trigram_frac``: fraction of trigram occurrences whose trigram
      appears more than once in the document;
    - ``repetitive``: 1 iff either fraction exceeds its flag threshold.

    Entirely JVM-side (split/transform/explode/groupBy with map-side
    combine); per-document aggregation keys on the document id, so the
    shuffle is uniform — no hot keys regardless of corpus skew. At
    cluster scale the explode multiplies rows by ~n_tokens, but each
    document's grams stay in its input partition until the one
    (doc_id, gram) aggregation."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )

    def gram_counts(n: int) -> DataFrame:
        return (
            base.select("doc_id", F.explode(_ngram_array("_toks", n)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )

    bi = gram_counts(2).groupBy("doc_id").agg(F.max("c").alias("_top2"))
    tri = gram_counts(3).groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("_dup3"),
        F.sum("c").alias("_tot3"),
    )
    out = (
        base.select("doc_id", F.col("_n").alias("n_tokens"))
        .join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(F.lit(2) * F.col("_top2") / F.col("n_tokens"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("_dup3") / F.col("_tot3"), F.lit(0.0)), 6
            ).alias("dup_trigram_frac"),
        )
    )
    return out.withColumn(
        "repetitive",
        (
            (F.col("top_bigram_frac") > top2_flag)
            | (F.col("dup_trigram_frac") > dup3_flag)
        ).cast("long"),
    )
