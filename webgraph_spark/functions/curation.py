"""Importance-resampling data curation (DSIR family).

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
score every document by how much more likely its hashed-n-gram bag is
under a TARGET corpus' unigram-over-buckets language model than under
the SOURCE (everything else), then resample by that importance weight.
This is the standard cheap targeted-curation pass for LLM pretraining
mixes — "pick web pages that look like Wikipedia" at 100 TB without a
neural scorer.

Beyond-reference operator (SURVEY.md §2.12 training-pipeline family),
built entirely from primitives the repo already oracle-matches:
word n-gram shingles (functions/dedup.py) and the portable md5 hash
(functions/hashing.py).

Plan shape / 100 TB posture:
- one pass explodes docs to (id, bucket) gram rows (rows = total token
  count, uniform keys);
- the bucket LM is a groupBy over ``n_buckets`` keys (<= 2^16) with
  map-side combine — each task emits at most ``n_buckets`` partials, so
  the shuffle is tiny regardless of corpus size;
- totals ride a broadcast 1-row cross join (no driver action);
- per-bucket log ratios join back to the gram rows via BROADCAST join
  (the LM table is n_buckets rows), then one groupBy(id) with map-side
  combine produces the weights.
Nothing in the plan is proportional to anything but one scan of the
token stream + two small shuffles.

Cross-engine float determinism: each bucket's log ratio is rounded to
9 digits and summed as DECIMAL(38,9) — an order-independent exact sum,
the same discipline as the link-prediction Adamic-Adar oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import word_shingles
from .hashing import md5_long

DEFAULT_BUCKETS = 1024
GUMBEL_M = 1 << 48


def hashed_gram_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    ngram: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, tgt, b): one row per word n-gram occurrence (with
    multiplicity — DSIR counts occurrences, not the distinct set),
    hashed into ``n_buckets`` via the portable md5 hash."""
    return docs.select(
        F.col(id_col).alias("id"),
        target.alias("tgt"),
        F.explode(word_shingles(F.col(text_col), ngram)).alias("g"),
    ).select(
        "id", "tgt", (md5_long(F.col("g")) % F.lit(n_buckets)).alias("b")
    )


def dsir_log_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    ngram: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
    persist_features: bool = False,
) -> DataFrame:
    """(id, n_grams, logw): per-document DSIR importance log-weight.

    logw = sum over the doc's grams of
    ln( (c_tgt(b)+1) * (C_src + B)  /  ((c_src(b)+1) * (C_tgt + B) )
    — the add-one-smoothed log-likelihood ratio of the two bucket LMs,
    summed with gram multiplicity. Positive = looks like the target.

    The gram stream feeds BOTH the LM build and the scoring join, so
    the lazy plan tokenizes the corpus twice. At deployment scale set
    ``persist_features=True`` (or checkpoint upstream): the (id, tgt,
    bucket) rows are three small ints per token — far cheaper to cache
    than to re-run split+explode+md5 over 100 TB of text. The caller
    owns the persisted lifetime (Spark LRU-evicts under pressure).
    """
    feats = hashed_gram_buckets(
        docs, id_col, text_col, target, ngram, n_buckets
    )
    if persist_features:
        feats = feats.persist()
    bc = feats.groupBy("b").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("tgt"), 0).otherwise(1)).alias("cs"),
    )
    tot = bc.agg(
        F.sum("ct").alias("big_ct"), F.sum("cs").alias("big_cs")
    )
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1).cast("double")
                 * (F.col("big_cs") + F.lit(n_buckets)))
                / ((F.col("cs") + 1).cast("double")
                   * (F.col("big_ct") + F.lit(n_buckets)))
            ),
            9,
        )
        .cast("decimal(38,9)")
        .alias("lr"),
    )
    w = feats.join(F.broadcast(lr), "b").groupBy("id").agg(
        F.count("*").alias("n_grams"), F.sum("lr").alias("s")
    )
    return w.select(
        "id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round(F.col("s").cast("double"), 6).alias("logw"),
    )


def dsir_gumbel_topk(
    weights: DataFrame, k: int, salt: str = "dsir"
) -> DataFrame:
    """Gumbel-top-k resampling, derandomized: u = md5(salt||id)/2^48
    gives a deterministic uniform in (0,1), g = -ln(-ln(u)) its Gumbel
    perturbation, and the k largest (logw + g) are the sample — the
    exact DSIR sampling rule with a portable seed, so both engines (and
    any two cluster runs) select the identical k documents."""
    u = (
        (md5_long(F.concat(F.lit(salt + ":"), F.col("id").cast("string")))
         % F.lit(GUMBEL_M)).cast("double") + F.lit(0.5)
    ) / F.lit(float(GUMBEL_M))
    g = -F.log(-F.log(u))
    scored = weights.select(
        "id", "logw", F.round(F.col("logw") + g, 6).alias("key")
    )
    return scored.orderBy(F.desc("key"), F.asc("id")).limit(k)
