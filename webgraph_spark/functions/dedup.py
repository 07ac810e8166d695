"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
- exact: one hash-groupBy — the cheapest full-corpus dedup;
- MinHash+LSH: shingle -> H universal hashes -> per-doc min -> band
  keys -> bucket join. Candidate generation never compares all pairs;
  the shuffle key is the band bucket. Hub buckets (boilerplate text)
  are the skew risk — cap bucket size upstream if needed;
- SimHash: 16-bit portable variant, bit-majority over token hashes;
- verification: exact n-gram Jaccard on candidate pairs only.

All hashing is the engine-portable md5/universal family
(functions.hashing), so every stage has a bit-exact DuckDB oracle.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import MERSENNE_P, hash_family, md5_long

logger = logging.getLogger(__name__)

DEFAULT_NUM_HASHES = 16
DEFAULT_BAND_ROWS = 4
DEFAULT_SHINGLE = 3
# Hub-bucket guard default: a band bucket of b members emits b(b-1)/2
# candidate pairs, so one 10^5-member boilerplate bucket alone is
# ~5*10^9 rows. 5000 (=> <=12.5M pairs per worst bucket) is the "never
# detonate" ceiling; pass None for the unbounded correctness-oracle
# behavior, or a smaller cap for aggressive boilerplate corpora.
DEFAULT_MAX_BUCKET = 5000


# ------------------------------------------------------------------ exact

def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_docs, min_id);
    only groups with n_docs > 1."""
    return (
        df.select(md5_long(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per identical text."""
    w = Window.partitionBy(md5_long(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# --------------------------------------------------------------- shingles

def word_shingles(text: Column, n: int = DEFAULT_SHINGLE) -> Column:
    """Word n-gram shingles as an array<string> (JVM-side).

    slice() is 1-indexed; sequence(0, size-n) enumerates start offsets.
    Documents shorter than n words yield the whole text as one shingle.
    """
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks)
    full = F.array_join(toks, " ")
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(k >= n, grams).otherwise(F.array(full))


# ---------------------------------------------------------------- minhash

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle: int = DEFAULT_SHINGLE,
    seed: int = 12345,
) -> DataFrame:
    """Long-form signatures: (id, i, minhash) for i in 0..num_hashes-1.

    Plan shape: explode shingles -> md5_long -> cross join hash index ->
    universal hash -> min per (id, i). One shuffle (the aggregation).
    """
    a, b = hash_family(num_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle))).alias(
            "shingle"
        ),
    ).select("id", (md5_long(F.col("shingle")) % F.lit(MERSENNE_P)).alias("h"))
    idx = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i")
    arr_a = F.array(*[F.lit(x) for x in a])
    arr_b = F.array(*[F.lit(x) for x in b])
    expanded = sh.select("id", "h", idx).select(
        "id",
        "i",
        (
            (F.element_at(arr_a, F.col("i") + 1) * F.col("h")
             + F.element_at(arr_b, F.col("i") + 1)) % F.lit(MERSENNE_P)
        ).alias("hv"),
    )
    return expanded.groupBy("id", "i").agg(F.min("hv").alias("minhash"))


def lsh_band_keys(
    signatures: DataFrame, band_rows: int = DEFAULT_BAND_ROWS
) -> DataFrame:
    """(id, band, band_key): concatenate each band's minhashes in hash
    order. Order inside collect is forced by sorting (i, minhash) structs
    — deterministic at any parallelism."""
    banded = signatures.withColumn("band", (F.col("i") / band_rows).cast("long"))
    return banded.groupBy("id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "minhash"))),
                lambda s: s["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    shingle: int = DEFAULT_SHINGLE,
    seed: int = 12345,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >= 1 LSH band.

    ``max_bucket`` is the hub-bucket guard for web scale: a band bucket
    holding b docs emits b*(b-1)/2 pairs, so one boilerplate bucket with
    10^5 members produces ~5*10^9 rows on its own. Buckets larger than
    ``max_bucket`` are dropped before the self-join (one extra count
    aggregation over the band table — the dropped pairs are exactly the
    ones a verifier would reject as boilerplate; near-dup clusters that
    big are better handled by the exact-fingerprint pass). Default
    ``DEFAULT_MAX_BUCKET``; pass None to keep every bucket.

    No silent caps: when the guard actually drops buckets, a WARNING
    with the dropped-bucket/member counts is logged (one small
    aggregation job over the bucket-size table at plan-build time), and
    :func:`lsh_dropped_bucket_stats` reports the same numbers as a
    DataFrame for pipelines that persist metrics."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle, seed)
    bands = lsh_band_keys(sigs, band_rows)
    if max_bucket is not None:
        # persist BEFORE the eager guard aggregation: the shingle +
        # minhash pipeline then runs ONCE — the guard materializes the
        # cache and the returned plan's two bands branches (pair join +
        # bucket-size semi-join) read it back instead of recomputing
        bands = bands.persist()
        bsz = bands.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
        dropped = (
            bsz.where(F.col("_n") > max_bucket)
            .agg(
                F.count("*").alias("buckets"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("members"),
            )
            .collect()[0]
        )
        if dropped["buckets"]:
            logger.warning(
                "minhash_lsh_candidates: dropped %d over-cap band buckets "
                "(%d member rows, max_bucket=%d) — boilerplate-scale "
                "clusters; use exact_duplicate_groups for those or raise "
                "max_bucket",
                dropped["buckets"], dropped["members"], max_bucket,
            )
        small = bsz.where(F.col("_n") <= max_bucket).drop("_n")
        bands = bands.join(small, ["band", "band_key"], "left_semi")
    a = bands.select(F.col("band"), F.col("band_key"), F.col("id").alias("id_a"))
    b = bands.select(F.col("band"), F.col("band_key"), F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_dropped_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    shingle: int = DEFAULT_SHINGLE,
    seed: int = 12345,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """One row (max_bucket, dropped_buckets, dropped_members): exactly
    what :func:`minhash_lsh_candidates` would drop under the hub-bucket
    guard — the metrics twin of its WARNING log line."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle, seed)
    bands = lsh_band_keys(sigs, band_rows)
    bsz = bands.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
    cap = max_bucket if max_bucket is not None else (1 << 62)
    return bsz.where(F.col("_n") > cap).agg(
        F.lit(cap).cast("long").alias("max_bucket"),
        F.count("*").cast("long").alias("dropped_buckets"),
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("dropped_members"),
    )


# -------------------------------------------------------------- jaccard

def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    (id_a, id_b, jaccard). Pairs with no common shingle are omitted
    (LSH candidates always share at least a band, so in the intended
    pipeline every candidate appears).

    Scale shape: the intersection is DRIVEN FROM ``pairs`` — join each
    side's shingles by document id, then match on (id_b, shingle) — so
    total work is bounded by |pairs| x shingles/doc. A shingle-keyed
    self-join (sh JOIN sh ON s) would instead blow up quadratically on
    any boilerplate shingle shared by many documents (10^6 docs sharing
    one shingle -> 10^12 intermediate rows) before any pair filter can
    apply; that shape is deliberately avoided here."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle))).alias("s"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    both = (
        pairs.select("id_a", "id_b")
        .join(sh.select(F.col("id").alias("id_a"), "s"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        both.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )


def ngram_containment(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Exact shingle-set CONTAINMENT for candidate pairs:
    (id_a, id_b, c_ab, c_ba, containment) where c_ab = |A∩B| / |A|
    and containment = max(c_ab, c_ba). The asymmetric complement of
    :func:`ngram_jaccard`: a short document quoted verbatim inside a
    long one scores near-zero Jaccard but containment ~1 — the signal
    training-data curation needs to catch quotes, boilerplate wrappers,
    and subset-duplicate shards (Broder 1997's "containment" resemblance
    companion).

    Same pair-driven scale shape as ngram_jaccard: work is bounded by
    |pairs| x shingles/doc; never a shingle-keyed self-join."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), shingle))).alias("s"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    both = (
        pairs.select("id_a", "id_b")
        .join(sh.select(F.col("id").alias("id_a"), "s"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    c_ab = F.col("inter") / F.col("na")
    c_ba = F.col("inter") / F.col("nb")
    return (
        both.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(c_ab, 6).alias("c_ab"),
            F.round(c_ba, 6).alias("c_ba"),
            F.round(F.greatest(c_ab, c_ba), 6).alias("containment"),
        )
    )


# --------------------------------------------------------------- simhash

def simhash16(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Portable 16-bit SimHash over whitespace tokens: bit b is 1 iff
    the majority of token hashes have bit b set (ties -> 0). JVM-side:
    explode tokens -> md5_long -> per-bit +-1 sums -> assemble."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).select("id", (md5_long(F.col("tok")) % F.lit(1 << 16)).alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(16)
    ]
    per_bit = toks.groupBy("id").agg(*aggs)
    sig = None
    for b in range(16):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_bit.select("id", sig.cast("long").alias("simhash"))


# --------------------------------------------------------------- clusters

def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
    shingle: int = DEFAULT_SHINGLE,
    seed: int = 0,
    threshold: float = 0.8,
    max_iter: int = 50,
) -> DataFrame:
    """Full near-duplicate CLUSTERING: MinHash-LSH candidates -> exact
    n-gram-Jaccard verification (>= ``threshold``) -> connected
    components over the verified-pair graph -> one canonical document
    per cluster. Returns EVERY input document:
    (doc_id, canonical_id, cluster_size) — canonical_id is the minimum
    doc id of the near-dup cluster (hash-min CC label), singletons map
    to themselves.

    This is the training-data dedup step stitched from both pillars:
    the candidate generation is bucketed (never all-pairs), the verify
    join is pair-driven, and the transitive closure is large-star/
    small-star CC in O(log n) rounds — near-dup clusters CHAIN
    (A~B~C~...), so the closure must not pay one shuffle round per
    chain hop. Labels match hash-min's fixpoint exactly (component =
    min doc id; ConnectedComponents.java:44-101 analog) — every stage
    is the at-scale shape.
    """
    from ..algos.components import connected_components_stars

    pairs = minhash_lsh_candidates(
        df, id_col, text_col, num_hashes, band_rows, shingle, seed
    )
    verified = ngram_jaccard(df, pairs, id_col, text_col, shingle).where(
        F.col("jaccard") >= threshold
    )
    dup_edges = verified.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = connected_components_stars(dup_edges, max_iter=max_iter).labels
    docs = df.select(F.col(id_col).alias("doc_id"))
    labelled = docs.join(
        labels.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("canonical_id"),
    )
    sizes = labelled.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return labelled.join(sizes, "canonical_id").select(
        "doc_id", "canonical_id", "cluster_size"
    )


def contamination_check(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    shingle: int = DEFAULT_SHINGLE,
    min_shared: int = 1,
) -> DataFrame:
    """Decontamination scan: (train_id, eval_id, shared_shingles,
    containment) for every training document sharing >= ``min_shared``
    distinct word n-grams with an eval document.

    ``containment`` = shared / |eval doc's distinct shingles| — the
    eval-side containment metric, NOT symmetric Jaccard: a long training
    document that embeds a whole eval document is contamination even
    though its Jaccard similarity is tiny.

    Scale shape: eval sets are small (thousands of docs) next to the
    corpus, so the eval shingle table is BROADCAST and the scan is one
    pass over corpus shingles with a map-side join + one groupBy —
    no shuffle of the corpus shingle table by shingle key. Self-pairs
    (the eval doc found in the corpus under the same id) are excluded.
    """
    ev = eval_set.select(
        F.col(id_col).alias("eval_id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle))
        ).alias("shingle"),
    )
    ev_sizes = ev.groupBy("eval_id").agg(F.count("*").alias("n_ev"))
    tr = corpus.select(
        F.col(id_col).alias("train_id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle))
        ).alias("shingle"),
    )
    shared = (
        tr.join(F.broadcast(ev), "shingle")
        .where(F.col("train_id") != F.col("eval_id"))
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= min_shared)
    )
    return shared.join(F.broadcast(ev_sizes), "eval_id").select(
        "train_id",
        "eval_id",
        "shared_shingles",
        F.round(F.col("shared_shingles") / F.col("n_ev"), 6).alias(
            "containment"
        ),
    )


# -------------------------------------------------- window (substring) dedup

def window_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Exact substring-level duplication at token-window granularity
    (the public Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" ExactSubstr posture, at window = ``k``
    whitespace tokens instead of a suffix array): every k-token sliding
    window is hashed (portable md5); a window occurrence is *duplicated*
    iff its hash occurs more than once in the corpus.

    Returns per document: ``n_windows``, ``dup_windows`` and the rounded
    ``dup_frac``.

    Scale shape: one explode (rows ~ total tokens), ONE hash-partitioned
    shuffle on the window hash (count via a partition window function —
    no second join back), then the per-doc aggregation. Hot windows (a
    boilerplate sentence duplicated across millions of docs) all land in
    one partition per hash — the count itself stays O(1) state per key;
    for adversarial single-hash skew the groupBy path would salt, but the
    window count here is a streaming count, which AQE splits fine."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )
    wins_arr = F.when(
        F.col("_n") >= k,
        F.expr(
            f"transform(sequence(1, _n - {k - 1}),"
            f" i -> md5(concat_ws(' ', slice(_toks, i, {k}))))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("doc_id", F.explode(wins_arr).alias("h"))
    occ = occ.withColumn("_c", F.count("*").over(Window.partitionBy("h")))
    per = occ.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum(F.when(F.col("_c") > 1, 1).otherwise(0)).alias("dup_windows"),
    )
    return (
        base.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("dup_windows"), F.lit(0)).cast("long").alias("dup_windows"),
            F.round(
                F.coalesce(F.col("dup_windows") / F.col("n_windows"), F.lit(0.0)), 6
            ).alias("dup_frac"),
        )
    )
