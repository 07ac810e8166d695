"""Distributed BPE (byte-pair-encoding) tokenizer training and
application — the vocabulary-learning step of an LLM data pipeline
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"), built Spark-first.

Scale shape (the part that matters at 100 TB):

- **Corpus -> distinct-word dictionary reduction.** BPE statistics are
  a function of the word-frequency table, not the corpus: one
  ``groupBy(word)`` shuffle collapses a 100 TB corpus to a
  vocabulary-sized table (~10^7-10^8 rows), and EVERY training
  iteration after that touches only the dictionary. This is the same
  move ``assign_dense_ids`` makes for node ids and the classic Sennrich
  implementation makes in memory — here the dictionary stays a
  distributed DataFrame, so a 10^8-type vocabulary needs no driver
  memory.
- **O(1) driver bytes per merge.** Each iteration ships exactly one
  row (the argmax pair) to the driver; pair counting is one map-side-
  combined ``groupBy(a, b)`` over the dictionary.
- **All-JVM merge kernel.** Applying a merge rewrites each word's
  symbol array with a single ``aggregate`` higher-order function (a
  left-to-right greedy fold over a separator-joined string
  accumulator) — no Python in the loop, no UDF.
- **Bounded lineage.** The dictionary is persisted per round and
  ``localCheckpoint``-ed every ``checkpoint_every`` merges so the plan
  does not grow linearly with the number of merges (same pattern as
  the PageRank loop, plans/iterate.py).
- **Tokenization by dictionary join.** ``bpe_token_counts`` tokenizes
  each *distinct* word once (dictionary-sized work), then joins the
  result back to the exploded corpus — cost proportional to
  |vocabulary| + one corpus join, never |corpus| x |rules|.

Greedy-fold semantics (identical on the Spark side and in the DuckDB
oracle SQL, which uses ``list_reduce`` with the same lambda): symbols
are folded left to right into a U+001F-separated string; the pair
(a, b) merges when the accumulator's LAST symbol is exactly ``a`` and
the incoming symbol is ``b`` — the last symbol is ``a`` iff the
accumulator equals ``a`` or ends with SEP+``a``, and merging appends
``b`` with no separator. A merged symbol (a||b) can never re-match
``a`` in the same rule (b is non-empty), so one fold pass IS the full
greedy left-to-right application — runs like "aaaa" become
[aa, aa], exactly as Sennrich's reference merge does.

No end-of-word marker is used (merges never cross word boundaries,
which the per-word symbol arrays already guarantee); this is a
deliberate simplification vs Sennrich's ``</w>`` and is applied
identically in training and tokenization.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .text import BPE_TOKEN_REGEX

SEP = "\x1f"  # unit separator: joins symbols inside the fold accumulator


@dataclass
class BpeResult:
    # merge rules in application order: (rank, lhs, rhs, pair_count)
    rules: list
    vocab: DataFrame  # (word, cnt, syms) after all merges
    n_merges: int


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, cnt) dictionary: the one corpus-wide shuffle.

    Pre-tokenization is the BPE-ish regex from text.py (letter runs /
    digit runs / single punctuation), shared with the oracle SQL."""
    clean = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), SEP, "")
    words = df.select(
        F.explode(F.regexp_extract_all(clean, F.lit(BPE_TOKEN_REGEX), F.lit(0))).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").cast("long").alias("cnt"))


def _char_syms() -> F.Column:
    """Split a word into single-character symbols (JVM-side)."""
    return F.expr("filter(split(word, ''), s -> s != '')")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the dictionary: explode the
    (size-1) adjacent pairs of each word's symbol array, weight by the
    word's corpus count, one map-side-combined groupBy."""
    pairs = vocab.where(F.size("syms") > 1).select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(element_at(syms, i) as a,"
                " element_at(syms, i + 1) as b))"
            )
        ).alias("pr"),
    )
    return pairs.groupBy("pr.a", "pr.b").agg(
        F.sum("cnt").cast("long").alias("pair_count")
    )


def _merge_expr(a: str, b: str) -> F.Column:
    """One greedy fold applying merge (a, b) to the ``syms`` array,
    returning the new symbol array. All-JVM; ``F.lit`` carries the
    (possibly punctuation-laden) symbol strings safely."""
    la, lb = F.lit(a), F.lit(b)
    folded = F.aggregate(
        F.slice(F.col("syms"), F.lit(2), F.greatest(F.size("syms") - 1, F.lit(0))),
        F.element_at("syms", 1),
        lambda acc, x: F.when(
            ((acc == la) | acc.endswith(F.lit(SEP + a))) & (x == lb),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return F.split(folded, SEP)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_every: int = 8,
) -> BpeResult:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Deterministic: the argmax pair breaks ties by (pair_count DESC,
    a ASC, b ASC) under binary string ordering — the same tiebreak the
    oracle SQL uses. Stops early if no adjacent pair remains.

    Reference analog: none in vigna/webgraph (this is pure
    training-data-pipeline surface); the iterate-persist-unpersist
    loop shape matches algos/pagerank.py:240-263."""
    vocab = (
        word_counts(df, text_col)
        .withColumn("syms", _char_syms())
        .persist()
    )
    vocab.count()  # materialize the dictionary once
    rules: list = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["pair_count"]
        rules.append((rank, a, b, int(cnt)))
        nxt = vocab.withColumn("syms", _merge_expr(a, b))
        if rank % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        vocab.unpersist()
        vocab = nxt
    return BpeResult(rules=rules, vocab=vocab, n_merges=len(rules))


def rules_df(spark: SparkSession, result: BpeResult) -> DataFrame:
    """Merge rules as a DataFrame (rank, lhs, rhs, pair_count)."""
    return spark.createDataFrame(
        result.rules, "rank int, lhs string, rhs string, pair_count long"
    )


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, result: BpeResult
) -> DataFrame:
    """Per-document token counts under the trained merges:
    (doc_id, n_words, n_tokens). Tokenizes by dictionary join — the
    trained ``vocab`` already holds each distinct word's final symbol
    array, so the corpus pass is explode + join + sum, with the word
    dictionary broadcast when small (AQE picks this up at sandbox
    scale; at a 10^8-word vocabulary it becomes a co-partitioned
    shuffle join, which is the right plan there)."""
    clean = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), SEP, "")
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.regexp_extract_all(clean, F.lit(BPE_TOKEN_REGEX), F.lit(0))).alias(
            "word"
        ),
    )
    toks = result.vocab.select("word", F.size("syms").cast("long").alias("n_toks"))
    joined = occ.join(toks, "word", "left")
    return joined.groupBy("doc_id").agg(
        F.sum(F.when(F.col("word").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_words"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL builders (unrolled per merge, same greedy lambda)
# ---------------------------------------------------------------------------

_SQL_RE = BPE_TOKEN_REGEX.replace("'", "''")


def _train_ctes(n_merges: int, table: str = "documents", text_col: str = "text") -> str:
    """CTE chain w0, p1, b1, w1, ..., b{n}, w{n}: w{t} is the dictionary
    after t merges, b{t} the t-th argmax pair. ``list_reduce`` folds
    with the identical string-accumulator lambda the Spark side uses."""
    parts = [
        f"""w0 AS (
  SELECT word, COUNT(*)::BIGINT AS cnt, regexp_extract_all(word, '.') AS syms
  FROM (SELECT unnest(regexp_extract_all(replace(coalesce({text_col}, ''), chr(31), ''), '{_SQL_RE}')) AS word
        FROM {table})
  GROUP BY word
)"""
    ]
    for t in range(1, n_merges + 1):
        prev = f"w{t - 1}"
        parts.append(
            f"""p{t} AS (
  SELECT pr[1] AS a, pr[2] AS b, SUM(cnt)::BIGINT AS pair_count
  FROM (SELECT cnt,
               unnest([[syms[i], syms[i + 1]] FOR i IN generate_series(1, len(syms) - 1)]) AS pr
        FROM {prev} WHERE len(syms) > 1)
  GROUP BY 1, 2
)"""
        )
        parts.append(
            f"""b{t} AS (
  SELECT a, b, pair_count FROM p{t}
  ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
)"""
        )
        parts.append(
            f"""w{t} AS (
  SELECT word, cnt,
         string_split(list_reduce(syms, (acc, x) ->
           CASE WHEN (acc = a OR ends_with(acc, chr(31) || a)) AND x = b
                THEN acc || x ELSE acc || chr(31) || x END), chr(31)) AS syms
  FROM {prev}, b{t}
)"""
        )
    return ",\n".join(parts)


def bpe_merges_sql(n_merges: int, table: str = "documents", text_col: str = "text") -> str:
    """Oracle for the merge-rule table (rank, lhs, rhs, pair_count)."""
    rows = "\nUNION ALL\n".join(
        f"SELECT {t} AS rank, a AS lhs, b AS rhs, pair_count FROM b{t}"
        for t in range(1, n_merges + 1)
    )
    return f"WITH {_train_ctes(n_merges, table, text_col)}\n{rows}"


def bpe_token_counts_sql(
    n_merges: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for per-doc (doc_id, n_words, n_tokens) under n merges."""
    return f"""WITH {_train_ctes(n_merges, table, text_col)},
occ AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(replace(coalesce({text_col}, ''), chr(31), ''), '{_SQL_RE}')) AS word
  FROM {table}
),
per AS (
  SELECT o.doc_id, COUNT(*)::BIGINT AS n_words, SUM(len(w.syms))::BIGINT AS n_tokens
  FROM occ o JOIN w{n_merges} w USING (word)
  GROUP BY o.doc_id
)
SELECT d.{id_col} AS doc_id,
       COALESCE(p.n_words, 0)::BIGINT AS n_words,
       COALESCE(p.n_tokens, 0)::BIGINT AS n_tokens
FROM {table} d LEFT JOIN per p ON d.{id_col} = p.doc_id"""
