"""Sequence packing: assign documents to fixed-token-budget training
batches.

Two variants, split by Spark-execution posture:

``pack_by_token_budget`` — GPT-style concat-and-chunk assignment: shard
documents by a key, order deterministically, and give each document the
index of the fixed-budget chunk in which it STARTS when the shard is
concatenated (``floor(exclusive-cumsum(tokens) / budget)``). One window
over (shard, order) — all-JVM, one shuffle, no Python — and exactly
expressible as an ANSI window for the oracle. A batch can spill past
the budget by less than one document (the document that straddles the
boundary), which is precisely the concat-and-chunk semantics trainers
use when sequences are split at token boundaries anyway.

``pack_greedy`` — exact first-fit-in-order bin packing: a document that
would overflow the current batch CLOSES it and opens the next, so no
batch except single-oversized-document batches ever exceeds the budget.
Running state makes this inherently sequential per shard, so it runs as
an Arrow-batched ``applyInPandas`` per shard — the honest split: the
declarative variant for the 100-TB hot path, the stateful variant when
the hard budget matters more than a pure-JVM plan.

Reference analog: webgraph's EliasFanoCumulativeOutdegreeList
(EliasFanoCumulativeOutdegreeList.java) solves the same shape — split a
concatenated sequence into near-equal-cost spans by cumulative weight —
for arc-balanced CSR partitioning; operators/csr.py:50 uses that for
pack parallelism, this module applies it to training batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    order_col: str,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Concat-and-chunk batch index per row (see module docstring)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        batch_col, F.floor(excl / F.lit(float(budget))).cast("long")
    )


def pack_greedy(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    order_col: str,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Exact first-fit-in-order packing per shard (see module docstring).

    Deterministic given (shard_col, order_col); a document with
    ``tokens > budget`` occupies a batch alone. Shards process
    independently (one Arrow batch group each), so parallelism = number
    of shards; keep shards at data-shard granularity, not corpus-level.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, {batch_col} long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        batches = []
        bid, used = 0, 0
        for t in pdf[token_col].astype("int64"):
            if used > 0 and used + t > budget:
                bid += 1
                used = 0
            used += int(t)
            batches.append(bid)
        pdf[batch_col] = pd.Series(batches, dtype="int64")
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, schema=out_schema)
