"""Deterministic stratified sampling for training-data pipelines.

A 100-TB corpus is never trained on whole: pipelines draw
language/source-balanced subsets. Both samplers here are DETERMINISTIC
functions of the row key (portable md5, functions/hashing.py) — the
sample is identical at any parallelism level, resumable, and
oracle-checkable in plain SQL, unlike ``df.sample()`` whose output
depends on partitioning.

Reference analog: webgraph's test fixtures draw seeded deterministic
samples (e.g. ErdosRenyiGraph.java:79-83 keyed draws); the same
hash-keyed posture applied to corpus rows.

Scale notes: the fraction sampler is a pure filter — embarrassingly
parallel, no shuffle, predicate-pushdown friendly. The fixed-k sampler
window-partitions by stratum; with few strata and large k the per-stratum
sort is the bottleneck, so for k beyond ~10^6 per stratum prefer
two-phase selection (per-partition top-k via the same hash order, then a
global top-k over candidates — the shape algos/topk.py already uses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import md5_long


def _key_hash(key_col: Column) -> Column:
    return md5_long(key_col.cast("string"))


def stratified_sample_fraction(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    key_col: str,
    denom: int = 1_000_000,
) -> DataFrame:
    """Keep ~``fraction`` of rows per stratum: row survives iff
    ``md5_long(key) % denom < fraction * denom``. One filter, no shuffle;
    the same row always makes the same decision (stable under re-runs,
    appends, and repartitioning)."""
    thresh = int(fraction * denom)
    return df.where(_key_hash(F.col(key_col)) % F.lit(denom) < F.lit(thresh))


def stratified_sample_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum: the k smallest rows in
    deterministic md5 order (ties broken by the key itself). Equivalent
    to a seeded uniform draw without replacement, but reproducible and
    engine-portable."""
    w = Window.partitionBy(strata_col).orderBy(
        _key_hash(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    denom: int = 1_000_000,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test split: row lands in the
    bucket whose cumulative [lo, hi) hash range contains
    ``md5_long(key) % denom``. The assignment is a pure function of the
    row key — stable under re-runs, appends, repartitioning, and engine
    (the same CASE over the same portable hash runs in any SQL engine),
    which is what makes held-out sets trustworthy on a growing corpus:
    a document can never migrate between train and test.

    ``fractions`` must sum to <= 1 (+epsilon); rows beyond the covered
    range get NULL (filterable leftovers). One filter-free projection:
    no shuffle, no sampling nondeterminism.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    h = _key_hash(F.col(key_col)) % F.lit(denom)
    expr = None
    cum = 0
    for name, frac in fractions.items():
        cum += int(frac * denom)
        cond = h < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    budget: int,
    key_col: str,
) -> DataFrame:
    """Mixture curation: per stratum (source/domain/language), keep the
    deterministic hash-ordered prefix of documents whose EXCLUSIVE
    running token total stays under ``budget`` — how a training mix is
    drawn to hit per-source token ratios. The one document straddling
    the budget boundary is kept (exclusive cumsum), so every stratum
    with any data contributes at least one document.

    Hash order (portable md5 of the key, ties by key) makes the prefix
    a uniform draw that is identical at any parallelism and across
    re-runs of the same corpus. Unlike hash_split, membership is NOT
    stable under corpus growth (a new key can hash into the prefix and
    push the tail out) — budgets bound the mix, splits guard eval sets;
    use both accordingly. One window per stratum, all JVM.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(_key_hash(F.col(key_col)), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("_excl", excl).where(
        F.col("_excl") < F.lit(budget)
    ).drop("_excl")
