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
