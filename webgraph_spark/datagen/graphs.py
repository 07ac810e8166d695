"""Seeded graph generators and micro-fixtures (FIXTURES.md §3-4).

Reference analogs: ErdosRenyiGraph (examples/ErdosRenyiGraph.java:44-100,
seeded G(n,p) without materialization) and the ArrayListMutableGraph
factory graphs (ArrayListMutableGraph.java:157 complete graph, :168
complete binary in-tree) used throughout the reference's tests.

All generators emit edge DataFrames ``(src: long, dst: long)`` with
strictly deterministic content keyed by (seed, src, dst-block) — never by
partition id — so results are identical at any parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .rng import uniform

EDGE_SCHEMA = "src long, dst long"


def erdos_renyi(
    spark: SparkSession,
    n: int,
    p: float,
    seed: int = 0,
    no_loops: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """G(n, p): each arc (i, j) present independently with probability p.

    Distributed per-source expansion: each task draws the full Bernoulli
    row for its source nodes in numpy (ErdosRenyiGraph.java:79-83 analog).
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    num_partitions = max(1, min(num_partitions, n))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in pdf["id"].to_numpy(dtype=np.int64):
                u = uniform(seed, s, np.arange(n, dtype=np.int64))
                dst = np.nonzero(u < p)[0].astype(np.int64)
                if no_loops:
                    dst = dst[dst != s]
                if len(dst):
                    yield pd.DataFrame({"src": np.full(len(dst), s), "dst": dst})

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, schema=EDGE_SCHEMA)


def erdos_renyi_numpy(n: int, p: float, seed: int = 0, no_loops: bool = True) -> np.ndarray:
    """Oracle twin of :func:`erdos_renyi`: dense adjacency matrix."""
    a = np.zeros((n, n), dtype=bool)
    for s in range(n):
        u = uniform(seed, np.int64(s), np.arange(n, dtype=np.int64))
        a[s] = u < p
    if no_loops:
        np.fill_diagonal(a, False)
    return a


def _df(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    if not pairs:
        return spark.createDataFrame([], schema=EDGE_SCHEMA)
    pdf = pd.DataFrame(pairs, columns=["src", "dst"]).astype("int64")
    return spark.createDataFrame(pdf)


def complete_graph(spark: SparkSession, n: int, loops: bool = False) -> DataFrame:
    """K_n (ArrayListMutableGraph.newCompleteGraph analog)."""
    return _df(
        spark,
        [(i, j) for i in range(n) for j in range(n) if loops or i != j],
    )


def directed_cycle(spark: SparkSession, n: int) -> DataFrame:
    """C_n: i -> (i+1) mod n."""
    return _df(spark, [(i, (i + 1) % n) for i in range(n)])


def star(spark: SparkSession, k: int, out: bool = True) -> DataFrame:
    """Hub 0 with k leaves; ``out`` chooses hub->leaf vs leaf->hub."""
    return _df(spark, [(0, i) if out else (i, 0) for i in range(1, k + 1)])


def complete_binary_intree(spark: SparkSession, height: int) -> DataFrame:
    """Complete binary in-tree of given height: children point to parent
    (ArrayListMutableGraph.newCompleteBinaryIntree analog)."""
    pairs = []
    n = 2 ** (height + 1) - 1
    for i in range(1, n):
        pairs.append((i, (i - 1) // 2))
    return _df(spark, pairs)


def two_cliques_bridge(
    spark: SparkSession, a: int, b: int, bridge: bool = False
) -> DataFrame:
    """Two disjoint cliques K_a, K_b (nodes 0..a-1, a..a+b-1), optional
    bridge arc (0 -> a) — CC/largest-component fixtures."""
    pairs = [(i, j) for i in range(a) for j in range(a) if i != j]
    pairs += [(a + i, a + j) for i in range(b) for j in range(b) if i != j]
    if bridge:
        pairs.append((0, a))
    return _df(spark, pairs)
