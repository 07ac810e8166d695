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


_RMAT_SCALE_BITS = 1 << 60  # md5_long range


def rmat(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic distributed R-MAT generator (Chakrabarti et al.
    SDM'04; the Graph500 benchmark input): edge i picks one quadrant
    per recursion level with probabilities (a, b, c, 1-a-b-c), here
    decided by the engine-portable coin ``md5_long('rmat:seed:i:l')``
    against INTEGER thresholds floor(a*2^60) etc. — so the generated
    edge list is a pure function of (seed, i), identical at any
    parallelism, and replayable in SQL (:func:`rmat_sql`).

    Scale posture: ``spark.range(n_edges)`` already distributes; each
    edge costs ``scale`` JVM md5 calls inside one whole-stage-codegen
    projection — no shuffle, no Python, and generation composes with
    everything downstream as an ordinary edge DataFrame (duplicate
    arcs are kept, as in Graph500; ``.distinct()`` to simplify).
    """
    from pyspark.sql import functions as F

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ta = int(a * _RMAT_SCALE_BITS)
    tb = int((a + b) * _RMAT_SCALE_BITS)
    tc = int((a + b + c) * _RMAT_SCALE_BITS)

    from ..functions.hashing import md5_long

    df = spark.range(0, n_edges, 1, num_partitions)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        u = md5_long(
            F.concat_ws(
                ":",
                F.lit("rmat"),
                F.lit(str(seed)),
                F.col("id").cast("string"),
                F.lit(str(lvl)),
            )
        )
        q = (
            F.when(u < ta, F.lit(0))
            .when(u < tb, F.lit(1))
            .when(u < tc, F.lit(2))
            .otherwise(F.lit(3))
        )
        src = src + (F.shiftright(q, 1) % 2).cast("long") * F.lit(1 << lvl)
        dst = dst + (q % 2).cast("long") * F.lit(1 << lvl)
    return df.select(src.alias("src"), dst.alias("dst"))


def rmat_sql(
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
) -> str:
    """DuckDB twin CTE body for :func:`rmat`: defines ``rmat_edges(src,
    dst)`` replaying the identical md5 quadrant choices."""
    ta = int(a * _RMAT_SCALE_BITS)
    tb = int((a + b) * _RMAT_SCALE_BITS)
    tc = int((a + b + c) * _RMAT_SCALE_BITS)
    src_terms, dst_terms = [], []
    for lvl in range(scale):
        u = (
            f"('0x' || substr(md5('rmat:{seed}:' || CAST(i AS VARCHAR) || "
            f"':{lvl}'), 1, 15))::BIGINT"
        )
        q = (
            f"(CASE WHEN {u} < {ta} THEN 0 WHEN {u} < {tb} THEN 1 "
            f"WHEN {u} < {tc} THEN 2 ELSE 3 END)"
        )
        src_terms.append(f"(({q} // 2) % 2) * {1 << lvl}")
        dst_terms.append(f"({q} % 2) * {1 << lvl}")
    return f"""rmat_edges AS MATERIALIZED (
  SELECT CAST({' + '.join(src_terms)} AS BIGINT) AS src,
         CAST({' + '.join(dst_terms)} AS BIGINT) AS dst
  FROM (SELECT unnest(range({n_edges})) AS i) t)"""
