"""k-core decomposition by iterative degree peeling.

Not a reference operator (vigna/webgraph ships no core decomposition);
added as a first-class scale-graph analytic alongside triangles/cc — the
standard "dense subgraph" filter a link-graph pipeline runs before
expensive per-node algorithms.

Semantics: the k-core of the simple (symmetrized, loop-free) graph is
the maximal subgraph in which every node has degree >= k. Computed by
the classic peel loop: drop all nodes with degree < k, recompute
degrees, repeat to fixpoint.

Scale shape per round: ONE groupBy("src") shuffle for degrees (map-side
combine, uniform keys) and two hash semi-joins of the edge table against
the surviving-node set (co-partitioned on src/dst). The surviving set
shrinks monotonically, so rounds get cheaper; lineage is cut per round
with persist + localCheckpoint (plans/iterate.py pattern). Rounds are
bounded by the peel depth, which is O(n) worst case (a path) but small
on skewed web-like graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import simplify
from ..plans.iterate import release_local_checkpoint


def _materialize(df: DataFrame) -> DataFrame:
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 1000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Nodes of the k-core with their in-core degree: (node, deg).

    ``edges`` may be directed / multi / loopy — it is simplified first
    (degree = number of distinct neighbours, the standard definition).
    Raises if the peel has not reached the fixpoint in ``max_rounds``
    (truncated output would silently over-report the core).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    cur = _materialize(
        simplify(edges).repartition(num_partitions, "src")
    )
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = cur.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("src")
        nxt = _materialize(
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(num_partitions, "src")
        )
        n_next = nxt.count()
        release_local_checkpoint(cur)
        cur = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    else:
        raise RuntimeError(f"kcore: no fixpoint within {max_rounds} rounds")
    out = cur.groupBy("src").agg(F.count("*").alias("deg")).select(
        F.col("src").alias("node"), "deg"
    )
    return out


def peel_rounds_sql(k: int, rounds: int) -> str:
    """DuckDB twin: ``rounds`` unrolled peel rounds over the ``sym``
    CTE (which the caller must provide, de-looped + symmetrized).
    Extra rounds past the fixpoint are no-ops, so any ``rounds`` >= the
    true peel depth yields the exact k-core."""
    parts = ["k0 AS MATERIALIZED (SELECT src, dst FROM sym)"]
    for r in range(1, rounds + 1):
        parts.append(f"""
n{r} AS (SELECT src FROM k{r - 1} GROUP BY src HAVING COUNT(*) >= {k}),
k{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM k{r - 1} e
  JOIN n{r} a ON e.src = a.src
  JOIN n{r} b ON e.dst = b.src)""")
    parts.append(f"""
core AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM k{rounds} GROUP BY src)""")
    return ",".join(parts)
