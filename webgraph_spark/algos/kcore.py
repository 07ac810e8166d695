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


def coreness(
    edges: DataFrame,
    max_rounds: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full core decomposition: (node, coreness) for every node of the
    simplified graph, via the h-index iteration (Lü-Chen-Zhou-Zhang-
    Stanley 2016, public result: repeatedly replacing each node's value
    — initialized to its degree — with the h-index of its neighbours'
    values converges to the coreness, on any graph).

    Per round: one co-partitioned join (neighbour values), one
    window-ranked per-node sort, one groupBy. The per-node window sort
    is the same per-successor-list work the CSR pack already does; a
    10^7-degree hub makes one large sorted partition slice — the known
    hub hazard, bounded by max degree (same posture as the reference's
    per-list sorts). Values only decrease, and the operator is monotone,
    so rounds past the fixpoint are no-ops — which is what makes a
    bounded-unroll SQL oracle exact.
    """
    from pyspark.sql import Window

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sym = _materialize(simplify(edges).repartition(num_partitions, "dst"))
    c = _materialize(
        sym.groupBy("src").agg(F.count("*").alias("c"))
        .select(F.col("src").alias("node"), "c")
    )
    w = Window.partitionBy("node").orderBy(F.desc("v"), "vid")
    for _ in range(max_rounds):
        nb = (
            sym.join(c.withColumnRenamed("node", "dst").withColumnRenamed("c", "v"), "dst")
            .select(F.col("src").alias("node"), "v", F.col("dst").alias("vid"))
        )
        h = (
            nb.withColumn("_r", F.row_number().over(w))
            .groupBy("node")
            .agg(
                F.sum(F.when(F.col("v") >= F.col("_r"), 1).otherwise(0)).alias("c2")
            )
        )
        nxt = _materialize(
            c.join(h, "node", "left").select(
                "node", F.coalesce("c2", F.lit(0)).cast("long").alias("c")
            )
        )
        n_changed = (
            nxt.withColumnRenamed("c", "_new")
            .join(c, "node")
            .where(F.col("_new") != F.col("c"))
            .count()
        )
        release_local_checkpoint(c)
        c = nxt
        if n_changed == 0:
            break
    else:
        raise RuntimeError(f"coreness: no fixpoint within {max_rounds} rounds")
    release_local_checkpoint(sym)
    return c


def coreness_rounds_sql(rounds: int) -> str:
    """DuckDB twin: ``rounds`` unrolled h-index rounds over ``sym``
    (caller provides it). Rounds past the fixpoint are no-ops."""
    parts = [
        "c0 AS MATERIALIZED (SELECT src AS node, COUNT(*) AS c FROM sym GROUP BY src)"
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
c{r} AS MATERIALIZED (
  SELECT node, SUM(CASE WHEN v >= rk THEN 1 ELSE 0 END) AS c FROM (
    SELECT e.src AS node, p.c AS v,
           ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY p.c DESC, e.dst) AS rk
    FROM sym e JOIN c{r - 1} p ON e.dst = p.node) t
  GROUP BY node)""")
    parts.append(
        f"core_final AS (SELECT node, CAST(c AS BIGINT) AS coreness FROM c{rounds})"
    )
    return ",".join(parts)
