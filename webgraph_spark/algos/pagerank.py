"""Power-iteration PageRank as an iterative DataFrame job.

Mandated by BASELINE.json north_rule (the reference's companion LAW
library computes PageRank on the same BVGraph primitives; see SURVEY.md
§2.10). Semantics: teleport alpha (damping) 0.85, uniform preference,
dangling-node mass redistributed uniformly — matching
``numpy``/``networkx`` power iteration, allclose 1e-6 at convergence.

Scale design (SURVEY.md §4 physical decisions):
- out-degree is denormalized into the edge table ONCE (reference analog:
  offsets/outdegree are part of the stored graph, BVGraph.java:858-888),
  so each iteration joins ranks to edges on ``src`` only;
- ranks are produced hash-partitioned on node id; the edge table is
  pre-partitioned on ``src`` with the same partition count, so the
  rank×edge join needs NO exchange — the only shuffle per iteration is
  the ``groupBy(dst)`` aggregation, whose map-side partial aggregation
  already collapses hub-dst skew (each map task emits one partial row
  per dst); an optional explicit two-level salted aggregation is
  available for extreme hubs (north_rule's "explicit salting");
- dangling mass is one scalar aggregate, applied analytically;
- every iteration's ranks are persisted + lineage-truncated; the
  ``plans.iterate`` driver adds durable per-iteration checkpoints with
  lineage/metrics rows (resumability).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class PageRankResult:
    ranks: DataFrame  # (node: long, rank: double)
    iterations: int
    converged: bool
    delta: float  # final L-inf delta


def _prepare(edges: DataFrame, num_partitions: int | None):
    """Degree-annotated, src-partitioned edge table + node set."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst")
    out_deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = (
        e.join(out_deg, "src")
        .repartition(num_partitions, "src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(num_partitions, "node")
        .persist()
    )
    dangling = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    return ew, nodes, dangling, num_partitions


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
    salt_buckets: int | None = None,
    fixed_iterations: int | None = None,
) -> PageRankResult:
    """PageRank over ``edges(src, dst)``.

    ``fixed_iterations`` runs exactly that many synchronous iterations
    with no convergence checks (used for unrolled-SQL oracle parity);
    otherwise iterate to L-inf < ``tol`` or ``max_iter``.
    """
    ew, nodes, dangling, P = _prepare(edges, num_partitions)
    n = nodes.count()
    if n == 0:
        return PageRankResult(
            edges.sparkSession.createDataFrame([], "node long, rank double"), 0, True, 0.0
        )

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()

    converged = False
    delta = float("inf")
    iters = fixed_iterations if fixed_iterations is not None else max_iter
    it = 0
    for it in range(1, iters + 1):
        dangling_mass = (
            ranks.join(dangling, "node", "left_semi").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contribs_in = ew.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select("src", "dst", (F.col("rank") / F.col("outdeg")).alias("c"))
        if salt_buckets:
            # explicit two-level salted aggregation for extreme hub dst:
            # salt by a hash of src so one hub dst spreads over buckets
            contribs = (
                contribs_in.groupBy(
                    "dst", F.pmod(F.xxhash64("src"), F.lit(salt_buckets)).alias("_salt")
                )
                .agg(F.sum("c").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
        else:
            contribs = contribs_in.groupBy("dst").agg(F.sum("c").alias("contrib"))

        base = (1.0 - alpha) / n + alpha * dangling_mass / n
        new_ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .persist()
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)  # truncate lineage
        if fixed_iterations is None:
            delta = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "old"), "node"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                .collect()[0][0]
            )
        ranks.unpersist()
        ranks = new_ranks
        if fixed_iterations is None and delta < tol:
            converged = True
            break

    ew.unpersist()
    dangling.unpersist()
    return PageRankResult(ranks, it, converged or fixed_iterations is not None, float(delta))
