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
- iteration state flows through plans.iterate: durable per-iteration
  parquet checkpoints + per-partition lineage rows when
  ``checkpoint_dir`` is set (resumable mid-run), else eager
  localCheckpoint for lineage truncation only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..plans.iterate import iterate


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
    ew = e.join(out_deg, "src").repartition(num_partitions, "src").persist()
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
    checkpoint_dir: str | None = None,
    run_id: str = "pagerank",
) -> PageRankResult:
    """PageRank over ``edges(src, dst)``.

    ``fixed_iterations`` runs exactly that many synchronous iterations
    with no convergence checks (used for unrolled-SQL oracle parity);
    otherwise iterate to L-inf < ``tol`` or ``max_iter``.
    ``checkpoint_dir`` enables durable resumable checkpoints + lineage.
    """
    spark = edges.sparkSession
    ew, nodes, dangling, P = _prepare(edges, num_partitions)
    n = nodes.count()
    if n == 0:
        return PageRankResult(
            spark.createDataFrame([], "node long, rank double"), 0, True, 0.0
        )

    ranks0 = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    state = {"delta": float("inf")}

    def step(ranks: DataFrame, k: int):
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
                (
                    F.lit(base) + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        return new_ranks, {"dangling_mass": dangling_mass}

    if fixed_iterations is not None:
        converged_fn = None
        max_it = fixed_iterations
    else:
        max_it = max_iter

        def converged_fn(old: DataFrame, new: DataFrame, k: int) -> bool:
            state["delta"] = (
                new.join(old.select("node", F.col("rank").alias("old")), "node")
                .agg(F.max(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                .collect()[0][0]
            )
            return state["delta"] < tol

    ranks, iters, done = iterate(
        spark,
        ranks0,
        step,
        max_iter=max_it,
        checkpoint_dir=checkpoint_dir,
        converged=converged_fn,
        run_id=run_id,
    )
    ew.unpersist()
    dangling.unpersist()
    return PageRankResult(
        ranks, iters, done or fixed_iterations is not None, float(state["delta"])
    )
