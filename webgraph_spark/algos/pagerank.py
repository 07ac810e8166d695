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
- ranks are produced hash-partitioned on node id and the edge table is
  pre-partitioned on ``src``, so the rank×edge join needs no extra
  exchange — the only shuffle per iteration is the ``groupBy(dst)``
  aggregation, whose map-side partial aggregation collapses hub-dst
  skew; an optional explicit two-level salted aggregation is available
  for extreme hubs (north_rule's "explicit salting");
- **one Spark job per iteration**: dangling mass and the L-inf
  convergence delta are Observation metrics on the materializing action
  (the dangling mass observed while writing iteration k feeds the
  teleport base of iteration k+1 analytically);
- iteration state flows through plans.iterate: durable per-iteration
  parquet checkpoints + per-partition lineage rows when
  ``checkpoint_dir`` is set (resumable mid-run), else eager local
  checkpoints for lineage truncation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F

from ..plans.iterate import iterate, iteration_confs


@dataclass
class PageRankResult:
    ranks: DataFrame  # (node: long, rank: double)
    iterations: int
    converged: bool
    delta: float  # final L-inf delta


def _prepare(edges: DataFrame, num_partitions: int | None):
    """Degree-annotated, src-partitioned edge table + flagged node set."""
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
        .join(out_deg.select(F.col("src").alias("node"), F.lit(0.0).alias("z")), "node", "left")
        .select("node", F.when(F.col("z").isNull(), 1.0).otherwise(0.0).alias("dang"))
        .repartition(num_partitions, "node")
        .persist()
    )
    return ew, nodes, num_partitions


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
    with no convergence stop (used for unrolled-SQL oracle parity);
    otherwise iterate to L-inf < ``tol`` or ``max_iter``.
    ``checkpoint_dir`` enables durable resumable checkpoints + lineage.
    """
    spark = edges.sparkSession
    ew, nodes, P = _prepare(edges, num_partitions)
    n = nodes.count()
    if n == 0:
        return PageRankResult(
            spark.createDataFrame([], "node long, rank double"), 0, True, 0.0
        )

    # state: (node, rank, dang); dang is static but riding it in the
    # state frame keeps each iteration a single self-contained join tree
    ranks0 = nodes.select("node", F.lit(1.0 / n).alias("rank"), "dang")
    carry: dict = {"dmass": None, "delta": float("inf")}

    def step(ranks: DataFrame, k: int):
        if carry["dmass"] is None:
            # only on (re)start: dangling mass of the carried-in state
            carry["dmass"] = (
                ranks.where(F.col("dang") > 0).agg(F.sum("rank")).collect()[0][0]
                or 0.0
            )
        base = (1.0 - alpha) / n + alpha * carry["dmass"] / n

        # shuffle_hash hint: ranks are co-partitioned with ew on the join
        # key; without the hint the planner broadcast-joins the rank side
        # at small scale, rebuilding a multi-MB broadcast EVERY iteration
        # (and a broadcast would be impossible at 10^10 nodes anyway)
        contribs_in = ew.join(
            ranks.select(F.col("node").alias("src"), "rank").hint("shuffle_hash"),
            "src",
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

        # fold the old rank into the state frame: the state row set IS the
        # node set, so one left join against contribs replaces the former
        # nodes-join + old-rank-join pair (2 joins/iter instead of 3 — the
        # state-side hash build was the dominant per-iteration fixed cost)
        obs = Observation()
        new_ranks = (
            ranks.withColumnRenamed("rank", "_old")
            .join(
                contribs.withColumnRenamed("dst", "node").hint("shuffle_hash"),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
                "dang",
                "_old",
            )
            .observe(
                obs,
                F.sum(F.col("rank") * F.col("dang")).alias("dmass"),
                F.max(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
            )
            .select("node", "rank", "dang")
        )
        return new_ranks, {"base": base}, obs

    def stop(obs_metrics: dict, k: int) -> bool:
        carry["dmass"] = obs_metrics.get("dmass", carry["dmass"]) or 0.0
        carry["delta"] = obs_metrics.get("delta", float("inf"))
        if fixed_iterations is not None:
            return False
        return carry["delta"] < tol

    max_it = fixed_iterations if fixed_iterations is not None else max_iter
    with iteration_confs(spark):
        state, iters, done = iterate(
            spark,
            ranks0,
            step,
            max_iter=max_it,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            stop=stop,
        )
    ew.unpersist()
    nodes.unpersist()
    return PageRankResult(
        state.select("node", "rank"),
        iters,
        done or fixed_iterations is not None,
        float(carry["delta"]),
    )
