"""Balanced edge-locality partitioning (deterministic Spinner variant).

Assigns every node to one of ``k`` blocks so that (a) most sym-arcs
stay inside a block (small edge cut → co-located CSR adjacency blocks,
cheap iterative shuffles) and (b) no block exceeds a capacity bound.
This is the placement problem a 100-TB link-graph deployment solves
before packing per-partition CSR blocks: the block id IS the physical
partition key, so PageRank/CC/LP shuffles become mostly block-local.

Published companion: Spinner (Martella-Logothetis-Loukas-Siganos,
"Spinner: Scalable Graph Partitioning in the Cloud", ICDE 2017) — LP
with a capacity penalty. Reference analog: webgraph's compression
orderings (SURVEY.md §2.4 — gray/lex/LLP in operators/transforms.py,
algos/llp.py) solve the same locality objective for bit-level storage;
this operator solves it for cluster placement.

Deterministic divergences from Spinner (documented, not bugs — chosen
so the recurrence is exactly replayable by an unrolled-SQL twin and
bit-stable at any parallelism):

- synchronous rounds, not asynchronous sweeps;
- a node *wants* the block maximizing (neighbour count DESC, current
  block load ASC, block id ASC) — integer scores only, total order;
- it *moves* only if the target beats its current block's neighbour
  count strictly (gain > 0), and only while the target has headroom:
  movers into block b are ranked (gain DESC, node ASC) and the first
  ``cap - load(b)`` are admitted. Everyone else retries next round —
  the deterministic stand-in for Spinner's probabilistic dampening;
- capacity ``cap = ceil(n * (100 + slack_pct) / (100 * k))`` in pure
  integer arithmetic (identical expression in the SQL twin).

Scale shape per round: one count shuffle over sym arcs (map-side
combined), one k-row load aggregate (broadcast back), one per-node
window, and one per-target-block admission window. The admission
window partitions by block id (k partitions) — the one potentially
skewed step. It is bounded by movers-per-round, which collapses after
the first rounds (most nodes settle); at extreme scale the exact
rank-admission can be swapped for expected-quota hash-threshold
admission (accept mover iff its portable hash priority is below
quota/movers_b) with the same integer determinism — the rank rule is
kept here because it is the one the oracle replays row-for-row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.transforms import no_loops, symmetrize


@dataclass
class PartitionResult:
    assignment: DataFrame  # (node: long, block: int)
    rounds: int
    cap: int
    n_nodes: int


def balanced_partition(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 4,
    slack_pct: int = 5,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str = "partition",
) -> PartitionResult:
    """``rounds`` synchronous capacity-bounded LP rounds from the
    ``node % k`` seed assignment. Fixed schedule (idempotent past the
    fixpoint) so the unrolled SQL twin replays it exactly."""
    from ..plans.iterate import iterate, iteration_confs

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = (
        no_loops(symmetrize(edges.select("src", "dst")))
        .repartition(num_partitions, "src")
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    cap = (n * (100 + slack_pct) + 100 * k - 1) // (100 * k)

    a0 = nodes.select(
        "node", (F.col("node") % F.lit(k)).cast("int").alias("block")
    )

    w_best = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("ld").asc(), F.col("block").asc()
    )
    w_admit = Window.partitionBy("tgt").orderBy(
        F.col("gain").desc(), F.col("node").asc()
    )

    def step(a: DataFrame, r: int):
        ld = a.groupBy("block").agg(F.count("*").alias("ld"))  # k rows
        cnt = (
            sym.join(
                a.withColumnRenamed("node", "src").hint("shuffle_hash"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "block")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            cnt.join(F.broadcast(ld), "block")
            .withColumn("_rn", F.row_number().over(w_best))
            .where(F.col("_rn") == 1)
            .select("node", F.col("block").alias("tgt"), F.col("cnt").alias("bcnt"))
        )
        cur_cnt = cnt.select(
            F.col("node").alias("cnode"),
            F.col("block").alias("cur_block"),
            F.col("cnt").alias("ccnt"),
        )
        movers = (
            best.join(a.hint("shuffle_hash"), "node")
            .join(
                cur_cnt.hint("shuffle_hash"),
                (F.col("node") == F.col("cnode"))
                & (F.col("block") == F.col("cur_block")),
                "left",
            )
            .select(
                "node",
                "block",
                "tgt",
                (F.col("bcnt") - F.coalesce(F.col("ccnt"), F.lit(0))).alias("gain"),
            )
            .where((F.col("tgt") != F.col("block")) & (F.col("gain") > 0))
        )
        admitted = (
            movers.withColumn("_rn", F.row_number().over(w_admit))
            .join(
                F.broadcast(ld.withColumnRenamed("block", "tgt")), "tgt"
            )
            .where(F.col("_rn") <= F.greatest(F.lit(0), F.lit(cap) - F.col("ld")))
            .select("node", "tgt")
        )
        a_new = a.join(admitted.hint("shuffle_hash"), "node", "left").select(
            "node", F.coalesce("tgt", "block").cast("int").alias("block")
        )
        return a_new, {}, None

    with iteration_confs(spark):
        a, it, _ = iterate(
            spark,
            a0,
            step,
            max_iter=rounds,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
        )
    sym.unpersist()
    return PartitionResult(a, it, cap, n)


def partition_quality(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """Quality row of a node->block assignment on the sym loop-free
    graph: (cut_arcs, m_arcs, max_load, n_blocks) — all integers, so
    the comparison against the oracle is exact."""
    sym = no_loops(symmetrize(edges.select("src", "dst")))
    a = assignment.select("node", "block")
    arcs = (
        sym.join(
            a.withColumnRenamed("node", "src").withColumnRenamed("block", "bsrc"),
            "src",
        ).join(
            a.withColumnRenamed("node", "dst").withColumnRenamed("block", "bdst"),
            "dst",
        )
    )
    tot = arcs.agg(
        F.count("*").alias("m_arcs"),
        F.sum(F.when(F.col("bsrc") != F.col("bdst"), 1).otherwise(0)).alias(
            "cut_arcs"
        ),
    )
    loads = a.groupBy("block").agg(F.count("*").alias("ld")).agg(
        F.max("ld").alias("max_load"), F.count("*").alias("n_blocks")
    )
    return tot.crossJoin(loads).select(
        F.col("cut_arcs").cast("long"),
        F.col("m_arcs").cast("long"),
        F.col("max_load").cast("long"),
        F.col("n_blocks").cast("long"),
    )
