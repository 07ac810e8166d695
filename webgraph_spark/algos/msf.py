"""Minimum spanning forest via distributed Borůvka.

The reference ships no MSF, but a link-graph engine at 100 TB wants one
(backbone extraction, weighted-graph sparsification before expensive
all-pairs work, hierarchical clustering of similarity graphs — e.g. the
MinHash/TF-IDF pair graphs built by functions/dedup.py, whose natural
summary is exactly a forest over near-duplicate clusters).

Borůvka is the MST algorithm that is *actually* a dataflow: every round
each component picks its minimum outgoing edge (one map-side-combined
``groupBy(comp).min(struct)``), the chosen edges merge components (a
pointer-doubling hash join on the *component-level* table, which is
orders of magnitude smaller than the node table after the first round),
and the contracted edge table shrinks monotonically. Component count at
least halves per round, so rounds ≤ log2(n); all per-round state beyond
the (shrinking) edge table is component-sized.

Determinism: edges are totally ordered by ``(w, a, b)`` (weight, then
canonical endpoint ids), so the chosen edge per component is unique and
the forest is a pure function of the input — required for the DuckDB
oracle twin (graph/testdata.py:msf_sql), which unrolls the identical
schedule: per-round ROW_NUMBER argmin, mutual-minimum cycle break at
the smaller component id, ``jumps`` pointer doublings.

Scale posture: the chosen/parent tables have ONE row per live component
(not per node); pointer doubling is log2(depth) self-joins of that
small table, with the per-jump change count riding the materializing
action as an Observation (one job per jump); the contracted edge table
is re-aggregated per (ca, cb) pair each round so parallel edges
collapse and the shuffle shrinks. The round-level stop probe is a
``limit(1).count()`` against the already-checkpointed contracted table
— a storage-local scan, not a recompute.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..plans.iterate import (
    eager_checkpoint,
    iteration_confs,
    release_local_checkpoint,
)


@dataclass
class MSFResult:
    forest: DataFrame  # (a: long, b: long, w: long) canonical a < b
    labels: DataFrame  # (node: long, comp: long) component of each endpoint
    rounds: int
    converged: bool  # False only if max_rounds hit with live edges left


def _canonical_undirected(edges: DataFrame, weight_col: str) -> DataFrame:
    """(a, b, w): a < b, loops dropped, parallel arcs collapsed to the
    minimum weight (any heavier parallel edge can never enter the MSF)."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def _merge_parents(chosen: DataFrame, jumps: int | None) -> DataFrame:
    """Component-level parent map for one Borůvka round.

    ``chosen(c, oc, ...)`` is the per-component argmin edge (c's chosen
    neighbour component oc). Each merge group's overall minimum edge is
    chosen from BOTH sides (total order ⇒ unique), forming the group's
    single 2-cycle; break it at the smaller id to get the root, then
    pointer-double to the fixpoint (or exactly ``jumps`` times for the
    fixed-schedule oracle twin — doubling is idempotent past
    convergence, so extra jumps never change the result).
    """
    left = chosen.select("c", "oc")
    other = chosen.select(F.col("c").alias("oc"), F.col("oc").alias("ooc"))
    parent = (
        left.join(other, "oc")
        .select(
            "c",
            F.when(
                (F.col("ooc") == F.col("c")) & (F.col("c") < F.col("oc")),
                F.col("c"),
            )
            .otherwise(F.col("oc"))
            .alias("p"),
        )
    )
    from pyspark.sql import Observation

    parent = eager_checkpoint(parent)
    n_jumps = jumps if jumps is not None else 64
    for j in range(n_jumps):
        grand = parent.select(F.col("c").alias("p"), F.col("p").alias("gp"))
        obs = Observation()
        nxt = eager_checkpoint(  # one job: doubling + moved count
            parent.join(grand, "p")
            .observe(
                obs,
                F.sum((F.col("p") != F.col("gp")).cast("long")).alias("moved"),
            )
            .select("c", F.col("gp").alias("p"))
        )
        release_local_checkpoint(parent)
        parent = nxt
        if jumps is None and not obs.get.get("moved"):
            break
    return parent


def boruvka_msf(
    edges: DataFrame,
    weight_col: str = "label",
    max_rounds: int = 32,
    fixed_rounds: int | None = None,
    jumps: int | None = None,
    num_partitions: int | None = None,
) -> MSFResult:
    """Minimum spanning forest of the undirected view of
    ``edges(src, dst, weight_col)``.

    ``fixed_rounds``/``jumps`` pin the synchronous schedule for the
    unrolled-SQL oracle twin (graph/testdata.py:msf_sql); both are
    idempotent past convergence, so a fixed schedule that reaches the
    fixpoint returns the exact MSF. Default mode iterates until no
    component has an outgoing edge.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with iteration_confs(spark):
        ued = _canonical_undirected(edges, weight_col)
        # contracted edge table: original endpoints ride along so the
        # forest emits input edges, not component ids
        ced = eager_checkpoint(
            ued.select(
                F.col("a").alias("ca"), F.col("b").alias("cb"), "w", "a", "b"
            ).repartition(num_partitions, "ca")
        )
        labels = eager_checkpoint(
            ued.select(F.col("a").alias("node"))
            .unionByName(ued.select(F.col("b").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("comp"))
        )
        forests: list[DataFrame] = []
        rounds = fixed_rounds if fixed_rounds is not None else max_rounds
        converged = fixed_rounds is not None
        t = 0
        for t in range(1, rounds + 1):
            if fixed_rounds is None and ced.limit(1).count() == 0:
                converged = True
                t -= 1
                break
            cand = ced.select(
                F.col("ca").alias("c"), F.col("cb").alias("oc"), "w", "a", "b"
            ).unionByName(
                ced.select(
                    F.col("cb").alias("c"), F.col("ca").alias("oc"), "w", "a", "b"
                )
            )
            chosen = eager_checkpoint(
                cand.groupBy("c")
                .agg(F.min(F.struct("w", "a", "b", "oc")).alias("m"))
                .select(
                    "c",
                    F.col("m.oc").alias("oc"),
                    F.col("m.w").alias("w"),
                    F.col("m.a").alias("a"),
                    F.col("m.b").alias("b"),
                )
            )
            # materialize before chosen's checkpoint blocks are released
            forests.append(
                eager_checkpoint(chosen.select("a", "b", "w").distinct())
            )
            parent = _merge_parents(chosen, jumps)
            pmap = parent.withColumnRenamed("c", "comp")
            labels_new = eager_checkpoint(
                labels.join(pmap, "comp", "left")
                .select("node", F.coalesce("p", "comp").alias("comp"))
            )
            ced_new = eager_checkpoint(
                ced.join(pmap.withColumnRenamed("comp", "ca"), "ca", "left")
                .select(
                    F.coalesce("p", "ca").alias("ca"), "cb", "w", "a", "b"
                )
                .join(pmap.withColumnRenamed("comp", "cb"), "cb", "left")
                .select(
                    "ca", F.coalesce("p", "cb").alias("cb"), "w", "a", "b"
                )
                .where(F.col("ca") != F.col("cb"))
                # collapse parallel contracted edges: only the per-pair
                # minimum can ever be chosen, and the shuffle shrinks
                .groupBy(
                    F.least("ca", "cb").alias("ca"),
                    F.greatest("ca", "cb").alias("cb"),
                )
                .agg(F.min(F.struct("w", "a", "b")).alias("m"))
                .select(
                    "ca",
                    "cb",
                    F.col("m.w").alias("w"),
                    F.col("m.a").alias("a"),
                    F.col("m.b").alias("b"),
                )
                .repartition(num_partitions, "ca")
            )
            for old in (ced, labels, chosen, parent):
                release_local_checkpoint(old)
            ced, labels = ced_new, labels_new

        if forests:
            forest = forests[0]
            for f in forests[1:]:
                forest = forest.unionByName(f)
            forest = forest.distinct()
        else:
            forest = spark.createDataFrame([], "a long, b long, w long")
    return MSFResult(forest, labels, t, converged)
