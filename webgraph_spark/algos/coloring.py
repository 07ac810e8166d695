"""Distributed greedy graph coloring (Jones-Plassmann 1993).

The reference ships no coloring, but it is the other canonical
symmetry-breaking primitive (next to Luby MIS, algos/mis.py) a
distributed link-graph engine needs: conflict-free update scheduling
(color classes are independent sets, so all nodes of one color can be
processed concurrently), register allocation over interference graphs,
and round-robin partitioning of near-dup clusters.

Jones-Plassmann round: every still-uncolored node holds a FIXED random
priority; a node colors itself the moment every higher-priority
neighbour is already colored, picking the minimum excludant (mex) of
its colored neighbours' colors. Expected O(log n / log log n) rounds on
bounded-degree graphs and O(log n) whp in general — each round is one
max-aggregation over the (monotonically shrinking) live edge set plus
one mex aggregation over frontier-adjacent colored arcs. Colors are at
most degeneracy+1 in the greedy order, never worse than max-degree+1.

Determinism: the priority is the engine-portable
``md5_long('jp:' || node)`` with the node id as tiebreak, so the entire
coloring is a pure function of the graph, and the unrolled-SQL oracle
(graph/testdata.py:coloring_sql) replays it bit-for-bit. Rounds past
the fixpoint are no-ops (the live set is empty), so a fixed schedule
that reaches the fixpoint returns the exact coloring — same pattern as
algos/mis.py / algos/msf.py.

Scale posture: the frontier max-priority probe shuffles only live
arcs (shrinking every round); the mex step joins the full symmetric
arc table against the FRONTIER (small) then against the colored map,
deduplicating to distinct (node, color) pairs before the collect_set
so hub rows carry at most #distinct-neighbour-colors elements (bounded
by the final color count, tens, not by hub degree). No per-row Python
anywhere — the mex itself is a JVM higher-order-function expression.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import md5_long
from ..operators.transforms import no_loops, symmetrize
from ..plans.iterate import (
    eager_checkpoint,
    iteration_confs,
    release_local_checkpoint,
)


@dataclass
class ColoringResult:
    colors: DataFrame  # (node: long, color: int, round: int)
    rounds: int
    converged: bool  # False only if max_rounds hit with live nodes left


# mex of a non-empty distinct color set: sort ascending, first index
# where sorted[i] != i is the gap; no gap -> size (the next color).
_MEX = (
    "coalesce(get(filter(zip_with(array_sort(cols),"
    " sequence(0, size(cols) - 1),"
    " (c, i) -> named_struct('c', c, 'i', i)),"
    " s -> s.c != s.i), 0).i, size(cols))"
)


def jp_coloring(
    edges: DataFrame,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> ColoringResult:
    """Greedy coloring of the undirected simple view of
    ``edges(src, dst)`` (symmetrized, loops dropped; isolated nodes get
    color 0 in round 1). Returns one row per node: its color and the
    round it was assigned.

    ``fixed_rounds`` pins the synchronous schedule for the unrolled-SQL
    oracle twin; default mode iterates until every node is colored.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with iteration_confs(spark):
        sym = eager_checkpoint(
            no_loops(symmetrize(edges.select("src", "dst")))
            .repartition(num_partitions, "src")
        )
        pri = eager_checkpoint(
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
            .select(
                "node",
                md5_long(
                    F.concat(F.lit("jp:"), F.col("node").cast("string"))
                ).alias("p"),
            )
        )
        live = pri
        live_edges = sym
        colored = spark.createDataFrame([], "node long, color int, round int")
        rounds = fixed_rounds if fixed_rounds is not None else max_rounds
        converged = fixed_rounds is not None
        t = 0
        for t in range(1, rounds + 1):
            if fixed_rounds is None and live.limit(1).count() == 0:
                converged = True
                t -= 1
                break
            # max live-neighbour (p, node) per live node: one shuffle
            # over the shrinking live arc set, map-side combined
            hm = (
                live_edges.join(
                    live.select(
                        F.col("node").alias("dst"), F.col("p").alias("_pd")
                    ).hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("node"))
                .agg(
                    F.max(
                        F.struct(F.col("_pd").alias("p"), F.col("dst").alias("n"))
                    ).alias("mx")
                )
            )
            frontier = eager_checkpoint(
                live.join(hm, "node", "left")
                .where(
                    F.col("mx").isNull()  # isolated-or-all-nbrs-colored
                    | (
                        F.struct(F.col("p").alias("p"), F.col("node").alias("n"))
                        > F.col("mx")
                    )
                )
                .select("node")
            )
            # mex over the frontier's colored neighbourhood: frontier is
            # small, colored arcs dedup to distinct (node, color) first
            nbrcol = (
                sym.join(frontier.withColumnRenamed("node", "src"), "src")
                .join(
                    colored.select(
                        F.col("node").alias("dst"), F.col("color").alias("_c")
                    ),
                    "dst",
                )
                .select(F.col("src").alias("node"), F.col("_c").alias("color"))
                .distinct()
                .groupBy("node")
                .agg(F.collect_set("color").alias("cols"))
            )
            newly = frontier.join(nbrcol, "node", "left").select(
                "node",
                F.when(F.col("cols").isNull(), F.lit(0))
                .otherwise(F.expr(_MEX))
                .cast("int")
                .alias("color"),
                F.lit(t).cast("int").alias("round"),
            )
            colored_new = eager_checkpoint(colored.unionByName(newly))
            live_new = eager_checkpoint(live.join(frontier, "node", "left_anti"))
            live_edges_new = eager_checkpoint(
                live_edges.join(
                    frontier.withColumnRenamed("node", "src"), "src", "left_anti"
                )
                .join(
                    frontier.withColumnRenamed("node", "dst"), "dst", "left_anti"
                )
                .select("src", "dst")
                .repartition(num_partitions, "src")
            )
            for old in (colored, live, live_edges, frontier):
                # sym is read by every round's mex join (and pri is the
                # initial live) — never release the shared base frames
                if old is sym or old is pri:
                    continue
                release_local_checkpoint(old)
            colored, live, live_edges = colored_new, live_new, live_edges_new

    return ColoringResult(colored, t, converged)


def speculative_coloring(
    edges: DataFrame,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> ColoringResult:
    """Speculative greedy coloring (Gonzalez et al. 2011 posture): every
    still-live node simultaneously picks the mex of its already-FINAL
    neighbours' colors; adjacent same-pick nodes conflict and the
    smaller ``(priority, node)`` endpoint re-queues for the next round.
    The (p, node)-max live node always wins all its conflicts, so at
    least one node finalizes per round; in practice almost all picks
    survive and rounds stay near-constant — unlike synchronous
    Jones-Plassmann (above) whose round count is the longest
    decreasing-priority path (measured 128+ on the dense part-supplier
    layer of the sf0.01 link graph, vs 8 for this variant).

    Same determinism contract as :func:`jp_coloring`: fixed md5
    priorities, rounds past the fixpoint are no-ops, unrolled-SQL twin
    in graph/testdata.py:coloring_sql.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with iteration_confs(spark):
        sym = eager_checkpoint(
            no_loops(symmetrize(edges.select("src", "dst")))
            .repartition(num_partitions, "src")
        )
        pri = eager_checkpoint(
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
            .select(
                "node",
                md5_long(
                    F.concat(F.lit("jp:"), F.col("node").cast("string"))
                ).alias("p"),
            )
        )
        live = pri
        colored = spark.createDataFrame([], "node long, color int, round int")
        rounds = fixed_rounds if fixed_rounds is not None else max_rounds
        converged = fixed_rounds is not None
        t = 0
        for t in range(1, rounds + 1):
            if fixed_rounds is None and live.limit(1).count() == 0:
                converged = True
                t -= 1
                break
            # each live node's pick: mex over FINAL neighbour colors
            nbrcol = (
                sym.join(
                    live.select(F.col("node").alias("src")).hint("shuffle_hash"),
                    "src",
                )
                .join(
                    colored.select(
                        F.col("node").alias("dst"), F.col("color").alias("_c")
                    ),
                    "dst",
                )
                .select(F.col("src").alias("node"), F.col("_c").alias("color"))
                .distinct()
                .groupBy("node")
                .agg(F.collect_set("color").alias("cols"))
            )
            picks = eager_checkpoint(
                live.join(nbrcol, "node", "left").select(
                    "node",
                    "p",
                    F.when(F.col("cols").isNull(), F.lit(0))
                    .otherwise(F.expr(_MEX))
                    .cast("int")
                    .alias("pick"),
                )
            )
            # conflicts: live-live arcs whose endpoints picked the same
            # color; the smaller (p, node) endpoint loses and re-queues
            losers = (
                sym.join(
                    picks.select(
                        F.col("node").alias("src"),
                        F.col("p").alias("_pa"),
                        F.col("pick").alias("_ca"),
                    ).hint("shuffle_hash"),
                    "src",
                )
                .join(
                    picks.select(
                        F.col("node").alias("dst"),
                        F.col("p").alias("_pb"),
                        F.col("pick").alias("_cb"),
                    ).hint("shuffle_hash"),
                    "dst",
                )
                .where(
                    (F.col("_ca") == F.col("_cb"))
                    & (
                        F.struct(F.col("_pa").alias("p"), F.col("src").alias("n"))
                        < F.struct(F.col("_pb").alias("p"), F.col("dst").alias("n"))
                    )
                )
                .select(F.col("src").alias("node"))
                .distinct()
            )
            winners = picks.join(losers, "node", "left_anti")
            colored_new = eager_checkpoint(
                colored.unionByName(
                    winners.select(
                        "node",
                        F.col("pick").alias("color"),
                        F.lit(t).cast("int").alias("round"),
                    )
                )
            )
            live_new = eager_checkpoint(
                live.join(
                    winners.select("node"), "node", "left_anti"
                ).repartition(num_partitions, "node")
            )
            for old in (colored, live, picks):
                if old is sym or old is pri:
                    continue
                release_local_checkpoint(old)
            colored, live = colored_new, live_new

    return ColoringResult(colored, t, converged)
