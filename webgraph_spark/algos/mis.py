"""Maximal independent set via Luby's algorithm (Luby 1986).

The reference ships no MIS, but it is the canonical symmetry-breaking
primitive a distributed link-graph engine needs (scheduling conflicting
updates, landmark selection, coloring seeds, diversity sampling over a
similarity graph — pick mutually non-adjacent documents from the
near-dup pair graph of functions/dedup.py).

Luby's round is pure dataflow: every live node draws a deterministic
priority, enters the MIS iff it beats every live neighbour, and
winners+their neighbours leave the live set. Expected O(log n) rounds;
each round is one groupBy min over the live edge set (which shrinks
monotonically) — no per-node state beyond the live/selected flags.

Determinism: the round-k priority is the engine-portable
``md5_long('mis{k}:' || node)`` (functions/hashing.py) with the node id
as tiebreak, so the selected set is a pure function of the graph and
the unrolled-SQL oracle (graph/testdata.py:mis_sql) replays it
bit-for-bit. Rounds past the fixpoint are no-ops (the live set is
empty), so a fixed schedule that reaches the fixpoint returns the exact
MIS — same pattern as algos/msf.py.
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
class MISResult:
    selected: DataFrame  # (node: long, round: int) MIS members
    rounds: int
    converged: bool  # False only if max_rounds hit with live nodes left


def _priority(col, k: int):
    """Engine-portable round-k priority (ties broken by node id in the
    comparison tuple, not here — md5 collisions are the only ties)."""
    return md5_long(F.concat(F.lit(f"mis{k}:"), col.cast("string")))


def luby_mis(
    edges: DataFrame,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> MISResult:
    """Maximal independent set of the undirected simple view of
    ``edges(src, dst)`` (symmetrized, loops dropped; a node whose only
    arc is a self-loop is treated as isolated and always selected).

    ``fixed_rounds`` pins the synchronous schedule for the unrolled-SQL
    oracle twin; default mode iterates until the live set drains.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with iteration_confs(spark):
        sym = no_loops(symmetrize(edges.select("src", "dst")))
        live_edges = eager_checkpoint(sym.repartition(num_partitions, "src"))
        live_nodes = eager_checkpoint(
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        selected_parts: list[DataFrame] = []
        rounds = fixed_rounds if fixed_rounds is not None else max_rounds
        converged = fixed_rounds is not None
        t = 0
        for t in range(1, rounds + 1):
            if fixed_rounds is None and live_nodes.limit(1).count() == 0:
                converged = True
                t -= 1
                break
            pri = live_nodes.select(
                "node", _priority(F.col("node"), t).alias("p")
            )
            # min neighbour priority per live node: one shuffle over the
            # (shrinking) live edge set, map-side combined
            nbr_min = (
                live_edges.join(
                    pri.withColumnRenamed("node", "src").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.min(
                        F.struct(F.col("p").alias("p"), F.col("src").alias("n"))
                    ).alias("nm")
                )
            )
            winners = eager_checkpoint(
                pri.join(nbr_min, "node", "left")
                .where(
                    F.col("nm").isNull()  # isolated live node
                    | (
                        F.struct(
                            F.col("p").alias("p"), F.col("node").alias("n")
                        )
                        < F.col("nm")
                    )
                )
                .select("node", F.lit(t).alias("round"))
            )
            selected_parts.append(winners)
            # removed = winners + their live neighbours
            removed = winners.select("node").unionByName(
                live_edges.join(
                    winners.withColumnRenamed("node", "src"), "src"
                ).select(F.col("dst").alias("node"))
            ).distinct()
            live_nodes_new = eager_checkpoint(
                live_nodes.join(removed, "node", "left_anti")
            )
            keep = live_nodes_new.select(F.col("node"))
            live_edges_new = eager_checkpoint(
                live_edges.join(
                    keep.withColumnRenamed("node", "src"), "src"
                )
                .join(keep.withColumnRenamed("node", "dst"), "dst")
                .select("src", "dst")
                .repartition(num_partitions, "src")
            )
            for old in (live_nodes, live_edges):
                release_local_checkpoint(old)
            live_nodes, live_edges = live_nodes_new, live_edges_new

        if selected_parts:
            sel = selected_parts[0]
            for s in selected_parts[1:]:
                sel = sel.unionByName(s)
        else:
            sel = spark.createDataFrame([], "node long, round int")
    return MISResult(sel, t, converged)
