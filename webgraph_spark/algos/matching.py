"""Maximal matching via distributed handshaking (Israeli–Itai 1986
posture), and the 2-approximate minimum vertex cover it induces.

The reference has no matching surface, but a maximal matching is the
pairing primitive a link-graph / training-data engine wants: one-to-one
alignment of near-duplicate documents (pair each doc with at most one
partner from the LSH pair graph of functions/dedup.py), conflict-free
edge scheduling, and matched-node removal as a graph coarsening step —
and its matched-endpoint set is the textbook 2-approximation of minimum
vertex cover.

Each round every live node points at its minimum-priority live incident
edge (one map-side-combined ``groupBy(node).min(struct)`` over the
shrinking live edge set); an edge whose BOTH endpoints picked it — a
handshake — enters the matching, and matched nodes leave with all their
edges. At least the handshake edges disappear every round and the
winner edge per live component always handshakes (the globally minimum
edge among a node's neighbourhood is picked from both sides), so the
live edge set strictly shrinks; O(log m) rounds in expectation.

Determinism: edge priorities are the engine-portable
``md5_long('mm{k}:' || a || ':' || b)`` (functions/hashing.py) with the
canonical (a, b) tiebreak, so the matching is a pure function of the
graph and the unrolled-SQL oracle (graph/testdata.py:matching_sql)
replays it bit-for-bit. Rounds past the fixpoint are no-ops — same
fixed-schedule-twin pattern as algos/msf.py and algos/mis.py.
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
class MatchingResult:
    matching: DataFrame  # (a: long, b: long, round: int) a < b, disjoint
    rounds: int
    converged: bool  # False only if max_rounds hit with live edges left


def maximal_matching(
    edges: DataFrame,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> MatchingResult:
    """Maximal matching of the undirected simple view of
    ``edges(src, dst)`` (loops dropped).

    ``fixed_rounds`` pins the synchronous schedule for the unrolled-SQL
    oracle twin; default mode iterates until the live edge set drains.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with iteration_confs(spark):
        und = (
            no_loops(edges.select("src", "dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .distinct()
        )
        live = eager_checkpoint(und.repartition(num_partitions, "a"))
        matched_parts: list[DataFrame] = []
        rounds = fixed_rounds if fixed_rounds is not None else max_rounds
        converged = fixed_rounds is not None
        t = 0
        for t in range(1, rounds + 1):
            if fixed_rounds is None and live.limit(1).count() == 0:
                converged = True
                t -= 1
                break
            pri = live.select(
                "a",
                "b",
                md5_long(
                    F.concat(
                        F.lit(f"mm{t}:"),
                        F.col("a").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ).alias("p"),
            )
            cand = pri.select(F.col("a").alias("node"), "p", "a", "b").unionByName(
                pri.select(F.col("b").alias("node"), "p", "a", "b")
            )
            picks = (
                cand.groupBy("node")
                .agg(
                    F.min(
                        F.struct(
                            F.col("p").alias("p"),
                            F.col("a").alias("a"),
                            F.col("b").alias("b"),
                        )
                    ).alias("m")
                )
                .select(
                    "node",
                    F.col("m.a").alias("a"),
                    F.col("m.b").alias("b"),
                )
            )
            # handshake: the edge both its endpoints picked
            shakes = eager_checkpoint(
                picks.groupBy("a", "b")
                .agg(F.count("*").alias("c"))
                .where(F.col("c") == 2)
                .select("a", "b", F.lit(t).alias("round"))
            )
            matched_parts.append(shakes)
            gone = (
                shakes.select(F.col("a").alias("node"))
                .unionByName(shakes.select(F.col("b").alias("node")))
            )
            live_new = eager_checkpoint(
                live.join(
                    gone.withColumnRenamed("node", "a"), "a", "left_anti"
                )
                .join(gone.withColumnRenamed("node", "b"), "b", "left_anti")
                .select("a", "b")
                .repartition(num_partitions, "a")
            )
            release_local_checkpoint(live)
            live = live_new

        if matched_parts:
            m = matched_parts[0]
            for s in matched_parts[1:]:
                m = m.unionByName(s)
        else:
            m = spark.createDataFrame([], "a long, b long, round int")
    return MatchingResult(m, t, converged)


def vertex_cover_2approx(edges: DataFrame, **kw) -> DataFrame:
    """Matched endpoints of a maximal matching — the classic 2-approx of
    minimum vertex cover: every edge has a matched endpoint (else the
    matching wasn't maximal), and any cover needs one node per matched
    edge. Returns (node)."""
    m = maximal_matching(edges, **kw).matching
    return (
        m.select(F.col("a").alias("node"))
        .unionByName(m.select(F.col("b").alias("node")))
        .distinct()
    )
