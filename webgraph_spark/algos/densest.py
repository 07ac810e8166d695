"""Densest subgraph via batched greedy peeling (Bahmani–Kumar–Vassilvitskii,
VLDB 2012 — the MapReduce formulation of Charikar's greedy 2-approx).

The reference ships no densest-subgraph extraction, but it is the
standard dense-community primitive for link graphs (spam-farm / clique
detection, hub-cluster extraction) and sits naturally above the k-core
peel (algos/kcore.py): instead of peeling to a fixed degree threshold,
each round removes every node whose degree is at most ``2(1+eps)``
times the current average density and remembers the densest snapshot
seen. Each round removes at least an ``eps/(1+eps)`` fraction of the
live nodes, so rounds ≤ log_{1+eps}(n); the result is a (2+2eps)
approximation of the maximum-density subgraph.

Everything is EXACT INTEGER arithmetic so the unrolled-SQL oracle twin
(graph/testdata.py:densest_sql) matches bit-for-bit: with eps = 1/2 the
peel test is ``deg * n <= 3 * m`` and the best-snapshot argmax compares
``m_t * n_best > m_best * n_t`` (cross-multiplied rationals, ties keep
the earlier round). No floats anywhere until the final reported
density.

Scale posture: one degree aggregation over the (shrinking) live edge
set per round; the peel test needs only the scalar (n, m) pair, carried
as an Observation on the materializing action. State is the live edge
table itself — no per-node auxiliaries survive a round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F

from ..operators.transforms import no_loops, symmetrize
from ..plans.iterate import (
    eager_checkpoint,
    iteration_confs,
    release_local_checkpoint,
)


@dataclass
class DensestResult:
    nodes: DataFrame  # (node: long) members of the densest snapshot
    n_nodes: int
    m_edges: int  # undirected edge count of the snapshot
    density: float  # m_edges / n_nodes
    best_round: int  # 0 = the full graph was densest
    rounds: int


def densest_subgraph(
    edges: DataFrame,
    max_rounds: int = 64,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> DensestResult:
    """Greedy-peel densest subgraph of the undirected simple view of
    ``edges(src, dst)`` (eps = 1/2: peel test ``deg * n <= 3 * m``).

    ``fixed_rounds`` pins the synchronous schedule for the unrolled-SQL
    oracle twin; rounds after the live set empties are no-ops, so a
    fixed schedule that drains the graph returns the identical result.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with iteration_confs(spark):
        sym = no_loops(symmetrize(edges.select("src", "dst")))
        live = eager_checkpoint(sym.repartition(num_partitions, "src"))
        # snapshots[t] = (n_t, m_t, live-edge frame); snapshot 0 = full graph
        snaps: list[tuple[int, int, DataFrame]] = []

        def stats(e: DataFrame) -> tuple[int, int]:
            row = e.agg(
                F.count("*").alias("arcs"),
                F.count_distinct("src").alias("n"),
            ).first()
            return int(row["n"]), int(row["arcs"]) // 2  # sym stores both arcs

        n, m = stats(live)
        snaps.append((n, m, live))
        rounds = fixed_rounds if fixed_rounds is not None else max_rounds
        t = 0
        for t in range(1, rounds + 1):
            n, m, live = snaps[-1]
            if n == 0:
                if fixed_rounds is None:
                    t -= 1
                    break
                snaps.append((0, 0, live))
                continue
            deg = live.groupBy("src").agg(F.count("*").alias("deg"))
            keep = deg.where(F.col("deg") * F.lit(n) > F.lit(3 * m)).select(
                "src"
            )
            live_new = eager_checkpoint(
                live.join(keep.hint("shuffle_hash"), "src")
                .join(
                    keep.withColumnRenamed("src", "dst").hint("shuffle_hash"),
                    "dst",
                )
                .select("src", "dst")
                .repartition(num_partitions, "src")
            )
            n2, m2 = stats(live_new)
            snaps.append((n2, m2, live_new))
            if fixed_rounds is None and n2 == 0:
                break

        # exact-rational argmax of m_t / n_t, earlier round wins ties;
        # empty snapshots (n=0) never beat the (non-empty) full graph
        bi, bn, bm = 0, snaps[0][0], snaps[0][1]
        for i, (ni, mi, _) in enumerate(snaps):
            if ni > 0 and mi * bn > bm * ni:
                bi, bn, bm = i, ni, mi
        best_nodes = snaps[bi][2].select(F.col("src").alias("node")).distinct()
        best_nodes = eager_checkpoint(best_nodes)
        for i, (_, _, frame) in enumerate(snaps):
            release_local_checkpoint(frame)
    return DensestResult(
        best_nodes,
        bn,
        bm,
        (bm / bn) if bn else 0.0,
        bi,
        t,
    )
