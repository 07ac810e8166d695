"""Local clustering: personalized-PageRank conductance sweep
(Andersen–Chung–Lang FOCS 2006 posture, dataflow formulation).

The reference has no community-extraction surface, but seed-anchored
local clusters are the standard link-graph notion of "the community
around these pages" — and the sweep is a natural window-function
dataflow: order nodes by ppr/degree, then every prefix's conductance
falls out of two prefix sums (volume, and internal-edge count) over
that order:

    cut(S_k)  =  Σ_{i<=k} deg(v_i)  −  2 · Σ_{i<=k} e_i
    φ(S_k)    =  cut(S_k) / min(vol(S_k), vol(V) − vol(S_k))

where ``e_i`` counts v_i's neighbours ranked before it. cut/vol are
exact integers; φ is one IEEE double division of the same two integers
on any engine, so the unrolled-SQL twin (graph/testdata.py:
local_cluster_sql) matches bit-for-bit. The PPR scores are rounded to 9
decimals BEFORE ordering — the same cross-engine float contract the
green PPR oracle query already relies on.

Scale posture: the sweep is restricted to the top ``max_candidates``
nodes by score (the ACL cluster is local by construction; sweeping the
whole graph is neither needed nor meaningful), so the global-order
window runs on a bounded frame. Everything before it — PPR, degrees,
the earlier-neighbour counts — is ordinary partitioned dataflow.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.transforms import no_loops, symmetrize
from .pagerank import personalized_pagerank


@dataclass
class SweepResult:
    members: DataFrame  # (node: long, sweep_rank: int) the best prefix
    k: int  # size of the best prefix
    conductance: float
    sweep: DataFrame  # (sweep_rank, node, cut, vol, phi) full sweep table


def ppr_sweep(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    alpha: float = 0.85,
    max_candidates: int = 300,
    num_partitions: int | None = None,
) -> SweepResult:
    """Best-conductance PPR sweep cut around ``seeds(node)`` over the
    undirected simple view of ``edges(src, dst)``."""
    pr = personalized_pagerank(
        edges, seeds, alpha=alpha, fixed_iterations=iters,
        num_partitions=num_partitions,
    ).ranks.select("node", F.round("rank", 9).alias("rank"))

    sym = no_loops(symmetrize(edges.select("src", "dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    total_vol = sym.count()  # Σ deg = 2m

    cand = (
        pr.join(deg, "node")
        .where(F.col("rank") > 0)
        .select("node", "deg", (F.col("rank") / F.col("deg")).alias("score"))
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(max_candidates)
    )
    w = Window.orderBy(F.desc("score"), F.asc("node"))
    ranked = cand.select(
        "node", "deg", "score", F.row_number().over(w).alias("sweep_rank")
    ).persist()

    # e_i: neighbours of node i ranked strictly before it
    ra = ranked.select(F.col("node").alias("dst"), "sweep_rank")
    rb = ranked.select(
        F.col("node").alias("src"), F.col("sweep_rank").alias("nbr_rank")
    )
    earlier = (
        sym.join(ra, "dst")
        .join(rb, "src")
        .where(F.col("nbr_rank") < F.col("sweep_rank"))
        .groupBy("sweep_rank")
        .agg(F.count("*").alias("e"))
    )
    wp = Window.orderBy("sweep_rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = (
        ranked.join(earlier, "sweep_rank", "left")
        .select(
            "sweep_rank",
            "node",
            "deg",
            F.coalesce("e", F.lit(0)).alias("e"),
        )
        .select(
            "sweep_rank",
            "node",
            (F.sum("deg").over(wp) - 2 * F.sum("e").over(wp)).alias("cut"),
            F.sum("deg").over(wp).alias("vol"),
        )
        .withColumn(
            "phi",
            F.col("cut")
            / F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")),
        )
        .where(
            F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")) > 0
        )
    ).persist()

    best = sweep.orderBy(F.asc("phi"), F.asc("sweep_rank")).limit(1).first()
    if best is None:
        spark = edges.sparkSession
        empty = spark.createDataFrame([], "node long, sweep_rank int")
        return SweepResult(empty, 0, 0.0, sweep)
    members = sweep.where(
        F.col("sweep_rank") <= F.lit(int(best["sweep_rank"]))
    ).select("node", "sweep_rank")
    ranked.unpersist()
    return SweepResult(
        members, int(best["sweep_rank"]), float(best["phi"]), sweep
    )
