"""Spectral link-analysis ranks: HITS (hubs/authorities) and Katz.

Reference analog: the LAW rank family shipped alongside webgraph
(it.unimi.dsi.law.rank — PageRank, KatzParallelGaussSeidel, HITS/SALSA
style spectral ranks; SURVEY.md §2.10 lists PageRank as the mandated
member). Both are power iterations over the same edge table as
:mod:`.pagerank`, with the identical scale posture: out/in-degree
denormalized once, ranks hash-partitioned on node id, one
co-partitioned shuffle_hash join + one map-side-combined groupBy per
direction per iteration, no Python in the loop.

Determinism/oracle notes: fixed iteration counts and float64
expressions written identically in the SQL twins
(graph/testdata.py:hits_sql, katz_sql); HITS normalizes by the L1 sum
of each vector (not L2) so the oracle needs no SQRT ulp analysis —
the principal direction is the same, only the scaling convention
differs from textbook L2 (documented divergence).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .pagerank import _prepare


@dataclass
class HitsResult:
    scores: DataFrame  # (node, hub, authority)
    iterations: int


def hits(
    edges: DataFrame,
    iterations: int = 8,
    num_partitions: int | None = None,
) -> HitsResult:
    """Synchronous HITS: ``a <- A^T h``, ``h <- A a``, each L1-normalized
    after its update. Returns both scores per node."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").repartition(num_partitions, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(num_partitions, "node")
        .persist()
    )
    n = nodes.count()
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).localCheckpoint(eager=True)

    from ..plans.iterate import release_local_checkpoint

    for _ in range(iterations):
        # authority update: sum of hub scores over in-arcs, L1-normalize
        a_new = (
            e.join(
                state.select(F.col("node").alias("src"), "hub").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        st1 = (
            state.join(a_new.hint("shuffle_hash"), "node", "left")
            .select(
                "node", "hub", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
            )
        )
        a_sum = st1.agg(F.sum("a_raw")).collect()[0][0] or 1.0
        st1 = st1.select(
            "node", "hub", (F.col("a_raw") / F.lit(a_sum)).alias("auth")
        )
        # hub update: sum of authority scores over out-arcs, L1-normalize
        h_new = (
            e.join(
                st1.select(F.col("node").alias("dst"), "auth").hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        st2 = (
            st1.join(h_new.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                "auth",
            )
        )
        h_sum = st2.agg(F.sum("h_raw")).collect()[0][0] or 1.0
        new_state = st2.select(
            "node", (F.col("h_raw") / F.lit(h_sum)).alias("hub"), "auth"
        ).localCheckpoint(eager=True)
        release_local_checkpoint(state)
        state = new_state

    e.unpersist()
    nodes.unpersist()
    return HitsResult(
        state.select("node", "hub", F.col("auth").alias("authority")),
        iterations,
    )


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Truncated Katz series ``x_{k+1} = β + α·A^T x_k`` (x_0 = β),
    i.e. x = Σ_{k≤iters} β·α^k·(A^T)^k·1 — each node scores its
    α-discounted in-walk count. α must be < 1/λ_max for the full series
    to converge; the truncated form is always finite and is what the
    SQL twin unrolls."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").repartition(num_partitions, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(num_partitions, "node")
        .persist()
    )
    from ..plans.iterate import release_local_checkpoint

    x = nodes.select("node", F.lit(float(beta)).alias("x")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        walked = (
            e.join(
                x.select(F.col("node").alias("src"), "x").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("x").alias("w"))
        )
        new_x = (
            nodes.join(walked.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("w", F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(x)
        x = new_x
    e.unpersist()
    nodes.unpersist()
    return x.select("node", F.col("x").alias("katz"))
