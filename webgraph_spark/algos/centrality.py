"""Geometric centralities via batched multi-source BFS.

Reference: GeometricCentralities.java:44-63 computes exact closeness /
harmonic / Lin / exponential centralities by per-source BFS over a
thread pool; SampleDistanceCumulativeDistributionFunction.java:25-32
samples sources for the distance CDF. The Spark shape batches all
sources into ONE frontier DataFrame keyed by (source, node): each
round expands every source's frontier simultaneously — n_sources
parallel BFS for the price of one shuffle per level.

Exact and all-pairs at fixture scale; at corpus scale use sampled
sources (distance CDF) or HyperBall (algos/hyperball.py) — the same
split the reference makes (NeighbourhoodFunction O(nm) oracle vs
HyperBall estimator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.iterate import release_local_checkpoint


def multi_source_bfs(
    edges: DataFrame,
    sources: DataFrame | list[int],
    max_rounds: int = 10_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distances from every source: (source, node, dist)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").distinct().repartition(num_partitions, "src").persist()
    if isinstance(sources, list):
        sources = spark.createDataFrame([(int(s),) for s in sources], "source long")
    frontier = sources.select("source", F.col("source").alias("node")).distinct()
    visited = frontier.select("source", "node", F.lit(0).alias("dist"))
    visited = visited.localCheckpoint(eager=True)
    frontier = visited.select("source", "node")

    for rounds in range(1, max_rounds + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select("source", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("source", "node"), ["source", "node"], "left_anti")
        )
        nxt = nxt.persist()
        nxt_ck = nxt.localCheckpoint(eager=True)
        nxt.unpersist()
        if nxt_ck.isEmpty():
            break
        grown = visited.unionByName(
            nxt_ck.select("source", "node", F.lit(rounds).alias("dist"))
        ).persist()
        new_visited = grown.localCheckpoint(eager=True)
        grown.unpersist()
        # round k-1's visited/frontier blocks are garbage once the new
        # visited materialized (both are plan-cut LogicalRDDs); release
        # deterministically instead of growing storage O(rounds * n)
        release_local_checkpoint(visited)
        release_local_checkpoint(frontier)
        visited = new_visited
        frontier = nxt_ck
    e.unpersist()
    return visited


def geometric_centralities(
    edges: DataFrame, sources: DataFrame | list[int] | None = None
) -> DataFrame:
    """(source, reachable, closeness, harmonic, lin) — exact values per
    source node (GeometricCentralities contract):

    - closeness = 1 / sum of distances (0 if nothing reachable);
    - harmonic  = sum of 1/d over reachable y != x;
    - lin       = reachable^2 / sum of distances (1 for isolated).
    """
    spark = edges.sparkSession
    if sources is None:
        sources = (
            edges.select(F.col("src").alias("source"))
            .unionByName(edges.select(F.col("dst").alias("source")))
            .distinct()
        )
    dists = multi_source_bfs(edges, sources)
    agg = dists.where(F.col("dist") > 0).groupBy("source").agg(
        F.count("*").alias("reached"),
        F.sum("dist").alias("sum_d"),
        F.sum(1.0 / F.col("dist")).alias("harmonic"),
    )
    src_df = dists.select("source").distinct()
    return src_df.join(agg, "source", "left").select(
        "source",
        (F.coalesce("reached", F.lit(0)) + 1).alias("reachable"),
        F.when(F.col("sum_d").isNull(), 0.0)
        .otherwise(1.0 / F.col("sum_d"))
        .alias("closeness"),
        F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
        F.when(F.col("sum_d").isNull(), 1.0)
        .otherwise(
            F.pow(F.coalesce("reached", F.lit(0)) + 1, 2) / F.col("sum_d")
        )
        .alias("lin"),
    )


def nf_exact(edges: DataFrame) -> DataFrame:
    """Exact neighbourhood function: (t, nf_exact) with nf_exact =
    #pairs (x, y), x possibly = y, at distance <= t — ONE batched
    multi-source BFS from every node (NeighbourhoodFunction.java:44-49
    semantics without the per-source driver loop). All-pairs closure:
    test/oracle scale, the same split the reference makes."""
    nodes = (
        edges.select(F.col("src").alias("source"))
        .unionByName(edges.select(F.col("dst").alias("source")))
        .distinct()
    )
    dists = multi_source_bfs(edges, nodes)
    hist = dists.groupBy("dist").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        F.col("dist").cast("long").alias("t"),
        F.sum("c").over(w).cast("long").alias("nf_exact"),
    )


def distance_cdf(edges: DataFrame, sample_sources: list[int]) -> DataFrame:
    """Sampled distance CDF: (dist, n_pairs, cum_pairs) over the sampled
    sources (SampleDistanceCumulativeDistributionFunction analog)."""
    from pyspark.sql import Window

    dists = multi_source_bfs(edges, sample_sources)
    hist = dists.groupBy("dist").agg(F.count("*").alias("n_pairs"))
    w = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "dist", "n_pairs", F.sum("n_pairs").over(w).alias("cum_pairs")
    )
