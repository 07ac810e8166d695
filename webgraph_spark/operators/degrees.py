"""Degree statistics and distributions (Stats.java:49-66 analog).

``outdegrees()``/indegree distribution of the reference become plain
groupBy aggregations; results are small DataFrames suitable for a
metrics table sink."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def out_degrees(edges: DataFrame, include_zero_for: DataFrame | None = None) -> DataFrame:
    """(node, outdeg); optionally densified over a node set so nodes with
    no out-arcs report 0 (the reference iterates all 0..n-1 nodes)."""
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    if include_zero_for is not None:
        deg = include_zero_for.select("node").join(deg, "node", "left").select(
            "node", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
        )
    return deg


def in_degrees(edges: DataFrame, include_zero_for: DataFrame | None = None) -> DataFrame:
    """(node, indeg) — degree view of the transpose."""
    deg = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("indeg"))
    if include_zero_for is not None:
        deg = include_zero_for.select("node").join(deg, "node", "left").select(
            "node", F.coalesce("indeg", F.lit(0)).alias("indeg")
        )
    return deg


def degree_distribution(edges: DataFrame, direction: str = "out") -> DataFrame:
    """Histogram of degrees: (degree, n_nodes) — Stats' out/indegree
    distribution files."""
    col = "src" if direction == "out" else "dst"
    return (
        edges.groupBy(F.col(col).alias("node"))
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("degree")
    )


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row property summary (the .properties/Stats sink analog):
    nodes, arcs, loops, min/max/avg degree, dangling count."""
    e = edges.select("src", "dst")
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    out_d = e.groupBy("src").agg(F.count("*").alias("d"))
    stats = out_d.agg(
        F.min("d").alias("minoutdegree"),
        F.max("d").alias("maxoutdegree"),
        F.avg("d").alias("avgoutdegree_nonzero"),
    )
    n = nodes.count()
    m = e.count()
    loops = e.where(F.col("src") == F.col("dst")).count()
    dangling = n - out_d.count()
    row = stats.withColumns(
        {
            "nodes": F.lit(n),
            "arcs": F.lit(m),
            "loops": F.lit(loops),
            "dangling": F.lit(dangling),
        }
    )
    return row.select(
        "nodes", "arcs", "loops", "dangling", "minoutdegree", "maxoutdegree",
        "avgoutdegree_nonzero",
    )
