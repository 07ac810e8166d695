"""Level-synchronous parallel BFS as iterative frontier joins.

Reference: ParallelBreadthFirstVisit.java:44-110 — level-synchronous
visit with a CAS-guarded visited marker and per-level queue cutpoints.
In the Spark dataflow the job boundary IS the level barrier
(SURVEY.md §4), the CAS is replaced by deterministic min/anti-join
semantics, and the frontier/visited sets are DataFrames.

Returns per-node distances; eccentricity and the exact neighbourhood
function (NeighbourhoodFunction.java:70-130 — the test-scale oracle for
HyperBall) derive from them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..plans.iterate import release_local_checkpoint


@dataclass
class BFSResult:
    distances: DataFrame  # (node: long, dist: int) — reached nodes only
    rounds: int


def bfs(
    edges: DataFrame,
    sources: DataFrame | list[int],
    max_rounds: int = 10_000,
    num_partitions: int | None = None,
) -> BFSResult:
    """Multi-source BFS over directed ``edges(src, dst)``."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").repartition(num_partitions, "src").persist()

    if isinstance(sources, list):
        sources = spark.createDataFrame([(int(s),) for s in sources], "node long")
    frontier = sources.select("node").distinct().persist()
    visited = frontier.select("node", F.lit(0).alias("dist")).persist()
    visited.count()

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .persist()
        )
        if nxt.isEmpty():
            nxt.unpersist()
            rounds -= 1
            break
        # cut the frontier's plan so the PREVIOUS visited checkpoint can
        # be released below (otherwise the frontier lazily references it)
        nxt_ck = nxt.localCheckpoint(eager=True)
        nxt.unpersist()
        new_visited = visited.unionByName(
            nxt_ck.select("node", F.lit(rounds).alias("dist"))
        ).persist()
        new_visited = new_visited.localCheckpoint(eager=True)
        visited.unpersist()
        frontier.unpersist()
        # level k-1's visited/frontier checkpoint blocks are garbage now;
        # without release, storage grows O(rounds * n) across the loop
        release_local_checkpoint(visited)
        release_local_checkpoint(frontier)
        visited = new_visited
        frontier = nxt_ck
    e.unpersist()
    return BFSResult(visited, rounds)


def eccentricity(edges: DataFrame, source: int) -> int:
    """max distance from source over reached nodes (examples/BreadthFirst)."""
    res = bfs(edges, [source])
    return res.distances.agg(F.max("dist")).collect()[0][0]


def neighbourhood_function_exact(edges: DataFrame, max_t: int = 50) -> list[int]:
    """Exact NF(t) = number of pairs (x, y) with d(x, y) <= t, computed by
    per-source BFS (NeighbourhoodFunction.java:44-49: O(n m), 'very small
    graphs only' — used as the HyperBall test oracle)."""
    nodes = [
        r["node"]
        for r in edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .collect()
    ]
    counts: dict[int, int] = {}
    for s in nodes:
        d = bfs(edges, [int(s)]).distances.groupBy("dist").count().collect()
        for row in d:
            counts[row["dist"]] = counts.get(row["dist"], 0) + row["count"]
    out = []
    acc = 0
    for t in range(0, max_t + 1):
        acc += counts.get(t, 0)
        out.append(acc)
        if t > 0 and counts.get(t, 0) == 0 and acc >= sum(counts.values()):
            break
    return out
