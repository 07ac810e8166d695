"""Landmark distance sketches (distance-oracle family).

Pick the L highest-degree nodes as landmarks, BFS from all of them at
once on the symmetrized loop-free graph, and store each node's
distance vector as L int columns. ``d(u,v)`` is then estimated without
any traversal as ``min_i d(u, l_i) + d(l_i, v)`` — an upper bound that
is exact whenever a shortest path passes a landmark, the classic
landmark/ALT scheme (Goldberg-Harrelson A* landmarks, SODA 2005;
Potamias et al., "Fast shortest path distance estimation in large
networks", CIKM 2009).

Reference analog: the distance machinery family of SURVEY.md §2.10
(ParallelBreadthFirstVisit / SampleDistanceCDF — algos/bfs.py,
centrality.py). Webgraph users compute distance CDFs by sampling
sources; the landmark sketch is the companion that answers *pairwise*
queries at 100-TB scale, where per-query BFS is impossible: the sketch
is built once with L batched BFS waves (L small, e.g. 16-64) and each
estimate is a row-local array expression — no shuffle at query time.

Scale shape: one batched multi-source BFS (frontier rows ≤ L·n,
the per-round join is co-partitioned on src) + one groupBy(node)
pivot to the wide vector. Landmark selection is a top-L over the
degree table (tiny, driver-collected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import no_loops, symmetrize
from .centrality import multi_source_bfs


def top_degree_landmarks(edges: DataFrame, n_landmarks: int) -> list[int]:
    """The L max-sym-degree nodes, ties broken by min node id —
    deterministic at any parallelism (total order on (deg, node))."""
    sym = no_loops(symmetrize(edges.select("src", "dst")))
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    rows = (
        deg.orderBy(F.col("d").desc(), F.col("src").asc())
        .limit(n_landmarks)
        .collect()
    )
    return [int(r["src"]) for r in rows]


def landmark_sketch(
    edges: DataFrame,
    n_landmarks: int = 3,
    max_depth: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, d0, d1, ..., d{L-1}): undirected distance to each
    landmark, null when unreached within ``max_depth``. Column ``di``
    is the i-th landmark in (degree DESC, node ASC) order."""
    lms = top_degree_landmarks(edges, n_landmarks)
    sym = no_loops(symmetrize(edges.select("src", "dst")))
    dists = multi_source_bfs(
        sym, lms, max_rounds=max_depth, num_partitions=num_partitions
    )
    spark = edges.sparkSession
    lm_idx = spark.createDataFrame(
        [(int(l), i) for i, l in enumerate(lms)], "source long, li int"
    )
    tagged = dists.join(F.broadcast(lm_idx), "source")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    wide = tagged.groupBy("node").agg(
        *[
            F.min(F.when(F.col("li") == i, F.col("dist")))
            .cast("int")
            .alias(f"d{i}")
            for i in range(n_landmarks)
        ]
    )
    return nodes.join(wide, "node", "left")


def estimate_distances(sketch: DataFrame, pairs: DataFrame) -> DataFrame:
    """Row-local landmark estimate for (u, v) pairs:
    d_hat = min_i sk(u).di + sk(v).di over landmarks both ends reach.
    Null when no landmark covers both — the honest "unknown". No
    shuffle beyond the two sketch joins (broadcast when pairs small)."""
    dcols = [c for c in sketch.columns if c != "node"]
    su = sketch.select(
        F.col("node").alias("u"), *[F.col(c).alias(f"u_{c}") for c in dcols]
    )
    sv = sketch.select(
        F.col("node").alias("v"), *[F.col(c).alias(f"v_{c}") for c in dcols]
    )
    est = F.least(
        *[(F.col(f"u_{c}") + F.col(f"v_{c}")).cast("int") for c in dcols]
    )
    return (
        pairs.join(su, "u").join(sv, "v")
        .select("u", "v", est.alias("d_hat"))
    )
