"""Exact global triangle count by degree-ordered intersection.

Mandated by the north rule. The reference's intersection primitive is
the Elias-Fano ``skipTo`` on sorted successor lists
(EFGraph.java:1064-1160, LazyIntSkippableIterator.java:27-44); the
standard distributed equivalent is degree orientation + two equi-joins:

1. undirected simple edge set, each edge kept once;
2. orient u->v iff (deg(u), u) < (deg(v), v) — every intermediate wedge
   is rooted at its LOWEST-degree vertex, bounding wedge counts (this is
   the hub-skew control: a degree-d hub only ever closes wedges, it
   never generates d^2 of them);
3. wedges = oriented x oriented on the middle vertex; triangles = wedges
   semi-joined against oriented edges.

Two shuffle joins total; exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import no_loops, symmetrize


def _oriented(edges: DataFrame) -> DataFrame:
    """Degree-ordered orientation of the simple undirected graph."""
    und = no_loops(symmetrize(edges))  # both directions present, no loops
    deg = und.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    e = (
        und.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "sdeg")
        .join(
            deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg")), "dst"
        )
    )
    return e.where(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def triangle_count(edges: DataFrame) -> int:
    """Exact number of triangles in the symmetrized simple graph."""
    o = _oriented(edges).persist()
    # skew guard: a max-degree hub appears as dst in millions of oriented
    # arcs but has NO outgoing oriented arcs (it lost every degree
    # comparison), so arcs ending in such sinks can never extend to a
    # wedge — semi-join them away BEFORE the join instead of shipping
    # them into one straggler partition
    mid_candidates = o.select(F.col("src").alias("dst")).distinct()
    e1 = o.join(mid_candidates, "dst", "left_semi")
    wedges = (
        e1.alias("e1")
        .join(
            o.select(F.col("src").alias("mid"), F.col("dst").alias("w")).alias("e2"),
            F.col("e1.dst") == F.col("mid"),
        )
        .select(F.col("e1.src").alias("u"), F.col("w"))
    )
    n = (
        wedges.join(
            o.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            ["u", "w"],
            "left_semi",
        ).count()
    )
    o.unpersist()
    return int(n)


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(node, triangles) — per-vertex triangle participation counts
    (local clustering numerator). Same plan, but each closed wedge
    credits its three corners via an explode-free triple union."""
    o = _oriented(edges).persist()
    mid_candidates = o.select(F.col("src").alias("dst")).distinct()
    e1 = o.join(mid_candidates, "dst", "left_semi")
    wedges = (
        e1.alias("e1")
        .join(
            o.select(F.col("src").alias("mid"), F.col("dst").alias("w")).alias("e2"),
            F.col("e1.dst") == F.col("mid"),
        )
        .select(F.col("e1.src").alias("u"), F.col("mid").alias("v"), F.col("w"))
    )
    closed = wedges.join(
        o.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_semi",
    ).persist()
    per = (
        closed.select(F.col("u").alias("node"))
        .unionAll(closed.select(F.col("v").alias("node")))
        .unionAll(closed.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
        # materialize through the caches so they can be released here
        # (the count path unpersists; this path used to leak both)
        .localCheckpoint(eager=True)
    )
    closed.unpersist()
    o.unpersist()
    return per


def doulion_estimate(edges: DataFrame, k: int = 4) -> tuple[int, int, float]:
    """DOULION sparsified triangle estimate (Tsourakakis et al. KDD'09):
    keep each canonical undirected edge {a, b} with probability 1/k —
    here DETERMINISTICALLY, iff ``md5_long('dl:' a ':' b) mod k == 0``,
    the engine-portable data-keyed coin every sketch in this repo uses
    — count triangles exactly on the sparsified graph, and scale by
    k^3 (each triangle survives with probability 1/k^3).

    This is the scale path when even the degree-oriented exact count
    (:func:`triangle_count`) is too heavy: sparsifying at 1/k cuts the
    wedge-join input by ~k and its output by ~k^2. Variance is the
    paper's bound (concentrated for k ≪ m^{1/3}); the estimate is
    unbiased over the hash family. Returns (kept_edges,
    triangles_sampled, estimate = triangles_sampled * k^3).
    """
    from ..functions.hashing import md5_long

    pairs = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    kept = pairs.where(
        md5_long(
            F.concat_ws(
                ":",
                F.lit("dl"),
                F.col("a").cast("string"),
                F.col("b").cast("string"),
            )
        )
        % k
        == 0
    ).persist()
    n_kept = kept.count()
    tri = triangle_count(kept.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    kept.unpersist()
    return n_kept, tri, float(tri * k**3)
