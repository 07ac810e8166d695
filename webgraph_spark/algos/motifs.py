"""Small-motif counting beyond triangles: common-neighbor pair counts
(co-citation / bibliographic coupling), exact 4-cycle counting, and arc
reciprocity.

Beyond-reference operators (SURVEY.md §2.12): the reference's motif
surface is triangle counting via EF ``skipTo`` intersection
(EFGraph.java:1064-1160); link-graph practitioners also use co-citation
and coupling matrices (the SALSA/HITS neighborhoods,
algos/spectral.py) as similarity signals, and 4-cycle (rectangle)
counts as the bipartite-community analog of triangles.

Scale posture:
- Common-neighbor pair generation is a self-join on the shared endpoint:
  a center of degree d yields C(d, 2) pairs, so the wedge volume is
  sum_x d(x)^2 — hub-dominated. ``max_center_degree`` excludes centers
  above the cap BEFORE the join (one semi-join against a degree table);
  the result is then exact over the retained centers, which is the
  documented contract (same posture as the LSH ``max_bucket`` guard in
  functions/dedup.py). With the cap unset the count is exact.
- The pair aggregation keys on (a, b) — uniform unless the graph has a
  dominant co-citation pair; map-side combine collapses duplicates.
- 4-cycle counting needs each unordered pair's common-neighbor count
  once: quads = sum_pairs C(cn, 2) / 2 (each rectangle is counted by
  both of its diagonals). All arithmetic is exact int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import no_loops, symmetrize


def _centered_pairs(
    ends: DataFrame, max_center_degree: int | None
) -> DataFrame:
    """(a, b, center) for every unordered endpoint pair a < b sharing a
    center; ``ends`` has columns (center, leaf)."""
    if max_center_degree is not None:
        deg = (
            ends.groupBy("center")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") <= max_center_degree)
            .select("center")
        )
        ends = ends.join(deg, "center", "left_semi")
    a = ends.select("center", F.col("leaf").alias("a"))
    b = ends.select("center", F.col("leaf").alias("b"))
    return a.join(b, "center").where(F.col("a") < F.col("b"))


def common_neighbor_counts(
    edges: DataFrame,
    mode: str = "cocitation",
    min_count: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """(a, b, common) for node pairs a < b with ``common`` shared
    neighbors.

    mode="cocitation": common IN-neighbors (x -> a and x -> b; the
    SALSA authority-similarity matrix A^T A off-diagonal).
    mode="coupling": common OUT-neighbors (a -> x and b -> x;
    bibliographic coupling, A A^T).
    mode="undirected": common neighbors in the symmetrized simple graph
    (the 4-cycle diagonal counts).

    Arcs are deduplicated and loops dropped first, so ``common`` counts
    distinct shared neighbors. Pairs with fewer than ``min_count`` shared
    neighbors are omitted (the all-pairs matrix is quadratically dense at
    1; min_count >= 2 is the useful similarity regime at scale).
    """
    e = no_loops(edges.select("src", "dst").distinct())
    if mode == "cocitation":
        # center = the citing node x (src); leaves = the cited pair
        ends = e.select(F.col("src").alias("center"), F.col("dst").alias("leaf"))
    elif mode == "coupling":
        ends = e.select(F.col("dst").alias("center"), F.col("src").alias("leaf"))
    elif mode == "undirected":
        und = no_loops(symmetrize(edges))
        ends = und.select(F.col("src").alias("center"), F.col("dst").alias("leaf"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    pairs = _centered_pairs(ends, max_center_degree)
    out = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    if min_count > 1:
        out = out.where(F.col("common") >= min_count)
    return out


def quad_count(edges: DataFrame, max_center_degree: int | None = None) -> int:
    """Exact number of 4-cycles in the symmetrized simple graph.

    quads = sum over unordered pairs (a, b) of C(cn(a, b), 2) / 2:
    a rectangle a-x-b-y is identified by either diagonal pair — (a, b)
    with common {x, y}, or (x, y) with common {a, b} — so the pair sum
    double-counts exactly. With ``max_center_degree`` set the count is
    exact over wedges centered at retained nodes (documented undercount;
    see module docstring)."""
    cn = common_neighbor_counts(
        edges, mode="undirected", max_center_degree=max_center_degree
    )
    row = cn.agg(
        F.sum(F.col("common") * (F.col("common") - 1) / 2).alias("s")
    ).collect()[0]
    s = row["s"] or 0
    q, r = divmod(int(s), 2)
    if max_center_degree is None:
        assert r == 0, "diagonal double-count must be even on exact counts"
    return q


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row (arcs, mutual_arcs, reciprocity): the fraction of simple
    non-loop arcs whose reverse arc is also present (Stats-style global
    scalar; the reference reports symmetry as a boolean check,
    Check.java — this is the graded version)."""
    e = no_loops(edges.select("src", "dst").distinct()).persist()
    mutual = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
        "left_semi",
    )
    out = e.agg(F.count("*").alias("arcs")).crossJoin(
        mutual.agg(F.count("*").alias("mutual_arcs"))
    ).select(
        F.col("arcs").cast("long"),
        F.col("mutual_arcs").cast("long"),
        F.round(F.col("mutual_arcs") / F.col("arcs"), 6).alias("reciprocity"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out
