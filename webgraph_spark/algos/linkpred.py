"""Link-prediction scores over candidate node pairs.

Classic neighborhood-overlap measures (public: Liben-Nowell & Kleinberg
2003): common-neighbor count, Jaccard overlap, Adamic-Adar. Not a
reference operator — added as first-class graph analytics a link-graph
user expects next to triangles/cc.

Scale shape: candidate pairs join the symmetrized adjacency twice on the
shared-neighbor key — the wedge join the triangle counter already uses,
co-partitioned on the neighbor id; degrees ride a broadcastable
aggregate. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import simplify


def link_prediction_scores(
    edges: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Score ``pairs(a, b)`` on the simplified graph: returns
    (a, b, common, jaccard, adamic_adar); pairs with zero common
    neighbours keep a row with zeros (the candidate set is the caller's
    contract — scores must not silently drop candidates)."""
    sym = simplify(edges)
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    na = sym.select(F.col("src").alias("a"), F.col("dst").alias("x"))
    nb = sym.select(F.col("src").alias("b"), F.col("dst").alias("x"))
    wedges = (
        pairs.join(na, "a")
        .join(nb, ["b", "x"])
        .join(deg.select(F.col("src").alias("x"), F.col("deg").alias("dx")), "x")
    )
    # per-wedge AA terms rounded then summed in DECIMAL: exact,
    # order-independent addition, so both engines agree regardless of
    # aggregation order (same posture as HyperBall's NF sums)
    aa_term = F.round(F.lit(1.0) / F.log(F.col("dx")), 9).cast("decimal(38,9)")
    sc = wedges.groupBy("a", "b").agg(
        F.count("*").alias("common"),
        F.sum(aa_term).cast("double").alias("_aa"),
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("_db"))
    return (
        pairs.join(sc, ["a", "b"], "left")
        .join(da, "a", "left")
        .join(db, "b", "left")
        .select(
            "a",
            "b",
            F.coalesce("common", F.lit(0)).cast("long").alias("common"),
            F.round(
                F.coalesce(
                    F.col("common")
                    / (F.col("_da") + F.col("_db") - F.col("common")),
                    F.lit(0.0),
                ),
                6,
            ).alias("jaccard"),
            F.round(F.coalesce("_aa", F.lit(0.0)), 6).alias("adamic_adar"),
        )
    )
