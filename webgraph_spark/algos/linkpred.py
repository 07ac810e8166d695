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


def _decay_literals(decay: float, length: int) -> list[str]:
    """decay^t for t = 1..length as 12-decimal strings — embedded as
    IDENTICAL literals in the Spark plan and the SQL twin, so no libm
    pow() is evaluated in either engine (pow(double, double) may differ
    by 1 ulp across math libraries; a shared literal cannot)."""
    return [f"{decay ** t:.12f}" for t in range(1, length + 1)]


def simrank_fingerprint(
    edges: DataFrame,
    n_walks: int = 8,
    length: int = 4,
    decay: float = 0.5,
    k: int = 20,
    max_bucket: int = 64,
    round_to: int = 9,
) -> DataFrame:
    """Fingerprint SimRank (Fogaras & Racz, WWW'05 "Scaling link-based
    similarity search"): s(a, b) is estimated as the expected
    decay^(first meeting time) of coupled REVERSE random walks from a
    and b — the Monte-Carlo estimator of SimRank's recursive
    definition, the scalable alternative to the O(n^2 d^2) exact
    iteration.

    Deterministic end to end: walk r of every node takes the
    md5-seeded reverse walk (:func:`webgraph_spark.algos.walks.
    random_walks` on the transposed graph), so the DuckDB twin replays
    the identical trajectories; decay^t enters both plans as shared
    12-decimal literals summed as DECIMAL (no float pow, no
    order-sensitive sum); ties in the final top-k break by (a, b).

    Meetings: walks with the same walk index r standing on the same
    node at the same step. Per (r, step, node) bucket only the
    ``max_bucket`` lowest walker ids pair up — a hub where thousands
    of walks coincide would otherwise create a quadratic pair blowup;
    the cap is part of the operator contract (replayed by the twin),
    exactly like the LSH hub-bucket cap. Estimate: for each pair the
    FIRST meeting step t_r per walk index contributes decay^t_r; the
    score is sum_r(decay^t_r) / n_walks.

    Scale posture: the fingerprint table is n_walks x length x n rows
    built in ``length`` co-partitioned frontier joins; meetings are
    one groupBy-window over (r, step, node) + one bucket-bounded
    self-join; nothing is all-pairs. Returns top-k
    (a, b, sim double).
    """
    from pyspark.sql import Window

    from ..operators.transforms import transpose
    from .walks import random_walks

    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    walks = random_walks(
        transpose(edges.select("src", "dst")), nodes,
        length=length, n_walks=n_walks,
    ).where(F.col("step") >= 1)
    pos = walks.select(
        (F.col("walk_id") % n_walks).alias("r"),
        # integer div, not floor(float /): walk ids can exceed 2^53
        F.expr(f"walk_id div {n_walks}").cast("long").alias("wnode"),
        "step",
        "node",
    )
    wb = Window.partitionBy("r", "step", "node").orderBy("wnode")
    capped = pos.withColumn("_rn", F.row_number().over(wb)).where(
        F.col("_rn") <= max_bucket
    )
    a = capped.select("r", "step", "node", F.col("wnode").alias("a"))
    b = capped.select("r", "step", "node", F.col("wnode").alias("b"))
    meet = (
        a.join(b, ["r", "step", "node"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "r")
        .agg(F.min("step").alias("t"))
    )
    lits = _decay_literals(decay, length)
    contrib = F.col("t")
    expr = None
    for t in range(1, length + 1):
        branch = F.lit(lits[t - 1]).cast("decimal(24,12)")
        expr = (
            F.when(contrib == t, branch)
            if expr is None
            else expr.when(contrib == t, branch)
        )
    scored = (
        meet.select("a", "b", expr.alias("c"))
        .groupBy("a", "b")
        .agg(
            F.round(
                F.sum("c").cast("double") / F.lit(float(n_walks)), round_to
            ).alias("sim")
        )
    )
    return (
        scored.orderBy(F.col("sim").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(k)
    )


def simrank_fingerprint_sql(
    edges_cte: str,
    n_walks: int = 8,
    length: int = 4,
    decay: float = 0.5,
    k: int = 20,
    max_bucket: int = 64,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`simrank_fingerprint`. ``edges_cte`` must
    define ``edges(src, dst)``; the walk block runs on the transposed
    view via :func:`webgraph_spark.algos.walks.random_walks_sql`."""
    from .walks import random_walks_sql

    wsql = random_walks_sql(length=length, n_walks=n_walks,
                            edges_table="edges_t")
    # random_walks_sql returns "<ctes>,\nwalks AS (...)\nSELECT ..." —
    # keep only its CTE block
    cte_block = wsql[: wsql.rindex("\nSELECT")]
    lits = _decay_literals(decay, length)
    cases = " ".join(
        f"WHEN t = {t} THEN CAST('{lits[t - 1]}' AS DECIMAL(24,12))"
        for t in range(1, length + 1)
    )
    return f"""
WITH {edges_cte},
edges_t AS (SELECT dst AS src, src AS dst FROM edges),
wsrc AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
{cte_block},
pos AS MATERIALIZED (
  SELECT walk_id % {n_walks} AS r,
         walk_id // {n_walks} AS wnode, step, node
  FROM walks WHERE step >= 1),
capped AS MATERIALIZED (
  SELECT r, step, node, wnode FROM (
    SELECT r, step, node, wnode,
           ROW_NUMBER() OVER (PARTITION BY r, step, node
                              ORDER BY wnode) AS rn
    FROM pos) t WHERE rn <= {max_bucket}),
meet AS MATERIALIZED (
  SELECT x.wnode AS a, y.wnode AS b, x.r, MIN(x.step) AS t
  FROM capped x JOIN capped y
    ON x.r = y.r AND x.step = y.step AND x.node = y.node
   AND x.wnode < y.wnode
  GROUP BY x.wnode, y.wnode, x.r),
scored AS (
  SELECT a, b,
         ROUND(CAST(SUM(CASE {cases} END) AS DOUBLE)
               / {float(n_walks)}, {round_to}) AS sim
  FROM meet GROUP BY a, b)
SELECT a, b, sim FROM scored
ORDER BY sim DESC, a ASC, b ASC LIMIT {k}
"""
