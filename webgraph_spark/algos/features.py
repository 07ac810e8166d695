"""Neighborhood feature aggregation — the message-passing layer of a
GNN (GraphSAGE mean aggregator) as a pure DataFrame plan.

Beyond-reference operator (SURVEY.md §2.12): graph-ML feature
propagation over a node-feature table, the standard preprocessing /
embedding-smoothing step for training pipelines that pair a link graph
with per-node embedding columns.

Physical plan per hop (scale rationale):
- features are POSEXPLODEd to (node, pos, val) rows — dim× the row
  count but UNIFORM keys and scalar rows, instead of shipping whole
  arrays into hub groups (a 10^7-in-degree hub under collect_list
  would make one giant row; under (dst, pos) it makes dim ordinary
  groups);
- messages = edges ⋈ exploded features on src (one shuffle keyed by
  src, co-partitioned with the edge table's layout);
- mean = groupBy(dst, pos).avg with map-side partial aggregation (hub
  skew collapses in the combiner, exactly like PageRank's contrib sum);
- reassembly = groupBy(node) array_sort(collect_list(struct(pos,val)))
  over exactly ``dim`` rows per node — bounded rows, never hub-sized.

self_weight folds the node's own layer-h vector into the mean (the
"GCN-style" variant); hops > 1 stacks layers by re-running the same
plan on the aggregated output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def neighborhood_mean_features(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 1,
    id_col: str = "id",
    vec_col: str = "vec",
    direction: str = "in",
    include_self: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """(node, vec) — per-node elementwise mean of neighbor feature
    vectors, ``hops`` layers deep.

    direction="in": node aggregates from its in-neighbors (sources of
    arcs pointing at it — PageRank message direction); "out" aggregates
    from successors. Nodes with no contributing neighbors keep their own
    vector (identity fallback, so stacking layers never drops nodes).
    ``round_to`` rounds components on the FINAL layer only (cross-engine
    comparison; intermediate layers stay full float64).
    """
    if direction == "in":
        msg_edges = edges.select(F.col("src").alias("from"), F.col("dst").alias("to"))
    elif direction == "out":
        msg_edges = edges.select(F.col("dst").alias("from"), F.col("src").alias("to"))
    else:
        raise ValueError(f"unknown direction {direction!r}")
    state = features.select(
        F.col(id_col).alias("node"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    for h in range(hops):
        exploded = state.select(
            "node", F.posexplode("vec").alias("pos", "val")
        )
        msgs = msg_edges.join(
            exploded.withColumnRenamed("node", "from"), "from"
        ).select(F.col("to").alias("node"), "pos", "val")
        if include_self:
            msgs = msgs.unionByName(exploded)
        # Order-independent exact mean: messages quantized to integer
        # 1e-9 units and summed as LONG (float SUM order varies with
        # partitioning/engine and can flip the final ROUND — seen at
        # sf0.001; a first fix summed DECIMAL(38,9) but BigDecimal per
        # message cost 6x wall time at sf0.1). The rounded mean is then
        # computed entirely in integers — sign * ((2|s| + d) div (2d)),
        # d = cnt * 10^(9-round_to) — i.e. HALF_UP without ever
        # dividing in float, because s/(cnt*1e9) lands EXACTLY on .5
        # boundaries whenever cnt divides the sum pattern, and Spark's
        # BigDecimal-HALF_UP vs DuckDB's float round disagree there.
        # Quantizing the INPUT with round(val*1e9) has no such hazard:
        # raw doubles hit exact halves with probability ~0, and
        # second-hop inputs are integer multiples of 1e-6 whose
        # product with 1e9 is integral. Overflow bound: in-degree *
        # |val| < 9e9 per (node, pos) — fine below ~1e9-degree hubs.
        dval = F.round(F.col("val") * F.lit(1e9), 0).cast("long")
        agg = msgs.groupBy("node", "pos").agg(
            F.sum(dval).alias("s"), F.count("*").alias("cnt")
        )
        is_last = h == hops - 1
        if round_to is not None and is_last:
            q = F.when(F.col("s") < 0, F.lit(-1)).otherwise(F.lit(1)) * F.expr(
                f"(2 * abs(s) + cnt * {10 ** (9 - round_to)}) "
                f"div (2 * cnt * {10 ** (9 - round_to)})"
            )
            agg = agg.select(
                "node",
                "pos",
                (q.cast("double") / F.lit(float(10**round_to))).alias("val"),
            )
        else:
            agg = agg.select(
                "node",
                "pos",
                (
                    F.col("s").cast("double")
                    / (F.col("cnt").cast("double") * F.lit(1e9))
                ).alias("val"),
            )
        assembled = agg.groupBy("node").agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "val"))
            ).alias("_pv")
        ).select(
            "node",
            F.transform(F.col("_pv"), lambda s: s["val"]).alias("vec"),
        )
        # identity fallback for nodes that received no messages
        fallback = state.join(assembled.select("node"), "node", "left_anti")
        if round_to is not None and is_last:
            fallback = fallback.select(
                "node",
                F.transform(
                    "vec", lambda v: F.round(v, round_to) + F.lit(0.0)
                ).alias("vec"),
            )
        state = assembled.unionByName(fallback)
    return state


def neighborhood_mean_sql(
    edges_cte: str,
    features_table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    direction: str = "in",
    include_self: bool = False,
    round_to: int = 6,
    node_mod: int | None = None,
) -> str:
    """DuckDB twin of one :func:`neighborhood_mean_features` hop.

    ``edges_cte`` must define ``edges(src, dst)``; ``node_mod`` maps
    graph node ids onto the feature id space via ``node % node_mod``
    (the driver query's deterministic pairing of the TPC-H graph with
    the embedding table).

    The twin emits EXPLODED rows (node, pos, val) — scalar cells hash
    deterministically across engines, arrays do not; the driver query
    explodes the Spark output the same way."""
    frm, to = ("src", "dst") if direction == "in" else ("dst", "src")
    mod = f" % {node_mod}" if node_mod else ""
    self_union = (
        "UNION ALL SELECT node, pos, val FROM ex" if include_self else ""
    )
    return f"""
WITH {edges_cte},
me AS (SELECT DISTINCT {frm}{mod} AS f, {to}{mod} AS t FROM edges),
ex AS MATERIALIZED (
  SELECT {id_col} AS node,
         generate_subscripts({vec_col}, 1) - 1 AS pos,
         CAST(unnest({vec_col}) AS DOUBLE) AS val
  FROM {features_table}
),
msgs AS (
  SELECT me.t AS node, ex.pos, ex.val FROM me JOIN ex ON ex.node = me.f
  {self_union}
),
agg AS MATERIALIZED (
  -- scaled-long exact sum + all-integer HALF_UP mean: order-free and
  -- boundary-free, mirrors neighborhood_mean_features bit-for-bit
  SELECT node, pos,
         CAST(CASE WHEN s < 0
              THEN -(((-2 * s) + cnt * {10 ** (9 - round_to)})
                     // (2 * cnt * {10 ** (9 - round_to)}))
              ELSE ((2 * s + cnt * {10 ** (9 - round_to)})
                    // (2 * cnt * {10 ** (9 - round_to)}))
         END AS DOUBLE) / {float(10 ** round_to)} AS val
  FROM (
    SELECT node, pos,
           SUM(CAST(ROUND(val * 1000000000.0, 0) AS BIGINT)) AS s,
           COUNT(*) AS cnt
    FROM msgs GROUP BY node, pos) g
)
SELECT node, CAST(pos AS BIGINT) AS pos, val FROM agg
UNION ALL
SELECT e.node, CAST(e.pos AS BIGINT) AS pos,
       ROUND(e.val, {round_to}) + 0.0 AS val
FROM ex e WHERE e.node NOT IN (SELECT node FROM agg)
"""


WL_P = (1 << 31) - 1  # Mersenne modulus for the commutative multiset hash


def wl_refinement(
    edges: DataFrame,
    iters: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """1-dimensional Weisfeiler-Lehman color refinement over the
    undirected simple view of ``edges(src, dst)``: iterated node
    relabeling ``label_t(v) = H(label_{t-1}(v), multiset of neighbour
    labels)``, the canonical structural-role fingerprint (WL kernels,
    GNN expressivity baseline, symmetry detection).

    The neighbour multiset is hashed COMMUTATIVELY — sum of
    ``md5_long('wl:' || label) mod P`` (P = 2^31-1) plus the count —
    instead of sorting a per-node label array, so a 10^7-degree hub
    contributes through a map-side-combined SUM like any PageRank
    contrib, never a hub-sized collect_list row. Terms are < 2^31 and
    int64 sums stay exact below degree 2^32, so the result is
    bit-identical in any engine (DuckDB twin: :func:`wl_sql`); modular
    multiset collisions can only MERGE classes (never split), are
    ~n^2/2P improbable, and are shared by both engines by construction.

    Initial color = symmetric degree. Returns ``(node, wl)`` with the
    final 60-bit label; equal labels after t rounds = t-hop
    WL-indistinguishable.
    """
    from ..functions.hashing import md5_long
    from ..operators.transforms import no_loops, symmetrize

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sym = (
        no_loops(symmetrize(edges.select("src", "dst")))
        .repartition(num_partitions, "dst")
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("_d")
    )
    labels = nodes.join(deg, "node", "left").select(
        "node", F.coalesce("_d", F.lit(0)).cast("long").alias("wl")
    )
    for _ in range(iters):
        msum = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("wl").alias("_l")
                ).hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                (
                    F.sum(
                        md5_long(
                            F.concat(F.lit("wl:"), F.col("_l").cast("string"))
                        )
                        % F.lit(WL_P)
                    )
                    % F.lit(WL_P)
                ).alias("_s"),
                F.count("*").alias("_c"),
            )
        )
        labels = labels.join(msum, "node", "left").select(
            "node",
            md5_long(
                F.concat_ws(
                    ":",
                    F.col("wl").cast("string"),
                    F.coalesce(F.col("_s"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("_c"), F.lit(0)).cast("string"),
                )
            ).alias("wl"),
        )
        labels = labels.localCheckpoint()
    sym.unpersist()
    return labels


def wl_sql(iters: int = 3) -> str:
    """DuckDB twin CTE block for :func:`wl_refinement`: caller's WITH
    must already define ``sym`` and ``nodes``; selects (node, wl)."""
    parts = ["""
l0 AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(d.d, 0) AS BIGINT) AS wl
  FROM nodes n LEFT JOIN (
    SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src) d
  ON n.node = d.node)"""]
    h = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
    for t in range(1, iters + 1):
        hterm = h.format(x="'wl:' || CAST(l.wl AS VARCHAR)")
        parts.append(f"""
m{t} AS MATERIALIZED (
  SELECT e.src AS node,
         CAST(SUM({hterm} % 2147483647) % 2147483647 AS BIGINT) AS s,
         COUNT(*) AS c
  FROM sym e JOIN l{t - 1} l ON l.node = e.dst
  GROUP BY e.src)"""
        )
        hl = h.format(
            x=(
                "CAST(p.wl AS VARCHAR) || ':' || CAST(COALESCE(m.s, 0) AS VARCHAR)"
                " || ':' || CAST(COALESCE(m.c, 0) AS VARCHAR)"
            )
        )
        parts.append(f"""
l{t} AS MATERIALIZED (
  SELECT p.node, {hl} AS wl
  FROM l{t - 1} p LEFT JOIN m{t} m ON p.node = m.node)""")
    return ",".join(parts) + f"""
SELECT node, wl FROM l{iters}"""


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient curve phi(k) (Zhou-Mondragon 2004; Colizza
    et al. 2006 give the normalized variant — this is the raw phi, the
    normalizer being a caller-supplied rewired baseline).

    For every degree value k observed in the simple (symmetrized,
    loop-free) graph: n_rich = #nodes with degree > k, rich_arcs =
    #sym arcs with BOTH endpoint degrees > k, and
    phi = rich_arcs / (n_rich * (n_rich - 1)) — the density of the
    subgraph induced by the rich nodes (sym arcs count each direction,
    matching the n*(n-1) ordered-pair denominator). Null phi when
    fewer than 2 rich nodes remain.

    Scale shape: everything reduces to TWO degree histograms —
    per-node degree and per-arc min-endpoint-degree — then suffix sums
    over the merged histogram. The joins/groupBys are ordinary keyed
    shuffles with map-side combine; the final window runs on the
    histogram only (cardinality = distinct degree values, O(sqrt(m))
    in practice), so the single-partition window is driver-trivial at
    any graph size. No induced-subgraph materialization per k.

    Reference analog: degree-distribution family of SURVEY.md §2.5
    (operators/degrees.py) — this is its two-point correlation
    companion, like graph_assortativity.
    """
    from pyspark.sql import Window

    from ..operators.transforms import simplify

    sym = simplify(edges.select("src", "dst"))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    am = (
        sym.join(deg.withColumnRenamed("deg", "dj"), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dk")),
            "dst",
        )
        .select(F.least("dj", "dk").alias("val"))
    )
    nh = deg.groupBy(F.col("deg").alias("val")).agg(
        F.count("*").alias("n_at")
    )
    ah = am.groupBy("val").agg(F.count("*").alias("a_at"))
    vals = (
        nh.join(ah, "val", "full_outer")
        .select(
            "val",
            F.coalesce("n_at", F.lit(0)).alias("n_at"),
            F.coalesce("a_at", F.lit(0)).alias("a_at"),
        )
    )
    w = (
        Window.orderBy(F.desc("val"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.select(
        "val",
        "n_at",
        F.coalesce(F.sum("n_at").over(w), F.lit(0)).alias("n_gt"),
        F.coalesce(F.sum("a_at").over(w), F.lit(0)).alias("a_gt"),
    )
    return cum.where(F.col("n_at") > 0).select(
        F.col("val").cast("long").alias("k"),
        F.col("n_gt").cast("long").alias("n_rich"),
        F.col("a_gt").cast("long").alias("rich_arcs"),
        F.when(
            F.col("n_gt") >= 2,
            F.round(
                F.col("a_gt").cast("double")
                / (F.col("n_gt") * (F.col("n_gt") - F.lit(1))),
                6,
            ),
        ).alias("phi"),
    )


def rich_club_normalized(edges: DataFrame) -> DataFrame:
    """:func:`rich_club` plus the configuration-model normalizer
    (Colizza et al., Nature Physics 2006): rho(k) = phi(k) / phi_cm(k),
    where phi_cm is the EXPECTED density among the rich set R(k) under
    a degree-preserving random rewiring — E[arcs i->j] = d_i d_j / M
    for i != j, so

        E[rich arcs] = (S_R^2 - Q_R) / M,
        S_R = sum of rich degrees, Q_R = sum of rich squared degrees,
        M   = total sym arcs.

    rho > 1 = genuine rich-club ordering beyond what the degree
    sequence forces. Exact closed form — no rewired-sample baseline
    needed, so it stays a deterministic, oracle-checkable aggregation.

    Scale shape: identical to :func:`rich_club` — S_R and Q_R are two
    MORE suffix sums over the same degree histogram (d*n_at and
    d^2*n_at), so the extra cost is two window columns on a tiny frame.
    """
    from pyspark.sql import Window

    from ..operators.transforms import simplify

    sym = simplify(edges.select("src", "dst"))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    am = (
        sym.join(deg.withColumnRenamed("deg", "dj"), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dk")),
            "dst",
        )
        .select(F.least("dj", "dk").alias("val"))
    )
    nh = deg.groupBy(F.col("deg").alias("val")).agg(
        F.count("*").alias("n_at")
    )
    ah = am.groupBy("val").agg(F.count("*").alias("a_at"))
    vals = nh.join(ah, "val", "full_outer").select(
        "val",
        F.coalesce("n_at", F.lit(0)).alias("n_at"),
        F.coalesce("a_at", F.lit(0)).alias("a_at"),
    )
    w = (
        Window.orderBy(F.desc("val"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.select(
        "val",
        "n_at",
        F.coalesce(F.sum("n_at").over(w), F.lit(0)).alias("n_gt"),
        F.coalesce(F.sum("a_at").over(w), F.lit(0)).alias("a_gt"),
        F.coalesce(F.sum(F.col("val") * F.col("n_at")).over(w), F.lit(0))
        .alias("s_gt"),
        F.coalesce(
            F.sum(F.col("val") * F.col("val") * F.col("n_at")).over(w),
            F.lit(0),
        ).alias("q_gt"),
    )
    # total sym arcs from the histogram itself: no extra job, rides the
    # plan as a broadcast 1-row cross join
    cum = cum.crossJoin(
        F.broadcast(vals.agg(F.sum("a_at").alias("m_total")))
    )
    phi = F.col("a_gt").cast("double") / (
        F.col("n_gt") * (F.col("n_gt") - F.lit(1))
    )
    e_cm = (
        F.col("s_gt").cast("double") * F.col("s_gt")
        - F.col("q_gt").cast("double")
    ) / F.col("m_total").cast("double")
    phi_cm = e_cm / (F.col("n_gt") * (F.col("n_gt") - F.lit(1)))
    return cum.where(F.col("n_at") > 0).select(
        F.col("val").cast("long").alias("k"),
        F.col("n_gt").cast("long").alias("n_rich"),
        F.col("a_gt").cast("long").alias("rich_arcs"),
        F.when(F.col("n_gt") >= 2, F.round(phi, 6)).alias("phi"),
        F.when(
            (F.col("n_gt") >= 2) & (F.col("a_gt") > 0),
            F.round(F.col("a_gt").cast("double") / e_cm, 6),
        ).alias("rho"),
    )


def oddball_scores(edges: DataFrame) -> DataFrame:
    """OddBall ego-net anomaly scores (Akoglu-McGlohon-Faloutsos, PAKDD
    2010): fit the Ego Density Power Law ln(E) = alpha + beta*ln(d)
    across all nodes (E = ego-net edge count = d + triangles-through-
    node on the simple graph), then score each node by its absolute
    log-space residual — near-cliques and star-centers stick out.

    Returns (node, deg, ego_edges, score).

    Cross-engine float discipline: per-node ln terms are rounded to 9
    decimals (identical doubles both engines), the five regression
    sums accumulate as DECIMAL(38,12) — exact and order-independent —
    so alpha/beta and every residual are bit-identical; only then the
    final ROUND(...,6).

    Scale shape: the triangle counter's oriented wedge join (one
    degree-ordered orientation, hub-safe) + one groupBy; the
    regression is five scalar aggregates broadcast back; scoring is a
    pure projection. Nothing driver-side but the 1-row coefficients.
    """
    from ..operators.transforms import simplify
    from .triangles import triangles_per_node

    sym = simplify(edges.select("src", "dst"))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    tri = triangles_per_node(edges)
    base = deg.join(tri, "node", "left").select(
        "node",
        "deg",
        (F.col("deg") + F.coalesce("triangles", F.lit(0))).alias(
            "ego_edges"
        ),
    )
    x = F.round(F.log(F.col("deg").cast("double")), 9)
    y = F.round(F.log(F.col("ego_edges").cast("double")), 9)
    terms = base.select(
        "node", "deg", "ego_edges", x.alias("x"), y.alias("y")
    )
    dec = "decimal(38,12)"
    sums = terms.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 12).cast(dec)).alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 12).cast(dec)).alias("sxx"),
    )
    j = terms.crossJoin(F.broadcast(sums))
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    beta = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n
    return j.select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        F.col("ego_edges").cast("long").alias("ego_edges"),
        F.round(F.abs(F.col("y") - (alpha + beta * F.col("x"))), 6).alias(
            "score"
        ),
    )
