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

Fault-tolerance (same class as pagerank's documented local-checkpoint
trade-off): the multi-branch plans here pin their shared pair/
orientation tables with :func:`..plans.iterate.pin`, which runs a
Spark job at plan-construction time (deliberate — the table feeds
many branches) and picks the storage by context: with a reliable
``spark.sparkContext.setCheckpointDir`` configured it uses replicated
``.checkpoint(eager=True)`` blocks that survive executor loss (the
long-lived-cluster posture); without one it falls back to an eager
local checkpoint — UNREPLICATED executor-local blocks, so losing an
executor mid-query aborts the query (a retry recomputes from source;
no wrong results). Resumable iterations use plans/iterate.py's
durable CheckpointManager instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import no_loops, symmetrize
from ..plans.iterate import eager_checkpoint, pin


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
    # a 1-row aggregate: the persist-capped eager local checkpoint is
    # right at any scale — pin()'s reliable path would round-trip one
    # row through distributed storage
    out = eager_checkpoint(out)
    e.unpersist()
    return out


# ------------------------------------------------- directed triad census

TRIAD_CLASSES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# (mutual, asym) dyad composition per class — used by the
# Batagelj-Mrvar completion formulas for the 0/1-edge classes.
TRIAD_DYADS = {
    "003": (0, 0), "012": (0, 1), "102": (1, 0),
    "021D": (0, 2), "021U": (0, 2), "021C": (0, 2),
    "111D": (1, 1), "111U": (1, 1),
    "030T": (0, 3), "030C": (0, 3), "201": (2, 0),
    "120D": (1, 2), "120U": (1, 2), "120C": (1, 2),
    "210": (2, 1), "300": (3, 0),
}


def triad_mask_table() -> dict[int, str]:
    """The 64-entry arc-mask -> Holland-Leinhardt class lookup, shared
    by the Spark plan, the DuckDB twin, and the brute-force test
    oracle. For a sorted triple (p < q < r) the mask bits are:
    1 p->q, 2 q->p, 4 p->r, 8 r->p, 16 q->r, 32 r->q.

    Class names follow the canonical MAN enumeration (Holland-
    Leinhardt 1970; same convention igraph documents): e.g. 021D is
    the out-star A<-B->C, 111D has the asymmetric arc pointing INTO
    the mutual dyad, 030C is the 3-cycle, 120C the mutual-closed
    path."""
    table: dict[int, str] = {}
    for mask in range(64):
        pairs = [
            (0, 1, mask & 1, (mask >> 1) & 1),
            (0, 2, (mask >> 2) & 1, (mask >> 3) & 1),
            (1, 2, (mask >> 4) & 1, (mask >> 5) & 1),
        ]
        asym_arcs = []
        mutual_pair = None
        m = a = 0
        for i, j, f, r in pairs:
            if f and r:
                m += 1
                mutual_pair = (i, j)
            elif f or r:
                a += 1
                asym_arcs.append((i, j) if f else (j, i))
        if (m, a) == (0, 0):
            name = "003"
        elif (m, a) == (0, 1):
            name = "012"
        elif (m, a) == (1, 0):
            name = "102"
        elif (m, a) == (0, 2):
            ends = [n for arc in asym_arcs for n in arc]
            center = next(x for x in set(ends) if ends.count(x) == 2)
            out = sum(1 for s, _ in asym_arcs if s == center)
            name = {2: "021D", 0: "021U", 1: "021C"}[out]
        elif (m, a) == (1, 1):
            z = next(x for x in (0, 1, 2) if x not in mutual_pair)
            s, _ = asym_arcs[0]
            name = "111D" if s == z else "111U"
        elif (m, a) == (0, 3):
            outd = [0, 0, 0]
            for s, _ in asym_arcs:
                outd[s] += 1
            name = "030C" if outd == [1, 1, 1] else "030T"
        elif (m, a) == (1, 2):
            z = next(x for x in (0, 1, 2) if x not in mutual_pair)
            out = sum(1 for s, _ in asym_arcs if s == z)
            name = {2: "120D", 0: "120U", 1: "120C"}[out]
        elif (m, a) == (2, 0):
            name = "201"
        elif (m, a) == (2, 1):
            name = "210"
        else:
            name = "300"
        table[mask] = name
    return table


def triad_census(edges: DataFrame) -> DataFrame:
    """Exact Holland-Leinhardt 16-class directed triad census — THE
    classic whole-graph statistic of social-network analysis (and the
    directed refinement of the reference's triangle/reciprocity
    stats), via the Batagelj-Mrvar 2001 sparse algorithm:

    - enumerate only triples with >= 2 non-null dyads — open wedges
      (center join on the undirected support, third pair anti-joined
      null) and support triangles (degree-ordered oriented join, each
      triple once);
    - classify each by its 6-bit arc mask through the shared 64-entry
      lookup (:func:`triad_mask_table`);
    - complete the 0/1-edge classes combinatorially:
      T(012) = A(n-2) - sum(count * apairs), T(102) = M(n-2) -
      sum(count * mpairs), T(003) = C(n,3) - everything else.

    Scale shape: the wedge join is the standard sum-of-squared-degrees
    bound (same as triangle counting — orient/cap hubs upstream if the
    support graph has them); everything else is one distinct + two
    aggregates. The 16-row result is assembled driver-side from three
    collected scalars plus the <= 64-row mask histogram.

    Returns (triad_class string, n_triads long), all 16 rows.
    """
    spark = edges.sparkSession
    arcs = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    x = F.least("src", "dst")
    y = F.greatest("src", "dst")
    und = (
        arcs.select(
            x.alias("x"),
            y.alias("y"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("fw"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("rv"),
        )
        .groupBy("x", "y")
        .agg(F.max("fw").alias("f"), F.max("rv").alias("r"))
    )
    # pin (reliable checkpoint if a dir is set, else eager local): the
    # pair table feeds ~6 plan branches (cns, three ot legs, nodes);
    # a persist unpersisted before any action would never materialize
    # and each branch would recompute the distinct+agg
    und = pin(und)
    n = (
        arcs.select(F.col("src").alias("v"))
        .union(arcs.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    dy = und.agg(
        F.sum(F.col("f") * F.col("r")).alias("m"),
        F.sum(
            F.when(F.col("f") + F.col("r") == 1, 1).otherwise(0)
        ).alias("a"),
    ).collect()[0]
    n_mut, n_asym = int(dy["m"] or 0), int(dy["a"] or 0)

    # centered adjacency: (c, l, out = c->l, inn = l->c)
    cns = und.select(
        F.col("x").alias("c"), F.col("y").alias("l"),
        F.col("f").alias("out"), F.col("r").alias("inn"),
    ).unionAll(
        und.select(
            F.col("y").alias("c"), F.col("x").alias("l"),
            F.col("r").alias("out"), F.col("f").alias("inn"),
        )
    )
    a_side = cns.select(
        "c", F.col("l").alias("l1"),
        F.col("out").alias("o1"), F.col("inn").alias("i1"),
    )
    b_side = cns.select(
        "c", F.col("l").alias("l2"),
        F.col("out").alias("o2"), F.col("inn").alias("i2"),
    )
    wedges = a_side.join(b_side, "c").where(F.col("l1") < F.col("l2"))
    open_w = wedges.join(
        und.select(F.col("x").alias("l1"), F.col("y").alias("l2")),
        ["l1", "l2"],
        "left_anti",
    )
    wmask = (
        F.when(
            F.col("c") < F.col("l1"),
            F.col("o1") * 1 + F.col("i1") * 2
            + F.col("o2") * 4 + F.col("i2") * 8,
        )
        .when(
            F.col("c") < F.col("l2"),
            F.col("i1") * 1 + F.col("o1") * 2
            + F.col("o2") * 16 + F.col("i2") * 32,
        )
        .otherwise(
            F.col("i1") * 4 + F.col("o1") * 8
            + F.col("i2") * 16 + F.col("o2") * 32
        )
    )
    open_masks = open_w.select(wmask.alias("mask"))

    # support triangles via degree-ordered orientation
    deg = cns.groupBy(F.col("c").alias("v")).agg(F.count("*").alias("d"))
    e = (
        und.join(deg.select(F.col("v").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("v").alias("y"), F.col("d").alias("dy")), "y")
    )
    lo_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    ot = e.select(
        F.when(lo_first, F.col("x")).otherwise(F.col("y")).alias("a"),
        F.when(lo_first, F.col("y")).otherwise(F.col("x")).alias("b"),
        "x", "y", "f", "r",
    )
    t12 = (
        ot.select(
            F.col("a").alias("u"), F.col("b").alias("v"),
            F.col("x").alias("x1"), F.col("y").alias("y1"),
            F.col("f").alias("f1"), F.col("r").alias("r1"),
        )
        .join(
            ot.select(
                F.col("a").alias("v"), F.col("b").alias("w"),
                F.col("x").alias("x2"), F.col("y").alias("y2"),
                F.col("f").alias("f2"), F.col("r").alias("r2"),
            ),
            "v",
        )
    )
    tri = t12.join(
        ot.select(
            F.col("a").alias("u"), F.col("b").alias("w"),
            F.col("x").alias("x3"), F.col("y").alias("y3"),
            F.col("f").alias("f3"), F.col("r").alias("r3"),
        ),
        ["u", "w"],
    )
    p = F.least("u", "v", "w")
    rr = F.greatest("u", "v", "w")
    q = F.col("u") + F.col("v") + F.col("w") - p - rr

    def contrib(xi, yi, fi, ri):
        return (
            F.when(
                (F.col(xi) == p) & (F.col(yi) == q),
                F.col(fi) * 1 + F.col(ri) * 2,
            )
            .when(
                (F.col(xi) == p) & (F.col(yi) == rr),
                F.col(fi) * 4 + F.col(ri) * 8,
            )
            .otherwise(F.col(fi) * 16 + F.col(ri) * 32)
        )

    tmask = (
        contrib("x1", "y1", "f1", "r1")
        + contrib("x2", "y2", "f2", "r2")
        + contrib("x3", "y3", "f3", "r3")
    )
    tri_masks = tri.select(tmask.alias("mask"))

    table = triad_mask_table()
    lookup = spark.createDataFrame(
        [(k, v) for k, v in table.items()], "mask int, triad_class string"
    )
    counted = (
        open_masks.unionAll(tri_masks)
        .groupBy("mask")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(lookup), "mask")
        .groupBy("triad_class")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    und.unpersist()
    counts = {r["triad_class"]: int(r["cnt"]) for r in counted}
    sum_counted = sum(counts.values())
    sum_a = sum(TRIAD_DYADS[c][1] * v for c, v in counts.items())
    sum_m = sum(TRIAD_DYADS[c][0] * v for c, v in counts.items())
    t012 = n_asym * (n - 2) - sum_a
    t102 = n_mut * (n - 2) - sum_m
    total = n * (n - 1) * (n - 2) // 6
    t003 = total - sum_counted - t012 - t102
    counts["012"] = t012
    counts["102"] = t102
    counts["003"] = t003
    return spark.createDataFrame(
        [(c, counts.get(c, 0)) for c in TRIAD_CLASSES],
        "triad_class string, n_triads long",
    )


def triad_census_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`triad_census` over an ``edges(src, dst)``
    CTE: identical support-graph flags, open-wedge / oriented-triangle
    enumeration, the shared 64-entry mask lookup as a VALUES relation,
    and the same combinatorial completion for 003/012/102."""
    table = triad_mask_table()
    mask_vals = ", ".join(f"({k}, '{v}')" for k, v in table.items())
    cls_vals = ", ".join(
        f"('{c}', {TRIAD_DYADS[c][0]}, {TRIAD_DYADS[c][1]})"
        for c in TRIAD_CLASSES
    )
    return f"""WITH {edges_cte},
tarcs AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
tund AS MATERIALIZED (
  SELECT LEAST(src, dst) AS x, GREATEST(src, dst) AS y,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
  FROM tarcs GROUP BY 1, 2),
tn AS (SELECT COUNT(*) AS n FROM (
  SELECT src AS v FROM tarcs UNION SELECT dst FROM tarcs)),
tdy AS (SELECT COALESCE(SUM(f * r), 0) AS m,
               COALESCE(SUM(CASE WHEN f + r = 1 THEN 1 ELSE 0 END), 0) AS a
        FROM tund),
cns AS MATERIALIZED (
  SELECT x AS c, y AS l, f AS o, r AS i FROM tund
  UNION ALL SELECT y, x, r, f FROM tund),
omask AS (
  SELECT CASE WHEN w.c < w.l1 THEN w.o1 * 1 + w.i1 * 2 + w.o2 * 4 + w.i2 * 8
              WHEN w.c < w.l2 THEN w.i1 * 1 + w.o1 * 2 + w.o2 * 16 + w.i2 * 32
              ELSE w.i1 * 4 + w.o1 * 8 + w.i2 * 16 + w.o2 * 32 END AS mask
  FROM (
    SELECT a.c, a.l AS l1, a.o AS o1, a.i AS i1,
           b.l AS l2, b.o AS o2, b.i AS i2
    FROM cns a JOIN cns b ON a.c = b.c AND a.l < b.l
    WHERE NOT EXISTS (
      SELECT 1 FROM tund u WHERE u.x = a.l AND u.y = b.l)) w),
tdeg AS MATERIALIZED (SELECT c AS v, COUNT(*) AS d FROM cns GROUP BY c),
ote AS MATERIALIZED (
  SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
              THEN u.x ELSE u.y END AS a,
         CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
              THEN u.y ELSE u.x END AS b,
         u.x, u.y, u.f, u.r
  FROM tund u JOIN tdeg dx ON u.x = dx.v JOIN tdeg dy ON u.y = dy.v),
tmask AS (
  SELECT (CASE WHEN t.x1 = t.p AND t.y1 = t.q THEN t.f1 * 1 + t.r1 * 2
               WHEN t.x1 = t.p AND t.y1 = t.rr THEN t.f1 * 4 + t.r1 * 8
               ELSE t.f1 * 16 + t.r1 * 32 END)
       + (CASE WHEN t.x2 = t.p AND t.y2 = t.q THEN t.f2 * 1 + t.r2 * 2
               WHEN t.x2 = t.p AND t.y2 = t.rr THEN t.f2 * 4 + t.r2 * 8
               ELSE t.f2 * 16 + t.r2 * 32 END)
       + (CASE WHEN t.x3 = t.p AND t.y3 = t.q THEN t.f3 * 1 + t.r3 * 2
               WHEN t.x3 = t.p AND t.y3 = t.rr THEN t.f3 * 4 + t.r3 * 8
               ELSE t.f3 * 16 + t.r3 * 32 END) AS mask
  FROM (
    SELECT LEAST(e1.a, e1.b, e2.b) AS p,
           GREATEST(e1.a, e1.b, e2.b) AS rr,
           e1.a + e1.b + e2.b - LEAST(e1.a, e1.b, e2.b)
             - GREATEST(e1.a, e1.b, e2.b) AS q,
           e1.x AS x1, e1.y AS y1, e1.f AS f1, e1.r AS r1,
           e2.x AS x2, e2.y AS y2, e2.f AS f2, e2.r AS r2,
           e3.x AS x3, e3.y AS y3, e3.f AS f3, e3.r AS r3
    FROM ote e1 JOIN ote e2 ON e1.b = e2.a
    JOIN ote e3 ON e3.a = e1.a AND e3.b = e2.b) t),
hist AS MATERIALIZED (
  SELECT lk.name AS triad_class, COUNT(*) AS cnt
  FROM (SELECT mask FROM omask UNION ALL SELECT mask FROM tmask) ms
  JOIN (VALUES {mask_vals}) lk(mask, name) ON ms.mask = lk.mask
  GROUP BY lk.name),
agg AS (
  SELECT COALESCE(SUM(h.cnt), 0) AS sum_cnt,
         COALESCE(SUM(h.cnt * c.apairs), 0) AS sum_a,
         COALESCE(SUM(h.cnt * c.mpairs), 0) AS sum_m
  FROM hist h JOIN (VALUES {cls_vals}) c(name, mpairs, apairs)
    ON h.triad_class = c.name),
base AS (
  SELECT c.name, COALESCE(h.cnt, 0) AS cnt
  FROM (VALUES {cls_vals}) c(name, mpairs, apairs)
  LEFT JOIN hist h ON h.triad_class = c.name),
t012 AS (SELECT (SELECT a FROM tdy) * ((SELECT n FROM tn) - 2)
                - (SELECT sum_a FROM agg) AS v),
t102 AS (SELECT (SELECT m FROM tdy) * ((SELECT n FROM tn) - 2)
                - (SELECT sum_m FROM agg) AS v),
t003 AS (SELECT (SELECT n FROM tn) * ((SELECT n FROM tn) - 1)
                * ((SELECT n FROM tn) - 2) // 6
                - (SELECT sum_cnt FROM agg)
                - (SELECT v FROM t012) - (SELECT v FROM t102) AS v)
SELECT name AS triad_class,
  CAST(CASE name WHEN '012' THEN (SELECT v FROM t012)
                 WHEN '102' THEN (SELECT v FROM t102)
                 WHEN '003' THEN (SELECT v FROM t003)
                 ELSE cnt END AS BIGINT) AS n_triads
FROM base"""


def directed_triangle_profile(edges: DataFrame) -> DataFrame:
    """Per-node directed triangle profile — the four triangle roles of
    Fagiolo's directed clustering decomposition (Phys. Rev. E 2007),
    counted operationally over ORDERED neighbour pairs (j, k):

    - t_cyc(i):  i->j, j->k, k->i           (i on a 3-cycle)
    - t_mid(i):  j->i, i->k, j->k           (i is the middleman)
    - t_in(i):   j->i, k->i, j->k           (two arcs into i)
    - t_out(i):  i->j, i->k, j->k           (two arcs out of i)

    Every directed closed triple is counted in exactly one role at
    each of its three corners, so sum(t_*) = 3 * #directed closed
    triples. Enumeration is the same degree-ordered support-triangle
    join as :func:`triad_census` (each support triangle once), with
    the role counts read off the 6-bit arc mask — no extra joins.

    Returns (node, t_cyc, t_mid, t_in, t_out) for every node of the
    loop-free distinct arc set (zeros included).
    """
    arcs = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    x = F.least("src", "dst")
    y = F.greatest("src", "dst")
    und = (
        arcs.select(
            x.alias("x"),
            y.alias("y"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("fw"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("rv"),
        )
        .groupBy("x", "y")
        .agg(F.max("fw").alias("f"), F.max("rv").alias("r"))
    )
    # pin (reliable checkpoint if a dir is set, else eager local): the
    # pair table feeds ~6 plan branches (cns, three ot legs, nodes);
    # a persist unpersisted before any action would never materialize
    # and each branch would recompute the distinct+agg
    und = pin(und)
    cns = und.select(F.col("x").alias("v")).unionAll(
        und.select(F.col("y").alias("v"))
    )
    deg = cns.groupBy("v").agg(F.count("*").alias("d"))
    e = (
        und.join(deg.select(F.col("v").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("v").alias("y"), F.col("d").alias("dy")), "y")
    )
    lo_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    ot = e.select(
        F.when(lo_first, F.col("x")).otherwise(F.col("y")).alias("a"),
        F.when(lo_first, F.col("y")).otherwise(F.col("x")).alias("b"),
        "x", "y", "f", "r",
    )
    tri = (
        ot.select(F.col("a").alias("u"), F.col("b").alias("v"),
                  F.col("x").alias("x1"), F.col("y").alias("y1"),
                  F.col("f").alias("f1"), F.col("r").alias("r1"))
        .join(ot.select(F.col("a").alias("v"), F.col("b").alias("w"),
                        F.col("x").alias("x2"), F.col("y").alias("y2"),
                        F.col("f").alias("f2"), F.col("r").alias("r2")), "v")
        .join(ot.select(F.col("a").alias("u"), F.col("b").alias("w"),
                        F.col("x").alias("x3"), F.col("y").alias("y3"),
                        F.col("f").alias("f3"), F.col("r").alias("r3")),
              ["u", "w"])
    )
    p = F.least("u", "v", "w")
    rr = F.greatest("u", "v", "w")
    q = F.col("u") + F.col("v") + F.col("w") - p - rr

    def contrib(xi, yi, fi, ri):
        return (
            F.when((F.col(xi) == p) & (F.col(yi) == q),
                   F.col(fi) * 1 + F.col(ri) * 2)
            .when((F.col(xi) == p) & (F.col(yi) == rr),
                  F.col(fi) * 4 + F.col(ri) * 8)
            .otherwise(F.col(fi) * 16 + F.col(ri) * 32)
        )

    mask = (
        contrib("x1", "y1", "f1", "r1")
        + contrib("x2", "y2", "f2", "r2")
        + contrib("x3", "y3", "f3", "r3")
    )
    tm = tri.select(p.alias("p"), q.alias("q"), rr.alias("r"),
                    mask.alias("m"))
    b = [ (F.shiftright("m", i).bitwiseAND(F.lit(1))) for i in range(6) ]
    # bits: 1 p->q, 2 q->p, 4 p->r, 8 r->p, 16 q->r, 32 r->q
    corners = (
        tm.select(
            F.col("p").alias("node"),
            (b[0] * b[4] * b[3] + b[2] * b[5] * b[1]).alias("cyc"),
            (b[1] * b[2] * b[4] + b[3] * b[0] * b[5]).alias("mid"),
            (b[1] * b[3] * (b[4] + b[5])).alias("tin"),
            (b[0] * b[2] * (b[4] + b[5])).alias("tout"),
        )
        .unionAll(tm.select(
            F.col("q").alias("node"),
            (b[1] * b[2] * b[5] + b[4] * b[3] * b[0]).alias("cyc"),
            (b[0] * b[4] * b[2] + b[5] * b[1] * b[3]).alias("mid"),
            (b[0] * b[5] * (b[2] + b[3])).alias("tin"),
            (b[1] * b[4] * (b[2] + b[3])).alias("tout"),
        ))
        .unionAll(tm.select(
            F.col("r").alias("node"),
            (b[3] * b[0] * b[4] + b[5] * b[1] * b[2]).alias("cyc"),
            (b[2] * b[5] * b[0] + b[4] * b[3] * b[1]).alias("mid"),
            (b[2] * b[4] * (b[0] + b[1])).alias("tin"),
            (b[3] * b[5] * (b[0] + b[1])).alias("tout"),
        ))
        .groupBy("node")
        .agg(F.sum("cyc").alias("t_cyc"), F.sum("mid").alias("t_mid"),
             F.sum("tin").alias("t_in"), F.sum("tout").alias("t_out"))
    )
    nodes = cns.select("v").distinct().withColumnRenamed("v", "node")
    return nodes.join(corners, "node", "left").select(
        "node",
        F.coalesce("t_cyc", F.lit(0)).cast("long").alias("t_cyc"),
        F.coalesce("t_mid", F.lit(0)).cast("long").alias("t_mid"),
        F.coalesce("t_in", F.lit(0)).cast("long").alias("t_in"),
        F.coalesce("t_out", F.lit(0)).cast("long").alias("t_out"),
    )


def directed_triangle_profile_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`directed_triangle_profile` (identical
    support-triangle enumeration and per-corner mask arithmetic)."""
    ctes, final = _dir_profile_parts()
    return f"WITH {edges_cte},\n{ctes}\n{final}"


def _dir_profile_parts() -> tuple[str, str]:
    """(CTE block assuming ``edges`` is defined, final SELECT) of the
    profile twin — shared with :func:`directed_clustering_sql`."""
    bits = [f"((t.m >> {i}) & 1)" for i in range(6)]
    b0, b1, b2, b3, b4, b5 = bits
    ctes = f"""parcs AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
pund AS MATERIALIZED (
  SELECT LEAST(src, dst) AS x, GREATEST(src, dst) AS y,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
  FROM parcs GROUP BY 1, 2),
pcns AS (SELECT x AS v FROM pund UNION ALL SELECT y FROM pund),
pdeg AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM pcns GROUP BY v),
pot AS MATERIALIZED (
  SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
              THEN u.x ELSE u.y END AS a,
         CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
              THEN u.y ELSE u.x END AS b,
         u.x, u.y, u.f, u.r
  FROM pund u JOIN pdeg dx ON u.x = dx.v JOIN pdeg dy ON u.y = dy.v),
ptri AS MATERIALIZED (
  SELECT LEAST(e1.a, e1.b, e2.b) AS p,
         e1.a + e1.b + e2.b - LEAST(e1.a, e1.b, e2.b)
           - GREATEST(e1.a, e1.b, e2.b) AS q,
         GREATEST(e1.a, e1.b, e2.b) AS r,
         (CASE WHEN e1.x = LEAST(e1.a, e1.b, e2.b)
                AND e1.y = e1.a + e1.b + e2.b - LEAST(e1.a, e1.b, e2.b)
                    - GREATEST(e1.a, e1.b, e2.b)
               THEN e1.f * 1 + e1.r * 2
               WHEN e1.x = LEAST(e1.a, e1.b, e2.b)
                AND e1.y = GREATEST(e1.a, e1.b, e2.b)
               THEN e1.f * 4 + e1.r * 8
               ELSE e1.f * 16 + e1.r * 32 END)
       + (CASE WHEN e2.x = LEAST(e1.a, e1.b, e2.b)
                AND e2.y = e1.a + e1.b + e2.b - LEAST(e1.a, e1.b, e2.b)
                    - GREATEST(e1.a, e1.b, e2.b)
               THEN e2.f * 1 + e2.r * 2
               WHEN e2.x = LEAST(e1.a, e1.b, e2.b)
                AND e2.y = GREATEST(e1.a, e1.b, e2.b)
               THEN e2.f * 4 + e2.r * 8
               ELSE e2.f * 16 + e2.r * 32 END)
       + (CASE WHEN e3.x = LEAST(e1.a, e1.b, e2.b)
                AND e3.y = e1.a + e1.b + e2.b - LEAST(e1.a, e1.b, e2.b)
                    - GREATEST(e1.a, e1.b, e2.b)
               THEN e3.f * 1 + e3.r * 2
               WHEN e3.x = LEAST(e1.a, e1.b, e2.b)
                AND e3.y = GREATEST(e1.a, e1.b, e2.b)
               THEN e3.f * 4 + e3.r * 8
               ELSE e3.f * 16 + e3.r * 32 END) AS m
  FROM pot e1 JOIN pot e2 ON e1.b = e2.a
  JOIN pot e3 ON e3.a = e1.a AND e3.b = e2.b),
pcorn AS (
  SELECT node, SUM(cyc) AS t_cyc, SUM(mid) AS t_mid,
         SUM(tin) AS t_in, SUM(tout) AS t_out
  FROM (
    SELECT t.p AS node,
           {b0}*{b4}*{b3} + {b2}*{b5}*{b1} AS cyc,
           {b1}*{b2}*{b4} + {b3}*{b0}*{b5} AS mid,
           {b1}*{b3}*({b4} + {b5}) AS tin,
           {b0}*{b2}*({b4} + {b5}) AS tout
    FROM ptri t
    UNION ALL
    SELECT t.q,
           {b1}*{b2}*{b5} + {b4}*{b3}*{b0},
           {b0}*{b4}*{b2} + {b5}*{b1}*{b3},
           {b0}*{b5}*({b2} + {b3}),
           {b1}*{b4}*({b2} + {b3})
    FROM ptri t
    UNION ALL
    SELECT t.r,
           {b3}*{b0}*{b4} + {b5}*{b1}*{b2},
           {b2}*{b5}*{b0} + {b4}*{b3}*{b1},
           {b2}*{b4}*({b0} + {b1}),
           {b3}*{b5}*({b0} + {b1})
    FROM ptri t) z
  GROUP BY node)"""
    final = """SELECT n.v AS node,
       CAST(COALESCE(c.t_cyc, 0) AS BIGINT) AS t_cyc,
       CAST(COALESCE(c.t_mid, 0) AS BIGINT) AS t_mid,
       CAST(COALESCE(c.t_in, 0) AS BIGINT) AS t_in,
       CAST(COALESCE(c.t_out, 0) AS BIGINT) AS t_out
FROM (SELECT DISTINCT v FROM pcns) n
LEFT JOIN pcorn c ON n.v = c.node"""
    return ctes, final


def directed_clustering(
    edges: DataFrame, profile: DataFrame | None = None
) -> DataFrame:
    """Fagiolo per-node directed clustering coefficients: each triangle
    role of :func:`directed_triangle_profile` normalized by its maximum
    attainable count given the node's degrees (Phys. Rev. E 76, 026107):

    - c_cyc = t_cyc / (d_in*d_out - d_bi)
    - c_mid = t_mid / (d_in*d_out - d_bi)
    - c_in  = t_in  / (d_in*(d_in-1))
    - c_out = t_out / (d_out*(d_out-1))

    where d_bi is the number of reciprocated neighbours. NULL where the
    denominator is zero. One degree aggregation + the profile's
    support-triangle join — no extra triangle work. Pass ``profile``
    (a prior :func:`directed_triangle_profile` result) to skip
    re-deriving it — the triangle join dominates the cost (at 30M arcs
    it is ~60% of this function's wall, BENCH/BASELINE.md §25)."""
    arcs = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    arcs = pin(arcs)  # feeds degrees, d_bi AND the profile
    dout = arcs.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d_out")
    )
    din = arcs.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("d_in")
    )
    rev = arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    dbi = (
        arcs.join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("d_bi"))
    )
    prof = directed_triangle_profile(arcs) if profile is None else profile
    deg = (
        prof.join(dout, "node", "left")
        .join(din, "node", "left")
        .join(dbi, "node", "left")
        .fillna(0, subset=["d_out", "d_in", "d_bi"])
    )
    den_cm = F.col("d_in") * F.col("d_out") - F.col("d_bi")
    den_in = F.col("d_in") * (F.col("d_in") - 1)
    den_out = F.col("d_out") * (F.col("d_out") - 1)

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double"))

    out = deg.select(
        "node",
        ratio(F.col("t_cyc"), den_cm).alias("c_cyc"),
        ratio(F.col("t_mid"), den_cm).alias("c_mid"),
        ratio(F.col("t_in"), den_in).alias("c_in"),
        ratio(F.col("t_out"), den_out).alias("c_out"),
    )
    return out


def directed_clustering_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`directed_clustering` — reuses the profile
    CTE block (same ``parcs`` arc set) and normalizes by the same
    degree terms."""
    ctes, final = _dir_profile_parts()
    return f"""WITH {edges_cte},
{ctes},
cprof AS MATERIALIZED (
{final}),
cdout AS (SELECT src AS node, COUNT(*) AS d_out FROM parcs GROUP BY 1),
cdin AS (SELECT dst AS node, COUNT(*) AS d_in FROM parcs GROUP BY 1),
cdbi AS (SELECT a.src AS node, COUNT(*) AS d_bi
         FROM parcs a JOIN parcs b ON a.src = b.dst AND a.dst = b.src
         GROUP BY 1)
SELECT p.node,
  CASE WHEN COALESCE(i.d_in,0)*COALESCE(o.d_out,0)-COALESCE(m.d_bi,0) > 0
       THEN CAST(p.t_cyc AS DOUBLE)
            / (COALESCE(i.d_in,0)*COALESCE(o.d_out,0)-COALESCE(m.d_bi,0))
       END AS c_cyc,
  CASE WHEN COALESCE(i.d_in,0)*COALESCE(o.d_out,0)-COALESCE(m.d_bi,0) > 0
       THEN CAST(p.t_mid AS DOUBLE)
            / (COALESCE(i.d_in,0)*COALESCE(o.d_out,0)-COALESCE(m.d_bi,0))
       END AS c_mid,
  CASE WHEN COALESCE(i.d_in,0)*(COALESCE(i.d_in,0)-1) > 0
       THEN CAST(p.t_in AS DOUBLE)
            / (COALESCE(i.d_in,0)*(COALESCE(i.d_in,0)-1)) END AS c_in,
  CASE WHEN COALESCE(o.d_out,0)*(COALESCE(o.d_out,0)-1) > 0
       THEN CAST(p.t_out AS DOUBLE)
            / (COALESCE(o.d_out,0)*(COALESCE(o.d_out,0)-1)) END AS c_out
FROM cprof p
LEFT JOIN cdout o ON p.node = o.node
LEFT JOIN cdin i ON p.node = i.node
LEFT JOIN cdbi m ON p.node = m.node"""
