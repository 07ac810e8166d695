"""Graph transforms — the reference's Transform.java family, Spark-first.

Every operator is lazy DataFrame algebra: Catalyst fuses filters and
projections (the reference hand-builds the same laziness as nested
NodeIterator wrappers, Transform.java:218-343), and the sort-shuffle IS
the reference's external-memory batch sort (Transform.java:1284-1494).

Edge tables are ``(src: long, dst: long [, label columns])``. The graph
invariant (successor lists strictly increasing, no duplicates —
BVGraph.java:2201) is restored by ``distinct()`` where an operator can
introduce duplicate arcs; physical sorting happens only at CSR pack time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


# ---------------------------------------------------------------- filters

def filter_arcs(edges: DataFrame, predicate: Column) -> DataFrame:
    """Lazy per-arc predicate view (Transform.filterArcs,
    Transform.java:99-109). ``predicate`` is any Column over the edge
    table's columns, e.g. ``F.col("src") < F.col("dst")``."""
    return edges.where(predicate)


def no_loops(edges: DataFrame) -> DataFrame:
    """Drop self-loops (Transform.NO_LOOPS, Transform.java:130-144)."""
    return edges.where(F.col("src") != F.col("dst"))


def node_class_filter(
    edges: DataFrame, node_classes: DataFrame, same_class: bool = True
) -> DataFrame:
    """Keep arcs within (or across) node classes (Transform.NodeClassFilter,
    Transform.java:150-190). ``node_classes`` is ``(node, cls)``."""
    src_cls = node_classes.select(F.col("node").alias("src"), F.col("cls").alias("_scls"))
    dst_cls = node_classes.select(F.col("node").alias("dst"), F.col("cls").alias("_dcls"))
    joined = edges.join(src_cls, "src").join(dst_cls, "dst")
    cond = F.col("_scls") == F.col("_dcls")
    if not same_class:
        cond = ~cond
    return joined.where(cond).drop("_scls", "_dcls").select(*edges.columns)


def label_lower_bound(edges: DataFrame, label_col: str, threshold) -> DataFrame:
    """Keep arcs with label >= threshold (Transform.LowerBound,
    Transform.java:193-211)."""
    return edges.where(F.col(label_col) >= threshold)


def label_in_set(edges: DataFrame, label_col: str, values) -> DataFrame:
    """Keep arcs whose label is in a set (IntegerLabelFilter,
    labelling/IntegerLabelFilter.java:25-30)."""
    return edges.where(F.col(label_col).isin(list(values)))


def relabel_arcs(
    edges: DataFrame,
    label_col: str,
    strategy,
    new_label_col: str | None = None,
) -> DataFrame:
    """Per-arc label conversion (ArcRelabelledImmutableGraph, labelling/
    ArcRelabelledImmutableGraph.java:49-89): the reference wraps a
    labelled graph with a ``LabelConversionStrategy.convert(from, to,
    source, target)`` applied on the fly; here the strategy is a Column
    expression — or a callable ``(label, src, dst) -> Column`` mirroring
    the reference's signature — evaluated lazily by Catalyst. A type
    change (the reference's label-prototype swap, e.g. its
    INT_LABEL_CONVERSION_STRATEGY between int-label classes) is a cast
    inside the strategy. ``new_label_col`` renames the label column.
    """
    out_col = new_label_col or label_col
    if callable(strategy) and not isinstance(strategy, Column):
        expr = strategy(F.col(label_col), F.col("src"), F.col("dst"))
    else:
        expr = strategy
    others = [c for c in edges.columns if c not in (label_col, out_col)]
    return edges.select(*others, expr.alias(out_col))


# ------------------------------------------------------------ structural

def transpose(edges: DataFrame) -> DataFrame:
    """Reverse all arcs (Transform.transpose / transposeOffline,
    Transform.java:964-1972, 1397-1494). The reference's external
    batch-sort dataflow is Spark's sort-shuffle; here only the logical
    swap is needed — downstream ops re-partition as they require."""
    others = [c for c in edges.columns if c not in ("src", "dst")]
    return edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *others
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Union with the transpose (Transform.symmetrize,
    Transform.java:913-951). Plain columns only; for labelled graphs use
    :func:`union_labelled` with a merge strategy."""
    e = edges.select("src", "dst")
    return e.unionByName(transpose(e)).distinct()


def simplify(edges: DataFrame) -> DataFrame:
    """Symmetrize + strip loops -> simple graph (Transform.simplify,
    Transform.java:840-911)."""
    return no_loops(symmetrize(edges))


def union_graphs(g0: DataFrame, g1: DataFrame) -> DataFrame:
    """Arc in union iff in either (Transform.union, Transform.java:1999;
    UnionImmutableGraph.java:27-31)."""
    return g0.select("src", "dst").unionByName(g1.select("src", "dst")).distinct()


def union_labelled(
    g0: DataFrame, g1: DataFrame, label_col: str, merge: str | Column = "max"
) -> DataFrame:
    """Labelled union; duplicate arcs' labels merged by strategy
    (labelling/UnionArcLabelledImmutableGraph.java; LabelMergeStrategy.java:25-33).
    ``merge`` is an agg function name or a Column expression over
    ``F.col(label_col)``."""
    both = g0.select("src", "dst", label_col).unionByName(
        g1.select("src", "dst", label_col)
    )
    agg = (
        getattr(F, merge)(label_col) if isinstance(merge, str) else merge
    ).alias(label_col)
    return both.groupBy("src", "dst").agg(agg)


def mask_arcs(edges: DataFrame, mask: DataFrame) -> DataFrame:
    """Per-list successor masking: drop every arc present in ``mask``
    (MaskedIntIterator — the reference filters successor lists against a
    mask iterator inside its merged/filtered graph views; here the mask
    is itself an arc table and the subtraction is one left-anti join,
    which Spark executes as a co-partitioned hash anti-join)."""
    return edges.join(mask.select("src", "dst"), ["src", "dst"], "left_anti")


def intervals_to_arcs(intervals: DataFrame) -> DataFrame:
    """Expand ``(src, lo, hi)`` inclusive successor intervals into arcs
    (IntIntervalSequenceIterator — BVGraph's intervalization stores runs
    of consecutive successors as [lo, hi] pairs; the decode is
    ``explode(sequence(lo, hi))``, entirely JVM-side). Degenerate rows
    with hi < lo yield no arcs, matching an empty interval."""
    return (
        intervals.where(F.col("hi") >= F.col("lo"))
        .select(
            "src",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("dst"),
        )
    )


def compose(g0: DataFrame, g1: DataFrame) -> DataFrame:
    """Boolean matrix product: arc (x,z) iff exists y with (x,y) in g0 and
    (y,z) in g1 (Transform.compose, Transform.java:2101-2112). The core
    equi-join of every iterative step."""
    a = g0.select("src", F.col("dst").alias("mid"))
    b = g1.select(F.col("src").alias("mid"), "dst")
    return a.join(b, "mid").select("src", "dst").distinct()


def compose_semiring(
    g0: DataFrame,
    g1: DataFrame,
    label_col: str,
    multiply: Column | None = None,
    add: str = "min",
) -> DataFrame:
    """Semiring matrix product: ``multiply`` along a path, ``add`` across
    paths (Transform.compose with LabelSemiring, Transform.java:2125-2265).
    Default min-plus (shortest paths): multiply = w0 + w1, add = min."""
    a = g0.select("src", F.col("dst").alias("mid"), F.col(label_col).alias("_w0"))
    b = g1.select(F.col("src").alias("mid"), "dst", F.col(label_col).alias("_w1"))
    if multiply is None:
        multiply = F.col("_w0") + F.col("_w1")
    path = a.join(b, "mid").select("src", "dst", multiply.alias("_w"))
    return path.groupBy("src", "dst").agg(getattr(F, add)("_w").alias(label_col))


def line_graph(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Line graph: nodes = arcs of g, arc <x,y> -> <y,z>
    (Transform.line, Transform.java:2267-2382). Returns (line_edges,
    arc_ids) where arc_ids maps arc_id -> (src, dst) — the reference's
    node<->arc map files."""
    from ..util.ids import assign_dense_ids

    arcs = assign_dense_ids(
        edges.select("src", "dst").distinct(), ["src", "dst"], id_col="arc_id"
    )
    a = arcs.select(F.col("arc_id").alias("src_arc"), "src", F.col("dst").alias("mid"))
    b = arcs.select(F.col("arc_id").alias("dst_arc"), F.col("src").alias("mid"), "dst")
    line = a.join(b, "mid").select(
        F.col("src_arc").alias("src"), F.col("dst_arc").alias("dst")
    )
    return line, arcs


# -------------------------------------------------- map / renumber / quotient

def map_nodes(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Node remap by (partial) function (Transform.map,
    Transform.java:628-713): ``mapping`` is ``(node, target)``.
    Nodes absent from the mapping (the reference's -1) are DELETED along
    with their arcs (inner join); a non-injective mapping quotients
    (merges) nodes and dedups arcs."""
    src_map = mapping.select(F.col("node").alias("src"), F.col("target").alias("_s2"))
    dst_map = mapping.select(F.col("node").alias("dst"), F.col("target").alias("_d2"))
    return (
        edges.join(src_map, "src")
        .join(dst_map, "dst")
        .select(F.col("_s2").alias("src"), F.col("_d2").alias("dst"))
        .distinct()
    )


def random_permutation(edges: DataFrame, seed: int) -> tuple[DataFrame, DataFrame]:
    """Seeded random relabeling (Transform.randomPermutation,
    Transform.java:2436-2453): returns (remapped_edges, permutation).
    Deterministic: ordered by xxhash64(node, seed)."""
    from ..util.ids import assign_dense_ids

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("_h", F.xxhash64(F.col("node"), F.lit(seed)))
    )
    perm = assign_dense_ids(nodes, ["_h", "node"], id_col="target").drop("_h")
    return map_nodes(edges, perm), perm


def degree_ordered_permutation(
    edges: DataFrame, ascending: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Relabel nodes by (out+in) degree — the locality/compression
    ordering family (Gray/lexicographic permutations,
    Transform.java:2383-2580; we order by degree, the dominant effect for
    gap compression of skewed graphs). Ties broken by node id."""
    from ..util.ids import assign_dense_ids

    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .withColumn("_key", F.col("deg") if ascending else -F.col("deg"))
    )
    perm = assign_dense_ids(deg, ["_key", "node"], id_col="target").select(
        "node", "target"
    )
    return map_nodes(edges, perm), perm


_GRAY_BIG = 1 << 62


def _adj_body_sentinel(s_col, d_col, gray: bool):
    """(body, sentinel) expressions shared by the full and bounded
    adjacency-row keys: body is the (possibly sign-alternated) successor
    array, sentinel closes the key by tail parity."""
    if gray:
        body = F.zip_with(
            s_col,
            F.sequence(F.lit(0), F.size(s_col) - 1),
            lambda x, i: F.when(i % 2 == 0, -x).otherwise(x),
        )
        sentinel = F.when(d_col % 2 == 1, F.lit(_GRAY_BIG)).otherwise(
            F.lit(-_GRAY_BIG)
        )
    else:
        body = s_col
        sentinel = F.lit(_GRAY_BIG)
    return body, sentinel


def _succ_key(edges: DataFrame, gray: bool) -> DataFrame:
    """(node, _key) where _key is an array<long> whose LEXICOGRAPHIC
    order equals the Gray-code (or plain lexicographic) order of the
    node's adjacency-matrix row.

    Gray trick: the binary rank of a Gray codeword is its prefix-XOR;
    for a sorted successor list the prefix-XOR bit vector is the
    alternating interval indicator [s1,s2) 1, [s2,s3) 0, ... — whose lex
    order is exactly the array order of [-s1, s2, -s3, s4, ...] closed
    by a parity sentinel (+BIG after an odd count: tail of ones, any
    continuation sorts lower; -BIG after an even count: tail of zeros,
    any continuation sorts higher). So the whole permutation is ONE
    distributed sort on an array column — no bit-matrix materialized."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    lists = (
        edges.select("src", "dst")
        .distinct()
        .groupBy(F.col("src").alias("node"))
        .agg(F.sort_array(F.collect_list("dst")).alias("_succ"))
    )
    with_lists = nodes.join(lists, "node", "left").select(
        "node", F.coalesce("_succ", F.array().cast("array<long>")).alias("_succ")
    )
    body, sentinel = _adj_body_sentinel(
        F.col("_succ"), F.size("_succ"), gray
    )
    key = F.when(F.size("_succ") == 0, F.array(sentinel)).otherwise(
        F.concat(body, F.array(sentinel))
    )
    return with_lists.select("node", key.alias("_key"))


def _bounded_succ_keyed(
    edges: DataFrame, gray: bool, prefix_len: int = 64
) -> DataFrame:
    """(node, _pfx, _sub): lexicographic order of (_pfx, _sub, node)
    equals the order of (full adjacency key, node) from
    :func:`_succ_key`, but every sort row is BOUNDED — at most
    ``prefix_len`` + 1 longs.

    Why: the one-sort formulation materializes each node's whole
    successor list as the range-partition key; a 10^7-successor hub is
    then one ~80 MB row flowing through the global sort. Here phase 1
    sorts only the first ``prefix_len`` key elements; ties that truncation
    could hide (groups sharing the full prefix AND outdegree >=
    prefix_len — a sentinel inside the prefix can never equal a +-dst
    body element, so cross-length ties are impossible) are resolved in
    phase 2 by a window over ONLY the tied nodes' full keys — group-local
    work, empty on graphs without long duplicate prefixes. The result is
    EXACTLY the reference permutation (Transform.java:2383-2434), not an
    approximation."""
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("dst")
    firstp = (
        e.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= prefix_len)
        .groupBy(F.col("src").alias("node"))
        .agg(F.sort_array(F.collect_list("dst")).alias("_s"))
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("_d"))
    base = (
        nodes.join(firstp, "node", "left")
        .join(deg, "node", "left")
        .select(
            "node",
            F.coalesce("_s", F.array().cast("array<long>")).alias("_s"),
            F.coalesce("_d", F.lit(0)).alias("_d"),
        )
    )
    body, sentinel = _adj_body_sentinel(F.col("_s"), F.col("_d"), gray)
    pfx = (
        F.when(F.col("_d") == 0, F.array(sentinel))
        .when(F.col("_d") < prefix_len, F.concat(body, F.array(sentinel)))
        .otherwise(body)
    )
    pk = base.select("node", pfx.alias("_pfx"), "_d")
    gsz = pk.groupBy("_pfx").agg(F.count("*").alias("_gn"))
    pk2 = pk.join(gsz, "_pfx")
    tied = pk2.where(
        (F.col("_gn") > 1) & (F.col("_d") >= prefix_len)
    ).select("node", "_pfx")
    # full keys for the tied nodes only (all have outdegree >= prefix_len)
    tl = (
        e.join(
            tied.select(F.col("node").alias("src")), "src", "left_semi"
        )
        .groupBy(F.col("src").alias("node"))
        .agg(F.sort_array(F.collect_list("dst")).alias("_succ"))
    )
    fbody, fsent = _adj_body_sentinel(F.col("_succ"), F.size("_succ"), gray)
    fk = tl.select("node", F.concat(fbody, F.array(fsent)).alias("_fk"))
    sub_w = Window.partitionBy("_pfx").orderBy("_fk", "node")
    sub = (
        tied.join(fk, "node")
        .select("node", "_pfx", F.row_number().over(sub_w).alias("_sub"))
    )
    return pk2.join(sub.select("node", "_sub"), "node", "left").select(
        "node", "_pfx", F.coalesce("_sub", F.lit(0)).alias("_sub")
    )


def gray_code_permutation(
    edges: DataFrame, groups: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Gray-code compression ordering (Transform.grayCodePermutation,
    Transform.java:2383-2434): relabel nodes so adjacency rows appear in
    Gray-code order — rows differing in few bits become neighbours, which
    shrinks successor gaps. With ``groups`` (node, group) the sort is
    group-major — the hostByHostGrayCodePermutation analog
    (Transform.java:2455-2516). Returns (remapped_edges, permutation)."""
    from ..util.ids import assign_dense_ids

    keyed = _bounded_succ_keyed(edges, gray=True)
    if groups is not None:
        keyed = keyed.join(groups.select("node", "group"), "node", "left").select(
            "node", F.coalesce("group", F.lit(-1)).alias("_g"), "_pfx", "_sub"
        )
        perm = assign_dense_ids(
            keyed, ["_g", "_pfx", "_sub", "node"], id_col="target"
        )
    else:
        perm = assign_dense_ids(keyed, ["_pfx", "_sub", "node"], id_col="target")
    perm = perm.select("node", "target")
    return map_nodes(edges, perm), perm


def lexicographical_permutation(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Lexicographic-by-adjacency-row ordering
    (Transform.lexicographicalPermutation, Transform.java:2518-2580):
    nodes with equal/shared successor prefixes become adjacent. Same
    one-sort shape as the Gray ordering, plain array key."""
    from ..util.ids import assign_dense_ids

    keyed = _bounded_succ_keyed(edges, gray=False)
    perm = assign_dense_ids(keyed, ["_pfx", "_sub", "node"], id_col="target").select(
        "node", "target"
    )
    return map_nodes(edges, perm), perm


# -------------------------------------------------------------- subgraphs

def induced_subgraph(
    edges: DataFrame, node_set: DataFrame, reindex: bool = True
) -> tuple[DataFrame, DataFrame | None]:
    """Node-induced subgraph (ImmutableSubgraph.java:30-60): keep arcs with
    BOTH endpoints in ``node_set(node)``; optionally re-index to dense ids
    (the to/fromSupergraphNode translation). Returns (sub_edges, id_map)."""
    ns = node_set.select("node").distinct()
    kept = edges.join(
        ns.withColumnRenamed("node", "src"), "src", "left_semi"
    ).join(ns.withColumnRenamed("node", "dst"), "dst", "left_semi")
    if not reindex:
        return kept.select(*edges.columns), None
    from ..util.ids import assign_dense_ids

    id_map = assign_dense_ids(ns, ["node"], id_col="target")
    return map_nodes(kept, id_map), id_map


def degree_range_subgraph(
    edges: DataFrame, min_deg: int, max_deg: int, reindex: bool = False
) -> tuple[DataFrame, DataFrame | None]:
    """Induced subgraph of nodes with outdegree in [min_deg, max_deg)
    (DegreeRangeImmutableSubgraph.java:25-35). Nodes with no out-arcs have
    outdegree 0 and are kept iff min_deg <= 0."""
    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = all_nodes.join(
        out_deg.withColumnRenamed("src", "node"), "node", "left"
    ).select("node", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
    keep = deg.where(
        (F.col("outdeg") >= min_deg) & (F.col("outdeg") < max_deg)
    ).select("node")
    return induced_subgraph(edges, keep, reindex=reindex)


# ------------------------------------------------------------------ checks

def is_symmetric(edges: DataFrame) -> bool:
    """Check g == transpose(g) (Check.symmetry, Check.java:45-80)."""
    e = edges.select("src", "dst").distinct()
    return e.exceptAll(transpose(e)).isEmpty()


def graphs_equal(g0: DataFrame, g1: DataFrame) -> bool:
    """Extensional equality: same arc set (ImmutableGraph.equals,
    ImmutableGraph.java:731-749 — the reference's universal oracle)."""
    a = g0.select("src", "dst").distinct()
    b = g1.select("src", "dst").distinct()
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


# ----------------------------------------------- snapshot evolution analytics

def arc_diff(g0: DataFrame, g1: DataFrame) -> DataFrame:
    """Arc-set delta between two graph snapshots — the evolution
    analytics a stored-graph engine runs between crawls (the reference's
    model is compute-once/store/re-store per snapshot; this measures
    what changed between two stored snapshots).

    One row: (arcs_retained, arcs_added, arcs_removed, jaccard) where
    jaccard = |A ∩ B| / |A ∪ B| rounded to 6 (0.0 for two empty
    snapshots). Plan: distinct each side, one full-outer join on the
    arc key — a single co-partitioned shuffle, scale-safe at any |E|.
    """
    a = g0.select("src", "dst").distinct().withColumn("in_a", F.lit(1))
    b = g1.select("src", "dst").distinct().withColumn("in_b", F.lit(1))
    full = a.join(b, ["src", "dst"], "full_outer")
    return full.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("arcs_retained"),
        F.coalesce(
            F.sum(F.when(F.col("in_a").isNull(), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("arcs_added"),
        F.coalesce(
            F.sum(F.when(F.col("in_b").isNull(), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("arcs_removed"),
    ).select(
        "arcs_retained",
        "arcs_added",
        "arcs_removed",
        F.when(
            F.col("arcs_retained") + F.col("arcs_added") + F.col("arcs_removed")
            > 0,
            F.round(
                F.col("arcs_retained").cast("double")
                / (
                    F.col("arcs_retained")
                    + F.col("arcs_added")
                    + F.col("arcs_removed")
                ).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


def degree_churn(g0: DataFrame, g1: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` nodes by absolute out-degree change between two
    snapshots (hub churn — which sources gained/lost the most arcs).
    Deterministic total order: |Δ| DESC, then node ASC. Distinct arcs
    per side; two groupBy shuffles + a bounded top-k sort."""
    d0 = (
        g0.select("src", "dst").distinct()
        .groupBy("src").agg(F.count("*").alias("deg0"))
    )
    d1 = (
        g1.select("src", "dst").distinct()
        .groupBy("src").agg(F.count("*").alias("deg1"))
    )
    joined = d0.join(d1, "src", "full_outer").select(
        F.col("src").alias("node"),
        F.coalesce("deg0", F.lit(0)).cast("long").alias("deg_before"),
        F.coalesce("deg1", F.lit(0)).cast("long").alias("deg_after"),
    )
    return (
        joined.withColumn(
            "delta", (F.col("deg_after") - F.col("deg_before")).cast("long")
        )
        .orderBy(F.abs(F.col("delta")).desc(), F.col("node").asc())
        .limit(k)
    )
