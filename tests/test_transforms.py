"""Transform semantics vs the reference's TransformTest patterns."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from webgraph_spark.datagen.graphs import (
    complete_binary_intree,
    directed_cycle,
    erdos_renyi,
    erdos_renyi_numpy,
)
from webgraph_spark.operators.transforms import (
    compose,
    compose_semiring,
    degree_range_subgraph,
    filter_arcs,
    graphs_equal,
    induced_subgraph,
    is_symmetric,
    line_graph,
    map_nodes,
    no_loops,
    random_permutation,
    simplify,
    symmetrize,
    transpose,
    union_graphs,
)


def _arcs(df):
    return sorted((r.src, r.dst) for r in df.select("src", "dst").distinct().collect())


def test_transpose_involution(spark):
    g = erdos_renyi(spark, 40, 0.1, seed=11)
    assert graphs_equal(transpose(transpose(g)), g)
    a = erdos_renyi_numpy(40, 0.1, seed=11)
    got = _arcs(transpose(g))
    want = sorted((int(d), int(s)) for s, d in zip(*np.nonzero(a)))
    assert got == want


def test_symmetrize_is_symmetric(spark):
    g = erdos_renyi(spark, 30, 0.1, seed=3)
    s = symmetrize(g)
    assert is_symmetric(s)
    # union of g and transpose exactly
    assert graphs_equal(s, union_graphs(g, transpose(g)))


def test_simplify_no_loops_symmetric(spark):
    g = spark.createDataFrame([(0, 0), (0, 1), (1, 2), (2, 2)], "src long, dst long")
    s = simplify(g)
    arcs = _arcs(s)
    assert arcs == [(0, 1), (1, 0), (1, 2), (2, 1)]
    assert is_symmetric(s)


def test_filter_and_no_loops(spark):
    g = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (2, 1)], "src long, dst long"
    )
    assert _arcs(no_loops(g)) == [(0, 1), (1, 0), (2, 1)]
    assert _arcs(filter_arcs(g, F.col("src") < F.col("dst"))) == [(0, 1)]


def test_compose_matrix_product(spark):
    n = 25
    g0 = erdos_renyi(spark, n, 0.15, seed=21)
    g1 = erdos_renyi(spark, n, 0.15, seed=22)
    a0 = erdos_renyi_numpy(n, 0.15, seed=21)
    a1 = erdos_renyi_numpy(n, 0.15, seed=22)
    want_adj = (a0.astype(int) @ a1.astype(int)) > 0
    got = _arcs(compose(g0, g1))
    want = sorted((int(s), int(d)) for s, d in zip(*np.nonzero(want_adj)))
    assert got == want


def test_compose_semiring_min_plus(spark):
    # path weights: shortest 2-hop distance
    g = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 5.0), (1, 3, 1.0), (2, 3, 1.0)],
        "src long, dst long, w double",
    )
    r = compose_semiring(g, g, "w")
    rows = {(x.src, x.dst): x.w for x in r.collect()}
    assert rows[(0, 3)] == 2.0  # min(1+1, 5+1)


def test_map_nodes_quotient_and_delete(spark):
    g = directed_cycle(spark, 6)
    # merge even nodes into 0, odd into 1 -> arcs {(0,1),(1,0)}
    mapping = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "node long, target long"
    )
    assert _arcs(map_nodes(g, mapping)) == [(0, 1), (1, 0)]
    # deletion: drop node 3 -> cycle broken, arcs (2,3),(3,4) gone
    partial = spark.createDataFrame(
        [(i, i) for i in range(6) if i != 3], "node long, target long"
    )
    got = _arcs(map_nodes(g, partial))
    assert (2, 3) not in got and (3, 4) not in got and (1, 2) in got


def test_random_permutation_preserves_structure(spark):
    g = complete_binary_intree(spark, 3)
    mapped, perm = random_permutation(g, seed=5)
    # permutation is a bijection onto 0..n-1
    p = perm.toPandas()
    assert sorted(p["target"]) == list(range(len(p)))
    # arc count preserved
    assert mapped.count() == g.count()


def test_induced_subgraph(spark):
    g = erdos_renyi(spark, 20, 0.2, seed=8)
    keep = spark.createDataFrame([(i,) for i in range(10)], "node long")
    sub, id_map = induced_subgraph(g, keep, reindex=True)
    a = erdos_renyi_numpy(20, 0.2, seed=8)
    want = sorted(
        (int(s), int(d)) for s, d in zip(*np.nonzero(a[:10, :10]))
    )
    assert _arcs(sub) == want  # nodes 0..9 keep ids (dense order)


def test_degree_range_subgraph(spark):
    g = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)], "src long, dst long"
    )
    # keep nodes with outdeg in [1, 2): nodes 1 (deg1), 2 (deg1); node 3 deg0, node 0 deg3
    sub, _ = degree_range_subgraph(g, 1, 2, reindex=False)
    assert _arcs(sub) == [(1, 2)]


def test_line_graph(spark):
    g = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    line, arcs = line_graph(g)
    # triangle cycle -> line graph is also a 3-cycle
    assert line.count() == 3
    ids = {(r.src, r.dst): r.arc_id for r in arcs.collect()}
    got = {(r.src, r.dst) for r in line.collect()}
    assert got == {
        (ids[(0, 1)], ids[(1, 2)]),
        (ids[(1, 2)], ids[(2, 0)]),
        (ids[(2, 0)], ids[(0, 1)]),
    }


def test_dot_export(spark):
    from webgraph_spark.operators.export import to_dot

    g = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    dot = to_dot(g, "fixture")
    assert dot.startswith("digraph fixture {")
    assert "0 -> 1;" in dot and "1 -> 2;" in dot


def test_gray_code_permutation_bijection_and_determinism(spark):
    from webgraph_spark.operators.transforms import gray_code_permutation
    from webgraph_spark.datagen.graphs import erdos_renyi

    g = erdos_renyi(spark, 60, 0.08, seed=5)
    remapped, perm = gray_code_permutation(g)
    rows = perm.collect()
    nodes = {r.node for r in rows}
    targets = sorted(r.target for r in rows)
    assert targets == list(range(len(rows)))  # dense bijection
    assert remapped.count() == g.select("src", "dst").distinct().count()
    # deterministic across runs
    _, perm2 = gray_code_permutation(g)
    assert sorted((r.node, r.target) for r in perm2.collect()) == sorted(
        (r.node, r.target) for r in rows
    )


def test_gray_groups_sorts_group_major(spark):
    from webgraph_spark.operators.transforms import gray_code_permutation
    import pyspark.sql.functions as F

    g = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 4)], "src long, dst long"
    )
    groups = spark.createDataFrame(
        [(n, n % 2) for n in range(6)], "node long, group long"
    )
    _, perm = gray_code_permutation(g, groups=groups)
    got = {r.node: r.target for r in perm.collect()}
    evens = sorted(got[n] for n in (0, 2, 4))
    odds = sorted(got[n] for n in (1, 3, 5))
    assert max(evens) < min(odds)  # group-major blocks


def test_bounded_key_equals_full_key_order(spark):
    """The two-phase bounded sort key must reproduce EXACTLY the
    one-sort full-array ordering, including when phase-2 tiebreaks fire
    (prefix_len=3 forces long shared prefixes into tie groups)."""
    from webgraph_spark.datagen.graphs import erdos_renyi
    from webgraph_spark.operators.transforms import (
        _bounded_succ_keyed,
        _succ_key,
    )
    from webgraph_spark.util.ids import assign_dense_ids

    base = erdos_renyi(spark, 40, 0.15, seed=13)
    # clone several adjacency rows so nodes share identical long prefixes
    clones = base.where(F.col("src") == 1).select(
        (F.col("src") + 100).alias("src"), "dst"
    )
    near = base.where((F.col("src") == 2) & (F.col("dst") < 30)).select(
        (F.col("src") + 200).alias("src"), "dst"
    )
    g = base.unionByName(clones).unionByName(near)
    for gray in (True, False):
        full = assign_dense_ids(
            _succ_key(g, gray=gray), ["_key", "node"], id_col="target"
        )
        for p in (3, 5, 64):
            bounded = assign_dense_ids(
                _bounded_succ_keyed(g, gray=gray, prefix_len=p),
                ["_pfx", "_sub", "node"],
                id_col="target",
            )
            want = sorted((r.node, r.target) for r in full.collect())
            got = sorted((r.node, r.target) for r in bounded.collect())
            assert got == want, (gray, p)


def test_gray_permutation_hub_graph(spark):
    """A 10^5-out-degree hub must not materialize a giant sort-key row:
    the bounded key caps every row at prefix_len+1 longs, and the hub
    (unique prefix) needs no phase-2 full key at all."""
    from webgraph_spark.operators.transforms import gray_code_permutation

    hub = spark.range(1, 100_001).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    tail = spark.createDataFrame([(5, 3), (7, 3)], "src long, dst long")
    g = hub.unionByName(tail)
    _, perm = gray_code_permutation(g)
    rows = perm.collect()  # nodes: hub 0 + dsts 1..100000 (tail nodes included)
    assert len(rows) == 100_001
    assert sorted(r.target for r in rows) == list(range(100_001))


def test_ordering_compresses_gamma_bits(spark):
    """Gray / lexicographic / degree orderings must beat a random
    relabeling on the gamma-coded bits/link of the packed graph — the
    reference's compression-ordering headline (Transform.java:2383-2580,
    BVGraph properties bits/link)."""
    from webgraph_spark.operators.csr import gamma_bits_per_link, pack_csr
    from webgraph_spark.operators.transforms import (
        gray_code_permutation,
        lexicographical_permutation,
        random_permutation,
    )
    from webgraph_spark.datagen.transcripts import TranscriptSpec, generate_transcripts
    from webgraph_spark.graph.edges import build_node_dictionary, extract_edges, simple_edges

    tr = generate_transcripts(
        spark, n_convs=300, spec=TranscriptSpec(seed=3, max_turns=15, n_tools=40)
    )
    edges = simple_edges(extract_edges(tr, build_node_dictionary(tr))).persist()

    def bits(e):
        return gamma_bits_per_link(pack_csr(e, num_blocks=8)).collect()[0][
            "bits_per_link"
        ]

    rnd, _ = random_permutation(edges, seed=99)
    gray, _ = gray_code_permutation(edges)
    lex, _ = lexicographical_permutation(edges)
    b_rnd, b_gray, b_lex, b_conv = bits(rnd), bits(gray), bits(lex), bits(edges)
    edges.unpersist()
    # the conversation-clustered dictionary order and both adjacency-row
    # orderings all beat random
    assert b_gray < b_rnd, (b_gray, b_rnd)
    assert b_lex < b_rnd, (b_lex, b_rnd)
    assert b_conv < b_rnd, (b_conv, b_rnd)


def test_mask_arcs(spark):
    from webgraph_spark.operators.transforms import mask_arcs

    g = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    mask = spark.createDataFrame([(0, 2), (2, 0), (5, 5)], "src long, dst long")
    got = sorted((r.src, r.dst) for r in mask_arcs(g, mask).collect())
    assert got == [(0, 1), (1, 2)]


def test_intervals_to_arcs(spark):
    from webgraph_spark.operators.transforms import intervals_to_arcs

    iv = spark.createDataFrame(
        [(0, 3, 5), (1, 7, 7), (2, 9, 8)], "src long, lo long, hi long"
    )
    got = sorted((r.src, r.dst) for r in intervals_to_arcs(iv).collect())
    assert got == [(0, 3), (0, 4), (0, 5), (1, 7)]


def test_relabel_arcs(spark):
    """ArcRelabelledImmutableGraph analog: Column-expression strategy,
    the reference's int-conversion strategy (a cast), and the
    (label, src, dst) callable signature."""
    from pyspark.sql import functions as F

    from webgraph_spark.operators.transforms import relabel_arcs

    g = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 20), (2, 0, 30)], "src long, dst long, w long"
    )
    # INT_LABEL_CONVERSION_STRATEGY analog: value-preserving type change
    got = relabel_arcs(g, "w", F.col("w").cast("int"))
    assert dict(got.dtypes)["w"] == "int"
    assert sorted(r.w for r in got.collect()) == [10, 20, 30]
    # callable strategy sees (label, source, target) like convert()
    got2 = relabel_arcs(
        g, "w", lambda lab, s, d: lab + s * 100 + d, new_label_col="w2"
    )
    rows = sorted((r.src, r.dst, r.w2) for r in got2.collect())
    assert rows == [(0, 1, 11), (1, 2, 122), (2, 0, 230)]
    assert "w" not in got2.columns


def test_bidirectional_graph_views(spark):
    """BidirectionalImmutableGraph analog: successors + predecessors from
    one edge table, co-partitioned forward/backward views."""
    from webgraph_spark.graph.bidirectional import BidirectionalGraph

    g = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)], "src long, dst long"
    )
    bg = BidirectionalGraph(g, num_partitions=4)
    assert bg.successors_of(0) == [1, 2]
    assert bg.predecessors_of(2) == [0, 1, 3]
    assert bg.successors_of(3) == [2]
    assert bg.predecessors_of(3) == []
    od = {r.node: r.outdeg for r in bg.out_degrees().collect()}
    ind = {r.node: r.indeg for r in bg.in_degrees().collect()}
    assert od == {0: 2, 1: 1, 2: 1, 3: 1}
    assert ind == {1: 1, 2: 3, 0: 1}
    # both physical views hold the same arc multiset, transposed
    fwd = sorted((r.src, r.dst) for r in bg.fwd.collect())
    bwd = sorted((r.dst, r.src) for r in bg.bwd.collect())
    assert fwd == bwd
    bg.unpersist()


def test_assign_dense_ids_stable_under_plan_duplication(spark):
    """Regression: the dictionary used on BOTH sides of a join (the
    map_nodes shape) must be one evaluation, not two — re-executed
    range partitioning samples fresh bounds and can disagree between
    branches, silently corrupting remaps."""
    from webgraph_spark.util.ids import assign_dense_ids

    df = spark.range(0, 5000).select(F.col("id").alias("node"))
    idm = assign_dense_ids(df, ["node"], id_col="target")
    a = idm.select("node", F.col("target").alias("t1"))
    b = idm.select("node", F.col("target").alias("t2"))
    assert a.join(b, "node").where("t1 <> t2").count() == 0
    # and the assignment is the total order over the key
    rows = idm.orderBy("node").collect()
    assert [r["target"] for r in rows] == list(range(5000))


# ------------------------------------------------- snapshot evolution

def test_arc_diff_counts_and_jaccard(spark):
    from webgraph_spark.operators.transforms import arc_diff

    g0 = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 2), (3, 4)], "src long, dst long"
    )  # dup arc collapses
    g1 = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (5, 7)], "src long, dst long"
    )
    r = arc_diff(g0, g1).first()
    # A = {01,02,12,34}, B = {01,12,56,57}: kept {01,12}, added {56,57},
    # removed {02,34}; union = 6
    assert (r.arcs_retained, r.arcs_added, r.arcs_removed) == (2, 2, 2)
    assert r.jaccard == round(2 / 6, 6)


def test_arc_diff_empty_sides(spark):
    from webgraph_spark.operators.transforms import arc_diff

    empty = spark.createDataFrame([], "src long, dst long")
    g = spark.createDataFrame([(0, 1)], "src long, dst long")
    r = arc_diff(empty, g).first()
    assert (r.arcs_retained, r.arcs_added, r.arcs_removed, r.jaccard) == (
        0, 1, 0, 0.0,
    )
    r2 = arc_diff(empty, empty).first()
    assert (r2.arcs_retained, r2.arcs_added, r2.arcs_removed, r2.jaccard) == (
        0, 0, 0, 0.0,
    )


def test_degree_churn_orders_by_abs_delta_then_node(spark):
    from webgraph_spark.operators.transforms import degree_churn

    g0 = spark.createDataFrame(
        [(0, d) for d in range(5)] + [(1, d) for d in range(2)] + [(2, 9)],
        "src long, dst long",
    )
    g1 = spark.createDataFrame(
        [(0, d) for d in range(1)] + [(1, d) for d in range(4)]
        + [(3, 7), (3, 8)],
        "src long, dst long",
    )
    rows = degree_churn(g0, g1, k=10).collect()
    # deltas: 0: 5->1 = -4; 1: 2->4 = +2; 2: 1->0 = -1; 3: 0->2 = +2
    assert [(r.node, r.deg_before, r.deg_after, r.delta) for r in rows] == [
        (0, 5, 1, -4), (1, 2, 4, 2), (3, 0, 2, 2), (2, 1, 0, -1),
    ]
