"""CC / LP / triangles / BFS vs single-process oracles (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.algos.bfs import bfs, neighbourhood_function_exact
from webgraph_spark.algos.components import (
    connected_components,
    largest_component,
    sort_components_by_size,
)
from webgraph_spark.algos.labelprop import label_propagation, label_propagation_numpy
from webgraph_spark.algos.triangles import triangle_count, triangles_per_node
from webgraph_spark.datagen.graphs import (
    complete_binary_intree,
    complete_graph,
    directed_cycle,
    erdos_renyi,
    erdos_renyi_numpy,
    two_cliques_bridge,
)
from .oracles import connected_components_numpy, triangle_count_numpy


def _partition_sets(labels):
    """component labels -> frozenset partition (id-independent compare,
    like ConnectedComponentsTest.java:32-43)."""
    groups: dict = {}
    for node, comp in labels:
        groups.setdefault(comp, set()).add(node)
    return {frozenset(v) for v in groups.values()}


# ---------------------------------------------------------------- CC

def test_cc_two_cliques(spark):
    g = two_cliques_bridge(spark, 5, 7, bridge=False)
    res = connected_components(g)
    assert res.converged
    rows = [(r.node, r.component) for r in res.labels.collect()]
    assert _partition_sets(rows) == {
        frozenset(range(5)),
        frozenset(range(5, 12)),
    }
    # hash-min labels are the component minima
    comps = {r.component for r in res.labels.collect()}
    assert comps == {0, 5}


def test_cc_bridge_joins(spark):
    g = two_cliques_bridge(spark, 5, 7, bridge=True)
    res = connected_components(g)
    rows = [(r.node, r.component) for r in res.labels.collect()]
    assert _partition_sets(rows) == {frozenset(range(12))}


@pytest.mark.parametrize("n,p,seed", [(60, 0.02, 1), (100, 0.01, 2), (100, 0.03, 3)])
def test_cc_er_vs_union_find(spark, n, p, seed):
    g = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    res = connected_components(g)
    assert res.converged
    got = {r.node: r.component for r in res.labels.collect()}
    want = connected_components_numpy(adj)
    present = adj.any(axis=1) | adj.any(axis=0)
    got_rows = [(i, got[i]) for i in range(n) if present[i]]
    want_rows = [(i, int(want[i])) for i in range(n) if present[i]]
    assert _partition_sets(got_rows) == _partition_sets(want_rows)
    # hash-min label = min node id in component: exact label equality
    for i in range(n):
        if present[i]:
            assert got[i] == int(want[i])


def test_sort_components_by_size(spark):
    g = two_cliques_bridge(spark, 5, 7, bridge=False)
    res = connected_components(g)
    ranked = sort_components_by_size(res.labels)
    rows = {r.node: r.component for r in ranked.collect()}
    # larger clique (7 nodes) -> component 0
    assert all(rows[i] == 0 for i in range(5, 12))
    assert all(rows[i] == 1 for i in range(5))


def test_largest_component(spark):
    g = two_cliques_bridge(spark, 4, 6, bridge=False)
    sub, id_map = largest_component(g)
    assert sub.count() == 6 * 5  # K6 directed arcs
    ids = sorted(r.target for r in id_map.collect())
    assert ids == list(range(6))


# ---------------------------------------------------------------- LP

@pytest.mark.parametrize("n,p,seed", [(40, 0.05, 4), (80, 0.03, 5)])
def test_label_propagation_vs_numpy(spark, n, p, seed):
    g = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    res = label_propagation(g, max_iter=5)
    want = label_propagation_numpy(adj, max_iter=5)
    got = {r.node: r.label for r in res.labels.collect()}
    present = adj.any(axis=1) | adj.any(axis=0)
    for i in range(n):
        if present[i]:
            assert got[i] == int(want[i]), f"node {i}"


def test_label_propagation_clique_converges(spark):
    res = label_propagation(complete_graph(spark, 8), max_iter=10)
    labels = {r.label for r in res.labels.collect()}
    assert labels == {0}
    assert res.converged


# ------------------------------------------------------------ triangles

def test_triangles_clique(spark):
    n = 7
    assert triangle_count(complete_graph(spark, n)) == n * (n - 1) * (n - 2) // 6


def test_triangles_cycle_zero(spark):
    assert triangle_count(directed_cycle(spark, 10)) == 0
    # C3 is one triangle after symmetrization
    assert triangle_count(directed_cycle(spark, 3)) == 1


@pytest.mark.parametrize("n,p,seed", [(40, 0.1, 6), (60, 0.08, 7), (80, 0.05, 8)])
def test_triangles_er_vs_trace(spark, n, p, seed):
    g = erdos_renyi(spark, n, p, seed=seed)
    adj = erdos_renyi_numpy(n, p, seed=seed)
    assert triangle_count(g) == triangle_count_numpy(adj)


def test_triangles_per_node_sums_to_3x(spark):
    n, p, seed = 40, 0.1, 9
    g = erdos_renyi(spark, n, p, seed=seed)
    per = triangles_per_node(g)
    total = per.groupBy().sum("triangles").collect()[0][0] or 0
    assert total == 3 * triangle_count_numpy(erdos_renyi_numpy(n, p, seed=seed))


# ---------------------------------------------------------------- BFS

def test_bfs_intree_levels(spark):
    # in-tree arcs point child->parent; BFS from a leaf walks to the root
    g = complete_binary_intree(spark, 3)  # 15 nodes
    res = bfs(g, [14])
    d = {r.node: r.dist for r in res.distances.collect()}
    assert d == {14: 0, 6: 1, 2: 2, 0: 3}
    # from the root on the transpose reaches everything
    from webgraph_spark.operators.transforms import transpose

    res2 = bfs(transpose(g), [0])
    d2 = {r.node: r.dist for r in res2.distances.collect()}
    assert len(d2) == 15 and max(d2.values()) == 3


def test_neighbourhood_function_cycle(spark):
    g = directed_cycle(spark, 5)
    nf = neighbourhood_function_exact(g, max_t=5)
    # NF(t) = n * (t+1) until saturation at n^2
    assert nf[0] == 5 and nf[1] == 10 and nf[4] == 25


def test_cc_lp_keep_self_loop_only_nodes(spark):
    """A node appearing ONLY in a self-loop is still a node: CC labels it
    as its own component, LP keeps its own label (round-1 advice: the
    engine used to drop it while a plain-endpoint oracle keeps it)."""
    from webgraph_spark.algos.components import connected_components
    from webgraph_spark.algos.labelprop import label_propagation

    g = spark.createDataFrame(
        [(0, 1), (1, 0), (7, 7)], "src long, dst long"
    )
    cc = {r.node: r.component for r in connected_components(g).labels.collect()}
    assert cc == {0: 0, 1: 0, 7: 7}
    lp = {r.node: r.label for r in label_propagation(g, max_iter=3).labels.collect()}
    assert set(lp) == {0, 1, 7} and lp[7] == 7


# -------------------------------------------------- CC: star algorithm

@pytest.mark.parametrize("n,p,seed", [(60, 0.02, 1), (100, 0.03, 3)])
def test_cc_stars_matches_hashmin_er(spark, n, p, seed):
    from webgraph_spark.algos.components import connected_components_stars

    g = erdos_renyi(spark, n, p, seed=seed)
    res = connected_components_stars(g)
    assert res.converged
    got = {r.node: r.component for r in res.labels.collect()}
    adj = erdos_renyi_numpy(n, p, seed=seed)
    want = connected_components_numpy(adj)
    present = adj.any(axis=1) | adj.any(axis=0)
    for i in range(n):
        if present[i]:
            # star fixpoint labels == min node id == hash-min labels
            assert got[i] == int(want[i])


def test_cc_stars_long_path_logarithmic_rounds(spark):
    """A 200-hop directed path: hash-min needs ~200 rounds (O(diameter));
    the star algorithm must finish in O(log n) — well under 15."""
    from webgraph_spark.algos.components import connected_components_stars

    n = 201
    g = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    res = connected_components_stars(g, max_iter=15)
    assert res.converged and res.iterations <= 15
    rows = res.labels.collect()
    assert len(rows) == n
    assert all(r.component == 0 for r in rows)


def test_cc_stars_self_loops_and_isolates(spark):
    from webgraph_spark.algos.components import connected_components_stars

    g = spark.createDataFrame(
        [(7, 7), (1, 2), (9, 9)], "src long, dst long"
    )
    res = connected_components_stars(g)
    got = {r.node: r.component for r in res.labels.collect()}
    assert got == {7: 7, 9: 9, 1: 1, 2: 1}


def test_kcore_planted(spark):
    """6-clique + pendant path: the 3-core is exactly the clique (all
    in-core degrees 5); k larger than the max core is empty."""
    from webgraph_spark.algos.kcore import kcore

    clique = [(i, j) for i in range(6) for j in range(6) if i < j]
    path = [(5, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(clique + path, "src long, dst long")
    core3 = kcore(e, k=3).collect()
    assert sorted(r["node"] for r in core3) == [0, 1, 2, 3, 4, 5]
    assert all(r["deg"] == 5 for r in core3)
    assert kcore(e, k=6).count() == 0


def test_coreness_vs_peel(spark):
    """h-index iteration equals true peel coreness on a seeded ER graph
    (independent heap-peel oracle) and on the planted clique+path."""
    import heapq
    from collections import defaultdict

    from webgraph_spark.algos.kcore import coreness
    from webgraph_spark.datagen.graphs import erdos_renyi

    def peel_coreness(arcs):
        adj = defaultdict(set)
        for s, d in arcs:
            if s != d:
                adj[s].add(d)
                adj[d].add(s)
        deg = {n: len(v) for n, v in adj.items()}
        hp = [(d, n) for n, d in deg.items()]
        heapq.heapify(hp)
        out, removed, k = {}, set(), 0
        while hp:
            d, n = heapq.heappop(hp)
            if n in removed or d != deg[n]:
                continue
            k = max(k, d)
            out[n] = k
            removed.add(n)
            for m in adj[n]:
                if m not in removed:
                    deg[m] -= 1
                    heapq.heappush(hp, (deg[m], m))
        return out

    e = erdos_renyi(spark, n=300, p=0.02, seed=9)
    want = peel_coreness([(r["src"], r["dst"]) for r in e.collect()])
    got = {r["node"]: r["c"] for r in coreness(e).collect()}
    assert got == want


def test_random_walks_valid_and_deterministic(spark):
    """Every step follows an arc, walks restart identically, dangling
    ends truncate."""
    from webgraph_spark.algos.walks import random_walks

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )  # 4 is dangling
    srcs = spark.createDataFrame([(0,)], "node long")
    w1 = random_walks(e, srcs, length=6, n_walks=3).collect()
    w2 = random_walks(e, srcs, length=6, n_walks=3).collect()
    key = lambda rows: sorted((r["walk_id"], r["step"], r["node"]) for r in rows)
    assert key(w1) == key(w2)
    arcs = {(r["src"], r["dst"]) for r in e.collect()}
    byw = {}
    for r in w1:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for wid, steps in byw.items():
        assert steps[0] == 0
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in arcs
        # if the walk ended early, it must have ended at the dangling node
        if max(steps) < 6:
            assert steps[max(steps)] == 4


def test_link_prediction_planted(spark):
    """Hand-checkable 5-node graph: AA and Jaccard match numpy math."""
    import math

    from webgraph_spark.algos.linkpred import link_prediction_scores

    # undirected: 0-2, 1-2, 0-3, 1-3, 3-4  (common nbrs of (0,1) = {2,3})
    e = spark.createDataFrame(
        [(0, 2), (1, 2), (0, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    pairs = spark.createDataFrame([(0, 1), (0, 4), (2, 4)], "a long, b long")
    out = {(r["a"], r["b"]): r for r in link_prediction_scores(e, pairs).collect()}
    r01 = out[(0, 1)]
    assert r01["common"] == 2
    # deg: 0->2, 1->2, 2->2, 3->3, 4->1 ; jaccard = 2/(2+2-2) = 1.0
    assert r01["jaccard"] == 1.0
    want_aa = round(round(1 / math.log(2), 9) + round(1 / math.log(3), 9), 6)
    assert r01["adamic_adar"] == want_aa
    # (0,4): common = {3}; jaccard = 1/(2+1-1) = 0.5
    assert out[(0, 4)]["common"] == 1 and out[(0, 4)]["jaccard"] == 0.5
    # (2,4): no common neighbours -> zeros, row preserved
    assert out[(2, 4)]["common"] == 0 and out[(2, 4)]["adamic_adar"] == 0.0


def test_clustering_and_assortativity_planted(spark):
    """Triangle + pendant: clustering 1.0 on the triangle corners that
    have no extra edges; star graph is maximally disassortative."""
    import __spark_entry__  # noqa: F401  (query-level logic lives there)
    from webgraph_spark.algos.triangles import triangles_per_node
    from webgraph_spark.operators.transforms import simplify

    e = spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long")
    tri = {r["node"]: r["triangles"] for r in triangles_per_node(e).collect()}
    assert tri == {0: 1, 1: 1, 2: 1}
    deg = {
        r["src"]: r["count"]
        for r in simplify(e).groupBy("src").count().collect()
    }
    # node 2 has degree 3 and 1 triangle -> cc = 2*1/(3*2) = 1/3
    assert deg[2] == 3


def test_cc_warm_start_same_fixpoint_fewer_rounds(spark):
    # long path: cold hash-min needs O(diameter) rounds; warm-starting
    # from the previous snapshot's labels after appending a few arcs
    # converges in a fraction of them to the SAME min-id labeling
    base = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(base, "src long, dst long")
    cold = connected_components(df, max_iter=100)
    assert cold.converged

    delta = [(60, 61), (61, 62), (100, 101)]  # extend + a new component
    df2 = spark.createDataFrame(base + delta, "src long, dst long")
    # round-count comparison is hash-min vs warm hash-min (the default
    # "auto" engine is now stars, whose cold round count is already log)
    cold2 = connected_components(df2, max_iter=100, algorithm="hashmin")
    warm2 = connected_components(df2, max_iter=100, init_labels=cold.labels)
    assert warm2.converged
    exp = {r["node"]: r["component"] for r in cold2.labels.collect()}
    got = {r["node"]: r["component"] for r in warm2.labels.collect()}
    assert got == exp
    assert warm2.iterations < cold2.iterations / 2


def test_cc_warm_start_merging_components(spark):
    # two separate chains, then a bridge arc merges them: warm labels of
    # the right chain must drain down to the global min id
    left = [(i, i + 1) for i in range(20)]
    right = [(100 + i, 101 + i) for i in range(20)]
    df = spark.createDataFrame(left + right, "src long, dst long")
    cold = connected_components(df, max_iter=100)
    df2 = spark.createDataFrame(left + right + [(20, 100)], "src long, dst long")
    warm = connected_components(df2, max_iter=100, init_labels=cold.labels)
    assert warm.converged
    labs = {r["component"] for r in warm.labels.collect()}
    assert labs == {0}


def test_cc_incremental_contraction_matches_cold(spark):
    # random base + random deltas (including brand-new nodes): folding
    # the delta into the previous labels by contraction must equal a
    # cold run over the union graph — and never rescans the base edges
    from webgraph_spark.algos.components import merge_components_incremental

    rng = np.random.default_rng(77)
    base = [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, 120, 260), rng.integers(0, 120, 260))
    ]
    delta = [
        (int(s), int(d))
        for s, d in zip(rng.integers(0, 160, 40), rng.integers(0, 160, 40))
    ] + [(300, 301), (301, 301)]  # new chain + a loop-only new node
    df = spark.createDataFrame(base, "src long, dst long")
    prev = connected_components(df, max_iter=100)
    inc = merge_components_incremental(
        prev.labels, spark.createDataFrame(delta, "src long, dst long")
    )
    cold = connected_components(
        spark.createDataFrame(base + delta, "src long, dst long"), max_iter=100
    )
    exp = {r["node"]: r["component"] for r in cold.labels.collect()}
    got = {r["node"]: r["component"] for r in inc.labels.collect()}
    assert got == exp


def test_node2vec_walks_match_python_replay(spark):
    """Second-order walks vs an independent pure-Python replay of the
    integer-weight pick (back=4/p, arc=4, explore=4/q; first dst whose
    cumulative weight exceeds md5 mod total), plus arc validity."""
    import hashlib

    from webgraph_spark.algos.walks import node2vec_walks

    arcs = [
        (0, 1), (0, 2), (1, 0), (1, 2), (1, 3), (2, 3), (2, 0),
        (3, 1), (3, 4), (4, 0), (4, 2),
    ]
    e = spark.createDataFrame(arcs, "src long, dst long")
    srcs = spark.createDataFrame([(0,), (3,)], "node long")
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in node2vec_walks(e, srcs, length=5, n_walks=2, p=2.0, q=0.5)
        .collect()
    )

    def h(wid, t, node):
        return int(
            hashlib.md5(f"n2v:{wid}:{t}:{node}".encode()).hexdigest()[:15], 16
        )

    succ = {}
    arcset = set(arcs)
    for s, d in sorted(set(arcs)):
        succ.setdefault(s, []).append(d)
    want = []
    for node0 in (0, 3):
        for j in range(2):
            wid = node0 * 2 + j
            want.append((wid, 0, node0))
            outs = succ[node0]
            cur = outs[h(wid, 1, node0) % len(outs)]
            prev = node0
            want.append((wid, 1, cur))
            for t in range(2, 6):
                cands = succ.get(cur)
                if not cands:
                    break
                ws = [
                    2 if d == prev else (4 if (prev, d) in arcset else 8)
                    for d in cands
                ]
                r = h(wid, t, cur) % sum(ws)
                cum = 0
                for d, wt in zip(cands, ws):
                    cum += wt
                    if cum > r:
                        prev, cur = cur, d
                        break
                want.append((wid, t, cur))
    assert got == sorted(want)
    byw = {}
    for wid, t, node in got:
        byw.setdefault(wid, {})[t] = node
    for steps in byw.values():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in arcset


def test_wl_refinement_matches_python_and_iso_invariant(spark):
    """WL labels vs an independent Python replay (same md5 multiset-sum
    hash), and the label HISTOGRAM is invariant under node renaming
    (labels are id-free: degree init + structure-only refinement)."""
    import hashlib
    from collections import Counter

    from webgraph_spark.algos.features import wl_refinement

    arcs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 4)]

    def md5l(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_wl(arcs, iters=3):
        P = (1 << 31) - 1
        adj = {}
        nodes = set()
        for s, d in arcs:
            nodes.update((s, d))
            if s != d:
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
        lab = {v: len(adj.get(v, ())) for v in nodes}
        for _ in range(iters):
            nxt = {}
            for v in nodes:
                nbrs = adj.get(v, ())
                s = sum(md5l(f"wl:{lab[u]}") % P for u in nbrs) % P
                nxt[v] = md5l(f"{lab[v]}:{s}:{len(nbrs)}")
            lab = nxt
        return lab

    want = py_wl(arcs)
    e = spark.createDataFrame(arcs, "src long, dst long")
    got = {r["node"]: r["wl"] for r in wl_refinement(e, iters=3).collect()}
    assert got == want

    # rename nodes by a permutation: histogram of labels is unchanged
    perm = {0: 40, 1: 17, 2: 99, 3: 3, 4: 61, 5: 8}
    e2 = spark.createDataFrame(
        [(perm[s], perm[d]) for s, d in arcs], "src long, dst long"
    )
    got2 = [r["wl"] for r in wl_refinement(e2, iters=3).collect()]
    assert Counter(got2) == Counter(got.values())
    # the 4-cycle-diagonal nodes 1 and 3 are symmetric: same label;
    # degree-1 leaf 5 differs from everything else
    assert got[1] == got[3] and got[5] not in {got[v] for v in (0, 1, 2, 3, 4)}


def test_doulion_matches_python_replay_and_is_close(spark):
    """Deterministic DOULION: the kept-edge set and sampled count match
    a pure-Python replay of the md5 coin + brute-force count; on a
    dense ER graph the k=2 estimate lands within 40% of exact."""
    import hashlib
    from itertools import combinations

    import numpy as np

    from webgraph_spark.algos.triangles import doulion_estimate, triangle_count

    rng = np.random.default_rng(5)
    arcs = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 60, 1400), rng.integers(0, 60, 1400))
            if a != b
        }
    )
    e = spark.createDataFrame(arcs, "src long, dst long")
    k = 2
    kept_n, tri, est = doulion_estimate(e, k=k)

    def coin(a, b):
        return (
            int(hashlib.md5(f"dl:{a}:{b}".encode()).hexdigest()[:15], 16) % k == 0
        )

    pairs = {(min(a, b), max(a, b)) for a, b in arcs}
    kept = {p for p in pairs if coin(*p)}
    adj = {}
    for a, b in kept:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want_tri = sum(
        1
        for u in adj
        for v, w in combinations(sorted(adj[u]), 2)
        if u < v and w in adj.get(v, ())
    )
    assert kept_n == len(kept) and tri == want_tri
    assert est == tri * k**3
    exact = triangle_count(e)
    assert exact > 50 and abs(est - exact) / exact < 0.4


def test_rmat_matches_python_replay_and_parallelism_invariant(spark):
    """R-MAT edges vs a pure-Python replay of the md5 quadrant coins;
    identical at 1 and 8 partitions; skew bias points at low ids."""
    import hashlib

    from webgraph_spark.datagen.graphs import rmat

    scale, n, seed = 6, 400, 3
    TA, TB, TC = (
        int(0.57 * (1 << 60)),
        int(0.76 * (1 << 60)),
        int(0.95 * (1 << 60)),
    )

    def py_edge(i):
        s = d = 0
        for lvl in range(scale):
            u = int(
                hashlib.md5(f"rmat:{seed}:{i}:{lvl}".encode()).hexdigest()[:15],
                16,
            )
            q = 0 if u < TA else (1 if u < TB else (2 if u < TC else 3))
            s += (q >> 1) * (1 << lvl)
            d += (q & 1) * (1 << lvl)
        return (s, d)

    want = sorted(py_edge(i) for i in range(n))
    got1 = sorted(
        (r["src"], r["dst"])
        for r in rmat(spark, scale, n, seed=seed, num_partitions=1).collect()
    )
    got8 = sorted(
        (r["src"], r["dst"])
        for r in rmat(spark, scale, n, seed=seed, num_partitions=8).collect()
    )
    assert got1 == want and got8 == want
    # a=0.57 biases both endpoint bits toward 0: the low half of the id
    # space must hold clearly more than half of the endpoints
    low = sum(1 for s, d in want for x in (s, d) if x < (1 << (scale - 1)))
    assert low > 1.15 * n


def test_node2vec_hub_cap_matches_duckdb_twin(spark):
    """hub_cap fallback (uniform pick on nodes above the cap) replays
    identically in the DuckDB twin, on a graph with one hub over the
    cap; capped steps still follow arcs."""
    import duckdb
    import pandas as pd

    from webgraph_spark.algos.walks import node2vec_walks, node2vec_walks_sql

    arcs = [(0, i) for i in range(1, 9)]  # node 0: outdeg 8 > cap 4
    arcs += [(i, (i % 8) + 1) for i in range(1, 9)]
    arcs += [(i, 0) for i in range(1, 5)]
    e = spark.createDataFrame(arcs, "src long, dst long")
    srcs = spark.createDataFrame([(0,), (3,)], "node long")
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in node2vec_walks(
            e, srcs, length=5, n_walks=2, p=2.0, q=0.5, hub_cap=4
        ).collect()
    )

    con = duckdb.connect()
    con.register("edges_pd", pd.DataFrame(arcs, columns=["src", "dst"]))
    sql = (
        "WITH edges AS (SELECT * FROM edges_pd), "
        "wsrc AS (SELECT unnest([0, 3]) AS node),"
        + node2vec_walks_sql(length=5, n_walks=2, p=2.0, q=0.5, hub_cap=4)
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    arcset = set(arcs)
    byw = {}
    for wid, t, node in got:
        byw.setdefault(wid, {})[t] = node
    for steps in byw.values():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in arcset
