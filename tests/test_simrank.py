"""Fingerprint SimRank: pure-Python replay of the deterministic
reverse walks, plus structural sanity on a co-citation fixture."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from webgraph_spark.algos.linkpred import simrank_fingerprint
from webgraph_spark.datagen.graphs import erdos_renyi


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def simrank_python(edges, n_walks=8, length=4, decay=0.5, k=20, max_bucket=64):
    """Replay of the exact operator contract on a Python edge list."""
    # reverse graph, dst-sorted successor lists with 0-based index
    rev = defaultdict(set)
    nodes = set()
    for s, d in edges:
        rev[d].add(s)
        nodes.update((s, d))
    succ = {v: sorted(ns) for v, ns in rev.items()}
    # walks: walk_id = node * n_walks + j; step picks
    # md5(walk_id:t:node) mod outdeg over the sorted successor list
    pos_rows = []  # (r, step, node_at_step, walker_node)
    for v in sorted(nodes):
        for j in range(n_walks):
            wid = v * n_walks + j
            cur = v
            for t in range(1, length + 1):
                ns = succ.get(cur)
                if not ns:
                    break
                cur = ns[_md5_long(f"{wid}:{t}:{cur}") % len(ns)]
                pos_rows.append((j, t, cur, v))
    # hub cap: per (r, step, node) keep the max_bucket lowest walkers
    buckets = defaultdict(list)
    for r, t, node, w in pos_rows:
        buckets[(r, t, node)].append(w)
    first_meet = {}
    for (r, t, node), ws in buckets.items():
        ws = sorted(ws)[:max_bucket]
        for i in range(len(ws)):
            for jx in range(i + 1, len(ws)):
                key = (ws[i], ws[jx], r)
                if key not in first_meet or t < first_meet[key]:
                    first_meet[key] = t
    scores = defaultdict(float)
    for (a, b, r), t in first_meet.items():
        scores[(a, b)] += float(f"{decay ** t:.12f}")
    out = [
        (a, b, round(s / n_walks, 9)) for (a, b), s in scores.items()
    ]
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return out[:k]


@pytest.mark.parametrize("n,p,seed", [(30, 0.15, 2), (50, 0.08, 6)])
def test_simrank_matches_python_replay(spark, n, p, seed):
    g = erdos_renyi(spark, n, p, seed=seed)
    rows = [(r.src, r.dst) for r in g.collect()]
    want = simrank_python(rows)
    got = [
        (r.a, r.b, r.sim)
        for r in simrank_fingerprint(g, n_walks=8, length=4, k=20).collect()
    ]
    assert got == want


def test_simrank_identical_in_neighbourhoods_score_high(spark):
    # a and b are both cited by the same three hubs; reverse walks from
    # a and b land on the same node at step 1 with probability 1/3 per
    # shared chooser -> strong similarity. c is cited by nobody shared.
    rows = []
    for h in (100, 101, 102):
        rows += [(h, 1), (h, 2)]
    rows += [(200, 3)]
    # give the citing hubs somewhere to walk (reverse successors exist)
    g = spark.createDataFrame(rows, "src long, dst long")
    out = simrank_fingerprint(g, n_walks=16, length=2, k=5).collect()
    top = out[0]
    assert {top.a, top.b} == {1, 2}
    # expected value: meet at step 1 w.p. 1/3 (three shared citers),
    # contribution decay^1 = 0.5 -> E[sim] ~ 0.167
    assert top.sim > 0.1
