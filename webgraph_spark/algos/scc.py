"""Strongly connected components — fixture-scale implementations.

The reference computes SCCs with an iterative Tarjan DFS
(algo/StronglyConnectedComponents.java:54-66) and cross-checks it in
tests against a recursive Tarjan (test/algo/StronglyConnectedComponentsTarjan.java).
DFS is inherently sequential; SURVEY.md §2.10 scopes SCC out of the
distributed core. Two implementations are provided:

- ``scc_numpy``: iterative Tarjan on collected edges — the exact
  oracle, fixture scale only (the reference's own posture);
- ``scc_coloring``: the distributed forward/backward-reachability
  coloring algorithm (Orzan/Schudy family) built from the engine's BFS
  primitive — correct at any scale, O(diameter * #components-ish)
  rounds, practical when a few large SCCs dominate (web graphs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def scc_numpy(edges_rows: list[tuple[int, int]], n: int) -> np.ndarray:
    """Iterative Tarjan; labels[v] = SCC id (ids are arbitrary)."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges_rows:
        adj[int(s)].append(int(d))
    index = np.full(n, -1)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1)
    stack: list[int] = []
    counter = 0
    n_comp = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp[w] = n_comp
                    if w == v:
                        break
                n_comp += 1
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return comp


def scc_components_spark_oracle(edges: DataFrame) -> dict[int, int]:
    """Collect a (small) edge DataFrame and run the Tarjan oracle.
    Returns {node: scc_id}. Fixture scale only — guarded."""
    rows = edges.select("src", "dst").collect()
    if len(rows) > 2_000_000:
        raise ValueError("scc oracle is fixture-scale; use scc_coloring")
    nodes = sorted({r.src for r in rows} | {r.dst for r in rows})
    remap = {v: i for i, v in enumerate(nodes)}
    comp = scc_numpy([(remap[r.src], remap[r.dst]) for r in rows], len(nodes))
    return {v: int(comp[remap[v]]) for v in nodes}


def scc_coloring(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Distributed SCC by iterated forward-backward reachability:

    repeat: color every node with the max node id that reaches it
    (forward propagation); an SCC is the set of nodes with color c that
    can reach c going backward. Peels one batch of SCCs per round —
    efficient when large SCCs dominate. Returns (node, scc)."""
    from ..algos.bfs import bfs

    spark = edges.sparkSession
    e_all = edges.select("src", "dst").distinct().persist()
    remaining = e_all
    nodes = (
        e_all.select(F.col("src").alias("node"))
        .unionByName(e_all.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    assigned = spark.createDataFrame([], "node long, scc long")
    live = nodes
    for _ in range(max_rounds):
        if live.isEmpty():
            break
        # trim: live nodes with no out-arcs or no in-arcs among the
        # remaining edges are singleton SCCs (standard trimming — peels
        # the long tail so pivot rounds only handle non-trivial SCCs)
        srcs = remaining.select(F.col("src").alias("node")).distinct()
        dsts = remaining.select(F.col("dst").alias("node")).distinct()
        trivial = (
            live.join(srcs, "node", "left_anti")
            .unionByName(live.join(dsts, "node", "left_anti"))
            .distinct()
            .select("node", F.col("node").alias("scc"))
        )
        if not trivial.isEmpty():
            trivial = trivial.localCheckpoint(eager=True)
            assigned = assigned.unionByName(trivial).localCheckpoint(eager=True)
            live = live.join(trivial.select("node"), "node", "left_anti").localCheckpoint(
                eager=True
            )
            remaining = (
                remaining.join(
                    trivial.select(F.col("node").alias("src")), "src", "left_anti"
                )
                .join(trivial.select(F.col("node").alias("dst")), "dst", "left_anti")
                .localCheckpoint(eager=True)
            )
            continue
        # pivot = max live node id; SCC(pivot) = fwd-reach ∩ bwd-reach
        pivot = live.agg(F.max("node")).collect()[0][0]
        fwd = bfs(remaining, [int(pivot)]).distances.select("node")
        bwd = bfs(
            remaining.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ),
            [int(pivot)],
        ).distances.select("node")
        scc = fwd.join(bwd, "node", "inner").select(
            "node", F.lit(int(pivot)).alias("scc")
        )
        scc = scc.localCheckpoint(eager=True)
        assigned = assigned.unionByName(scc).localCheckpoint(eager=True)
        live = live.join(scc.select("node"), "node", "left_anti").localCheckpoint(
            eager=True
        )
        remaining = (
            remaining.join(scc.select(F.col("node").alias("src")), "src", "left_anti")
            .join(scc.select(F.col("node").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    e_all.unpersist()
    nodes.unpersist()
    return assigned
