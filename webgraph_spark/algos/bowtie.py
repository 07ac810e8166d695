"""Bowtie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000) — THE classic whole-web structural
analysis the reference's corpus (web crawls) is famous for.

Relative to a pivot node inside the giant strongly connected core:

- CORE       = SCC(pivot) = forward-reach(pivot) ∩ backward-reach(pivot)
- IN         = backward-reach(pivot) \\ CORE   (can reach the core)
- OUT        = forward-reach(pivot)  \\ CORE   (reachable from the core)
- TENDRILS (+TUBES, merged as in most replications) = nodes weakly
  connected to the core but in none of the above
- DISCONNECTED = everything else

Exactly Broder's method: when the pivot lies in the giant SCC, the
decomposition is the canonical bowtie; the caller picks a deterministic
pivot (or verifies membership via scc.py first).

Scale shape: THREE set-reachability BFS sweeps (forward, backward on
the transposed table, undirected from the whole core as a seed SET) —
each is the frontier semi/anti-join loop of algos/bfs.py, i.e. per
round one co-partitioned join + one distinct + one anti-join, state
O(n) with no per-source blow-up. The category assignment is then four
anti-joins over id sets. This is how you bowtie a 100-TB crawl: no
transitive closure, no all-pairs anything.

Reference analog: the StronglyConnectedComponents + reachability
tooling family (SURVEY.md §2.10; algos/scc.py, algos/bfs.py) composed
into the published analysis webgraph datasets ship with.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..operators.transforms import symmetrize
from .bfs import bfs

CATEGORIES = ["core", "in", "out", "tendrils_tubes", "disconnected"]


@dataclass
class BowtieResult:
    counts: DataFrame      # (component: string, n_nodes: long) — all 5 rows
    membership: DataFrame  # (node: long, component: string)
    rounds: tuple[int, int, int]  # (fwd, bwd, weak) BFS rounds to fixpoint


def bowtie(
    edges: DataFrame,
    pivot: int,
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> BowtieResult:
    """Decompose ``edges(src, dst)`` relative to ``pivot``.

    Raises if any reachability sweep fails to reach its fixpoint within
    ``max_rounds`` (truncated reachability would silently misclassify —
    the same discipline as scc.py's truncation raise).
    """
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )

    fwd_r = bfs(e, [pivot], max_rounds=max_rounds, num_partitions=num_partitions)
    bwd_r = bfs(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        [pivot],
        max_rounds=max_rounds,
        num_partitions=num_partitions,
    )
    fwd = fwd_r.distances.select("node").persist()
    bwd = bwd_r.distances.select("node").persist()

    core = fwd.join(bwd, "node").persist()
    in_ = bwd.join(core, "node", "left_anti")
    out = fwd.join(core, "node", "left_anti")

    weak_r = bfs(
        symmetrize(e),
        core,
        max_rounds=max_rounds,
        num_partitions=num_partitions,
    )
    if max(fwd_r.rounds, bwd_r.rounds, weak_r.rounds) >= max_rounds:
        raise RuntimeError(
            f"bowtie reachability truncated at max_rounds={max_rounds}; "
            "results would misclassify nodes — raise max_rounds"
        )
    weak = weak_r.distances.select("node")

    reached = core.unionByName(in_).unionByName(out)
    tend = weak.join(reached, "node", "left_anti")
    disc = nodes.join(weak, "node", "left_anti")

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select("node", F.lit(name).alias("component"))

    membership = (
        tag(core, "core")
        .unionByName(tag(in_, "in"))
        .unionByName(tag(out, "out"))
        .unionByName(tag(tend, "tendrils_tubes"))
        .unionByName(tag(disc, "disconnected"))
    )
    # cut lineage so the reachability caches can be released now rather
    # than leaking for the rest of the session
    membership = membership.localCheckpoint(eager=True)
    for df in (core, fwd, bwd, nodes):
        df.unpersist()
    spark = edges.sparkSession
    cats = spark.createDataFrame(
        [(c,) for c in CATEGORIES], "component string"
    )
    counts = (
        cats.join(
            membership.groupBy("component").agg(
                F.count("*").alias("n_nodes")
            ),
            "component",
            "left",
        )
        .select(
            "component",
            F.coalesce("n_nodes", F.lit(0)).cast("long").alias("n_nodes"),
        )
    )
    return BowtieResult(
        counts=counts,
        membership=membership,
        rounds=(fwd_r.rounds, bwd_r.rounds, weak_r.rounds),
    )
