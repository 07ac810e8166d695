"""Transcripts -> link graph: node dictionary and edge extraction.

The graph (FIXTURES.md §2):
- nodes: one per turn ``(conv_id, turn_idx)`` and one per distinct tool;
- turn-sequence arcs: (conv, i) -> (conv, i+1) under stable
  (conv_id, turn_idx) ordering;
- tool-reference arcs: turn -> tool whenever the turn references a tool,
  and tool -> first turn using it per conversation (keeps tools
  non-dangling, so PageRank mass recirculates).

Dense node ids are assigned by the total order (kind, conv_id, turn_idx,
tool) with turn nodes first, clustered by conversation — the
compression-friendly ordering (reference analog: ordering permutations
Transform.java:2383-2580; raw-id->dense-id ingestion
ScatteredArcsASCIIGraph.java:60-86; entity contraction
BuildHostMap.java:72-110).

Everything is pure DataFrame algebra (joins + aggregations); Catalyst
plans the shuffles. No UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..util.ids import assign_dense_ids

KIND_TURN = 0
KIND_TOOL = 1


def build_node_dictionary(transcripts: DataFrame) -> DataFrame:
    """Node dictionary ``(kind, conv_id, turn_idx, tool, node_id)``.

    node_id is dense 0..n-1 ordered by (kind, conv_id, turn_idx, tool):
    all turn nodes ordered by conversation/turn, then tool nodes by name.
    """
    turn_nodes = transcripts.select(
        F.lit(KIND_TURN).alias("kind"),
        "conv_id",
        "turn_idx",
        F.lit(None).cast("string").alias("tool"),
    ).distinct()
    tool_nodes = (
        transcripts.where(F.col("tool").isNotNull())
        .select("tool")
        .distinct()
        .select(
            F.lit(KIND_TOOL).alias("kind"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            "tool",
        )
    )
    nodes = turn_nodes.unionByName(tool_nodes)
    # NULLs order first in Spark ASC; keys are unique per kind so the
    # total order is well-defined.
    return assign_dense_ids(nodes, ["kind", "conv_id", "turn_idx", "tool"])


def extract_edges(transcripts: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Edge table ``(src: long, dst: long, kind: string)``.

    kind ∈ {"seq", "turn_tool", "tool_turn"}.
    """
    if nodes is None:
        nodes = build_node_dictionary(transcripts)
    turn_ids = nodes.where(F.col("kind") == KIND_TURN).select(
        "conv_id", "turn_idx", F.col("node_id")
    )
    tool_ids = nodes.where(F.col("kind") == KIND_TOOL).select(
        F.col("tool"), F.col("node_id").alias("tool_id")
    )

    # 1. turn-sequence arcs: consecutive turns within a conversation
    t1 = turn_ids.alias("a")
    t2 = turn_ids.select(
        "conv_id", (F.col("turn_idx") - 1).alias("turn_idx"), F.col("node_id").alias("next_id")
    ).alias("b")
    seq = (
        t1.join(t2, on=["conv_id", "turn_idx"])
        .select(
            F.col("node_id").alias("src"),
            F.col("next_id").alias("dst"),
            F.lit("seq").alias("kind"),
        )
    )

    # 2. turn -> tool arcs (tool references; tools are small: broadcast)
    refs = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    turn_tool = (
        refs.join(turn_ids, on=["conv_id", "turn_idx"])
        .join(F.broadcast(tool_ids), on="tool")
        .select(
            F.col("node_id").alias("src"),
            F.col("tool_id").alias("dst"),
            F.lit("turn_tool").alias("kind"),
        )
    )

    # 3. tool -> first turn using it per conversation
    first_use = refs.groupBy("conv_id", "tool").agg(F.min("turn_idx").alias("turn_idx"))
    tool_turn = (
        first_use.join(turn_ids, on=["conv_id", "turn_idx"])
        .join(F.broadcast(tool_ids), on="tool")
        .select(
            F.col("tool_id").alias("src"),
            F.col("node_id").alias("dst"),
            F.lit("tool_turn").alias("kind"),
        )
    )
    return seq.unionByName(turn_tool).unionByName(tool_turn)


def simple_edges(edges: DataFrame) -> DataFrame:
    """Project to the de-duplicated, loop-free ``(src, dst)`` graph
    (Transform.NO_LOOPS + arc dedup; the ImmutableGraph invariant that
    successor lists have no repeats, BVGraph.java:2201)."""
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def edges_pandas_oracle(tr: pd.DataFrame) -> pd.DataFrame:
    """Oracle: the same graph derived with pandas (tests only)."""
    tr = tr.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    turn_keys = tr[["conv_id", "turn_idx"]].drop_duplicates()
    turn_keys = turn_keys.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tools = sorted(tr["tool"].dropna().unique())
    ids: dict = {}
    for i, row in enumerate(turn_keys.itertuples(index=False)):
        ids[(row.conv_id, row.turn_idx)] = i
    base = len(ids)
    tool_id = {t: base + i for i, t in enumerate(tools)}

    out = []
    for conv, grp in tr.groupby("conv_id", sort=True):
        grp = grp.sort_values("turn_idx")
        idxs = grp["turn_idx"].tolist()
        for a, b in zip(idxs, idxs[1:]):
            out.append((ids[(conv, a)], ids[(conv, b)], "seq"))
        refs = grp[grp["tool"].notna()]
        for r in refs.itertuples(index=False):
            out.append((ids[(conv, r.turn_idx)], tool_id[r.tool], "turn_tool"))
        for t, tg in refs.groupby("tool"):
            out.append((tool_id[t], ids[(conv, tg["turn_idx"].min())], "tool_turn"))
    return pd.DataFrame(out, columns=["src", "dst", "kind"]).astype(
        {"src": "int64", "dst": "int64"}
    )
