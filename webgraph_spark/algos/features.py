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
        agg = msgs.groupBy("node", "pos").agg(F.avg("val").alias("val"))
        is_last = h == hops - 1
        if round_to is not None and is_last:
            agg = agg.select("node", "pos", F.round("val", round_to).alias("val"))
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
                F.transform("vec", lambda v: F.round(v, round_to)).alias("vec"),
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
  SELECT node, pos, ROUND(AVG(val), {round_to}) AS val
  FROM msgs GROUP BY node, pos
)
SELECT node, CAST(pos AS BIGINT) AS pos, val FROM agg
UNION ALL
SELECT e.node, CAST(e.pos AS BIGINT) AS pos, ROUND(e.val, {round_to}) AS val
FROM ex e WHERE e.node NOT IN (SELECT node FROM agg)
"""
