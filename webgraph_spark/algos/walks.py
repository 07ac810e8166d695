"""Deterministic random-walk sampling over the edge table.

Not a reference operator (vigna/webgraph ships no walk sampler); added
as a first-class training-pipeline op — walk corpora are the input of
DeepWalk/node2vec-style embedding training and of walk-based graph
sampling. Walks here are *deterministically pseudo-random*: step t of
walk w at node v picks successor index ``md5_long(w:t:v) mod outdeg(v)``
over the dst-sorted successor list. Data-keyed seeding (SURVEY §1.4
posture) means any parallelism level, any engine — including the DuckDB
oracle — reproduces the identical walks.

Scale shape per step: the frontier joins the (pre-indexed, persisted)
successor table on (node, picked-index) — one co-partitioned hash join
per step, frontier-sized, no per-row Python. The successor index is a
per-src row_number (hub-bounded window sort, the per-list work every
pack already does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import md5_long


def random_walks(
    edges: DataFrame,
    sources: DataFrame,
    length: int = 4,
    n_walks: int = 1,
) -> DataFrame:
    """Walk table (walk_id, step, node), steps 0..length (step 0 = the
    source). ``sources`` is (node); walk_id = node * n_walks + j. A walk
    reaching a dangling node (no successors) simply ends there —
    shorter paths are kept, matching the standard corpus semantics.
    """
    from pyspark.sql import Window

    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    succ = e.withColumn("idx", F.row_number().over(w) - F.lit(1)).persist()
    outdeg = succ.groupBy("src").agg(F.count("*").alias("outdeg"))

    cur = (
        sources.select("node")
        .distinct()
        .crossJoin(F.broadcast(
            sources.sparkSession.range(n_walks).select(F.col("id").alias("_j"))
        ))
        .select(
            (F.col("node") * n_walks + F.col("_j")).alias("walk_id"),
            F.col("node"),
        )
    )
    paths = [cur.select("walk_id", F.lit(0).alias("step"), "node")]
    for t in range(1, length + 1):
        pick = (
            md5_long(
                F.concat_ws(
                    ":",
                    F.col("walk_id").cast("string"),
                    F.lit(str(t)),
                    F.col("node").cast("string"),
                )
            )
            % F.col("outdeg")
        )
        stepped = (
            cur.join(outdeg.withColumnRenamed("src", "node"), "node")
            .withColumn("_pick", pick)
            .join(
                succ.select(
                    F.col("src").alias("node"),
                    F.col("idx").alias("_pick"),
                    F.col("dst").alias("_next"),
                ),
                ["node", "_pick"],
            )
            .select("walk_id", F.col("_next").alias("node"))
        )
        paths.append(stepped.select("walk_id", F.lit(t).alias("step"), "node"))
        cur = stepped
    out = paths[0]
    for p in paths[1:]:
        out = out.unionByName(p)
    return out


def random_walks_sql(length: int = 4, n_walks: int = 1,
                     edges_table: str = "edges") -> str:
    """DuckDB twin CTE block: caller's WITH must already define
    ``{edges_table}`` and ``wsrc(node)``. Reproduces the md5-picked
    walks exactly (``edges_table`` lets a caller walk a transposed or
    filtered view without CTE-name collisions)."""
    parts = [f"""
succ AS MATERIALIZED (
  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
  FROM (SELECT DISTINCT src, dst FROM {edges_table}) t),
odeg AS (SELECT src, COUNT(*) AS outdeg FROM succ GROUP BY src),
w0 AS MATERIALIZED (
  SELECT s.node * {n_walks} + j.j AS walk_id, s.node
  FROM (SELECT DISTINCT node FROM wsrc) s
  CROSS JOIN (SELECT unnest(range({n_walks})) AS j) j)"""]
    for t in range(1, length + 1):
        h = (
            "('0x' || substr(md5(CAST(walk_id AS VARCHAR) || ':' || "
            f"'{t}' || ':' || CAST(w.node AS VARCHAR)), 1, 15))::BIGINT"
        )
        parts.append(f"""
w{t} AS MATERIALIZED (
  SELECT w.walk_id, s.dst AS node
  FROM w{t - 1} w
  JOIN odeg d ON w.node = d.src
  JOIN succ s ON s.src = w.node AND s.idx = {h} % d.outdeg)""")
    all_w = " UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, node FROM w{t}" for t in range(length + 1)
    )
    return ",".join(parts) + f""",
walks AS ({all_w})
SELECT walk_id, CAST(step AS BIGINT) AS step, node FROM walks"""


_W4 = {0.25: 16, 0.5: 8, 1.0: 4, 2.0: 2, 4.0: 1}  # 4/x for dyadic x


def node2vec_walks(
    edges: DataFrame,
    sources: DataFrame,
    length: int = 4,
    n_walks: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    hub_cap: int | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover-Leskovec KDD'16):
    from step 2 on, the candidate successor ``dst`` of ``node`` (coming
    from ``prev``) carries weight 1/p if ``dst == prev`` (return), 1 if
    ``prev -> dst`` is an arc (BFS-ish stay), 1/q otherwise (DFS-ish
    explore). ``p``/``q`` are restricted to powers of two in [1/4, 4]
    so weights scale to exact small integers (w4 = 4/x) and the
    cumulative-weight pick is pure int64 arithmetic — identical in any
    engine, which is what makes the walks oracle-checkable.

    The pick at step t is the first successor (in dst order) whose
    cumulative integer weight exceeds ``md5_long('n2v:' walk:t:node) mod
    total_weight`` — deterministically pseudo-random, mirroring
    :func:`random_walks`; step 1 has no ``prev`` and picks uniformly.

    Scale shape per step: the frontier expands to its full successor
    sets (sum-of-degrees rows, exactly one edge-table co-partitioned
    join), the prev->dst adjacency test is one more hash join against
    the same distinct-arc table, and the weighted pick is a per-walk
    window cumsum + min-aggregate — no per-row Python. A hub visit
    costs its degree in candidate rows, the same term every exact
    node2vec implementation pays at sampling time (the alias-table
    variant trades it for O(1) draws but needs mutable per-node state).
    Walks ending on a dangling node simply stop, as in
    :func:`random_walks`.

    ``hub_cap`` bounds the hub hazard: a walk sitting on a node with
    outdeg > hub_cap picks UNIFORMLY (the first-order md5-mod-outdeg
    rule, one successor row via the (node, idx) join) instead of
    expanding all successors for the p/q weighting. Measured necessity:
    at 31.5M edges with Zipf tool hubs (outdeg up to ~10^6), exact
    expansion of walks parked on hubs filled the shuffle disk; capped
    at 1024 the step cost is bounded by min(degree, cap) rows per walk.
    The bias touches only hub steps — where the p/q distinction is
    weakest (1/q dominates a hub's candidate mass anyway) — and the
    rule is part of the deterministic contract, replayed identically
    by the SQL twin.
    """
    from pyspark.sql import Window

    if p not in _W4 or q not in _W4:
        raise ValueError("p and q must be powers of two in [1/4, 4]")
    wb, wq = _W4[p], _W4[q]

    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    succ = e.withColumn("idx", F.row_number().over(w) - F.lit(1)).persist()
    outdeg = succ.groupBy("src").agg(F.count("*").alias("outdeg"))

    cur0 = (
        sources.select("node")
        .distinct()
        .crossJoin(F.broadcast(
            sources.sparkSession.range(n_walks).select(F.col("id").alias("_j"))
        ))
        .select(
            (F.col("node") * n_walks + F.col("_j")).alias("walk_id"),
            F.col("node"),
        )
    )
    paths = [cur0.select("walk_id", F.lit(0).alias("step"), "node")]

    def _h(t):
        return md5_long(
            F.concat_ws(
                ":",
                F.lit("n2v"),
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("node").cast("string"),
            )
        )

    # step 1: uniform (no prev yet)
    cur = (
        cur0.join(outdeg.withColumnRenamed("src", "node"), "node")
        .withColumn("_pick", _h(1) % F.col("outdeg"))
        .join(
            succ.select(
                F.col("src").alias("node"),
                F.col("idx").alias("_pick"),
                F.col("dst").alias("_next"),
            ),
            ["node", "_pick"],
        )
        .select("walk_id", F.col("node").alias("prev"), F.col("_next").alias("node"))
    )
    paths.append(cur.select("walk_id", F.lit(1).alias("step"), "node"))

    adj = succ.select(F.col("src").alias("prev"), F.col("dst"), F.lit(1).alias("_adj"))
    pw = Window.partitionBy("walk_id").orderBy("dst")
    for t in range(2, length + 1):
        base = cur.join(outdeg.withColumnRenamed("src", "node"), "node")
        if hub_cap is not None:
            hub = base.where(F.col("outdeg") > hub_cap)
            base = base.where(F.col("outdeg") <= hub_cap)
            hub_stepped = (
                hub.withColumn("_pick", _h(t) % F.col("outdeg"))
                .join(
                    succ.select(
                        F.col("src").alias("node"),
                        F.col("idx").alias("_pick"),
                        F.col("dst").alias("_next"),
                    ),
                    ["node", "_pick"],
                )
                .select(
                    "walk_id",
                    F.col("node").alias("prev"),
                    F.col("_next").alias("node"),
                )
            )
        cand = (
            base.select("walk_id", "prev", "node").join(
                succ.select(F.col("src").alias("node"), "dst"), "node"
            )
            .join(adj, ["prev", "dst"], "left")
            .withColumn(
                "_w",
                F.when(F.col("dst") == F.col("prev"), F.lit(wb))
                .when(F.col("_adj").isNotNull(), F.lit(4))
                .otherwise(F.lit(wq))
                .cast("long"),
            )
            .withColumn(
                "_cum",
                F.sum("_w").over(pw.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn(
                "_tot",
                F.sum("_w").over(
                    Window.partitionBy("walk_id").rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
        )
        stepped = (
            cand.where(F.col("_cum") > _h(t) % F.col("_tot"))
            .groupBy("walk_id", F.col("node").alias("prev"))
            .agg(F.min("dst").alias("node"))
            .select("walk_id", "prev", "node")
        )
        if hub_cap is not None:
            stepped = stepped.unionByName(hub_stepped)
        paths.append(stepped.select("walk_id", F.lit(t).alias("step"), "node"))
        cur = stepped
    out = paths[0]
    for pth in paths[1:]:
        out = out.unionByName(pth)
    return out


def node2vec_walks_sql(
    length: int = 4,
    n_walks: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    hub_cap: int | None = None,
) -> str:
    """DuckDB twin CTE block for :func:`node2vec_walks`: caller's WITH
    must already define ``edges`` and ``wsrc(node)``."""
    if p not in _W4 or q not in _W4:
        raise ValueError("p and q must be powers of two in [1/4, 4]")
    wb, wq = _W4[p], _W4[q]
    parts = [f"""
succ AS MATERIALIZED (
  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
  FROM (SELECT DISTINCT src, dst FROM edges) t),
odeg AS (SELECT src, COUNT(*) AS outdeg FROM succ GROUP BY src),
v0 AS MATERIALIZED (
  SELECT s.node * {n_walks} + j.j AS walk_id, s.node
  FROM (SELECT DISTINCT node FROM wsrc) s
  CROSS JOIN (SELECT unnest(range({n_walks})) AS j) j)"""]

    def _h(t, node_expr="w.node"):
        return (
            "('0x' || substr(md5('n2v:' || CAST(w.walk_id AS VARCHAR) || ':' || "
            f"'{t}' || ':' || CAST({node_expr} AS VARCHAR)), 1, 15))::BIGINT"
        )

    parts.append(f"""
v1 AS MATERIALIZED (
  SELECT w.walk_id, w.node AS prev, s.dst AS node
  FROM v0 w
  JOIN odeg d ON w.node = d.src
  JOIN succ s ON s.src = w.node AND s.idx = {_h(1)} % d.outdeg)""")
    capjoin = (
        f" JOIN odeg cd ON cd.src = w.node AND cd.outdeg <= {hub_cap}"
        if hub_cap is not None
        else ""
    )
    for t in range(2, length + 1):
        parts.append(f"""
c{t} AS MATERIALIZED (
  SELECT w.walk_id, w.prev, w.node, s.dst,
         CASE WHEN s.dst = w.prev THEN {wb}
              WHEN a.src IS NOT NULL THEN 4
              ELSE {wq} END AS wt,
         {_h(t)} AS h
  FROM v{t - 1} w{capjoin}
  JOIN succ s ON s.src = w.node
  LEFT JOIN (SELECT DISTINCT src, dst FROM succ) a
    ON a.src = w.prev AND a.dst = s.dst)""")
        hub_union = ""
        if hub_cap is not None:
            hub_union = f"""
  UNION ALL
  SELECT w.walk_id, w.node AS prev, s.dst AS node
  FROM v{t - 1} w
  JOIN odeg d ON d.src = w.node AND d.outdeg > {hub_cap}
  JOIN succ s ON s.src = w.node AND s.idx = {_h(t)} % d.outdeg"""
        parts.append(f"""
v{t} AS MATERIALIZED (
  SELECT walk_id, node AS prev, MIN(dst) AS node FROM (
    SELECT walk_id, node, dst,
           SUM(wt) OVER (PARTITION BY walk_id ORDER BY dst
                         ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(wt) OVER (PARTITION BY walk_id) AS tot, h
    FROM c{t}) x
  WHERE cum > h % tot
  GROUP BY walk_id, node{hub_union})""")
    all_w = " UNION ALL ".join(
        ["SELECT walk_id, 0 AS step, node FROM v0"]
        + [f"SELECT walk_id, {t} AS step, node FROM v{t}" for t in range(1, length + 1)]
    )
    return ",".join(parts) + f""",
walks AS ({all_w})
SELECT walk_id, CAST(step AS BIGINT) AS step, node FROM walks"""
