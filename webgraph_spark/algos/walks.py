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


def random_walks_sql(length: int = 4, n_walks: int = 1) -> str:
    """DuckDB twin CTE block: caller's WITH must already define
    ``edges`` and ``wsrc(node)``. Reproduces the md5-picked walks
    exactly."""
    parts = [f"""
succ AS MATERIALIZED (
  SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
  FROM (SELECT DISTINCT src, dst FROM edges) t),
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
