"""Link graph over the driver's TPC-H-ish test tables + DuckDB SQL twins.

The driver's correctness gate (``__spark_entry__``) runs each Spark query
AND an equivalent DuckDB SQL string side-by-side. This module defines the
graph both ways:

nodes: customers (raw key), orders (+1e7), parts (+2e7), suppliers (+3e7)
arcs : customer -> its orders (orders table)
       order    -> its parts   (lineitem)
       part     -> its suppliers (lineitem)

and generates UNROLLED SQL for the iterative algorithms (k synchronous
rounds as chained CTEs) — both engines execute the exact same recurrence
from the same initialization, so results match bit-for-bit (modulo the
documented ROUND on floating point outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

OFF_ORDER = 10_000_000
OFF_PART = 20_000_000
OFF_SUPP = 30_000_000
OFF_NATION = 40_000_000

EDGES_CTE = f"""
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT o_custkey AS src, {OFF_ORDER} + o_orderkey AS dst FROM orders
    UNION ALL
    SELECT {OFF_ORDER} + l_orderkey AS src, {OFF_PART} + l_partkey AS dst FROM lineitem
    UNION ALL
    SELECT {OFF_PART} + l_partkey AS src, {OFF_SUPP} + l_suppkey AS dst FROM lineitem
  ) t
)"""

NODES_CTE = """
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
)"""

SYM_CTE = """
sym AS (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
)"""


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    names = names or [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def tpch_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of EDGES_CTE."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e1 = orders.select(
        F.col("o_custkey").alias("src"),
        (F.lit(OFF_ORDER) + F.col("o_orderkey")).alias("dst"),
    )
    e2 = lineitem.select(
        (F.lit(OFF_ORDER) + F.col("l_orderkey")).alias("src"),
        (F.lit(OFF_PART) + F.col("l_partkey")).alias("dst"),
    )
    e3 = lineitem.select(
        (F.lit(OFF_PART) + F.col("l_partkey")).alias("src"),
        (F.lit(OFF_SUPP) + F.col("l_suppkey")).alias("dst"),
    )
    return e1.unionByName(e2).unionByName(e3).distinct()


# ------------------------------------------------------- SQL generators

def pagerank_sql(iters: int = 5, alpha: float = 0.85, round_to: int = 9) -> str:
    """Unrolled k-iteration PageRank with uniform dangling redistribution
    — the recurrence of algos.pagerank with fixed_iterations=k."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
outdeg AS (SELECT src, COUNT(*) AS c FROM edges GROUP BY src)""")
    parts.append("""
dangling AS (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outdeg))""")
    parts.append("""
nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""")
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(f"""
dm{k} AS (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {prev} r
          JOIN dangling d ON r.node = d.node)""")
        parts.append(f"""
c{k} AS (SELECT e.dst AS node, SUM(r.rank / o.c) AS contrib
         FROM edges e JOIN {prev} r ON e.src = r.node
         JOIN outdeg o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
r{k} AS (SELECT n.node,
         (1.0 - {alpha}) / (SELECT n FROM nn)
         + {alpha} * ((SELECT m FROM dm{k}) / (SELECT n FROM nn)
                       + COALESCE(c.contrib, 0.0)) AS rank
         FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM r{iters}"
    )


def cc_sql(rounds: int = 8) -> str:
    """Unrolled k-round hash-min connected components."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
l0 AS (SELECT node, node AS component FROM nodes)""")
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        parts.append(f"""
m{k} AS (SELECT s.dst AS node, MIN(l.component) AS mn
         FROM sym s JOIN {prev} l ON s.src = l.node GROUP BY s.dst)""")
        parts.append(f"""
l{k} AS (SELECT l.node,
         LEAST(l.component, COALESCE(m.mn, l.component)) AS component
         FROM {prev} l LEFT JOIN m{k} m ON l.node = m.node)""")
    return "WITH " + ",".join(parts) + f"\nSELECT node, component FROM l{rounds}"


def lp_sql(rounds: int = 3) -> str:
    """Unrolled k-round synchronous label propagation, min tie-break."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
l0 AS (SELECT node, node AS label FROM nodes)""")
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        parts.append(f"""
cnt{k} AS (SELECT s.dst AS node, l.label, COUNT(*) AS cnt
           FROM sym s JOIN {prev} l ON s.src = l.node GROUP BY s.dst, l.label)""")
        parts.append(f"""
b{k} AS (SELECT node, label FROM (
           SELECT node, label,
                  ROW_NUMBER() OVER (PARTITION BY node
                                     ORDER BY cnt DESC, label ASC) AS rn
           FROM cnt{k}) t WHERE rn = 1)""")
        parts.append(f"""
l{k} AS (SELECT l.node, COALESCE(b.label, l.label) AS label
         FROM {prev} l LEFT JOIN b{k} b ON l.node = b.node)""")
    return "WITH " + ",".join(parts) + f"\nSELECT node, label FROM l{rounds}"


def triangles_sql() -> str:
    """Degree-oriented exact triangle count."""
    return f"""WITH {EDGES_CTE},
und AS (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
),
deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
orient AS (
  SELECT u.src, u.dst FROM und u
  JOIN deg ds ON ds.node = u.src
  JOIN deg dd ON dd.node = u.dst
  WHERE ds.d < dd.d OR (ds.d = dd.d AND u.src < u.dst)
)
SELECT COUNT(*) AS triangles FROM orient e1
JOIN orient e2 ON e1.dst = e2.src
JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst"""


def bfs_sql(rounds: int = 3) -> str:
    """Unrolled BFS from the minimum customer node (directed arcs)."""
    parts = [EDGES_CTE]
    parts.append("""
v0 AS (SELECT (SELECT MIN(o_custkey) FROM orders) AS node, 0 AS dist)""")
    for k in range(1, rounds + 1):
        prev_all = " UNION ALL ".join(f"SELECT node FROM v{j}" for j in range(k))
        parts.append(f"""
v{k} AS (SELECT DISTINCT e.dst AS node, {k} AS dist
         FROM edges e JOIN v{k - 1} f ON e.src = f.node
         WHERE e.dst NOT IN ({prev_all}))""")
    sel = " UNION ALL ".join(f"SELECT node, dist FROM v{j}" for j in range(rounds + 1))
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM ({sel}) allv"
    )


def closeness_sql(n_sources: int = 5, max_depth: int = 4, round_to: int = 9) -> str:
    """Multi-source exact geometric centralities. The TPC-H graph is a
    4-layer DAG (customer -> order -> part -> supplier), so BFS
    saturates within ``max_depth`` rounds and the unrolled SQL is exact."""
    parts = [EDGES_CTE]
    parts.append(f"""
srcs AS (SELECT o_custkey AS source FROM orders GROUP BY o_custkey
         ORDER BY source LIMIT {n_sources})""")
    parts.append("""
v0 AS (SELECT source, source AS node, 0 AS dist FROM srcs)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS (SELECT DISTINCT f.source, e.dst AS node, {k} AS dist
         FROM edges e JOIN v{k - 1} f ON e.src = f.node
         WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p
                           WHERE p.source = f.source AND p.node = e.dst))""")
    all_v = " UNION ALL ".join(
        f"SELECT source, node, dist FROM v{j}" for j in range(max_depth + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f""",
dists AS ({all_v}),
agg AS (
  SELECT source, COUNT(*) AS reached, SUM(dist) AS sum_d,
         SUM(1.0 / dist) AS harm
  FROM dists WHERE dist > 0 GROUP BY source
)
SELECT s.source,
       CAST(COALESCE(a.reached, 0) + 1 AS BIGINT) AS reachable,
       ROUND(CASE WHEN a.sum_d IS NULL THEN 0.0 ELSE 1.0 / a.sum_d END, {round_to}) AS closeness,
       ROUND(COALESCE(a.harm, 0.0), {round_to}) AS harmonic
FROM srcs s LEFT JOIN agg a ON s.source = a.source"""
    )


def scc_dag_sql() -> str:
    """The TPC-H link graph is acyclic, so every SCC is a singleton."""
    return f"WITH {EDGES_CTE}, {NODES_CTE} SELECT node, node AS scc FROM nodes"


def degree_dist_sql(direction: str = "out") -> str:
    col = "src" if direction == "out" else "dst"
    return f"""WITH {EDGES_CTE}
SELECT degree, COUNT(*) AS n_nodes FROM (
  SELECT {col}, COUNT(*) AS degree FROM edges GROUP BY {col}) t
GROUP BY degree"""


def graph_stats_sql() -> str:
    return f"""WITH {EDGES_CTE}, {NODES_CTE},
outdeg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
SELECT (SELECT COUNT(*) FROM nodes) AS nodes,
       (SELECT COUNT(*) FROM edges) AS arcs,
       (SELECT COUNT(*) FROM edges WHERE src = dst) AS loops,
       (SELECT COUNT(*) FROM nodes) - (SELECT COUNT(*) FROM outdeg) AS dangling,
       (SELECT MIN(d) FROM outdeg) AS minoutdegree,
       (SELECT MAX(d) FROM outdeg) AS maxoutdegree,
       (SELECT ROUND(AVG(d), 6) FROM outdeg) AS avgoutdegree_nonzero"""


def compose_sql() -> str:
    """customer->order ∘ order->part = customer->part reachability."""
    return f"""WITH {EDGES_CTE}
SELECT DISTINCT a.src AS src, b.dst AS dst
FROM edges a JOIN edges b ON a.dst = b.src
WHERE a.src < {OFF_ORDER} AND b.dst >= {OFF_PART} AND b.dst < {OFF_SUPP}"""


def quotient_nation_sql() -> str:
    """Quotient: customers collapse to their nation node (map_nodes)."""
    return f"""WITH {EDGES_CTE}
SELECT DISTINCT
  CASE WHEN e.src < {OFF_ORDER} THEN {OFF_NATION} + c.c_nationkey ELSE e.src END AS src,
  e.dst AS dst
FROM edges e LEFT JOIN customer c ON e.src = c.c_custkey"""
