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
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT o_custkey AS src, {OFF_ORDER} + o_orderkey AS dst FROM orders
    UNION ALL
    SELECT {OFF_ORDER} + l_orderkey AS src, {OFF_PART} + l_partkey AS dst FROM lineitem
    UNION ALL
    SELECT {OFF_PART} + l_partkey AS src, {OFF_SUPP} + l_suppkey AS dst FROM lineitem
  ) t
)"""

NODES_CTE = """
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
)"""

SYM_CTE = """
sym AS MATERIALIZED (
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


def tpch_edges_labelled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDGES_CTE's union WITHOUT the distinct, aggregated to unique arcs
    with an arc-multiplicity label (how many order lines realize the
    link) — a natural int label for the labelled-graph paths."""
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
    return (
        e1.unionByName(e2)
        .unionByName(e3)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("label"))
    )


LABELLED_EDGES_CTE = f"""
ledges AS MATERIALIZED (
  SELECT src, dst, COUNT(*) AS label FROM (
    SELECT o_custkey AS src, {OFF_ORDER} + o_orderkey AS dst FROM orders
    UNION ALL
    SELECT {OFF_ORDER} + l_orderkey AS src, {OFF_PART} + l_partkey AS dst FROM lineitem
    UNION ALL
    SELECT {OFF_PART} + l_partkey AS src, {OFF_SUPP} + l_suppkey AS dst FROM lineitem
  ) t GROUP BY src, dst
)"""


# ------------------------------------------------------- SQL generators

def _pagerank_body(iters: int, alpha: float) -> list[str]:
    """The unrolled recurrence CTEs, assuming ``edges``/``nodes`` exist."""
    parts = []
    parts.append("""
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM edges GROUP BY src)""")
    parts.append("""
dangling AS MATERIALIZED (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outdeg))""")
    parts.append("""
nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""")
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(f"""
dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {prev} r
          JOIN dangling d ON r.node = d.node)""")
        parts.append(f"""
c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / o.c) AS contrib
         FROM edges e JOIN {prev} r ON e.src = r.node
         JOIN outdeg o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
r{k} AS MATERIALIZED (SELECT n.node,
         (1.0 - {alpha}) / (SELECT n FROM nn)
         + {alpha} * ((SELECT m FROM dm{k}) / (SELECT n FROM nn)
                       + COALESCE(c.contrib, 0.0)) AS rank
         FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
    return parts


def pagerank_sql(iters: int = 5, alpha: float = 0.85, round_to: int = 9) -> str:
    """Unrolled k-iteration PageRank with uniform dangling redistribution
    — the recurrence of algos.pagerank with fixed_iterations=k."""
    parts = [EDGES_CTE, NODES_CTE] + _pagerank_body(iters, alpha)
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM r{iters}"
    )


TRANSCRIPT_EDGES_CTES = """
tr AS MATERIALIZED (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         CASE WHEN event_id % 3 = 0 THEN event_type ELSE NULL END AS tool
  FROM events
),
turn_nodes AS (SELECT DISTINCT 0 AS kind, conv_id, turn_idx,
                      CAST(NULL AS VARCHAR) AS tool FROM tr),
tool_nodes AS (SELECT DISTINCT 1 AS kind, CAST(NULL AS VARCHAR) AS conv_id,
                      CAST(NULL AS INT) AS turn_idx, tool
               FROM tr WHERE tool IS NOT NULL),
dict AS MATERIALIZED (
  SELECT kind, conv_id, turn_idx, tool,
         ROW_NUMBER() OVER (ORDER BY kind ASC, conv_id ASC NULLS FIRST,
                            turn_idx ASC NULLS FIRST, tool ASC NULLS FIRST) - 1
           AS node_id
  FROM (SELECT * FROM turn_nodes UNION ALL SELECT * FROM tool_nodes) alln
),
turn_ids AS MATERIALIZED (SELECT conv_id, turn_idx, node_id FROM dict WHERE kind = 0),
tool_ids AS MATERIALIZED (SELECT tool, node_id AS tool_id FROM dict WHERE kind = 1),
refs AS MATERIALIZED (SELECT conv_id, turn_idx, tool FROM tr WHERE tool IS NOT NULL),
seq AS (
  SELECT a.node_id AS src, b.node_id AS dst
  FROM turn_ids a JOIN turn_ids b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
),
turn_tool AS (
  SELECT t.node_id AS src, k.tool_id AS dst
  FROM refs r
  JOIN turn_ids t ON r.conv_id = t.conv_id AND r.turn_idx = t.turn_idx
  JOIN tool_ids k ON r.tool = k.tool
),
first_use AS (SELECT conv_id, tool, MIN(turn_idx) AS turn_idx
              FROM refs GROUP BY conv_id, tool),
tool_turn AS (
  SELECT k.tool_id AS src, t.node_id AS dst
  FROM first_use f
  JOIN turn_ids t ON f.conv_id = t.conv_id AND f.turn_idx = t.turn_idx
  JOIN tool_ids k ON f.tool = k.tool
),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT * FROM seq UNION ALL SELECT * FROM turn_tool
    UNION ALL SELECT * FROM tool_turn) e
  WHERE src <> dst
)"""


def transcript_pipeline_sql(iters: int = 10, alpha: float = 0.85, round_to: int = 9) -> str:
    """SQL twin of the full input_hint pipeline: events-derived
    transcripts -> dense node dictionary (rank over the same total
    order as util.ids.assign_dense_ids) -> seq/turn_tool/tool_turn arcs
    (graph.edges.extract_edges) -> simple_edges -> unrolled PageRank."""
    parts = [TRANSCRIPT_EDGES_CTES, NODES_CTE] + _pagerank_body(iters, alpha)
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM r{iters}"
    )


TRANSCRIPT_TR_CTE = """
tr AS MATERIALIZED (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         event_type || ':' || CAST(event_id AS VARCHAR) AS text,
         CASE WHEN event_id % 3 = 0 THEN event_type ELSE NULL END AS tool,
         ts
  FROM events
)"""


def transcript_tool_markov_sql(iters: int = 8, alpha: float = 0.85) -> str:
    """Twin of __spark_entry__.q_tool_markov: tool->next-tool transition
    multigraph (lag over the stable turn order, self-transitions kept)
    fed to the unrolled weighted-PageRank recurrence (wpagerank_sql)."""
    ledges_cte = (
        TRANSCRIPT_TR_CTE
        + """,
ledges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS label FROM (
    SELECT tool AS src,
           LEAD(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst
    FROM tr WHERE tool IS NOT NULL
  ) t WHERE dst IS NOT NULL GROUP BY src, dst
)"""
    )
    inner = wpagerank_sql(iters=iters, alpha=alpha, ledges_cte=ledges_cte)
    return f"SELECT node AS tool, rank FROM (\n{inner}\n) q"


def transcript_turn_latency_sql() -> str:
    """Twin of __spark_entry__.q_turn_latency: epoch-microsecond gap to
    the previous turn in the conversation, integer-exact rollup by the
    responding role; mean = one double division of two exact longs."""
    return (
        "WITH "
        + TRANSCRIPT_TR_CTE
        + """,
gaps AS (
  SELECT role,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
  FROM tr
)
SELECT role,
       CAST(COUNT(*) AS BIGINT) AS n_replies,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*), 9) AS avg_gap_us
FROM gaps WHERE gap_us IS NOT NULL GROUP BY role"""
    )


def transcript_context_pack_sql(budget: int = 64) -> str:
    """Twin of __spark_entry__.q_context_pack: overflow-tolerant context
    windows batch_id = floor(exclusive_prefix_tokens / budget) per
    conversation in stable turn order, then the per-window rollup."""
    return (
        "WITH "
        + TRANSCRIPT_TR_CTE
        + f""",
packed AS (
  SELECT conv_id, turn_idx, CAST(LENGTH(text) AS BIGINT) AS tokens,
         CAST(FLOOR(COALESCE(SUM(LENGTH(text)) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {float(budget)}) AS BIGINT) AS batch_id
  FROM tr
)
SELECT conv_id, batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(turn_idx) AS INT) AS first_turn,
       CAST(MAX(turn_idx) AS INT) AS last_turn
FROM packed GROUP BY conv_id, batch_id"""
    )


def transcript_role_assortativity_sql() -> str:
    """Twin of __spark_entry__.q_role_assortativity: Newman categorical
    mixing over role transitions, integer-exact terms, one double
    division."""
    return (
        "WITH "
        + TRANSCRIPT_TR_CTE
        + """,
pairs AS (
  SELECT role AS src_role,
         LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dst_role
  FROM tr
),
e AS MATERIALIZED (
  SELECT src_role, dst_role, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs WHERE dst_role IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m,
               CAST(SUM(CASE WHEN src_role = dst_role THEN c ELSE 0 END)
                    AS BIGINT) AS diag
        FROM e),
rs AS (SELECT src_role AS role, CAST(SUM(c) AS BIGINT) AS rc FROM e GROUP BY 1),
cs AS (SELECT dst_role AS role, CAST(SUM(c) AS BIGINT) AS cc FROM e GROUP BY 1),
sab AS (SELECT CAST(SUM(rs.rc * cs.cc) AS BIGINT) AS s
        FROM rs JOIN cs ON rs.role = cs.role)
SELECT tot.m AS m_pairs,
       ROUND((CAST(tot.m AS DOUBLE) * tot.diag - sab.s)
             / (CAST(tot.m AS DOUBLE) * tot.m - sab.s), 9) AS r_assort
FROM tot, sab"""
    )


def transcript_conv_stats_sql() -> str:
    """Twin of __spark_entry__.q_conv_stats: conversation-length
    distribution with per-length tool-call totals, all exact integers."""
    return (
        "WITH "
        + TRANSCRIPT_TR_CTE
        + """,
per_conv AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(COUNT(tool) AS BIGINT) AS n_tool_calls
  FROM tr GROUP BY conv_id
)
SELECT n_turns, CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(n_tool_calls) AS BIGINT) AS tool_calls
FROM per_conv GROUP BY n_turns"""
    )


def harmonic_all_sql(max_depth: int = 4) -> str:
    """Exact per-node geometric centralities from ALL sources (unrolled
    closure on the DAG) + the literal acceptance flag the engine's
    HyperBall estimate asserts against."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
v0 AS MATERIALIZED (SELECT node AS source, node, 0 AS dist FROM nodes)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT f.source, e.dst AS node, {k} AS dist
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
SELECT n.node AS source,
       CAST(COALESCE(a.reached, 0) + 1 AS BIGINT) AS reachable,
       ROUND(COALESCE(a.harm, 0.0), 6) AS harmonic,
       ROUND(CASE WHEN a.sum_d IS NULL THEN 0.0 ELSE 1.0 / a.sum_d END, 9) AS closeness,
       TRUE AS est_within_2rsd
FROM nodes n LEFT JOIN agg a ON n.node = a.source"""
    )


def pagerank_converged_sql(
    max_iters: int = 35, tol: float = 1e-6, alpha: float = 0.85, round_to: int = 9
) -> str:
    """Unrolled PageRank WITH the convergence rule: per-iteration L-inf
    deltas are computed alongside the ranks, and the result is the rank
    table of the FIRST iteration whose delta < tol (or of ``max_iters``
    if none converged) — exactly the state algos.pagerank(tol, max_iter=
    max_iters) returns, since its early stop fires on the same rule."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM edges GROUP BY src)""")
    parts.append("""
dangling AS MATERIALIZED (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outdeg))""")
    parts.append("""
nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""")
    for k in range(1, max_iters + 1):
        prev = f"r{k - 1}"
        parts.append(f"""
dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {prev} r
          JOIN dangling d ON r.node = d.node)""")
        parts.append(f"""
c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / o.c) AS contrib
         FROM edges e JOIN {prev} r ON e.src = r.node
         JOIN outdeg o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
r{k} AS MATERIALIZED (SELECT n.node,
         (1.0 - {alpha}) / (SELECT n FROM nn)
         + {alpha} * ((SELECT m FROM dm{k}) / (SELECT n FROM nn)
                       + COALESCE(c.contrib, 0.0)) AS rank
         FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
        parts.append(f"""
d{k} AS MATERIALIZED (SELECT MAX(ABS(a.rank - b.rank)) AS d
         FROM r{k} a JOIN r{k - 1} b ON a.node = b.node)""")
    delta_rows = ", ".join(f"({k}, (SELECT d FROM d{k}))" for k in range(1, max_iters + 1))
    parts.append(f"""
pick AS (SELECT COALESCE(MIN(k), {max_iters}) AS k
         FROM (VALUES {delta_rows}) t(k, d) WHERE d < {tol})""")
    sel = "\nUNION ALL\n".join(
        f"SELECT node, ROUND(rank, {round_to}) AS rank FROM r{k} "
        f"WHERE (SELECT k FROM pick) = {k}"
        for k in range(1, max_iters + 1)
    )
    return "WITH " + ",".join(parts) + "\n" + sel


def nf_exact_sql(max_depth: int = 4) -> str:
    """Exact neighbourhood function NF(t) = #pairs (u,v) with
    d(u,v) <= t, by unrolled all-sources BFS closure (the TPC-H link
    graph is a {max_depth}-layer DAG, so the closure saturates)."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
v0 AS MATERIALIZED (SELECT node AS source, node, 0 AS dist FROM nodes)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT f.source, e.dst AS node, {k} AS dist
         FROM edges e JOIN v{k - 1} f ON e.src = f.node
         WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p
                           WHERE p.source = f.source AND p.node = e.dst))""")
    all_v = " UNION ALL ".join(
        f"SELECT dist FROM v{j}" for j in range(max_depth + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f""",
hist AS (SELECT dist, COUNT(*) AS c FROM ({all_v}) d GROUP BY dist),
ts AS (SELECT unnest(range(0, {max_depth + 1})) AS t)
SELECT t, CAST(SUM(h.c) AS BIGINT) AS nf_exact
FROM ts JOIN hist h ON h.dist <= ts.t
WHERE ts.t <= (SELECT MAX(dist) FROM hist)
GROUP BY t"""
    )


def _cc_parts(rounds: int) -> list[str]:
    """The unrolled hash-min CC recurrence CTEs (labels in ``l{rounds}``)."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
l0 AS MATERIALIZED (SELECT node, node AS component FROM nodes)""")
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        parts.append(f"""
m{k} AS MATERIALIZED (SELECT s.dst AS node, MIN(l.component) AS mn
         FROM sym s JOIN {prev} l ON s.src = l.node GROUP BY s.dst)""")
        parts.append(f"""
l{k} AS MATERIALIZED (SELECT l.node,
         LEAST(l.component, COALESCE(m.mn, l.component)) AS component
         FROM {prev} l LEFT JOIN m{k} m ON l.node = m.node)""")
    return parts


def cc_sql(rounds: int = 8) -> str:
    """Unrolled k-round hash-min connected components."""
    return (
        "WITH " + ",".join(_cc_parts(rounds))
        + f"\nSELECT node, component FROM l{rounds}"
    )


def extract_component_sql(rounds: int = 8) -> str:
    """Twin of tool/ExtractComponent.java: largest component's
    node-induced subgraph of the DIRECTED edge table, re-indexed to
    dense ids in node order (the ImmutableSubgraph translation)."""
    parts = _cc_parts(rounds)
    return (
        "WITH " + ",".join(parts)
        + f""",
comp AS (SELECT component, COUNT(*) AS sz FROM l{rounds} GROUP BY component),
topc AS (SELECT component FROM comp ORDER BY sz DESC, component LIMIT 1),
keepn AS (SELECT node FROM l{rounds} JOIN topc USING (component)),
dic AS MATERIALIZED (
  SELECT node, ROW_NUMBER() OVER (ORDER BY node) - 1 AS target FROM keepn),
sub AS (SELECT e.src, e.dst FROM edges e
        JOIN keepn a ON e.src = a.node JOIN keepn b ON e.dst = b.node)
SELECT DISTINCT ds.target AS src, dd.target AS dst
FROM sub JOIN dic ds ON sub.src = ds.node
         JOIN dic dd ON sub.dst = dd.node"""
    )


def lp_sql(rounds: int = 3) -> str:
    """Unrolled k-round synchronous label propagation, min tie-break."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)""")
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        parts.append(f"""
cnt{k} AS MATERIALIZED (SELECT s.dst AS node, l.label, COUNT(*) AS cnt
           FROM sym s JOIN {prev} l ON s.src = l.node GROUP BY s.dst, l.label)""")
        parts.append(f"""
b{k} AS MATERIALIZED (SELECT node, label FROM (
           SELECT node, label,
                  ROW_NUMBER() OVER (PARTITION BY node
                                     ORDER BY cnt DESC, label ASC) AS rn
           FROM cnt{k}) t WHERE rn = 1)""")
        parts.append(f"""
l{k} AS MATERIALIZED (SELECT l.node, COALESCE(b.label, l.label) AS label
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
v0 AS MATERIALIZED (SELECT (SELECT MIN(o_custkey) FROM orders) AS node, 0 AS dist)""")
    for k in range(1, rounds + 1):
        prev_all = " UNION ALL ".join(f"SELECT node FROM v{j}" for j in range(k))
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT e.dst AS node, {k} AS dist
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
v0 AS MATERIALIZED (SELECT source, source AS node, 0 AS dist FROM srcs)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT f.source, e.dst AS node, {k} AS dist
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


_GRAY_BIG_SQL = 1 << 62

_GAMMA_TAIL = """
lists AS (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
            LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
          FROM edges),
vals AS (SELECT CASE WHEN rn = 1
                     THEN (CASE WHEN dst - src >= 0 THEN 2 * (dst - src)
                           ELSE -2 * (dst - src) - 1 END)
                     ELSE dst - prev - 1 END AS v
         FROM lists),
bits AS (SELECT CAST(2 * (LENGTH(BIN(CAST(v + 1 AS BIGINT))) - 1) + 1
                 AS BIGINT) AS b FROM vals)
SELECT CAST(SUM(b) AS BIGINT) AS gamma_bits,
       CAST(COUNT(*) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS bits_per_link
FROM bits"""


def gamma_bits_sql() -> str:
    """Twin of operators.csr.gamma_bits_per_link over the natural-order
    pack: gamma(int2nat(first - src)) + gamma(gaps)."""
    return f"WITH {EDGES_CTE},{_GAMMA_TAIL}"


_ZETA3_TAIL = """
lists AS (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
            LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
          FROM edges),
vals AS (SELECT CASE WHEN rn = 1
                     THEN (CASE WHEN dst - src >= 0 THEN 2 * (dst - src)
                           ELSE -2 * (dst - src) - 1 END)
                     ELSE dst - prev - 1 END AS v
         FROM lists),
nb AS (SELECT LENGTH(BIN(CAST(v + 1 AS BIGINT))) AS nb FROM vals),
z AS (SELECT (nb - 1) // 3 AS h, nb FROM nb),
bits AS (SELECT CAST((h + 1) + (3 * h + 2)
                + CASE WHEN nb - 3 * h >= 2 THEN 1 ELSE 0 END AS BIGINT) AS b
         FROM z)
SELECT CAST(SUM(b) AS BIGINT) AS zeta_bits,
       CAST(COUNT(*) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS bits_per_link
FROM bits"""


def zeta3_bits_sql() -> str:
    """Closed-form interleaved-ζ₃ cost of firsts(int2nat)+gaps — bit
    lengths via BIN() string length, so INTEGER-exact (no float LOG2
    rounding hazard). Twin of bitstream.bv_bits_per_link on a
    code='zeta3' pack."""
    return f"WITH {EDGES_CTE},{_ZETA3_TAIL}"


_VALS_CTE = """
lists AS (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
            LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
          FROM edges),
vals AS (SELECT CASE WHEN rn = 1
                     THEN (CASE WHEN dst - src >= 0 THEN 2 * (dst - src)
                           ELSE -2 * (dst - src) - 1 END)
                     ELSE dst - prev - 1 END AS v
         FROM lists)"""


def golomb_bits_sql(b: int = 3) -> str:
    """Closed-form interleaved Golomb_b cost of firsts(int2nat)+gaps:
    (v//b + 1) unary + minimal binary of v%b (log2b bits below the
    2^(log2b+1)-b threshold, log2b+1 above). All-integer arithmetic.
    Twin of bitstream.bv_bits_per_link on a code='golomb<b>' pack."""
    log2b = b.bit_length() - 1
    thresh = (1 << (log2b + 1)) - b
    return f"""WITH {EDGES_CTE},{_VALS_CTE},
bits AS (SELECT CAST((v // {b} + 1) + {log2b}
                + CASE WHEN v % {b} >= {thresh} THEN 1 ELSE 0 END
                AS BIGINT) AS b FROM vals)
SELECT CAST(SUM(b) AS BIGINT) AS golomb_bits,
       CAST(COUNT(*) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS bits_per_link
FROM bits"""


def nibble_bits_sql() -> str:
    """Closed-form variable-length-nibble cost of firsts(int2nat)+gaps:
    4 bits per 3-bit group, groups = max(1, ceil(bitlen(v)/3)); integer
    bit lengths via BIN(). Twin of bitstream.bv_bits_per_link on a
    code='nibble' pack."""
    return f"""WITH {EDGES_CTE},{_VALS_CTE},
bits AS (SELECT CAST(4 * (CASE WHEN v = 0 THEN 1
                ELSE (LENGTH(BIN(CAST(v AS BIGINT))) + 2) // 3 END)
                AS BIGINT) AS b FROM vals)
SELECT CAST(SUM(b) AS BIGINT) AS nibble_bits,
       CAST(COUNT(*) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS bits_per_link
FROM bits"""


def gray_gamma_bits_sql(group_expr: str | None = None) -> str:
    """Twin of gray_code_permutation + gamma_bits_per_link: rebuilds the
    prefix-XOR Gray array key (transforms._succ_key) in SQL, dense-ranks
    it, relabels the arcs, and costs the result under the gamma model.
    ``group_expr`` (over ``node``) makes the rank group-major — the
    hostByHostGrayCodePermutation twin (Transform.java:2455-2516)."""
    grp = f"{group_expr}, " if group_expr else ""
    return f"""WITH {EDGES_CTE}, {NODES_CTE},
succ AS MATERIALIZED (SELECT src AS node, list_sort(list(dst)) AS s
                      FROM (SELECT DISTINCT src, dst FROM edges) e GROUP BY src),
keyed AS (
  SELECT n.node, COALESCE(s.s, CAST([] AS BIGINT[])) AS s
  FROM nodes n LEFT JOIN succ s ON n.node = s.node),
gkey AS (
  SELECT node,
         list_append(
           list_transform(range(1, len(s) + 1),
                          i -> CASE WHEN i % 2 = 1 THEN -s[i] ELSE s[i] END),
           CASE WHEN len(s) % 2 = 1 THEN {_GRAY_BIG_SQL}
                ELSE -{_GRAY_BIG_SQL} END) AS k
  FROM keyed),
perm AS MATERIALIZED (
  SELECT node, ROW_NUMBER() OVER (ORDER BY {grp}k, node) - 1 AS target FROM gkey),
edges2 AS MATERIALIZED (
  SELECT DISTINCT ps.target AS src, pd.target AS dst
  FROM edges e
  JOIN perm ps ON e.src = ps.node
  JOIN perm pd ON e.dst = pd.node),
lists AS (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
            LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
          FROM edges2),
vals AS (SELECT CASE WHEN rn = 1
                     THEN (CASE WHEN dst - src >= 0 THEN 2 * (dst - src)
                           ELSE -2 * (dst - src) - 1 END)
                     ELSE dst - prev - 1 END AS v
         FROM lists),
bits AS (SELECT CAST(2 * (LENGTH(BIN(CAST(v + 1 AS BIGINT))) - 1) + 1
                 AS BIGINT) AS b FROM vals)
SELECT CAST(SUM(b) AS BIGINT) AS gamma_bits,
       CAST(COUNT(*) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS bits_per_link
FROM bits"""


def degree_dist_sql(direction: str = "out") -> str:
    col = "src" if direction == "out" else "dst"
    return f"""WITH {EDGES_CTE}
SELECT degree, COUNT(*) AS n_nodes FROM (
  SELECT {col}, COUNT(*) AS degree FROM edges GROUP BY {col}) t
GROUP BY degree"""


def graph_stats_sql() -> str:
    return f"""WITH {EDGES_CTE}, {NODES_CTE},
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
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


# ------------------------------------------------- BV compression model

def _sql_gamma(e: str) -> str:
    return f"(2 * (length(bin(({e}) + 1)) - 1) + 1)"


def _sql_gsum(lst: str) -> str:
    return (
        f"(CASE WHEN len({lst}) = 0 THEN 0 ELSE "
        f"list_reduce(list_transform({lst}, "
        f"v -> 2 * (length(bin(v + 1)) - 1) + 1), (a, b) -> a + b) END)"
    )


def _sql_zeta3(e: str) -> str:
    h = f"((length(bin(({e}) + 1)) - 1) // 3)"
    return (
        f"(({h} + 1) + (3 * {h} + 2) + "
        f"(CASE WHEN (({e}) + 1) - (1::BIGINT << (3 * {h})) < "
        f"(1::BIGINT << (3 * {h})) THEN 0 ELSE 1 END))"
    )


def _sql_zsum(lst: str) -> str:
    h = "((length(bin(v + 1)) - 1) // 3)"
    z = (
        f"(({h} + 1) + (3 * {h} + 2) + "
        f"(CASE WHEN (v + 1) - (1::BIGINT << (3 * {h})) < "
        f"(1::BIGINT << (3 * {h})) THEN 0 ELSE 1 END))"
    )
    return (
        f"(CASE WHEN len({lst}) = 0 THEN 0 ELSE "
        f"list_reduce(list_transform({lst}, v -> {z}), (a, b) -> a + b) END)"
    )


def _sql_int2nat(d: str) -> str:
    return f"(CASE WHEN ({d}) >= 0 THEN 2 * ({d}) ELSE -2 * ({d}) - 1 END)"


def bv_bits_sql() -> str:
    """Twin of operators.bvcomp.bv_bits_per_link at the oracle-checkable
    configuration: window=1, unlimited reference-chain depth (choices
    independent per node), min_interval=4, zeta_3 residuals, gamma
    outdegrees/blocks, unary references, ONE pack block (so the window
    is never block-truncated). Replicates diffComp's copy/skip merge,
    intervalize, and the per-node min(plain, ref-previous-id) entirely
    with DuckDB list lambdas (BVGraph.java:2053-2106, 1631-1654,
    2302-2326)."""
    g = _sql_gamma
    gsum = _sql_gsum
    i2n = _sql_int2nat
    return f"""WITH {EDGES_CTE},
lists AS MATERIALIZED (
  SELECT src, list_sort(list(dst)) AS cur FROM edges GROUP BY src),
pairs AS (
  SELECT l.src, l.cur, p.cur AS ref
  FROM lists l LEFT JOIN lists p ON p.src = l.src - 1),
-- copy/skip blocks of cur against ref (the diffComp merge): the walk
-- consumes the ref prefix <= max(cur); runs of matched/unmatched
-- alternate starting with copy; trailing block drops per the rule
refpre AS (
  SELECT src, cur, ref,
         list_filter(ref, x -> x <= cur[len(cur)]) AS pref
  FROM pairs WHERE ref IS NOT NULL),
refm AS (
  SELECT src, cur, ref, pref, len(pref) AS p, len(ref) AS rl,
         list_transform(pref, x -> CASE WHEN list_contains(cur, x)
                                        THEN 1 ELSE 0 END) AS m
  FROM refpre),
refruns AS (
  SELECT *,
    list_concat([1], list_filter(range(2, p + 1), i -> m[i] != m[i-1])) AS bst,
    list_concat(list_filter(range(2, p + 1), i -> m[i] != m[i-1]), [p + 1]) AS ben
  FROM refm),
refseq0 AS (
  SELECT *,
    CASE WHEN p = 0 THEN [0]
         WHEN m[1] = 0 THEN list_concat([0],
           list_transform(range(1, len(bst) + 1), j -> ben[j] - bst[j]))
         ELSE list_transform(range(1, len(bst) + 1), j -> ben[j] - bst[j])
    END AS seq0,
    CASE WHEN p = 0 THEN 0
         WHEN (m[bst[len(bst)]] = 1 AND p = rl) OR m[bst[len(bst)]] = 0
         THEN 1 ELSE 0 END AS dropl
  FROM refruns),
refblk AS (
  SELECT src, cur, ref,
    CASE WHEN dropl = 1 THEN seq0[1:len(seq0) - 1] ELSE seq0 END AS seq
  FROM refseq0),
-- two variants per node: plain (ref bits unary(0)=1, extras=cur) and
-- referenced (unary(1)=2 + block bits, extras = cur minus copied)
variants AS (
  SELECT src, 'p' AS vk, 1 AS pre_bits, cur AS E FROM pairs
  UNION ALL
  SELECT src, 'r' AS vk,
    2 + {g("len(seq)")}
      + CASE WHEN len(seq) = 0 THEN 0 ELSE
          {g("seq[1]")} + {gsum("list_transform(range(2, len(seq) + 1), j -> seq[j] - 1)")}
        END AS pre_bits,
    list_filter(cur, x -> NOT list_contains(ref, x)) AS E
  FROM refblk),
-- intervalize(E, 4): maximal consecutive runs via the value-minus-index
-- trick; runs >= 4 become (left, len) intervals, the rest residuals
vruns AS (
  SELECT *,
    list_concat([1], list_filter(range(2, len(E) + 1),
      i -> E[i] - i != E[i-1] - (i - 1))) AS ist,
    list_concat(list_filter(range(2, len(E) + 1),
      i -> E[i] - i != E[i-1] - (i - 1)), [len(E) + 1]) AS ien
  FROM variants),
vlens AS (
  SELECT *,
    list_transform(range(1, len(ist) + 1), j -> ien[j] - ist[j]) AS rlens
  FROM vruns),
vint AS (
  SELECT *,
    list_transform(list_filter(range(1, len(ist) + 1), j -> rlens[j] >= 4),
                   j -> E[ist[j]]) AS ilefts,
    list_transform(list_filter(range(1, len(ist) + 1), j -> rlens[j] >= 4),
                   j -> rlens[j]) AS ilens,
    list_transform(
      list_filter(range(1, len(E) + 1),
        i -> rlens[len(list_filter(ist, s -> s <= i))] < 4),
      i -> E[i]) AS R
  FROM vlens),
vbits AS (
  SELECT src, vk,
    pre_bits
    -- the whole interval/residual section is written only when there
    -- are extras at all (diffComp: "if (extraCount > 0)")
    + CASE WHEN len(E) = 0 THEN 0 ELSE {g("len(ilefts)")} END
    + CASE WHEN len(ilefts) = 0 THEN 0 ELSE
        {g(i2n("ilefts[1] - src"))}
        + {gsum("list_transform(range(2, len(ilefts) + 1), j -> ilefts[j] - (ilefts[j-1] + ilens[j-1]) - 1)")}
        + {gsum("list_transform(range(1, len(ilens) + 1), j -> ilens[j] - 4)")}
      END
    + CASE WHEN len(R) = 0 THEN 0 ELSE
        {_sql_zeta3(i2n("R[1] - src"))}
        + {_sql_zsum("list_transform(range(2, len(R) + 1), i -> R[i] - R[i-1] - 1)")}
      END AS bits
  FROM vint),
per_node AS (
  SELECT src, MIN(bits) AS best FROM vbits GROUP BY src),
deg AS (SELECT src, len(cur) AS outd FROM lists)
SELECT CAST(SUM(n.best + {g("d.outd")}) AS BIGINT) AS bv_bits,
       CAST(SUM(d.outd) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(n.best + {g("d.outd")}) AS DOUBLE) / SUM(d.outd), 6)
         AS bits_per_link
FROM per_node n JOIN deg d ON n.src = d.src"""


def topk_harmonic_sql(k: int = 10, max_depth: int = 4) -> str:
    """Top-k positive harmonic centralities (rank, value) — oracle twin
    of the CutClos query (algos/topk.py). Values-only output: ties at
    equal centrality make the node assignment of a rank ambiguous, but
    the sorted value multiset is unique, so the gate hashes (rank,
    ROUND(harmonic, 6)) rows."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
v0 AS MATERIALIZED (SELECT node AS source, node, 0 AS dist FROM nodes)""")
    for j in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{i}" for i in range(j)
        )
        parts.append(f"""
v{j} AS MATERIALIZED (SELECT DISTINCT f.source, e.dst AS node, {j} AS dist
         FROM edges e JOIN v{j - 1} f ON e.src = f.node
         WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p
                           WHERE p.source = f.source AND p.node = e.dst))""")
    all_v = " UNION ALL ".join(
        f"SELECT source, node, dist FROM v{i}" for i in range(max_depth + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f""",
dists AS ({all_v}),
agg AS (
  SELECT source, SUM(1.0 / dist) AS harm
  FROM dists WHERE dist > 0 GROUP BY source
),
full_c AS (
  SELECT n.node, COALESCE(a.harm, 0.0) AS harm
  FROM nodes n LEFT JOIN agg a ON n.node = a.source
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY harm DESC) AS BIGINT) AS rank,
       ROUND(harm, 6) AS harmonic
FROM full_c ORDER BY harm DESC LIMIT {k}"""
    )


def betweenness_sql(n_sources: int = 100, max_depth: int = 4) -> str:
    """Brandes betweenness restricted to ``n_sources`` smallest customer
    sources (the sampled-estimator ``sources`` path with scale 1) — the
    exact sigma/delta recurrence of algos/betweenness.py unrolled:
    forward sigma closure v0..v{max_depth}, then backward dependency
    levels d{max_depth}..d0 with delta_v = sigma_v * sum over
    shortest-path successors w of (1 + delta_w) / sigma_w."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append(f"""
srcs AS (SELECT o_custkey AS source FROM orders GROUP BY o_custkey
         ORDER BY source LIMIT {n_sources})""")
    parts.append("""
v0 AS MATERIALIZED (SELECT source, source AS node, 1.0 AS sigma FROM srcs)""")
    for j in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{i}" for i in range(j)
        )
        parts.append(f"""
v{j} AS MATERIALIZED (SELECT f.source, e.dst AS node, SUM(f.sigma) AS sigma
         FROM edges e JOIN v{j - 1} f ON e.src = f.node
         WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p
                           WHERE p.source = f.source AND p.node = e.dst)
         GROUP BY f.source, e.dst)""")
    # backward: d{max_depth} seeds delta = 0; each lower level joins the
    # level above through the arc table (arcs from dist j-1 to dist j are
    # exactly the shortest-path DAG arcs in level-synchronous BFS)
    parts.append(f"""
d{max_depth} AS MATERIALIZED (SELECT source, node, sigma, 0.0 AS delta FROM v{max_depth})""")
    for j in range(max_depth, 0, -1):
        parts.append(f"""
d{j - 1} AS MATERIALIZED (
  SELECT v.source, v.node, v.sigma,
         COALESCE(c.t, 0.0) * v.sigma AS delta
  FROM v{j - 1} v LEFT JOIN (
    SELECT w.source, e.src AS node, SUM((1.0 + w.delta) / w.sigma) AS t
    FROM d{j} w JOIN edges e ON e.dst = w.node
    GROUP BY w.source, e.src) c
  ON c.source = v.source AND c.node = v.node)""")
    all_d = " UNION ALL ".join(
        f"SELECT source, node, delta FROM d{i}" for i in range(max_depth + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f""",
alld AS ({all_d}),
agg AS (
  SELECT node, SUM(delta) AS bc FROM alld
  WHERE source <> node GROUP BY node
)
SELECT n.node, ROUND(COALESCE(a.bc, 0.0), 6) AS betweenness
FROM nodes n LEFT JOIN agg a ON n.node = a.node"""
    )


# ------------------------------------------- transform/source twins (r3)

def union_transpose_sql() -> str:
    """Twin of union_graphs(edges, transpose(edges)) — the symmetrized
    arc set as a set union (Transform.union)."""
    return f"""WITH {EDGES_CTE}
SELECT src, dst FROM edges
UNION
SELECT dst AS src, src AS dst FROM edges"""


def line_graph_sql(max_node: int = OFF_PART) -> str:
    """Twin of line_graph over the customer->order->part layers: arc ids
    are dense ranks in (src, dst) order (util.ids.assign_dense_ids
    total-order contract), line arcs join head-to-tail."""
    return f"""WITH {EDGES_CTE},
e2 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < {max_node}),
arcs AS MATERIALIZED (
  SELECT src, dst, ROW_NUMBER() OVER (ORDER BY src, dst) - 1 AS arc_id
  FROM e2)
SELECT a.arc_id AS src, b.arc_id AS dst
FROM arcs a JOIN arcs b ON a.dst = b.src"""


def induced_subgraph_sql(max_node: int = OFF_PART) -> str:
    """Twin of induced_subgraph(edges, nodes < max_node, reindex=True):
    keep arcs with both endpoints in the set, then relabel to dense ids
    ordered by raw node id (the to/fromSupergraphNode map)."""
    return f"""WITH {EDGES_CTE}, {NODES_CTE},
ns AS MATERIALIZED (SELECT node FROM nodes WHERE node < {max_node}),
idmap AS MATERIALIZED (
  SELECT node, ROW_NUMBER() OVER (ORDER BY node) - 1 AS t FROM ns)
SELECT DISTINCT ms.t AS src, md.t AS dst
FROM edges e JOIN idmap ms ON e.src = ms.node JOIN idmap md ON e.dst = md.node"""


def degree_range_sql(min_deg: int = 1, max_deg: int = 8) -> str:
    """Twin of degree_range_subgraph(edges, min_deg, max_deg,
    reindex=False): nodes kept iff outdegree in [min_deg, max_deg);
    dangling nodes have outdegree 0."""
    return f"""WITH {EDGES_CTE}, {NODES_CTE},
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
keep AS MATERIALIZED (
  SELECT n.node FROM nodes n LEFT JOIN outdeg o ON n.node = o.src
  WHERE COALESCE(o.d, 0) >= {min_deg} AND COALESCE(o.d, 0) < {max_deg})
SELECT e.src, e.dst
FROM edges e JOIN keep a ON e.src = a.node JOIN keep b ON e.dst = b.node"""


def mask_interval_sql(width: int = 31) -> str:
    """Twin of mask_arcs(edges, intervals_to_arcs(per-src
    [min(dst), min(dst)+width])): drop each list's leading interval."""
    return f"""WITH {EDGES_CTE},
mins AS MATERIALIZED (SELECT src, MIN(dst) AS lo FROM edges GROUP BY src)
SELECT e.src, e.dst
FROM edges e JOIN mins m ON e.src = m.src
WHERE e.dst < m.lo OR e.dst > m.lo + {width}"""


def lex_gamma_bits_sql() -> str:
    """Twin of lexicographical_permutation + gamma_bits_per_link: the
    plain adjacency-array key closed by the +BIG sentinel (transforms.
    _adj_body_sentinel gray=False), dense-ranked, relabeled, costed."""
    return f"""WITH {EDGES_CTE}, {NODES_CTE},
succ AS MATERIALIZED (SELECT src AS node, list_sort(list(dst)) AS s
                      FROM (SELECT DISTINCT src, dst FROM edges) e GROUP BY src),
keyed AS (
  SELECT n.node, COALESCE(s.s, CAST([] AS BIGINT[])) AS s
  FROM nodes n LEFT JOIN succ s ON n.node = s.node),
lkey AS (
  SELECT node, list_append(s, {_GRAY_BIG_SQL}) AS k FROM keyed),
perm AS MATERIALIZED (
  SELECT node, ROW_NUMBER() OVER (ORDER BY k, node) - 1 AS target FROM lkey),
edges2 AS MATERIALIZED (
  SELECT DISTINCT ps.target AS src, pd.target AS dst
  FROM edges e
  JOIN perm ps ON e.src = ps.node
  JOIN perm pd ON e.dst = pd.node),
lists AS (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
            LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
          FROM edges2),
vals AS (SELECT CASE WHEN rn = 1
                     THEN (CASE WHEN dst - src >= 0 THEN 2 * (dst - src)
                           ELSE -2 * (dst - src) - 1 END)
                     ELSE dst - prev - 1 END AS v
         FROM lists),
bits AS (SELECT CAST(2 * (LENGTH(BIN(CAST(v + 1 AS BIGINT))) - 1) + 1
                 AS BIGINT) AS b FROM vals)
SELECT CAST(SUM(b) AS BIGINT) AS gamma_bits,
       CAST(COUNT(*) AS BIGINT) AS n_arcs,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS bits_per_link
FROM bits"""


def distance_cdf_sql(n_sources: int = 5, max_depth: int = 4) -> str:
    """Twin of algos.centrality.distance_cdf over the first n_sources
    customers: level-synchronous BFS unrolled (the graph is a 4-layer
    DAG, so max_depth=4 saturates), histogram + running sum."""
    parts = [EDGES_CTE]
    parts.append(f"""
srcs AS (SELECT o_custkey AS source FROM orders GROUP BY o_custkey
         ORDER BY source LIMIT {n_sources})""")
    parts.append("""
v0 AS MATERIALIZED (SELECT source, source AS node, 0 AS dist FROM srcs)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT f.source, e.dst AS node, {k} AS dist
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
hist AS (SELECT dist, COUNT(*) AS n FROM dists GROUP BY dist)
SELECT CAST(dist AS BIGINT) AS dist, CAST(n AS BIGINT) AS n_pairs,
       CAST(SUM(n) OVER (ORDER BY dist) AS BIGINT) AS cum_pairs
FROM hist"""
    )


def scattered_arcs_events_sql() -> str:
    """Twin of scattered_arcs_from_df over (user, event_type) string
    pairs from the events table: dictionary = dense rank over raw string
    ids, de-loop then symmetrize then distinct."""
    return """WITH raw AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS rsrc,
         'e:' || event_type AS rdst FROM events),
ids AS (SELECT DISTINCT raw_id FROM (
  SELECT rsrc AS raw_id FROM raw UNION ALL SELECT rdst FROM raw) t),
dic AS MATERIALIZED (
  SELECT raw_id, ROW_NUMBER() OVER (ORDER BY raw_id) - 1 AS node_id FROM ids),
e0 AS (SELECT ds.node_id AS src, dd.node_id AS dst
       FROM raw r JOIN dic ds ON r.rsrc = ds.raw_id
                  JOIN dic dd ON r.rdst = dd.raw_id),
e1 AS (SELECT src, dst FROM e0 WHERE src <> dst)
SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM e1 UNION ALL SELECT dst AS src, src AS dst FROM e1) u"""


def stratified_sample_sql(k: int = 20) -> str:
    """Twin of functions.sampling.stratified_sample_k over documents
    stratified by lang: k smallest doc_ids per stratum in portable-md5
    order."""
    return f"""WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                    doc_id) AS rk
  FROM documents)
SELECT doc_id, lang FROM ranked WHERE rk <= {k}"""


def llp_gamma_bits_sql(gammas=(0.0, 0.5), rounds: int = 2) -> str:
    """Twin of algos.llp.llp_permutation + gamma_bits_per_link: unrolls
    each γ layer's synchronous penalized updates (score = cnt −
    γ·(vol − cnt), argmax with min-label tie-break), sorts nodes by the
    per-γ label tuple then node, relabels arcs, costs under the γ model.
    Dyadic γ keeps every score exact in float64 on both engines."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    for i, g in enumerate(gammas):
        parts.append(f"""
g{i}l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)""")
        for k in range(1, rounds + 1):
            prev = f"g{i}l{k - 1}"
            parts.append(f"""
g{i}cnt{k} AS MATERIALIZED (
  SELECT s.dst AS node, l.label, COUNT(*) AS cnt
  FROM sym s JOIN {prev} l ON s.src = l.node GROUP BY s.dst, l.label)""")
            parts.append(f"""
g{i}vol{k} AS MATERIALIZED (
  SELECT label, COUNT(*) AS vol FROM {prev} GROUP BY label)""")
            parts.append(f"""
g{i}b{k} AS MATERIALIZED (SELECT node, label FROM (
  SELECT c.node, c.label,
         ROW_NUMBER() OVER (
           PARTITION BY c.node
           ORDER BY CAST(c.cnt AS DOUBLE) - {g!r} * (v.vol - c.cnt) DESC,
                    c.label ASC) AS rn
  FROM g{i}cnt{k} c JOIN g{i}vol{k} v ON c.label = v.label) t
  WHERE rn = 1)""")
            parts.append(f"""
g{i}l{k} AS MATERIALIZED (
  SELECT l.node, COALESCE(b.label, l.label) AS label
  FROM {prev} l LEFT JOIN g{i}b{k} b ON l.node = b.node)""")
    joins = "".join(
        f" JOIN g{i}l{rounds} t{i} ON n.node = t{i}.node"
        for i in range(len(gammas))
    )
    order = ", ".join(f"t{i}.label" for i in range(len(gammas)))
    parts.append(f"""
perm AS MATERIALIZED (
  SELECT n.node, ROW_NUMBER() OVER (ORDER BY {order}, n.node) - 1 AS target
  FROM nodes n{joins})""")
    parts.append("""
edges2 AS MATERIALIZED (
  SELECT DISTINCT ps.target AS src, pd.target AS dst
  FROM edges e
  JOIN perm ps ON e.src = ps.node
  JOIN perm pd ON e.dst = pd.node)""")
    tail = _GAMMA_TAIL.replace("FROM edges)", "FROM edges2)", 1)
    return "WITH " + ",".join(parts) + "," + tail


def ppr_sql(
    iters: int = 5,
    alpha: float = 0.85,
    n_seeds: int = 10,
    round_to: int = 9,
) -> str:
    """Twin of algos.pagerank.personalized_pagerank with
    fixed_iterations=iters and seeds = the n_seeds smallest node ids:
    restart vector p uniform on seeds, dangling mass restarts to p."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append(f"""
seeds AS MATERIALIZED (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds})""")
    parts.append("""
pvec AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL
              THEN 1.0 / (SELECT COUNT(*) FROM seeds) ELSE 0.0 END AS p
  FROM nodes n LEFT JOIN seeds s ON n.node = s.node)""")
    parts.append("""
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM edges GROUP BY src)""")
    parts.append("""
dangling AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outdeg))""")
    parts.append("""
r0 AS MATERIALIZED (SELECT node, p AS rank FROM pvec)""")
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(f"""
dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {prev} r
          JOIN dangling d ON r.node = d.node)""")
        parts.append(f"""
c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / o.c) AS contrib
         FROM edges e JOIN {prev} r ON e.src = r.node
         JOIN outdeg o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
r{k} AS MATERIALIZED (SELECT p.node,
         p.p * ((1.0 - {alpha}) + {alpha} * (SELECT m FROM dm{k}))
         + {alpha} * COALESCE(c.contrib, 0.0) AS rank
         FROM pvec p LEFT JOIN c{k} c ON p.node = c.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM r{iters}"
    )


def hits_sql(iterations: int = 8, round_to: int = 9) -> str:
    """Twin of algos.spectral.hits: synchronous HITS, L1-normalized
    after each half-update, fixed iteration count."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
s0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS hub,
         1.0 / (SELECT n FROM nn) AS auth FROM nodes)""")
    for k in range(1, iterations + 1):
        prev = f"s{k - 1}"
        parts.append(f"""
ar{k} AS MATERIALIZED (
  SELECT n.node, COALESCE(t.w, 0.0) AS a_raw
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(s.hub) AS w
    FROM edges e JOIN {prev} s ON e.src = s.node GROUP BY e.dst) t
  ON n.node = t.node)""")
        parts.append(f"""
an{k} AS MATERIALIZED (
  SELECT node, a_raw / (SELECT SUM(a_raw) FROM ar{k}) AS auth FROM ar{k})""")
        parts.append(f"""
hr{k} AS MATERIALIZED (
  SELECT n.node, COALESCE(t.w, 0.0) AS h_raw
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, SUM(a.auth) AS w
    FROM edges e JOIN an{k} a ON e.dst = a.node GROUP BY e.src) t
  ON n.node = t.node)""")
        parts.append(f"""
s{k} AS MATERIALIZED (
  SELECT h.node, h.h_raw / (SELECT SUM(h_raw) FROM hr{k}) AS hub, a.auth
  FROM hr{k} h JOIN an{k} a ON h.node = a.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT node, ROUND(hub, {round_to}) AS hub,
       ROUND(auth, {round_to}) AS authority FROM s{iterations}"""
    )


def katz_sql(
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 8,
    round_to: int = 9,
) -> str:
    """Twin of algos.spectral.katz_centrality: x_{k+1} = beta + alpha *
    A^T x_k, x_0 = beta, fixed truncation."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append(f"""
x0 AS MATERIALIZED (SELECT node, {beta!r} AS x FROM nodes)""")
    for k in range(1, iterations + 1):
        prev = f"x{k - 1}"
        parts.append(f"""
x{k} AS MATERIALIZED (
  SELECT n.node, {beta!r} + {alpha!r} * COALESCE(t.w, 0.0) AS x
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.x) AS w
    FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst) t
  ON n.node = t.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(x, {round_to}) AS katz FROM x{iterations}"
    )


def ecc_sample_sql(n_sources: int = 5, max_depth: int = 4) -> str:
    """Twin of forward eccentricity from the first ``n_sources``
    customers (examples/BreadthFirst analog): the same level-synchronous
    unrolled BFS as distance_cdf_sql, aggregated per source."""
    parts = [EDGES_CTE]
    parts.append(f"""
srcs AS (SELECT o_custkey AS source FROM orders GROUP BY o_custkey
         ORDER BY source LIMIT {n_sources})""")
    parts.append("""
v0 AS MATERIALIZED (SELECT source, source AS node, 0 AS dist FROM srcs)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT source, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT f.source, e.dst AS node, {k} AS dist
         FROM edges e JOIN v{k - 1} f ON e.src = f.node
         WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p
                           WHERE p.source = f.source AND p.node = e.dst))""")
    all_v = " UNION ALL ".join(
        f"SELECT source, node, dist FROM v{j}" for j in range(max_depth + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f""",
dists AS ({all_v})
SELECT source, CAST(MAX(dist) AS BIGINT) AS ecc,
       CAST(COUNT(*) AS BIGINT) AS n_reached
FROM dists GROUP BY source"""
    )


def seeded_perm_sql(seed: int = 42) -> str:
    """Twin of the portable seeded random permutation: dense rank over
    (md5_long(node || ':' || seed), node) — identical total order in both
    engines — then arc remap."""
    h = f"('0x' || substr(md5(CAST(node AS VARCHAR) || ':{seed}'), 1, 15))::BIGINT"
    return f"""WITH {EDGES_CTE},{NODES_CTE},
dic AS MATERIALIZED (
  SELECT node, ROW_NUMBER() OVER (ORDER BY {h}, node) - 1 AS target
  FROM nodes)
SELECT DISTINCT ds.target AS src, dd.target AS dst
FROM edges e JOIN dic ds ON e.src = ds.node
             JOIN dic dd ON e.dst = dd.node"""


def compose_minplus_sql() -> str:
    """Twin of min-plus semiring composition of the customer->order and
    order->part labelled layers (Transform.compose with LabelSemiring)."""
    return f"""WITH {LABELLED_EDGES_CTE}
SELECT a.src, b.dst, CAST(MIN(a.label + b.label) AS BIGINT) AS label
FROM ledges a JOIN ledges b ON a.dst = b.src
WHERE a.src < {OFF_ORDER}
  AND b.src >= {OFF_ORDER} AND b.src < {OFF_PART}
GROUP BY a.src, b.dst"""


def union_labelled_boost_sql() -> str:
    """Twin of the labelled union with SUM merge: the full labelled arc
    table unioned with (multiplicity > 1 arcs re-labelled 1) — overlap
    arcs exercise the merge strategy, singleton arcs pass through."""
    return f"""WITH {LABELLED_EDGES_CTE},
boost AS (SELECT src, dst, 1 AS label FROM ledges WHERE label > 1),
both_arcs AS (
  SELECT src, dst, label FROM ledges
  UNION ALL
  SELECT src, dst, label FROM boost)
SELECT src, dst, CAST(SUM(label) AS BIGINT) AS label
FROM both_arcs GROUP BY src, dst"""


# ------------------------------------------------- weighted paths / layers

def sssp_sql(rounds: int = 6, source_pred: str = "node < 100") -> str:
    """Twin of algos.paths.sssp over the labelled edge table (weight =
    arc multiplicity label), k synchronous Bellman-Ford relaxations from
    the source set. Integer distances — exact comparison, no rounding."""
    parts = [LABELLED_EDGES_CTE]
    parts.append("""
nodes AS MATERIALIZED (
  SELECT src AS node FROM ledges UNION SELECT dst AS node FROM ledges)""")
    parts.append(f"""
d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
      WHERE {source_pred})""")
    for k in range(1, rounds + 1):
        parts.append(f"""
d{k} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.label AS dist
    FROM ledges e JOIN d{k - 1} d ON e.src = d.node
  ) t GROUP BY node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"
    )


def dag_layers_sql(rounds: int = 4) -> str:
    """Twin of algos.paths.dag_layers: k max-propagation rounds of
    layer(v) = max(layer(v), max over in-edges layer(u) + 1). The TPC-H
    link graph is a DAG by construction (offsets strictly increase along
    customer -> order -> part -> supplier), with longest path 3, so 4
    rounds reach the fixpoint."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
l0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS layer FROM nodes)""")
    for k in range(1, rounds + 1):
        parts.append(f"""
l{k} AS MATERIALIZED (
  SELECT n.node, GREATEST(n.layer, COALESCE(p.cand, 0)) AS layer
  FROM l{k - 1} n LEFT JOIN (
    SELECT e.dst AS node, MAX(l.layer + 1) AS cand
    FROM edges e JOIN l{k - 1} l ON e.src = l.node GROUP BY e.dst
  ) p ON n.node = p.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, CAST(layer AS BIGINT) AS layer FROM l{rounds}"
    )


# --------------------------------------------------- spectral link analysis

def eigenvector_sql(iters: int = 8, round_to: int = 9) -> str:
    """Twin of algos.spectral.eigenvector_centrality over the simplified
    (symmetrized, loop-free) graph: k rounds of x <- A^T x / ||A^T x||_1
    from the uniform vector (zero-safe normalizer, matching the
    operator's try_divide)."""
    parts = [EDGES_CTE, SYM_CTE]
    parts.append("""
nodes AS MATERIALIZED (
  SELECT src AS node FROM sym UNION SELECT dst AS node FROM sym)""")
    parts.append("""
nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
x0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS score FROM nodes)""")
    for k in range(1, iters + 1):
        parts.append(f"""
y{k} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(x.score) AS y
  FROM sym e JOIN x{k - 1} x ON e.src = x.node GROUP BY e.dst)""")
        parts.append(f"""
x{k} AS MATERIALIZED (
  SELECT n.node,
         COALESCE(COALESCE(y.y, 0.0) / NULLIF((SELECT SUM(y) FROM y{k}), 0.0),
                  0.0) AS score
  FROM nodes n LEFT JOIN y{k} y ON n.node = y.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(score, {round_to}) AS score FROM x{iters}"
    )


def salsa_sql(iters: int = 4, round_to: int = 9) -> str:
    """Twin of algos.spectral.salsa_authority: the SALSA authority chain
    a'(v) = sum_{u->v} (1/out(u)) sum_{u->w} a(w)/in(w), k rounds from
    uniform over indegree>0 nodes."""
    parts = [EDGES_CTE]
    parts.append("""
indeg AS MATERIALIZED (SELECT dst AS node, COUNT(*) AS ind FROM edges GROUP BY dst)""")
    parts.append("""
outdeg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS outd FROM edges GROUP BY src)""")
    parts.append("""
na AS (SELECT COUNT(*) AS n FROM indeg)""")
    parts.append("""
a0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM na) AS auth FROM indeg)""")
    for k in range(1, iters + 1):
        parts.append(f"""
h{k} AS MATERIALIZED (
  SELECT e.src AS node, SUM(a.auth / i.ind) AS h
  FROM edges e JOIN a{k - 1} a ON e.dst = a.node JOIN indeg i ON a.node = i.node
  GROUP BY e.src)""")
        parts.append(f"""
a{k} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(h.h / o.outd) AS auth
  FROM edges e JOIN h{k} h ON e.src = h.node JOIN outdeg o ON h.node = o.node
  GROUP BY e.dst)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(auth, {round_to}) AS auth FROM a{iters}"
    )


def wpagerank_sql(
    iters: int = 5,
    alpha: float = 0.85,
    round_to: int = 9,
    ledges_cte: str | None = None,
) -> str:
    """Twin of algos.pagerank.pagerank_weighted over a labelled edge
    table (contribution rank*w/W(u), uniform dangling redistribution).
    ``ledges_cte`` must define ``ledges(src, dst, label)``; defaults to
    the TPC-H arc-multiplicity table."""
    parts = [ledges_cte if ledges_cte is not None else LABELLED_EDGES_CTE]
    parts.append("""
nodes AS MATERIALIZED (
  SELECT src AS node FROM ledges UNION SELECT dst AS node FROM ledges)""")
    parts.append("""
outw AS MATERIALIZED (SELECT src, CAST(SUM(label) AS BIGINT) AS wsum
                      FROM ledges GROUP BY src)""")
    parts.append("""
dangling AS MATERIALIZED (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outw))""")
    parts.append("""
nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""")
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(f"""
dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {prev} r
          JOIN dangling d ON r.node = d.node)""")
        parts.append(f"""
c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank * e.label / o.wsum) AS contrib
         FROM ledges e JOIN {prev} r ON e.src = r.node
         JOIN outw o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
r{k} AS MATERIALIZED (SELECT n.node,
         (1.0 - {alpha}) / (SELECT n FROM nn)
         + {alpha} * ((SELECT m FROM dm{k}) / (SELECT n FROM nn)
                       + COALESCE(c.contrib, 0.0)) AS rank
         FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM r{iters}"
    )


def modularity_sql(rounds: int = 3) -> str:
    """Modularity of the ``rounds``-round label-propagation partition —
    twin of :func:`webgraph_spark.algos.labelprop.modularity` over
    :func:`lp_sql`'s converged labels. Integer numerator, one double
    division (bit-identical to the Spark plan)."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    # reuse the unrolled LP recurrence
    lp = lp_sql(rounds)
    lp_body = lp[len("WITH "):lp.rindex("\nSELECT")]
    # strip the three shared leading CTEs from the LP unroll
    shared = ",".join(parts)
    assert lp_body.startswith(shared)
    parts_sql = lp_body + f""",
lab AS MATERIALIZED (SELECT node, label FROM l{rounds}),
arcs AS MATERIALIZED (
  SELECT la.label AS lsrc, lb.label AS ldst
  FROM sym s JOIN lab la ON s.src = la.node
             JOIN lab lb ON s.dst = lb.node),
dc AS (SELECT SUM(d * d) AS sum_d2 FROM (
         SELECT lsrc, COUNT(*) AS d FROM arcs GROUP BY lsrc)),
tot AS (SELECT COUNT(*) AS m,
               SUM(CASE WHEN lsrc = ldst THEN 1 ELSE 0 END) AS within
        FROM arcs),
nc AS (SELECT COUNT(DISTINCT label) AS n_communities FROM lab)
SELECT ROUND(CAST(tot.m * tot.within - dc.sum_d2 AS DOUBLE)
             / CAST(tot.m * tot.m AS DOUBLE), 9) AS modularity,
       CAST(nc.n_communities AS BIGINT) AS n_communities,
       CAST(tot.m AS BIGINT) AS m_arcs
FROM tot, dc, nc"""
    return "WITH " + parts_sql


def msf_sql(rounds: int = 6, jumps: int = 12) -> str:
    """Twin of algos.msf.boruvka_msf(fixed_rounds=rounds, jumps=jumps)
    over the labelled edge table (weight = arc multiplicity): unrolled
    Borůvka with the identical deterministic schedule — per-component
    argmin edge under the (w, a, b) total order, mutual-minimum 2-cycle
    broken at the smaller component id, ``jumps`` pointer doublings per
    round. Both sides are idempotent past the fixpoint, so any schedule
    that reaches it returns the exact minimum spanning forest."""
    parts = [LABELLED_EDGES_CTE]
    parts.append("""
uedges AS MATERIALIZED (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, MIN(label) AS w
  FROM ledges WHERE src <> dst GROUP BY 1, 2)""")
    parts.append("""
c0 AS MATERIALIZED (
  SELECT node, node AS comp FROM (
    SELECT a AS node FROM uedges UNION SELECT b AS node FROM uedges))""")
    for k in range(1, rounds + 1):
        parts.append(f"""
live{k} AS MATERIALIZED (
  SELECT u.a, u.b, u.w, ca.comp AS ca, cb.comp AS cb
  FROM uedges u
  JOIN c{k - 1} ca ON u.a = ca.node
  JOIN c{k - 1} cb ON u.b = cb.node
  WHERE ca.comp <> cb.comp)""")
        parts.append(f"""
chosen{k} AS MATERIALIZED (
  SELECT c, oc, w, a, b FROM (
    SELECT c, oc, w, a, b,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, a, b) AS rn
    FROM (
      SELECT ca AS c, cb AS oc, w, a, b FROM live{k}
      UNION ALL
      SELECT cb AS c, ca AS oc, w, a, b FROM live{k})
  ) t WHERE rn = 1)""")
        parts.append(f"""
p{k}_0 AS MATERIALIZED (
  SELECT x.c,
         CASE WHEN y.oc = x.c AND x.c < x.oc THEN x.c ELSE x.oc END AS p
  FROM chosen{k} x JOIN chosen{k} y ON x.oc = y.c)""")
        for j in range(1, jumps + 1):
            parts.append(f"""
p{k}_{j} AS MATERIALIZED (
  SELECT x.c, y.p FROM p{k}_{j - 1} x JOIN p{k}_{j - 1} y ON x.p = y.c)""")
        parts.append(f"""
c{k} AS MATERIALIZED (
  SELECT n.node, COALESCE(pp.p, n.comp) AS comp
  FROM c{k - 1} n LEFT JOIN p{k}_{jumps} pp ON n.comp = pp.c)""")
    union = "\n    UNION ALL\n    ".join(
        f"SELECT a, b, w FROM chosen{k}" for k in range(1, rounds + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT DISTINCT a, b, CAST(w AS BIGINT) AS w FROM (
    {union}) t"""
    )


def mis_sql(rounds: int = 5) -> str:
    """Twin of algos.mis.luby_mis(fixed_rounds=rounds) over the simple
    link graph: unrolled Luby rounds with the identical engine-portable
    priority md5_long('mis{k}:' || node) and (p, node)-tuple comparison.
    Rounds past the fixpoint are no-ops, so any schedule that reaches it
    returns the exact MIS."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
live0 AS MATERIALIZED (SELECT node FROM nodes)""")
    for k in range(1, rounds + 1):
        pr = f"('0x' || substr(md5('mis{k}:' || CAST(node AS VARCHAR)), 1, 15))::BIGINT"
        parts.append(f"""
pri{k} AS MATERIALIZED (SELECT node, {pr} AS p FROM live{k - 1})""")
        parts.append(f"""
nm{k} AS MATERIALIZED (
  SELECT e.dst AS node, MIN({{'p': ps.p, 'n': e.src}}) AS nm
  FROM sym e
  JOIN pri{k} ps ON e.src = ps.node
  JOIN live{k - 1} lb ON e.dst = lb.node
  GROUP BY e.dst)""")
        parts.append(f"""
win{k} AS MATERIALIZED (
  SELECT pr.node FROM pri{k} pr LEFT JOIN nm{k} m ON pr.node = m.node
  WHERE m.nm IS NULL OR {{'p': pr.p, 'n': pr.node}} < m.nm)""")
        parts.append(f"""
live{k} AS MATERIALIZED (
  SELECT node FROM live{k - 1}
  WHERE node NOT IN (SELECT node FROM win{k})
    AND node NOT IN (
      SELECT e.dst FROM sym e JOIN win{k} w ON e.src = w.node))""")
    union = "\n    UNION ALL\n    ".join(
        f"SELECT node, {k} AS round FROM win{k}" for k in range(1, rounds + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT node, CAST(round AS INT) AS round FROM (
    {union}) t"""
    )


def densest_sql(rounds: int = 4) -> str:
    """Twin of algos.densest.densest_subgraph(fixed_rounds=rounds) over
    the simple link graph: unrolled Bahmani greedy peel (eps = 1/2, peel
    test ``deg * n <= 3 * m`` in exact integers) and exact-rational
    best-snapshot argmax via cross-multiplication, earlier round winning
    ties. Returns the densest snapshot's nodes with its (n, m)."""
    parts = [EDGES_CTE, SYM_CTE]
    parts.append("""
e0 AS MATERIALIZED (SELECT src, dst FROM sym)""")
    for k in range(1, rounds + 1):
        parts.append(f"""
st{k - 1} AS MATERIALIZED (
  SELECT COUNT(DISTINCT src) AS n, COUNT(*) // 2 AS m FROM e{k - 1})""")
        parts.append(f"""
keep{k} AS MATERIALIZED (
  SELECT d.src FROM (
    SELECT src, COUNT(*) AS deg FROM e{k - 1} GROUP BY src) d, st{k - 1} s
  WHERE d.deg * s.n > 3 * s.m)""")
        parts.append(f"""
e{k} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{k - 1} e
  JOIN keep{k} a ON e.src = a.src
  JOIN keep{k} b ON e.dst = b.src)""")
    parts.append(f"""
st{rounds} AS MATERIALIZED (
  SELECT COUNT(DISTINCT src) AS n, COUNT(*) // 2 AS m FROM e{rounds})""")
    stats_union = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS k, n, m FROM st{k}" for k in range(0, rounds + 1)
    )
    nodes_union = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS k, src AS node FROM e{k} GROUP BY src"
        for k in range(0, rounds + 1)
    )
    parts.append(f"""
stats AS MATERIALIZED (
    {stats_union})""")
    parts.append("""
best AS MATERIALIZED (
  SELECT b.k, b.n, b.m FROM stats b
  WHERE b.n > 0 AND NOT EXISTS (
    SELECT 1 FROM stats x WHERE x.n > 0 AND (
      x.m * b.n > b.m * x.n
      OR (x.m * b.n = b.m * x.n AND x.k < b.k))))""")
    parts.append(f"""
allnodes AS MATERIALIZED (
    {nodes_union})""")
    return (
        "WITH " + ",".join(parts)
        + """
SELECT a.node, CAST(b.n AS BIGINT) AS n_nodes, CAST(b.m AS BIGINT) AS m_edges
FROM allnodes a JOIN best b ON a.k = b.k"""
    )


def local_cluster_sql(
    iters: int = 5,
    alpha: float = 0.85,
    n_seeds: int = 10,
    max_candidates: int = 300,
) -> str:
    """Twin of algos.localcluster.ppr_sweep over the link graph with
    seeds = the n_seeds smallest node ids: reuses the unrolled PPR
    recurrence (ppr_sql), rounds ranks to 9 decimals BEFORE ordering
    (the cross-engine float contract of the green PPR query), then the
    window-function conductance sweep — exact integer cut/vol prefix
    sums, one IEEE double division for phi."""
    ppr = ppr_sql(iters=iters, alpha=alpha, n_seeds=n_seeds)
    body = ppr[len("WITH "):ppr.rindex("\nSELECT")]
    return (
        "WITH " + body + f""",
pr AS MATERIALIZED (SELECT node, ROUND(rank, 9) AS rank FROM r{iters}),
{SYM_CTE.strip().rstrip(',')},
deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src),
tot AS MATERIALIZED (SELECT COUNT(*) AS v FROM sym),
cand AS MATERIALIZED (
  SELECT node, deg, rank / deg AS score
  FROM pr JOIN deg USING (node) WHERE rank > 0
  ORDER BY score DESC, node LIMIT {max_candidates}),
ranked AS MATERIALIZED (
  SELECT node, deg,
         ROW_NUMBER() OVER (ORDER BY score DESC, node) AS sweep_rank
  FROM cand),
earlier AS MATERIALIZED (
  SELECT ra.sweep_rank, COUNT(*) AS e
  FROM sym s JOIN ranked ra ON s.dst = ra.node
             JOIN ranked rb ON s.src = rb.node
  WHERE rb.sweep_rank < ra.sweep_rank
  GROUP BY ra.sweep_rank),
sweep AS MATERIALIZED (
  SELECT sweep_rank, node,
         SUM(deg) OVER w - 2 * SUM(e) OVER w AS cut,
         SUM(deg) OVER w AS vol
  FROM (SELECT r.sweep_rank, r.node, r.deg, COALESCE(x.e, 0) AS e
        FROM ranked r LEFT JOIN earlier x ON r.sweep_rank = x.sweep_rank) t
  WINDOW w AS (ORDER BY sweep_rank ROWS UNBOUNDED PRECEDING)),
phis AS MATERIALIZED (
  SELECT sweep_rank, node,
         CAST(cut AS DOUBLE)
           / LEAST(vol, (SELECT v FROM tot) - vol) AS phi
  FROM sweep
  WHERE LEAST(vol, (SELECT v FROM tot) - vol) > 0),
best AS MATERIALIZED (
  SELECT sweep_rank AS bk, phi FROM phis ORDER BY phi, sweep_rank LIMIT 1)
SELECT p.node, CAST(p.sweep_rank AS INT) AS sweep_rank,
       CAST(b.bk AS INT) AS k, ROUND(b.phi, 9) AS conductance
FROM phis p, best b WHERE p.sweep_rank <= b.bk"""
    )


def matching_sql(rounds: int = 6) -> str:
    """Twin of algos.matching.maximal_matching(fixed_rounds=rounds) over
    the simple link graph: unrolled handshake rounds with the identical
    engine-portable edge priority md5_long('mm{k}:' || a || ':' || b)
    and (p, a, b) argmin per node. Rounds past the fixpoint are no-ops."""
    parts = [EDGES_CTE]
    parts.append("""
live0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""")
    for k in range(1, rounds + 1):
        pr = (
            f"('0x' || substr(md5('mm{k}:' || CAST(a AS VARCHAR) || ':' || "
            f"CAST(b AS VARCHAR)), 1, 15))::BIGINT"
        )
        parts.append(f"""
pri{k} AS MATERIALIZED (SELECT a, b, {pr} AS p FROM live{k - 1})""")
        parts.append(f"""
shake{k} AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT node, a, b FROM (
      SELECT node, a, b,
             ROW_NUMBER() OVER (PARTITION BY node ORDER BY p, a, b) AS rn
      FROM (
        SELECT a AS node, p, a, b FROM pri{k}
        UNION ALL
        SELECT b AS node, p, a, b FROM pri{k}) u
    ) r WHERE rn = 1
  ) picks GROUP BY a, b HAVING COUNT(*) = 2)""")
        parts.append(f"""
live{k} AS MATERIALIZED (
  SELECT l.a, l.b FROM live{k - 1} l
  WHERE l.a NOT IN (SELECT a FROM shake{k} UNION ALL SELECT b FROM shake{k})
    AND l.b NOT IN (SELECT a FROM shake{k} UNION ALL SELECT b FROM shake{k}))""")
    union = "\n    UNION ALL\n    ".join(
        f"SELECT a, b, {k} AS round FROM shake{k}" for k in range(1, rounds + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT a, b, CAST(round AS INT) AS round FROM (
    {union}) t"""
    )


def coloring_sql(rounds: int = 14) -> str:
    """Twin of algos.coloring.speculative_coloring(fixed_rounds=rounds)
    over the simple link graph: unrolled speculative-mex rounds with the
    identical fixed priority md5_long('jp:' || node). Each round every
    live node picks the min-excludant of its already-final neighbours'
    colors; adjacent same-pick nodes conflict and the smaller (p, node)
    endpoint re-queues. Rounds past the fixpoint are no-ops (the live
    set is empty), so any schedule that reaches it returns the exact
    coloring (fixpoint measured: 7 rounds at sf0.001, 10 at sf0.01)."""
    pr = "('0x' || substr(md5('jp:' || CAST(node AS VARCHAR)), 1, 15))::BIGINT"
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append(f"""
pri AS MATERIALIZED (SELECT node, {pr} AS p FROM nodes)""")
    parts.append("""
live0 AS MATERIALIZED (SELECT node FROM nodes)""")
    parts.append("""
col0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS node, CAST(NULL AS INTEGER) AS color,
         CAST(NULL AS INTEGER) AS round WHERE 1 = 0)""")
    for k in range(1, rounds + 1):
        parts.append(f"""
nc{k} AS MATERIALIZED (
  SELECT DISTINCT e.src AS node, c.color FROM sym e
  JOIN live{k - 1} f ON f.node = e.src
  JOIN col{k - 1} c ON c.node = e.dst)""")
        parts.append(f"""
cnt{k} AS MATERIALIZED (
  SELECT f.node, COALESCE(x.cnt, 0) AS cnt FROM live{k - 1} f
  LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM nc{k} GROUP BY node) x
    ON f.node = x.node)""")
        parts.append(f"""
pick{k} AS MATERIALIZED (
  SELECT t.node, MIN(t.v) AS pick FROM (
    SELECT node, UNNEST(generate_series(0, cnt)) AS v FROM cnt{k}) t
  LEFT JOIN nc{k} n ON n.node = t.node AND n.color = t.v
  WHERE n.color IS NULL GROUP BY t.node)""")
        parts.append(f"""
los{k} AS MATERIALIZED (
  SELECT DISTINCT e.src AS node FROM sym e
  JOIN pick{k} a ON a.node = e.src
  JOIN pick{k} b ON b.node = e.dst
  JOIN pri pa ON pa.node = e.src
  JOIN pri pb ON pb.node = e.dst
  WHERE a.pick = b.pick
    AND {{'p': pa.p, 'n': e.src}} < {{'p': pb.p, 'n': e.dst}})""")
        parts.append(f"""
win{k} AS MATERIALIZED (
  SELECT p.node, p.pick FROM pick{k} p
  WHERE p.node NOT IN (SELECT node FROM los{k}))""")
        parts.append(f"""
col{k} AS MATERIALIZED (
  SELECT node, color, round FROM col{k - 1}
  UNION ALL
  SELECT node, CAST(pick AS INTEGER) AS color, {k} AS round FROM win{k})""")
        parts.append(f"""
live{k} AS MATERIALIZED (
  SELECT node FROM live{k - 1}
  WHERE node NOT IN (SELECT node FROM win{k}))""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT node, CAST(color AS INT) AS color, CAST(round AS INT) AS round
FROM col{rounds}"""
    )


def doulion_sql(k: int = 4) -> str:
    """Twin of algos.triangles.doulion_estimate(k): identical md5 edge
    coin over canonical undirected pairs, exact degree-oriented count
    on the sparsified graph, k^3 scale-up."""
    h = (
        "('0x' || substr(md5('dl:' || CAST(a AS VARCHAR) || ':' || "
        "CAST(b AS VARCHAR)), 1, 15))::BIGINT"
    )
    return f"""WITH {EDGES_CTE},
pairs AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst),
keep AS MATERIALIZED (
  SELECT a, b FROM pairs WHERE {h} % {k} = 0),
und AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM keep
  UNION
  SELECT b AS src, a AS dst FROM keep),
deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
orient AS (
  SELECT u.src, u.dst FROM und u
  JOIN deg ds ON ds.node = u.src
  JOIN deg dd ON dd.node = u.dst
  WHERE ds.d < dd.d OR (ds.d = dd.d AND u.src < u.dst)),
tri AS (
  SELECT COUNT(*) AS t FROM orient e1
  JOIN orient e2 ON e1.dst = e2.src
  JOIN orient e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT (SELECT COUNT(*) FROM keep) AS kept_edges,
       t AS triangles_sampled,
       CAST(t * {k ** 3} AS DOUBLE) AS estimate
FROM tri"""


def _partition_parts(k: int, rounds: int, slack_pct: int) -> list[str]:
    """Unrolled recurrence of algos.partition.balanced_partition:
    capacity-bounded synchronous LP from the node%k seed, integer
    scores, rank-admission into blocks with headroom."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("nn AS (SELECT COUNT(*) AS n FROM nodes)")
    cap = f"(((SELECT n FROM nn) * {100 + slack_pct} + {100 * k - 1}) // {100 * k})"
    parts.append(f"""
a0 AS MATERIALIZED (SELECT node, CAST(node % {k} AS INT) AS block FROM nodes)""")
    for r in range(1, rounds + 1):
        p = f"a{r - 1}"
        parts.append(f"""
ld{r} AS MATERIALIZED (SELECT block, COUNT(*) AS ld FROM {p} GROUP BY block)""")
        parts.append(f"""
cnt{r} AS MATERIALIZED (
  SELECT s.dst AS node, a.block, COUNT(*) AS cnt
  FROM sym s JOIN {p} a ON s.src = a.node GROUP BY s.dst, a.block)""")
        parts.append(f"""
best{r} AS MATERIALIZED (
  SELECT node, block AS tgt, cnt AS bcnt FROM (
    SELECT c.node, c.block, c.cnt,
           ROW_NUMBER() OVER (PARTITION BY c.node
             ORDER BY c.cnt DESC, l.ld ASC, c.block ASC) AS rn
    FROM cnt{r} c JOIN ld{r} l ON c.block = l.block) WHERE rn = 1)""")
        parts.append(f"""
mv{r} AS MATERIALIZED (
  SELECT b.node, b.tgt, b.bcnt - COALESCE(cc.cnt, 0) AS gain
  FROM best{r} b JOIN {p} a ON b.node = a.node
  LEFT JOIN cnt{r} cc ON cc.node = b.node AND cc.block = a.block
  WHERE b.tgt <> a.block AND b.bcnt > COALESCE(cc.cnt, 0))""")
        parts.append(f"""
acc{r} AS MATERIALIZED (
  SELECT node, tgt FROM (
    SELECT m.node, m.tgt, m.gain,
           ROW_NUMBER() OVER (PARTITION BY m.tgt
             ORDER BY m.gain DESC, m.node ASC) AS rn,
           GREATEST(0, {cap} - l.ld) AS quota
    FROM mv{r} m JOIN ld{r} l ON m.tgt = l.block) WHERE rn <= quota)""")
        parts.append(f"""
a{r} AS MATERIALIZED (
  SELECT a.node, CAST(COALESCE(c.tgt, a.block) AS INT) AS block
  FROM {p} a LEFT JOIN acc{r} c ON a.node = c.node)""")
    return parts


def partition_sql(k: int = 4, rounds: int = 4, slack_pct: int = 5) -> str:
    parts = _partition_parts(k, rounds, slack_pct)
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, block FROM a{rounds}"
    )


def partition_quality_sql(k: int = 4, rounds: int = 4, slack_pct: int = 5) -> str:
    """Quality row (cut_arcs, m_arcs, max_load, n_blocks) of the
    rank-admission partition — twin of algos.partition.partition_quality."""
    parts = _partition_parts(k, rounds, slack_pct)
    parts.append(f"""
arcs AS MATERIALIZED (
  SELECT la.block AS bsrc, lb.block AS bdst
  FROM sym s JOIN a{rounds} la ON s.src = la.node
             JOIN a{rounds} lb ON s.dst = lb.node)""")
    parts.append("""
tot AS (SELECT COUNT(*) AS m_arcs,
               SUM(CASE WHEN bsrc <> bdst THEN 1 ELSE 0 END) AS cut_arcs
        FROM arcs)""")
    parts.append(f"""
lds AS (SELECT MAX(ld) AS max_load, COUNT(*) AS n_blocks FROM (
          SELECT block, COUNT(*) AS ld FROM a{rounds} GROUP BY block))""")
    return (
        "WITH " + ",".join(parts)
        + """
SELECT CAST(tot.cut_arcs AS BIGINT) AS cut_arcs,
       CAST(tot.m_arcs AS BIGINT) AS m_arcs,
       CAST(lds.max_load AS BIGINT) AS max_load,
       CAST(lds.n_blocks AS BIGINT) AS n_blocks
FROM tot, lds"""
    )


def _landmark_bfs_parts(n_landmarks: int, max_depth: int) -> list[str]:
    """Shared CTE chain: landmark pick + unrolled batched BFS producing
    ``dists(li, node, dist)`` (one row per landmark/node reached)."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src)""")
    parts.append(f"""
lm AS MATERIALIZED (SELECT node, li FROM (
  SELECT node, ROW_NUMBER() OVER (ORDER BY d DESC, node ASC) - 1 AS li
  FROM deg) WHERE li < {n_landmarks})""")
    parts.append("""
v0 AS MATERIALIZED (SELECT li, node, 0 AS dist FROM lm)""")
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT li, node FROM v{j}" for j in range(k)
        )
        parts.append(f"""
v{k} AS MATERIALIZED (SELECT DISTINCT f.li, s.dst AS node, {k} AS dist
         FROM sym s JOIN v{k - 1} f ON s.src = f.node
         WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p
                           WHERE p.li = f.li AND p.node = s.dst))""")
    all_v = " UNION ALL ".join(
        f"SELECT li, node, dist FROM v{j}" for j in range(max_depth + 1)
    )
    parts.append(f"""
dists AS MATERIALIZED ({all_v})""")
    return parts


def landmark_sketch_sql(n_landmarks: int = 3, max_depth: int = 4) -> str:
    """Twin of algos.landmarks.landmark_sketch: top-degree landmarks
    (deg DESC, node ASC), batched BFS on the sym loop-free graph,
    wide int distance columns (null = unreached within max_depth)."""
    parts = _landmark_bfs_parts(n_landmarks, max_depth)
    dcols = ",\n       ".join(
        f"CAST(MIN(CASE WHEN t.li = {i} THEN t.dist END) AS INT) AS d{i}"
        for i in range(n_landmarks)
    )
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT n.node, {dcols}
FROM nodes n LEFT JOIN dists t ON n.node = t.node
GROUP BY n.node"""
    )


def landmark_estimate_sql(
    n_landmarks: int = 3, max_depth: int = 4, n_cands: int = 20
) -> str:
    """Twin of algos.landmarks.estimate_distances over deterministic
    pairs: the ``n_cands`` smallest customer nodes, all u < v pairs,
    d_hat = min over landmarks of d(u,l)+d(l,v); null when no landmark
    reaches both ends within max_depth."""
    parts = _landmark_bfs_parts(n_landmarks, max_depth)
    parts.append(f"""
cands AS MATERIALIZED (SELECT node FROM nodes WHERE node < {OFF_ORDER}
  ORDER BY node ASC LIMIT {n_cands})""")
    parts.append("""
pairs AS (SELECT x.node AS u, y.node AS v FROM cands x JOIN cands y
          ON x.node < y.node)""")
    return (
        "WITH " + ",".join(parts)
        + """,
est AS (SELECT p.u, p.v, MIN(a.dist + b.dist) AS d_hat
        FROM pairs p
        JOIN dists a ON a.node = p.u
        JOIN dists b ON b.node = p.v AND b.li = a.li
        GROUP BY p.u, p.v)
SELECT p.u, p.v, CAST(e.d_hat AS INT) AS d_hat
FROM pairs p LEFT JOIN est e ON e.u = p.u AND e.v = p.v"""
    )


CYC_CTE = f"""
cyc AS MATERIALIZED (
  SELECT src, dst FROM edges
  UNION
  SELECT {OFF_SUPP} + s_suppkey AS src, c_custkey AS dst
  FROM supplier JOIN customer ON s_nationkey = c_nationkey
)"""

BOWTIE_PIVOT_SQL = """(
  SELECT MIN(c_custkey) FROM customer c
  WHERE EXISTS (SELECT 1 FROM supplier s
                WHERE s.s_nationkey = c.c_nationkey)
    AND EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey))"""


def cyclic_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of CYC_CTE: the TPC-H link graph made cyclic by
    nation-mediated supplier -> customer back-arcs (supplier links to
    every customer of its nation), closing the
    customer -> order -> part -> supplier loop."""
    t = load_tables(spark, sf_dir, ["supplier", "customer"])
    back = t["supplier"].join(
        t["customer"],
        t["supplier"]["s_nationkey"] == t["customer"]["c_nationkey"],
    ).select(
        (F.lit(OFF_SUPP) + F.col("s_suppkey")).alias("src"),
        F.col("c_custkey").cast("long").alias("dst"),
    )
    return (
        tpch_edges(spark, sf_dir)
        .unionByName(back)
        .distinct()
    )


def bowtie_pivot(spark: SparkSession, sf_dir: str) -> int:
    """Spark twin of BOWTIE_PIVOT_SQL: smallest customer that both has
    orders and whose nation has at least one supplier."""
    t = load_tables(spark, sf_dir, ["supplier", "customer", "orders"])
    cand = (
        t["customer"]
        .join(
            t["supplier"].select("s_nationkey").distinct(),
            F.col("c_nationkey") == F.col("s_nationkey"),
        )
        .join(
            t["orders"].select("o_custkey").distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .agg(F.min("c_custkey").alias("p"))
        .first()
    )
    return int(cand["p"])


def _reach_parts(
    name: str, graph: str, seeds: str, max_depth: int
) -> list[str]:
    """Unrolled set-reachability CTEs over ``graph(src, dst)`` from the
    ``seeds(node)`` CTE: emits ``{name}`` = all nodes reached."""
    parts = [f"""
{name}0 AS MATERIALIZED (SELECT DISTINCT node FROM {seeds})"""]
    for k in range(1, max_depth + 1):
        prev_all = " UNION ALL ".join(
            f"SELECT node FROM {name}{j}" for j in range(k)
        )
        parts.append(f"""
{name}{k} AS MATERIALIZED (SELECT DISTINCT g.dst AS node
  FROM {graph} g JOIN {name}{k - 1} f ON g.src = f.node
  WHERE NOT EXISTS (SELECT 1 FROM ({prev_all}) p WHERE p.node = g.dst))""")
    all_v = " UNION ALL ".join(
        f"SELECT node FROM {name}{j}" for j in range(max_depth + 1)
    )
    parts.append(f"""
{name} AS MATERIALIZED ({all_v})""")
    return parts


def bowtie_sql(max_depth: int = 12) -> str:
    """Twin of algos.bowtie.bowtie over the cyclic graph: pivot-relative
    core/in/out/tendrils+tubes/disconnected counts. Each reachability
    sweep is unrolled ``max_depth`` rounds — the Spark side raises if
    the true fixpoint needs more, so equal depth means equal sets."""
    parts = [EDGES_CTE, CYC_CTE]
    parts.append(f"""
cnodes AS MATERIALIZED (
  SELECT src AS node FROM cyc UNION SELECT dst AS node FROM cyc)""")
    parts.append(f"""
pv AS (SELECT {BOWTIE_PIVOT_SQL} AS node)""")
    parts.append("""
tcyc AS (SELECT dst AS src, src AS dst FROM cyc)""")
    parts.append("""
scyc AS MATERIALIZED (
  SELECT src, dst FROM cyc UNION SELECT dst AS src, src AS dst FROM cyc)""")
    parts += _reach_parts("fwd", "cyc", "pv", max_depth)
    parts += _reach_parts("bwd", "tcyc", "pv", max_depth)
    parts.append("""
core AS MATERIALIZED (SELECT f.node FROM fwd f JOIN bwd b ON f.node = b.node)""")
    parts += _reach_parts("wk", "scyc", "core", max_depth)
    parts.append("""
member AS (
  SELECT node, 'core' AS component FROM core
  UNION ALL
  SELECT node, 'in' FROM bwd
  WHERE node NOT IN (SELECT node FROM core)
  UNION ALL
  SELECT node, 'out' FROM fwd
  WHERE node NOT IN (SELECT node FROM core)
  UNION ALL
  SELECT node, 'tendrils_tubes' FROM wk
  WHERE node NOT IN (SELECT node FROM fwd)
    AND node NOT IN (SELECT node FROM bwd)
  UNION ALL
  SELECT node, 'disconnected' FROM cnodes
  WHERE node NOT IN (SELECT node FROM wk))""")
    parts.append("""
cats AS (SELECT UNNEST(['core', 'in', 'out', 'tendrils_tubes',
                        'disconnected']) AS component)""")
    return (
        "WITH " + ",".join(parts)
        + """
SELECT c.component, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_nodes
FROM cats c LEFT JOIN (
  SELECT component, COUNT(*) AS n FROM member GROUP BY component) m
ON c.component = m.component"""
    )


def attack_tolerance_sql(ks: list[int], rounds: int = 30) -> str:
    """Twin of algos.components.attack_tolerance: per k, delete the k
    top-sym-degree hubs (deg DESC, node ASC), unrolled hash-min CC over
    the surviving sym graph (``rounds`` >= its diameter — the Spark
    side raises if ITS fixpoint needs more than max_iter rounds, and
    hash-min converges in <= diameter rounds, so equal-depth unrolls
    agree), then (k, n_nodes, n_arcs, largest_cc, n_components).
    Nodes whose every neighbor was deleted leave the graph and are not
    counted."""
    parts = [EDGES_CTE, SYM_CTE]
    parts.append("""
adeg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS d
                      FROM sym GROUP BY src)""")
    selects = []
    for k in ks:
        p = f"k{k}"
        if k > 0:
            parts.append(f"""
rm_{p} AS MATERIALIZED (SELECT node FROM (
  SELECT node, ROW_NUMBER() OVER (ORDER BY d DESC, node ASC) AS rn
  FROM adeg) t WHERE rn <= {k})""")
            parts.append(f"""
sym_{p} AS MATERIALIZED (SELECT src, dst FROM sym
  WHERE src NOT IN (SELECT node FROM rm_{p})
    AND dst NOT IN (SELECT node FROM rm_{p}))""")
        else:
            parts.append(f"""
sym_{p} AS MATERIALIZED (SELECT src, dst FROM sym)""")
        parts.append(f"""
l_{p}_0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS component FROM sym_{p})""")
        for t in range(1, rounds + 1):
            prev = f"l_{p}_{t - 1}"
            parts.append(f"""
m_{p}_{t} AS MATERIALIZED (SELECT s.dst AS node, MIN(l.component) AS mn
  FROM sym_{p} s JOIN {prev} l ON s.src = l.node GROUP BY s.dst)""")
            parts.append(f"""
l_{p}_{t} AS MATERIALIZED (SELECT l.node,
  LEAST(l.component, COALESCE(m.mn, l.component)) AS component
  FROM {prev} l LEFT JOIN m_{p}_{t} m ON l.node = m.node)""")
        selects.append(f"""
SELECT CAST({k} AS INT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM l_{p}_{rounds}) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sym_{p}) AS n_arcs,
       (SELECT CAST(MAX(sz) AS BIGINT) FROM (
          SELECT COUNT(*) AS sz FROM l_{p}_{rounds} GROUP BY component) z)
         AS largest_cc,
       (SELECT CAST(COUNT(DISTINCT component) AS BIGINT)
        FROM l_{p}_{rounds}) AS n_components""")
    return "WITH " + ",".join(parts) + " UNION ALL ".join(selects)


def random_failure_sql(permilles: list[int], rounds: int = 30) -> str:
    """Twin of algos.components.random_failure_tolerance: per level,
    delete nodes whose portable md5 coin (md5_long('rf:' || node)
    % 1000) falls below the permille, unrolled hash-min CC over the
    surviving sym graph, then (permille, n_nodes, n_arcs, largest_cc,
    n_components)."""
    coin = "(('0x' || substr(md5('rf:' || CAST({c} AS VARCHAR)), 1, 15))::BIGINT % 1000)"
    parts = [EDGES_CTE, SYM_CTE]
    selects = []
    for pm in permilles:
        p = f"p{pm}"
        if pm > 0:
            parts.append(f"""
sym_{p} AS MATERIALIZED (SELECT src, dst FROM sym
  WHERE {coin.format(c='src')} >= {pm}
    AND {coin.format(c='dst')} >= {pm})""")
        else:
            parts.append(f"""
sym_{p} AS MATERIALIZED (SELECT src, dst FROM sym)""")
        parts.append(f"""
l_{p}_0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS component FROM sym_{p})""")
        for t in range(1, rounds + 1):
            prev = f"l_{p}_{t - 1}"
            parts.append(f"""
m_{p}_{t} AS MATERIALIZED (SELECT s.dst AS node, MIN(l.component) AS mn
  FROM sym_{p} s JOIN {prev} l ON s.src = l.node GROUP BY s.dst)""")
            parts.append(f"""
l_{p}_{t} AS MATERIALIZED (SELECT l.node,
  LEAST(l.component, COALESCE(m.mn, l.component)) AS component
  FROM {prev} l LEFT JOIN m_{p}_{t} m ON l.node = m.node)""")
        selects.append(f"""
SELECT CAST({pm} AS INT) AS permille,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM l_{p}_{rounds}) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sym_{p}) AS n_arcs,
       (SELECT CAST(MAX(sz) AS BIGINT) FROM (
          SELECT COUNT(*) AS sz FROM l_{p}_{rounds} GROUP BY component) z)
         AS largest_cc,
       (SELECT CAST(COUNT(DISTINCT component) AS BIGINT)
        FROM l_{p}_{rounds}) AS n_components""")
    return "WITH " + ",".join(parts) + " UNION ALL ".join(selects)


def fiedler_sql(iters: int = 12, round_to: int = 6) -> str:
    """Twin of algos.spectral.fiedler_bisection: deflated power
    iteration on B = cI - L over the simple graph, md5-parity start,
    center + L2-normalize per round, signed-zero-normalized rounding."""
    parts = [EDGES_CTE, SYM_CTE]
    parts.append("""
fdeg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS d
                      FROM sym GROUP BY src)""")
    parts.append("""
fc AS (SELECT MAX(d) + 1 AS c FROM fdeg)""")
    parts.append("""
fx_r AS (SELECT node, d,
  CASE WHEN (('0x' || substr(md5('fv:' || CAST(node AS VARCHAR)), 1, 15))
             ::BIGINT % 2) = 0 THEN 1.0 ELSE -1.0 END AS x
  FROM fdeg)""")

    def cn(src: str, out: str) -> list[str]:
        return [
            f"""
{out}_mu AS (SELECT AVG(x) AS mu FROM {src})""",
            f"""
{out}_c AS (SELECT node, d, x - (SELECT mu FROM {out}_mu) AS x FROM {src})""",
            f"""
{out}_nr AS (SELECT sqrt(SUM(x * x)) AS nr FROM {out}_c)""",
            f"""
{out} AS MATERIALIZED (SELECT node, d,
  COALESCE(x / NULLIF((SELECT nr FROM {out}_nr), 0.0), 0.0) AS x
  FROM {out}_c)""",
        ]
    parts += cn("fx_r", "fx0")
    for k in range(1, iters + 1):
        prev = f"fx{k - 1}"
        parts.append(f"""
fm{k} AS MATERIALIZED (SELECT s.dst AS node, SUM(p.x) AS nb
  FROM sym s JOIN {prev} p ON s.src = p.node GROUP BY s.dst)""")
        parts.append(f"""
fy{k} AS (SELECT p.node, p.d,
  ((SELECT c FROM fc) - p.d) * p.x + COALESCE(m.nb, 0.0) AS x
  FROM {prev} p LEFT JOIN fm{k} m ON p.node = m.node)""")
        parts += cn(f"fy{k}", f"fx{k}")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT node,
  CASE WHEN ROUND(x, {round_to}) = 0 THEN 0.0
       ELSE ROUND(x, {round_to}) END AS score
FROM fx{iters}"""
    )


def trustrank_sql(
    n_seeds: int = 20,
    inv_iters: int = 5,
    iters: int = 8,
    alpha: float = 0.85,
    round_to: int = 9,
) -> str:
    """Twin of algos.pagerank.trustrank: inverse PageRank on the
    transposed edge table (uniform init, uniform dangling), seed cut at
    ROUND(rank, 9) DESC / node ASC, then the personalized-PageRank
    trust recurrence with restart uniform on the seeds."""
    parts = [EDGES_CTE, NODES_CTE]
    parts.append("""
tedges AS MATERIALIZED (SELECT dst AS src, src AS dst FROM edges)""")
    parts.append("""
t_outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM tedges GROUP BY src)""")
    parts.append("""
t_dang AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM t_outdeg))""")
    parts.append("""
t_nn AS (SELECT COUNT(*) AS n FROM nodes)""")
    parts.append("""
t_r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM t_nn) AS rank FROM nodes)""")
    for k in range(1, inv_iters + 1):
        prev = f"t_r{k - 1}"
        parts.append(f"""
t_dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m
  FROM {prev} r JOIN t_dang d ON r.node = d.node)""")
        parts.append(f"""
t_c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / o.c) AS contrib
  FROM tedges e JOIN {prev} r ON e.src = r.node
  JOIN t_outdeg o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
t_r{k} AS MATERIALIZED (SELECT n.node,
  (1.0 - {alpha}) / (SELECT n FROM t_nn)
  + {alpha} * ((SELECT m FROM t_dm{k}) / (SELECT n FROM t_nn)
               + COALESCE(c.contrib, 0.0)) AS rank
  FROM nodes n LEFT JOIN t_c{k} c ON n.node = c.node)""")
    parts.append(f"""
tseeds AS MATERIALIZED (SELECT node FROM (
  SELECT node, ROW_NUMBER() OVER (
    ORDER BY ROUND(rank, 9) DESC, node ASC) AS rn
  FROM t_r{inv_iters}) t WHERE rn <= {n_seeds})""")
    parts.append("""
f_pvec AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL
              THEN 1.0 / (SELECT COUNT(*) FROM tseeds) ELSE 0.0 END AS p
  FROM nodes n LEFT JOIN tseeds s ON n.node = s.node)""")
    parts.append("""
f_outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM edges GROUP BY src)""")
    parts.append("""
f_dang AS MATERIALIZED (
  SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM f_outdeg))""")
    parts.append("""
f_r0 AS MATERIALIZED (SELECT node, p AS rank FROM f_pvec)""")
    for k in range(1, iters + 1):
        prev = f"f_r{k - 1}"
        parts.append(f"""
f_dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m
  FROM {prev} r JOIN f_dang d ON r.node = d.node)""")
        parts.append(f"""
f_c{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.rank / o.c) AS contrib
  FROM edges e JOIN {prev} r ON e.src = r.node
  JOIN f_outdeg o ON o.src = e.src GROUP BY e.dst)""")
        parts.append(f"""
f_r{k} AS MATERIALIZED (SELECT p.node,
  p.p * ((1.0 - {alpha}) + {alpha} * (SELECT m FROM f_dm{k}))
  + {alpha} * COALESCE(c.contrib, 0.0) AS rank
  FROM f_pvec p LEFT JOIN f_c{k} c ON p.node = c.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS trust FROM f_r{iters}"
    )


def louvain_sql(rounds: int = 2) -> str:
    """Twin of :func:`webgraph_spark.algos.louvain.louvain_moves`
    (one level, unweighted): unrolled synchronous integer-exact
    modularity move rounds — per round, community strengths from the
    previous labels, k_ic arc mass into neighbour communities, the
    stay option unioned in, HUGEINT score m*k_ic - s_i*tot'_c, argmax
    with min-label tie-break, alternating-parity move gate
    ((node + k) % 2 = 0 may move in round k — the oscillation breaker,
    see algos/louvain.py). No float arithmetic anywhere."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
lv_deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS s FROM sym GROUP BY src)""")
    parts.append("""
lv_m AS MATERIALIZED (SELECT COUNT(*) AS m FROM sym)""")
    parts.append("""
lv0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)""")
    for k in range(1, rounds + 1):
        prev = f"lv{k - 1}"
        parts.append(f"""
lv_tot{k} AS MATERIALIZED (
  SELECT l.label, SUM(COALESCE(d.s, 0)) AS tot
  FROM {prev} l LEFT JOIN lv_deg d ON l.node = d.node GROUP BY l.label)""")
        parts.append(f"""
lv_kic{k} AS MATERIALIZED (
  SELECT s.src AS node, l.label, COUNT(*) AS kic
  FROM sym s JOIN {prev} l ON s.dst = l.node GROUP BY s.src, l.label)""")
        parts.append(f"""
lv_cand{k} AS MATERIALIZED (
  SELECT node, label, MAX(kic) AS kic FROM (
    SELECT node, label, kic FROM lv_kic{k}
    UNION ALL SELECT node, label, 0 AS kic FROM {prev}) u
  WHERE (node + {k}) % 2 = 0
  GROUP BY node, label)""")
        parts.append(f"""
lv_sc{k} AS MATERIALIZED (
  SELECT c.node, c.label,
         CAST(m.m AS HUGEINT) * c.kic
         - CAST(COALESCE(d.s, 0) AS HUGEINT)
           * (COALESCE(t.tot, 0)
              - CASE WHEN c.label = l.label THEN COALESCE(d.s, 0)
                     ELSE 0 END) AS score
  FROM lv_cand{k} c
  JOIN {prev} l ON c.node = l.node
  LEFT JOIN lv_deg d ON c.node = d.node
  LEFT JOIN lv_tot{k} t ON c.label = t.label
  CROSS JOIN lv_m m)""")
        parts.append(f"""
lv_best{k} AS MATERIALIZED (SELECT node, label FROM (
  SELECT node, label,
         ROW_NUMBER() OVER (PARTITION BY node
                            ORDER BY score DESC, label ASC) AS rn
  FROM lv_sc{k}) t WHERE rn = 1)""")
        parts.append(f"""
lv{k} AS MATERIALIZED (
  SELECT l.node, COALESCE(b.label, l.label) AS label
  FROM {prev} l LEFT JOIN lv_best{k} b ON l.node = b.node)""")
    return "WITH " + ",".join(parts) + f"\nSELECT node, label FROM lv{rounds}"


def hitting_time_sql(iters: int = 6) -> str:
    """Twin of :func:`webgraph_spark.algos.paths.hitting_time` with the
    supplier layer (node >= OFF_SUPP) as the absorbing target set:
    unrolled truncated value iteration in INTEGER units of 1e-9 steps —
    exact int sums, half-up integer division, one float division at
    the very end (see the Spark docstring for why no float may appear
    inside the loop)."""
    parts = [EDGES_CTE, NODES_CTE, SYM_CTE]
    parts.append("""
ht_deg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY src)""")
    parts.append(f"""
ht_base AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN n.node >= {OFF_SUPP} THEN 1 ELSE 0 END AS is_target,
         COALESCE(d.deg, 0) AS deg
  FROM nodes n LEFT JOIN ht_deg d ON n.node = d.node)""")
    parts.append("""
ht0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS hs FROM ht_base)""")
    for k in range(1, iters + 1):
        prev = f"ht{k - 1}"
        parts.append(f"""
ht_c{k} AS MATERIALIZED (
  SELECT s.dst AS node, SUM(h.hs) AS nsum
  FROM sym s JOIN {prev} h ON s.src = h.node GROUP BY s.dst)""")
        parts.append(f"""
ht{k} AS MATERIALIZED (
  SELECT b.node,
         CAST(CASE WHEN b.is_target = 1 THEN 0
              WHEN b.deg = 0 THEN {k} * 1000000000
              ELSE 1000000000
                   + (2 * COALESCE(c.nsum, 0) + b.deg) // (2 * b.deg)
         END AS BIGINT) AS hs
  FROM ht_base b LEFT JOIN ht_c{k} c ON b.node = c.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, CAST(hs AS DOUBLE) / 1000000000.0 AS hit FROM ht{iters}"
    )


def conductance_sql(rounds: int = 3, k: int = 5, round_to: int = 9) -> str:
    """Twin of :func:`webgraph_spark.algos.labelprop.
    community_conductance` over the ``rounds``-round LP partition:
    integer cut/vol per community, one rounded division, top-k by
    (size desc, label asc)."""
    lp = lp_sql(rounds)
    lp_body = lp[len("WITH "):lp.rindex("\nSELECT")]
    return (
        "WITH " + lp_body + f""",
cd_lab AS MATERIALIZED (SELECT node, label FROM l{rounds}),
cd_arcs AS MATERIALIZED (
  SELECT la.label AS lsrc, lb.label AS ldst
  FROM sym s JOIN cd_lab la ON s.src = la.node
             JOIN cd_lab lb ON s.dst = lb.node),
cd_m AS (SELECT COUNT(*) AS m FROM sym),
cd_per AS (
  SELECT lsrc AS label, COUNT(*) AS vol,
         SUM(CASE WHEN lsrc <> ldst THEN 1 ELSE 0 END) AS cut
  FROM cd_arcs GROUP BY lsrc),
cd_top AS (
  SELECT label, COUNT(*) AS n_nodes FROM cd_lab GROUP BY label
  ORDER BY n_nodes DESC, label ASC LIMIT {k}),
cd_j AS (
  SELECT t.label, t.n_nodes,
         CAST(COALESCE(p.vol, 0) AS BIGINT) AS vol,
         CAST(COALESCE(p.cut, 0) AS BIGINT) AS cut,
         CAST(LEAST(COALESCE(p.vol, 0),
               (SELECT m FROM cd_m) - COALESCE(p.vol, 0)) AS BIGINT) AS minvol
  FROM cd_top t LEFT JOIN cd_per p ON t.label = p.label)
SELECT label, n_nodes, vol, cut,
       CASE WHEN minvol = 0 THEN 0.0
            ELSE CAST((2 * cut * {10 ** round_to} + minvol)
                      // (2 * minvol) AS DOUBLE) / {10 ** round_to}.0
       END AS phi
FROM cd_j
ORDER BY n_nodes DESC, label ASC"""
    )
