"""Deterministic Lloyd's k-means over an embedding column.

Beyond-reference addition (SURVEY.md §2.12): centroid-based clustering
of document/embedding spaces is the standard pre-step for IVF indexes
(functions/similarity.py ivf_* uses hash-bucketed coarse cells), corpus
diversification, and semantic dedup. This implementation is the classic
scalable dataflow form:

- centroids are the ONLY driver-side state (k x dim floats per
  iteration — the textbook "small model, big data" split);
- the assignment step evaluates all k squared distances as JVM
  expression trees over the array column (``zip_with`` + sequential
  ``aggregate`` fold — no Python, no explode: rows stay n, not n x dim)
  with centroid literals baked in, then takes the lexicographic min of
  (rounded distance, cluster id) structs — a deterministic argmin with
  ties to the smallest cluster index;
- the update step is one groupBy(cluster) with ``avg(vec[d])`` per
  dimension — map-side combinable, one uniform shuffle per iteration.

Determinism contract (the oracle requirement): centroids are ROUNDed to
``round_to`` decimals after init and after every update, and distances
are rounded before the argmin, so the Spark plan and the unrolled
DuckDB twin (:func:`kmeans_assign_sql`) walk through bit-identical
centroid states regardless of each engine's aggregation order.

Init: the k smallest ids' vectors (deterministic; callers wanting
k-means++ can seed via the portable hash family and pass explicit
``init_ids``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sqdist_expr(vec: Column, centroid: list[float]) -> Column:
    """Sequential-fold squared distance to a literal centroid (JVM)."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    diffs = F.zip_with(vec, lit, lambda x, c: (x - c) * (x - c))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def kmeans(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
    init_ids: list | None = None,
):
    """Run ``iters`` Lloyd iterations; returns (assignments DataFrame
    (id, cluster, dist), centroids list-of-lists). ``dist`` is the
    rounded squared distance to the assigned (final) centroid."""
    spark = emb.sparkSession
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v")).persist()

    if init_ids is None:
        init_ids = [r["id"] for r in base.select("id").orderBy("id").limit(k).collect()]
    cent_rows = (
        base.where(F.col("id").isin([int(i) for i in init_ids]))
        .orderBy("id")
        .collect()
    )
    cents = [[round(float(x), round_to) for x in r["v"]] for r in cent_rows]

    def assign_frame():
        structs = [
            F.struct(
                F.round(_sqdist_expr(F.col("v"), c), round_to).alias("d"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(cents)
        ]
        best = F.array_min(F.array(*structs))
        return base.select(
            "id", best["j"].alias("cluster"), best["d"].alias("dist")
        )

    for _ in range(iters):
        a = assign_frame()
        rows = (
            base.join(a.select("id", "cluster"), "id")
            .groupBy("cluster")
            .agg(*[F.round(F.avg(F.col("v")[d]), round_to).alias(f"c{d}")
                   for d in range(dim)])
            .collect()
        )
        new_cents = list(cents)
        for r in rows:
            new_cents[r["cluster"]] = [float(r[f"c{d}"]) for d in range(dim)]
        cents = new_cents

    final = assign_frame().select(
        "id",
        F.col("cluster").cast("long").alias("cluster"),
        F.round("dist", 6).alias("dist"),
    )
    base.unpersist()
    return final, cents


def kmeans_assign_sql(
    k: int = 4,
    iters: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`kmeans`: the same recurrence unrolled as
    CTEs over the long-form (id, dim, x) relation — init from the k
    smallest ids, per-iteration rounded centroids, rounded-distance
    argmin with min-cluster tiebreak. Returns (id, cluster, dist)."""
    parts = [f"""
pts AS MATERIALIZED (
  SELECT {id_col} AS id, d.i AS d, CAST({vec_col}[d.i + 1] AS DOUBLE) AS x
  FROM {table} CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) d
)"""]
    parts.append(f"""
cent0 AS MATERIALIZED (
  SELECT c.cluster, p.d, ROUND(p.x, {round_to}) AS c
  FROM (
    SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS cluster
    FROM (SELECT DISTINCT id FROM pts ORDER BY id LIMIT {k})
  ) c JOIN pts p ON p.id = c.id
)""")
    for t in range(iters + 1):
        parts.append(f"""
dist{t} AS MATERIALIZED (
  SELECT p.id, c.cluster,
         ROUND(SUM((p.x - c.c) * (p.x - c.c)), {round_to}) AS d
  FROM pts p JOIN cent{t} c ON p.d = c.d
  GROUP BY p.id, c.cluster
)""")
        parts.append(f"""
a{t} AS MATERIALIZED (
  SELECT id, MIN(cluster) AS cluster FROM (
    SELECT id, cluster, d, MIN(d) OVER (PARTITION BY id) AS md FROM dist{t}
  ) WHERE d = md GROUP BY id
)""")
        if t < iters:
            parts.append(f"""
cent{t + 1} AS MATERIALIZED (
  SELECT u.cluster, u.d, COALESCE(u.c, prev.c) AS c FROM (
    SELECT c0.cluster, c0.d, upd.c
    FROM (SELECT DISTINCT cluster, d FROM cent{t}) c0
    LEFT JOIN (
      SELECT a.cluster, p.d, ROUND(AVG(p.x), {round_to}) AS c
      FROM pts p JOIN a{t} a ON p.id = a.id
      GROUP BY a.cluster, p.d
    ) upd ON c0.cluster = upd.cluster AND c0.d = upd.d
  ) u JOIN cent{t} prev ON u.cluster = prev.cluster AND u.d = prev.d
)""")
    final = f"""
SELECT a.id AS id, CAST(a.cluster AS BIGINT) AS cluster,
       ROUND(d.d, 6) AS dist
FROM a{iters} a JOIN dist{iters} d
  ON a.id = d.id AND a.cluster = d.cluster"""
    return "WITH " + ",".join(parts) + final
