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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def _kmeans_cte_parts(
    k: int = 4,
    iters: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
) -> list[str]:
    """Shared CTE chain of the unrolled k-means recurrence (used by
    :func:`kmeans_assign_sql` and :func:`kmeans_silhouette_sql`):
    pts, cent0..cent{iters}, dist0..dist{iters}, a0..a{iters}."""
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
    return parts


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
    parts = _kmeans_cte_parts(k, iters, table, id_col, vec_col, dim, round_to)
    final = f"""
SELECT a.id AS id, CAST(a.cluster AS BIGINT) AS cluster,
       ROUND(d.d, 6) AS dist
FROM a{iters} a JOIN dist{iters} d
  ON a.id = d.id AND a.cluster = d.cluster"""
    return "WITH " + ",".join(parts) + final


def semdedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    eps: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, public
    method): k-means blocks the corpus into clusters, then WITHIN each
    cluster a vector is pruned when a kept neighbour is closer than
    ``eps`` cosine. Keep rule: a vector survives iff no SMALLER-id
    vector in its cluster has cosine >= eps — the deterministic,
    order-free form of the paper's keep-one-per-duplicate-group rule
    (pairwise, not transitive: exactly the published formulation).

    Returns every input row: (vec_id, cluster, kept) with kept as
    int (1 survives, 0 pruned).

    Scale posture: the k-means assignment is broadcast-model (zero
    shuffle per scan); the dedup join is cluster-blocked — cost is
    sum_c |c|^2, never all-pairs. At 100 TB you scale k with corpus
    size (the paper's regime: |c| ~ 10^4 per cluster), which keeps the
    per-cluster quadratic bounded and fully parallel across clusters.
    """
    from .similarity import cosine

    assign, _ = kmeans(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim,
        round_to=round_to,
    )
    base = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .join(assign.select("id", "cluster"), "id")
    )
    a = base.select(
        F.col("id").alias("id_a"), "cluster", F.col("v").alias("va")
    )
    b = base.select(
        F.col("id").alias("id_b"), "cluster", F.col("v").alias("vb")
    )
    pruned = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .where(F.col("sim") >= eps)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("_pruned", F.lit(1))
    )
    return base.join(pruned, "id", "left").select(
        F.col("id").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
        F.when(F.col("_pruned").isNull(), 1).otherwise(0)
         .cast("int").alias("kept"),
    )


def semdedup_sql(
    k: int = 4,
    iters: int = 3,
    eps: float = 0.2,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`semdedup`: the kmeans assignment recurrence
    (:func:`kmeans_assign_sql`) blocked self-join with the same
    left-to-right list_reduce cosine fold Spark's F.aggregate uses."""
    dot = (
        f"list_reduce(list_transform(range(1, len(va.v) + 1), "
        f"i -> va.v[i] * vb.v[i]), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_transform(range(1, len(va.v) + 1), "
        f"i -> va.v[i] * va.v[i]), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform(range(1, len(vb.v) + 1), "
        f"i -> vb.v[i] * vb.v[i]), (x, y) -> x + y))"
    )
    asg = kmeans_assign_sql(
        k=k, iters=iters, table=table, id_col=id_col, vec_col=vec_col,
        dim=dim, round_to=round_to,
    )
    return f"""WITH asg AS MATERIALIZED (
  SELECT id, cluster FROM ({asg}) t_asg
),
vecs AS MATERIALIZED (
  SELECT {id_col} AS id,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
pruned AS (
  SELECT DISTINCT b.id AS id
  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.id < b.id
  JOIN vecs va ON va.id = a.id
  JOIN vecs vb ON vb.id = b.id
  WHERE ROUND(({dot}) / (({na}) * ({nb})), 6) >= {eps}
)
SELECT a.id AS vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN p.id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM asg a LEFT JOIN pruned p ON p.id = a.id"""


# ---------------------------------------------------- centroid classifier

def centroid_classify(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 9,
) -> DataFrame:
    """Nearest-class-centroid assignment + confusion counts — the
    Rocchio / prototype classifier used as an embedding-space quality
    probe: if class centroids separate the corpus, the space carries
    the label signal (diagonal-heavy confusion matrix); a flat matrix
    means the labels are not linearly recoverable.

    Plan: one posexplode to long form (id, label, pos, x), one
    groupBy(label, pos) for rounded per-dimension centroid means, one
    broadcast join back on pos (centroids are |labels| x d rows — tiny)
    and one groupBy(id, label) for the rounded dot products; argmax by
    (sim desc, label asc). Per-group sums are rounded to ``round_to``
    before every downstream use so the DuckDB twin reproduces each
    float bit-for-bit (same discipline as :func:`kmeans`).

    Scale posture: the wide work is n*d exploded rows joined against a
    broadcastable centroid relation and re-aggregated with map-side
    partial sums — no pair join, no all-labels state on any row.

    Returns (label, assigned, n_vectors) confusion rows.
    """
    pts = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    )
    cent = pts.groupBy("lbl", "pos").agg(
        F.round(F.avg("x"), round_to).alias("m")
    )
    cnorm = cent.groupBy("lbl").agg(
        F.round(F.sum(F.col("m") * F.col("m")), round_to).alias("cn2")
    )
    vnorm = pts.groupBy("id").agg(
        F.round(F.sum(F.col("x") * F.col("x")), round_to).alias("vn2")
    )
    dots = (
        pts.join(
            F.broadcast(cent.select(F.col("lbl").alias("clbl"), "pos", "m")),
            "pos",
        )
        .groupBy("id", "lbl", "clbl")
        .agg(F.round(F.sum(F.col("x") * F.col("m")), round_to).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(cnorm.select(F.col("lbl").alias("clbl"), "cn2")), "clbl")
        .join(vnorm, "id")
        .select(
            "id",
            "lbl",
            "clbl",
            F.round(
                F.col("dot") / (F.sqrt("vn2") * F.sqrt("cn2")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("clbl").asc())
    assigned = scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    return assigned.groupBy(
        F.col("lbl").cast("long").alias("label"),
        F.col("clbl").cast("long").alias("assigned"),
    ).agg(F.count("*").alias("n_vectors"))


def centroid_classify_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`centroid_classify`: identical long-form
    relation, rounded centroid means, rounded dot/norm sums, and the
    (sim desc, label asc) argmax."""
    return f"""WITH pts AS MATERIALIZED (
  SELECT {id_col} AS id, {label_col} AS lbl, d.i AS pos,
         CAST({vec_col}[d.i + 1] AS DOUBLE) AS x
  FROM {table} CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) d
),
cent AS MATERIALIZED (
  SELECT lbl, pos, ROUND(AVG(x), {round_to}) AS m
  FROM pts GROUP BY lbl, pos
),
cnorm AS (SELECT lbl, ROUND(SUM(m * m), {round_to}) AS cn2 FROM cent GROUP BY lbl),
vnorm AS (SELECT id, ROUND(SUM(x * x), {round_to}) AS vn2 FROM pts GROUP BY id),
dots AS (
  SELECT p.id, p.lbl, c.lbl AS clbl,
         ROUND(SUM(p.x * c.m), {round_to}) AS dot
  FROM pts p JOIN cent c ON p.pos = c.pos
  GROUP BY p.id, p.lbl, c.lbl
),
scored AS (
  SELECT d.id, d.lbl, d.clbl,
         ROUND(d.dot / (sqrt(v.vn2) * sqrt(c.cn2)), 6) AS sim
  FROM dots d JOIN cnorm c ON d.clbl = c.lbl JOIN vnorm v ON d.id = v.id
),
assigned AS (
  SELECT id, lbl, clbl FROM (
    SELECT id, lbl, clbl,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, clbl ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT CAST(lbl AS BIGINT) AS label, CAST(clbl AS BIGINT) AS assigned,
       COUNT(*) AS n_vectors
FROM assigned GROUP BY lbl, clbl"""


# ----------------------------------------------------------- silhouette

def kmeans_silhouette(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
) -> DataFrame:
    """Simplified (centroid-based) silhouette of the :func:`kmeans`
    result — the standard clustering-quality score made scale-safe:
    instead of the O(n^2) pairwise silhouette, a(i) / b(i) are the
    Euclidean distances to the OWN and the NEAREST-OTHER final
    centroid (Hruschka et al.'s "simplified silhouette", the form
    every large-scale ML library ships). s(i) = (b - a) / max(a, b);
    the report is the per-cluster mean.

    Determinism: squared distances reuse the kmeans rounding contract
    (round_to decimals), sqrt is IEEE-exact, per-point s is quantized
    to 12 decimals and the cluster mean is a DECIMAL(38,12) sum with
    one final double division — the oracle twin walks the identical
    floats.

    Scale: centroids are k x dim driver literals baked into one
    projection over n rows + one groupBy(cluster) — no joins at all.

    Returns (cluster, n_points, mean_silhouette).
    """
    assert k >= 2, "silhouette needs at least two clusters"
    assigned, cents = kmeans(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        dim=dim, round_to=round_to,
    )
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v"))
    structs = [
        F.struct(
            F.round(_sqdist_expr(F.col("v"), c), round_to).alias("d"),
            F.lit(j).alias("j"),
        )
        for j, c in enumerate(cents)
    ]
    arr = F.array(*structs)
    best = F.array_min(arr)
    da = F.sqrt(best["d"])
    db = F.sqrt(
        F.array_min(
            F.filter(arr, lambda s: s["j"] != best["j"])
        )["d"]
    )
    s = F.when(
        F.greatest(da, db) > 0, (db - da) / F.greatest(da, db)
    ).otherwise(F.lit(0.0))
    pts = base.select(
        best["j"].alias("cluster"),
        F.round(s, 12).cast("decimal(38,12)").alias("s"),
    )
    return pts.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(
            F.sum("s").cast("double") / F.count("*"), 6
        ).alias("mean_silhouette"),
    ).select(
        F.col("cluster").cast("long").alias("cluster"),
        "n_points",
        "mean_silhouette",
    )


def kmeans_silhouette_sql(
    k: int = 4,
    iters: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`kmeans_silhouette`: the shared k-means
    CTE chain, then a(i) from the assigned dist row, b(i) as the min
    over the other clusters' dist rows, identical quantize + DECIMAL
    mean."""
    parts = _kmeans_cte_parts(k, iters, table, id_col, vec_col, dim, round_to)
    final = f"""
, sil AS (
  SELECT a.id, a.cluster,
         sqrt(own.d) AS da,
         sqrt((SELECT MIN(o.d) FROM dist{iters} o
               WHERE o.id = a.id AND o.cluster <> a.cluster)) AS db
  FROM a{iters} a JOIN dist{iters} own
    ON own.id = a.id AND own.cluster = a.cluster),
sq AS (
  SELECT cluster,
         CAST(ROUND(CASE WHEN GREATEST(da, db) > 0
                    THEN (db - da) / GREATEST(da, db)
                    ELSE 0.0 END, 12) AS DECIMAL(38,12)) AS s
  FROM sil)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
FROM sq GROUP BY cluster"""
    return "WITH " + ",".join(parts) + final
