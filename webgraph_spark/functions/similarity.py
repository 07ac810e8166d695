"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. The dot product is
  a JVM-side fold (F.aggregate over zip_with in float64) — no Python in
  the loop; top-k per query via a window over the similarity-scored
  join.
- LSH-bucketed variant (random-hyperplane signs): the scale path. Sign
  bits come from deterministic hyperplanes derived from the
  engine-portable hash family, so buckets are reproducible; candidate
  generation joins on bucket key instead of crossing all pairs.

At 100 TB the brute-force path is the per-bucket scorer, not the global
plan: the LSH bucket join bounds the candidate set, brute force ranks
inside it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """float64 dot product of two array<float/double> columns (JVM fold,
    deterministic left-to-right accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Output: (query_id, neighbor_id, rank, sim) with sim rounded to 6
    decimals (portability), self-matches excluded, ties broken by
    neighbor id. ``queries`` has the same (id_col, vec_col) schema;
    it is broadcast — the corpus side stays partitioned.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def ann_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Recall@k of the LSH path against the exact scorer — the
    approximation-QUALITY gate, not just determinism (the reference's
    statistical-acceptance posture for sketches, HyperBallTest.java:78-80:
    a sketch is accepted by measuring its error against ground truth,
    not by re-running it).

    One row: (exact_pairs, hits, recall_at_k). At scale the exact side
    is the expensive half — run this on a sampled query set, exactly as
    here (the corpus side stays partitioned in both plans).
    """
    approx = cosine_topk_lsh(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col, **lsh_kwargs
    )
    return _recall_frame(
        embeddings, queries, approx, k=k, id_col=id_col, vec_col=vec_col
    )


def ivf_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **ivf_kwargs,
) -> DataFrame:
    """Recall@k of the IVF-Flat path vs the exact scorer — same
    acceptance posture as :func:`ann_recall`, for the coarse-quantizer
    candidate generation (nprobe cells instead of LSH buckets)."""
    approx = ivf_topk(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col, **ivf_kwargs
    )
    return _recall_frame(
        embeddings, queries, approx, k=k, id_col=id_col, vec_col=vec_col
    )


def _recall_frame(
    embeddings: DataFrame,
    queries: DataFrame,
    approx: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(exact_pairs, hits, recall_at_k) of ``approx`` (query_id,
    neighbor_id, ...) against the exact cosine top-k."""
    exact = cosine_topk(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    hits = approx.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        exact.join(hits, ["query_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("exact_pairs"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("hits"),
        )
        .select(
            "exact_pairs",
            "hits",
            F.round(F.col("hits") / F.col("exact_pairs"), 6).alias("recall_at_k"),
        )
    )


# --------------------------------------------------- LSH (hyperplane signs)

def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Rademacher (+-1) hyperplanes derived from the engine-portable md5
    hash of "hp:<seed>:<plane>:<coord>" — sign-LSH with +-1 entries is a
    standard random-projection family, and deriving the entries from md5
    (instead of a numpy RNG) makes every bucket id bit-replicable in an
    ANSI-SQL oracle (the signs are baked into the plan as literals on
    both sides)."""
    import hashlib

    planes = np.empty((n_planes, dim), dtype=np.float64)
    for j in range(n_planes):
        for i in range(dim):
            h = int(
                hashlib.md5(f"hp:{seed}:{j}:{i}".encode()).hexdigest()[:15], 16
            )
            planes[j, i] = 1.0 if h % 2 == 0 else -1.0
    return planes


def hyperplane_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign bits against ``planes`` (deterministic)."""
    key = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec, arr)
        key = key + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return key


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 777,
    dim: int | None = None,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in >= 1 of
    ``n_tables`` hyperplane tables; exact cosine ranks candidates.

    The scale path: corpus bucket keys are computed once per table
    (JVM fold), the join key is (table, bucket) — no crossJoin. Pass
    ``dim`` explicitly at scale (sniffing it costs a driver action).

    ``multiprobe=1`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (standard multi-probe LSH):
    the QUERY side explodes to 1 + n_planes keys — the broadcast side,
    so the corpus scan/join shape is unchanged while recall rises as
    if ~n_planes extra tables were built, at zero extra corpus passes.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        cb = embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
        ).withColumn("table", F.lit(t))
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
        ).withColumn("table", F.lit(t))
        if multiprobe:
            probes = F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(n_planes)
                ],
            )
            qb = qb.select(
                "query_id",
                "qv",
                F.explode(probes).alias("bucket"),
                "table",
            )
        joined = cb.join(F.broadcast(qb), ["table", "bucket"]).where(
            F.col("neighbor_id") != F.col("query_id")
        )
        cands = joined if cands is None else cands.unionByName(joined)
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "sim")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 777,
    dim: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-pillar analog
    of MinHash+LSH for dense vectors: candidates share a hyperplane-LSH
    bucket in >= 1 of ``n_tables`` tables (a (table, bucket) SELF-join,
    never all-pairs), then the exact float64 cosine verifies each
    candidate against ``threshold``.

    Output: (id_a, id_b, sim) with id_a < id_b, sim rounded to 6
    decimals, filtered to sim >= threshold. Recall is governed by
    (n_planes, n_tables) exactly as in sign-LSH theory; precision is 1.0
    (every emitted pair is exactly verified). ``max_bucket`` caps hub
    buckets like dedup.minhash_lsh_candidates: a bucket with more than
    ``max_bucket`` members is dropped (with the count visible to the
    caller via the cap being deterministic), bounding the worst-case
    join blowup at 100 TB.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        cb = base.select(
            "id", hyperplane_bucket(F.col("v"), planes).alias("bucket")
        )
        if max_bucket is not None:
            sizes = cb.groupBy("bucket").agg(F.count("*").alias("_n"))
            cb = cb.join(
                F.broadcast(sizes.where(F.col("_n") <= max_bucket)), "bucket"
            ).drop("_n")
        pairs = (
            cb.alias("a")
            .join(cb.alias("b"), "bucket")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["id_a", "id_b"])
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


# --------------------------------------------------------------- IVF-Flat

def _ivf_seed_ids(embeddings: DataFrame, k: int, id_col: str) -> list[int]:
    """Deterministic centroid seeds: the k corpus ids with smallest
    md5(id) — engine-portable (same rule is one ORDER BY in the SQL
    twin), parallelism-independent, and spread uniformly over the corpus
    regardless of id clustering."""
    rows = (
        embeddings.select(F.col(id_col).alias("id"))
        .orderBy(F.md5(F.col(id_col).cast("string")), "id")
        .limit(k)
        .collect()
    )
    return [int(r["id"]) for r in rows]


def _assign_cluster(df: DataFrame, vec_col: str, centroids) -> Column:
    """argmin_c squared-L2(vec, centroid_c) as one JVM expression tree
    (centroids are plan literals — k is small by construction). Ties on
    equal distance go to the lower cluster id on both engines."""
    best_d, best_c = None, None
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col), arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d, best_c = d, F.lit(0)
        else:
            # strict < keeps the LOWEST cluster index on exact ties
            best_c = F.when(d < best_d, F.lit(c)).otherwise(best_c)
            best_d = F.least(best_d, d)
    return best_c


def ivf_train(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd k-means coarse quantizer (IVF training).

    Init: the md5-smallest k corpus vectors. Each iteration assigns
    every vector to its nearest centroid (JVM expression, no UDF) and
    recomputes centroids as per-coordinate means via posexplode ->
    groupBy(cluster, pos) — one shuffle of |corpus| * dim skinny rows;
    the k x dim centroid table collects to the driver (tiny) and is
    baked into the next iteration's plan as literals. Empty clusters
    keep their previous centroid (the fixed-point the SQL twin
    replicates). A FIXED iteration count (no convergence test) keeps the
    result bit-replicable in unrolled SQL."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    seeds = _ivf_seed_ids(embeddings, k, id_col)
    seed_rows = {
        int(r["id"]): list(r["v"])
        for r in embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        .where(F.col(id_col).isin(seeds))
        .collect()
    }
    centroids = [[float(x) for x in seed_rows[s]] for s in seeds]
    for _ in range(iters):
        assigned = embeddings.select(
            F.col(vec_col).alias("v"),
            _assign_cluster(embeddings, vec_col, centroids).alias("c"),
        )
        # ROUND(mean, 6): float sums commute only approximately, so the
        # raw avg depends on partitioning/engine at the ~1e-13 level;
        # rounding snaps both engines (and any parallelism) to identical
        # centroid literals, which makes every subsequent distance fold
        # bit-identical. 1e-6 grid vs 1e-13 jitter => boundary flips are
        # measure-zero.
        means = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("mu"))
            .collect()
        )
        new_c = [list(cent) for cent in centroids]  # empty clusters persist
        acc: dict[int, dict[int, float]] = {}
        for r in means:
            acc.setdefault(int(r["c"]), {})[int(r["pos"])] = float(r["mu"])
        for c, byp in acc.items():
            new_c[c] = [byp[p] for p in range(dim)]
        centroids = new_c
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids=None,
) -> DataFrame:
    """IVF-Flat approximate top-k cosine: corpus is inverted-listed by
    nearest k-means centroid; each query probes its ``nprobe`` nearest
    cells and brute-force ranks only those cells' members.

    The 100 TB shape: the corpus is scanned once to label cells (JVM
    expression), the cell column becomes the join/partition key, and a
    query touches ~nprobe/n_clusters of the data. Pass ``centroids``
    (from :func:`ivf_train`, persisted) to skip training at query time —
    the IVF index build/search split of the reference ANN systems."""
    if centroids is None:
        centroids = ivf_train(
            embeddings, k=n_clusters, iters=iters, id_col=id_col,
            vec_col=vec_col, dim=dim,
        )
    n_clusters = len(centroids)
    nprobe = min(nprobe, n_clusters)
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _assign_cluster(embeddings, vec_col, centroids).alias("cell"),
    )
    # query -> its nprobe nearest cells: rank the k cell distances with
    # the same literal expression, explode the nprobe smallest
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    dists = []
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(
                F.col("qv"), arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        dists.append(F.struct(d.alias("d"), F.lit(c).alias("cell")))
    probed = q.select(
        "query_id", "qv",
        F.explode(
            F.slice(F.array_sort(F.array(*dists)), 1, nprobe)
        ).alias("p"),
    ).select("query_id", "qv", F.col("p.cell").alias("cell"))
    scored = (
        corpus.join(F.broadcast(probed), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("rank"), "sim",
        )
    )


def embedding_dedup_clusters(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 777,
    dim: int | None = None,
    max_bucket: int | None = None,
    max_iter: int = 30,
) -> DataFrame:
    """Dense-vector near-duplicate CLUSTERING: hyperplane-LSH pairs
    (:func:`embedding_near_dups`) -> large-star/small-star connected
    components (O(log n) rounds) -> one canonical vector per cluster.
    Returns EVERY input vector: (vec_id, canonical_id, cluster_size),
    canonical_id = minimum id of the transitive near-dup cluster,
    singletons map to themselves — the embedding twin of the text
    pipeline's near_dup_clusters."""
    from ..algos.components import connected_components_stars

    pairs = embedding_near_dups(
        embeddings, threshold, id_col, vec_col, n_planes, n_tables, seed,
        dim, max_bucket,
    )
    dup_edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = connected_components_stars(dup_edges, max_iter=max_iter).labels
    vecs = embeddings.select(F.col(id_col).alias("vec_id"))
    labelled = vecs.join(
        labels.withColumnRenamed("node", "vec_id"), "vec_id", "left"
    ).select(
        "vec_id",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("canonical_id"),
    )
    sizes = labelled.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return labelled.join(sizes, "canonical_id").select(
        "vec_id", "canonical_id", "cluster_size"
    )


# ------------------------------------------- 8-bit scalar quantization (SQ8)

def sq8_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, scale) corpus statistics for 8-bit scalar
    quantization: scale_d = (max_d - min_d) / 255. One map-side
    combinable aggregate; 2*dim doubles reach the driver (the "small
    model, big data" split — at 100 TB the stats pass is one scan).
    min/max are order-independent, so the stats are bit-identical at
    any parallelism and in any engine."""
    row = embeddings.agg(
        *[
            F.min(F.col(vec_col)[d].cast("double")).alias(f"mn{d}")
            for d in range(dim)
        ],
        *[
            F.max(F.col(vec_col)[d].cast("double")).alias(f"mx{d}")
            for d in range(dim)
        ],
    ).first()
    mins = [float(row[f"mn{d}"]) for d in range(dim)]
    scales = [(float(row[f"mx{d}"]) - mins[d]) / 255.0 for d in range(dim)]
    return mins, scales


def sq8_codes(
    vec: Column, mins: list[float], scales: list[float]
) -> Column:
    """Quantization codes array<int> in [0, 255]:
    code_d = floor((x_d - min_d) / scale_d + 0.5), clamped — the
    round-half-up form spelled with floor so every engine computes the
    identical integer (ROUND() half-even vs half-away divergence never
    enters). All JVM expression tree (two zip_with passes), no Python."""
    mn = F.array(*[F.lit(float(m)) for m in mins])
    sc = F.array(*[F.lit(float(s)) for s in scales])
    shifted = F.zip_with(vec, mn, lambda x, m: x.cast("double") - m)
    return F.zip_with(
        shifted,
        sc,
        lambda t, s: F.when(
            s > 0.0,
            F.least(
                F.lit(255.0),
                F.greatest(F.lit(0.0), F.floor(t / s + F.lit(0.5)).cast("double")),
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )


def sq8_dequantize(
    codes: Column, mins: list[float], scales: list[float]
) -> Column:
    """Reconstruction array<double>: min_d + code_d * scale_d."""
    mn = F.array(*[F.lit(float(m)) for m in mins])
    sc = F.array(*[F.lit(float(s)) for s in scales])
    scaled = F.zip_with(codes, sc, lambda c, s: c.cast("double") * s)
    return F.zip_with(scaled, mn, lambda t, m: t + m)


def sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Top-k cosine neighbours scored on 8-bit scalar-quantized vectors
    — the memory-footprint scale path for ANN: a 100 TB float32 corpus
    becomes 25 TB of codes (4x), and the scoring scan reads codes only.
    Corpus stats quantize BOTH sides (queries are quantized with corpus
    mins/scales, the standard asymmetric-free SQ). Same output contract
    as :func:`cosine_topk`: (query_id, neighbor_id, rank, sim), sim
    rounded to 6, ties by neighbor id, self-matches excluded.

    Plan shape: stats agg (one scan) -> broadcast queries x partitioned
    corpus with the dequantized cosine as a JVM fold — identical to the
    exact scorer's plan, only the operand arrays differ."""
    mins, scales = sq8_stats(embeddings, vec_col=vec_col, dim=dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        sq8_dequantize(
            sq8_codes(F.col(vec_col), mins, scales), mins, scales
        ).alias("qv"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        sq8_dequantize(
            sq8_codes(F.col(vec_col), mins, scales), mins, scales
        ).alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "sim",
        )
    )


def sq8_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Recall@k of the SQ8-scored top-k against the exact float scorer
    — the approximation-quality gate for the quantized path (same
    statistical-acceptance posture as :func:`ann_recall`). Measures the
    ranking damage of 8-bit reconstruction, the number a user consults
    before switching the corpus to codes."""
    approx = sq8_topk(
        embeddings, queries, k=k, id_col=id_col, vec_col=vec_col, dim=dim
    )
    return _recall_frame(
        embeddings, queries, approx, k=k, id_col=id_col, vec_col=vec_col
    )


def _assign_expr(vec: Column, centroids) -> Column:
    """argmin_c squared-L2(vec, centroid_c) over a Column (generalizes
    :func:`_assign_cluster` to sliced sub-vectors); ties to lower c."""
    best_d, best_c = None, None
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(
                vec, arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d, best_c = d, F.lit(0)
        else:
            best_c = F.when(d < best_d, F.lit(c)).otherwise(best_c)
            best_d = F.least(best_d, d)
    return best_c


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jegou et al. TPAMI 2011): the
    dim-vector splits into ``m`` contiguous subspaces of dim/m and each
    subspace trains its own ``n_codes``-centroid deterministic Lloyd
    quantizer — the same fixed-schedule, md5-seeded, ROUND(mean, 6)
    recipe as :func:`ivf_train`, run on sliced sub-vectors, so the
    whole training is bit-replicable in unrolled SQL. All subspaces
    share the md5-smallest seed ids. Returns codebooks[m][n_codes][sd].

    PQ completes the quantization family next to SQ8 (per-dim scalar)
    and IVF (coarse partitioning): m log2(n_codes)-bit codes per vector
    — at the defaults 8 bytes vs 256, a 32x footprint cut, the standard
    billion-scale ANN memory layout.
    """
    assert dim % m == 0, "dim must divide into m subspaces"
    sd = dim // m
    seeds = _ivf_seed_ids(embeddings, n_codes, id_col)
    seed_rows = {
        int(r["id"]): list(r["v"])
        for r in embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        .where(F.col(id_col).isin(seeds))
        .collect()
    }
    books: list[list[list[float]]] = []
    for sub in range(m):
        lo = sub * sd
        cents = [
            [float(x) for x in seed_rows[s][lo:lo + sd]] for s in seeds
        ]
        sliced = F.slice(F.col(vec_col), lo + 1, sd)
        for _ in range(iters):
            assigned = embeddings.select(
                sliced.alias("v"), _assign_expr(sliced, cents).alias("c")
            )
            means = (
                assigned.select("c", F.posexplode("v").alias("pos", "x"))
                .groupBy("c", "pos")
                .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("mu"))
                .collect()
            )
            new_c = [list(c) for c in cents]  # empty clusters persist
            acc: dict[int, dict[int, float]] = {}
            for r in means:
                acc.setdefault(int(r["c"]), {})[int(r["pos"])] = float(r["mu"])
            for c, byp in acc.items():
                new_c[c] = [byp[p] for p in range(sd)]
            cents = new_c
        books.append(cents)
    return books


def pq_reconstruct(
    vec: Column, books: list[list[list[float]]]
) -> Column:
    """Encode-then-decode as one JVM expression: per subspace, assign
    the sliced sub-vector to its nearest codeword and substitute that
    codeword; concatenation of the m codewords is the reconstruction
    the asymmetric scorer ranks against."""
    m = len(books)
    sd = len(books[0][0])
    parts = []
    for sub in range(m):
        sliced = F.slice(vec, sub * sd + 1, sd)
        code = _assign_expr(sliced, books[sub])
        table = F.array(
            *[F.array(*[F.lit(float(x)) for x in cw]) for cw in books[sub]]
        )
        parts.append(F.element_at(table, code + F.lit(1)))
    return F.concat(*parts)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Top-k cosine neighbours with PQ-compressed corpus vectors and
    full-precision queries (asymmetric scoring, the standard PQ-ADC
    contract): corpus vectors are replaced by their codebook
    reconstruction, queries are not. Output contract matches
    :func:`cosine_topk` (sim rounded to 6, ties by neighbor id, self
    excluded). Plan shape: training scans (driver-tiny codebooks baked
    as literals) -> broadcast queries x partitioned corpus scan."""
    books = pq_train(
        embeddings, m=m, n_codes=n_codes, iters=iters,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        pq_reconstruct(F.col(vec_col), books).alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "sim",
        )
    )


def pq_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Recall@k of the PQ scorer vs the exact float top-k — the
    approximation-quality gate for the 32x compression."""
    approx = pq_topk(
        embeddings, queries, k=k, m=m, n_codes=n_codes, iters=iters,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    return _recall_frame(embeddings, queries, approx, k, id_col, vec_col)


def truncated_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim_keep: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style dimension-truncated exact scorer (Kusupati et
    al. 2022): cosine over only the FIRST ``dim_keep`` components —
    the 4x-compute / 4x-bandwidth retrieval path when embeddings are
    trained nested. The slice happens BEFORE the broadcast/cross join,
    so the corpus scan ships dim_keep floats per row, not the full
    vector (column pruning the planner can't do on array elements)."""
    tq = queries.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dim_keep).alias(vec_col)
    )
    tc = embeddings.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dim_keep).alias(vec_col)
    )
    return cosine_topk(tc, tq, k=k, id_col=id_col, vec_col=vec_col)


def truncated_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim_keep: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the truncated scorer vs the full-dimension exact
    top-k — measures what the 4x saving costs in ranking quality (the
    same statistical-acceptance gate as the LSH/IVF/SQ8/PQ paths)."""
    approx = truncated_topk(
        embeddings, queries, k=k, dim_keep=dim_keep,
        id_col=id_col, vec_col=vec_col,
    )
    return _recall_frame(
        embeddings, queries, approx, k=k, id_col=id_col, vec_col=vec_col
    )


def anisotropy(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 9,
) -> DataFrame:
    """EXACT mean pairwise cosine over all n*(n-1) ordered pairs of
    L2-normalized vectors — the standard embedding-anisotropy
    diagnostic (Ethayarajh EMNLP'19: contextual embeddings cluster in a
    narrow cone; high mean cosine = degenerate geometry) — WITHOUT the
    O(n^2) pair join:

        sum_{a != b} cos(a,b) = ||sum_a u_a||^2 - n

    so one pass accumulates the component-wise sum of unit vectors and
    the whole statistic is (||S||^2 - n) / (n * (n - 1)).

    Determinism: per-row normalization folds the squared components
    LEFT-TO-RIGHT in the array (same order as the DuckDB twin's
    list_reduce); unit components are quantized to 12 decimals and
    summed as DECIMAL (order-free exact sums), and the 64 per-dimension
    squares are again decimal-summed. The only unquantized floats are
    per-row scalars with a fixed evaluation order, so the twin matches
    bit-for-bit.

    Scale posture: one projection + one groupBy(pos) over n*d rows —
    embarrassingly partial-aggregable; no shuffle larger than d rows
    leaves the map side. Zero vectors are excluded (reported).

    Returns one row: (n_vectors, n_zero, mean_pairwise_cosine).
    """
    sq_sum = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    base = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.sqrt(sq_sum).alias("nrm"),
    )
    n_zero = base.where(F.col("nrm") == 0.0).count()
    unit = (
        base.where(F.col("nrm") > 0.0)
        .select(
            "vid",
            F.posexplode(
                F.transform(
                    "v", lambda x: F.round(x.cast("double") / F.col("nrm"), 12)
                )
            ).alias("pos", "u"),
        )
    )
    dims = unit.groupBy("pos").agg(
        F.sum(F.col("u").cast("decimal(38,12)")).alias("s")
    )
    tot = dims.agg(
        F.sum(
            F.round(F.col("s").cast("double") * F.col("s").cast("double"), 12)
            .cast("decimal(38,12)")
        ).alias("ss")
    )
    n_vec = base.where(F.col("nrm") > 0.0).count()
    denom = n_vec * (n_vec - 1) if n_vec > 1 else 1
    return tot.select(
        F.lit(n_vec).cast("long").alias("n_vectors"),
        F.lit(n_zero).cast("long").alias("n_zero"),
        F.round(
            (F.col("ss").cast("double") - F.lit(float(n_vec)))
            / F.lit(float(denom)),
            round_to,
        ).alias("mean_pairwise_cosine"),
    )


def anisotropy_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`anisotropy` (identical fold order,
    quantization, and decimal sums)."""
    sq = (
        f"list_reduce(list_transform({vec_col}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS vid, {vec_col} AS v, sqrt({sq}) AS nrm
  FROM {table}
),
unit AS MATERIALIZED (
  SELECT vid,
         generate_subscripts(v, 1) - 1 AS pos,
         CAST(ROUND(CAST(unnest(v) AS DOUBLE) / nrm, 12)
              AS DECIMAL(38,12)) AS u
  FROM base WHERE nrm > 0.0
),
dims AS (SELECT pos, SUM(u) AS s FROM unit GROUP BY pos),
tot AS (
  SELECT SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 12)
             AS DECIMAL(38,12))) AS ss
  FROM dims),
counts AS (
  SELECT COUNT(*) FILTER (nrm > 0.0) AS n_vec,
         COUNT(*) FILTER (nrm = 0.0) AS n_zero
  FROM base)
SELECT CAST(c.n_vec AS BIGINT) AS n_vectors,
       CAST(c.n_zero AS BIGINT) AS n_zero,
       ROUND((CAST(t.ss AS DOUBLE) - CAST(c.n_vec AS DOUBLE))
             / CASE WHEN c.n_vec > 1
                    THEN CAST(c.n_vec * (c.n_vec - 1) AS DOUBLE)
                    ELSE 1.0 END, {round_to}) AS mean_pairwise_cosine
FROM tot t, counts c
"""


# ------------------------------------------------------------- PCA probe

def pca_top(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 12,
    round_to: int = 6,
) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration on the (centered) covariance matrix — with anisotropy
    the other standard geometry diagnostic: the explained-variance
    ratio of PC1 tells you whether the space has collapsed onto a
    dominant direction (rogue dimension / mean-shift artifacts in
    contrastive embeddings).

    Plan: one posexplode to (id, pos, x), per-dimension means, a
    centered self-join on id for the d x d covariance (n*d^2 rows with
    map-side partial sums — d is a small constant, so this is the
    scale-safe Gram shape; no n^2 pair join), then ``iters`` fixed
    power-iteration rounds on the 64-row vector state (matvec = one
    join + one groupBy per round, the fiedler_bisection plan on a
    dense tiny operator). Start vector is the portable md5-parity
    +-1 per dimension; the sign of the result is canonicalized by the
    largest-|loading| coordinate (ties to the smallest pos).

    Returns d rows: (pos, loading, eigenvalue, explained_ratio),
    rounded to ``round_to`` (signed zero normalized).
    """
    from .hashing import md5_long

    pts = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    )
    mean = pts.groupBy("pos").agg(F.avg("x").alias("m"))
    cent = pts.join(F.broadcast(mean), "pos").select(
        "id", "pos", (F.col("x") - F.col("m")).alias("x")
    )
    cov = (
        cent.select(F.col("id"), F.col("pos").alias("i"), F.col("x").alias("xi"))
        .join(
            cent.select(F.col("id"), F.col("pos").alias("j"), F.col("x").alias("xj")),
            "id",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("xj")).alias("c"))
        .persist()
    )

    v = mean.select(
        "pos",
        F.when(
            md5_long(F.concat(F.lit("pca:"), F.col("pos").cast("string")))
            % 2
            == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("v"),
    )

    def normalize(df: DataFrame) -> DataFrame:
        nrm = df.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nr"))
        return df.crossJoin(F.broadcast(nrm)).select(
            "pos",
            F.coalesce(
                F.try_divide(F.col("v"), F.col("nr")), F.lit(0.0)
            ).alias("v"),
        )

    v = normalize(v).localCheckpoint(eager=True)
    for _ in range(iters):
        w = (
            cov.join(v.select(F.col("pos").alias("j"), "v"), "j")
            .groupBy(F.col("i").alias("pos"))
            .agg(F.sum(F.col("c") * F.col("v")).alias("v"))
        )
        v = normalize(w).localCheckpoint(eager=True)

    # eigenvalue lambda = v' C v and trace for the explained ratio
    cv = (
        cov.join(v.select(F.col("pos").alias("j"), "v"), "j")
        .groupBy(F.col("i").alias("pos"))
        .agg(F.sum(F.col("c") * F.col("v")).alias("cv"))
    )
    lam = (
        cv.join(v, "pos")
        .agg(F.sum(F.col("cv") * F.col("v")).alias("lam"))
    )
    tr = cov.where(F.col("i") == F.col("j")).agg(
        F.sum("c").alias("tr")
    )
    # sign canonicalization: flip so the largest-|loading| coord > 0
    wsig = Window.orderBy(F.abs(F.col("v")).desc(), F.col("pos").asc())
    sig = (
        v.withColumn("rk", F.row_number().over(wsig))
        .where(F.col("rk") == 1)
        .select(
            F.when(F.col("v") < 0, F.lit(-1.0))
            .otherwise(F.lit(1.0))
            .alias("s")
        )
    )
    out = (
        v.crossJoin(F.broadcast(sig))
        .crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
    )
    rounded = F.round(F.col("v") * F.col("s"), round_to)
    cov.unpersist()
    return out.select(
        F.col("pos").cast("long").alias("pos"),
        F.when(rounded == 0, F.lit(0.0)).otherwise(rounded).alias("loading"),
        F.round(F.col("lam"), round_to).alias("eigenvalue"),
        F.round(
            F.coalesce(F.try_divide(F.col("lam"), F.col("tr")), F.lit(0.0)),
            round_to,
        ).alias("explained_ratio"),
    )


def pca_top_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 12,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`pca_top`: identical long form, covariance
    self-join, md5-parity start, unrolled normalized matvec rounds,
    largest-|loading| sign canonicalization."""
    parts = [f"""
pts AS MATERIALIZED (
  SELECT {id_col} AS id, d.i AS pos, CAST({vec_col}[d.i + 1] AS DOUBLE) AS x
  FROM {table} CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) d)""",
        """
mn AS MATERIALIZED (SELECT pos, AVG(x) AS m FROM pts GROUP BY pos)""",
        """
cent AS MATERIALIZED (
  SELECT p.id, p.pos, p.x - m.m AS x FROM pts p JOIN mn m ON p.pos = m.pos)""",
        """
cov AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS c
  FROM cent a JOIN cent b ON a.id = b.id GROUP BY a.pos, b.pos)""",
        """
v0r AS (SELECT pos,
  CASE WHEN (('0x' || substr(md5('pca:' || CAST(pos AS VARCHAR)), 1, 15))
             ::BIGINT % 2) = 0 THEN 1.0 ELSE -1.0 END AS v
  FROM mn)""",
        """
v0 AS MATERIALIZED (SELECT pos, COALESCE(v / NULLIF(nr, 0), 0.0) AS v FROM v0r
  CROSS JOIN (SELECT sqrt(SUM(v * v)) AS nr FROM v0r) n)""",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
w{t} AS MATERIALIZED (SELECT c.i AS pos, SUM(c.c * v.v) AS v
  FROM cov c JOIN v{t - 1} v ON c.j = v.pos GROUP BY c.i)""")
        parts.append(f"""
v{t} AS MATERIALIZED (SELECT pos, COALESCE(v / NULLIF(nr, 0), 0.0) AS v FROM w{t}
  CROSS JOIN (SELECT sqrt(SUM(v * v)) AS nr FROM w{t}) n)""")
    vf = f"v{iters}"
    parts.append(f"""
cvx AS (SELECT c.i AS pos, SUM(c.c * v.v) AS cv
  FROM cov c JOIN {vf} v ON c.j = v.pos GROUP BY c.i)""")
    parts.append(f"""
lam AS (SELECT SUM(x.cv * v.v) AS lam
  FROM cvx x JOIN {vf} v ON x.pos = v.pos)""")
    parts.append("""
trc AS (SELECT SUM(c) AS tr FROM cov WHERE i = j)""")
    parts.append(f"""
sig AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s FROM (
  SELECT v, ROW_NUMBER() OVER (ORDER BY abs(v) DESC, pos ASC) AS rk
  FROM {vf}) WHERE rk = 1)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT CAST(v.pos AS BIGINT) AS pos,
  CASE WHEN ROUND(v.v * sig.s, {round_to}) = 0 THEN 0.0
       ELSE ROUND(v.v * sig.s, {round_to}) END AS loading,
  ROUND(lam.lam, {round_to}) AS eigenvalue,
  ROUND(COALESCE(lam.lam / NULLIF(trc.tr, 0), 0.0), {round_to})
    AS explained_ratio
FROM {vf} v CROSS JOIN sig CROSS JOIN lam CROSS JOIN trc"""
    )
