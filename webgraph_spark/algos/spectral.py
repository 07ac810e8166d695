"""Spectral link-analysis ranks: HITS (hubs/authorities), Katz,
eigenvector centrality, and SALSA authorities.

Reference analog: the LAW rank family shipped alongside webgraph
(it.unimi.dsi.law.rank — PageRank, KatzParallelGaussSeidel, HITS/SALSA
style spectral ranks; SURVEY.md §2.10 lists PageRank as the mandated
member). Both are power iterations over the same edge table as
:mod:`.pagerank`, with the identical scale posture: out/in-degree
denormalized once, ranks hash-partitioned on node id, one
co-partitioned shuffle_hash join + one map-side-combined groupBy per
direction per iteration, no Python in the loop.

Determinism/oracle notes: fixed iteration counts and float64
expressions written identically in the SQL twins
(graph/testdata.py:hits_sql, katz_sql); HITS normalizes by the L1 sum
of each vector (not L2) so the oracle needs no SQRT ulp analysis —
the principal direction is the same, only the scaling convention
differs from textbook L2 (documented divergence).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..plans.iterate import iterate, iteration_confs
from .pagerank import _prepare


@dataclass
class HitsResult:
    scores: DataFrame  # (node, hub, authority)
    iterations: int


def hits(
    edges: DataFrame,
    iterations: int = 8,
    num_partitions: int | None = None,
) -> HitsResult:
    """Synchronous HITS: ``a <- A^T h``, ``h <- A a``, each L1-normalized
    after its update. Returns both scores per node."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").repartition(num_partitions, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(num_partitions, "node")
        .persist()
    )
    n = nodes.count()
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).localCheckpoint(eager=True)

    from ..plans.iterate import release_local_checkpoint

    for _ in range(iterations):
        # authority update: sum of hub scores over in-arcs, L1-normalize
        a_new = (
            e.join(
                state.select(F.col("node").alias("src"), "hub").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        st1 = (
            state.join(a_new.hint("shuffle_hash"), "node", "left")
            .select(
                "node", "hub", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
            )
        )
        a_sum = st1.agg(F.sum("a_raw")).collect()[0][0] or 1.0
        st1 = st1.select(
            "node", "hub", (F.col("a_raw") / F.lit(a_sum)).alias("auth")
        )
        # hub update: sum of authority scores over out-arcs, L1-normalize
        h_new = (
            e.join(
                st1.select(F.col("node").alias("dst"), "auth").hint(
                    "shuffle_hash"
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        st2 = (
            st1.join(h_new.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                "auth",
            )
        )
        h_sum = st2.agg(F.sum("h_raw")).collect()[0][0] or 1.0
        new_state = st2.select(
            "node", (F.col("h_raw") / F.lit(h_sum)).alias("hub"), "auth"
        ).localCheckpoint(eager=True)
        release_local_checkpoint(state)
        state = new_state

    e.unpersist()
    nodes.unpersist()
    return HitsResult(
        state.select("node", "hub", F.col("auth").alias("authority")),
        iterations,
    )


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    iterations: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Truncated Katz series ``x_{k+1} = β + α·A^T x_k`` (x_0 = β),
    i.e. x = Σ_{k≤iters} β·α^k·(A^T)^k·1 — each node scores its
    α-discounted in-walk count. α must be < 1/λ_max for the full series
    to converge; the truncated form is always finite and is what the
    SQL twin unrolls."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").repartition(num_partitions, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(num_partitions, "node")
        .persist()
    )
    from ..plans.iterate import release_local_checkpoint

    x = nodes.select("node", F.lit(float(beta)).alias("x")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        walked = (
            e.join(
                x.select(F.col("node").alias("src"), "x").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("x").alias("w"))
        )
        new_x = (
            nodes.join(walked.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("w", F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(x)
        x = new_x
    e.unpersist()
    nodes.unpersist()
    return x.select("node", F.col("x").alias("katz"))


def eigenvector_centrality(
    edges: DataFrame,
    iters: int = 8,
    num_partitions: int | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """L1-normalized power iteration x <- A^T x / ||A^T x||_1 from the
    uniform vector: after k rounds x(v) approximates the principal left
    eigenvector (eigenvector centrality). Nodes the walk cannot reach in
    k steps score 0. On a DAG the iterate drains to the all-zero vector
    once k exceeds the longest path — the normalizer uses zero-safe
    division so the operator returns that mathematical limit (all zeros)
    instead of erroring; symmetrize first for the classic undirected
    score. Returns (node, score [rounded])."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").distinct().repartition(num_partitions, "dst").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    state0 = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("score")
    ).repartition(num_partitions, "node")

    def step(state, k):
        y = (
            e.join(
                state.select(F.col("node").alias("src"), "score").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("score").alias("y"))
        )
        tot = y.agg(F.sum("y").alias("s"))
        new_state = (
            nodes.join(y.hint("shuffle_hash"), "node", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.coalesce(
                    F.try_divide(F.coalesce("y", F.lit(0.0)), F.col("s")),
                    F.lit(0.0),
                ).alias("score"),
            )
        )
        return new_state, {}, None

    with iteration_confs(spark, {"spark.sql.shuffle.partitions": str(num_partitions)}):
        state, _, _ = iterate(spark, state0, step, iters)
    e.unpersist()
    nodes.unpersist()
    if round_to is not None:
        state = state.select("node", F.round("score", round_to).alias("score"))
    return state


def salsa_authority(
    edges: DataFrame,
    iters: int = 4,
    num_partitions: int | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """SALSA authority scores: the stationary chain a'(v) =
    sum_{u->v} (1/out(u)) * sum_{u->w} a(w)/in(w), iterated ``iters``
    rounds from the uniform distribution over authority nodes (nodes
    with indegree > 0). Probability mass is preserved by construction,
    so no renormalization step is needed. Returns (node, auth)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst").distinct().repartition(num_partitions, "dst").persist()
    indeg = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("ind")).persist()
    outdeg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outd")).persist()
    n_auth = indeg.count()
    state0 = indeg.select(
        "node", (F.lit(1.0) / F.lit(float(n_auth))).alias("auth")
    ).repartition(num_partitions, "node")

    def step(state, k):
        # h(u) = sum over u's successors w of a(w)/in(w)
        h = (
            e.join(
                state.join(indeg, "node")
                .select(F.col("node").alias("dst"), (F.col("auth") / F.col("ind")).alias("frac"))
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("frac").alias("h"))
        )
        # a'(v) = sum over v's predecessors u of h(u)/out(u)
        new_state = (
            e.join(
                h.join(outdeg, "node")
                .select(F.col("node").alias("src"), (F.col("h") / F.col("outd")).alias("push"))
                .hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("push").alias("auth"))
        )
        return new_state, {}, None

    with iteration_confs(spark, {"spark.sql.shuffle.partitions": str(num_partitions)}):
        state, _, _ = iterate(spark, state0, step, iters)
    e.unpersist()
    indeg.unpersist()
    outdeg.unpersist()
    if round_to is not None:
        state = state.select("node", F.round("auth", round_to).alias("auth"))
    return state


def fiedler_bisection(
    edges: DataFrame,
    iters: int = 12,
    num_partitions: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Approximate Fiedler vector by DEFLATED power iteration — the
    spectral-bisection signal (Fiedler 1973; the classic graph-
    partitioning heuristic complementing algos/partition.py's LP
    variant).

    Iterates B = cI - L on the simple graph (L = D - A, c = max_deg+1,
    so B is PSD and its top eigenvector is the all-ones vector):
    each round y(v) = (c - d(v))*x(v) + sum_{u~v} x(u), then CENTER
    (subtract the mean — deflates the all-ones component) and L2-
    normalize. After k rounds x approximates the eigenvector of L's
    second-smallest eigenvalue; sign(x) is the bisection.

    Start vector: portable md5-parity +-1 per node (both engines bake
    the identical start), centered and normalized.

    Scale shape: per round ONE co-partitioned edges-state join + one
    groupBy(node) sum (map-side combine) + two scalar aggregates
    (mean, norm) broadcast back — the PageRank iteration plan with a
    different diagonal term. Fixed iteration count, no convergence
    collect in the loop.

    Returns (node, score) with score rounded (signed zero normalized
    to +0.0 so cross-engine hashing is stable).
    """
    from ..functions.hashing import md5_long
    from ..operators.transforms import simplify
    from ..plans.iterate import release_local_checkpoint

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    sym = (
        simplify(edges.select("src", "dst"))
        .repartition(num_partitions, "src")
        .persist()
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    c = int(
        deg.agg(F.max("d").alias("m")).collect()[0]["m"] or 0
    ) + 1

    s0 = F.when(
        md5_long(F.concat(F.lit("fv:"), F.col("node").cast("string")))
        % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    state = deg.select("node", "d", s0.alias("x"))

    def center_normalize(df: DataFrame) -> DataFrame:
        stats = df.agg(
            F.avg("x").alias("mu"),
            F.count("*").alias("n"),
        )
        centered = df.crossJoin(F.broadcast(stats)).select(
            "node", "d", (F.col("x") - F.col("mu")).alias("x")
        )
        nrm = centered.agg(
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nr")
        )
        return centered.crossJoin(F.broadcast(nrm)).select(
            "node",
            "d",
            F.coalesce(
                F.try_divide(F.col("x"), F.col("nr")), F.lit(0.0)
            ).alias("x"),
        )

    state = center_normalize(state).localCheckpoint(eager=True)
    for _ in range(iters):
        msg = (
            sym.join(
                state.select(F.col("node").alias("src"), "x").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("x").alias("nb"))
        )
        y = (
            state.join(msg.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                "d",
                (
                    (F.lit(float(c)) - F.col("d")) * F.col("x")
                    + F.coalesce("nb", F.lit(0.0))
                ).alias("x"),
            )
        )
        new_state = center_normalize(y).localCheckpoint(eager=True)
        release_local_checkpoint(state)
        state = new_state
    sym.unpersist()
    rounded = F.round(F.col("x"), round_to)
    return state.select(
        "node",
        F.when(rounded == 0, F.lit(0.0)).otherwise(rounded).alias("score"),
    )
