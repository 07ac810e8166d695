"""Synchronous label propagation with deterministic min tie-break.

Mandated by the north rule; published companion is the reference
authors' Layered Label Propagation (used to order nodes for webgraph
compression of social networks — SURVEY.md §2.10). Semantics chosen for
exact reproducibility on a cluster (FIXTURES.md §5 oracle): synchronous
schedule, ``label(v) <- argmax_count over neighbor labels, ties -> min
label``; isolated nodes keep their own label; fixed iteration count or
stop at stability. Deterministic at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..operators.transforms import no_loops, symmetrize


@dataclass
class LabelPropResult:
    labels: DataFrame  # (node: long, label: long)
    iterations: int
    converged: bool


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    num_partitions: int | None = None,
    assume_symmetric: bool = False,
    checkpoint_dir: str | None = None,
    run_id: str = "labelprop",
) -> LabelPropResult:
    from ..plans.iterate import iterate

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = edges.select("src", "dst") if assume_symmetric else symmetrize(edges)
    sym = no_loops(sym).repartition(num_partitions, "src").persist()

    # node set from ALL edge endpoints: a node appearing only in a
    # self-loop keeps its own label (isolated-node semantics) rather
    # than silently vanishing from the output
    labels0 = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )

    # argmax-by-count with min-label tie-break via one window over the
    # (node, label) count table — the window partitions by node, so no
    # global-order bottleneck at scale.
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("label").asc())

    def step(labels: DataFrame, k: int):
        from pyspark.sql import Observation

        counts = (
            sym.join(labels.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        obs = Observation()
        new_labels = (
            labels.join(best.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.coalesce("new_label", "label").alias("label"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("node", "label")
        )
        return new_labels, {}, obs

    def stop(obs_metrics: dict, k: int) -> bool:
        return obs_metrics.get("changed", 1) == 0

    from ..plans.iterate import iteration_confs

    with iteration_confs(spark):
        labels, it, done = iterate(
            spark,
            labels0,
            step,
            max_iter=max_iter,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            stop=stop,
        )
    sym.unpersist()
    return LabelPropResult(labels, it, done)


def label_propagation_numpy(adj: np.ndarray, max_iter: int = 10) -> np.ndarray:
    """Single-process oracle with the identical synchronous schedule."""
    sym = adj | adj.T
    np.fill_diagonal(sym, False)
    n = sym.shape[0]
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            nbrs = np.nonzero(sym[:, v])[0]
            if len(nbrs) == 0:
                continue
            vals, counts = np.unique(labels[nbrs], return_counts=True)
            new[v] = vals[counts == counts.max()].min()
        if (new == labels).all():
            return new
        labels = new
    return labels


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a node->label partition, evaluated on the
    symmetrized loop-free graph (each undirected edge counted as two
    arcs, exactly the graph label propagation runs on).

    Reference analog: the quality objective behind the reference
    authors' Layered Label Propagation ordering (gamma=0 term of the
    Absolute Potts Model objective; see SURVEY.md section 2.10 — LLP is
    published companion work to webgraph's compression orderings).

    Q = sum_c [ e_c/m - (d_c/m)^2 ] where m = |sym arcs|, e_c = arcs
    with both endpoints labelled c, d_c = degree mass of community c on
    the symmetric graph. Computed with an INTEGER numerator
    N = m*sum(e_c) - sum(d_c^2) so the only floating operation is the
    final division N/m^2 — bit-identical at any parallelism and in any
    oracle engine (no float-sum ordering effects).

    Returns one row: (modularity double, n_communities, m_arcs).
    Shuffle shape: two co-partitioned joins of arcs against the label
    table (by src, then dst) + one groupBy(label) — all keys are node
    ids, no skew beyond the graph's own hubs; scale-safe.
    """
    sym = no_loops(symmetrize(edges.select("src", "dst")))
    lab = labels.select("node", "label")
    arcs = (
        sym.join(lab.withColumnRenamed("node", "src")
                    .withColumnRenamed("label", "lsrc"), "src")
           .join(lab.withColumnRenamed("node", "dst")
                    .withColumnRenamed("label", "ldst"), "dst")
    )
    # per-community degree mass d_c (symmetric graph: out-degree == degree)
    dc = (
        arcs.groupBy("lsrc").agg(F.count("*").alias("d"))
            .agg(F.sum(F.col("d") * F.col("d")).alias("sum_d2"))
    )
    tot = arcs.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("lsrc") == F.col("ldst"), 1).otherwise(0))
         .alias("within"),
    )
    ncomm = lab.agg(F.countDistinct("label").alias("n_communities"))
    return (
        tot.crossJoin(dc).crossJoin(ncomm)
        .select(
            F.round(
                (F.col("m") * F.col("within") - F.col("sum_d2")).cast("double")
                / (F.col("m") * F.col("m")).cast("double"),
                9,
            ).alias("modularity"),
            F.col("n_communities").cast("long").alias("n_communities"),
            F.col("m").cast("long").alias("m_arcs"),
        )
    )


def community_conductance(
    edges: DataFrame, labels: DataFrame, k: int = 5, round_to: int = 9
) -> DataFrame:
    """Conductance of the ``k`` largest communities of a partition:
    phi(C) = cut(C, V-C) / min(vol(C), vol(V) - vol(C)) on the
    symmetrized loop-free graph — the per-community quality score that
    complements the global modularity Q (and the sweep objective of
    algos/localcluster.py, here evaluated for a given partition).

    All quantities are exact integers (vol = arc endpoints in C, cut =
    arcs leaving C); phi is computed as an integer half-up division
    ``(2*cut*10^round_to + minvol) div (2*minvol)`` then divided by the
    scale as ONE double op — so the DuckDB twin matches bit-for-bit
    (no libm ROUND path in either engine; same pattern as the hitting-
    set oracle). Bound: ``2*cut*10^round_to`` must fit int64, i.e.
    cut < ~4.6e9 at round_to=9 — beyond that, drop round_to.
    Ties in the top-k-by-size break by ascending label.

    Shuffle shape: the two label joins + one groupBy(label) every
    partition metric here uses; the top-k is a size-table sort. Scale
    posture identical to :func:`modularity`.
    """
    sym = no_loops(symmetrize(edges.select("src", "dst")))
    lab = labels.select("node", "label")
    arcs = (
        sym.join(lab.withColumnRenamed("node", "src")
                    .withColumnRenamed("label", "lsrc"), "src")
           .join(lab.withColumnRenamed("node", "dst")
                    .withColumnRenamed("label", "ldst"), "dst")
    )
    per = arcs.groupBy(F.col("lsrc").alias("label")).agg(
        F.count("*").alias("vol"),
        F.sum(F.when(F.col("lsrc") != F.col("ldst"), 1).otherwise(0)).alias("cut"),
    )
    sizes = lab.groupBy("label").agg(F.count("*").alias("n_nodes"))
    m = sym.count()  # total arc mass = vol(V)
    top = (
        sizes.orderBy(F.col("n_nodes").desc(), F.col("label").asc())
        .limit(k)
    )
    scale = 10 ** round_to
    base = (
        top.join(per, "label", "left")
        .select(
            "label",
            "n_nodes",
            F.coalesce("vol", F.lit(0)).cast("long").alias("vol"),
            F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
        )
        .withColumn("minvol", F.least(F.col("vol"), F.lit(m) - F.col("vol")))
    )
    return (
        base.withColumn(
            "phi_e",
            F.when(F.col("minvol") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(f"(2 * cut * CAST({scale} AS BIGINT) + minvol) "
                       f"div (2 * minvol)")
            ),
        )
        .select(
            "label",
            "n_nodes",
            "vol",
            "cut",
            (F.col("phi_e").cast("double") / F.lit(float(scale))).alias("phi"),
        )
        .orderBy(F.col("n_nodes").desc(), F.col("label").asc())
    )
