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
