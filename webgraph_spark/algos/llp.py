"""Layered Label Propagation ordering (deterministic variant).

The reference authors' published companion algorithm for compression
orderings ("Layered Label Propagation: a multiresolution coordinate-free
ordering for compressing social networks", Boldi-Rosa-Santini-Vigna,
WWW 2011) — the ordering webgraph users actually run before BVGraph
packing on social graphs. Reference analog: the LAW `LayeredLabelPropagation`
driver invoked ahead of `BVGraph.store` (SURVEY.md §2.4 ordering family,
alongside gray/lex/degree permutations in operators/transforms.py).

Deterministic divergences from the paper (documented, not bugs):
- synchronous schedule with min-label tie-break (same contract as
  algos/labelprop.py), not the paper's randomized asynchronous sweep —
  required for exact reproducibility at any parallelism and for the
  unrolled-SQL oracle (graph/testdata.py:llp_gamma_bits_sql);
- the γ-penalized objective keeps the paper's form
  ``score_λ(v) = k_λ(v) − γ·(vol_λ − k_λ(v))`` but measures ``vol_λ``
  on the WHOLE current labeling (v not excluded) — one groupBy, no
  per-node correction join;
- layers are combined by one lexicographic sort over the per-γ label
  tuple (coarse γ first), not the paper's iterative refinement pass.

γ values should be dyadic (0, 1, 0.5, 0.25, ...): then every score is
exact in float64 (cnt and vol are integers, γ·x is exact scaling), so
the argmax is bit-reproducible across engines — the same trick the EF
oracle uses with integer bit-length arithmetic (ADVICE round 2).

Scale notes: each round is one count shuffle (map-side combined), one
label-volume groupBy (≤ #labels rows, broadcast back), and one
per-node window — the same shape as label_propagation, which holds at
10^10 edges. The final sort key is K longs (K = #layers), BOUNDED —
unlike the Gray adjacency-array key this never materializes a hub's
successor list into a sort row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.transforms import map_nodes, no_loops, symmetrize


def llp_labels(
    edges: DataFrame,
    gamma: float = 0.0,
    rounds: int = 2,
    num_partitions: int | None = None,
) -> DataFrame:
    """One LLP layer: ``(node, label)`` after ``rounds`` synchronous
    γ-penalized updates. γ=0 reduces exactly to label_propagation's
    update (score = neighbor-label count)."""
    from ..plans.iterate import iterate

    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = (
        no_loops(symmetrize(edges))
        .repartition(num_partitions, "src")
        .persist()
    )

    labels0 = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )

    w = Window.partitionBy("node").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )

    def step(labels: DataFrame, k: int):
        cnt = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # label volumes over the CURRENT labeling: small (≤ #labels
        # rows), broadcast into the candidate-score join
        vol = labels.groupBy("label").agg(F.count(F.lit(1)).alias("vol"))
        scored = cnt.join(F.broadcast(vol), "label").select(
            "node",
            "label",
            (
                F.col("cnt").cast("double")
                - F.lit(float(gamma)) * (F.col("vol") - F.col("cnt"))
            ).alias("score"),
        )
        best = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        nxt = (
            labels.join(best, "node", "left")
            .select(
                "node", F.coalesce("new_label", "label").alias("label")
            )
        )
        return nxt, {}, None

    labels, _iters, _conv = iterate(spark, labels0, step, max_iter=rounds)
    sym.unpersist()
    return labels


def llp_permutation(
    edges: DataFrame,
    gammas: tuple[float, ...] = (0.0, 0.5),
    rounds: int = 2,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """LLP compression ordering: ``(relabelled edges, perm)`` where
    ``perm = (node, target)`` sorts nodes by their per-γ label tuple
    (γ in the given order — put coarse/small γ first), node id last."""
    key = None
    label_cols = []
    for i, g in enumerate(gammas):
        li = llp_labels(edges, gamma=g, rounds=rounds,
                        num_partitions=num_partitions)
        col = f"label_{i}"
        li = li.withColumnRenamed("label", col)
        key = li if key is None else key.join(li, "node")
        label_cols.append(col)
    # distributed dense-rank (range-partition + per-partition offsets,
    # util/ids.py) — a global row_number() window would funnel all n
    # nodes through one task at 10^10-node scale
    from ..util.ids import assign_dense_ids

    perm = assign_dense_ids(key, label_cols + ["node"], id_col="target").select(
        "node", "target"
    )
    return map_nodes(edges, perm), perm
