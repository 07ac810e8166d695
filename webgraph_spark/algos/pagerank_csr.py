"""PageRank over packed CSR blocks — the BVGraph-consuming variant.

The north star's physical accelerator path: per-iteration messages are
generated INSIDE the CSR pack by an Arrow kernel (numpy decode + per-
block combine), instead of joining the raw edge table. Benefits at
scale:

- the edge payload is read as a handful of int64 buffers per block
  (gap-decoded in numpy), not 10^10 shuffled rows;
- messages are pre-aggregated per (block, dst) before the shuffle —
  a block-local map-side combine that cuts shuffle volume by the
  average in-block dst multiplicity;
- rank state is routed to blocks by the SAME node-range bounds used to
  pack, so the cogroup is a co-partitioned join on block_id.

Semantics are identical to algos.pagerank (same teleport, dangling,
convergence); tests assert allclose 1e-12 between both paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, functions as F

from ..operators.csr import _decode_block
from ..plans.iterate import iterate, iteration_confs
from .pagerank import PageRankResult


def _range_lookup_expr(los: list[int], col: str = "node"):
    """block index of a node id given sorted block lower bounds."""
    if len(los) <= 1:
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(int(b)) for b in los[1:]])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(F.col(col) >= b, 1).otherwise(0),
    )


def pagerank_csr(
    blocks: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> PageRankResult:
    """PageRank consuming the CSR block table from operators.csr.pack_csr."""
    spark = blocks.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    blocks = blocks.persist()
    binfo = sorted(
        (r.block_id, r.node_lo) for r in blocks.select("block_id", "node_lo").collect()
    )
    los = [lo for _, lo in binfo]
    bid_of_idx = {i: bid for i, (bid, _) in enumerate(binfo)}

    # one-time node census from the pack (srcs have outdeg > 0)
    from ..operators.csr import unpack_csr

    e = unpack_csr(blocks)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            e.select(F.col("src").alias("node")).distinct().withColumn("z", F.lit(0.0)),
            "node",
            "left",
        )
        .select("node", F.when(F.col("z").isNull(), 1.0).otherwise(0.0).alias("dang"))
        .repartition(num_partitions, "node")
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return PageRankResult(
            spark.createDataFrame([], "node long, rank double"), 0, True, 0.0
        )

    # map physical block ordinal -> block_id for the range lookup
    idx_expr = _range_lookup_expr(los)
    bid_map = F.array(*[F.lit(int(bid_of_idx[i])) for i in range(len(los))]) if los else None

    def with_block(ranks: DataFrame) -> DataFrame:
        idx = idx_expr
        bid = F.element_at(bid_map, idx.cast("int") + 1) if bid_map is not None else F.lit(0)
        return ranks.withColumn("block_id", bid.cast("long"))

    def gen_msgs(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "c": pd.Series(dtype="float64")})
        out_dst: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        rnode = right["node"].to_numpy(np.int64)
        rrank = right["rank"].to_numpy(np.float64)
        order = np.argsort(rnode)
        rnode, rrank = rnode[order], rrank[order]
        for _, row in left.iterrows():
            src, dst = _decode_block(row)
            if len(src) == 0:
                continue
            counts = np.frombuffer(row["counts"], dtype=np.int64)
            srcs = np.frombuffer(row["srcs"], dtype=np.int64)
            pos = np.searchsorted(rnode, srcs)
            # srcs ⊆ rank nodes by construction — but fail LOUDLY if a
            # rank row ever goes missing (routing bug / corrupt block)
            # instead of crediting a neighboring node's rank
            if len(srcs) and (pos >= len(rnode)).any():
                raise ValueError("pagerank_csr: src beyond rank-state range")
            if len(srcs) and (rnode[pos] != srcs).any():
                raise ValueError("pagerank_csr: rank rows missing for block srcs")
            rank_per_list = rrank[pos]
            contrib_per_edge = np.repeat(rank_per_list / counts, counts)
            u, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(len(u), dtype=np.float64)
            np.add.at(acc, inv, contrib_per_edge)
            out_dst.append(u)
            out_c.append(acc)
        if not out_dst:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "c": pd.Series(dtype="float64")})
        return pd.DataFrame(
            {"dst": np.concatenate(out_dst), "c": np.concatenate(out_c)}
        )

    ranks0 = nodes.select("node", F.lit(1.0 / n).alias("rank"), "dang")
    carry: dict = {"dmass": None, "delta": float("inf")}

    def step(ranks: DataFrame, k: int):
        if carry["dmass"] is None:
            carry["dmass"] = (
                ranks.where(F.col("dang") > 0).agg(F.sum("rank")).collect()[0][0] or 0.0
            )
        base = (1.0 - alpha) / n + alpha * carry["dmass"] / n
        rb = with_block(ranks.select("node", "rank"))
        msgs = blocks.groupBy("block_id").cogroup(
            rb.groupBy("block_id")
        ).applyInPandas(gen_msgs, schema="dst long, c double")
        contribs = msgs.groupBy("dst").agg(F.sum("c").alias("contrib"))
        # fold the old rank into the state frame (one left join instead
        # of nodes-join + old-rank-join — same shape as algos.pagerank)
        obs = Observation()
        new_ranks = (
            ranks.withColumnRenamed("rank", "_old")
            .join(
                contribs.withColumnRenamed("dst", "node").hint("shuffle_hash"),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base) + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
                "dang",
                "_old",
            )
            .observe(
                obs,
                F.sum(F.col("rank") * F.col("dang")).alias("dmass"),
                F.max(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
            )
            .select("node", "rank", "dang")
        )
        return new_ranks, {"base": base}, obs

    def stop(obs_metrics: dict, k: int) -> bool:
        carry["dmass"] = obs_metrics.get("dmass", carry["dmass"]) or 0.0
        carry["delta"] = obs_metrics.get("delta", float("inf"))
        if fixed_iterations is not None:
            return False
        return carry["delta"] < tol

    max_it = fixed_iterations if fixed_iterations is not None else max_iter
    with iteration_confs(spark):
        state, iters, done = iterate(
            spark, ranks0, step, max_iter=max_it, stop=stop, run_id="pagerank_csr"
        )
    nodes.unpersist()
    blocks.unpersist()
    return PageRankResult(
        state.select("node", "rank"),
        iters,
        done or fixed_iterations is not None,
        float(carry["delta"]),
    )
