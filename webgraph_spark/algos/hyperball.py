"""HyperBall: approximate neighbourhood function via per-node HLL counters.

Reference: algo/HyperBall.java:80-137 — each node keeps a HyperLogLog
counter of its ball; iteration t merges every node's counter with its
successors' counters by register-wise max (HyperBall.java:907-914);
NF(t) = sum of per-node estimates; stop when no counter changed
(``modified() == 0`` contract, HyperBall.java:134-137).

Spark-first representation — **sparse long-form registers**, no Python
in the loop:

    counters(node: long, reg: int, val: int)   -- only registers > 0

- init: one row per node — classic HLL add of hash(node): register
  ``h mod m``, value ``rho(h div m)`` (HyperBall.java:639 init seeds
  each counter with its own node);
- iteration: ``edges JOIN counters ON dst`` emits successor registers
  to each src; union own registers; ``groupBy(node, reg).max(val)`` IS
  the register-wise max — one shuffle per iteration, all JVM;
- convergence: register values only grow, so (sum(val), count(*)) is a
  monotone fingerprint — observed on the materializing action; stable
  fingerprint == no register changed (the reference's modified()==0);
- estimate: standard HLL with small-range correction (zero registers
  counted as m - nnz per node).

The sparse form is also the systolic optimization's friend: early
iterations carry few rows; a ``changed`` frontier filter can restrict
the join (HyperBall.java:885 systolic mode) — not needed for
correctness and omitted here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@dataclass
class HyperBallResult:
    nf: list[float]  # nf[t] = approx #pairs within distance t (t=0..T)
    counters: DataFrame  # final (node, reg, val)
    iterations: int
    converged: bool


def hyperball(
    edges: DataFrame,
    log2m: int = 5,
    max_t: int = 64,
    num_partitions: int | None = None,
    seed: int = 31,
) -> HyperBallResult:
    """Approximate neighbourhood function of the directed graph."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    m = 1 << log2m

    e = edges.select("src", "dst").distinct().repartition(num_partitions, "dst").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return HyperBallResult([], spark.createDataFrame([], "node long, reg int, val int"), 0, True)

    # classic HLL add: h = hash64(node); reg = h mod m; val = rho(h >> log2m)
    # rho = 1 + leading zeros within the remaining 63-log2m bit budget;
    # highest-set-bit position via length of the base-2 string repr
    h = F.abs(F.xxhash64(F.col("node"), F.lit(seed)))
    rest = F.shiftright(h, log2m)
    budget = 63 - log2m
    rho = F.when(rest == F.lit(0), F.lit(budget + 1)).otherwise(
        F.lit(budget + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    counters0 = nodes.select(
        "node",
        (h % m).cast("int").alias("reg"),
        rho.cast("int").alias("val"),
    )

    def estimate_nf(counters: DataFrame) -> float:
        per_node = counters.groupBy("node").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("val"))).alias("z_nz"),
            F.count("*").alias("nnz"),
        )
        am = _alpha(m)
        e_raw = F.lit(am * m * m) / (F.col("z_nz") + (m - F.col("nnz")))
        # small-range correction: linear counting while zero registers
        # remain and the raw estimate is below 2.5 m (standard HLL)
        est = per_node.select(
            F.when(
                (e_raw < 2.5 * m) & (F.col("nnz") < m),
                F.lit(float(m)) * F.log(F.lit(float(m)) / (m - F.col("nnz"))),
            )
            .otherwise(e_raw)
            .alias("e")
        )
        return est.agg(F.sum("e")).collect()[0][0]

    from ..plans.iterate import iteration_confs

    state = counters0.localCheckpoint(eager=True)
    nf = [float(estimate_nf(state))]

    converged = False
    prev_fp = None
    t = 0
    with iteration_confs(spark):
        for t in range(1, max_t + 1):
            succ = e.join(
                state.withColumnRenamed("node", "dst").hint("shuffle_hash"), "dst"
            ).select(F.col("src").alias("node"), "reg", "val")
            merged = (
                state.unionByName(succ)
                .groupBy("node", "reg")
                .agg(F.max("val").alias("val"))
            )
            obs = Observation()
            out = merged.observe(
                obs, F.sum("val").alias("sv"), F.count("*").alias("cnt")
            )
            cached = out.persist()
            state = cached.localCheckpoint(eager=True)
            cached.unpersist()
            fp = (obs.get.get("sv"), obs.get.get("cnt"))
            if fp == prev_fp:
                converged = True
                t -= 1  # this round changed no register
                break
            prev_fp = fp
            nf.append(float(estimate_nf(state)))
    e.unpersist()
    nodes.unpersist()
    return HyperBallResult(nf, state, t, converged)


def effective_diameter(nf: list[float], quantile: float = 0.9) -> float:
    """Interpolated effective diameter from an NF curve
    (NeighbourhoodFunction.effectiveDiameter analog, used by
    test/algo/EstimateEffectiveDiameterTest.java:41)."""
    if not nf:
        return 0.0
    target = quantile * nf[-1]
    for t in range(len(nf)):
        if nf[t] >= target:
            if t == 0:
                return 0.0
            prev = nf[t - 1]
            return (t - 1) + (target - prev) / (nf[t] - prev)
    return float(len(nf) - 1)
