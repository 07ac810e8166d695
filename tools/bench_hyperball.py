"""Packed (wide-column) vs sparse (long-form) HyperBall register state.

The round-1 implementation kept HLL registers as sparse (node, reg, val)
rows: at convergence that is n x m rows and every iteration shuffles
|E| x avg_regs message rows. The round-2 packed form keeps the m
registers as m tinyint COLUMNS — groupBy(node).agg(max(r0)..max(r_m-1))
— cutting shuffle rows by ~m x. This harness times both on the same
transcript graph; the sparse baseline below is a faithful inline copy of
the round-1 loop (kept ONLY for this measurement).

Round 3 adds the SYSTOLIC tail measurement (HyperBall.java:120-127):
``--systolic`` runs the packed loop to convergence twice — with and
without the changed-node message filter — and reports per-round wall
time + changed-node counts, the evidence that convergence-tail rounds
cost O(arcs into changed nodes), not O(|E|).

Round 3 (late) adds the DELTA-STATE tail measurement: ``--delta`` runs
the systolic loop twice — with the base+overlay tail representation
(only diverged rows rewritten per round) and with the dense tail (full
n-row state re-checkpointed per round) — the A/B for the "tail floor is
the full-state rewrite" finding in BENCH/BASELINE.md §11. Results are
bit-identical by construction (pytest asserts it); this measures cost.

Usage: python tools/bench_hyperball.py [n_convs] [max_t]
       python tools/bench_hyperball.py --systolic [n_convs|path] [max_t]
       python tools/bench_hyperball.py --delta [n_convs|path] [max_t]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation, functions as F


def hyperball_sparse(edges, log2m=5, max_t=8, num_partitions=32, seed=31):
    """Round-1 sparse long-form loop (bench baseline only)."""
    from webgraph_spark.plans.iterate import iteration_confs

    spark = edges.sparkSession
    m = 1 << log2m
    e = edges.select("src", "dst").distinct().repartition(num_partitions, "dst").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    h = F.xxhash64(F.col("node"), F.lit(seed))
    rest = F.shiftright(h.bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)), log2m)
    budget = 63 - log2m
    rho = F.when(rest == F.lit(0), F.lit(budget + 1)).otherwise(
        F.lit(budget + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    counters0 = nodes.select(
        "node", F.pmod(h, F.lit(m)).cast("int").alias("reg"), rho.cast("int").alias("val")
    )
    state = counters0.localCheckpoint(eager=True)
    prev_fp = None
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
            out = merged.observe(obs, F.sum("val").alias("sv"), F.count("*").alias("cnt"))
            cached = out.persist()
            state = cached.localCheckpoint(eager=True)
            cached.unpersist()
            fp = (obs.get.get("sv"), obs.get.get("cnt"))
            if fp == prev_fp:
                break
            prev_fp = fp
    e.unpersist()
    nodes.unpersist()
    return t


def systolic_main(args):
    """Per-round cost with vs without the systolic changed-node filter."""
    import json

    # first arg: either a stored parquet edge-table path (reuses e.g.
    # /tmp/scaling_edges instead of the ~24-min graph rebuild) or n_convs
    src = args[0] if len(args) > 0 else "1000000"
    max_t = int(args[1]) if len(args) > 1 else 64
    from webgraph_spark.algos.hyperball import hyperball
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_hyperball_systolic",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "64g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(src):
        edges = spark.read.parquet(src).persist()
    else:
        from bench import build_transcript_graph

        edges = build_transcript_graph(spark, int(src)).persist()
    n_edges = edges.count()
    out = {"n_edges": n_edges, "max_t": max_t}
    for name, flag in (("systolic", True), ("full", False)):
        t0 = time.time()
        res = hyperball(
            edges, log2m=5, max_t=max_t, seed=31, num_partitions=64, systolic=flag
        )
        out[name] = {
            "total_sec": round(time.time() - t0, 1),
            "iterations": res.iterations,
            "converged": res.converged,
            "per_round": res.per_round,
        }
        print(json.dumps({name: out[name]}), flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH", "hyperball_systolic.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


def delta_main(args):
    """Systolic loop with vs without the delta-state tail (base+overlay
    vs full-state rewrite per round). Same graph, same seed; the NF
    curves and final states are bit-identical (tests/test_hyperball.py),
    so only the per-round cost differs."""
    import json

    src = args[0] if len(args) > 0 else "300000"
    max_t = int(args[1]) if len(args) > 1 else 48
    from webgraph_spark.algos.hyperball import hyperball
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_hyperball_delta",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "64g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(src):
        edges = spark.read.parquet(src).persist()
    else:
        from bench import build_transcript_graph

        edges = build_transcript_graph(spark, int(src)).persist()
    n_edges = edges.count()
    out = {"n_edges": n_edges, "max_t": max_t}
    nf_fps = {}
    for name, flag in (("delta_tail", True), ("dense_tail", False)):
        t0 = time.time()
        res = hyperball(
            edges,
            log2m=5,
            max_t=max_t,
            seed=31,
            num_partitions=64,
            systolic=True,
            delta_tail=flag,
        )
        nf_fps[name] = res.nf[-1]
        out[name] = {
            "total_sec": round(time.time() - t0, 1),
            "iterations": res.iterations,
            "converged": res.converged,
            "nf_last": res.nf[-1],
            "per_round": res.per_round,
        }
        print(json.dumps({name: out[name]}), flush=True)
    out["nf_identical"] = nf_fps["delta_tail"] == nf_fps["dense_tail"]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH", "hyperball_delta_tail.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"nf_identical": out["nf_identical"]}))
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--systolic":
        systolic_main(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--delta":
        delta_main(sys.argv[2:])
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    max_t = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from bench import build_transcript_graph
    from webgraph_spark.algos.hyperball import hyperball
    from webgraph_spark.session import get_spark

    spark = get_spark("bench_hyperball", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    edges = build_transcript_graph(spark, n_convs).persist()
    n_edges = edges.count()

    import json

    t0 = time.time()
    res = hyperball(edges, log2m=5, max_t=max_t, seed=31)
    t_packed = time.time() - t0
    print(json.dumps({"packed_sec": round(t_packed, 1)}), flush=True)

    t0 = time.time()
    try:
        iters_sparse = hyperball_sparse(edges, log2m=5, max_t=max_t, seed=31)
        t_sparse = time.time() - t0
    except Exception as exc:  # the sparse baseline can exhaust memory
        iters_sparse = -1
        t_sparse = -1.0
        print(json.dumps({"sparse_error": str(exc)[:300]}), flush=True)

    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "max_t": max_t,
                "packed_sec": round(t_packed, 1),
                "packed_iters": res.iterations,
                "sparse_sec": round(t_sparse, 1),
                "sparse_iters": iters_sparse,
                "speedup": round(t_sparse / t_packed, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
