"""Scale evidence for the round-3 session-9 operators on the
31.5M-edge transcript link graph: parity-gated Louvain modularity
moves (2 + 4 rounds, with the modularity score of the result) and
truncated random-walk hitting times to the tool-hub target set
(integer value iteration, 4 rounds).

Usage: python tools/bench_newops5_31m.py [n_convs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/newops5_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops5",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from bench import build_transcript_graph

    t0 = time.time()
    edges = build_transcript_graph(spark, n_convs).persist()
    n_edges = edges.count()
    res: dict = {"n_convs": n_convs, "n_edges": n_edges,
                 "ingest_sec": round(time.time() - t0, 1)}

    # ---- Louvain moves (2 rounds, then 4) + modularity of the result
    from webgraph_spark.algos.louvain import louvain_moves
    from webgraph_spark.algos.labelprop import modularity

    for rounds in (2, 4):
        t0 = time.time()
        lv = louvain_moves(edges, rounds=rounds, num_partitions=64)
        labels = lv.labels.persist()
        n_comm = labels.select("label").distinct().count()
        t_moves = time.time() - t0
        t0 = time.time()
        q = modularity(edges, labels).collect()[0]
        res[f"louvain_r{rounds}"] = {
            "sec": round(t_moves, 1),
            "modularity_sec": round(time.time() - t0, 1),
            "rounds_run": lv.rounds,
            "n_communities": n_comm,
            "modularity": q.modularity,
        }
        labels.unpersist()
        print("louvain", rounds, res[f"louvain_r{rounds}"], flush=True)

    # ---- hitting time to the top-1000 in-degree hubs (tool nodes)
    from webgraph_spark.algos.paths import hitting_time

    hubs = (
        edges.groupBy("dst").agg(F.count("*").alias("d"))
        .orderBy(F.col("d").desc(), F.col("dst").asc())
        .limit(1000)
        .select(F.col("dst").alias("node"))
    )
    t0 = time.time()
    ht = hitting_time(edges, hubs, iters=4, num_partitions=64)
    stats = ht.agg(
        F.count("*").alias("n"),
        F.round(F.avg("hit"), 4).alias("mean_hit"),
        F.round(F.max("hit"), 4).alias("max_hit"),
        F.sum(F.when(F.col("hit") == 0.0, 1).otherwise(0)).alias("n_absorbed"),
    ).collect()[0]
    res["hitting_i4"] = {
        "sec": round(time.time() - t0, 1),
        "n_nodes": stats.n,
        "mean_hit": float(stats.mean_hit),
        "max_hit": float(stats.max_hit),
        "n_targets_at_zero": int(stats.n_absorbed),
    }
    print("hitting", res["hitting_i4"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
