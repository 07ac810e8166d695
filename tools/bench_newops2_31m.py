"""Scale evidence for the round-3 session-7 operators on the 31.5M-edge
transcript link graph (n_convs=1M, same generator as bench.py):
speculative greedy coloring, 1-WL refinement, and node2vec walks from
100k sources. Writes one JSON with wall times, round counts, and
output invariants (monochromatic-edge count must be 0, WL label count,
walk-step validity by construction).

Usage: python tools/bench_newops2_31m.py [n_convs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/newops2_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops2",
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

    from webgraph_spark.algos.coloring import speculative_coloring
    from webgraph_spark.operators.transforms import no_loops, symmetrize

    t0 = time.time()
    r = speculative_coloring(edges, num_partitions=64)
    colors = r.colors.persist()
    n_colored = colors.count()
    sec = round(time.time() - t0, 1)
    sym = no_loops(symmetrize(edges.select("src", "dst")))
    mono = (
        sym.join(colors.select(F.col("node").alias("src"),
                               F.col("color").alias("ca")), "src")
        .join(colors.select(F.col("node").alias("dst"),
                            F.col("color").alias("cb")), "dst")
        .where(F.col("ca") == F.col("cb"))
        .count()
    )
    res["coloring"] = {
        "sec": sec, "rounds": r.rounds, "converged": r.converged,
        "nodes": n_colored,
        "n_colors": colors.select("color").distinct().count(),
        "monochromatic_edges": mono,
    }
    colors.unpersist()
    print("coloring", res["coloring"], flush=True)

    from webgraph_spark.algos.features import wl_refinement

    t0 = time.time()
    lab = wl_refinement(edges, iters=3, num_partitions=64)
    n_lab = lab.count()
    res["wl"] = {
        "sec": round(time.time() - t0, 1), "iters": 3, "nodes": n_lab,
        "classes": lab.select("wl").distinct().count(),
    }
    print("wl", res["wl"], flush=True)

    from webgraph_spark.algos.walks import node2vec_walks

    t0 = time.time()
    srcs = (
        edges.select(F.col("src").alias("node")).distinct()
        .where(F.col("node") % 64 == 0)
    )
    # hub_cap is load-bearing: without it, walks parked on the Zipf
    # tool hubs (outdeg up to ~10^6) expand to hub-degree candidate
    # rows each step — measured to fill the shuffle disk at this scale
    w = node2vec_walks(edges.select("src", "dst"), srcs, length=4,
                       n_walks=1, p=2.0, q=0.5, hub_cap=1024)
    n_rows = w.count()
    res["node2vec"] = {
        "sec": round(time.time() - t0, 1), "hub_cap": 1024,
        "sources": srcs.count(), "walk_rows": n_rows, "length": 4,
    }
    print("node2vec", res["node2vec"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
