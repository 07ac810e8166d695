"""Scale evidence for the round-3 graph operators on the 31.5M-edge
transcript link graph (n_convs=1M, same generator as bench.py).

Runs Borůvka MSF, Luby MIS, handshake maximal matching, and the densest
-subgraph peel once each at local[32] and writes one JSON with wall
times, round counts, and output sizes — the posture check that the
fixed-point loops built on component-sized state actually drain on a
graph 100× the driver fixture.

Usage: python tools/bench_newops_31m.py [n_convs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/newops_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops",
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

    from webgraph_spark.algos.mis import luby_mis

    t0 = time.time()
    r = luby_mis(edges)
    res["mis"] = {"sec": round(time.time() - t0, 1), "rounds": r.rounds,
                  "size": r.selected.count(), "converged": r.converged}
    print("mis", res["mis"], flush=True)

    from webgraph_spark.algos.matching import maximal_matching

    t0 = time.time()
    r = maximal_matching(edges)
    res["matching"] = {"sec": round(time.time() - t0, 1), "rounds": r.rounds,
                       "matched": r.matching.count(), "converged": r.converged}
    print("matching", res["matching"], flush=True)

    from webgraph_spark.algos.densest import densest_subgraph

    t0 = time.time()
    r = densest_subgraph(edges)
    res["densest"] = {"sec": round(time.time() - t0, 1), "rounds": r.rounds,
                      "best_round": r.best_round, "n": r.n_nodes,
                      "m": r.m_edges, "density": round(r.density, 4)}
    print("densest", res["densest"], flush=True)

    from webgraph_spark.algos.msf import boruvka_msf

    we = edges.groupBy("src", "dst").agg(F.count("*").alias("label"))
    t0 = time.time()
    r = boruvka_msf(we, "label")
    res["msf"] = {"sec": round(time.time() - t0, 1), "rounds": r.rounds,
                  "forest_edges": r.forest.count(), "converged": r.converged}
    print("msf", res["msf"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("WROTE", out, flush=True)


if __name__ == "__main__":
    main()
