"""Scale evidence for the round-3 session-8 graph operators on the
31.5M-edge transcript link graph: Broder bowtie decomposition (pivot =
max-degree node), attack-tolerance fragmentation curve, and Fiedler
spectral bisection (8 deflated power rounds). Plus the event-funnel
over 20M synthetic timestamped events.

Usage: python tools/bench_newops4_31m.py [n_convs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/newops4_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops4",
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

    # ---- bowtie from the max-sym-degree pivot
    from webgraph_spark.algos.bowtie import bowtie
    from webgraph_spark.operators.transforms import simplify

    pivot = (
        simplify(edges)
        .groupBy("src").agg(F.count("*").alias("d"))
        .orderBy(F.col("d").desc(), F.col("src").asc())
        .first()["src"]
    )
    t0 = time.time()
    bt = bowtie(edges, pivot=int(pivot), max_rounds=64, num_partitions=64)
    counts = {r["component"]: r["n_nodes"] for r in bt.counts.collect()}
    res["bowtie"] = {
        "sec": round(time.time() - t0, 1),
        "rounds": list(bt.rounds),
        "counts": counts,
    }

    # ---- attack tolerance, k in {0, 100, 10000}
    from webgraph_spark.algos.components import attack_tolerance

    t0 = time.time()
    at = {
        r["k"]: (r["n_nodes"], r["largest_cc"], r["n_components"])
        for r in attack_tolerance(
            edges, ks=[0, 100, 10000], num_partitions=64
        ).collect()
    }
    res["attack_tolerance"] = {
        "sec": round(time.time() - t0, 1),
        "curve": {str(k): v for k, v in sorted(at.items())},
    }

    # ---- Fiedler bisection, 8 rounds
    from webgraph_spark.algos.spectral import fiedler_bisection

    t0 = time.time()
    fv = fiedler_bisection(edges, iters=8, num_partitions=64).persist()
    n_scored = fv.count()
    sides = fv.agg(
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("score") < 0, 1).otherwise(0)).alias("neg"),
    ).first()
    res["fiedler8"] = {
        "sec": round(time.time() - t0, 1),
        "n_nodes": n_scored,
        "pos": int(sides["pos"]),
        "neg": int(sides["neg"]),
    }
    fv.unpersist()
    edges.unpersist()

    # ---- funnel over synthetic events (3 steps), 20 events/conv
    from webgraph_spark.functions.mining import funnel_counts

    n_ev = 20 * n_convs
    ev = spark.range(0, n_ev, 1, 64).select(
        (F.col("id") % max(n_ev // 10, 1)).alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.col("id") * 1000
            + F.xxhash64("id") % 997
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"),
                    F.lit("other")),
            ((F.xxhash64(F.col("id"), F.lit(3)) % 4 + 4) % 4 + 1)
            .cast("int"),
        ).alias("event_type"),
    )
    t0 = time.time()
    fr = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    res["funnel_20m_events"] = {
        "sec": round(time.time() - t0, 1),
        "n_events": n_ev,
        "step_users": {str(k): int(v) for k, v in sorted(fr.items())},
    }

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
