"""Scale evidence for the round-3 session-11 statistics on the
31.5M-edge transcript link graph:

- corrected reciprocity rho (arc self-join for mutual arcs + three
  scalar aggregates);
- in/out degree correlation (two degree aggregations + one 6-term
  moment aggregate);
- hub dominance (distributed dense-rank on (-degree, node) via
  assign_dense_ids + two semi-joins);
- PageRank localization (5 fixed iterations + integer-scaled
  IPR/Gini over the distributed rank).

Usage: python tools/bench_newops7_31m.py [n_convs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/newops7_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops7",
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
    from webgraph_spark.util.ids import assign_dense_ids

    edges = build_transcript_graph(spark, n_convs).persist()
    m = edges.count()
    res: dict = {"n_convs": n_convs, "n_arcs": m}

    # ---- corrected reciprocity (the transcript graph is a near-DAG:
    # rho measures how far from density-expected the mutual arcs are)
    t0 = time.time()
    e = edges.where(F.col("src") != F.col("dst")).distinct()
    m = e.count()  # denominators over the deduped loop-free arc set
    n_nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    mut = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
    ).count()
    a = m / (n_nodes * (n_nodes - 1))
    r = mut / m
    res["reciprocity_rho"] = {
        "sec": round(time.time() - t0, 1),
        "mutual": mut,
        "rho": round((r - a) / (1 - a), 9),
    }
    print("rho", res["reciprocity_rho"], flush=True)

    # ---- in/out degree correlation
    t0 = time.time()
    dout = e.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("o"))
    din = e.groupBy(F.col("dst").alias("v")).agg(F.count("*").alias("i"))
    d = dout.join(din, "v", "full_outer").select(
        F.coalesce("o", F.lit(0)).alias("o"),
        F.coalesce("i", F.lit(0)).alias("i"),
    )
    mo = d.agg(
        F.count("*").alias("n"),
        F.sum("o").alias("so"), F.sum("i").alias("si"),
        F.sum(F.col("o") * F.col("o")).alias("soo"),
        F.sum(F.col("i") * F.col("i")).alias("sii"),
        F.sum(F.col("o") * F.col("i")).alias("soi"),
    ).collect()[0]
    cov = mo["n"] * mo["soi"] - mo["so"] * mo["si"]
    den = (
        (mo["n"] * mo["soo"] - mo["so"] ** 2)
        * (mo["n"] * mo["sii"] - mo["si"] ** 2)
    ) ** 0.5
    res["inout_degree_corr"] = {
        "sec": round(time.time() - t0, 1),
        "corr": round(cov / den, 6),
    }
    print("corr", res["inout_degree_corr"], flush=True)

    # ---- hub dominance (top 1% by degree)
    t0 = time.time()
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    k = -(-n_nodes // 100)
    ranked = assign_dense_ids(
        deg.withColumn("negd", -F.col("d")), ["negd", "v"], id_col="rk0"
    )
    top = ranked.where(F.col("rk0") < k).select("v")
    hub_arcs = (
        e.join(top.withColumnRenamed("v", "src"), "src", "left_semi")
        .unionByName(
            e.join(top.withColumnRenamed("v", "dst"), "dst", "left_semi")
        )
        .distinct()
        .count()
    )
    res["hub_dominance"] = {
        "sec": round(time.time() - t0, 1),
        "k_top": k,
        "hub_share": round(hub_arcs / m, 6),
    }
    print("hub", res["hub_dominance"], flush=True)

    # ---- PageRank localization (5 iters + distributed Gini rank)
    from webgraph_spark.algos.pagerank import pagerank

    t0 = time.time()
    ranks = pagerank(e, fixed_iterations=5).ranks
    v = F.round(F.col("rank") * F.lit(1e9), 0).cast("long").alias("v")
    o = assign_dense_ids(
        ranks.select("node", v), ["v", "node"], id_col="i0"
    ).select("v", (F.col("i0") + 1).alias("i"))
    agg = o.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("i") * F.col("v")).alias("siv"),
    ).collect()[0]
    n, s1, s2, siv = agg["n"], agg["s1"], agg["s2"], agg["siv"]
    res["pagerank_localization"] = {
        "sec": round(time.time() - t0, 1),
        "ipr": round(s2 / (s1 * s1), 9),
        "effective_nodes": round(s1 * s1 / s2, 1),
        "gini": round(2.0 * siv / (n * s1) - (n + 1.0) / n, 6),
    }
    print("localization", res["pagerank_localization"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
