"""Scale evidence for the session-10 triad census and directed
assortativity on a bounded-degree deterministic k-out digraph
(n nodes, k md5-derived out-arcs each — Poisson-bounded in-degrees,
so the census's Sigma d^2 wedge bound stays linear-ish; the harness
for the regime the census is MEANT for, per BENCH/BASELINE.md §20's
hub caveat).

Usage: python tools/bench_triads_30m.py [n_nodes] [k] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH/triads_30m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_triads",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    base = spark.range(0, n, 1, 64)
    edges = base.select(
        F.col("id").alias("src"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda j: F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("ko:"),
                                F.col("id").cast("string"),
                                F.lit(":"),
                                j.cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % n,
            )
        ).alias("dst"),
    ).where(F.col("src") != F.col("dst")).persist()
    m = edges.count()
    res: dict = {"n_nodes": n, "k_out": k, "n_arcs": m}

    from webgraph_spark.algos.motifs import triad_census

    t0 = time.time()
    census = {r.triad_class: r.n_triads for r in triad_census(edges).collect()}
    res["triad_census"] = {
        "sec": round(time.time() - t0, 1),
        "connected_triads": sum(
            v for c, v in census.items() if c not in ("003", "012", "102")
        ),
        "cycles_030C": census["030C"],
        "transitive_030T": census["030T"],
    }
    print("triads", res["triad_census"], flush=True)

    # directed assortativity: the four-flavor single-pass aggregate
    t0 = time.time()
    arcs = edges.distinct()
    dout = arcs.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("dout"))
    din = arcs.groupBy(F.col("dst").alias("v")).agg(F.count("*").alias("din"))
    degs = dout.join(din, "v", "full_outer").select(
        "v",
        F.coalesce("dout", F.lit(0)).alias("dout"),
        F.coalesce("din", F.lit(0)).alias("din"),
    )
    j = (
        arcs.join(
            degs.select(F.col("v").alias("src"), F.col("dout").alias("so"),
                        F.col("din").alias("si")), "src")
        .join(
            degs.select(F.col("v").alias("dst"), F.col("dout").alias("to"),
                        F.col("din").alias("ti")), "dst")
    )
    mo = j.agg(
        F.count("*").alias("m"),
        F.sum("so").alias("s_o"), F.sum(F.col("so") * F.col("so")).alias("s2_o"),
        F.sum("ti").alias("t_i"), F.sum(F.col("ti") * F.col("ti")).alias("t2_i"),
        F.sum(F.col("so") * F.col("ti")).alias("p_oi"),
    ).collect()[0]
    cov = mo["m"] * mo["p_oi"] - mo["s_o"] * mo["t_i"]
    vx = mo["m"] * mo["s2_o"] - mo["s_o"] ** 2
    vy = mo["m"] * mo["t2_i"] - mo["t_i"] ** 2
    r_oi = cov / (vx * vy) ** 0.5 if vx > 0 and vy > 0 else None
    res["assortativity_dir"] = {
        "sec": round(time.time() - t0, 1),
        "r_out_in": round(r_oi, 6) if r_oi is not None else None,
    }
    print("assortativity", res["assortativity_dir"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
