"""Scale evidence for the Fagiolo directed triangle-role profile and
clustering coefficients on the same bounded-degree deterministic k-out
digraph as tools/bench_triads_30m.py (n nodes, k md5-derived out-arcs
each — Poisson-bounded in-degrees, the regime the support-triangle
join is meant for; see BENCH/BASELINE.md §20's hub caveat).

Usage: python tools/bench_dir_profile_30m.py [n_nodes] [k] [out_json]
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
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH/dir_profile_30m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_dir_profile",
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

    from webgraph_spark.algos.motifs import (
        directed_clustering,
        directed_triangle_profile,
    )

    t0 = time.time()
    prof = directed_triangle_profile(edges)
    tot = prof.agg(
        F.count("*").alias("nodes"),
        F.sum("t_cyc").alias("cyc"),
        F.sum("t_mid").alias("mid"),
        F.sum("t_in").alias("tin"),
        F.sum("t_out").alias("tout"),
    ).collect()[0]
    res["profile"] = {
        "sec": round(time.time() - t0, 1),
        "nodes": tot["nodes"],
        "sum_t_cyc": tot["cyc"],
        "sum_t_mid": tot["mid"],
        "sum_t_in": tot["tin"],
        "sum_t_out": tot["tout"],
    }
    # invariants: transitive triples hit mid/in/out once each; cycles 3x
    assert tot["mid"] == tot["tin"] == tot["tout"], res
    assert tot["cyc"] % 3 == 0, res
    print("profile", res["profile"], flush=True)

    t0 = time.time()
    dc = directed_clustering(edges)
    crow = dc.agg(
        F.avg("c_cyc").alias("mean_c_cyc"),
        F.avg("c_mid").alias("mean_c_mid"),
        F.avg("c_in").alias("mean_c_in"),
        F.avg("c_out").alias("mean_c_out"),
    ).collect()[0]
    res["clustering"] = {
        "sec": round(time.time() - t0, 1),
        **{f: round(crow[f], 9) for f in crow.asDict()},
    }
    print("clustering", res["clustering"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
