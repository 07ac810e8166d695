"""Generate the large scaling-bench edge table once to disk.

The north rule's scaling criterion is measured on the transcript-derived
link graph; this materializes it at ~100M edges (n_convs=3.2M, same
TranscriptSpec as bench.py) so every scaling run reads identical bytes.

Usage: python tools/gen_scaling_edges.py [n_convs] [out_path]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_edges_100m"
    from webgraph_spark.session import get_spark

    # 64g driver heap (local mode: driver == executor) and no auto-broadcast:
    # at 3.2M convs the node-dictionary join side is ~1 GB serialized and a
    # broadcast hash table of it OOMs the default 8g heap
    spark = get_spark(
        "gen_scaling_edges",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "64g",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import build_transcript_graph

    t0 = time.time()
    edges = build_transcript_graph(spark, n_convs)
    edges.repartition(64).write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print({"n_convs": n_convs, "n_edges": n, "path": out, "sec": round(time.time() - t0, 1)})
    spark.stop()


if __name__ == "__main__":
    main()
