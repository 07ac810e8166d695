"""Streaming distributed BVGraph store+load at the tier-scale fixture.

Reproduces BENCH/bvdisk_stream_31m.json: the full native pipeline
(write_bvgraph_distributed with the streaming ordered drain, then the
distributed byte-range reader) over the regenerated 31.5M-edge
transcript graph. Usage:

    python tools/gen_scaling_edges.py 1000000 /dev/shm/scaling_edges_31m
    python tools/bench_bvdisk_stream.py [edges_path] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/scaling_edges_31m"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    from webgraph_spark.session import get_spark
    from webgraph_spark.sources.bvdisk import (
        bvgraph_stats,
        read_bvgraph,
        write_bvgraph_distributed,
    )

    spark = get_spark(
        "bvdisk_stream_bench", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(path).select("src", "dst").persist()
    n_edges = e.count()
    base = tempfile.mkdtemp(prefix="bvstream_") + "/g"
    t0 = time.time()
    st = write_bvgraph_distributed(e, base, num_partitions=64)
    t_store = time.time() - t0
    t0 = time.time()
    n_back = read_bvgraph(spark, base, num_partitions=64).count()
    t_load = time.time() - t0
    out = {
        "n_edges": n_edges, "n_back": n_back,
        "store_sec": round(t_store, 1),
        "store_eps": int(n_edges / t_store),
        "load_sec": round(t_load, 1),
        "load_eps": int(n_back / t_load),
        "bits_per_link": st["bitsperlink"],
        "stats": bvgraph_stats(base),
    }
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
