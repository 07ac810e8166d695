"""Native BVGraph on-disk interop at scale: store the transcript graph
(dense ids from the ingest dictionary) to the reference layout with the
driver-side writer, then measure the DISTRIBUTED byte-range reader.

Usage: python tools/bench_bvdisk.py [n_convs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    from webgraph_spark.session import get_spark
    from webgraph_spark.datagen.transcripts import TranscriptSpec, generate_transcripts
    from webgraph_spark.graph.edges import (
        build_node_dictionary,
        extract_edges,
        simple_edges,
    )
    from webgraph_spark.sources.bvdisk import (
        bvgraph_stats,
        read_bvgraph,
        write_bvgraph_from_edges,
    )

    spark = get_spark("bench_bvdisk", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spec = TranscriptSpec(seed=42, max_turns=40, n_tools=1000)
    tr = generate_transcripts(spark, n_convs=n_convs, spec=spec)
    edges = simple_edges(extract_edges(tr, build_node_dictionary(tr))).persist()
    n_edges = edges.count()

    base = tempfile.mkdtemp(prefix="bvdisk_bench_") + "/g"
    t0 = time.time()
    st = write_bvgraph_from_edges(edges, base)
    t_store = time.time() - t0

    from webgraph_spark.sources.bvdisk import write_bvgraph_distributed

    base_d = tempfile.mkdtemp(prefix="bvdisk_bench_") + "/gd"
    t0 = time.time()
    st_d = write_bvgraph_distributed(edges, base_d, num_partitions=32)
    t_store_d = time.time() - t0
    assert st_d["arcs"] == n_edges

    t0 = time.time()
    n_back = read_bvgraph(spark, base, num_partitions=32).count()
    t_load = time.time() - t0
    assert n_back == n_edges, (n_back, n_edges)

    # second read: offsets now served from the .obl.npy cache
    t0 = time.time()
    read_bvgraph(spark, base, num_partitions=32).count()
    t_load2 = time.time() - t0

    out = {
        "n_convs": n_convs,
        "n_nodes": st["nodes"],
        "n_edges": n_edges,
        "bits_per_link": st["bitsperlink"],
        "store_sec_driver": round(t_store, 1),
        "store_edges_per_sec": round(n_edges / t_store, 1),
        "store_sec_distributed": round(t_store_d, 1),
        "store_dist_edges_per_sec": round(n_edges / t_store_d, 1),
        "bits_per_link_distributed": st_d["bitsperlink"],
        "load_sec_distributed": round(t_load, 1),
        "load_edges_per_sec": round(n_edges / t_load, 1),
        "load2_sec_obl_cached": round(t_load2, 1),
        "stats": bvgraph_stats(base),
    }
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()
