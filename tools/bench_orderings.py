"""Compression-ordering comparison: bits/link under the γ-gap and full
BV (copy-block/interval/ζ₃) entropy models for each node ordering.

This is the table a webgraph user consults before packing: which
permutation to run ahead of BVGraph.store. Orderings compared: natural,
random (floor), degree, Gray, lexicographic, LLP (the published winner
for social graphs — Boldi et al. WWW 2011).

Bits/link is a deterministic property of the (graph, ordering) pair —
host weather cannot move it — so wall-clock contention does not affect
the reported numbers (pack timings are NOT reported here; see
BENCH/pack_timing.json for those).

Usage: python tools/bench_orderings.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from webgraph_spark.session import get_spark
from webgraph_spark.graph.testdata import tpch_edges
from webgraph_spark.operators.csr import pack_csr, gamma_bits_per_link
from webgraph_spark.operators.bvcomp import bv_bits_per_link
from webgraph_spark.operators.transforms import (
    degree_ordered_permutation,
    gray_code_permutation,
    lexicographical_permutation,
    random_permutation,
)
from webgraph_spark.algos.llp import llp_permutation


def measure(edges, spark):
    blocks = pack_csr(edges, num_blocks=32)
    g = gamma_bits_per_link(blocks).collect()[0]
    b = bv_bits_per_link(blocks).collect()[0]
    return {
        "gamma_bits_per_link": round(g["bits_per_link"], 4),
        "bv_bits_per_link": round(b["bits_per_link"], 4),
        "n_arcs": int(g["n_arcs"]),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "ordering_bits.json",
    )
    spark = get_spark("bench-orderings", master="local[8]", shuffle_partitions=32)
    edges = tpch_edges(spark, sf_dir).persist()
    edges.count()

    orderings = {
        "natural": lambda e: e,
        "random": lambda e: random_permutation(e, seed=42)[0],
        "degree": lambda e: degree_ordered_permutation(e)[0],
        "gray": lambda e: gray_code_permutation(e)[0],
        "lex": lambda e: lexicographical_permutation(e)[0],
        "llp": lambda e: llp_permutation(e, gammas=(0.0, 0.5), rounds=3)[0],
        "llp4": lambda e: llp_permutation(
            e, gammas=(0.0, 1.0, 0.5, 0.25), rounds=4
        )[0],
    }
    results = {}
    for name, fn in orderings.items():
        t0 = time.time()
        results[name] = measure(fn(edges), spark)
        results[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, json.dumps(results[name]), flush=True)

    out = {"sf_dir": sf_dir, "orderings": results}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
