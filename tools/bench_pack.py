"""EF pack vs CSR pack at full bench scale (round-2 verdict item #2).

The round-2 EF kernels ran one Python loop iteration per successor
list; round 3 flat-vectorized them (global-offset np.add.at scatters,
segment-cumsum decode — the same technique as csr._decode_block). This
harness records the evidence: pack_ef / pack_csr (+ unpack and the
bits-accounting aggregates) timed on the stored 31.5M-edge transcript
graph, written to BENCH/pack_timing.json. Done-criterion: EF pack
within ~2x of CSR pack.

Usage: python tools/bench_pack.py [edges_path] [num_blocks]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_edges"
    num_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_pack",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "64g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from webgraph_spark.operators.csr import (
        gamma_bits_per_link,
        pack_csr,
        unpack_csr,
    )
    from webgraph_spark.operators.ef import ef_bits_per_link, pack_ef, unpack_ef
    from webgraph_spark.operators.bitstream import (
        bv_bits_per_link,
        pack_bv,
        unpack_bv,
    )

    edges = spark.read.parquet(path).persist()
    n_edges = edges.count()
    out = {"edges_path": path, "n_edges": n_edges, "num_blocks": num_blocks}

    for name, pack, unpack, bits in (
        ("csr", pack_csr, unpack_csr, gamma_bits_per_link),
        ("ef", pack_ef, unpack_ef, ef_bits_per_link),
        ("bv", pack_bv, unpack_bv, bv_bits_per_link),
    ):
        t0 = time.time()
        blocks = pack(edges, num_blocks=num_blocks).persist()
        blocks.count()
        t_pack = time.time() - t0
        t0 = time.time()
        n_round = unpack(blocks).count()
        t_unpack = time.time() - t0
        t0 = time.time()
        acct = {
            k: v for k, v in bits(blocks).collect()[0].asDict().items()
        }
        t_bits = time.time() - t0
        import pyspark.sql.functions as F
        from pyspark.sql.types import BinaryType

        bin_cols = [
            f.name for f in blocks.schema.fields if isinstance(f.dataType, BinaryType)
        ]
        stored = blocks.agg(
            F.sum(sum(F.coalesce(F.length(c), F.lit(0)) for c in bin_cols)).alias("b")
        ).collect()[0]["b"]
        out[name] = {
            "pack_sec": round(t_pack, 1),
            "unpack_sec": round(t_unpack, 1),
            "bits_agg_sec": round(t_bits, 1),
            "roundtrip_arcs": n_round,
            "stored_bytes": int(stored),
            "bytes_per_link": round(stored / n_edges, 3),
            "bits": acct,
        }
        print(json.dumps({name: out[name]}), flush=True)
        blocks.unpersist()
        assert n_round == n_edges, (n_round, n_edges)

    out["ef_over_csr_pack"] = round(out["ef"]["pack_sec"] / out["csr"]["pack_sec"], 2)
    out["bv_over_csr_pack"] = round(out["bv"]["pack_sec"] / out["csr"]["pack_sec"], 2)
    with open(os.path.join(REPO, "BENCH", "pack_timing.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
