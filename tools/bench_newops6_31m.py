"""Scale evidence for the round-3 session-10 operators on the
31.5M-edge transcript link graph and a deterministic synthetic
embedding corpus:

- C(k) degree-dependent clustering rollup (triangles_per_node +
  integer-exact per-degree aggregation);
- random-failure robustness curve (md5 node coin at 0/200/500
  permille, one star-CC run per level);
- per-conversation inter-turn burstiness (window lag + one groupBy);
- Zipf slope of the turn-text token head (token groupBy + top-200
  regression moments);
- PCA top component over synthetic md5-derived embeddings (the
  n*d^2 Gram plan — the documented scale-watch item).

Usage: python tools/bench_newops6_31m.py [n_convs] [n_vecs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH/newops6_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops6",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import Window, functions as F

    from bench import build_transcript_graph
    from webgraph_spark.datagen.transcripts import (
        TranscriptSpec,
        generate_transcripts,
    )

    res: dict = {"n_convs": n_convs, "n_vecs": n_vecs}

    t0 = time.time()
    edges = build_transcript_graph(spark, n_convs).persist()
    n_edges = edges.count()
    res["n_edges"] = n_edges
    res["ingest_sec"] = round(time.time() - t0, 1)
    print("ingest", res["ingest_sec"], "s,", n_edges, "edges", flush=True)

    # ---- C(k) curve: triangles_per_node + integer-exact degree rollup
    from webgraph_spark.algos.triangles import triangles_per_node
    from webgraph_spark.operators.transforms import simplify

    t0 = time.time()
    tri = triangles_per_node(edges)
    deg = (
        simplify(edges).groupBy("src").agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )
    per_node = deg.join(tri, "node", "left").select(
        "deg", F.coalesce("triangles", F.lit(0)).cast("long").alias("t")
    )
    ck = per_node.groupBy("deg").agg(
        F.count("*").alias("n_nodes"), F.sum("t").alias("st")
    )
    n_deg_classes = ck.count()
    res["ck_curve"] = {
        "sec": round(time.time() - t0, 1),
        "n_degree_classes": n_deg_classes,
    }
    print("ck_curve", res["ck_curve"], flush=True)

    # ---- random-failure curve: 3 star-CC runs behind a hash predicate
    from webgraph_spark.algos.components import random_failure_tolerance

    t0 = time.time()
    rf = random_failure_tolerance(
        edges, permilles=[0, 200, 500], max_iter=40, num_partitions=64
    ).collect()
    res["random_failure"] = {
        "sec": round(time.time() - t0, 1),
        "curve": [
            {
                "permille": r["permille"],
                "n_nodes": r["n_nodes"],
                "largest_cc": r["largest_cc"],
                "n_components": r["n_components"],
            }
            for r in rf
        ],
    }
    print("random_failure", res["random_failure"]["sec"], "s", flush=True)
    edges.unpersist()

    # ---- transcripts-based payload rollups
    spec = TranscriptSpec(seed=42, max_turns=40, n_tools=1000)
    tr = generate_transcripts(spark, n_convs=n_convs, spec=spec).persist()
    n_turns = tr.count()
    res["n_turns"] = n_turns

    t0 = time.time()
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = tr.select(
        "conv_id",
        F.timestamp_diff(
            "MICROSECOND", F.lag("ts").over(w), F.col("ts")
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    dec = F.col("g").cast("decimal(38,0)")
    st = gaps.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.sum("g").alias("s1"),
        F.sum(dec * dec).alias("s2"),
    ).filter(F.col("n") >= 3)
    n_burst = st.count()
    res["burstiness"] = {
        "sec": round(time.time() - t0, 1),
        "n_conversations": n_burst,
        "turns_per_sec": round(n_turns / (time.time() - t0)),
    }
    print("burstiness", res["burstiness"], flush=True)

    t0 = time.time()
    toks = tr.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(200)
    n_top = top.count()
    res["zipf_head"] = {
        "sec": round(time.time() - t0, 1),
        "n_ranked": n_top,
        "tokens_per_sec": round(n_turns / (time.time() - t0)),
    }
    print("zipf_head", res["zipf_head"], flush=True)
    tr.unpersist()

    # ---- PCA top component on synthetic deterministic embeddings
    from webgraph_spark.functions.similarity import pca_top

    dim = 64
    base = spark.range(0, n_vecs, 1, 64)
    emb = base.select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("e:"),
                                    F.col("id").cast("string"),
                                    F.lit(":"),
                                    d.cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2000
                    - 1000
                ).cast("float")
                / 1000.0
            ),
        ).alias("embedding"),
    )
    t0 = time.time()
    pc = pca_top(emb).collect()
    res["pca_top"] = {
        "sec": round(time.time() - t0, 1),
        "explained_ratio": pc[0]["explained_ratio"],
        "gram_rows": n_vecs * dim * dim,
    }
    print("pca_top", res["pca_top"], flush=True)

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
