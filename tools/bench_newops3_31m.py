"""Scale evidence for the round-3 session-8 operators on the 31.5M-edge
transcript link graph (n_convs=1M, same generator as bench.py):
landmark distance sketches (16 landmarks, depth 6) + pairwise
estimation over 1M sampled pairs, and the rich-club curve. Plus DSIR
importance weighting over a synthetic 1M-doc corpus (deterministic
word soup, two source distributions) — the token stream is the scale
driver there, not the doc count.

Writes one JSON with wall times and output invariants (sketch coverage
fraction, estimate null rate, rich-club monotonicity of n_rich, DSIR
target-mean > source-mean separation).

Usage: python tools/bench_newops3_31m.py [n_convs] [n_docs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH/newops3_31m.json"
    from webgraph_spark.session import get_spark

    spark = get_spark(
        "bench_newops3",
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

    # ---- landmark sketch: 16 landmarks, depth 6
    from webgraph_spark.algos.landmarks import (
        estimate_distances,
        landmark_sketch,
    )

    t0 = time.time()
    sk = landmark_sketch(
        edges, n_landmarks=16, max_depth=6, num_partitions=64
    ).persist()
    n_nodes = sk.count()
    sk_sec = round(time.time() - t0, 1)
    covered = sk.where(
        F.greatest(*[F.col(f"d{i}") for i in range(16)]).isNotNull()
    ).count()
    res["landmark_sketch"] = {
        "sec": sk_sec,
        "n_nodes": n_nodes,
        "coverage_frac": round(covered / n_nodes, 4),
    }

    # ---- pairwise estimation over 1M deterministic pairs
    npairs = 1_000_000
    pairs = (
        spark.range(0, npairs, 1, 64)
        .select(
            (F.col("id") * 2654435761 % n_nodes).alias("u"),
            (F.col("id") * 40503 % n_nodes).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )
    t0 = time.time()
    est = estimate_distances(sk, pairs).persist()
    n_est = est.count()
    est_sec = round(time.time() - t0, 1)
    n_null = est.where(F.col("d_hat").isNull()).count()
    res["landmark_estimate_1m_pairs"] = {
        "sec": est_sec,
        "n_pairs": n_est,
        "null_frac": round(n_null / max(n_est, 1), 4),
    }
    est.unpersist()
    sk.unpersist()

    # ---- rich-club curve
    from webgraph_spark.algos.features import rich_club

    t0 = time.time()
    rc = rich_club(edges).collect()
    rc_sec = round(time.time() - t0, 1)
    ks = sorted(r["k"] for r in rc)
    by_k = {r["k"]: r for r in rc}
    mono = all(
        by_k[ks[i]]["n_rich"] >= by_k[ks[i + 1]]["n_rich"]
        for i in range(len(ks) - 1)
    )
    res["rich_club"] = {
        "sec": rc_sec,
        "n_thresholds": len(rc),
        "n_rich_monotone": mono,
        "max_k": ks[-1],
    }
    edges.unpersist()

    # ---- DSIR over a synthetic 1M-doc corpus (~60 tokens/doc)
    from webgraph_spark.functions.curation import dsir_log_weights

    vocab_a = [f"alpha{i}" for i in range(40)]
    vocab_b = [f"beta{i}" for i in range(40)]

    def wordcol(vocab, salt):
        # deterministic per-(doc, position) word choice from the vocab
        return F.concat_ws(
            " ",
            *[
                F.element_at(
                    F.array(*[F.lit(w) for w in vocab]),
                    ((F.xxhash64(F.col("id"), F.lit(salt + j)) % 40 + 40)
                     % 40 + 1).cast("int"),
                )
                for j in range(60)
            ],
        )

    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10 == 0).alias("is_tgt"),
        F.when(F.col("id") % 10 == 0, wordcol(vocab_a, 1))
        .otherwise(wordcol(vocab_b, 2))
        .alias("text"),
    )
    t0 = time.time()
    w = dsir_log_weights(
        docs, "doc_id", "text", F.col("is_tgt"), ngram=2, n_buckets=4096
    ).persist()
    n_w = w.count()
    dsir_sec = round(time.time() - t0, 1)
    means = (
        w.join(docs.select("doc_id", "is_tgt"),
               w["id"] == F.col("doc_id"))
        .groupBy("is_tgt")
        .agg(F.avg("logw").alias("m"))
        .collect()
    )
    mm = {r["is_tgt"]: r["m"] for r in means}
    res["dsir_1m_docs"] = {
        "sec": dsir_sec,
        "n_docs": n_w,
        "mean_logw_target": round(mm[True], 2),
        "mean_logw_source": round(mm[False], 2),
        "separated": mm[True] > mm[False],
    }
    w.unpersist()

    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
