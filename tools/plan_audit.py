"""Physical-plan audit: captures ``explain('formatted')`` for the
headline operators and writes BENCH/PLANS.md with commentary on the
properties that matter at 100 TB — scan pruning (ReadSchema /
PushedFilters), shuffle count, join strategy, and WholeStageCodegen
span coverage. Re-run after any plan-affecting change:

    python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> str:
    """One-line counters the reader can check against the prose."""
    shuffles = len(re.findall(r"\bExchange\b", plan))
    codegen = len(
        set(re.findall(r"\[codegen id : (\d+)\]", plan))
        or re.findall(r"WholeStageCodegen", plan)
    )
    bjoins = len(re.findall(r"BroadcastHashJoin", plan))
    shjoins = len(re.findall(r"ShuffledHashJoin", plan))
    smjoins = len(re.findall(r"SortMergeJoin", plan))
    scans = re.findall(r"ReadSchema: (.*)", plan)
    pushed = re.findall(r"PushedFilters: (.*)", plan)
    lines = [
        f"exchanges={shuffles} codegen_spans={codegen} "
        f"broadcast_joins={bjoins} shuffled_hash_joins={shjoins} "
        f"sort_merge_joins={smjoins}"
    ]
    for s in scans[:4]:
        lines.append(f"scan: {s.strip()[:100]}")
    for p in pushed[:4]:
        if p.strip() != "[]":
            lines.append(f"pushed: {p.strip()[:100]}")
    return "\n".join(lines)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/PLANS.md"

    from pyspark.sql import functions as F

    from webgraph_spark.session import get_spark

    spark = get_spark(
        "plan_audit", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    sections = []

    def add(title, df, commentary):
        plan = formatted_plan(df)
        sections.append(
            f"## {title}\n\n{commentary}\n\n"
            f"```\n{summarize(plan)}\n```\n\n"
            f"<details><summary>formatted plan</summary>\n\n"
            f"```\n{plan.strip()}\n```\n\n</details>\n"
        )

    # 1. parquet scan pruning: 2-column projection + filter over documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pruned = docs.where(F.col("lang") == "en").select(
        "doc_id", F.length("text").alias("len")
    )
    add(
        "Scan pruning: filtered 2-column projection on documents",
        pruned,
        "The scan must read ONLY doc_id/text (ReadSchema) and push the "
        "lang filter into the parquet reader (PushedFilters) — at 100 TB "
        "this is the difference between scanning the corpus and scanning "
        "two columns of the matching row groups.",
    )

    # 2. ingest: transcripts -> edges (dictionary joins)
    from webgraph_spark.datagen.transcripts import generate_transcripts
    from webgraph_spark.graph.edges import (
        build_node_dictionary,
        extract_edges,
    )

    tr = generate_transcripts(spark, n_convs=200)
    edges_df = extract_edges(tr, build_node_dictionary(tr))
    add(
        "Ingest: transcripts -> node dictionary -> arcs",
        edges_df,
        "Turn-sequence arcs come from one co-partitioned self-join on "
        "(conv_id, turn_idx); the tool dictionary is tiny and must enter "
        "as a broadcast join (no shuffle of the big turn table for "
        "tool-reference arcs).",
    )

    # 3. one PageRank iteration body (the steady-state shuffle shape):
    # edges come from storage (parquet scan, as at scale) and the
    # loop's conf pins (AQE off, auto-broadcast off) are active —
    # exactly how plans/iterate.py runs the recurrence.
    import tempfile

    from webgraph_spark.algos.pagerank import _prepare
    from webgraph_spark.plans.iterate import iteration_confs

    tmp = tempfile.mkdtemp()
    edges_df.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).distinct().write.parquet(f"{tmp}/edges")
    e = spark.read.parquet(f"{tmp}/edges")
    with iteration_confs(spark):
        ew, nodes, P = _prepare(e, 8)
        ranks = nodes.select(
            "node", F.lit(1.0).alias("rank")
        ).repartition(P, "node")
        # the hint below mirrors pagerank.py:335-340
        contrib = (
            ew.join(
                ranks.select(
                    F.col("node").alias("src"), "rank"
                ).hint("shuffle_hash"),
                "src",
            )
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        add(
            "PageRank iteration body: rank join + contribution aggregation"
            " (iteration_confs pinned)",
            contrib,
            "The edges table is pre-partitioned on src and the rank "
            "vector arrives partitioned the same way, so the join is a "
            "co-partitioned ShuffledHashJoin (no broadcast rebuild per "
            "iteration, no sort-merge); the groupBy(dst) is the single "
            "per-iteration shuffle WITH map-side partial aggregation "
            "(partial_sum before the Exchange). AQE and auto-broadcast "
            "are pinned off inside the loop (plans/iterate.py:79-96). "
            "The sort-merge joins visible in the full plan are the "
            "ONE-TIME _prepare lineage (degree annotation, dangling "
            "flags) that is persisted before the loop starts — only the "
            "two ShuffledHashJoins and the final Exchange recur per "
            "iteration.",
        )

    # 4. degree-ordered triangle enumeration
    from webgraph_spark.algos.triangles import _oriented

    o = _oriented(e)
    mid_candidates = o.select(F.col("src").alias("dst")).distinct()
    e1 = o.join(mid_candidates, "dst", "left_semi")
    wedges = (
        e1.alias("e1")
        .join(
            o.select(F.col("src").alias("mid"),
                     F.col("dst").alias("w")).alias("e2"),
            F.col("e1.dst") == F.col("mid"),
        )
        .select(F.col("e1.src").alias("u"), F.col("w"))
    )
    tri = wedges.join(
        o.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        ["u", "w"],
        "left_semi",
    )
    add(
        "Triangle counting: degree-oriented wedge join + closure check",
        tri,
        "All arcs are oriented low-degree -> high-degree first, bounding "
        "wedge fan-out by sqrt(m); both joins shuffle on bounded keys, "
        "none is a broadcast (the arc table is the big side on both "
        "sides at scale).",
    )

    # 5. MinHash signatures (explode -> min agg)
    from webgraph_spark.functions.dedup import minhash_signatures

    sigs = minhash_signatures(
        docs.limit(500), id_col="doc_id", text_col="text", num_hashes=16
    )
    add(
        "MinHash signatures: shingle explode -> per-hash min aggregation",
        sigs,
        "One generate (explode) and ONE shuffle for the per-doc min "
        "aggregation; the min combines map-side, so signature state per "
        "doc is n_hashes values regardless of document length.",
    )

    header = (
        "# Physical-plan audit (headline operators)\n\n"
        f"Generated by `python tools/plan_audit.py {sf_dir}` — re-run "
        "after plan-affecting changes. Each section states the plan "
        "property that matters at 100 TB, a counter summary "
        "(exchanges / codegen spans / join strategies / scans), and the "
        "full formatted plan.\n"
    )
    with open(out_md, "w") as f:
        f.write(header + "\n" + "\n".join(sections))
    print("wrote", out_md)
    spark.stop()


if __name__ == "__main__":
    main()
