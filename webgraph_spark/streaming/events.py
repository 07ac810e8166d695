"""Structured Streaming operators over the events stream table.

The reference has no streaming surface (its closest concept is the
push-based IncrementalImmutableSequentialGraph adapter,
IncrementalImmutableSequentialGraph.java:26-46); this module covers the
engine's stream-ingest path: watermarked windowed aggregation, session
windows, and an incremental edge extractor that appends graph arcs from
an arriving transcript/event stream (foreachBatch -> edge table), which
is how a 10^12-turn corpus is ingested in practice — continuously, not
as one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based), streaming-native."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival per key
    within the watermark horizon (``dropDuplicates`` keyed state; rows
    older than the watermark are expired from state, so memory is
    bounded by keys-per-horizon, not stream length). The streaming twin
    of functions/dedup.py's exact dedup — the first stage any
    continuously-ingested training corpus runs. Keys default to
    ``event_id``; state is hash-partitioned on the key, so dedup scales
    with the shuffle like every other exact-dedup groupBy."""
    keys = key_cols or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


# namespace for turn nodes the batch dictionary has not seen yet: far
# above any dense id, so streamed placeholder ids can never collide with
# dictionary ids (they are remapped when the dictionary is rebuilt)
UNSEEN_TURN_NS = 1 << 62


def incremental_edge_append(
    transcript_stream: DataFrame,
    node_dict: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """foreachBatch ingest: each micro-batch of transcript turns becomes
    turn->tool arcs appended to the durable edge table.

    Both endpoints resolve through the SAME dense node dictionary
    (graph.edges.build_node_dictionary): tools by name (broadcast —
    small), turns by (conv_id, turn_idx). Turns not yet in the
    dictionary get a namespaced hash id (>= UNSEEN_TURN_NS) so the two
    id spaces cannot overlap; streamed arcs for known turns join back
    to the batch graph directly."""
    from ..graph.edges import KIND_TOOL, KIND_TURN

    tool_ids = node_dict.where(F.col("kind") == KIND_TOOL).select(
        "tool", F.col("node_id").alias("dst")
    )
    turn_ids = node_dict.where(F.col("kind") == KIND_TURN).select(
        "conv_id", "turn_idx", F.col("node_id").alias("turn_node")
    )

    def sink(batch: DataFrame, batch_id: int):
        refs = batch.where(F.col("tool").isNotNull()).select(
            "conv_id", "turn_idx", "tool"
        )
        hash_id = F.lit(UNSEEN_TURN_NS) + F.pmod(
            F.xxhash64("conv_id", "turn_idx"), F.lit(UNSEEN_TURN_NS - 1)
        )
        arcs = (
            refs.join(F.broadcast(tool_ids), "tool")
            .join(turn_ids, ["conv_id", "turn_idx"], "left")
            .select(
                F.coalesce(F.col("turn_node"), hash_id).alias("src"),
                "dst",
                F.lit(batch_id).alias("batch_id"),
            )
        )
        arcs.write.mode("append").parquet(out_path)

    return (
        transcript_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def count_min_stream_sink(
    stream: DataFrame,
    item_col: str,
    out_path: str,
    checkpoint: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 12345,
):
    """Streaming heavy-hitter sketching: each micro-batch's Count-Min
    cells (functions/sketches.py count_min_cells) are APPENDED to a
    durable cell table; because Count-Min is a linear sketch, the
    whole-stream sketch is the cell-wise SUM of the appended chunks, so
    estimates after any prefix of batches equal a batch sketch of the
    same prefix EXACTLY (tested). State per batch is d*w cells — the
    sink writes kilobytes per trigger no matter how wide the stream is,
    the streaming analog of the reference's push-based incremental
    builder (IncrementalImmutableSequentialGraph.java:26-46)."""
    from ..functions.sketches import count_min_cells

    def sink(batch: DataFrame, batch_id: int):
        cells = count_min_cells(batch, item_col, d, w, seed).withColumn(
            "batch_id", F.lit(batch_id)
        )
        cells.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def count_min_stream_topk(
    spark: SparkSession,
    cells_path: str,
    items: DataFrame,
    item_col: str,
    k: int = 10,
    d: int = 4,
    w: int = 1024,
    seed: int = 12345,
) -> DataFrame:
    """Top-k estimates from the accumulated streaming cell table."""
    from ..functions.sketches import count_min_estimates

    cells = spark.read.parquet(cells_path).select("i", "bkt", "cnt")
    est = count_min_estimates(cells, items, item_col, d, w, seed)
    return est.orderBy(F.col("est_count").desc(), F.col("item")).limit(k)


def maintain_components(
    edge_stream: DataFrame,
    labels_root: str,
    checkpoint: str,
):
    """foreachBatch maintenance of a durable connected-components label
    table under a stream of arriving arcs — the analytics half of the
    continuous-ingest story (:func:`incremental_edge_append` lands the
    arcs; this folds each micro-batch into the labels).

    Each batch runs :func:`webgraph_spark.algos.components.
    merge_components_incremental` — CC over the COMPONENT-ID delta graph
    only (work bounded by the batch, never a rescan of history) — and
    writes the new snapshot to ``labels_root/v=<batch_id>`` so a reader
    always sees a complete, atomically-committed version (Spark's
    _SUCCESS marker) and a killed run resumes from the last complete
    one, mirroring plans/iterate.py's checkpoint contract. Edge
    DELETIONS are out of scope (recompute cold), same as the batch
    operator.
    """
    import os

    from ..algos.components import merge_components_incremental

    def _latest(spark: SparkSession):
        try:
            dirs = [
                d for d in os.listdir(labels_root)
                if d.startswith("v=")
                and os.path.exists(os.path.join(labels_root, d, "_SUCCESS"))
            ]
        except FileNotFoundError:
            return None
        if not dirs:
            return None
        last = max(dirs, key=lambda d: int(d[2:]))
        return spark.read.parquet(os.path.join(labels_root, last))

    def sink(batch: DataFrame, batch_id: int):
        spark = batch.sparkSession
        arcs = batch.select("src", "dst")
        prev = _latest(spark)
        if prev is None:
            prev = spark.createDataFrame([], "node long, component long")
        merged = merge_components_incremental(prev, arcs)
        merged.labels.write.mode("overwrite").parquet(
            os.path.join(labels_root, f"v={batch_id}")
        )

    return (
        edge_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def maintain_pagerank(
    edge_stream: DataFrame,
    edges_root: str,
    ranks_root: str,
    checkpoint: str,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    num_partitions: int | None = None,
):
    """foreachBatch maintenance of a durable PageRank snapshot under a
    stream of arriving arcs — the RANKING half of the continuous-ingest
    story, pairing :func:`maintain_components`.

    Per micro-batch: (1) the batch's arcs append to the cumulative
    parquet edge table at ``edges_root``; (2) PageRank reruns over the
    full (deduplicated) table WARM-STARTED from the latest snapshot
    (``init_ranks``: prior converged vector, new nodes seeded 1/n,
    renormalized — algos/pagerank.py); (3) the new vector lands
    atomically at ``ranks_root/v=<batch_id>`` (_SUCCESS marker), so a
    reader always sees a complete version and a killed run resumes from
    the last one.

    Power iteration restarted from a near-fixpoint vector re-converges
    in a fraction of the cold-start rounds for small deltas (asserted
    in tests), so steady-state per-batch cost is a few damped sweeps —
    never a cold recompute. Arc deletions are out of scope (recompute
    cold), matching the batch operator's contract.

    A tiny ``_meta.json`` per version records the iteration count so the
    warm-start saving is observable, not just claimed.
    """
    import json
    import os

    from ..algos.pagerank import pagerank

    def _latest(spark: SparkSession):
        try:
            dirs = [
                d for d in os.listdir(ranks_root)
                if d.startswith("v=")
                and os.path.exists(os.path.join(ranks_root, d, "_SUCCESS"))
            ]
        except FileNotFoundError:
            return None
        if not dirs:
            return None
        last = max(dirs, key=lambda d: int(d[2:]))
        return spark.read.parquet(os.path.join(ranks_root, last)).select(
            "node", "rank"
        )

    def sink(batch: DataFrame, batch_id: int):
        spark = batch.sparkSession
        batch.select("src", "dst").write.mode("append").parquet(edges_root)
        full = spark.read.parquet(edges_root).distinct()
        prev = _latest(spark)
        res = pagerank(
            full,
            alpha=alpha,
            tol=tol,
            max_iter=max_iter,
            num_partitions=num_partitions,
            init_ranks=prev,
        )
        vdir = os.path.join(ranks_root, f"v={batch_id}")
        res.ranks.write.mode("overwrite").parquet(vdir)
        with open(os.path.join(vdir, "_meta.json"), "w") as f:
            json.dump(
                {
                    "iterations": res.iterations,
                    "converged": res.converged,
                    "warm_started": prev is not None,
                },
                f,
            )

    return (
        edge_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
