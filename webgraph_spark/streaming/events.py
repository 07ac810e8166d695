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


def incremental_edge_append(
    transcript_stream: DataFrame,
    node_dict: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """foreachBatch ingest: each micro-batch of transcript turns becomes
    turn->tool arcs appended to the durable edge table. The node
    dictionary for tools is broadcast per batch; turn nodes use the
    deterministic (conv_id, turn_idx) keys so the mapping is stable
    across batches."""

    def sink(batch: DataFrame, batch_id: int):
        refs = batch.where(F.col("tool").isNotNull()).select(
            "conv_id", "turn_idx", "tool"
        )
        arcs = refs.join(F.broadcast(node_dict), "tool").select(
            F.xxhash64("conv_id", "turn_idx").alias("src"),
            F.col("node_id").alias("dst"),
            F.lit(batch_id).alias("batch_id"),
        )
        arcs.write.mode("append").parquet(out_path)

    return (
        transcript_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
