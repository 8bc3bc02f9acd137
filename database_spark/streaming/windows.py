"""Streaming window aggregations over event streams.

The reference has no streaming surface (SURVEY §2.13) — this is the
Spark-native extension: Structured Streaming with watermarks for late
data, tumbling/sliding windows, and session windows, all expressed so
the same code runs on a static DataFrame (batch backfill) or a
readStream (live) — the classic lambda-free design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_stats(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts + value extremes per event_type.

    Works on both static and streaming inputs; on a stream the
    watermark bounds state and admits late rows up to `watermark`.
    Output key `hour` = window start (aligned to the hour for the
    default window).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events",
                "min_value", "max_value")
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of
    inactivity.  Native `session_window` keeps this fully JVM-side and,
    on a stream, state is evicted past the watermark.

    Returns (user_id, session_start, session_end, n_events, total_value).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.session_window(F.col("ts"), gap).alias("s"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication with watermark-BOUNDED state —
    the training-pipeline ingest dedup: duplicates of a key arriving
    within `watermark` of each other are dropped; state for keys older
    than the watermark is evicted, so state size tracks the watermark
    window, not the stream history (a plain dropDuplicates on an
    unbounded stream grows state forever — the 100 TB killer).

    Works on static inputs too (plain dropDuplicates on the keys) so
    the same pipeline code runs batch backfills."""
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str):
    """Drain everything currently available through the streaming
    engine into an in-memory sink; returns after the stream finishes.
    (availableNow = bounded execution with real streaming semantics —
    state store, watermarks, incremental planning.)"""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_agg(stream_df) else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan
