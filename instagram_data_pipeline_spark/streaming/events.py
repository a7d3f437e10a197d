"""Streaming transformations over the events table.

The reference's scheduler semantics map onto Structured Streaming
(SURVEY §2.9): T1 periodic trigger -> ``processingTime``/``availableNow``
triggers; T3 per-trigger row caps -> ``maxFilesPerTrigger``; T6's unused
``last_cursor`` column -> checkpointed offsets (free). Watermarked
event-time windows are capability the Spark target adds on top
(tumbling/sliding/session + within-watermark dedup).

Every aggregation here is written so the SAME function works on a batch
DataFrame (streaming-batch parity is asserted in tests) — one definition,
two execution modes, which is exactly Structured Streaming's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS


def stream_from_parquet(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based event stream: each new parquet file is a micro-batch.
    ``max_files_per_trigger`` is the T3 per-trigger cap."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows per event_type; the watermark bounds
    state and admits late data up to its delay."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,10)")), 2)
             .cast("double").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding windows: each event lands in window/slide buckets."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows (gap-based), the sessionization operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming insert-if-absent (A2's streaming analog): drop duplicate
    event_ids arriving within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def interval_join_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase pairs with every click
    by the same user in the preceding ``max_gap`` (the streaming twin of
    the batch as-of attribution — streaming joins can't pick "latest
    only" without a stateful dedup stage, so this emits all candidates
    and the consumer reduces).

    Both sides carry watermarks so the join state is bounded: a click
    older than purchase-watermark + max_gap can never match again and is
    evicted. This is the canonical Spark shape for temporal correlation
    between two live streams.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
    )


def run_available_now(
    df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently available into an in-memory table and
    stop — the batch-mode trigger (T1's availableNow form). Blocks until
    complete; results at ``spark.table(query_name)``."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_left_outer_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Outer twin of :func:`interval_join_attribution`: every purchase
    emits — matched rows immediately, UNmatched purchases as
    null-padded rows once the click-side watermark passes the point
    where a qualifying click can no longer arrive.

    The operational catch (and why :func:`run_available_now_files` +
    sentinel ticks exist): outer results are flushed by a BATCH that
    RUNS with an advanced watermark. The watermark for batch N is
    computed from data seen through batch N-1, so a drain that ends
    exactly when the data ends leaves the tail's unmatched rows parked
    in the state store. Production streams don't notice (the next
    event flushes them); bounded drains must append heartbeat/sentinel
    events — the standard fix for stream-stream outer-join stragglers.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
        "left_outer",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
    )


def run_available_now_files(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain to a parquet FILE sink and stop. Unlike the memory sink,
    the file sink is exactly-once across RESTARTS of the same
    checkpoint — the property the sentinel-flush protocol needs: each
    pass appends new rows; replays are deduped by the sink's commit
    log. Read the result with ``spark.read.parquet(out_dir)``."""
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
