"""Structured Streaming ops over event streams.

The reference has no streaming (SURVEY §2.9); this is the engine's
Spark-native streaming surface for the events-shaped table: file-source
streams, watermarked tumbling/sliding window aggregates, and a stateful
per-user session counter via applyInPandasWithState. Every transformation is
expressed so the SAME function works on a batch DataFrame (for oracle checks)
and a streaming DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1):
    """File-source stream over an events parquet directory."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count+sum per event_type; watermark bounds state for
    late data when `events` is streaming (no-op semantics change on batch)."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_segment_revenue(
    events: DataFrame,
    dim: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
    on: str = "user_id",
    dim_key: str = "c_custkey",
    segment_col: str = "c_mktsegment",
) -> DataFrame:
    """Stream-STATIC enrichment join + tumbling-window purchase revenue per
    customer segment — the canonical streaming-enrichment pattern: the
    static dimension broadcasts to every micro-batch (the join itself is
    STATELESS; only the window aggregate holds watermark-bounded state).
    On batch inputs the SAME expression is the oracle (w6 contract key).
    Returns (window_start, segment, n_purchases, revenue)."""
    p = events.filter(F.col("event_type") == "purchase")
    if p.isStreaming:
        p = p.withWatermark("ts", watermark)
    d = dim.select(F.col(dim_key).alias(on), F.col(segment_col).alias("segment"))
    return (
        p.join(F.broadcast(d), on)
        .groupBy(F.window("ts", window).alias("win"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("value").alias("revenue"),
        )
        .select(F.col("win.start").alias("window_start"), "segment", "n_purchases", "revenue")
    )


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every (impression, click) pair of the
    same user with the click inside [imp_ts, imp_ts + horizon] — the
    classic windowed click-attribution join. On streaming inputs both
    sides carry watermarks, so Spark bounds the join state to the horizon
    + watermark slack (the documented stream-stream inner-join contract);
    on batch inputs the SAME expression is the oracle (parity-gated).
    Returns (user_id, imp_id, click_id, imp_ts, click_ts, gap_us,
    click_value). For latest-impression-only semantics use the batch
    as-of composition (engine/operators/asof.py — w4)."""
    i = impressions.select(
        F.col("user_id"),
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("imp_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    if i.isStreaming:
        i = i.withWatermark("imp_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    joined = i.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts") <= F.col("imp_ts") + F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        "user_id",
        "imp_id",
        "click_id",
        "imp_ts",
        "click_ts",
        (
            F.unix_micros(F.col("click_ts").cast("timestamp"))
            - F.unix_micros(F.col("imp_ts").cast("timestamp"))
        ).alias("gap_us"),
        "click_value",
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, spark: SparkSession) -> DataFrame:
    """Drain a stream with availableNow into an in-memory table (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_RUNNING_STATE_SCHEMA = "n bigint, total double"


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running event count + Σvalue carried in explicit GroupState across
    micro-batches; emits the updated running totals for every user seen in
    each batch. State is (n BIGINT, total DOUBLE) per user — O(users) state,
    no raw-event retention. Streaming-only (Spark requires a streaming
    relation); the batch oracle twin is `user_totals_batch`."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent of the final state of `stateful_user_totals`."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce("value", F.lit(0.0))).alias("total_value"),
    )


def user_session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session count via session_window (gap-based sessionization) —
    works batch and streaming. Returns (user_id, session_start, n_events)."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", f"{gap_minutes * 2} minutes")
    return (
        e.groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("sw.start").alias("session_start"), "n_events"
        )
    )
