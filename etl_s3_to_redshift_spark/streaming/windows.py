"""Structured Streaming window operators with batch twins.

The reference has no streaming surface (SURVEY.md §2c) — these are the
north-star stream-shaped operators over the events table. Every operator
is written against a plain DataFrame: pass a batch frame for the
DuckDB-checkable twin, or a ``readStream`` frame for the real streaming
query (identical plan — Structured Streaming's core design).

Watermarks bound state: ``withWatermark(ts, delay)`` lets Spark drop
window state older than the watermark, which is what makes hours-long jobs
over unbounded streams feasible. Batch runs ignore the watermark (harmless).

Scale notes: windowed aggregation shuffles on (window, keys) — at high
cardinality enable ``spark.sql.streaming.statefulOperator.*`` sizing and
RocksDB state store; tumbling windows assign exactly one window per event
(no amplification), sliding windows amplify by length/slide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window counts + exact value sum per key.

    Epoch-aligned windows (Spark aligns to 1970-01-01 UTC); the decimal
    cast keeps the sum exact for oracle comparison.
    """
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Sliding (hopping) window counts: each event lands in
    length/slide windows. Amplification factor = window/slide (2 here)."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("bucket_start"), key_col, "n_events")
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Session-window aggregate per user: merges events closer than ``gap``
    (strictly: an event extends the session to [ts, ts+gap); an event at
    exactly ts+gap starts a new session).

    The built-in stateful session operator — the streaming twin of
    operators/analytics.sessionize (whose batch islands pattern must use
    ``diff >= gap`` for a new session to match these semantics exactly).
    """
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    spark,
    agg: DataFrame,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a streaming aggregate to completion against a bounded source
    (memory sink + processAllAvailable) — the smoke-test harness for the
    streaming operators; real deployments swap the sink for kafka/delta."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
