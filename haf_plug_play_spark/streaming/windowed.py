"""Windowed streaming aggregation with late-data handling.

The reference never needs watermarks — its blockchain input is totally
ordered (SURVEY T13) — but the engine's event-stream surface does: this is
the Structured Streaming twin of the batch QW1-window query
(queries/advanced.py), sharing its 5-minute epoch-aligned windows so batch
and streaming results are directly comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_event_time(df: DataFrame, col: str) -> DataFrame:
    """``withWatermark`` requires TimestampType; fixture parquet read via
    ``readStream`` arrives as TIMESTAMP_NTZ. Session TZ is UTC, so the cast
    is value-preserving (same normalization as sources.tables)."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def windowed_event_aggs(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type. On a streaming
    DataFrame the watermark bounds state and admits late rows up to its lag;
    on a batch DataFrame the same code degenerates to a plain group-by."""
    src = _as_event_time(events, "ts")
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    # group by the FULL window struct (same rule as streaming/drift.py):
    # only the struct binds append-mode emission + watermark eviction
    return (
        src.groupBy(F.window("ts", window).alias("_w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(
            F.col("_w").start.alias("w_start"), "event_type", "n", "total_value"
        )
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user session windows (F.session_window — dynamic, gap-merged
    event-time windows) with streaming state handling. On a streaming
    DataFrame the watermark bounds the open-session state (a session can
    only stay open while events within the watermark lag could still
    extend it); on a batch DataFrame the same code is QW5's plain
    session-window group-by."""
    src = _as_event_time(events, "ts")
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(
        F.session_window("ts", gap).alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
