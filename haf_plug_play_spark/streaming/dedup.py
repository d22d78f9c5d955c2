"""Streaming exact deduplication with bounded state.

The batch pipeline dedups with a hash group-by (ext/dedup.py:exact_dedup);
on an unbounded stream that state would grow forever. The streaming form
uses ``dropDuplicatesWithinWatermark``: the state store only retains keys
younger than the watermark, so memory is bounded by the duplicate-arrival
horizon instead of stream length — the standard contract for ingest-time
dedup of a training-data feed (duplicates arrive close together; a
re-crawl months later is handled by the batch census instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_exact_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key wins. Streaming: state bounded by
    ``watermark`` on ``ts_col``. Batch: degenerates to dropDuplicates, so
    the same call is the test oracle for itself."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
