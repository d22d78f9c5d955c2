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
    """First occurrence per key wins. Streaming: first ARRIVAL, state
    bounded by ``watermark`` on ``ts_col``. Batch: earliest ``ts_col``
    (deterministic keep-first via ext.dedup.exact_dedup — a bare
    dropDuplicates would keep a partition-dependent arbitrary row,
    violating the engine's determinism rule, SURVEY §4.3.2). The two
    agree whenever duplicates are full-row identical or arrive in
    ``ts_col`` order."""
    from haf_plug_play_spark.streaming.windowed import _as_event_time

    df = _as_event_time(df, ts_col)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    from haf_plug_play_spark.ext.dedup import exact_dedup

    return exact_dedup(df, keys, ts_col)
