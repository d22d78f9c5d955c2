"""Stream-stream joins with watermark-bounded state.

The batch engine's interval-containment join (operators/temporal.py:
range_join, the QR1 surface) re-expressed for two UNBOUNDED streams: the
click-attribution shape — every signup opens a window, clicks by the same
user landing inside it are matched. Structured Streaming keeps both sides'
state only as long as the watermark + the time-range condition require
(the event-time constraint is what lets the engine evict: a signup older
than watermark + window can never match a future click), which is the
standard contract for stream-stream inner joins.

On batch DataFrames the same code is a plain equi-join + residual — one
definition, both execution modes, like streaming/windowed.py and
streaming/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_attribution_join(
    signups: DataFrame,
    clicks: DataFrame,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join clicks to same-user signups within ``window`` after the
    signup (inclusive bounds, matching QR1's epoch BETWEEN). Output one row
    per (signup, click) pair: (user_id, signup_id, click_id)."""
    from haf_plug_play_spark.streaming.windowed import _as_event_time

    s = _as_event_time(signups, "ts")
    c = _as_event_time(clicks, "ts")
    if s.isStreaming:
        s = s.withWatermark("ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("ts", watermark)
    s = s.select(
        F.col("user_id"), F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    c = c.select(
        F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    return s.join(
        c,
        (s["user_id"] == c["user_id"])
        & (c["c_ts"] >= s["s_ts"])
        & (c["c_ts"] <= s["s_ts"] + F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(s["user_id"], "signup_id", "click_id")
