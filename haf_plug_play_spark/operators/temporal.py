"""Temporal operators Spark has no native form for: as-of join and
gap-based sessionization, built from unions + window functions (composition
of built-in ops — preference (a) of the custom-operator ladder).

Scale posture: both are one shuffle on the entity key (the window
partition); no Python, no cross joins, no per-row lookups. The as-of union
trick in particular replaces the naive range-join (quadratic per key) with a
single sort per key — the standard large-scale formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, attach the most recent right row
    of the same key with right_ts <= left_ts (NULL when none precedes).

    Union both sides tagged, sort per key by (ts, side, tie), and carry the
    last-seen right values forward with ``last(..., ignorenulls=True)`` —
    right rows sort before left rows at equal timestamps, so `<=` semantics
    hold; ``tie_col`` makes equal-timestamp right rows deterministic
    (greatest wins).

    ``right_cols`` maps right-side column → output alias.
    """
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a) for c, a in right_cols.items()],
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie_col).cast("long") if tie_col else F.lit(0)).alias("_tie"),
        *[F.col(c).alias(a) for c, a in right_cols.items()],
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    w = (
        W.partitionBy(*on)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"_asof_{a}")
            for a in right_cols.values()
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_row.*"),
        *[F.col(f"_asof_{a}").alias(a) for a in right_cols.values()],
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tie: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``. Adds ``session_id``
    (1-based per key, in time order)."""
    order = [ts] + ([order_tie] if order_tie else [])
    w = W.partitionBy(key).orderBy(*order)
    # unix_timestamp accepts both TIMESTAMP and TIMESTAMP_NTZ (a bare
    # cast("long") rejects NTZ); session TZ is UTC so both read identically.
    secs = F.unix_timestamp(F.col(ts))
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
