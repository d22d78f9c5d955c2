"""Temporal operators Spark has no native form for: as-of join and
gap-based sessionization, built from unions + window functions (composition
of built-in ops — preference (a) of the custom-operator ladder).

Scale posture: both are one shuffle on the entity key (the window
partition); no Python, no cross joins, no per-row lookups. The as-of union
trick in particular replaces the naive range-join (quadratic per key) with a
single sort per key — the standard large-scale formulation.
"""

from __future__ import annotations

import functools

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


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    on: list[str] | None = None,
    bucket: int = 3600,
) -> DataFrame:
    """Interval-containment join: left rows paired with every right row
    whose [right_lo, right_hi] contains left_point (numeric columns; cast
    timestamps with unix_timestamp first). Returns left.* + right.*.

    Scale formulation — bucketed equi-join, not a theta-join: the naive
    ``left.join(right, (pt >= lo) & (pt <= hi))`` has no equi-condition, so
    Spark plans a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons and a
    broadcast that dies at scale. Instead the number line is cut into
    ``bucket``-wide cells: each interval explodes to its covered cells
    (ceil(span/bucket)+1 rows — bounded when spans are bounded, the
    interval-join regime), each point maps to exactly one cell, and the
    pairing becomes an equi-join on (cell [+ on keys]) with the exact
    containment predicate as a residual filter. Shuffle is O(|L| + |R| ·
    avg_cells); no cross product at any size. Equality keys in ``on``
    further partition the join — pass them when the semantics have a key
    (e.g. same-user windows): they shrink cells' collision sets and let
    AQE's skew-join split hot keys.
    """
    onl = on or []
    cell_l = F.floor(F.col(left_point) / bucket).alias("_cell")
    cells_r = F.explode(
        F.sequence(
            F.floor(F.col(right_lo) / bucket),
            F.floor(F.col(right_hi) / bucket),
        )
    ).alias("_cell")
    lt = left.select("*", cell_l)
    rt = right.select("*", cells_r)
    cond = [lt["_cell"] == rt["_cell"]] + [lt[k] == rt[k] for k in onl]
    joined = lt.join(rt, functools.reduce(lambda a, b: a & b, cond)).filter(
        (lt[left_point] >= rt[right_lo]) & (lt[left_point] <= rt[right_hi])
    )
    keep = [lt[c] for c in left.columns] + [
        rt[c] for c in right.columns if c not in onl
    ]
    return joined.select(*keep)
