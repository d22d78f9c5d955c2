"""Multi-dimensional clustering layout (Z-order) for data skipping.

Parquet skips row groups via min/max zone maps, but a sort on one column
only prunes filters on THAT column. Interleaving the bits of several
columns into one Morton (Z-order) key and range-partitioning + sorting on
it keeps rows that are close in EVERY dimension physically together, so
min/max stats prune multi-dimensional filters — the public technique
behind Delta/Iceberg's OPTIMIZE ZORDER, re-expressed as plain Spark
operators (an engine-layout op the reference cannot have: PostgreSQL
tables have no writer-controlled file statistics to aim at).

Scale posture: the key is pure per-row codegen (shift/mask/sum — no UDF);
``cluster_by_zorder`` is exactly one range-repartition shuffle (sampled
range bounds, so skew in any single dimension spreads across the
interleave) followed by a partition-local sort. The layout cost is the
same one shuffle any global sort pays; the payoff is multi-column scan
pruning forever after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative ints, ``bits`` low
    bits each (values are masked to that width first, so out-of-range
    inputs degrade to coarse buckets instead of corrupting the order).
    Bit b of column i lands at position ``b * n_cols + i`` — the standard
    Z-curve. Compiles to a flat sum of shift/mask terms: whole-stage
    codegen, zero shuffle."""
    n = len(cols)
    if bits * n > 63:
        # position bits*n-1 would land in the long's sign bit: rows with
        # it set would sort FIRST (negative keys), silently breaking the
        # Z-order — refuse instead (e.g. 4 columns need bits <= 15)
        raise ValueError(
            f"bits * n_cols must be <= 63 to fit a signed long, got "
            f"{bits} * {n} = {bits * n}"
        )
    mask = (1 << bits) - 1
    masked = [c.cast("long").bitwiseAND(F.lit(mask)) for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, m in enumerate(masked):
            out = out + F.shiftleft(
                F.shiftright(m, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("long")
    return out


def zorder_key_sql(col_exprs: list[str], bits: int = 16) -> str:
    """DuckDB spelling of ``zorder_key`` — identical shift/mask terms, so
    engine and oracle agree bit-for-bit."""
    n = len(col_exprs)
    if bits * n > 63:
        raise ValueError(
            f"bits * n_cols must be <= 63 to fit a signed long, got "
            f"{bits} * {n} = {bits * n}"
        )
    mask = (1 << bits) - 1
    terms = []
    for b in range(bits):
        for i, e in enumerate(col_exprs):
            terms.append(
                f"((((CAST({e} AS BIGINT) & {mask}) >> {b}) & 1) << {b * n + i})"
            )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def cluster_by_zorder(
    df: DataFrame, cols: list[str], num_partitions: int, bits: int = 16
) -> DataFrame:
    """Rewrite the layout so every partition covers a contiguous Z-key
    range and rows inside it are Z-sorted — written as parquet, each
    file's min/max stats then prune filters on ANY of ``cols``. One
    range shuffle + local sort; drop the key after layout so the table
    schema is unchanged."""
    keyed = df.withColumn("_zkey", zorder_key([F.col(c) for c in cols], bits))
    return (
        keyed.repartitionByRange(num_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
