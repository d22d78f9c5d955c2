"""Op-log sources beyond parquet: JSONL dumps.

The reference's only source is the HAF PostgreSQL views
(/root/reference/haf_plug_play/database/sql/sync.sql:82-100); operators
exchange op dumps as JSON-lines files, so the engine accepts the same
op-log schema from ``.jsonl`` as from parquet — one reader, one schema,
every downstream operator unchanged.

Scale notes: the explicit schema skips Spark's whole-file inference scan;
JSON is a line-splittable format, so a 100 TB dump still parallelizes per
block. Parquet remains the steady-state layout (columnar pruning +
min/max pushdown, which JSON cannot offer) — ``convert_ops_to_parquet``
is the one-pass migration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from haf_plug_play_spark.fixtures import OPS_SCHEMA, TRX_SCHEMA

_JSON_EXTS = (".jsonl", ".json", ".ndjson")


def _fmt_of(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    ext = os.path.splitext(path)[1].lower()
    if ext in _JSON_EXTS:
        return "json"
    return "parquet"


def read_ops(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read an op log from parquet or JSONL with the engine's op schema.
    ``fmt`` overrides the extension-based detection (a directory of part
    files has no extension)."""
    if _fmt_of(path, fmt) == "json":
        return (
            spark.read.schema(OPS_SCHEMA)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .json(path)
        )
    return spark.read.schema(OPS_SCHEMA).parquet(path)


def read_trx(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Transaction side-table, same format menu as ``read_ops``."""
    if _fmt_of(path, fmt) == "json":
        return (
            spark.read.schema(TRX_SCHEMA)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .json(path)
        )
    return spark.read.schema(TRX_SCHEMA).parquet(path)


def convert_ops_to_parquet(
    spark: SparkSession, src: str, dst: str, fmt: str | None = None,
    buckets_step: int = 100,
) -> None:
    """One-pass JSONL→parquet migration, partitioned by block bucket so the
    steady-state layout matches the runner's pruning scheme."""
    from pyspark.sql import functions as F

    df = read_ops(spark, src, fmt)
    (
        df.withColumn("block_bucket", (F.col("block_num") / buckets_step).cast("long"))
        .repartition("block_bucket")
        .write.mode("overwrite")
        .partitionBy("block_bucket")
        .parquet(dst)
    )
