"""Document-corpus sources and sinks beyond parquet: JSONL and CSV.

Raw text corpora arrive as JSON-lines dumps (web-crawl processors) or CSV
exports long before anyone converts them to parquet; the curation funnel
(ext/curate.py, the ``curate`` CLI) accepts all three through one reader
with the engine's documents schema, and can emit JSONL back out for
downstream consumers that expect line-delimited text.

Scale notes: the explicit schema skips whole-file inference; JSONL and
CSV (``multiLine=false``) are line-splittable, so a huge dump still
parallelizes per block — but both lack columnar pruning and min/max
pushdown, so parquet remains the steady-state layout and
``convert_corpus`` is the one-pass migration (the oplog.py stance).
CSV is read with ``mode=FAILFAST`` + explicit quoting/escaping: free-text
columns embed commas, quotes, and newlines, and a silently-dropped
malformed row in a training corpus is a data bug, not a tolerable default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_JSON_EXTS = (".jsonl", ".json", ".ndjson")
_CSV_EXTS = (".csv",)


def _fmt_of(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    ext = os.path.splitext(path)[1].lower()
    if ext in _JSON_EXTS:
        return "jsonl"
    if ext in _CSV_EXTS:
        return "csv"
    return "parquet"


def read_corpus(
    spark: SparkSession, path: str, fmt: str | None = None
) -> DataFrame:
    """Read a documents corpus from parquet, JSONL, or CSV with the
    engine's documents schema. ``fmt`` ∈ {parquet, jsonl, csv} overrides
    extension detection (part-file directories have no extension)."""
    f = _fmt_of(path, fmt)
    if f == "jsonl":
        return spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    if f == "csv":
        return (
            spark.read.schema(DOCUMENTS_SCHEMA)
            .option("header", "true")
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", "false")
            .option("mode", "FAILFAST")
            .csv(path)
        )
    if f == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unknown corpus format {f!r}")


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as parquet (steady state) or JSONL (interchange).
    CSV is deliberately not a sink: free text with embedded newlines
    round-trips through quoted CSV but every downstream line-oriented
    tool breaks on it — emit JSONL instead."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "jsonl":
        w.json(path)
    elif fmt == "parquet":
        w.parquet(path)
    else:
        raise ValueError(f"unknown corpus sink format {fmt!r}")


def convert_corpus(
    spark: SparkSession, src: str, dst: str, fmt: str | None = None
) -> int:
    """One-pass JSONL/CSV → parquet migration; returns the row count."""
    df = read_corpus(spark, src, fmt)
    df.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()
