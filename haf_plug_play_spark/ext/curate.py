"""End-to-end corpus curation: the composed training-data pipeline as a
single reusable function behind the ``curate`` CLI subcommand.

The stages are the engine's own oracle-gated operators composed in the
canonical order a pretraining pipeline runs them (exact dedup → quality
gate → language gate → deterministic sample → holdout split → sequence
packing); everything is one Catalyst plan per output — the funnel counts
are the only extra actions, and each is a count over a prefix of the same
plan. Every stage is a pure function of (row key, seed), so re-running the
CLI over the same corpus reproduces the identical output bytes — the
property the XP-pipeline* oracle queries certify at query level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from haf_plug_play_spark.ext import sampling, text as xt
from haf_plug_play_spark.ext.text import fingerprint_md5

DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def curate_documents(
    docs: DataFrame,
    min_score: float = 2.0,
    langs: list[str] | None = None,
    sample_rate: float = 1.0,
    splits: dict[str, float] | None = None,
    budget: int = 2048,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, int]]:
    """Run the curation funnel and return (curated DataFrame, stage counts).

    Output columns: the input's id/text plus lang, q_score, split, n_tok,
    chunk_offset, chunk_id. The funnel dict reports surviving row counts
    after each stage (each an action over a prefix of the same lazy plan).
    """
    funnel: dict[str, int] = {"input": docs.count()}

    # exact dedup: first doc (lowest id) per normalized-text fingerprint —
    # min_by under a hash group-by (map-side combinable), not a window
    keep = (
        docs.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("_fp"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = docs.join(keep, id_col, "left_semi")
    funnel["deduped"] = deduped.count()

    scored = xt.with_quality(deduped, text_col).withColumn(
        "lang", xt.lang_pred(F.col(text_col))
    )
    gated = scored.filter(F.col("q_score") >= min_score)
    if langs:
        gated = gated.filter(F.col("lang").isin(list(langs)))
    funnel["gated"] = gated.count()

    sampled = (
        sampling.hash_bernoulli(gated, id_col, sample_rate, seed=seed)
        if sample_rate < 1.0
        else gated
    )
    split = sampling.split_assign(sampled, id_col, splits or DEFAULT_SPLITS, seed=seed)
    packed = sampling.pack_chunks(
        split.withColumn("n_tok", xt.n_tokens_ws(F.col(text_col)).cast("long")),
        ["split"],
        "n_tok",
        budget,
        id_col,
    )
    funnel["curated"] = packed.count()
    return packed, funnel


def run_curate(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    in_format: str | None = None,
    out_format: str = "parquet",
    **kwargs,
) -> dict:
    """CLI body: read the documents corpus (parquet/JSONL/CSV —
    sources/corpus.py), curate, write partitioned by split
    (parquet or JSONL), and return the JSON-able summary."""
    from haf_plug_play_spark.sources.corpus import read_corpus, write_corpus

    docs = read_corpus(spark, in_path, in_format)
    curated, funnel = curate_documents(docs, **kwargs)
    write_corpus(curated, out_path, out_format, partition_by=["split"])
    # summarize from the files just written — a cheap scan of the
    # materialized result, not a re-execution of the whole funnel plan
    written = (
        spark.read.parquet(out_path)
        if out_format == "parquet"
        else spark.read.json(out_path)
    )
    per_split = {
        r["split"]: {"docs": r["docs"], "chunks": r["chunks"]}
        for r in written.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct("chunk_id").alias("chunks"),
        )
        .collect()
    }
    return {"funnel": funnel, "splits": per_split, "out": out_path}
