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
from pyspark.sql.window import Window

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
    near_dup_threshold: float | None = None,
    decontam_eval: DataFrame | None = None,
    decontam_min_frac: float = 0.5,
    dsir_target=None,
    dsir_tau: float = 0.0,
    min_entropy: float | None = None,
    remove_dup_spans: int | None = None,
    mix_targets: dict[str, float] | None = None,
    stratum_col: str = "source",
    mix_seed: int = 11,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the curation funnel and return (curated DataFrame, stage counts).

    Output columns: the input's id/text plus lang, q_score, split, n_tok,
    chunk_offset, chunk_id. The funnel dict reports surviving row counts
    after each stage, computed in ONE conditional-aggregation action:
    every stage predicate is a flag column over the same row stream
    (dedup-keeper, quality+language gate, sample membership — all pure
    functions of the row), and the funnel is one ``sum(flag)`` pass. The
    previous design ran four separate ``.count()`` actions over prefix
    plans — four corpus scans at 100 TB just for counters; this is one.

    Opt-in stages (each stays a FLAG column so the one-aggregation funnel
    contract holds; each adds its own bounded upstream jobs/joins):

    - ``near_dup_threshold``: MinHash+LSH fuzzy dedup of exact-dedup
      survivors (the CCNet order).
    - ``decontam_eval``: n-gram benchmark decontamination
      (ext/dedup.py:eval_overlap — the GPT-3 appx. C protocol); documents
      whose distinct-shingle overlap with the eval corpus reaches
      ``decontam_min_frac`` are dropped. The eval side broadcasts; the
      per-doc flag joins back on the already-keyed id.
    - ``dsir_target``: DSIR importance gate
      (ext/sampling.py:dsir_weights) — keep documents with
      ``log_weight > dsir_tau`` against the target predicate (a boolean
      Column over the input's columns). A document with no features
      (empty text) is never target-like and is dropped, matching
      dsir_weights' no-row semantics.
    - ``min_entropy``: normalized-entropy gate
      (ext/report.py:doc_entropy) — drop documents whose word
      distribution collapsed (repeated-token boilerplate that n-gram
      repetition misses when nothing repeats verbatim); the per-doc
      entropy joins back on the already-keyed id like the DSIR flag. A
      doc with no tokens has no entropy row and is dropped.
    - ``remove_dup_spans``: a PRE-funnel text rewrite, not a flag —
      keep-one-copy exact-substring removal at this window
      (ext/dedup.py:remove_duplicated_spans) runs first and every later
      stage (fingerprints, quality, packing) sees the cleaned text; a
      doc cut to nothing simply scores like an empty doc and falls to
      the quality gate.
    """
    if remove_dup_spans is not None:
        from haf_plug_play_spark.ext.dedup import remove_duplicated_spans

        cleaned = remove_duplicated_spans(
            docs, id_col=id_col, text_col=text_col, window=remove_dup_spans
        ).select(F.col(id_col), F.col("clean_text").alias(text_col))
        docs = docs.drop(text_col).join(cleaned, id_col)
    # exact dedup as a FLAG, not a filter: the keeper (lowest id) per
    # normalized-text fingerprint via a fingerprint-partitioned window —
    # one hash shuffle (vs the groupBy+semi-join's two) and every input
    # row survives carrying its flag so one aggregation can count every
    # funnel stage at once.
    fp_w = Window.partitionBy(fingerprint_md5(F.col(text_col)))
    flagged = docs.withColumn(
        "_keep_dedup", F.col(id_col) == F.min(id_col).over(fp_w)
    )
    scored = xt.with_quality(flagged, text_col).withColumn(
        "lang", xt.lang_pred(F.col(text_col))
    )
    keep = F.col("_keep_dedup")
    if near_dup_threshold is not None:
        # opt-in MinHash+LSH near-dup stage (the CCNet order: exact dedup
        # first, fuzzy dedup on its survivors): LSH pairs → connected
        # components → canonical keeper, joined back as a flag so the
        # funnel still counts every stage in the one aggregation pass.
        # This stage runs its own bounded jobs (the CC iterations) —
        # the default funnel's two-job contract applies when it is off.
        from haf_plug_play_spark.ext import dedup as xdedup

        survivors0 = flagged.filter(F.col("_keep_dedup")).select(id_col, text_col)
        pairs = xdedup.minhash_lsh_pairs(
            survivors0, id_col=id_col, text_col=text_col,
            threshold=near_dup_threshold,
        )
        nd_keep = (
            xdedup.dedup_decision(
                survivors0, pairs, id_col=id_col, deterministic_order=False
            )
            .filter(F.col("keep"))
            .select(F.col(id_col), F.lit(True).alias("_keep_nd"))
        )
        scored = (
            scored.join(nd_keep, id_col, "left")
            .withColumn(
                "_keep_near",
                keep & F.coalesce(F.col("_keep_nd"), F.lit(False)),
            )
            .drop("_keep_nd")
        )
        keep = F.col("_keep_near")
    if decontam_eval is not None:
        from haf_plug_play_spark.ext import dedup as xdedup

        contam = xdedup.eval_overlap(
            docs.select(id_col, text_col), decontam_eval,
            id_col=id_col, text_col=text_col, min_frac=decontam_min_frac,
        ).select(F.col(id_col), F.col("contaminated").alias("_contam"))
        scored = (
            scored.join(contam, id_col, "left")
            .withColumn(
                "_keep_clean",
                keep & ~F.coalesce(F.col("_contam"), F.lit(False)),
            )
            .drop("_contam")
        )
        keep = F.col("_keep_clean")
    if dsir_target is not None:
        w = sampling.dsir_weights(
            docs, dsir_target, id_col=id_col, text_col=text_col
        ).select(F.col(id_col), F.col("log_weight"))
        scored = (
            scored.join(w, id_col, "left")
            .withColumn(
                "_keep_dsir",
                # NULL log_weight = no features = not target-like
                keep
                & F.coalesce(
                    F.col("log_weight") > F.lit(float(dsir_tau)), F.lit(False)
                ),
            )
            .drop("log_weight")
        )
        keep = F.col("_keep_dsir")
    if min_entropy is not None:
        from haf_plug_play_spark.ext.report import doc_entropy

        ent = doc_entropy(
            # doc_entropy reads the fixed "text" column — alias here so a
            # custom text_col threads through like the dsir/decontam stages
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            )
        ).select(F.col("doc_id").alias(id_col), "norm_entropy")
        scored = (
            scored.join(ent, id_col, "left")
            .withColumn(
                "_keep_entropy",
                # NULL norm_entropy = no tokens = dropped
                keep
                & F.coalesce(
                    F.col("norm_entropy") >= F.lit(float(min_entropy)),
                    F.lit(False),
                ),
            )
            .drop("norm_entropy")
        )
        keep = F.col("_keep_entropy")
    gate = keep & (F.col("q_score") >= min_score)
    if langs:
        gate = gate & F.col("lang").isin(list(langs))
    sample = gate & (
        sampling.bernoulli_flag(F.col(id_col), sample_rate, seed)
        if sample_rate < 1.0
        else F.lit(True)
    )
    scored = scored.withColumn("_gate", gate).withColumn("_sample", sample)
    final_flag = "_sample"
    if mix_targets is not None:
        # recipe-mixture stage (ext/sampling.py:mixture_report): the
        # per-stratum one-epoch Bernoulli rates realizing the TARGET
        # token shares are derived from the sampled survivors and
        # broadcast back — still ONE plan (the rates subtree is a
        # strata-bounded aggregate feeding a broadcast join), so the
        # one-aggregation funnel contract holds. A stratum absent from
        # the recipe gets rate 0 and is dropped loudly in the funnel.
        rates = sampling.mixture_report(
            scored.filter(F.col("_sample")),
            mix_targets,
            xt.n_tokens_ws(F.col(text_col)),
            stratum_col=stratum_col,
        ).select(stratum_col, "sample_rate")
        scored = (
            scored.join(F.broadcast(rates), stratum_col, "left")
            .withColumn(
                "_keep_mix",
                F.col("_sample")
                & (
                    sampling._uniform(F.col(id_col), mix_seed)
                    < F.coalesce(F.col("sample_rate"), F.lit(0.0))
                ),
            )
            .withColumn("mix_rate", F.col("sample_rate"))
            .drop("sample_rate")
        )
        final_flag = "_keep_mix"

    flag_stages = [("deduped", "_keep_dedup")]
    if near_dup_threshold is not None:
        flag_stages.append(("near_deduped", "_keep_near"))
    if decontam_eval is not None:
        flag_stages.append(("decontaminated", "_keep_clean"))
    if dsir_target is not None:
        flag_stages.append(("dsir_kept", "_keep_dsir"))
    if min_entropy is not None:
        flag_stages.append(("entropy_kept", "_keep_entropy"))
    flag_stages += [("gated", "_gate"), ("curated", "_sample")]
    if mix_targets is not None:
        flag_stages.append(("mixed", "_keep_mix"))
    aggs = [F.count("*").alias("input")] + [
        F.sum(F.col(col).cast("long")).alias(name) for name, col in flag_stages
    ]
    stages = ["input"] + [name for name, _ in flag_stages]
    row = scored.agg(*aggs).first()
    funnel = {k: int(row[k]) for k in stages}

    survivors = scored.filter(F.col(final_flag)).drop(
        "_keep_dedup", "_keep_near", "_keep_clean", "_keep_dsir",
        "_keep_entropy", "_gate", "_sample", "_keep_mix",
    )
    split = sampling.split_assign(
        survivors, id_col, splits or DEFAULT_SPLITS, seed=seed
    )
    # split_assign and pack_chunks preserve row counts, so "curated" from
    # the flag pass equals the packed output count exactly.
    packed = sampling.pack_chunks(
        split.withColumn("n_tok", xt.n_tokens_ws(F.col(text_col)).cast("long")),
        ["split"],
        "n_tok",
        budget,
        id_col,
    )
    return packed, funnel


def run_release(
    spark: SparkSession,
    in_path: str,
    table_dir: str,
    mix_targets: dict[str, float] | None = None,
    in_format: str | None = None,
    fs=None,
    batch_id: int | None = None,
    writer_id: str = "release",
    stratum_col: str = "source",
    decontam_eval_path: str | None = None,
    dsir_target_expr: str | None = None,
    **kwargs,
) -> dict:
    """Pipeline-7 — the full data-release story as ONE invocation
    (VERDICT r6 #8, the Spark analog of the reference's end-to-end
    sync→serve loop, run_plug_play.py:10-17): curate funnel → recipe
    mixture rates derived and applied (ext/sampling.py:mixture_report) →
    holdout split → sequence packing → ``append_snapshot`` publish. The
    release's commit point is the snapshot MANIFEST: readers resolve
    pointer → manifest → data dirs, so a crashed release is invisible
    and a retried one with the same ``(writer_id, batch_id)`` is a
    no-op (exactly-once publication). Every stage is a pure function of
    (row key, seed), so two releases of the same corpus produce
    identical rows — and the same batch id re-publishes NOTHING
    (byte-identical table, pinned in tests/test_cli.py).

    Returns the JSON-able summary: funnel counts, the committed
    snapshot's lineage (id, parent, data dirs), and per-split
    doc/chunk counts read back THROUGH the published snapshot."""
    from haf_plug_play_spark.runner import snapshots as sn
    from haf_plug_play_spark.sources.corpus import read_corpus

    docs = read_corpus(spark, in_path, in_format)
    if decontam_eval_path:
        kwargs["decontam_eval"] = read_corpus(spark, decontam_eval_path, None)
    if dsir_target_expr:
        kwargs["dsir_target"] = F.expr(dsir_target_expr)
    curated, funnel = curate_documents(
        docs, mix_targets=mix_targets, stratum_col=stratum_col, **kwargs
    )
    manifest = sn.append_snapshot(
        spark, curated, table_dir, fs, batch_id=batch_id, writer_id=writer_id
    )
    released = sn.read_snapshot(spark, table_dir, fs)
    per_split = {
        r["split"]: {"docs": r["docs"], "chunks": r["chunks"]}
        for r in released.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.countDistinct("chunk_id").alias("chunks"),
        )
        .collect()
    }
    return {
        "funnel": funnel,
        "snapshot": {
            "snapshot_id": manifest["snapshot_id"],
            "parent": manifest["parent"],
            "data_dirs": sn._data_dirs(manifest),
        },
        "splits": per_split,
        "table": table_dir,
    }


def run_curate(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    in_format: str | None = None,
    out_format: str = "parquet",
    decontam_eval_path: str | None = None,
    dsir_target_expr: str | None = None,
    **kwargs,
) -> dict:
    """CLI body: read the documents corpus (parquet/JSONL/CSV —
    sources/corpus.py), curate, write partitioned by split
    (parquet or JSONL), and return the JSON-able summary.

    ``decontam_eval_path`` reads a documents-shaped eval corpus for the
    opt-in decontamination stage; ``dsir_target_expr`` is a SQL boolean
    expression over the input's columns (e.g. ``"source = 'src0'"``)
    naming the DSIR target subset."""
    from haf_plug_play_spark.sources.corpus import read_corpus, write_corpus

    docs = read_corpus(spark, in_path, in_format)
    if decontam_eval_path:
        kwargs["decontam_eval"] = read_corpus(spark, decontam_eval_path, None)
    if dsir_target_expr:
        kwargs["dsir_target"] = F.expr(dsir_target_expr)
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


def curate_batch_incremental(
    spark: SparkSession,
    batch: DataFrame,
    table_dir: str,
    splits: dict[str, float] | None = None,
    fs=None,
    batch_id: int | None = None,
    writer_id: str = "stream-curate",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> dict:
    """One micro-batch of the daily-crawl curation loop: incremental
    MinHash near-dedup against the PUBLISHED corpus (first-wins — the
    lowest id keeps, the repo-wide census rule), optional deterministic
    split assignment, exactly-once ``append_snapshot`` publication
    (a foreachBatch retry with the same (writer_id, batch_id) re-commits
    nothing). Returns the committed manifest.

    Pair semantics: ``incremental_minhash_pairs`` emits (id_a < id_b)
    pairs touching the batch; a batch doc on the b side is a near-copy
    of something older and is dropped via a distributed anti-join (no
    driver-side id set). A batch doc on the a side KEEPS — already-
    published near-copies are not retracted (with monotonically
    increasing crawl ids the case never arises). Scale shape: the
    corpus is probed through the band-bucket semi-join (never re-paired
    with itself), the drop is one anti-join on the id, and the publish
    is a manifest commit.
    """
    from haf_plug_play_spark.ext import dedup as xdedup
    from haf_plug_play_spark.runner import snapshots as sn

    batch = batch.select(id_col, text_col)
    try:
        corpus = sn.read_snapshot(spark, table_dir, fs).select(id_col, text_col)
    except FileNotFoundError:
        corpus = spark.createDataFrame([], batch.schema)
    pairs = xdedup.incremental_minhash_pairs(
        batch,
        corpus,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
    )
    kept = batch.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    out = sampling.split_assign(kept, id_col, splits) if splits else kept
    return sn.append_snapshot(
        spark, out, table_dir, fs, batch_id=batch_id, writer_id=writer_id
    )


def start_curation_stream(
    spark: SparkSession,
    src_dir: str,
    schema,
    table_dir: str,
    checkpoint: str,
    splits: dict[str, float] | None = None,
    fs=None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    **batch_kwargs,
):
    """The one-call streaming form of the curation loop: a file-source
    document stream curated batch-by-batch through
    ``curate_batch_incremental`` under foreachBatch, published as
    snapshot appends. Returns the started StreamingQuery; exactly-once
    holds across foreachBatch retries because the commit key is
    (writer_id, epoch id). ``available_now=True`` drains the backlog
    and stops (the catch-up/backfill mode); False runs continuously."""

    def _publish(batch_df: DataFrame, epoch_id: int) -> None:
        curate_batch_incremental(
            spark,
            batch_df,
            table_dir,
            splits=splits,
            fs=fs,
            batch_id=epoch_id,
            **batch_kwargs,
        )

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    writer = reader.writeStream.foreachBatch(_publish).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
