"""Empirical scale-exponent harness for the heavy operator tail.

SCALE.md argues from plan shapes that the dedup/ANN/pipeline tail stays
~linear as the corpus grows; this module MEASURES it (VERDICT r6 #1): it
generates the same corpus at two sizes, runs each heavy query at both, and
reports the runtime scaling exponent

    alpha = ln(t_big / t_base) / ln(n_big / n_base)

— alpha ≈ 1 is linear, 2 is the quadratic blowup the banded/capped shapes
exist to prevent. Fixed per-query overhead (planning, session) biases alpha
DOWN at these sizes, so an exponent gate is a sound one-sided check against
super-linear regressions.

Two content models, because "10× the data" means different things per op:

- **dedup corpus** (``build_dedup_documents``): vocabulary GROWS with the
  corpus (md5 pseudo-words — the near-linear shingle-cardinality growth of
  a real crawl, Heaps' law regime), planted exact/near duplicate groups at
  a fixed RATE (n/200), and a corpus-hot stop phrase on ~80% of documents
  (the adversarial skew of tests/test_scale_smoke.py). Candidate volume
  under the df-cap / LSH bands should track n, not n².
- **vocab corpus** (``build_vocab_documents``): words drawn from the REAL
  fixture vocabulary with the fixture's lang/source strata, so the
  content-conditional pipelines (DSIR steering, topic tagging, the trained
  classifier gate) keep their sf0.1 selectivity at every scale — a
  pipeline that filters everything out measures nothing.

Embeddings (``build_embeddings``) are md5-derived floats with exact
duplicates planted at a fixed rate (1 in 20), so the LSH verify stage has
real survivors at every size.

Dials that SCALE.md documents as corpus-tracking are scaled here the same
way (and only those): ``n_planes`` for hyperplane LSH follows
ceil(log2(n)) (bucket occupancy ≈ 1 — the sizing rule in
ext/registry.py:xd_embcos_lsh's docstring). Everything else runs the
SHIPPED registry query untouched.
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_DOCS = 5_000  # sf0.1-equivalent documents rows
BASE_VECS = 2_000  # sf0.1-equivalent embeddings rows
STOP = "the quick brown fox jumps over the lazy dog"
_LANGS = ("en", "zh", "es", "de", "fr")


def _md5_idx(*parts) -> F.Column:
    """Deterministic pseudo-random non-negative int from md5 of the parts
    (first 6 hex digits → 0..16^6) — the seeded-generator primitive; pure
    codegen, no rand()/UDF."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("_", *[p.cast("string") for p in parts])), 1, 6),
        16,
        10,
    ).cast("long")


def build_dedup_documents(spark: SparkSession, n: int, seed: int = 0) -> DataFrame:
    """Scale-parameterized near-dup corpus (the test_scale_smoke shape):
    ``n`` unique 20-word md5-pseudo-word docs, n/200 planted groups (base +
    exact copy + near copy with one appended word), hot stop phrase on
    ~80% of unplanted docs. Schema matches the documents fixture."""
    groups = max(1, n // 200)
    words = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat_ws("_", F.lit(seed), F.col("text_key"), F.lit(str(j)))),
                1,
                7,
            )
            for j in range(20)
        ],
    )
    uniq = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.col("id").alias("text_key"),
        F.lit(0).alias("variant"),
    )
    exact = spark.range(groups).select(
        (F.col("id") + n).alias("doc_id"),
        F.col("id").alias("text_key"),
        F.lit(0).alias("variant"),
    )
    near = spark.range(groups).select(
        (F.col("id") + n + groups).alias("doc_id"),
        F.col("id").alias("text_key"),
        F.lit(1).alias("variant"),
    )
    df = uniq.unionByName(exact).unionByName(near).withColumn("text", words)
    df = df.withColumn(
        "text",
        F.when(
            F.col("variant") == 1,
            F.concat_ws(
                " ", F.col("text"), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7)
            ),
        ).otherwise(F.col("text")),
    )
    df = df.withColumn(
        "text",
        F.when(
            (F.col("doc_id") >= groups)
            & (F.col("doc_id") < n)
            & (F.col("doc_id") % 5 != 0),
            F.concat_ws(" ", F.col("text"), F.lit(STOP)),
        ).otherwise(F.col("text")),
    )
    return df.select(
        "doc_id",
        "text",
        F.element_at(
            F.array(*[F.lit(v) for v in _LANGS]),
            (_md5_idx(F.lit(seed + 1), F.col("doc_id")) % len(_LANGS) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def build_vocab_documents(
    spark: SparkSession, n: int, sf_dir: str, seed: int = 0
) -> DataFrame:
    """Scale-parameterized corpus in the FIXTURE's content distribution:
    24–56 words per doc drawn md5-uniformly from the real documents
    vocabulary (collected once — the fixture vocab is ~40 words, bounded),
    lang/source md5-assigned over the fixture's value sets. Keeps the
    content-conditional pipelines' selectivity stable across scales."""
    from haf_plug_play_spark.sources.tables import load_table

    vocab = sorted(
        r.w
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .collect()
    )
    varr = F.array(*[F.lit(w) for w in vocab])
    nw = (_md5_idx(F.lit(seed), F.col("doc_id")) % 33 + 24).cast("int")
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda j: F.element_at(
                varr,
                (_md5_idx(F.lit(seed + 2), F.col("doc_id"), j) % len(vocab) + 1).cast(
                    "int"
                ),
            ),
        ),
        " ",
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(v) for v in _LANGS]),
            (_md5_idx(F.lit(seed + 3), F.col("id")) % len(_LANGS) + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src"), (_md5_idx(F.lit(seed + 4), F.col("id")) % 20).cast("string")
        ).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def build_embeddings(
    spark: SparkSession, n: int, dim: int = 64, seed: int = 0
) -> DataFrame:
    """``n`` md5-derived float vectors in [-0.5, 0.5); every 20th row is an
    EXACT copy of its predecessor (cosine 1.0 — guaranteed LSH survivors at
    any scale). Schema matches the embeddings fixture."""
    src = F.when(
        (F.col("id") % 20 == 19) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            (_md5_idx(F.lit(seed + 5), src, j) % 100_000) / 100_000.0 - 0.5
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )


def make_corpus_dir(
    spark: SparkSession,
    out_dir: str,
    kind: str,
    n_docs: int,
    n_vecs: int,
    vocab_sf_dir: str = "/root/testdata/sf0.01",
    seed: int = 0,
) -> str:
    """Write a fixture-shaped directory (documents.parquet +
    embeddings.parquet) holding the generated corpus, so the SHIPPED
    registry queries run on it unmodified via ``load_table``. ``kind`` is
    ``dedup`` or ``vocab`` (which documents content model)."""
    os.makedirs(out_dir, exist_ok=True)
    if kind == "dedup":
        docs = build_dedup_documents(spark, n_docs, seed)
    elif kind == "vocab":
        docs = build_vocab_documents(spark, n_docs, vocab_sf_dir, seed)
    else:
        raise ValueError(f"unknown corpus kind {kind!r}")
    # spread writes across tasks so the scan at read time has >1 split
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    build_embeddings(spark, n_vecs, seed=seed).repartition(32).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def _embcos_lsh_scaled(n_vecs: int):
    """XD-embcos-lsh with the documented corpus-tracking dial: n_planes =
    ceil(log2(2·n_vecs)) (planted corpus doubles the rows) so bucket
    occupancy stays ≈ 1 at any scale."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from haf_plug_play_spark.ext import dedup
        from haf_plug_play_spark.ext.registry import _planted_corpus
        from haf_plug_play_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        planes = max(8, math.ceil(math.log2(max(2 * n_vecs, 2))))
        return dedup.embedding_cosine_pairs(
            _planted_corpus(emb), threshold=0.9, n_planes=planes
        )

    return run


def _qlm_hot_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XR-qlm against the generated corpus's hot stop-phrase words
    (``STOP``): the planted ~80%-document-frequency terms make every
    stop-carrying doc a candidate, so the measured exponent reflects the
    worst-case posting volume rather than the empty-result path the
    registry's fixed query terms would time on this corpus."""
    from haf_plug_play_spark.ext import retrieval
    from haf_plug_play_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return retrieval.qlm_topk(
        docs, ["quick", "brown", "fox", "lazy", "dog"], k=10
    )


def _overlap_certify_form(which: str, certify: bool):
    """The two overlap sketches with an explicit certify posture, on the
    registry's own item streams (one shared definition each) and the
    same lazy fan-out guard — so `XK-*-overlap` vs `XK-*-overlap-prod`
    is a pure certify=True/False A/B (VERDICT r13 #1a): identical scan,
    identical sketch stage; only the exact legs differ."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from haf_plug_play_spark.ext import sketch
        from haf_plug_play_spark.ext.registry import (
            _overlap_fanout_guard,
            _overlap_shingle_items,
            _source_word_items,
        )
        from haf_plug_play_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        items = (
            _overlap_shingle_items(docs)
            if which == "hll"
            else _source_word_items(docs)
        )
        guard = _overlap_fanout_guard(docs, "source")
        items = items.crossJoin(F.broadcast(guard)).drop("_fanout_guard")
        fn = sketch.hll_overlap if which == "hll" else sketch.kmv_overlap
        return fn(items, certify=certify)

    return run


def heavy_tail(n_vecs: int) -> dict[str, tuple[str, object]]:
    """query name → (corpus kind, callable(spark, sf_dir) -> DataFrame).
    The VERDICT r6 heavy tail plus the r7 additions (VERDICT r7 #5):
    XT-trigram-lm — the heaviest new query, whose 6-join token-stream
    shape is exactly what the alpha gate exists to certify, on the dedup
    corpus whose vocabulary grows per Heaps' law — and XS-recall, the
    two-top-k + k×k comparison whose cost should be scale-FLAT. Round 9
    adds the r8 heavies (VERDICT r8 #4): XK-hll — whose m-bounded
    register aggregation should measure near-flat, the harness's best
    demonstration that alpha reflects plan shape, not just size —
    XT-trigram-lm-pruned (the KenLM-style count-cutoff variant whose
    whole point is bounding the count-table footprint as the corpus
    grows), XT-ppl-gate (broadcast-join + CASE, no corpus window), and
    XD-minhash-acc (LSH-candidate-bounded audit). All but the
    dial-scaled LSH run the shipped registry callables."""
    from haf_plug_play_spark.ext import registry as reg

    return {
        "XD-ngram-jaccard": ("dedup", reg.xd_ngram_jaccard),
        "XD-containment": ("dedup", reg.xd_containment),
        "XD-span-removal": ("dedup", reg.xd_span_removal),
        "XD-cluster": ("dedup", reg.xd_cluster),
        "XD-embcos-lsh": ("dedup", _embcos_lsh_scaled(n_vecs)),
        "XD-minhash-acc": ("dedup", reg.xd_minhash_acc),
        "XS-ivfadc": ("dedup", reg.xs_ivfadc),
        "XS-recall": ("dedup", reg.xs_recall),
        "XT-trigram-lm": ("dedup", reg.xt_trigram_lm),
        "XT-trigram-lm-pruned": ("dedup", reg.xt_trigram_lm_pruned),
        "XT-ppl-gate": ("vocab", reg.xt_ppl_gate),
        "XK-hll": ("dedup", reg.xk_hll),
        "XP-pipeline5": ("vocab", reg.xp_pipeline5),
        "XP-pipeline6": ("vocab", reg.xp_pipeline6),
        # round 10 additions: the per-stratum sketch should measure like
        # XK-hll (register-bounded), the leakage audit like its pair
        # generator (LSH-candidate-bounded), and the Zipf fit like the
        # vocab-bounded LM count tables
        "XK-hll-strat": ("dedup", reg.xk_hll_strat),
        "XD-split-leak": ("dedup", reg.xd_split_leak),
        "XT-zipf": ("dedup", reg.xt_zipf),
        # round 11 additions: the overlap matrix should measure like
        # XK-hll-strat (register-bounded after one raw pass), the
        # cross-source leak like its pair generator, the stratified
        # top-k near-linear (local prune before the per-source rank),
        # and fertility like any keyed codegen agg
        "XK-hll-overlap": ("dedup", reg.xk_hll_overlap),
        "XD-source-leak": ("dedup", reg.xd_source_leak),
        "XA-topk-strat": ("dedup", reg.xa_topk_strat),
        "XT-fertility": ("dedup", reg.xt_fertility),
        "XT-kl-drift": ("dedup", reg.xt_kl_drift),
        "XT-ngram-novelty": ("dedup", reg.xt_ngram_novelty),
        "XA-reservoir": ("dedup", reg.xa_reservoir),
        # round 11 late additions: hybrid fusion's cost is its two
        # top-k legs (BM25 term stream + brute cosine — both corpus
        # passes, k-bounded outputs), burstiness is the unigram-LM agg
        # class, dedup-savings is the exact-census class plus one
        # same-key join. XD-lsh-planner is deliberately ABSENT: it
        # never scans the corpus (generated 128×200 grid only), so it
        # has no data exponent to measure.
        "XR-rrf": ("dedup", reg.xr_rrf),
        "XT-burstiness": ("dedup", reg.xt_burstiness),
        "XA-dedup-savings": ("dedup", reg.xa_dedup_savings),
        # per-doc entropy is the minimal two-agg diagnostic; DoReMi
        # reweighting re-aggregates the kl-drift (source, word) table
        "XT-entropy": ("dedup", reg.xt_entropy),
        "XA-doremi": ("dedup", reg.xa_doremi),
        # embedding QC scales with the vector table (two linear passes,
        # label-bounded output — 10 labels at every scale)
        "XS-embqc": ("dedup", reg.xs_embqc),
        # epoch planning is arithmetic over the doremi report; its cost
        # IS doremi's one (source, word) aggregation
        "XA-epoch-plan": ("dedup", reg.xa_epoch_plan),
        # r12: the drift monitor's batch form — one token pass against a
        # broadcast vocabulary-bounded reference LM, reduced by ONE
        # (window, source)-keyed agg; the XT-entropy cost class with a
        # time-bucket key instead of a doc key
        "QSD-stream-drift": ("vocab", reg.qsd_stream_drift),
        # r13: KMV rides the k-bounded WindowGroupLimit selection plus
        # the exact-census leg (so its measured exponent is the exact
        # leg's distinct-agg, like XK-hll's certify leg); QLM is the
        # XR-bm25 cost class — a query-term-filtered token pass with
        # broadcast cf/|C| and a TakeOrderedAndProject. The measured
        # QLM queries the corpus's HOT stop-phrase words (~80% of docs
        # are candidates — the worst-case posting volume; the registry's
        # fixed terms would match nothing here and time the empty path)
        "XK-kmv": ("dedup", reg.xk_kmv),
        "XR-qlm": ("dedup", _qlm_hot_terms),
        # the theta overlap should measure like XK-hll-overlap: one
        # k-bounded selection pass, then everything pairwise on
        # broadcast sketch rows; its exact pair self-join is the
        # droppable certify leg that dominates the measured cost
        "XK-theta-overlap": ("dedup", reg.xk_theta_overlap),
        # the multimodal decode+stats pass is the harness's one
        # Arrow/Python-path scale point: linear mapInPandas, no shuffle,
        # rows == docs — its exponent certifies the per-row Python cost
        # stays flat as partitions grow
        "XM-imagestats": ("dedup", reg.xm_imagestats),
        # r14 (VERDICT r13 #1): XK-cms was the only benched sketch
        # without a measured exponent — its depth×width counter table is
        # corpus-INdependent, so it should measure like XK-hll; the two
        # `-prod` entries are the certify=False production forms of the
        # overlap sketches on the registry's own item streams, turning
        # the "exact legs dominate, production drops them" claim into a
        # same-corpus timed A/B against their certified twins above
        "XK-cms": ("dedup", reg.xk_cms),
        "XK-hll-overlap-prod": ("dedup", _overlap_certify_form("hll", False)),
        "XK-theta-overlap-prod": (
            "dedup",
            _overlap_certify_form("theta", False),
        ),
        # r14 additions: PMI is the XT-bigram-lm keyed-agg class with a
        # count floor and a top-k (its surviving pairs here are the
        # planted stop-phrase bigrams — fixed at every scale); JSD is
        # the XT-kl-drift vocab-table reduction with a closed-form
        # absent-word tail (strata-bounded output)
        "XT-pmi": ("dedup", reg.xt_pmi),
        "XT-jsd": ("dedup", reg.xt_jsd),
    }


def measure(
    spark: SparkSession,
    work_dir: str,
    base_docs: int = BASE_DOCS,
    base_vecs: int = BASE_VECS,
    factor: int = 10,
    runs: int = 2,
    vocab_sf_dir: str = "/root/testdata/sf0.01",
    only: set[str] | None = None,
) -> dict:
    """Run the heavy tail at 1× and ``factor``× and compute per-query
    scaling exponents. Timing is min-of-``runs`` end-to-end (plan +
    execute + Arrow collect), matching bench.py's estimator; a warm-up
    query runs against each corpus dir first so scan/codegen bootstrap
    lands outside the timings. ``only`` restricts to a query subset (the
    100× spot-check runs just the two highest-alpha queries; building
    and sweeping the whole tail at 500k docs would measure nothing new).

    Returns {query: {"t_base": s, "t_big": s, "rows_base": k, "rows_big":
    k, "exponent": alpha}} plus a "_meta" entry."""
    sizes = {"base": (base_docs, base_vecs), "big": (base_docs * factor, base_vecs * factor)}
    tail_all = heavy_tail(base_vecs)
    if only is not None:
        missing = only - set(tail_all)
        if missing:
            raise ValueError(f"unknown heavy-tail queries: {sorted(missing)}")
    kinds_needed = {
        kind
        for name, (kind, _fn) in tail_all.items()
        if only is None or name in only
    }
    dirs: dict[tuple[str, str], str] = {}
    for label, (nd, nv) in sizes.items():
        for kind in sorted(kinds_needed):
            d = os.path.join(work_dir, f"{kind}_{label}")
            make_corpus_dir(spark, d, kind, nd, nv, vocab_sf_dir)
            dirs[(kind, label)] = d

    results: dict[str, dict] = {}
    for label, (nd, nv) in sizes.items():
        tail = {
            name: spec
            for name, spec in heavy_tail(nv).items()
            if only is None or name in only
        }
        # warm-up: touch each corpus so file listing + footer reads are paid
        for kind in sorted(kinds_needed):
            spark.read.parquet(
                os.path.join(dirs[(kind, label)], "documents.parquet")
            ).count()
        for name, (kind, fn) in tail.items():
            best, rows = None, 0
            for _ in range(runs):
                t0 = time.perf_counter()
                pdf = fn(spark, dirs[(kind, label)]).toPandas()
                t = time.perf_counter() - t0
                rows = len(pdf)
                best = t if best is None else min(best, t)
            entry = results.setdefault(name, {})
            entry[f"t_{label}"] = round(best, 3)
            entry[f"rows_{label}"] = rows
    for name, entry in results.items():
        entry["exponent"] = round(
            math.log(max(entry["t_big"], 1e-9) / max(entry["t_base"], 1e-9))
            / math.log(factor),
            3,
        )
    results["_meta"] = {
        "base_docs": base_docs,
        "base_vecs": base_vecs,
        "factor": factor,
        "runs": runs,
    }
    return results
