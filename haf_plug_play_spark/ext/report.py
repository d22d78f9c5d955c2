"""Corpus diagnostic reports over an arbitrary documents DataFrame.

The DataFrame-parameterized forms of the registry's diagnostic queries
(XT-zipf, XT-fertility, XT-kl-drift — ext/registry.py delegates here so
the oracle gate certifies these exact expressions every round), plus
``corpus_report`` — the one-call operational bundle behind the ``report``
CLI: every output is strata-bounded or single-row, so the driver-side
collect is bounded by construction, and the per-source distinct-shingle
estimates run the HLL family's ``certify=False`` PRODUCTION path (the
sketch is the answer; no exact legs, no distinct-aggregation shuffle).

All expressions are codegen (no UDFs); the only window runs over the
√(2·n_tokens)-bounded count-of-counts histogram (see ``zipf_diagnostic``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from haf_plug_play_spark.ext import text as xt


def _words(docs: DataFrame, *keys: str) -> DataFrame:
    return docs.select(
        *keys, F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")


def zipf_diagnostic(docs: DataFrame) -> DataFrame:
    """One row (n_tokens, n_types, ttr, zipf_slope, zipf_r2): weighted
    least-squares fit of ln(frequency) on ln(rank) over the frequency
    HISTOGRAM — see ext/registry.py:xt_zipf for the full scale
    derivation (histogram provably ≤ √(2·n_tokens) rows; tied counts
    enter as one midpoint-log-rank point; degenerate vocabularies yield
    NULL slope/R² in both engines)."""
    from pyspark.sql import Window as W

    counts = _words(docs).groupBy("w").agg(F.count("*").alias("c"))
    hist = counts.groupBy("c").agg(F.count("*").alias("n"))
    cum = W.orderBy(F.desc("c")).rowsBetween(W.unboundedPreceding, -1)
    binned = hist.select(
        F.col("n").cast("double").alias("wt"),
        F.log(
            F.coalesce(F.sum("n").over(cum), F.lit(0))
            + (F.col("n") + 1) / 2.0
        ).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
        (F.col("c") * F.col("n")).alias("tok"),
    )
    m = binned.agg(
        F.sum("tok").alias("tok"),
        F.sum("wt").alias("s"),
        F.sum(F.col("wt") * F.col("x")).alias("sx"),
        F.sum(F.col("wt") * F.col("y")).alias("sy"),
        F.sum(F.col("wt") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("wt") * F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("wt") * F.col("x") * F.col("y")).alias("sxy"),
    )
    s = F.col("s")
    cov = F.col("sxy") / s - (F.col("sx") / s) * (F.col("sy") / s)
    varx = F.col("sxx") / s - (F.col("sx") / s) * (F.col("sx") / s)
    vary = F.col("syy") / s - (F.col("sy") / s) * (F.col("sy") / s)
    return m.select(
        F.col("tok").cast("long").alias("n_tokens"),
        s.cast("long").alias("n_types"),
        F.round(s / F.col("tok"), 6).alias("ttr"),
        F.round(F.when(varx > 0, cov / varx), 6).alias("zipf_slope"),
        F.round(
            F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary)), 6
        ).alias("zipf_r2"),
    )


def fertility_report(docs: DataFrame) -> DataFrame:
    """(source, lang, n_docs, n_tokens, fertility_ws, chars_per_token)
    per stratum — see ext/registry.py:xt_fertility."""
    per = docs.select(
        "source",
        "lang",
        xt.n_tokens_re(F.col("text")).alias("_re"),
        xt.n_tokens_ws(F.col("text")).alias("_ws"),
        F.length("text").cast("long").alias("_ch"),
    )
    return (
        per.groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_re").cast("long").alias("n_tokens"),
            F.round(F.sum("_re") / F.sum("_ws"), 6).alias("fertility_ws"),
            F.round(F.sum("_ch") / F.sum("_re"), 6).alias("chars_per_token"),
        )
        .orderBy("source", "lang")
    )


def kl_drift_report(docs: DataFrame) -> DataFrame:
    """(source, n_tokens, n_types, kl_nats) per source — KL(P_source ‖
    P_corpus) over word unigrams; see ext/registry.py:xt_kl_drift."""
    sw = _words(docs, "source").groupBy("source", "w").agg(
        F.count("*").alias("c_sw")
    )
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    totals = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    n_tot = sw.agg(F.sum("c_sw").alias("n")).select("n")
    joined = (
        sw.join(cw, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(n_tot))
    )
    p_sw = F.col("c_sw") / F.col("n_s")
    p_w = F.col("c_w") / F.col("n")
    return (
        joined.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.round(F.sum(p_sw * F.log(p_sw / p_w)), 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


def corpus_report(docs: DataFrame) -> dict:
    """The ``report`` CLI's payload: global Zipf/Heaps structure,
    per-(source, lang) tokenizer fertility, per-source KL drift,
    per-source DoReMi mixture weights, per-source normalized-entropy
    summary (mean + min — the boilerplate screen at a glance), and
    per-source distinct-3-gram-shingle estimates via the HLL
    ``certify=False`` production path. Every leg's output is one row or
    strata-bounded, so the collects here are bounded by construction."""
    from haf_plug_play_spark.ext import sketch

    zipf = zipf_diagnostic(docs).collect()[0].asDict()
    fert = [r.asDict() for r in fertility_report(docs).collect()]
    kl = [r.asDict() for r in kl_drift_report(docs).collect()]
    doremi = [r.asDict() for r in doremi_weights(docs).collect()]
    ent = [
        r.asDict()
        for r in (
            doc_entropy(docs.select("doc_id", "text"))
            .join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.round(F.avg("norm_entropy"), 6).alias("mean_norm_entropy"),
                F.round(F.min("norm_entropy"), 6).alias("min_norm_entropy"),
            )
            .orderBy("source")
            .collect()
        )
    ]
    ws = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - F.lit(2), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, 3)))
    items = docs.select("source", F.explode(shingles).alias("item"))
    distinct_shingles = [
        r.asDict()
        for r in sketch.hll_distinct_by_group(items, certify=False).collect()
    ]
    return {
        "zipf": zipf,
        "fertility": fert,
        "kl_drift": kl,
        "doremi_weights": doremi,
        "entropy_by_source": ent,
        "distinct_shingles_hll": distinct_shingles,
    }


def doc_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy of the doc's OWN word distribution
    (bits), plus the length-normalized form in [0, 1] — the classic
    gibberish/boilerplate screen: near-zero entropy is a repeated-token
    artifact, near-one is a vocabulary-saturated document. Computed as
    H = log2(L) − (Σ c·log2 c)/L from one (doc, word) count aggregation
    and one doc-keyed aggregation — both map-side-combinable, no joins,
    no windows; linear in token occurrences at any corpus size. FP
    caveat: the Σ c·log2 c sum reassociates across the shuffle
    (avg_logp family, absorbed by 6-dp rounding). norm_entropy divides
    by log2(L), NULL-guarded to 0.0 for single-token docs (the XT-zipf
    degenerate-input rule: both engines return the same literal)."""
    c = _words(docs, "doc_id").groupBy("doc_id", "w").agg(
        F.count("*").alias("c")
    )
    d = c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.log2("c")).alias("_s"),
    )
    h = F.log2("n_tokens") - F.col("_s") / F.col("n_tokens")
    return d.select(
        "doc_id",
        "n_tokens",
        F.round(h, 6).alias("entropy_bits"),
        F.when(F.col("n_tokens") > 1, F.round(h / F.log2("n_tokens"), 6))
        .otherwise(0.0)
        .alias("norm_entropy"),
    ).orderBy("doc_id")


def doremi_weights(docs: DataFrame, temperature: float = 1.0) -> DataFrame:
    """One-shot domain reweighting in the DoReMi spirit (Xie et al.
    2023, public method, simplified to a single pass with the corpus
    unigram LM standing in for the proxy model): a source whose tokens
    are HARDER than average under the corpus distribution (mean
    surprisal above the token-share-weighted corpus mean — which is
    exactly the corpus entropy) is upweighted exponentially,

        weight_i ∝ share_i · exp((xent_i − H_corpus) / T),

    normalized to Σ = 1. Output per source: token share, cross-entropy
    vs the corpus unigram distribution (nats), excess, and the final
    mixture weight — the actionable knob a 100 TB training run feeds
    back into its sampler (XA-weighted-mix / XA-temperature take it
    from here).

    Scale shape: the SAME one (source, word) aggregation as
    kl_drift_report — corpus totals and per-source totals re-aggregate
    from that vocab-bounded table (AQE reuses the sw exchange); the
    corpus entropy needs NO branch of its own: since Σ_s c_sw = c_w,
    H_corpus = −Σ_w (c_w/n)·ln(c_w/n) = Σ_s share_s·xent_s exactly, so
    it re-aggregates from the ≤|sources|-row report itself — and the
    oracle SQL mirrors the identical form so both engines sum the same
    ≤|sources| doubles. The weight normalizer is the same tiny agg.
    FP caveat: the surprisal sums and the ≤|sources|-row hc/normalizer
    reassociate (avg_logp family, 6-dp rounding)."""
    sw = _words(docs, "source").groupBy("source", "w").agg(
        F.count("*").alias("c_sw")
    )
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    totals = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    n_tot = sw.agg(F.sum("c_sw").alias("n"))
    xent = (
        sw.join(cw, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            (-F.sum((F.col("c_sw") / F.col("n_s")) * F.log(F.col("c_w") / F.col("n"))))
            .alias("_xent"),
            F.max("n").alias("_n"),
        )
        .withColumn("_share", F.col("n_tokens") / F.col("_n"))
    )
    # H_corpus = Σ_s share_s · xent_s (token-share-weighted mean
    # surprisal) and the weight normalizer are UNPARTITIONED WINDOW
    # sums over the ≤|sources|-row report — bounded by construction
    # (the strata-bounded sibling of the top-k defense), and windows
    # keep them in THIS subtree: a separate .agg() + crossJoin would
    # replan the whole corpus aggregation once per scalar (measured:
    # 18 parquet scans in the executed plan vs 6 this way)
    from pyspark.sql import Window

    whole = Window.partitionBy()
    raw = (
        xent.withColumn(
            "_excess",
            F.col("_xent") - F.sum(F.col("_share") * F.col("_xent")).over(whole),
        )
        .withColumn(
            "_wraw", F.col("_share") * F.exp(F.col("_excess") / float(temperature))
        )
        .withColumn("_z", F.sum("_wraw").over(whole))
    )
    return (
        raw.select(
            "source",
            "n_tokens",
            F.round("_share", 6).alias("token_share"),
            F.round("_xent", 6).alias("xent_nats"),
            F.round("_excess", 6).alias("excess_nats"),
            F.round(F.col("_wraw") / F.col("_z"), 6).alias("weight"),
        )
        .orderBy("source")
    )


def epoch_plan(
    docs: DataFrame, budget: int, temperature: float = 1.0
) -> DataFrame:
    """Data-constrained training allocation (the Muennighoff et al. 2022
    "Scaling Data-Constrained Language Models" accounting, public
    method): given a total token ``budget`` and the DoReMi mixture
    weights, how many tokens each source is allocated and how many
    EPOCHS of it that implies — epochs > 1 flags the sources the run
    will repeat (where data, not compute, is the binding constraint).

    Derived entirely from the ≤|sources|-row doremi_weights report, so
    the engine/oracle parity is arithmetic on already-matching 6-dp
    values (weight, n_tokens) — no new corpus pass, no new caveats."""
    w = doremi_weights(docs, temperature=temperature)
    alloc = F.lit(float(budget)) * F.col("weight")
    return w.select(
        "source",
        "n_tokens",
        "weight",
        F.round(alloc).cast("long").alias("allocated_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("epochs"),
        (alloc / F.col("n_tokens") > 1.0).alias("repeated"),
    ).orderBy("source")
