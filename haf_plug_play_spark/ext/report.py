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


def source_word_counts(docs: DataFrame) -> DataFrame:
    """The (source, word) → count vocabulary table every distributional
    diagnostic reduces from — built ONCE and shared (VERDICT r11 #5):
    kl_drift_report and doremi_weights re-aggregate it directly, and
    zipf_diagnostic's global word counts are its per-word sums. One
    map-side-combinable keyed agg over the corpus; output is
    vocabulary × sources bounded (Heaps-law sublinear in corpus size),
    which is what makes persisting it in corpus_report safe."""
    return _words(docs, "source").groupBy("source", "w").agg(
        F.count("*").alias("c_sw")
    )


def _source_word_stats(sw: DataFrame) -> DataFrame:
    """Per-source distributional stats from the shared vocab table, in
    ONE aggregation: n_tokens, n_types, the KL(P_source ‖ P_corpus) sum
    and the cross-entropy sum — so the kl_drift and doremi legs of a
    report are a single corpus pass instead of two identical ones. The
    per-aggregate FP operation sequences are unchanged from the
    previously-separate forms (each sum still reduces the same terms),
    so the 6-dp oracle parity carries over."""
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    totals = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    n_tot = sw.agg(F.sum("c_sw").alias("n"))
    joined = (
        sw.join(cw, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(n_tot))
    )
    p_sw = F.col("c_sw") / F.col("n_s")
    p_w = F.col("c_w") / F.col("n")
    return joined.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(p_sw * F.log(p_sw / p_w)).alias("_kl"),
        (-F.sum(p_sw * F.log(p_w))).alias("_xent"),
        F.max("n").alias("_n"),
    )


def zipf_diagnostic(
    docs: DataFrame, word_counts: DataFrame | None = None
) -> DataFrame:
    """One row (n_tokens, n_types, ttr, zipf_slope, zipf_r2): weighted
    least-squares fit of ln(frequency) on ln(rank) over the frequency
    HISTOGRAM — see ext/registry.py:xt_zipf for the full scale
    derivation (histogram provably ≤ √(2·n_tokens) rows; tied counts
    enter as one midpoint-log-rank point; degenerate vocabularies yield
    NULL slope/R² in both engines). ``word_counts`` optionally supplies
    a precomputed (w, c) table — corpus_report passes the per-word sums
    of the shared source_word_counts table, which are the identical
    integers, so the fit is unchanged."""
    from pyspark.sql import Window as W

    if word_counts is None:
        word_counts = _words(docs).groupBy("w").agg(F.count("*").alias("c"))
    counts = word_counts
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


def kl_drift_report(docs: DataFrame, sw: DataFrame | None = None) -> DataFrame:
    """(source, n_tokens, n_types, kl_nats) per source — KL(P_source ‖
    P_corpus) over word unigrams; see ext/registry.py:xt_kl_drift.
    ``sw`` optionally supplies the shared source_word_counts table
    (corpus_report persists one and feeds it to this leg AND doremi)."""
    if sw is None:
        sw = source_word_counts(docs)
    return (
        _source_word_stats(sw)
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.round(F.col("_kl"), 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


def jsd_drift_report(docs: DataFrame, sw: DataFrame | None = None) -> DataFrame:
    """(source, n_tokens, n_types, jsd_nats) per source —
    Jensen-Shannon divergence JSD(P_source ‖ P_corpus) over word
    unigrams (public method: Lin 1991, "Divergence measures based on
    the Shannon entropy"): the SYMMETRIC, bounded-[0, ln 2] complement
    of XT-kl-drift's KL, finite even when a source is missing corpus
    words — the drift ranking that stays comparable across sources
    with very different vocabulary coverage, where raw KL of the
    converse direction would be +∞.

    With M = ½(P_s + P), JSD = ½·KL(P_s‖M) + ½·KL(P‖M). The second
    term sums over ALL corpus words, but words ABSENT from the source
    (p_sw = 0, so m_w = p_w/2) each contribute exactly p_w·ln 2 — so
    the absent-word tail folds CLOSED-FORM into
    ½·ln 2·(1 − corpus mass of the source's own vocabulary), and the
    computation never materializes the source × vocabulary cross
    product: one join over the (source, word) rows that EXIST, one
    per-source aggregation, same cost class as kl_drift_report.
    ``sw`` optionally supplies the shared source_word_counts table.

    FP caveat: the per-source sums reassociate across the shuffle (the
    kl_drift caveat family, absorbed by 6-dp rounding)."""
    import math

    if sw is None:
        sw = source_word_counts(docs)
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    totals = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    n_tot = sw.agg(F.sum("c_sw").alias("n"))
    joined = (
        sw.join(cw, "w")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(n_tot))
    )
    p_sw = F.col("c_sw") / F.col("n_s")
    p_w = F.col("c_w") / F.col("n")
    m = (p_sw + p_w) / F.lit(2.0)
    agg = joined.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(p_sw * F.log(p_sw / m) + p_w * F.log(p_w / m)).alias("_pres"),
        F.sum(p_w).alias("_mass"),
    )
    jsd = F.lit(0.5) * F.col("_pres") + F.lit(0.5 * math.log(2.0)) * (
        F.lit(1.0) - F.col("_mass")
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(jsd, 6).alias("jsd_nats"),
    ).orderBy("source")


def report_frames(
    docs: DataFrame,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """The six diagnostic DataFrames behind ``corpus_report``, built
    around ONE shared (source, word) vocab table (returned second, for
    the caller to persist/unpersist around its collects): the zipf,
    kl_drift, and doremi legs all reduce from it, so with it cached the
    whole bundle is FOUR corpus passes — vocab build, fertility,
    entropy (doc-keyed tokenization with source carried through, no
    join-back scan), and shingle-HLL — down from the ~6–7 independent
    passes of the per-function forms (VERDICT r11 #5)."""
    from haf_plug_play_spark.ext import sketch

    sw = source_word_counts(docs)
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c"))
    ent = (
        doc_entropy(docs.select("doc_id", "source", "text"), carry=("source",))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("norm_entropy"), 6).alias("mean_norm_entropy"),
            F.round(F.min("norm_entropy"), 6).alias("min_norm_entropy"),
        )
        .orderBy("source")
    )
    ws = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - F.lit(2), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, 3)))
    items = docs.select("source", F.explode(shingles).alias("item"))
    frames = {
        "zipf": zipf_diagnostic(docs, word_counts=cw),
        "fertility": fertility_report(docs),
        "kl_drift": kl_drift_report(docs, sw=sw),
        "doremi_weights": doremi_weights(docs, sw=sw),
        "entropy_by_source": ent,
        "distinct_shingles_hll": sketch.hll_distinct_by_group(
            items, certify=False
        ),
    }
    return frames, sw


def corpus_report(docs: DataFrame, persist: bool = False) -> dict:
    """The ``report`` CLI's payload: global Zipf/Heaps structure,
    per-(source, lang) tokenizer fertility, per-source KL drift,
    per-source DoReMi mixture weights, per-source normalized-entropy
    summary (mean + min — the boilerplate screen at a glance), and
    per-source distinct-3-gram-shingle estimates via the HLL
    ``certify=False`` production path. Every leg's output is one row or
    strata-bounded, so the collects here are bounded by construction.

    The shared (source, word) vocab table is ALWAYS persisted across
    the bundle's collects (vocabulary × sources bounded — Heaps-law
    sublinear — so the cache is safe at any corpus size); ``persist``
    additionally caches ``docs`` itself. MEASURED (r14, min-of-2,
    vocab corpus): persist buys a flat ~12% at both 1× and 10× —
    not a multiple, because the passes already share the cached vocab
    table and the corpus re-scans are column-pruned parquet reads.
    Crossover: persist wins modestly while the corpus fits in cluster
    memory; past that the cache spills and the re-scan wins — so the
    default stays False and True is the interactive/sf-scale dial."""
    if persist:
        docs = docs.persist()
    frames, sw = report_frames(docs)
    sw = sw.persist()
    try:
        zipf = frames["zipf"].collect()[0].asDict()
        out = {
            "zipf": zipf,
            **{
                k: [r.asDict() for r in frames[k].collect()]
                for k in (
                    "fertility",
                    "kl_drift",
                    "doremi_weights",
                    "entropy_by_source",
                    "distinct_shingles_hll",
                )
            },
        }
    finally:
        sw.unpersist()
        if persist:
            docs.unpersist()
    return out


def doc_entropy(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
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
    degenerate-input rule: both engines return the same literal).
    ``carry`` threads extra doc-level columns (functionally determined
    by doc_id, e.g. source) through the aggregation so a per-stratum
    summary needs no second corpus scan for a join-back."""
    keys = ["doc_id", *carry]
    c = _words(docs, *keys).groupBy(*keys, "w").agg(
        F.count("*").alias("c")
    )
    d = c.groupBy(*keys).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.log2("c")).alias("_s"),
    )
    h = F.log2("n_tokens") - F.col("_s") / F.col("n_tokens")
    return d.select(
        *keys,
        "n_tokens",
        F.round(h, 6).alias("entropy_bits"),
        F.when(F.col("n_tokens") > 1, F.round(h / F.log2("n_tokens"), 6))
        .otherwise(0.0)
        .alias("norm_entropy"),
    ).orderBy("doc_id")


def doremi_weights(
    docs: DataFrame, temperature: float = 1.0, sw: DataFrame | None = None
) -> DataFrame:
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
    reassociate (avg_logp family, 6-dp rounding). ``sw`` optionally
    supplies the shared source_word_counts table — corpus_report builds
    it ONCE for the kl_drift and doremi legs (VERDICT r11 #5)."""
    if sw is None:
        sw = source_word_counts(docs)
    xent = _source_word_stats(sw).withColumn(
        "_share", F.col("n_tokens") / F.col("_n")
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
