"""Collocation mining over the corpus word stream.

Lives in its own module (not ext/text.py) so registering new
collocation operators never git-invalidates the banked driver evidence
of the ~30 XT queries whose wrappers depend on ext/text.py — the same
placement rule as QSD-stream-drift (ext/registry.py r12 note): the
rotation's file signal tracks a wrapper's imported modules, so a new
operator family gets a new file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information
    (public method: Church & Hanks 1990, "Word Association Norms,
    Mutual Information, and Lexicography") — the corpus-level
    multi-word-expression detector a tokenizer/vocabulary pipeline reads
    before deciding merge candidates, and the complement of raw bigram
    frequency (XT-ngrams): PMI ranks by ASSOCIATION STRENGTH
    ln(p(x,y) / (p(x)·p(y))), so "los angeles" outranks "of the" even
    though the latter is far more frequent. ``min_count`` is the
    standard PMI noise floor — a pair seen once has maximal spurious
    PMI, so rare pairs are excluded before ranking, not after.

    Plan shape: the (prev, word) stream is one zip+explode
    (the bigram_lm_scores stream); bigram and unigram counts are
    map-side-combinable hash aggregations, so each exchange carries
    Heaps-law vocabulary-bounded rows, and the unigram table joins the
    vocab-bounded BIGRAM TABLE (never the token stream) on each side's
    word key. Catalyst shares no subtrees across DataFrame branches, so
    each count table re-derives the column-pruned token scan — the
    XT-bigram-lm cost class, deliberately chosen over a single
    ROLLUP(w, pv) pass: grouping sets put an Expand ×3 on the
    corpus-sized stream and the rollup subtree would be branch-
    recomputed by its four consumers anyway, tripling every re-scan.
    Scalar totals ride broadcast single rows; the top-k compiles to
    TakeOrderedAndProject.

    Output: (w1, w2, n_pair, pmi) — the ``k`` highest-PMI adjacent
    pairs with n_pair >= min_count, PMI descending (6-dp rounded, with
    (w1, w2) as the deterministic tie-break).

    Tokenization convention (ADVICE r14): this stream splits on single
    spaces WITHOUT filtering empty tokens, deliberately matching
    ext/text.py's bigram_lm_scores stream (consecutive/trailing spaces
    yield "" tokens in both, and the DuckDB oracle mirrors it) — NOT
    report.py's ``_words``, which filters ``w != ''`` for JSD/KL. The
    two conventions are each internally consistent with their oracles;
    unifying them would silently change banked oracle results on both
    sides, so any future unification must change engine + oracle
    together and re-front every dependent query for re-verification.
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(words)
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(words, 1, F.greatest(n - F.lit(1), F.lit(0))),
    )
    tok = df.select(
        F.explode(
            F.zip_with(
                words, prevs,
                lambda a, b: F.struct(a.alias("w"), b.alias("pv")),
            )
        ).alias("t")
    ).select(F.col("t.w").alias("w"), F.col("t.pv").alias("pv"))
    uni = tok.groupBy("w").agg(F.count("*").alias("_cu"))
    total = uni.agg(F.sum("_cu").alias("_n"))
    bi = (
        tok.filter(F.col("pv").isNotNull())
        .groupBy("pv", "w")
        .agg(F.count("*").alias("_cb"))
        .filter(F.col("_cb") >= int(min_count))
    )
    nb = (
        tok.filter(F.col("pv").isNotNull())
        .groupBy()
        .agg(F.count("*").alias("_nb"))
    )
    u1 = uni.select(F.col("w").alias("pv"), F.col("_cu").alias("_c1"))
    u2 = uni.select("w", F.col("_cu").alias("_c2"))
    pmi = F.log(
        (F.col("_cb") / F.col("_nb"))
        / ((F.col("_c1") / F.col("_n")) * (F.col("_c2") / F.col("_n")))
    )
    return (
        bi.join(u1, "pv")
        .join(u2, "w")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("pv").alias("w1"),
            F.col("w").alias("w2"),
            F.col("_cb").cast("long").alias("n_pair"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(int(k))
    )
