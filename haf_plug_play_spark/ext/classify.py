"""Model-based quality filtering — the fastText/CCNet-style linear
classifier over hashed n-gram features (public method: Joulin et al. 2016
fastText; the GPT-3 appx. A quality-classifier setup: positives = a
curated reference corpus, negatives = raw crawl, keep documents the model
scores reference-like).

This is the learned sibling of the rule-based gates in ext/text.py and the
likelihood-ratio scorer in ext/sampling.py (DSIR): same portable hashed
unigram+bigram featurizer, but the per-bucket coefficients are TRAINED
with logistic regression instead of derived from count ratios.

Scale shape, inference: the model is n_buckets floats baked in as an array
LITERAL — scoring is one explode + element_at + keyed sum, zero joins,
zero Python (exactly the DSIR plan with learned weights). Scale shape,
training: weights are bounded model state (like IVF centroids), so each
gradient-descent iteration is ONE distributed pass — per-doc margins via a
keyed agg over the feature stream, per-bucket gradients via a second keyed
agg — and only n_buckets+1 floats cross to the driver per iteration; the
corpus never moves.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _feature_stream(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, _b bucket) hashed occurrence stream over THE shared
    unigram+bigram featurizer (ext/hashing.py:unigram_bigram_features —
    one definition, used verbatim by dsir_weights, so the two scorers
    can never silently diverge)."""
    from haf_plug_play_spark.ext.hashing import md5_int, unigram_bigram_features

    return docs.select(
        F.col(id_col),
        F.explode(unigram_bigram_features(F.col(text_col))).alias("_f"),
    ).withColumn("_b", md5_int(F.col("_f")) % n_buckets)


def seed_weights(n_buckets: int = 128, seed: int = 23) -> list[float]:
    """Deterministic pseudo-random coefficients in [-0.5, 0.5] — the
    fixed-model artifact for the oracle-gated canonical query (training
    itself is iterative and stays under the pytest gate, the same split
    as BPE learning vs application)."""
    rng = random.Random(seed)
    return [rng.uniform(-0.5, 0.5) for _ in range(n_buckets)]


def lr_score(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classifier inference: p = sigmoid(bias + Σ_features w[bucket]/n_feats)
    (mean-pooled hashed features — the fastText formulation, which keeps
    the margin scale independent of document length).

    One explode + element_at on the weight LITERAL + one keyed agg — no
    joins, nothing corpus-sized beyond the feature stream itself. The
    margin is rounded to 6 dp BEFORE the sigmoid so the oracle's exp()
    sees the identical argument; exp parity is the same last-ulp caveat
    family as the ln() scorers (documented, absorbed by 6-dp rounding).

    Output: (id, n_feats, margin, p_keep, keep) ordered by id; documents
    with no words produce no row (no features ⇒ nothing to score), the
    dsir_weights convention.
    """
    warr = F.array(*[F.lit(float(w)) for w in weights])
    feats = _feature_stream(docs, id_col, text_col, len(weights))
    agg = feats.groupBy(id_col).agg(
        F.count("*").alias("n_feats"),
        F.sum(
            F.element_at(warr, (F.col("_b") + 1).cast("int"))
        ).alias("_wsum"),
    )
    margin = F.round(
        F.lit(float(bias)) + F.col("_wsum") / F.col("n_feats"), 6
    )
    staged = agg.select(
        F.col(id_col),
        F.col("n_feats").cast("long").alias("n_feats"),
        margin.alias("margin"),
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6)
    return staged.select(
        id_col,
        "n_feats",
        "margin",
        p.alias("p_keep"),
        (p >= F.lit(float(threshold))).alias("keep"),
    ).orderBy(id_col)


def train_lr(
    docs: DataFrame,
    label_filter: Column,
    n_buckets: int = 128,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    balanced: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[float, list[float]]:
    """Train the classifier with declarative batch gradient descent:
    positives are rows matching ``label_filter`` (the curated reference
    subset), negatives everything else. Returns (bias, weights) to feed
    ``lr_score``.

    ``balanced=True`` (default) weights each class's residuals by
    1/(2·n_class) — standard class-balanced logistic regression. The
    reference-vs-crawl setup is always imbalanced (a small curated
    corpus against a huge crawl), and unbalanced GD parks the decision
    boundary deep inside the majority class, scoring even perfect
    reference look-alikes below any fixed threshold.

    Each iteration is one distributed pass: per-doc mean-pooled margins
    (keyed agg over the feature stream with the CURRENT weights as a
    literal array), sigmoid residuals p−y, then per-bucket gradient sums
    Σ (p−y)/n_feats re-keyed on the bucket — both aggregations map-side
    combinable; only n_buckets+1 gradient floats reach the driver (the
    ivf_centroids bounded-hop contract). The feature stream is
    localCheckpointed once; iterations do not regrow lineage.

    pytest gates (tests/test_ext.py): training strictly reduces log-loss
    vs the zero model, and separates planted vocabularies completely.
    """
    # BUCKET-PARTITION the feature stream ONCE (repartition on the doc id
    # + a partitioning-PRESERVING persist): every iteration's per-doc
    # margin aggregate then runs exchange-free on the cached scan
    # (HashPartitioning(id) satisfies the groupBy(id) distribution), and
    # the gradient join's stream side never shuffles — the r6 verdict's
    # per-iteration full-stream shuffle. localCheckpoint was the r6
    # materializer; it drops outputPartitioning (plain ExistingRDD scan),
    # so Spark re-partitioned the whole stream EVERY iteration.
    # MEMORY_AND_DISK persist is the standard iterative-ML posture
    # (spills, never recomputes); plan pinned by
    # tests/test_plans.py::test_classifier_iteration_shuffle_free.
    feats = (
        _feature_stream(docs, id_col, text_col, n_buckets)
        .join(
            docs.select(
                F.col(id_col),
                F.coalesce(label_filter, F.lit(False))
                .cast("double")
                .alias("_y"),
            ),
            id_col,
        )
        .repartition(F.col(id_col))
        .persist()
    )
    try:
        class_counts = {
            r._y: r.n
            for r in feats.select(id_col, "_y")
            .distinct()
            .groupBy("_y")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n_pos = int(class_counts.get(1.0, 0))
        n_neg = int(class_counts.get(0.0, 0))
        n_docs = n_pos + n_neg
        if balanced and n_pos and n_neg:
            wpos, wneg = 1.0 / (2 * n_pos), 1.0 / (2 * n_neg)
        else:
            wpos = wneg = 1.0 / max(n_docs, 1)
        bias = 0.0
        weights = [0.0] * n_buckets
        for _ in range(iters):
            # ONE action per iteration: per-bucket weight gradients
            # unioned with the bias gradient as sentinel bucket -1 (the
            # bias sums _r once per DOC, so it rides the resid table, not
            # the feature stream), all collected together — n_buckets+1
            # rows
            rows = _iteration_gradients(
                feats, id_col, weights, bias, wpos, wneg
            ).collect()
            new = list(weights)
            gbias = 0.0
            for r in rows:
                # snap each collected gradient to the 1e-9 grid: the
                # cross-partition sums it comes from reassociate at
                # ~1e-17 between runs (shuffle-fetch order is not
                # stable), so without the snap "rerun determinism" held
                # only by luck — observed rerun drift was last-ulp. The
                # grid is ~7 orders above the noise and ~7 below the
                # gradient scale, so reruns are bit-identical and GD is
                # unaffected; every later update is driver arithmetic on
                # identical floats.
                g = round(r._g, 9) if r._g is not None else 0.0
                if r._b == -1:
                    gbias = g
                else:
                    # class weights sum to 1 → gradients are already means
                    new[r._b] = weights[r._b] - lr * (g + l2 * weights[r._b])
            weights = new
            bias = bias - lr * gbias
    finally:
        feats.unpersist()
    return bias, weights


def _iteration_gradients(
    feats: DataFrame,
    id_col: str,
    weights: list[float],
    bias: float,
    wpos: float,
    wneg: float,
) -> DataFrame:
    """One GD iteration's gradient table (n_buckets weight rows + the
    bias sentinel row _b = -1) over the partition-pinned feature stream.

    Plan contract (tests/test_plans.py): the per-doc margin aggregate and
    the gradient join reuse the stream's HashPartitioning(id) — the only
    ENSURE_REQUIREMENTS exchange is the bounded per-bucket re-key (≤
    n_buckets rows after map-side partial aggregation). The label rides
    the margin aggregate as ``max(_y)`` (constant per doc), keeping the
    grouping key to the id alone so the pinned partitioning satisfies it.
    """
    warr = F.array(*[F.lit(float(w)) for w in weights])
    margins = feats.groupBy(id_col).agg(
        F.count("*").alias("_nf"),
        F.sum(F.element_at(warr, (F.col("_b") + 1).cast("int"))).alias("_ws"),
        F.max("_y").alias("_y"),
    )
    cw = F.when(F.col("_y") == 1.0, F.lit(wpos)).otherwise(F.lit(wneg))
    resid = margins.select(
        F.col(id_col),
        F.col("_nf"),
        (
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.lit(bias) + F.col("_ws") / F.col("_nf"))))
                - F.col("_y")
            )
            * cw
        ).alias("_r"),
    )
    per_bucket = (
        feats.join(resid, id_col)
        .groupBy("_b")
        .agg(F.sum(F.col("_r") / F.col("_nf")).alias("_g"))
    )
    bias_row = resid.groupBy().agg(F.sum("_r").alias("_g")).select(
        F.lit(-1).alias("_b"), "_g"
    )
    return per_bucket.unionByName(bias_row)


def train_lr_crawl(
    docs: DataFrame,
    label_filter: Column,
    n_buckets: int = 128,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    neg_rate: float = 0.1,
    neg_seed: int = 29,
    holdout_frac: float = 0.2,
    holdout_seed: int = 31,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[float, list[float], dict]:
    """Crawl-scale training posture (VERDICT r6 #2): the GPT-3-appendix-A
    setup is a SMALL curated positive set against an enormous crawl, so
    training on every negative is both wasteful and (class-balanced or
    not) unnecessary — the standard practice is to downsample negatives
    to the same order as the positives.

    - **Negatives are hash-subsampled deterministically**: kept iff
      ``uniform(id, neg_seed) < neg_rate`` — the ``ext/sampling.py``
      Bernoulli predicate, a pure function of (id, seed), so retries,
      repartitions and incremental reruns train on the identical subset
      (``df.sample`` would not). Positives always train.
    - **A held-out split is carved the same way** BEFORE training:
      ``uniform(id, holdout_seed) < holdout_frac`` rows (of the
      subsampled training pool) never see the optimizer, and the returned
      metrics are computed on them IN-QUERY: one ``lr_score`` pass +
      label join + single aggregate → precision / recall / F1 / accuracy
      + the confusion counts. Feature-less held-out docs (no words) are
      counted as predicted-negative, so the counts always total the
      held-out slice.
    - The optimizer itself is ``train_lr`` — bucket-pinned feature
      stream, exchange-free iterations, n_buckets+1 floats per round.

    Returns (bias, weights, metrics); ``metrics`` also records the
    training-pool sizes so callers can see what the subsample did.
    """
    from haf_plug_play_spark.ext.sampling import _uniform, bernoulli_flag

    labeled = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.coalesce(label_filter, F.lit(False)).alias("_y_bool"),
    )
    pool = labeled.filter(
        F.col("_y_bool") | bernoulli_flag(F.col(id_col), neg_rate, neg_seed)
    )
    is_holdout = _uniform(F.col(id_col), holdout_seed) < F.lit(holdout_frac)
    train = pool.filter(~is_holdout)
    heldout = pool.filter(is_holdout)

    bias, weights = train_lr(
        train,
        F.col("_y_bool"),
        n_buckets=n_buckets,
        iters=iters,
        lr=lr,
        l2=l2,
        id_col=id_col,
        text_col=text_col,
    )

    scored = lr_score(
        heldout, weights, bias=bias, threshold=threshold,
        id_col=id_col, text_col=text_col,
    ).select(id_col, "keep")
    # left join: a held-out doc with no features gets no score row →
    # predicted negative (keep=False), never silently dropped from the
    # confusion counts
    conf = (
        heldout.select(id_col, "_y_bool")
        .join(scored, id_col, "left")
        .select(
            F.col("_y_bool").alias("_y"),
            F.coalesce(F.col("keep"), F.lit(False)).alias("_p"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("_y") & F.col("_p")).cast("long")).alias("tp"),
            F.sum((~F.col("_y") & F.col("_p")).cast("long")).alias("fp"),
            F.sum((F.col("_y") & ~F.col("_p")).cast("long")).alias("fn"),
            F.sum((~F.col("_y") & ~F.col("_p")).cast("long")).alias("tn"),
        )
        .first()
    )
    tp, fp, fn, tn = (int(conf[k] or 0) for k in ("tp", "fp", "fn", "tn"))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    # training-pool sizes, as the docstring promises (review r9: they
    # were computed implicitly but never recorded, so the subsample's
    # effect was unobservable) — one bounded 4-scalar aggregation
    sizes = (
        pool.select(is_holdout.alias("_h"), F.col("_y_bool"))
        .agg(
            F.count("*").alias("n_pool"),
            F.sum((~F.col("_h")).cast("long")).alias("n_train"),
            F.sum((~F.col("_h") & F.col("_y_bool")).cast("long")).alias(
                "n_train_pos"
            ),
        )
        .first()
    )
    metrics = {
        "n_pool": int(sizes["n_pool"] or 0),
        "n_train": int(sizes["n_train"] or 0),
        "n_train_pos": int(sizes["n_train_pos"] or 0),
        "n_train_neg": int((sizes["n_train"] or 0) - (sizes["n_train_pos"] or 0)),
        "n_holdout": int(conf["n"]),
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
        "accuracy": round((tp + tn) / conf["n"], 6) if conf["n"] else 0.0,
    }
    return bias, weights, metrics


def classifier_quality_gate(
    docs: DataFrame,
    reference: DataFrame,
    n_buckets: int = 128,
    iters: int = 30,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The GPT-3-style end-to-end gate: train positives=``reference``
    docs vs negatives=the FULL ``docs`` corpus, then score ``docs`` and
    keep reference-like ones. Ids in ``reference`` must not collide with
    ``docs`` (caller relabels; same contract as incremental dedup).

    Scale note (review r9): every GD iteration aggregates the whole
    ``docs`` feature stream — fine at the fixture sizes this gate is
    certified at, but at crawl scale use :func:`train_lr_crawl`, which
    hash-subsamples the negative pool to a rate you choose and records
    what the subsample did in its metrics; this function deliberately
    stays the simple, oracle-mirrorable formulation.
    """
    ref = reference.select(
        F.col(id_col), F.col(text_col), F.lit(True).alias("_is_ref")
    )
    neg = docs.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("_is_ref")
    )
    bias, weights = train_lr(
        ref.unionByName(neg),
        F.col("_is_ref"),
        n_buckets=n_buckets,
        iters=iters,
        id_col=id_col,
        text_col=text_col,
    )
    return lr_score(
        docs, weights, bias=bias, threshold=threshold,
        id_col=id_col, text_col=text_col,
    )


def calibration_report(
    scored: DataFrame,
    label: Column,
    p_col: str = "p_keep",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a probability
    scorer — the calibration audit a model-gated curation pipeline runs
    before trusting classifier thresholds (public method: reliability
    binning per DeGroot & Fienberg 1983; ECE per Naeini et al. 2015,
    the standard formulation restated in Guo et al. 2017 §2):
    predictions bin into ``n_bins`` equal-width probability bins; each
    bin reports its mean predicted probability against its observed
    positive rate, and ECE is the prevalence-weighted mean absolute gap
    Σ_b (n_b/N)·|mean_p_b − frac_pos_b|.

    Plan shape: ONE map-side-combinable hash aggregation over the scored
    rows into ≤ n_bins groups, then bin-count-bounded arithmetic (a
    second aggregation over the n_bins rows broadcast-joined back) — no
    corpus-sized shuffle, no window over data rows; scale-safe at any
    corpus size by construction. FP caveat: per-bin means reassociate
    across partitions (the documented avg family), absorbed by rounding
    to 6 dp BEFORE the gap/ECE arithmetic so both engines aggregate the
    identical bin table.

    Output: one row per non-empty bin, ordered — (bin, n_docs, mean_p,
    frac_pos, gap, ece) with the scalar ECE repeated per row (the
    driver-friendly single-result shape). Rows whose LABEL is NULL are
    EXCLUDED up front (review r9): avg ignores NULLs but count does not,
    so keeping them would weight bins by a different population than
    frac_pos was measured on — an unknown label is not a negative.
    """
    k = int(n_bins)
    p = F.col(p_col)
    bin_col = F.least(F.floor(p * k), F.lit(k - 1)).cast("long")
    per_bin = (
        scored.select(
            bin_col.alias("bin"),
            p.alias("_p"),
            label.cast("int").alias("_y"),
        )
        .where(F.col("_y").isNotNull())
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("_p"), 6).alias("mean_p"),
            F.round(F.avg("_y"), 6).alias("frac_pos"),
        )
        .withColumn(
            "gap", F.round(F.abs(F.col("mean_p") - F.col("frac_pos")), 6)
        )
    )
    tot = per_bin.agg(
        F.round(
            F.sum(F.col("n_docs") * F.col("gap")) / F.sum("n_docs"), 6
        ).alias("ece")
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select("bin", "n_docs", "mean_p", "frac_pos", "gap", "ece")
        .orderBy("bin")
    )


def roc_auc(
    scored: DataFrame,
    label: Column,
    p_col: str = "p_keep",
) -> DataFrame:
    """ROC-AUC of a probability scorer by the rank statistic — the
    threshold-free discrimination audit beside :func:`calibration_report`
    (public method: AUC = Mann-Whitney U / (P·N), Hanley & McNeil 1982;
    tie handling by the standard half-credit convention).

    Computed WITHOUT a corpus-sized window: scores (rounded 6 dp, so
    ≤ 10⁶+1 distinct values) aggregate into per-score (pos, neg) counts
    — ONE map-side-combinable hash aggregation over data rows — and the
    cumulative pass runs over the DISTINCT-SCORE rows only, where
    AUC = Σ_s pos(s)·(cumneg_below(s) + neg(s)/2) / (P·N): every
    positive beats the negatives strictly below its score and
    half-credits ties at its own score. The single-partition window this
    uses is bounded by the distinct-score count, never the corpus — the
    same bounded-window family as the strata reports.

    Output: one row — (n_pos, n_neg, n_distinct_scores, auc) with auc
    rounded 6 dp. Degenerate inputs (no positives or no negatives) yield
    auc NULL rather than a fabricated 0.5. Rows whose LABEL is NULL are
    EXCLUDED (review r9): ``count(*) − sum(_y)`` would silently count
    them as negatives and corrupt the statistic — an unknown label
    belongs in neither class.
    """
    from pyspark.sql import Window as W

    per_s = (
        scored.select(
            F.round(F.col(p_col), 6).alias("s"), label.cast("int").alias("_y")
        )
        .where(F.col("_y").isNotNull())
        .groupBy("s")
        .agg(
            F.sum("_y").cast("long").alias("pos"),
            (F.count("*") - F.sum("_y")).cast("long").alias("neg"),
        )
    )
    cumneg = F.coalesce(
        F.sum("neg").over(
            W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    contrib = F.col("pos") * (cumneg.cast("double") + F.col("neg") / 2.0)
    return (
        per_s.select(
            F.col("pos"), F.col("neg"), contrib.alias("_c")
        )
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("neg").cast("long").alias("n_neg"),
            F.count("*").cast("long").alias("n_distinct_scores"),
            F.sum("_c").alias("_u"),
        )
        .select(
            "n_pos",
            "n_neg",
            "n_distinct_scores",
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.round(
                    F.col("_u") / (F.col("n_pos") * F.col("n_neg")).cast("double"), 6
                ),
            ).alias("auc"),
        )
    )
