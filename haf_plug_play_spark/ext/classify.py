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
        .localCheckpoint()
    )
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
    cw = F.when(F.col("_y") == 1.0, F.lit(wpos)).otherwise(F.lit(wneg))
    bias = 0.0
    weights = [0.0] * n_buckets
    for _ in range(iters):
        warr = F.array(*[F.lit(float(w)) for w in weights])
        margins = feats.groupBy(id_col, "_y").agg(
            F.count("*").alias("_nf"),
            F.sum(
                F.element_at(warr, (F.col("_b") + 1).cast("int"))
            ).alias("_ws"),
        )
        resid = margins.select(
            F.col(id_col),
            F.col("_nf"),
            (
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.lit(bias) + F.col("_ws") / F.col("_nf")))
                    )
                    - F.col("_y")
                )
                * cw
            ).alias("_r"),
        )
        # ONE action per iteration: per-bucket weight gradients unioned
        # with the bias gradient as sentinel bucket -1 (the bias sums _r
        # once per DOC, so it rides the resid table, not the feature
        # stream), all collected together — n_buckets+1 rows
        per_bucket = (
            feats.join(resid, id_col)
            .groupBy("_b")
            .agg(F.sum(F.col("_r") / F.col("_nf")).alias("_g"))
        )
        bias_row = resid.groupBy().agg(F.sum("_r").alias("_g")).select(
            F.lit(-1).alias("_b"), "_g"
        )
        rows = per_bucket.unionByName(bias_row).collect()
        new = list(weights)
        gbias = 0.0
        for r in rows:
            if r._b == -1:
                gbias = r._g or 0.0
            else:
                # class weights sum to 1, so gradients are already means
                new[r._b] = weights[r._b] - lr * (r._g + l2 * weights[r._b])
        weights = new
        bias = bias - lr * gbias
    return bias, weights


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
    docs vs negatives=a matching slice of ``docs``, then score ``docs``
    and keep reference-like ones. Ids in ``reference`` must not collide
    with ``docs`` (caller relabels; same contract as incremental dedup).
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
