"""Scale-stress smoke: the dedup pipeline on a corpus ~4× the largest
fixture, WITH planted structure and adversarial skew.

The corpus (built distributedly — no driver-side text generation):
- 20,000 unique documents of 20 pseudo-words (md5-derived, seeded);
- 100 planted groups: a base doc, an EXACT copy, and a NEAR-dup copy
  (one word appended → word-trigram Jaccard = 18/19 ≈ 0.947);
- a corpus-hot stop phrase on ~80% of the unique documents — every doc sharing it
  collides on its shingles, the exact skew that makes an uncapped
  inverted-index self-join quadratic (16k² /2 ≈ 1.3e8 candidate pairs in
  ONE bucket). With the df-cap the hot shingles leave the candidate
  index and the planted pairs still surface with exact scores.

This is the evidence for the 100 TB claim that SCALE.md makes about the
df-cap and the LSH paths: the shapes stay bounded under skew, not just
on the clean fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_UNIQUE = 20_000
N_GROUPS = 100
STOP = "the quick brown fox jumps over the lazy dog"


@pytest.fixture(scope="module")
def corpus(spark):
    # base texts: 20 md5-derived pseudo-words keyed by text_key
    words = F.concat_ws(
        " ",
        *[
            F.substring(F.md5(F.concat_ws("_", F.col("text_key"), F.lit(str(j)))), 1, 7)
            for j in range(20)
        ],
    )
    uniq = spark.range(N_UNIQUE).select(
        F.col("id").alias("doc_id"), F.col("id").alias("text_key"), F.lit(0).alias("variant")
    )
    # planted groups reuse text_key 0..99: exact copy + near-dup copy
    exact = spark.range(N_GROUPS).select(
        (F.col("id") + N_UNIQUE).alias("doc_id"), F.col("id").alias("text_key"),
        F.lit(0).alias("variant"),
    )
    near = spark.range(N_GROUPS).select(
        (F.col("id") + N_UNIQUE + N_GROUPS).alias("doc_id"), F.col("id").alias("text_key"),
        F.lit(1).alias("variant"),
    )
    df = uniq.unionByName(exact).unionByName(near).withColumn("text", words)
    # near-dup variant: one extra distinct word
    df = df.withColumn(
        "text",
        F.when(
            F.col("variant") == 1,
            F.concat_ws(" ", F.col("text"), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7)),
        ).otherwise(F.col("text")),
    )
    # adversarial skew: hot stop phrase on ~80% of docs (never on planted
    # rows, so planted scores stay analytic)
    df = df.withColumn(
        "text",
        F.when(
            (F.col("doc_id") >= N_GROUPS)
            & (F.col("doc_id") < N_UNIQUE)
            & (F.col("doc_id") % 5 != 0),
            F.concat_ws(" ", F.col("text"), F.lit(STOP)),
        ).otherwise(F.col("text")),
    )
    return df.select("doc_id", "text").repartition(32).localCheckpoint()


def test_exact_census_at_scale(spark, corpus):
    from haf_plug_play_spark.ext.dedup import exact_dedup

    kept = exact_dedup(corpus, ["text"], "doc_id")
    # every planted exact copy collapses onto its base doc
    assert kept.count() == N_UNIQUE + N_GROUPS  # near-dups survive exact dedup
    assert kept.filter(
        (F.col("doc_id") >= N_UNIQUE) & (F.col("doc_id") < N_UNIQUE + N_GROUPS)
    ).count() == 0


def test_df_capped_jaccard_survives_hot_shingle_skew(spark, corpus):
    """Must complete AND find every planted pair with exact scores — the
    uncapped formulation would build a ~1.3e8-pair candidate bucket from
    the stop phrase alone."""
    from haf_plug_play_spark.ext.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        corpus, threshold=0.5, max_shingle_df=50
    ).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    # exact copies: jaccard 1.0 against their base
    for g in range(N_GROUPS):
        assert got.get((g, g + N_UNIQUE)) == 1.0
    # near-dups: base has 18 word-trigram shingles; one appended word adds
    # exactly one new shingle: inter=18, union=19 -> 18/19
    for g in range(N_GROUPS):
        assert got.get((g, g + N_UNIQUE + N_GROUPS)) == pytest.approx(
            round(18 / 19, 6)
        )
    # no false positives among unique hot-phrase docs: every reported pair
    # involves a planted group
    for (a, b) in got:
        assert a < N_GROUPS or a >= N_UNIQUE or b >= N_UNIQUE


def test_cluster_census_keeps_one_per_planted_group(spark, corpus):
    from haf_plug_play_spark.ext.dedup import dedup_decision, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(corpus, num_hashes=8, bands=4, threshold=0.5)
    decision = dedup_decision(corpus, pairs).localCheckpoint()
    # every planted trio {g, g+N, g+N+100} lands in cluster g with keep on g
    planted = decision.filter(
        (F.col("doc_id") < N_GROUPS)
        | (F.col("doc_id") >= N_UNIQUE)
    )
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in planted.collect()}
    for g in range(N_GROUPS):
        assert rows[g] == (g, True)
        assert rows[g + N_UNIQUE] == (g, False)
        assert rows[g + N_UNIQUE + N_GROUPS] == (g, False)
    # total keepers = unique texts that aren't shadowed copies
    assert decision.filter("keep").count() == N_UNIQUE


def test_similarity_recall_at_scale(spark):
    """ANN (hyperplane LSH) and IVF top-k against brute-force ground truth
    on a 20k x 32-dim corpus with a planted near-neighbor cluster around
    the query — recall must hold beyond the small fixtures."""
    import numpy as np

    from haf_plug_play_spark.ext import similarity

    rng = np.random.default_rng(13)
    base = rng.normal(size=(20_000, 32)).astype(np.float64)
    q = rng.normal(size=32)
    q /= np.linalg.norm(q)
    # plant 20 near neighbors of the query (cosine ~0.95+)
    for i in range(20):
        base[i] = q * 10 + rng.normal(scale=0.5, size=32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        32
    ).localCheckpoint()

    qv = [float(x) for x in q]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, qv, k=10).collect()]
    assert set(exact) <= set(range(20))  # planted cluster dominates

    ann = {r.vec_id for r in similarity.ann_lsh_topk(emb, qv, k=10).collect()}
    assert len(set(exact) & ann) >= 8

    # trained quantizer (the scale path): Lloyd iterations, only k x dim
    # floats ever reach the driver
    cents = similarity.ivf_centroids(emb, k=16, iters=3, seed=7, dim=32)
    ivf = {
        r.vec_id
        for r in similarity.ivf_topk(
            emb, qv, k=10, centroids=cents, n_probe=4
        ).collect()
    }
    assert len(set(exact) & ivf) >= 8
