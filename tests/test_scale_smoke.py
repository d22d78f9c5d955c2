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


def test_connected_components_long_chain_logarithmic(spark):
    """A 10k-node PATH graph — the adversarial diameter for min-label
    propagation (plain propagation needs 10k rounds). Pointer halving must
    converge it within the default budget (log2(10k) ≈ 13.3 → ~14-15
    rounds), labeling every node with the chain head."""
    from haf_plug_play_spark.ext.dedup import connected_components

    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    cc = connected_components(chain, max_iters=20)
    assert cc.filter(F.col("cluster_id") != 0).count() == 0
    assert cc.count() == n


def test_boilerplate_beyond_cap_caught_by_pipeline(spark):
    """The df-cap's ONE real recall hole, planted deliberately: a
    boilerplate doc duplicated in > max_shingle_df documents has ALL its
    shingles corpus-hot, so the capped Jaccard path generates no candidate
    for it (true Jaccard 1.0 or ~1.0 notwithstanding). The composed
    pipeline must still catch every copy: exact dedup takes the
    byte-identical copies, MinHash-LSH (no df cap — band buckets bound the
    blowup instead) takes the near-copies, and dedup_decision over the
    union keeps exactly one canonical doc."""
    from haf_plug_play_spark.ext.dedup import (
        dedup_decision,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    cap = 100
    n_copies = 200  # > cap: every shingle of the boilerplate is hot
    boiler = " ".join(f"w{j}" for j in range(20))
    near = boiler + " extra"  # near-copy: trigram jaccard 18/19
    rows = [(i, boiler) for i in range(n_copies)]
    rows += [(n_copies, near), (n_copies + 1, near + " tail more words here")]
    # filler uniques so hot-shingle df stats aren't degenerate
    rows += [(1000 + i, f"unique doc {i} " + " ".join(f"u{i}_{j}" for j in range(18)))
             for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # 1. the hole is real: the capped path reports NO pair among the copies
    capped = ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=cap)
    assert capped.filter(F.col("id_a") < n_copies).count() == 0

    # 2. the composed pipeline still catches every copy. Exact pairs come
    # from the groupBy census shape (copy → group-min star), not a
    # quadratic text self-join.
    exact_pairs = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("id_a"), F.collect_list("doc_id").alias("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    lsh_pairs = minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    all_pairs = exact_pairs.unionByName(
        lsh_pairs.select("id_a", "id_b")
    )
    decision = dedup_decision(docs, all_pairs)
    dup_rows = decision.filter(F.col("doc_id") <= n_copies + 1).collect()
    # every boilerplate copy + both near-copies collapse to cluster 0
    assert all(r.cluster_id == 0 for r in dup_rows)
    assert sum(r.keep for r in dup_rows) == 1
    # exact_dedup alone already removes the byte-identical copies
    assert exact_dedup(docs, ["text"], "doc_id").filter(
        (F.col("doc_id") > 0) & (F.col("doc_id") < n_copies)
    ).count() == 0


def test_segment_dedup_survives_hot_segment_skew(spark, corpus):
    """Every doc carrying the corpus-hot stop phrase shares its segments —
    the hot-key shape for the per-segment group-by. The min(struct) winner
    partial-aggregates map-side (plan-tested in test_plans), so the op must
    complete AND produce the analytic answer: the stop phrase occupies the
    same word positions in every carrier, so carriers lose those duplicated
    segments while every doc's unique head segments survive."""
    from haf_plug_play_spark.ext import dedup

    out = dedup.segment_dedup(corpus, seg_words=10).localCheckpoint()
    assert out.count() == N_UNIQUE + 2 * N_GROUPS  # full-corpus census
    # every unique BASE doc keeps its 2 head segments (20 unique words);
    # only hot-phrase TAIL segments (offsets 20+) can be deduplicated.
    # (The planted copies legitimately shrink: exact copies empty out,
    # near-dups keep only their extra-word tail segment.)
    shorted = out.filter(
        (F.col("doc_id") < N_UNIQUE) & (F.col("n_kept") < 2)
    ).count()
    assert shorted == 0
    # the planted exact copies (doc_id in [N_UNIQUE, N_UNIQUE+N_GROUPS))
    # duplicate base docs 0..99 byte-for-byte -> all their segments lose
    # first-occurrence and the copy is fully emptied
    emptied = out.filter(
        (F.col("doc_id") >= N_UNIQUE)
        & (F.col("doc_id") < N_UNIQUE + N_GROUPS)
        & (F.col("n_kept") == 0)
    ).count()
    assert emptied == N_GROUPS


def test_semantic_dedup_recall_on_clustered_corpus(spark):
    """SemDeDup on data shaped like real embeddings (clustered, not
    isotropic): 2k vectors in 10 gaussian direction-clusters + 100 planted
    scaled copies. Every planted copy shares its original's direction, so
    spherical cells MUST co-locate the pair and the copy must drop —
    recall 1.0 for exact duplicates, by construction, at any cell count."""
    import numpy as np

    from haf_plug_play_spark.ext import dedup

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 32))
    base = np.vstack(
        [c + rng.normal(scale=0.3, size=(200, 32)) for c in centers]
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # planted: 100 scaled copies (same direction, 3x magnitude)
    rows += [
        (10_000 + i, [float(x * 3.0) for x in base[i]]) for i in range(100)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32).localCheckpoint()

    out = dedup.semantic_dedup(
        emb, threshold=0.999999, n_centroids=16, dim=32
    ).localCheckpoint()
    assert out.count() == 2100
    planted = out.filter(F.col("vec_id") >= 10_000)
    assert planted.filter(F.col("keep")).count() == 0  # every copy dropped
    # cells reflect the clustered geometry: no single cell swallowed all
    occ = out.groupBy("cell").count().agg(F.max("count")).first()[0]
    assert occ < 2100


def test_knn_join_finds_planted_copies(spark):
    """On the clustered corpus every scaled copy's rank-1 neighbor must be
    its original at cosine 1.0 (same direction → same cell → top of the
    within-cell ranking), and vice versa."""
    import numpy as np

    from haf_plug_play_spark.ext import similarity

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 32))
    base = np.vstack([c + rng.normal(scale=0.3, size=(100, 32)) for c in centers])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(10_000 + i, [float(x * 2.0) for x in base[i]]) for i in range(50)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(32).localCheckpoint()

    knn = similarity.knn_join_cells(emb, k=3, n_centroids=16, dim=32)
    top1 = {r.vec_id: r for r in knn.filter(F.col("rk") == 1).collect()}
    for i in range(50):
        assert top1[10_000 + i].nbr_id == i and top1[10_000 + i].cosine == 1.0
        assert top1[i].nbr_id == 10_000 + i and top1[i].cosine == 1.0


def test_incremental_dedup_finds_planted_copies_at_scale(spark, corpus):
    """Incremental batch-vs-corpus dedup on the 20k corpus: the planted
    copies arrive as the 'new batch' and every (base, exact), (base,
    near), and (exact, near) pair must surface — through the skewed
    corpus, with the corpus never self-paired."""
    from haf_plug_play_spark.ext.dedup import incremental_minhash_pairs

    new = corpus.filter(F.col("doc_id") >= N_UNIQUE)
    old = corpus.filter(F.col("doc_id") < N_UNIQUE)
    pairs = {
        (r.id_a, r.id_b)
        for r in incremental_minhash_pairs(
            new, old, num_hashes=16, bands=8, threshold=0.9, seed=1
        ).collect()
    }
    for g in range(N_GROUPS):
        base, exact, near = g, N_UNIQUE + g, N_UNIQUE + N_GROUPS + g
        assert (base, exact) in pairs, f"exact copy lost for group {g}"
        assert (base, near) in pairs, f"near copy lost for group {g}"
        assert (exact, near) in pairs, f"new-new pair lost for group {g}"
    # nothing else reaches jaccard 0.9 on the unique corpus
    assert len(pairs) == 3 * N_GROUPS


def test_decontam_at_scale_flags_planted_eval_copies(spark, corpus):
    """Decontamination on the 20k corpus: the 100 planted-group bases act
    as the eval benchmark; their exact and near copies in the train side
    must be flagged (overlap ≥ 50%), and the 19.9k unrelated docs must
    not — through the hot-stop-phrase skew."""
    from haf_plug_play_spark.ext.dedup import eval_overlap

    eval_set = corpus.filter(F.col("doc_id") < N_GROUPS)
    train = corpus.filter(F.col("doc_id") >= N_GROUPS)
    out = eval_overlap(train, eval_set, n=3, min_frac=0.5)
    flagged = {r.doc_id for r in out.filter(F.col("contaminated")).collect()}
    expected = {N_UNIQUE + i for i in range(2 * N_GROUPS)}
    assert flagged == expected


def test_spans_census_at_scale(spark, corpus):
    """Substring-span census over the 20k corpus with the hot stop phrase:
    the corpus-wide census must partially aggregate (no quadratic bucket —
    it is a count, not a pair join), planted exact copies must show FULL
    duplication (every span duplicated), and unique docs that carry the
    stop phrase must show only the bounded stop-phrase overlap."""
    from haf_plug_play_spark.ext.dedup import duplicated_spans

    out = duplicated_spans(corpus, window=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == N_UNIQUE + 2 * N_GROUPS
    # exact-copy pairs: every span occurs in both copies → dup_frac 1.0
    for g in range(0, N_GROUPS, 10):
        assert rows[g].dup_frac == 1.0
        assert rows[N_UNIQUE + g].dup_frac == 1.0
    # a unique doc without the stop phrase shares no 8-word span
    assert rows[N_GROUPS].n_dup_spans == 0


def test_bloom_probe_at_scale(spark, corpus):
    """Bloom decontamination across 20k docs with a 100-doc member set:
    certified no-false-negatives on every row, false positives bounded."""
    from haf_plug_play_spark.ext.sketch import bloom_probe

    out = bloom_probe(
        corpus, F.col("doc_id") < 100, F.col("text"), n_bits=8192, n_hashes=4
    )
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum((~F.col("certified")).cast("long")).alias("uncert"),
        F.sum((F.col("bloom_hit") & ~F.col("exact_hit")).cast("long")).alias("fp"),
        F.sum(F.col("exact_hit").cast("long")).alias("exact"),
    ).first()
    assert agg.uncert == 0
    # members = docs 0..99 plus their planted exact copies (same text)
    assert agg.exact == 2 * N_GROUPS
    assert agg.fp <= 20  # 4 hashes, 8192 bits, 100 keys → fp ~ 4e-6


def test_cms_heavy_hitters_at_scale(spark, corpus):
    """CMS over the 20k-doc word stream (~420k occurrences, ~20k distinct
    words): the stop-phrase words are the true heavy hitters and every
    estimate must certify est >= exact."""
    from haf_plug_play_spark.ext.sketch import cms_heavy_hitters

    out = cms_heavy_hitters(corpus, depth=3, width=1024, min_support=0.005).collect()
    assert all(r.certified for r in out)
    terms = {r.term for r in out}
    # the 8 distinct stop-phrase words dominate the frequency distribution
    assert set(STOP.split()) <= terms


def test_bpe_merges_at_scale(spark, corpus):
    """BPE merge learning over the 20k-doc corpus (~20k distinct
    md5-pseudo-words + the hot stop phrase): rules must come out
    deterministic across partitionings, distinct, and dominated by the
    stop-phrase words (the only high-frequency structure planted)."""
    from haf_plug_play_spark.ext import bpe

    got = bpe.learn_bpe_merges(corpus, n_merges=4, method="distributed")
    assert len(got) == 4
    assert len({(m["left"], m["right"]) for m in got}) == 4
    assert all(m["pair_count"] > 0 for m in got)
    again = bpe.learn_bpe_merges(
        corpus.repartition(7), n_merges=4, method="distributed"
    )
    assert again == got
    # the driver fast path (the 32k-vocab scale fix: one histogram collect
    # + incremental in-memory merges instead of a job per merge) must
    # learn the identical rules on the 20k-distinct-word histogram, and
    # keep going deep: 200 merges in one call, all positive, prefix-stable
    deep = bpe.learn_bpe_merges(corpus, n_merges=200, method="driver")
    assert deep[:4] == got
    assert len(deep) == 200 and all(m["pair_count"] > 0 for m in deep)
    # the most frequent first merge must come from stop-phrase characters
    stop_chars = set("".join(STOP.split())) | {bpe.END}
    assert set(got[0]["left"] + got[0]["right"]) <= stop_chars


def test_ivfadc_trained_recall_at_scale(spark):
    """The composed IVFADC query (ivfadc_topk) in its production
    configuration — TRAINED coarse centroids (Lloyd via ivf_centroids)
    plus PQ codebooks trained on the coarse RESIDUALS (the Jégou IVFADC
    construction: residual distributions are centered, so one shared
    codebook stays tight across cells) — must recover the exact cosine
    top-10 from the planted cluster on the 20k x 32-dim corpus.

    The cluster is planted AT THE QUERY'S SCALE (q + small noise), where
    L2 and cosine orderings agree — the regime IVFADC is built for (the
    ADC stage ranks by L2 over residual codes; a cluster at 10x the
    query's norm is cosine-near but L2-FAR and is correctly excluded by
    an L2 shortlist, so it would test the metric mismatch, not recall)."""
    import numpy as np

    from haf_plug_play_spark.ext import similarity

    rng = np.random.default_rng(13)
    base = rng.normal(size=(20_000, 32)).astype(np.float64)
    q = rng.normal(size=32)
    q /= np.linalg.norm(q)
    for i in range(20):
        base[i] = q + rng.normal(scale=0.05, size=32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    emb = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(32)
        .localCheckpoint()
    )
    qv = [float(x) for x in q]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, qv, k=10).collect()]

    cents = similarity.ivf_centroids(emb, k=16, iters=3, seed=7, dim=32)
    # residuals vs the trained coarse assignment (NumPy mirror of
    # nearest_centroid: argmin c·c − 2 v·c, first-min ties)
    C = np.asarray(cents)
    assign = np.argmin((C * C).sum(1)[None, :] - 2.0 * (base @ C.T), axis=1)
    res_rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(base - C[assign])
    ]
    res = (
        spark.createDataFrame(res_rows, "vec_id long, embedding array<double>")
        .repartition(32)
        .localCheckpoint()
    )
    cbs = similarity.train_pq_codebooks(res, m=8, ksub=16, iters=4, dim=32)

    got = {
        r.vec_id
        for r in similarity.ivfadc_topk(
            emb, qv, k=10, shortlist=200,
            centroids=cents, n_centroids=16, n_probe=4,
            codebooks=cbs, m=8, ksub=16,
        ).collect()
    }
    assert len(set(exact) & got) >= 8, sorted(got)


def test_ivfadc_np_matches_expr(spark):
    """The NumPy encode stage must be BIT-exact with the expression path
    — same fold order, same first-min ties, same residual arithmetic —
    so the oracle certification of the default path covers both."""
    from haf_plug_play_spark.ext import similarity
    from haf_plug_play_spark.ext.registry import _QUERY_VEC
    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    a = similarity.ivfadc_topk(emb, _QUERY_VEC, k=50, shortlist=100, method="np")
    b = similarity.ivfadc_topk(emb, _QUERY_VEC, k=50, shortlist=100, method="expr")
    ra = [tuple(r) for r in a.collect()]
    rb = [tuple(r) for r in b.collect()]
    assert ra == rb and len(ra) == 50


def test_pq_adc_shortlist_recall_at_scale(spark):
    """Trained PQ + ADC on the 20k x 32-dim corpus, in the regime PQ is
    actually used (8-bit codes: m=8, ksub=256, as in FAISS defaults):
    the ADC shortlist must capture the exact-euclidean top-10 so a
    downstream exact rerank recovers them — the standard two-stage ANN
    contract. NumPy-mirror sweep: ksub=16 corr 0.22 (useless), ksub=256
    corr 0.84, exact-top-10 coverage 10/10 at shortlist 200."""
    import numpy as np

    from haf_plug_play_spark.ext import similarity

    rng = np.random.default_rng(13)
    base = rng.normal(size=(20_000, 32)).astype(np.float64)
    q = rng.normal(size=32)
    q /= np.linalg.norm(q)
    for i in range(20):
        base[i] = q * 10 + rng.normal(scale=0.5, size=32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    emb = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(32)
        .localCheckpoint()
    )
    qv = [float(x) for x in q]

    cbs = similarity.train_pq_codebooks(emb, m=8, ksub=256, iters=8, dim=32)
    codes = similarity.pq_codes(
        emb, m=8, ksub=256, dim=32, codebooks=cbs
    ).localCheckpoint()
    exact = set(np.argsort(((base - q) ** 2).sum(1))[:10].tolist())

    shortlist = {
        r.vec_id for r in similarity.pq_adc_topk(codes, qv, cbs, k=200).collect()
    }
    assert len(exact & shortlist) >= 8, sorted(exact & shortlist)

    # exact rerank of the shortlist recovers the true neighbors
    d = ((base[sorted(shortlist)] - q) ** 2).sum(1)
    reranked = [sorted(shortlist)[i] for i in np.argsort(d)[:10]]
    assert len(exact & set(reranked)) >= 8


def test_span_removal_hot_boilerplate_at_scale(spark):
    """The hot-span shape: one 12-word boilerplate sentence embedded in
    5k documents. The census is a map-side-combinable hash agg (the hot
    hash partially aggregates instead of funnelling one reducer), the
    canonical rides the same agg, and the cut removes the boilerplate
    from every doc except the lowest-id one — per-doc flagged-start
    lists stay bounded by doc length regardless of corpus-wide hash
    frequency."""
    import hashlib

    from haf_plug_play_spark.ext.dedup import remove_duplicated_spans

    boiler = " ".join(f"b{i}" for i in range(12))

    def uniq(i: int, n: int = 20) -> str:
        return " ".join(
            hashlib.md5(f"{i}-{k}".encode()).hexdigest()[:8] for k in range(n)
        )

    n_docs = 5000
    rows = [(i, f"{uniq(i)} {boiler} {uniq(i + 100000)}") for i in range(n_docs)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    out = remove_duplicated_spans(docs, window=8).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == n_docs
    # doc 0 holds every boilerplate span's canonical: intact
    assert by_id[0].n_removed == 0
    # every other doc loses EXACTLY the boilerplate region. The flagged
    # starts are the 5 stride-1 spans fully inside the boilerplate
    # (starts 21..25 of the 52-word doc) plus boundary spans that cross
    # into it are NOT duplicated (unique prefixes/suffixes differ), so
    # the cut is exactly words 21..32.
    removed = {r.n_removed for i, r in by_id.items() if i != 0}
    assert removed == {12}, removed
    # and the surviving text is the two unique halves, order preserved
    sample = by_id[4321]
    assert sample.clean_text == f"{uniq(4321)} {uniq(4321 + 100000)}"
