"""Sketch-operator tests beyond the registry oracles: the CMS and Bloom
hard guarantees on planted adversarial fixtures, the k-means refinement's
SSE contract on clustered data, temperature-mix boundary alphas, and a
hand-computed unigram-LM golden. Plan tests lock the probe-side
scale shape (broadcast joins, no sort-merge)."""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from haf_plug_play_spark.ext import sampling, similarity, sketch, text as xt


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------- count-min


def test_cms_never_undercounts_with_forced_collisions(spark):
    """width=4 over a 40-word vocabulary forces heavy collisions; the CMS
    estimate must still be >= exact for EVERY word (the sketch's hard
    guarantee), and with d=3 rows the min must not exceed the worst
    single-row bucket total."""
    rows = [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(20))) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sketch.cms_heavy_hitters(
        docs, depth=3, width=4, min_support=0.0
    ).collect()
    assert len(out) == 40
    assert all(r.certified for r in out)
    assert all(r.cms_est >= r.exact_n for r in out)
    # collisions actually happened (width 4 << vocab 40)
    assert any(r.cms_est > r.exact_n for r in out)


def test_cms_planted_heavy_hitter_dominates(spark):
    """A word planted 50x more often than the rest must surface with an
    estimate within the epsilon*N bound of its exact count (here: the
    total mass of its colliding bucket-mates)."""
    rows = [(i, "common " * 50 + f"rare{i % 20}") for i in range(100)]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = {
        r.term: r
        for r in sketch.cms_heavy_hitters(
            docs, depth=3, width=16, min_support=0.1
        ).collect()
    }
    assert "common" in out
    r = out["common"]
    assert r.exact_n == 5000
    assert r.exact_n <= r.cms_est <= r.exact_n + 2000  # rare mass total = 100


# ------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every member must be flagged (no false negatives — certified on
    every row), and with m=4096/k=4/50 members the false-positive rate on
    950 non-members must be far under 1% ((1-e^{-kn/m})^k ≈ 2e-6)."""
    rows = [(i, f"text body number {i}", "member" if i < 50 else "other") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sketch.bloom_probe(
        docs, F.col("source") == "member", F.col("text")
    ).collect()
    assert all(r.certified for r in out)
    members = [r for r in out if r.doc_id < 50]
    assert all(r.bloom_hit and r.exact_hit for r in members)
    fp = [r for r in out if not r.exact_hit and r.bloom_hit]
    assert len(fp) <= 5  # expected ~0


def test_bloom_probe_side_broadcast_only(spark):
    """The probed table must reach its flags through broadcast hash joins
    only — a sort-merge join would shuffle the full corpus per hash
    function, the exact shape the operator exists to avoid."""
    rows = [(i, f"t{i}", "m" if i < 5 else "o") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = _plan(sketch.bloom_probe(docs, F.col("source") == "m", F.col("text")))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5  # 4 position probes + exact


# ------------------------------------------------------------- k-means


def test_kmeans_refinement_clusters_purely(spark):
    """On well-separated clusters the refined assignment must be
    deterministic and nearly pure: each true cluster maps to one dominant
    refined cell."""
    import random

    rng = random.Random(3)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(4)]
    rows = []
    for vid in range(400):
        c = centers[vid % 4]
        rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.kmeans_refine_assign(emb, k=4, seed=7, dim=16).collect()
    assert len(out) == 400
    # deterministic rerun
    out2 = similarity.kmeans_refine_assign(emb, k=4, seed=7, dim=16).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]
    # true-cluster purity after refinement: each true cluster maps to one
    # dominant refined cell
    by_true: dict[int, dict[int, int]] = {}
    for r in out:
        by_true.setdefault(r.vec_id % 4, {}).setdefault(r.cell1, 0)
        by_true[r.vec_id % 4][r.cell1] += 1
    for counts in by_true.values():
        assert max(counts.values()) / sum(counts.values()) >= 0.95


def test_kmeans_moved_column_consistent(spark):
    import random

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.kmeans_refine_assign(emb, k=3, seed=7, dim=8).collect()
    for r in out:
        assert r.moved == (r.cell0 != r.cell1)
        assert 1 <= r.cell1 <= 3


# ------------------------------------------------------------- temperature


@pytest.fixture()
def skewed_docs(spark):
    rows = [(i, "x", "big" if i < 400 else ("mid" if i < 480 else "small")) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_temperature_alpha_one_keeps_everything(spark, skewed_docs):
    out = sampling.temperature_mix(skewed_docs, "lang", "doc_id", alpha=1.0)
    assert out.count() == 500
    assert out.select("mix_rate").distinct().collect()[0][0] == 1.0


def test_temperature_alpha_zero_equalizes(spark, skewed_docs):
    """alpha=0 → rate_i = n_min/n_i: every stratum's EXPECTED kept count
    equals the smallest stratum's size; the rarest keeps everything."""
    out = sampling.temperature_mix(skewed_docs, "lang", "doc_id", alpha=0.0)
    kept = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept["small"] == 20  # rate exactly 1.0
    # big: 400 rows at rate 0.05 → expect ~20, allow wide determinism band
    assert 5 <= kept.get("big", 0) <= 40
    assert 5 <= kept.get("mid", 0) <= 40
    # deterministic rerun selects the identical rows
    ids1 = [r.doc_id for r in out.orderBy("doc_id").collect()]
    out2 = sampling.temperature_mix(skewed_docs, "lang", "doc_id", alpha=0.0)
    ids2 = [r.doc_id for r in out2.orderBy("doc_id").collect()]
    assert ids1 == ids2


# ------------------------------------------------------------- unigram LM


def test_unigram_lm_hand_computed(spark):
    """3-doc fixture: total 6 words, p(a)=3/6, p(b)=2/6, p(c)=1/6. Scores
    are the mean ln p over each doc's words."""
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b"), (2, "c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in xt.unigram_lm_scores(docs).collect()}
    pa, pb, pc = math.log(3 / 6), math.log(2 / 6), math.log(1 / 6)
    assert out[0].n_words == 3
    assert abs(out[0].avg_logp - round((2 * pa + pb) / 3, 6)) < 1e-6
    assert abs(out[1].avg_logp - round((pa + pb) / 2, 6)) < 1e-6
    assert abs(out[2].avg_logp - round(pc, 6)) < 1e-6
    # common-word doc scores strictly higher than rare-word doc
    assert out[0].avg_logp > out[2].avg_logp


# ------------------------------------------------------------- PQ


def test_pq_codes_spread_and_error_nonneg(spark):
    """PQ assignments must actually use the codebook (unit centroids make
    the argmin a direction match — no smallest-norm collapse), and the
    reconstruction error Σ_j ‖v_j − c_j‖² is non-negative by identity."""
    from haf_plug_play_spark.ext.registry import EXT_QUERIES
    from tests.conftest import SF_ORACLE

    out = EXT_QUERIES["XS-pq"](spark, SF_ORACLE).collect()
    assert len(out) > 0
    for j in range(8):
        codes = {r[f"code_{j}"] for r in out}
        assert codes <= set(range(1, 17))
        assert len(codes) >= 8, f"subspace {j} degenerate: {codes}"
    assert all(r.recon_err >= 0 for r in out)


def test_hll_overlap_fanout_guard(spark):
    """The overlap matrix's pair fan-out is quadratic in groups
    (S(S-1)/2 × 256 replicated registers): the guard must fail LOUDLY
    past max_groups with the sharding hint, pass silently under it
    (VERDICT r11 #6) — and stay LAZY: constructing the guarded frame
    launches NO Spark job (ADVICE r12 — plan-only paths like
    ``explain --all`` must not pay a corpus scan), the raise happens at
    execution, during the guard's broadcast build, before the fan-out."""
    import pytest
    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext.registry import _overlap_fanout_guard

    many = spark.createDataFrame(
        [(f"s{i}", "x") for i in range(12)], "source string, item string"
    )

    def guarded(max_groups: int):
        g = _overlap_fanout_guard(many, "source", max_groups=max_groups)
        return many.crossJoin(F.broadcast(g)).drop("_fanout_guard")

    # laziness pin: construction (and explain) inside a fresh job group
    # must schedule zero jobs
    sc = spark.sparkContext
    sc.setJobGroup("fanout-guard-lazy", "laziness pin")
    try:
        over = guarded(10)  # 12 groups > 10: would raise if eager
        over.explain()
        tracker = sc.statusTracker()
        assert tracker.getJobIdsForGroup("fanout-guard-lazy") == []
    finally:
        sc.setJobGroup("", "")

    # pass case: 12 groups <= 20, rows flow through unchanged
    assert guarded(20).count() == 12
    # fail case: raises AT EXECUTION with the sharding hint
    with pytest.raises(Exception, match="shard the pair list"):
        over.collect()


def test_hll_overlap_sketch_invariants(spark):
    """Beyond the DuckDB parity (test_ext_oracle[XK-hll-overlap]):
    the estimates must satisfy the SET-algebra the sketches claim —
    per-pair union estimate certified at the paper's 4σ bound on this
    corpus, inclusion–exclusion intersection non-negative and no larger
    than either side's estimate could allow, Jaccards in [0, 1], and
    the exact legs internally consistent (inter ≤ min side ≤ union)."""
    from haf_plug_play_spark.ext.sketch import hll_overlap

    docs = spark.createDataFrame(
        [(f"s{i % 3}", f"item{j}") for i in range(3) for j in range(i * 40, i * 40 + 120)],
        "source string, item string",
    )
    rows = hll_overlap(docs).collect()
    assert len(rows) == 3  # 3 sources -> 3 unordered pairs
    for r in rows:
        assert r.union_certified, r
        assert r.inter_est >= 0.0
        assert 0.0 <= r.jaccard_exact <= 1.0
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.n_inter_exact <= r.n_union_exact
    # planted overlap: s0=[0,120), s1=[40,160), s2=[80,200) — adjacent
    # pairs share 80 items (union 160); the far pair shares 40 (union 200)
    by_pair = {(r.source_a, r.source_b): r for r in rows}
    for pair, (union, inter) in {
        ("s0", "s1"): (160, 80),
        ("s1", "s2"): (160, 80),
        ("s0", "s2"): (200, 40),
    }.items():
        r = by_pair[pair]
        assert (r.n_union_exact, r.n_inter_exact) == (union, inter), r


def test_hll_certify_false_production_paths(spark):
    """r11, the dedup_decision(deterministic_order=False) pattern for
    the sketch family: certify=False must (a) return the IDENTICAL
    estimates as the certified path (same registers → same integer sum
    → same double), and (b) drop every non-register-bounded operation
    from the plan — no distinct aggregation for the exact counts, and
    for the overlap matrix no item self-join. At 100 TB the sketch IS
    the answer; the exact legs exist only for test-SF certification."""
    import io
    import contextlib

    from haf_plug_play_spark.ext.sketch import (
        hll_distinct,
        hll_distinct_by_group,
        hll_overlap,
    )

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    items = spark.createDataFrame(
        [(f"s{i % 3}", f"item{(i * 7) % 500}") for i in range(2000)],
        "source string, item string",
    )

    cert = hll_distinct(items).collect()[0]
    prod = hll_distinct(items, certify=False)
    assert prod.collect()[0].hll_est == cert.hll_est
    assert "distinct" not in plan(prod).lower()

    certg = {r.source: r.hll_est for r in hll_distinct_by_group(items).collect()}
    prodg = hll_distinct_by_group(items, certify=False)
    assert {r.source: r.hll_est for r in prodg.collect()} == certg
    assert "distinct" not in plan(prodg).lower()

    certo = {
        (r.source_a, r.source_b): (r.union_est, r.inter_est, r.jaccard_est)
        for r in hll_overlap(items).collect()
    }
    prodo = hll_overlap(items, certify=False)
    assert {
        (r.source_a, r.source_b): (r.union_est, r.inter_est, r.jaccard_est)
        for r in prodo.collect()
    } == certo
    po = plan(prodo)
    assert "_it" not in po  # the exact pairwise self-join is gone
    assert "SortMergeJoin" not in po


def test_kmv_accuracy_and_partition_invariance(spark):
    """Beyond the DuckDB parity (test_ext_oracle[XK-kmv]): (1) the KMV
    estimate's accuracy — rel_err within 4σ = 4/√(k−2) on a synthetic
    group with ≫k distinct values; (2) the exact-below-k contract — a
    group with < k distinct values is answered exactly; (3) PARTITION
    INVARIANCE of the two-level selection — the k-set (hence every
    output number) is identical under a hostile repartition, proving
    the level-1 (group, partition) rank keeps a superset of the true
    global k smallest for ANY partitioning."""
    from haf_plug_play_spark.ext.sketch import KMV_K, kmv_distinct_by_group

    big_n, small_n = 20_000, 100
    rows = [("big", f"item-{i}") for i in range(big_n)] + [
        ("small", f"item-{i}") for i in range(small_n)
    ]
    items = spark.createDataFrame(rows, "source string, item string")
    out = {r.source: r for r in kmv_distinct_by_group(items).collect()}

    assert out["small"].n_exact == small_n
    assert out["small"].kmv_est == float(small_n)  # exact-below-k leg
    assert out["small"].rel_err == 0.0

    assert out["big"].n_exact == big_n
    sigma = 1.0 / (KMV_K - 2) ** 0.5
    assert out["big"].rel_err <= 4 * sigma, out["big"]

    hostile = {
        r.source: r
        for r in kmv_distinct_by_group(items.repartition(64)).collect()
    }
    for src in ("big", "small"):
        assert hostile[src] == out[src]


def test_kmv_overlap_set_algebra_and_certify_false(spark):
    """Beyond the DuckDB parity (test_ext_oracle[XK-theta-overlap]):
    (1) the theta set-algebra on the planted-overlap fixture — exact
    legs recover the planted union/intersection, estimates certified at
    4σ, Jaccards in [0, 1], direct intersection ≤ union sample; (2) with
    groups SMALLER than k every sketch is exact (θ = 1), so the
    estimates must EQUAL the exact legs; (3) certify=False returns the
    identical estimate columns with the exact legs dropped."""
    from haf_plug_play_spark.ext.sketch import kmv_overlap

    docs = spark.createDataFrame(
        [(f"s{i % 3}", f"item{j}") for i in range(3) for j in range(i * 40, i * 40 + 120)],
        "source string, item string",
    )
    rows = kmv_overlap(docs).collect()
    assert len(rows) == 3
    by_pair = {(r.source_a, r.source_b): r for r in rows}
    for pair, (union, inter) in {
        ("s0", "s1"): (160, 80),
        ("s1", "s2"): (160, 80),
        ("s0", "s2"): (200, 40),
    }.items():
        r = by_pair[pair]
        assert (r.n_union_exact, r.n_inter_exact) == (union, inter), r
        assert r.union_certified, r
        assert 0.0 <= r.jaccard_exact <= 1.0
        assert 0.0 <= r.jaccard_est <= 1.0
        assert 0.0 <= r.inter_est <= r.union_est
        # 120 < k=256: every sketch is exact, theta=1, estimates == exact
        assert r.union_est == float(r.n_union_exact), r
        assert r.inter_est == float(r.n_inter_exact), r

    prod = kmv_overlap(docs, certify=False)
    assert prod.columns == [
        "source_a", "source_b", "union_est", "inter_est", "jaccard_est"
    ]
    got = {(r.source_a, r.source_b): r for r in prod.collect()}
    for pair, r in by_pair.items():
        p = got[pair]
        assert (p.union_est, p.inter_est, p.jaccard_est) == (
            r.union_est, r.inter_est, r.jaccard_est
        )


def test_kmv_overlap_estimates_under_sampling(spark):
    """Groups LARGER than k force real theta sampling: with two 4,000-item
    groups sharing 2,000, the union/intersection estimates must land
    within 4σ-ish relative bands (σ = 1/√(k−2)) and the ratio-Jaccard
    near the true 1/3."""
    from haf_plug_play_spark.ext.sketch import kmv_overlap

    rows = [("a", f"item-{j}") for j in range(4000)] + [
        ("b", f"item-{j}") for j in range(2000, 6000)
    ]
    docs = spark.createDataFrame(rows, "source string, item string")
    r = kmv_overlap(docs).collect()[0]
    assert (r.n_union_exact, r.n_inter_exact) == (6000, 2000)
    assert r.union_certified, r
    sigma = 1.0 / (256 - 2) ** 0.5
    assert abs(r.union_est / 6000 - 1.0) <= 4 * sigma, r
    # the direct-sample intersection: looser band (smaller sample)
    assert abs(r.inter_est / 2000 - 1.0) <= 8 * sigma, r
    assert abs(r.jaccard_est - 1 / 3) <= 0.15, r


def test_fanout_guard_counts_null_group(spark):
    """NULL is a real group in the downstream pair fan-out (groupBy keeps
    NULL keys), so the guard must count it toward the bound —
    countDistinct alone ignores NULLs (code-review r13). 3 named groups
    + a NULL group against max_groups=3 must raise; without the NULL
    rows it must pass."""
    import pytest
    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext.registry import _overlap_fanout_guard

    with_null = spark.createDataFrame(
        [("s0", "x"), ("s1", "x"), ("s2", "x"), (None, "x")],
        "source string, item string",
    )

    def run(docs, max_groups):
        g = _overlap_fanout_guard(docs, "source", max_groups=max_groups)
        return docs.crossJoin(F.broadcast(g)).drop("_fanout_guard").count()

    assert run(with_null, 4) == 4
    with pytest.raises(Exception, match="shard the pair list"):
        run(with_null, 3)
    assert run(with_null.where(F.col("source").isNotNull()), 3) == 3


import pytest as _pytest


@_pytest.mark.parametrize(
    "name,which",
    [("XK-hll-overlap", "hll"), ("XK-theta-overlap", "theta")],
)
def test_overlap_prod_equals_certified_sf001(spark, name, which):
    """VERDICT r14 #4: regression-lock the 100 TB posture (certification
    dropped) on the REAL sf0.01 fixture, not just synthetic frames —
    for each overlap sketch, the scalebench certify=False production
    form must return exactly the certified registry query's estimate
    columns, pair for pair. This is the same-stream A/B the scalebench
    `-prod` entries time; here it is an equivalence gate."""
    from haf_plug_play_spark.ext.registry import EXT_QUERIES
    from haf_plug_play_spark.scalebench import _overlap_certify_form
    from tests.conftest import SF_ORACLE

    cert = {
        (r.source_a, r.source_b): (r.union_est, r.inter_est, r.jaccard_est)
        for r in EXT_QUERIES[name](spark, SF_ORACLE).collect()
    }
    prod_df = _overlap_certify_form(which, False)(spark, SF_ORACLE)
    assert prod_df.columns == [
        "source_a", "source_b", "union_est", "inter_est", "jaccard_est"
    ]
    prod = {
        (r.source_a, r.source_b): (r.union_est, r.inter_est, r.jaccard_est)
        for r in prod_df.collect()
    }
    assert prod == cert
