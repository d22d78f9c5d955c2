"""Physical-plan regression tests: lock in the Catalyst properties the
engine's scale posture depends on (SCALE.md). A refactor that silently
breaks pushdown, top-k, broadcast, or shuffle-freeness fails here, not at
100 TB."""

from __future__ import annotations

import contextlib
import io

import pytest

from haf_plug_play_spark.ext.registry import EXT_QUERIES
from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES

from .conftest import SF_ORACLE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_range_pushdown(spark):
    plan = _plan(CANONICAL_QUERIES["QS1-scan-range"](spark, SF_ORACLE))
    assert "GreaterThanOrEqual(event_id,100)" in plan
    assert "LessThanOrEqual(event_id,199)" in plan


def test_topk_plans_take_ordered(spark):
    plan = _plan(CANONICAL_QUERIES["QA1-topk"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k
    assert "EqualTo(event_type,purchase)" in plan  # filter reached the scan


def test_partial_aggregation(spark):
    plan = _plan(CANONICAL_QUERIES["QA2-cntdistinct"](spark, SF_ORACLE))
    # partial + final pairs — map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2


def test_semi_anti_joins(spark):
    semi = _plan(CANONICAL_QUERIES["QF8-semi"](spark, SF_ORACLE))
    anti = _plan(CANONICAL_QUERIES["QJ5-anti"](spark, SF_ORACLE))
    assert "LeftSemi" in semi and "LeftAnti" in anti


def _key_exchanges(plan: str) -> list[str]:
    """Exchange argument lines that move data BY KEY (hash/range/single) —
    the kind that costs a real shuffle of keyed state at scale. A
    RoundRobinPartitioning from the gated source spread (ext/registry.py
    _spread) is excluded: it is data-independent, collapses to a no-op on
    production inputs (partitions >= cores), and cannot skew."""
    import re

    out = []
    for m in re.finditer(r"\(\d+\) Exchange\n(?:[^\n(]*\n)*?Arguments: ([^\n]+)", plan):
        arg = m.group(1)
        if "RoundRobinPartitioning" not in arg:
            out.append(arg)
    return out


def test_minhash_signatures_shuffle_free(spark):
    plan = _plan(EXT_QUERIES["XD-minhash-sig"](spark, SF_ORACLE))
    # the single keyed Exchange is the declared ORDER BY; signature
    # computation itself must never shuffle keyed data (SCALE.md)
    assert len(_key_exchanges(plan)) <= 1, _key_exchanges(plan)


def test_similarity_topk_plans(spark):
    """All three top-k paths (brute, LSH, IVF) must plan as scan →
    projection/filter → TakeOrderedAndProject: per-partition heaps, no
    global sort, no shuffle before the final k rows."""
    for qid in ("XS-cosine-topk", "XS-ann-lsh", "XS-ivf"):
        plan = _plan(EXT_QUERIES[qid](spark, SF_ORACLE))
        assert "TakeOrderedAndProject" in plan, qid
        exchanges = [
            line
            for line in plan.splitlines()
            if line.strip().startswith("(") and "Exchange" in line and "Reused" not in line
        ]
        assert len(exchanges) == 0, (qid, exchanges)


def test_embcos_exact_fully_distributed(spark, monkeypatch):
    """The exact-cosine baseline must never materialize the corpus on the
    driver: building the lineage with DataFrame.collect banned proves the
    broadcast-from-driver formulation stays gone; the executed plan must be
    the block cross-join + mapInPandas block multiply."""
    from pyspark.sql import DataFrame

    from haf_plug_play_spark.ext import dedup
    from haf_plug_play_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")

    def _banned(self, *a, **k):
        raise AssertionError("driver-side collect() in exact-cosine lineage")

    monkeypatch.setattr(DataFrame, "collect", _banned)
    try:
        df = dedup.embedding_cosine_pairs_exact(emb, threshold=0.4)
        plan = _plan(df)
    finally:
        monkeypatch.undo()
    assert "MapInPandas" in plan
    # the block-pair fan-out must be an EQUI-join on the partner id — a
    # theta (bx <= by) formulation plans as a nested-loop broadcast of the
    # multi-MB packed block rows, which cannot scale
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # hash/sort-merge equi-join on "by"
    assert df.count() > 0


def test_text_ops_shuffle_free(spark):
    for qid in ("XT-langid", "XT-quality", "XT-tokens", "XT-fingerprint"):
        plan = _plan(EXT_QUERIES[qid](spark, SF_ORACLE))
        exchanges = [
            line
            for line in plan.splitlines()
            if line.strip().startswith("(") and "Exchange" in line and "Reused" not in line
        ]
        assert len(exchanges) <= 1, (qid, exchanges)  # only the ORDER BY


def test_range_join_no_nested_loop(spark):
    """The bucketed range join must plan as an equi-join (hash/sort-merge)
    with a residual containment filter — never the BroadcastNestedLoopJoin
    the naive theta formulation produces."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.operators.temporal import range_join
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES
    from haf_plug_play_spark.sources.tables import load_table

    plan = _plan(ADVANCED_QUERIES["QR1-range-join"](spark, SF_ORACLE))
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan

    # the theta twin DOES nested-loop (documents why the operator exists);
    # keyless, so nothing equi-joinable at all
    events = load_table(spark, SF_ORACLE, "events")
    pts = events.limit(10).select(F.unix_timestamp("ts").alias("pt"))
    ivs = events.limit(10).select(
        F.unix_timestamp("ts").alias("lo"), (F.unix_timestamp("ts") + 60).alias("hi")
    )
    naive = pts.join(ivs, (pts.pt >= ivs.lo) & (pts.pt <= ivs.hi))
    assert "NestedLoopJoin" in _plan(naive)

    # keyless bucketed form still avoids it
    keyless = range_join(pts, ivs, "pt", "lo", "hi", bucket=60)
    kplan = _plan(keyless)
    assert "NestedLoopJoin" not in kplan and "CartesianProduct" not in kplan


def test_weighted_mix_is_filter_only(spark):
    """The corpus mix must compile to scan → filter (+ the declared ORDER
    BY) — no join, no keyed shuffle for the rate lookup."""
    plan = _plan(EXT_QUERIES["XA-weighted-mix"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert len(_key_exchanges(plan)) <= 1  # only the ORDER BY


def test_grouping_sets_single_expand(spark):
    """ROLLUP/CUBE compute all margins in ONE Expand + partial-agg pass,
    not one scan per grouping set."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    import re

    for qid in ("QG2-cube", "QW3-time-rollup"):
        plan = _plan(ADVANCED_QUERIES[qid](spark, SF_ORACLE))
        assert plan.count("Expand") >= 1, qid
        # distinct scan NODES (each node header appears in both the tree
        # and the details section of formatted explain)
        scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
        assert len(scans) == 1, (qid, scans)


def test_topk_per_group_single_window_shuffle(spark):
    """Per-group top-k: one keyed exchange for the window partition plus
    the declared ORDER BY — never a global sort before the rank filter."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QO6-topk-group"](spark, SF_ORACLE))
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert len(_key_exchanges(plan)) <= 2


def test_gopher_pii_shuffle_free(spark):
    """Quality gates and PII scrub are pure per-row codegen — the only
    Exchange allowed is the final ORDER BY."""
    for qid in ("XT-gopher", "XT-pii-scrub"):
        plan = _plan(EXT_QUERIES[qid](spark, SF_ORACLE))
        exchanges = [
            line
            for line in plan.splitlines()
            if line.strip().startswith("(") and "Exchange" in line and "Reused" not in line
        ]
        assert len(exchanges) <= 1, (qid, exchanges)


def test_repetition_partial_agg(spark):
    """Both repetition aggregations must partial-aggregate map-side (the
    (doc, token) key is the skew-safety argument in the docstring)."""
    plan = _plan(EXT_QUERIES["XT-repetition"](spark, SF_ORACLE))
    assert "partial_count" in plan or "partial" in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_segment_dedup_min_struct_partial_agg(spark):
    """The first-occurrence winner per segment is a partially-aggregable
    min(struct) under hash aggregation — NOT a window over the segment key
    (a hot boilerplate segment would funnel one reducer). The plan must
    show HashAggregate on the segment key and no Window."""
    plan = _plan(EXT_QUERIES["XD-seg-dedup"](spark, SF_ORACLE))
    assert "Window" not in plan, plan[:2000]
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "partial_min" in plan or "partial" in plan.lower()


def test_semantic_dedup_cell_equi_join(spark):
    """The within-cell pair comparison must stay cell-blocked — grouped
    per-cell Arrow batches (the BLAS path), never a nested-loop over all
    pairs."""
    plan = _plan(EXT_QUERIES["XD-semantic"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]


def test_sliding_window_single_pass(spark):
    """QW4's size/slide window explodes window assignment inside the scan
    projection — ONE scan of events, not a per-phase union of scans."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QW4-sliding"](spark, SF_ORACLE))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan[:2000]
    assert "Expand" in plan  # per-row window assignment, not a scan union
    assert "Union" not in plan


def test_knn_join_cell_equi_join(spark):
    """The k-NN join's pair space must be an equi-join on the cell key and
    the ranking a per-vector window — no nested-loop, no global sort
    before the window."""
    plan = _plan(EXT_QUERIES["XS-knn"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "Window" in plan


def test_split_assign_projection_only(spark):
    """Holdout split is a codegen CASE over one md5 — no join, and the
    only keyed exchange is the declared ORDER BY."""
    plan = _plan(EXT_QUERIES["XA-split"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert len(_key_exchanges(plan)) <= 1


def test_decontam_broadcasts_eval_side(spark):
    """Decontamination must probe the eval shingle set via broadcast hash
    join — never a sort-merge shuffle of the (100 TB) train side against
    the (tiny) eval side, and never a nested-loop fallback."""
    plan = _plan(EXT_QUERIES["XT-decontam"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stats_moments_single_pass(spark):
    """QA5's five decimal moments come from ONE scan + partial/final hash
    agg — not five passes and not a join."""
    import re

    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QA5-stats"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, scans


def test_unpivot_single_expand_pass(spark):
    """Native unpivot compiles to one Expand over one scan — the melt
    never re-reads the input per metric (the UNION ALL oracle shape)."""
    import re

    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QU2-unpivot"](spark, SF_ORACLE))
    assert plan.count("Expand") >= 1
    scans = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scans) == 1, scans


def test_prune_single_window_shuffle(spark):
    """Quantile pruning: one keyed exchange for the per-stratum window
    plus the declared ORDER BY — no join, no global sort before the
    rank filter."""
    plan = _plan(EXT_QUERIES["XA-prune"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert len(_key_exchanges(plan)) <= 2


def test_ntile_keyed_window_only(spark):
    """NTILE quartiles partition on event_type — a keyed exchange, never
    the single-reducer global NTILE."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QW6-ntile"](spark, SF_ORACLE))
    keyed = _key_exchanges(plan)
    assert not any("SinglePartition" in k for k in keyed), keyed
    assert len(keyed) <= 3  # window + agg + ORDER BY


def test_zorder_key_is_codegen_only(spark):
    """The Morton key is a flat shift/mask expression: scan → project,
    with the only exchange being the declared ORDER BY."""
    plan = _plan(EXT_QUERIES["XL-zorder"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert len(_key_exchanges(plan)) <= 1


def test_incremental_dedup_semi_joins_corpus(spark):
    """The corpus band index must be pruned by a LeftSemi join on the
    batch's buckets before any pairing — the step that keeps candidate
    volume proportional to the batch, not the corpus."""
    plan = _plan(EXT_QUERIES["XD-incremental"](spark, SF_ORACLE))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_shuffles_on_salt(spark):
    """QJ8's merge-hinted join must shuffle on (key, salt) — the salt in
    the partitioning is the entire point (a hot key spreads across
    n_salts tasks); without it the salting silently degraded to a plain
    or broadcast join."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QJ8-salted"](spark, SF_ORACLE))
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "__salt" in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, plan[:2000]


def test_audit_no_expand_sort_agg(spark):
    """QV1's per-column branches must each plan as hash aggregates — the
    one-agg-six-distincts formulation Expands into a 7-key SortAggregate
    (measured 4.6× slower); this locks the fix in."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

    plan = _plan(ADVANCED_QUERIES["QV1-audit"](spark, SF_ORACLE))
    assert "Expand" not in plan, plan[:2000]
    assert "HashAggregate" in plan, plan[:2000]


def test_temperature_corpus_side_never_shuffles(spark):
    """XA-temperature's rate lookup must be a broadcast join: the only
    keyed exchanges are the tiny stratum-count aggregate (bounded by
    |strata|) and the declared ORDER BY — the corpus never hash-shuffles."""
    from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES  # noqa: F401

    plan = _plan(EXT_QUERIES["XA-temperature"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_spans_census_partial_aggregates(spark):
    """XD-spans' corpus census must partially aggregate map-side (a
    boilerplate span in millions of docs combines before the shuffle) and
    never use a window."""
    plan = _plan(EXT_QUERIES["XD-spans"](spark, SF_ORACLE))
    assert "Window" not in plan, plan[:2000]
    assert "partial_count" in plan, plan[:2000]


def test_unigram_lm_broadcasts_total(spark):
    """XT-unigram-lm's corpus total must ride a broadcast single-row
    cross join (the TF-IDF N pattern) — no driver scalar collect, no
    nested loop over data-sized inputs."""
    plan = _plan(EXT_QUERIES["XT-unigram-lm"](spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]


def test_adc_reads_codes_only_take_ordered(spark):
    """ADC search must stay compressed-domain: top-k plans as
    TakeOrderedAndProject (no global sort) and the ranking stage is
    shuffle-free past the codes projection — the whole point of PQ is
    never touching the wide vector column during the scan."""
    plan = _plan(EXT_QUERIES["XS-adc"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan


def test_ivfadc_projection_only_until_shortlist(spark):
    """IVFADC must stay a pruned projection pipeline: cell assignment,
    residual, codes, and ADC are all per-row expressions over the probed
    cells (no join, no hash exchange), the shortlist plans as
    TakeOrderedAndProject, and the exact rerank touches only the bounded
    shortlist. The only exchange allowed is the single-partition one the
    bounded LIMIT itself introduces."""
    plan = _plan(EXT_QUERIES["XS-ivfadc"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_bm25_take_ordered_no_cartesian(spark):
    """BM25's corpus stats (N, avgdl) must ride a broadcast (the cross
    join of a single-row aggregate — never a CartesianProduct), df joins
    back by broadcast (|Q|-row side), and the top-k plans as
    TakeOrderedAndProject. The tf-lens join on the doc id is the one
    legitimate keyed shuffle (posting lists against corpus lengths)."""
    plan = _plan(EXT_QUERIES["XR-bm25"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_clf_quality_joinless(spark):
    """Classifier inference must be join-free: the model is an array
    LITERAL (element_at per feature), so the plan is explode →
    projection → one keyed aggregation — nothing corpus-sized moves
    except the feature stream's own doc-id shuffle."""
    plan = _plan(EXT_QUERIES["XT-clf-quality"](spark, SF_ORACLE))
    assert "Join" not in plan, plan[:2000]


def test_bpe_tokenize_shuffle_free(spark):
    """Tokenizer application is per-row expression work: no shuffle of
    any kind in the plan (the orderBy is the presentation sort the
    oracle comparison needs; everything upstream is a projection)."""
    plan = _plan(EXT_QUERIES["XT-bpe-tokenize"](spark, SF_ORACLE))
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_pack_split_single_window_shuffle(spark):
    """Token-granular packing costs ONE per-stratum window shuffle; the
    segment fan-out is a generator over the window output, never a second
    exchange or a join."""
    plan = _plan(EXT_QUERIES["XA-pack-split"](spark, SF_ORACLE))
    # exactly one hash exchange (the per-stratum window); the remaining
    # exchange is the presentation orderBy's rangepartitioning
    assert plan.count("hashpartitioning(") == 1
    assert "Generate" in plan  # the bounded sequence explode
    assert "Join" not in plan


def test_topics_projection_only(spark):
    """Topic tagging is a pure codegen projection — no shuffle, no join,
    same plan contract as language ID."""
    plan = _plan(EXT_QUERIES["XT-topics"](spark, SF_ORACLE))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_sem_decontam_broadcasts_eval_side(spark):
    """Embedding decontamination must broadcast the eval vectors and keep
    the corpus map-side: a BroadcastNestedLoopJoin/cross with broadcast,
    never a SortMergeJoin shuffling the corpus."""
    plan = _plan(EXT_QUERIES["XD-sem-decontam"](spark, SF_ORACLE))
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_ratio_table_broadcasts(spark):
    """DSIR's log-ratio table (bucket-bounded) must reach the feature
    stream as a broadcast join — the corpus-sized stream itself is never
    shuffled for the weight lookup (its only exchanges are the bounded
    bucket aggregations and the per-doc sum)."""
    plan = _plan(EXT_QUERIES["XA-dsir"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_span_removal_keyed_joins_only(spark):
    """Span removal must stay keyed end-to-end: census join on the span
    hash, flagged starts joined back on the doc id — no cartesian or
    nested-loop broadcast anywhere (the canonical rides the census agg,
    not a window or a second pass)."""
    plan = _plan(EXT_QUERIES["XD-span-removal"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_classifier_iteration_shuffle_free(spark):
    """Each training iteration must REUSE the feature stream's pinned
    HashPartitioning(doc_id): the per-doc margin aggregate and the
    gradient join insert NO doc-id exchange (the r6 localCheckpoint
    materializer dropped outputPartitioning, so every iteration
    re-shuffled the whole stream). The only ENSURE_REQUIREMENTS exchange
    allowed is the bounded per-bucket gradient re-key; the stream's own
    one-time REPARTITION_BY_COL build shuffle (printed inside the cached
    relation) is expected."""
    import re

    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext import classify

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.lit("w"), F.md5(F.col("id").cast("string"))
        ).alias("text"),
    )
    feats = (
        classify._feature_stream(docs, "doc_id", "text", 64)
        .join(
            docs.select(
                "doc_id", (F.col("doc_id") % 2 == 0).cast("double").alias("_y")
            ),
            "doc_id",
        )
        .repartition(F.col("doc_id"))
        .persist()
    )
    try:
        feats.count()
        grad = classify._iteration_gradients(
            feats, "doc_id", [0.0] * 64, 0.0, 0.5, 0.5
        )
        grad.collect()  # final AQE plan
        plan = grad._jdf.queryExecution().executedPlan().toString()
        bad = [
            line
            for line in plan.splitlines()
            if re.search(r"Exchange hashpartitioning\(doc_id", line)
            and "ENSURE_REQUIREMENTS" in line
        ]
        assert not bad, bad
        assert "InMemoryTableScan" in plan  # iterations read the cache
    finally:
        feats.unpersist()


def test_hll_sketch_bounded_aggregations(spark):
    """The HLL query's register legs consume the RAW hashed stream (max
    is duplicate-insensitive), map-side combining to <= m rows before
    their only shuffle; the ONE distinct aggregation left in the plan is
    the exact-count certification leg (the drop-at-scale leg). The three
    result legs attach by BROADCAST — no sort-merge join anywhere.
    Pins VERDICT r8 #1's fix: the r8 shape materialized a shared
    .distinct() frame recomputed once per consumer (three
    distinct-expand subtrees in the plan); now exactly one remains."""
    plan = _plan(EXT_QUERIES["XK-hll"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "HashAggregate" in plan
    # exactly ONE distinct-aggregation subtree (the exact-count leg):
    # count(distinct ...) plans as partial + final of the same agg
    assert plan.count("partial_count(distinct") == 1
    # and the md5 hashing projects once per REGISTER leg (2 legs × the
    # _idx/_rho pair = 4 expression sites; none in the exact leg, which
    # counts raw items): the r8 shape re-derived the hash 3x through the
    # recomputed distinct frame (3 legs × pair = 6 sites)
    assert 0 < plan.count("md5") <= 4 * 2  # tree+detail print each twice


def test_calibration_single_data_aggregation(spark):
    """Calibration is ONE corpus aggregation into <= n_bins groups plus
    bin-bounded arithmetic: the scorer's doc-id aggregation and the bin
    aggregation are the only hash exchanges over data rows; the ECE
    scalar rides a broadcast, never a sort-merge join."""
    plan = _plan(EXT_QUERIES["XT-clf-calibration"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan


def test_pack_report_window_plus_bounded_agg(spark):
    """The packing report reuses pack_chunks' single per-stratum window
    shuffle and adds one strata-bounded aggregation — no join at all."""
    plan = _plan(EXT_QUERIES["XA-pack-report"](spark, SF_ORACLE))
    assert "Join" not in plan
    assert "Window" in plan


def test_ppl_gate_no_corpus_window(spark):
    """The perplexity gate's scale contract: NO window over corpus rows
    anywhere (CCNet bucketing via broadcast cutoffs, not per-group
    ranking) and the tercile cutoffs attach by broadcast."""
    plan = _plan(EXT_QUERIES["XT-ppl-gate"](spark, SF_ORACLE))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_clf_auc_single_bounded_window(spark):
    """AUC runs its cumulative pass over DISTINCT-SCORE rows: exactly
    one Window, fed by a hash aggregation (the per-score pos/neg
    grouping), never a corpus-row window or a sort-merge join."""
    plan = _plan(EXT_QUERIES["XT-clf-auc"](spark, SF_ORACLE))
    # formatted output prints each node twice (tree + detail): count
    # distinct Window NODES via the detail headers
    import re

    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan


def test_quantile_sketch_bounded_joins(spark):
    """The quantile sketch's rank probes and result legs are all
    broadcast joins over bucket-bounded rows — no sort-merge join; the
    only corpus-sized operations are hash aggregations."""
    plan = _plan(EXT_QUERIES["XK-quantile"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan


def test_dedup_decision_production_path_sort_free(spark):
    """The curate funnel's dedup census (deterministic_order=False) must
    be pure keyed joins — no range-partitioned global sort. The 100×
    scale run decomposed XD-cluster's α=1.09 into linear joins plus
    exactly this presentation sort (SCALE.md); production filters on
    ``keep`` and never pays it. The oracle path (default True) keeps the
    sort for replay determinism."""
    from haf_plug_play_spark.ext.dedup import dedup_decision

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    prod = _plan(dedup_decision(docs, pairs, deterministic_order=False))
    assert "rangepartitioning" not in prod.lower()
    oracle = _plan(dedup_decision(docs, pairs))
    assert "rangepartitioning" in oracle.lower()


def test_hll_strat_bounded_aggs_no_smj(spark):
    """Per-source HLL: register legs are keyed hash aggregations over the
    raw hashed stream; the per-group estimate joins back BROADCAST
    (groups x 256 rows) — never a sort-merge join."""
    plan = _plan(EXT_QUERIES["XK-hll-strat"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan


def test_split_leak_adds_no_joins_over_pair_machinery(spark):
    """The leakage audit computes both sides' splits as PURE PROJECTIONS
    of the pair ids (split is a function of the id) — its plan must have
    exactly the join count of the pair generator itself, and no
    cartesian/nested-loop anywhere."""
    leak = _plan(EXT_QUERIES["XD-split-leak"](spark, SF_ORACLE))
    pairs = _plan(EXT_QUERIES["XD-minhash-pairs"](spark, SF_ORACLE))
    assert "CartesianProduct" not in leak
    assert "BroadcastNestedLoopJoin" not in leak
    import re

    n_leak = len(re.findall(r"^\(\d+\) \w*Join", leak, re.M))
    n_pairs = len(re.findall(r"^\(\d+\) \w*Join", pairs, re.M))
    assert n_leak == n_pairs, (n_leak, n_pairs)


def test_zipf_no_vocab_rank_window(spark):
    """Zipf fit (restructured r11, VERDICT r10 #3): the corpus-sized work
    is ONE map-side-combinable word count; the vocabulary collapses to
    the √N-bounded count-of-counts histogram BEFORE any window runs.
    Exactly one Window node (the cumulative-rank sum over the histogram),
    and it is NOT a row_number over the vocabulary — the previous
    single-task scale-killer shape. Three hash aggregations: word
    counts, histogram, regression moments."""
    import re

    plan = _plan(EXT_QUERIES["XT-zipf"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1
    assert "row_number" not in plan
    # word count, count-of-counts histogram, and moment sums each show
    # up as partial+final HashAggregate pairs
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 5


def test_topk_strat_two_phase_no_raw_stratum_window(spark):
    """Per-stratum top-k must be the TWO-PHASE shape: a local
    (source, input-partition) rank prunes to ≤ k per partition before
    the per-source rank — never a single window over each stratum's raw
    rows (one task per 100 TB source slice, the banned XT-zipf-r10
    shape). Exactly two Windows, both over hash-partitioned exchanges
    (no SinglePartition window input), with Spark's WindowGroupLimit
    pushdown active on both."""
    import re

    plan = _plan(EXT_QUERIES["XA-topk-strat"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 2
    assert len(re.findall(r"^\(\d+\) WindowGroupLimit", plan, re.M)) >= 2
    # both window exchanges are hashpartitioning; the only
    # rangepartitioning is the final presentation orderBy
    assert plan.count("hashpartitioning(source") == 2
    for m in re.finditer(r"Arguments: SinglePartition", plan):
        raise AssertionError("single-partition exchange in top-k plan")


def test_hll_overlap_register_bounded_pair_stage(spark):
    """The overlap matrix's pairwise stage must run on broadcast
    register/pair tables: no sort-merge join, no cartesian product
    anywhere; the only nested-loop joins are the tiny broadcast
    source×source pair builders (strata-bounded by construction). The
    raw stream is consumed by keyed hash aggregations (map-side
    combinable register legs)."""
    plan = _plan(EXT_QUERIES["XK-hll-overlap"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan


def test_rrf_fusion_is_leg_bounded(spark):
    """Hybrid RRF: every corpus-sized subtree must END in a
    TakeOrderedAndProject (the two retrieval legs) before fusion — the
    rank windows and the full-outer join then run on ≤K-row frames, so
    the single-partition window and the tiny sort-merge join are
    bounded by construction (the XT-ngrams top-k defense). Pins: both
    legs plan as top-k, exactly two Windows, and no window or join node
    sits UPSTREAM of a leg's TakeOrderedAndProject."""
    import re

    plan = _plan(EXT_QUERIES["XR-rrf"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) TakeOrderedAndProject", plan, re.M)) >= 3
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 2
    assert "CartesianProduct" not in plan


def test_kmv_two_level_selection_no_corpus_sort(spark):
    """XK-kmv: the k-smallest selection must run as two WINDOWED rank
    stages that Catalyst compiles to WindowGroupLimit (a map-side
    partial group-limit BEFORE each exchange, so no corpus-sized group
    is ever sorted whole), the sketch×exact join must be broadcast, and
    nothing may sort-merge or go cartesian. The only SinglePartition
    shapes allowed are scalar singletons (none expected here)."""
    import re

    plan = _plan(EXT_QUERIES["XK-kmv"](spark, SF_ORACLE))
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the shuffle
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    for m in re.finditer(r"Arguments: SinglePartition", plan):
        raise AssertionError("single-partition exchange in kmv plan")


def test_theta_overlap_bounded_pair_stage(spark):
    """XK-theta-overlap: the pairwise stage must run on broadcast
    sketch/pair tables (the XK-hll-overlap contract) — no sort-merge
    join, no cartesian product; the k-smallest selection must carry the
    WindowGroupLimit map-side partial limits, and the only nested-loop
    joins are the tiny broadcast pair builders + the 1-row fan-out
    guard."""
    plan = _plan(EXT_QUERIES["XK-theta-overlap"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_qlm_broadcast_legs_and_topk(spark):
    """XR-qlm: the XR-bm25 scale contract — cf and |C| ride broadcast
    joins, the candidate grid never sort-merges or goes cartesian, the
    final top-k is a TakeOrderedAndProject, and no rank window exists
    anywhere (ranking is top-k only)."""
    import re

    plan = _plan(EXT_QUERIES["XR-qlm"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) TakeOrderedAndProject", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_burstiness_topk_no_global_sort(spark):
    """Burstiness: two keyed hash aggregations (per-(word, doc) counts,
    per-word sums), N broadcast as a single-row nested-loop join, and
    the top-100 as TakeOrderedAndProject — never a global sort or a
    vocabulary rank window (the banned XT-zipf-r10 shape)."""
    import re

    plan = _plan(EXT_QUERIES["XT-burstiness"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) TakeOrderedAndProject", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 4


def test_dedup_savings_keyed_joins_only(spark):
    """Dedup savings: the census and the join back to the doc stream are
    both keyed by the text hash; no cartesian product, no window, no
    range partitioning anywhere (the final ORDER BY source is over
    ≤|sources| rows — AQE may plan it as a single tiny sort). At small
    SF the census side broadcasts under AQE's threshold; at scale it
    degrades to a same-key shuffle join — either way keyed, never
    nested-loop on data."""
    import re

    plan = _plan(EXT_QUERIES["XA-dedup-savings"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 4


def test_lsh_planner_never_scans_corpus(spark):
    """The LSH planner's entire input is a generated 128-combo × 200-point
    grid — its plan must contain NO parquet scan (that constant-cost
    property is why it can run before a signature pass), one explode,
    and one keyed aggregation pair."""
    plan = _plan(EXT_QUERIES["XD-lsh-planner"](spark, SF_ORACLE))
    assert "Scan parquet" not in plan
    assert "Generate" in plan
    assert "HashAggregate" in plan


def test_entropy_single_scan_no_joins(spark):
    """Per-doc entropy is the minimal diagnostic shape: ONE parquet scan,
    two keyed hash-aggregation pairs (per-(doc, word) counts, per-doc
    sums), zero joins, zero windows."""
    import re

    plan = _plan(EXT_QUERIES["XT-entropy"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 4


def test_doremi_scalar_reductions_stay_in_subtree(spark):
    """DoReMi weights: the corpus entropy and the weight normalizer must
    be UNPARTITIONED WINDOW sums over the ≤|sources|-row report — a
    separate .agg() + crossJoin for each scalar replans the whole
    corpus aggregation per scalar (measured: 18 executed parquet scans
    vs 6). Pins: exactly two Windows, at most the kl-drift family's
    four static scans (sw regrouped for cw/ts/tn), keyed joins only."""
    import re

    plan = _plan(EXT_QUERIES["XA-doremi"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 2
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) <= 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embqc_broadcast_centroids_keyed_aggs(spark):
    """Embedding QC: centroid components and norms join back BROADCAST
    (≤ labels × dim rows); the vector stream is consumed by keyed hash
    aggregations only — no sort-merge join, no cartesian product, no
    window, no driver-side collect shaping the plan."""
    import re

    plan = _plan(EXT_QUERIES["XS-embqc"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 4


def test_corpus_report_four_corpus_scans(spark):
    """The report bundle's scan budget (VERDICT r11 #5): with the shared
    (source, word) vocab table persisted, the zipf / kl_drift / doremi
    legs read the CACHE (zero parquet scans of the corpus in their
    plans), so the whole bundle costs exactly four corpus passes —
    vocab build, fertility, entropy (source carried through the
    doc-keyed agg, no join-back scan), shingle-HLL."""
    import re

    from haf_plug_play_spark.ext.report import report_frames

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    frames, sw = report_frames(docs)
    sw = sw.persist()
    try:
        def n_scans(df):
            return len(re.findall(r"^\(\d+\) Scan parquet", _plan(df), re.M))

        for leg in ("zipf", "kl_drift", "doremi_weights"):
            p = _plan(frames[leg])
            # reads the cache; the ONLY parquet scan in the plan text is
            # the one embedded in the InMemoryRelation's build plan (the
            # vocab pass, paid once), not a query-time corpus scan
            assert "InMemoryTableScan" in p, leg
            assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1, leg
        for leg in ("fertility", "entropy_by_source", "distinct_shingles_hll"):
            p = _plan(frames[leg])
            assert "InMemoryTableScan" not in p, leg
            assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1, leg
        # + the vocab build itself = 4 corpus passes for the bundle
        assert n_scans(sw) == 1
    finally:
        sw.unpersist()


def test_stream_drift_broadcast_ref_single_windowed_agg(spark):
    """QSD-stream-drift (batch degenerate form): the pinned reference LM
    joins back BROADCAST (vocabulary-bounded), the token stream reduces
    in keyed hash aggregations (no window functions — the event-time
    window is a projection, not a Window operator), and there is no
    sort-merge join or data-row cartesian anywhere."""
    import re

    plan = _plan(EXT_QUERIES["QSD-stream-drift"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0


def test_pmi_topk_keyed_aggs_no_corpus_join(spark):
    """XT-pmi: bigram and unigram counts are two-phase keyed hash
    aggregations (map-side combine before every exchange), the unigram
    tables join the vocab-bounded BIGRAM table via broadcast hash joins
    — never the raw token stream — scalar totals ride single-row
    broadcast nested loops, and the ranking is a TakeOrderedAndProject
    with no rank window and no global sort. A sort-merge join here
    would mean a count table stopped broadcasting; a Window would mean
    the ranking regressed to the banned vocabulary-rank shape
    (XT-zipf-r10)."""
    import re

    plan = _plan(EXT_QUERIES["XT-pmi"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) TakeOrderedAndProject", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # partial+final pairs for each count table: >= 6 hash aggregates
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) >= 6


def test_jsd_drift_bounded_vocab_joins(spark):
    """XT-jsd: every join runs keyed on the word column between
    vocab-bounded count tables (broadcast hash joins at this SF), the
    absent-word tail is a scalar broadcast (single-row nested loop, not
    a source x vocabulary cross product), and the only sort is the
    final ORDER BY source over <= |sources| rows. No sort-merge join,
    no cartesian, no window anywhere — the XT-kl-drift contract plus
    the closed-form tail."""
    import re

    plan = _plan(EXT_QUERIES["XT-jsd"](spark, SF_ORACLE))
    assert len(re.findall(r"^\(\d+\) Window\b", plan, re.M)) == 0
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan


def test_global_plan_hygiene_sweep(spark):
    """Suite-wide plan invariants over EVERY registered query — canonical,
    advanced, and extension — in one plan-building pass:

    - no CartesianProduct: broadcast nested-loop joins against bounded
      singletons are the allowed shape for scalar cross joins; an actual
      cartesian on data rows is always a bug at 100 TB.
    - no BatchEvalPython: the repo's standing claim is ZERO row-at-a-time
      Python UDFs in any query path (Arrow-batched MapInPandas /
      ArrowEvalPython are the sanctioned Python escapes).

    This is the global net under the per-query pins above: a NEW query
    (or a regression on an old one) fails here without needing its own
    plan test."""
    import __spark_entry__ as entry

    cartesian, row_udf = [], []
    for qid, fn in entry.queries().items():
        plan = _plan(fn(spark, SF_ORACLE))
        if "CartesianProduct" in plan:
            cartesian.append(qid)
        if "BatchEvalPython" in plan:
            row_udf.append(qid)
    assert cartesian == [], f"cartesian product in: {cartesian}"
    assert row_udf == [], f"row-at-a-time Python UDF in: {row_udf}"
