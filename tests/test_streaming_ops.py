"""Streaming operator tests: windowed agg with watermark == batch result;
applyInPandasWithState running totals == batch group-by oracle; serve-layer
normalization contract."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from haf_plug_play_spark.serve import df_to_json_rows, populate_by_schema
from haf_plug_play_spark.sources.tables import load_table
from haf_plug_play_spark.streaming import running_user_state, windowed_event_aggs

from .compare import canonical
from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    df = load_table(spark, SF_SMOKE, "events")
    df.repartitionByRange(4, "event_id").write.parquet(out)
    return out, df.schema


def test_windowed_agg_streaming_equals_batch(spark, events_stream_dir, tmp_path):
    path, schema = events_stream_dir
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        windowed_event_aggs(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_out")
    expected = windowed_event_aggs(load_table(spark, SF_SMOKE, "events"))
    cols = sorted(got.columns)
    assert cols == sorted(expected.columns)
    g = canonical(cols, [tuple(r[c] for c in cols) for r in got.collect()])
    e = canonical(cols, [tuple(r[c] for c in cols) for r in expected.collect()])
    assert g == e


def test_windowed_agg_append_mode_runs_and_is_batch_subset(spark,
                                                           events_stream_dir,
                                                           tmp_path):
    """Append mode requires the aggregation to be keyed on the true
    event-time window STRUCT (grouping on window(...).start alone is not
    recognized and fails at analysis) — pin that windowed_event_aggs
    starts in append mode and that every finalized window it emits equals
    the batch group-by's row for that key (open windows withheld)."""
    path, schema = events_stream_dir
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        windowed_event_aggs(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("win_append")
        .option("checkpointLocation", str(tmp_path / "ckpt_append"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    cols = sorted(windowed_event_aggs(load_table(spark, SF_SMOKE, "events")).columns)
    batch = {
        (r.w_start, r.event_type): tuple(r[c] for c in cols)
        for r in windowed_event_aggs(load_table(spark, SF_SMOKE, "events")).collect()
    }
    emitted = spark.sql("SELECT * FROM win_append").collect()
    # a regressed-to-empty append stream would make the subset loop
    # vacuously pass (ADVICE r12) — availableNow over per-file triggers
    # must finalize at least one window
    assert len(emitted) > 0
    for r in emitted:
        assert tuple(r[c] for c in cols) == batch[(r.w_start, r.event_type)]


def test_stateful_running_user_state(spark, events_stream_dir, tmp_path):
    path, schema = events_stream_dir
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = (
        running_user_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a user's row each batch — last emit wins
    from pyspark.sql import functions as F, Window as W

    out = spark.sql(
        "SELECT user_id, n_events, total_value, last_event_id FROM state_out"
    )
    # final state per user = max n_events row (monotone counters)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max("event_id").alias("last_event_id"),
        )
    )
    f = {r.user_id: (r.n_events, r.last_event_id, round(r.total_value, 4)) for r in final.collect()}
    b = {r.user_id: (r.n_events, r.last_event_id, round(r.total_value, 4)) for r in batch.collect()}
    assert f == b


def test_stream_exact_dedup_bounded_state(spark, tmp_path):
    """Duplicates arriving across micro-batches (within the watermark) must
    collapse to one row; the batch call over the same data is the oracle."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.streaming import stream_exact_dedup

    events = load_table(spark, SF_SMOKE, "events").limit(200)
    doubled = events.union(events)  # every row twice, spread across files
    src = str(tmp_path / "dup_events")
    doubled.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermark must exceed the fixture's whole event-time span: files
    # arrive in arbitrary ts order, and any row older than
    # (max seen ts - watermark) would be dropped as late — a real-feed
    # tuning concern, but nondeterminism in a correctness test
    q = (
        stream_exact_dedup(stream, ["event_id"], ts_col="ts", watermark="3650 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out")
    assert got.count() == got.select("event_id").distinct().count()
    expected = stream_exact_dedup(doubled, ["event_id"])  # batch oracle
    assert got.count() == expected.count() == 200
    assert (
        got.agg(F.sum("event_id")).first()[0]
        == expected.agg(F.sum("event_id")).first()[0]
    )


def test_serve_normalization():
    rows = [
        (Decimal("1.50"), datetime.datetime(2024, 1, 2, 3, 4, 5), b"\xde\xad", ["a"]),
    ]
    out = populate_by_schema(rows, ["qty", "created", "trx", "tags"])
    assert out == [
        {"qty": 1.5, "created": "2024-01-02T03:04:05", "trx": "dead", "tags": ["a"]}
    ]


def test_serve_df_roundtrip(spark):
    df = load_table(spark, SF_SMOKE, "events").limit(3).select("event_id", "ts")
    rows = df_to_json_rows(df)
    assert len(rows) == 3
    assert all(isinstance(r["ts"], str) and "T" in r["ts"] for r in rows)


def test_build_app_requires_fastapi():
    from haf_plug_play_spark.serve import build_app

    with pytest.raises(ImportError):
        build_app({})

def test_streaming_incremental_curation_pipeline(spark, tmp_path):
    """The daily-crawl end-to-end story: a 3-batch document stream curated
    under foreachBatch — incremental MinHash dedup against the published
    corpus, deterministic split assignment, append_snapshot publication —
    proving (a) each batch's incremental dedup equals the full-corpus run
    restricted to touched pairs, (b) exactly-once publication under an
    injected foreachBatch retry, and (c) split assignments never migrate
    as the corpus grows (split_assign is a pure function of the id)."""
    import hashlib
    import os
    import time

    from pyspark.sql import functions as F  # noqa: F401 (parity with module style)

    from haf_plug_play_spark.ext import dedup as xdedup
    from haf_plug_play_spark.ext import sampling
    from haf_plug_play_spark.runner import snapshots as sn
    from haf_plug_play_spark.runner.fs import LocalFS

    def salad(i: int, n: int = 30) -> list[str]:
        return [hashlib.md5(f"{i}-{k}".encode()).hexdigest()[:8] for k in range(n)]

    def doc(i: int):
        return (i, " ".join(salad(i)))

    def near_dup_of(i: int, new_id: int):
        w = salad(i)
        w[7] = "changed"
        return (new_id, " ".join(w))

    batches = [
        [doc(0), doc(1), doc(2), near_dup_of(2, 3)],  # within-batch: 3 ~ 2
        [doc(10), near_dup_of(0, 11), doc(12)],  # cross-batch: 11 ~ 0
        [doc(20), near_dup_of(12, 21), near_dup_of(20, 22)],  # 21 ~ 12, 22 ~ 20
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    # one file per batch with strictly increasing mtimes so the file
    # source (maxFilesPerTrigger=1) replays them in batch order
    seen: set = set()
    t0 = time.time() - 1000
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for name in os.listdir(src):
            path = os.path.join(src, name)
            if name.startswith("part-") and name not in seen:
                os.utime(path, (t0 + b * 10, t0 + b * 10))
                seen.add(name)

    table = str(tmp_path / "published")
    fs = LocalFS()
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    results: dict = {"pairs": {}, "splits": {}, "retry": None, "order": []}

    def publish(batch_df, batch_id):
        rows = batch_df.collect()
        batch = spark.createDataFrame(rows, schema)
        results["order"].append(sorted(r.doc_id for r in rows))
        try:
            corpus = sn.read_snapshot(spark, table, fs)
            corpus = spark.createDataFrame(
                corpus.select("doc_id", "text").collect(), schema
            )
        except FileNotFoundError:
            corpus = spark.createDataFrame([], schema)
        inc = {
            (r.id_a, r.id_b)
            for r in xdedup.incremental_minhash_pairs(batch, corpus).collect()
        }
        full = {
            (r.id_a, r.id_b)
            for r in xdedup.minhash_lsh_pairs(corpus.unionByName(batch)).collect()
        }
        bids = {r.doc_id for r in rows}
        results["pairs"][batch_id] = (
            inc,
            {p for p in full if p[0] in bids or p[1] in bids},
        )
        # first-wins curation: a new doc near-duplicating an older id
        # (published, or a smaller id in this batch) is dropped
        drop = {b_ for (_a, b_) in inc if b_ in bids}
        kept = batch.filter(~batch.doc_id.isin(list(drop)))
        out = sampling.split_assign(kept, "doc_id", splits)
        m = sn.append_snapshot(
            spark, out, table, fs, batch_id=batch_id, writer_id="curate"
        )
        if batch_id == 1:  # injected at-least-once retry
            m2 = sn.append_snapshot(
                spark, out, table, fs, batch_id=batch_id, writer_id="curate"
            )
            results["retry"] = (m["snapshot_id"], m2["snapshot_id"])
        results["splits"][batch_id] = {
            r.doc_id: r.split for r in out.collect()
        }

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(publish)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    # the file source replayed the batches in mtime order
    assert results["order"] == [sorted(i for i, _ in b) for b in batches]
    # (a) incremental ≡ full-run on touched pairs, every batch — and the
    # planted dup structure was actually seen
    for bid, (inc, touched) in results["pairs"].items():
        assert inc == touched, f"batch {bid}: {inc} != {touched}"
    assert results["pairs"][0][0] == {(2, 3)}
    assert results["pairs"][1][0] == {(0, 11)}
    assert results["pairs"][2][0] == {(12, 21), (20, 22)}
    # (b) exactly-once: the retry returned the SAME snapshot, the chain
    # has one commit per batch, and the table holds each kept doc once
    assert results["retry"][0] == results["retry"][1]
    chain = sn.committed_chain(table, fs)
    assert len(chain) == 3
    final = sn.read_snapshot(spark, table, fs)
    kept_ids = sorted(r.doc_id for r in final.select("doc_id").collect())
    assert kept_ids == [0, 1, 2, 10, 12, 20]
    # (c) append-never-migrates: re-assigning splits over the FINAL corpus
    # reproduces every batch-time assignment exactly
    now = {
        r.doc_id: r.split
        for r in sampling.split_assign(
            final.select("doc_id", "text"), "doc_id", splits
        ).collect()
    }
    then = {k: v for d in results["splits"].values() for k, v in d.items()}
    assert now == then


def test_windowed_surprisal_drift_streaming_equals_batch(spark, tmp_path):
    """The drift monitor run as a real 3-file stream (watermarked windowed
    agg) must produce exactly the batch group-by's rows; OOV accounting
    and the surprisal means match a closed-form check on a planted
    window."""
    import datetime

    from haf_plug_play_spark.streaming.drift import (
        reference_unigram,
        windowed_surprisal_drift,
    )

    t0 = datetime.datetime(2024, 1, 1)
    ref = reference_unigram(
        spark.createDataFrame(
            # reference: 'a' 3/4, 'b' 1/4
            [(0, "a a a b")], "doc_id long, text string"
        )
    )
    rows = [
        # window 0: src X speaks pure reference; src Y is half-OOV
        (0, t0, "X", "a a b"),
        (1, t0 + datetime.timedelta(minutes=1), "Y", "a z"),
        # window 1 (>=5 min later): src X drifts fully OOV
        (2, t0 + datetime.timedelta(minutes=6), "X", "q q"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, ts timestamp, source string, text string"
    )
    path = str(tmp_path / "docs")
    docs.repartitionByRange(3, "doc_id").write.parquet(path)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        windowed_surprisal_drift(stream, ref)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("drift_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = ["w_start", "source", "n_tokens", "oov_tokens", "oov_frac",
            "surprisal_nats"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM drift_out").collect()
    )
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in windowed_surprisal_drift(docs, ref).collect()
    )
    assert got == batch

    import math

    from haf_plug_play_spark.streaming.drift import OOV_LOGP

    by_key = {(r[0].minute // 5, r[1]): r for r in got}
    x0 = by_key[(0, "X")]
    # src X window 0: tokens a a b — surprisal = (2·(−ln .75) + (−ln .25))/3
    assert x0[2:] == (
        3, 0, 0.0, round((2 * -math.log(0.75) - math.log(0.25)) / 3, 6)
    )
    y0 = by_key[(0, "Y")]
    assert y0[2:5] == (2, 1, 0.5)  # 'z' is OOV
    assert y0[5] == round((-math.log(0.75) - OOV_LOGP) / 2, 6)
    x1 = by_key[(1, "X")]
    assert x1[2:] == (2, 2, 1.0, round(-OOV_LOGP, 6))


def test_windowed_surprisal_drift_append_mode_watermark(spark, tmp_path):
    """Append mode is where the watermark actually binds (complete mode
    leaves it inert — ADVICE r11): the drift aggregation must (a) emit a
    window exactly once, when the watermark passes its end, (b) ADMIT a
    late row that arrives while the window's state is still live (the
    'late data admitted up to the watermark' half of the contract), and
    (c) DROP a late row arriving after eviction — proving the group-by
    is on the true event-time window struct and state evicts."""
    import datetime
    import os
    import time

    from haf_plug_play_spark.streaming.drift import (
        reference_unigram,
        windowed_surprisal_drift,
    )

    t0 = datetime.datetime(2024, 1, 1)
    ref = reference_unigram(
        spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    )
    schema = "doc_id long, ts timestamp, source string, text string"
    batches = [
        # batch 0: window [t0, t0+5m) gets 3 known tokens from src X
        [(0, t0, "X", "a a b")],
        # batch 1: event time t0+20m → watermark advances to t0+10m,
        # sealing window 0 at the NEXT micro-batch boundary
        [(1, t0 + datetime.timedelta(minutes=20), "X", "a")],
        # batch 2: late row for window 0, but its state is still live
        # (eviction runs with this batch) → ADMITTED into the final agg
        [(2, t0 + datetime.timedelta(minutes=1), "X", "b b b b")],
        # batch 3: late row AFTER window 0 was emitted and evicted →
        # dropped by the watermark, window 0 must not re-emit
        [(3, t0 + datetime.timedelta(minutes=2), "X", "z z")],
    ]
    src = str(tmp_path / "src")
    seen: set = set()
    base = time.time() - 1000
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for name in os.listdir(src):
            path = os.path.join(src, name)
            if name.startswith("part-") and name not in seen:
                os.utime(path, (base + b * 10, base + b * 10))
                seen.add(name)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_surprisal_drift(stream, ref)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("drift_append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    emitted = {
        (r.w_start, r.source): r
        for r in spark.sql("SELECT * FROM drift_append").collect()
    }
    # exactly one finalized window: the sealing row's own window (t0+20m)
    # is still open at end of input and correctly withheld
    assert set(emitted) == {(t0, "X")}
    # window 0 = batch-0 tokens (a a b) + the admitted batch-2 late
    # tokens (b b b b): 7 tokens, zero OOV
    w0 = emitted[(t0, "X")]
    assert (w0.n_tokens, w0.oov_tokens, w0.oov_frac) == (7, 0, 0.0)
    # the post-eviction batch-3 tokens were dropped by the watermark, not
    # silently merged or re-emitted — the counter sees the map-side
    # partial agg's output, so the 2 'z' tokens arrive as 1 late
    # (window, source) partial row
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1


def test_reference_unigram_max_vocab_cap(spark):
    """The broadcast-safety cap: max_vocab keeps the top-K words by
    count (word-ordered tie-break), probabilities stay normalized over
    the FULL token count (a true sub-distribution), and capped-out tail
    words land in the monitor's OOV accounting instead of the LM."""
    import math

    from pyspark.sql import functions as F

    from haf_plug_play_spark.streaming.drift import (
        reference_unigram,
        windowed_surprisal_drift,
    )

    ref_docs = spark.createDataFrame(
        # counts: a=4, b=2, c=1, d=1 (total 8); top-2 = a, b
        [(0, "a a a a b b c d")], "doc_id long, text string"
    )
    capped = {r.word: r.logp for r in
              reference_unigram(ref_docs, max_vocab=2).collect()}
    assert set(capped) == {"a", "b"}
    assert abs(capped["a"] - math.log(4 / 8)) < 1e-12
    assert abs(capped["b"] - math.log(2 / 8)) < 1e-12
    # tie-break determinism: c and d tie at count 1 → word order decides
    top3 = {r.word for r in reference_unigram(ref_docs, max_vocab=3).collect()}
    assert top3 == {"a", "b", "c"}
    # capped-out words are charged as OOV by the monitor
    import datetime

    probe = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), "X", "a c")],
        "doc_id long, ts timestamp, source string, text string",
    )
    row = windowed_surprisal_drift(
        probe, reference_unigram(ref_docs, max_vocab=2)
    ).collect()[0]
    assert (row.n_tokens, row.oov_tokens, row.oov_frac) == (2, 1, 0.5)


def test_reference_unigram_max_vocab_hard_ceiling(spark):
    """The capped reference is BROADCAST (and its top-K materializes on
    the driver), so a cap past MAX_REFERENCE_VOCAB must fail loudly at
    construction with the persist-and-shuffle-join escape hatch
    (ADVICE r12) — never quietly schedule a driver-OOM-sized
    TakeOrderedAndProject."""
    import pytest

    from haf_plug_play_spark.streaming.drift import (
        MAX_REFERENCE_VOCAB,
        reference_unigram,
    )

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="broadcast budget"):
        reference_unigram(docs, max_vocab=MAX_REFERENCE_VOCAB + 1)
    # at the ceiling itself the plan still constructs lazily
    reference_unigram(docs, max_vocab=MAX_REFERENCE_VOCAB).explain()


def test_qsd_registered_config_streaming_equals_batch(spark, tmp_path):
    """The oracle-gated QSD-stream-drift query is the BATCH degenerate
    form; prove its exact registered configuration (documents fixture,
    'en'-slice reference LM, ts = 2024-01-01 + doc_id seconds, 5-minute
    windows) also executes as a real multi-file stream with identical
    results — the same stream ≡ batch contract QSB/QSS carry."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext.registry import EXT_QUERIES
    from haf_plug_play_spark.sources.tables import load_table
    from haf_plug_play_spark.streaming.drift import (
        reference_unigram,
        windowed_surprisal_drift,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs")
    docs.repartitionByRange(3, "doc_id").write.parquet(path)
    ref = reference_unigram(docs.filter(F.col("lang") == "en"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    timed = stream.select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("ts"),
        "source",
        "text",
    )
    q = (
        windowed_surprisal_drift(timed, ref)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("qsd_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    cols = ["w_start", "source", "n_tokens", "oov_tokens", "oov_frac",
            "surprisal_nats"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM qsd_stream").collect()
    )
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in EXT_QUERIES["QSD-stream-drift"](spark, SF_SMOKE).collect()
    )
    assert got == batch and len(batch) > 0


def test_start_curation_stream_api(spark, tmp_path):
    """The library form of the daily-crawl loop
    (ext/curate.py:start_curation_stream): a 3-file stream curated and
    published in one call — within-batch and cross-batch near-dups drop
    first-wins, splits are assigned, one snapshot commit per micro-batch,
    and a second drain over the same source re-publishes nothing (the
    checkpoint + (writer_id, epoch) commit key)."""
    import hashlib
    import os
    import time

    from haf_plug_play_spark.ext.curate import start_curation_stream
    from haf_plug_play_spark.runner import snapshots as sn
    from haf_plug_play_spark.runner.fs import LocalFS

    def salad(i: int, n: int = 30) -> list[str]:
        return [hashlib.md5(f"{i}-{k}".encode()).hexdigest()[:8] for k in range(n)]

    def doc(i: int):
        return (i, " ".join(salad(i)))

    def near_dup_of(i: int, new_id: int):
        w = salad(i)
        w[7] = "changed"
        return (new_id, " ".join(w))

    batches = [
        [doc(0), doc(1), near_dup_of(1, 2)],
        [doc(10), near_dup_of(0, 11)],
        [doc(20), near_dup_of(10, 21)],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    seen: set = set()
    t0 = time.time() - 1000
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for name in os.listdir(src):
            p = os.path.join(src, name)
            if name.startswith("part-") and name not in seen:
                os.utime(p, (t0 + b * 10, t0 + b * 10))
                seen.add(name)

    table = str(tmp_path / "published")
    fs = LocalFS()
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    q = start_curation_stream(
        spark, src, schema, table, str(tmp_path / "ck"), splits=splits, fs=fs
    )
    assert q.awaitTermination(300)

    final = sn.read_snapshot(spark, table, fs)
    assert sorted(r.doc_id for r in final.collect()) == [0, 1, 10, 20]
    assert set(final.columns) >= {"doc_id", "text", "split"}
    assert {r.split for r in final.collect()} <= {"train", "val", "test"}
    assert len(sn.committed_chain(table, fs)) == 3

    # drain again over the same source+checkpoint: nothing new to read,
    # nothing re-published
    q2 = start_curation_stream(
        spark, src, schema, table, str(tmp_path / "ck"), splits=splits, fs=fs
    )
    assert q2.awaitTermination(300)
    assert len(sn.committed_chain(table, fs)) == 3


def test_drift_monitor_key_join_reference_escape_hatch(spark):
    """broadcast_reference=False is the MAX_REFERENCE_VOCAB escape hatch
    made real (code-review r13): the monitor must produce IDENTICAL
    results joining the reference by key, and the reference join in that
    plan must not be a broadcast build (web-scale references must not be
    collected to the driver)."""
    import datetime
    import io
    from contextlib import redirect_stdout

    from haf_plug_play_spark.streaming.drift import (
        reference_unigram,
        windowed_surprisal_drift,
    )

    ref_docs = spark.createDataFrame(
        [(0, "a a a b b c")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0, 30), "X", "a b z"),
            (2, datetime.datetime(2024, 1, 1, 0, 7, 0), "Y", "c c q"),
        ],
        "doc_id long, ts timestamp, source string, text string",
    )
    ref = reference_unigram(ref_docs)
    cols = ["w_start", "source", "n_tokens", "oov_tokens", "oov_frac",
            "surprisal_nats"]
    bcast = {
        (r.w_start, r.source): tuple(r[c] for c in cols)
        for r in windowed_surprisal_drift(probe, ref).collect()
    }
    keyed_df = windowed_surprisal_drift(probe, ref, broadcast_reference=False)
    keyed = {
        (r.w_start, r.source): tuple(r[c] for c in cols)
        for r in keyed_df.collect()
    }
    assert keyed == bcast and len(keyed) == 2

    buf = io.StringIO()
    with redirect_stdout(buf):
        keyed_df.explain("formatted")
    # the reference side must reach the token stream through a non-
    # broadcast join (AQE may still pick its own strategy at runtime;
    # the pin is that WE no longer force a broadcast hint)
    assert "ResolvedHint" not in buf.getvalue()
