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