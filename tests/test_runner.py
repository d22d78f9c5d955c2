"""Runner tests: chunked backfill == one-shot batch, retry idempotency,
resume, fork recovery, streaming == batch, health + watchdog."""

from __future__ import annotations

import datetime

import pytest

from haf_plug_play_spark import fixtures
from haf_plug_play_spark.ingest.envelope import parse_custom_json
from haf_plug_play_spark.plugs import PLUGS
from haf_plug_play_spark.plugs.polls import content_from
from haf_plug_play_spark.runner.batch import PlugRunner
from haf_plug_play_spark.runner.state import PlugStateStore
from haf_plug_play_spark.runner.streaming import (
    PlugWatchdog,
    StreamingPlugRunner,
    sync_status,
)

from .compare import canonical

N_OPS = 4_000
STEP = 200


@pytest.fixture(scope="module")
def oplog(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("oplog")
    ops_df, trx_df = fixtures.as_dataframes(spark, N_OPS, 42)
    ops_path, trx_path = str(root / "ops"), str(root / "trx")
    ops_df.repartitionByRange(6, "block_num").write.parquet(ops_path)
    trx_df.repartitionByRange(6, "block_num").write.parquet(trx_path)
    lo, hi = ops_df.agg({"block_num": "min"}).first()[0], ops_df.agg({"block_num": "max"}).first()[0]
    return ops_path, trx_path, lo, hi


def _expected(spark, ops_path, trx_path, plug, max_block=None):
    ops = spark.read.parquet(ops_path)
    if max_block is not None:
        ops = ops.filter(ops.block_num <= max_block)
    trx = spark.read.parquet(trx_path)
    if max_block is not None:
        trx = trx.filter(trx.block_num <= max_block)
    return plug.transform(parse_custom_json(ops, trx))


def _rows(df):
    cols = sorted(df.columns)
    return canonical(cols, [tuple(r[c] for c in cols) for r in df.select(cols).collect()])


def _assert_same(a_df, b_df, label):
    assert sorted(a_df.columns) == sorted(b_df.columns), label
    assert _rows(a_df) == _rows(b_df), label


def _check_plug_outputs(runner, expected):
    _assert_same(runner.read_table("polls_ops"), expected["polls_ops"], "polls_ops")
    _assert_same(
        runner.read_table("polls_votes").drop("block_num"),
        expected["polls_votes"],
        "polls_votes",
    )
    _assert_same(runner.read_gold("polls_content"), expected["polls_content"], "polls_content")


def test_backfill_equals_batch(spark, oplog, tmp_path):
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP)
    ranges = runner.backfill(lo, hi)
    assert len(ranges) >= 5
    assert all(last // STEP == first // STEP for first, last in ranges)  # bucket-aligned
    expected = _expected(spark, ops_path, trx_path, PLUGS["polls"])
    _check_plug_outputs(runner, expected)
    # retry a middle chunk verbatim → byte-identical state (exactly-once)
    runner.process_range(*ranges[len(ranges) // 2])
    _check_plug_outputs(runner, expected)


def test_dead_letter_persisted(spark, oplog, tmp_path):
    """T14: malformed matched ops survive as a queryable table."""
    import json

    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, hi)
    dl = runner.read_table("_dead_letter")
    rows = dl.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.cj_id in PLUGS["podping"].cj_ids
        try:
            json.loads(r.payload)
            raise AssertionError("valid JSON in dead letter")
        except ValueError:
            pass


def test_backfill_resume_and_guards(spark, oplog, tmp_path):
    ops_path, trx_path, lo, hi = oplog
    mid = (lo + hi) // 2
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, mid)
    # second call spans the whole range: monotonic guard clips to the
    # cursor's bucket (partial-bucket re-process is idempotent)
    ranges = runner.backfill(lo, hi)
    assert ranges[0][0] == ((mid + 1) // STEP) * STEP
    assert runner.backfill(lo, mid) == []  # stale range → no-op (T10)
    expected = _expected(spark, ops_path, trx_path, PLUGS["podping"])
    _assert_same(runner.read_table("podping_ops"), expected["podping_ops"], "podping_ops")
    _assert_same(runner.read_table("podping_updates"), expected["podping_updates"], "podping_updates")


def test_resume_with_later_start_block_keeps_bucket_head(spark, oplog, tmp_path):
    """Regression (review finding): resuming with a start_block INSIDE the
    cursor's bucket must still re-derive the full partial bucket — aligning
    to the call's start_block instead of the persisted floor silently
    deleted the bucket-head rows on partition overwrite."""
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    mid = ((lo + (hi - lo) // 2) // STEP) * STEP + STEP // 2  # mid-bucket stop
    runner.backfill(lo, mid)
    # resume asking only for a LATER start inside the same bucket
    runner.backfill(mid - STEP // 4, hi)
    expected = _expected(spark, ops_path, trx_path, PLUGS["podping"])
    _assert_same(runner.read_table("podping_ops"), expected["podping_ops"], "podping_ops")


def test_cursor_never_rewinds_on_replay(spark, oplog, tmp_path):
    """Regression (review finding): replaying an old chunk (idempotent
    retry) must not rewind the sync cursor."""
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, hi)
    runner.process_range((lo // STEP) * STEP, (lo // STEP) * STEP + STEP - 1)
    assert runner.store.load("podping").latest_block_num == hi


def test_read_gold_on_clean_oplog(spark, tmp_path):
    """Regression (review finding): a synced range with NO malformed ops
    leaves an empty _dead_letter dir; read_table/read_gold must fall back
    to its schema instead of raising KeyError."""
    import datetime
    import json

    rows = [
        {
            "id": i + 1, "block_num": 1000 + i, "trx_in_block": 0,
            "timestamp": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=3 * i),
            "op_type_id": 18,
            "body": json.dumps({"type": "custom_json_operation", "value": {
                "id": "polls", "required_auths": [], "required_posting_auths": ["alice"],
                "json": json.dumps([[1, "app"], "create", {
                    "permlink": f"p{i}", "question": "q", "answers": ["a", "b"],
                    "expires": "2024-06-01 00:00:00", "tag": "t"}])}}),
        }
        for i in range(6)
    ]
    from haf_plug_play_spark import fixtures as fx

    ops_df = spark.createDataFrame(rows, fx.OPS_SCHEMA)
    ops_path = str(tmp_path / "ops")
    ops_df.write.parquet(ops_path)
    runner = PlugRunner(spark, PLUGS["polls"], ops_path, None, str(tmp_path / "out"), step=10)
    runner.backfill(1000, 1005)
    assert runner.read_table("_dead_letter").count() == 0
    content = runner.read_gold("polls_content")
    assert content.count() == 6


def test_fork_recovery(spark, oplog, tmp_path):
    ops_path, trx_path, lo, hi = oplog
    fork = lo + (hi - lo) * 2 // 3
    runner = PlugRunner(spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, hi)
    runner.recover_fork(fork)
    assert runner.store.load("polls").latest_block_num == fork
    truncated = _expected(spark, ops_path, trx_path, PLUGS["polls"], max_block=fork)
    _check_plug_outputs(runner, truncated)
    # re-sync the tail: state must converge to the full-log result
    runner.backfill(lo, hi)
    full = _expected(spark, ops_path, trx_path, PLUGS["polls"])
    _check_plug_outputs(runner, full)


def test_streaming_matches_batch(spark, oplog, tmp_path):
    ops_path, trx_path, _, _ = oplog
    srunner = StreamingPlugRunner(
        spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path)
    )
    q = srunner.start(fixtures.OPS_SCHEMA, available_now=True)
    q.awaitTermination(120)
    expected = _expected(spark, ops_path, trx_path, PLUGS["polls"])
    _assert_same(srunner.read_table("polls_ops"), expected["polls_ops"], "polls_ops")
    content = content_from(
        srunner.read_table("polls_creates"), srunner.read_table("polls_deletes")
    )
    _assert_same(content, expected["polls_content"], "polls_content")


def test_sync_status(spark, oplog, tmp_path):
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, hi)
    head_time = (
        spark.read.parquet(ops_path).agg({"timestamp": "max"}).first()[0]
    )
    fresh_now = head_time.replace(tzinfo=datetime.timezone.utc) + datetime.timedelta(seconds=5)
    status = sync_status(spark, ops_path, runner.store, [PLUGS["polls"]], now=fresh_now)
    assert status["status"] == "GOOD" and status["plugs"][0]["lag_blocks"] == 0
    stale_now = fresh_now + datetime.timedelta(minutes=10)
    assert sync_status(spark, ops_path, runner.store, [PLUGS["polls"]], now=stale_now)["status"] == "BAD"
    # lagging cursor → BAD even with fresh head
    st = runner.store.load("polls")
    st.latest_block_num = hi - 50
    runner.store.save(st)
    assert sync_status(spark, ops_path, runner.store, [PLUGS["polls"]], now=fresh_now)["status"] == "BAD"


def test_compaction_preserves_rows(spark, oplog, tmp_path):
    """Small-file compaction must fold a fragmented bucket into fewer files
    with byte-identical content, leaving already-compact buckets alone."""
    from haf_plug_play_spark.runner.maintenance import compact_table

    ops_path, trx_path, lo, _ = oplog
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, lo + 3 * STEP - 1)
    tdir = runner._table_dir("podping_ops")
    # fragment one bucket: rewrite it as many tiny files
    import os

    bucket = next(d for d in sorted(os.listdir(tdir)) if d.startswith("block_bucket="))
    bdir = os.path.join(tdir, bucket)
    df = spark.read.parquet(bdir)
    before_rows = _rows(df)
    df.repartition(8).write.mode("overwrite").parquet(bdir + ".tmp")
    import shutil

    shutil.rmtree(bdir)
    os.replace(bdir + ".tmp", bdir)
    assert len([f for f in os.listdir(bdir) if f.endswith(".parquet")]) == 8
    stats = compact_table(spark, tdir)
    assert stats["buckets_compacted"] == 1  # only the fragmented bucket
    assert len([f for f in os.listdir(bdir) if f.endswith(".parquet")]) == 1
    assert _rows(spark.read.parquet(bdir)) == before_rows
    # cumulative read still works and the runner's table is intact
    assert _rows(runner.read_table("podping_ops")) == _rows(
        runner.read_table("podping_ops")
    )


def test_compaction_crash_recovery(spark, oplog, tmp_path):
    """Interrupted compaction states must self-heal on the next run: a
    moved-aside bucket whose replacement never landed is restored; stray
    temp dirs are dropped; readers never see either (underscore prefix)."""
    import os
    import shutil

    from haf_plug_play_spark.runner.maintenance import compact_table

    ops_path, trx_path, lo, _ = oplog
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.backfill(lo, lo + 2 * STEP - 1)
    tdir = runner._table_dir("podping_ops")
    mdir = tdir + ".maintenance"
    os.makedirs(mdir, exist_ok=True)
    before = _rows(spark.read.parquet(tdir))
    buckets = sorted(d for d in os.listdir(tdir) if d.startswith("block_bucket="))
    # crash window A: temp dir written, swap never started
    shutil.copytree(os.path.join(tdir, buckets[0]), os.path.join(mdir, "_compact_" + buckets[0]))
    # crash window B: bucket moved aside, replacement never landed
    os.replace(os.path.join(tdir, buckets[1]), os.path.join(mdir, "_old_" + buckets[1]))
    # leftovers live OUTSIDE the table dir: readers see neither duplicates
    # nor a conflicting partition column (bucket[1]'s rows are invisible
    # until recovery, but nothing is duplicated/partial)
    mid = spark.read.parquet(tdir)
    assert mid.select("block_bucket").distinct().count() == len(buckets) - 1
    compact_table(spark, tdir)
    assert sorted(d for d in os.listdir(tdir) if d.startswith("block_bucket=")) == buckets
    assert os.listdir(mdir) == []
    assert _rows(spark.read.parquet(tdir)) == before
    # the maintenance side-car never pollutes table discovery
    assert "podping_ops.maintenance" not in runner._silver_table_names()


def test_per_plug_scheduler_pool(spark, oplog, tmp_path):
    """Concurrent plugs must run in their own scheduler pool (≙ the
    reference's process-per-plug isolation, database/plugs.py:14,99)."""
    ops_path, trx_path, lo, _ = oplog
    runner = PlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path), step=STEP)
    runner.process_range(lo, lo + STEP - 1)
    assert (
        spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        == "plug-podping"
    )


def test_streaming_trx_scan_range_pushdown(spark, oplog, tmp_path):
    """Each epoch's trx scan must clip to the batch's block range AND push
    the range into the parquet scan — a per-epoch full scan of the trx log
    is a scale-killer at 100 TB."""
    from .test_plans import _plan

    ops_path, trx_path, lo, _ = oplog
    srunner = StreamingPlugRunner(
        spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path)
    )
    plan = _plan(srunner._trx_for_range(lo, lo + 99))
    assert f"GreaterThanOrEqual(block_num,{lo})" in plan
    assert f"LessThanOrEqual(block_num,{lo + 99})" in plan


def test_watchdog_cancels_stuck_live_query(tmp_path):
    """A live query whose plug check_in went stale is wedged: the watchdog
    must stop() and restart it (parity with the reference's stuck-backend
    cancel), not just report it."""

    class FakeQuery:
        def __init__(self):
            self.stopped = False

        @property
        def isActive(self):
            return not self.stopped

        def stop(self):
            self.stopped = True

    store = PlugStateStore(str(tmp_path / "_state"))
    store.save(store.load("wedged"))  # stamps check_in = now
    q1, q2 = FakeQuery(), FakeQuery()
    dog = PlugWatchdog(store)
    dog.register("wedged", q1, lambda: q2)
    # fresh check_in: live query left alone
    assert dog.check().restarted == []
    assert not q1.stopped
    # stale check_in + still active → cancel + restart
    future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(seconds=120)
    report = dog.check(now=future)
    assert report.stale_plugs == ["wedged"] and report.restarted == ["wedged"]
    assert q1.stopped and dog.queries["wedged"][0] is q2
    # cooldown: check_in only refreshes on batch commit, so the restarted
    # query still looks stale — it must get a full window, not a kill loop
    assert dog.check(now=future).restarted == [] and not q2.stopped
    later = future + datetime.timedelta(seconds=120)
    assert dog.check(now=later).restarted == ["wedged"] and q2.stopped


def test_watchdog(spark, oplog, tmp_path):
    ops_path, trx_path, _, _ = oplog
    store = PlugStateStore(str(tmp_path / "_state"))
    srunner = StreamingPlugRunner(spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path))

    def restart():
        return srunner.start(fixtures.OPS_SCHEMA, available_now=True)

    q = restart()
    q.awaitTermination(120)
    assert not q.isActive  # availableNow query drains and stops
    dog = PlugWatchdog(store)
    dog.register("podping", q, restart)
    report = dog.check()
    assert report.restarted == ["podping"]  # dead query restarted (T11)
    q2 = dog.queries["podping"][0]
    q2.awaitTermination(120)
    # stale check_in detection (stuck sync, functions.sql:43)
    st = store.load("podping")
    store.save(st)
    old = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(seconds=120)
    assert dog.check(now=old).stale_plugs == ["podping"]

def test_fork_recovery_reentrant_after_crash(spark, oplog, tmp_path):
    """review r9: a crash mid-boundary-swap leaves a '.rewrite' dir that
    used to wedge every rerun (int('N.rewrite') ValueError). Both crash
    positions recover: source present → partial rewrite discarded and
    redone; source missing → completed rewrite renamed into place."""
    import os
    import shutil

    ops_path, trx_path, lo, hi = oplog
    fork = lo + (hi - lo) * 2 // 3
    runner = PlugRunner(
        spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP
    )
    runner.backfill(lo, hi)

    # simulate crash A: rewrite dir written, source still present
    tdir = runner._table_dir("polls_ops")
    boundary = os.path.join(tdir, f"block_bucket={fork // STEP}")
    shutil.copytree(boundary, boundary + ".rewrite")
    runner.recover_fork(fork)
    assert not os.path.exists(boundary + ".rewrite")
    truncated = _expected(spark, ops_path, trx_path, PLUGS["polls"], max_block=fork)
    _check_plug_outputs(runner, truncated)

    # simulate crash B: source deleted, completed rewrite left behind —
    # recovery must restore it by rename, losing nothing
    runner.backfill(lo, hi)
    boundary2 = os.path.join(tdir, f"block_bucket={fork // STEP}")
    os.rename(boundary2, boundary2 + ".rewrite")
    runner.recover_fork(fork)
    assert os.path.isdir(boundary2)
    _check_plug_outputs(runner, truncated)


def test_process_range_refuses_cross_bucket_ranges(spark, oplog, tmp_path):
    """review r9: process_range replaces whole block_bucket partitions, so
    a direct call crossing a bucket boundary would silently delete
    previously-synced rows — refused loudly; backfill's aligned chunks
    still pass."""
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(
        spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP
    )
    with pytest.raises(ValueError, match="crosses a block_bucket"):
        runner.process_range(STEP - 1, STEP)


def test_backfill_empty_range_records_no_floor(spark, oplog, tmp_path):
    """review r9: an inverted/empty range on a fresh store must not
    persist start_block or massive_synced — it used to permanently block
    earlier blocks from a later correct backfill."""
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(
        spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP
    )
    assert runner.backfill(hi, lo) == []  # inverted args → no-op
    st = runner.store.load("polls")
    assert st.start_block is None and not st.massive_synced
    # a later correct backfill covers the full range from lo
    ranges = runner.backfill(lo, lo + 2 * STEP)
    assert ranges and ranges[0][0] <= lo


def test_replayed_chunk_does_not_rewind_block_time(spark, oplog, tmp_path):
    """review r9: the monotonic guard covers latest_block_time too — a
    replayed old chunk must not pair a months-old time with a current
    cursor in status/health."""
    ops_path, trx_path, lo, hi = oplog
    runner = PlugRunner(
        spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path), step=STEP
    )
    runner.backfill(lo, hi)
    st = runner.store.load("polls")
    head_time, head_block = st.latest_block_time, st.latest_block_num
    # replay the first chunk (idempotent retry)
    first_bucket = (lo // STEP) * STEP
    runner.process_range(first_bucket, first_bucket + STEP - 1)
    st2 = runner.store.load("polls")
    assert st2.latest_block_num == head_block
    assert st2.latest_block_time == head_time


def test_streaming_dead_letter_and_replay_monotonicity(spark, oplog, tmp_path):
    """Two r10 live-path fixes (parity with the review-r9 batch fixes):
    (a) T14 on the stream — malformed-but-matched ops land in the same
    queryable _dead_letter table the backfill writes, so live and batch
    derivations of one log never diverge on evidence; (b) a REPLAYED
    epoch (restart after a crash between write and checkpoint commit)
    must rewind neither the cursor nor latest_block_time."""
    from haf_plug_play_spark.ingest.envelope import dead_letter

    ops_path, trx_path, lo, hi = oplog
    srunner = StreamingPlugRunner(
        spark, PLUGS["polls"], ops_path, trx_path, str(tmp_path)
    )
    q = srunner.start(fixtures.OPS_SCHEMA, available_now=True)
    q.awaitTermination(120)

    expected_dl = dead_letter(
        parse_custom_json(
            spark.read.parquet(ops_path), spark.read.parquet(trx_path)
        ),
        PLUGS["polls"].cj_ids,
    )
    _assert_same(
        srunner.read_table("_dead_letter"), expected_dl, "_dead_letter"
    )

    # replay: re-process the FIRST blocks directly (what foreachBatch does
    # on epoch retry) after the state has advanced past them
    state = srunner.store.load("polls")
    cursor, t = state.latest_block_num, state.latest_block_time
    # the cursor tracks the max PARSED block (matched cj_ids), which may
    # trail the raw log head by the unmatched tail — it must at least be
    # far past the replay batch below
    assert lo + 50 < cursor <= hi
    old_batch = spark.read.parquet(ops_path).filter(
        f"block_num <= {lo + 50}"
    )
    srunner._process_batch(old_batch, epoch_id=0)
    state2 = srunner.store.load("polls")
    assert state2.latest_block_num == cursor
    assert state2.latest_block_time == t
