"""Structured Streaming wrapper, health assessment, watchdog.

Reference parity:
- live sync loop (T1-T3): database/sql/sync.sql:3-42 → ``readStream`` over
  the op log + ``foreachBatch`` running the same plug transforms; offsets
  live in the Spark checkpoint instead of hpp.plug_state.
- exactly-once (T3): each epoch's rows land under ``_epoch=N`` and a retried
  epoch overwrites its own directory — idempotent replay, mirroring the
  reference's commit-per-chunk (sync.sql:108-111).
- health (T12): server/system_status.py:12-29 — BAD when any enabled plug
  lags the head by > 10 blocks or the head is > 30 s stale.
- watchdog (T11): database/plugs.py:89-102 — restart dead queries, flag
  plugs whose check_in went stale (> 60 s, database/sql/functions.sql:43),
  and cancel + restart live-but-wedged queries (the reference cancels the
  stuck backend, database/sql/functions.sql:49-62).
"""

from __future__ import annotations

import datetime
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from haf_plug_play_spark.ingest.envelope import dead_letter, parse_custom_json
from haf_plug_play_spark.plugs.framework import Plug
from haf_plug_play_spark.runner.state import PlugStateStore

MAX_HEALTHY_LAG_BLOCKS = 10  # server/system_status.py:23
MAX_HEALTHY_HEAD_AGE_S = 30  # server/system_status.py:25-26
STUCK_SYNC_S = 60  # database/sql/functions.sql:43


class StreamingPlugRunner:
    """Runs a plug as a streaming query over a growing op-log directory."""

    def __init__(
        self,
        spark: SparkSession,
        plug: Plug,
        ops_path: str,
        trx_path: str | None,
        out_root: str,
        checkpoint_root: str | None = None,
        fs=None,
    ) -> None:
        self.spark = spark
        self.plug = plug
        self.ops_path = ops_path
        self.trx_path = trx_path
        self.out_root = out_root
        self.checkpoint = checkpoint_root or os.path.join(out_root, "_checkpoints", plug.name)
        self.store = PlugStateStore(os.path.join(out_root, "_state"), fs=fs)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.out_root, self.plug.name, table)

    def _trx_for_range(self, lo: int, hi: int) -> DataFrame:
        """Trx scan clipped to a block range — the filter reaches the parquet
        scan (PushedFilters), mirroring the batch path (batch.py). Without
        this, every epoch re-read the ENTIRE trx log: a per-epoch full scan
        of a 100 TB table, for a join that only needs the batch's blocks."""
        return self.spark.read.parquet(self.trx_path).filter(
            F.col("block_num").between(lo, hi)
        )

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        trx = None
        if self.trx_path:
            rng = batch_df.agg(
                F.min("block_num").alias("lo"), F.max("block_num").alias("hi")
            ).first()
            if rng is not None and rng.lo is not None:
                trx = self._trx_for_range(int(rng.lo), int(rng.hi))
        # persist: the parse feeds one write per output table plus the
        # head agg — the same N+1-scans-per-chunk defect review r9 fixed
        # in PlugRunner.process_range, which this path had missed
        parsed = parse_custom_json(batch_df, trx).persist()
        try:
            out = dict(self.plug.silver_transform(parsed))
            # T14 parity with the batch runner: malformed-but-matched ops
            # land in a queryable dead-letter table on the LIVE path too —
            # a stream that silently drops evidence diverges from the
            # backfill of the same log
            out["_dead_letter"] = dead_letter(parsed, self.plug.cj_ids)
            for table, df in out.items():
                # overwrite-by-epoch: replaying epoch N rewrites only its own dir
                df.write.mode("overwrite").parquet(
                    os.path.join(self._table_dir(table), f"_epoch={epoch_id}")
                )
            head = parsed.agg(
                F.max("block_num").alias("b"), F.max("created").alias("t")
            ).first()
        finally:
            parsed.unpersist()
        state = self.store.load(self.plug.name)
        if head and head.b is not None:
            # monotonic cursor AND time: a replayed epoch (restart after a
            # crash between write and checkpoint commit) must not rewind
            # either — the time previously rode every replay while the
            # cursor held (the review-r9 batch fix, missed here), and a
            # NULL created max must not kill the stream in foreachBatch
            advanced = int(head.b) > state.latest_block_num
            state.latest_block_num = max(state.latest_block_num, int(head.b))
            if advanced and head.t is not None:
                state.latest_block_time = head.t.strftime("%Y-%m-%dT%H:%M:%S")
        self.store.save(state)

    def start(self, ops_schema, available_now: bool = True) -> StreamingQuery:
        # per-plug scheduler pool, mirroring the batch path (see
        # PlugRunner.process_range): concurrent plug streams fair-share
        self.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"plug-{self.plug.name}"
        )
        stream = (
            self.spark.readStream.schema(ops_schema)
            .option("maxFilesPerTrigger", 4)  # rate limit ≙ 100-block chunks (T2)
            .parquet(self.ops_path)
        )
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def read_table(self, table: str) -> DataFrame:
        return self.spark.read.option("recursiveFileLookup", "true").parquet(
            self._table_dir(table)
        )

    def promote_epochs(self, step: int = 100, fs=None, keep_latest: bool = True) -> dict:
        """Fold accumulated ``_epoch=N`` dirs into the batch block-bucket
        layout (maintenance.promote_epochs) for every table this plug has
        written. Run between triggers or while the stream is stopped (pass
        ``keep_latest=False`` only when stopped). A long-lived stream calls
        this periodically so its table dirs stay at a bounded file count
        instead of one dir per epoch forever."""
        from haf_plug_play_spark.runner.fs import LocalFS
        from haf_plug_play_spark.runner.maintenance import promote_epochs

        fs = fs or LocalFS()
        root = os.path.join(self.out_root, self.plug.name)
        total = {"epochs_promoted": 0, "buckets_written": 0}
        for table in fs.listdir(root):
            if table.endswith(".maintenance"):
                continue
            s = promote_epochs(
                self.spark, os.path.join(root, table), step, fs=fs,
                keep_latest=keep_latest,
            )
            for k in total:
                total[k] += s[k]
        return total


# ---------------------------------------------------------------- health


def sync_status(
    spark: SparkSession,
    ops_path: str,
    store: PlugStateStore,
    plugs: list[Plug],
    now: datetime.datetime | None = None,
) -> dict:
    """System status ≙ GET /api (server/system_status.py:12-29)."""
    # Epoch seconds computed JVM-side: collect() renders timestamps in the
    # PROCESS-local timezone, which would skew the age by the UTC offset on
    # non-UTC hosts; unix_timestamp is timezone-proof.
    head = (
        spark.read.parquet(ops_path)
        .agg(
            F.max("block_num").alias("b"),
            F.max(F.unix_timestamp("timestamp")).alias("epoch"),
        )
        .first()
    )
    now = now or datetime.datetime.now(datetime.timezone.utc)
    head_age = (now.timestamp() - head.epoch) if head and head.epoch is not None else None
    plug_rows = []
    healthy = head_age is not None and head_age <= MAX_HEALTHY_HEAD_AGE_S
    for plug in plugs:
        if not plug.enabled:
            continue
        st = store.load(plug.name)
        lag = (head.b - st.latest_block_num) if head.b is not None else None
        plug_ok = lag is not None and lag <= MAX_HEALTHY_LAG_BLOCKS
        healthy = healthy and plug_ok
        plug_rows.append(
            {
                "plug": plug.name,
                "latest_block_num": st.latest_block_num,
                "latest_block_time": st.latest_block_time,
                "lag_blocks": lag,
                "healthy": plug_ok,
            }
        )
    return {
        "status": "GOOD" if healthy else "BAD",
        "head_block_num": head.b,
        "head_age_seconds": head_age,
        "plugs": plug_rows,
    }


# ---------------------------------------------------------------- watchdog


@dataclass
class WatchdogReport:
    stale_plugs: list[str]
    restarted: list[str]


class PlugWatchdog:
    """≙ AvailablePlugs.plug_watch (database/plugs.py:89-102): every cycle,
    flag plugs whose check_in is stale and restart dead streaming queries."""

    def __init__(self, store: PlugStateStore, stuck_after_s: float = STUCK_SYNC_S) -> None:
        self.store = store
        self.stuck_after_s = stuck_after_s
        self.queries: dict[str, tuple[StreamingQuery, object]] = {}
        self._last_restart: dict[str, datetime.datetime] = {}

    def register(self, plug_name: str, query: StreamingQuery, restart) -> None:
        self.queries[plug_name] = (query, restart)

    def check(self, now: datetime.datetime | None = None) -> WatchdogReport:
        now = now or datetime.datetime.now(datetime.timezone.utc)
        stale, restarted = [], []
        for name, (query, restart) in list(self.queries.items()):
            age = self.store.check_in_age(name, now)
            stuck = age is not None and age > self.stuck_after_s
            if stuck:
                stale.append(name)
            # cooldown: check_in only refreshes when a batch COMMITS, so a
            # freshly-restarted query still shows the stale timestamp; give
            # every restart a full stuck_after_s window to make progress or
            # the cancel path becomes a kill loop that never lets a slow
            # batch finish
            last = self._last_restart.get(name)
            in_cooldown = (
                last is not None and (now - last).total_seconds() <= self.stuck_after_s
            )
            if query is not None and not query.isActive:
                new_query = restart()
                self.queries[name] = (new_query, restart)
                self._last_restart[name] = now
                restarted.append(name)
            elif query is not None and stuck and not in_cooldown:
                # live-but-wedged query: cancel + restart, parity with the
                # reference's stuck-sync backend cancel
                # (database/sql/functions.sql:49-62, database/plugs.py:98-101)
                query.stop()
                new_query = restart()
                self.queries[name] = (new_query, restart)
                self._last_restart[name] = now
                restarted.append(name)
        return WatchdogReport(stale_plugs=stale, restarted=restarted)
