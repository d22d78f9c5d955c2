"""Manifest-committed snapshot tables (runner/snapshots.py): commit /
read / time-travel / compaction / vacuum, crash-injection at the commit
point, through BOTH filesystem implementations (HadoopFS exercises the
real Hadoop code path over file://)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from haf_plug_play_spark.runner import snapshots as sn
from haf_plug_play_spark.runner.fs import (
    EmulatedObjectStore,
    FakeBoto3S3Client,
    HadoopFS,
    LocalFS,
    ObjectStoreFS,
    PreconditionFailed,
    S3ObjectStore,
)


@pytest.fixture(params=["local", "hadoop", "object", "s3"])
def fs(request, spark):
    if request.param == "local":
        return LocalFS()
    if request.param == "object":
        return ObjectStoreFS(EmulatedObjectStore())
    if request.param == "s3":
        # the boto3-shaped adapter over the botocore-shaped fake client:
        # the whole snapshot suite runs through the S3 API surface, so
        # swapping in boto3.client("s3") is config-only (VERDICT r7 #7)
        return ObjectStoreFS(S3ObjectStore(FakeBoto3S3Client(), "test-bucket"))
    return HadoopFS(spark)


def _df(spark, version: int, rows: int = 100):
    return spark.range(rows).selectExpr("id", f"{version} AS v")


def test_commit_read_time_travel(spark, fs, tmp_path):
    t = str(tmp_path / "tbl")
    m1 = sn.commit_snapshot(spark, _df(spark, 1), t, fs)
    assert m1["snapshot_id"] == 1 and m1["parent"] is None
    assert sn.read_snapshot(spark, t, fs).agg({"v": "max"}).collect()[0][0] == 1

    m2 = sn.commit_snapshot(spark, _df(spark, 2, rows=50), t, fs)
    assert m2["snapshot_id"] == 2 and m2["parent"] == 1
    cur = sn.read_snapshot(spark, t, fs)
    assert cur.count() == 50 and cur.agg({"v": "max"}).collect()[0][0] == 2
    # time travel: snapshot 1 still readable until vacuumed
    old = sn.read_snapshot(spark, t, fs, snapshot_id=1)
    assert old.count() == 100 and old.agg({"v": "max"}).collect()[0][0] == 1


def test_crashed_commit_is_unobservable(spark, fs, tmp_path):
    """Crash AFTER data + manifest but BEFORE the pointer swap: readers
    still see the old snapshot; the next commit allocates a fresh id past
    the orphan manifest; opt-in vacuum reclaims the garbage."""
    t = str(tmp_path / "tbl")
    sn.commit_snapshot(spark, _df(spark, 1), t, fs)

    class CrashAtPointer:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def write_bytes_atomic(self, path, data):
            if os.path.basename(path) == "_current":
                raise RuntimeError("injected crash at commit point")
            self._inner.write_bytes_atomic(path, data)

        def swap_if_current(self, path, expected, data):
            # the CAS-capable commit point routes here instead
            raise RuntimeError("injected crash at commit point")

    with pytest.raises(RuntimeError, match="injected crash"):
        sn.commit_snapshot(spark, _df(spark, 2), t, CrashAtPointer(fs))

    # reader: old snapshot, no partial state observable
    assert sn.read_snapshot(spark, t, fs).agg({"v": "max"}).collect()[0][0] == 1
    # writer: next id rides the manifest listing, so no collision with the
    # orphan manifest-2
    m3 = sn.commit_snapshot(spark, _df(spark, 3), t, fs)
    assert m3["snapshot_id"] == 3 and m3["parent"] == 1
    assert sn.read_snapshot(spark, t, fs).agg({"v": "max"}).collect()[0][0] == 3
    # the crashed commit is not history: time travel refuses it
    with pytest.raises(FileNotFoundError, match="not retained"):
        sn.read_snapshot(spark, t, fs, snapshot_id=2)

    # safe-by-default vacuum keeps the orphan dir; opt-in removes it
    before = set(fs.listdir(os.path.join(t, "data")))
    rep = sn.vacuum(t, fs, keep_last=10)
    assert set(fs.listdir(os.path.join(t, "data"))) == before
    rep = sn.vacuum(t, fs, keep_last=10, delete_orphans=True)
    assert len(rep["deleted_dirs"]) == 1  # the crashed commit's data dir
    assert sn.read_snapshot(spark, t, fs).agg({"v": "max"}).collect()[0][0] == 3


def test_rewrite_and_vacuum(spark, fs, tmp_path):
    t = str(tmp_path / "tbl")
    sn.commit_snapshot(spark, _df(spark, 1).repartition(16), t, fs)
    m2 = sn.rewrite_snapshot(spark, t, fs, target_files=2)
    assert m2["snapshot_id"] == 2
    cur = sn.read_snapshot(spark, t, fs)
    assert cur.count() == 100 and cur.rdd.getNumPartitions() <= 2

    sn.commit_snapshot(spark, _df(spark, 3), t, fs)
    rep = sn.vacuum(t, fs, keep_last=2)
    assert rep["kept"] == [2, 3]
    assert rep["deleted_manifests"] and rep["deleted_dirs"]
    # snapshot 1 is gone, 2 and 3 remain readable
    with pytest.raises(FileNotFoundError, match="not retained"):
        sn.read_snapshot(spark, t, fs, snapshot_id=1)
    assert sn.read_snapshot(spark, t, fs, snapshot_id=2).count() == 100
    assert sn.read_snapshot(spark, t, fs).agg({"v": "max"}).collect()[0][0] == 3


def test_empty_table_raises(spark, fs, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        sn.read_snapshot(spark, str(tmp_path / "none"), fs)


def test_append_commits_accumulate_without_rewrite(spark, fs, tmp_path):
    """Append commits: each writes ONLY the delta dir; the manifest lists
    parent dirs + the new one, the current read is the union, and time
    travel sees each prefix."""
    t = str(tmp_path / "tbl")
    m1 = sn.append_snapshot(spark, _df(spark, 1, rows=10), t, fs)
    m2 = sn.append_snapshot(spark, _df(spark, 2, rows=20), t, fs)
    m3 = sn.append_snapshot(spark, _df(spark, 3, rows=30), t, fs)
    assert len(sn._data_dirs(m1)) == 1
    assert len(sn._data_dirs(m2)) == 2
    assert len(sn._data_dirs(m3)) == 3
    assert sn._data_dirs(m2)[0] == sn._data_dirs(m1)[0]  # shared, not copied
    assert sn.read_snapshot(spark, t, fs).count() == 60
    assert sn.read_snapshot(spark, t, fs, snapshot_id=2).count() == 30


def test_append_batch_id_is_idempotent(spark, fs, tmp_path):
    """An at-least-once writer retrying the already-committed batch must
    be a no-op — the exactly-once contract foreachBatch needs."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark, _df(spark, 1, rows=10), t, fs, batch_id=0)
    m = sn.append_snapshot(spark, _df(spark, 2, rows=20), t, fs, batch_id=1)
    retry = sn.append_snapshot(spark, _df(spark, 2, rows=20), t, fs, batch_id=1)
    assert retry["snapshot_id"] == m["snapshot_id"]
    assert sn.read_snapshot(spark, t, fs).count() == 30


def test_vacuum_never_deletes_dirs_shared_with_kept_appends(spark, fs, tmp_path):
    """Vacuuming old append manifests must keep every data dir the
    current manifest still lists — append chains share dirs."""
    t = str(tmp_path / "tbl")
    for v in (1, 2, 3):
        sn.append_snapshot(spark, _df(spark, v, rows=10), t, fs)
    rep = sn.vacuum(t, fs, keep_last=1)
    assert rep["kept"] == [3]
    assert rep["deleted_dirs"] == []  # snapshots 1-2's dirs live on in 3
    assert sn.read_snapshot(spark, t, fs).count() == 30
    # after a REWRITE (fresh dirs), vacuum reclaims the whole old chain
    sn.rewrite_snapshot(spark, t, fs, target_files=1)
    rep = sn.vacuum(t, fs, keep_last=1)
    assert len(rep["deleted_dirs"]) == 3
    assert sn.read_snapshot(spark, t, fs).count() == 30


def test_stream_publishes_through_append_snapshots(spark, tmp_path):
    """End-to-end stream → snapshot publication: a rate-limited file
    stream appends each micro-batch through the manifest commit, so
    readers only ever observe committed batch boundaries and the final
    table equals the batch input exactly once."""
    import shutil

    src = str(tmp_path / "src")
    t = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    spark.range(100).selectExpr("id", "id % 7 AS v").write.parquet(src)
    schema = spark.read.parquet(src).schema
    fs = LocalFS()

    def publish(batch_df, batch_id):
        sn.append_snapshot(spark, batch_df, t, fs, batch_id=batch_id)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(publish)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = sn.read_snapshot(spark, t, fs)
    assert out.count() == 100
    assert out.selectExpr("sum(id)").collect()[0][0] == 4950
    shutil.rmtree(ck, ignore_errors=True)


def test_append_batch_id_scoped_by_writer(spark, fs, tmp_path):
    """A SECOND stream (fresh checkpoint → its own batch 0) appending to
    the same table must not be mistaken for a retry of the first
    stream's batch — idempotency keys on (writer_id, batch_id)."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark, _df(spark, 1, rows=10), t, fs, batch_id=0, writer_id="a")
    m = sn.append_snapshot(
        spark, _df(spark, 2, rows=20), t, fs, batch_id=0, writer_id="b"
    )
    assert m["snapshot_id"] == 2  # a real commit, not a skipped retry
    assert sn.read_snapshot(spark, t, fs).count() == 30
    retry = sn.append_snapshot(
        spark, _df(spark, 2, rows=20), t, fs, batch_id=0, writer_id="b"
    )
    assert retry["snapshot_id"] == 2  # the true retry IS skipped
    assert sn.read_snapshot(spark, t, fs).count() == 30


class _RacingFS(LocalFS):
    """Injects a competing full commit at the worst moment: after the
    victim read the pointer and staged its data, right before its own
    manifest write — so the victim's CAS expectation is stale by the
    time it reaches the commit point."""

    def __init__(self, spark, table_dir, competitor_df):
        self._spark = spark
        self._table_dir = table_dir
        self._competitor_df = competitor_df
        self._fired = False

    def write_bytes_atomic(self, path, data):
        if not self._fired and "/manifests/manifest-" in path:
            self._fired = True
            sn.commit_snapshot(
                self._spark, self._competitor_df, self._table_dir, LocalFS()
            )
        super().write_bytes_atomic(path, data)


def test_concurrent_commit_one_wins_loser_raises(spark, tmp_path):
    from haf_plug_play_spark.runner.fs import ConcurrentWriteError

    table = str(tmp_path / "tbl")
    base = spark.range(5).withColumnRenamed("id", "v")
    sn.commit_snapshot(spark, base, table, LocalFS())

    winner_df = spark.range(100, 103).withColumnRenamed("id", "v")
    loser_df = spark.range(200, 209).withColumnRenamed("id", "v")
    racing = _RacingFS(spark, table, winner_df)
    with pytest.raises(ConcurrentWriteError):
        sn.commit_snapshot(spark, loser_df, table, racing)

    # the interleaved commit won; the loser's snapshot is invisible
    got = sorted(r.v for r in sn.read_snapshot(spark, table, LocalFS()).collect())
    assert got == [100, 101, 102]
    # the loser cleaned up its staged manifest + data dir (racing writers
    # pick the SAME next id, so a leftover would be ambiguous): listing
    # equals the committed chain exactly, data/ holds only chain dirs
    chain = sn.committed_chain(table, LocalFS())
    chain_ids = {m["snapshot_id"] for m in chain}
    assert set(sn._manifest_ids(table, LocalFS())) == chain_ids
    chain_dirs = {d.split("/", 1)[1] for m in chain for d in sn._data_dirs(m)}
    assert set(LocalFS().listdir(os.path.join(table, "data"))) == chain_dirs


def test_orphan_manifest_sharing_committed_id_is_not_history(spark, tmp_path):
    """A CAS loser that crashed between its manifest write and its cleanup
    leaves an orphan manifest SHARING the winner's snapshot id (racing
    writers pick the same next id by construction). Lineage must resolve
    by manifest NAME: the orphan is never served as history, time travel
    to the shared id returns the committed snapshot, and opt-in vacuum
    reclaims the orphan without touching committed data."""
    import json

    t = str(tmp_path / "tbl")
    fs = LocalFS()
    sn.commit_snapshot(spark, _df(spark, 1), t, fs)
    name1 = sn._manifest_ids(t, fs)[1]
    sn.commit_snapshot(spark, _df(spark, 2), t, fs)

    # forge the crashed loser: same id (2) as the winner, own data dir,
    # name sorting AFTER the winner's so an id-keyed dict would keep it
    orphan_dir = "data/snap-00000002-ffffffff"
    _df(spark, 99).write.parquet(os.path.join(t, orphan_dir))
    orphan = {
        "snapshot_id": 2,
        "data_dirs": [orphan_dir],
        "parent": 1,
        "parent_manifest": name1,
        "schema": [["id", "bigint"], ["v", "int"]],
        "committed_utc": "2026-01-01T00:00:00+00:00",
    }
    fs.write_bytes_atomic(
        os.path.join(t, "manifests", "manifest-00000002-ffffffff.json"),
        json.dumps(orphan).encode("utf-8"),
    )

    m3 = sn.commit_snapshot(spark, _df(spark, 3), t, fs)
    assert m3["snapshot_id"] == 3 and m3["parent"] == 2
    # the chain walks the winner's manifest, never the orphan
    chain = sn.committed_chain(t, fs)
    assert [m["snapshot_id"] for m in chain] == [3, 2, 1]
    assert all(m["data_dirs"] != [orphan_dir] for m in chain)
    # time travel to the shared id serves the COMMITTED snapshot
    assert (
        sn.read_snapshot(spark, t, fs, snapshot_id=2)
        .agg({"v": "max"}).collect()[0][0] == 2
    )
    # safe-by-default vacuum keeps everything committed AND leaves the
    # orphan alone; opt-in vacuum reclaims exactly the orphan
    rep = sn.vacuum(t, fs, keep_last=10)
    assert rep["deleted_manifests"] == [] and rep["deleted_dirs"] == []
    rep = sn.vacuum(t, fs, keep_last=10, delete_orphans=True)
    assert rep["deleted_manifests"] == ["manifest-00000002-ffffffff.json"]
    assert rep["deleted_dirs"] == [orphan_dir]
    for sid in (1, 2, 3):
        got = sn.read_snapshot(spark, t, fs, snapshot_id=sid)
        assert got.agg({"v": "max"}).collect()[0][0] == sid


def test_cas_swap_primitive(tmp_path):
    from haf_plug_play_spark.runner.fs import ConcurrentWriteError

    fs = LocalFS()
    p = str(tmp_path / "ptr")
    # first write: expected None means "must not exist"
    fs.swap_if_current(p, None, b"a")
    assert fs.read_bytes(p) == b"a"
    with pytest.raises(ConcurrentWriteError):
        fs.swap_if_current(p, None, b"b")
    with pytest.raises(ConcurrentWriteError):
        fs.swap_if_current(p, b"stale", b"b")
    fs.swap_if_current(p, b"a", b"b")
    assert fs.read_bytes(p) == b"b"


def test_emulated_store_conditional_put(tmp_path):
    """The store-level conditional-write protocol itself: If-None-Match:*
    refuses an existing object; If-Match refuses a stale ETag — the public
    S3/GCS semantics the CAS snapshot commit rides on remotely."""
    s = EmulatedObjectStore()
    k = str(tmp_path / "k")
    s.put(k, b"v1", if_none_match_star=True)
    with pytest.raises(PreconditionFailed, match="If-None-Match"):
        s.put(k, b"v2", if_none_match_star=True)
    etag = s.get(k)[1]
    s.put(k, b"v2", if_match=etag)
    assert s.get(k)[0] == b"v2"
    with pytest.raises(PreconditionFailed, match="If-Match"):
        s.put(k, b"v3", if_match=etag)  # stale: content changed since read
    assert s.get(k)[0] == b"v2"


def test_object_store_swap_primitive(tmp_path):
    from haf_plug_play_spark.runner.fs import ConcurrentWriteError

    fs = ObjectStoreFS(EmulatedObjectStore())
    p = str(tmp_path / "ptr")
    fs.swap_if_current(p, None, b"a")
    assert fs.read_bytes(p) == b"a"
    with pytest.raises(ConcurrentWriteError):
        fs.swap_if_current(p, None, b"b")
    with pytest.raises(ConcurrentWriteError):
        fs.swap_if_current(p, b"stale", b"b")
    fs.swap_if_current(p, b"a", b"b")
    assert fs.read_bytes(p) == b"b"


def test_object_store_swap_closes_read_put_window(tmp_path):
    """A writer that lands BETWEEN our pointer read and our conditional
    PUT must be detected BY THE STORE (If-Match on the ETag just read →
    412), not by the client's body compare — this is the window a plain
    read-check-write cannot close and the whole reason conditional PUT
    exists."""
    from haf_plug_play_spark.runner.fs import ConcurrentWriteError

    class StaleReadStore(EmulatedObjectStore):
        def __init__(self):
            self.fired = False

        def get(self, key):
            got = super().get(key)
            if got is not None and not self.fired:
                self.fired = True
                # competitor commits right after our read
                super().put(key, b"competitor")
            return got

    store = StaleReadStore()
    fs = ObjectStoreFS(store)
    p = str(tmp_path / "ptr")
    store.put(p, b"a")  # unconditional seed (no get involved)
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        fs.swap_if_current(p, b"a", b"mine")
    assert store.fired
    # the competitor's write won; ours never landed
    assert EmulatedObjectStore().get(p)[0] == b"competitor"


def test_concurrent_commit_through_object_store(spark, tmp_path):
    """The two-writer snapshot race, end-to-end through the conditional-
    PUT store: exactly one commits, the loser raises and self-cleans —
    the remote twin of test_concurrent_commit_one_wins_loser_raises."""
    from haf_plug_play_spark.runner.fs import ConcurrentWriteError

    store = EmulatedObjectStore()
    table = str(tmp_path / "tbl")
    sn.commit_snapshot(
        spark, spark.range(5).withColumnRenamed("id", "v"), table,
        ObjectStoreFS(store),
    )
    winner_df = spark.range(100, 103).withColumnRenamed("id", "v")
    loser_df = spark.range(200, 209).withColumnRenamed("id", "v")

    class Racing(ObjectStoreFS):
        def __init__(self):
            super().__init__(store)
            self._fired = False

        def write_bytes_atomic(self, path, data):
            if not self._fired and "/manifests/manifest-" in path:
                self._fired = True
                sn.commit_snapshot(spark, winner_df, table, ObjectStoreFS(store))
            super().write_bytes_atomic(path, data)

    with pytest.raises(ConcurrentWriteError):
        sn.commit_snapshot(spark, loser_df, table, Racing())

    ofs = ObjectStoreFS(store)
    got = sorted(r.v for r in sn.read_snapshot(spark, table, ofs).collect())
    assert got == [100, 101, 102]
    chain = sn.committed_chain(table, ofs)
    chain_ids = {m["snapshot_id"] for m in chain}
    assert set(sn._manifest_ids(table, ofs)) == chain_ids
    chain_dirs = {d.split("/", 1)[1] for m in chain for d in sn._data_dirs(m)}
    assert set(ofs.listdir(os.path.join(table, "data"))) == chain_dirs
    # require_cas is satisfiable remotely now: a further commit under it
    sn.commit_snapshot(
        spark, spark.range(2).withColumnRenamed("id", "v"), table,
        ofs, require_cas=True,
    )


def test_hadoopfs_cas_probe_and_require_cas(spark, tmp_path):
    hfs = HadoopFS(spark)
    assert hfs.supports_cas is False
    with pytest.raises(NotImplementedError, match="conditional PUT"):
        hfs.swap_if_current(str(tmp_path / "p"), None, b"x")
    df = spark.range(3).withColumnRenamed("id", "v")
    with pytest.raises(NotImplementedError, match="require_cas"):
        sn.commit_snapshot(
            spark, df, f"file://{tmp_path}/t", hfs, require_cas=True
        )
    # the capability check fires BEFORE any write: no table dir, no
    # orphan parquet burned per refused attempt
    assert not (tmp_path / "t").exists()


def test_s3_adapter_conditional_put_and_pagination(tmp_path):
    """The boto3-shaped adapter's own contract: conditional writes map
    store-side 412s to PreconditionFailed (If-None-Match:* on an existing
    object; If-Match on a stale ETag), reads round-trip bytes + ETag
    through the botocore response shapes, and list_keys drains the
    paginated ListObjectsV2 (the fake pages at 2 keys, so 5 objects need
    three continuation rounds)."""
    s = S3ObjectStore(FakeBoto3S3Client(), "test-bucket")
    k = str(tmp_path / "k")
    assert s.head(k) is None and s.get(k) is None
    s.put(k, b"v1", if_none_match_star=True)
    with pytest.raises(PreconditionFailed):
        s.put(k, b"v2", if_none_match_star=True)
    data, etag = s.get(k)
    assert data == b"v1" and s.head(k) == {"etag": etag, "size": 2}
    s.put(k, b"v2", if_match=etag)
    assert s.get(k)[0] == b"v2"
    with pytest.raises(PreconditionFailed):
        s.put(k, b"v3", if_match=etag)  # stale: content changed since read
    assert s.get(k)[0] == b"v2"

    for i in range(5):
        s.put(str(tmp_path / "many" / f"obj{i}"), b"x")
    assert s.list_keys(str(tmp_path / "many")) == [
        str(tmp_path / "many" / f"obj{i}") for i in range(5)
    ]
    s.delete(k)
    assert s.get(k) is None
    s.delete(k)  # idempotent


def test_s3_adapter_swap_closes_read_put_window(tmp_path):
    """The read-put race through the S3 API path: a competitor landing
    between the pointer read and the conditional PUT is refused by the
    STORE's If-Match (412 → ConcurrentWriteError), mirroring
    test_object_store_swap_closes_read_put_window over boto3 shapes."""
    from haf_plug_play_spark.runner.fs import ConcurrentWriteError

    class RacingClient(FakeBoto3S3Client):
        def __init__(self):
            super().__init__()
            self.fired = False

        def get_object(self, *, Bucket, Key):
            got = super().get_object(Bucket=Bucket, Key=Key)
            if not self.fired:
                self.fired = True
                super().put_object(Bucket=Bucket, Key=Key, Body=b"competitor")
            return got

    client = RacingClient()
    fs = ObjectStoreFS(S3ObjectStore(client, "test-bucket"))
    p = str(tmp_path / "ptr")
    FakeBoto3S3Client().put_object(
        Bucket="test-bucket", Key=p.lstrip("/"), Body=b"a"
    )
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        fs.swap_if_current(p, b"a", b"mine")
    assert client.fired
    assert ObjectStoreFS(EmulatedObjectStore()).read_bytes(p) == b"competitor"


def test_s3_fake_pagination_stable_under_concurrent_mutation(tmp_path):
    """ADVICE r8: the fake's continuation token anchors on the LAST
    RETURNED KEY (StartAfter semantics), not a positional index — a key
    inserted or deleted between pages must neither skip nor repeat the
    survivors. Drives list_objects_v2 page-by-page, mutating the keyspace
    between pages."""
    client = FakeBoto3S3Client()
    base = str(tmp_path / "mut").lstrip("/")
    for i in range(5):
        client.put_object(Bucket="b", Key=f"{base}/k{i}", Body=b"x")

    # page 1 (fake pages at 2): k0, k1
    r1 = client.list_objects_v2(Bucket="b", Prefix=base)
    got = [c["Key"] for c in r1["Contents"]]
    assert got == [f"{base}/k0", f"{base}/k1"] and r1["IsTruncated"]

    # DELETE one already-returned key and one not-yet-returned key,
    # INSERT a key sorting between the cursor and the remainder
    client.delete_object(Bucket="b", Key=f"{base}/k0")
    client.delete_object(Bucket="b", Key=f"{base}/k3")
    client.put_object(Bucket="b", Key=f"{base}/k1a", Body=b"x")

    seen = list(got)
    token = r1["NextContinuationToken"]
    while True:
        r = client.list_objects_v2(
            Bucket="b", Prefix=base, ContinuationToken=token
        )
        seen += [c["Key"] for c in r["Contents"]]
        if not r["IsTruncated"]:
            break
        token = r["NextContinuationToken"]

    # no repeats, and every surviving not-yet-listed key appears exactly
    # once (k1a inserted after the cursor, k2, k4; k3 deleted mid-scan)
    assert len(seen) == len(set(seen))
    assert set(seen) >= {f"{base}/k1a", f"{base}/k2", f"{base}/k4"}
    assert f"{base}/k3" not in seen[2:]


def test_retried_batch_after_interleaved_commit_is_still_idempotent(
    spark, fs, tmp_path
):
    """review r9: the idempotency key rides a per-writer high-water map
    carried by EVERY manifest, so a batch retry is recognized even after
    another stream's commit or a compaction landed in between (checking
    only the head manifest re-appended the batch — broken exactly-once)."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark, _df(spark, 1, rows=10), t, fs,
                       batch_id=5, writer_id="A")
    # interleaved: a DIFFERENT stream commits...
    sn.append_snapshot(spark, _df(spark, 2, rows=20), t, fs,
                       batch_id=9, writer_id="B")
    # ...and A retries its already-landed batch 5 → must be a no-op
    sn.append_snapshot(spark, _df(spark, 1, rows=10), t, fs,
                       batch_id=5, writer_id="A")
    assert sn.read_snapshot(spark, t, fs).count() == 30

    # same through COMPACTION, which drops batch_id/writer_id but must
    # carry the writers map forward
    sn.rewrite_snapshot(spark, t, fs, target_files=1)
    sn.append_snapshot(spark, _df(spark, 2, rows=20), t, fs,
                       batch_id=9, writer_id="B")
    assert sn.read_snapshot(spark, t, fs).count() == 30
    # a genuinely NEW batch still lands
    sn.append_snapshot(spark, _df(spark, 3, rows=5), t, fs,
                       batch_id=10, writer_id="B")
    assert sn.read_snapshot(spark, t, fs).count() == 35


def test_read_snapshot_honors_manifest_schema_on_evolved_appends(
    spark, fs, tmp_path
):
    """review r9: an append chain whose later batches added a column must
    read with the committing manifest's schema — old files fill NULL —
    instead of taking an arbitrary file footer and dropping the column."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark, _df(spark, 1, rows=4), t, fs, batch_id=0)
    evolved = _df(spark, 2, rows=6).withColumn("medium", F.lit("podcast"))
    sn.append_snapshot(spark, evolved, t, fs, batch_id=1)
    got = sn.read_snapshot(spark, t, fs)
    assert "medium" in got.columns
    rows = got.collect()
    assert len(rows) == 10
    assert sum(1 for r in rows if r.medium == "podcast") == 6
    assert sum(1 for r in rows if r.medium is None) == 4


def test_append_missing_column_keeps_union_schema(spark, fs, tmp_path):
    """ADVICE r9: the manifest records the UNION of the inherited chain's
    schema and the batch's, not the committing batch's alone — an append
    whose batch LACKS a column present in earlier data_dirs must not drop
    that column from every subsequent read."""
    t = str(tmp_path / "tbl")
    wide = _df(spark, 1, rows=4).withColumn("medium", F.lit("podcast"))
    sn.append_snapshot(spark, wide, t, fs, batch_id=0)
    narrow = _df(spark, 2, rows=6)  # no 'medium'
    m = sn.append_snapshot(spark, narrow, t, fs, batch_id=1)
    assert ["medium", "string"] in m["schema"]
    got = sn.read_snapshot(spark, t, fs)
    assert "medium" in got.columns
    rows = got.collect()
    assert len(rows) == 10
    assert sum(1 for r in rows if r.medium == "podcast") == 4
    assert sum(1 for r in rows if r.medium is None) == 6


def test_append_type_change_fails_at_commit(spark, fs, tmp_path):
    """ADVICE r9: a cross-batch type change on an inherited chain must
    fail AT COMMIT (the earlier files cannot be read with the new type),
    not commit a snapshot whose every read then dies — and the failed
    attempt must not have moved the pointer."""
    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark, _df(spark, 1, rows=4), t, fs, batch_id=0)
    retyped = _df(spark, 2, rows=6).withColumn("v", F.col("v").cast("string"))
    with pytest.raises(ValueError, match="type evolution"):
        sn.append_snapshot(spark, retyped, t, fs, batch_id=1)
    got = sn.read_snapshot(spark, t, fs)
    assert got.count() == 4  # chain still the pre-append snapshot
    assert dict(got.dtypes)["v"] == "int"
    # the validation fires BEFORE the parquet write: a failed append must
    # not leave an orphan data dir per retry
    if os.path.isdir(os.path.join(t, "data")):
        assert len(os.listdir(os.path.join(t, "data"))) == 1


def _legacyize_head(table_dir, fs, keep_cols):
    """Rewrite the head manifest as a pre-r11 one: batch-only schema,
    no schema_covers_chain stamp — simulating a chain committed before
    the union format existed."""
    import json

    name = sn._current_name(table_dir, fs)
    mpath = os.path.join(table_dir, "manifests", name)
    m = json.loads(fs.read_bytes(mpath).decode("utf-8"))
    m["schema"] = [e for e in m["schema"] if e[0] in keep_cols]
    m.pop("schema_covers_chain", None)
    fs.write_bytes_atomic(mpath, json.dumps(m, indent=1).encode("utf-8"))


def test_append_on_legacy_chain_unions_grandparent_schema(spark, fs, tmp_path):
    """ADVICE r10: manifests committed before the union format recorded
    only their own batch's schema, so trusting the immediate parent's
    recorded schema could still drop a GRANDPARENT column. An append on
    such a chain must walk the committed chain and union every
    ancestor's schema — and stamp the result so the next append trusts
    it without re-walking."""
    t = str(tmp_path / "tbl")
    wide = _df(spark, 1, rows=4).withColumn("medium", F.lit("podcast"))
    sn.append_snapshot(spark, wide, t, fs, batch_id=0)
    sn.append_snapshot(spark, _df(spark, 2, rows=6), t, fs, batch_id=1)
    # head now records the union; strip it back to the legacy shape
    _legacyize_head(t, fs, keep_cols={"id", "v"})
    m = sn.append_snapshot(spark, _df(spark, 3, rows=2), t, fs, batch_id=2)
    assert ["medium", "string"] in m["schema"]
    assert m["schema_covers_chain"] is True
    got = sn.read_snapshot(spark, t, fs)
    rows = got.collect()
    assert len(rows) == 12
    assert sum(1 for r in rows if r.medium == "podcast") == 4


def test_append_on_legacy_chain_rejects_grandparent_type_conflict(
    spark, fs, tmp_path
):
    """A batch whose type conflicts with a GRANDPARENT column (which the
    legacy parent manifest never recorded) must fail at commit, not
    land a snapshot whose reads die on the old files."""
    t = str(tmp_path / "tbl")
    wide = _df(spark, 1, rows=4).withColumn("medium", F.lit("podcast"))
    sn.append_snapshot(spark, wide, t, fs, batch_id=0)
    sn.append_snapshot(spark, _df(spark, 2, rows=6), t, fs, batch_id=1)
    _legacyize_head(t, fs, keep_cols={"id", "v"})
    retyped = _df(spark, 3, rows=2).withColumn("medium", F.lit(7))
    with pytest.raises(ValueError, match="type evolution"):
        sn.append_snapshot(spark, retyped, t, fs, batch_id=2)
    # chain unchanged, no orphan data dir beyond the two committed ones
    assert sn.read_snapshot(spark, t, fs).count() == 10


def test_append_on_internally_conflicting_legacy_chain_is_loud(
    spark, fs, tmp_path
):
    """Ancestors that DISAGREE among themselves (a pre-union chain that
    silently committed a type change) are unreadable however the append
    resolves them — the walk must raise, pointing at compaction, never
    pick a winner silently."""
    import json

    t = str(tmp_path / "tbl")
    sn.append_snapshot(spark, _df(spark, 1, rows=4), t, fs, batch_id=0)
    sn.append_snapshot(spark, _df(spark, 2, rows=6), t, fs, batch_id=1)
    # forge ancestor disagreement on v's type plus a legacy head
    name = sn._current_name(t, fs)
    mpath = os.path.join(t, "manifests", name)
    m = json.loads(fs.read_bytes(mpath).decode("utf-8"))
    m["schema"] = [["id", "bigint"], ["v", "string"]]
    m.pop("schema_covers_chain", None)
    fs.write_bytes_atomic(mpath, json.dumps(m, indent=1).encode("utf-8"))
    with pytest.raises(ValueError, match="disagrees on column"):
        sn.append_snapshot(spark, _df(spark, 3, rows=2), t, fs, batch_id=2)


def test_legacy_walk_stops_at_full_commit_boundary(spark, fs, tmp_path):
    """The legacy chain walk must union only the INHERITED run: a full
    commit (or compaction) replaces data_dirs, so a type change across
    it is legal and schemas behind it must neither poison later appends
    nor resurrect dropped columns."""
    t = str(tmp_path / "tbl")
    # era 1: v is int, extra column 'medium'
    wide = _df(spark, 1, rows=4).withColumn("medium", F.lit("podcast"))
    sn.append_snapshot(spark, wide, t, fs, batch_id=0)
    # era 2: FULL commit retypes v to string and drops 'medium'
    retyped = _df(spark, 2, rows=6).withColumn("v", F.col("v").cast("string"))
    sn.commit_snapshot(spark, retyped, t, fs)
    # strip the head to the legacy shape so the walk actually runs
    _legacyize_head(t, fs, keep_cols={"id", "v"})
    m = sn.append_snapshot(
        spark,
        _df(spark, 3, rows=2).withColumn("v", F.col("v").cast("string")),
        t,
        fs,
        batch_id=0,
        writer_id="w2",
    )
    # era-1 schema must not leak across the boundary
    assert ["medium", "string"] not in m["schema"]
    assert ["v", "string"] in m["schema"]
    got = sn.read_snapshot(spark, t, fs)
    assert got.count() == 8  # era-2 full commit (6) + the append (2)
    assert "medium" not in got.columns
    assert dict(got.dtypes)["v"] == "string"
