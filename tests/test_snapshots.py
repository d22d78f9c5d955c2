"""Manifest-committed snapshot tables (runner/snapshots.py): commit /
read / time-travel / compaction / vacuum, crash-injection at the commit
point, through BOTH filesystem implementations (HadoopFS exercises the
real Hadoop code path over file://)."""

from __future__ import annotations

import os

import pytest

from haf_plug_play_spark.runner import snapshots as sn
from haf_plug_play_spark.runner.fs import HadoopFS, LocalFS


@pytest.fixture(params=["local", "hadoop"])
def fs(request, spark):
    return LocalFS() if request.param == "local" else HadoopFS(spark)


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
