"""Epoch-dir promotion (maintenance.promote_epochs): a long-lived stream's
``_epoch=N`` dirs fold into the batch ``block_bucket=`` layout with readers
unchanged, and the two-phase crash protocol self-heals from both windows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from haf_plug_play_spark.runner.fs import LocalFS
from haf_plug_play_spark.runner.maintenance import (
    _PM_MANIFEST,
    _PM_TMP_PREFIX,
    promote_epochs,
)

STEP = 100


def _write_epochs(spark, tdir: str, n_epochs: int, rows_per: int = 50):
    """Simulate a stream: one dir per epoch, contiguous block ranges."""
    for e in range(n_epochs):
        lo = e * rows_per
        (
            spark.range(lo, lo + rows_per)
            .select(
                F.col("id").alias("block_num"),
                (F.col("id") * 2).alias("payload"),
            )
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(os.path.join(tdir, f"_epoch={e}"))
        )


def _read_all(spark, tdir):
    return spark.read.option("recursiveFileLookup", "true").parquet(tdir)


def test_promotion_preserves_rows_and_bounds_dirs(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=10)
    before = _read_all(spark, tdir).agg(
        F.count("*"), F.sum("block_num"), F.sum("payload")
    ).first()

    stats = promote_epochs(spark, tdir, STEP, fs=LocalFS())
    # keep_latest: 9 promoted, _epoch=9 untouched (retry-safe)
    assert stats["epochs_promoted"] == 9
    entries = sorted(os.listdir(tdir))
    assert "_epoch=9" in entries
    assert [e for e in entries if e.startswith("_epoch=")] == ["_epoch=9"]
    assert any(e.startswith("block_bucket=") for e in entries)

    after = _read_all(spark, tdir).agg(
        F.count("*"), F.sum("block_num"), F.sum("payload")
    ).first()
    assert tuple(before) == tuple(after)

    # batch layout: bucket dirs hold block ranges aligned to STEP
    for e in entries:
        if e.startswith("block_bucket="):
            b = int(e.split("=")[1])
            rng = spark.read.parquet(os.path.join(tdir, e)).agg(
                F.min("block_num"), F.max("block_num")
            ).first()
            assert rng[0] // STEP == b and rng[1] // STEP == b


def test_promotion_drain_fully_when_stopped(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=4)
    total = _read_all(spark, tdir).count()
    promote_epochs(spark, tdir, STEP, fs=LocalFS(), keep_latest=False)
    assert [e for e in os.listdir(tdir) if e.startswith("_epoch=")] == []
    assert _read_all(spark, tdir).count() == total


def test_promotion_merges_into_existing_buckets(spark, tmp_path):
    """Second promotion must union with buckets the first one wrote."""
    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=3, rows_per=40)  # blocks 0..119
    promote_epochs(spark, tdir, STEP, fs=LocalFS(), keep_latest=False)
    # stream continues: epochs 3..5 (blocks 120..239) overlap bucket 1
    for e in range(3, 6):
        lo = e * 40
        (
            spark.range(lo, lo + 40)
            .select(F.col("id").alias("block_num"), (F.col("id") * 2).alias("payload"))
            .write.mode("overwrite")
            .parquet(os.path.join(tdir, f"_epoch={e}"))
        )
    promote_epochs(spark, tdir, STEP, fs=LocalFS(), keep_latest=False)
    df = _read_all(spark, tdir)
    assert df.count() == 240
    assert df.select("block_num").distinct().count() == 240


def test_promotion_phase1_crash_rolls_back(spark, tmp_path):
    """Stray staging dirs with NO manifest are garbage — epochs still rule."""
    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=3)
    mdir = tdir + ".maintenance"
    os.makedirs(mdir)
    # fake a phase-1 crash: half-written staging bucket, no manifest
    spark.range(5).write.parquet(os.path.join(mdir, _PM_TMP_PREFIX + "block_bucket=0"))
    before = _read_all(spark, tdir).agg(F.count("*"), F.sum("block_num")).first()
    promote_epochs(spark, tdir, STEP, fs=LocalFS(), keep_latest=False)
    after = _read_all(spark, tdir).agg(F.count("*"), F.sum("block_num")).first()
    assert tuple(before) == tuple(after)
    assert [e for e in os.listdir(mdir) if e.startswith(_PM_TMP_PREFIX)] == []


def test_promotion_phase2_crash_resumes(spark, tmp_path):
    """Manifest present + staged buckets + epochs still on disk = a crash
    right after the commit point; the next call must finish the swap without
    duplicating rows."""
    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=3, rows_per=50)  # blocks 0..149
    expected = _read_all(spark, tdir).agg(F.count("*"), F.sum("block_num")).first()

    # stage phase 1 by hand: all rows into their buckets, then the manifest —
    # and "crash" before phase 2 (no swap, epochs not deleted)
    mdir = tdir + ".maintenance"
    os.makedirs(mdir)
    src = _read_all(spark, tdir).withColumn(
        "_b", (F.col("block_num") / STEP).cast("long")
    )
    buckets = sorted(r[0] for r in src.select("_b").distinct().collect())
    for b in buckets:
        src.filter(F.col("_b") == b).drop("_b").write.parquet(
            os.path.join(mdir, _PM_TMP_PREFIX + f"block_bucket={b}")
        )
    manifest = {
        "epochs": [f"_epoch={e}" for e in range(3)],
        "buckets": [f"block_bucket={b}" for b in buckets],
    }
    with open(os.path.join(mdir, _PM_MANIFEST), "w") as f:
        json.dump(manifest, f)

    # recovery path: the next promotion call finishes phase 2 first
    stats = promote_epochs(spark, tdir, STEP, fs=LocalFS())
    assert stats["epochs_promoted"] == 0  # nothing new, only recovery
    assert [e for e in os.listdir(tdir) if e.startswith("_epoch=")] == []
    assert not os.path.exists(os.path.join(mdir, _PM_MANIFEST))
    after = _read_all(spark, tdir).agg(F.count("*"), F.sum("block_num")).first()
    assert tuple(expected) == tuple(after)


def test_streaming_runner_promote_end_to_end(spark, tmp_path):
    """Real stream (availableNow, several epochs) → promote → identical
    reads, bounded dirs, and the table is now batch-compactable."""
    from haf_plug_play_spark import fixtures
    from haf_plug_play_spark.plugs import PLUGS
    from haf_plug_play_spark.runner.maintenance import compact_table
    from haf_plug_play_spark.runner.streaming import StreamingPlugRunner

    ops_df, trx_df = fixtures.as_dataframes(spark, 400, 11)
    ops_path, trx_path = str(tmp_path / "ops"), str(tmp_path / "trx")
    ops_df.repartition(8).write.parquet(ops_path)  # >1 file → >1 epoch
    trx_df.write.parquet(trx_path)
    runner = StreamingPlugRunner(
        spark, PLUGS["podping"], ops_path, trx_path, str(tmp_path / "out")
    )
    q = runner.start(fixtures.OPS_SCHEMA, available_now=True)
    q.awaitTermination(120)

    table = "podping_updates"
    tdir = os.path.join(str(tmp_path / "out"), "podping", table)
    n_epochs = len([e for e in os.listdir(tdir) if e.startswith("_epoch=")])
    assert n_epochs >= 2  # maxFilesPerTrigger=4 over 8 files
    before = runner.read_table(table).agg(F.count("*"), F.sum("block_num")).first()

    runner.promote_epochs(step=100, keep_latest=False)
    assert [e for e in os.listdir(tdir) if e.startswith("_epoch=")] == []
    after = runner.read_table(table).agg(F.count("*"), F.sum("block_num")).first()
    assert tuple(before) == tuple(after)
    # converged to the batch layout: the standard compactor now applies
    compact_table(spark, tdir)
    assert tuple(before) == tuple(
        runner.read_table(table).agg(F.count("*"), F.sum("block_num")).first()
    )


def test_promotion_through_hadoop_fs(spark, tmp_path):
    """Epoch promotion routed through the Hadoop FileSystem API end-to-end
    (seam parity with tests/test_fs_seam.py)."""
    from haf_plug_play_spark.runner.fs import HadoopFS

    hfs = HadoopFS(spark)
    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=5)
    before = _read_all(spark, tdir).agg(
        F.count("*"), F.sum("block_num"), F.sum("payload")
    ).first()
    stats = promote_epochs(spark, tdir, STEP, fs=hfs, keep_latest=False)
    assert stats["epochs_promoted"] == 5
    assert [e for e in hfs.listdir(tdir) if e.startswith("_epoch=")] == []
    after = _read_all(spark, tdir).agg(
        F.count("*"), F.sum("block_num"), F.sum("payload")
    ).first()
    assert tuple(before) == tuple(after)


def test_compact_crash_then_promote_does_not_lose_bucket(spark, tmp_path):
    """Cross-protocol recovery, direction 1: compaction crashed between its
    rename pair (bucket parked in .maintenance as _old_X, replacement never
    landed), and the NEXT maintenance op to run is promotion. Promotion must
    first restore the parked bucket — otherwise it writes a fresh
    block_bucket=X holding only epoch rows and the next compaction's
    _recover deletes _old_X, silently losing the original rows."""
    from haf_plug_play_spark.runner.maintenance import (
        _OLD_PREFIX,
        compact_table,
    )

    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=2, rows_per=50)  # blocks 0..99
    promote_epochs(spark, tdir, STEP, fs=LocalFS(), keep_latest=False)
    # bucket 0 now holds blocks 0..99; simulate the compact crash window:
    # bucket moved aside, replacement never renamed in
    mdir = tdir + ".maintenance"
    os.makedirs(mdir, exist_ok=True)
    os.rename(
        os.path.join(tdir, "block_bucket=0"),
        os.path.join(mdir, _OLD_PREFIX + "block_bucket=0"),
    )
    # stream continued: one more epoch overlapping bucket 0's range
    (
        spark.range(100)
        .select(F.col("id").alias("block_num"), (F.col("id") * 3).alias("payload"))
        .write.parquet(os.path.join(tdir, "_epoch=2"))
    )
    promote_epochs(spark, tdir, STEP, fs=LocalFS(), keep_latest=False)
    # parked bucket restored AND merged with the new epoch rows
    assert os.listdir(mdir) == []
    df = spark.read.parquet(os.path.join(tdir, "block_bucket=0"))
    assert df.count() == 200  # 100 original + 100 epoch rows
    # and a follow-up compaction still sees everything
    compact_table(spark, tdir)
    assert spark.read.parquet(os.path.join(tdir, "block_bucket=0")).count() == 200


def test_promote_crash_then_compact_finishes_promotion(spark, tmp_path):
    """Cross-protocol recovery, direction 2: promotion crashed right after
    its manifest commit point; the NEXT maintenance op is compaction, which
    must finish phase 2 first (swap staged buckets in, drop epochs) before
    compacting — not treat the half-promoted table as the whole truth."""
    from haf_plug_play_spark.runner.maintenance import compact_table

    tdir = str(tmp_path / "tbl")
    _write_epochs(spark, tdir, n_epochs=2, rows_per=50)  # blocks 0..99
    expected = _read_all(spark, tdir).agg(F.count("*"), F.sum("block_num")).first()

    # stage phase 1 + manifest by hand, "crash" before phase 2
    mdir = tdir + ".maintenance"
    os.makedirs(mdir)
    src = _read_all(spark, tdir).withColumn(
        "_b", (F.col("block_num") / STEP).cast("long")
    )
    src.drop("_b").write.parquet(
        os.path.join(mdir, _PM_TMP_PREFIX + "block_bucket=0")
    )
    manifest = {
        "epochs": ["_epoch=0", "_epoch=1"],
        "buckets": ["block_bucket=0"],
    }
    with open(os.path.join(mdir, _PM_MANIFEST), "w") as f:
        json.dump(manifest, f)

    compact_table(spark, tdir)
    # promotion finished: epochs gone, manifest gone, rows intact once
    assert [e for e in os.listdir(tdir) if e.startswith("_epoch=")] == []
    assert not os.path.exists(os.path.join(mdir, _PM_MANIFEST))
    after = _read_all(spark, tdir).agg(F.count("*"), F.sum("block_num")).first()
    assert tuple(expected) == tuple(after)
