"""Table maintenance: small-file compaction for the block-bucket layout.

Every micro-batch writes its own bucket partitions (runner/batch.py), so a
long-running live sync accumulates one small parquet file per chunk per
bucket — the classic small-files problem: at 100 TB the scan cost becomes
file-open dominated and the driver's split enumeration balloons. Compaction
rewrites each bucket to ceil(bytes / target) files.

Crash safety mirrors recover_fork's rewrite protocol (runner/batch.py): the
compacted copy is fully written to a sibling ``.compact`` directory before
the original is swapped out, so a crash mid-compaction leaves either the
old or the new complete bucket, never a partial one. Buckets are
independent — at scale, shard the bucket list across concurrent calls.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 << 20  # HDFS-block-sized files


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Compact every ``block_bucket=N`` partition of one derived table.
    Returns {buckets_compacted, files_before, files_after}."""
    stats = {"buckets_compacted": 0, "files_before": 0, "files_after": 0}
    if not os.path.isdir(table_dir):
        return stats
    for entry in sorted(os.listdir(table_dir)):
        if not entry.startswith("block_bucket="):
            continue
        bdir = os.path.join(table_dir, entry)
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        size = sum(os.path.getsize(os.path.join(bdir, f)) for f in files)
        n_out = max(1, math.ceil(size / target_bytes))
        stats["files_before"] += len(files)
        if n_out >= len(files):
            stats["files_after"] += len(files)
            continue
        tmp = bdir + ".compact"
        spark.read.parquet(bdir).coalesce(n_out).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(bdir)
        os.replace(tmp, bdir)
        stats["buckets_compacted"] += 1
        stats["files_after"] += len(
            [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        )
    return stats


def compact_plug(spark: SparkSession, out_root: str, plug_name: str, **kw) -> dict:
    """Compact every derived table of one plug."""
    root = os.path.join(out_root, plug_name)
    total = {"buckets_compacted": 0, "files_before": 0, "files_after": 0}
    if not os.path.isdir(root):
        return total
    for table in sorted(os.listdir(root)):
        s = compact_table(spark, os.path.join(root, table), **kw)
        for k in total:
            total[k] += s[k]
    return total
