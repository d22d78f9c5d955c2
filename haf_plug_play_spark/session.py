"""SparkSession factory.

Engine-wide session defaults (SURVEY.md §1.2, §7.0):

- UTC session timezone — the reference stores naive-UTC timestamps
  (``plugs/podping/tables.sql:6``) and formats them at the API boundary
  (``tools.py:14``); pinning UTC makes Spark timestamps byte-compatible with
  the DuckDB oracle.
- ANSI off — PostgreSQL array indexing yields NULL out-of-range
  (``plugs/polls/polls.py:62``); ``element_at`` must not throw.
- AQE on — runtime join-strategy selection, partition coalescing and skew
  handling; this is the 100 TB posture (no hand-scheduled plans).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "haf_plug_play_spark", master: str | None = None) -> SparkSession:
    """Build (or get) the engine SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) so
    tests and bench share one code path; on a real cluster the caller passes
    nothing and spark-submit supplies the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # FAIR + per-plug pools (runner sets spark.scheduler.pool): the
        # reference isolates plugs in their own PG backends
        # (database/plugs.py:14,99); FIFO would let one plug's backfill
        # starve every other plug's live sync
        .config("spark.scheduler.mode", "FAIR")
        # The engine deliberately builds small broadcast frames FROM
        # corpus scans (scalar stats tables, the lazy quadratic-fan-out
        # guards on the overlap matrices): at 100 TB those builds are
        # column-pruned corpus aggregations that can exceed the 300 s
        # default, which would surface as a misleading "Could not
        # execute broadcast" instead of the query's own result/guard
        # message. One hour matches the longest leg a backfill chunk
        # may legitimately take.
        .config("spark.sql.broadcastTimeout", os.environ.get(
            "SPARK_GRAFT_BROADCAST_TIMEOUT", "3600"))
        .config("spark.ui.enabled", "false")
    )
    # In local mode the driver is the only JVM; give it headroom if offered.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    if not SparkSession.getActiveSession():
        builder = builder.master(master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
