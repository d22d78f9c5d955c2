"""Adaptive input parallelization (r15, guide §2.2).

Parquet assigns one row group to one task, so a single-row-group table —
every small-SF fixture, and any badly-compacted production file — runs
its whole map side on one core. ``load_table`` round-robins such inputs
to the session's parallelism; inputs already wide enough for half the
cores (every sane 100 TB layout) are left untouched.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from haf_plug_play_spark.sources import tables as tsrc

SF01 = "/root/testdata/sf0.1"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_large_single_split_input_gets_session_parallelism(spark):
    df = tsrc.load_table(spark, SF01, "lineitem")
    assert "RoundRobinPartitioning" in _plan(df)
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_small_table_keeps_natural_splits(spark):
    df = tsrc.load_table(spark, SF01, "region")
    assert "Exchange" not in _plan(df)


def test_wide_input_is_left_alone(spark, monkeypatch):
    # a file that already yields >= par/2 splits must not be repartitioned
    monkeypatch.setattr(tsrc, "_PARALLELIZE_MIN_BYTES", 1)
    sz = os.path.getsize(os.path.join(SF01, "lineitem.parquet"))
    par = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(1, sz // par)))
    try:
        df = tsrc.load_table(spark, SF01, "lineitem")
        assert "RoundRobinPartitioning" not in _plan(df)
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_pushdown_and_pruning_survive_repartition(spark):
    """Predicate pushdown and column pruning must traverse the
    round-robin exchange down to the parquet scan (guide §6)."""
    df = tsrc.load_table(spark, SF01, "lineitem")
    q = df.where(F.col("l_quantity") > 49).select("l_orderkey")
    plan = _plan(q)
    assert "RoundRobinPartitioning" in plan
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49" in plan
    # pruned read schema: only the two referenced columns reach the scan
    ln = next(l for l in plan.splitlines() if l.startswith("ReadSchema"))
    assert "l_orderkey" in ln and "l_quantity" in ln and "l_comment" not in ln
