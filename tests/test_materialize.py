"""Materialization helper behavior (r15 DISK_ONLY pin + r16 scratch sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from haf_plug_play_spark.ext.materialize import materialize, release_scratch


def test_release_scratch_unpersists_everything(spark):
    release_scratch(spark)  # clean slate from other tests
    a = materialize(spark.range(100).withColumn("x", F.col("id") * 2))
    b = materialize(spark.range(50))
    assert a.count() == 100 and b.count() == 50
    n = release_scratch(spark)
    assert n >= 2
    assert release_scratch(spark) == 0


def test_release_scratch_never_breaks_a_fresh_query(spark):
    """The sweep releases only dead blocks: a query built AFTER the sweep
    (the bench pattern — sweep, then construct + execute) is unaffected."""
    release_scratch(spark)
    df = materialize(spark.range(10)).agg(F.sum("id"))
    assert df.collect()[0][0] == 45
    release_scratch(spark)
    df2 = materialize(spark.range(10)).agg(F.sum("id"))
    assert df2.collect()[0][0] == 45
