"""Bucketed (co-located) join: pre-bucketing both sides on the join key must
eliminate the join-time shuffle — the layout strategy for the engine's big
repeated joins (ops ⟕ transactions at 100 TB)."""

from __future__ import annotations

import pytest

from haf_plug_play_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # local metastore warehouse for saveAsTable
    return str(tmp_path_factory.mktemp("warehouse"))


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        od = load_table(spark, SF_SMOKE, "orders")
        (
            li.write.mode("overwrite")
            .option("path", f"{warehouse}/li_b")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("li_b")
        )
        (
            od.write.mode("overwrite")
            .option("path", f"{warehouse}/od_b")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("od_b")
        )
        a = spark.table("li_b")
        b = spark.table("od_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        # and the result is still correct
        plain = li.join(od, li.l_orderkey == od.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")
