"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (QA1-topk — the reference's podping
counts endpoint, plugs/podping/podping.py:19-26) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full canonical matrix (FIXTURES.md §2) plus
extension operators from haf_plug_play_spark.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES, ORACLE_SQL

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CANONICAL_QUERIES["QA1-topk"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(CANONICAL_QUERIES)
    try:
        from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

        q.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    try:
        from haf_plug_play_spark.ext.registry import EXT_QUERIES

        q.update(EXT_QUERIES)
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    o: dict[str, str] = {}
    o.update(ORACLE_SQL)
    try:
        from haf_plug_play_spark.queries.advanced import ADVANCED_ORACLE_SQL

        o.update(ADVANCED_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from haf_plug_play_spark.ext.registry import EXT_ORACLE_SQL

        o.update(EXT_ORACLE_SQL)
    except ImportError:
        pass
    return o
