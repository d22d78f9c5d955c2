"""Differential oracle tests: every canonical query (FIXTURES.md §2) must
match DuckDB on the same parquet at sf0.01 — the same check the driver runs."""

from __future__ import annotations

import pytest

from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES, ORACLE_SQL

from .compare import assert_matches
from .conftest import SF_ORACLE


def test_registry_alignment():
    assert set(CANONICAL_QUERIES) == set(ORACLE_SQL)


@pytest.mark.parametrize("qid", sorted(CANONICAL_QUERIES))
def test_canonical_query(spark, duck, qid):
    df = CANONICAL_QUERIES[qid](spark, SF_ORACLE)
    assert_matches(df, duck, ORACLE_SQL[qid], qid, strict_types=True)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "cnt"]
