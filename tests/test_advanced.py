"""Advanced-query differential tests + approximation bound for HLL."""

from __future__ import annotations

import pytest

from haf_plug_play_spark.queries.advanced import (
    ADVANCED_ORACLE_SQL,
    ADVANCED_QUERIES,
)

from .compare import assert_matches
from .conftest import SF_ORACLE


@pytest.mark.parametrize("qid", sorted(ADVANCED_ORACLE_SQL))
def test_advanced_oracle(spark, duck, qid):
    df = ADVANCED_QUERIES[qid](spark, SF_ORACLE)
    assert_matches(df, duck, ADVANCED_ORACLE_SQL[qid], qid, strict_types=True)


def test_approx_distinct_bounded(spark, duck):
    """approx_count_distinct (HLL++, default rsd 5%) must land within 10% of
    the exact count per group — tighter than the 20% envelope the QAD query
    itself certifies via its hll_within_bounds column."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.sources.tables import load_table

    got = {
        r.event_type: r.approx_users
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) <= max(2, 0.1 * exact[k]), (k, got[k], exact[k])
    # and the in-query certification agrees
    rows = ADVANCED_QUERIES["QAD-approx-distinct"](spark, SF_ORACLE).collect()
    assert all(r.hll_within_bounds for r in rows)
