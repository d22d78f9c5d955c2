"""SQL API surface: registered temp views + spark.sql produce the same
plans/results as the DataFrame API (Catalyst parity)."""

from __future__ import annotations

from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES
from haf_plug_play_spark.sources.tables import register_views

from .compare import canonical
from .conftest import SF_ORACLE


def test_sql_over_views_matches_dataframe(spark):
    register_views(spark, SF_ORACLE)
    sql_df = spark.sql(
        """
        SELECT user_id, count(*) AS cnt FROM events
        WHERE event_type = 'purchase' AND event_id BETWEEN 0 AND 900
        GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20
        """
    )
    api_df = CANONICAL_QUERIES["QA1-topk"](spark, SF_ORACLE)
    cols = sorted(api_df.columns)
    a = canonical(cols, [tuple(r[c] for c in cols) for r in api_df.collect()])
    s = canonical(cols, [tuple(r[c] for c in cols) for r in sql_df.collect()])
    assert a == s
