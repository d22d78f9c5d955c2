"""Differential tests for the reference's query menu: each DataFrame query
must match the reference's SQL (adapted to DuckDB) run over the same derived
state tables."""

from __future__ import annotations

import pytest

from haf_plug_play_spark import fixtures
from haf_plug_play_spark.ingest.envelope import parse_custom_json
from haf_plug_play_spark.plugs import PLUGS
from haf_plug_play_spark.queries import plug_queries as Q

from .compare import assert_matches

NOW = fixtures.EPOCH  # deterministic "now" mid-stream: 2024-01-01T00:00:00
MID = fixtures.EPOCH.replace(hour=2)


@pytest.fixture(scope="module")
def derived(spark):
    ops_df, trx_df = fixtures.as_dataframes(spark, 10_000, 42)
    parsed = parse_custom_json(ops_df, trx_df)
    out = {}
    for plug in PLUGS.values():
        out.update(plug.transform(parsed))
    for df in out.values():
        df.cache()
    return out


@pytest.fixture(scope="module")
def duck_state(derived):
    import duckdb

    con = duckdb.connect()
    for name, df in derived.items():
        con.register(name, df.toPandas())
    yield con
    con.close()


def test_podping_counts(derived, duck_state):
    df = Q.podping_counts(derived["podping_updates"], (1000, 2500), limit=20)
    # reference SQL plugs/podping/podping.py:19-26 (+ unique tie-break url)
    sql = """
        SELECT url, COUNT(url) AS url_count FROM podping_updates
        WHERE block_num BETWEEN 1000 AND 2500
        GROUP BY url ORDER BY url_count DESC, url LIMIT 20
    """
    assert_matches(df, duck_state, sql, "podping_counts")


def test_podping_latest_feed_update(derived, duck_state):
    url = derived["podping_updates"].groupBy("url").count().orderBy(
        "count", "url", ascending=[False, True]
    ).first().url
    df = Q.podping_url_latest_feed_update(
        derived["podping_updates"], derived["podping_ops"], url, limit=5
    )
    sql = f"""
        SELECT po.trx_hash_hex AS trx_id_hex, fu.block_num, fu.created,
               fu.reason, fu.medium
        FROM podping_updates fu JOIN podping_ops po ON po.op_id_seq = fu.op_id_seq
        WHERE fu.url = '{url}' ORDER BY fu.op_id_seq DESC LIMIT 5
    """
    assert_matches(df, duck_state, sql, "latest_feed_update")


def test_poll_ops(derived, duck_state):
    df = Q.poll_ops(derived["polls_ops"], op_type="vote", block_range=(1000, 2000))
    sql = """
        SELECT trx_hash_hex, req_posting_auths, op_type, payload FROM polls_ops
        WHERE block_num BETWEEN 1000 AND 2000 AND op_type = 'vote'
    """
    assert_matches(df, duck_state, sql, "poll_ops")


def test_polls_active(derived, duck_state):
    df = Q.polls_active(derived["polls_content"], now=MID)
    sql = f"""
        SELECT author, permlink, question, answers, expires, tag, created
        FROM polls_content
        WHERE expires >= TIMESTAMP '{MID}' AND deleted = false
    """
    assert_matches(df, duck_state, sql, "polls_active")


def test_polls_active_tag(derived, duck_state):
    df = Q.polls_active(derived["polls_content"], tag="dev", now=MID)
    sql = f"""
        SELECT author, permlink, question, answers, expires, tag, created
        FROM polls_content
        WHERE expires >= TIMESTAMP '{MID}' AND deleted = false AND tag = 'dev'
    """
    assert_matches(df, duck_state, sql, "polls_active_tag")


def _polls_with_votes(duck_state, limit=5):
    return duck_state.execute(
        """
        SELECT c.author, c.permlink FROM polls_content c
        JOIN polls_votes v ON c.author = v.author AND c.permlink = v.permlink
        WHERE c.deleted = false
        GROUP BY 1, 2 ORDER BY count(*) DESC, c.author, c.permlink LIMIT ?
        """,
        [limit],
    ).fetchall()


@pytest.mark.parametrize("i", range(3))
def test_poll_votes_summary(derived, duck_state, i):
    author, permlink = _polls_with_votes(duck_state)[i]
    df = Q.poll_votes_summary(
        derived["polls_content"], derived["polls_votes"], author, permlink
    )
    # reference SQL plugs/polls/polls.py:58-72 (answers[answer] is 1-based,
    # NULL out of range — DuckDB list_extract matches PG here)
    sql = f"""
        SELECT list_extract(c.answers, v.answer) AS parsed_answer,
               COUNT(DISTINCT v.account) AS votes
        FROM polls_content c JOIN polls_votes v
          ON c.author = v.author AND c.permlink = v.permlink
        WHERE c.author = '{author}' AND c.permlink = '{permlink}'
          AND c.deleted = false
          AND v.created <= COALESCE(c.expires, c.created - INTERVAL 7 DAY)
        GROUP BY parsed_answer
    """
    assert_matches(df, duck_state, sql, f"votes_summary[{author}/{permlink}]")


def test_poll_votes(derived, duck_state):
    author, permlink = _polls_with_votes(duck_state)[0]
    df = Q.poll_votes(derived["polls_content"], derived["polls_votes"], author, permlink)
    sql = f"""
        SELECT v.account, list_extract(c.answers, v.answer) AS answer
        FROM polls_content c JOIN polls_votes v
          ON c.author = v.author AND c.permlink = v.permlink
        WHERE c.author = '{author}' AND c.permlink = '{permlink}' AND c.deleted = false
    """
    assert_matches(df, duck_state, sql, "poll_votes")


def test_he_token_volume(derived, duck_state):
    df = Q.he_token_volume(derived["he_transfers"], (1000, 5000))
    sql = """
        SELECT symbol, count(*) AS n_transfers,
               CAST(sum(qty) AS DOUBLE) AS total_qty
        FROM he_transfers WHERE block_num BETWEEN 1000 AND 5000
        GROUP BY symbol ORDER BY symbol
    """
    assert_matches(df, duck_state, sql, "he_token_volume")


def test_he_top_recipients(derived, duck_state):
    df = Q.he_top_recipients(derived["he_transfers"], "LEO", limit=10)
    sql = """
        SELECT to_acct, CAST(sum(qty) AS DOUBLE) AS received
        FROM he_transfers WHERE symbol = 'LEO'
        GROUP BY to_acct ORDER BY received DESC, to_acct LIMIT 10
    """
    assert_matches(df, duck_state, sql, "he_top_recipients")


def test_he_burn_totals(derived, duck_state):
    df = Q.he_burn_totals(derived["he_burns"])
    sql = """
        SELECT symbol, count(*) AS n_burns, CAST(sum(qty) AS DOUBLE) AS burned
        FROM he_burns GROUP BY symbol ORDER BY symbol
    """
    assert_matches(df, duck_state, sql, "he_burn_totals")


def test_get_poll_and_user(derived, duck_state):
    author, permlink = _polls_with_votes(duck_state)[0]
    df = Q.get_poll(derived["polls_content"], author, permlink)
    sql = f"""
        SELECT author, permlink, question, answers, expires, tag, created
        FROM polls_content WHERE author = '{author}' AND permlink = '{permlink}'
        AND deleted = false
    """
    assert_matches(df, duck_state, sql, "get_poll")

    df = Q.polls_user(derived["polls_content"], author, active=True, now=NOW)
    sql = f"""
        SELECT permlink, question, answers, expires, tag, created
        FROM polls_content WHERE author = '{author}' AND deleted = false
        AND expires >= TIMESTAMP '{NOW}' ORDER BY created DESC, permlink
    """
    assert_matches(df, duck_state, sql, "polls_user")
