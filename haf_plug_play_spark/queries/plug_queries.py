"""The reference's analytical query menu, as DataFrame builders.

Reference parity: podping StateQuery (plugs/podping/podping.py:13-39) and
polls Search/StateQuery (plugs/polls/polls.py:12-101). Each reference method
builds a SQL string over its state tables; here each is a function over the
plug-derived DataFrames with typed parameters (which removes the reference's
f-string injection class — SURVEY §7.4). Column order mirrors the reference's
positional field contract (database/access.py:10-12).

``now`` is an explicit parameter wherever the reference calls
NOW() AT TIME ZONE 'utc' — deterministic, testable, and what a reader at an
API boundary would pin anyway.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# X13 block↔time arithmetic: Hive's 3-second cadence (plugs/polls/polls.py:18)
BLOCKS_PER_DAY = 28_800
PODPING_DEFAULT_WINDOW = 30 * BLOCKS_PER_DAY  # plugs/podping/podping.py:18
POLLS_DEFAULT_WINDOW = BLOCKS_PER_DAY  # plugs/polls/polls.py:18


def _head_block(df: DataFrame) -> int:
    head = df.agg(F.max("block_num")).first()[0]
    return int(head) if head is not None else 0


def podping_counts(
    updates: DataFrame, block_range: tuple[int, int] | None = None, limit: int = 20
) -> DataFrame:
    """Feed-update counts, top-k by count (plugs/podping/podping.py:13-27).
    Default range = last 30 days of blocks behind the head (podping.py:16-18).
    Plans as partial/final hash agg + TakeOrderedAndProject."""
    if block_range is None:
        head = _head_block(updates)
        block_range = (head - PODPING_DEFAULT_WINDOW, head)
    return (
        updates.filter(F.col("block_num").between(*block_range))
        .groupBy("url")
        .agg(F.count("url").alias("url_count"))
        .orderBy(F.desc("url_count"), "url")
        .limit(limit)
    )


def podping_url_latest_feed_update(
    updates: DataFrame, ops: DataFrame, url: str, limit: int = 5
) -> DataFrame:
    """Latest-k updates for one feed url (plugs/podping/podping.py:29-39).
    The url filter lands on the updates scan before the join; ops side joins
    on the deterministic source op id (SURVEY §4.3.2)."""
    fu = updates.filter(F.col("url") == url).select(
        F.col("op_id_seq").alias("podping_id"), "block_num", "created", "reason", "medium"
    )
    po = ops.select(F.col("op_id_seq"), F.col("trx_hash_hex").alias("trx_id_hex"))
    return (
        fu.join(po, fu.podping_id == po.op_id_seq, "inner")
        .select("trx_id_hex", "block_num", "created", "reason", "medium", "podping_id")
        .orderBy(F.desc("podping_id"))
        .limit(limit)
        .drop("podping_id")
    )


def poll_ops(
    ops: DataFrame,
    op_type: str | None = None,
    block_range: tuple[int, int] | None = None,
    default_window: bool = False,
) -> DataFrame:
    """Raw poll ops search (plugs/polls/polls.py:13-27); optional-predicate
    composition (F9) via chained filters. ``default_window`` mirrors the
    reference's head−28800 fallback (polls.py:16-18)."""
    df = ops
    if block_range is None and default_window:
        head = _head_block(ops)
        block_range = (head - POLLS_DEFAULT_WINDOW, head)
    if block_range is not None:
        df = df.filter(F.col("block_num").between(*block_range))
    if op_type is not None:
        df = df.filter(F.col("op_type") == op_type)
    return df.select("trx_hash_hex", "req_posting_auths", "op_type", "payload")


def polls_active(
    content: DataFrame, tag: str | None = None, now: datetime.datetime | None = None
) -> DataFrame:
    """Active (unexpired, undeleted) polls (plugs/polls/polls.py:33-45)."""
    now_col = F.lit(now).cast("timestamp") if now else F.current_timestamp()
    df = content.filter((F.col("expires") >= now_col) & ~F.col("deleted"))
    if tag is not None:
        df = df.filter(F.col("tag") == tag)
    return df.select("author", "permlink", "question", "answers", "expires", "tag", "created")


def get_poll(content: DataFrame, author: str, permlink: str) -> DataFrame:
    """Single poll detail (plugs/polls/polls.py:47-56, with the missing-comma
    field list fixed per SURVEY §7.4)."""
    return content.filter(
        (F.col("author") == author) & (F.col("permlink") == permlink) & ~F.col("deleted")
    ).select("author", "permlink", "question", "answers", "expires", "tag", "created")


def _parsed_answer() -> F.Column:
    # answers[answer] with PG semantics: 1-based, NULL when out of range —
    # including index 0, which element_at would reject, hence the NULL guard.
    idx = F.when(F.col("answer") >= 1, F.col("answer")).cast("int")
    return F.element_at("answers", idx)


def poll_votes_summary(content: DataFrame, votes: DataFrame, author: str, permlink: str) -> DataFrame:
    """Distinct-voter counts per parsed answer (plugs/polls/polls.py:58-72).

    Keeps the reference's vote-validity predicate verbatim, including the
    COALESCE fallback ``created - INTERVAL 7 DAYS`` for NULL expiry
    (plugs/polls/polls.py:69-70): the content side is filtered to one poll
    before the join, so the join is a broadcast of a single row.
    """
    c = content.filter(
        (F.col("author") == author) & (F.col("permlink") == permlink) & ~F.col("deleted")
    ).select("author", "permlink", "answers", "expires", F.col("created").alias("c_created"))
    v = votes.select("author", "permlink", "account", "answer", "created")
    cutoff = F.coalesce(F.col("expires"), F.col("c_created") - F.expr("INTERVAL 7 DAYS"))
    return (
        v.join(F.broadcast(c), ["author", "permlink"], "inner")
        .filter(F.col("created") <= cutoff)
        .groupBy(_parsed_answer().alias("parsed_answer"))
        .agg(F.countDistinct("account").alias("votes"))
    )


def poll_votes(content: DataFrame, votes: DataFrame, author: str, permlink: str) -> DataFrame:
    """All votes for a poll with parsed answers (plugs/polls/polls.py:74-83)."""
    c = content.filter(
        (F.col("author") == author) & (F.col("permlink") == permlink) & ~F.col("deleted")
    ).select("author", "permlink", "answers")
    v = votes.select("author", "permlink", "account", "answer")
    return (
        v.join(F.broadcast(c), ["author", "permlink"], "inner")
        .select("account", _parsed_answer().alias("answer"))
    )


def he_token_volume(
    transfers: DataFrame, block_range: tuple[int, int] | None = None
) -> DataFrame:
    """Per-symbol transfer volume over a block range — the analytical read
    the reference's hive_engine plug declares tables for but never ships a
    query menu over (plugs/hive_engine/ has no StateQuery). Decimal sums
    computed exactly, surfaced as DOUBLE at the JSON boundary (X12)."""
    df = transfers
    if block_range is not None:
        df = df.filter(F.col("block_num").between(*block_range))
    return (
        df.groupBy("symbol")
        .agg(
            F.count("*").alias("n_transfers"),
            F.sum("qty").cast("double").alias("total_qty"),
        )
        .orderBy("symbol")
    )


def he_top_recipients(
    transfers: DataFrame, symbol: str, limit: int = 20
) -> DataFrame:
    """Top accounts by received amount for one token (A1/O1 shape:
    partial+final agg then TakeOrderedAndProject)."""
    return (
        transfers.filter(F.col("symbol") == symbol)
        .groupBy("to_acct")
        .agg(F.sum("qty").cast("double").alias("received"))
        .orderBy(F.desc("received"), "to_acct")
        .limit(limit)
    )


def he_burn_totals(burns: DataFrame) -> DataFrame:
    """Burned supply per symbol (transfers to the sidechain 'null' account)."""
    return (
        burns.groupBy("symbol")
        .agg(
            F.count("*").alias("n_burns"),
            F.sum("qty").cast("double").alias("burned"),
        )
        .orderBy("symbol")
    )


def polls_user(
    content: DataFrame,
    author: str,
    active: bool = False,
    tag: str | None = None,
    now: datetime.datetime | None = None,
) -> DataFrame:
    """Polls created by one user (plugs/polls/polls.py:85-101)."""
    df = content.filter((F.col("author") == author) & ~F.col("deleted"))
    if active:
        now_col = F.lit(now).cast("timestamp") if now else F.current_timestamp()
        df = df.filter(F.col("expires") >= now_col)
    if tag is not None:
        df = df.filter(F.col("tag") == tag)
    return df.select("permlink", "question", "answers", "expires", "tag", "created").orderBy(
        F.desc("created"), "permlink"
    )
