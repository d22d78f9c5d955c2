"""Canonical query matrix — the t2 DuckDB-oracle surface (FIXTURES.md §2).

One query per operator family of SURVEY.md §2, expressed with the DataFrame
API so Catalyst plans them (pushdown, broadcast, partial aggregation, top-k
via TakeOrderedAndProject — SURVEY.md §4.2). Each function takes
``(spark, sf_dir)`` and returns a DataFrame whose column names match the
paired oracle SQL in ``ORACLE_SQL`` exactly.

Reference parity citations are given per query (reference repo
imwatsi/haf-plug-play at /root/reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from haf_plug_play_spark.sources.tables import load_table


def qs1_scan_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/F2/P1 — op-log block-range scan (sync.sql:82-100).

    The range predicate reaches the parquet scan (PushedFilters), so at
    100 TB only the row groups overlapping [100, 199] are read.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id").between(100, 199))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


def qs2_head_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/A3/A4/O5 — head-of-log probe (database/handlers.py:5-10).

    Expressed as an ungrouped max-agg (partial+final, no sort) rather than
    the reference's ORDER BY DESC LIMIT 1 — same answer, no global sort.
    """
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.max("event_id").alias("head_id"), F.max("ts").alias("head_ts")
    )


def qs3_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/X6 — op-type catalog qualification (database/sql/functions.sql:1-9)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.format_string("hive::protocol::%s", F.col("event_type")).alias("qualified"),
        )
        .orderBy("event_type")
    )


def qf1_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F4 — op-id IN-list filter (plugs/podping/functions.sql:85)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type").isin("purchase", "signup"))
        .agg(F.count("*").alias("n"))
    )


def qf5_temporal_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 — temporal liveness + flag filter (plugs/polls/polls.py:40-41)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-06-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderstatus") == "O")
        ).agg(F.count("*").alias("n"))
    )


def qf7_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — conditional dispatch on an extracted field
    (plugs/podping/functions.sql:18-34) as a CASE projection, not row loop."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type",
            F.when(F.col("value") > 100, "big").otherwise("small").alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


def qf8_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — existence probe (database/core.py:57-59) as a left-semi join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        ).agg(F.count("*").alias("n"))
    )


def qj1_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/X10 — composite-key left join, ops ⟕ transactions analog
    (database/sql/sync.sql:93-95). The per-key count joined back to every
    row IS a window count over the same key: one pass, one hash exchange,
    instead of a second scan + a table-sized BroadcastExchange build
    (r15: the broadcast hash relation was |distinct key pairs|-sized —
    at 100 TB an unbuildable relation, locally the query's whole cost).
    Join-vs-window semantics agree because lineitem's composite key is
    non-null throughout (a null key never equi-joins, but counts in its
    window partition; the fixture generator emits no null keys — oracle-
    verified at every SF).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey", "l_suppkey")
    return (
        lineitem.select(
            "l_orderkey",
            "l_linenumber",
            F.count("*").over(w).alias("cnt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def qj2_inner_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — single-key inner join (plugs/podping/podping.py:34).

    Selective filter applied before the join; customer is the small side and
    AQE picks broadcast-hash at test SF (at 100 TB the filter keeps the probe
    side tiny, so the join stays cheap either way).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


def qj4_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4 — equi join + temporal residual, vote-before-expiry analog
    (plugs/polls/polls.py:69-70). Equi key stays hashable; the non-equi
    comparison rides along as the join residual."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == lineitem.l_orderkey) & (
        lineitem.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(lineitem, cond, "inner")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderkey")
    )


def qj5_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — insert-if-absent guard (plugs/polls/functions.sql:105-112) as a
    left-anti join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        ).agg(F.count("*").alias("n"))
    )


def qa1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/O1 — FLAGSHIP: podping counts top-k (plugs/podping/podping.py:19-26).

    groupBy+count compiles to partial/final hash agg; orderBy+limit compiles
    to TakeOrderedAndProject — no global sort at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("event_type") == "purchase") & F.col("event_id").between(0, 900)
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(20)
    )


def qa2_cntdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — vote-summary count-distinct (plugs/polls/polls.py:62-71)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("voters"))
        .orderBy("event_type")
    )


def qo2_latestk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O4 — latest-k feed updates (plugs/podping/podping.py:36-37)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id") == 7)
        .select("event_id", "ts", "value")
        .orderBy(F.desc("event_id"))
        .limit(5)
    )


def qo3_replay_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/T5 — deterministic replay order (database/sql/sync.sql:99) as a
    per-entity window, the set-based form of the reference's row loop."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_id",
            "user_id",
            # bigint on both sides: Spark row_number() is INT, DuckDB's BIGINT
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .orderBy("user_id", "rn")
    )


def qt7_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 — first-create-wins upsert (plugs/polls/functions.sql:105-112)
    reformulated as row_number()==1 per entity."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id", "event_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


def qp3_elem_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — 1-based array index (plugs/polls/polls.py:62). ``element_at`` is
    1-based like PG arrays; ANSI off so out-of-range yields NULL."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    return (
        embeddings.select(
            "vec_id", F.element_at("embedding", 1).alias("first_dim")
        ).orderBy("vec_id")
    )


def qx2_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/A5 — JSON-array→rows explode (plugs/podping/functions.sql:19,27)."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    return (
        embeddings.select("vec_id", F.explode("embedding").alias("v"))
        .groupBy("vec_id")
        .agg(F.count("*").alias("dim"))
        .orderBy("vec_id")
    )


def qx1_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X4 — JSON field extraction (plugs/podping/functions.sql:80-83)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") < 100)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


def qx5_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/X5 — hex encode (plugs/podping/podping.py:32)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id").between(200, 231))
        .select("event_id", F.lower(F.hex("event_id")).alias("h"))
        .orderBy("event_id")
    )


def qx9_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8/X9/X11 — interval arithmetic + the reference's API timestamp format
    (tools.py:14, %Y-%m-%dT%H:%M:%S)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") < 50)
        .select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 7 DAYS")).cast("date").alias("d7"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso"),
        )
        .orderBy("event_id")
    )


def qe1_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext/dedup — exact duplicate census over documents."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.agg(
        F.countDistinct("text").alias("uniq"), F.count("*").alias("total")
    )


def qe2_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext/text — per-language doc stats."""
    documents = load_table(spark, sf_dir, "documents")
    return (
        documents.groupBy("lang")
        .agg(F.count("*").alias("docs"), F.avg("n_chars").alias("avg_chars"))
        .orderBy("lang")
    )


def qe3_toklen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext/text — whitespace token count, engine-portable formulation."""
    documents = load_table(spark, sf_dir, "documents")
    n_tokens = (
        # bigint on both sides: Spark length() is INT, DuckDB's BIGINT
        (F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1))
        .cast("long")
        .alias("n_tokens")
    )
    return (
        documents.filter(F.col("doc_id") < 100)
        .select("doc_id", n_tokens)
        .orderBy("doc_id")
    )


CANONICAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "QS1-scan-range": qs1_scan_range,
    "QS2-head-probe": qs2_head_probe,
    "QS3-catalog": qs3_catalog,
    "QF1-inlist": qf1_inlist,
    "QF5-temporal-flag": qf5_temporal_flag,
    "QF7-branch": qf7_branch,
    "QF8-semi": qf8_semi,
    "QJ1-left-composite": qj1_left_composite,
    "QJ2-inner-single": qj2_inner_single,
    "QJ4-theta": qj4_theta,
    "QJ5-anti": qj5_anti,
    "QA1-topk": qa1_topk,
    "QA2-cntdistinct": qa2_cntdistinct,
    "QO2-latestk": qo2_latestk,
    "QO3-replay-order": qo3_replay_order,
    "QT7-first-wins": qt7_first_wins,
    "QP3-elem-at": qp3_elem_at,
    "QX2-unnest": qx2_unnest,
    "QX1-json": qx1_json,
    "QX5-hex": qx5_hex,
    "QX9-interval": qx9_interval,
    "QE1-dedup": qe1_dedup,
    "QE2-textstats": qe2_textstats,
    "QE3-toklen": qe3_toklen,
}

# DuckDB-dialect oracle SQL, column names aligned 1:1 with the DataFrames.
ORACLE_SQL: dict[str, str] = {
    "QS1-scan-range": (
        "SELECT event_id, ts, user_id, event_type, value FROM events "
        "WHERE event_id BETWEEN 100 AND 199 ORDER BY event_id"
    ),
    "QS2-head-probe": (
        "SELECT max(event_id) AS head_id, max(ts) AS head_ts FROM events"
    ),
    "QS3-catalog": (
        "SELECT event_type, 'hive::protocol::' || event_type AS qualified "
        "FROM (SELECT DISTINCT event_type FROM events) t ORDER BY event_type"
    ),
    "QF1-inlist": (
        "SELECT count(*) AS n FROM events WHERE event_type IN ('purchase','signup')"
    ),
    "QF5-temporal-flag": (
        "SELECT count(*) AS n FROM orders WHERE o_orderdate >= "
        "TIMESTAMP '1995-06-01 00:00:00' AND o_orderstatus = 'O'"
    ),
    "QF7-branch": (
        "SELECT event_type, CASE WHEN value > 100 THEN 'big' ELSE 'small' END AS bucket, "
        "count(*) AS n FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "QF8-semi": (
        "SELECT count(*) AS n FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "QJ1-left-composite": (
        "SELECT l.l_orderkey, l.l_linenumber, coalesce(d.cnt, 0) AS cnt "
        "FROM lineitem l LEFT JOIN (SELECT l_orderkey, l_suppkey, count(*) AS cnt "
        "FROM lineitem GROUP BY 1, 2) d "
        "ON l.l_orderkey = d.l_orderkey AND l.l_suppkey = d.l_suppkey "
        "ORDER BY l.l_orderkey, l.l_linenumber"
    ),
    "QJ2-inner-single": (
        "SELECT o.o_orderkey, c.c_name FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE o.o_totalprice > 400000 ORDER BY o.o_orderkey"
    ),
    "QJ4-theta": (
        "SELECT o.o_orderkey, count(*) AS n FROM orders o JOIN lineitem l "
        "ON o.o_orderkey = l.l_orderkey AND l.l_shipdate <= o.o_orderdate + "
        "INTERVAL '90' DAY GROUP BY o.o_orderkey ORDER BY o.o_orderkey"
    ),
    "QJ5-anti": (
        "SELECT count(*) AS n FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "QA1-topk": (
        "SELECT user_id, count(*) AS cnt FROM events WHERE event_type = 'purchase' "
        "AND event_id BETWEEN 0 AND 900 GROUP BY user_id "
        "ORDER BY cnt DESC, user_id LIMIT 20"
    ),
    "QA2-cntdistinct": (
        "SELECT event_type, count(DISTINCT user_id) AS voters FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ),
    "QO2-latestk": (
        "SELECT event_id, ts, value FROM events WHERE user_id = 7 "
        "ORDER BY event_id DESC LIMIT 5"
    ),
    "QO3-replay-order": (
        "SELECT event_id, user_id, row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events "
        "ORDER BY user_id, rn"
    ),
    "QT7-first-wins": (
        "SELECT user_id, event_id, event_type FROM (SELECT user_id, event_id, "
        "event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS rn FROM events) t WHERE rn = 1 ORDER BY user_id"
    ),
    "QP3-elem-at": (
        "SELECT vec_id, embedding[1] AS first_dim FROM embeddings ORDER BY vec_id"
    ),
    "QX2-unnest": (
        "SELECT vec_id, count(*) AS dim FROM (SELECT vec_id, unnest(embedding) AS v "
        "FROM embeddings) t GROUP BY vec_id ORDER BY vec_id"
    ),
    "QX1-json": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k "
        "FROM events WHERE event_id < 100 ORDER BY event_id"
    ),
    "QX5-hex": (
        "SELECT event_id, lower(to_hex(event_id)) AS h FROM events "
        "WHERE event_id BETWEEN 200 AND 231 ORDER BY event_id"
    ),
    "QX9-interval": (
        "SELECT event_id, CAST(ts + INTERVAL '7' DAY AS DATE) AS d7, "
        "strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso FROM events "
        "WHERE event_id < 50 ORDER BY event_id"
    ),
    "QE1-dedup": (
        "SELECT count(DISTINCT text) AS uniq, count(*) AS total FROM documents"
    ),
    "QE2-textstats": (
        "SELECT lang, count(*) AS docs, avg(n_chars) AS avg_chars FROM documents "
        "GROUP BY lang ORDER BY lang"
    ),
    "QE3-toklen": (
        "SELECT doc_id, length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens "
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id"
    ),
}
