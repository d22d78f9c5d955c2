"""Polls plug — on-chain polls state machine (create / vote / delete).

Reference parity (/root/reference/haf_plug_play/plugs/polls/ and
docs/protocols/polls.md): the documented protocol with the state semantics of
functions.sql:97-129 (the repo's own polls wiring is stale/broken —
SURVEY §7.4 — so the documented intent is authoritative):

- bronze ops row per 'polls' op, CJOS-01 envelope split into
  (op_header, op_type, op_payload): functions.sql:55-66, docs/op-standard.md:15-21
- state ops gated on header op_version == 1: functions.sql:97-99
- create → first-create-wins per (author, permlink): functions.sql:105-112
- vote → plain append (repeat votes kept; de-duped at query time):
  functions.sql:113-119
- delete → soft delete only if the poll exists and has not expired at delete
  time: functions.sql:120-128. The reference compares expires to NOW() at
  processing time; deterministic replay uses the op's own timestamp
  (delete.created <= expires) — the documented intent (SURVEY §7.3).

Set-based reformulation of the reference's ordered row loop (sync.sql:99-105):
op order is the total order (block_num, trx_in_block, op_id_seq); creates
collapse via row_number()==1; deletes apply via a semi-join carrying the
order + expiry guards. Equivalence is property-tested against an independent
row-loop replay (tests/test_plugs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from haf_plug_play_spark.plugs.framework import Plug

CJ_ID = "polls"

OPS_COLUMNS = (
    "op_id_seq",
    "block_num",
    "created",
    "trx_hash_hex",
    "req_auths",
    "req_posting_auths",
    "op_header",
    "op_type",
    "payload",
)


def _split_envelope(matched: DataFrame) -> DataFrame:
    """CJOS-01: payload is ``[[ver, app], "op", {...}]`` — positional split
    (reference functions.sql:55-57). Non-array payloads yield NULLs, exactly
    as PG's ``json ->> n`` does on non-arrays."""
    return matched.select(
        "op_id_seq",
        "block_num",
        "trx_in_block",
        "created",
        "trx_hash_hex",
        "req_auths",
        "req_posting_auths",
        F.get_json_object("payload", "$[0]").alias("op_header"),
        F.get_json_object("payload", "$[1]").alias("op_type"),
        F.get_json_object("payload", "$[2]").alias("payload"),
    )


def silver_transform(parsed: DataFrame) -> dict[str, DataFrame]:
    """Append-only silver tables: ops, creates, deletes, votes. The runner
    appends these per micro-batch; the gold ``polls_content`` view derives
    from *cumulative* creates+deletes (``content_from``), so incremental
    processing equals batch processing by construction."""
    matched = parsed.filter((F.col("cj_id") == CJ_ID) & F.col("payload_valid"))
    ops_out = _split_envelope(matched)

    # State machine input: version-1 ops only (functions.sql:99).
    v1 = ops_out.filter(
        F.get_json_object("op_header", "$[0]").cast("int") == 1
    )

    # Poll author/voter account = first posting auth (functions.sql:74:
    # req_posting_auths[1] — PG arrays are 1-based, as is element_at).
    acct = F.element_at("req_posting_auths", 1)

    creates = v1.filter(F.col("op_type") == "create").select(
        "op_id_seq",
        "block_num",
        "created",
        acct.alias("author"),
        F.get_json_object("payload", "$.permlink").alias("permlink"),
        F.get_json_object("payload", "$.question").alias("question"),
        F.from_json(
            F.get_json_object("payload", "$.answers"), "array<string>"
        ).alias("answers"),
        F.to_timestamp(F.get_json_object("payload", "$.expires")).alias("expires"),
        F.get_json_object("payload", "$.tag").alias("tag"),
    )

    deletes = v1.filter(F.col("op_type") == "delete").select(
        F.col("op_id_seq").alias("del_op_id_seq"),
        "block_num",
        F.col("created").alias("del_created"),
        acct.alias("author"),
        F.get_json_object("payload", "$.permlink").alias("permlink"),
    )

    # Vote append (T9): every vote kept; dangling votes dropped by the inner
    # join at query time (polls.py:63-65), repeats de-duped by COUNT(DISTINCT).
    votes = v1.filter(F.col("op_type") == "vote").select(
        "op_id_seq",
        "block_num",
        F.get_json_object("payload", "$.permlink").alias("permlink"),
        F.get_json_object("payload", "$.author").alias("author"),
        "created",
        acct.alias("account"),
        F.get_json_object("payload", "$.answer").cast("smallint").alias("answer"),
    )

    return {
        "polls_ops": ops_out,
        "polls_creates": creates,
        "polls_deletes": deletes,
        "polls_votes": votes,
    }


def content_from(creates: DataFrame, deletes: DataFrame) -> DataFrame:
    """Gold view: poll entity state from cumulative creates and deletes.

    First-create-wins (T7): the reference's existence probe under total op
    order collapses to row_number()==1 per entity — and min-op-id-wins makes
    the result independent of batch arrival order. Guarded soft delete (T8):
    a delete applies iff it follows the winning create in op order and lands
    at-or-before the poll's expiry.
    """
    w = W.partitionBy("author", "permlink").orderBy("op_id_seq")
    content0 = (
        creates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    c, d = content0.alias("c"), deletes.alias("d")
    deleted_keys = (
        c.join(
            d,
            (F.col("c.author") == F.col("d.author"))
            & (F.col("c.permlink") == F.col("d.permlink"))
            & (F.col("d.del_op_id_seq") > F.col("c.op_id_seq"))
            & (F.col("d.del_created") <= F.col("c.expires")),
            "left_semi",
        )
        .select("author", "permlink")
        .withColumn("_del", F.lit(True))
    )
    return (
        content0.join(deleted_keys, ["author", "permlink"], "left")
        .withColumn("deleted", F.coalesce(F.col("_del"), F.lit(False)))
        .drop("_del")
        .select(
            "op_id_seq",
            "created",
            "permlink",
            "author",
            "question",
            "answers",
            "expires",
            "tag",
            "deleted",
        )
    )


def transform(parsed: DataFrame) -> dict[str, DataFrame]:
    """Batch-mode outputs (golden-test surface): silver + derived gold."""
    t = silver_transform(parsed)
    return {
        "polls_ops": t["polls_ops"],
        "polls_content": content_from(t["polls_creates"], t["polls_deletes"]),
        "polls_votes": t["polls_votes"].drop("block_num"),
    }


PLUG = Plug(
    name="polls",
    cj_ids=(CJ_ID,),
    start_block=59_594_882,  # plugs/polls/defs.json:7
    transform=transform,
    tables=("polls_ops", "polls_content", "polls_votes"),
    silver=silver_transform,
    gold={
        "polls_content": lambda t: content_from(t["polls_creates"], t["polls_deletes"])
    },
)
