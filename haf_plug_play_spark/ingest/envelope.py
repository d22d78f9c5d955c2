"""Op-log ingest: custom_json envelope parsing (the reference's scan + parse
stage, reformulated as one declarative projection).

Reference parity:
- scan + filter + trx join: /root/reference/haf_plug_play/database/sql/sync.sql:82-100
- envelope field paths:     /root/reference/haf_plug_play/plugs/podping/functions.sql:80-83
- malformed-JSON isolation: /root/reference/haf_plug_play/plugs/podping/functions.sql:91-96
  (PG throws SQLSTATE 22P02 casting the payload string to json and skips the
  op; here `payload_valid` is false and plugs filter the row out — same
  outcome, no per-row exception machinery)

The whole stage is built-in expressions (get_json_object / from_json), so it
stays inside whole-stage codegen; at 100 TB it is a single scan-project over
the op log plus one equi-join to the transactions side-table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hive::protocol::custom_json_operation id in hive.operations_types
CUSTOM_JSON_OP_TYPE_ID = 18

# Deterministic replay order — database/sql/sync.sql:99. `id` alone is a
# total order (strictly increasing), but keep the full key for parity.
OP_ORDER = ("block_num", "trx_in_block", "op_id_seq")


def parse_custom_json(ops: DataFrame, trx: DataFrame | None = None) -> DataFrame:
    """ops_log → parsed custom_json envelope rows.

    Input columns: id, block_num, trx_in_block, timestamp, op_type_id, body.
    Output: op_id_seq, block_num, trx_in_block, created, cj_id, req_auths,
    req_posting_auths, payload (raw JSON string), payload_valid,
    trx_hash_hex (when ``trx`` given, left-joined on (block_num, trx_in_block)).
    """
    parsed = ops.filter(F.col("op_type_id") == CUSTOM_JSON_OP_TYPE_ID).select(
        F.col("id").alias("op_id_seq"),
        "block_num",
        "trx_in_block",
        F.col("timestamp").alias("created"),
        F.get_json_object("body", "$.value.id").alias("cj_id"),
        F.from_json(
            F.get_json_object("body", "$.value.required_auths"), "array<string>"
        ).alias("req_auths"),
        F.from_json(
            F.get_json_object("body", "$.value.required_posting_auths"),
            "array<string>",
        ).alias("req_posting_auths"),
        F.get_json_object("body", "$.value.json").alias("payload"),
    )
    # '$' echoes the document iff it parses — NULL marks malformed payloads.
    parsed = parsed.withColumn(
        "payload_valid", F.get_json_object("payload", "$").isNotNull()
    )
    if trx is not None:
        parsed = (
            parsed.join(trx, ["block_num", "trx_in_block"], "left")
            .withColumn("trx_hash_hex", F.lower(F.hex("trx_hash")))
            .drop("trx_hash")
        )
    else:
        parsed = parsed.withColumn("trx_hash_hex", F.lit(None).cast("string"))
    return parsed


def dead_letter(parsed: DataFrame, cj_ids: tuple[str, ...]) -> DataFrame:
    """Ops a plug matched but could not parse — the reference logs and skips
    these (functions.sql:91-96); we keep them queryable instead."""
    return parsed.filter(F.col("cj_id").isin(*cj_ids) & ~F.col("payload_valid"))
