"""Hive-Engine plug — sidechain token ops capture.

Reference parity (/root/reference/haf_plug_play/plugs/hive_engine/): the
reference ships this plug as a broken skeleton (functions.sql:12-16 doesn't
parse, `hive_engine.tokens` is dispatched but undefined, tables.sql declares
`transfers` three times — SURVEY §7.4). Implemented intent:

- op filter `= 'ssc-mainnet-hive'`:      functions.sql:67
- bronze ops row per matched op:         functions.sql:22-44, tables.sql:3-12
- contract dispatch (tokens / nft):      functions.sql:71-75
- transfers with the first (typed) definition — qty NUMERIC(18,10)
  (tables.sql:14-24); reserved-word columns `from`/`to` become
  from_acct/to_acct (FIXTURES.md §3.4)
- nfts / issuances / burns promoted from details-JSON skeletons to typed
  columns per tables.sql:26-57's evident intent (symbol/to/qty/memo,
  owners from the signing accounts), raw contractPayload retained in
  `details`

The transfer sender is the op's signing account (first active auth, falling
back to posting auth) — the payload carries only the recipient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from haf_plug_play_spark.plugs.framework import Plug

CJ_ID = "ssc-mainnet-hive"

OPS_COLUMNS = (
    "op_id_seq",
    "block_num",
    "created",
    "trx_hash_hex",
    "req_auths",
    "req_posting_auths",
    "cj_id",
    "payload",
)


def transform(parsed: DataFrame) -> dict[str, DataFrame]:
    matched = parsed.filter((F.col("cj_id") == CJ_ID) & F.col("payload_valid"))

    ops_out = matched.select(*OPS_COLUMNS)

    contract = F.get_json_object("payload", "$.contractName")
    action = F.get_json_object("payload", "$.contractAction")
    details = F.get_json_object("payload", "$.contractPayload")

    transfers = matched.filter(
        (contract == "tokens") & (action == "transfer")
    ).select(
        "op_id_seq",
        "block_num",
        "created",
        F.get_json_object("payload", "$.contractPayload.symbol").alias("symbol"),
        F.coalesce(
            F.element_at("req_auths", 1), F.element_at("req_posting_auths", 1)
        ).alias("from_acct"),
        F.get_json_object("payload", "$.contractPayload.to").alias("to_acct"),
        F.get_json_object("payload", "$.contractPayload.quantity")
        .cast("decimal(18,10)")
        .alias("qty"),
        F.get_json_object("payload", "$.contractPayload.memo").alias("memo"),
    )
    # The remaining capture tables, typed per tables.sql:26-57's evident
    # intent (the reference leaves them as details-JSON skeletons with a
    # "TODO: investigate expanding" note): typed payload fields are promoted
    # to columns, the raw contractPayload JSON stays in ``details`` for
    # anything the schema doesn't name.
    base = ["op_id_seq", "block_num", "created"]
    symbol = F.get_json_object("payload", "$.contractPayload.symbol")
    to_acct = F.get_json_object("payload", "$.contractPayload.to")
    qty = F.get_json_object("payload", "$.contractPayload.quantity").cast("decimal(18,10)")
    memo = F.get_json_object("payload", "$.contractPayload.memo")
    sender = F.coalesce(
        F.element_at("req_auths", 1), F.element_at("req_posting_auths", 1)
    )
    # owners VARCHAR(16)[] (tables.sql:29): the signing accounts — active
    # auths when present, else posting auths (size() is -1 on NULL arrays,
    # so the fallback covers both null and empty)
    owners = F.when(F.size("req_auths") > 0, F.col("req_auths")).otherwise(
        F.col("req_posting_auths")
    )
    nfts = matched.filter(contract == "nft").select(
        *base,
        action.alias("action"),
        symbol.alias("symbol"),
        owners.alias("owners"),
        details.alias("details"),
    )
    issuances = matched.filter((contract == "tokens") & (action == "issue")).select(
        *base,
        symbol.alias("symbol"),
        to_acct.alias("to_acct"),
        qty.alias("qty"),
        memo.alias("memo"),
        details.alias("details"),
    )
    burns = matched.filter(
        (contract == "tokens") & (action == "transfer") & (to_acct == "null")
    ).select(
        *base,
        symbol.alias("symbol"),
        sender.alias("from_acct"),
        qty.alias("qty"),
        memo.alias("memo"),
        details.alias("details"),
    )
    return {
        "he_ops": ops_out,
        "he_transfers": transfers,
        "he_nfts": nfts,
        "he_issuances": issuances,
        "he_burns": burns,
    }


PLUG = Plug(
    name="hive_engine",
    cj_ids=(CJ_ID,),
    start_block=60_100_000,  # plugs/hive_engine/defs.json:7
    transform=transform,
    tables=("he_ops", "he_transfers", "he_nfts", "he_issuances", "he_burns"),
)
