"""Podping plug — RSS/podcast feed-update notifications.

Reference parity (/root/reference/haf_plug_play/plugs/podping/):
- op filter `IN ('podping','pp_video_update')`: functions.sql:85
- bronze ops row per matched op:               functions.sql:41-62, tables.sql:3-12
- v0.3 branch (urls, medium hardcoded 'blog'): functions.sql:18-25 (the
  hardcode is intended — v0.3 predates mediums; SURVEY §7.4)
- v1.0 branch (iris, medium from payload):     functions.sql:26-33
- ops with other versions are saved but produce no update rows
  (functions.sql:18-34 falls through)

The reference's per-row FOREACH/INSERT loop becomes two filtered branch
projections unioned then exploded — pure built-in expressions, fully
distributed, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from haf_plug_play_spark.plugs.framework import Plug

CJ_IDS = ("podping", "pp_video_update")

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
    matched = parsed.filter(F.col("cj_id").isin(*CJ_IDS) & F.col("payload_valid"))

    ops_out = matched.select(*OPS_COLUMNS)

    base = matched.select(
        "op_id_seq",
        "block_num",
        "created",
        "payload",
        F.get_json_object("payload", "$.version").alias("version"),
        F.get_json_object("payload", "$.reason").alias("reason"),
    )
    v03 = base.filter(F.col("version") == "0.3").select(
        "op_id_seq",
        "block_num",
        "created",
        "reason",
        F.lit("blog").alias("medium"),
        F.explode(
            F.from_json(F.get_json_object("payload", "$.urls"), "array<string>")
        ).alias("url"),
    )
    v10 = base.filter(F.col("version") == "1.0").select(
        "op_id_seq",
        "block_num",
        "created",
        "reason",
        F.get_json_object("payload", "$.medium").alias("medium"),
        F.explode(
            F.from_json(F.get_json_object("payload", "$.iris"), "array<string>")
        ).alias("url"),
    )
    updates = v03.unionByName(v10).select(
        "op_id_seq", "block_num", "created", "url", "reason", "medium"
    )
    return {"podping_ops": ops_out, "podping_updates": updates}


PLUG = Plug(
    name="podping",
    cj_ids=CJ_IDS,
    start_block=53_690_004,  # plugs/podping/defs.json:7
    transform=transform,
    tables=("podping_ops", "podping_updates"),
)
