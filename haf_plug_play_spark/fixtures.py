"""Group 2 domain replay fixtures — deterministic op-log generator
(FIXTURES.md §3, seed 42).

Generates ``ops_log`` rows shaped like hive.operations_view
(/root/reference/haf_plug_play/database/sql/sync.sql:84-92) and a ``trx_log``
side table (sync.sql:93-95), with the payload mix and adversarial
interleavings FIXTURES.md §3.3 requires: duplicate creates, votes after
expiry, repeat votes, deletes after expiry, deletes by non-authors, dangling
votes, malformed JSON, unmatched cj ids, non-custom_json noise ops.

Plain-Python rows so both the Spark engine and the independent row-loop
replay oracle (tests/replay_oracle.py) consume identical input.
"""

from __future__ import annotations

import datetime
import json
import random

from pyspark.sql import types as T

CUSTOM_JSON_OP_TYPE_ID = 18
START_BLOCK = 1000
EPOCH = datetime.datetime(2024, 1, 1)

OPS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("block_num", T.IntegerType(), False),
        T.StructField("trx_in_block", T.IntegerType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("op_type_id", T.ShortType(), False),
        T.StructField("body", T.StringType(), False),
    ]
)

TRX_SCHEMA = T.StructType(
    [
        T.StructField("block_num", T.IntegerType(), False),
        T.StructField("trx_in_block", T.IntegerType(), False),
        T.StructField("trx_hash", T.BinaryType(), False),
    ]
)


def _accounts(rng: random.Random, n: int = 50) -> list[str]:
    names = set()
    while len(names) < n:
        ln = rng.randint(3, 16)
        name = rng.choice("abcdefghijklmnopqrstuvwxyz")
        name += "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789.-") for _ in range(ln - 1))
        names.add(name[:16])
    return sorted(names)


def _ts(block_num: int) -> datetime.datetime:
    return EPOCH + datetime.timedelta(seconds=3 * (block_num - START_BLOCK))


def _envelope(cj_id: str, payload_str: str, auths: list[str], posting: list[str]) -> str:
    return json.dumps(
        {
            "type": "custom_json_operation",
            "value": {
                "id": cj_id,
                "required_auths": auths,
                "required_posting_auths": posting,
                "json": payload_str,
            },
        }
    )


def _podping_payload(rng: random.Random) -> str:
    if rng.random() < 0.45:  # v0.3
        urls = [f"https://feed{rng.randint(0, 400)}.example.com/rss" for _ in range(rng.randint(1, 8))]
        return json.dumps(
            {"version": "0.3", "num_urls": len(urls), "reason": "feed_update", "urls": urls}
        )
    if rng.random() < 0.9:  # v1.0
        iris = [f"https://feed{rng.randint(0, 400)}.example.com/rss" for _ in range(rng.randint(1, 8))]
        return json.dumps(
            {
                "version": "1.0",
                "medium": rng.choice(["podcast", "music", "video"]),
                "reason": rng.choice(["update", "live"]),
                "iris": iris,
            }
        )
    # unknown version: op saved, no update rows (functions.sql:18-34 falls through)
    return json.dumps({"version": "0.2", "urls": ["https://old.example.com/rss"]})


def _polls_payload(rng: random.Random, accounts: list[str], polls: list[dict], ts: datetime.datetime, acct: str) -> str:
    ver = 1 if rng.random() < 0.93 else 2  # version-2 ops are state no-ops
    header = [ver, "polls-app/0.01"]
    r = rng.random()
    if r < 0.30 or not polls:  # create (dup (author,permlink) keys on purpose)
        permlink = f"poll-{rng.randint(0, 40)}"
        expires = ts + datetime.timedelta(minutes=rng.choice([5, 30, 240, 2880, 10080]))
        payload = {
            "permlink": permlink,
            "question": f"Question {rng.randint(0, 999)}?",
            "answers": [f"ans-{i}" for i in range(rng.randint(2, 5))],
            "expires": expires.strftime("%Y-%m-%d %H:%M:%S"),
            "tag": rng.choice(["hive-133333", "polls", "dev", None]),
        }
        if ver == 1:
            polls.append({"author": acct, "permlink": permlink, "expires": expires})
        return json.dumps([header, "create", payload])
    if r < 0.82:  # vote — sometimes dangling, sometimes out-of-range answer
        if polls and rng.random() < 0.85:
            p = rng.choice(polls)
            author, permlink = p["author"], p["permlink"]
        else:
            author, permlink = rng.choice(accounts), f"ghost-{rng.randint(0, 99)}"
        answer = rng.choice([0, 1, 1, 2, 2, 3, 3, 4, 5, 9])
        return json.dumps(
            [header, "vote", {"author": author, "permlink": permlink, "answer": answer}]
        )
    # delete — sometimes by non-author, sometimes late (after expiry)
    if polls and rng.random() < 0.8:
        p = rng.choice(polls)
        permlink = p["permlink"]
    else:
        permlink = f"ghost-{rng.randint(0, 99)}"
    return json.dumps([header, "delete", {"permlink": permlink}])


def _he_payload(rng: random.Random, accounts: list[str]) -> str:
    contract = rng.choice(["tokens", "tokens", "tokens", "nft", "market"])
    action = rng.choice(["transfer", "transfer", "issue"]) if contract == "tokens" else "create"
    qty = f"{rng.randint(0, 99999)}.{rng.randint(0, 9999999999):010d}"
    return json.dumps(
        {
            "contractName": contract,
            "contractAction": action,
            "contractPayload": {
                "symbol": rng.choice(["LEO", "BEE", "PIZZA", "SWAP.HIVE"]),
                # 'null' is the sidechain burn address
                "to": "null" if rng.random() < 0.06 else rng.choice(accounts),
                "quantity": qty,
                "memo": rng.choice(["", "thanks", "tip", None]),
            },
        }
    )


def generate(n_ops: int = 10_000, seed: int = 42) -> tuple[list[dict], list[dict]]:
    """Return (ops_log_rows, trx_log_rows) as plain dicts."""
    rng = random.Random(seed)
    accounts = _accounts(rng)
    polls_pool: list[dict] = []

    ops: list[dict] = []
    trx: list[dict] = []
    block = START_BLOCK
    trx_in_block = 0
    for i in range(n_ops):
        if trx_in_block >= rng.randint(2, 4):
            block += rng.choice([1, 1, 1, 2])
            trx_in_block = 0
        ts = _ts(block)
        if rng.random() < 0.10:  # non-custom_json noise
            op_type_id = rng.choice([1, 2, 72])
            body = json.dumps({"type": "other_operation", "value": {"n": i}})
        else:
            op_type_id = CUSTOM_JSON_OP_TYPE_ID
            acct = rng.choice(accounts)
            active_acct = rng.choice(accounts)
            kind = rng.choices(
                ["podping", "pp_video_update", "polls", "ssc-mainnet-hive", "notify", "sm_claim"],
                weights=[25, 8, 35, 18, 9, 5],
            )[0]
            if kind in ("podping", "pp_video_update"):
                payload = _podping_payload(rng)
            elif kind == "polls":
                payload = _polls_payload(rng, accounts, polls_pool, ts, acct)
            elif kind == "ssc-mainnet-hive":
                payload = _he_payload(rng, accounts)
            else:
                payload = json.dumps({"app": kind, "data": [i, str(i)]})
            if rng.random() < 0.02:  # malformed: truncated JSON (dead letter)
                payload = payload[: max(1, len(payload) // 2)]
            use_active = kind == "ssc-mainnet-hive" and rng.random() < 0.7
            body = _envelope(
                kind,
                payload,
                [active_acct] if use_active else [],
                [] if use_active else [acct],
            )
        ops.append(
            {
                "id": i + 1,
                "block_num": block,
                "trx_in_block": trx_in_block,
                "timestamp": ts,
                "op_type_id": op_type_id,
                "body": body,
            }
        )
        if rng.random() > 0.01:  # ~1% of keys absent → left-join NULL path
            trx.append(
                {
                    "block_num": block,
                    "trx_in_block": trx_in_block,
                    "trx_hash": rng.getrandbits(160).to_bytes(20, "big"),
                }
            )
        trx_in_block += 1
    return ops, trx


def as_dataframes(spark, n_ops: int = 10_000, seed: int = 42):
    ops, trx = generate(n_ops, seed)
    return (
        spark.createDataFrame(ops, OPS_SCHEMA),
        spark.createDataFrame(trx, TRX_SCHEMA),
    )
