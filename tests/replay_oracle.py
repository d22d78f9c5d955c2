"""Independent golden oracle: a literal single-threaded Python replay of the
reference's row loop (database/sql/sync.sql:82-105), used to verify the
engine's set-based plug transforms (FIXTURES.md §3.4).

Deliberately structured like the PL/pgSQL (one op at a time, in total order,
mutating dict state) so it is an *independent* derivation, not a copy of the
Spark logic. Divergences from the reference are intent fixes only
(SURVEY §7.4): polls delete compares the op's own timestamp to expires
(deterministic) instead of NOW() at processing time; hive_engine implements
the typed transfers table.
"""

from __future__ import annotations

import datetime
import json
from decimal import Decimal, InvalidOperation


def _valid_json(s):
    try:
        json.loads(s)
        return True
    except (ValueError, TypeError):
        return False


def _hex(b) -> str | None:
    return bytes(b).hex() if b is not None else None


def replay(ops_rows: list[dict], trx_rows: list[dict]) -> dict[str, list[dict]]:
    trx_map = {(t["block_num"], t["trx_in_block"]): t["trx_hash"] for t in trx_rows}

    podping_ops, podping_updates = [], []
    polls_ops, polls_votes = [], []
    polls_content: dict[tuple, dict] = {}  # (author, permlink) → row
    he_ops, he_transfers = [], []
    he_nfts, he_issuances, he_burns = [], [], []

    # total replay order: (block_num, trx_in_block, id) — sync.sql:99
    for op in sorted(ops_rows, key=lambda o: (o["block_num"], o["trx_in_block"], o["id"])):
        if op["op_type_id"] != 18:
            continue
        body = json.loads(op["body"])
        value = body["value"]
        cj_id = value["id"]
        payload_str = value["json"]
        oid, blk, ts = op["id"], op["block_num"], op["timestamp"]
        hash_hex = _hex(trx_map.get((blk, op["trx_in_block"])))
        auths = value["required_auths"]
        posting = value["required_posting_auths"]

        if cj_id in ("podping", "pp_video_update"):
            if not _valid_json(payload_str):
                continue  # 22P02 trap: op skipped entirely (functions.sql:91-96)
            p = json.loads(payload_str)
            podping_ops.append(
                dict(op_id_seq=oid, block_num=blk, created=ts, trx_hash_hex=hash_hex,
                     req_auths=auths, req_posting_auths=posting, cj_id=cj_id,
                     payload=payload_str)
            )
            version = p.get("version") if isinstance(p, dict) else None
            if version == "0.3":
                for url in p.get("urls") or []:
                    podping_updates.append(
                        dict(op_id_seq=oid, block_num=blk, created=ts, url=url,
                             reason=p.get("reason"), medium="blog")
                    )
            elif version == "1.0":
                for url in p.get("iris") or []:
                    podping_updates.append(
                        dict(op_id_seq=oid, block_num=blk, created=ts, url=url,
                             reason=p.get("reason"), medium=p.get("medium"))
                    )

        elif cj_id == "polls":
            if not _valid_json(payload_str):
                continue
            p = json.loads(payload_str)
            # PG json ->> n on a non-array returns NULL
            header = p[0] if isinstance(p, list) and len(p) > 0 else None
            op_type = p[1] if isinstance(p, list) and len(p) > 1 else None
            op_payload = p[2] if isinstance(p, list) and len(p) > 2 else None
            polls_ops.append(
                dict(op_id_seq=oid, block_num=blk, created=ts, trx_hash_hex=hash_hex,
                     req_auths=auths, req_posting_auths=posting,
                     op_header=json.dumps(header, separators=(",", ":")) if header is not None else None,
                     op_type=op_type if isinstance(op_type, str) else None,
                     payload=json.dumps(op_payload, separators=(",", ":")) if op_payload is not None else None)
            )
            op_version = header[0] if isinstance(header, list) and header else None
            if op_version != 1 or not isinstance(op_payload, dict):
                continue
            acct = posting[0] if posting else None
            if op_type == "create":
                key = (acct, op_payload.get("permlink"))
                if key not in polls_content:  # first create wins
                    exp = op_payload.get("expires")
                    polls_content[key] = dict(
                        op_id_seq=oid, created=ts,
                        permlink=op_payload.get("permlink"), author=acct,
                        question=op_payload.get("question"),
                        answers=op_payload.get("answers"),
                        expires=datetime.datetime.strptime(exp, "%Y-%m-%d %H:%M:%S") if exp else None,
                        tag=op_payload.get("tag"), deleted=False,
                    )
            elif op_type == "vote":
                polls_votes.append(
                    dict(op_id_seq=oid, permlink=op_payload.get("permlink"),
                         author=op_payload.get("author"), created=ts, account=acct,
                         answer=op_payload.get("answer"))
                )
            elif op_type == "delete":
                key = (acct, op_payload.get("permlink"))
                row = polls_content.get(key)
                # guarded soft delete: poll exists and not expired at op time
                if row is not None and row["expires"] is not None and ts <= row["expires"]:
                    row["deleted"] = True

        elif cj_id == "ssc-mainnet-hive":
            if not _valid_json(payload_str):
                continue
            p = json.loads(payload_str)
            he_ops.append(
                dict(op_id_seq=oid, block_num=blk, created=ts, trx_hash_hex=hash_hex,
                     req_auths=auths, req_posting_auths=posting, cj_id=cj_id,
                     payload=payload_str)
            )
            if not isinstance(p, dict):
                continue
            contract, action = p.get("contractName"), p.get("contractAction")
            cp = p.get("contractPayload")
            details = (
                json.dumps(cp, separators=(",", ":")) if cp is not None else None
            )
            if contract == "tokens" and action == "transfer":
                cpd = cp or {}
                try:
                    qty = Decimal(cpd.get("quantity")) if cpd.get("quantity") is not None else None
                except (InvalidOperation, TypeError):
                    qty = None
                sender = auths[0] if auths else (posting[0] if posting else None)
                he_transfers.append(
                    dict(op_id_seq=oid, block_num=blk, created=ts,
                         symbol=cpd.get("symbol"), from_acct=sender,
                         to_acct=cpd.get("to"), qty=qty, memo=cpd.get("memo"))
                )
                if cpd.get("to") == "null":
                    he_burns.append(
                        dict(op_id_seq=oid, block_num=blk, created=ts,
                             symbol=cpd.get("symbol"), from_acct=sender,
                             qty=qty, memo=cpd.get("memo"), details=details)
                    )
            elif contract == "nft":
                cpd = cp if isinstance(cp, dict) else {}
                he_nfts.append(
                    dict(op_id_seq=oid, block_num=blk, created=ts,
                         action=action, symbol=cpd.get("symbol"),
                         owners=(auths if auths else posting),
                         details=details)
                )
            elif contract == "tokens" and action == "issue":
                cpd = cp if isinstance(cp, dict) else {}
                try:
                    qty = Decimal(cpd.get("quantity")) if cpd.get("quantity") is not None else None
                except (InvalidOperation, TypeError):
                    qty = None
                he_issuances.append(
                    dict(op_id_seq=oid, block_num=blk, created=ts,
                         symbol=cpd.get("symbol"), to_acct=cpd.get("to"),
                         qty=qty, memo=cpd.get("memo"), details=details)
                )

    return {
        "podping_ops": podping_ops,
        "podping_updates": podping_updates,
        "polls_ops": polls_ops,
        "polls_content": list(polls_content.values()),
        "polls_votes": polls_votes,
        "he_ops": he_ops,
        "he_transfers": he_transfers,
        "he_nfts": he_nfts,
        "he_issuances": he_issuances,
        "he_burns": he_burns,
    }
