"""API façade: result normalization + endpoint functions (+ optional FastAPI).

Reference parity: the JSON boundary contract of tools.py:51-74 —
positional-schema row binding (``populate_by_schema``) and type
normalization (Decimal→float, naive-UTC timestamp→'%Y-%m-%dT%H:%M:%S',
bytes→hex). FastAPI itself (server/serve.py:12-46) is optional: endpoint
logic is plain functions over DataFrames so the HTTP layer stays a thin
shim (and this container has no fastapi — the app builder import-gates it).
"""

from __future__ import annotations

import datetime
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame

TS_FORMAT = "%Y-%m-%dT%H:%M:%S"  # tools.py:14


def normalize_value(v: Any) -> Any:
    if isinstance(v, Decimal):
        return float(v)  # tools.py:60-61
    if isinstance(v, datetime.datetime):
        return v.strftime(TS_FORMAT)  # tools.py:62-63
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return [normalize_value(x) for x in v]
    return v


def populate_by_schema(rows: list[tuple], schema: list[str]) -> list[dict]:
    """Positional field binding — column ORDER is the contract
    (database/access.py:10-12)."""
    return [
        {name: normalize_value(value) for name, value in zip(schema, row)}
        for row in rows
    ]


def df_to_json_rows(df: DataFrame, schema: list[str] | None = None) -> list[dict]:
    """Collect + normalize a result DataFrame for the JSON boundary."""
    cols = schema or df.columns
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return populate_by_schema(rows, cols)


def build_app(context: dict):
    """Optional FastAPI app mirroring the reference's endpoint menu
    (server/plug_endpoints/podping.py:13-59, polls.py:22-278). ``context``
    supplies the derived-table DataFrames. Raises ImportError without
    fastapi installed."""
    from fastapi import FastAPI  # import-gated: not in this container

    from haf_plug_play_spark.queries import plug_queries as Q

    app = FastAPI()

    @app.get("/api/podping/history/counts")
    def podping_counts(block_start: int, block_end: int, limit: int = 20):
        df = Q.podping_counts(context["podping_updates"], (block_start, block_end), limit)
        return df_to_json_rows(df)

    @app.get("/api/polls/polls_active")
    def polls_active(tag: str | None = None):
        return df_to_json_rows(Q.polls_active(context["polls_content"], tag))

    @app.get("/api/polls/poll")
    def poll(author: str, permlink: str):
        return df_to_json_rows(Q.get_poll(context["polls_content"], author, permlink))

    @app.get("/api/polls/votes_summary")
    def votes_summary(author: str, permlink: str):
        return df_to_json_rows(
            Q.poll_votes_summary(
                context["polls_content"], context["polls_votes"], author, permlink
            )
        )

    return app
