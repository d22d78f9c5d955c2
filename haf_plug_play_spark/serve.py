"""API façade: result normalization + the reference's full endpoint menu.

Reference parity: the JSON boundary contract of tools.py:51-74 —
positional-schema row binding (``populate_by_schema``) and type
normalization (Decimal→float, naive-UTC timestamp→'%Y-%m-%dT%H:%M:%S',
bytes→hex) — and the HTTP surface of server/serve.py:12-46 +
server/plug_endpoints/podping.py:13-59 + polls.py:22-278.

The endpoint handlers live in ``api_routes`` as plain functions over
DataFrames (framework-agnostic, fully testable without an HTTP stack);
``build_app`` is a thin FastAPI adapter over that table (import-gated —
this container has no fastapi). Errors raise ``ApiError`` (≙ the
reference's HTTPException) so any web framework can map them.
"""

from __future__ import annotations

import datetime
import json
from collections.abc import Callable
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FORMAT = "%Y-%m-%dT%H:%M:%S"  # tools.py:14


class ApiError(Exception):
    """≙ fastapi.HTTPException at the framework-agnostic layer."""

    def __init__(self, status_code: int, detail: str) -> None:
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


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
    (database/access.py:10-12, tools.py:51-58)."""
    return [
        {name: normalize_value(value) for name, value in zip(schema, row)}
        for row in rows
    ]


def df_to_json_rows(df: DataFrame, schema: list[str] | None = None) -> list[dict]:
    """Collect + normalize a result DataFrame for the JSON boundary.
    ``schema`` renames columns POSITIONALLY (the reference's select(sql,
    schema) contract); default keeps the DataFrame's own column names."""
    cols = df.columns
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return populate_by_schema(rows, schema or cols)


# ---------------------------------------------------------------- validation


def _require_str(value: Any, name: str, max_len: int) -> None:
    if not isinstance(value, str):
        raise ApiError(400, f"Poll {name} must be a string")
    if not len(value) <= max_len:
        raise ApiError(400, f"Poll {name} must be no more than {max_len} characters")


def _parse_block_range(block_range) -> tuple[int, int] | None:
    """JSON-array query param (podping.py:26-34): '[lo,hi]' → (lo, hi)."""
    if block_range is None or block_range == "":
        return None
    if isinstance(block_range, str):
        try:
            block_range = json.loads(block_range)
        except ValueError:
            # the reference lets this 500; surface the clean 400 instead
            raise ApiError(400, "Block range must be a JSON array")
    if not isinstance(block_range, (list, tuple)):
        raise ApiError(400, "Block range must be an array")
    if len(block_range) != 2:
        raise ApiError(400, "Block range must have exactly two items")
    for block_num in block_range:
        # bool is an int subclass; [true, false] is not a block range
        if not isinstance(block_num, int) or isinstance(block_num, bool):
            raise ApiError(400, "Block range items must be integers")
    return (block_range[0], block_range[1])


# ---------------------------------------------------------------- endpoints


def api_routes(context: dict) -> dict[tuple[str, str], Callable]:
    """(method, path) → handler, the reference's whole menu. ``context``
    carries the derived-state DataFrames (podping_updates, podping_ops,
    polls_content, polls_votes, polls_ops), an optional ``status`` callable
    for GET /api (server/serve.py:25-35), and an optional ``now`` for
    deterministic time arithmetic."""
    from haf_plug_play_spark.functions.strings import slugify
    from haf_plug_play_spark.queries import plug_queries as Q

    def _now() -> datetime.datetime:
        return context.get("now") or datetime.datetime.now(datetime.timezone.utc).replace(
            tzinfo=None
        )

    def root():
        """System status (server/serve.py:25-35, system_status.py:12-29)."""
        status = context.get("status")
        return status() if callable(status) else {"status": "UNKNOWN"}

    def podping_counts(block_range=None, limit: int = 20):
        rng = _parse_block_range(block_range)
        df = Q.podping_counts(context["podping_updates"], rng, limit)
        return df_to_json_rows(df, ["url", "count"])  # podping.py:36

    def podping_url_latest(iri: str, limit: int = 5):
        df = Q.podping_url_latest_feed_update(
            context["podping_updates"], context["podping_ops"], iri, limit
        )
        feed_updates = df_to_json_rows(
            df, ["trx_id", "block_num", "created", "reason", "medium"]
        )  # podping.py:54
        if not feed_updates:
            # the reference IndexErrors into a 500 here; surface a clean 400
            raise ApiError(400, "No feed updates found for iri")
        since = _now() - datetime.datetime.strptime(feed_updates[0]["created"], TS_FORMAT)
        return {
            "feed_updates": feed_updates,
            "iri": iri,
            # .seconds (the <1-day component, not total_seconds) is BIT
            # PARITY with the reference (podping.py:57-58), including its
            # >24h wraparound quirk — deliberate, not an oversight here
            "time_since_last_update": since.seconds,
        }

    def new_permlink(author: str, question: str):
        """Probe-and-increment slug uniqueness (polls.py:22-75): the slug
        comes from the engine's slugify expression; the probe loop collects
        ONLY the author's colliding permlinks (one filtered scan, bounded)."""
        _require_str(author, "author", 16)
        _require_str(question, "question", 255)
        spark = context["polls_content"].sparkSession
        base = (
            spark.createDataFrame([(question,)], "q string")
            .select(slugify(F.col("q")).alias("slug"))
            .first()
            .slug
        )
        taken = {
            r.permlink
            for r in context["polls_content"]
            .filter(
                (F.col("author") == author)
                & F.col("permlink").rlike(f"^{base}(-[0-9]+)?$")
            )
            .select("permlink")
            .collect()
        }
        tries = 0
        while True:
            plink = base if tries == 0 else f"{base}-{tries}"
            if plink not in taken:
                return plink
            tries += 1

    def poll_ops(op_type: str, block_range=None):
        if op_type not in ("create", "vote"):  # polls/polls.py:13-15 → None
            return []
        rng = _parse_block_range(block_range)
        df = Q.poll_ops(
            context["polls_ops"], op_type, rng, default_window=rng is None
        )
        return df_to_json_rows(
            df, ["transaction_id", "req_posting_auths", "op_type", "op_payload"]
        )  # polls.py:101

    def polls_active(tag=""):
        _require_str(tag, "tag", 16)
        df = Q.polls_active(context["polls_content"], tag or None, now=_now())
        return df_to_json_rows(
            df, ["author", "permlink", "question", "answers", "expires", "tag", "created"]
        )  # polls.py:127

    def get_poll(author: str, permlink: str, summary: bool = True):
        _require_str(author, "author", 16)
        _require_str(permlink, "permlink", 255)
        rows = df_to_json_rows(
            Q.get_poll(context["polls_content"], author, permlink),
            ["author", "permlink", "question", "answers", "expires", "tag", "created"],
        )
        if not rows:
            raise ApiError(400, "Poll not found")  # polls.py:171-175
        result = rows[0]
        if summary:
            votes = df_to_json_rows(
                Q.poll_votes_summary(
                    context["polls_content"], context["polls_votes"], author, permlink
                ),
                ["answer", "count"],  # polls.py:178
            )
        else:
            votes = df_to_json_rows(
                Q.poll_votes(
                    context["polls_content"], context["polls_votes"], author, permlink
                ),
                ["account", "answer"],  # polls.py:183
            )
        result["votes"] = votes  # intent of polls.py:179-186 (SURVEY §7.4)
        return result

    def poll_votes(author: str, permlink: str):
        _require_str(author, "author", 16)
        _require_str(permlink, "permlink", 255)
        return df_to_json_rows(
            Q.poll_votes(
                context["polls_content"], context["polls_votes"], author, permlink
            ),
            ["account", "answer"],  # polls.py:227
        )

    def polls_user(author: str, active: bool = False, tag=""):
        _require_str(author, "author", 16)
        if not isinstance(active, bool):
            raise ApiError(400, "Active parameter must be boolean")
        if tag:
            _require_str(tag, "tag", 16)
        df = Q.polls_user(
            context["polls_content"], author, active, tag or None, now=_now()
        )
        return df_to_json_rows(
            df, ["permlink", "question", "answers", "expires", "tag", "created"]
        )  # polls.py:276

    return {
        ("GET", "/api"): root,
        ("GET", "/api/podping/history/counts"): podping_counts,
        ("GET", "/api/podping/history/latest/iri"): podping_url_latest,
        ("POST", "/api/polls/new_permlink"): new_permlink,
        ("GET", "/api/polls/ops"): poll_ops,
        ("GET", "/api/polls/active"): polls_active,
        ("GET", "/api/polls/{author}/{permlink}"): get_poll,
        ("GET", "/api/polls/{author}/{permlink}/votes"): poll_votes,
        ("GET", "/api/polls/{author}"): polls_user,
    }


def build_app(context: dict):
    """FastAPI adapter over ``api_routes`` (server/serve.py:12-46). Raises
    ImportError without fastapi installed (not in this container)."""
    from fastapi import FastAPI, HTTPException  # import-gated

    app = FastAPI()

    def _wrap(fn):
        def handler(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except ApiError as e:
                raise HTTPException(status_code=e.status_code, detail=e.detail)

        # FastAPI derives the signature for query/path params from the
        # wrapped function
        import functools

        return functools.wraps(fn)(handler)

    for (method, path), fn in api_routes(context).items():
        app.add_api_route(path, _wrap(fn), methods=[method])
    return app


def build_flask_app(context: dict):
    """Flask adapter over the same ``api_routes`` table — proves the
    framework-agnostic layer actually binds to a real HTTP stack (Flask is
    what this container ships; the FastAPI adapter above is import-gated).
    Handles the three binding concerns a framework owns: path params
    (``{author}`` → ``<author>``), query-string coercion (int/bool from the
    handler's signature), and POST JSON/form bodies; ``ApiError`` maps to a
    JSON error payload with its status code, like the reference's
    HTTPException handling (server/serve.py:12-46)."""
    import inspect

    from flask import Flask, jsonify, request  # import-gated

    app = Flask("haf_plug_play_spark")

    def _coerce(value: str, param):
        target = param.annotation
        if target is inspect.Parameter.empty and param.default not in (
            inspect.Parameter.empty,
            None,
        ):
            target = type(param.default).__name__
        if target in (int, "int"):
            return int(value)
        if target in (bool, "bool"):
            return value.lower() in ("1", "true", "yes", "on")
        return value

    def _make_view(fn):
        sig = inspect.signature(fn)

        def view(**path_kwargs):
            kwargs = dict(path_kwargs)
            body = request.get_json(silent=True) if request.method == "POST" else None
            # coercion INSIDE the error boundary (review r9): int('abc')
            # from ?limit=abc must surface as a 4xx validation error like
            # the FastAPI adapter (and the reference), not a werkzeug 500
            try:
                for name, param in sig.parameters.items():
                    if name in kwargs:
                        continue
                    if body is not None and name in body:
                        kwargs[name] = body[name]
                    elif name in request.args:
                        kwargs[name] = _coerce(request.args[name], param)
            except (ValueError, TypeError) as e:
                return jsonify({"detail": f"invalid query parameter: {e}"}), 422
            try:
                return jsonify(fn(**kwargs))
            except ApiError as e:
                return jsonify({"detail": e.detail}), e.status_code

        return view

    for (method, path), fn in api_routes(context).items():
        rule = path.replace("{", "<").replace("}", ">")
        app.add_url_rule(
            rule, endpoint=f"{method} {path}", view_func=_make_view(fn), methods=[method]
        )
    return app
