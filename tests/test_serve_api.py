"""Endpoint-layer tests: the framework-agnostic ``api_routes`` table must
reproduce the reference's HTTP menu (server/serve.py:12-46,
plug_endpoints/podping.py, plug_endpoints/polls.py) — positional-schema
JSON, validation errors, and the probe-and-increment permlink — without an
HTTP stack (this container has no fastapi)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from haf_plug_play_spark import fixtures
from haf_plug_play_spark.ingest.envelope import parse_custom_json
from haf_plug_play_spark.plugs import PLUGS
from haf_plug_play_spark.queries import plug_queries as Q
from haf_plug_play_spark.serve import ApiError, api_routes, df_to_json_rows

NOW = fixtures.EPOCH.replace(hour=2)

REFERENCE_MENU = {
    ("GET", "/api"),
    ("GET", "/api/podping/history/counts"),
    ("GET", "/api/podping/history/latest/iri"),
    ("POST", "/api/polls/new_permlink"),
    ("GET", "/api/polls/ops"),
    ("GET", "/api/polls/active"),
    ("GET", "/api/polls/{author}/{permlink}"),
    ("GET", "/api/polls/{author}/{permlink}/votes"),
    ("GET", "/api/polls/{author}"),
}


@pytest.fixture(scope="module")
def derived(spark):
    ops_df, trx_df = fixtures.as_dataframes(spark, 10_000, 42)
    parsed = parse_custom_json(ops_df, trx_df)
    out = {}
    for plug in PLUGS.values():
        out.update(plug.transform(parsed))
    for df in out.values():
        df.cache()
    return out


@pytest.fixture(scope="module")
def routes(derived):
    ctx = dict(derived)
    ctx["now"] = NOW
    ctx["status"] = lambda: {"status": "GOOD", "head_block_num": 123}
    return api_routes(ctx)


def test_menu_matches_reference(routes):
    assert set(routes) == REFERENCE_MENU


def test_root_status(routes):
    assert routes[("GET", "/api")]() == {"status": "GOOD", "head_block_num": 123}


def test_podping_counts_positional_schema(routes, derived):
    got = routes[("GET", "/api/podping/history/counts")]("[1000, 2500]", 20)
    expected = df_to_json_rows(
        Q.podping_counts(derived["podping_updates"], (1000, 2500), 20),
        ["url", "count"],
    )
    assert got == expected and len(got) > 0
    assert list(got[0]) == ["url", "count"]  # podping.py:36 field names


def test_podping_counts_validation(routes):
    with pytest.raises(ApiError) as e:
        routes[("GET", "/api/podping/history/counts")]('"not-a-list"')
    assert e.value.status_code == 400 and "array" in e.value.detail
    with pytest.raises(ApiError) as e:
        routes[("GET", "/api/podping/history/counts")]("[1, \"two\"]")
    assert "integers" in e.value.detail
    with pytest.raises(ApiError) as e:
        routes[("GET", "/api/podping/history/counts")]("not json at all")
    assert e.value.status_code == 400


def test_podping_latest_iri(routes, derived):
    url = (
        derived["podping_updates"]
        .groupBy("url")
        .count()
        .orderBy(F.desc("count"), "url")
        .first()
        .url
    )
    got = routes[("GET", "/api/podping/history/latest/iri")](url, 5)
    assert got["iri"] == url
    assert isinstance(got["time_since_last_update"], int)
    assert 0 < len(got["feed_updates"]) <= 5
    assert list(got["feed_updates"][0]) == [
        "trx_id", "block_num", "created", "reason", "medium",
    ]  # podping.py:54
    with pytest.raises(ApiError):
        routes[("GET", "/api/podping/history/latest/iri")]("https://no.such/feed", 5)


def test_new_permlink_probe_increment(spark, derived):
    content = spark.createDataFrame(
        [("alice", "my-poll"), ("alice", "my-poll-1"), ("alice", "unrelated")],
        "author string, permlink string",
    )
    routes = api_routes({"polls_content": content})
    handler = routes[("POST", "/api/polls/new_permlink")]
    # taken twice for alice → next suffix; free for bob → base slug
    assert handler("alice", "My Poll!") == "my-poll-2"
    assert handler("bob", "My Poll!") == "my-poll"
    with pytest.raises(ApiError):
        handler("a-way-too-long-author-name", "q")
    with pytest.raises(ApiError):
        handler("alice", "q" * 256)


def test_poll_ops_endpoint(routes, derived):
    got = routes[("GET", "/api/polls/ops")]("vote", "[1000, 2000]")
    expected = df_to_json_rows(
        Q.poll_ops(derived["polls_ops"], "vote", (1000, 2000)),
        ["transaction_id", "req_posting_auths", "op_type", "op_payload"],
    )
    assert got == expected and len(got) > 0
    assert list(got[0]) == [
        "transaction_id", "req_posting_auths", "op_type", "op_payload",
    ]  # polls.py:101
    # invalid op_type: the reference builds no SQL and returns []
    assert routes[("GET", "/api/polls/ops")]("delete", None) == []


def test_polls_active_endpoint(routes, derived):
    got = routes[("GET", "/api/polls/active")]("")
    expected = df_to_json_rows(
        Q.polls_active(derived["polls_content"], None, now=NOW),
        ["author", "permlink", "question", "answers", "expires", "tag", "created"],
    )
    assert got == expected and len(got) > 0
    with pytest.raises(ApiError):
        routes[("GET", "/api/polls/active")]("a-tag-longer-than-sixteen")


def _poll_with_votes(derived):
    return (
        derived["polls_votes"]
        .join(
            derived["polls_content"].filter(~F.col("deleted")),
            ["author", "permlink"],
        )
        .groupBy("author", "permlink")
        .count()
        .orderBy(F.desc("count"), "author", "permlink")
        .first()
    )


def test_get_poll_with_votes(routes, derived):
    row = _poll_with_votes(derived)
    got = routes[("GET", "/api/polls/{author}/{permlink}")](row.author, row.permlink)
    assert got["author"] == row.author and got["permlink"] == row.permlink
    assert set(got) == {
        "author", "permlink", "question", "answers", "expires", "tag",
        "created", "votes",
    }
    assert got["votes"] and list(got["votes"][0]) == ["answer", "count"]  # summary
    full = routes[("GET", "/api/polls/{author}/{permlink}")](
        row.author, row.permlink, summary=False
    )
    assert full["votes"] and list(full["votes"][0]) == ["account", "answer"]
    with pytest.raises(ApiError) as e:
        routes[("GET", "/api/polls/{author}/{permlink}")]("nobody", "nothing")
    assert e.value.detail == "Poll not found"


def test_poll_votes_endpoint(routes, derived):
    row = _poll_with_votes(derived)
    got = routes[("GET", "/api/polls/{author}/{permlink}/votes")](row.author, row.permlink)
    assert len(got) > 0 and list(got[0]) == ["account", "answer"]  # polls.py:227


def test_polls_user_endpoint(routes, derived):
    author = derived["polls_content"].filter(~F.col("deleted")).first().author
    got = routes[("GET", "/api/polls/{author}")](author)
    expected = df_to_json_rows(
        Q.polls_user(derived["polls_content"], author, False, None, now=NOW),
        ["permlink", "question", "answers", "expires", "tag", "created"],
    )
    assert got == expected and len(got) > 0
    with pytest.raises(ApiError):
        routes[("GET", "/api/polls/{author}")](author, active="yes")


# ------------------------------------------------------------- HTTP smoke


@pytest.fixture(scope="module")
def http(derived):
    """Flask test client over build_flask_app — one real HTTP binding of the
    whole route table (the FastAPI adapter stays import-gated; Flask is what
    this container ships)."""
    flask = pytest.importorskip("flask")  # noqa: F841 — gate, like fastapi
    from haf_plug_play_spark.serve import build_flask_app

    ctx = dict(derived)
    ctx["now"] = NOW
    ctx["status"] = lambda: {"status": "GOOD", "head_block_num": 123}
    app = build_flask_app(ctx)
    app.config["TESTING"] = True
    return app.test_client()


def test_http_root_status(http):
    r = http.get("/api")
    assert r.status_code == 200
    assert r.get_json() == {"status": "GOOD", "head_block_num": 123}


def test_http_podping_counts_query_params(http, derived):
    r = http.get(
        "/api/podping/history/counts",
        query_string={"block_range": "[1000, 2500]", "limit": "3"},
    )
    assert r.status_code == 200
    rows = r.get_json()
    expected = df_to_json_rows(
        Q.podping_counts(derived["podping_updates"], (1000, 2500), 3),
        ["url", "count"],
    )
    assert rows == expected and 0 < len(rows) <= 3


def test_http_api_error_maps_to_status(http):
    r = http.get(
        "/api/podping/history/counts", query_string={"block_range": "not json"}
    )
    assert r.status_code == 400
    assert "array" in r.get_json()["detail"]


def test_http_post_json_body(http):
    r = http.post("/api/polls/new_permlink", json={"author": "zed", "question": "Hi There"})
    assert r.status_code == 200
    assert r.get_json() == "hi-there"
    r = http.post("/api/polls/new_permlink", json={"author": "x" * 17, "question": "q"})
    assert r.status_code == 400


def test_http_path_params_and_bool_coercion(http, derived):
    row = _poll_with_votes(derived)
    r = http.get(f"/api/polls/{row.author}/{row.permlink}")
    assert r.status_code == 200
    assert r.get_json()["votes"][0].keys() >= {"answer", "count"}
    r = http.get(
        f"/api/polls/{row.author}/{row.permlink}", query_string={"summary": "false"}
    )
    assert list(r.get_json()["votes"][0]) == sorted(["account", "answer"]) or list(
        r.get_json()["votes"][0]
    ) == ["account", "answer"]
    r = http.get(f"/api/polls/{row.author}/{row.permlink}/votes")
    assert r.status_code == 200 and len(r.get_json()) > 0


def test_http_menu_complete(http):
    """Every route binds: no 404/405 from the adapter itself."""
    row_author = "someone"
    paths = [
        ("GET", "/api"),
        ("GET", "/api/podping/history/counts"),
        ("GET", "/api/polls/ops?op_type=vote"),
        ("GET", "/api/polls/active"),
        ("GET", f"/api/polls/{row_author}"),
    ]
    for method, path in paths:
        r = http.open(path, method=method)
        assert r.status_code in (200, 400), (method, path, r.status_code)


def test_http_malformed_query_param_is_422_not_500(http):
    """review r9: Flask adapter coerced query params OUTSIDE its error
    boundary, so ?limit=abc became an unhandled ValueError → HTTP 500;
    the reference (and the FastAPI adapter) return a 4xx validation
    error."""
    r = http.get(
        "/api/podping/history/counts",
        query_string={"block_range": "[1000, 2500]", "limit": "abc"},
    )
    assert r.status_code == 422
    assert "invalid query parameter" in r.get_json()["detail"]
