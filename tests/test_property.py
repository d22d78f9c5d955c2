"""Property tests (SURVEY §5.2.4): random create/vote/delete interleavings —
the engine's set-based polls state must equal the independent row-loop
replay, and the state invariants must hold, for ANY op sequence, not just
the seed-42 fixture."""

from __future__ import annotations

import datetime
import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from haf_plug_play_spark import fixtures
from haf_plug_play_spark.ingest.envelope import parse_custom_json
from haf_plug_play_spark.plugs import PLUGS

from .compare import canonical
from .replay_oracle import replay

ACCOUNTS = ["alice", "bob", "carol"]
PERMLINKS = ["p1", "p2"]
T0 = datetime.datetime(2024, 1, 1)

op_strategy = st.one_of(
    st.tuples(
        st.just("create"),
        st.sampled_from(ACCOUNTS),
        st.sampled_from(PERMLINKS),
        st.integers(min_value=-60, max_value=360),  # expiry offset minutes
    ),
    st.tuples(
        st.just("vote"),
        st.sampled_from(ACCOUNTS),  # voter
        st.sampled_from(ACCOUNTS),  # poll author
        st.sampled_from(PERMLINKS),
        st.integers(min_value=0, max_value=6),  # answer (0 = out of range)
    ),
    st.tuples(
        st.just("delete"),
        st.sampled_from(ACCOUNTS),
        st.sampled_from(PERMLINKS),
    ),
)


def _ops_rows(ops: list[tuple]) -> list[dict]:
    rows = []
    for i, op in enumerate(ops):
        ts = T0 + datetime.timedelta(minutes=3 * i)
        if op[0] == "create":
            _, acct, permlink, exp_off = op
            payload = [
                [1, "polls-app/0.01"],
                "create",
                {
                    "permlink": permlink,
                    "question": "q?",
                    "answers": ["a", "b", "c"],
                    "expires": (ts + datetime.timedelta(minutes=exp_off)).strftime(
                        "%Y-%m-%d %H:%M:%S"
                    ),
                    "tag": "t",
                },
            ]
        elif op[0] == "vote":
            _, acct, author, permlink, answer = op
            payload = [
                [1, "polls-app/0.01"],
                "vote",
                {"author": author, "permlink": permlink, "answer": answer},
            ]
        else:
            _, acct, permlink = op
            payload = [[1, "polls-app/0.01"], "delete", {"permlink": permlink}]
        body = json.dumps(
            {
                "type": "custom_json_operation",
                "value": {
                    "id": "polls",
                    "required_auths": [],
                    "required_posting_auths": [acct],
                    "json": json.dumps(payload),
                },
            }
        )
        rows.append(
            {
                "id": i + 1,
                "block_num": 1000 + i,
                "trx_in_block": 0,
                "timestamp": ts,
                "op_type_id": 18,
                "body": body,
            }
        )
    return rows


COLS = {
    "polls_content": ["op_id_seq", "created", "permlink", "author", "question",
                      "answers", "expires", "tag", "deleted"],
    "polls_votes": ["op_id_seq", "permlink", "author", "created", "account", "answer"],
}


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=st.lists(op_strategy, min_size=1, max_size=40))
def test_polls_state_machine_equivalence(spark, ops):
    rows = _ops_rows(ops)
    expected = replay(rows, [])
    ops_df = spark.createDataFrame(rows, fixtures.OPS_SCHEMA)
    out = PLUGS["polls"].transform(parse_custom_json(ops_df))
    for table, cols in COLS.items():
        got = [tuple(r[c] for c in cols) for r in out[table].select(*cols).collect()]
        exp = [tuple(e.get(c) for c in cols) for e in expected[table]]
        assert canonical(cols, got) == canonical(cols, exp), table
    # invariants
    content = out["polls_content"].collect()
    keys = [(r.author, r.permlink) for r in content]
    assert len(keys) == len(set(keys))
    for r in content:
        if r.deleted:
            # a delete must exist after the create and at-or-before expiry
            assert any(
                o[0] == "delete"
                for o in ops
            )
