"""Property tests for the temporal operators under adversarial timestamps —
duplicate ts within keys, all-equal ts, empty right sides — checked against
a straightforward Python evaluation of the declared semantics."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from haf_plug_play_spark.operators.temporal import asof_join, sessionize

T0 = datetime.datetime(2024, 1, 1)

# events: (key, ts_offset_seconds, id) — small domains force ts collisions
event_strategy = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=999),
)


def _rows(events):
    seen = set()
    rows = []
    for k, off, i in events:
        if i in seen:  # unique ids
            continue
        seen.add(i)
        rows.append((k, T0 + datetime.timedelta(seconds=off), i))
    return rows


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=st.lists(event_strategy, max_size=12), right=st.lists(event_strategy, max_size=12))
def test_asof_join_matches_python(spark, left, right):
    lrows, rrows = _rows(left), _rows(right)
    # ids unique ACROSS sides for clarity
    rrows = [(k, ts, i + 1000) for k, ts, i in rrows]
    ldf = spark.createDataFrame(lrows or [(0, T0, -1)], "k int, ts timestamp, id int")
    rdf = spark.createDataFrame(rrows or [(99, T0, -1)], "k int, ts timestamp, id int")
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
        right_cols={"id": "r_id"}, tie_col="id",
    )
    got = {r.id: r.r_id for r in out.collect()}
    lrows2 = lrows or [(0, T0, -1)]
    rrows2 = rrows or [(99, T0, -1)]
    for k, ts, i in lrows2:
        cands = [(rts, rid) for rk, rts, rid in rrows2 if rk == k and rts <= ts]
        expected = max(cands)[1] if cands else None
        assert got[i] == expected, (k, ts, i, cands)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=st.lists(event_strategy, min_size=1, max_size=15), gap=st.integers(min_value=1, max_value=3))
def test_sessionize_matches_python(spark, events, gap):
    rows = _rows(events)
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, ts timestamp, id int")
    out = sessionize(df, key="k", ts="ts", gap_seconds=gap, order_tie="id")
    got = {r.id: r.session_id for r in out.collect()}
    by_key: dict[int, list] = {}
    for k, ts, i in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(k, []).append((ts, i))
    for k, seq in by_key.items():
        sid, prev = 0, None
        for ts, i in seq:
            if prev is None or (ts - prev).total_seconds() > gap:
                sid += 1
            prev = ts
            assert got[i] == sid, (k, ts, i)


def test_range_join_matches_theta_semantics(spark):
    """Bucketed range join must return exactly the theta-join's pairs, for
    intervals spanning multiple buckets and points on boundaries."""
    from haf_plug_play_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(i, k, p) for i, (k, p) in enumerate(
            [("a", 0), ("a", 59), ("a", 60), ("a", 150), ("b", 150), ("a", 301)]
        )],
        "lid long, k string, pt long",
    )
    right = spark.createDataFrame(
        [(100, "a", 0, 60), (200, "a", 50, 250), (300, "b", 100, 160), (400, "a", 300, 301)],
        "rid long, k string, lo long, hi long",
    )
    got = {
        (r.lid, r.rid)
        for r in range_join(left, right, "pt", "lo", "hi", on=["k"], bucket=60).collect()
    }
    expected = {
        (lr.lid, rr.rid)
        for lr in left.collect()
        for rr in right.collect()
        if lr.k == rr.k and rr.lo <= lr.pt <= rr.hi
    }
    assert got == expected and len(expected) > 0
