"""Unit tests pinning the driver-evidence rotation policy in
``__spark_entry__`` (ADVICE r6): the 50-query correctness window is now
computed from banked CORRECTNESS_r*.json files instead of a hand list, so
the parsing + tier ordering must be pinned like the list it replaced.

Pure-Python (no Spark session): synthetic CORRECTNESS files in a tmp dir
drive ``_last_green_round``; ``_evidence_order`` takes the resulting map
directly.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry_mod


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
FAILED = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
ERRED = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
ROWS_ONLY = {"rows_match": True, "err": None}  # weaker rows-only check


def test_last_green_round_basic(tmp_path):
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
    _write(tmp_path, 2, {"b": GREEN, "c": GREEN})
    last = entry_mod._last_green_round(str(tmp_path))
    assert last == {"a": 1, "b": 2, "c": 2}


def test_latest_failed_row_demotes_to_tier0(tmp_path):
    """A green r1 row followed by a FAILED r2 row banks NO evidence: the
    current implementation was never proven, so the query drops out of
    the map entirely (tier 0 in the ordering)."""
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
    _write(tmp_path, 2, {"a": FAILED, "b": ERRED})
    assert entry_mod._last_green_round(str(tmp_path)) == {}


def test_rows_only_row_counts_as_green(tmp_path):
    """Rows-only checks carry no hash_match; missing/None is not a
    failure — only an explicit False or a non-None err demotes."""
    _write(tmp_path, 3, {"a": ROWS_ONLY})
    assert entry_mod._last_green_round(str(tmp_path)) == {"a": 3}


def test_malformed_rows_and_files_are_skipped_not_fatal(tmp_path):
    """A malformed file or a non-dict row must neither crash import-time
    ordering nor silently demote OTHER queries' evidence."""
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    _write(tmp_path, 2, {"a": GREEN, "weird": "not-a-dict"})
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(["a", "list"]))
    last = entry_mod._last_green_round(str(tmp_path))
    assert last == {"a": 2}  # green row survives; junk is skipped


def test_evidence_order_tiers():
    """tier 0 (never-green / latest-failed) first in declaration order,
    then tier 1 (changed-since-last-row), then tier 2 stalest-first."""
    names = ["q_fresh", "q_never", "q_stale", "q_changed", "q_mid"]
    last = {"q_fresh": 6, "q_stale": 2, "q_changed": 5, "q_mid": 4}
    changed = {"q_changed": 5}  # code changed in/after round 5 ≥ last green 5
    order = entry_mod._evidence_order(names, last=last, changed=changed)
    assert order == ["q_never", "q_changed", "q_stale", "q_mid", "q_fresh"]


def test_changed_entry_self_retires_after_fresh_row():
    """Once a driver row postdating the change lands, the tier-1 entry
    stops applying — the query rejoins tier 2 by staleness."""
    names = ["q_a", "q_b"]
    changed = {"q_a": 5}
    # last green 5 <= changed 5 → still tier 1
    assert entry_mod._evidence_order(names, {"q_a": 5, "q_b": 1}, changed) == [
        "q_a",
        "q_b",
    ]
    # fresh row in round 6 > changed 5 → retired, ordinary staleness wins
    assert entry_mod._evidence_order(names, {"q_a": 6, "q_b": 1}, changed) == [
        "q_b",
        "q_a",
    ]


def test_all_queries_green_orders_by_staleness_not_declaration():
    names = ["x", "y", "z"]
    last = {"x": 3, "y": 1, "z": 2}
    assert entry_mod._evidence_order(names, last, {}) == ["y", "z", "x"]


def test_real_repo_window_has_no_parse_regression():
    """Against the REAL banked files: every declared query id appearing in
    any CORRECTNESS file parses into the map or is explainably tier-0 —
    the 'silent schema drift demotes everything' failure mode would show
    up here as an empty map."""
    last = entry_mod._last_green_round()
    assert len(last) >= 100  # 125 declared; union r1–r6 was fully green
