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
    order = entry_mod._evidence_order(names, last=last, changed={"q_changed"})
    assert order == ["q_never", "q_changed", "q_stale", "q_mid", "q_fresh"]


def test_synthetic_late_change_refronts_query():
    """The git-derived tier-1 signal (r7, replacing the hand dict): a
    module commit AFTER the commit that banked a query's last green row
    re-fronts exactly that query; once a fresh row is banked later than
    the change, the entry retires by itself."""
    names = ["q_a", "q_b"]
    last = {"q_a": 6, "q_b": 6}
    dep_files = {"q_a": ("mod_a.py",), "q_b": ("mod_b.py",)}
    row_ts = {6: 1000}
    # mod_a changed at t=1500 (after banking), mod_b untouched since 500
    changed = entry_mod._tier1_changed(
        names, last, file_ts={"mod_a.py": 1500, "mod_b.py": 500},
        row_ts=row_ts, dep_files=dep_files,
    )
    assert changed == {"q_a"}
    assert entry_mod._evidence_order(names, last, changed) == ["q_a", "q_b"]
    # a NEW driver row banked at t=2000 (> the change) retires the entry
    changed2 = entry_mod._tier1_changed(
        names, {"q_a": 7, "q_b": 6},
        file_ts={"mod_a.py": 1500, "mod_b.py": 500},
        row_ts={6: 1000, 7: 2000}, dep_files=dep_files,
    )
    assert changed2 == set()


def test_tier1_missing_timestamps_mean_no_information():
    """git unavailable / untracked file / unknown round → the query is
    NOT tier 1 (staleness rotation still covers it), never a crash."""
    names = ["q_a"]
    last = {"q_a": 6}
    assert (
        entry_mod._tier1_changed(
            names, last, file_ts={"mod_a.py": None},
            row_ts={6: 1000}, dep_files={"q_a": ("mod_a.py",)},
        )
        == set()
    )
    assert (
        entry_mod._tier1_changed(
            names, last, file_ts={"mod_a.py": 99},
            row_ts={6: None}, dep_files={"q_a": ("mod_a.py",)},
        )
        == set()
    )


def test_dep_discovery_finds_engine_modules():
    """_query_dep_files introspects real query callables: module-global
    references AND function-local imports resolve to engine files;
    ext/registry.py is excluded as shared glue."""
    import os

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    q = entry_mod.queries()
    deps = entry_mod._query_dep_files(q, repo)
    assert "haf_plug_play_spark/ext/dedup.py" in deps["XD-ngram-jaccard"]
    # function-local import (classify) is discovered
    assert "haf_plug_play_spark/ext/classify.py" in deps["XT-clf-quality"]
    assert all(
        "haf_plug_play_spark/ext/registry.py" not in fs for fs in deps.values()
    )


def test_all_queries_green_orders_by_staleness_not_declaration():
    names = ["x", "y", "z"]
    last = {"x": 3, "y": 1, "z": 2}
    assert entry_mod._evidence_order(names, last, set()) == ["y", "z", "x"]


def test_real_repo_window_has_no_parse_regression():
    """Against the REAL banked files: every declared query id appearing in
    any CORRECTNESS file parses into the map or is explainably tier-0 —
    the 'silent schema drift demotes everything' failure mode would show
    up here as an empty map."""
    last = entry_mod._last_green_round()
    assert len(last) >= 100  # 125 declared; union r1–r6 was fully green


def test_r8_window_fronts_weakest_evidence():
    """The driver's 50-query window (declaration order's head) must be
    exactly the weakest-evidence queries under the standing rotation
    rule, computed from the REAL banked CORRECTNESS files + git state:
    tier keys (never-checked, changed-since-banked, last-green round)
    must be monotone over the WHOLE declared order — which implies the
    window fronts the weakest block, this round and every later one
    (VERDICT r7 #8). Concrete r8 pin: every never-driver-checked query
    (the r8 additions) leads the order, as one contiguous block, until
    a round banks them."""
    import __spark_entry__ as e

    q = entry_mod.queries()
    names = list(q)
    last = entry_mod._last_green_round()
    current = entry_mod._current_evidence_hashes(q, e.oracle_sql())
    changed = entry_mod._tier1_changed(
        names, last, queries_by_name=q, current_hashes=current
    )

    def tier(n: str) -> tuple[int, int]:
        if n not in last:
            return (0, 0)
        if n in changed:
            return (1, last[n])
        return (2, last[n])

    keys = [tier(n) for n in names]
    assert keys == sorted(keys), [
        (n, k) for n, k in zip(names, keys)
    ][:60]
    never = [n for n in names if n not in last]
    if never:
        # all never-checked queries form the leading block
        assert names[: len(never)] == never
        assert "XT-trigram-lm-pruned" in never or "XT-trigram-lm-pruned" in last


def test_dep_discovery_resolves_unloaded_modules(monkeypatch):
    """A function-local import whose module is NOT in sys.modules still
    resolves to its file via the import-free package index (the ADVICE
    r7 tier-1 false negative)."""
    import os
    import sys

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    assert (
        entry_mod._engine_module_index()["classify"]
        == "haf_plug_play_spark.ext.classify"
    )

    def q(spark, sf_dir):
        from haf_plug_play_spark.ext import classify

        return classify

    monkeypatch.delitem(
        sys.modules, "haf_plug_play_spark.ext.classify", raising=False
    )
    deps = entry_mod._query_dep_files({"q": q}, repo)
    assert "haf_plug_play_spark/ext/classify.py" in deps["q"]


def test_dep_discovery_resolves_dotted_absolute_imports():
    """VERDICT r10 #2: `from haf_plug_play_spark.a.b import fn` puts the
    FULL dotted path in co_names; the bare-name module index never
    matches it, so 8 queries' implementation modules were invisible to
    the git file signal. A synthetic wrapper using the absolute form
    must now resolve to the module file."""
    import os

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))

    def q(spark, sf_dir):
        from haf_plug_play_spark.streaming.stateful import (
            running_user_state,
        )

        return running_user_state

    deps = entry_mod._query_dep_files({"q": q}, repo)
    assert "haf_plug_play_spark/streaming/stateful.py" in deps["q"]


def test_dep_map_covers_the_eight_blind_spot_queries():
    """VERDICT r10 #1 done-criterion: the real dep map must include the
    implementation module for every query the dotted-import blind spot
    hid (QSA, QSK, QSS, QSJ, QST, QSW, QJ8, QR1, XL-zorder)."""
    import os

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    deps = entry_mod._query_dep_files(entry_mod.queries(), repo)
    expect = {
        "QSA-stream-stateful": "haf_plug_play_spark/streaming/stateful.py",
        "QSK-stream-hll": "haf_plug_play_spark/ext/sketch.py",
        "QSS-stream-dedup": "haf_plug_play_spark/streaming/dedup.py",
        "QSJ-stream-join": "haf_plug_play_spark/streaming/joins.py",
        "QST-stream-window": "haf_plug_play_spark/streaming/windowed.py",
        "QSW-stream-session": "haf_plug_play_spark/streaming/windowed.py",
        "QJ8-salted": "haf_plug_play_spark/operators/skew.py",
        "QR1-range-join": "haf_plug_play_spark/operators/temporal.py",
        "XL-zorder": "haf_plug_play_spark/operators/layout.py",
    }
    missing = {
        qid: mod for qid, mod in expect.items() if mod not in deps.get(qid, ())
    }
    assert missing == {}, missing


def test_editing_stateful_module_refronts_exactly_qsa():
    """VERDICT r10 #1 regression: a commit touching streaming/stateful.py
    after QSA's evidence was banked re-fronts exactly QSA via the git
    file signal (hash signal neutralized; only stateful.py is 'newer')."""
    import os

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    q = entry_mod.queries()
    names = list(q)
    last = entry_mod._last_green_round()
    dep_files = entry_mod._query_dep_files(q, repo)
    file_ts = {"haf_plug_play_spark/streaming/stateful.py": 99_999}
    row_ts = {rnd: 1_000 for rnd in set(last.values())}
    changed = entry_mod._tier1_changed(
        names,
        last,
        dep_files=dep_files,
        file_ts=file_ts,
        row_ts=row_ts,
        banked_hashes={},
        current_hashes={},
    )
    assert changed == {"QSA-stream-stateful"}


# ------------------------------------------------- content-hash signal (r9)


def test_hash_signal_fronts_exactly_the_edited_oracle():
    """VERDICT r8 #2's done-criterion: editing ONE oracle literal (hash
    drift) re-fronts exactly that query — even though the git file
    signal sees nothing (registry.py is excluded from it)."""

    def qa(spark, sf):
        return None

    def qb(spark, sf):
        return None

    names = ["a", "b"]
    last = {"a": 7, "b": 7}
    ha = entry_mod.query_evidence_hash(qa, "SELECT 1 AS x")
    hb = entry_mod.query_evidence_hash(qb, "SELECT 2 AS y")
    hb_edited = entry_mod.query_evidence_hash(qb, "SELECT 2.0 AS y")
    assert hb_edited != hb
    changed = entry_mod._tier1_changed(
        names,
        last,
        dep_files={"a": (), "b": ()},
        file_ts={},
        row_ts={7: 100},
        banked_hashes={"a": ha, "b": hb},
        current_hashes={"a": ha, "b": hb_edited},
    )
    assert changed == {"b"}


def test_hash_signal_missing_information_is_not_tier1():
    """No banked hash, or no computable current hash, must not front a
    query on its own — the git file signal still applies."""

    changed = entry_mod._tier1_changed(
        ["a", "b"],
        {"a": 7, "b": 7},
        dep_files={"a": (), "b": ()},
        file_ts={},
        row_ts={7: 100},
        banked_hashes={"a": "deadbeef"},
        current_hashes={"b": "cafef00d"},
    )
    assert changed == set()


def test_hash_covers_wrapper_source_and_oracle_separately():
    """The hash must move when EITHER the wrapper source or the oracle
    SQL changes, and be stable across recomputation."""

    def qa(spark, sf):
        return 1

    def qb(spark, sf):
        return 2

    h1 = entry_mod.query_evidence_hash(qa, "SELECT 1")
    assert h1 == entry_mod.query_evidence_hash(qa, "SELECT 1")
    assert h1 != entry_mod.query_evidence_hash(qb, "SELECT 1")
    assert h1 != entry_mod.query_evidence_hash(qa, "SELECT 1 ")
    # rows-only queries (no oracle) hash the wrapper alone
    assert entry_mod.query_evidence_hash(qa, None) == entry_mod.query_evidence_hash(
        qa, ""
    )


def test_banked_hashes_loader_tolerates_junk(tmp_path):
    (tmp_path / entry_mod.EVIDENCE_HASH_FILE).write_text(
        '{"a": {"round": 8, "hash": "h1"}, "b": "junk", "c": {"round": 8}}'
    )
    assert entry_mod._banked_evidence_hashes(str(tmp_path)) == {"a": "h1"}
    assert entry_mod._banked_evidence_hashes(str(tmp_path / "missing")) == {}


def test_banked_hashes_match_head_at_round_start():
    """Freeze audit: every hash banked in EVIDENCE_HASHES.json must match
    the current source once the round's ext edits have been re-banked or
    fronted. Queries whose hash drifts mid-round are exactly the ones the
    rotation fronts — so this asserts consistency of the two views, not
    zero drift: any banked-vs-current mismatch must appear in tier 1."""
    import os

    import __spark_entry__ as e

    repo = os.path.dirname(os.path.abspath(e.__file__))
    banked = entry_mod._banked_evidence_hashes(repo)
    if not banked:
        return
    q = e.queries()
    current = entry_mod._current_evidence_hashes(q, e.oracle_sql())
    last = entry_mod._last_green_round()
    names = list(q)
    changed = entry_mod._tier1_changed(
        names, last, queries_by_name=q, current_hashes=current
    )
    drifted = {
        n
        for n, h in banked.items()
        # names absent from last are tier 0 (latest driver row failed) —
        # fronted even harder than tier 1, so exempt from this check
        if n in current and current[n] != h and n in last
    }
    assert drifted <= changed, sorted(drifted - changed)


def test_bank_covers_every_latest_green_query():
    """VERDICT r9 #1: the bank must hold an entry for EVERY query whose
    latest driver row is green — not just the latest window — so no
    query can lack a hash baseline. (The r5–r7 tail previously had none,
    and registry-inlined wrappers then escaped BOTH rotation signals.)

    VERDICT r10 #1 / ADVICE r10: scope the assertion to the bank's own
    round watermark. A query whose FIRST green row lands in the current
    round's CORRECTNESS file cannot be banked until the next round's
    bank run (the driver writes the file AFTER the final commit), so
    names greener than every banked entry are exempt — the test stays a
    tripwire for genuinely unbanked STALE queries without going red at
    every round boundary that adds queries."""
    import json
    import os

    import __spark_entry__ as e

    repo = os.path.dirname(os.path.abspath(e.__file__))
    banked = entry_mod._banked_evidence_hashes(repo)
    if not banked:
        return  # fresh clone before any banking — nothing to pin
    try:
        raw = json.loads(
            open(os.path.join(repo, entry_mod.EVIDENCE_HASH_FILE)).read()
        )
        watermark = max(
            v.get("round", 0) for v in raw.values() if isinstance(v, dict)
        )
    except (OSError, ValueError):
        watermark = 0
    last = entry_mod._last_green_round()
    current = entry_mod._current_evidence_hashes(e.queries(), e.oracle_sql())
    unbanked = {
        n
        for n in last
        if n in current and n not in banked and last[n] <= watermark
    }
    assert unbanked == set(), sorted(unbanked)


def test_bank_watermark_exempts_only_newer_rounds(tmp_path):
    """The boundary guard above must exempt a query first-green in round
    N+1 against a bank whose newest entry is round N — and must still
    flag a round-≤N green query that is missing from the bank."""
    import __spark_entry__ as e

    (tmp_path / e.EVIDENCE_HASH_FILE).write_text(
        '{"old_q": {"round": 9, "hash": "h1"}}'
    )
    banked = entry_mod._banked_evidence_hashes(str(tmp_path))
    assert banked == {"old_q": "h1"}
    last = {"old_q": 9, "brand_new_q": 10, "stale_missing_q": 8}
    watermark = 9
    unbanked = {
        n for n in last if n not in banked and last[n] <= watermark
    }
    assert unbanked == {"stale_missing_q"}  # newcomer exempt, stale flagged


def test_editing_registry_inlined_wrapper_refronts_exactly_it():
    """VERDICT r9 #1 done-criterion: a registry-INLINED wrapper (dep-set
    has no engine module beyond shared glue, e.g. XD-exact-census) is
    invisible to the git file signal (registry.py excluded) — after the
    backfill, a source edit to it must re-front exactly that query via
    the hash signal."""
    import os

    import __spark_entry__ as e

    repo = os.path.dirname(os.path.abspath(e.__file__))
    banked = entry_mod._banked_evidence_hashes(repo)
    if "XD-exact-census" not in banked:
        return  # bank not yet backfilled in this tree
    q = e.queries()
    names = list(q)
    last = entry_mod._last_green_round()
    current = dict(entry_mod._current_evidence_hashes(q, e.oracle_sql()))
    # use the bank as if freshly written at HEAD: baseline = current, so
    # only the simulated edit below can produce a mismatch. The git FILE
    # signal is neutralized (empty dep sets): mid-round, shared glue like
    # sources/tables.py legitimately carries commits newer than the last
    # bank, which would front wide swaths of the matrix through the OTHER
    # signal and mask exactly the hash-signal behavior under test (r15:
    # the input-parallelize commit to tables.py did precisely that).
    no_deps = {n: () for n in names}
    baseline = dict(current)
    before = entry_mod._tier1_changed(
        names, last, queries_by_name=q, dep_files=no_deps,
        banked_hashes=baseline, current_hashes=current,
    )
    edited = dict(current)
    edited["XD-exact-census"] = "0" * 64  # the wrapper was edited
    after = entry_mod._tier1_changed(
        names, last, queries_by_name=q, dep_files=no_deps,
        banked_hashes=baseline, current_hashes=edited,
    )
    assert after - before == {"XD-exact-census"}
