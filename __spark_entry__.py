"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (QA1-topk — the reference's podping
counts endpoint, plugs/podping/podping.py:19-26) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full canonical matrix (FIXTURES.md §2) plus
extension operators from haf_plug_play_spark.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import subprocess
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES, ORACLE_SQL

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CANONICAL_QUERIES["QA1-topk"](spark, SF0001_DIR)


# The driver's correctness gate checks the FIRST 50 declared queries, so
# declaration order is an evidence-rotation policy. The standing rule
# (adopted round 6, per the round-5 adjudication): the window belongs to
# the queries with the WEAKEST driver evidence —
#
#   tier 0: never driver-checked (no green CORRECTNESS row in any round),
#           and any query whose MOST RECENT driver row failed;
#   tier 1: implementation changed since the query's last driver row
#           ("changed since last checked" counts as unchecked). TWO
#           signals, OR-ed (round 9; closes the registry.py oracle hole
#           VERDICT r8 flagged):
#           (a) GIT file signal (round 7): a query is tier 1 iff any of
#           its defining module files has a commit AFTER the commit that
#           banked its last green CORRECTNESS row. Defining modules come
#           from introspecting each query callable (its own module plus
#           every engine module/function it references), so the mapping
#           maintains itself; entries retire the moment a fresh row
#           lands, because the row's bank commit then postdates the
#           change. ext/registry.py is deliberately EXCLUDED from this
#           signal: it is the wrapper+oracle glue shared by ~100
#           queries, so a file-level signal over it would front-load
#           everything every round.
#           (b) CONTENT-HASH signal (round 9): sha256 over the wrapper
#           function's source + the RESOLVED oracle-SQL string, banked
#           per query in EVIDENCE_HASHES.json by scripts/bank_evidence.py
#           at round start (when HEAD is exactly the tree the previous
#           driver run tested). A mismatch fronts exactly that query —
#           so an oracle-only edit inside registry.py, or an edit to a
#           shared SQL builder that registry merely calls, invalidates
#           precisely the queries whose oracle text actually changed.
#           Within tier 1 the order is STALEST FIRST (ascending
#           last-green round): if tier 1 ever exceeds the 50-slot
#           window, the spillover lands on the queries with the
#           freshest — hence least-at-risk — driver evidence.
#   tier 2: everything else, STALEST FIRST (ascending last-green round).
#
# The ordering is computed from the banked CORRECTNESS_r*.json files +
# git history at import time, so each round's results rotate the next
# round's window automatically with no hand-maintained list. Every query
# — front or back — passes the identical DuckDB-oracle comparison in
# pytest every round (tests/test_canonical.py, test_advanced.py,
# test_ext.py).

_EXCLUDED_DEP_FILES = ("haf_plug_play_spark/ext/registry.py",)

EVIDENCE_HASH_FILE = "EVIDENCE_HASHES.json"


def query_evidence_hash(fn: Callable, oracle: str | None) -> str | None:
    """Per-query evidence fingerprint: sha256 over the wrapper function's
    source text + the RESOLVED oracle-SQL string (empty for rows-only
    queries). Hashing the resolved SQL — not the builder's source —
    means an edit anywhere in the oracle-generation chain (registry.py
    literals, shared SQL builders like hll_sql) changes exactly the
    hashes of the queries whose oracle text actually changed. Returns
    None when the wrapper's source is unavailable (builtin/exec'd), in
    which case no hash is banked and only the git file signal applies."""
    import hashlib

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return None
    payload = src + "\x00" + (oracle or "")
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def _current_evidence_hashes(
    queries_by_name: dict[str, Callable], oracles: dict[str, str]
) -> dict[str, str]:
    out: dict[str, str] = {}
    for name, fn in queries_by_name.items():
        h = query_evidence_hash(fn, oracles.get(name))
        if h is not None:
            out[name] = h
    return out


def _banked_evidence_hashes(here: str | None = None) -> dict[str, str]:
    """query id → hash banked at the round start following that query's
    last green driver row (scripts/bank_evidence.py). Missing file or
    malformed entries mean "no information" — never tier 1 on their own."""
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, EVIDENCE_HASH_FILE), encoding="utf-8") as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    if not isinstance(data, dict):
        return {}
    return {
        name: row["hash"]
        for name, row in data.items()
        if isinstance(row, dict) and isinstance(row.get("hash"), str)
    }

_ENGINE_MODULE_INDEX: dict[str, str] | None = None


def _engine_module_index() -> dict[str, str]:
    """Last path component → full dotted name for every module under
    haf_plug_play_spark, discovered from the package's file tree (no
    imports executed) — so a function-local import's plain co_name
    resolves even when its module was never loaded (the tier-1 false
    negative ADVICE r7 flagged). First name wins on the (currently
    nonexistent) duplicate-basename case; cached per process."""
    global _ENGINE_MODULE_INDEX
    if _ENGINE_MODULE_INDEX is None:
        import pkgutil

        import haf_plug_play_spark as pkg

        idx: dict[str, str] = {}
        for mi in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            idx.setdefault(mi.name.rsplit(".", 1)[-1], mi.name)
        _ENGINE_MODULE_INDEX = idx
    return _ENGINE_MODULE_INDEX


def _git_last_change_ts(path: str, repo: str) -> int | None:
    """Committer timestamp of the last commit touching ``path`` (None if
    git is unavailable, the file is untracked, or anything else fails —
    the rotation then simply runs without tier-1 information)."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=30,
        )
        return int(out.stdout.strip()) if out.returncode == 0 and out.stdout.strip() else None
    except (OSError, ValueError, subprocess.SubprocessError):
        return None


def _query_dep_files(
    queries_by_name: dict[str, Callable], repo: str
) -> dict[str, tuple[str, ...]]:
    """query id → repo-relative files whose commits invalidate its banked
    evidence: the callable's own module plus every haf_plug_play_spark
    module or function its code references (via co_names against module
    globals) — mechanical, so a new operator wires itself in."""
    deps: dict[str, tuple[str, ...]] = {}
    for name, fn in queries_by_name.items():
        files: set[str] = set()
        try:
            fmod = sys.modules.get(fn.__module__)
            if fmod is not None and hasattr(fmod, "__file__"):
                files.add(fmod.__file__)
            for co_name in fn.__code__.co_names:
                obj = getattr(fmod, co_name, None) if fmod else None
                if inspect.ismodule(obj) and obj.__name__.startswith(
                    "haf_plug_play_spark"
                ):
                    files.add(obj.__file__)
                elif inspect.isfunction(obj) and getattr(
                    obj, "__module__", ""
                ).startswith("haf_plug_play_spark"):
                    m = sys.modules.get(obj.__module__)
                    if m is not None and hasattr(m, "__file__"):
                        files.add(m.__file__)
                elif obj is None:
                    # function-LOCAL imports (`from ...ext import
                    # classify`) never land in module globals, but
                    # IMPORT_FROM records the plain name in co_names —
                    # resolve it against the package's FILE TREE by
                    # last path component, import-free, so a module not
                    # yet loaded still counts (conservative: a stray
                    # attribute name matching a module adds an extra
                    # dep, never loses one). ABSOLUTE function-local
                    # imports (`from haf_plug_play_spark.a.b import
                    # fn`) put the FULL dotted path in co_names, which
                    # the bare-name index never matches — resolve those
                    # directly (closes the r10 blind spot that hid
                    # streaming/*, operators/*, ext/sketch.py deps for
                    # 8 queries).
                    if co_name.startswith("haf_plug_play_spark."):
                        full = co_name
                    else:
                        full = _engine_module_index().get(co_name)
                    if full is not None:
                        m = sys.modules.get(full)
                        if m is not None and hasattr(m, "__file__"):
                            files.add(m.__file__)
                        else:
                            import importlib.util

                            try:
                                spec = importlib.util.find_spec(full)
                            except (ImportError, ValueError):
                                spec = None
                            if spec is not None and spec.origin:
                                files.add(spec.origin)
            rel = {
                os.path.relpath(p, repo)
                for p in files
                if p and p.startswith(repo)
            }
            deps[name] = tuple(
                sorted(r for r in rel if r not in _EXCLUDED_DEP_FILES)
            )
        except (AttributeError, TypeError, OSError):
            deps[name] = ()
    return deps


def _tier1_changed(
    names: list[str],
    last: dict[str, int],
    queries_by_name: dict[str, Callable] | None = None,
    repo: str | None = None,
    file_ts: dict[str, int | None] | None = None,
    row_ts: dict[int, int | None] | None = None,
    dep_files: dict[str, tuple[str, ...]] | None = None,
    banked_hashes: dict[str, str] | None = None,
    current_hashes: dict[str, str] | None = None,
) -> set[str]:
    """Queries whose defining modules changed after the commit that
    banked their last green driver row (git file signal), OR whose
    wrapper+oracle content hash no longer matches the banked one
    (content-hash signal — catches registry.py oracle edits the file
    signal deliberately excludes). ``file_ts``/``row_ts``/``dep_files``/
    ``banked_hashes``/``current_hashes`` are injectable for tests; by
    default they come from git + introspection + EVIDENCE_HASHES.json.
    Missing information on either side of either signal means "no
    information" → not tier 1 (tier 2 staleness still rotates it in)."""
    if repo is None:
        repo = os.path.dirname(os.path.abspath(__file__))
    if dep_files is None:
        dep_files = _query_dep_files(queries_by_name or {}, repo)
    if banked_hashes is None and current_hashes is not None:
        # only load the bank when the hash signal can actually fire
        banked_hashes = _banked_evidence_hashes(repo)
    banked_hashes = banked_hashes or {}
    if row_ts is None:
        rounds = {rnd for rnd in last.values()}
        row_ts = {
            rnd: _git_last_change_ts(f"CORRECTNESS_r{rnd:02d}.json", repo)
            for rnd in rounds
        }
    if file_ts is None:
        all_files = {f for fs in dep_files.values() for f in fs}
        file_ts = {f: _git_last_change_ts(f, repo) for f in all_files}
    changed: set[str] = set()
    for name in names:
        rnd = last.get(name)
        if rnd is None:
            continue  # tier 0 already
        if current_hashes is not None:
            bh = banked_hashes.get(name)
            ch = current_hashes.get(name)
            if bh is not None and ch is not None and bh != ch:
                changed.add(name)
                continue
        banked = row_ts.get(rnd)
        if banked is None:
            continue
        for f in dep_files.get(name, ()):
            ts = file_ts.get(f)
            if ts is not None and ts > banked:
                changed.add(name)
                break
    return changed


def row_is_green(row) -> bool:
    """THE pass predicate for a driver CORRECTNESS row, shared with
    scripts/bank_evidence.py so the banker and the rotation can never
    disagree on what counts as verified: no field explicitly failed
    (rows-only checks carry no hash_match; None/missing is not a
    failure) and no error."""
    return (
        isinstance(row, dict)
        and row.get("err") is None
        and not any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )
    )


def _last_green_round(here: str | None = None) -> dict[str, int]:
    """query id → most recent round with a passing driver CORRECTNESS row.
    A row passes when no field explicitly failed (rows-only checks carry
    no hash_match; None/missing is not a failure). A query whose latest
    row FAILED is dropped from the map entirely, landing it in tier 0.
    ``here`` (tests only) overrides the directory scanned for
    CORRECTNESS_r*.json files."""
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row_is_green(row)
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, ok)
    # failed latest row → excluded → tier 0 (an earlier green alone does
    # not bank evidence for the current implementation)
    return {name: rnd for name, (rnd, ok) in latest.items() if ok}


def _evidence_order(
    names: list[str],
    last: dict[str, int] | None = None,
    changed: set[str] | None = None,
    queries_by_name: dict[str, Callable] | None = None,
    oracles: dict[str, str] | None = None,
) -> list[str]:
    if last is None:
        last = _last_green_round()
    if changed is None:
        current = (
            _current_evidence_hashes(queries_by_name, oracles)
            if queries_by_name is not None and oracles is not None
            else None
        )
        changed = _tier1_changed(
            names, last, queries_by_name, current_hashes=current
        )

    def prio(pair: tuple[int, str]) -> tuple[int, int, int]:
        i, name = pair
        if name not in last:
            return (0, 0, i)
        if name in changed:
            # stalest first within tier 1: window spillover, if any,
            # falls on the freshest (least-at-risk) banked evidence
            return (1, last[name], i)
        return (2, last[name], i)

    return [name for _, name in sorted(enumerate(names), key=prio)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered by
    driver-evidence age (see the rotation rule above)."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(CANONICAL_QUERIES)
    try:
        from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES

        q.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    try:
        from haf_plug_play_spark.ext.registry import EXT_QUERIES

        q.update(EXT_QUERIES)
    except ImportError:
        pass
    return {
        name: q[name]
        for name in _evidence_order(list(q), queries_by_name=q, oracles=oracle_sql())
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    o: dict[str, str] = {}
    o.update(ORACLE_SQL)
    try:
        from haf_plug_play_spark.queries.advanced import ADVANCED_ORACLE_SQL

        o.update(ADVANCED_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from haf_plug_play_spark.ext.registry import EXT_ORACLE_SQL

        o.update(EXT_ORACLE_SQL)
    except ImportError:
        pass
    return o
