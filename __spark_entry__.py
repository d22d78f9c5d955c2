"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (QA1-topk — the reference's podping
counts endpoint, plugs/podping/podping.py:19-26) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full canonical matrix (FIXTURES.md §2) plus
extension operators from haf_plug_play_spark.
"""

from __future__ import annotations

import glob
import json
import os
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
#   tier 1: implementation or oracle SQL changed since the query's last
#           driver row ("changed since last checked" counts as unchecked —
#           maintained by hand in _CHANGED_SINCE_LAST_ROW each round);
#   tier 2: everything else, STALEST FIRST (ascending last-green round).
#
# The ordering is computed from the banked CORRECTNESS_r*.json files at
# import time, so each round's results rotate the next round's window
# automatically instead of via a hand-grown list. Every query — front or
# back — passes the identical DuckDB-oracle comparison in pytest every
# round (tests/test_canonical.py, test_advanced.py, test_ext.py).
# query id → round whose code changes postdate the query's banked driver
# rows. Tier 1 applies only while the query's last green row is <= that
# round, so entries RETIRE THEMSELVES once a fresh row lands — no stale
# priority list to garden next round.
_CHANGED_SINCE_LAST_ROW = {
    # r5 changes recorded after the r5 driver run: QV1-audit HALF_UP
    # rounding, XD-bloom NULL-key COALESCE, XD-sem-decontam broadcast-
    # join rework (5268b5e).
    "QV1-audit": 5,
    "XD-bloom": 5,
    "XD-sem-decontam": 5,
}


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
            ok = row.get("err") is None and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, ok)
    # failed latest row → excluded → tier 0 (an earlier green alone does
    # not bank evidence for the current implementation)
    return {name: rnd for name, (rnd, ok) in latest.items() if ok}


def _evidence_order(
    names: list[str],
    last: dict[str, int] | None = None,
    changed: dict[str, int] | None = None,
) -> list[str]:
    if last is None:
        last = _last_green_round()
    if changed is None:
        changed = _CHANGED_SINCE_LAST_ROW

    def prio(pair: tuple[int, str]) -> tuple[int, int, int]:
        i, name = pair
        if name not in last:
            return (0, 0, i)
        if last[name] <= changed.get(name, -1):
            return (1, 0, i)
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
    return {name: q[name] for name in _evidence_order(list(q))}


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
