#!/usr/bin/env python3
"""Bank per-query evidence hashes for the rotation's content-hash signal.

Run at ROUND START, before any code edits — at that moment HEAD is exactly
the tree the previous round's driver tested (the driver commits the
end-of-round snapshot, runs correctness against it, then commits only
verdict/bench/correctness files). For every query with a green row in the
LATEST CORRECTNESS_r*.json, this records
``sha256(wrapper source + resolved oracle SQL)`` into EVIDENCE_HASHES.json,
keeping prior entries for queries the latest window didn't recheck.
``__spark_entry__._tier1_changed`` then fronts any query whose current hash
differs from its banked one — so an oracle-only edit (e.g. a literal in
ext/registry.py, which the git file signal deliberately excludes)
invalidates exactly the queries whose oracle text changed.

Usage: python scripts/bank_evidence.py [--check]
  --check  exit 1 if any banked hash mismatches the current source
           (useful as an end-of-round freeze audit); never writes.
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry  # noqa: E402


def latest_correctness() -> tuple[int, dict] | None:
    """Highest ROUND NUMBER wins — parsed, not lexicographic: sorted()
    on names would rank CORRECTNESS_r99.json above r100."""
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            continue
        if best is None or rnd > best[0]:
            best = (rnd, path)
    if best is None:
        return None
    with open(best[1], encoding="utf-8") as f:
        return best[0], json.load(f)


def main() -> int:
    check_only = "--check" in sys.argv
    q = entry.queries()
    oracles = entry.oracle_sql()
    current = entry._current_evidence_hashes(q, oracles)

    bank_path = os.path.join(HERE, entry.EVIDENCE_HASH_FILE)
    banked: dict[str, dict] = {}
    if os.path.exists(bank_path):
        with open(bank_path, encoding="utf-8") as f:
            raw = json.load(f)
        if isinstance(raw, dict):  # tolerate junk like the rotation's loader
            banked = {k: v for k, v in raw.items() if isinstance(v, dict)}

    if check_only:
        # same junk tolerance as __spark_entry__._banked_evidence_hashes,
        # so the two readers of the bank can never disagree
        clean = entry._banked_evidence_hashes(HERE)
        stale = sorted(
            name
            for name, h in clean.items()
            if name in current and h != current[name]
        )
        if stale:
            print(f"STALE ({len(stale)}): {', '.join(stale)}")
            return 1
        print(f"OK: {len(clean)} banked hashes all match current source")
        return 0

    latest = latest_correctness()
    if latest is None:
        print("no CORRECTNESS_r*.json found; nothing to bank")
        return 0
    rnd, rows = latest
    updated = 0
    for name, row in rows.items():
        if entry.row_is_green(row) and name in current:
            banked[name] = {"round": rnd, "hash": current[name]}
            updated += 1
    with open(bank_path, "w", encoding="utf-8") as f:
        json.dump(banked, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"banked {updated} hashes from CORRECTNESS_r{rnd:02d} "
        f"({len(banked)} total in {entry.EVIDENCE_HASH_FILE})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
