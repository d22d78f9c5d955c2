#!/usr/bin/env python3
"""Bank per-query evidence hashes for the rotation's content-hash signal.

Run at ROUND START, before any code edits — at that moment HEAD is exactly
the tree the previous round's driver tested (the driver commits the
end-of-round snapshot, runs correctness against it, then commits only
verdict/bench/correctness files). For EVERY query whose latest driver row
across the union of CORRECTNESS_r*.json files is green (VERDICT r9 #1 —
not just the latest window: the window-only bank left ~40 r5–r7 queries
with no hash baseline, and for registry-inlined wrappers that was a blind
spot in BOTH rotation signals), this records
``sha256(wrapper source + resolved oracle SQL)`` into EVIDENCE_HASHES.json.
Banking the HEAD hash for a query last driver-checked rounds ago is sound
because pytest at HEAD re-proves every query against the identical DuckDB
oracle each round — the HEAD hash is a valid baseline for detecting FUTURE
change. An existing entry is only overwritten when the query has a green
row in a NEWER round than the one banked, so a mid-round re-run can never
erase a pending hash-mismatch signal.
``__spark_entry__._tier1_changed`` then fronts any query whose current hash
differs from its banked one — so an oracle-only edit (e.g. a literal in
ext/registry.py, which the git file signal deliberately excludes)
invalidates exactly the queries whose oracle text changed.

Usage: python scripts/bank_evidence.py [--check]
  --check  exit 1 if any banked hash mismatches the current source
           (useful as an end-of-round freeze audit); never writes.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry  # noqa: E402


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

    last_green = entry._last_green_round(HERE)
    if not last_green:
        print("no green CORRECTNESS rows found; nothing to bank")
        return 0
    updated = 0
    for name, rnd in last_green.items():
        if name not in current:
            continue  # wrapper source unavailable — git file signal only
        prior = banked.get(name)
        if isinstance(prior, dict) and prior.get("round", -1) >= rnd:
            # never overwrite same-or-newer-round entries: a mid-round
            # re-run must not erase a pending hash-mismatch signal
            continue
        banked[name] = {"round": rnd, "hash": current[name]}
        updated += 1
    with open(bank_path, "w", encoding="utf-8") as f:
        json.dump(banked, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"banked {updated} hashes (union of latest-green rows; "
        f"{len(banked)} total in {entry.EVIDENCE_HASH_FILE})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
