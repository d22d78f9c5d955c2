#!/usr/bin/env python3
"""Print the driver's upcoming 50-query correctness window composition.

The rotation (__spark_entry__._evidence_order) is computed from banked
CORRECTNESS_r*.json + git + EVIDENCE_HASHES.json at import time; VERDICT
r11 #2's lesson is that window INTENTIONS don't survive contact with a
round's edits, so this makes the check mechanical: run it before the
driver does, read off exactly which queries will be re-verified and which
stale evidence spills past the window.

Usage: python scripts/check_window.py [--expect-max-round N]
  --expect-max-round N  exit 1 if any query OUTSIDE the window has
                        last-green evidence older than round N (the
                        "no query older than rN" done-criterion).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry  # noqa: E402

WINDOW = 50


def main() -> int:
    expect_max = None
    if "--expect-max-round" in sys.argv:
        i = sys.argv.index("--expect-max-round")
        expect_max = int(sys.argv[i + 1])

    names = list(entry.queries())
    last = entry._last_green_round()
    win, tail = names[:WINDOW], names[WINDOW:]

    tier0 = [n for n in win if n not in last]
    print(f"declared: {len(names)}  window: {len(win)}")
    print(f"tier 0 (never green / last row failed): {sorted(tier0)}")
    print(
        "window last-green histogram:",
        dict(sorted(Counter(last.get(n, 0) for n in win).items())),
    )
    print(
        "tail   last-green histogram:",
        dict(sorted(Counter(last.get(n, 0) for n in tail).items())),
    )
    oldest_tail = min((last.get(n, 0) for n in tail), default=0)
    stalest = sorted(n for n in tail if last.get(n, 0) == oldest_tail)
    print(f"stalest evidence OUTSIDE the window: r{oldest_tail} × "
          f"{len(stalest)}: {stalest}")

    if expect_max is not None and oldest_tail < expect_max:
        print(f"FAIL: tail has queries older than r{expect_max}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
