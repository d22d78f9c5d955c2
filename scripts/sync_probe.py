#!/usr/bin/env python3
"""Standalone 3-backfill sync-throughput probe — the localization triple.

Replicates bench.py's sync section (podping backfill over a generated
10k-block op log, step=500) THREE times in one fresh session and prints
the cold-then-warm blocks/s triple. This is the measurement SCALE.md's
sync-floor escalation rule compares against (r11 A/B baseline; banked
triples r9 [220.2, 294.1, 373.5], r10 [211.0, 367.7, 383.1], r11
[248.5, 381.7, 326.9], r13 [218.0, 340.6, 391.1]) — run it at ROUND
START on an idle box so the distributions stay comparable (VERDICT r13
#6). First reading carries the plug write path's cold start by design,
exactly like the bench probe's first-position chunk.

Usage: python scripts/sync_probe.py
Prints one JSON line: {"blocks_per_sec": [cold, warm, warm], ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from haf_plug_play_spark import fixtures
    from haf_plug_play_spark.plugs import PLUGS
    from haf_plug_play_spark.runner.batch import PlugRunner
    from haf_plug_play_spark.session import get_spark

    spark = get_spark("sync_probe")
    spark.range(1).collect()  # JVM up before the cold leg starts timing
    triple: list[float] = []
    for i in range(3):
        work = tempfile.mkdtemp(prefix=f"sync_probe_{i}_")
        try:
            ops_df, trx_df = fixtures.as_dataframes(spark, 10_000, 42)
            ops_df.write.parquet(f"{work}/ops")
            trx_df.write.parquet(f"{work}/trx")
            lo = ops_df.agg({"block_num": "min"}).first()[0]
            hi = ops_df.agg({"block_num": "max"}).first()[0]
            runner = PlugRunner(
                spark,
                PLUGS["podping"],
                f"{work}/ops",
                f"{work}/trx",
                f"{work}/out",
                step=500,
            )
            t0 = time.perf_counter()
            runner.backfill(lo, hi)
            triple.append(
                round((hi - lo + 1) / (time.perf_counter() - t0), 1)
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"blocks_per_sec": triple, "blocks": 10_000, "step": 500}))


if __name__ == "__main__":
    main()
