"""Per-query micro-bench with the bench's exact methodology (guide §1):
shared warmed session, construction + toPandas() timed together, min-of-N.

    python scripts/qbench.py XT-trigram-lm XK-hll [--runs 4] [--sf DIR]

Prints one line per query: name, min, all runs. Used for same-session A/B
during optimization rounds; never invoked by the driver.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from haf_plug_play_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("qbench")
    queries = entry_mod.queries()
    # same warm-up as bench.py
    from haf_plug_play_spark.queries.canonical import qa1_topk

    spark.range(1).collect()
    qa1_topk(spark, args.sf).toPandas()

    from haf_plug_play_spark.ext.materialize import release_scratch

    for name in args.names:
        fn = queries[name]
        runs = []
        for _ in range(args.runs):
            release_scratch(spark)  # bench-identical between-run sweep
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            runs.append(round(time.perf_counter() - t0, 4))
        print(f"{name:28s} min={min(runs):7.3f}  runs={runs}", flush=True)


if __name__ == "__main__":
    main()
