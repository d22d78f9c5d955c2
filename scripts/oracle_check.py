"""Self-serve oracle check: run declared queries against their DuckDB
oracle at a given SF, with the tests' canonicalization (tests/compare.py).

    python scripts/oracle_check.py XT-trigram-lm XK-hll --sf /root/testdata/sf0.1
    python scripts/oracle_check.py --all          # every oracled query

Exit 0 = all match. Used to prove result-identity after optimization
restructures (r15 rule: the driver re-hashes every query next round).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    from haf_plug_play_spark.session import get_spark
    from haf_plug_play_spark.sources.tables import TABLES
    from tests.compare import assert_matches

    import __spark_entry__ as entry_mod

    spark = get_spark("oracle_check")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(args.sf, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    names = sorted(oracles) if args.all else args.names
    failed = []
    for qid in names:
        if qid not in oracles:
            print(f"{qid}: no oracle (rows-only query), skipped", flush=True)
            continue
        try:
            assert_matches(
                queries[qid](spark, args.sf), con, oracles[qid], qid,
                strict_types=True,
            )
            print(f"{qid}: OK", flush=True)
        except AssertionError as exc:
            failed.append(qid)
            print(f"{qid}: FAIL {str(exc)[:300]}", flush=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
