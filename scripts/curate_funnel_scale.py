#!/usr/bin/env python3
"""End-to-end curate-funnel scale measurement (VERDICT r14 #3).

Every component of the curation funnel has a measured 10x/100x exponent
in SCALE.md, but the COMPOSED path — the single number a 100 TB
capacity plan actually uses — had never been timed as one job. This
script measures it: per scale factor it generates the scalebench dedup
corpus (the SAME generator behind the per-query exponent tables, so
rows are comparable) and wall-clocks ONE `release` CLI invocation —
read corpus → exact dedup → MinHash-LSH near-dup (Jaccard 0.6) →
quality + entropy gate columns → holdout split → sequence packing →
append_snapshot commit — end to end through cli.main, exactly as an
operator would run it.

Stage attribution is by ablation in the same process: a second release
WITHOUT --near-dup isolates the fuzzy-dedup stage (the only opt-in
stage with its own bounded jobs — LSH pairs + connected components);
a bare read-and-count isolates the scan. min_score is -100 (the
test_cli release convention): every gate FLAG column is computed for
every row regardless of threshold, so a permissive threshold maximizes
surviving rows and therefore pack/snapshot work — the conservative
upper-bound measurement.

Usage: python scripts/curate_funnel_scale.py [factor ...]
       (default: 1 10; the 100x spot-check is `... 100`)
Prints one markdown row per factor for SCALE.md plus one JSON line.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# same headroom default as scale_exponents.py: the 10x/100x corpora run
# wide agg subtrees in ONE local JVM; caller-set values always win
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "8g")

BASE_DOCS = 5_000
NEAR_DUP = 0.6


def _release(argv: list[str]) -> tuple[float, dict]:
    from haf_plug_play_spark import cli

    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(argv)
    dt = time.perf_counter() - t0
    assert rc == 0, f"release failed rc={rc}: {argv}"
    return dt, json.loads(buf.getvalue().strip().splitlines()[-1])


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]

    from haf_plug_play_spark import scalebench
    from haf_plug_play_spark.session import get_spark

    spark = get_spark("curate_funnel_scale")
    rows_out = []
    print("| Scale | input rows | release wall | rows/s | exact-only wall "
          "| near-dup share | scan-only |")
    print("|---|---|---|---|---|---|---|")
    for factor in factors:
        work = tempfile.mkdtemp(prefix=f"curate_funnel_{factor}x_")
        try:
            corpus = scalebench.make_corpus_dir(
                spark, os.path.join(work, "corpus"), "dedup",
                BASE_DOCS * factor, 10,
            )
            docs_path = os.path.join(corpus, "documents.parquet")

            t0 = time.perf_counter()
            n_rows = spark.read.parquet(docs_path).count()
            t_scan = time.perf_counter() - t0

            base = [
                "release", "--in", docs_path,
                "--min-score", "-100", "--min-entropy", "0.0",
                "--batch-id", "1",
            ]
            t_full, full = _release(
                base + ["--table", os.path.join(work, "t_full"),
                        "--near-dup", str(NEAR_DUP)]
            )
            t_exact, exact = _release(
                base + ["--table", os.path.join(work, "t_exact")]
            )
            row = {
                "factor": factor,
                "input_rows": n_rows,
                "t_release_full": round(t_full, 2),
                "rows_per_sec": round(n_rows / t_full, 1),
                "t_release_exact_only": round(t_exact, 2),
                "t_near_dup_share": round(t_full - t_exact, 2),
                "t_scan_only": round(t_scan, 2),
                "funnel_full": full["funnel"],
                "splits_full": {
                    k: v["docs"] for k, v in full["splits"].items()
                },
                "funnel_exact": exact["funnel"],
            }
            rows_out.append(row)
            print(
                f"| {factor}x ({n_rows} rows) | {n_rows} "
                f"| {t_full:.2f} s | {row['rows_per_sec']} "
                f"| {t_exact:.2f} s | {row['t_near_dup_share']:.2f} s "
                f"| {t_scan:.2f} s |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"base_docs": BASE_DOCS, "near_dup": NEAR_DUP,
                      "rows": rows_out}))


if __name__ == "__main__":
    main()
