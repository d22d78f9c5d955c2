"""Measure the heavy-tail scaling exponents (SCALE.md evidence table).

Runs haf_plug_play_spark.scalebench.measure at 1x (sf0.1-equivalent: 5000
docs / 2000 vectors) and 10x (50,000 / 20,000), prints the markdown table
for SCALE.md and one JSON line. ~5 minutes on local[32].

Usage: python scripts/scale_exponents.py [factor] [base_docs] [base_vecs]
           [--only Q1,Q2]

``--only`` restricts to a comma-separated query subset — the 100×
spot-check (VERDICT r8 #7) runs
``python scripts/scale_exponents.py 100 5000 2000 --only XD-containment,XD-cluster``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# the 10x corpus runs ~8 concurrent agg subtrees on 32 threads in ONE
# local JVM — Spark's 1g default driver heap OOMs on the trigram token
# stream; the measurement box offers 128 GiB, so default to real headroom
# (overridable, and a caller-set value always wins)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEMORY", "8g")


def main() -> None:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            print("usage: --only Q1,Q2  (comma-separated query ids)")
            sys.exit(2)
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    factor = int(args[0]) if len(args) > 0 else 10
    base_docs = int(args[1]) if len(args) > 1 else 5_000
    base_vecs = int(args[2]) if len(args) > 2 else 2_000

    from haf_plug_play_spark import scalebench
    from haf_plug_play_spark.session import get_spark

    spark = get_spark("scale_exponents")
    work = tempfile.mkdtemp(prefix="scale_exp_")
    try:
        res = scalebench.measure(
            spark, work, base_docs=base_docs, base_vecs=base_vecs,
            factor=factor, only=only,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    meta = res.pop("_meta")
    print(
        f"\n| Query | t(1x={meta['base_docs']} docs) | "
        f"t({factor}x) | rows 1x | rows {factor}x | exponent |"
    )
    print("|---|---|---|---|---|---|")
    for name in sorted(res):
        e = res[name]
        print(
            f"| {name} | {e['t_base']:.2f} s | {e['t_big']:.2f} s "
            f"| {e['rows_base']} | {e['rows_big']} | **{e['exponent']:.2f}** |"
        )
    res["_meta"] = meta
    print(json.dumps(res))


if __name__ == "__main__":
    main()
