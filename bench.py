"""Benchmark runner: executes the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line
with per-query wall-clock seconds.

Each query is timed end-to-end (plan + execute + collect) after a shared
session warm-up, mirroring how the reference serves each API request as an
independent query (server/plug_endpoints/podping.py:13-37).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def run_queries(
    spark,
    queries,
    sf_dir: str,
    repeat_under: float = 2.0,
    n_runs: int = 3,
    heavy_runs: int = 2,
) -> tuple[dict, dict, dict]:
    """Time each query independently. Fault isolation: one raising query
    must never zero the whole round's perf signal (the r2 failure mode) —
    the reference serves each API request as an independent query too
    (server/plug_endpoints/podping.py:13-37). Errors are recorded per-query
    as class + first message line, and the JSON line always prints.

    MIN-OF-N for micro-queries: on a contended box the per-run spread
    (measured 15-40% across driver rounds) exceeds the signal of queries
    whose single run is under ``repeat_under`` seconds, manufacturing
    phantom regressions. Those re-run up to ``n_runs`` times and report
    the MINIMUM — the standard noise floor estimator; min (not mean)
    because scheduling noise is strictly additive.

    MIN-OF-``heavy_runs`` for the heavy tail (VERDICT r8 #5): queries at
    or above the threshold were single-shot through r8, which left their
    round-over-round deltas inside the documented ±17-20% single-shot
    envelope — a real 30% plan regression was indistinguishable from
    noise (r8's apparent XS-pq 1.46×). One extra run halves the tail's
    noise at ~+60 s suite cost; ``heavy_runs=1`` restores single-shot
    (the whole-suite noise-floor passes use it via repeat_under=0).

    Returns (timings, first_run, errors): ``first_run`` is every query's
    FIRST-run wall clock — identical to the r1–r5 single-shot methodology
    — reported alongside the min-of-N ``timings`` so round-over-round
    headline comparisons across the methodology change stay
    apples-to-apples (ADVICE r6)."""
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    errors: dict[str, str] = {}

    # Between-query block-manager sweep (r16, guide §5): checkpointed
    # intermediates linger until the weak-ref ContextCleaner runs, taxing
    # every LATER query with dead blocks (measured: warm 20-heavy-query
    # block 37.7 s with leftovers vs 35.6 swept; the following canonical
    # pass 7.59 vs 6.90 s). The sweep runs OUTSIDE the timed region and
    # releases only garbage — each timed run builds fresh RDDs from the
    # parquet inputs, so nothing released is ever reusable (no caching
    # across runs, same as before).
    try:
        from haf_plug_play_spark.ext.materialize import release_scratch
    except ImportError:  # extension layer absent: nothing persists
        def release_scratch(_spark):
            return 0

    def one_run(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.toPandas()  # Arrow-batched materialization (2-3x py4j collect)
        return time.perf_counter() - t0

    for name in sorted(queries):
        fn = queries[name]
        release_scratch(spark)
        try:
            t = one_run(fn)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            print(f"bench query {name} failed: {errors[name]}", file=sys.stderr)
            continue
        # BANK the successful first run before attempting repeats: a
        # transient failure on a re-run must degrade to the single-shot
        # timing, never discard a valid measurement into the error path
        # (which would null the canonical headline — the r2 failure mode)
        first_run[name] = round(t, 4)
        extra = (n_runs if t < repeat_under else heavy_runs) - 1
        for _ in range(extra):
            release_scratch(spark)
            try:
                t = min(t, one_run(fn))
            except Exception as exc:
                print(
                    f"bench query {name} re-run failed "
                    f"({type(exc).__name__}); keeping best of completed "
                    "runs",
                    file=sys.stderr,
                )
                break
        timings[name] = round(t, 4)
    return timings, first_run, errors


def canonical_headline(
    timings: dict, errors: dict, canonical_names
) -> tuple[float | None, bool]:
    """(headline_value, incomplete). If ANY canonical query errored, the
    partial sum would be an incomparably smaller number under the same
    metric name (readable as a fake speedup) — report None + a flag."""
    incomplete = any(q in errors for q in canonical_names)
    if incomplete:
        return None, True
    return round(sum(timings[q] for q in canonical_names if q in timings), 4), False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from haf_plug_play_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("haf_plug_play_spark_bench")
    queries = entry_mod.queries()

    # Warm up the JVM once — parquet reader, codegen, shuffle, and the Arrow
    # collect path — so per-query times measure the queries, not bootstrap
    # (the flagship run here is excluded from all timings).
    from haf_plug_play_spark.queries.canonical import qa1_topk

    spark.range(1).collect()
    qa1_topk(spark, sf_dir).toPandas()
    # Streaming machinery (state-store providers, stream-stream join
    # codegen) is a one-time JVM bootstrap ~5 s that would otherwise land
    # entirely on whichever streaming query runs first — warm it the same
    # way as the batch path so per-query times measure the queries.
    try:
        from haf_plug_play_spark.queries.advanced import qsj_stream_join

        qsj_stream_join(spark, sf_dir).toPandas()
    except Exception:
        pass

    from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES

    # Sync-path throughput: backfill the podping plug over a generated op
    # log and report blocks/sec — comparable against the reference's
    # operational constants (1 block / 3 s live cadence, 100-block chunks;
    # BASELINE.md §A). Runs FIRST, right after warm-up (VERDICT r8 #6):
    # through r8 it ran after the full 137-query sweep, where accumulated
    # JVM/GC/page-cache state made its reading suite-order-sensitive — the
    # r8 idle-box band (295-327 blocks/s, measured post-suite) missed the
    # driver's 385.2 (measured in a fresh process). First-position puts
    # both measurements in the same process state.
    # Two legs (VERDICT r14 what's-wrong #1): the first carries the plug
    # write path's cold start (JIT, codegen, committer init) and is what
    # the 290 blocks/s floor has historically been applied to; the second
    # leg re-runs the identical backfill into a fresh output tree in the
    # now-warm process and measures steady-state throughput — the number
    # that actually models a long-running sync. Reporting both lets the
    # floor test throughput instead of box temperature.
    sync_blocks_per_sec = None
    sync_blocks_per_sec_warm = None
    import shutil
    import tempfile

    try:
        from haf_plug_play_spark import fixtures
        from haf_plug_play_spark.plugs import PLUGS
        from haf_plug_play_spark.runner.batch import PlugRunner

        for leg in ("cold", "warm"):
            work = tempfile.mkdtemp(prefix=f"bench_sync_{leg}_")
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
                rate = round((hi - lo + 1) / (time.perf_counter() - t0), 1)
                if leg == "cold":
                    sync_blocks_per_sec = rate
                else:
                    sync_blocks_per_sec_warm = rate
            finally:
                shutil.rmtree(work, ignore_errors=True)
    except Exception as exc:  # probe must never break the bench contract
        print(f"sync throughput probe failed: {exc!r}", file=sys.stderr)

    timings, first_run, errors = run_queries(spark, queries, sf_dir)

    # Headline metric = the canonical §2 matrix (BASELINE.md's bench query
    # set); advanced/extension timings are reported alongside.
    canonical_total, canonical_incomplete = canonical_headline(
        timings, errors, CANONICAL_QUERIES
    )
    # first-run (single-shot, r1–r5 methodology) headline alongside the
    # min-of-N one, so cross-round deltas are comparable under BOTH
    # methodologies during the transition (ADVICE r6)
    canonical_first, _ = canonical_headline(first_run, errors, CANONICAL_QUERIES)
    # whole-SUITE repeats (VERDICT r7 #4): two extra single-shot passes
    # over just the canonical set give three full-suite wall clocks in one
    # bench invocation — their spread IS the run's noise floor, printed so
    # a round-over-round headline delta can be judged against same-process
    # variance instead of guessed at. ~25 s extra; headline fields above
    # keep their existing definitions.
    canonical_suite_runs = [canonical_first] if canonical_first is not None else []
    for _ in range(2):
        t_pass, _f, e_pass = run_queries(
            spark,
            {q: queries[q] for q in CANONICAL_QUERIES if q in queries},
            sf_dir,
            repeat_under=0.0,  # single shot per query within the pass
            heavy_runs=1,
        )
        s_pass, inc = canonical_headline(t_pass, e_pass, CANONICAL_QUERIES)
        if not inc and s_pass is not None:
            canonical_suite_runs.append(s_pass)
    # Key order is tail-truncation-survivable BY DESIGN: the driver captures
    # only the tail of stdout, and with 111 queries the one-line JSON exceeds
    # that capture (BENCH_r04 parsed:null). The bulky per-query dict therefore
    # serializes FIRST and the headline keys LAST, and a second compact
    # headline-only JSON line (no per-query dict, always fits) prints after
    # the full line so a last-line/tail parser always finds a complete object.
    headline = {
        "metric": "canonical_query_suite_wall_clock",
        "value": canonical_total,
        "unit": "sec",
        "sf": sf,
        "all_queries_sec": round(sum(timings.values()), 4),
        "value_first_run": canonical_first,
        "all_queries_first_run_sec": round(sum(first_run.values()), 4),
        "canonical_suite_runs": canonical_suite_runs,
        "sync_blocks_per_sec": sync_blocks_per_sec,
        "sync_blocks_per_sec_warm": sync_blocks_per_sec_warm,
        # self-describing estimator (VERDICT r9 #5): `value` is min-of-3
        # for sub-2s queries / min-of-2 for the heavy tail; `value_first_run`
        # is the r1–r5 single-shot series. Cross-round comparisons must key
        # on this field so a methodology change can never silently read as
        # a perf delta (the r8→r9 headline mixed estimators).
        "value_methodology": "min3-micro/min2-heavy",
        "value_first_run_methodology": "single-shot",
    }
    if canonical_incomplete:
        headline["canonical_incomplete"] = True
    result = {"queries": timings, "queries_first_run": first_run}
    if errors:
        result["errors"] = errors
    result.update(headline)
    print(json.dumps(result))
    print(json.dumps(headline | {"n_queries": len(timings), "n_errors": len(errors)}))


if __name__ == "__main__":
    main()
