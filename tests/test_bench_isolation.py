"""Bench fault isolation (the r2 failure mode): one raising query must not
destroy the other timings, and the error record carries the exception class
and message, not a truncated traceback tail."""

from __future__ import annotations

import sys


def test_one_broken_query_cannot_zero_the_bench(spark):
    sys.path.insert(0, "/root/repo")
    import bench

    def ok(spark_, sf_dir):
        return spark_.range(5).selectExpr("id AS n")

    def bomb(spark_, sf_dir):
        raise ValueError("deliberately broken query\nsecond line never recorded")

    timings, first_run, errors = bench.run_queries(
        spark, {"z-ok": ok, "a-bomb": bomb, "m-ok2": ok}, "/unused"
    )
    assert set(timings) == {"z-ok", "m-ok2"}
    assert all(t >= 0 for t in timings.values())
    # the single-shot (r1-r5 methodology) dict covers exactly the queries
    # that succeeded, and never the errored one
    assert set(first_run) == {"z-ok", "m-ok2"}
    assert all(t >= 0 for t in first_run.values())
    assert set(errors) == {"a-bomb"}
    assert errors["a-bomb"].startswith("ValueError: deliberately broken query")
    assert "second line" not in errors["a-bomb"]


def test_min_of_n_repeats_micro_queries_only(spark):
    """Sub-threshold queries re-run n_runs times (min-of-N kills the
    contended-box spread); queries at/above the threshold run
    heavy_runs times — min-of-2 by default since r9 (VERDICT r8 #5: a
    single-shot tail couldn't distinguish a real 30% regression from the
    ±20% noise envelope), with heavy_runs=1 restoring single-shot for
    the whole-suite noise-floor passes."""
    import bench

    calls = {"q": 0}

    def counted(spark_, sf_dir):
        calls["q"] += 1
        return spark_.range(3)

    # threshold below any real run time + heavy_runs=1 → single run
    timings, first_run, errors = bench.run_queries(
        spark, {"q": counted}, "/unused", repeat_under=0.0, n_runs=3,
        heavy_runs=1,
    )
    assert not errors and calls["q"] == 1 and "q" in timings
    assert first_run["q"] == timings["q"]  # single run: both dicts identical
    # heavy tail at the default → exactly heavy_runs=2 runs, min reported
    calls["q"] = 0
    timings, first_run, errors = bench.run_queries(
        spark, {"q": counted}, "/unused", repeat_under=0.0, n_runs=3
    )
    assert not errors and calls["q"] == 2 and timings["q"] >= 0
    assert timings["q"] <= first_run["q"]
    # threshold above any real run time → exactly n_runs runs, min reported
    calls["q"] = 0
    timings, first_run, errors = bench.run_queries(
        spark, {"q": counted}, "/unused", repeat_under=1e9, n_runs=3
    )
    assert not errors and calls["q"] == 3 and timings["q"] >= 0
    # min-of-N can only improve on (never exceed) the first-run timing
    assert timings["q"] <= first_run["q"]


def test_headline_nulled_when_canonical_query_errors():
    """A partial canonical sum under the full metric name reads as a fake
    speedup — the headline must go None + canonical_incomplete instead."""
    import bench

    canonical = ["q1", "q2"]
    v, inc = bench.canonical_headline({"q1": 1.0, "x": 9.0}, {"q2": "Boom"}, canonical)
    assert v is None and inc is True
    # extension-query errors do NOT null the canonical headline
    v, inc = bench.canonical_headline(
        {"q1": 1.0, "q2": 2.5}, {"x-ext": "Boom"}, canonical
    )
    assert v == 3.5 and inc is False
