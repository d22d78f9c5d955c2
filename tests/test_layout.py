"""Z-order layout operator: interleave correctness against a Python bit
reference, the range-partition + local-sort layout contract, and the
actual payoff — parquet file min/max stats that prune on EVERY clustered
dimension."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from haf_plug_play_spark.operators.layout import cluster_by_zorder, zorder_key


def _morton_ref(vals: list[int], bits: int) -> int:
    n = len(vals)
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= (((v & ((1 << bits) - 1)) >> b) & 1) << (b * n + i)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 20),
            st.integers(min_value=0, max_value=1 << 20),
        ),
        min_size=1,
        max_size=30,
    ),
    bits=st.sampled_from([4, 8, 16]),
)
def test_zorder_key_matches_python_reference(spark, pairs, bits):
    df = spark.createDataFrame(pairs, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits).alias("z")
        ).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == _morton_ref([x, y], bits)


def test_cluster_by_zorder_partitions_are_range_disjoint(spark):
    """After the layout, partitions cover non-overlapping Z-key ranges and
    rows inside each are Z-sorted — the precondition for min/max
    skipping."""
    base = spark.range(5000).select(
        (F.col("id") % 71).alias("a"), (F.col("id") % 113).alias("b")
    )
    out = cluster_by_zorder(base, ["a", "b"], num_partitions=8)
    # the key is a pure function of (a, b): recompute it post-layout
    zk = zorder_key([F.col("a"), F.col("b")], 16)
    parts = (
        out.select(F.spark_partition_id().alias("p"), zk.alias("z"))
        .groupBy("p")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(parts) > 1
    for prev, cur in zip(parts, parts[1:]):
        assert prev.hi <= cur.lo  # contiguous, non-overlapping ranges


def test_cluster_by_zorder_files_prune_both_dimensions(spark):
    """The point of the layout: written as parquet, each file spans a
    NARROW range of every clustered column, so min/max zone maps prune
    filters on either dimension. A single-column sort would leave the
    other dimension's per-file span at full width."""
    pq = pytest.importorskip("pyarrow.parquet")
    n, dims = 20_000, 128  # a and b each uniform in [0, 128)
    base = spark.range(n).select(
        (F.col("id") % dims).alias("a"),
        ((F.col("id") * 7919) % dims).alias("b"),
    )
    d = tempfile.mkdtemp(prefix="zorder_")
    try:
        cluster_by_zorder(base, ["a", "b"], num_partitions=16).write.parquet(
            f"{d}/t", mode="overwrite"
        )
        spans = {"a": [], "b": []}
        for f in glob.glob(f"{d}/t/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    if name in spans:
                        stats = col.statistics
                        spans[name].append(stats.max - stats.min)
        for name, sp in spans.items():
            assert sp, f"no stats for {name}"
            mean_span = sum(sp) / len(sp)
            # 16 partitions ≈ 4×4 Z-cells → ~dims/4 span per dim; allow 2×
            assert mean_span <= dims / 2, (name, mean_span)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_key_rejects_sign_bit_overflow(spark):
    """bits * n_cols > 63 would push the top interleave bit into the
    long's sign bit (negative keys sort first, breaking the Z-order) —
    both the engine and the SQL spelling must refuse."""
    from haf_plug_play_spark.operators.layout import zorder_key, zorder_key_sql

    with pytest.raises(ValueError, match="<= 63"):
        zorder_key([F.col(c) for c in ("a", "b", "c", "d")], bits=16)
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key_sql(["a", "b", "c", "d"], bits=16)
    # 4 columns fit at 15 bits — the documented alternative
    assert zorder_key([F.col(c) for c in ("a", "b", "c", "d")], bits=15) is not None
