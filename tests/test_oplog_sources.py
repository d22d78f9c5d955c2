"""Op-log source formats: JSONL must feed the same pipeline as parquet and
produce identical results; the JSONL→parquet migration lays out the
runner's pruning scheme."""

from __future__ import annotations

import os

from haf_plug_play_spark import fixtures
from haf_plug_play_spark.ingest.envelope import parse_custom_json
from haf_plug_play_spark.plugs import PLUGS
from haf_plug_play_spark.sources.oplog import (
    convert_ops_to_parquet,
    read_ops,
    read_trx,
)

from .compare import canonical


def _rows(df):
    cols = sorted(df.columns)
    return canonical(cols, [tuple(r[c] for c in cols) for r in df.select(cols).collect()])


def test_jsonl_ops_match_parquet(spark, tmp_path):
    ops_df, trx_df = fixtures.as_dataframes(spark, 2_000, 11)
    pq, jl = str(tmp_path / "ops_pq"), str(tmp_path / "ops_jl")
    trx_jl = str(tmp_path / "trx_jl")
    ops_df.write.parquet(pq)
    ops_df.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(jl)
    trx_df.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(trx_jl)

    from_pq = read_ops(spark, pq, fmt="parquet")
    from_jl = read_ops(spark, jl, fmt="json")
    # JSON scans are always nullable; names and types must match exactly
    types = lambda df: [(f.name, f.dataType) for f in df.schema.fields]
    assert types(from_jl) == types(from_pq) == types(ops_df)
    assert _rows(from_jl) == _rows(from_pq)

    # the whole plug pipeline runs unchanged off the JSONL source
    parsed = parse_custom_json(from_jl, read_trx(spark, trx_jl, fmt="json"))
    out = PLUGS["podping"].transform(parsed)
    parsed_pq = parse_custom_json(from_pq, trx_df)
    expected = PLUGS["podping"].transform(parsed_pq)
    for table in out:
        assert _rows(out[table]) == _rows(expected[table]), table


def test_convert_ops_to_parquet_layout(spark, tmp_path):
    ops_df, _ = fixtures.as_dataframes(spark, 1_000, 3)
    jl, dst = str(tmp_path / "ops_jl"), str(tmp_path / "ops_migrated")
    ops_df.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(jl)
    convert_ops_to_parquet(spark, jl, dst, fmt="json", buckets_step=100)
    buckets = [d for d in os.listdir(dst) if d.startswith("block_bucket=")]
    assert len(buckets) > 1  # partitioned for pruning
    back = spark.read.parquet(dst).drop("block_bucket")
    assert _rows(back) == _rows(ops_df)
