"""Slugify (X7) golden tests vs a literal Python port of the reference
algorithm (server/plug_endpoints/polls.py:54-74, whitespace-collapse intent
fix per SURVEY §7.4), and the uniqueness pass."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from haf_plug_play_spark.functions.strings import slugify, unique_slug


def _reference_slugify(question: str) -> str:
    body = question.replace("&", " and ")
    body = re.sub(r"\s+", " ", body).strip()  # intent: full collapse
    total_len = 0
    clean = ""
    for w in body.split(" "):
        total_len += len(w)
        if total_len > 32:
            break
        clean += f"{w}-"
    return re.sub(r"[^a-z-]+", "", clean[:-1].lower())


QUESTIONS = [
    "What do you think Hive's price will be next year?",
    "Cats & dogs?",
    "short",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "Antidisestablishmentarianism and other matters of great import",
    "  leading  and   trailing   spaces  ",
    "UPPER Case & 123 numbers!",
    "supercalifragilisticexpialidociousword first",
]


def test_slugify_matches_reference(spark):
    df = spark.createDataFrame([(q,) for q in QUESTIONS], "q string")
    got = {r.q: r.slug for r in df.select("q", slugify(F.col("q")).alias("slug")).collect()}
    for q in QUESTIONS:
        assert got[q] == _reference_slugify(q), q


def test_unique_slug(spark):
    cands = spark.createDataFrame(
        [(1, "my-poll"), (2, "my-poll"), (3, "fresh")], "id int, slug string"
    )
    taken = spark.createDataFrame([("my-poll",)], "permlink string")
    out = {
        r.id: r.slug_final
        for r in unique_slug(cands, "slug", taken, "permlink", order_col="id").collect()
    }
    assert out[3] == "fresh"
    # deterministic by op order, not merely unique: id 1 probes first
    assert out[1] == "my-poll-1" and out[2] == "my-poll-2"


def test_unique_slug_deterministic_across_shuffles(spark):
    """Reference parity: suffixes follow probe (op-arrival) order. Two runs
    over the same rows in scrambled input order / partitioning must assign
    identical suffixes — the monotonically_increasing_id formulation this
    replaces failed exactly this property."""
    rows = [(i, f"slug-{i % 5}") for i in range(50)]
    taken = spark.createDataFrame([(f"slug-{i}",) for i in range(5)], "permlink string")
    a = spark.createDataFrame(rows, "op_seq long, slug string").repartition(7)
    b = (
        spark.createDataFrame(list(reversed(rows)), "op_seq long, slug string")
        .repartition(3)
        .sortWithinPartitions(F.desc("slug"))
    )
    ra = {r.op_seq: r.slug_final for r in unique_slug(a, "slug", taken, "permlink", "op_seq").collect()}
    rb = {r.op_seq: r.slug_final for r in unique_slug(b, "slug", taken, "permlink", "op_seq").collect()}
    assert ra == rb
    # rank follows op_seq within each colliding slug: op 0 gets -1, op 5 gets -2
    assert ra[0] == "slug-0-1" and ra[5] == "slug-0-2" and ra[45] == "slug-0-10"


def test_cli_backfill_and_status(spark, tmp_path, capsys):
    import json

    from haf_plug_play_spark import fixtures
    from haf_plug_play_spark.cli import main

    ops_df, trx_df = fixtures.as_dataframes(spark, 1500, 3)
    ops, trx, out = str(tmp_path / "ops"), str(tmp_path / "trx"), str(tmp_path / "out")
    ops_df.write.parquet(ops)
    trx_df.write.parquet(trx)
    lo = ops_df.agg({"block_num": "min"}).first()[0]
    hi = ops_df.agg({"block_num": "max"}).first()[0]
    rc = main(
        ["backfill", "--plug", "podping", "--ops", ops, "--trx", trx,
         "--out", out, "--start", str(lo), "--end", str(hi), "--step", "250"]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["cursor"] == hi and res["chunks"] >= 2
    rc = main(["status", "--ops", ops, "--out", out])
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {p["plug"]: p["lag_blocks"] for p in status["plugs"]}["podping"] == 0
