"""Mergeable sketch operators: count-min heavy hitters and Bloom-filter
membership probes.

Both sketches share the scale contract that makes them worth having at
100 TB: the sketch itself is BOUNDED (d×w counters / m bits) regardless of
input size, built with one map-side-combinable aggregation, and probed with
broadcast joins — no shuffle of the probed table. Hashes are the portable
md5/universal scheme (ext/hashing.py) so a DuckDB oracle reproduces every
bucket and bit exactly.

Certification stance (same as QAD-approx-distinct): at test scale the exact
answer is computed alongside the sketch answer and the sketch's hard
guarantee is asserted IN-QUERY (CMS never under-counts; Bloom never misses
a member). At corpus scale the exact side is dropped and only the sketch
path runs — the queries here keep both so the oracle gate proves the
guarantee on every run.

Reference parity: the reference engine has no sketch surface (SURVEY §2.4
notes "no approximate aggregates"); these extend the engine's
LLM-data-pipeline family (SURVEY §7.1.7) alongside dedup/decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from haf_plug_play_spark.ext.hashing import (
    MERSENNE_P,
    hash_params,
    md5_int,
    md5_int_sql,
    universal_hash,
    universal_hash_sql,
)


# ------------------------------------------------------------- count-min

def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 3,
    width: int = 16,
    min_support: float = 0.005,
    seed: int = 13,
) -> DataFrame:
    """Heavy hitters over the corpus word stream, with a count-min-sketch
    estimate certified against the exact count in the same query.

    The sketch is ``depth`` rows of ``width`` counters; word w is counted
    at bucket ``h_j(w) = ((a_j·x + b_j) mod P) mod width`` for each row j
    (x = md5 of the word), and its estimate is the MIN over rows of the
    bucket totals — the Cormode-Muthukrishnan bound guarantees
    ``estimate >= exact`` always, ``estimate <= exact + εN`` w.h.p.

    Plan shape: exact per-word counts are one hash aggregation (map-side
    partial combine); the sketch is DERIVED from those counts (explode
    ``depth`` rows per word, re-aggregate) so the raw word stream is
    scanned once; sketch size is depth×width rows, attached back to the
    candidate words with a broadcast join. At corpus scale the exact
    per-word aggregation is the part you drop: the sketch alone is
    mergeable (sum per bucket) and the candidate set comes from a sampled
    or prior-epoch vocabulary. ``width`` is deliberately small here so
    collisions actually occur and the test exercises estimate > exact.

    Output: one row per word with corpus frequency >= min_support —
    (term, exact_n, cms_est, certified) where certified ⇔ est >= exact.
    """
    params = hash_params(depth, seed)
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    )
    exact = words.groupBy("term").agg(F.count("*").alias("exact_n"))
    total = exact.agg(F.sum("exact_n").alias("_total"))

    x = md5_int(F.col("term"))
    buckets = exact.select(
        "term",
        "exact_n",
        *[
            (universal_hash(x, a, b) % width).cast("int").alias(f"_b{j}")
            for j, (a, b) in enumerate(params)
        ],
    )
    # sketch rows: (j, bucket) -> total count landing there
    sketch = (
        buckets.select(
            "exact_n",
            F.explode(
                F.array(*[
                    F.struct(F.lit(j).alias("_j"), F.col(f"_b{j}").alias("_bkt"))
                    for j in range(depth)
                ])
            ).alias("_e"),
        )
        .select("exact_n", "_e._j", "_e._bkt")
        .groupBy("_j", "_bkt")
        .agg(F.sum("exact_n").alias("_cnt"))
    )
    est = buckets
    for j in range(depth):
        row_j = F.broadcast(
            sketch.filter(F.col("_j") == j).select(
                F.col("_bkt").alias(f"_b{j}"), F.col("_cnt").alias(f"_est{j}")
            )
        )
        est = est.join(row_j, f"_b{j}", "left")
    cms = F.least(*[F.col(f"_est{j}") for j in range(depth)])
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("exact_n") >= F.col("_total") * min_support)
        .select(
            "term",
            "exact_n",
            cms.alias("cms_est"),
            (cms >= F.col("exact_n")).alias("certified"),
        )
        .orderBy(F.desc("exact_n"), "term")
    )


def cms_sql(
    depth: int = 3, width: int = 16, min_support: float = 0.005, seed: int = 13
) -> str:
    """DuckDB oracle for ``cms_heavy_hitters`` — same hashes, same buckets."""
    params = hash_params(depth, seed)
    x = f"({md5_int_sql('term')} % {MERSENNE_P})"
    bucket_cols = ", ".join(
        f"CAST({universal_hash_sql(x, a, b)} % {width} AS INT) AS b{j}"
        for j, (a, b) in enumerate(params)
    )
    sketch_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, b{j} AS bkt, exact_n FROM buckets" for j in range(depth)
    )
    est_joins = " ".join(
        f"LEFT JOIN sketch s{j} ON s{j}.j = {j} AND s{j}.bkt = buckets.b{j}"
        for j in range(depth)
    )
    least = "least(" + ", ".join(f"s{j}.cnt" for j in range(depth)) + ")"
    return (
        "WITH words AS (SELECT unnest(string_split(lower(text), ' ')) AS term "
        "FROM documents), "
        "exact AS (SELECT term, count(*) AS exact_n FROM words GROUP BY 1), "
        "tot AS (SELECT sum(exact_n) AS total FROM exact), "
        f"buckets AS (SELECT term, exact_n, {bucket_cols} FROM exact), "
        f"sketch AS (SELECT j, bkt, CAST(sum(exact_n) AS BIGINT) AS cnt "
        f"FROM ({sketch_rows}) GROUP BY 1, 2) "
        f"SELECT term, exact_n, {least} AS cms_est, {least} >= exact_n AS certified "
        f"FROM buckets {est_joins} CROSS JOIN tot "
        f"WHERE exact_n >= total * {min_support} "
        "ORDER BY exact_n DESC, term"
    )


# ------------------------------------------------------------- bloom

def bloom_probe(
    docs: DataFrame,
    member_filter: Column,
    key_col: Column,
    n_bits: int = 4096,
    n_hashes: int = 4,
    seed: int = 17,
) -> DataFrame:
    """Bloom-filter membership probe: build an ``n_bits``-position filter
    from the rows matching ``member_filter`` (the "eval set" in the
    decontamination use), then flag EVERY row whose key may be a member.
    Guarantee certified in-query: a Bloom filter has no false negatives,
    so ``exact_hit ⇒ bloom_hit`` on every row (the ``certified`` column).

    Plan shape — the 100 TB decontamination pattern: the filter is a
    distinct-positions table bounded by ``n_bits`` rows regardless of
    member-set size, and each of the ``n_hashes`` probes is a broadcast
    LEFT join on a precomputed position column — map-side only, the
    probed table never shuffles and never explodes (no k-rows-per-doc
    fan-out + re-aggregation). The exact side joins the member keys the
    same broadcast way; at corpus scale you drop it and keep only the
    bloom columns.

    ``key_col`` is hashed with the portable md5 scheme; position j is
    ``((a_j·x + b_j) mod P) mod n_bits``.
    """
    params = hash_params(n_hashes, seed)
    x = md5_int(key_col)
    keyed = docs.withColumn("_x", x)
    positions = [
        (universal_hash(F.col("_x"), a, b) % n_bits).cast("int").alias(f"_p{j}")
        for j, (a, b) in enumerate(params)
    ]
    keyed = keyed.select("*", *positions)
    members = keyed.filter(member_filter)
    bits = (
        members.select(
            F.explode(F.array(*[F.col(f"_p{j}") for j in range(n_hashes)])).alias(
                "_pos"
            )
        )
        .distinct()
    )
    probed = keyed
    for j in range(n_hashes):
        bj = F.broadcast(
            bits.select(F.col("_pos").alias(f"_p{j}"), F.lit(True).alias(f"_hit{j}"))
        )
        probed = probed.join(bj, f"_p{j}", "left")
    member_keys = F.broadcast(
        members.select(F.col("_x").alias("_mx")).distinct().withColumn(
            "_exact", F.lit(True)
        )
    )
    probed = probed.join(member_keys, probed["_x"] == member_keys["_mx"], "left")
    bloom_hit = F.lit(True)
    for j in range(n_hashes):
        bloom_hit = bloom_hit & F.coalesce(F.col(f"_hit{j}"), F.lit(False))
    exact_hit = F.coalesce(F.col("_exact"), F.lit(False))
    return probed.select(
        "doc_id",
        bloom_hit.alias("bloom_hit"),
        exact_hit.alias("exact_hit"),
        (bloom_hit | ~exact_hit).alias("certified"),
    ).orderBy("doc_id")


def bloom_sql(
    member_pred: str,
    key_expr: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
    seed: int = 17,
) -> str:
    """DuckDB oracle for ``bloom_probe`` over the documents table."""
    params = hash_params(n_hashes, seed)
    x = f"({md5_int_sql(key_expr)} % {MERSENNE_P})"
    pos_cols = ", ".join(
        f"CAST({universal_hash_sql('x', a, b)} % {n_bits} AS INT) AS p{j}"
        for j, (a, b) in enumerate(params)
    )
    member_bits = " UNION ALL ".join(
        f"SELECT p{j} AS pos FROM keyed WHERE {member_pred}" for j in range(n_hashes)
    )
    # COALESCE(..., FALSE) mirrors the Spark side's NULL handling: a NULL
    # key row hashes to NULL positions (NULL % / IN propagate NULL in SQL),
    # while bloom_probe's left-join misses coalesce to False — without the
    # wrap a NULL text row would diverge engine vs oracle.
    hit = " AND ".join(
        f"COALESCE(p{j} IN (SELECT pos FROM bits), FALSE)" for j in range(n_hashes)
    )
    exact = "COALESCE(x IN (SELECT x FROM mk), FALSE)"
    return (
        f"WITH hx AS (SELECT *, {x} AS x FROM documents), "
        f"keyed AS (SELECT *, {pos_cols} FROM hx), "
        f"bits AS (SELECT DISTINCT pos FROM ({member_bits})), "
        f"mk AS (SELECT DISTINCT x FROM keyed WHERE {member_pred}) "
        f"SELECT doc_id, ({hit}) AS bloom_hit, "
        f"{exact} AS exact_hit, "
        f"(({hit}) OR NOT {exact}) AS certified "
        "FROM keyed ORDER BY doc_id"
    )
