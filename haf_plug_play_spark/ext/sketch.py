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


# ------------------------------------------------------------- hyperloglog

HLL_Y_BITS = 52  # md5_int is 60 bits; 8 go to the register index at m=256


def hll_distinct(
    items: DataFrame,
    item_col: str = "item",
    p: int = 8,
) -> DataFrame:
    """HyperLogLog distinct-count sketch with the exact answer computed
    alongside and BOTH guarantees certified in-query — the third
    mergeable sketch beside CMS and Bloom (public method: Flajolet,
    Fusy, Gandouet & Meunier 2007, with the standard linear-counting
    small-range correction from the same paper).

    ``m = 2**p`` registers; item hash x = md5_int (60 bits) splits into
    register index ``x mod m`` and suffix ``y = x div m``; the register
    records max rho(y) where rho = (trailing zeros of y) + 1 — the same
    geometric observable as the paper's leading-zero formulation. The
    estimate is ``alpha_m * m^2 / sum_j 2^(-M_j)``, with the harmonic
    sum computed in EXACT integer arithmetic (``sum_j 2^(52 - M_j)`` as
    a bigint — no float reassociation across partitions, so engine and
    oracle agree bit-for-bit and only the final division is floating
    point); if E <= 2.5m and empty registers remain, linear counting
    ``m * ln(m / V)`` takes over.

    Scale contract: one hash aggregation to the distinct items (map-side
    combined), one m-bounded register aggregation — the sketch is m
    rows at any corpus size, and registers MERGE by per-index max, which
    the query certifies by building per-source sketches, merging them,
    and asserting the merged estimate equals the direct one EXACTLY
    (identical registers → identical integer sum → identical double).
    The exact distinct count is the part you drop at 100 TB.

    ``items`` needs columns (source, item). Output: one row —
    (n_exact, hll_est, rel_err, n_registers_used, certified,
    merge_consistent) where certified ⇔ |est/exact − 1| <= 4·1.04/sqrt(m)
    (four standard errors of the paper's asymptotic bound).
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # numerator of the raw estimate, scaled by 2^52 to match the integer
    # harmonic sum; folded to one double literal shared with the oracle
    num = alpha * m * m * float(1 << HLL_Y_BITS)
    sigma4 = 4.0 * 1.04 / (m ** 0.5)

    x = md5_int(F.col(item_col))
    hashed = items.select(
        F.col("source"),
        F.col(item_col).alias("_it"),
        (x % m).cast("int").alias("_idx"),
        # integer shift, NOT x/m: double division would round away the
        # low bits of a 60-bit hash past 2^53
        F.shiftright(x, p).alias("_y"),
    )
    rho = F.when(F.col("_y") == 0, F.lit(HLL_Y_BITS + 1)).otherwise(
        F.log2((F.col("_y").bitwiseAND(-F.col("_y"))).cast("double")).cast("int")
        + F.lit(1)
    )
    distinct = hashed.select("source", "_it", "_idx", rho.alias("_rho")).distinct()

    def estimate(regs: DataFrame, est_name: str) -> DataFrame:
        """regs: (_idx, _m) one row per non-empty register."""
        agg = regs.agg(
            F.count("*").alias("_used"),
            F.sum(
                F.pow(F.lit(2.0), (F.lit(HLL_Y_BITS) - F.col("_m")).cast("double"))
                .cast("bigint")
            ).alias("_s_used"),
        )
        s_int = F.col("_s_used") + (F.lit(m) - F.col("_used")) * F.lit(
            1 << HLL_Y_BITS
        )
        raw = F.lit(num) / s_int.cast("double")
        v = F.lit(m) - F.col("_used")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(raw)
        return agg.select(
            F.col("_used"), est.alias(est_name)
        )

    # direct global sketch
    global_regs = distinct.groupBy("_idx").agg(F.max("_rho").alias("_m"))
    direct = estimate(global_regs, "_est")
    # per-source sketches merged by per-index max — the mergeability path
    merged_regs = (
        distinct.groupBy("source", "_idx")
        .agg(F.max("_rho").alias("_m"))
        .groupBy("_idx")
        .agg(F.max("_m").alias("_m"))
    )
    merged = estimate(merged_regs, "_est_merged").select("_est_merged")
    exact = distinct.agg(F.countDistinct("_it").alias("n_exact"))

    rel_err = F.abs(F.col("_est") / F.col("n_exact") - 1.0)
    return (
        exact.crossJoin(F.broadcast(direct))
        .crossJoin(F.broadcast(merged))
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(F.col("_est"), 2).alias("hll_est"),
            F.round(rel_err, 4).alias("rel_err"),
            F.col("_used").cast("int").alias("n_registers_used"),
            (rel_err <= F.lit(sigma4)).alias("certified"),
            (F.col("_est") == F.col("_est_merged")).alias("merge_consistent"),
        )
    )


def hll_sql(item_sql: str, p: int = 8) -> str:
    """DuckDB oracle for ``hll_distinct``: same hash split, same integer
    harmonic sum, same literals, same branch. ``item_sql`` is a CTE body
    yielding (source, item) rows over the pre-registered views."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << HLL_Y_BITS))
    sigma4 = repr(4.0 * 1.04 / (m ** 0.5))
    big = 1 << HLL_Y_BITS
    x = md5_int_sql("item")
    return (
        f"WITH items AS ({item_sql}), "
        f"hx AS (SELECT source, item AS it, CAST({x} % {m} AS INT) AS idx, "
        f"({x} >> {p}) AS y FROM items), "
        "hd AS (SELECT DISTINCT source, it, idx, CASE WHEN y = 0 "
        f"THEN {HLL_Y_BITS + 1} ELSE CAST(log2(CAST(y & (-y) AS DOUBLE)) "
        "AS INT) + 1 END AS rho FROM hx), "
        "gre AS (SELECT idx, max(rho) AS mj FROM hd GROUP BY 1), "
        "ga AS (SELECT count(*) AS used, CAST(sum(CAST(pow(2.0, "
        f"CAST({HLL_Y_BITS} - mj AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_used "
        "FROM gre), "
        "mre AS (SELECT idx, max(mj) AS mj FROM (SELECT source, idx, "
        "max(rho) AS mj FROM hd GROUP BY 1, 2) GROUP BY 1), "
        "ma AS (SELECT count(*) AS used, CAST(sum(CAST(pow(2.0, "
        f"CAST({HLL_Y_BITS} - mj AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_used "
        "FROM mre), "
        "gest AS (SELECT used, CASE WHEN "
        f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) <= {2.5 * m!r} "
        f"AND ({m} - used) > 0 THEN {float(m)!r} * ln({float(m)!r} / "
        f"CAST({m} - used AS DOUBLE)) ELSE "
        f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) END AS est "
        "FROM ga), "
        "mest AS (SELECT CASE WHEN "
        f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) <= {2.5 * m!r} "
        f"AND ({m} - used) > 0 THEN {float(m)!r} * ln({float(m)!r} / "
        f"CAST({m} - used AS DOUBLE)) ELSE "
        f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) END AS est_m "
        "FROM ma), "
        "ex AS (SELECT CAST(count(DISTINCT it) AS BIGINT) AS n_exact FROM hd) "
        "SELECT n_exact, round(est, 2) AS hll_est, "
        "round(abs(est / n_exact - 1.0), 4) AS rel_err, "
        "CAST(used AS INT) AS n_registers_used, "
        f"abs(est / n_exact - 1.0) <= {sigma4} AS certified, "
        "est = est_m AS merge_consistent "
        "FROM ex CROSS JOIN gest CROSS JOIN mest"
    )
