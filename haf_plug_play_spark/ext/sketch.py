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
from haf_plug_play_spark.ext.materialize import materialize

from haf_plug_play_spark.ext.hashing import (
    MERSENNE_P,
    hash_params,
    md5_int,
    md5_int_sql,
    universal_hash,
    universal_hash_sql,
)


def _materialize(df: DataFrame) -> DataFrame:
    """Materialize a multiply-consumed reduced intermediate ONCE (r15).

    Catalyst clones a shared subtree per consumer, and every consumer
    that pushes a different filter into its copy (each equi-join adds
    isnotnull on its keys) forks the subtree so runtime exchange reuse
    cannot unify them — the corpus-sized lineage below re-executes once
    per consumer. An eager localCheckpoint runs that lineage once and
    every consumer reads the stored blocks; it also collapses the
    logical plan, which on the overlap sketches cut multi-second
    driver-side Catalyst planning (314-node physical plans).

    Sequencing note (measured r15): with single-split inputs this trade
    LOST (redundant single-core legs overlapped for free on an idle box
    while the checkpoint serialized the job chain — XK-kmv 1.60→4.18 s);
    AFTER input parallelization the redundant legs contend for the same
    cores and deduplication wins (XK-hll-overlap 5.44→3.21 s, identical
    results). Applied only to tables already reduced far below the
    corpus (distinct item sets, register tables), so the stored
    footprint is the sketch's own bounded size."""
    return df.transform(materialize)


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


def hll_observables(item: Column, p: int = 8) -> Column:
    """The per-item HLL observable as a struct (_idx, _rho): md5 hash
    split into register index (low p bits) and suffix y, with rho =
    trailing zeros of y + 1. Shared by the batch sketch and the
    streaming register maintenance (integer shift, NOT x/m: double
    division would round away the low bits of a 60-bit hash past 2^53).

    rho is derived with EXACT integer arithmetic — ``y & -y`` isolates
    the lowest set bit 2^k, whose minimal binary string has length k+1
    — the same length(bin(x)) device the quantile sketch uses, so no
    libm log2 is in the loop (ADVICE r8: a log2 landing at k−1ulp would
    silently under-count rho and break engine/oracle parity).
    """
    m = 1 << p
    x = md5_int(item)
    y = F.shiftright(x, p)
    rho = F.when(y == 0, F.lit(HLL_Y_BITS + 1)).otherwise(
        F.length(F.bin(y.bitwiseAND(-y))).cast("int")
    )
    return F.struct(
        (x % m).cast("int").alias("_idx"), rho.alias("_rho")
    )


def hll_register_estimate(
    regs: DataFrame,
    p: int = 8,
    est_name: str = "_est",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cardinality estimate from a register table (_idx, _m), one row
    per NON-EMPTY register — the Flajolet et al. 2007 estimator with
    the exact-integer harmonic sum and the linear-counting small-range
    branch, factored out so any register producer (the batch sketch,
    a streaming max-aggregation) shares the identical arithmetic.
    ``group_cols`` estimates per group (the register table then carries
    those columns; one estimate row per group — the per-stratum sketch);
    default is the single global estimate.
    Returns (group_cols..., _used, <est_name>)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # numerator of the raw estimate, scaled by 2^52 to match the integer
    # harmonic sum; folded to one double literal shared with the oracle
    num = alpha * m * m * float(1 << HLL_Y_BITS)
    aggs = [
        F.count("*").alias("_used"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(HLL_Y_BITS) - F.col("_m")).cast("double"))
            .cast("bigint")
        ).alias("_s_used"),
    ]
    agg = regs.groupBy(*group_cols).agg(*aggs) if group_cols else regs.agg(*aggs)
    s_int = F.col("_s_used") + (F.lit(m) - F.col("_used")) * F.lit(
        1 << HLL_Y_BITS
    )
    raw = F.lit(num) / s_int.cast("double")
    v = F.lit(m) - F.col("_used")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*(group_cols or []), F.col("_used"), est.alias(est_name))


def hll_distinct(
    items: DataFrame,
    item_col: str = "item",
    p: int = 8,
    certify: bool = True,
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

    Scale contract: register legs consume the RAW hashed stream — max
    over duplicates equals max over distincts, so no distinct pre-pass
    is needed and each leg map-side combines straight down to ≤ m (or
    ≤ sources·m) rows before its only shuffle. (Round 9, closing
    VERDICT r8 "What's wrong #1": the previous shape materialized a
    shared ``.distinct()`` frame that Spark recomputed — scan + md5 +
    wide distinct shuffle — once per consumer; now the only
    distinct-aggregation left is the exact-count leg, which is the part
    you drop at 100 TB anyway.) Registers MERGE by per-index max, which
    the query certifies by building per-source sketches, merging them,
    and asserting the merged estimate equals the direct one EXACTLY
    (identical registers → identical integer sum → identical double).

    ``items`` needs columns (source, item). Output: one row —
    (n_exact, hll_est, rel_err, n_registers_used, certified,
    merge_consistent) where certified ⇔ |est/exact − 1| <= 4·1.04/sqrt(m)
    (four standard errors of the paper's asymptotic bound).

    ``certify=False`` is the PRODUCTION configuration (r11, the
    ``dedup_decision(deterministic_order=False)`` pattern): the exact
    count, its comparison columns, and the merge-consistency leg exist
    only to certify the estimator at test SF — at 100 TB the sketch IS
    the answer, and the exact leg is the one distinct-aggregation
    shuffle in the plan. Non-certified output: one row
    (hll_est, n_registers_used).
    """
    m = 1 << p
    sigma4 = 4.0 * 1.04 / (m ** 0.5)

    hashed = hll_observables(F.col(item_col), p).alias("_o")
    obs = items.select(F.col("source"), hashed).select(
        "source", F.col("_o._idx").alias("_idx"), F.col("_o._rho").alias("_rho")
    )

    def estimate(regs: DataFrame, est_name: str) -> DataFrame:
        return hll_register_estimate(regs, p, est_name)

    # direct global sketch — straight off the raw hashed stream: max is
    # duplicate-insensitive, so map-side combine collapses each scan
    # partition to ≤ m rows before the one m-bounded shuffle
    global_regs = obs.groupBy("_idx").agg(F.max("_rho").alias("_m"))
    direct = estimate(global_regs, "_est")
    if not certify:
        return direct.select(
            F.round(F.col("_est"), 2).alias("hll_est"),
            F.col("_used").cast("int").alias("n_registers_used"),
        )
    # per-source sketches merged by per-index max — the mergeability path
    merged_regs = (
        obs.groupBy("source", "_idx")
        .agg(F.max("_rho").alias("_m"))
        .groupBy("_idx")
        .agg(F.max("_m").alias("_m"))
    )
    merged = estimate(merged_regs, "_est_merged").select("_est_merged")
    exact = items.agg(F.countDistinct(item_col).alias("n_exact"))

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


def hll_distinct_by_group(
    items: DataFrame,
    item_col: str = "item",
    group_col: str = "source",
    p: int = 8,
    certify: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct counts — the stratified form of
    :func:`hll_distinct` (one sketch per source/language/domain), the
    shape a corpus-composition dashboard actually wants: "distinct
    shingles per source" over 100 TB without one count-distinct shuffle
    per group over the raw stream.

    Same observables, same exact-integer harmonic sum, same
    linear-counting branch as the global sketch (shared helpers —
    hll_observables / hll_register_estimate); the register table is just
    keyed by (group, idx), so the whole sketch pass is ONE
    map-side-combinable aggregation bounded by groups × m rows. The
    exact distinct per group is computed alongside and the paper's
    4σ bound certified per group, mirroring the global query's contract.

    Output: (group_col, n_exact, hll_est, rel_err, n_registers_used,
    certified) ordered by group_col. ``certify=False`` (production, see
    :func:`hll_distinct`) drops the per-group exact leg — the only
    distinct-aggregation shuffle — and returns
    (group_col, hll_est, n_registers_used).
    """
    m = 1 << p
    sigma4 = 4.0 * 1.04 / (m ** 0.5)
    hashed = hll_observables(F.col(item_col), p).alias("_o")
    obs = items.select(F.col(group_col), hashed).select(
        group_col, F.col("_o._idx").alias("_idx"), F.col("_o._rho").alias("_rho")
    )
    regs = obs.groupBy(group_col, "_idx").agg(F.max("_rho").alias("_m"))
    ests = hll_register_estimate(regs, p, "_est", group_cols=[group_col])
    if not certify:
        return ests.select(
            F.col(group_col),
            F.round(F.col("_est"), 2).alias("hll_est"),
            F.col("_used").cast("int").alias("n_registers_used"),
        ).orderBy(group_col)
    exact = items.groupBy(group_col).agg(
        F.countDistinct(item_col).alias("n_exact")
    )
    rel_err = F.abs(F.col("_est") / F.col("n_exact") - 1.0)
    return (
        exact.join(F.broadcast(ests), group_col)
        .select(
            F.col(group_col),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(F.col("_est"), 2).alias("hll_est"),
            F.round(rel_err, 4).alias("rel_err"),
            F.col("_used").cast("int").alias("n_registers_used"),
            (rel_err <= F.lit(sigma4)).alias("certified"),
        )
        .orderBy(group_col)
    )


def hll_group_sql(item_sql: str, group_col: str = "source", p: int = 8) -> str:
    """DuckDB oracle for ``hll_distinct_by_group``: the per-group form of
    ``hll_sql`` — same hash split, same integer harmonic sum, same
    literals, same linear-counting branch, grouped."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << HLL_Y_BITS))
    sigma4 = repr(4.0 * 1.04 / (m ** 0.5))
    big = 1 << HLL_Y_BITS
    x = md5_int_sql("item")
    raw = f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE))"
    return (
        f"WITH items AS ({item_sql}), "
        f"hx AS (SELECT {group_col} AS g, item AS it, "
        f"CAST({x} % {m} AS INT) AS idx, ({x} >> {p}) AS y FROM items), "
        "hd AS (SELECT DISTINCT g, it, idx, CASE WHEN y = 0 "
        f"THEN {HLL_Y_BITS + 1} ELSE CAST(length(bin(y & (-y))) "
        "AS INT) END AS rho FROM hx), "
        "re AS (SELECT g, idx, max(rho) AS mj FROM hd GROUP BY 1, 2), "
        "ga AS (SELECT g, count(*) AS used, CAST(sum(CAST(pow(2.0, "
        f"CAST({HLL_Y_BITS} - mj AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_used "
        "FROM re GROUP BY 1), "
        f"est AS (SELECT g, used, CASE WHEN {raw} <= {2.5 * m!r} "
        f"AND ({m} - used) > 0 THEN {float(m)!r} * ln({float(m)!r} / "
        f"CAST({m} - used AS DOUBLE)) ELSE {raw} END AS est FROM ga), "
        "ex AS (SELECT g, CAST(count(DISTINCT it) AS BIGINT) AS n_exact "
        "FROM hd GROUP BY 1) "
        f"SELECT ex.g AS {group_col}, n_exact, round(est, 2) AS hll_est, "
        "round(abs(est / n_exact - 1.0), 4) AS rel_err, "
        "CAST(used AS INT) AS n_registers_used, "
        f"abs(est / n_exact - 1.0) <= {sigma4} AS certified "
        f"FROM ex JOIN est ON ex.g = est.g ORDER BY ex.g"
    )


def hll_sql(item_sql: str, p: int = 8, merge: bool = True) -> str:
    """DuckDB oracle for ``hll_distinct``: same hash split, same integer
    harmonic sum, same literals, same branch. ``item_sql`` is a CTE body
    yielding (source, item) rows over the pre-registered views.
    ``merge=False`` drops the per-source-merge leg (and its
    merge_consistent column) for single-register-producer callers like
    the streaming sketch query."""
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
        f"THEN {HLL_Y_BITS + 1} ELSE CAST(length(bin(y & (-y))) "
        "AS INT) END AS rho FROM hx), "
        "gre AS (SELECT idx, max(rho) AS mj FROM hd GROUP BY 1), "
        "ga AS (SELECT count(*) AS used, CAST(sum(CAST(pow(2.0, "
        f"CAST({HLL_Y_BITS} - mj AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_used "
        "FROM gre), "
        + (
            "mre AS (SELECT idx, max(mj) AS mj FROM (SELECT source, idx, "
            "max(rho) AS mj FROM hd GROUP BY 1, 2) GROUP BY 1), "
            "ma AS (SELECT count(*) AS used, CAST(sum(CAST(pow(2.0, "
            f"CAST({HLL_Y_BITS} - mj AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_used "
            "FROM mre), "
            if merge
            else ""
        )
        +         "gest AS (SELECT used, CASE WHEN "
        f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) <= {2.5 * m!r} "
        f"AND ({m} - used) > 0 THEN {float(m)!r} * ln({float(m)!r} / "
        f"CAST({m} - used AS DOUBLE)) ELSE "
        f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) END AS est "
        "FROM ga), "
        + (
            "mest AS (SELECT CASE WHEN "
            f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) <= {2.5 * m!r} "
            f"AND ({m} - used) > 0 THEN {float(m)!r} * ln({float(m)!r} / "
            f"CAST({m} - used AS DOUBLE)) ELSE "
            f"({num} / CAST(s_used + ({m} - used) * {big} AS DOUBLE)) END AS est_m "
            "FROM ma), "
            if merge
            else ""
        )
        +         "ex AS (SELECT CAST(count(DISTINCT it) AS BIGINT) AS n_exact FROM hd) "
        "SELECT n_exact, round(est, 2) AS hll_est, "
        "round(abs(est / n_exact - 1.0), 4) AS rel_err, "
        "CAST(used AS INT) AS n_registers_used, "
        f"abs(est / n_exact - 1.0) <= {sigma4} AS certified"
        + (
            ", est = est_m AS merge_consistent "
            "FROM ex CROSS JOIN gest CROSS JOIN mest"
            if merge
            else " FROM ex CROSS JOIN gest"
        )
    )


def hll_overlap(
    items: DataFrame,
    item_col: str = "item",
    group_col: str = "source",
    p: int = 8,
    certify: bool = True,
) -> DataFrame:
    """Cross-group overlap matrix from MERGEABLE HLL sketches — the
    mixture-decision question ("how much of source B is already in
    source A?") answered without ever joining the raw item streams:
    per-group register vectors (the same one map-side-combinable pass
    as :func:`hll_distinct_by_group`) pairwise-merge by register max
    into a true union sketch per (a, b); |A∩B| follows by
    inclusion–exclusion and the Jaccard estimate by division. The union
    estimate is a real HLL estimate, so the paper's 4σ bound certifies
    it per pair; the intersection carries NO distribution-free bound
    (standard I-E caveat — its error is relative to the UNION size), so
    it is reported, not certified.

    Scale contract: everything after the one raw-stream register pass
    operates on ≤ groups × m rows — the pair fan-out joins broadcast the
    (tiny) pair list, never shuffle registers by item. The exact legs
    (per-group distinct counts + the pairwise item self-join) exist only
    to certify at test SF and are the part you DROP at 100 TB, exactly
    the XK-hll contract.

    Output per unordered pair (a < b): (source_a, source_b,
    n_union_exact, union_est, n_inter_exact, inter_est, jaccard_exact,
    jaccard_est, union_certified), ordered by (source_a, source_b).
    ``certify=False`` (production, see :func:`hll_distinct`) drops the
    exact legs — the per-group distinct counts AND the pairwise item
    self-join, the only non-register-bounded operations — returning
    (source_a, source_b, union_est, inter_est, jaccard_est)."""
    m = 1 << p
    sigma4 = 4.0 * 1.04 / (m ** 0.5)
    hashed = hll_observables(F.col(item_col), p).alias("_o")
    # r15 single-pass restructure (see _materialize): certify mode runs
    # ONE corpus pass — the distinct (group, item) table — and derives
    # the register table AND all three exact legs from it (register max
    # over distinct items is identical to register max over the raw
    # stream). Production skips the distinct pass and materializes only
    # the ≤ groups × m register table, which its four consumers
    # (estimates, source list, both pair replications) previously each
    # recomputed from the corpus.
    if certify:
        d = _materialize(items.select(group_col, item_col).distinct())
        src = d
    else:
        src = items
    obs = src.select(F.col(group_col), hashed).select(
        group_col, F.col("_o._idx").alias("_idx"), F.col("_o._rho").alias("_rho")
    )
    regs = _materialize(
        obs.groupBy(group_col, "_idx").agg(F.max("_rho").alias("_m"))
    )
    ests = hll_register_estimate(regs, p, "_est", group_cols=[group_col])
    srcs = regs.select(group_col).distinct()
    pairs = (
        srcs.withColumnRenamed(group_col, "source_a")
        .crossJoin(F.broadcast(srcs.withColumnRenamed(group_col, "source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    # union sketch per pair: registers replicated to each pair they
    # belong to (two broadcast equi-joins — no OR-join, no BNLJ), then
    # per-(a, b, idx) max — the HLL merge operation itself
    m1 = regs.join(
        F.broadcast(pairs), regs[group_col] == pairs["source_a"]
    ).select("source_a", "source_b", "_idx", "_m")
    m2 = regs.join(
        F.broadcast(pairs), regs[group_col] == pairs["source_b"]
    ).select("source_a", "source_b", "_idx", "_m")
    merged = (
        m1.unionByName(m2)
        .groupBy("source_a", "source_b", "_idx")
        .agg(F.max("_m").alias("_m"))
    )
    est_u = hll_register_estimate(
        merged, p, "_est_u", group_cols=["source_a", "source_b"]
    ).drop("_used")
    ea = ests.select(
        F.col(group_col).alias("source_a"), F.col("_est").alias("_est_a")
    )
    eb = ests.select(
        F.col(group_col).alias("source_b"), F.col("_est").alias("_est_b")
    )
    if not certify:
        sk = (
            pairs.join(F.broadcast(est_u), ["source_a", "source_b"])
            .join(F.broadcast(ea), "source_a")
            .join(F.broadcast(eb), "source_b")
        )
        inter_est_p = F.greatest(
            F.lit(0.0), F.col("_est_a") + F.col("_est_b") - F.col("_est_u")
        )
        return (
            sk.select(
                "source_a",
                "source_b",
                F.round("_est_u", 2).alias("union_est"),
                F.round(inter_est_p, 2).alias("inter_est"),
                F.round(inter_est_p / F.col("_est_u"), 6).alias("jaccard_est"),
            )
            .orderBy("source_a", "source_b")
        )
    # exact certification legs (droppable at scale), all reading the one
    # materialized distinct pass ``d``
    n_by = d.groupBy(group_col).agg(F.count("*").alias("_n"))
    na = n_by.select(
        F.col(group_col).alias("source_a"), F.col("_n").alias("_n_a")
    )
    nb = n_by.select(
        F.col(group_col).alias("source_b"), F.col("_n").alias("_n_b")
    )
    x = d.select(F.col(group_col).alias("source_a"), F.col(item_col).alias("_it"))
    y = d.select(F.col(group_col).alias("source_b"), F.col(item_col).alias("_it"))
    inter = (
        x.join(y, "_it")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("_n_inter"))
    )
    out = (
        pairs.join(F.broadcast(est_u), ["source_a", "source_b"])
        .join(F.broadcast(ea), "source_a")
        .join(F.broadcast(eb), "source_b")
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .withColumn("_n_inter", F.coalesce(F.col("_n_inter"), F.lit(0)))
    )
    union_exact = F.col("_n_a") + F.col("_n_b") - F.col("_n_inter")
    inter_est = F.greatest(
        F.lit(0.0), F.col("_est_a") + F.col("_est_b") - F.col("_est_u")
    )
    rel = F.abs(F.col("_est_u") / union_exact.cast("double") - 1.0)
    return (
        out.select(
            "source_a",
            "source_b",
            union_exact.cast("long").alias("n_union_exact"),
            F.round("_est_u", 2).alias("union_est"),
            F.col("_n_inter").cast("long").alias("n_inter_exact"),
            F.round(inter_est, 2).alias("inter_est"),
            F.round(
                F.col("_n_inter") / union_exact.cast("double"), 6
            ).alias("jaccard_exact"),
            F.round(inter_est / F.col("_est_u"), 6).alias("jaccard_est"),
            (rel <= F.lit(sigma4)).alias("union_certified"),
        )
        .orderBy("source_a", "source_b")
    )


def hll_overlap_sql(item_sql: str, group_col: str = "source", p: int = 8) -> str:
    """DuckDB oracle for :func:`hll_overlap`: same hash split, same
    integer harmonic sum, same literals, same linear-counting branch —
    per-group AND per-pair-merged — plus the exact inclusion–exclusion
    legs, so both engines compute bit-identical estimates from
    identical registers."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << HLL_Y_BITS))
    sigma4 = repr(4.0 * 1.04 / (m ** 0.5))
    big = 1 << HLL_Y_BITS
    x = md5_int_sql("item")

    def est(used: str, s_used: str) -> str:
        raw = f"({num} / CAST({s_used} + ({m} - {used}) * {big} AS DOUBLE))"
        return (
            f"CASE WHEN {raw} <= {2.5 * m!r} AND ({m} - {used}) > 0 "
            f"THEN {float(m)!r} * ln({float(m)!r} / "
            f"CAST({m} - {used} AS DOUBLE)) ELSE {raw} END"
        )

    hsum = (
        f"CAST(sum(CAST(pow(2.0, CAST({HLL_Y_BITS} - mj AS DOUBLE)) "
        "AS BIGINT)) AS BIGINT)"
    )
    return (
        f"WITH items AS ({item_sql}), "
        f"hx AS (SELECT {group_col} AS g, item AS it, "
        f"CAST({x} % {m} AS INT) AS idx, ({x} >> {p}) AS y FROM items), "
        "hd AS (SELECT DISTINCT g, it, idx, CASE WHEN y = 0 "
        f"THEN {HLL_Y_BITS + 1} ELSE CAST(length(bin(y & (-y))) "
        "AS INT) END AS rho FROM hx), "
        "re AS (SELECT g, idx, max(rho) AS mj FROM hd GROUP BY 1, 2), "
        f"ga AS (SELECT g, count(*) AS used, {hsum} AS s_used "
        "FROM re GROUP BY 1), "
        f"es AS (SELECT g, {est('used', 's_used')} AS est FROM ga), "
        "pr AS (SELECT a.g AS sa, b.g AS sb FROM (SELECT DISTINCT g FROM re) a "
        "JOIN (SELECT DISTINCT g FROM re) b ON a.g < b.g), "
        "mre AS (SELECT pr.sa, pr.sb, re.idx, max(re.mj) AS mj FROM pr "
        "JOIN re ON re.g = pr.sa OR re.g = pr.sb GROUP BY 1, 2, 3), "
        f"mga AS (SELECT sa, sb, count(*) AS used, {hsum} AS s_used "
        "FROM mre GROUP BY 1, 2), "
        f"mes AS (SELECT sa, sb, {est('used', 's_used')} AS est_u FROM mga), "
        "nb AS (SELECT g, CAST(count(DISTINCT it) AS BIGINT) AS n "
        "FROM hd GROUP BY 1), "
        "di AS (SELECT DISTINCT g, it FROM hd), "
        "itx AS (SELECT x.g AS sa, y.g AS sb, CAST(count(*) AS BIGINT) "
        "AS n_inter FROM di x JOIN di y ON x.it = y.it AND x.g < y.g "
        "GROUP BY 1, 2), "
        "j AS (SELECT pr.sa, pr.sb, mes.est_u, ea.est AS est_a, "
        "eb.est AS est_b, na.n AS n_a, nbx.n AS n_b, "
        "coalesce(itx.n_inter, 0) AS n_inter FROM pr "
        "JOIN mes ON mes.sa = pr.sa AND mes.sb = pr.sb "
        "JOIN es ea ON ea.g = pr.sa JOIN es eb ON eb.g = pr.sb "
        "JOIN nb na ON na.g = pr.sa JOIN nb nbx ON nbx.g = pr.sb "
        "LEFT JOIN itx ON itx.sa = pr.sa AND itx.sb = pr.sb) "
        "SELECT sa AS source_a, sb AS source_b, "
        "CAST(n_a + n_b - n_inter AS BIGINT) AS n_union_exact, "
        "round(est_u, 2) AS union_est, "
        "CAST(n_inter AS BIGINT) AS n_inter_exact, "
        "round(greatest(0.0, est_a + est_b - est_u), 2) AS inter_est, "
        "round(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 6) "
        "AS jaccard_exact, "
        "round(greatest(0.0, est_a + est_b - est_u) / est_u, 6) "
        "AS jaccard_est, "
        f"abs(est_u / CAST(n_a + n_b - n_inter AS DOUBLE) - 1.0) <= {sigma4} "
        "AS union_certified FROM j ORDER BY sa, sb"
    )


# --------------------------------------------------- log-linear quantiles

QUANTILE_TARGETS = ((1, 2), (9, 10), (99, 100))  # q = num/den: p50, p90, p99


def loglinear_quantiles(
    items: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    sub_bits: int = 3,
) -> DataFrame:
    """Mergeable log-linear-histogram quantile sketch with the exact
    answer computed alongside and the relative-error guarantee certified
    in-query — the fourth mergeable sketch beside CMS, Bloom and HLL
    (public method: HdrHistogram's log-linear bucketing, Tene; the same
    layout underlies Prometheus native histograms and the guarantee
    analysis mirrors DDSketch, Masson/Lee/Rim 2019 — a value lands in a
    bucket whose bounds straddle it within a fixed RELATIVE width, so
    any quantile estimate read off the histogram is relative-error
    bounded regardless of the distribution).

    Bucketing is EXACT INTEGER arithmetic end to end (no log/exp, so
    engine and oracle can never disagree on a boundary): value x ≥ 1
    has exponent b = length(bin(x)) − 1 (= floor(log₂ x), via the binary
    string — both engines print minimal binary) and sub-bucket
    sub = floor(x·S / 2^b) − S ∈ [0, S) with S = 2^sub_bits; the powers
    of two ride exact dyadic doubles. Bucket key b·S + sub is monotone
    in x, so the quantile at rank r = ceil(q·N) (integer: (N·qn + qd −
    1) DIV qd) is read from the first bucket whose cumulative count
    reaches r; the estimate is the bucket midpoint (L+U)/2 and the
    certified bound is (U−L)/(2L) ≤ 1/(2S) — every arithmetic step
    identical dyadic FP in both engines.

    Scale contract: ONE map-side-combinable hash aggregation of the
    values into ≤ 64·S bucket rows; the cumulative window runs over
    those bucket rows only. Registers MERGE by per-key SUM, certified by
    building per-source histograms, merging, and asserting identical
    estimates. The EXACT quantile (distinct-value histogram + window
    over distinct values) is the leg you drop at 100 TB — it exists so
    the guarantee is checked, not trusted.

    ``items`` needs (source, value ≥ 1 integer). Output: one row per
    target quantile — (q, n_values, est, exact_v, rel_err, err_bound,
    certified, merge_consistent), ordered by q.
    """
    from pyspark.sql import Window as W

    S = 1 << sub_bits
    x = F.greatest(F.col(value_col).cast("long"), F.lit(1))
    vals = items.select(F.col(source_col).alias("_src"), x.alias("_x"))
    b = (F.length(F.bin(F.col("_x"))) - 1).cast("int")
    pow2b = F.pow(F.lit(2.0), b.cast("double"))
    sub = (
        F.floor((F.col("_x") * S).cast("double") / pow2b) - F.lit(S)
    ).cast("int")
    keyed = vals.withColumn("_key", (b * S + sub).cast("int"))

    n_df = keyed.agg(F.count("*").cast("long").alias("_n"))
    qdf = (
        n_df.select(
            F.col("_n"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(qn / qd).alias("q"),
                            F.lit(qn).alias("_qn"),
                            F.lit(qd).alias("_qd"),
                        )
                        for qn, qd in QUANTILE_TARGETS
                    ]
                )
            ).alias("_t"),
        )
        .select(
            F.col("_t.q").alias("q"),
            F.col("_n").alias("n_values"),
            # ceil(q*N) in pure integers
            F.floor(
                (F.col("_n") * F.col("_t._qn") + F.col("_t._qd") - 1)
                / F.col("_t._qd")
            ).cast("long").alias("_rank"),
        )
    )

    cum_w = W.orderBy("_key").rowsBetween(W.unboundedPreceding, 0)

    def first_key_at_rank(hist: DataFrame, out: str) -> DataFrame:
        """hist: (_key, _c) bucket rows -> per-q first key whose
        cumulative count reaches the rank."""
        cum = hist.withColumn("_cum", F.sum("_c").over(cum_w))
        return (
            qdf.join(F.broadcast(cum), F.col("_cum") >= F.col("_rank"))
            .groupBy("q", "n_values")
            .agg(F.min("_key").alias(out))
        )

    direct_hist = keyed.groupBy("_key").agg(F.count("*").alias("_c"))
    merged_hist = (
        keyed.groupBy("_src", "_key")
        .agg(F.count("*").alias("_c"))
        .groupBy("_key")
        .agg(F.sum("_c").alias("_c"))
    )
    sel = first_key_at_rank(direct_hist, "_k").join(
        first_key_at_rank(merged_hist, "_k_m").select("q", "_k_m"), "q"
    )

    # exact quantile from the distinct-value histogram (the droppable leg)
    ex_hist = keyed.groupBy("_x").agg(F.count("*").alias("_c"))
    ex_cum = ex_hist.withColumn(
        "_cum", F.sum("_c").over(W.orderBy("_x").rowsBetween(W.unboundedPreceding, 0))
    )
    exact = (
        qdf.join(F.broadcast(ex_cum), F.col("_cum") >= F.col("_rank"))
        .groupBy("q")
        .agg(F.min("_x").alias("exact_v"))
    )

    kb = F.floor(F.col("_k") / S).cast("int")
    ksub = (F.col("_k") % S).cast("int")
    kpow = F.pow(F.lit(2.0), kb.cast("double"))
    lo = kpow * (F.lit(1.0) + ksub.cast("double") / S)
    hi = kpow * (F.lit(1.0) + (ksub + 1).cast("double") / S)
    est = (lo + hi) / F.lit(2.0)
    bound = (hi - lo) / (F.lit(2.0) * lo)
    # |est - exact| / exact, NOT est/exact - 1: the numerators are exact
    # dyadic values, so when the exact quantile sits exactly on the
    # bucket's lower bound the comparison rel <= bound holds by IEEE
    # division monotonicity; the quotient-minus-one form loses ulps in
    # the subtraction and flipped certified at exactly that boundary
    rel = (
        F.abs(est - F.col("exact_v").cast("double"))
        / F.col("exact_v").cast("double")
    )
    return (
        sel.join(exact, "q")
        .select(
            F.col("q"),
            F.col("n_values"),
            F.round(est, 6).alias("est"),
            F.col("exact_v").cast("long").alias("exact_v"),
            F.round(rel, 6).alias("rel_err"),
            F.round(bound, 6).alias("err_bound"),
            (rel <= bound).alias("certified"),
            (F.col("_k") == F.col("_k_m")).alias("merge_consistent"),
        )
        .orderBy("q")
    )


# ------------------------------------------------------------- KMV / theta

KMV_K = 256
#: md5_int's range is [0, 2^60) — 15 hex chars of md5 (ext/hashing.py)
KMV_HASH_SPACE = float(1 << 60)


def _kmv_kept(hashed: DataFrame, k: int) -> DataFrame:
    """(_g, _h): the ≤ k smallest DISTINCT hash values per group — the
    two-level selection shared by the KMV estimator and the theta-style
    overlap. Level 1 dense-ranks within (group, input-partition) so no
    corpus-sized group is sorted whole (Catalyst compiles both levels to
    WindowGroupLimit with map-side partial limits); level 2 dedupes and
    row-number-ranks the ≤ k×P candidates. The result is identical to a
    global per-group rank (superset property — see
    kmv_distinct_by_group), which is what the DuckDB oracles run."""
    from pyspark.sql import Window as W

    lvl1 = hashed.withColumn("_pid", F.spark_partition_id())
    w1 = W.partitionBy("_g", "_pid").orderBy("_h")
    cand = (
        lvl1.withColumn("_r", F.dense_rank().over(w1))
        .where(F.col("_r") <= k)
        .select("_g", "_h")
        .dropDuplicates(["_g", "_h"])
    )
    w2 = W.partitionBy("_g").orderBy("_h")
    return (
        cand.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= k)
        .select("_g", "_h")
    )


def kmv_distinct_by_group(
    items: DataFrame,
    group_col: str = "source",
    item_col: str = "item",
    k: int = KMV_K,
) -> DataFrame:
    """K-minimum-values distinct sketch per group, certified against the
    exact count in the same query (Bar-Yossef, Jayram, Kumar,
    Sivakumar & Trevisan 2002 — the estimator inside Apache
    DataSketches' theta sketch). The fifth mergeable sketch beside CMS,
    Bloom, HLL and the quantile histogram: where HLL merges by register
    max, a KMV sketch merges by re-taking the k smallest of the
    combined value sets, which additionally supports DIRECT intersection
    estimates (theta set algebra) rather than inclusion–exclusion.

    The sketch keeps the ``k`` smallest md5 hash values of the group's
    distinct items; with U_k = (k-th smallest)/2^60, the estimate is
    (k−1)/U_k — σ ≈ 1/√(k−2) relative. A group with fewer than ``k``
    distinct values is answered exactly by its own sketch size.

    Scale shape — the k-smallest selection NEVER sorts a corpus-sized
    group in one partition: level 1 ranks within (group,
    input-partition) — S×P window groups, each partition-local —
    keeping ≤ k distinct hash values per (group, partition), a superset
    of the true global k smallest under ANY partitioning (a value
    globally in the top-k smallest has < k values below it in total,
    hence < k within its own partition); level 2 dedupes and re-ranks
    only that ≤ k×P candidate set. The exact leg (count distinct items)
    is the droppable certification, as across this module.

    Output: (group_col, n_exact, kmv_est, rel_err) ordered by group.
    """
    # r15 single-pass restructure (see _materialize): the hashed stream
    # fed both the k-smallest selection and the exact count, re-running
    # the corpus lineage twice. One materialized distinct (group, item)
    # pass feeds both — _kmv_kept selects the k smallest DISTINCT
    # hashes, so running it over the deduplicated table is identical,
    # and the exact per-group distinct is count(*) over it. The
    # k-smallest windows stay lazy ABOVE the stored table, keeping the
    # WindowGroupLimit selection visible in the final plan.
    d = _materialize(
        items.select(
            F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
        ).distinct()
    )
    hashed = d.select("_g", md5_int(F.col("_i")).alias("_h"))
    kept = _kmv_kept(hashed, k)
    sk = kept.groupBy("_g").agg(
        F.count("*").cast("long").alias("_kn"),
        F.max("_h").alias("_hk"),
    )
    exact = d.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    est = F.when(F.col("_kn") < k, F.col("_kn").cast("double")).otherwise(
        F.lit(float(k - 1))
        / (
            F.greatest(F.col("_hk"), F.lit(1)).cast("double")
            / F.lit(KMV_HASH_SPACE)
        )
    )
    return (
        sk.join(exact, "_g")
        .select(
            F.col("_g").alias(group_col),
            "n_exact",
            F.round(est, 4).alias("kmv_est"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
        .orderBy(group_col)
    )


def kmv_group_sql(
    item_sql: str, group_col: str = "source", k: int = KMV_K
) -> str:
    """DuckDB mirror of ``kmv_distinct_by_group`` — same md5 hash, same
    rank-k selection (the oracle ranks globally per group; the engine's
    two-level selection keeps an identical final k-set by the superset
    property), identical double arithmetic for the estimate."""
    h = md5_int_sql("item")
    space = repr(KMV_HASH_SPACE)
    return (
        f"WITH items AS ({item_sql}), "
        f"h AS (SELECT DISTINCT {group_col} AS g, {h} AS h FROM items), "
        "r AS (SELECT g, h, row_number() OVER "
        "(PARTITION BY g ORDER BY h) AS r FROM h), "
        f"sk AS (SELECT g, CAST(count(*) AS BIGINT) AS kn, max(h) AS hk "
        f"FROM r WHERE r <= {k} GROUP BY g), "
        f"ex AS (SELECT {group_col} AS g, CAST(count(DISTINCT item) AS BIGINT) "
        "AS n_exact FROM items GROUP BY 1), "
        f"e AS (SELECT g, n_exact, CASE WHEN kn < {k} THEN CAST(kn AS DOUBLE) "
        f"ELSE {float(k - 1)!r} / (CAST(greatest(hk, 1) AS DOUBLE) / {space}) "
        "END AS est FROM sk JOIN ex USING (g)) "
        f"SELECT g AS {group_col}, n_exact, round(est, 4) AS kmv_est, "
        "round(abs(est - n_exact) / n_exact, 4) AS rel_err "
        f"FROM e ORDER BY {group_col}"
    )


def kmv_overlap(
    items: DataFrame,
    item_col: str = "item",
    group_col: str = "source",
    k: int = KMV_K,
    certify: bool = True,
) -> DataFrame:
    """Cross-group overlap matrix from KMV/theta sketches — the DIRECT
    set-algebra alternative to :func:`hll_overlap`'s inclusion–exclusion
    (the theta-sketch intersection of Apache DataSketches; estimator
    family Bar-Yossef et al. 2002, set operations Dasgupta, Lang, Rhodes
    & Thaler 2016, public methods): per unordered pair (a, b) the two
    k-smallest-hash sketches are combined under the SHARED threshold
    θ_ab = min(θ_a, θ_b) (θ = k-th smallest hash / 2^60, or 1 for a
    non-full sketch); values below θ_ab form a uniform θ_ab-sample of
    A∪B in which membership of BOTH sketches marks A∩B — so
    union_est = |S|/θ_ab, inter_est = |S∩both|/θ_ab, and the Jaccard
    estimate is the RATIO estimator |S∩both|/|S|. Unlike I-E the
    intersection here is a direct sample count, so its error scales
    with the intersection's own sampled size rather than the union's.

    Threshold membership is EXACT INTEGER arithmetic (ADVICE r13): the
    integer k-th-smallest hash rides the pair rows and the sample
    filter compares ``_h < least(T_a, T_b)`` directly — never
    round-tripping the threshold through a double divide-then-multiply
    near 2^60, which sits beyond the 2^53 exact-integer range of
    doubles and made membership ulp-sensitive. θ (the double) is used
    ONLY for the /θ scaling of the final estimates, where a half-ulp
    on a ratio is harmless and the oracle's arithmetic is identical.

    Scale contract: after the shared two-level k-smallest pass
    (:func:`_kmv_kept` — WindowGroupLimit-bounded, never a corpus-sized
    sort), everything pairwise runs on ≤ groups × k broadcast-joined
    rows. The pair fan-out replicates each group's ≤ k values to every
    pair it belongs to (S(S−1)/2 pairs) — the same quadratic-in-groups
    shape as hll_overlap, guarded the same way by the caller. The exact
    legs (per-group distinct counts + the pairwise item self-join) are
    the droppable certification, as across this module.

    Output per unordered pair (a < b): (source_a, source_b,
    n_union_exact, union_est, n_inter_exact, inter_est, jaccard_exact,
    jaccard_est, union_certified), ordered by (source_a, source_b).
    ``certify=False`` (production) drops the exact legs, returning
    (source_a, source_b, union_est, inter_est, jaccard_est)."""
    sigma4 = 4.0 / (k - 2) ** 0.5
    # r15 single-pass restructure (see _materialize): the ≤ groups × k
    # kept table is consumed three times below (thresholds + both pair-
    # replication joins) and, in certify mode, the distinct item table
    # three more times — each consumer previously re-ran the corpus
    # lineage. Certify mode materializes ONE distinct (group, item) pass
    # and derives both the sketch and the exact legs from it (_kmv_kept
    # selects the k smallest DISTINCT hashes, so the deduplicated input
    # is equivalent); the k-smallest windows stay lazy above the stored
    # table so the WindowGroupLimit selection stays visible in the
    # final plan. Production has no distinct pass to anchor on, so it
    # materializes the kept table itself.
    if certify:
        d = _materialize(
            items.select(
                F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
            ).distinct()
        )
        hashed = d.select("_g", md5_int(F.col("_i")).alias("_h"))
        kept = _kmv_kept(hashed, k)
    else:
        hashed = items.select(
            F.col(group_col).alias("_g"),
            md5_int(F.col(item_col)).alias("_h"),
        )
        kept = _materialize(_kmv_kept(hashed, k))
    stats = kept.groupBy("_g").agg(
        F.count("*").cast("long").alias("_kn"),
        F.max("_h").alias("_hk"),
    )
    # integer threshold T = k-th smallest hash (2^60 = whole space for a
    # non-full sketch); θ = T / 2^60 exists only to scale the estimates.
    # least() over the integer T matches least() over θ because x/2^60
    # rounds monotonically, so the double θ_ab is bit-identical to the
    # previous least-of-doubles form while membership is now exact.
    thr_i = F.when(
        F.col("_kn") < k, F.lit(1 << 60).cast("long")
    ).otherwise(F.greatest(F.col("_hk"), F.lit(1)))
    th = stats.select("_g", thr_i.alias("_ti"))
    ta = th.select(
        F.col("_g").alias("source_a"), F.col("_ti").alias("_tia")
    )
    tb = th.select(
        F.col("_g").alias("source_b"), F.col("_ti").alias("_tib")
    )
    tab_i = F.least("_tia", "_tib")
    pairs = (
        ta.crossJoin(F.broadcast(tb))
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            tab_i.alias("_tab_i"),
            (tab_i.cast("double") / F.lit(KMV_HASH_SPACE)).alias("_tab"),
        )
    )
    # replicate each group's kept values to its pairs (two broadcast
    # equi-joins on the tiny pair list, the hll_overlap shape)
    ka = kept.join(
        F.broadcast(pairs), kept["_g"] == pairs["source_a"]
    ).select("source_a", "source_b", "_tab_i", "_tab", "_h")
    kb = kept.join(
        F.broadcast(pairs), kept["_g"] == pairs["source_b"]
    ).select("source_a", "source_b", "_tab_i", "_tab", "_h")
    both = ka.unionByName(kb).where(F.col("_h") < F.col("_tab_i"))
    # per-(pair, value) multiplicity: 2 = value sampled in BOTH sketches
    perh = both.groupBy("source_a", "source_b", "_tab", "_h").agg(
        F.count("*").alias("_m")
    )
    cnt = perh.groupBy("source_a", "source_b", "_tab").agg(
        F.count("*").cast("long").alias("_nu"),
        F.sum((F.col("_m") == 2).cast("long")).cast("long").alias("_ni"),
    )
    union_est = F.col("_nu") / F.col("_tab")
    inter_est = F.col("_ni") / F.col("_tab")
    jac_est = F.col("_ni") / F.col("_nu")
    if not certify:
        return cnt.select(
            "source_a",
            "source_b",
            F.round(union_est, 2).alias("union_est"),
            F.round(inter_est, 2).alias("inter_est"),
            F.round(jac_est, 6).alias("jaccard_est"),
        ).orderBy("source_a", "source_b")
    # exact certification legs (droppable at scale — the hll_overlap
    # shape), all reading the one materialized distinct pass ``d``
    n_by = d.groupBy("_g").agg(F.count("*").alias("_n"))
    na = n_by.select(F.col("_g").alias("source_a"), F.col("_n").alias("_n_a"))
    nb = n_by.select(F.col("_g").alias("source_b"), F.col("_n").alias("_n_b"))
    x = d.select(F.col("_g").alias("source_a"), F.col("_i").alias("_it"))
    y = d.select(F.col("_g").alias("source_b"), F.col("_i").alias("_it"))
    inter = (
        x.join(y, "_it")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("_n_inter"))
    )
    out = (
        cnt.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .withColumn("_n_inter", F.coalesce(F.col("_n_inter"), F.lit(0)))
    )
    union_exact = F.col("_n_a") + F.col("_n_b") - F.col("_n_inter")
    rel = F.abs(union_est / union_exact.cast("double") - 1.0)
    return (
        out.select(
            "source_a",
            "source_b",
            union_exact.cast("long").alias("n_union_exact"),
            F.round(union_est, 2).alias("union_est"),
            F.col("_n_inter").cast("long").alias("n_inter_exact"),
            F.round(inter_est, 2).alias("inter_est"),
            F.round(
                F.col("_n_inter") / union_exact.cast("double"), 6
            ).alias("jaccard_exact"),
            F.round(jac_est, 6).alias("jaccard_est"),
            (rel <= F.lit(sigma4)).alias("union_certified"),
        )
        .orderBy("source_a", "source_b")
    )


def kmv_overlap_sql(
    item_sql: str, group_col: str = "source", k: int = KMV_K
) -> str:
    """DuckDB mirror of ``kmv_overlap`` — same md5 hash, same global
    per-group rank-k (identical k-set by the superset property), the
    same EXACT-INTEGER threshold comparison for sample membership
    (``h < least(T_a, T_b)``), and identical double arithmetic for the
    /θ-scaled estimates."""
    h = md5_int_sql("item")
    space = repr(KMV_HASH_SPACE)
    sigma4 = repr(4.0 / (k - 2) ** 0.5)
    return (
        f"WITH items AS ({item_sql}), "
        f"hv AS (SELECT DISTINCT {group_col} AS g, {h} AS h FROM items), "
        "r AS (SELECT g, h, row_number() OVER "
        "(PARTITION BY g ORDER BY h) AS r FROM hv), "
        f"kept AS (SELECT g, h FROM r WHERE r <= {k}), "
        "st AS (SELECT g, CAST(count(*) AS BIGINT) AS kn, max(h) AS hk "
        "FROM kept GROUP BY g), "
        f"th AS (SELECT g, CASE WHEN kn < {k} THEN {1 << 60} ELSE "
        "greatest(hk, 1) END AS t FROM st), "
        "pairs AS (SELECT a.g AS sa, b.g AS sb, least(a.t, b.t) AS tab_i, "
        f"CAST(least(a.t, b.t) AS DOUBLE) / {space} AS tab "
        "FROM th a CROSS JOIN th b WHERE a.g < b.g), "
        "rep AS (SELECT p.sa, p.sb, p.tab_i, p.tab, k1.h FROM pairs p "
        "JOIN kept k1 ON k1.g = p.sa "
        "UNION ALL SELECT p.sa, p.sb, p.tab_i, p.tab, k2.h FROM pairs p "
        "JOIN kept k2 ON k2.g = p.sb), "
        "below AS (SELECT * FROM rep WHERE h < tab_i), "
        "perh AS (SELECT sa, sb, tab, h, count(*) AS m FROM below "
        "GROUP BY 1, 2, 3, 4), "
        "cnt AS (SELECT sa, sb, tab, CAST(count(*) AS BIGINT) AS nu, "
        "CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ni "
        "FROM perh GROUP BY 1, 2, 3), "
        f"d AS (SELECT DISTINCT {group_col} AS g, item FROM items), "
        "nb AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1), "
        "ex AS (SELECT x.g AS sa, y.g AS sb, "
        "CAST(count(*) AS BIGINT) AS n_inter "
        "FROM d x JOIN d y ON x.item = y.item AND x.g < y.g GROUP BY 1, 2), "
        "j AS (SELECT c.sa, c.sb, c.tab, c.nu, c.ni, na.n AS n_a, "
        "nb2.n AS n_b, coalesce(ex.n_inter, 0) AS n_inter "
        "FROM cnt c JOIN nb na ON na.g = c.sa JOIN nb nb2 ON nb2.g = c.sb "
        "LEFT JOIN ex ON ex.sa = c.sa AND ex.sb = c.sb) "
        f"SELECT sa AS source_a, sb AS source_b, "
        "CAST(n_a + n_b - n_inter AS BIGINT) AS n_union_exact, "
        "round(nu / tab, 2) AS union_est, "
        "CAST(n_inter AS BIGINT) AS n_inter_exact, "
        "round(ni / tab, 2) AS inter_est, "
        "round(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 6) "
        "AS jaccard_exact, "
        "round(ni / nu, 6) AS jaccard_est, "
        f"(abs(nu / tab / CAST(n_a + n_b - n_inter AS DOUBLE) - 1.0) "
        f"<= {sigma4}) AS union_certified "
        "FROM j ORDER BY source_a, source_b"
    )
