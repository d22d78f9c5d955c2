"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine.

Scale posture (the 100 TB contract):
- Exact dedup is one hash-groupBy (partial agg map-side).
- Fuzzy dedup never materializes the O(n²) pair space: Jaccard pairs come
  from an inverted shingle index (join keyed on shingle), MinHash candidates
  from LSH band buckets, SimHash candidates from bit-chunk bands
  (pigeonhole: hamming ≤ d pairs must agree on ≥1 of d+1 chunks). The only
  all-pairs step is inside a bucket — bounded by design.
- All hashing is the portable md5-based scheme (ext/hashing.py) so the
  DuckDB oracle can replicate signatures bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from haf_plug_play_spark.ext.hashing import hash_params, md5_int
from haf_plug_play_spark.ext.materialize import materialize


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep the first row (by ``order_col``) per exact key — the
    first-create-wins pattern (T7) applied to content dedup.

    Ties on ``order_col`` break by a content hash over ALL columns
    (review r9): without it, row_number assigns tied rows by
    partition-arrival order and reruns keep different rows — violating
    the determinism rule this function exists to uphold over
    dropDuplicates (SURVEY §4.3.2; stream_exact_dedup's batch path
    routinely ties on its timestamp). Full-row duplicates hash equal, so
    either physical row yields the identical output row.

    Map-typed columns are excluded from the tie-break hash: xxhash64
    raises AnalysisException on MapType (maps have no canonical element
    order), and this is a public operator — inputs with map columns must
    still dedup. Ties that differ ONLY in a map column fall back to
    arbitrary-but-single-row selection, which is the pre-r9 behavior and
    the best any engine can do without a map canonicalization pass."""
    hashable = [c for c in df.columns if not _contains_map(df.schema[c].dataType)]
    tie = [F.xxhash64(*[F.col(c) for c in hashable])] if hashable else []
    w = W.partitionBy(*key_cols).orderBy(order_col, *tie)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _mat(df: DataFrame) -> DataFrame:
    """Materialize a shared subtree once (r15, guide §2.4).

    Catalyst clones a subtree per consumer, and per-consumer pushed
    filters fork the copies beyond runtime exchange reuse — the dedup
    pair builders re-ran their corpus shingle/signature passes 2–7×
    per query (XD-containment's plan held 40 parquet scans of one
    corpus). ``localCheckpoint`` pins the intermediate so every
    consumer reads the computed blocks instead of re-deriving them.
    Applied only where a subtree has ≥ 2 consumers and the recompute
    is a corpus-wide pass; the candidate-bounded verify stages stay
    lazy. Same trade as the LM count tables (ext/text.py): the stored
    footprint is proportional to the input partition's rows, the
    saved work is full recomputes of the most expensive projections."""
    return materialize(df)


def _shingle_arrays(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Per-doc distinct shingle arrays (_id, sh), materialized once —
    the shared base for candidate generation (exploded), signatures
    (hashed), sizes (F.size) and exact verification (array_intersect).
    Before r15 each of those consumers re-split and re-shingled the
    corpus text independently."""
    return _mat(
        df.select(
            F.col(id_col).alias("_id"),
            word_shingles(F.col(text_col), n).alias("sh"),
        )
    )


def _contains_map(dt) -> bool:
    """True if the type is, or nests, a MapType (unhashable by xxhash64)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text, as an array.

    The word array is LET-BOUND via a single-element transform: Spark SQL
    has no let expression, and referencing the raw ``split`` inside the
    shingle lambda would re-split the text once per shingle position
    (higher-order-function lambda bodies are re-evaluated per element —
    the same trap that made winnowing 15× slow). The outer transform
    evaluates ``split`` exactly once per row and binds it to a lambda
    variable, whose references are free."""
    words = F.split(F.lower(text), " ")

    def build(ws: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(ws) - F.lit(n - 1), F.lit(1))
        )
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
        )

    return F.get(F.transform(F.array(words), build), 0)


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


def _jaccard_verify(
    shing: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of a bounded candidate set via per-row
    shingle arrays (array_intersect) — shared by the LSH and df-capped
    inverted-index paths. ``shing`` is a (_id, sh) shingle-array frame
    (normally the query's materialized ``_shingle_arrays`` pass, so the
    two joins read computed arrays instead of re-shingling the corpus).
    Computes over the FULL shingle sets, so a capped or banded candidate
    generator never distorts the reported scores."""
    a = shing.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shing.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    # bigint counters to match the SQL-engine convention (Spark size() is INT)
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "union_sz",
            (F.size("sh_a") + F.size("sh_b")).cast("long") - F.col("inter"),
        )
        .withColumn("jaccard", F.round(F.col("inter") / F.col("union_sz"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )


def _capped_candidate_pairs(shing, threshold: float, cap, denom) -> DataFrame:
    """THE df-capped inverted-index candidate machinery, shared by the
    Jaccard and containment pair builders (review r9 — it was duplicated
    ~verbatim, and the 1e-6 threshold-margin fix had to be written
    twice): hot shingles (df > cap) drop from the candidate INDEX only;
    count-only per-doc stats (sz, n_hot) feed a sound upper bound
    ``ub_inter = c_inter + min(hot_a, hot_b)``; ``denom(ub_inter)`` is
    the caller's bound denominator (|A|+|B|−ub for Jaccard, min(|A|,|B|)
    for containment — refs sz_a/sz_b by name). ``cap=None`` skips the
    corpus-wide hot census entirely (n_hot ≡ 0; the bound is then exact
    index arithmetic). The 1e-6 margin keeps a pair whose exact score
    rounds up onto the threshold from being pruned before its verify.

    ``shing`` is the (_id, sh) shingle-array frame. Per-doc sizes come
    from ``F.size`` on the stored arrays — a projection, NOT a corpus-
    stream groupBy(_id): the shingle count per doc IS the array length
    (word_shingles is distinct), so the old stats aggregation shuffled
    the whole exploded stream to recompute a number each row already
    carries (r15, guide §2.4 — remove shuffles outright). Only the HOT
    hits (a broadcast-bounded slice) shuffle for the n_hot count.

    Returns (id_a, id_b) with id_a < id_b."""
    sh = shing.select("_id", F.explode("sh").alias("shingle"))
    sizes = shing.select("_id", F.size("sh").cast("long").alias("sz"))
    if cap is not None:
        # Hot shingles are FEW by definition (df > cap bounds their
        # number by corpus_shingles / cap) — broadcast the anti-join.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > cap)
            .select("shingle")
        )
        idx = sh.join(F.broadcast(hot), "shingle", "left_anti")
        hot_hits = (
            sh.join(F.broadcast(hot), "shingle")
            .groupBy("_id")
            .agg(F.count("*").alias("_nh"))
        )
        stats = sizes.join(hot_hits, "_id", "left").select(
            "_id", "sz", F.coalesce(F.col("_nh"), F.lit(0)).cast("long").alias("n_hot")
        )
    else:
        idx = sh
        stats = sizes.withColumn("n_hot", F.lit(0))
    x, y = idx.alias("a"), idx.alias("b")
    capped = (
        x.join(
            y,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("c_inter"))
    )
    sa = stats.select(
        F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"),
        F.col("n_hot").alias("hot_a"),
    )
    sb = stats.select(
        F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"),
        F.col("n_hot").alias("hot_b"),
    )
    ub_inter = F.col("c_inter") + F.least("hot_a", "hot_b")
    return (
        capped.join(sa, "id_a").join(sb, "id_b")
        .filter(ub_inter / denom(ub_inter) >= threshold - 1e-6)
        .select("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5, max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard ≥ threshold.

    Inverted-index plan: explode shingles → self-join on shingle (only
    colliding docs meet) → intersection counts → |A∪B| = |A|+|B|−|A∩B|.
    Output: (id_a, id_b, inter, union_sz, jaccard) with id_a < id_b.

    ``max_shingle_df`` is the standard skew guard for corpus scale: a
    corpus-wide stop-phrase shingle otherwise lands every document in one
    join bucket (quadratic blowup). With the cap, shingles appearing in more
    than ``max_shingle_df`` docs are dropped from the candidate INDEX only;
    surviving candidates are verified against their full shingle sets, so
    reported scores are exact.

    Recall contract (precise, not hand-wavy): a pair is MISSED iff every
    shingle the two documents share is corpus-hot. For organically similar
    documents that is vanishingly unlikely — but it is EXACTLY the shape of
    boilerplate duplicated in more than ``max_shingle_df`` documents (a
    license header, a template page): all of its shingles are hot, so two
    byte-near copies (true Jaccard ≈ 1.0) generate no candidate here. The
    escape hatch is the composed pipeline: exact dedup catches the
    byte-identical copies and MinHash-LSH (which has no df cap — band
    buckets bound the blowup instead) catches the near-copies, so
    ``dedup_decision`` over the union of pair sources keeps its recall
    (property-tested with a 200×-duplicated boilerplate doc in
    tests/test_scale_smoke.py::test_boilerplate_beyond_cap_caught_by_pipeline).
    Use this operator alone only when boilerplate-shaped duplication is
    out of scope or already removed.
    """
    shing = _shingle_arrays(df, id_col, text_col, n)
    sh = shing.select("_id", F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        # Sound prefilter: true inter ≤ c_inter + min(hot_a, hot_b), so
        # the Jaccard upper bound ub/( |A|+|B|−ub ) dominates the true
        # score; only pairs whose bound clears the threshold pay verify.
        candidates = _capped_candidate_pairs(
            shing,
            threshold,
            max_shingle_df,
            lambda ub: F.col("sz_a") + F.col("sz_b") - ub,
        )
        return _jaccard_verify(shing, candidates, threshold)
    # per-doc size = array length (word_shingles is distinct): a
    # projection over the stored arrays, not a corpus-stream groupBy
    sizes = shing.select("_id", F.size("sh").cast("long").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("union_sz"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 16, n: int = 3, seed: int = 1,
) -> DataFrame:
    """MinHash signature per doc: h_i = min over shingles of
    (a_i·md5_int(shingle) + b_i) mod P.

    Computed as a pure projection — shingle hashes live in a per-row array
    and each h_i is an array_min over a transform — so signatures cost ZERO
    shuffles at any scale (the naive explode+groupBy formulation shuffles
    the entire shingle set)."""
    shing = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), n).alias("sh")
    )
    return _sig_from_arrays(shing, num_hashes, seed).withColumnRenamed(
        "_id", id_col
    )


def _sig_from_arrays(shing: DataFrame, num_hashes: int, seed: int) -> DataFrame:
    """(_id, h0..h{k-1}) MinHash signature columns over a (_id, sh)
    shingle-array frame — the arithmetic of ``minhash_signatures``,
    factored so a query's materialized shingle pass feeds signatures,
    candidate generation and verification from ONE corpus read."""
    from haf_plug_play_spark.ext.hashing import MERSENNE_P

    params = hash_params(num_hashes, seed)
    xs = F.transform(F.col("sh"), lambda s: md5_int(s) % MERSENNE_P)
    sig_cols = [
        F.array_min(
            F.transform(F.col("_xs"), lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE_P)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    return shing.withColumn("_xs", xs).select("_id", *sig_cols)


def _band_bucket_rows(
    df: DataFrame | None, id_col: str, text_col: str,
    num_hashes: int, bands: int, n: int, seed: int,
    shing: DataFrame | None = None,
) -> DataFrame:
    """THE LSH band-bucket construction — signature split into bands of
    r = num_hashes/bands components, each band's key the ``_``-joined
    component values — shared by the full and incremental pair builders
    (review r9: it was copy-pasted, and the DuckDB oracle replicates the
    key encoding bit-for-bit, so a drift between the two copies breaks
    both the incremental-vs-full equality property and oracle parity).
    ``shing`` (a materialized shingle-array frame) skips the re-shingle.
    Returns (_id, bk=struct(band, key)) rows."""
    r = num_hashes // bands
    if shing is None:
        shing = df.select(
            F.col(id_col).alias("_id"),
            word_shingles(F.col(text_col), n).alias("sh"),
        )
    sig = _sig_from_arrays(shing, num_hashes, seed)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"h{bi * r + j}") for j in range(r)]
            ).alias("key"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        "_id", F.explode(F.array(*band_cols)).alias("bk")
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 16, bands: int = 4, n: int = 3,
    threshold: float = 0.5, seed: int = 1,
    shing: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    Banding: signature split into ``bands`` bands of r = num_hashes/bands
    rows; docs sharing any band bucket become candidates (collision prob
    1-(1-s^r)^bands). Candidates are then verified with exact Jaccard, so
    the output has no false positives — LSH only bounds the candidate set.

    One corpus pass: the shingle arrays materialize once (``shing``
    overrides for callers that already hold the pass, e.g.
    minhash_accuracy) and feed both the banded signatures and the exact
    verify; the bucket rows materialize once and feed both sides of the
    candidate self-join.
    """
    if num_hashes % bands:  # ValueError, not assert: -O strips asserts
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}) or the top signature components silently escape "
            "every band and the collision curve degrades"
        )
    if shing is None:
        shing = _shingle_arrays(df, id_col, text_col, n)
    buckets = _mat(
        _band_bucket_rows(None, id_col, text_col, num_hashes, bands, n, seed, shing=shing)
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    candidates = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x._id") < F.col("y._id")))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verify per candidate pair via array_intersect — the
    # candidate set is LSH-bounded, so this never touches the corpus-wide
    # shingle self-join the standalone ngram_jaccard_pairs needs.
    return _jaccard_verify(shing, candidates, threshold)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint per doc: per word w, h = md5_int(w); bit b of the
    fingerprint is 1 iff sum over words of ±1 (sign of bit b of h) > 0.

    Pure projection: word hashes in a per-row array, each bit-sum an
    aggregate over it — no explode, no shuffle at any scale.

    NULL-text rows are DROPPED (review r9), matching the Jaccard/MinHash
    paths, which lose them in their explode: a NULL text previously
    collapsed to fingerprint 0, making every pair of NULL-text docs a
    hamming-0 "duplicate" with no verify stage on this path to catch it."""
    hs = F.transform(F.split(F.lower(F.col(text_col)), " "), md5_int)
    with_h = df.where(F.col(text_col).isNotNull()).withColumn("_hs", hs)
    fp = None
    for b in range(bits):
        s = F.aggregate(
            F.col("_hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        term = F.when(s > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return with_h.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def hamming_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int,
    max_hamming: int,
) -> DataFrame:
    """Near-duplicate pairs with hamming(hash) ≤ max_hamming over ANY
    integer fingerprint column (simhash, image pHash, …).

    Banded: fingerprints split into max_hamming+1 bit-chunks; any pair
    within distance d agrees on ≥1 chunk (pigeonhole), so candidates are
    a chunk-keyed equi-join, never an all-pairs cross. ``bits`` must
    split evenly into the chunks — otherwise the top bits would escape
    every chunk and the pigeonhole guarantee would silently break."""
    chunks = max_hamming + 1
    if bits % chunks:
        raise ValueError(
            f"bits={bits} not divisible by max_hamming+1={chunks}: "
            "uncovered top bits would break the pigeonhole guarantee"
        )
    width = bits // chunks
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col(hash_col), c * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("key"),
        )
        for c in range(chunks)
    ]
    # materialized once: both sides of the candidate self-join read the
    # computed buckets, so the fingerprint lineage (a 32-bit-sum simhash
    # or an image decode+DCT pHash) runs ONCE, not per join side
    buckets = _mat(
        hashes.select(
            F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"),
            F.explode(F.array(*chunk_cols)).alias("bk"),
        )
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x._id") < F.col("y._id")))
        .select(
            F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"),
            F.col("x._h").alias("h_a"), F.col("y._h").alias("h_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 32, max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with hamming(simhash) ≤ max_hamming — the
    pigeonhole chunk banding lives in ``hamming_pairs`` (shared with the
    image pHash path, ext/multimodal.py:phash_images)."""
    sh = simhash(df, id_col, text_col, bits)
    return hamming_pairs(sh, id_col, "simhash", bits, max_hamming)


def embedding_cosine_pairs_exact(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.4, block_rows: int = 4096,
) -> DataFrame:
    """Exact cosine pairs ≥ threshold — the brute-force baseline. Correct at
    any threshold; quadratic COMPUTE by nature, but fully distributed: no
    driver-side materialization at any input size.

    Physical plan (distributed block matrix multiply): vectors are hashed
    into ceil(n / block_rows) blocks, each block packed into one row
    (groupBy + collect_list — ~block_rows·dim·8 B ≈ 2 MB per row). The
    upper-triangle block-pair fan-out is an EXPLODE of partner ids followed
    by an equi-join back to the packed blocks — deliberately not a
    theta-join (bx ≤ by), which would plan as a nested-loop broadcast of
    the multi-MB packed rows and die at corpus scale (244k blocks ≈ 1 TB
    broadcast at 10⁹ vectors). The equi-join shuffles O(n·B) bytes — each
    block replicated once per partner — which is the unavoidable cost of
    exact all-pairs; each pair row is then multiplied with NumPy/BLAS under
    mapInPandas. Every unordered vector pair lives in exactly one block-pair
    row, so output is exact-once: the diagonal block keeps id_a < id_b, an
    off-diagonal hit is emitted oriented (min, max).
    """
    import numpy as np

    from pyspark.sql.types import NumericType

    # fail LOUDLY on a non-numeric id (review r9): the cast below would
    # turn string ids into NULLs and die with an opaque TypeError inside
    # the numpy kernel; the LSH siblings (embedding_cosine_pairs,
    # semantic_dedup) carry the caller's id type — use those for string
    # ids, or pre-map ids to longs for this exact baseline
    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"embedding_cosine_pairs_exact requires a numeric {id_col!r} "
            f"(got {id_type.simpleString()}); embedding_cosine_pairs and "
            "semantic_dedup accept any id type"
        )

    n = df.count()
    # block_rows caps memory per task; the sqrt(2P) floor guarantees at
    # least ~P block-pair tasks so small corpora still use the whole cluster
    par = df.sparkSession.sparkContext.defaultParallelism
    n_blocks = max(1, -(-n // block_rows), min(n, math.isqrt(2 * par) + 1))
    v = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    blocks = (
        v.groupBy(F.pmod(F.xxhash64("_id"), F.lit(n_blocks)).alias("blk"))
        .agg(F.collect_list(F.struct("_id", "_v")).alias("items"))
    )
    partners = blocks.select(
        F.col("blk").alias("bx"),
        F.col("items").alias("items_x"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("by"),
    )
    pairs = partners.join(
        blocks.select(F.col("blk").alias("by"), F.col("items").alias("items_y")),
        "by",
    ).repartition(max(32, n_blocks), "bx", "by")

    def _mult(batches):
        import pandas as pd

        def unpack(items):
            ids = np.fromiter((it["_id"] for it in items), dtype=np.int64, count=len(items))
            mat = np.array([it["_v"] for it in items], dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            return ids, mat

        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                ids_x, U = unpack(row.items_x)
                diag = row.bx == row.by
                ids_y, V = (ids_x, U) if diag else unpack(row.items_y)
                # HALF_UP to 6 dp like F.round/DuckDB round (semantic_dedup's
                # BLAS path uses the identical fix): np.round's banker's
                # rounding flips presence at exact 5e-7 threshold boundaries
                raw = U @ V.T
                sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
                hit = sims >= threshold
                if diag:
                    hit &= ids_x[:, None] < ids_y[None, :]
                ai, bj = np.nonzero(hit)
                a, b, c = ids_x[ai], ids_y[bj], sims[ai, bj]
                outs.append(
                    pd.DataFrame(
                        {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "cosine": c}
                    )
                )
            if outs:
                yield pd.concat(outs)

    return pairs.mapInPandas(_mult, "id_a long, id_b long, cosine double")


def embedding_cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.9, n_planes: int = 8, seed: int = 5, dim: int = 64,
) -> DataFrame:
    """Embedding NEAR-DUPLICATE pairs: cosine ≥ threshold, for thresholds in
    the near-dup regime (≥ ~0.9) — below that the angle is too wide for any
    sublinear candidate generation and the exact baseline is the right tool.

    Candidates from random-hyperplane LSH (sign-pattern bucket join) with
    multi-probe (each vector also probes buckets at hamming distance 1, so
    boundary pairs aren't lost), then exact cosine verification — no false
    positives; recall is property-tested on clustered data.
    """
    from haf_plug_play_spark.ext.similarity import dot, hyperplane_bucket

    # NO materialized unit vectors (the CollapseProject-into-lambda O(dim²)
    # trap, measured and documented on similarity.cell_staged): buckets use
    # sign(v·plane), which equals sign(u·plane) because ‖v‖ > 0, and the
    # exact verify divides the raw dot by the once-computed norms. The
    # oracle mirrors this op order (registry._cosine_pairs_sql renorm=True).
    # materialized once: the vector+norm table has 3 consumers (bucket
    # assignment and both verify join sides) and the fold-dot norm is
    # per-row-expensive; likewise the bucket table feeds the probe
    # explode AND the exact side of the candidate join
    v = _mat(
        df.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
        ).select("_id", "_v", F.sqrt(dot(F.col("_v"), F.col("_v"))).alias("_n"))
    )
    # dim must match the vectors: mismatched hyperplanes null out every dot
    # product and collapse all rows into one bucket (silent O(n²) cross)
    #
    # The bucket join + multi-probe explode + distinct all run over (id,
    # bucket) pairs ONLY — 16 bytes/row. Carrying the vectors through
    # the ×(n_planes+1) probe explode and hashing them in the distinct
    # (the r2 formulation) shuffles ~dim·8·(n_planes+1) bytes per row and
    # makes the dedup hash O(dim); at 10⁹×768-dim that's the difference
    # between a 32 GB and a 55 TB candidate shuffle. Vectors are attached
    # to the (far smaller) deduped candidate set by two equi-joins.
    bucketed = _mat(
        v.withColumn("b", hyperplane_bucket(F.col("_v"), n_planes, seed, dim)).select(
            "_id", "b"
        )
    )
    probes = bucketed.select(
        "_id",
        F.explode(
            F.array(F.col("b"), *[F.col("b").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)])
        ).alias("b"),
    )
    x, y = bucketed.alias("x"), probes.alias("y")
    cand = (
        x.join(y, (F.col("x.b") == F.col("y.b")) & (F.col("x._id") < F.col("y._id")))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("v_a"), F.col("_n").alias("n_a"))
    vb = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("v_b"), F.col("_n").alias("n_b"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def connected_components(
    edges: DataFrame,
    all_ids: DataFrame | None = None,
    max_iters: int = 20,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components over an undirected dup-pair graph: every node
    gets ``cluster_id`` = the minimum id reachable from it. This is the step
    that turns near-duplicate PAIRS (Jaccard/MinHash/SimHash/cosine) into an
    actionable dedup decision — one canonical document per cluster.

    ``edges``: (id_a, id_b) rows. ``all_ids``: optional (id) DataFrame of
    the full corpus — when given, nodes absent from any pair come out as
    their own singleton cluster (a full census); otherwise only paired
    nodes appear.

    Algorithm: min-label propagation with pointer halving — each round
    does label(v) ← min(label(v), min over neighbors' labels), then the
    Shiloach–Vishkin-style shortcut label(v) ← min(label(v),
    label(label(v))) (a join against the label table itself, keyed by the
    current label). Propagation alone converges in O(component diameter)
    rounds; the halving step compresses label-chains geometrically, so the
    combination converges in O(log diameter) rounds — a 10k-node path
    settles in ~14 rounds instead of 10k (tested). Near-dup components are
    shallow by construction (bucket-clique-shaped), so typical inputs
    still finish in 2-3 rounds; ``max_iters`` bounds the truly
    pathological, raising if the fixpoint wasn't reached (silent wrong
    answers are worse than a loud bound). The bound counts PROPAGATION
    rounds: the final fixpoint-confirming probe (changed == 0) does not
    spend budget, so a component needing exactly ``max_iters`` improving
    rounds converges rather than raising. At 100 TB the per-round cost is
    the unavoidable edge shuffle plus the (node-sized, much smaller)
    halving self-join; ``localCheckpoint`` truncates the lineage each
    round so the plan stays O(1) deep instead of O(iters).
    ``reliable_checkpoint=True`` switches every truncation point to
    ``DataFrame.checkpoint()`` (requires the caller to have set
    ``spark.sparkContext.setCheckpointDir``) — on a real cluster an
    executor loss mid-iteration otherwise discards localCheckpoint blocks
    and fails the job (localCheckpoint trades resilience for speed; the
    right default in local mode and for short 2-3 round closures, the
    wrong one for hour-long 100 TB runs — now a flag, not just advice).

    Reference analog: the reference has no graph ops at all — this extends
    the engine surface for the LLM-pipeline dedup flow (SURVEY §2 ext).
    """
    def _chk(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable_checkpoint else materialize(df)

    # Checkpoint the symmetrized edge list ONCE: the pair generator behind
    # ``edges`` is typically an expensive lineage (LSH banding + verify),
    # and every propagation round joins against it — without the
    # checkpoint, Spark re-executes that whole pipeline per round.
    sym = _chk(
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    )
    # Initial labels FUSE the first propagation round: label₀(v) =
    # min(v, min neighbor id) — one groupBy over sym, the same shuffle
    # the old identity init paid for its distinct. Near-dup components
    # are clique-shaped, so most inputs are already at the fixpoint
    # after this init and the loop runs a single confirming round
    # (r15: one full propagation round of jobs saved per query).
    labels = _chk(
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_nm"))
        .select("id", F.least(F.col("id"), F.col("_nm")).alias("label"))
    )
    # max_iters + 1 probes: the last round a fixpoint is REACHED still
    # reports changed > 0; confirming it needs one more (free) probe.
    for it in range(max_iters + 1):
        neigh_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        prop = labels.join(neigh_min, "id", "left").select(
            "id", "label", F.least("label", "nmin").alias("mid_label")
        )
        # pointer halving: label(v) ← min(label(v), label(label(v))).
        # The parent lookup joins prop against itself on the CURRENT
        # label, so long min-label chains halve every round and total
        # rounds drop from O(diameter) to O(log diameter).
        par = prop.select(
            F.col("id").alias("p_id"), F.col("mid_label").alias("p_label")
        )
        # one checkpointed delta serves both the next labels and the
        # convergence probe — no second join, no extra pass
        delta = _chk(
            prop.join(par, prop.mid_label == par.p_id, "left")
            .select(
                "id",
                "label",
                F.least("mid_label", "p_label").alias("new_label"),
            )
        )
        changed = delta.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = delta.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
        if it == max_iters:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} rounds"
            )
    out = labels.select("id", F.col("label").alias("cluster_id"))
    if all_ids is not None:
        ids = all_ids.select(F.col(all_ids.columns[0]).alias("id"))
        out = ids.join(out, "id", "left").select(
            "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
        )
    return out


def dedup_decision(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
    deterministic_order: bool = True,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Full-corpus dedup census from a near-dup pair list: every document
    labeled with its cluster and whether it is the canonical keeper
    (minimum id in its cluster — deterministic, mirroring the exact-dedup
    census keep rule). Downstream training-data prep filters on ``keep``.

    ``deterministic_order=True`` (the default, for oracle/replay parity)
    ends the plan with a global sort on ``id_col`` — a range-partitioned
    TeraSort shape whose O(n log n) was the ENTIRE super-linear factor in
    the 100× scale run (SCALE.md: α 1.09 with the sort, linear joins
    without). Production consumers that only filter on ``keep`` (the
    curate funnel) pass ``False`` and pay pure linear joins; the output
    SET is identical either way, only row order differs."""
    cc = connected_components(
        pairs, all_ids=df.select(id_col), max_iters=max_iters,
        reliable_checkpoint=reliable_checkpoint,
    )
    out = cc.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("keep"),
    )
    return out.orderBy(id_col) if deterministic_order else out


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
) -> DataFrame:
    """Corpus-level duplicated-segment removal (the CCNet/RefinedWeb
    paragraph-dedup step, public method, adapted to fixed word windows for
    single-line corpora): split every document into consecutive
    ``seg_words``-word segments, keep only the globally FIRST occurrence of
    each distinct segment (ordered by (doc_id, seg_idx)), and reassemble
    each document from its surviving segments in order.

    Scale shape: the first-occurrence winner per segment is
    ``min(struct(doc_id, seg_idx))`` under a hash group-by — a partially
    aggregable min, so a boilerplate segment duplicated across millions of
    documents combines map-side instead of funnelling one hot key through a
    window's single reducer. Reassembly groups by doc_id (well distributed
    by construction). Documents whose every segment was removed survive as
    empty rows via the left join — the census must cover the whole corpus.

    Output: (id_col, n_segs, n_kept, clean_text) for EVERY input document.
    """
    words = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(words) / F.lit(seg_words)).cast("long")
    seg_structs = F.transform(
        F.sequence(F.lit(0), n_segs - F.lit(1)),
        lambda i: F.struct(
            i.cast("long").alias("seg_idx"),
            F.concat_ws(
                " ", F.slice(words, i * seg_words + F.lit(1), seg_words)
            ).alias("seg"),
        ),
    )
    # materialized once: the first-occurrence census and the keep join
    # both consume the segment stream (the split+slice+concat transform
    # otherwise runs twice over the corpus)
    segs = _mat(
        df.select(
            F.col(id_col), F.explode(seg_structs).alias("s")
        ).select(id_col, F.col("s.seg_idx").alias("seg_idx"), F.col("s.seg").alias("seg"))
    )
    firsts = segs.groupBy("seg").agg(
        F.min(F.struct(id_col, "seg_idx")).alias("first")
    )
    kept = segs.join(firsts, "seg").where(
        (F.col(id_col) == F.col(f"first.{id_col}"))
        & (F.col("seg_idx") == F.col("first.seg_idx"))
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s.seg,
            ),
        ).alias("clean_text"),
    )
    base = df.select(F.col(id_col), n_segs.alias("n_segs"))
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 8,
    seed: int = 7,
    dim: int = 64,
    pairs: str = "blas",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): cluster embeddings with a coarse quantizer, compare pairs ONLY
    within a cluster, and drop every vector whose cluster contains a
    more-canonical (lower-id) vector with cosine ≥ ``threshold``.

    Cells are assigned on the UNIT-NORMALIZED vector (spherical k-means
    assignment) so cosine-duplicates — identical directions at any
    magnitude — land in the same cell by construction; an L2 assignment on
    raw vectors would scatter scaled copies across cells and silently void
    the within-cell comparison.

    Scale shape: exactly the SemDeDup argument — the quadratic pair
    comparison is bounded per-cell (candidates ≈ n/k per cell, and k grows
    with the corpus), the join is an equi-join on the cell key, and the
    keep decision is a left-anti lookup. No all-pairs path exists. The
    seeded quantizer keeps the operator a pure function of
    (data, seed) — swap in ivf_centroids(...) for a trained codebook.

    Output: (id_col, cell, keep) for EVERY input vector.
    """
    from haf_plug_play_spark.ext.similarity import cell_staged, dot

    # Spherical cell assignment with no materialized unit vectors (the
    # CollapseProject-into-lambda O(dim²) trap and its fix are documented
    # on similarity.cell_staged, which this shares with the k-NN join).
    # Materialized once: the within-cell pair stage and the final keep
    # join both consume the assignment, and the k×dim distance transform
    # is the query's cost center — it must not run per consumer.
    a = _mat(cell_staged(emb, id_col, vec_col, n_centroids, seed, dim))
    if pairs == "expr":
        # bit-exact sequential-fold path: one fold dot per pair, same
        # accumulation order as the SQL oracle's list_dot_product
        x, y = a.alias("x"), a.alias("y")
        dropped = (
            x.join(
                y,
                (F.col("x.cell") == F.col("y.cell"))
                & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
            )
            .where(
                F.round(
                    dot(F.col("x._v"), F.col("y._v"))
                    / (F.col("x._n") * F.col("y._n")),
                    6,
                )
                >= threshold
            )
            .select(F.col(f"y.{id_col}").alias(id_col))
            .distinct()
            .withColumn("_dropped", F.lit(True))
        )
    else:
        # BLAS path (default): each cell's pair matrix is one Arrow batch
        # and one V·Vᵀ — the interpreted fold dot is the cost center at
        # any real cell size (XD-semantic measured 5.0 s → 2.7 s at sf0.1
        # on the 4000-vector planted corpus, with n_centroids 8 → 16;
        # higher-order functions never enter whole-stage codegen). Parity caveat as embedding_cosine_pairs_
        # exact: BLAS reassociates the sum, so oracle agreement assumes no
        # pair sits within ulps of the rounded threshold (the planted
        # corpus's closest pair is 0.05 away). The per-cell matrix must
        # fit a task — SemDeDup's own contract, held by growing
        # n_centroids with the corpus.
        def _drop_ids(pdf):
            import numpy as np
            import pandas as pd

            if len(pdf) < 2:
                return pd.DataFrame({id_col: pdf[id_col].iloc[0:0]})
            order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
            ids = pdf[id_col].to_numpy()[order]
            V = np.asarray([list(v) for v in pdf["_v"].iloc[order]])
            nn = pdf["_n"].to_numpy()[order]
            # round HALF_UP (away from zero) to match the expr path's
            # F.round and the oracle's round() — np.round is half-even,
            # which would flip a score landing on an exact 5e-7 tie
            raw = (V @ V.T) / np.outer(nn, nn)
            C = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
            # row index < col index ⇔ lower id (sorted): a col is dropped
            # if ANY lower-id row in its cell clears the threshold
            hit = np.triu(C >= threshold, k=1).any(axis=0)
            return pd.DataFrame({id_col: ids[hit]})

        from pyspark.sql import types as T

        # output schema carries the caller's actual id type (string ids
        # must not be forced through a hardcoded long)
        dropped = (
            a.groupBy("cell")
            .applyInPandas(_drop_ids, T.StructType([a.schema[id_col]]))
            .withColumn("_dropped", F.lit(True))
        )
    return a.join(dropped, id_col, "left").select(
        id_col, "cell", F.col("_dropped").isNull().alias("keep")
    )


def eval_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_frac: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-gram shingles overlap an evaluation set (the public n-gram-overlap
    protocol used by GPT-3 appx. C / PaLM / Llama dataset cards). A train
    doc is ``contaminated`` when at least ``min_frac`` of its DISTINCT
    shingles appear anywhere in the eval corpus.

    Scale shape: the eval side is tiny relative to a 100 TB corpus
    (benchmarks are thousands of documents), so its distinct-shingle set
    is built once and BROADCAST; the train side streams through one
    map-side hash semi-join — no shuffle of the big side for candidate
    detection. The per-doc overlap count is then one partial-aggregated
    groupBy on the train doc id, and the zero-overlap docs are restored
    by a final left join on the (already keyed) train projection.

    Output: one row per train doc — (id, n_shingles, n_overlap,
    overlap_frac, contaminated).
    """
    eval_shingles = (
        _shingle_rows(eval_set, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    # one materialized train-side shingle pass feeds BOTH the exploded
    # probe stream and the per-doc size table (two full corpus shingle
    # passes before r15)
    tr_arrays = _shingle_arrays(train, id_col, text_col, n)
    tr = tr_arrays.select("_id", F.explode("sh").alias("shingle"))
    sizes = tr_arrays.select(
        F.col("_id").alias(id_col),
        F.size("sh").cast("long").alias("n_shingles"),
    )
    hits = (
        tr.join(F.broadcast(eval_shingles), "shingle")
        .groupBy("_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    frac = F.round(F.col("n_overlap") / F.col("n_shingles"), 6)
    return (
        sizes.join(hits, sizes[id_col] == hits["_id"], "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            frac.alias("overlap_frac"),
            (frac >= F.lit(min_frac)).alias("contaminated"),
        )
    )


def semantic_decontam(
    emb: DataFrame,
    eval_filter,
    threshold: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    counterpart of ``eval_overlap``: flag corpus vectors whose MAX cosine
    similarity to ANY eval-set vector clears ``threshold``, catching the
    paraphrased/translated contamination n-gram overlap misses (the
    embedding-similarity decontamination protocol described in public
    dataset cards, e.g. the phi/FineWeb lineage).

    Scale shape: eval sets are KBs-MBs against a 100 TB corpus, so the
    eval side is BROADCAST and the corpus streams through one map-side
    cross join — n_corpus × n_eval dot products, each a sequential fold
    (same oracle-parity order as cosine_topk), no shuffle of the corpus
    until the per-doc max aggregation (map-side combinable). Output:
    (id, max_cos, contaminated), eval members excluded from the probed
    side, ordered by id.
    """
    from haf_plug_play_spark.ext.similarity import dot

    v = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        # NULL predicate values mean NOT eval (same contract as
        # dsir_weights' target_filter) — without the coalesce a NULL-flag
        # row would vanish from BOTH sides (~NULL is NULL) and silently
        # never be scored
        F.coalesce(eval_filter, F.lit(False)).alias("_is_eval"),
    ).select("*", F.sqrt(dot(F.col("_v"), F.col("_v"))).alias("_n"))
    ev = F.broadcast(
        v.filter(F.col("_is_eval")).select(
            F.col("_v").alias("_ev"), F.col("_n").alias("_en")
        )
    )
    corpus = v.filter(~F.col("_is_eval"))
    # LEFT broadcast join (not an inner cross): with an EMPTY eval set an
    # inner cross yields zero rows — "no corpus" to a caller — while the
    # left join keeps every corpus row once with a NULL eval side, so the
    # single aggregation emits max_cos NULL / contaminated False,
    # signaling "never scored" without any corpus-sized join-back.
    scored = corpus.join(ev, F.lit(True), "left").groupBy(id_col).agg(
        F.max(
            dot(F.col("_v"), F.col("_ev")) / (F.col("_n") * F.col("_en"))
        ).alias("_mc")
    )
    return scored.select(
        F.col(id_col),
        F.round(F.col("_mc"), 6).alias("max_cos"),
        F.coalesce(
            F.round(F.col("_mc"), 6) >= F.lit(threshold), F.lit(False)
        ).alias("contaminated"),
    ).orderBy(id_col)


def incremental_minhash_pairs(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
) -> DataFrame:
    """Incremental near-dup detection: every LSH pair that TOUCHES the new
    batch — (new × corpus) and (new × new) — without ever re-pairing the
    corpus against itself. This is the path a production pipeline actually
    runs daily: the corpus is deduped once, and each incoming batch only
    has to answer "is this new doc a near-copy of anything seen before, or
    of another new doc?".

    Scale shape: both sides compute zero-shuffle signatures; the corpus
    band index is SEMI-JOINED down to the band buckets the new batch
    occupies before any pairing (with |new| << |corpus|, the probed slice
    is ~|new| × bucket occupancy, not |corpus|). The pair join then runs
    new-side-left against the pruned union, so candidate volume scales
    with the batch, and corpus×corpus pairs are excluded by construction.
    Verification is exact Jaccard over the full shingle sets of only the
    docs that appear in some candidate pair. Ids must be unique across
    both inputs (the caller's contract, same as one concatenated corpus).

    Output matches minhash_lsh_pairs (id_a, id_b, inter, union_sz,
    jaccard) restricted to pairs with at least one new id — equality with
    the full-corpus run is property-tested (tests/test_ext.py).
    """
    if num_hashes % bands:  # ValueError, not assert: -O strips asserts
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}) or the top signature components silently escape "
            "every band and the collision curve degrades"
        )
    # ONE shingle pass per side, materialized: the batch arrays feed the
    # batch's buckets AND the verify; the corpus arrays feed the corpus
    # band index AND the (candidate-pruned) verify — before r15 each of
    # those consumers re-shingled its side's text from scratch.
    shing_new = _shingle_arrays(new_docs, id_col, text_col, n)
    shing_cor = _shingle_arrays(corpus, id_col, text_col, n)

    def band_buckets(shing: DataFrame) -> DataFrame:
        return _band_bucket_rows(
            None, id_col, text_col, num_hashes, bands, n, seed, shing=shing
        )

    # the batch buckets have 3 consumers (bucket-key distinct, both join
    # sides) — materialize; the corpus index is consumed once, stays lazy
    nb = _mat(band_buckets(shing_new))
    cb = band_buckets(shing_cor)
    # prune the corpus index to buckets the new batch occupies — the ONLY
    # corpus-wide step over signatures, and it's a semi-join on the band key
    cb_hot = cb.join(nb.select("bk").distinct(), "bk", "semi")
    x = nb.alias("x")
    y = nb.unionByName(cb_hot).alias("y")
    candidates = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x._id") != F.col("y._id")))
        .select(
            F.least(F.col("x._id"), F.col("y._id")).alias("id_a"),
            F.greatest(F.col("x._id"), F.col("y._id")).alias("id_b"),
        )
        .distinct()
        # materialized once (bounded: LSH-candidate-sized) so the id
        # prune below doesn't recompute the whole signature lineage
        .transform(materialize)
    )
    # verify-side prune: shingle arrays already exist (computed once for
    # the band index); the semi-join bounds the verify joins to docs that
    # appear in some candidate pair, keeping the pair stage O(batch).
    cand_ids = (
        candidates.select(F.col("id_a").alias("_id"))
        .unionByName(candidates.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    both = shing_new.unionByName(shing_cor).join(cand_ids, "_id", "semi")
    return _jaccard_verify(both, candidates, threshold)


def _span_hash_expr(text_col: str, window: int) -> Column:
    """Let-bound md5 span-hash array: stride-1 windows over LOWERCASED
    words, truncated tail span for short docs — shared by the span
    census and the region-assembly removal (review r9: the two copies
    must stay bit-identical or their census/removal agreement and the
    DuckDB oracle parity silently break). The word array is let-bound
    via a single-element transform (the winnowing trick): referencing
    the raw split inside the span lambda would re-split the text once
    per span position — O(words²)/row, the documented HOF re-eval trap."""
    ws = F.split(F.lower(F.col(text_col)), " ")

    def build(wsb):
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(wsb) - F.lit(window - 1), F.lit(1))
        )
        return F.transform(
            idx, lambda i: md5_int(F.concat_ws(" ", F.slice(wsb, i, window)))
        )

    return F.get(F.transform(F.array(ws), build), 0)


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Exact-substring duplication signal (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" substring contract,
    word-granular): hash EVERY length-``window`` word span at stride 1 —
    overlapping, position-sensitive, duplicates kept, unlike
    ``segment_dedup``'s fixed non-overlapping grid — census the span
    hashes across the corpus, and report per document how much of it is
    covered by spans that occur more than once corpus-wide. Pipelines cut
    or drop documents above a dup_frac threshold.

    Plan shape: span hashes are built inside a per-row array transform
    (the winnowing staging trick — the md5 array materializes once per
    row in its own projection), the census is one hash aggregation on the
    span hash (map-side combinable; a boilerplate span duplicated across
    millions of docs partially aggregates instead of funnelling one
    reducer), and the per-doc rollup re-keys on the doc id. Two shuffles
    total, both keyed, linear in corpus word count.

    Documents shorter than ``window`` words contribute one truncated span
    (the winnowing convention) so every doc appears in the output.
    Output: (id, n_spans, n_dup_spans, dup_frac) ordered by id.
    """
    # materialized once: the census and the per-doc rollup both consume
    # the span-hash stream; without the pin each re-ran the md5-per-span
    # projection over the whole corpus
    spans = _mat(
        df.select(
            F.col(id_col), _span_hash_expr(text_col, window).alias("__spans")
        ).select(
            F.col(id_col), F.explode("__spans").alias("h")
        )
    )
    census = spans.groupBy("h").agg(F.count("*").alias("_n"))
    return (
        spans.join(census, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum((F.col("_n") > 1).cast("long")).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_spans") / F.col("n_spans"), 6)
        )
        .orderBy(id_col)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = 100,
) -> DataFrame:
    """Near-CONTAINMENT pairs: C(A→B) = |A∩B| / |A| over n-gram shingle
    sets — the asymmetric overlap that Jaccard structurally misses. An
    excerpt quoted inside a much longer document has containment ≈ 1.0
    but Jaccard ≈ |A|/|B| ≈ 0, so a Jaccard-thresholded dedup never sees
    it; containment is the standard signal for quote/excerpt/boilerplate-
    embedding detection (Broder's resemblance-vs-containment distinction).

    Same candidate machinery as ``ngram_jaccard_pairs``'s capped path
    (inverted shingle index, hot shingles dropped from the index only,
    count-based upper bound, full-set verify): the sound prefilter here is
    ``(c_inter + min(hot_a, hot_b)) / min(sz_a, sz_b) >= threshold`` —
    the numerator bounds the true intersection from above and the
    denominator is the smaller set, so the bound dominates BOTH directed
    containments; surviving candidates verify against full shingle
    arrays (exact scores, no cap distortion). Same recall contract as the
    Jaccard path for all-hot boilerplate (see ngram_jaccard_pairs).

    Output: (id_a, id_b, inter, cont_a, cont_b) with id_a < id_b, kept
    when max(cont_a, cont_b) >= threshold; cont_a = inter/|A|.
    """
    shing = _shingle_arrays(df, id_col, text_col, n)
    # the bound ub/min(|A|,|B|) dominates BOTH directed containments;
    # cap=None now skips the hot census entirely instead of running a
    # full corpus-wide shingle groupBy against an unreachable 2^62 cap
    candidates = _capped_candidate_pairs(
        shing, threshold, max_shingle_df, lambda ub: F.least("sz_a", "sz_b")
    )
    a2 = shing.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b2 = shing.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    return (
        candidates.join(a2, "id_a").join(b2, "id_b")
        .withColumn("inter", inter)
        .withColumn("cont_a", F.round(F.col("inter") / F.size("sh_a"), 6))
        .withColumn("cont_b", F.round(F.col("inter") / F.size("sh_b"), 6))
        .filter(F.greatest("cont_a", "cont_b") >= threshold)
        .select("id_a", "id_b", "inter", "cont_a", "cont_b")
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """APPLY the exact-substring dedup the span census only reports
    (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better", the ExactSubstr tool's contract, word-granular) with
    REGION-assembly semantics (VERDICT r6 #3): per document, the
    stride-1 duplicated-span occurrences merge into maximal OVERLAPPING
    intervals — the maximal duplicated regions, since any duplicated
    substring of ≥ ``window`` words is exactly a run of overlapping
    duplicated w-spans — and the keep/cut decision is made PER REGION: a
    region survives (whole, contiguous) iff it contains at least one
    span whose canonical occurrence (min (doc_id, pos) per span hash) is
    here; otherwise the region is cut entirely. Every duplicated span
    hash still has ≥ 1 surviving occurrence (its canonical's region
    survives); the former per-span formulation additionally guaranteed ≤
    1, at the price of the sub-span-canonical corner: a window-sized
    sub-span owned by a lower-id third document punched a HOLE in the
    region's main holder, splitting the surviving copy. Region
    granularity keeps the canonical copy contiguous (ExactSubstr's
    maximal-match reading); the extra retention is bounded by one
    sub-span occurrence per such corner (pinned in
    tests/test_ext.py::test_span_removal_region_contiguity). Abutting
    but NON-overlapping occurrences (a block repeated back-to-back) stay
    separate regions, so within-doc repeats still dedup.

    Plan shape: span hashes ride the XD-spans machinery (per-row let-
    bound transform, stride 1, truncated tail span); the census is one
    map-side-combinable aggregation that ALSO carries each hash's
    canonical occurrence (a min(struct)); region assembly is
    gaps-and-islands over the DUPLICATED-occurrence stream only (two
    windows keyed by the doc — bounded by duplicated spans, not corpus
    words); cut regions join back per doc as a bounded sorted interval
    list and the cut is a per-row position-indexed filter (word j
    survives iff no cut interval [a, b] covers it — O(words × regions)
    per row, and regions ≤ flagged-starts/1, far fewer than the per-span
    start list the r6 cut scanned).

    Hashing is over lowercased words (the corpus-wide convention);
    emitted words keep their ORIGINAL casing — positions align because
    lowercasing never touches the delimiter.

    Output: (id, n_words, n_removed, clean_text) ordered by id.
    """
    from pyspark.sql.window import Window

    if window < 1:
        # w=0 would hash the empty string at every position (one corpus-
        # wide "duplicated" hash → near-total text destruction with no
        # error); w<0 dies mid-job as an opaque negative-slice exception
        raise ValueError(f"span window must be >= 1, got {window}")
    w = window
    # materialized once: census and the duplicated-occurrence stream both
    # consume the positional span hashes (two md5-per-span corpus passes
    # before r15)
    spans = _mat(
        df.select(
            F.col(id_col), _span_hash_expr(text_col, window).alias("__spans")
        ).select(
            F.col(id_col), F.posexplode("__spans").alias("_p0", "h")
        ).select(F.col(id_col), (F.col("_p0") + 1).alias("pos"), "h")
    )
    census = spans.groupBy("h").agg(
        F.count("*").alias("_n"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "_first"
        ),
    )
    dup = (
        spans.join(census, "h")
        .filter(F.col("_n") > 1)
        .select(
            F.col(id_col),
            "pos",
            (
                (F.col(id_col) == F.col("_first.d"))
                & (F.col("pos") == F.col("_first.p"))
            ).alias("_canon"),
        )
    )
    # gaps-and-islands: a span starts a NEW region iff it does not
    # overlap the furthest end reached so far (strictly >, so abutting
    # repeats stay separate regions and within-doc dedup still fires)
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(w - 1)).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.select(
        F.col(id_col),
        "pos",
        "_canon",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("_nw"),
    ).withColumn("_isl", F.sum("_nw").over(w_ord))
    regions = isl.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("a"),
        (F.max("pos") + F.lit(w - 1)).alias("b"),
        F.max(F.col("_canon").cast("int")).alias("_anyc"),
    )
    cut = (
        regions.filter(F.col("_anyc") == 0)
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("a"), F.col("b")))).alias(
                "_cuts"
            )
        )
    )
    wo = F.split(F.col(text_col), " ")
    staged = (
        df.select(id_col, text_col)
        .join(cut, id_col, "left")
        .select(
            F.col(id_col),
            wo.alias("_wo"),
            F.coalesce(
                F.col("_cuts"), F.array().cast("array<struct<a:int,b:int>>")
            ).alias("_cuts"),
        )
    )
    kept = F.filter(
        F.col("_wo"),
        lambda x, i: ~F.exists(
            F.col("_cuts"),
            lambda c: (c["a"] <= i + 1) & (i + 1 <= c["b"]),
        ),
    )
    return (
        staged.select(
            F.col(id_col),
            # NULL text → 0 counters (review r9); explicit isNull, not
            # coalesce — under legacy sizeOfNull (this engine's session)
            # size(NULL) is -1, not NULL. clean_text stays NULL, faithful
            # to the input.
            F.when(F.col("_wo").isNull(), F.lit(0))
            .otherwise(F.size("_wo"))
            .cast("long")
            .alias("n_words"),
            kept.alias("_kept"),
        )
        .select(
            id_col,
            "n_words",
            F.when(F.col("_kept").isNull(), F.lit(0))
            .otherwise(F.col("n_words") - F.size("_kept"))
            .cast("long")
            .alias("n_removed"),
            F.array_join("_kept", " ").alias("clean_text"),
        )
        .orderBy(id_col)
    )


def minhash_accuracy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 1,
) -> DataFrame:
    """MinHash estimator accuracy audit over the LSH candidate set — the
    driver-visible quality measurement for the near-dup family, the
    dedup analogue of the ANN recall query: how close the signature
    estimate tracks exact Jaccard, certified against the estimator's own
    statistical guarantee (public method: Broder 1997 — each signature
    component matches with probability exactly J, so the match fraction
    over k components is Binomial(k, J)/k with standard error
    sqrt(J(1−J)/k); the Mining of Massive Datasets ch.3 formulation).

    Per LSH candidate pair (threshold 1e-6 — the whole candidate set
    minus rounded-Jaccard-0 band collisions, the IDENTICAL cutoff the
    DuckDB oracle applies; ADVICE r8 flagged the engine passing 0.0
    here as an engine/oracle asymmetry): est = |{i : hᵢ(a)=hᵢ(b)}|/k
    vs the exact
    full-shingle-set Jaccard, both 6-dp rounded before the error
    arithmetic so engine and oracle subtract identical values. The audit
    reports MAE, worst error, and the fraction of pairs inside TWO
    binomial standard errors of exact (per-pair σ, computed from the
    exact J) — certified ⇔ that fraction ≥ 0.5, a deliberately loose
    floor (the binomial 2σ expectation is ~95%, but σ = 0 ties at J = 1
    and small candidate sets need slack; the floor catches a BROKEN
    estimator — wrong hash family, misaligned components — not sampling
    noise).

    Scale contract: bounded by the LSH candidate set like every verify
    path here — signatures are zero-shuffle projections, the candidate
    join is (id,bucket)-keyed, the estimate is a k-term struct
    comparison per candidate row, and the final report is one
    aggregation to a single row.

    Output: one row — (n_pairs, mae, max_err, frac_within_2se,
    certified).
    """
    k = num_hashes
    # ONE materialized shingle pass feeds the pair builder (buckets +
    # verify) and the audit's own signature table — before r15 the corpus
    # was re-shingled for each
    shing = _shingle_arrays(df, id_col, text_col, n)
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, num_hashes, bands, n, threshold=1e-6,
        seed=seed, shing=shing,
    )
    sig = _sig_from_arrays(shing, num_hashes, seed)
    matches = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(k)
    )
    # prune the signature table to CANDIDATE ids before the two joins
    # (review r9): the audit's result is bounded by the LSH candidate
    # set, so shuffling the full corpus-wide signature table into each
    # join paid a corpus-sized exchange for a candidate-sized answer —
    # the same semi-join discipline incremental_minhash_pairs documents
    cand_ids = (
        pairs.select(F.col("id_a").alias("_cid"))
        .unionByName(pairs.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    sig = sig.join(
        cand_ids, sig["_id"] == F.col("_cid"), "left_semi"
    )
    sa = sig.select(
        F.col("_id").alias("id_a"),
        *[F.col(f"h{i}").alias(f"_a{i}") for i in range(k)],
    )
    sb = sig.select(
        F.col("_id").alias("id_b"),
        *[F.col(f"h{i}").alias(f"_b{i}") for i in range(k)],
    )
    per = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("jaccard").alias("_j"),
            F.round(matches / F.lit(float(k)), 6).alias("_est"),
        )
        .withColumn("_err", F.round(F.abs(F.col("_est") - F.col("_j")), 6))
        .withColumn(
            "_se", F.sqrt(F.col("_j") * (1.0 - F.col("_j")) / F.lit(float(k)))
        )
    )
    return per.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("_err"), 6).alias("mae"),
        F.round(F.max("_err"), 6).alias("max_err"),
        F.round(
            F.avg((F.col("_err") <= 2.0 * F.col("_se")).cast("int")), 6
        ).alias("frac_within_2se"),
        # empty candidate set → vacuously certified TRUE, never the
        # tri-state NULL a gate would misread (review r9); mae/max_err
        # stay NULL — there is honestly no error to report
        F.coalesce(
            F.avg((F.col("_err") <= 2.0 * F.col("_se")).cast("int")) >= 0.5,
            F.lit(True),
        ).alias("certified"),
    )


def dedup_decision_by_quality(
    df: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
    max_iters: int = 20,
    deterministic_order: bool = False,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Quality-aware dedup census: like :func:`dedup_decision`, but the
    canonical keeper per near-dup cluster is the HIGHEST-QUALITY copy
    (ties → minimum id), not the minimum id — the selection rule
    production pipelines actually want (RefinedWeb/FineWeb keep the
    best-scoring duplicate; min-id keeps whichever crawled first).

    ``score`` is any per-row quality expression over ``df`` (6-dp
    rounded scores recommended so engine and oracle compare identical
    doubles). Keeper selection is ``min(struct(−score, id))`` per
    cluster — one map-side-combinable aggregation (lexicographic struct
    min), NO window, so a million-document cluster costs the same as a
    pair. Negating the SCORE (numeric by definition) rather than the id
    keeps the tie-break order-agnostic: ``id_col`` may be any orderable
    type, including string doc ids (ADVICE r8 — the previous
    ``max(struct(score, −id))`` assumed a numeric id). NULL scores are
    coalesced to −inf BEFORE negation so an unscored copy can never win
    a cluster (struct ordering sorts a NULL field first under min, which
    would otherwise invert the keep-the-best rule); an all-NULL cluster
    degrades to minimum id. The keeper table joins back on cluster_id
    (keyed shuffle, same family as the census itself).

    Output: (id_col, cluster_id, best_id, keep) for EVERY document,
    keep ⇔ id == best_id; singleton clusters keep themselves.
    ``deterministic_order`` as in :func:`dedup_decision` (default False:
    this variant's only in-repo consumers sort at the presentation layer
    or not at all — don't pay the TeraSort twice).
    """
    cc = connected_components(
        pairs, all_ids=df.select(id_col), max_iters=max_iters,
        reliable_checkpoint=reliable_checkpoint,
    )
    scored = df.select(F.col(id_col).alias("_sid"), score.alias("_q"))
    # materialized once: the per-cluster best aggregation and the final
    # census join both consume the labeled table, whose lineage includes
    # the (possibly expensive) quality-score expression over the corpus
    labeled = _mat(
        cc.join(scored, cc["id"] == scored["_sid"]).select(
            "id", "cluster_id", "_q"
        )
    )
    best = (
        labeled.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.coalesce(F.col("_q"), F.lit(float("-inf")))).alias(
                        "_nq"
                    ),
                    F.col("id").alias("_i"),
                )
            ).alias("_b")
        )
        .select("cluster_id", F.col("_b._i").alias("best_id"))
    )
    out = (
        labeled.join(best, "cluster_id")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            "best_id",
            (F.col("id") == F.col("best_id")).alias("keep"),
        )
    )
    return out.orderBy(id_col) if deterministic_order else out
