"""Driver-facing extension queries (the LLM-data-pipeline operator surface)
with DuckDB oracle SQL.

Hash-bearing oracles (minhash/simhash/fingerprints) are *generated* from the
same constants as the engine (ext/hashing.py), so engine and oracle agree
bit-for-bit by construction. Float-ranking oracles (cosine top-k, ANN,
cosine pairs) mirror the engine's floating-point op STRUCTURE — normalize,
dot, round to 6 dp — with seed-derived plane/centroid literals embedded in
the SQL, so bucket/cell assignment reproduces exactly. For the
expression-fold paths (top-k, LSH verify) the accumulation order is
sequential on both engines (~1 ulp apart); the exact-pairs path multiplies
with BLAS (blocked/pairwise accumulation), so its parity additionally
assumes no pair's cosine sits within a few ulps of a 6-dp rounding
boundary or the threshold — overwhelmingly likely on real data and
validated empirically at sf0.01, but not a bit-level guarantee. Only
QAD-approx-distinct certifies its HLL estimate in-query (exact count + bounds flag), so even the approximate path carries a hard oracle.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from haf_plug_play_spark.ext.materialize import materialize

from haf_plug_play_spark.ext import bpe as bpe_mod
from haf_plug_play_spark.ext import dedup, similarity, text as xt
from haf_plug_play_spark.ext import sampling as sampling_mod
from haf_plug_play_spark.ext.hashing import MERSENNE_P, hash_params, md5_int_sql
from haf_plug_play_spark.sources.tables import load_table


def _spread(df: DataFrame) -> DataFrame:
    """Gated source spread for CPU-heavy per-row pipelines (minhash/simhash/
    shingle hashing). The small-SF fixtures are single parquet files, which
    Spark scans as 1-2 partitions — the per-row md5/array-fold work then
    runs on 1/32 of the machine. Round-robin repartition ONLY when the scan
    has fewer partitions than cores: at production scale (input splits >>
    cores) this is a no-op, so the shuffle-free plan contract still holds
    where it matters; round-robin is data-independent, so no key, no skew.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    # proxy the scan's split count by its file count — cheap catalog
    # metadata, no RDD conversion / py4j plan materialization per query
    # build. Files >= cores ⇒ the scan already parallelizes (splits >=
    # files); fewer big files than cores is not a shape the small-fixture
    # branch this guard exists for produces.
    n_in = len(df.inputFiles())
    if n_in == 0:
        # not a file-backed scan (an in-memory frame): the single-big-file
        # shape this guard exists for cannot occur, and probing df.rdd
        # would materialize the plan through py4j on every query build
        return df
    if n_in < par:
        return df.repartition(par)
    return df

# ---------------------------------------------------------------- SQL helpers

# distinct word n-gram shingles of lower(text), DuckDB spelling
def _shingles_sql(n: int) -> str:
    w = "string_split(lower(text), ' ')"
    return (
        f"list_distinct([array_to_string({w}[i:i+{n - 1}], ' ') "
        f"for i in range(1, greatest(len({w})-{n - 1}, 1)+1)])"
    )


def _langid_case_sql() -> str:
    hits = {
        lang: f"len(list_intersect(string_split(lower(text), ' '), "
        f"[{', '.join(repr(w) for w in xt.LANG_STOPWORDS[lang])}]))"
        for lang in xt.LANG_PRIORITY
    }
    branches = []
    langs = list(xt.LANG_PRIORITY)
    for i, lang in enumerate(langs):
        conds = [f"{hits[lang]} > 0"]
        conds += [f"{hits[lang]} > {hits[o]}" for o in langs[:i]]
        conds += [f"{hits[lang]} >= {hits[o]}" for o in langs[i + 1 :]]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def _minhash_sig_sql(num_hashes: int, n: int, seed: int) -> str:
    params = hash_params(num_hashes, seed)
    x = f"({md5_int_sql('shingle')} % {MERSENNE_P})"
    mins = ", ".join(
        f"min(({a} * {x} + {b}) % {MERSENNE_P}) AS h{i}" for i, (a, b) in enumerate(params)
    )
    return (
        f"SELECT doc_id, {mins} FROM "
        f"(SELECT doc_id, unnest({_shingles_sql(n)}) AS shingle FROM documents) "
        f"GROUP BY doc_id"
    )


def _simhash_sql(bits: int) -> str:
    h = md5_int_sql("w")
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return (
        f"WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents), "
        f"h AS (SELECT doc_id, {h} AS h FROM w), "
        f"s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id) "
        f"SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM s"
    )


_JACCARD_CTE = (
    "sh AS (SELECT doc_id, unnest({shingles}) AS shingle FROM documents), "
    "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "
    "ints AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter "
    "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2), "
    "pairs AS (SELECT id_a, id_b, inter, sa.sz + sb.sz - inter AS union_sz, "
    "round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard "
    "FROM ints JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b)"
)


def _jaccard_pairs_sql(n: int, threshold: float, max_df: int | None = None) -> str:
    if max_df is None:
        return (
            f"WITH {_JACCARD_CTE.format(shingles=_shingles_sql(n))} "
            f"SELECT id_a, id_b, inter, union_sz, jaccard FROM pairs "
            f"WHERE jaccard >= {threshold} ORDER BY id_a, id_b"
        )
    # df-capped candidate index (the engine's skew guard), full-set verify:
    # scores come from the uncapped pair CTE, candidacy from the capped one
    return (
        f"WITH {_JACCARD_CTE.format(shingles=_shingles_sql(n))}, "
        f"dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1), "
        f"idx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle) "
        f"WHERE dfc.df <= {max_df}), "
        f"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        f"FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id) "
        f"SELECT p.id_a, p.id_b, p.inter, p.union_sz, p.jaccard FROM pairs p "
        f"JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b "
        f"WHERE p.jaccard >= {threshold} ORDER BY p.id_a, p.id_b"
    )


def _minhash_pairs_sql(num_hashes: int, bands: int, n: int, threshold: float, seed: int) -> str:
    r = num_hashes // bands
    band_conds = " OR ".join(
        "(" + " AND ".join(f"s1.h{bi * r + j} = s2.h{bi * r + j}" for j in range(r)) + ")"
        for bi in range(bands)
    )
    return (
        f"WITH sig AS ({_minhash_sig_sql(num_hashes, n, seed)}), "
        f"cand AS (SELECT DISTINCT s1.doc_id AS id_a, s2.doc_id AS id_b "
        f"FROM sig s1 JOIN sig s2 ON s1.doc_id < s2.doc_id AND ({band_conds})), "
        f"{_JACCARD_CTE.format(shingles=_shingles_sql(n))} "
        f"SELECT p.id_a, p.id_b, p.inter, p.union_sz, p.jaccard FROM pairs p "
        f"JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b "
        f"WHERE p.jaccard >= {threshold} ORDER BY p.id_a, p.id_b"
    )


# ---------------------------------------------------------------- queries

_TOKEN_RE_SQL = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# composite quality score, shared by XT-quality and the pipeline query
_QSCORE_SQL = (
    "round(ln(1 + (length(text) - length(replace(text, ' ', '')) + 1)) * "
    r"(1 - len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) / length(text)), 6)"
)


def xt_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", xt.lang_pred(F.col("text")).alias("lang_pred")).orderBy("doc_id")


def xt_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        xt.with_quality(docs)
        .select("doc_id", "q_n_words", "q_n_chars", "q_punct_ratio",
                "q_digit_ratio", "q_stop_hits", "q_score")
        .orderBy("doc_id")
    )


def xt_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        xt.n_tokens_ws(F.col("text")).alias("n_ws"),
        xt.n_tokens_re(F.col("text")).alias("n_re"),
    ).orderBy("doc_id")


def xt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", xt.fingerprint_md5(F.col("text")).alias("fp")).orderBy("doc_id")


def xt_rollfp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.rolling_fingerprints(docs, "doc_id", "text", k=8, keep_mod=8).orderBy(
        "doc_id", "fp"
    )


def xt_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True winnowing fingerprints (window-min over shingle hashes) — the
    guaranteed-containment variant beside XT-rollfp's mod-p sampling."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    # no .distinct(): array_distinct inside winnow_fingerprints already
    # dedupes per row and doc_id is in the key, so a distinct here would be
    # a redundant full shuffle of the exploded output.
    return xt.winnow_fingerprints(docs, k=8, window=4).orderBy("doc_id", "fp")


def xt_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document. Fully declarative: term counts are
    a (doc, word) group-by, document frequency a per-word group-by joined
    back on the word key (the only wide shuffle, keyed by vocabulary —
    naturally well-distributed), and the corpus size N enters as a
    broadcast single-row cross join, so the whole computation stays one
    lazy Catalyst plan — no driver-side scalar collection. Ranking is a
    per-doc window with a total tie-break (score desc, word asc)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = words.select("doc_id", "w").distinct().groupBy("w").agg(
        F.count("*").alias("df")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    from pyspark.sql import Window as W

    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    rk = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "w")
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "rk", F.col("w").alias("term"), "tf", "df", "tfidf")
        .orderBy("doc_id", "rk")
    )


def xd_exact_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_key"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("copies"))
        .orderBy("text_key")
    )


def xd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_df=100
    ).orderBy("id_a", "id_b")


def xd_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.minhash_signatures(docs, num_hashes=8).orderBy("doc_id")


def xd_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5).orderBy("id_a", "id_b")


def xd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.simhash(docs).orderBy("doc_id")


def xp_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep as ONE Catalyst plan — the composition
    the extension operators exist for: language-ID gate + quality-score
    gate + exact-dedup keep-first, all codegen'd projections plus a single
    window. Identical texts carry identical scores, so dedup and the gates
    commute; keep-first runs before the gates to mirror the census."""
    docs = load_table(spark, sf_dir, "documents")
    scored = xt.with_quality(docs).select(
        "doc_id", "text", xt.lang_pred(F.col("text")).alias("lang"), "q_score"
    )
    kept = dedup.exact_dedup(scored, ["text"], "doc_id")
    return (
        kept.filter((F.col("lang") == "en") & (F.col("q_score") >= 2.0))
        .select("doc_id", "lang", "q_score")
        .orderBy("doc_id")
    )


def xp_pipeline2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data prep chain as one Catalyst plan — what
    the extension surface composes into: exact-dedup keep-first → language
    + quality gates → deterministic 50% sample → per-language token-budget
    sequence packing. Three window functions and a codegen filter chain;
    no Python, no collect, every stage partition-deterministic."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    scored = xt.with_quality(docs).select(
        "doc_id", "text", xt.lang_pred(F.col("text")).alias("lang"), "q_score"
    )
    kept = dedup.exact_dedup(scored, ["text"], "doc_id")
    gated = kept.filter((F.col("lang") == "en") & (F.col("q_score") >= 2.0))
    sampled = sampling.hash_bernoulli(gated, "doc_id", 0.5, seed=11)
    packed = sampling.pack_chunks(
        sampled.withColumn("n_tok", xt.n_tokens_ws(F.col("text"))),
        ["lang"], "n_tok", budget=1024, order_col="doc_id",
    )
    return packed.select(
        "doc_id", "lang", "q_score", "n_tok", "chunk_offset", "chunk_id"
    ).orderBy("doc_id")


def xm_bytestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.ascii("text").alias("first_byte"),
    ).orderBy("doc_id")


def xm_imagestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + per-image pixel statistics through the REAL media path
    (ext/multimodal.py: attach_fake_media → image_pixel_stats, one
    Arrow-batched mapInPandas pass, no shuffle) — the multimodal query
    whose oracle checks the decoded PIXELS, not just payload bytes: the
    fake container's pixel stream is pure arithmetic
    ((media_id·31 + i) mod 256), so DuckDB regenerates it and runs the
    identical exact-integer-moment expressions. 12×12 images
    deliberately (a 16×16 stream is a full mod-256 cycle — every image
    would have the same stats; 144 pixels leave doc-varying moments)."""
    from haf_plug_play_spark.ext import multimodal

    # parallelize=False: this path's per-task cost is two chained
    # Python-runner handshakes, so the low-split fan-out that wins for
    # JVM-side corpus passes LOSES here (measured r16 min-of-4: 1.32 s
    # fanned vs 0.78 s plain scan, identical output). At production
    # scale the split gate keeps the plain scan either way.
    docs = load_table(spark, sf_dir, "documents", parallelize=False)
    media = multimodal.attach_fake_media(docs, width=12, height=12)
    stats = multimodal.image_pixel_stats(media)
    return stats.select(
        "media_id",
        "format",
        "width",
        "height",
        "n_pixels",
        F.round("px_mean", 6).alias("px_mean"),
        F.round("px_std", 6).alias("px_std"),
    ).orderBy("media_id")


def _imagestats_sql(w: int = 12, h: int = 12) -> str:
    n = w * h
    return (
        f"WITH px AS (SELECT doc_id, (doc_id * 31 + i) % 256 AS v "
        f"FROM documents, range({n}) t(i)), "
        "s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS s1, "
        "CAST(sum(v * v) AS BIGINT) AS s2 FROM px GROUP BY 1) "
        f"SELECT doc_id AS media_id, 'fakeimg' AS format, "
        f"CAST({w} AS INT) AS width, CAST({h} AS INT) AS height, "
        f"CAST({n} AS BIGINT) AS n_pixels, "
        f"round(s1 / {n}.0, 6) AS px_mean, "
        f"round(sqrt(greatest(s2 / {n}.0 - (s1 / {n}.0) * (s1 / {n}.0), "
        "0.0)), 6) AS px_std "
        "FROM s ORDER BY media_id"
    )


_QUERY_VEC = [((i * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(64)]


def xs_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _QUERY_VEC, k=10)


def xs_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(emb, _QUERY_VEC, k=10)


def xs_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probe top-k with the seeded (untrained) coarse quantizer —
    deterministic pure function of the seed, so the assignment reproduces
    in SQL; the trained variant's recall is pytest-verified on clustered
    data (tests/test_ext.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, _QUERY_VEC, k=10)


def xd_embcos_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact baseline (this corpus has no ≥0.9 near-dups; 0.4 exercises the
    operator with non-empty output)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_cosine_pairs_exact(emb, threshold=0.4).orderBy("id_a", "id_b")


def _planted_corpus(emb: DataFrame) -> DataFrame:
    """Embeddings plus a 2×-scaled copy of each vector (vec_id + 1_000_000).

    Scaling by a power of two is EXACT in IEEE doubles, so each copy
    normalizes to the bit-identical unit vector as its original: cosine
    exactly 1.0, same LSH bucket. That plants one guaranteed-found near-dup
    pair per vector, making the ≥0.9 query (empty on the raw corpus)
    exercise the whole bucket→probe→verify pipeline against an exact oracle.
    """
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    scaled = base.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    return base.unionByName(scaled)


def xd_embcos_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-verified near-dup pairs at the real near-dup threshold (0.9) over
    the planted corpus (see _planted_corpus): exactly one cosine-1.0 pair
    per vector must survive bucket + multi-probe + exact verify.

    ``n_planes=12``: bucket count should track corpus size (2^12 = 4096
    buckets for the 4k-row planted corpus ≈ 1 vector/bucket) — the standard
    LSH sizing rule; too few planes puts O(n/2^planes) vectors per bucket
    and the candidate set grows quadratically in that occupancy. Hamming-1
    multi-probe restores the boundary recall extra planes cost; planted
    duplicates (cosine exactly 1.0) share every bucket at any plane count,
    so the all-pairs oracle is plane-independent."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return dedup.embedding_cosine_pairs(
        _planted_corpus(emb), threshold=0.9, n_planes=12
    ).orderBy("id_a", "id_b")


# ------------------------------------------------- float-ranking oracle SQL

_VD = "CAST(embedding AS DOUBLE[])"


def _vec_sql(vec: list[float]) -> str:
    """A DOUBLE[] literal that parses to the bit-identical IEEE doubles the
    engine uses (repr round-trips exactly)."""
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def _cosine_sql(vec_expr: str, query_vec: list[float]) -> str:
    """Mirror similarity.cosine_topk's op order: dot(v,q) / (norm(v) * qn)
    with qn precomputed the same way (sequential Python sum + sqrt)."""
    qn = math.sqrt(sum(x * x for x in query_vec))
    return (
        f"round(list_dot_product({vec_expr}, {_vec_sql(query_vec)}) / "
        f"(sqrt(list_dot_product({vec_expr}, {vec_expr})) * {qn!r}), 6)"
    )


def _cosine_topk_sql(query_vec: list[float], k: int) -> str:
    return (
        f"SELECT vec_id, {_cosine_sql(_VD, query_vec)} AS cosine "
        f"FROM embeddings ORDER BY cosine DESC, vec_id LIMIT {k}"
    )


def _bucket_sql(vec_expr: str, n_planes: int, seed: int, dim: int) -> str:
    """Hyperplane bucket with the engine's OWN seed-derived plane literals
    (similarity._planes) — bit i set iff dot(v, plane_i) > 0."""
    planes = similarity._planes(dim, n_planes, seed)
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {_vec_sql(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def _ivf_sql(query_vec: list[float], k: int, n_centroids: int = 8, n_probe: int = 3, seed: int = 7) -> str:
    """Replicates ivf_topk with the same seeded centroid literals: per-row
    assignment is list_position(list_min) over the identical c·c − 2·(v·c)
    scores, probes are computed Python-side exactly as the engine does."""
    cents = similarity._seed_centroids(len(query_vec), n_centroids, seed)
    scores = ", ".join(
        f"({sum(c * c for c in cent)!r} - 2.0 * list_dot_product(v, {_vec_sql(cent)}))"
        for cent in cents
    )
    qd = [
        sum(c * c for c in cent) - 2.0 * sum(a * b for a, b in zip(query_vec, cent))
        for cent in cents
    ]
    probes = [i + 1 for i in sorted(range(len(cents)), key=lambda i: (qd[i], i))[:n_probe]]
    return (
        f"WITH s AS (SELECT vec_id, {_VD} AS v FROM embeddings), "
        f"a AS (SELECT vec_id, v, list_position([{scores}], list_min([{scores}])) AS cell FROM s) "
        f"SELECT vec_id, {_cosine_sql('v', query_vec)} AS cosine FROM a "
        f"WHERE cell IN ({', '.join(str(p) for p in probes)}) "
        f"ORDER BY cosine DESC, vec_id LIMIT {k}"
    )


def _ann_lsh_sql(query_vec: list[float], k: int, n_planes: int = 8, seed: int = 5) -> str:
    """Replicates ann_lsh_topk end-to-end: bucket every vector, keep the
    query's bucket + hamming-1 probes (computed Python-side exactly as the
    engine does), exact-rank the survivors."""
    dim = len(query_vec)
    planes = similarity._planes(dim, n_planes, seed)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qbucket |= 1 << i
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(n_planes)]
    return (
        f"WITH b AS (SELECT vec_id, {_VD} AS v, "
        f"{_bucket_sql(_VD, n_planes, seed, dim)} AS bucket FROM embeddings) "
        f"SELECT vec_id, {_cosine_sql('v', query_vec)} AS cosine FROM b "
        f"WHERE bucket IN ({', '.join(str(p) for p in probes)}) "
        f"ORDER BY cosine DESC, vec_id LIMIT {k}"
    )


# Normalized corpus CTEs: u = v / ||v|| with the same op order the engine
# uses (norm = sqrt of the self dot product, then an elementwise divide).
_UNIT_CTE = (
    f"u AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u "
    f"FROM (SELECT vec_id, {_VD} AS v FROM embeddings))"
)

# Planted corpus carrying raw vectors + their norms — the LSH verify's op
# order (dot(v_a,v_b)/(n_a·n_b), no materialized unit vectors: the engine
# dropped those to dodge the CollapseProject-into-lambda O(dim²) trap).
_PLANTED_VN_CTE = (
    f"corpus AS (SELECT vec_id, {_VD} AS v FROM embeddings "
    f"UNION ALL SELECT vec_id + 1000000 AS vec_id, "
    f"list_transform({_VD}, x -> x * 2) AS v FROM embeddings), "
    "s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM corpus)"
)


def _cosine_pairs_sql(cte: str, threshold: float, renorm: bool) -> str:
    """All-pairs exact cosine (quadratic — oracle only; the engine's block
    multiply / LSH produce the identical set).

    ``renorm`` mirrors the engine's op order exactly: the block-multiply
    path rounds the unit-vector dot directly (renorm=False over the
    normalized ``u`` CTE), the LSH verify divides the raw dot by the
    once-computed norms (renorm=True over the ``s`` v+n CTE)."""
    if renorm:
        return (
            f"WITH {cte}, p AS ("
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_dot_product(a.v, b.v) / (a.n * b.n), 6) AS cosine "
            "FROM s a JOIN s b ON a.vec_id < b.vec_id) "
            f"SELECT id_a, id_b, cosine FROM p WHERE cosine >= {threshold} "
            "ORDER BY id_a, id_b"
        )
    return (
        f"WITH {cte}, p AS ("
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "round(list_dot_product(a.u, b.u), 6) AS cosine "
        "FROM u a JOIN u b ON a.vec_id < b.vec_id) "
        f"SELECT id_a, id_b, cosine FROM p WHERE cosine >= {threshold} "
        "ORDER BY id_a, id_b"
    )


def xa_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample of documents at 10% by doc_id hash —
    membership is a pure function of the key, so reruns and repartitions
    select the identical subset (ext/sampling.py)."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_bernoulli(docs, "doc_id", 0.1, seed=7).select(
        "doc_id", "lang", "source"
    ).orderBy("doc_id")


def xa_sample_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified mix: at most 20 docs per (lang, source) stratum, chosen
    uniformly without replacement by hash order — the reproducible corpus-mix
    primitive."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_quota(
        docs, ["lang", "source"], quota=20, key_col="doc_id", seed=7
    ).select("doc_id", "lang", "source", "sample_rank").orderBy("doc_id")


def xa_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents concatenated per source in doc_id order
    and sliced into 2048-token chunks; each doc labeled with the chunk it
    starts in. Per-stratum windows only — no global cumsum."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", xt.n_tokens_ws(F.col("text"))
    )
    return sampling.pack_chunks(
        docs, ["source"], "n_tok", budget=2048, order_col="doc_id"
    ).select("doc_id", "source", "n_tok", "chunk_offset", "chunk_id").orderBy("doc_id")


def xa_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus mix: deterministic Bernoulli with a different rate
    per stratum, compiled to a codegen CASE + filter — no join, no shuffle
    (ext/sampling.py:weighted_mix)."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
    return sampling.weighted_mix(
        docs, "source", rates, key_col="doc_id", seed=7, default_rate=0.1
    ).select("doc_id", "source").orderBy("doc_id")


def xa_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: unique dense 1..n positions in
    seeded-hash order, computed without a single-reducer global window
    (ext/sampling.py:hash_shuffle)."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.hash_shuffle(docs, "doc_id", seed=7)
        .select("doc_id", "pos")
        .orderBy("doc_id")
    )


def xa_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test holdout split (80/10/10) by doc_id
    hash — a pure function of the key, so incremental appends can never
    migrate an existing document between splits
    (ext/sampling.py:split_assign). Codegen CASE chain, zero shuffle."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.split_assign(docs, "doc_id", _SPLIT_FRACTIONS, seed=7)
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    )


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def xa_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality pruning: keep the top 70% of every source by
    the composite quality score — the rank-based "drop each source's own
    worst tail" gate (ext/sampling.py:quantile_prune), one keyed window
    shuffle. Tie-break on doc_id keeps the cut deterministic."""
    from haf_plug_play_spark.ext import sampling

    docs = xt.with_quality(load_table(spark, sf_dir, "documents"))
    return (
        sampling.quantile_prune(
            docs, ["source"], "q_score", keep_frac=0.7, tie_col="doc_id"
        )
        .select("doc_id", "source", "q_score", "score_rank_frac")
        .orderBy("doc_id")
    )


def _prune_sql(keep_frac: float = 0.7) -> str:
    return (
        f"WITH scored AS (SELECT doc_id, source, {_QSCORE_SQL} AS q_score "
        "FROM documents), "
        "ranked AS (SELECT doc_id, source, q_score, "
        "round(cume_dist() OVER (PARTITION BY source "
        "ORDER BY q_score DESC, doc_id), 6) AS score_rank_frac FROM scored) "
        "SELECT doc_id, source, q_score, score_rank_frac FROM ranked "
        f"WHERE score_rank_frac <= {keep_frac} ORDER BY doc_id"
    )


def xt_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: sources src0/src1 stand in for the held-
    out eval benchmark; every other document is audited for 3-gram overlap
    against the eval shingle set (broadcast — eval sets are tiny next to
    the corpus) and flagged when ≥50% of its shingles appear there
    (ext/dedup.py:eval_overlap)."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("source").isin("src0", "src1")
    return dedup.eval_overlap(
        docs.filter(~is_eval), docs.filter(is_eval), n=3, min_frac=0.5
    ).orderBy("doc_id")


def _decontam_sql(n: int = 3, min_frac: float = 0.5) -> str:
    sh = _shingles_sql(n)
    return (
        f"WITH ev AS (SELECT DISTINCT unnest({sh}) AS shingle "
        "FROM documents WHERE source IN ('src0', 'src1')), "
        f"tr AS (SELECT doc_id, unnest({sh}) AS shingle "
        "FROM documents WHERE source NOT IN ('src0', 'src1')), "
        f"sizes AS (SELECT doc_id, len({sh}) AS n_shingles "
        "FROM documents WHERE source NOT IN ('src0', 'src1')), "
        "hits AS (SELECT doc_id, count(*) AS n_overlap FROM tr "
        "JOIN ev USING (shingle) GROUP BY 1) "
        "SELECT s.doc_id, CAST(s.n_shingles AS BIGINT) AS n_shingles, "
        "CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap, "
        "round(coalesce(h.n_overlap, 0) / s.n_shingles, 6) AS overlap_frac, "
        f"round(coalesce(h.n_overlap, 0) / s.n_shingles, 6) >= {min_frac} "
        "AS contaminated "
        "FROM sizes s LEFT JOIN hits h USING (doc_id) ORDER BY s.doc_id"
    )


def xl_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key over (user_id, event_id) — the bit-exact
    interleave that cluster_by_zorder lays files out by
    (operators/layout.py). The oracle recomputes the same shift/mask
    terms; the layout op itself (range shuffle + local sort + parquet
    min/max skipping) is exercised in tests/test_layout.py."""
    from haf_plug_play_spark.operators.layout import zorder_key

    events = load_table(spark, sf_dir, "events")
    zk = zorder_key([F.col("user_id"), F.col("event_id")], bits=16)
    return events.select("event_id", "user_id", zk.alias("zkey")).orderBy("event_id")


def _zorder_sql() -> str:
    from haf_plug_play_spark.operators.layout import zorder_key_sql

    return (
        f"SELECT event_id, user_id, {zorder_key_sql(['user_id', 'event_id'], 16)} "
        "AS zkey FROM events ORDER BY event_id"
    )


def xt_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size word chunking (size 16, overlap 4 — small
    constants so the tiny fixture docs still produce multi-chunk output;
    production would use model-context-sized chunks) — the long-document
    split that precedes sequence packing (ext/text.py:chunk_documents)."""
    docs = load_table(spark, sf_dir, "documents")
    return xt.chunk_documents(docs, size=16, overlap=4).orderBy(
        "doc_id", "chunk_idx"
    )


def _chunk_sql(size: int = 16, overlap: int = 4) -> str:
    # starts stop at greatest(len - overlap, 1), mirroring
    # chunk_documents: a start inside the previous chunk's overlap tail
    # would emit a pure-subset chunk (duplicated text); range() end is
    # exclusive, hence the +1
    stride = size - overlap
    return (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) "
        "SELECT doc_id, "
        f"CAST((s - 1) / {stride} AS BIGINT) AS chunk_idx, "
        f"CAST(len(ws[s : s + {size - 1}]) AS BIGINT) AS n_tok, "
        f"array_to_string(ws[s : s + {size - 1}], ' ') AS chunk_text "
        f"FROM w, unnest(range(1, greatest(len(ws) - {overlap}, 1) + 1, "
        f"{stride})) AS t(s) "
        "ORDER BY doc_id, chunk_idx"
    )


def xp_pipeline4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth composed pipeline — the holdout-aware curation chain over
    the r4 second-wave operators: quality-prune the worst 30% of every
    source → deterministic train/val/test split → keep the train slice →
    overlapping word chunking → token-budget packing per source. One
    Catalyst plan: two keyed windows (prune, pack), a codegen CASE
    (split), per-row chunk expressions; no joins at all."""
    from haf_plug_play_spark.ext import sampling

    docs = xt.with_quality(load_table(spark, sf_dir, "documents"))
    pruned = sampling.quantile_prune(
        docs, ["source"], "q_score", keep_frac=0.7, tie_col="doc_id"
    )
    train = sampling.split_assign(pruned, "doc_id", _SPLIT_FRACTIONS, seed=7).where(
        F.col("split") == "train"
    )
    chunks = xt.chunk_documents(
        train.select("doc_id", "source", "text"),
        size=16, overlap=4, carry_cols=["source"],
    )
    return (
        sampling.pack_chunks(
            chunks, ["source"], "n_tok", budget=256,
            order_col=["doc_id", "chunk_idx"],
        )
        .select("doc_id", "chunk_idx", "source", "n_tok", "chunk_offset", "chunk_id")
        .orderBy("doc_id", "chunk_idx")
    )


def _pipeline4_sql() -> str:
    split_case = _split_sql_expr()
    return (
        f"WITH scored AS (SELECT doc_id, source, text, {_QSCORE_SQL} AS q_score "
        "FROM documents), "
        "ranked AS (SELECT *, round(cume_dist() OVER (PARTITION BY source "
        "ORDER BY q_score DESC, doc_id), 6) AS frac FROM scored), "
        "kept AS (SELECT * FROM ranked WHERE frac <= 0.7), "
        f"train AS (SELECT * FROM kept WHERE ({split_case}) = 'train'), "
        "w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM train), "
        "ch AS (SELECT doc_id, source, CAST((s - 1) / 12 AS BIGINT) AS chunk_idx, "
        "CAST(len(ws[s : s + 15]) AS BIGINT) AS n_tok "
        # starts stop at greatest(len-overlap,1) like chunk_documents
        "FROM w, unnest(range(1, greatest(len(ws) - 4, 1) + 1, 12)) AS t(s)), "
        "packed AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY source "
        "ORDER BY doc_id, chunk_idx ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) "
        "AS chunk_offset FROM ch) "
        "SELECT doc_id, chunk_idx, source, n_tok, chunk_offset, "
        "CAST(floor(chunk_offset / 256) AS BIGINT) AS chunk_id "
        "FROM packed ORDER BY doc_id, chunk_idx"
    )


def _split_sql_expr() -> str:
    from haf_plug_play_spark.ext.sampling import split_assign_sql

    return split_assign_sql("doc_id", _SPLIT_FRACTIONS, 7)


def xd_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: docs with doc_id % 5 == 0 play the incoming
    batch, the rest the already-deduped corpus; the engine runs the
    batch-vs-corpus path (corpus band index semi-joined to the batch's
    buckets — never corpus×corpus) and must produce EXACTLY the pairs of
    a full-corpus LSH run that touch the batch, which is what the oracle
    computes (ext/dedup.py:incremental_minhash_pairs)."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    is_new = F.col("doc_id") % 5 == 0
    return dedup.incremental_minhash_pairs(
        docs.filter(is_new), docs.filter(~is_new),
        num_hashes=8, bands=4, threshold=0.5, seed=1,
    ).orderBy("id_a", "id_b")


def _incremental_sql() -> str:
    full = _minhash_pairs_sql(8, 4, 3, 0.5, 1).replace(
        " ORDER BY p.id_a, p.id_b", ""
    )
    return (
        f"SELECT * FROM ({full}) "
        "WHERE id_a % 5 = 0 OR id_b % 5 = 0 ORDER BY id_a, id_b"
    )


def xs_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization census: per-vector symmetric scale +
    codes (serialized to CSV so the differential hash stays on scalar
    columns), plus an in-query certification that every code is in
    [-127, 127] (ext/similarity.py:quantize_embeddings)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(emb)
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.col("codes")).alias("codes_csv"),
        (
            F.array_max(F.transform(F.col("codes"), F.abs)) <= F.lit(127)
        ).alias("codes_in_range"),
    ).orderBy("vec_id")


def _quant_sql() -> str:
    scale = "greatest(list_max(list_transform(embedding, x -> abs(x))), 1e-30)"
    code = f"CAST(floor(x / {scale} * 127 + 0.5) AS INT)"
    return (
        "SELECT vec_id, "
        f"round({scale}, 6) AS scale, "
        f"array_to_string(list_transform(embedding, x -> {code}), ',') AS codes_csv, "
        f"list_max(list_transform(embedding, x -> abs({code}))) <= 127 AS codes_in_range "
        "FROM embeddings ORDER BY vec_id"
    )


def xd_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup DECISION census: MinHash-LSH near-dup pairs → connected
    components → one canonical keeper per cluster (minimum doc_id), every
    document labeled. This is the step a training-data pipeline actually
    consumes — pairs alone don't say which copy to drop, and transitive
    near-dups (A~B, B~C, A≁C) must land in ONE cluster, which only the
    component closure provides."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    return dedup.dedup_decision(docs, pairs)  # deterministic_order=True default sorts


def _cluster_sql() -> str:
    """Connected components in DuckDB: recursive min-label closure over the
    same MinHash-LSH pair set (the pair subquery is the XD-minhash-pairs
    oracle), seeded with every doc as its own component."""
    pairs = _minhash_pairs_sql(8, 4, 3, 0.5, 1).replace(" ORDER BY p.id_a, p.id_b", "")
    return (
        f"WITH RECURSIVE pr AS (SELECT id_a, id_b FROM ({pairs})), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pr "
        "UNION ALL SELECT id_b, id_a FROM pr), "
        "cc(id, comp) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id) "
        "SELECT id AS doc_id, min(comp) AS cluster_id, min(comp) = id AS keep "
        "FROM cc GROUP BY id ORDER BY doc_id"
    )


def xt_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates with the published thresholds (word-count
    and mean-word-length bounds, alpha-word fraction, stopword presence)."""
    docs = load_table(spark, sf_dir, "documents")
    return xt.gopher_gates(docs).orderBy("doc_id")


def xt_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals: most-frequent-word share and duplicated-3-gram
    share — explode + group-by keyed by (doc, token), never per-row O(n²)."""
    docs = load_table(spark, sf_dir, "documents")
    return xt.repetition_signals(docs, n=3).orderBy("doc_id")


def _pii_augmented(docs: DataFrame) -> DataFrame:
    """Deterministic PII-bearing fixture column: the synthetic corpus
    contains no emails/IPs/phones, so the scrub parity check plants one of
    each — derived purely from doc_id, identically in the oracle SQL — and
    the operator must find and redact exactly those."""
    t = F.concat(
        F.col("text"),
        F.lit(" u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7 555-867-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select("doc_id", t.alias("pii_text"))


def xt_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return xt.pii_scrub(_pii_augmented(docs), text_col="pii_text").orderBy("doc_id")


def xd_seg_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-segment removal (CCNet-style paragraph
    dedup over fixed 10-word windows) with full-corpus census output."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.segment_dedup(docs, seg_words=10).orderBy("doc_id")


def xd_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the planted corpus: every vector
    labeled (cell, keep); the 2×-scaled copies normalize to identical unit
    vectors, land in their original's cell, and are dropped. n_centroids
    follows the corpus (SemDeDup's own scale lever — k grows with n so
    per-cell pair volume stays bounded): 16 cells for the 4000-vector
    planted corpus halves the within-cell quadratic vs the default 8;
    with the per-cell BLAS pair scan this is 5.0 s → 2.7 s at sf0.1.
    Recall unaffected because cosine-duplicates share a cell at ANY k."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return dedup.semantic_dedup(
        _planted_corpus(emb), threshold=0.95, n_centroids=16
    ).orderBy("vec_id")


def _html_wrapped(docs: DataFrame) -> DataFrame:
    """Deterministic HTML-bearing fixture column (the corpus is plain
    text): wrap every document in tags + entities derived from doc_id,
    identically in the oracle SQL, so the strip operator must remove
    exactly those."""
    t = F.concat(
        F.lit('<div id="d'),
        F.col("doc_id").cast("string"),
        F.lit('"><p class="b">'),
        F.col("text"),
        F.lit(" &amp; tail &lt;kept&gt;</p><br/></div>"),
    )
    return docs.select("doc_id", t.alias("html_text"))


def xt_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return xt.strip_html(_html_wrapped(docs), text_col="html_text").orderBy("doc_id")


def xa_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting per source slice — the report a mixing/packing
    pipeline is steered by: document and token totals, exact median
    tokens, mean quality score. One keyed aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = xt.n_tokens_ws(F.col("text"))
    q = (
        F.log(F.lit(1) + toks)
        * (F.lit(1) - F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]")) / F.length("text"))
    )
    # mean over doubles would hit partial-agg reassociation (module
    # docstring of queries/advanced.py): round per row to 6 dp, sum
    # EXACTLY in decimal, divide once — identical IEEE sequence in DuckDB
    qd = F.round(q, 6).cast("decimal(18,6)")
    return (
        docs.select("source", toks.alias("_t"), qd.alias("_q"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("total_tokens"),
            F.round(F.expr("percentile(_t, 0.5)"), 6).alias("p50_tokens"),
            F.round(F.sum("_q").cast("double") / F.count("*"), 6).alias("mean_q_score"),
        )
        .orderBy("source")
    )


_HTML_AUG_SQL = (
    "'<div id=\"d' || doc_id || '\"><p class=\"b\">' || text || "
    "' &amp; tail &lt;kept&gt;</p><br/></div>'"
)


def _strip_html_sql() -> str:
    clean = f"regexp_replace(t, '{xt.HTML_TAG_RE}', ' ', 'g')"
    for ent, ch in xt.HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        clean = f"replace({clean}, '{ent}', '{ch_sql}')"
    clean = rf"trim(regexp_replace({clean}, '\s+', ' ', 'g'))"
    return (
        f"WITH p AS (SELECT doc_id, {_HTML_AUG_SQL} AS t FROM documents) "
        f"SELECT doc_id, len(regexp_extract_all(t, '{xt.HTML_TAG_RE}')) AS n_tags, "
        f"{clean} AS clean_text FROM p ORDER BY doc_id"
    )


def _corpus_stats_sql() -> str:
    toks = "(length(text) - length(replace(text, ' ', '')) + 1)"
    q = (
        f"ln(1 + {toks}) * "
        r"(1 - len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) / length(text))"
    )
    return (
        f"SELECT source, count(*) AS n_docs, "
        f"CAST(sum({toks}) AS BIGINT) AS total_tokens, "
        f"round(quantile_cont({toks}, 0.5), 6) AS p50_tokens, "
        f"round(CAST(sum(CAST(round({q}, 6) AS DECIMAL(18,6))) AS DOUBLE) "
        "/ count(*), 6) AS mean_q_score "
        "FROM documents GROUP BY 1 ORDER BY 1"
    )


def xp_pipeline3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third composed pipeline — the RefinedWeb-ish segment-level chain the
    r4 operators enable: corpus-segment dedup → Gopher gates on the CLEANED
    text → token-budget packing per source. One Catalyst plan; the joins
    are doc_id equi-joins (AQE-broadcast at fixture scale), the dedup and
    packing shuffles are the operators' own."""
    from haf_plug_play_spark.ext import sampling

    docs = _spread(load_table(spark, sf_dir, "documents"))
    cleaned = dedup.segment_dedup(docs, seg_words=10)
    kept = cleaned.where(F.col("n_kept") > 0).select(
        "doc_id", "n_kept", F.col("clean_text").alias("text")
    )
    gates = xt.gopher_gates(kept.select("doc_id", "text"))
    merged = (
        kept.join(gates, "doc_id")
        .where(F.col("g_pass"))
        .join(load_table(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id")
        .withColumnRenamed("g_n_words", "n_tok")
    )
    return (
        sampling.pack_chunks(merged, ["source"], "n_tok", budget=1024, order_col="doc_id")
        .select("doc_id", "source", "n_kept", "n_tok", "chunk_offset", "chunk_id")
        .orderBy("doc_id")
    )


def _pipeline3_sql() -> str:
    stop = ", ".join(repr(w) for w in xt.LANG_STOPWORDS["en"])
    ws = "string_split(text, ' ')"
    return (
        f"WITH seg AS (SELECT * FROM ({_seg_dedup_sql(10)})), "
        "kept AS (SELECT doc_id, n_kept, clean_text AS text FROM seg WHERE n_kept > 0), "
        f"g AS (SELECT doc_id, n_kept, len({ws}) AS n_tok, "
        "length(text) AS n_chars, "
        f"len(list_intersect(string_split(lower(text), ' '), [{stop}])) AS stop_hits, "
        f"len(list_filter({ws}, w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha "
        "FROM kept), "
        "gated AS (SELECT doc_id, n_kept, n_tok FROM g WHERE "
        "n_tok >= 50 AND n_tok <= 100000 "
        "AND round((n_chars - (n_tok - 1)) / n_tok, 6) >= 3.0 "
        "AND round((n_chars - (n_tok - 1)) / n_tok, 6) <= 10.0 "
        "AND round(n_alpha / n_tok, 6) > 0.8 AND stop_hits >= 2), "
        "j AS (SELECT gated.*, d.source FROM gated JOIN documents d USING (doc_id)), "
        "packed AS (SELECT doc_id, source, n_kept, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS chunk_offset FROM j) "
        "SELECT doc_id, source, n_kept, n_tok, chunk_offset, "
        "CAST(floor(chunk_offset / 1024) AS BIGINT) AS chunk_id "
        "FROM packed ORDER BY doc_id"
    )


_PII_AUG_SQL = (
    "text || ' u' || doc_id || '@example.org 10.0.' || (doc_id % 250) || "
    "'.7 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _gopher_sql() -> str:
    stop = ", ".join(repr(w) for w in xt.LANG_STOPWORDS["en"])
    return (
        "WITH g AS (SELECT doc_id, len(string_split(text, ' ')) AS g_n_words, "
        "length(text) AS n_chars, "
        f"len(list_intersect(string_split(lower(text), ' '), [{stop}])) AS g_stop_hits, "
        "len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha "
        "FROM documents), "
        "m AS (SELECT doc_id, g_n_words, "
        "round((n_chars - (g_n_words - 1)) / g_n_words, 6) AS g_mean_word_len, "
        "round(n_alpha / g_n_words, 6) AS g_alpha_frac, g_stop_hits FROM g) "
        "SELECT doc_id, g_n_words, g_mean_word_len, g_alpha_frac, g_stop_hits, "
        "(g_n_words >= 50 AND g_n_words <= 100000 AND g_mean_word_len >= 3.0 "
        "AND g_mean_word_len <= 10.0 AND g_alpha_frac >= 0.8 AND g_stop_hits >= 2) "
        "AS g_pass FROM m ORDER BY doc_id"
    )


def _repetition_sql(n: int = 3) -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents), "
        "wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2), "
        "tw AS (SELECT doc_id, round(max(c) / sum(c), 6) AS top_word_frac "
        "FROM wc GROUP BY 1), "
        "ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), "
        f"g AS (SELECT doc_id, unnest([array_to_string(ws[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, greatest(len(ws)-{n - 1}, 1)+1)]) AS g FROM ws), "
        "gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2), "
        "dg AS (SELECT doc_id, round(coalesce(sum(c) FILTER (WHERE c > 1), 0) "
        "/ sum(c), 6) AS dup_ngram_frac FROM gc GROUP BY 1) "
        "SELECT tw.doc_id AS doc_id, top_word_frac, dup_ngram_frac "
        "FROM tw JOIN dg ON tw.doc_id = dg.doc_id ORDER BY doc_id"
    )


def _pii_sql() -> str:
    email, ip, phone = xt.PII_EMAIL_RE, xt.PII_IPV4_RE, xt.PII_PHONE_RE
    return (
        f"WITH p AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents) "
        f"SELECT doc_id, len(regexp_extract_all(t, '{email}')) AS n_emails, "
        f"len(regexp_extract_all(t, '{ip}')) AS n_ips, "
        f"len(regexp_extract_all(t, '{phone}')) AS n_phones, "
        f"regexp_replace(regexp_replace(regexp_replace(t, '{email}', '<EMAIL>', 'g'), "
        f"'{ip}', '<IP>', 'g'), '{phone}', '<PHONE>', 'g') AS clean_text "
        "FROM p ORDER BY doc_id"
    )


def _seg_dedup_sql(w: int = 10) -> str:
    return (
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        f"e AS (SELECT doc_id, ws, unnest(range(0, CAST(ceil(len(ws)/{w}.0) AS BIGINT))) "
        "AS seg_idx FROM d), "
        f"segs AS (SELECT doc_id, seg_idx, array_to_string(ws[seg_idx*{w}+1:seg_idx*{w}+{w}], ' ') "
        "AS seg FROM e), "
        "rk AS (SELECT doc_id, seg_idx, seg, row_number() OVER "
        "(PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn FROM segs), "
        "reb AS (SELECT doc_id, count(*) AS n_kept, "
        "string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text "
        "FROM rk WHERE rn = 1 GROUP BY 1), "
        f"tot AS (SELECT doc_id, CAST(ceil(len(string_split(text, ' '))/{w}.0) AS BIGINT) "
        "AS n_segs FROM d2) "
        "SELECT t.doc_id AS doc_id, t.n_segs AS n_segs, "
        "coalesce(r.n_kept, 0) AS n_kept, coalesce(r.clean_text, '') AS clean_text "
        "FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id ORDER BY doc_id"
    ).replace("FROM d2", "FROM documents")


def xs_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk k-NN join: top-5 cell-local cosine neighbors for EVERY vector
    (similarity.knn_join_cells) — the all-rows retrieval primitive beside
    the single-query top-k family."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return similarity.knn_join_cells(emb, k=5).orderBy("vec_id", "rk")


def _knn_sql(k: int = 5, n_centroids: int = 8, seed: int = 7, dim: int = 64) -> str:
    return (
        f"WITH s AS (SELECT vec_id, {_VD} AS v FROM embeddings), "
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM s), "
        f"a AS (SELECT vec_id, v, n, {_cell_sql(n_centroids, seed, dim)} AS cell FROM n), "
        "p AS (SELECT x.vec_id AS vec_id, y.vec_id AS nbr_id, "
        "round(list_dot_product(x.v, y.v) / (x.n * y.n), 6) AS cosine "
        "FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id <> y.vec_id), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY cosine DESC, nbr_id) AS rk FROM p) "
        f"SELECT vec_id, nbr_id, cosine, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= {k} "
        "ORDER BY vec_id, rk"
    )


def _cell_sql(n_centroids: int, seed: int, dim: int) -> str:
    """Spherical-assignment cell with the engine's seeded centroid
    literals: first-of-min over the same c·c − 2·(v·c)/‖v‖ scores, in the
    engine's exact op order (raw dot first, ONE divide by the norm).
    Centroids are UNIT-normalized (spherical k-means assignment) — see
    similarity._seed_unit_centroids for why raw Gaussian centroids
    degenerate to a single cell."""
    cents = similarity._seed_unit_centroids(dim, n_centroids, seed)
    scores = ", ".join(
        f"({sum(c * c for c in cent)!r} - 2.0 * list_dot_product(v, {_vec_sql(cent)}) / n)"
        for cent in cents
    )
    return f"CAST(list_position([{scores}], list_min([{scores}])) AS INTEGER)"


def _semantic_sql(threshold: float = 0.95, n_centroids: int = 8, seed: int = 7, dim: int = 64) -> str:
    return (
        "WITH corpus AS (SELECT vec_id, v FROM "
        f"(SELECT vec_id, {_VD} AS v FROM embeddings "
        "UNION ALL SELECT vec_id + 1000000 AS vec_id, "
        f"list_transform({_VD}, x -> x * 2) AS v FROM embeddings)), "
        "s AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM corpus), "
        f"a AS (SELECT vec_id, v, n, {_cell_sql(n_centroids, seed, dim)} AS cell FROM s), "
        "d AS (SELECT DISTINCT y.vec_id AS vec_id FROM a x JOIN a y "
        "ON x.cell = y.cell AND x.vec_id < y.vec_id "
        f"AND round(list_dot_product(x.v, y.v) / (x.n * y.n), 6) >= {threshold}) "
        "SELECT a.vec_id AS vec_id, cell, "
        "a.vec_id NOT IN (SELECT vec_id FROM d) AS keep FROM a ORDER BY vec_id"
    )


# ------------------------------------------- sketches / LM / mixing / k-means


def xk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters, certified in-query
    (ext/sketch.py:cms_heavy_hitters): the sketch is depth×width counters
    built with one mergeable aggregation; estimate >= exact is the CMS
    hard guarantee, asserted per output row like QAD's HLL certification."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    return sketch.cms_heavy_hitters(docs)


def xd_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination probe (ext/sketch.py:bloom_probe):
    member set = the src0 docs, key = raw text; every doc gets a
    may-be-member flag via 4 broadcast position joins (probe side never
    shuffles) and the no-false-negative guarantee is certified per row."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    return sketch.bloom_probe(docs, F.col("source") == "src0", F.col("text"))


def xs_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One declarative Lloyd refinement over the embeddings
    (ext/similarity.py:kmeans_refine_assign) — trained centroids stay a
    broadcast DataFrame; no driver collect anywhere in the plan."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return similarity.kmeans_refine_assign(emb)


def xt_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM quality score per document
    (ext/text.py:unigram_lm_scores) — the KenLM-perplexity stand-in."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.unigram_lm_scores(docs)


def xa_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) language rebalancing
    (ext/sampling.py:temperature_mix): rates derived from the corpus's own
    stratum counts in the same query; rarest language keeps everything."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents")
    return (
        sampling.temperature_mix(docs, "lang", "doc_id", alpha=0.5, seed=7)
        .select("doc_id", "lang", "source", "mix_rate")
        .orderBy("doc_id")
    )


def _kmeans_sql(k: int = 8, seed: int = 7, dim: int = 64) -> str:
    """DuckDB mirror of kmeans_refine_assign: same seeded unit-centroid
    literals, same euclidean c·c − 2·(v·c) scoring (no norm divide —
    nearest_centroid's form, not cell_staged's spherical one), same
    relational Lloyd refinement. Positions are 1-based here and 0-based in
    Spark's posexplode — pos is only an internal alignment key, so each
    engine is self-consistent and the outputs align."""
    cents = similarity._seed_unit_centroids(dim, k, seed)
    scores = ", ".join(
        f"({sum(c * c for c in cent)!r} - 2.0 * list_dot_product(v, {_vec_sql(cent)}))"
        for cent in cents
    )
    cell0 = f"CAST(list_position([{scores}], list_min([{scores}])) AS INTEGER)"
    return (
        f"WITH s AS (SELECT vec_id, {_VD} AS v FROM embeddings), "
        f"a0 AS (SELECT vec_id, v, {cell0} AS cell0 FROM s), "
        f"p AS (SELECT vec_id, cell0, i AS pos, v[i] AS x "
        f"FROM a0, range(1, {dim} + 1) t(i)), "
        "cent1 AS (SELECT cell0 AS cell, pos, avg(x) AS m FROM p GROUP BY 1, 2), "
        "cc AS (SELECT cell, sum(m * m) AS cc FROM cent1 GROUP BY 1), "
        "vc AS (SELECT p.vec_id, p.cell0, c.cell, sum(p.x * c.m) AS vc "
        "FROM p JOIN cent1 c USING (pos) GROUP BY 1, 2, 3), "
        "scored AS (SELECT vc.vec_id, vc.cell0, vc.cell, cc.cc - 2.0 * vc.vc AS score "
        "FROM vc JOIN cc USING (cell)), "
        "best AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY score, cell) AS rn FROM scored) "
        "SELECT vec_id, cell0, CAST(cell AS INT) AS cell1, cell0 <> cell AS moved "
        "FROM best WHERE rn = 1 ORDER BY vec_id"
    )


def xd_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication census (ext/dedup.py:duplicated_spans):
    overlapping 8-word span hashes at stride 1, corpus-wide census, per-doc
    duplicated-span fraction — the Lee-et-al substring-dedup signal beside
    the fixed-grid segment dedup."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.duplicated_spans(docs, window=8)


def _spans_sql(w: int = 8) -> str:
    ws = "string_split(lower(text), ' ')"
    return (
        f"WITH d AS (SELECT doc_id, {ws} AS ws FROM documents), "
        "hs AS (SELECT doc_id, "
        f"""unnest([{md5_int_sql(f"array_to_string(ws[i:i+{w - 1}], ' ')")} """
        f"FOR i IN range(1, greatest(len(ws)-{w - 1}, 1)+1)]) AS h FROM d), "
        "census AS (SELECT h, count(*) AS n FROM hs GROUP BY 1) "
        "SELECT doc_id, count(*) AS n_spans, "
        "CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans, "
        "round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) / count(*), 6) AS dup_frac "
        "FROM hs JOIN census USING (h) GROUP BY doc_id ORDER BY doc_id"
    )


def _excerpt_corpus(docs: DataFrame) -> DataFrame:
    """Planted containment fixture: the corpus plus one excerpt per doc
    (doc_id + 1000000, the first 12 words) — the excerpt's shingle set is
    a subset of its parent's, so every (parent, excerpt) pair has
    containment 1.0 while Jaccard stays ≈ excerpt_sz/parent_sz (below any
    Jaccard threshold) — exactly the asymmetry the operator exists for.
    Mirrored verbatim in the oracle SQL."""
    ws = F.split(F.col("text"), " ")
    excerpt = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(" ", F.slice(ws, 1, 12)).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(excerpt)


def xd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-containment pairs (ext/dedup.py:ngram_containment_pairs) on
    the excerpt-planted corpus: capped inverted index + sound count bound
    + full-set verify; catches the quote/excerpt overlaps Jaccard misses."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.ngram_containment_pairs(
        _excerpt_corpus(docs), threshold=0.8
    ).orderBy("id_a", "id_b")


def xd_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-copy exact-substring dedup APPLIED
    (ext/dedup.py:remove_duplicated_spans) over the excerpt-planted
    corpus: every excerpt's words are covered by spans whose canonical
    occurrence lives in the parent, so excerpts clean to empty while
    parents survive intact — the Lee et al. cut, not just the census."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.remove_duplicated_spans(_excerpt_corpus(docs))


def _span_removal_sql(w: int = 8) -> str:
    """DuckDB mirror of xd_span_removal: same md5 span hashes with the
    truncated-tail convention, canonical = min (doc_id, pos) struct,
    gaps-and-islands region assembly (overlap-only merge), per-REGION
    any-canonical keep, position-indexed cut filter over the cut
    intervals — the same two windows + two aggregations as the Spark
    plan."""
    span_h = md5_int_sql(f"array_to_string(ws[i:i+{w - 1}], ' ')")
    prev_end = (
        f"max(pos + {w - 1}) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    return (
        f"WITH {_CONT_CORPUS_SQL}, "
        "d AS (SELECT doc_id, string_split(text, ' ') AS wo, "
        "string_split(lower(text), ' ') AS ws FROM corpus), "
        "hs AS (SELECT doc_id, "
        f"unnest([struct_pack(p := i, h := {span_h}) "
        f"FOR i IN range(1, greatest(len(ws)-{w - 1}, 1)+1)]) AS sp FROM d), "
        "s AS (SELECT doc_id, sp.p AS pos, sp.h AS h FROM hs), "
        "census AS (SELECT h, count(*) AS n, "
        "min(struct_pack(d := doc_id, p := pos)) AS f FROM s GROUP BY 1), "
        "dup AS (SELECT s.doc_id, s.pos, "
        "(s.doc_id = f.d AND s.pos = f.p) AS canon "
        "FROM s JOIN census USING (h) WHERE n > 1), "
        "i AS (SELECT doc_id, pos, canon, "
        f"CASE WHEN {prev_end} IS NULL OR pos > {prev_end} "
        "THEN 1 ELSE 0 END AS nw FROM dup), "
        "i2 AS (SELECT doc_id, pos, canon, "
        "sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM i), "
        f"reg AS (SELECT doc_id, isl, min(pos) AS a, max(pos) + {w - 1} AS b, "
        "max(CAST(canon AS INT)) AS anyc FROM i2 GROUP BY 1, 2), "
        "ct AS (SELECT doc_id, "
        "list_sort(list(struct_pack(a := a, b := b))) AS cuts "
        "FROM reg WHERE anyc = 0 GROUP BY 1), "
        "c AS (SELECT d.doc_id, wo, "
        "coalesce(cuts, []) AS cuts "
        "FROM d LEFT JOIN ct USING (doc_id)), "
        "k AS (SELECT doc_id, wo, [wo[j] FOR j IN range(1, len(wo)+1) "
        "IF len(list_filter(cuts, cc -> cc.a <= j AND j <= cc.b)) = 0] "
        "AS kept FROM c) "
        "SELECT doc_id, CAST(len(wo) AS BIGINT) AS n_words, "
        "CAST(len(wo) - len(kept) AS BIGINT) AS n_removed, "
        "coalesce(array_to_string(kept, ' '), '') AS clean_text "
        "FROM k ORDER BY doc_id"
    )


def xt_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams with corpus + document frequencies
    (ext/text.py:top_ngrams) — the tokenizer-training statistics pass."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.top_ngrams(docs, n=2, k=20)


def xs_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes + exact reconstruction error
    (ext/similarity.py:pq_codes): 8 subspaces × 16 seeded unit centroids,
    one zero-shuffle projection — the 32× ANN storage-compression path
    beside int8 quantization (XS-quant)."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return similarity.pq_codes(emb)


def xs_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC (asymmetric-distance) top-20 over PQ codes
    (ext/similarity.py:pq_adc_topk): the query's m×ksub distance table is
    baked in as literals, so ranking reads ONLY the 8 small code columns —
    the compressed-domain search that makes PQ useful at billon-vector
    scale. Seeded codebooks keep it a pure function of the seed for the
    oracle; the trained path is recall-gated in tests."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    codes = similarity.pq_codes(emb)
    cbs = [similarity._seed_unit_centroids(8, 16, 11 + j) for j in range(8)]
    return similarity.pq_adc_topk(codes, _QUERY_VEC, cbs, k=20)


def xs_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse probe + PQ/ADC rerank in one query
    (ext/similarity.py:ivfadc_topk) — the FAISS IVFADC production ANN
    shape: probe 3 of 8 cells, rank survivors by asymmetric distance over
    residual PQ codes (per-cell LUT literals, zero shuffle), exact-rerank
    the top-50 shortlist. Seeded quantizers keep it a pure function of the
    seeds for the oracle; the trained path is recall-gated in
    tests/test_scale_smoke.py."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return similarity.ivfadc_topk(emb, _QUERY_VEC, k=10, shortlist=50)


def _ivfadc_sql(
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    n_centroids: int = 8,
    n_probe: int = 3,
    coarse_seed: int = 7,
    m: int = 8,
    ksub: int = 16,
    pq_seed: int = 11,
) -> str:
    """DuckDB mirror of xs_ivfadc: the _ivf_sql cell assignment, residual
    via an elementwise list_transform against the probed cell's centroid
    literal, the _pq_sql code assignment over residual slices, per-cell
    ADC LUT literals (computed by the identical driver-side Python sums),
    the same rounded-ADC shortlist, and the _cosine_sql exact rerank."""
    dim = len(query_vec)
    sub = dim // m
    cents = similarity._seed_centroids(dim, n_centroids, coarse_seed)
    cbs = [
        similarity._seed_unit_centroids(sub, ksub, pq_seed + j) for j in range(m)
    ]
    scores = ", ".join(
        f"({sum(c * c for c in cent)!r} - 2.0 * list_dot_product(v, {_vec_sql(cent)}))"
        for cent in cents
    )
    qd = [
        sum(c * c for c in cent) - 2.0 * sum(a * b for a, b in zip(query_vec, cent))
        for cent in cents
    ]
    probes = [i + 1 for i in sorted(range(len(cents)), key=lambda i: (qd[i], i))[:n_probe]]
    cvec_case = (
        "CASE "
        + " ".join(
            f"WHEN cell = {p} THEN CAST({_vec_sql(cents[p - 1])} AS DOUBLE[])"
            for p in probes
        )
        + " END"
    )
    code_cols = []
    for j in range(m):
        subv = f"r[{j * sub + 1}:{(j + 1) * sub}]"
        sc = ", ".join(
            f"({sum(c * c for c in cent)!r} - 2.0 * "
            f"list_dot_product({subv}, {_vec_sql(cent)}))"
            for cent in cbs[j]
        )
        code_cols.append(
            f"CAST(list_position([{sc}], list_min([{sc}])) AS INT) AS code_{j}"
        )
    adc_terms = []
    for j in range(m):
        cases = []
        for p in probes:
            qr = [a - b for a, b in zip(query_vec, cents[p - 1])]
            qj = qr[j * sub : (j + 1) * sub]
            lut = [
                sum((a - b) * (a - b) for a, b in zip(qj, cent)) for cent in cbs[j]
            ]
            cases.append(
                f"WHEN cell = {p} THEN CAST({_vec_sql(lut)} AS DOUBLE[])[code_{j}]"
            )
        adc_terms.append(f"(CASE {' '.join(cases)} END)")
    adc = " + ".join(adc_terms)
    return (
        f"WITH s AS (SELECT vec_id, {_VD} AS v FROM embeddings), "
        f"a AS (SELECT vec_id, v, CAST(list_position([{scores}], "
        f"list_min([{scores}])) AS INT) AS cell FROM s), "
        f"p AS (SELECT vec_id, v, cell, {cvec_case} AS cv FROM a "
        f"WHERE cell IN ({', '.join(str(p) for p in probes)})), "
        f"r AS (SELECT vec_id, v, cell, "
        f"list_transform(range(1, {dim + 1}), i -> v[i] - cv[i]) AS r FROM p), "
        f"c AS (SELECT vec_id, v, cell, {', '.join(code_cols)} FROM r), "
        f"d AS (SELECT vec_id, v, cell, round({adc}, 6) AS adc_dist FROM c), "
        f"sl AS (SELECT vec_id, v, cell, adc_dist FROM d "
        f"ORDER BY adc_dist, vec_id LIMIT {shortlist}) "
        f"SELECT vec_id, cell, adc_dist, {_cosine_sql('v', query_vec)} AS cosine "
        f"FROM sl ORDER BY cosine DESC, vec_id LIMIT {k}"
    )


def _recall_corpus(emb: DataFrame, query_vec: list[float]) -> DataFrame:
    """Embeddings plus 20 planted query-aligned vectors (scaled copies of
    the query, vec_id 2_000_000+i, scale 1 + i/100): pure scaling keeps
    cosine exactly 1.0, so the exact top-10 is the planted cluster — the
    regime ANN exists for. On a cluster-free uniform corpus, IVF probe
    pruning legitimately caps recall near n_probe/n_centroids (there is
    no structure to exploit); recall is a property of cluster RECOVERY,
    which is what this plants — the same design as the 20k trained-recall
    smoke (tests/test_scale_smoke.py)."""
    spark = emb.sparkSession
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    plants = spark.range(20).select(
        (F.col("id") + F.lit(2_000_000)).alias("vec_id"),
        F.transform(
            qarr, lambda x: x * (F.lit(1.0) + F.col("id") * F.lit(0.01))
        ).alias("embedding"),
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return base.unionByName(plants)


_RECALL_CORPUS_SQL = (
    "corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding "
    "FROM embeddings UNION ALL "
    "SELECT 2000000 + i AS vec_id, "
    "list_transform({qv}, x -> x * (1.0 + i * 0.01)) AS embedding "
    "FROM range(20) t(i))"
)


def xs_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC recall@10 vs the exact cosine top-10
    (ext/similarity.py:ivfadc_recall) over the cluster-planted corpus —
    the ANN quality number itself under the oracle gate: coarse probe +
    residual ADC + exact rerank must recover ≥ the smoke gate's 0.8
    floor of the true neighbors, reported as one driver-hash-checked
    row."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return similarity.ivfadc_recall(
        _recall_corpus(emb, _QUERY_VEC), _QUERY_VEC, k=10, shortlist=50
    )


def _recall_sql(query_vec: list[float], k: int = 10, floor: float = 0.8) -> str:
    """DuckDB mirror of xs_recall: the XS-ivfadc oracle and the
    XS-cosine-topk oracle as CTEs over the same planted corpus,
    inner-joined on vec_id, counted."""
    corpus = _RECALL_CORPUS_SQL.format(qv=f"CAST({_vec_sql(query_vec)} AS DOUBLE[])")
    approx = _ivfadc_sql(query_vec, k=k).replace(
        "FROM embeddings", "FROM corpus"
    )
    exact = _cosine_topk_sql(query_vec, k).replace(
        "FROM embeddings", "FROM corpus"
    )
    # _VD re-casts the already-double corpus column — a no-op both engines
    # share (the Spark side also re-casts inside cosine_topk/ivfadc_topk)
    return (
        f"WITH {corpus}, ap AS ({approx}), ex AS ({exact}), "
        "h AS (SELECT count(*) AS n_hits FROM ap JOIN ex USING (vec_id)) "
        f"SELECT CAST({k} AS BIGINT) AS k, CAST(n_hits AS BIGINT) AS n_hits, "
        f"round(n_hits / {k}, 6) AS recall, "
        f"n_hits / {k} >= {float(floor)!r} AS meets_floor FROM h"
    )


_BM25_QUERY = ["hash", "join", "scan", "vector", "quantile"]


def xr_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 against a fixed bag-of-words query
    (ext/retrieval.py:bm25_topk) — the lexical-retrieval primitive for
    sourcing topical corpus slices and hard negatives; term stream
    filtered to the query's literal set before any aggregation, df/N/
    avgdl broadcast, TakeOrderedAndProject top-k."""
    from haf_plug_play_spark.ext import retrieval

    docs = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(docs, _BM25_QUERY, k=10)


def _bm25_sql(
    query_terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB mirror of bm25_topk: exact-integer tf/df/dl, integer-exact
    avgdl division, the same Lucene-IDF arithmetic with the identical
    driver-side Python float literals (repr round-trips)."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    num = f"(tf * {k1 + 1.0!r})"
    den = f"(tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))"
    idf = "ln(1.0 + (n - df + 0.5) / (df + 0.5))"
    return (
        "WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "x -> x <> '') AS ws FROM documents), "
        "lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w), "
        "stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens), "
        "terms AS (SELECT doc_id, unnest(ws) AS t FROM w), "
        f"tf AS (SELECT doc_id, t, count(*) AS tf FROM terms "
        f"WHERE t IN ({terms}) GROUP BY 1, 2), "
        "dfc AS (SELECT t, count(*) AS df FROM tf GROUP BY 1), "
        f"sc AS (SELECT tf.doc_id, {idf} * {num} / {den} AS s "
        "FROM tf JOIN dfc USING (t) JOIN lens USING (doc_id) CROSS JOIN stats) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, "
        "round(sum(s), 6) AS bm25 FROM sc GROUP BY 1 "
        f"ORDER BY bm25 DESC, doc_id LIMIT {k}"
    )


def xt_clf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (ext/classify.py:lr_score): the
    fastText/CCNet-style linear classifier over hashed unigram+bigram
    features, mean-pooled — seeded coefficients keep the canonical query
    a pure function of the seed (the BPE learn-vs-apply split); training
    is pytest-gated (loss reduction + planted-vocabulary separation)."""
    from haf_plug_play_spark.ext import classify

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return classify.lr_score(docs, classify.seed_weights())


def _clf_score_ctes(n_buckets: int = 128, seed: int = 23) -> str:
    """The classifier-scoring CTE chain up to ``m(doc_id, n_feats,
    margin)`` — the SQL twin of the shared featurizer
    (ext/hashing.py:unigram_bigram_features) plus the seeded weight
    literals; ONE definition shared by the XT-clf-quality oracle and the
    pipeline-6 composition so the mirrors cannot drift apart."""
    from haf_plug_play_spark.ext import classify

    warr = _vec_sql(classify.seed_weights(n_buckets, seed))
    return (
        "w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "x -> x <> '') AS ws FROM documents), "
        "f AS (SELECT doc_id, unnest(ws) AS f FROM w "
        "UNION ALL SELECT doc_id, "
        "unnest([array_to_string(ws[i:i+1], ' ') "
        "FOR i IN range(1, greatest(len(ws) - 1, 0) + 1)]) AS f FROM w), "
        f"fb AS (SELECT doc_id, {md5_int_sql('f')} % {n_buckets} AS b FROM f), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats, "
        f"sum(CAST({warr} AS DOUBLE[])[b + 1]) AS wsum FROM fb GROUP BY 1), "
        "m AS (SELECT doc_id, n_feats, "
        "round(0.0 + wsum / n_feats, 6) AS margin FROM agg)"
    )


def _clf_quality_sql(
    n_buckets: int = 128, seed: int = 23, threshold: float = 0.5
) -> str:
    """DuckDB mirror of xt_clf_quality: the shared scoring CTEs, margin
    rounded BEFORE the sigmoid so both engines exponentiate the
    identical argument."""
    return (
        f"WITH {_clf_score_ctes(n_buckets, seed)} "
        "SELECT doc_id, n_feats, margin, "
        "round(1.0 / (1.0 + exp(-margin)), 6) AS p_keep, "
        f"round(1.0 / (1.0 + exp(-margin)), 6) >= {threshold!r} AS keep "
        "FROM m ORDER BY doc_id"
    )


def xt_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM scoring (ext/text.py:bigram_lm_scores) —
    the fluency-sensitive step up from XT-unigram-lm toward the KenLM
    perplexity filter: Jelinek-Mercer mixture of corpus-trained MLE
    bigram and unigram probabilities, mean log-prob per document."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.bigram_lm_scores(docs)


def xt_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram LM scoring
    (ext/text.py:kn_trigram_lm_scores) — the KenLM-class perplexity
    filter: absolute discounting at each order, continuation counts
    below the top, trained on the scored corpus; mean log-prob per
    document."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.kn_trigram_lm_scores(docs)


def xk_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (ext/sketch.py:hll_distinct)
    over the corpus's 3-word shingle stream, keyed by source so the
    merge path is real: per-source sketches merged by per-register max
    must estimate EXACTLY what the direct global sketch estimates, and
    the estimate must sit within four standard errors of the exact
    distinct count — both certified in-query."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(words) - F.lit(2), F.lit(1))
    )
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, 3))
    )
    items = docs.select("source", F.explode(shingles).alias("item"))
    return sketch.hll_distinct(items)


def _hll_sql() -> str:
    from haf_plug_play_spark.ext.sketch import hll_sql

    item_sql = (
        "SELECT source, unnest([array_to_string(ws[i:i+2], ' ') "
        "FOR i IN range(1, greatest(len(ws)-2, 1)+1)]) AS item FROM "
        "(SELECT source, string_split(lower(text), ' ') AS ws "
        "FROM documents)"
    )
    return hll_sql(item_sql)


def xt_clf_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration audit (ext/classify.py:calibration_report):
    reliability bins + ECE of the seeded quality scorer's p_keep against
    an 'is English' reference label — the pass a model-gated curation
    pipeline runs before trusting its keep threshold. The label choice
    is a fixture property; the OPERATOR is the content (binning, gaps,
    prevalence-weighted ECE, all in one bounded aggregation)."""
    from haf_plug_play_spark.ext import classify

    docs = _spread(load_table(spark, sf_dir, "documents"))
    scored = classify.lr_score(docs, classify.seed_weights()).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return classify.calibration_report(scored, F.col("lang") == "en")


def _clf_calibration_sql(n_bins: int = 10) -> str:
    """DuckDB mirror of xt_clf_calibration: the shared scoring CTEs, the
    same least/floor binning, per-bin means rounded 6 dp BEFORE the
    gap/ECE arithmetic."""
    return (
        f"WITH {_clf_score_ctes()}, "
        "sc AS (SELECT m.doc_id, "
        "round(1.0 / (1.0 + exp(-margin)), 6) AS p, "
        "CAST(d.lang = 'en' AS INT) AS y "
        "FROM m JOIN documents d ON d.doc_id = m.doc_id), "
        "pb AS (SELECT CAST(least(floor(p * "
        f"{n_bins}), {n_bins - 1}) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "round(avg(p), 6) AS mean_p, round(avg(y), 6) AS frac_pos "
        "FROM sc WHERE y IS NOT NULL GROUP BY 1), "
        "pg AS (SELECT *, round(abs(mean_p - frac_pos), 6) AS gap FROM pb), "
        "tot AS (SELECT round(sum(n_docs * gap) / sum(n_docs), 6) AS ece "
        "FROM pg) "
        "SELECT bin, n_docs, mean_p, frac_pos, gap, ece "
        "FROM pg CROSS JOIN tot ORDER BY bin"
    )


def xa_pack_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency accounting (ext/sampling.py:packing_report)
    over the XA-pack-chunks assignment: per source, chunks filled, token
    capacity occupancy, docs per chunk — the packing-factor audit that
    sizes a pretraining token budget."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", xt.n_tokens_ws(F.col("text"))
    )
    packed = sampling.pack_chunks(
        docs, ["source"], "n_tok", budget=2048, order_col="doc_id"
    )
    return sampling.packing_report(packed, ["source"], "n_tok", budget=2048)


def _pack_report_sql(budget: int = 2048) -> str:
    return (
        f"WITH t AS (SELECT doc_id, source, {_NTOK_SQL} AS n_tok "
        "FROM documents), "
        "r AS (SELECT doc_id, source, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS chunk_offset FROM t), "
        f"p AS (SELECT *, CAST(floor(chunk_offset / {budget}) AS BIGINT) "
        "AS chunk_id FROM r), "
        "a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(DISTINCT chunk_id) AS BIGINT) AS n_chunks, "
        "CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM p GROUP BY 1) "
        "SELECT source, n_docs, n_chunks, n_tokens, "
        "round(CAST(n_docs AS DOUBLE) / n_chunks, 6) AS docs_per_chunk, "
        f"round(CAST(n_tokens AS DOUBLE) / (n_chunks * {budget}), 6) "
        "AS fill_ratio FROM a ORDER BY source"
    )


def xt_trigram_lm_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KN trigram LM with the KenLM-style count cutoff (min_count=2 —
    singleton trigrams/bigrams pruned from the model): the footprint
    dial that bounds the count tables at crawl scale, scored through the
    standard backoff fallbacks (ext/text.py:kn_trigram_lm_scores)."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.kn_trigram_lm_scores(docs, min_count=2)


def _trigram_lm_sql(d: float = 0.75, min_count: int = 0) -> str:
    """DuckDB mirror of kn_trigram_lm_scores: same (w, pv, ppv) stream,
    same count tables (trigram/bigram/unigram + context and continuation
    derivatives, merged per join key, pruned at the same cutoff), same
    discount algebra and pruning fallbacks in the same evaluation order,
    round(avg, 6)."""
    D = repr(float(d))
    MC = max(int(min_count), 1)
    pcont = (
        "CASE WHEN n1w IS NOT NULL THEN CAST(n1w AS DOUBLE) / NB "
        "ELSE CAST(cu AS DOUBLE) / T END"
    )
    pkn2 = (
        f"CASE WHEN n1mid IS NULL THEN {pcont} "
        f"ELSE greatest(coalesce(n1cont, 0) - {D}, 0.0) / n1mid "
        f"+ {D} * n1succ3 / n1mid * ({pcont}) END"
    )
    return (
        "WITH dd AS (SELECT doc_id, string_split(lower(text), ' ') AS ws "
        "FROM documents), "
        "st AS (SELECT doc_id, unnest([struct_pack(w := ws[i], "
        "pv := CASE WHEN i >= 2 THEN ws[i-1] END, "
        "ppv := CASE WHEN i >= 3 THEN ws[i-2] END) "
        "FOR i IN range(1, len(ws)+1)]) AS t FROM dd), "
        "tok AS (SELECT doc_id, t.w AS w, t.pv AS pv, t.ppv AS ppv FROM st), "
        "uni AS (SELECT w, count(*) AS cu FROM tok GROUP BY 1), "
        "bi AS (SELECT pv, w, count(*) AS cb FROM tok "
        f"WHERE pv IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= {MC}), "
        "tri AS (SELECT ppv, pv, w, count(*) AS ct FROM tok "
        f"WHERE ppv IS NOT NULL GROUP BY 1, 2, 3 HAVING count(*) >= {MC}), "
        "tot AS (SELECT sum(cu) AS T FROM uni), "
        "nb AS (SELECT count(*) AS NB FROM bi), "
        "pvs AS (SELECT pv, cpv, n1succ, n1mid, n1succ3 FROM "
        "(SELECT pv, sum(cb) AS cpv, count(*) AS n1succ FROM bi GROUP BY 1) "
        "FULL JOIN (SELECT pv, count(*) AS n1mid, "
        "count(DISTINCT w) AS n1succ3 FROM tri GROUP BY 1) "
        "USING (pv)), "
        "wst AS (SELECT w, cu, n1w FROM uni "
        "LEFT JOIN (SELECT w, count(*) AS n1w FROM bi GROUP BY 1) USING (w)), "
        "pws AS (SELECT pv, w, cb, n1cont FROM bi "
        "FULL JOIN (SELECT pv, w, count(*) AS n1cont FROM tri GROUP BY 1, 2) "
        "USING (pv, w)), "
        "ctx3 AS (SELECT ppv, pv, sum(ct) AS c3, count(*) AS n13 "
        "FROM tri GROUP BY 1, 2), "
        "sc AS (SELECT doc_id, CASE "
        "WHEN tok.pv IS NULL THEN ln(CAST(cu AS DOUBLE) / T) "
        "WHEN tok.ppv IS NULL THEN CASE "
        f"WHEN cpv IS NULL THEN ln({pcont}) "
        f"ELSE ln(greatest(coalesce(cb, 0) - {D}, 0.0) / cpv "
        f"+ {D} * n1succ / cpv * ({pcont})) END "
        f"ELSE CASE WHEN c3 IS NULL THEN ln({pkn2}) "
        f"ELSE ln(greatest(coalesce(ct, 0) - {D}, 0.0) / c3 "
        f"+ {D} * n13 / c3 * ({pkn2})) END END AS lp "
        "FROM tok JOIN wst USING (w) "
        "LEFT JOIN pws ON pws.pv = tok.pv AND pws.w = tok.w "
        "LEFT JOIN pvs ON pvs.pv = tok.pv "
        "LEFT JOIN tri ON tri.ppv = tok.ppv AND tri.pv = tok.pv "
        "AND tri.w = tok.w "
        "LEFT JOIN ctx3 ON ctx3.ppv = tok.ppv AND ctx3.pv = tok.pv "
        "CROSS JOIN tot CROSS JOIN nb) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "round(avg(lp), 6) AS avg_logp FROM sc GROUP BY 1 ORDER BY doc_id"
    )


def _bigram_lm_sql(lam: float = 0.7) -> str:
    """DuckDB mirror of bigram_lm_scores: same (prev, word) stream, same
    MLE tables, the identical interpolation literals (repr round-trip),
    first token scored by unigram alone."""
    return (
        "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws "
        "FROM documents), "
        "tok AS (SELECT doc_id, unnest([struct_pack(wd := ws[i], "
        "pv := CASE WHEN i > 1 THEN ws[i-1] END) "
        "FOR i IN range(1, len(ws)+1)]) AS t FROM w), "
        "s AS (SELECT doc_id, t.wd AS w, t.pv AS pv FROM tok), "
        "uni AS (SELECT w, count(*) AS cu FROM s GROUP BY 1), "
        "tot AS (SELECT sum(cu) AS T FROM uni), "
        "bi AS (SELECT pv, w, count(*) AS cb FROM s "
        "WHERE pv IS NOT NULL GROUP BY 1, 2), "
        "sc AS (SELECT doc_id, CASE WHEN s.pv IS NULL "
        "THEN ln(CAST(uni.cu AS DOUBLE) / T) "
        f"ELSE ln({float(lam)!r} * (CAST(coalesce(bi.cb, 0) AS DOUBLE) / up.cu) "
        f"+ {1.0 - lam!r} * (CAST(uni.cu AS DOUBLE) / T)) END AS lp "
        "FROM s JOIN uni USING (w) "
        "LEFT JOIN bi ON bi.pv = s.pv AND bi.w = s.w "
        "LEFT JOIN uni up ON up.w = s.pv CROSS JOIN tot) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "round(avg(lp), 6) AS avg_logp FROM sc GROUP BY 1 ORDER BY doc_id"
    )


_MIX_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}


def xa_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture accounting (ext/sampling.py:mixture_report): per-source
    doc/token counts, actual vs recipe token shares, and the one-epoch
    Bernoulli rates that realize the target mixture — the bookkeeping
    pass every weighted-mix run starts from."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling_mod.mixture_report(
        docs, _MIX_TARGETS, xt.n_tokens_ws(F.col("text"))
    )


def _mix_report_sql(targets: dict[str, float]) -> str:
    case = (
        "CASE source "
        + " ".join(
            f"WHEN '{k}' THEN {float(v)!r}" for k, v in sorted(targets.items())
        )
        + " ELSE 0.0 END"
    )
    return (
        "WITH t AS (SELECT source, count(*) AS n_docs, "
        f"CAST(sum({_NTOK_SQL}) AS BIGINT) AS n_tokens "
        "FROM documents GROUP BY 1), "
        "s AS (SELECT source, n_docs, n_tokens, "
        "CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS share, "
        f"CAST({case} AS DOUBLE) AS target_share FROM t), "
        "r AS (SELECT *, CASE WHEN share = 0 THEN 0.0 "
        "ELSE target_share / share END AS ratio FROM s) "
        "SELECT source, n_docs, n_tokens, round(share, 6) AS token_share, "
        "target_share, round(CASE WHEN max(ratio) OVER () = 0 THEN 0.0 "
        "ELSE ratio / max(ratio) OVER () END, 6) AS sample_rate "
        "FROM r ORDER BY source"
    )


def xp_pipeline6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth composed pipeline — MODEL-gated curation over the r6
    operators: classifier quality scores (seeded weights — ext/classify.py
    lr_score) gate the corpus (keep p ≥ 0.5) → exact-dedup keeper
    (first-wins per normalized text) → token-budget packing per lang.
    One Catalyst plan: the classifier is an explode + element_at on the
    weight literal + keyed agg semi-joined back, dedup is one window,
    packing one per-stratum window."""
    from haf_plug_play_spark.ext import classify
    from pyspark.sql.window import Window as _W

    docs = load_table(spark, sf_dir, "documents")
    kept_ids = (
        classify.lr_score(docs, classify.seed_weights())
        .filter(F.col("keep"))
        .select("doc_id")
    )
    kept = docs.join(kept_ids, "doc_id", "left_semi")
    fp_w = _W.partitionBy(xt.fingerprint_md5(F.col("text"))).orderBy("doc_id")
    uniq = (
        kept.withColumn("_rn", F.row_number().over(fp_w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", xt.n_tokens_ws(F.col("text")).alias("n_tok"))
    )
    packed = sampling_mod.pack_chunks(uniq, ["lang"], "n_tok", 1024, "doc_id")
    return packed.select(
        "doc_id", "lang", "n_tok", "chunk_offset", "chunk_id"
    ).orderBy("doc_id")


def _pipeline6_sql(budget: int = 1024, threshold: float = 0.5) -> str:
    """DuckDB mirror of xp_pipeline6: the SHARED classifier scoring CTEs
    (_clf_score_ctes — one definition with the XT-clf-quality oracle),
    the XP-pipeline keeper window, the XA-pack-chunks running offset."""
    return (
        f"WITH {_clf_score_ctes()}, "
        "keptid AS (SELECT doc_id FROM m "
        f"WHERE round(1.0 / (1.0 + exp(-margin)), 6) >= {threshold!r}), "
        "kept AS (SELECT d.* FROM documents d JOIN keptid USING (doc_id)), "
        "uniq AS (SELECT doc_id, lang, "
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) "
        "AS n_tok FROM (SELECT *, row_number() OVER "
        r"(PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) "
        "ORDER BY doc_id) AS rn FROM kept) WHERE rn = 1), "
        "packed AS (SELECT doc_id, lang, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS chunk_offset FROM uniq) "
        "SELECT doc_id, lang, n_tok, chunk_offset, "
        f"CAST(floor(chunk_offset / {budget}) AS BIGINT) AS chunk_id "
        "FROM packed ORDER BY doc_id"
    )


# Fixed BPE merge rules — the tokenizer-model artifact for the oracle-gated
# tokenization query: the first 8 rules learn_bpe_merges learns from the
# sf0.01 documents corpus, hardcoded so the query is a pure function of its
# input (learning itself is iterative and stays under the golden/replay
# gate in tests/test_bpe.py).
_BPE_FIXTURE_MERGES = [
    {"rank": 1, "left": "e", "right": "r▁"},
    {"rank": 2, "left": "o", "right": "w▁"},
    {"rank": 3, "left": "t", "right": "o"},
    {"rank": 4, "left": "a", "right": "t"},
    {"rank": 5, "left": "l", "right": "u"},
    {"rank": 6, "left": "a", "right": "s"},
    {"rank": 7, "left": "i", "right": "n"},
    {"rank": 8, "left": "e", "right": "r"},
]


def xt_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a fixed BPE merge list to the corpus (ext/bpe.py:apply_bpe):
    per-word greedy left-to-right merges, flattened to one token stream
    per document — all per-row expressions, zero shuffle. Both the
    engine's fast path and the oracle use the DOUBLE-space replace()-chain
    construction proven equal to the greedy fold (ext/bpe.py:apply_bpe —
    each match consumes one boundary space per side, so the delimiter
    regenerates and adjacent occurrences keep matching), certifying the
    tokenizer application end-to-end."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    out = bpe_mod.apply_bpe(docs, _BPE_FIXTURE_MERGES)
    return out.select(
        "doc_id",
        F.array_join("tokens", " ").alias("tokens_str"),
        "n_tokens",
    ).orderBy("doc_id")


def xa_pack_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-granular sequence packing (ext/sampling.py:
    pack_split_segments): the concatenated per-source token stream cut
    into EXACT 256-token chunks, documents split across chunk boundaries —
    one row per (doc, chunk) segment with the half-open token range. The
    whole-document variant is XA-pack-chunks; this is what the
    pretraining dataloader actually consumes."""
    from haf_plug_play_spark.ext import sampling

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", xt.n_tokens_ws(F.col("text"))
    )
    return (
        sampling.pack_split_segments(
            docs, ["source"], "n_tok", budget=256, order_col="doc_id"
        )
        .select(
            "doc_id", "source", "n_tok", "chunk_id",
            "seg_start", "seg_end", "seg_len",
        )
        .orderBy("doc_id", "chunk_id")
    )


def xt_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-taxonomy topic tagging (ext/text.py:topic_tag): distinct
    anchor-keyword hits per topic, first-match-wins argmax with
    lexicographic tie-break, 'other' when nothing hits — the
    domain-classification pass that steers a training mixture."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return xt.topic_tag(docs)


def xd_sem_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (ext/dedup.py:semantic_decontam): max cosine of every corpus vector
    against a broadcast eval subset (vec_id % 100 == 0) — catches the
    paraphrase contamination XT-decontam's n-gram overlap misses."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return dedup.semantic_decontam(
        emb, (F.col("vec_id") % 100) == 0, threshold=0.6
    )


def xa_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (ext/sampling.py:dsir_weights): hashed
    unigram+bigram log-likelihood ratios of the 'src0' target subset vs
    the full corpus — the pretraining-mixture steering signal."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return sampling_mod.dsir_weights(docs, F.col("source") == "src0")


_SEM_DECONTAM_SQL = (
    "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
    "vec_id % 100 = 0 AS is_eval FROM embeddings), "
    "n AS (SELECT vec_id, v, is_eval, sqrt(list_dot_product(v, v)) AS nn FROM v), "
    "ev AS (SELECT v AS evec, nn AS en FROM n WHERE is_eval), "
    "sc AS (SELECT c.vec_id, max(list_dot_product(c.v, evec) / (c.nn * en)) AS mc "
    "FROM n c LEFT JOIN ev ON TRUE WHERE NOT c.is_eval GROUP BY 1) "
    "SELECT vec_id, round(mc, 6) AS max_cos, "
    "coalesce(round(mc, 6) >= 0.6, FALSE) AS contaminated "
    "FROM sc ORDER BY vec_id"
)


def _dsir_ctes(n_buckets: int = 128, smoothing: float = 1.0) -> str:
    """The DSIR CTE chain up to ``dw(doc_id, n_feats, log_weight)`` —
    shared by the XA-dsir oracle and the pipeline-5 composition."""
    sb = smoothing * n_buckets
    return (
        "w AS (SELECT doc_id, source = 'src0' AS is_tgt, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws "
        "FROM documents), "
        "f AS (SELECT doc_id, is_tgt, unnest(ws) AS f FROM w "
        "UNION ALL SELECT doc_id, is_tgt, "
        "unnest([array_to_string(ws[i:i+1], ' ') "
        "FOR i IN range(1, greatest(len(ws) - 1, 0) + 1)]) AS f FROM w), "
        f"fb AS (SELECT doc_id, is_tgt, {md5_int_sql('f')} % {n_buckets} AS b "
        "FROM f), "
        "raw AS (SELECT b, count(*) AS q FROM fb GROUP BY 1), "
        "tg AS (SELECT b, count(*) AS t FROM fb WHERE is_tgt GROUP BY 1), "
        "tab AS (SELECT raw.b, q, coalesce(t, 0) AS t FROM raw "
        "LEFT JOIN tg USING (b)), "
        "tot AS (SELECT sum(q) AS qq, sum(t) AS tt FROM tab), "
        f"ratio AS (SELECT b, ln((t + {smoothing!r}) / (tt + {sb!r})) - "
        f"ln((q + {smoothing!r}) / (qq + {sb!r})) AS lr "
        "FROM tab CROSS JOIN tot), "
        "dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats, "
        "round(sum(lr), 6) AS log_weight FROM fb JOIN ratio USING (b) "
        "GROUP BY 1)"
    )


def _dsir_sql(n_buckets: int = 128, smoothing: float = 1.0) -> str:
    """DuckDB mirror of xa_dsir: identical md5 buckets, identical smoothed
    log-ratio arithmetic; the engine's zip_with bigrams (a <2-word doc
    yields none) mirror as a bounded list comprehension."""
    return (
        f"WITH {_dsir_ctes(n_buckets, smoothing)} "
        "SELECT doc_id, n_feats, log_weight FROM dw ORDER BY doc_id"
    )


def xp_pipeline5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth composed pipeline — DSIR-steered curation over the r5
    operators: score every document's target-likeness (dsir_weights,
    'src0' as target) → keep the target-like slice (log_weight > 0) →
    tag each survivor's topic (topic_tag) → token-granular pack per
    topic (pack_split_segments, exact 512-token chunks, docs split
    across boundaries). One Catalyst plan: the DSIR stage's bounded
    bucket broadcasts, a semi-join on the kept ids, the codegen topic
    CASE, one per-topic window + bounded sequence explode."""
    docs = load_table(spark, sf_dir, "documents")
    w = sampling_mod.dsir_weights(docs, F.col("source") == "src0")
    # materialized once (r15): the kept slice has two consumers (the
    # token-count base and the topic tagging), and each would otherwise
    # re-run the whole DSIR gate lineage — the stored footprint is the
    # pipeline's own working set (the surviving documents)
    kept = docs.join(
        w.filter(F.col("log_weight") > 0).select("doc_id"), "doc_id", "left_semi"
    ).transform(materialize)
    base = kept.select(
        "doc_id", xt.n_tokens_ws(F.col("text")).alias("n_tok")
    )
    staged = xt.topic_tag(kept).join(base, "doc_id")
    segs = sampling_mod.pack_split_segments(
        staged, ["topic"], "n_tok", budget=512, order_col="doc_id"
    )
    return segs.select(
        "doc_id", "topic", "n_tok", "chunk_id", "seg_start", "seg_end", "seg_len"
    ).orderBy("doc_id", "chunk_id")


def _pipeline5_sql(budget: int = 512) -> str:
    case, _ = _topic_case_sql()
    return (
        f"WITH {_dsir_ctes()}, "
        "kept AS (SELECT d.doc_id, d.text FROM documents d "
        "JOIN dw USING (doc_id) WHERE dw.log_weight > 0), "
        f"tg2 AS (SELECT doc_id, {case} AS topic, {_NTOK_SQL} AS n_tok "
        "FROM kept), "
        "r AS (SELECT doc_id, topic, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY topic ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off FROM tg2), "
        "c AS (SELECT doc_id, topic, n_tok, off, "
        f"unnest(range(CAST(floor(off / {budget}) AS BIGINT), "
        f"CAST(floor((off + n_tok - 1) / {budget}) AS BIGINT) + 1)) AS chunk_id "
        "FROM r WHERE n_tok > 0) "
        "SELECT doc_id, topic, n_tok, chunk_id, "
        f"greatest(CAST(0 AS BIGINT), chunk_id * {budget} - off) AS seg_start, "
        f"least(n_tok, (chunk_id + 1) * {budget} - off) AS seg_end, "
        f"least(n_tok, (chunk_id + 1) * {budget} - off) - "
        f"greatest(CAST(0 AS BIGINT), chunk_id * {budget} - off) AS seg_len "
        "FROM c ORDER BY doc_id, chunk_id"
    )


_NTOK_SQL = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"


def _pack_split_sql(budget: int = 256) -> str:
    """DuckDB mirror of xa_pack_split: same per-stratum running offset as
    XA-pack-chunks, then one range() unnest over the spanned chunk ids."""
    return (
        f"WITH t AS (SELECT doc_id, source, {_NTOK_SQL} AS n_tok FROM documents), "
        "r AS (SELECT doc_id, source, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off FROM t), "
        "c AS (SELECT doc_id, source, n_tok, off, "
        f"unnest(range(CAST(floor(off / {budget}) AS BIGINT), "
        f"CAST(floor((off + n_tok - 1) / {budget}) AS BIGINT) + 1)) AS chunk_id "
        "FROM r WHERE n_tok > 0) "
        "SELECT doc_id, source, n_tok, chunk_id, "
        f"greatest(CAST(0 AS BIGINT), chunk_id * {budget} - off) AS seg_start, "
        f"least(n_tok, (chunk_id + 1) * {budget} - off) AS seg_end, "
        f"least(n_tok, (chunk_id + 1) * {budget} - off) - "
        f"greatest(CAST(0 AS BIGINT), chunk_id * {budget} - off) AS seg_len "
        "FROM c ORDER BY doc_id, chunk_id"
    )


def _topic_case_sql() -> tuple[str, str]:
    """(CASE-chain argmax, greatest-hits) SQL pair mirroring topic_tag —
    shared by the XT-topics oracle and the pipeline-5 composition."""
    hits = {
        t: (
            "len(list_intersect(string_split(lower(text), ' '), "
            f"[{', '.join(repr(w) for w in xt.TOPIC_KEYWORDS[t])}]))"
        )
        for t in xt.TOPIC_PRIORITY
    }
    whens = []
    for i, t in enumerate(xt.TOPIC_PRIORITY):
        conds = [f"{hits[t]} > 0"] + [
            f"{hits[t]} >= {hits[later]}" for later in xt.TOPIC_PRIORITY[i + 1 :]
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{t}'")
    case = f"CASE {' '.join(whens)} ELSE 'other' END"
    greatest = f"greatest({', '.join(hits[t] for t in xt.TOPIC_PRIORITY)})"
    return case, greatest


def _topics_sql() -> str:
    """DuckDB mirror of topic_tag: the same intersect hit counts and the
    same first-match-wins CASE chain (see topic_tag's docstring for the
    argmax equivalence)."""
    case, greatest = _topic_case_sql()
    return (
        f"SELECT doc_id, {case} AS topic, "
        f"CAST({greatest} AS BIGINT) AS n_hits FROM documents ORDER BY doc_id"
    )


def _adc_sql(k: int = 20, m: int = 8, ksub: int = 16, seed: int = 11, dim: int = 64) -> str:
    """DuckDB mirror of xs_adc: the same code assignment as _pq_sql, then
    the same query-to-centroid lookup-table literals (computed by the
    identical driver-side Python sums as pq_adc_topk's F.lit values)."""
    sub = dim // m
    code_cols = []
    adc_terms = []
    for j in range(m):
        cents = similarity._seed_unit_centroids(sub, ksub, seed + j)
        subv = f"v[{j * sub + 1}:{(j + 1) * sub}]"
        scores = ", ".join(
            f"({sum(c * c for c in cent)!r} - 2.0 * "
            f"list_dot_product({subv}, {_vec_sql(cent)}))"
            for cent in cents
        )
        code_cols.append(
            f"CAST(list_position([{scores}], list_min([{scores}])) AS INT) "
            f"AS code_{j}"
        )
        qj = _QUERY_VEC[j * sub : (j + 1) * sub]
        lut = [
            sum((a - b) * (a - b) for a, b in zip(qj, cent)) for cent in cents
        ]
        # cast: a bare numeric list literal parses as DECIMAL[] in DuckDB
        adc_terms.append(f"CAST({_vec_sql(lut)} AS DOUBLE[])[code_{j}]")
    adc = " + ".join(adc_terms)
    return (
        f"WITH s AS (SELECT vec_id, {_VD} AS v FROM embeddings), "
        f"c AS (SELECT vec_id, {', '.join(code_cols)} FROM s) "
        f"SELECT vec_id, round({adc}, 6) AS adc_dist FROM c "
        f"ORDER BY adc_dist, vec_id LIMIT {k}"
    )


def _bpe_tokenize_sql() -> str:
    """DuckDB mirror of xt_bpe_tokenize: initial symbols as a DOUBLE-space
    joined char string (sentinel appended to the word-final char), each
    merge a literal replace() — the double delimiter regenerates after
    every match, making the greedy leftmost pass exactly the accumulator
    fold (see ext/bpe.py:apply_bpe)."""
    spaced = "regexp_replace(w, '(.)', '\\1  ', 'gs')"
    inner = (
        f"' ' || substr({spaced}, 1, length({spaced}) - 2) || "
        "chr(9601) || ' '"
    )
    for r in _BPE_FIXTURE_MERGES:
        left, right = r["left"], r["right"]
        inner = f"replace({inner}, ' {left}  {right} ', ' {left}{right} ')"
    return (
        "WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "x -> x <> '') AS ws FROM documents), "
        "t AS (SELECT doc_id, flatten(list_transform(ws, "
        f"w -> list_filter(string_split({inner}, ' '), x -> x <> ''))) AS toks "
        "FROM w) "
        "SELECT doc_id, array_to_string(toks, ' ') AS tokens_str, "
        "CAST(len(toks) AS BIGINT) AS n_tokens FROM t ORDER BY doc_id"
    )


def _pq_sql(m: int = 8, ksub: int = 16, seed: int = 11, dim: int = 64) -> str:
    """DuckDB mirror of pq_codes: same centroid literals, same
    c·c − 2·(v_j·c) scores, same left-to-right error accumulation."""
    sub = dim // m
    code_cols = []
    err_terms = []
    for j in range(m):
        cents = similarity._seed_unit_centroids(sub, ksub, seed + j)
        subv = f"v[{j * sub + 1}:{(j + 1) * sub}]"
        scores = ", ".join(
            f"({sum(c * c for c in cent)!r} - 2.0 * "
            f"list_dot_product({subv}, {_vec_sql(cent)}))"
            for cent in cents
        )
        code_cols.append(
            f"CAST(list_position([{scores}], list_min([{scores}])) AS INT) "
            f"AS code_{j}"
        )
        err_terms.append(
            f"(list_dot_product({subv}, {subv}) + list_min([{scores}]))"
        )
    err = " + ".join(err_terms)
    return (
        f"WITH s AS (SELECT vec_id, {_VD} AS v FROM embeddings) "
        f"SELECT vec_id, {', '.join(code_cols)}, round({err}, 6) AS recon_err "
        "FROM s ORDER BY vec_id"
    )


_CONT_CORPUS_SQL = (
    "corpus AS (SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, "
    "array_to_string(string_split(text, ' ')[1:12], ' ') AS text FROM documents)"
)


def _containment_sql(n: int = 3, threshold: float = 0.8, max_df: int = 100) -> str:
    """DuckDB mirror of ngram_containment_pairs over the excerpt corpus:
    capped candidate index, exact scores from full shingle sets."""
    return (
        f"WITH {_CONT_CORPUS_SQL}, "
        f"sh AS (SELECT doc_id, unnest({_shingles_sql(n)}) AS shingle FROM corpus), "
        "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "
        "ints AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter "
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2), "
        f"dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1), "
        f"idx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle) "
        f"WHERE dfc.df <= {max_df}), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id), "
        "pairs AS (SELECT id_a, id_b, inter, "
        "round(inter / sa.sz, 6) AS cont_a, round(inter / sb.sz, 6) AS cont_b "
        "FROM ints JOIN sizes sa ON sa.doc_id = id_a "
        "JOIN sizes sb ON sb.doc_id = id_b) "
        "SELECT p.id_a, p.id_b, p.inter, p.cont_a, p.cont_b FROM pairs p "
        "JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b "
        f"WHERE greatest(p.cont_a, p.cont_b) >= {threshold} ORDER BY p.id_a, p.id_b"
    )


def _ngrams_sql(n: int = 2, k: int = 20) -> str:
    ws = "string_split(lower(text), ' ')"
    return (
        f"WITH w AS (SELECT doc_id, {ws} AS ws FROM documents), "
        "g AS (SELECT doc_id, "
        f"unnest([array_to_string(ws[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, greatest(len(ws)-{n - 1}, 1)+1)]) AS ngram FROM w), "
        "c AS (SELECT ngram, count(*) AS n_occurrences, "
        "count(DISTINCT doc_id) AS n_docs FROM g GROUP BY 1) "
        "SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, ngram) "
        "AS BIGINT) AS rank, ngram, n_occurrences, n_docs FROM c "
        f"ORDER BY n_occurrences DESC, ngram LIMIT {k}"
    )


_UNIGRAM_SQL = (
    "WITH words AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
    "FROM documents), "
    "counts AS (SELECT w, count(*) AS cnt FROM words GROUP BY 1), "
    "tot AS (SELECT sum(cnt) AS total FROM counts), "
    "logp AS (SELECT w, ln(CAST(cnt AS DOUBLE) / total) AS lp "
    "FROM counts CROSS JOIN tot) "
    "SELECT doc_id, count(*) AS n_words, round(avg(lp), 6) AS avg_logp "
    "FROM words JOIN logp USING (w) GROUP BY 1 ORDER BY doc_id"
)



def xt_ppl_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (ext/text.py:perplexity_gate):
    per-language perplexity terciles from the corpus-trained bigram LM
    (the LM is pluggable, as in CCNet's per-language KenLM swap), with
    the cutoffs learned on a deterministic half-sample of the ids and
    broadcast back — head/middle kept, tail cut."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    scored = xt.bigram_lm_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return xt.perplexity_gate(scored, sample_denom=2)


def _ppl_gate_sql(lam: float = 0.7, sample_denom: int = 2, seed: int = 5) -> str:
    """DuckDB mirror of xt_ppl_gate: the bigram-LM CTE chain, the same
    6-dp exp, the identical hash half-sample, integer-rank tercile
    cutoffs (floor BEFORE the int cast, matching the engine), the same
    boundary comparisons over 6-dp values."""
    base = _bigram_lm_sql(lam)
    salted_id = f"'ppl{seed}:' || CAST(doc_id AS VARCHAR)"
    samp_pred = f"{md5_int_sql(salted_id)} % {sample_denom} = 0"
    # NULL cutoffs = group absent from the hash sample → 'unsampled',
    # kept via LEFT JOIN (mirrors perplexity_gate's review-r9 contract:
    # you don't cut what you haven't measured)
    bucket = (
        "CASE WHEN _cut1 IS NULL THEN 'unsampled' "
        "WHEN ppl <= _cut1 THEN 'head' "
        "WHEN ppl <= _cut2 THEN 'middle' ELSE 'tail' END"
    )
    return (
        f"WITH base AS ({base}), "
        "j AS (SELECT b.doc_id, b.n_words, b.avg_logp, d.lang "
        "FROM base b JOIN documents d USING (doc_id)), "
        "wp AS (SELECT *, round(exp(-avg_logp), 6) AS ppl FROM j), "
        f"samp AS (SELECT * FROM wp WHERE {samp_pred}), "
        "srt AS (SELECT lang, list_sort(list(ppl)) AS s FROM samp GROUP BY 1), "
        "cuts AS (SELECT lang, "
        "s[CAST(floor((len(s) - 1) * 1 / 3) AS INT) + 1] AS _cut1, "
        "s[CAST(floor((len(s) - 1) * 2 / 3) AS INT) + 1] AS _cut2 FROM srt) "
        f"SELECT doc_id, lang, n_words, ppl, {bucket} AS ppl_bucket, "
        f"({bucket}) <> 'tail' AS keep "
        "FROM wp LEFT JOIN cuts USING (lang) ORDER BY doc_id"
    )


def xt_clf_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free classifier discrimination audit
    (ext/classify.py:roc_auc): Mann-Whitney ROC-AUC of the seeded
    quality scorer's p_keep against the 'is English' reference label,
    computed from per-score (pos, neg) counts so the cumulative pass
    never touches corpus-sized rows — the partner query to
    XT-clf-calibration (calibration says the probabilities are honest,
    AUC says they rank)."""
    from haf_plug_play_spark.ext import classify

    docs = _spread(load_table(spark, sf_dir, "documents"))
    scored = classify.lr_score(docs, classify.seed_weights()).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return classify.roc_auc(scored, F.col("lang") == "en")


def _clf_auc_sql() -> str:
    """DuckDB mirror of xt_clf_auc: shared scoring CTEs, per-score
    grouped counts, half-credit tie handling. The contribution terms
    pos*(cumneg + neg/2) are all multiples of 0.5, so their sum is
    EXACT in double arithmetic in both engines regardless of
    aggregation order — no reassociation caveat on this one."""
    return (
        f"WITH {_clf_score_ctes()}, "
        "sc AS (SELECT m.doc_id, "
        "round(1.0 / (1.0 + exp(-margin)), 6) AS p, "
        "CAST(d.lang = 'en' AS INT) AS y "
        "FROM m JOIN documents d ON d.doc_id = m.doc_id), "
        "ps AS (SELECT round(p, 6) AS s, CAST(sum(y) AS BIGINT) AS pos, "
        "CAST(count(*) - sum(y) AS BIGINT) AS neg FROM sc "
        "WHERE y IS NOT NULL GROUP BY 1), "
        "cw AS (SELECT *, coalesce(sum(neg) OVER (ORDER BY s "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg "
        "FROM ps), "
        "ag AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos, "
        "CAST(sum(neg) AS BIGINT) AS n_neg, "
        "CAST(count(*) AS BIGINT) AS n_distinct_scores, "
        "sum(pos * (CAST(cumneg AS DOUBLE) + neg / 2.0)) AS u FROM cw) "
        "SELECT n_pos, n_neg, n_distinct_scores, "
        "CASE WHEN n_pos > 0 AND n_neg > 0 "
        "THEN round(u / CAST(n_pos * n_neg AS DOUBLE), 6) END AS auc FROM ag"
    )


def xd_minhash_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator accuracy audit (ext/dedup.py:minhash_accuracy)
    over the XD-minhash-pairs LSH candidate set (same k=8/4-band/3-gram
    construction): signature-match estimate vs exact Jaccard, MAE /
    worst error / fraction inside two binomial standard errors, the
    2-sigma coverage floor certified in-query — the dedup analogue of
    XS-recall. Threshold 1e-6 drops zero-overlap hash-collision
    candidates, which the oracle's shared-shingle pair CTE cannot see."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return dedup.minhash_accuracy(docs, num_hashes=8, bands=4)


def _minhash_acc_sql(
    num_hashes: int = 8, bands: int = 4, n: int = 3, seed: int = 1
) -> str:
    """DuckDB mirror of xd_minhash_acc: the generated signature CTE, the
    same band-OR candidate join, the shared-shingle exact-Jaccard CTE,
    matching 6-dp rounds before the error arithmetic."""
    k = num_hashes
    r = num_hashes // bands
    band_conds = " OR ".join(
        "(" + " AND ".join(
            f"s1.h{bi * r + j} = s2.h{bi * r + j}" for j in range(r)
        ) + ")"
        for bi in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return (
        f"WITH sig AS ({_minhash_sig_sql(num_hashes, n, seed)}), "
        f"cand AS (SELECT DISTINCT s1.doc_id AS id_a, s2.doc_id AS id_b "
        f"FROM sig s1 JOIN sig s2 ON s1.doc_id < s2.doc_id AND ({band_conds})), "
        f"{_JACCARD_CTE.format(shingles=_shingles_sql(n))}, "
        "per AS (SELECT p.jaccard AS j, "
        f"round(({matches}) / {float(k)!r}, 6) AS est "
        "FROM pairs p JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b "
        "JOIN sig x ON x.doc_id = p.id_a JOIN sig y ON y.doc_id = p.id_b "
        "WHERE p.jaccard >= 1e-06), "
        "pe AS (SELECT j, est, round(abs(est - j), 6) AS err, "
        f"sqrt(j * (1 - j) / {float(k)!r}) AS se FROM per) "
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
        "round(avg(err), 6) AS mae, round(max(err), 6) AS max_err, "
        "round(avg(CAST(err <= 2 * se AS INT)), 6) AS frac_within_2se, "
        "coalesce(avg(CAST(err <= 2 * se AS INT)) >= 0.5, true) "
        "AS certified FROM pe"
    )


def xk_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-linear-histogram quantile sketch
    (ext/sketch.py:loglinear_quantiles) over per-document token counts:
    p50/p90/p99 document length read off a <= 512-bucket mergeable
    histogram, relative-error bound (<= 1/16 at 8 sub-buckets) and
    per-source-merge consistency certified in-query against the exact
    quantiles — the fourth sketch beside CMS, Bloom and HLL."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    items = docs.select(
        "source", xt.n_tokens_ws(F.col("text")).alias("value")
    )
    return sketch.loglinear_quantiles(items)


def _quantile_sql(sub_bits: int = 3) -> str:
    """DuckDB mirror of xk_quantile: identical integer bucket algebra
    (length(bin(x)) exponent, dyadic sub-bucket, integer ceil-rank),
    identical dyadic bound arithmetic."""
    from haf_plug_play_spark.ext.sketch import QUANTILE_TARGETS

    S = 1 << sub_bits
    qvals = ", ".join(
        f"(CAST({qn / qd!r} AS DOUBLE), {qn}, {qd})"
        for qn, qd in QUANTILE_TARGETS
    )
    cum = "sum(c) OVER (ORDER BY {o} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    return (
        f"WITH t AS (SELECT source, greatest({_NTOK_SQL}, 1) AS x FROM documents), "
        "e AS (SELECT source, x, CAST(length(bin(x)) - 1 AS INT) AS b FROM t), "
        f"ky AS (SELECT source, x, CAST(b * {S} + "
        f"CAST(floor(CAST(x * {S} AS DOUBLE) / pow(2.0, CAST(b AS DOUBLE))) "
        f"- {S} AS INT) AS INT) AS key FROM e), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ky), "
        f"qt AS (SELECT * FROM (VALUES {qvals}) AS v(q, qn, qd)), "
        "r AS (SELECT q, n AS n_values, "
        "CAST(floor((n * qn + qd - 1) / qd) AS BIGINT) AS rnk "
        "FROM qt CROSS JOIN nn), "
        "dh AS (SELECT key, count(*) AS c FROM ky GROUP BY 1), "
        f"dc AS (SELECT key, {cum.format(o='key')} AS cum FROM dh), "
        "sel AS (SELECT r.q, r.n_values, min(dc.key) AS k FROM r "
        "JOIN dc ON dc.cum >= r.rnk GROUP BY 1, 2), "
        "mh AS (SELECT key, sum(c) AS c FROM (SELECT source, key, "
        "count(*) AS c FROM ky GROUP BY 1, 2) GROUP BY 1), "
        f"mc AS (SELECT key, {cum.format(o='key')} AS cum FROM mh), "
        "selm AS (SELECT r.q, min(mc.key) AS k_m FROM r "
        "JOIN mc ON mc.cum >= r.rnk GROUP BY 1), "
        "eh AS (SELECT x, count(*) AS c FROM ky GROUP BY 1), "
        f"ec AS (SELECT x, {cum.format(o='x')} AS cum FROM eh), "
        "ex AS (SELECT r.q, min(ec.x) AS exact_v FROM r "
        "JOIN ec ON ec.cum >= r.rnk GROUP BY 1), "
        f"f AS (SELECT s.q, s.n_values, s.k, sm.k_m, e.exact_v, "
        f"CAST(floor(s.k / {S}) AS INT) AS kb, s.k % {S} AS ksub "
        "FROM sel s JOIN selm sm ON sm.q = s.q JOIN ex e ON e.q = s.q), "
        "g AS (SELECT *, "
        f"pow(2.0, CAST(kb AS DOUBLE)) * (1.0 + CAST(ksub AS DOUBLE) / {S}) AS lo, "
        f"pow(2.0, CAST(kb AS DOUBLE)) * (1.0 + CAST(ksub + 1 AS DOUBLE) / {S}) AS hi "
        "FROM f) "
        "SELECT q, n_values, round((lo + hi) / 2.0, 6) AS est, "
        "CAST(exact_v AS BIGINT) AS exact_v, "
        "round(abs((lo + hi) / 2.0 - exact_v) / CAST(exact_v AS DOUBLE), 6) AS rel_err, "
        "round((hi - lo) / (2.0 * lo), 6) AS err_bound, "
        "abs((lo + hi) / 2.0 - exact_v) / CAST(exact_v AS DOUBLE) "
        "<= (hi - lo) / (2.0 * lo) AS certified, "
        "k = k_m AS merge_consistent FROM g ORDER BY q"
    )



def xd_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup decision (ext/dedup.py:
    dedup_decision_by_quality): the XD-cluster component closure with
    the canonical keeper switched from min-id to HIGHEST QUALITY SCORE
    (ties -> min id) — the RefinedWeb/FineWeb selection rule (keep the
    best-scoring duplicate, not whichever crawled first). Keeper
    selection is one lexicographic struct-max aggregation per cluster —
    no window, so a million-document cluster costs what a pair does."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    return dedup.dedup_decision_by_quality(
        xt.with_quality(docs), pairs, F.col("q_score")
    ).orderBy("doc_id")


def _cluster_best_sql() -> str:
    """DuckDB mirror of xd_cluster_best: the XD-cluster recursive
    closure, the XT-quality q_score expression, and the identical
    (score, -id) lexicographic struct max per cluster."""
    pairs = _minhash_pairs_sql(8, 4, 3, 0.5, 1).replace(
        " ORDER BY p.id_a, p.id_b", ""
    )
    return (
        f"WITH RECURSIVE pr AS (SELECT id_a, id_b FROM ({pairs})), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pr "
        "UNION ALL SELECT id_b, id_a FROM pr), "
        "cc(id, comp) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT e.dst, cc.comp FROM cc JOIN edges e ON e.src = cc.id), "
        "lab AS (SELECT id, min(comp) AS cluster_id FROM cc GROUP BY id), "
        f"qs AS (SELECT doc_id, {_QSCORE_SQL} AS q FROM documents), "
        "best AS (SELECT cluster_id, max(struct_pack(q := q, ni := -id)) AS b "
        "FROM lab JOIN qs ON qs.doc_id = lab.id GROUP BY 1) "
        "SELECT lab.id AS doc_id, lab.cluster_id, "
        "CAST(-((best.b).ni) AS BIGINT) AS best_id, "
        "lab.id = -((best.b).ni) AS keep "
        "FROM lab JOIN best USING (cluster_id) ORDER BY doc_id"
    )


# ------------------------------------------------------------ round-10 ops


def xk_hll_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source HyperLogLog distinct-shingle counts
    (ext/sketch.py:hll_distinct_by_group) — the stratified sibling of
    XK-hll: one sketch per source over the same 3-word shingle stream,
    each certified against its own exact count at the paper's 4σ bound.
    The whole sketch pass is one (source, register)-keyed
    map-side-combinable aggregation (≤ sources × 256 rows), the corpus
    composition dashboard's shape at 100 TB."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(words) - F.lit(2), F.lit(1))
    )
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, 3))
    )
    items = docs.select("source", F.explode(shingles).alias("item"))
    return sketch.hll_distinct_by_group(items)


def _hll_strat_sql() -> str:
    from haf_plug_play_spark.ext.sketch import hll_group_sql

    item_sql = (
        "SELECT source, unnest([array_to_string(ws[i:i+2], ' ') "
        "FOR i IN range(1, greatest(len(ws)-2, 1)+1)]) AS item FROM "
        "(SELECT source, string_split(lower(text), ' ') AS ws "
        "FROM documents)"
    )
    return hll_group_sql(item_sql)


def xd_split_leak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: near-duplicate pairs (the XD-minhash-pairs
    machinery) whose two documents land in DIFFERENT holdout splits under
    the deterministic split assignment — the contamination a decontam
    stage keyed on an external eval corpus cannot see (the test split is
    carved from the training corpus itself, so a near-copy crossing the
    boundary leaks test content into train). Because the split is a pure
    function of the doc id (ext/sampling.py:split_assign), both sides'
    splits are computed directly ON the bounded pair list — zero joins
    beyond the pair generator's own banded candidates; scale cost equals
    XD-minhash-pairs exactly."""
    from haf_plug_play_spark.ext import sampling

    docs = _spread(load_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    leak = sampling.split_assign(
        pairs, "id_a", _SPLIT_FRACTIONS, seed=7
    ).withColumnRenamed("split", "split_a")
    leak = sampling.split_assign(
        leak, "id_b", _SPLIT_FRACTIONS, seed=7
    ).withColumnRenamed("split", "split_b")
    return (
        leak.filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def _split_leak_sql() -> str:
    from haf_plug_play_spark.ext.sampling import split_assign_sql

    pairs = _minhash_pairs_sql(8, 4, 3, 0.5, 1).replace(
        " ORDER BY p.id_a, p.id_b", ""
    )
    sa = split_assign_sql("id_a", _SPLIT_FRACTIONS, 7)
    sb = split_assign_sql("id_b", _SPLIT_FRACTIONS, 7)
    return (
        f"WITH pr AS ({pairs}), "
        f"sp AS (SELECT id_a, id_b, jaccard, {sa} AS split_a, {sb} AS split_b "
        "FROM pr) "
        "SELECT id_a, id_b, split_a, split_b, jaccard FROM sp "
        "WHERE split_a <> split_b ORDER BY id_a, id_b"
    )


def xt_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf/Heaps corpus diagnostic: token and type totals, type-token
    ratio, and the weighted least-squares slope/R² of ln(frequency) on
    ln(rank) fitted over the FREQUENCY HISTOGRAM — the standard sanity
    check that a corpus (or a dedup/sampling stage's output) still has
    natural-language frequency structure (slope ≈ −1 for clean text; a
    pipeline bug that duplicates or truncates content bends it).

    Scale shape (restructured r11 — VERDICT r10 #3 killed the previous
    unpartitioned ``row_number`` over the whole vocabulary): word counts
    are one map-side-combinable hash agg to a vocabulary-sized table;
    that table is then collapsed to the count-of-counts histogram
    (c, n_types_with_c), which is PROVABLY ≤ √(2·n_tokens) rows — D
    distinct counts are D distinct positive integers summing to
    ≤ n_tokens, so D(D+1)/2 ≤ n_tokens (≈6.3M rows even at 2·10¹³
    tokens). The one cumulative window runs over that √N-bounded
    histogram, never the vocabulary; each tied-count group of n types
    occupying ranks [prior+1, prior+n] enters the regression as one
    point at its midpoint log-rank with weight n (binned-rank fit —
    tied counts share y = ln c, so per-type rank order within a tie
    carries no information). Moments are plain weighted sums → one
    partial+final agg to a single row. FP caveat: the moment sums
    reassociate across the shuffle (the avg_logp caveat family,
    absorbed by 6-dp rounding). Degenerate corpora (≤1 distinct count,
    e.g. every word unique) have zero rank variance → slope/R² are
    NULL in both engines (guarded; ADVICE r10).

    Output: one row (n_tokens, n_types, ttr, zipf_slope, zipf_r2)."""
    from haf_plug_play_spark.ext import report

    return report.zipf_diagnostic(load_table(spark, sf_dir, "documents"))


def _zipf_sql() -> str:
    return (
        "WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents), "
        "c AS (SELECT w, count(*) AS c FROM w WHERE w <> '' GROUP BY 1), "
        "h AS (SELECT c, count(*) AS n FROM c GROUP BY 1), "
        "b AS (SELECT CAST(n AS DOUBLE) AS wt, "
        "ln(CAST(coalesce(sum(n) OVER (ORDER BY c DESC ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (n + 1) / 2.0 "
        "AS DOUBLE)) AS x, "
        "ln(CAST(c AS DOUBLE)) AS y, c * n AS tok FROM h), "
        "m AS (SELECT sum(tok) AS tok, sum(wt) AS s, sum(wt * x) AS sx, "
        "sum(wt * y) AS sy, sum(wt * x * x) AS sxx, sum(wt * y * y) AS syy, "
        "sum(wt * x * y) AS sxy FROM b) "
        "SELECT CAST(tok AS BIGINT) AS n_tokens, CAST(s AS BIGINT) AS n_types, "
        "round(s / CAST(tok AS DOUBLE), 6) AS ttr, "
        "round(CASE WHEN sxx / s - (sx / s) * (sx / s) > 0 THEN "
        "(sxy / s - (sx / s) * (sy / s)) / (sxx / s - (sx / s) * (sx / s)) "
        "END, 6) AS zipf_slope, "
        "round(CASE WHEN sxx / s - (sx / s) * (sx / s) > 0 AND "
        "syy / s - (sy / s) * (sy / s) > 0 THEN "
        "(sxy / s - (sx / s) * (sy / s)) * (sxy / s - (sx / s) * (sy / s)) / "
        "((sxx / s - (sx / s) * (sx / s)) * (syy / s - (sy / s) * (sy / s))) "
        "END, 6) AS zipf_r2 FROM m"
    )


# hll_overlap's pair fan-out replicates each group's m=256 registers to
# every pair it belongs to: S(S-1)/2 pairs → S·(S-1)·m merged-register
# rows. Trivial at S≈20 sources (~97k rows), real at S≈10⁴ strata
# (~25.6e9 rows). The guard below fails LOUDLY past this bound — at that
# scale shard the pair list (run the matrix in pair-batches over the one
# persisted register table) instead of one unbounded fan-out.
HLL_OVERLAP_MAX_GROUPS = 1024


def _overlap_fanout_guard(
    docs: DataFrame, group_col: str, max_groups: int = HLL_OVERLAP_MAX_GROUPS
) -> DataFrame:
    """LAZY scale guard for the overlap matrix's S(S-1)/2 register
    replication (ADVICE r12): a 1-row frame whose EXECUTION raises past
    ``max_groups`` — cross-joined (broadcast) into the shingle stream,
    so the broadcast BUILD trips the guard before the quadratic pair
    fan-out's probe side runs, while merely CONSTRUCTING the query
    (``explain --all``, the plan-hygiene sweep, scalebench plan
    building) launches no job at all. The distinct-count runs on the
    PRE-explode docs frame — same answer (every doc yields ≥1 shingle
    row), but a column-pruned scan of ``group_col`` instead of a full
    3-gram explode pass. The Filter references ``_s``, so column
    pruning cannot elide the aggregate the guard depends on. NULL joins
    the register/sketch pass (groupBy keeps NULL keys) but never the
    ``a < b`` pair list (NULL comparisons are NULL, so NULL-keyed pairs
    are filtered out); counting it — countDistinct alone would ignore
    it — merely tightens the bound by one, a deliberate conservatism
    (the coalesce keeps an empty corpus from evaluating the raise)."""
    return (
        docs.groupBy()
        .agg(
            (
                F.countDistinct(group_col)
                + F.coalesce(
                    F.max(F.col(group_col).isNull().cast("int")), F.lit(0)
                )
            ).alias("_s")
        )
        .where(
            F.when(
                F.col("_s") <= F.lit(int(max_groups)), F.lit(True)
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "hll_overlap pair fan-out is quadratic in groups: "
                        "%s groups > %s would replicate registers to "
                        "s*(s-1)/2 pairs — shard the pair list over the "
                        "persisted register table instead (SCALE.md: "
                        "'HLL overlap pair fan-out')",
                        F.col("_s"),
                        F.lit(int(max_groups)),
                    )
                )
            )
        )
        .select(F.lit(1).alias("_fanout_guard"))
    )


def _overlap_shingle_items(docs: DataFrame) -> DataFrame:
    """The (source, 3-gram shingle) item stream XK-hll-overlap sketches —
    ONE definition shared with the scalebench certify-A/B production
    form, so the two postures always measure the identical stream."""
    words = F.split(F.lower(F.col("text")), " ")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(words) - F.lit(2), F.lit(1))
    )
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, 3))
    )
    return docs.select("source", F.explode(shingles).alias("item"))


def xk_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix from mergeable HLL sketches
    (ext/sketch.py:hll_overlap) — per unordered source pair, the union
    cardinality from a true merged sketch (register max), the
    intersection by inclusion–exclusion, and the Jaccard estimate,
    each beside its exact counterpart. The mixture-composition question
    ("how much of source B is new over source A?") at 100 TB: one
    map-side-combinable register pass, then everything pairwise runs on
    ≤ sources × 256 broadcast rows; the exact legs are the droppable
    certification, as in XK-hll. The quadratic-fan-out guard rides the
    plan itself (broadcast 1-row frame, _overlap_fanout_guard) so query
    construction stays lazy."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    items = _overlap_shingle_items(docs)
    guard = _overlap_fanout_guard(docs, "source")
    items = items.crossJoin(F.broadcast(guard)).drop("_fanout_guard")
    return sketch.hll_overlap(items)


def _hll_overlap_sql() -> str:
    from haf_plug_play_spark.ext.sketch import hll_overlap_sql

    item_sql = (
        "SELECT source, unnest([array_to_string(ws[i:i+2], ' ') "
        "FOR i IN range(1, greatest(len(ws)-2, 1)+1)]) AS item FROM "
        "(SELECT source, string_split(lower(text), ' ') AS ws "
        "FROM documents)"
    )
    return hll_overlap_sql(item_sql)


#: the (source, word) item stream shared by the KMV family — ONE
#: definition each for the Spark side and the SQL mirror, so a
#: tokenization tweak cannot silently break engine/oracle parity for
#: one of the consumers (XK-kmv, XK-theta-overlap) but not the other
_SOURCE_WORD_ITEMS_SQL = (
    "SELECT source, unnest(list_filter(string_split(lower(text), ' '), "
    "x -> x <> '')) AS item FROM documents"
)


def _source_word_items(docs: DataFrame) -> DataFrame:
    words = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    return docs.select("source", F.explode(words).alias("item"))


def xk_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-word cardinality from a K-minimum-values /
    theta sketch (ext/sketch.py:kmv_distinct_by_group), certified
    against the exact count in the same query — the order-statistics
    alternative to XK-hll's register estimator, and the sketch whose
    merge supports direct intersection set-algebra. The k-smallest
    selection is two-level (per-(source, partition) rank, then a rank
    over the ≤ k×P candidates), so no corpus-sized group is ever sorted
    in one partition; the exact leg is the droppable certification."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    return sketch.kmv_distinct_by_group(_source_word_items(docs))


def _kmv_sql() -> str:
    from haf_plug_play_spark.ext.sketch import kmv_group_sql

    return kmv_group_sql(_SOURCE_WORD_ITEMS_SQL)


def xk_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix from KMV/theta sketches
    (ext/sketch.py:kmv_overlap) — the DIRECT set-algebra alternative to
    XK-hll-overlap's inclusion–exclusion: per unordered source pair,
    union/intersection/Jaccard estimated from the θ_ab-thresholded
    sample of combined k-smallest hash values, each beside its exact
    counterpart. The pairwise stage runs on ≤ sources × k broadcast
    rows after the shared WindowGroupLimit-bounded selection; the pair
    fan-out is quadratic in groups, so the same lazy broadcast guard as
    XK-hll-overlap rides the plan."""
    from haf_plug_play_spark.ext import sketch

    docs = load_table(spark, sf_dir, "documents")
    items = _source_word_items(docs)
    guard = _overlap_fanout_guard(docs, "source")
    items = items.crossJoin(F.broadcast(guard)).drop("_fanout_guard")
    return sketch.kmv_overlap(items)


def _theta_overlap_sql() -> str:
    from haf_plug_play_spark.ext.sketch import kmv_overlap_sql

    return kmv_overlap_sql(_SOURCE_WORD_ITEMS_SQL)


_QLM_MU = 300.0


def xr_qlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood top-10 with Dirichlet smoothing against the
    XR-bm25 bag-of-words query (ext/retrieval.py:qlm_topk) — the
    language-modeling lexical leg: ranks by how plausibly the document's
    unigram LM generated the query, smoothing zero-tf terms through the
    corpus LM. Same scale contract as XR-bm25: term stream filtered to
    the query's literal set before aggregation, cf/|C| broadcast,
    TakeOrderedAndProject top-k."""
    from haf_plug_play_spark.ext import retrieval

    docs = load_table(spark, sf_dir, "documents")
    return retrieval.qlm_topk(docs, _BM25_QUERY, k=10, mu=_QLM_MU)


def _qlm_sql(query_terms: list[str], k: int = 10, mu: float = 300.0) -> str:
    """DuckDB mirror of qlm_topk: exact-integer tf/cf/dl/ctot, the
    identical left-associated double arithmetic per term ((μ·cf)/|C|,
    single ln), 6-dp-rounded per-document sum, id tie-break."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return (
        "WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), "
        "x -> x <> '') AS ws FROM documents), "
        "lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w), "
        "tot AS (SELECT CAST(sum(dl) AS BIGINT) AS ctot FROM lens), "
        "terms AS (SELECT doc_id, unnest(ws) AS t FROM w), "
        f"ft AS (SELECT doc_id, t FROM terms WHERE t IN ({terms})), "
        "cf AS (SELECT t, CAST(count(*) AS BIGINT) AS cf FROM ft GROUP BY 1), "
        "tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf "
        "FROM ft GROUP BY 1, 2), "
        "cand AS (SELECT DISTINCT doc_id FROM tf), "
        "grid AS (SELECT cand.doc_id, cf.t, cf.cf FROM cand CROSS JOIN cf), "
        "sc AS (SELECT g.doc_id, "
        f"ln((coalesce(tf.tf, 0) + {float(mu)!r} * g.cf / ctot) / "
        f"(dl + {float(mu)!r})) AS s, "
        "CASE WHEN tf.tf IS NULL THEN 0 ELSE 1 END AS hit "
        "FROM grid g LEFT JOIN tf ON g.doc_id = tf.doc_id AND g.t = tf.t "
        "JOIN lens ON g.doc_id = lens.doc_id CROSS JOIN tot) "
        "SELECT doc_id, CAST(sum(hit) AS BIGINT) AS n_hits, "
        "round(sum(s), 6) AS qlm FROM sc GROUP BY 1 "
        f"ORDER BY qlm DESC, doc_id LIMIT {k}"
    )


def xd_source_leak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE contamination matrix: near-duplicate pairs (the
    XD-minhash-pairs banded machinery) whose two documents come from
    DIFFERENT sources, aggregated per unordered source pair with the
    mean candidate Jaccard — the report that tells a mixture designer
    which corpora overlap before weights are chosen (a benchmark suite
    leaking into a crawl shows up as a hot cell here). Unlike
    XD-split-leak's split (a pure function of the id), the source lives
    on the document row, so each pair side joins back to (doc_id,
    source) — two keyed joins whose probe side is the BOUNDED candidate
    list, never a pair blow-up; scale cost is XD-minhash-pairs plus two
    bounded joins."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.5)
    src = docs.select("doc_id", "source")
    lab = pairs.join(
        src.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
            "source", "_sa"
        ),
        "id_a",
    ).join(
        src.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
            "source", "_sb"
        ),
        "id_b",
    )
    return (
        lab.filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _source_leak_sql() -> str:
    pairs = _minhash_pairs_sql(8, 4, 3, 0.5, 1).replace(
        " ORDER BY p.id_a, p.id_b", ""
    )
    return (
        f"WITH pr AS ({pairs}), "
        "lab AS (SELECT least(da.source, db.source) AS source_a, "
        "greatest(da.source, db.source) AS source_b, pr.jaccard "
        "FROM pr JOIN documents da ON da.doc_id = pr.id_a "
        "JOIN documents db ON db.doc_id = pr.id_b "
        "WHERE da.source <> db.source) "
        "SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs, "
        "round(avg(jaccard), 6) AS avg_jaccard FROM lab "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


def xa_topk_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum top-k selection (quota curation: the k longest
    documents of every source) via the two-phase distributed top-k —
    a local row_number per (source, input partition) prunes each
    partition to ≤ k candidates BEFORE the per-source rank, so the
    final per-source window handles ≤ k × partitions rows instead of
    the stratum's full corpus slice. The single-phase form
    (row_number over partitionBy(source) on the raw rows) funnels each
    source's entire 100 TB slice through one task — exactly the
    XT-zipf-r10 shape this repo bans; the two-phase result is
    IDENTICAL because any global top-k row is also in its own
    partition's top-k, and the (score, doc_id) tiebreak makes the
    output deterministic under any partitioning."""
    from pyspark.sql import Window as W

    k = 10
    docs = _spread(load_table(spark, sf_dir, "documents"))
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    w_local = W.partitionBy("source", F.spark_partition_id()).orderBy(*order)
    local = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w_local).alias("_lr"),
    ).filter(F.col("_lr") <= k)
    w_final = W.partitionBy("source").orderBy(*order)
    return (
        local.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w_final).alias("rank"),
        )
        .filter(F.col("rank") <= k)
        .orderBy("source", "rank")
    )


def _topk_strat_sql() -> str:
    return (
        "WITH r AS (SELECT source, doc_id, n_chars, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY n_chars DESC, doc_id) AS rank FROM documents) "
        "SELECT source, doc_id, n_chars, CAST(rank AS INT) AS rank "
        "FROM r WHERE rank <= 10 ORDER BY source, rank"
    )


def xt_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report per (source, lang): BPE-ish regex
    tokens per whitespace word (fertility — the standard tokenizer-fit
    metric for mixture decisions; a language the tokenizer fits badly
    shows fertility ≫ 1) and characters per token. One keyed
    map-side-combinable aggregation over per-document codegen
    expressions (regexp_count / length) — no explode, no UDF; the
    per-(source, lang) output is strata-bounded."""
    from haf_plug_play_spark.ext import report

    return report.fertility_report(load_table(spark, sf_dir, "documents"))


def _fertility_sql() -> str:
    return (
        "WITH per AS (SELECT source, lang, "
        f"len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_re, "
        "length(text) - length(replace(text, ' ', '')) + 1 AS n_ws, "
        "length(text) AS n_ch FROM documents) "
        "SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_re) AS BIGINT) AS n_tokens, "
        "round(sum(n_re) / CAST(sum(n_ws) AS DOUBLE), 6) AS fertility_ws, "
        "round(sum(n_ch) / CAST(sum(n_re) AS DOUBLE), 6) AS chars_per_token "
        "FROM per GROUP BY 1, 2 ORDER BY 1, 2"
    )


def xt_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: KL(P_source ‖ P_corpus) over the
    word-unigram distributions, in nats — the monitoring metric that
    catches a source whose content shifted (crawl drift, a broken
    extractor, an injected spam campaign) even when volume and
    fertility look normal. KL is finite by construction here because
    every source word is also a corpus word (P_corpus(w) > 0 whenever
    P_source(w) > 0).

    Scale shape: ONE (source, word) count aggregation
    (map-side-combinable); corpus word totals and per-source totals
    re-aggregate FROM that table (never a second corpus scan); the
    probability join is keyed on the Heaps-bounded vocabulary and the
    per-source totals join back broadcast. Output is strata-bounded
    (one row per source). FP caveat: the KL sum reassociates across the
    shuffle (avg_logp family, absorbed by 6-dp rounding)."""
    from haf_plug_play_spark.ext import report

    return report.kl_drift_report(load_table(spark, sf_dir, "documents"))


def _kl_drift_sql() -> str:
    return (
        "WITH w AS (SELECT source, unnest(string_split(lower(text), ' ')) "
        "AS w FROM documents), "
        "sw AS (SELECT source, w, count(*) AS c_sw FROM w WHERE w <> '' "
        "GROUP BY 1, 2), "
        "cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1), "
        "ts AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1), "
        "tn AS (SELECT sum(c_sw) AS n FROM sw) "
        "SELECT sw.source, CAST(max(ts.n_s) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS n_types, "
        "round(sum((c_sw / CAST(n_s AS DOUBLE)) * "
        "ln((c_sw / CAST(n_s AS DOUBLE)) / (c_w / CAST(n AS DOUBLE)))), 6) "
        "AS kl_nats "
        "FROM sw JOIN cw ON sw.w = cw.w JOIN ts ON ts.source = sw.source "
        "CROSS JOIN tn GROUP BY 1 ORDER BY 1"
    )


def xt_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct 3-grams that appear in no other document — the
    document-level uniqueness signal between XT-repetition (within-doc
    duplication) and XD-ngram-jaccard (pairwise overlap). Boilerplate
    and template pages score near 0; genuinely novel content near 1 —
    the cheap first-pass filter before any pairwise dedup machinery.

    Scale shape: one explode to (doc, distinct-gram) rows, one
    Heaps-bounded document-frequency aggregation, one join back keyed
    on the gram (the XD-ngram-jaccard inverted-index posture, but with
    NO pair generation — cost is linear in gram occurrences), one
    per-doc aggregation. Short docs clamp to a single sub-3 gram (the
    word_grams contract, ext/text.py)."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.lower(F.col("text")), " ")
    g = docs.select(
        "doc_id",
        F.explode(F.array_distinct(xt.word_grams(ws, 3))).alias("gram"),
    )
    df_tab = g.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        g.join(df_tab, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(
                F.avg(F.when(F.col("df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def _ngram_novelty_sql() -> str:
    return (
        "WITH g AS (SELECT DISTINCT doc_id, gram FROM ("
        "SELECT doc_id, unnest([array_to_string(ws[i:i+2], ' ') "
        "FOR i IN range(1, greatest(len(ws)-2, 1)+1)]) AS gram FROM "
        "(SELECT doc_id, string_split(lower(text), ' ') AS ws "
        "FROM documents))), "
        "df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1) "
        "SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "round(avg(CASE WHEN df.df = 1 THEN 1.0 ELSE 0.0 END), 6) "
        "AS novelty "
        "FROM g JOIN df ON g.gram = df.gram GROUP BY 1 ORDER BY 1"
    )


def xa_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size WEIGHTED sample per stratum
    (ext/sampling.py:weighted_reservoir — Efraimidis & Spirakis 2006):
    exactly 5 documents per source, selection probability proportional
    to document length — the quota complement to XA-sample-hash (fixed
    rate) and the uniform stratified quota. Runs the two-phase
    distributed rank (the XA-topk-strat shape), so no stratum's corpus
    slice funnels through one task."""
    from haf_plug_play_spark.ext import sampling

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return (
        sampling.weighted_reservoir(
            docs, ["source"], 5, "doc_id", "n_chars", seed=11
        )
        .select("source", "doc_id", "n_chars", "sample_rank")
        .orderBy("source", "sample_rank")
    )


def _reservoir_sql() -> str:
    from haf_plug_play_spark.ext.sampling import weighted_reservoir_sql

    key = weighted_reservoir_sql("doc_id", "n_chars", 11)
    return (
        "WITH r AS (SELECT source, doc_id, n_chars, "
        f"row_number() OVER (PARTITION BY source ORDER BY {key} DESC, "
        "doc_id) AS sample_rank FROM documents WHERE n_chars > 0) "
        "SELECT source, doc_id, n_chars, CAST(sample_rank AS INT) "
        "AS sample_rank FROM r WHERE sample_rank <= 5 "
        "ORDER BY source, sample_rank"
    )


def xr_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion
    (ext/retrieval.py:rrf_fuse — Cormack et al. 2009): fuse the BM25
    lexical top-20 (XR-bm25's leg, query ``_BM25_QUERY``) with the
    dense cosine top-20 (XS-cosine-topk's leg, probe ``_QUERY_VEC``)
    over the shared doc/vec id space, rrf = Σ 1/(60+rank). The standard
    recipe for sourcing topical corpus slices when neither keyword
    match nor embedding similarity alone is trustworthy. Both legs are
    TakeOrderedAndProject top-Ks; every post-leg op is ≤2K-row-bounded
    (see rrf_fuse's scale note)."""
    from haf_plug_play_spark.ext import retrieval

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = retrieval.bm25_topk(docs, _BM25_QUERY, k=20)
    dense = similarity.cosine_topk(emb, _QUERY_VEC, k=20).withColumnRenamed(
        "vec_id", "doc_id"
    )
    return retrieval.rrf_fuse(lex, "bm25", dense, "cosine", id_col="doc_id", k=10)


def _rrf_sql(k: int = 10, leg_k: int = 20, c: int = 60) -> str:
    """DuckDB mirror of xr_rrf: the two green leg oracles verbatim as
    CTEs, ranked on their 6-dp-rounded scores with id tie-break, full
    outer join, 1/(c+rank) terms summed and rounded to 6 dp."""
    return (
        f"WITH lex AS ({_bm25_sql(_BM25_QUERY, leg_k)}), "
        "lexr AS (SELECT doc_id, CAST(row_number() OVER "
        "(ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank FROM lex), "
        f"dense AS ({_cosine_topk_sql(_QUERY_VEC, leg_k)}), "
        "denser AS (SELECT vec_id AS doc_id, CAST(row_number() OVER "
        "(ORDER BY cosine DESC, vec_id) AS INT) AS dense_rank FROM dense), "
        "f AS (SELECT coalesce(lexr.doc_id, denser.doc_id) AS doc_id, "
        "lex_rank, dense_rank, "
        f"round(coalesce(1.0 / ({c} + lex_rank), 0.0) "
        f"+ coalesce(1.0 / ({c} + dense_rank), 0.0), 6) AS rrf "
        "FROM lexr FULL OUTER JOIN denser ON lexr.doc_id = denser.doc_id) "
        f"SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT {k}"
    )


def xt_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness for the top-100 corpus words (Church & Gale 1995
    dispersion, public method): variance-to-mean ratio of the per-doc
    count INCLUDING zero-occurrence docs, computed analytically from
    keyed sums — vmr = E[c²]/E[c] − E[c] = Q/S − S/N with S = Σc,
    Q = Σc², N = |docs| — so no per-(word, doc) zero rows are ever
    materialized. Bursty words (vmr ≫ 1) are topical; vmr ≈ 1 is
    Poisson background — the standard corpus-linguistics screen for
    keyword selection and boilerplate detection. Scale shape: one
    (word, doc)-keyed agg then one vocabulary-keyed agg (the unigram-LM
    class), N broadcast as a single-row cross join, top-100 by raw
    count plans as TakeOrderedAndProject — no global sort, no window."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    words = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    tok = docs.select("doc_id", F.explode(words).alias("word"))
    pc = tok.groupBy("word", "doc_id").agg(F.count("*").alias("c"))
    st = pc.groupBy("word").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("n_total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_q"),
    )
    n = docs.agg(F.count("*").cast("long").alias("_n"))
    return (
        st.crossJoin(F.broadcast(n))
        .select(
            "word",
            "n_total",
            "n_docs",
            F.round(
                F.col("_q") * 1.0 / F.col("n_total")
                - F.col("n_total") * 1.0 / F.col("_n"),
                6,
            ).alias("burstiness"),
        )
        .orderBy(F.desc("n_total"), "word")
        .limit(100)
    )


def _burstiness_sql(k: int = 100) -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(list_filter(string_split("
        "lower(text), ' '), x -> x <> '')) AS word FROM documents), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), "
        "pc AS (SELECT word, doc_id, count(*) AS c FROM w GROUP BY 1, 2), "
        "st AS (SELECT word, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(c) AS BIGINT) AS n_total, CAST(sum(c * c) AS BIGINT) AS q "
        "FROM pc GROUP BY 1) "
        "SELECT word, n_total, n_docs, "
        "round(q * 1.0 / n_total - n_total * 1.0 / n, 6) AS burstiness "
        f"FROM st CROSS JOIN n ORDER BY n_total DESC, word LIMIT {k}"
    )


def xa_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup savings report: exact-hash census (the
    XD-exact-census key, md5(text), first doc_id wins globally) joined
    back to charge every duplicate's tokens to its source — n_docs /
    n_tokens before dedup, kept_docs / kept_tokens after, savings_pct.
    The accounting report a 100 TB curation run publishes next to its
    census: which sources pay for cross-source duplication. Scale
    shape: one census agg keyed by the text hash, one shuffle join on
    the same key (the census side arrives pre-partitioned by its own
    agg exchange — reusable, never broadcast: distinct-text cardinality
    is corpus-sized), then a ≤|sources|-row agg; token count is the
    XA-pack-chunks whitespace expression, all codegen."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    ).cast("long")
    t = docs.select(
        "doc_id", "source", F.md5("text").alias("_k"), n_tok.alias("_nt")
    )
    keep = t.groupBy("_k").agg(F.min("doc_id").alias("_keep_id"))
    kept = F.col("doc_id") == F.col("_keep_id")
    return (
        t.join(keep, "_k")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_docs"),
            F.sum(F.when(kept, F.col("_nt")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "kept_docs",
            "kept_tokens",
            F.round(
                100.0 * (1.0 - F.col("kept_tokens") * 1.0 / F.col("n_tokens")), 6
            ).alias("savings_pct"),
        )
        .orderBy("source")
    )


def _dedup_savings_sql() -> str:
    return (
        "WITH t AS (SELECT doc_id, source, md5(text) AS k, "
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) "
        "AS nt FROM documents), "
        "keep AS (SELECT k, min(doc_id) AS keep_id FROM t GROUP BY 1), "
        "g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(nt) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT) "
        "AS kept_docs, "
        "CAST(sum(CASE WHEN doc_id = keep_id THEN nt ELSE 0 END) AS BIGINT) "
        "AS kept_tokens FROM t JOIN keep USING (k) GROUP BY source) "
        "SELECT source, n_docs, n_tokens, kept_docs, kept_tokens, "
        "round(100.0 * (1.0 - kept_tokens * 1.0 / n_tokens), 6) "
        "AS savings_pct FROM g ORDER BY source"
    )


def xd_lsh_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter planner: for every (bands b, rows r) on a
    b ≤ 16, r ≤ 8 grid, integrate the S-curve P(s) = 1 − (1 − s^r)^b
    (Broder/LSH standard analysis, public method) by a 200-point
    midpoint rule to get the false-positive mass below the house
    Jaccard threshold t = 0.5 and the false-negative mass above it,
    plus the curve's 50%-crossover s50 = (1/b)^(1/r). This is the
    design tool BEHIND every banded query in ext/dedup.py: at 100 TB
    you choose (b, r) from these integrals BEFORE paying for a
    signature pass, so the planner itself is the scale story. Runs
    entirely in codegen over generated rows (sequence + explode — no
    data scan, no crossJoin on data, 128 combos × 200 grid points);
    both engines sum the grid in ascending-i order, so the double
    accumulation is order-identical (the DSIR caveat family)."""
    combos = spark.createDataFrame(
        [(b, r) for b in range(1, 17) for r in range(1, 9)], "b int, r int"
    )
    g = 200
    t = 0.5
    grid = combos.withColumn(
        "_i", F.explode(F.sequence(F.lit(1), F.lit(g)))
    ).withColumn("_s", (F.col("_i") - 0.5) / float(g))
    p = 1.0 - F.pow(1.0 - F.pow(F.col("_s"), F.col("r")), F.col("b"))
    agg = grid.groupBy("b", "r").agg(
        F.round(F.sum(F.when(F.col("_s") < t, p).otherwise(0.0)) / g, 6).alias(
            "fp_mass"
        ),
        F.round(
            F.sum(F.when(F.col("_s") >= t, 1.0 - p).otherwise(0.0)) / g, 6
        ).alias("fn_mass"),
    )
    return agg.select(
        "b",
        "r",
        (F.col("b") * F.col("r")).cast("int").alias("n_hashes"),
        F.round(F.pow(1.0 / F.col("b"), 1.0 / F.col("r")), 6).alias("s50"),
        "fp_mass",
        "fn_mass",
    ).orderBy("b", "r")


def _lsh_planner_sql(g: int = 200, t: float = 0.5) -> str:
    return (
        "WITH combos AS (SELECT b.range AS b, r.range AS r "
        "FROM range(1, 17) b, range(1, 9) r), "
        f"grid AS (SELECT range AS i FROM range(1, {g + 1})), "
        "p AS (SELECT b, r, i, "
        f"(i - 0.5) / {float(g)!r} AS s, "
        "1.0 - power(1.0 - power((i - 0.5) / "
        f"{float(g)!r}, r), b) AS pr FROM combos CROSS JOIN grid), "
        "a AS (SELECT b, r, "
        f"round(sum(CASE WHEN s < {t!r} THEN pr ELSE 0.0 END) / {g}, 6) "
        "AS fp_mass, "
        f"round(sum(CASE WHEN s >= {t!r} THEN 1.0 - pr ELSE 0.0 END) / {g}, 6) "
        "AS fn_mass FROM p GROUP BY b, r) "
        "SELECT CAST(b AS INT) AS b, CAST(r AS INT) AS r, "
        "CAST(b * r AS INT) AS n_hashes, "
        "round(power(1.0 / b, 1.0 / r), 6) AS s50, fp_mass, fn_mass "
        "FROM a ORDER BY b, r"
    )


def xt_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy quality signal
    (ext/report.py:doc_entropy): H in bits over the doc's own word
    distribution plus the [0,1] length-normalized form — the classic
    gibberish/repeated-token screen next to XT-repetition (which counts
    duplicate n-grams; entropy catches the distributional collapse even
    when no n-gram repeats verbatim). One (doc, word) agg + one
    doc-keyed agg, no joins, no windows."""
    from haf_plug_play_spark.ext import report

    return report.doc_entropy(_spread(load_table(spark, sf_dir, "documents")))


def _entropy_sql() -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(list_filter(string_split("
        "lower(text), ' '), x -> x <> '')) AS w FROM documents), "
        "c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2), "
        "d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "sum(c * log2(c)) AS s FROM c GROUP BY 1) "
        "SELECT doc_id, n_tokens, "
        "round(log2(n_tokens) - s / n_tokens, 6) AS entropy_bits, "
        "CASE WHEN n_tokens > 1 THEN "
        "round((log2(n_tokens) - s / n_tokens) / log2(n_tokens), 6) "
        "ELSE 0.0 END AS norm_entropy FROM d ORDER BY doc_id"
    )


def xa_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style one-shot domain reweighting
    (ext/report.py:doremi_weights — Xie et al. 2023 simplified to a
    single pass over the corpus unigram LM): per-source mixture weight
    ∝ share · exp(excess surprisal), normalized — the actionable
    output of the drift/quality diagnostics, consumed downstream by
    the weighted-mix/temperature samplers. Same one (source, word)
    aggregation as XT-kl-drift; everything after is vocab- or
    strata-bounded with broadcast joins."""
    from haf_plug_play_spark.ext import report

    return report.doremi_weights(load_table(spark, sf_dir, "documents"))


def _doremi_sql(temperature: float = 1.0) -> str:
    return (
        "WITH w AS (SELECT source, unnest(list_filter(string_split("
        "lower(text), ' '), x -> x <> '')) AS w FROM documents), "
        "sw AS (SELECT source, w, count(*) AS c_sw FROM w GROUP BY 1, 2), "
        "cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1), "
        "ts AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1), "
        "tn AS (SELECT sum(c_sw) AS n FROM sw), "
        "xe AS (SELECT sw.source, CAST(max(ts.n_s) AS BIGINT) AS n_tokens, "
        "-sum((c_sw / CAST(n_s AS DOUBLE)) * ln(c_w / CAST(n AS DOUBLE))) "
        "AS xent, max(n) AS n FROM sw JOIN cw ON sw.w = cw.w "
        "JOIN ts ON ts.source = sw.source CROSS JOIN tn GROUP BY 1), "
        "xs AS (SELECT source, n_tokens, n_tokens / CAST(n AS DOUBLE) "
        "AS share, xent FROM xe), "
        "ex AS (SELECT source, n_tokens, share, xent, "
        "xent - sum(share * xent) OVER () AS excess FROM xs), "
        "raw AS (SELECT source, n_tokens, share, xent, excess, "
        f"share * exp(excess / {float(temperature)!r}) AS wraw FROM ex) "
        "SELECT source, n_tokens, round(share, 6) AS token_share, "
        "round(xent, 6) AS xent_nats, round(excess, 6) AS excess_nats, "
        "round(wraw / sum(wraw) OVER (), 6) AS weight FROM raw "
        "ORDER BY source"
    )


def xs_embqc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit (ext/embqc.py:embedding_qc): per label,
    vector count, zero-norm vector count, mean L2 norm, and intra-class
    cosine coherence against the label centroid (mean + min; zero-norm
    vectors take cosine 0, not NULL) — the QC gate a pipeline
    runs before trusting its embedding column for semantic dedup /
    ANN / clustering curation. Two linear passes ending in keyed aggs;
    centroid components stay a broadcast DataFrame (≤ labels × dim
    rows), never a driver collect."""
    from haf_plug_play_spark.ext import embqc

    emb = _spread(load_table(spark, sf_dir, "embeddings"))
    return embqc.embedding_qc(emb)


def _embqc_sql() -> str:
    """DuckDB mirror of embedding_qc: parallel unnests zip (pos, val);
    per-vector cosine rounds to 6 dp before the per-label mean/min so
    both engines reduce identical rounded values; zero-norm vectors /
    all-zero centroids take cosine 0 and count into zero_vecs, matching
    the engine's guard."""
    return (
        f"WITH b AS (SELECT vec_id, label, {_VD} AS v FROM embeddings), "
        "n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) "
        "AS vnorm FROM b), "
        "px AS (SELECT vec_id, label, vnorm, "
        "unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS val FROM n), "
        "comp AS (SELECT label, pos, avg(val) AS cval FROM px "
        "GROUP BY 1, 2), "
        "cn AS (SELECT label, sqrt(sum(cval * cval)) AS cnorm FROM comp "
        "GROUP BY 1), "
        "d AS (SELECT px.vec_id, px.label, px.vnorm, "
        "sum(px.val * comp.cval) AS dot FROM px JOIN comp "
        "ON comp.label = px.label AND comp.pos = px.pos GROUP BY 1, 2, 3), "
        "c AS (SELECT d.label, "
        "CAST(d.vnorm = 0 AS BIGINT) AS is_zero, "
        "CAST(round(d.vnorm * 1e6) AS BIGINT) AS vnorm_u, "
        "CASE WHEN d.vnorm * cn.cnorm = 0 THEN 0 ELSE "
        "CAST(round(d.dot / (d.vnorm * cn.cnorm) * 1e6) AS BIGINT) END "
        "AS cos_u "
        "FROM d JOIN cn ON cn.label = d.label) "
        "SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, "
        "CAST(sum(is_zero) AS BIGINT) AS zero_vecs, "
        "round(sum(vnorm_u) / count(*) / 1e6, 6) AS mean_norm, "
        "round(sum(cos_u) / count(*) / 1e6, 6) AS mean_cos, "
        "round(min(cos_u) / 1e6, 6) AS min_cos "
        "FROM c GROUP BY label ORDER BY label"
    )


def xa_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch accounting (ext/report.py:epoch_plan —
    Muennighoff et al. 2022, public method): allocate a 1M-token budget
    across sources by the DoReMi mixture weights and report the implied
    per-source epochs; epochs > 1 flags where the run repeats data.
    Pure arithmetic over the ≤|sources|-row XA-doremi report — the
    planner that turns the reweighting diagnostic into a training
    recipe. No new corpus pass; parity is arithmetic on the weight/
    n_tokens values the XA-doremi oracle already pins."""
    from haf_plug_play_spark.ext import report

    return report.epoch_plan(
        load_table(spark, sf_dir, "documents"), budget=1_000_000
    )


def _epoch_plan_sql(budget: int = 1_000_000, temperature: float = 1.0) -> str:
    b = float(budget)
    return (
        f"SELECT source, n_tokens, weight, "
        f"CAST(round({b!r} * weight) AS BIGINT) AS allocated_tokens, "
        f"round({b!r} * weight / n_tokens, 6) AS epochs, "
        f"{b!r} * weight / n_tokens > 1.0 AS repeated "
        f"FROM ({_doremi_sql(temperature)}) d ORDER BY source"
    )


def qsd_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift monitor under the oracle gate
    (streaming/drift.py:windowed_surprisal_drift): per 5-minute
    event-time window and source, the mean surprisal (nats) of arriving
    tokens under a PINNED reference unigram LM — here the corpus's 'en'
    slice, so non-English sources read as high-surprisal/high-OOV drift
    — with out-of-vocabulary tokens charged ln(1e-9) and counted. This
    is the BATCH degenerate form of the identical code path; streaming
    execution is proven separately (stream ≡ batch in complete mode,
    watermark finalize-once/late-admit/post-eviction-drop in append
    mode: tests/test_streaming_ops.py). The documents fixture carries
    no event time, so arrival order is synthesized deterministically as
    2024-01-01 + doc_id seconds — SQL-expressible on both engines.

    Scale shape: the reference LM is vocabulary-bounded and broadcast;
    one linear token pass reduces in ONE windowed keyed agg (map-side
    combinable); output ≤ windows × sources rows; streaming state is
    bounded by watermark horizon × |sources|."""
    from haf_plug_play_spark.streaming.drift import (
        reference_unigram,
        windowed_surprisal_drift,
    )

    docs = load_table(spark, sf_dir, "documents")
    ref = reference_unigram(docs.filter(F.col("lang") == "en"))
    timed = docs.select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("ts"),
        "source",
        "text",
    )
    return windowed_surprisal_drift(timed, ref).orderBy("w_start", "source")


def _stream_drift_sql() -> str:
    """DuckDB mirror of the drift monitor's batch degenerate form: same
    pinned-reference left join (NULL logp → OOV, charged ln(1e-9)) and
    the same 5-minute bucketing (time_bucket aligns with Spark's window
    start — both floor to epoch multiples of 300 s)."""
    return (
        "WITH d AS (SELECT TIMESTAMP '2024-01-01 00:00:00' "
        "+ doc_id * INTERVAL 1 SECOND AS ts, source, text FROM documents), "
        "rt AS (SELECT unnest(string_split(lower(text), ' ')) AS word "
        "FROM documents WHERE lang = 'en'), "
        "rc AS (SELECT word, count(*) AS c FROM rt WHERE word <> '' "
        "GROUP BY word), "
        "ref AS (SELECT word, ln(c / (SELECT sum(c) FROM rc)) AS logp "
        "FROM rc), "
        "tok AS (SELECT ts, source, "
        "unnest(string_split(lower(text), ' ')) AS word FROM d), "
        "scored AS (SELECT t.ts, t.source, "
        "CASE WHEN r.logp IS NULL THEN 1 ELSE 0 END AS oov, "
        "-coalesce(r.logp, ln(1e-9)) AS surp "
        "FROM (SELECT * FROM tok WHERE word <> '') t "
        "LEFT JOIN ref r ON r.word = t.word) "
        "SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, source, "
        "CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(oov) AS BIGINT) AS oov_tokens, "
        "round(sum(oov) / count(*), 6) AS oov_frac, "
        "round(sum(surp) / count(*), 6) AS surprisal_nats "
        "FROM scored GROUP BY 1, 2 ORDER BY 1, 2"
    )


def xt_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information
    (ext/colloc.py:pmi_collocations — Church & Hanks 1990), the
    association-strength complement of raw bigram frequency: the
    multi-word-expression signal a tokenizer/vocabulary pipeline reads
    before choosing merge candidates. min_count floors out the
    spurious-PMI rare pairs before ranking. One zip+explode token pass
    feeds two vocab-bounded count tables; unigram counts join the
    bigram TABLE (never the stream), totals ride broadcast rows, and
    the top-k is a TakeOrderedAndProject."""
    from haf_plug_play_spark.ext import colloc

    docs = _spread(load_table(spark, sf_dir, "documents"))
    return colloc.pmi_collocations(docs)


def _pmi_sql(k: int = 20, min_count: int = 5) -> str:
    """DuckDB mirror of pmi_collocations: same (prev, word) stream as
    the bigram-LM oracle, same count tables, the identical FP op order
    ln((cb/nb) / ((c1/n)·(c2/n))), same rounded-PMI-then-(w1,w2) sort."""
    return (
        "WITH w AS (SELECT string_split(lower(text), ' ') AS ws "
        "FROM documents), "
        "tok AS (SELECT unnest([struct_pack(wd := ws[i], "
        "pv := CASE WHEN i > 1 THEN ws[i-1] END) "
        "FOR i IN range(1, len(ws)+1)]) AS t FROM w), "
        "s AS (SELECT t.wd AS w, t.pv AS pv FROM tok), "
        "uni AS (SELECT w, count(*) AS cu FROM s GROUP BY 1), "
        "tot AS (SELECT sum(cu) AS n FROM uni), "
        "bi AS (SELECT pv, w, count(*) AS cb FROM s "
        f"WHERE pv IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        "nbt AS (SELECT count(*) AS nb FROM s WHERE pv IS NOT NULL), "
        "j AS (SELECT bi.pv AS w1, bi.w AS w2, bi.cb, u1.cu AS c1, "
        "u2.cu AS c2, nbt.nb, tot.n FROM bi "
        "JOIN uni u1 ON u1.w = bi.pv JOIN uni u2 ON u2.w = bi.w "
        "CROSS JOIN nbt CROSS JOIN tot) "
        "SELECT w1, w2, CAST(cb AS BIGINT) AS n_pair, "
        "round(ln((CAST(cb AS DOUBLE) / nb) / "
        "((CAST(c1 AS DOUBLE) / n) * (CAST(c2 AS DOUBLE) / n))), 6) AS pmi "
        f"FROM j ORDER BY pmi DESC, w1, w2 LIMIT {k}"
    )


def xt_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence against the corpus word
    distribution (ext/report.py:jsd_drift_report — Lin 1991): the
    symmetric, [0, ln 2]-bounded complement of XT-kl-drift, comparable
    across sources with very different vocabulary coverage. The
    absent-word tail folds closed-form into ½·ln2·(1 − covered corpus
    mass), so the source × vocabulary cross product is never built —
    one join over existing (source, word) rows, one keyed agg, the
    XT-kl-drift cost class."""
    from haf_plug_play_spark.ext import report

    return report.jsd_drift_report(load_table(spark, sf_dir, "documents"))


def _jsd_sql() -> str:
    """DuckDB mirror of jsd_drift_report: same vocab-table join, the
    identical FP op order for both KL(P_s‖M)-family terms and the
    closed-form absent-word tail (½·ln2 as the same folded double)."""
    import math

    half_ln2 = repr(0.5 * math.log(2.0))
    d = "CAST(n_s AS DOUBLE)"
    nn = "CAST(n AS DOUBLE)"
    mm = f"((c_sw / {d} + c_w / {nn}) / 2.0)"
    return (
        "WITH w AS (SELECT source, unnest(string_split(lower(text), ' ')) "
        "AS w FROM documents), "
        "sw AS (SELECT source, w, count(*) AS c_sw FROM w WHERE w <> '' "
        "GROUP BY 1, 2), "
        "cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY 1), "
        "ts AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY 1), "
        "tn AS (SELECT sum(c_sw) AS n FROM sw), "
        "a AS (SELECT sw.source, CAST(max(ts.n_s) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS n_types, "
        f"sum((c_sw / {d}) * ln((c_sw / {d}) / {mm}) "
        f"+ (c_w / {nn}) * ln((c_w / {nn}) / {mm})) AS pres, "
        f"sum(c_w / {nn}) AS mass "
        "FROM sw JOIN cw ON sw.w = cw.w JOIN ts ON ts.source = sw.source "
        "CROSS JOIN tn GROUP BY 1) "
        "SELECT source, n_tokens, n_types, "
        f"round(0.5 * pres + {half_ln2} * (1.0 - mass), 6) AS jsd_nats "
        "FROM a ORDER BY source"
    )


# Declaration order here is only a TIE-BREAK: since round 6,
# __spark_entry__._evidence_order computes the driver's 50-query
# correctness window from the banked CORRECTNESS_r*.json files
# (never-checked and changed-since-last-row queries first, then stalest
# evidence first) — position in this dict matters only among queries
# with identical evidence age. The per-round "new (never
# driver-checked)" section markers below are historical documentation
# of when each operator landed, not a scheduling mechanism. Every query
# passes the identical DuckDB-oracle comparison in pytest regardless of
# position (tests/test_ext.py).
EXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # never driver-checked (r4 priority)
    "XD-cluster": xd_cluster,
    "XP-pipeline2": xp_pipeline2,
    "XA-sample-hash": xa_sample_hash,
    "XA-sample-strat": xa_sample_strat,
    "XA-pack-chunks": xa_pack_chunks,
    "XA-weighted-mix": xa_weighted_mix,
    # new in r4 (never driver-checked)
    "XT-gopher": xt_gopher,
    "XT-repetition": xt_repetition,
    "XT-pii-scrub": xt_pii_scrub,
    "XD-seg-dedup": xd_seg_dedup,
    "XD-semantic": xd_semantic,
    "XT-strip-html": xt_strip_html,
    "XA-corpus-stats": xa_corpus_stats,
    "XP-pipeline3": xp_pipeline3,
    "XS-knn": xs_knn,
    "XA-shuffle": xa_shuffle,
    # new in r4, second wave (never driver-checked)
    "XA-split": xa_split,
    "XT-decontam": xt_decontam,
    "XA-prune": xa_prune,
    "XL-zorder": xl_zorder,
    "XT-chunk": xt_chunk,
    "XP-pipeline4": xp_pipeline4,
    "XD-incremental": xd_incremental,
    "XS-quant": xs_quant,
    # new in r4, third wave (never driver-checked)
    "XK-cms": xk_cms,
    "XD-bloom": xd_bloom,
    "XS-kmeans": xs_kmeans,
    "XT-unigram-lm": xt_unigram_lm,
    "XA-temperature": xa_temperature,
    "XD-spans": xd_spans,
    "XD-containment": xd_containment,
    "XT-ngrams": xt_ngrams,
    "XS-pq": xs_pq,
    # new in r5 (never driver-checked)
    "XS-adc": xs_adc,
    "XT-bpe-tokenize": xt_bpe_tokenize,
    "XA-pack-split": xa_pack_split,
    "XT-topics": xt_topics,
    "XD-sem-decontam": xd_sem_decontam,
    "XA-dsir": xa_dsir,
    "XP-pipeline5": xp_pipeline5,
    # new in r6 (never driver-checked)
    "XS-ivfadc": xs_ivfadc,
    "XS-recall": xs_recall,
    "XR-bm25": xr_bm25,
    "XT-clf-quality": xt_clf_quality,
    "XP-pipeline6": xp_pipeline6,
    "XA-mix-report": xa_mix_report,
    "XD-span-removal": xd_span_removal,
    "XT-bigram-lm": xt_bigram_lm,
    "XT-trigram-lm": xt_trigram_lm,
    # new in r8
    "XT-trigram-lm-pruned": xt_trigram_lm_pruned,
    "XK-hll": xk_hll,
    "XT-clf-calibration": xt_clf_calibration,
    "XA-pack-report": xa_pack_report,
    "XT-ppl-gate": xt_ppl_gate,
    "XT-clf-auc": xt_clf_auc,
    "XD-minhash-acc": xd_minhash_acc,
    "XK-quantile": xk_quantile,
    "XD-cluster-best": xd_cluster_best,
    # driver-green in r2 only (rotated out in r3)
    "XS-ivf": xs_ivf,
    "XD-embcos-lsh": xd_embcos_lsh,
    "XS-cosine-topk": xs_cosine_topk,
    "XS-ann-lsh": xs_ann_lsh,
    "XD-embcos-pairs": xd_embcos_pairs,
    "XM-bytestats": xm_bytestats,
    # driver-green in r3 (rotate back in over later rounds)
    "XP-pipeline": xp_pipeline,
    "XT-langid": xt_langid,
    "XT-quality": xt_quality,
    "XT-tokens": xt_tokens,
    "XT-fingerprint": xt_fingerprint,
    "XT-rollfp": xt_rollfp,
    "XT-tfidf": xt_tfidf,
    "XT-winnow": xt_winnow,
    "XD-exact-census": xd_exact_census,
    "XD-ngram-jaccard": xd_ngram_jaccard,
    "XD-minhash-sig": xd_minhash_sig,
    "XD-minhash-pairs": xd_minhash_pairs,
    "XD-simhash": xd_simhash,
    # new in r10 (never driver-checked)
    "XK-hll-strat": xk_hll_strat,
    "XD-split-leak": xd_split_leak,
    "XT-zipf": xt_zipf,
    # new in r11 (never driver-checked)
    "XK-hll-overlap": xk_hll_overlap,
    "XD-source-leak": xd_source_leak,
    "XA-topk-strat": xa_topk_strat,
    "XT-fertility": xt_fertility,
    "XT-kl-drift": xt_kl_drift,
    "XT-ngram-novelty": xt_ngram_novelty,
    "XA-reservoir": xa_reservoir,
    "XR-rrf": xr_rrf,
    "XT-burstiness": xt_burstiness,
    "XA-dedup-savings": xa_dedup_savings,
    "XD-lsh-planner": xd_lsh_planner,
    "XT-entropy": xt_entropy,
    "XA-doremi": xa_doremi,
    "XS-embqc": xs_embqc,
    "XA-epoch-plan": xa_epoch_plan,
    # new in r12 (never driver-checked) — lives here rather than in
    # queries/advanced.py beside QSB/QSS/QSK so registering it does not
    # git-invalidate their banked evidence (registry.py is excluded from
    # the rotation's file signal; the content-hash signal still guards
    # this wrapper's own text)
    "QSD-stream-drift": qsd_stream_drift,
    # new in r13 (never driver-checked)
    "XK-kmv": xk_kmv,
    "XR-qlm": xr_qlm,
    "XK-theta-overlap": xk_theta_overlap,
    "XM-imagestats": xm_imagestats,
    # new in r14 (never driver-checked)
    "XT-pmi": xt_pmi,
    "XT-jsd": xt_jsd,
}

from haf_plug_play_spark.ext.sampling import uniform_sql as _u_sql

_uniform_sql_doc = _u_sql("doc_id", 7)

from haf_plug_play_spark.ext.sampling import split_assign_sql as _split_sql

from haf_plug_play_spark.ext.sampling import temperature_mix_sql as _temp_sql
from haf_plug_play_spark.ext.sketch import bloom_sql as _bloom_sql
from haf_plug_play_spark.ext.sketch import cms_sql as _cms_sql

EXT_ORACLE_SQL: dict[str, str] = {
    "XK-cms": _cms_sql(),
    "XD-bloom": _bloom_sql("source = 'src0'", "text"),
    "XS-kmeans": _kmeans_sql(),
    "XT-unigram-lm": _UNIGRAM_SQL,
    "XA-temperature": _temp_sql("lang", "doc_id", alpha=0.5, seed=7),
    "XD-spans": _spans_sql(8),
    "XD-containment": _containment_sql(3, 0.8, 100),
    "XT-ngrams": _ngrams_sql(2, 20),
    "XS-pq": _pq_sql(),
    "XS-adc": _adc_sql(),
    "XT-bpe-tokenize": _bpe_tokenize_sql(),
    "XA-pack-split": _pack_split_sql(),
    "XT-topics": _topics_sql(),
    "XD-sem-decontam": _SEM_DECONTAM_SQL,
    "XA-dsir": _dsir_sql(),
    "XP-pipeline5": _pipeline5_sql(),
    "XS-ivfadc": _ivfadc_sql(_QUERY_VEC, 10),
    "XS-recall": _recall_sql(_QUERY_VEC),
    "XR-bm25": _bm25_sql(_BM25_QUERY, 10),
    "XT-clf-quality": _clf_quality_sql(),
    "XP-pipeline6": _pipeline6_sql(),
    "XA-mix-report": _mix_report_sql(_MIX_TARGETS),
    "XD-span-removal": _span_removal_sql(8),
    "XT-bigram-lm": _bigram_lm_sql(0.7),
    "XT-trigram-lm": _trigram_lm_sql(0.75),
    "XT-trigram-lm-pruned": _trigram_lm_sql(0.75, min_count=2),
    "XK-hll": _hll_sql(),
    "XT-clf-calibration": _clf_calibration_sql(),
    "XA-pack-report": _pack_report_sql(),
    "XT-ppl-gate": _ppl_gate_sql(),
    "XT-clf-auc": _clf_auc_sql(),
    "XD-minhash-acc": _minhash_acc_sql(),
    "XK-quantile": _quantile_sql(),
    "XD-cluster-best": _cluster_best_sql(),
    "XA-split": (
        f"SELECT doc_id, source, {_split_sql('doc_id', _SPLIT_FRACTIONS, 7)} "
        "AS split FROM documents ORDER BY doc_id"
    ),
    "XT-decontam": _decontam_sql(3, 0.5),
    "XA-prune": _prune_sql(0.7),
    "XL-zorder": _zorder_sql(),
    "XT-chunk": _chunk_sql(16, 4),
    "XP-pipeline4": _pipeline4_sql(),
    "XD-incremental": _incremental_sql(),
    "XS-quant": _quant_sql(),
    "XT-gopher": _gopher_sql(),
    "XT-repetition": _repetition_sql(3),
    "XT-pii-scrub": _pii_sql(),
    "XD-seg-dedup": _seg_dedup_sql(10),
    "XD-semantic": _semantic_sql(0.95, n_centroids=16),
    "XT-strip-html": _strip_html_sql(),
    "XA-corpus-stats": _corpus_stats_sql(),
    "XP-pipeline3": _pipeline3_sql(),
    "XS-knn": _knn_sql(5),
    "XA-shuffle": (
        "SELECT doc_id, CAST(row_number() OVER "
        "(ORDER BY md5('7_' || doc_id), doc_id) AS BIGINT) AS pos "
        "FROM documents ORDER BY doc_id"
    ),
    "XT-langid": (
        f"SELECT doc_id, {_langid_case_sql()} AS lang_pred FROM documents ORDER BY doc_id"
    ),
    "XT-quality": (
        "SELECT doc_id, length(text) - length(replace(text, ' ', '')) + 1 AS q_n_words, "
        "length(text) AS q_n_chars, "
        r"round(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) / length(text), 6) AS q_punct_ratio, "
        "round(len(regexp_extract_all(text, '[0-9]')) / length(text), 6) AS q_digit_ratio, "
        f"len(list_intersect(string_split(lower(text), ' '), "
        f"[{', '.join(repr(w) for w in xt.LANG_STOPWORDS['en'])}])) AS q_stop_hits, "
        f"{_QSCORE_SQL} AS q_score "
        "FROM documents ORDER BY doc_id"
    ),
    "XP-pipeline": (
        f"WITH scored AS (SELECT doc_id, text, {_langid_case_sql()} AS lang, "
        f"{_QSCORE_SQL} AS q_score FROM documents), "
        "kept AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn "
        "FROM scored) "
        "SELECT doc_id, lang, q_score FROM kept "
        "WHERE rn = 1 AND lang = 'en' AND q_score >= 2.0 ORDER BY doc_id"
    ),
    "XP-pipeline2": (
        f"WITH scored AS (SELECT doc_id, text, {_langid_case_sql()} AS lang, "
        f"{_QSCORE_SQL} AS q_score FROM documents), "
        "kept AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn "
        "FROM scored), "
        "gated AS (SELECT doc_id, text, lang, q_score FROM kept "
        "WHERE rn = 1 AND lang = 'en' AND q_score >= 2.0), "
        "sampled AS (SELECT *, "
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok "
        f"FROM gated WHERE {{u}} < 0.5), "
        "packed AS (SELECT doc_id, lang, q_score, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS chunk_offset FROM sampled) "
        "SELECT doc_id, lang, q_score, n_tok, chunk_offset, "
        "CAST(floor(chunk_offset / 1024) AS BIGINT) AS chunk_id "
        "FROM packed ORDER BY doc_id"
    ).format(u=_u_sql("doc_id", 11)),
    "XT-tokens": (
        "SELECT doc_id, length(text) - length(replace(text, ' ', '')) + 1 AS n_ws, "
        f"len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_re "
        "FROM documents ORDER BY doc_id"
    ),
    "XT-fingerprint": (
        r"SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp "
        "FROM documents ORDER BY doc_id"
    ),
    "XT-rollfp": (
        f"SELECT doc_id, fp FROM (SELECT doc_id, {md5_int_sql('shingle')} AS fp "
        f"FROM (SELECT doc_id, unnest({_shingles_sql(8)}) AS shingle FROM documents)) "
        "WHERE fp % 8 = 0 ORDER BY doc_id, fp"
    ),
    "XD-exact-census": (
        "SELECT md5(text) AS text_key, min(doc_id) AS keep_id, count(*) AS copies "
        "FROM documents GROUP BY 1 ORDER BY 1"
    ),
    "XT-winnow": (
        # raw k-gram sequence (no list_distinct: winnowing is
        # position-sensitive and DuckDB's list_distinct reorders)
        "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), "
        "hs AS (SELECT doc_id, "
        f"""[{md5_int_sql("array_to_string(ws[i:i+7], ' ')")}"""
        " FOR i IN range(1, greatest(len(ws)-7, 1)+1)] AS h FROM w) "
        "SELECT DISTINCT doc_id, "
        "unnest([list_min(h[i:i+3]) FOR i IN range(1, greatest(len(h)-3, 1)+1)]) AS fp "
        "FROM hs ORDER BY doc_id, fp"
    ),
    "XT-tfidf": (
        "WITH words AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
        "FROM documents), "
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2), "
        "dfreq AS (SELECT w, count(*) AS df FROM "
        "(SELECT DISTINCT doc_id, w FROM words) GROUP BY 1), "
        "n AS (SELECT count(*) AS n_docs FROM documents), "
        "scored AS (SELECT tf.doc_id, tf.w, tf.tf, dfreq.df, "
        "round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf "
        "FROM tf JOIN dfreq USING (w) CROSS JOIN n), "
        "ranked AS (SELECT *, CAST(row_number() OVER "
        "(PARTITION BY doc_id ORDER BY tfidf DESC, w) AS INT) AS rk FROM scored) "
        "SELECT doc_id, rk, w AS term, tf, df, tfidf FROM ranked "
        "WHERE rk <= 3 ORDER BY doc_id, rk"
    ),
    "XD-ngram-jaccard": _jaccard_pairs_sql(3, 0.5, max_df=100),
    "XD-minhash-sig": _minhash_sig_sql(8, 3, 1) + " ORDER BY doc_id",
    "XD-minhash-pairs": _minhash_pairs_sql(8, 4, 3, 0.5, 1),
    "XD-simhash": _simhash_sql(32) + " ORDER BY doc_id",
    "XM-bytestats": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, ascii(text) AS first_byte "
        "FROM documents ORDER BY doc_id"
    ),
    "XS-cosine-topk": _cosine_topk_sql(_QUERY_VEC, 10),
    "XS-ann-lsh": _ann_lsh_sql(_QUERY_VEC, 10),
    "XS-ivf": _ivf_sql(_QUERY_VEC, 10),
    "XD-embcos-pairs": _cosine_pairs_sql(_UNIT_CTE, 0.4, renorm=False),
    "XD-embcos-lsh": _cosine_pairs_sql(_PLANTED_VN_CTE, 0.9, renorm=True),
    "XD-cluster": _cluster_sql(),
    "XA-sample-hash": (
        "SELECT doc_id, lang, source FROM documents "
        f"WHERE {_uniform_sql_doc} < 0.1 ORDER BY doc_id"
    ),
    "XA-sample-strat": (
        "SELECT doc_id, lang, source, sample_rank FROM ("
        "SELECT doc_id, lang, source, CAST(row_number() OVER "
        f"(PARTITION BY lang, source ORDER BY {_uniform_sql_doc}, doc_id) AS INT) "
        "AS sample_rank FROM documents) WHERE sample_rank <= 20 ORDER BY doc_id"
    ),
    "XA-weighted-mix": (
        "SELECT doc_id, source FROM documents WHERE "
        f"{_uniform_sql_doc} < (CASE source WHEN 'src0' THEN 0.8 "
        "WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25 ELSE 0.1 END) "
        "ORDER BY doc_id"
    ),
    "XA-pack-chunks": (
        "WITH t AS (SELECT doc_id, source, "
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tok "
        "FROM documents), r AS (SELECT doc_id, source, n_tok, "
        "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS chunk_offset FROM t) "
        "SELECT doc_id, source, n_tok, chunk_offset, "
        "CAST(floor(chunk_offset / 2048) AS BIGINT) AS chunk_id FROM r ORDER BY doc_id"
    ),
    # new in r10
    "XK-hll-strat": _hll_strat_sql(),
    "XD-split-leak": _split_leak_sql(),
    "XT-zipf": _zipf_sql(),
    "XK-hll-overlap": _hll_overlap_sql(),
    "XD-source-leak": _source_leak_sql(),
    "XA-topk-strat": _topk_strat_sql(),
    "XT-fertility": _fertility_sql(),
    "XT-kl-drift": _kl_drift_sql(),
    "XT-ngram-novelty": _ngram_novelty_sql(),
    "XA-reservoir": _reservoir_sql(),
    "XR-rrf": _rrf_sql(),
    "XT-burstiness": _burstiness_sql(),
    "XA-dedup-savings": _dedup_savings_sql(),
    "XD-lsh-planner": _lsh_planner_sql(),
    "XT-entropy": _entropy_sql(),
    "XA-doremi": _doremi_sql(),
    "XS-embqc": _embqc_sql(),
    "XA-epoch-plan": _epoch_plan_sql(),
    "QSD-stream-drift": _stream_drift_sql(),
    # new in r13
    "XK-kmv": _kmv_sql(),
    "XR-qlm": _qlm_sql(_BM25_QUERY, 10, _QLM_MU),
    "XK-theta-overlap": _theta_overlap_sql(),
    "XM-imagestats": _imagestats_sql(),
    "XT-pmi": _pmi_sql(),
    "XT-jsd": _jsd_sql(),
}
