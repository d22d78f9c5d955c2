"""Lexical retrieval over the documents corpus — the BM25 ranking the
dedup/similarity family lacks: term-frequency saturation + document-length
normalization (Okapi BM25, Robertson & Zaragoza 2009, public method; the
IDF spelling is Lucene's non-negative variant ln(1 + (N−df+0.5)/(df+0.5))).

Retrieval is a first-class training-data operation: sourcing topical
subsets from a 100 TB crawl ("find the science-y slice"), building
hard-negative pairs for embedding training, and query-driven corpus audits
all reduce to a scored top-k over an inverted term view.

Scale shape: the corpus term stream is FILTERED to the query's literal
term set before any aggregation (predicate on the exploded word — Catalyst
pushes it into the generator's output projection, so the keyed tf
aggregation sees only matching terms, not the corpus vocabulary); df is a
|Q|-row aggregate joined back by BROADCAST; N and avgdl are one single-row
aggregate broadcast as a cross join; top-k plans as TakeOrderedAndProject.
Nothing corpus-sized shuffles except the (doc, query-term) tf pairs —
bounded by corpus hits on |Q| terms, the inverted-index posting volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 against a bag-of-words query.

    score(D) = Σ_{t∈Q} ln(1 + (N−df_t+0.5)/(df_t+0.5)) ·
               tf_tD·(k1+1) / (tf_tD + k1·(1−b+b·|D|/avgdl))

    Oracle-parity notes: |D| and df are exact integers; avgdl is an
    integer-sum/count division (exact on both engines); the per-document
    Σ over query terms is the one shuffle-reassociated double sum (the
    DSIR/unigram-LM caveat family — 6-dp rounding absorbs it for any
    corpus whose sums don't sit on a rounding boundary). Ties break on
    the id. Output: (id, n_hits, bm25) top-k by (bm25 desc, id).
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    lens = docs.select(F.col(id_col), F.size(words).cast("long").alias("_dl"))
    stats = lens.agg(
        F.count("*").alias("_n"), F.avg("_dl").alias("_avg")
    )
    terms = (
        docs.select(F.col(id_col), F.explode(words).alias("_w"))
        .filter(F.col("_w").isin([t.lower() for t in query_terms]))
    )
    tf = terms.groupBy(id_col, "_w").agg(F.count("*").alias("_tf"))
    df = tf.groupBy("_w").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(F.broadcast(df), "_w")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    w_score = idf * (
        F.col("_tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("_tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avg"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_hits"),
        F.round(F.sum(w_score), 6).alias("bm25"),
    )
    return per_doc.orderBy(F.desc("bm25"), id_col).limit(k)


def rrf_fuse(
    lex: DataFrame,
    lex_score: str,
    dense: DataFrame,
    dense_score: str,
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Hybrid-retrieval fusion by Reciprocal Rank Fusion (Cormack,
    Clarke & Buettcher 2009, public method): given a lexical top-K leg
    and a dense top-K leg over the same id space,

        rrf(D) = Σ_legs 1 / (c + rank_leg(D)),   c = 60 (the paper's
        constant), ranks 1-based by (score desc, id asc),

    full-outer joined so a document surfaced by only one leg still
    scores its single term. Hybrid fusion is the standard way to source
    topical training slices when neither keyword match nor embedding
    similarity alone is trustworthy.

    Scale shape: BOTH inputs are already top-K projections (each leg is
    a TakeOrderedAndProject over the corpus — the corpus itself is
    never globally sorted). The rank windows here run on those ≤K-row
    frames, so the single-partition window is bounded by construction
    (the XT-ngrams top-k defense, ext/text.py:714), and the fusion join
    is a ≤2K-row broadcast-sized full outer join. At 100 TB the cost
    lives entirely in the legs, which carry their own scale evidence
    (XR-bm25, XS-cosine-topk).

    Oracle-parity: both legs rank on their 6-dp-ROUNDED scores with the
    id as tie-break — the same (score, id) total order their own green
    oracles pin — so row_number agrees across engines; 1/(c+rank) sums
    two exact doubles and is rounded to 6 dp.
    """
    w_lex = Window.orderBy(F.desc(lex_score), id_col)
    w_dense = Window.orderBy(F.desc(dense_score), id_col)
    lex_r = lex.select(
        id_col, F.row_number().over(w_lex).cast("int").alias("lex_rank")
    )
    dense_r = dense.select(
        id_col, F.row_number().over(w_dense).cast("int").alias("dense_rank")
    )
    fused = lex_r.join(dense_r, id_col, "full_outer").select(
        id_col,
        "lex_rank",
        "dense_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(c) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("dense_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), id_col).limit(k)


def qlm_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: float = 300.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by query-likelihood with Dirichlet smoothing
    (Zhai & Lafferty 2001, public method) — the language-modeling
    counterpart to BM25's probabilistic ranking:

        score(D) = Σ_{t∈Q'} ln( (tf_tD + μ·cf_t/|C|) / (|D| + μ) )

    where cf_t is t's corpus frequency, |C| the corpus token count, and
    Q' the query terms that occur in the corpus at all (a term with
    cf = 0 contributes ln(0) for every document equally, so it is
    dropped — the standard OOV-query-term treatment). Documents with at
    least one query-term hit are candidates; each is scored over ALL of
    Q', smoothing the zero-tf terms through the corpus LM. QLM ranks
    by how plausibly the document's language model generated the query,
    which surfaces long on-topic documents BM25's length normalization
    suppresses — the complementary lexical leg for topical slicing.

    Scale shape (the XR-bm25 contract): the corpus term stream is
    FILTERED to the query's literal term set before any aggregation;
    cf and |C| are |Q|-row / 1-row aggregates cross-joined by
    BROADCAST; the candidate×Q' grid is posting-volume bounded; top-k
    plans as TakeOrderedAndProject. Nothing corpus-sized shuffles
    except the (doc, query-term) tf pairs and the doc-length join.

    Oracle-parity: tf/cf/|D|/|C| are exact integers; the per-term
    expression is the identical left-associated double arithmetic in
    both engines ((μ·cf)/|C|, then the single ln); the per-document Σ
    over ≤|Q'| terms is the one shuffle-reassociated double sum (6-dp
    rounding absorbs it, the BM25 caveat family). Ties break on the id.
    Output: (id, n_hits, qlm) top-k by (qlm desc, id).
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    lens = docs.select(F.col(id_col), F.size(words).cast("long").alias("_dl"))
    tot = lens.agg(F.sum("_dl").cast("long").alias("_ctot"))
    terms = (
        docs.select(F.col(id_col), F.explode(words).alias("_w"))
        .filter(F.col("_w").isin([t.lower() for t in query_terms]))
    )
    cf = terms.groupBy("_w").agg(F.count("*").cast("long").alias("_cf"))
    tf = terms.groupBy(id_col, "_w").agg(F.count("*").cast("long").alias("_tf"))
    cand = tf.select(id_col).distinct()
    grid = cand.crossJoin(F.broadcast(cf))
    scored = (
        grid.join(tf, [id_col, "_w"], "left")
        .join(lens, id_col)
        .crossJoin(F.broadcast(tot))
    )
    contrib = F.log(
        (
            F.coalesce(F.col("_tf"), F.lit(0))
            + F.lit(float(mu)) * F.col("_cf") / F.col("_ctot")
        )
        / (F.col("_dl") + F.lit(float(mu)))
    )
    hit = F.when(F.col("_tf").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    per_doc = scored.groupBy(id_col).agg(
        F.sum(hit).cast("long").alias("n_hits"),
        F.round(F.sum(contrib), 6).alias("qlm"),
    )
    return per_doc.orderBy(F.desc("qlm"), id_col).limit(k)
