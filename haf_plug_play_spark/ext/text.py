"""Text-analysis operators for training-data pipelines: token stats, quality
scoring, language ID, fingerprinting.

Everything here is built-in Spark expressions (no UDFs) — each column stays
inside whole-stage codegen and the operators are embarrassingly parallel:
pure per-row projections, zero shuffles, so they scale to 100 TB as a single
mapper pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from haf_plug_play_spark.ext.materialize import materialize

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Distinct-stopword-hit profiles for language ID. Tiny on purpose: the
# n-gram/stopword-profile method works with small anchor sets, and both
# engines must evaluate them identically.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "les", "et", "est", "une", "dans", "que", "pour"),
    "es": ("el", "los", "y", "es", "una", "por", "como", "para"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def word_grams(ws: Column, n: int) -> Column:
    """THE positional word-n-gram array: one gram per start position,
    duplicates kept, and a document shorter than ``n`` words clamps to a
    single sub-n gram (``greatest(size-n+1, 1)``). One definition shared
    by winnowing, the repetition signals, and top-n-grams so the
    short-document clamp can never silently diverge between operators."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))


def n_tokens_ws(text: Column) -> Column:
    """Whitespace token count (single-space-delimited corpora).
    BIGINT: Spark length() is INT but every SQL engine counts in BIGINT."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + F.lit(1)
    ).cast("long")


def n_tokens_re(text: Column) -> Column:
    """Regex (BPE-ish) token count (BIGINT, see n_tokens_ws)."""
    return F.regexp_count(text, F.lit(TOKEN_RE)).cast("long")


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of DISTINCT stopwords of ``lang`` present in the text
    (BIGINT, see n_tokens_ws)."""
    words = F.split(F.lower(text), " ")
    anchor = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(words, anchor)).cast("long")


def lang_pred(text: Column) -> Column:
    """Argmax language over stopword profiles; 'und' when nothing hits.
    Ties break in LANG_PRIORITY order, deterministically."""
    hits = {lang: stopword_hits(text, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    # build the CASE from lowest priority up so earlier langs win ties
    for i in range(len(LANG_PRIORITY) - 1, -1, -1):
        lang = LANG_PRIORITY[i]
        cond = hits[lang] > 0
        for other in LANG_PRIORITY[:i]:
            cond = cond & (hits[lang] > hits[other])
        for other in LANG_PRIORITY[i + 1 :]:
            cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: counts, ratios, and a composite score.
    Mirrors the usual pretraining heuristics (length, punctuation density,
    stopword density)."""
    text = F.col(text_col)
    n_words = n_tokens_ws(text)
    n_chars = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^a-zA-Z0-9\s]"))
    digits = F.regexp_count(text, F.lit(r"[0-9]"))
    stop_en = stopword_hits(text, "en")
    return df.select(
        "*",
        n_words.alias("q_n_words"),
        n_chars.cast("long").alias("q_n_chars"),
        F.round(punct / n_chars, 6).alias("q_punct_ratio"),
        F.round(digits / n_chars, 6).alias("q_digit_ratio"),
        stop_en.alias("q_stop_hits"),
        F.round(
            F.log(F.lit(1) + n_words) * (F.lit(1) - punct / n_chars), 6
        ).alias("q_score"),
    )


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(norm)


def winnow_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, window: int = 4,
) -> DataFrame:
    """True winnowing fingerprints (Schleimer et al., SIGMOD'03 — public
    algorithm): hash every k-word shingle, then keep the MINIMUM hash of
    each sliding window of ``window`` consecutive shingles. Unlike mod-p
    sampling (rolling_fingerprints), winnowing GUARANTEES every match of
    length ≥ k+window-1 words shares at least one fingerprint — the
    containment-detection contract plagiarism/overlap pipelines rely on.

    Entirely per-row expression work: shingle hashes live in an array, the
    window minima are a transform over start positions, and only the
    DISTINCT minima are exploded — zero Python, zero shuffle before the
    output explode. Output: one row per distinct fingerprint (id_col, fp).
    """
    from haf_plug_play_spark.ext.hashing import md5_int

    # the raw k-gram SEQUENCE (duplicates kept, positions intact) — true
    # winnowing is position-sensitive, unlike the set-based mod-p sampler
    words = F.split(F.lower(F.col(text_col)), " ")
    hs_expr = F.transform(word_grams(words, k), md5_int)
    # Materialize the shingle-hash array in its OWN projection before the
    # window-min pass. Inlined, `hs` is an expression tree that codegen
    # re-evaluates at every reference — i.e. the full md5 array was being
    # rebuilt once per window position, which made winnowing ~15× slower
    # than the equal-hash-volume rolling sampler. As a named column it is
    # computed once per row; CollapseProject will not merge the two
    # projections because the transform is non-cheap and multiply
    # referenced downstream.
    staged = df.select(F.col(id_col), hs_expr.alias("__winnow_hs"))
    hs = F.col("__winnow_hs")
    n = F.size(hs)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(window - 1), F.lit(1)))
    mins = F.array_distinct(
        F.transform(starts, lambda i: F.array_min(F.slice(hs, i, window)))
    )
    return staged.select(F.col(id_col), F.explode(mins).alias("fp"))


def rolling_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, keep_mod: int = 8,
) -> DataFrame:
    """Winnowing-style document fingerprints: hash every distinct k-word
    shingle, keep hashes ≡ 0 (mod keep_mod) — a deterministic sample of
    local fingerprints for containment/overlap detection.

    The hash + keep filter run INSIDE the per-row array (transform + filter
    higher-order functions), so only kept fingerprints are ever exploded —
    ~1/keep_mod of the naive explode volume, still zero Python.
    Output: one row per kept fingerprint (id_col, fp).
    """
    from haf_plug_play_spark.ext.dedup import word_shingles
    from haf_plug_play_spark.ext.hashing import md5_int

    fps = F.transform(word_shingles(F.col(text_col), k), md5_int)
    kept = F.filter(fps, lambda fp: fp % keep_mod == 0)
    return df.select(F.col(id_col), F.explode(kept).alias("fp"))

# ------------------------------------------------------------ quality gates


def gopher_gates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality gates (Rae et al. 2021, table A1 —
    public heuristics): word-count bounds, mean word length bounds,
    fraction of words containing an alphabetic character, and stopword
    presence, folded into one boolean ``g_pass``.

    Pure per-row codegen expressions over the single-space-delimited
    corpus — zero shuffles, a single mapper pass at any scale (same
    posture as with_quality). Defaults are the published thresholds;
    they are parameters because real pipelines tune them per-source.
    """
    text = F.col(text_col)
    words = F.split(text, " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length(text)
    # single-space corpus: total word chars = chars minus the separators
    mean_wl = F.round((n_chars - (n_words - F.lit(1))) / n_words, 6)
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / n_words, 6
    )
    stop_hits = stopword_hits(text, "en")
    g_pass = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        # inclusive like every other bound: Gopher cuts docs with LESS
        # than 80% alphabetic words, so the exact-boundary doc (common at
        # small denominators, e.g. 4/5) passes (review r9)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("g_n_words"),
        mean_wl.alias("g_mean_word_len"),
        alpha_frac.alias("g_alpha_frac"),
        stop_hits.alias("g_stop_hits"),
        g_pass.alias("g_pass"),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Repetition signals (the Gopher/MassiveText repetition filters,
    public): ``top_word_frac`` — the most frequent word's share of all
    word positions — and ``dup_ngram_frac`` — the share of word-n-gram
    positions whose n-gram occurs more than once in the document.

    Deliberately NOT a per-row O(len²) array fold: both signals explode
    to (doc, token) and aggregate, so the work is two shuffles keyed by
    (doc_id, token) — partial-aggregated map-side, well-distributed at
    any document length, and safe for the multi-thousand-word documents
    a real corpus contains.
    """
    # ONE tagged token stream: unigrams (kind 'w') and the raw n-gram
    # SEQUENCE (kind 'g', duplicates kept, one gram per start position —
    # the winnowing construction) concatenated per row and exploded once.
    # Both signals then fall out of a single (doc, kind, token) count and a
    # single per-doc conditional aggregation: 2 shuffles total instead of
    # the 4-shuffles-plus-join of aggregating each token kind separately.
    words = F.split(F.lower(F.col(text_col)), " ")

    def tagged(ws: Column) -> Column:
        grams = word_grams(ws, n)
        return F.concat(
            F.transform(ws, lambda w: F.struct(F.lit("w").alias("kind"), w.alias("tok"))),
            F.transform(
                grams, lambda g: F.struct(F.lit("g").alias("kind"), g.alias("tok"))
            ),
        )

    # let-bind the word array (word_shingles pattern) so the gram slices
    # don't re-split the text per position
    stream = F.get(F.transform(F.array(words), tagged), 0)
    tc = (
        df.select(F.col(id_col), F.explode(stream).alias("t"))
        .groupBy(id_col, "t.kind", "t.tok")
        .agg(F.count("*").alias("c"))
    )
    is_w = F.col("kind") == "w"
    return tc.groupBy(id_col).agg(
        F.round(
            F.max(F.when(is_w, F.col("c")).otherwise(F.lit(0)))
            / F.sum(F.when(is_w, F.col("c")).otherwise(F.lit(0))),
            6,
        ).alias("top_word_frac"),
        F.round(
            F.sum(F.when(~is_w & (F.col("c") > 1), F.col("c")).otherwise(F.lit(0)))
            / F.sum(F.when(~is_w, F.col("c")).otherwise(F.lit(0))),
            6,
        ).alias("dup_ngram_frac"),
    )


# ---------------------------------------------------------------- PII scrub

# ASCII-only patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repeats, \b word boundaries.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for training corpora: replace emails, IPv4 addresses,
    and phone-shaped numbers with typed placeholders, and count each class
    (counted on the ORIGINAL text, so the counts audit what was removed).

    Scrub order matters and is fixed — emails first (their local parts can
    contain digit runs), then IPs, then phones — applied as chained
    regexp_replace: pure per-row codegen, zero shuffles at any scale.
    """
    text = F.col(text_col)
    clean = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4_RE, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        clean.alias("clean_text"),
    )


# --------------------------------------------------------------- HTML strip

HTML_TAG_RE = r"<[^>]+>"
# order matters: tags are stripped FIRST, then entities unescaped —
# unescaping first would mint fake tags out of &lt;…&gt;
HTML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def strip_html(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """HTML-to-text for crawled corpora: drop tags, unescape the common
    entities, collapse whitespace. ``n_tags`` audits what was removed
    (counted on the original text). Pure per-row codegen — zero shuffles,
    one mapper pass at any scale, same posture as pii_scrub.

    Entity order is load-bearing: ``&amp;`` is unescaped LAST so
    ``&amp;lt;`` decodes to the literal text ``&lt;`` (one level), not
    ``<`` (double-decode) — the standard single-pass contract.
    """
    text = F.col(text_col)
    clean = F.regexp_replace(text, HTML_TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        clean = F.replace(clean, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(HTML_TAG_RE)).cast("long").alias("n_tags"),
        clean.alias("clean_text"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 8,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into fixed-size word chunks with overlap — the
    long-document preprocessing step before sequence packing (a context
    window can't hold a book; overlapping chunk starts preserve the
    continuations that a hard cut would sever). Chunk k starts at word
    ``k * (size - overlap)``; the final chunk may be short. Chunk starts
    stop at ``greatest(n_words - overlap, 1)``: a start inside the last
    chunk's overlap tail would emit a chunk that is a strict SUBSET of
    its predecessor — pure duplicated text injected into the training
    set for every document whose length lands in the overlap window past
    a stride boundary (review r9).

    All per-row expression work: the word array is let-bound once, chunk
    starts are a stride sequence, and chunks are sliced + re-joined
    inside a transform, so the only row-expansion is the final
    posexplode — no shuffle, no Python, linear in corpus size.
    Output: (id, chunk_idx, n_tok, chunk_text).
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    words = F.split(F.col(text_col), " ")

    def build(ws: Column) -> Column:
        starts = F.sequence(
            F.lit(1),
            F.greatest(F.size(ws) - F.lit(overlap), F.lit(1)),
            F.lit(stride),
        )
        return F.transform(starts, lambda s: F.slice(ws, s, size))

    carry = list(carry_cols or [])  # columns to thread through join-free
    chunks = F.get(F.transform(F.array(words), build), 0)
    return df.select(
        F.col(id_col), *carry, F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col,
        *carry,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("_c").cast("long").alias("n_tok"),
        F.concat_ws(" ", "_c").alias("chunk_text"),
    )


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model quality score: train word probabilities on
    the corpus itself (p(w) = count(w) / total words), then score each
    document by its mean word log-probability — the engine-portable
    stand-in for the KenLM-perplexity quality filter every large pretraining
    pipeline runs (docs full of rare/garbage tokens score low, fluent docs
    built from common words score high; filter or prune on the score).

    Fully declarative, two shuffles total: one hash aggregation keyed on
    the word (map-side combinable, vocabulary-sized output), one re-join
    of the word stream to those counts (same key — AQE reuses the
    partitioning) followed by a per-doc aggregation. The corpus total
    rides along as a broadcast single-row cross join (the TF-IDF N
    pattern, ext/registry.py) — no driver scalar collect.

    Output: (id, n_words, avg_logp) with avg_logp rounded to 6 dp.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    )
    counts = words.groupBy("w").agg(F.count("*").alias("_cnt"))
    total = counts.agg(F.sum("_cnt").alias("_total"))
    logp = counts.crossJoin(F.broadcast(total)).select(
        "w", F.log(F.col("_cnt") / F.col("_total")).alias("_logp")
    )
    return (
        words.join(logp, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(F.avg("_logp"), 6).alias("avg_logp"),
        )
        .orderBy(id_col)
    )


def bigram_lm_scores(
    df: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated bigram language-model score — the step up from
    ``unigram_lm_scores`` toward the KenLM-perplexity filter (public
    Jelinek-Mercer interpolation): each token after the first scores
    ln(λ·p(wᵢ|wᵢ₋₁) + (1−λ)·p(wᵢ)) with MLE bigram and unigram
    probabilities trained on the corpus itself; the first token scores
    by its unigram alone. The unigram mixture floor keeps every in-vocab
    continuation finite, so a doc full of never-adjacent word pairs
    scores low without hitting −∞ — exactly the fluency signal the
    unigram model cannot see (it scores a shuffled document identically
    to the original; the bigram term does not).

    Plan shape: the (prev, word) stream is one zip+explode; bigram and
    unigram tables are map-side-combinable hash aggregations re-joined
    on their own keys; the corpus total rides a broadcast single-row
    cross join. FP caveat: the per-doc mean reassociates across the
    shuffle (the unigram-lm caveat family, absorbed by 6-dp rounding).

    Output: (id, n_words, avg_logp) rounded 6 dp, ordered by id.
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(words)
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(words, 1, F.greatest(n - F.lit(1), F.lit(0))),
    )
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                words, prevs,
                lambda a, b: F.struct(a.alias("w"), b.alias("pv")),
            )
        ).alias("t"),
    ).select(F.col(id_col), F.col("t.w").alias("w"), F.col("t.pv").alias("pv"))
    # One corpus tokenize+explode, one unigram table (r15, guide §2.4/§5
    # — the trigram/sketch-family finding): without the checkpoints the
    # shared subtrees re-execute once per consumer (tok feeds uni/bi/
    # scored; uni feeds total/up/the scored join), ~6 corpus passes.
    tok = tok.transform(materialize)
    uni = tok.groupBy("w").agg(F.count("*").alias("_cu")).transform(materialize)
    total = uni.agg(F.sum("_cu").alias("_t"))
    bi = (
        tok.filter(F.col("pv").isNotNull())
        .groupBy("pv", "w")
        .agg(F.count("*").alias("_cb"))
    )
    up = uni.select(F.col("w").alias("pv"), F.col("_cu").alias("_cp"))
    scored = (
        tok.join(uni, "w")
        .join(bi, ["pv", "w"], "left")
        .join(up, "pv", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.when(
                F.col("pv").isNull(), F.log(F.col("_cu") / F.col("_t"))
            )
            .otherwise(
                F.log(
                    F.lit(float(lam)) * (F.coalesce(F.col("_cb"), F.lit(0)) / F.col("_cp"))
                    + F.lit(1.0 - lam) * (F.col("_cu") / F.col("_t"))
                )
            )
            .alias("_lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(F.avg("_lp"), 6).alias("avg_logp"),
        )
        .orderBy(id_col)
    )


def kn_trigram_lm_scores(
    df: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 0,
) -> DataFrame:
    """Interpolated Kneser-Ney trigram language-model score — the
    KenLM-class quality filter (public method: Kneser & Ney 1995;
    interpolated variant per Chen & Goodman 1999 §2.7): absolute
    discount ``D`` at every order, CONTINUATION counts below the top
    order — the property that makes KN the standard (a word seen often
    but only in one context, "Francisco", gets a small continuation
    probability where MLE backoff overrates it).

    Per-token score, trained on the scored corpus itself:
    - position 1 (no context): ln c(w)/T — MLE unigram, the
      ``bigram_lm_scores`` doc-start convention;
    - position 2: bigram-top KN, real counts at the top order:
      ln( max(c(vw)−D,0)/c(v·) + D·N₁₊(v·)/c(v·) · p_cont(w) );
    - position ≥ 3: trigram-top KN with the bigram CONTINUATION model
      below: ln( max(c(uvw)−D,0)/c(uv·) + D·N₁₊(uv·)/c(uv·) ·
      [ max(N₁₊(·vw)−D,0)/N₁₊(·v·) +
        D·|{w′: N₁₊(·vw′)>0}|/N₁₊(·v·) · p_cont(w) ] )
      where p_cont(w) = N₁₊(·w)/|distinct bigrams|. The continuation
      level's backoff weight counts CONTINUATION types
      |{w′: N₁₊(·vw′)>0}| (distinct successors of v inside the trigram
      table), not bigram successors N₁₊(v·) — the Chen & Goodman
      normalization (conditionals sum to 1; the two differ only for
      bigrams occurring exclusively at document position 2).
    Every logarithm argument is positive by construction (train =
    score corpus, so each scored n-gram contributes its own count,
    with the pruning fallbacks below keeping it so under a cutoff).

    ``min_count`` is the KenLM-style count-cutoff dial (``--prune``):
    trigram and bigram table entries with corpus count below the cutoff
    are dropped from the MODEL before the derived statistics, so the
    model footprint is bounded at crawl scale (singleton trigrams
    dominate the raw table per Zipf). A scored n-gram whose entry was
    pruned falls through the standard ladder: pruned trigram → its
    context's backoff weight times the continuation-bigram model (a
    fully pruned context backs off with weight 1); pruned bigram → the
    unigram continuation; a word whose whole continuation inventory was
    pruned backs off to the MLE unigram. Unigrams are never pruned
    (the KenLM convention). Mass over-allocates slightly for pruned
    entries (pruned-without-renormalization, the standard trade-off).
    ``min_count <= 1`` is exact interpolated KN (nothing prunes).

    Plan shape (the bigram scorer's, one order up): the (w, pv, ppv)
    stream is one zip+explode; trigram/bigram/unigram count tables and
    their context/continuation derivatives are map-side-combinable hash
    aggregations re-joined on their own keys (stats sharing a key are
    pre-merged so the token stream joins each key ONCE — 6 keyed joins);
    the two scalar totals ride broadcast single-row cross joins. FP
    caveat: the per-doc mean reassociates across the shuffle (the
    unigram-lm caveat family, absorbed by 6-dp rounding).

    Output: (id, n_words, avg_logp) rounded 6 dp, ordered by id.
    """
    D = float(discount)
    words = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(words)
    nulls1 = F.array(F.lit(None).cast("string"))
    prevs = F.slice(F.concat(nulls1, words), 1, n)
    pprevs = F.slice(F.concat(nulls1, nulls1, words), 1, n)
    pairs = F.zip_with(
        words, prevs, lambda a, b: F.struct(a.alias("w"), b.alias("pv"))
    )
    trips = F.zip_with(
        pairs,
        pprevs,
        lambda s, c: F.struct(
            s["w"].alias("w"), s["pv"].alias("pv"), c.alias("ppv")
        ),
    )
    tok = df.select(F.col(id_col), F.explode(trips).alias("t")).select(
        F.col(id_col),
        F.col("t.w").alias("w"),
        F.col("t.pv").alias("pv"),
        F.col("t.ppv").alias("ppv"),
    )
    # Materialize the token stream and the two large count tables ONCE
    # (r15, guide §2.4/§5 — the sketch-family finding applied here):
    # Catalyst clones a shared subtree per consumer, and the pushed
    # isnotnull/join filters fork the copies so runtime exchange reuse
    # cannot unify them — without the checkpoints this plan tokenizes and
    # explodes the whole corpus 22 times (22 parquet scans / 22 Generate
    # nodes / 78 Exchanges measured at sf0.1). One corpus pass feeds
    # uni/bi/tri; bi and tri each feed 4 derived statistics, so they
    # materialize too. This is the KenLM posture at crawl scale: the
    # count tables ARE the model and get built exactly once.
    tok = tok.transform(materialize)
    uni = tok.groupBy("w").agg(F.count("*").alias("_cu"))
    bi = (
        tok.filter(F.col("pv").isNotNull())
        .groupBy("pv", "w")
        .agg(F.count("*").alias("_cb"))
    )
    tri = (
        tok.filter(F.col("ppv").isNotNull())
        .groupBy("ppv", "pv", "w")
        .agg(F.count("*").alias("_ct"))
    )
    if min_count > 1:
        # the pruning point: every derived statistic below describes the
        # PRUNED model inventory, so the footprint bound holds for the
        # stats tables too, not just the entry lookups
        bi = bi.filter(F.col("_cb") >= min_count)
        tri = tri.filter(F.col("_ct") >= min_count)
    bi = bi.transform(materialize)
    tri = tri.transform(materialize)
    total = uni.agg(F.sum("_cu").alias("_t"))
    n_bigrams = bi.agg(F.count("*").alias("_nb"))
    # one table per join key: pv-keyed stats (successor mass + richness
    # from bi; middle-slot continuation mass + continuation-type count
    # from tri), w-keyed stats (unigram count from uni; predecessor
    # richness from bi), (pv, w)-keyed (bigram count; continuation count
    # N1+(·vw) from tri), (ppv, pv)-keyed trigram-context stats
    pv_stats = (
        bi.groupBy("pv")
        .agg(F.sum("_cb").alias("_cpv"), F.count("*").alias("_n1succ"))
        .join(
            tri.groupBy("pv").agg(
                F.count("*").alias("_n1mid"),
                F.countDistinct("w").alias("_n1succ3"),
            ),
            "pv",
            "full",
        )
    )
    w_stats = uni.join(
        bi.groupBy("w").agg(F.count("*").alias("_n1w")), "w", "left"
    )
    pw_stats = bi.join(
        tri.groupBy("pv", "w").agg(F.count("*").alias("_n1cont")),
        ["pv", "w"],
        "full",
    )
    ctx3 = tri.groupBy("ppv", "pv").agg(
        F.sum("_ct").alias("_c3"), F.count("*").alias("_n13")
    )
    # each level's null branch is its pruning fallback (never taken at
    # min_count <= 1): continuation inventory gone → MLE unigram; middle
    # order gone for this v → unigram continuation; context gone → back
    # off with weight 1
    pcont = F.when(
        F.col("_n1w").isNotNull(), F.col("_n1w") / F.col("_nb")
    ).otherwise(F.col("_cu") / F.col("_t"))
    pkn2 = F.when(F.col("_n1mid").isNull(), pcont).otherwise(
        F.greatest(
            F.coalesce(F.col("_n1cont"), F.lit(0)) - F.lit(D), F.lit(0.0)
        )
        / F.col("_n1mid")
        + F.lit(D) * F.col("_n1succ3") / F.col("_n1mid") * pcont
    )
    lp = (
        F.when(F.col("pv").isNull(), F.log(F.col("_cu") / F.col("_t")))
        .when(
            F.col("ppv").isNull(),
            F.when(F.col("_cpv").isNull(), F.log(pcont)).otherwise(
                F.log(
                    F.greatest(
                        F.coalesce(F.col("_cb"), F.lit(0)) - F.lit(D),
                        F.lit(0.0),
                    )
                    / F.col("_cpv")
                    + F.lit(D) * F.col("_n1succ") / F.col("_cpv") * pcont
                )
            ),
        )
        .otherwise(
            F.when(F.col("_c3").isNull(), F.log(pkn2)).otherwise(
                F.log(
                    F.greatest(
                        F.coalesce(F.col("_ct"), F.lit(0)) - F.lit(D),
                        F.lit(0.0),
                    )
                    / F.col("_c3")
                    + F.lit(D) * F.col("_n13") / F.col("_c3") * pkn2
                )
            )
        )
    )
    scored = (
        tok.join(w_stats, "w")
        .join(pw_stats, ["pv", "w"], "left")
        .join(pv_stats, "pv", "left")
        .join(tri, ["ppv", "pv", "w"], "left")
        .join(ctx3, ["ppv", "pv"], "left")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(n_bigrams))
        .select(F.col(id_col), lp.alias("_lp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.round(F.avg("_lp"), 6).alias("avg_logp"),
        )
        .orderBy(id_col)
    )


def top_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-k word n-grams with document frequencies — the
    vocabulary/statistics pass a tokenizer-training (BPE-style) or
    collocation-analysis pipeline starts from. Counts keep multiplicity
    (corpus frequency), df counts distinct documents.

    One explode of per-row n-gram arrays (positions kept, duplicates
    kept), one hash aggregation keyed on the n-gram (map-side combined;
    corpus frequency and document frequency in the same pass via a
    distinct-id count), then a global top-k — TakeOrderedAndProject, no
    global sort. Output: (rank, ngram, n_occurrences, n_docs).
    """
    words = F.split(F.lower(F.col(text_col)), " ")

    grams = df.select(
        F.col(id_col),
        F.explode(
            F.get(
                F.transform(F.array(words), lambda ws: word_grams(ws, n)), 0
            )
        ).alias("ngram"),
    )
    counts = grams.groupBy("ngram").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    w = W.orderBy(F.desc("n_occurrences"), "ngram")
    return (
        counts.orderBy(F.desc("n_occurrences"), "ngram")
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "ngram", "n_occurrences", "n_docs")
    )


# Keyword taxonomy for topic tagging — the domain-classification pass a
# curation pipeline uses to steer the training mixture (tiny anchor sets on
# purpose, same rationale as LANG_STOPWORDS: both engines must evaluate
# them identically). Priority order = lexicographic, the tie-break.
TOPIC_KEYWORDS: dict[str, tuple[str, ...]] = {
    "perf": ("fast", "slow", "big", "small", "hash"),
    "query": ("query", "scan", "filter", "join", "sort"),
    "storage": ("table", "row", "column", "part", "batch"),
    "stream": ("stream", "window", "order", "group", "merge"),
}
TOPIC_PRIORITY = tuple(sorted(TOPIC_KEYWORDS))


def topic_tag(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keyword-taxonomy topic tagging: score each document against every
    topic's anchor-keyword set (DISTINCT keywords present, the same
    intersect shape as language ID) and label it with the best topic —
    first-match-wins in TOPIC_PRIORITY order, so ties break
    lexicographically and a document hitting nothing is 'other'. One
    per-row codegen projection, zero shuffles — the corpus-steering
    classification pass of a curation pipeline, SQL-mirrored as the same
    CASE chain for the oracle.

    Output: (id, topic, n_hits) where n_hits is the winning topic's
    distinct-keyword count (0 for 'other').
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    hits = {
        t: F.size(
            F.array_intersect(words, F.array(*[F.lit(w) for w in TOPIC_KEYWORDS[t]]))
        ).cast("long")
        for t in TOPIC_PRIORITY
    }
    # first-match-wins CASE: topic i wins when it hits and no LATER topic
    # strictly beats it (earlier topics already failed their own WHEN)
    expr = F.lit("other")
    for i in range(len(TOPIC_PRIORITY) - 1, -1, -1):
        t = TOPIC_PRIORITY[i]
        cond = hits[t] > 0
        for later in TOPIC_PRIORITY[i + 1 :]:
            cond = cond & (hits[t] >= hits[later])
        expr = F.when(cond, F.lit(t)).otherwise(expr)
    return df.select(
        F.col(id_col),
        expr.alias("topic"),
        F.greatest(*hits.values()).alias("n_hits"),
    ).orderBy(id_col)


def perplexity_gate(
    scored: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    logp_col: str = "avg_logp",
    sample_denom: int = 1,
    seed: int = 5,
) -> DataFrame:
    """CCNet-style perplexity bucketing (public method: Wenzek et al.
    2020 §4.3 — per-language perplexity terciles from a corpus-trained
    LM; the head/middle thirds feed pretraining, the tail is the
    low-quality cut). ``scored`` is any LM scorer's output carrying
    (id, group, n_words, avg_logp) — the LM is pluggable exactly as in
    CCNet (they swap KenLM models per language); reference surface has
    no LM gate, this is engine extension territory.

    Perplexity = exp(−avg_logp), rounded 6 dp. Per-group tercile
    CUTOFFS are learned from a deterministic hash sample (md5 of the id,
    keep ``1/sample_denom`` — CCNet trains its cutoffs on a sample too,
    and a pure function of the id keeps engine and oracle identical),
    then broadcast back and applied corpus-wide by comparison. The
    cutoff is the sample's value at integer rank ``((m−1)·j) DIV 3``
    (0-based, j ∈ {1,2}) — pure integer indexing into the sorted sample,
    NO interpolation, so both engines pick the identical element and the
    boundary comparison is exact (both sides 6-dp rounded values).

    Scale contract: the corpus-sized work is the LM scoring upstream and
    one broadcast-join + CASE here; the per-group ``collect_list`` is
    bounded by the SAMPLE size per group (dial ``sample_denom`` so the
    per-group sample fits an executor — at crawl scale CCNet uses a few
    hundred thousand paragraphs per language), never the corpus. No
    window over corpus rows, no per-group global sort.

    Output: (id, group, n_words, ppl, ppl_bucket ∈ head|middle|tail|
    unsampled, keep = bucket ≠ tail), ordered by id. 'unsampled' marks
    rows of a group whose hash sample was EMPTY (or a NULL group value):
    no cutoffs exist, so they are kept, not silently dropped or cut.
    """
    from haf_plug_play_spark.ext.hashing import md5_int

    # ``wp`` is consumed twice (the cutoff sample and the corpus-wide
    # bucketing join); without the checkpoint the entire upstream LM
    # scoring pipeline executes twice (r15, guide §2.4). The stored table
    # is one row per document — the LM scorer's own output size.
    wp = scored.withColumn(
        "ppl", F.round(F.exp(-F.col(logp_col)), 6)
    ).transform(materialize)
    samp = wp
    if sample_denom > 1:
        samp = wp.filter(
            F.pmod(
                md5_int(F.concat(F.lit(f"ppl{seed}:"), F.col(id_col).cast("string"))),
                F.lit(sample_denom),
            )
            == 0
        )
    srt = F.array_sort(F.collect_list("ppl"))
    cuts = (
        samp.groupBy(group_col)
        .agg(srt.alias("_s"))
        .select(
            F.col(group_col),
            # floor() BEFORE the int cast: Spark casts double->int by
            # truncation but DuckDB by rounding, so the shared form must
            # be integral already when the cast happens
            F.element_at(
                F.col("_s"),
                F.floor(((F.size("_s") - 1) * 1) / 3).cast("int") + 1,
            ).alias("_cut1"),
            F.element_at(
                F.col("_s"),
                F.floor(((F.size("_s") - 1) * 2) / 3).cast("int") + 1,
            ).alias("_cut2"),
        )
    )
    bucket = (
        # a group whose hash sample came up EMPTY (tiny group, or a NULL
        # group value, which never equi-joins) has no cutoffs: keep it as
        # 'unsampled' rather than silently dropping it through an inner
        # join or defaulting the CASE to 'tail' (= cut) — you don't cut
        # what you haven't measured (review r9)
        F.when(F.col("_cut1").isNull(), F.lit("unsampled"))
        .when(F.col("ppl") <= F.col("_cut1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("_cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        wp.join(F.broadcast(cuts), group_col, "left")
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("n_words"),
            F.col("ppl"),
            bucket.alias("ppl_bucket"),
            (bucket != F.lit("tail")).alias("keep"),
        )
        .orderBy(id_col)
    )
