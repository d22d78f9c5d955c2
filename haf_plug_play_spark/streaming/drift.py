"""Streaming corpus-drift monitor: windowed mean surprisal per source
against a FIXED reference unigram LM.

The batch diagnostics (ext/report.py:kl_drift_report, XT-kl-drift) compare
each source to the corpus it arrived in; a LIVE ingest wants the converse —
compare what is arriving NOW to a pinned reference (yesterday's corpus, the
accepted training mix), per event-time window, with late data admitted up
to a watermark. Rising mean surprisal or out-of-vocabulary rate is the
crawl-drift / broken-extractor / spam-campaign alarm, caught while the
batch is still open.

Design note — why cross-entropy, not KL: KL(P_window ‖ P_ref) needs the
window's OWN distribution, i.e. a second stateful aggregation over the
first (per-word counts → per-window sums), which Structured Streaming
forbids in a single query. Mean surprisal E_P_window[−ln P_ref(w)] =
H(P_window, P_ref) = H(P_window) + KL(P_window ‖ P_ref) is the standard
single-pass form: each token contributes −ln P_ref(token) via a broadcast
join against the reference table, and ONE windowed aggregation reduces it.
On a batch DataFrame the identical code degenerates to a plain group-by
(the windowed_event_aggs contract), which is how the tests prove
stream ≡ batch.

Scale shape: the reference table is vocabulary-bounded and broadcast; the
token stream is linear; state is one row per (window, source) — bounded by
the watermark horizon × |sources|.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from haf_plug_play_spark.streaming.windowed import _as_event_time

#: default log-probability charged to a token absent from the reference —
#: ln(1e-9), a ~21-nat surprise; tune to ln(1/(10·|ref tokens|)) for a
#: principled floor
OOV_LOGP = math.log(1e-9)


#: hard ceiling on ``max_vocab``: the capped reference is BROADCAST by
#: the monitor, so the top-K rows must fit on the driver and every
#: executor regardless of how the cap is computed — the limit's
#: TakeOrderedAndProject driver materialization is bounded by the same
#: budget as the broadcast it feeds. 4M (word, count) rows ≈ 150–300 MB
#: in driver memory / ~100 MB broadcast payload — the practical edge of
#: a healthy broadcast; a reference past this stops being a "small
#: pinned side" and should become a persisted table joined by key
#: (shuffle join), not a broadcast drift monitor.
MAX_REFERENCE_VOCAB = 4_000_000


def reference_unigram(
    docs: DataFrame, text_col: str = "text", max_vocab: int | None = None
) -> DataFrame:
    """(word, logp) from a BATCH reference corpus — the pinned side of the
    drift monitor. logp = ln(count/total); vocabulary-bounded output.

    ``max_vocab`` caps the reference at the top-K words by count
    (deterministic tie-break on the word) for the 100 TB case: the
    monitor BROADCASTS this table, and a web-scale corpus's raw
    vocabulary (hundreds of millions of junk types) would blow the
    broadcast budget, while its probability mass lives in the head.
    Probabilities stay normalized over the FULL token count, so a capped
    reference is a true sub-distribution — tail words simply fall into
    the monitor's OOV accounting (floored + counted), which is exactly
    where a drift signal wants them.

    The top-K compiles to TakeOrderedAndProject, which materializes all
    K rows on the driver — acceptable precisely because the broadcast
    the monitor performs next does the same; ``MAX_REFERENCE_VOCAB``
    fails loudly past the point where that shared budget stops holding
    (ADVICE r12), with the shuffle-join escape hatch in its docstring."""
    if max_vocab is not None and int(max_vocab) > MAX_REFERENCE_VOCAB:
        raise ValueError(
            f"max_vocab={max_vocab} exceeds MAX_REFERENCE_VOCAB="
            f"{MAX_REFERENCE_VOCAB}: the capped reference is broadcast "
            "(and its top-K materializes on the driver), so K this large "
            "blows the broadcast budget — drop the cap and run the "
            "monitor with broadcast_reference=False (windowed_"
            "surprisal_drift joins the reference by key instead)"
        )
    words = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    tok = docs.select(F.explode(words).alias("word"))
    counts = tok.groupBy("word").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").alias("_n"))
    if max_vocab is not None:
        counts = counts.orderBy(
            F.desc("_c"), F.asc("word")
        ).limit(int(max_vocab))
    return counts.crossJoin(F.broadcast(total)).select(
        "word", F.log(F.col("_c") / F.col("_n")).alias("logp")
    )


def windowed_surprisal_drift(
    docs: DataFrame,
    reference: DataFrame,
    ts_col: str = "ts",
    source_col: str = "source",
    text_col: str = "text",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    oov_logp: float = OOV_LOGP,
    broadcast_reference: bool = True,
) -> DataFrame:
    """(w_start, source, n_tokens, oov_tokens, oov_frac, surprisal_nats)
    per event-time window and source: mean −ln P_ref(token), with
    out-of-vocabulary tokens charged ``oov_logp`` and counted separately
    (a rising oov_frac localizes drift to NEW vocabulary, a rising
    surprisal on a flat oov_frac to a shifted mix of known words).

    ``reference`` is a (word, logp) batch frame (reference_unigram);
    ``docs`` may be streaming (watermarked windowed agg, late data
    admitted up to the watermark) or batch (same code, plain group-by).

    ``broadcast_reference`` is the MAX_REFERENCE_VOCAB escape hatch made
    real: the default broadcasts the reference (right whenever it is
    vocabulary-bounded — a capped or curated LM), while ``False`` joins
    by key instead, for an uncapped web-scale reference that would blow
    the broadcast budget the ceiling guards. The monitor cannot cheaply
    check the caller-supplied frame's row count itself (counting is a
    corpus pass), so the cap guard lives where the size is decided
    (``reference_unigram(max_vocab=...)``) and this flag is the
    documented path when no cap applies."""
    src = _as_event_time(docs, ts_col)
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    words = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    tok = src.select(
        F.col(ts_col), F.col(source_col), F.explode(words).alias("word")
    )
    ref = F.broadcast(reference) if broadcast_reference else reference
    scored = tok.join(ref, "word", "left").select(
        ts_col,
        source_col,
        F.col("logp").isNull().cast("long").alias("_oov"),
        (-F.coalesce(F.col("logp"), F.lit(float(oov_logp)))).alias("_surp"),
    )
    # group by the FULL window struct, not window(...).start: only the
    # struct is recognized as the event-time window, so append-mode
    # emission + watermark state eviction bind to it (grouping by .start
    # alone degrades the query to un-evictable keyed state)
    return (
        scored.groupBy(F.window(ts_col, window).alias("_w"), source_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_oov").alias("oov_tokens"),
            F.round(F.sum("_oov") / F.count("*"), 6).alias("oov_frac"),
            F.round(F.sum("_surp") / F.count("*"), 6).alias("surprisal_nats"),
        )
        .select(
            F.col("_w").start.alias("w_start"),
            source_col,
            "n_tokens",
            "oov_tokens",
            "oov_frac",
            "surprisal_nats",
        )
    )
