"""BPE merge learning vs an independent single-process implementation:
the distributed pair-count/merge loop must reproduce the classic
dictionary-based algorithm exactly (rules, order, counts), stay
deterministic across partitionings, and tokenize consistently."""

from __future__ import annotations

from collections import Counter

from haf_plug_play_spark.ext import bpe


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference implementation: Sennrich's dictionary BPE with the same
    end-of-word sentinel and smallest-pair tie-break."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + bpe.END]): n for w, n in word_counts.items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append({"rank": rank, "left": a, "right": b, "pair_count": cnt})
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_implementation(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest",
        "low newer low wider",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    counts: Counter = Counter()
    for t in texts:
        counts.update(t.split())
    expected = _python_bpe(dict(counts), n_merges=10)
    # BOTH paths must reproduce the reference exactly: the distributed
    # job-per-merge loop and the driver-side incremental-histogram fast
    # path (the auto default for bounded vocabularies).
    got = bpe.learn_bpe_merges(docs, n_merges=10, method="distributed")
    assert got == expected
    got_driver = bpe.learn_bpe_merges(docs, n_merges=10, method="driver")
    assert got_driver == expected

    # repartitioning must not change the learned rules (tie-break total)
    got32 = bpe.learn_bpe_merges(
        docs.repartition(32), n_merges=10, method="distributed"
    )
    assert got32 == expected


def test_bpe_batched_rounds_exact_and_fewer_jobs(spark):
    """The beyond-cap distributed path runs BATCHED rounds: with
    symbol-disjoint frequent pairs, one pair-count job yields many
    merges (rounds << merges), and the result stays EXACTLY the
    sequential reference. The conflict-heavy corpus in
    test_bpe_matches_reference_implementation guards exactness when the
    conservative acceptance rule must stop early; this corpus proves
    the batch actually batches."""
    # ten 2-letter words over disjoint alphabets, strictly decreasing
    # frequency: all top pairs are pairwise symbol-disjoint
    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st"]
    texts = [" ".join([w] * (100 - 5 * i)) for i, w in enumerate(words)]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    counts: Counter = Counter()
    for t in texts:
        counts.update(t.split())
    expected = _python_bpe(dict(counts), n_merges=10)
    stats: dict = {}
    got = bpe.learn_bpe_merges(
        docs, n_merges=10, method="distributed", _stats=stats
    )
    assert got == expected
    assert stats["rounds"] == 1  # ten disjoint merges, ONE pair-count job

    # conflict-heavy corpus: still exact, rounds bounded by merges
    texts2 = [
        "low lower lowest low low",
        "new newer newest new new new",
    ]
    docs2 = spark.createDataFrame(
        list(enumerate(texts2)), "doc_id long, text string"
    )
    counts2: Counter = Counter()
    for t in texts2:
        counts2.update(t.split())
    expected2 = _python_bpe(dict(counts2), n_merges=8)
    stats2: dict = {}
    got2 = bpe.learn_bpe_merges(
        docs2, n_merges=8, method="distributed", _stats=stats2
    )
    assert got2 == expected2
    assert stats2["rounds"] <= 8


def test_bpe_tokenize_round_trip(spark):
    """apply_bpe with the learned merges: concatenating a word's tokens
    (minus the sentinel) must reconstruct the word, and learned merges
    must actually compress the token count below character count."""
    docs = spark.createDataFrame(
        [(0, "banana bandana banana"), (1, "banana band banana bandana")],
        "doc_id long, text string",
    )
    merges = bpe.learn_bpe_merges(docs, n_merges=6)
    assert len(merges) == 6
    out = {r.doc_id: r for r in bpe.apply_bpe(docs, merges).collect()}
    for i, text in [(0, "banana bandana banana"), (1, "banana band banana bandana")]:
        joined = "".join(out[i].tokens).replace(bpe.END, "")
        assert joined == text.replace(" ", "")
        n_chars = len(text.replace(" ", ""))
        assert out[i].n_tokens < n_chars  # merges compressed something


def test_apply_bpe_replace_path_equals_fold(spark):
    """The codegen replace-chain tokenizer must equal the literal
    accumulator fold exactly — tokens and counts — on a corpus that
    exercises repeated pairs, overlapping candidates, and 1-char words."""
    docs = spark.createDataFrame(
        [
            (0, "banana bandana banana aaa a"),
            (1, "aaaa ab ba aab abab"),
            (2, "low lower lowest newest"),
        ],
        "doc_id long, text string",
    )
    merges = bpe.learn_bpe_merges(docs, n_merges=8)
    fold = {r.doc_id: (r.tokens, r.n_tokens)
            for r in bpe.apply_bpe(docs, merges, method="fold").collect()}
    repl = {r.doc_id: (r.tokens, r.n_tokens)
            for r in bpe.apply_bpe(docs, merges, method="replace").collect()}
    assert fold == repl
