"""Extension-operator tests: DuckDB differential for the oracled queries,
NumPy goldens for float-ranking similarity, recall checks for the
approximate paths, and multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from haf_plug_play_spark.ext import dedup, multimodal, similarity
from haf_plug_play_spark.ext.registry import EXT_ORACLE_SQL, EXT_QUERIES, _QUERY_VEC
from haf_plug_play_spark.sources.tables import load_table

from .compare import assert_matches
from .conftest import SF_ORACLE


@pytest.mark.parametrize("qid", sorted(EXT_ORACLE_SQL))
def test_ext_oracle(spark, duck, qid):
    df = EXT_QUERIES[qid](spark, SF_ORACLE)
    assert_matches(df, duck, EXT_ORACLE_SQL[qid], qid, strict_types=True)


@pytest.fixture(scope="module")
def np_emb(spark):
    rows = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, V


def test_cosine_topk_numpy_golden(spark, np_emb):
    ids, V = np_emb
    q = np.array(_QUERY_VEC)
    sims = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(sims, 6)))[:10]
    expected = [(int(ids[i]), round(float(sims[i]), 6)) for i in order]
    got = [(r.vec_id, r.cosine) for r in EXT_QUERIES["XS-cosine-topk"](spark, SF_ORACLE).collect()]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for g, e in zip(got, expected):
        assert abs(g[1] - e[1]) <= 1e-6


def test_ann_lsh_sanity(spark):
    """On the (near-orthogonal random) sf embeddings hyperplane LSH has no
    recall guarantee — only shape/determinism is asserted here; recall is
    verified on clustered data below, where the method's contract applies."""
    out1 = EXT_QUERIES["XS-ann-lsh"](spark, SF_ORACLE).collect()
    out2 = EXT_QUERIES["XS-ann-lsh"](spark, SF_ORACLE).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert 0 < len(out1) <= 10
    assert all(-1.0 <= r.cosine <= 1.0 for r in out1)


def test_ann_lsh_recall_clustered(spark):
    """Hyperplane LSH with hamming-1 probes must recover near neighbors when
    they exist (cosine ≈ 0.998 cluster members): per-plane disagreement
    ≈ 1.1%, so P(candidate) ≈ 91% direct + probes ⇒ recall@10 ≥ 0.8."""
    import random

    rng = random.Random(9)
    rows = []
    bases = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
    vid = 0
    for b in bases:
        for _ in range(25):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in b]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = [x + rng.gauss(0, 0.05) for x in bases[3]]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, query, k=10).collect()]
    approx = {r.vec_id for r in similarity.ann_lsh_topk(emb, query, k=10).collect()}
    assert len(set(exact) & approx) >= 8


def test_ivf_trained_recall_clustered(spark):
    """Trained IVF (Lloyd iterations) must recover near neighbors on
    clustered data: the query's cluster lands in one cell and n_probe=3
    covers boundary spill. Also checks training is stable across input
    partitioning (up to float reassociation in the distributed mean)."""
    import random

    rng = random.Random(13)
    rows, vid = [], 0
    bases = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(10)]
    for b in bases:
        for _ in range(40):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in b]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = similarity.ivf_centroids(emb, k=8, iters=3, seed=7)
    c2 = similarity.ivf_centroids(emb.repartition(5), k=8, iters=3, seed=7)
    assert np.allclose(np.array(c1), np.array(c2), atol=1e-9)
    query = [x + rng.gauss(0, 0.05) for x in bases[2]]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, query, k=10).collect()]
    approx = {
        r.vec_id
        for r in similarity.ivf_topk(emb, query, k=10, centroids=c1, n_probe=3).collect()
    }
    assert len(set(exact) & approx) >= 8


def test_embcos_pairs_exact_numpy_golden(spark, np_emb):
    ids, V = np_emb
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(U @ U.T, 6)
    iu = np.triu_indices(len(ids), k=1)
    true_pairs = {
        (int(ids[a]), int(ids[b])) for a, b in zip(*iu) if S[a, b] >= 0.4
    }
    got = {(r.id_a, r.id_b) for r in EXT_QUERIES["XD-embcos-pairs"](spark, SF_ORACLE).collect()}
    assert got == true_pairs and len(true_pairs) > 0


def test_embcos_exact_edge_inputs(spark):
    """Degenerate inputs must not break the block multiply: empty corpus,
    single vector, corpus smaller than one block."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dedup.embedding_cosine_pairs_exact(empty).count() == 0
    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    assert dedup.embedding_cosine_pairs_exact(one).count() == 0
    three = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {(r.id_a, r.id_b): r.cosine for r in dedup.embedding_cosine_pairs_exact(three, threshold=0.9).collect()}
    assert got == {(1, 2): 1.0}


def test_embcos_lsh_recall_clustered(spark):
    """In the near-dup regime (cosine ≥ 0.9) multi-probe hyperplane LSH must
    find nearly all pairs, with zero false positives (exact verify)."""
    import random

    rng = random.Random(11)
    rows, vid = [], 0
    for _ in range(30):
        base = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(4):
            rows.append((vid, [x + rng.gauss(0, 0.04) for x in base]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs_exact(emb, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.9).collect()
    }
    assert exact, "clusters must produce ≥0.9 pairs"
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.9


def test_ngram_jaccard_df_cap_kills_skew(spark):
    """A corpus-wide stop-phrase shingle must not quadratically explode the
    inverted-index join: with the df cap, hot shingles leave the candidate
    index, so docs sharing ONLY the stop phrase never become candidates —
    and genuinely near-dup pairs still surface with exact (full-set) scores."""
    hot_tail = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"unique{i} marker{i} token{i} filler{i} " + hot_tail) for i in range(200)]
    # plant one true near-dup pair sharing rare shingles
    rows.append((900, "alpha beta gamma delta epsilon zeta eta theta " + hot_tail))
    rows.append((901, "alpha beta gamma delta epsilon zeta eta theta " + hot_tail))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=100)
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    assert set(got) == {(900, 901)}
    assert got[(900, 901)] == 1.0  # full-set verify: scores stay exact
    # the capped candidate generator (hot shingles df>100 removed) must see
    # only pairs sharing a RARE shingle — the planted pair, not ~200²/2
    sh = dedup._shingle_rows(docs, "doc_id", "text", 3)
    hot = sh.groupBy("shingle").count().filter("count > 100")
    idx = sh.join(hot, "shingle", "left_anti")
    n_cand = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")),
        )
        .select("a._id", "b._id")
        .distinct()
        .count()
    )
    assert n_cand == 1  # without the cap this is 201*200/2 = 20_100


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates must recover every very-near duplicate (j ≥ 0.9 —
    banding theory: P(collide) ≈ 1-(1-s^2)^4 = 0.996 at s=0.9)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4, threshold=0.9).collect()
    }
    assert exact, "sf0.01 documents should contain near-dups"
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.9


def test_simhash_pairs_bands_complete(spark):
    """Banded candidate generation must find every pair with hamming ≤ 3
    (pigeonhole guarantee), verified against brute force."""
    docs = load_table(spark, SF_ORACLE, "documents").limit(200)
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    brute = {
        (a, b)
        for a in sh
        for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    banded = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(docs).collect()}
    assert banded == brute


def test_exact_dedup_first_wins(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    doubled = docs.union(docs.withColumn("doc_id", docs.doc_id + 10_000))
    out = dedup.exact_dedup(doubled, ["text"], "doc_id")
    assert out.count() == docs.count()
    assert out.agg({"doc_id": "max"}).first()[0] < 10_000  # kept the first


def test_multimodal_decode_and_features(spark):
    pdf = [(i, "image", multimodal.make_fake_image(i, 8, 6), None) for i in range(20)]
    media = spark.createDataFrame(pdf, multimodal.MEDIA_SCHEMA)
    dec = {r.media_id: r for r in multimodal.decode_media(media).collect()}
    assert len(dec) == 20
    assert dec[3].width == 8 and dec[3].height == 6 and dec[3].n_pixels == 48
    hist = {r.media_id: r.histogram for r in multimodal.byte_histogram(media).collect()}
    assert sum(hist[5]) == len(multimodal.make_fake_image(5, 8, 6))
    frames = multimodal.sample_frames(media, n_frames=4).collect()
    assert {f.frame_idx for f in frames} == {0, 1, 2, 3}
    joined = b"".join(
        bytes(f.frame) for f in sorted(frames, key=lambda f: f.frame_idx) if f.media_id == 7
    )
    assert joined.startswith(b"FAKEIMG\x00")


def test_attach_fake_media_roundtrip(spark):
    docs = load_table(spark, SF_ORACLE, "documents").limit(10)
    media = multimodal.attach_fake_media(docs, width=4, height=3)
    dec = multimodal.decode_media(media).collect()
    assert len(dec) == 10
    assert all(r.width == 4 and r.height == 3 for r in dec)


def test_multimodal_resize_golden(spark):
    """Nearest-neighbor resize must match the plain-NumPy reference on the
    fake pixel grid, and the output must itself be decodable."""
    media = spark.createDataFrame(
        [(7, "image", multimodal.make_fake_image(7, 8, 6), None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.resize_images(media, 4, 3).collect()[0]
    assert (out.width, out.height) == (4, 3)
    src = np.frombuffer(
        multimodal.make_fake_image(7, 8, 6)[16:], dtype=np.uint8
    ).reshape(6, 8)
    expect = src[(np.arange(3) * 6) // 3][:, (np.arange(4) * 8) // 4]
    got = np.frombuffer(bytes(out.content)[16:], dtype=np.uint8).reshape(3, 4)
    assert (got == expect).all()
    dec = multimodal.decode_media(
        spark.createDataFrame(
            [(7, "image", bytes(out.content), None)], multimodal.MEDIA_SCHEMA
        )
    ).collect()[0]
    assert (dec.width, dec.height) == (4, 3)


def test_multimodal_features_feed_similarity(spark):
    """image_features' embedding column must compose with the similarity
    operators: identical images are exact neighbors (cosine 1.0)."""
    rows = [
        (i, "image", multimodal.make_fake_image(i % 5, 8, 8), None) for i in range(10)
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.image_features(media)
    got = {r.media_id: r for r in feats.collect()}
    assert len(got) == 10 and len(got[0].embedding) == 16
    assert got[0].px_mean == got[5].px_mean  # same fake content mod 5
    q = list(got[3].embedding)
    top = similarity.cosine_topk(
        feats, q, k=2, id_col="media_id", vec_col="embedding"
    ).collect()
    assert {r.media_id for r in top} == {3, 8}  # 3 and its duplicate 3+5
    assert all(r.cosine == 1.0 for r in top)


def test_multimodal_real_decode_raises_without_pillow(spark):
    """With the Pillow gate closed (this container), a truncated PNG must
    fail LOUDLY, naming the missing codec — never decode to garbage."""
    if multimodal._PILImage is not None:
        pytest.skip("Pillow installed - gate open, covered by the PNG test")
    media = spark.createDataFrame(
        [(1, "image", b"\x89PNG\r\n\x1a\n....", None)], multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        multimodal.decode_media(media).collect()


def test_multimodal_png_decodes_when_pillow_present(spark):
    """Import-gated real-codec path: golden PNG decode + the full
    decode→resize→features chain, exercised only where Pillow exists."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="L").save(buf, format="PNG")
    media = spark.createDataFrame(
        [(7, "image", buf.getvalue(), None)], multimodal.MEDIA_SCHEMA
    )
    got = multimodal.decode_media(media).collect()[0]
    assert (got.format, got.width, got.height, got.n_pixels) == ("png", 8, 8, 64)
    resized = multimodal.resize_images(media, 4, 4).collect()[0]
    assert (resized.width, resized.height) == (4, 4)
    feats = multimodal.image_features(media).collect()[0]
    assert feats.px_mean == pytest.approx(float(px.mean()))


# ---------------------------------------------------------- dedup clustering


def test_connected_components_shapes(spark):
    """Chain, triangle, and singleton components all collapse to min-id."""
    from haf_plug_play_spark.ext.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4 (transitive closure), triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_census_and_decision(spark):
    from haf_plug_play_spark.ext.dedup import dedup_decision

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(2, 5), (5, 6)], "id_a long, id_b long")
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in dedup_decision(docs, pairs).collect()}
    # component {2,5,6} keeps 2; everything else is its own singleton keeper
    assert rows == {
        1: (1, True), 2: (2, True), 3: (3, True), 4: (4, True),
        5: (2, False), 6: (2, False), 7: (7, True),
    }


def test_connected_components_convergence_guard(spark):
    """A chain deeper than max_iters must raise, not silently mislabel."""
    from haf_plug_play_spark.ext.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30, 36)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iters=1)
    ok = {r.id: r.cluster_id for r in connected_components(chain, max_iters=10).collect()}
    assert set(ok.values()) == {30}


# ------------------------------------------------------------- sampling


def test_hash_bernoulli_partition_invariant(spark):
    """Membership must be a pure function of the key: any repartitioning
    selects the identical subset (the property rand()/df.sample lacks)."""
    from haf_plug_play_spark.ext.sampling import hash_bernoulli
    from haf_plug_play_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    a = {r.doc_id for r in hash_bernoulli(docs, "doc_id", 0.2).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_bernoulli(docs.repartition(13), "doc_id", 0.2)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < docs.count()
    # a different seed re-draws the sample
    c = {r.doc_id for r in hash_bernoulli(docs, "doc_id", 0.2, seed=8).select("doc_id").collect()}
    assert c != a


def test_stratified_quota_bounds_and_determinism(spark):
    from haf_plug_play_spark.ext.sampling import stratified_quota
    from haf_plug_play_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    out = stratified_quota(docs, ["lang"], quota=15, key_col="doc_id")
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(n <= 15 for n in per.values())
    again = stratified_quota(docs.repartition(7), ["lang"], quota=15, key_col="doc_id")
    assert {(r.doc_id, r.sample_rank) for r in out.select("doc_id", "sample_rank").collect()} == {
        (r.doc_id, r.sample_rank) for r in again.select("doc_id", "sample_rank").collect()
    }


def test_pack_chunks_invariants(spark):
    """Chunk offsets are the per-stratum prefix sums; chunk ids start at 0,
    advance monotonically, and every budget boundary is crossed at most one
    doc late (concatenate-then-slice semantics)."""
    from haf_plug_play_spark.ext.sampling import pack_chunks

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 2), 600) for i in range(1, 11)],
        "doc_id long, source string, n_tok long",
    )
    out = pack_chunks(docs, ["source"], "n_tok", budget=1000, order_col="doc_id")
    rows = sorted(
        ((r.source, r.doc_id, r.chunk_offset, r.chunk_id) for r in out.collect())
    )
    by_src = {}
    for src_, did, off, cid in rows:
        by_src.setdefault(src_, []).append((did, off, cid))
    for src_, docs_ in by_src.items():
        run = 0
        prev_cid = 0
        for did, off, cid in docs_:
            assert off == run  # exact prefix sum
            assert cid == off // 1000
            assert cid >= prev_cid
            prev_cid = cid
            run += 600


# ------------------------------------------------------------- real PGM path


def test_pgm_decode_resize_features_real_format(spark):
    """Binary PGM (P5) is a real public image format the engine decodes
    with pure NumPy — decode, resize, and feature extraction must all work
    on it end-to-end (compressed formats remain the declared stub)."""
    import numpy as np

    from haf_plug_play_spark.ext import multimodal as mm

    imgs = [
        (1, (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)),
        (2, (np.ones((8, 12), dtype=np.uint8) * 100)),
    ]
    media = spark.createDataFrame(
        [(mid, "image", bytearray(mm.make_pgm(px))) for mid, px in imgs],
        "media_id long, kind string, content binary",
    )
    dec = {r.media_id: r for r in mm.decode_media(media).collect()}
    assert dec[1].format == "pgm" and (dec[1].width, dec[1].height) == (16, 16)
    assert dec[2].format == "pgm" and (dec[2].width, dec[2].height) == (12, 8)

    rs = {r.media_id: r for r in mm.resize_images(media, 4, 4).collect()}
    for mid, px in imgs:
        h, w = px.shape
        ys, xs = (np.arange(4) * h) // 4, (np.arange(4) * w) // 4
        expect = px[ys][:, xs]
        w2, h2, got = mm._parse_pgm(bytes(rs[mid].content))  # stays PGM
        assert (w2, h2) == (4, 4) and (got == expect).all()

    feats = {r.media_id: r for r in mm.image_features(media).collect()}
    assert abs(feats[2].px_mean - 100.0) < 1e-9 and feats[2].px_std == 0.0
    assert len(feats[1].embedding) == 16
    assert abs(np.linalg.norm(feats[1].embedding) - 1.0) < 1e-9


def test_unknown_format_still_raises(spark):
    from haf_plug_play_spark.ext import multimodal as mm

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG\r\n\x1a\n notapng"))],
        "media_id long, kind string, content binary",
    )
    import pytest as _pt

    with _pt.raises(Exception, match="NotImplementedError|not available"):
        mm.decode_media(media).collect()


# ------------------------------------------------- r4 operator unit tests
# (the DuckDB-oracle parity for each runs in test_ext_oracle above; these
# pin the operator CONTRACTS on crafted inputs the synthetic corpus can't
# exercise)


def test_pii_scrub_leaves_no_residue(spark):
    """Every planted email/IP/phone is counted and none survives the
    scrub — checked on the same augmented corpus the oracle query uses."""
    from haf_plug_play_spark.ext import text as xt
    from haf_plug_play_spark.ext.registry import _pii_augmented
    from haf_plug_play_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    out = xt.pii_scrub(_pii_augmented(docs), text_col="pii_text")
    residue = out.where(
        F.col("clean_text").rlike(xt.PII_EMAIL_RE)
        | F.col("clean_text").rlike(xt.PII_IPV4_RE)
        | F.col("clean_text").rlike(xt.PII_PHONE_RE)
    ).count()
    assert residue == 0
    mins = out.agg(
        F.min("n_emails"), F.min("n_ips"), F.min("n_phones")
    ).collect()[0]
    assert tuple(mins) == (1, 1, 1)


def test_pii_scrub_crafted(spark):
    from haf_plug_play_spark.ext import text as xt

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.domain.org and 192.168.0.1 then 555-123-4567"),
            (2, "no pii here just words"),
            (3, "two mails x@y.io z@w.ai and ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in xt.pii_scrub(df).collect()}
    assert rows[1].clean_text == "mail <EMAIL> and <IP> then <PHONE>"
    assert (rows[1].n_emails, rows[1].n_ips, rows[1].n_phones) == (1, 1, 1)
    assert rows[2].clean_text == "no pii here just words"
    assert rows[3].n_emails == 2 and rows[3].n_ips == 1


def test_segment_dedup_duplicate_doc_emptied(spark):
    """A byte-identical copy of an earlier doc loses ALL its segments but
    stays in the census as an empty row; a doc sharing only its first
    10-word segment loses exactly that segment."""
    from haf_plug_play_spark.ext import dedup as dd

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 u0 u1 u2 u3 u4"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # full duplicate of doc 1
            (3, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 z0 z1 z2"),  # shares seg 0
            (4, "fresh text only here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dd.segment_dedup(df, seg_words=10).collect()}
    assert rows[1].n_segs == 2 and rows[1].n_kept == 2
    assert rows[1].clean_text == base
    assert rows[2].n_kept == 0 and rows[2].clean_text == ""
    assert rows[3].n_kept == 1 and rows[3].clean_text == "z0 z1 z2"
    assert rows[4].n_kept == 1 and rows[4].clean_text == "fresh text only here"


def test_semantic_dedup_drops_scaled_copies(spark):
    """Cosine-duplicates at different magnitudes land in the same spherical
    cell and the higher id is dropped; an orthogonal vector survives."""
    from haf_plug_play_spark.ext import dedup as dd

    dim = 8
    a = [1.0] + [0.0] * (dim - 1)
    b = [x * 3.0 for x in a]          # same direction, scaled
    c = [0.0, 1.0] + [0.0] * (dim - 2)  # orthogonal
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in dd.semantic_dedup(df, dim=dim).collect()}
    assert rows[1].keep is True
    assert rows[2].keep is False and rows[2].cell == rows[1].cell
    assert rows[3].keep is True


def test_gopher_gates_crafted(spark):
    from haf_plug_play_spark.ext import text as xt

    passing = "the " + " ".join(f"word{i}" for i in range(60)) + " of it"
    short = "the tiny one"
    df = spark.createDataFrame(
        [(1, passing), (2, short)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in xt.gopher_gates(df).collect()}
    assert rows[1].g_pass is True and rows[1].g_n_words == 63
    assert rows[2].g_pass is False  # fails the 50-word floor


def test_repetition_signals_crafted(spark):
    from haf_plug_play_spark.ext import text as xt

    # "a b c a b c a b d": top word 'a'/'b' 3 of 9; 3-gram positions:
    # [a b c, b c a, c a b, a b c, b c a, c a b, a b d] → 6 of 7 duplicated
    df = spark.createDataFrame([(1, "a b c a b c a b d")], "doc_id long, text string")
    r = xt.repetition_signals(df, n=3).collect()[0]
    assert abs(r.top_word_frac - round(3 / 9, 6)) < 1e-9
    assert abs(r.dup_ngram_frac - round(6 / 7, 6)) < 1e-9


def test_strip_html_crafted(spark):
    """Tag strip + single-pass entity decode: &amp;lt; must become the
    LITERAL text &lt; (one level), never < (double decode)."""
    from haf_plug_play_spark.ext import text as xt

    df = spark.createDataFrame(
        [
            (1, '<a href="x">link</a> text &amp; more'),
            (2, "no markup"),
            (3, "x &amp;lt; y and &lt;tag&gt; stays text"),
            (4, "<p>a</p><p>b</p>"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in xt.strip_html(df).collect()}
    assert rows[1].clean_text == "link text & more" and rows[1].n_tags == 2
    assert rows[2].clean_text == "no markup" and rows[2].n_tags == 0
    assert rows[3].clean_text == "x &lt; y and <tag> stays text"
    assert rows[4].clean_text == "a b" and rows[4].n_tags == 4


def test_eval_overlap_planted_contamination(spark):
    """Planted-structure check for decontamination: an exact eval copy is
    fully contaminated, a disjoint-vocabulary doc has zero overlap, and a
    partial share counts exactly its shared shingles."""
    eval_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),
            (11, "zeta eta theta iota kappa"),
            (12, "alpha beta gamma zzz yyy xxx www"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in dedup.eval_overlap(train, eval_df, n=3, min_frac=0.5).collect()
    }
    assert out[10].contaminated and out[10].overlap_frac == 1.0
    assert out[11].n_overlap == 0 and not out[11].contaminated
    assert out[12].n_overlap == 1 and not out[12].contaminated


def test_incremental_minhash_equals_full_run_restriction(spark):
    """The incremental batch-vs-corpus path must produce EXACTLY the
    full-corpus LSH pairs that touch the batch — no pair lost to the
    bucket semi-join pruning, none invented."""
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 7 == 3)
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    full = {
        (r.id_a, r.id_b): (r.inter, r.union_sz, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, threshold=0.3, seed=1
        ).collect()
    }
    expected = {
        k: v for k, v in full.items() if k[0] % 7 == 3 or k[1] % 7 == 3
    }
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_sz, r.jaccard)
        for r in dedup.incremental_minhash_pairs(
            new, corpus, num_hashes=8, bands=4, threshold=0.3, seed=1
        ).collect()
    }
    assert got == expected


def test_quantization_reconstruction_error_bound(spark, np_emb):
    """Dequantized vectors must sit within the analytic half-step bound
    |x - code*scale/127| <= scale/254 — the contract downstream ANN over
    quantized codes relies on."""
    ids, V = np_emb
    rows = similarity.quantize_embeddings(
        load_table(spark, SF_ORACLE, "embeddings")
    ).orderBy("vec_id").collect()
    assert [r.vec_id for r in rows] == list(ids)
    for r, x in zip(rows, V):
        codes = np.array(r.codes, dtype=np.float64)
        scale = np.abs(x).max()
        assert np.abs(codes).max() <= 127
        err = np.abs(x - codes * scale / 127.0)
        assert err.max() <= scale / 254.0 + 1e-12


def test_containment_catches_what_jaccard_misses(spark):
    """A 12-word excerpt inside a 60-word parent: containment 1.0 (caught
    at threshold 0.8) while Jaccard ≈ 10/58 ≈ 0.17 (invisible to the 0.5
    Jaccard gate) — the asymmetric-overlap contract the operator exists
    for."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(500)]
    parents = [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(20)
    ]
    rows = parents + [
        (i + 1000, " ".join(t.split()[:12])) for i, t in parents
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cont = dedup.ngram_containment_pairs(docs, threshold=0.8).collect()
    got = {(r.id_a, r.id_b) for r in cont}
    for i, _ in parents:
        assert (i, i + 1000) in got, f"excerpt pair {i} missed"
    for r in cont:
        assert max(r.cont_a, r.cont_b) >= 0.8
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=100).collect()
    jac_pairs = {(r.id_a, r.id_b) for r in jac}
    assert not any((i, i + 1000) in jac_pairs for i, _ in parents)


def test_top_ngrams_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    from haf_plug_play_spark.ext import text as xt

    out = xt.top_ngrams(docs, n=2, k=3).collect()
    assert [(r.rank, r.ngram, r.n_occurrences, r.n_docs) for r in out] == [
        (1, "a b", 3, 2),
        (2, "b a", 1, 1),
        (3, "b c", 1, 1),
    ]


def test_semantic_dedup_string_ids(spark):
    """The BLAS path's applyInPandas schema must carry the caller's actual
    id type — string ids worked on the expr path and must keep working on
    the default path (review regression)."""
    rows = [(f"doc-{i}", [float(i % 5 == j) for j in range(8)]) for i in range(20)]
    rows += [(f"dup-{i}", rows[i][1]) for i in range(5)]  # exact directional dups
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {
        r.vec_id: r
        for r in dedup.semantic_dedup(df, dim=8, n_centroids=4).collect()
    }
    assert len(out) == 25
    for i in range(5):
        assert not out[f"dup-{i}"].keep  # a lower-sorting twin exists


def test_audio_stats_golden(spark):
    """Waveform stats vs a NumPy recomputation of the same synthetic PCM:
    RMS ≈ amp/√2 for a pure sine, zero-crossing rate ≈ 2·freq/rate,
    duration exact — and a non-FAKEAUD payload fails loudly (the declared
    codec boundary)."""
    import math

    import numpy as np
    import pytest as _pytest

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    media = multimodal.attach_fake_audio(docs, n_samples=1600, rate=16000)
    out = {r.media_id: r for r in multimodal.audio_stats(media).collect()}
    assert len(out) == 6
    for mid in range(6):
        buf = multimodal.make_fake_audio(mid, 1600, 16000)
        x = np.frombuffer(buf[16:], dtype="<i2").astype(np.float64)
        r = out[mid]
        assert r.sample_rate == 16000 and r.n_samples == 1600
        assert r.duration_s == 0.1
        assert abs(r.rms - round(float(np.sqrt(np.mean(x * x))), 6)) < 1e-9
        assert r.peak == int(np.abs(x).max())
        amp = 8000 + (mid % 7) * 1000
        assert abs(r.rms - amp / math.sqrt(2)) / (amp / math.sqrt(2)) < 0.02
        freq = 110.0 * (1 + mid % 5)
        assert abs(r.zero_cross_rate - 2 * freq / 16000) < 0.01

    bad = spark.createDataFrame(
        [(0, b"RIFFxxxx")], "media_id long, content binary"
    )
    with _pytest.raises(Exception, match="audio decode"):
        multimodal.audio_stats(bad).collect()


def test_pq_np_matches_expr(spark):
    """The default NumPy PQ path is BIT-EXACT with the pure-expression
    path — codes AND recon_err, full float equality, not a tolerance:
    the NumPy kernel keeps each row's sequential fold order (one
    elementwise multiply-add per position) and the 6-dp rounding stays
    Spark-side on both paths, so any drift is a real regression."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    got = similarity.pq_codes(emb, method="np").collect()
    want = similarity.pq_codes(emb, method="expr").collect()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g == w, f"np/expr mismatch at vec_id={w.vec_id}: {g} != {w}"


def test_trained_pq_codebooks_cut_recon_error(spark):
    """Distributed-Lloyd PQ training (train_pq_codebooks) must strictly
    refine the seeded codebooks it initializes from: total reconstruction
    error over the sf0.01 embeddings drops to well under half the seeded
    value (observed ~0.10x)."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    cbs = similarity.train_pq_codebooks(emb, iters=3)
    seeded = similarity.pq_codes(emb).agg(F.sum("recon_err")).first()[0]
    trained = (
        similarity.pq_codes(emb, codebooks=cbs).agg(F.sum("recon_err")).first()[0]
    )
    assert trained < 0.5 * seeded, (trained, seeded)


def test_pack_split_segments_invariants(spark):
    """The token-granular packer's contract: per stratum, every chunk
    except the last holds EXACTLY the budget; each document's segments
    are a contiguous partition of [0, n_tok); whole-doc membership agrees
    with pack_chunks for docs that don't straddle a boundary."""
    from collections import defaultdict

    from haf_plug_play_spark.ext.registry import EXT_QUERIES

    rows = EXT_QUERIES["XA-pack-split"](spark, SF_ORACLE).collect()
    by_chunk = defaultdict(int)
    by_doc = defaultdict(list)
    for r in rows:
        by_chunk[(r.source, r.chunk_id)] += r.seg_len
        by_doc[r.doc_id].append(r)
    last = {
        s: max(c for (src, c) in by_chunk if src == s)
        for s in {src for (src, _) in by_chunk}
    }
    for (src, c), tok in by_chunk.items():
        if c != last[src]:
            assert tok == 256, (src, c, tok)
        else:
            assert 0 < tok <= 256
    for doc, segs in by_doc.items():
        segs.sort(key=lambda r: r.chunk_id)
        assert segs[0].seg_start == 0
        assert segs[-1].seg_end == segs[0].n_tok
        for a, b in zip(segs, segs[1:]):
            assert a.seg_end == b.seg_start  # contiguous, no gap/overlap
            assert b.chunk_id == a.chunk_id + 1


def test_semantic_decontam_planted_copy(spark):
    """A corpus vector that IS an eval vector (paraphrase limit case) must
    flag with max_cos 1.0; orthogonal vectors must not flag; eval members
    are excluded from the probed side."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # eval member (id % 2 == 0 -> eval)
        (2, [0.0, 1.0, 0.0, 0.0]),   # eval member
        (1, [2.0, 0.0, 0.0, 0.0]),   # scaled copy of eval 0 -> cos 1
        (3, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to both evals
        (5, [1.0, 1.0, 0.0, 0.0]),   # 45 deg to both -> cos ~0.7071
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in dedup.semantic_decontam(
            emb, (F.col("vec_id") % 2) == 0, threshold=0.9
        ).collect()
    }
    assert set(out) == {1, 3, 5}  # eval members excluded
    assert out[1].max_cos == 1.0 and out[1].contaminated
    assert out[3].max_cos == 0.0 and not out[3].contaminated
    assert abs(out[5].max_cos - 0.707107) < 1e-6 and not out[5].contaminated


def test_phash_image_near_dup(spark):
    """pHash (DCT perceptual hash) over the deterministic fake images:
    byte-identical copies hash identically, small pixel perturbations
    stay within the hamming budget (≤8; 63 bits = 9 chunks × 7 at
    max_hamming=8), distinct images stay far (cross distances ≥ 26), and phash_pairs surfaces exactly the
    planted copies through the pigeonhole banding. Image 0 is excluded:
    its near-flat DCT spectrum puts many coefficients on the median — the
    documented pHash weakness on flat images."""
    rows = []
    for mid in range(1, 9):
        buf = multimodal.make_fake_image(mid, 16, 16)
        rows.append((mid, buf))
        rows.append((200 + mid, buf))  # byte-identical copy
        b = bytearray(buf)
        for k in (20, 100, 200):  # 3 of 256 pixels nudged by +3
            b[16 + k] = min(255, b[16 + k] + 3)
        rows.append((100 + mid, bytes(b)))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    h = {r.media_id: r.phash for r in multimodal.phash_images(media).collect()}
    for mid in range(1, 9):
        assert h[mid] == h[200 + mid]
        assert bin(h[mid] ^ h[100 + mid]).count("1") <= 8
    for a in range(1, 9):
        for b_ in range(a + 1, 9):
            assert bin(h[a] ^ h[b_]).count("1") > 8  # distinct images far
    pairs = {
        (r.id_a, r.id_b)
        for r in multimodal.phash_pairs(media, max_hamming=8).collect()
    }
    for mid in range(1, 9):
        assert (mid, 200 + mid) in pairs  # identical
        assert (mid, 100 + mid) in pairs  # perturbed
    assert all(a % 100 == b % 100 for a, b in pairs)  # no cross-image pair


def _rich_clip(seed: int, n: int = 1600, rate: int = 16000) -> bytes:
    """Multi-component FAKEAUD clip (5 seeded sines) — rich enough
    spectrum for stable fingerprints, unlike a pure tone."""
    import struct

    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(5):
        x += rng.uniform(2000, 6000) * np.sin(
            2 * np.pi * rng.uniform(100, 4000) * t + rng.uniform(0, 6)
        )
    pcm = np.clip(x, -32768, 32767).astype("<i2")
    return b"FAKEAUD\x00" + struct.pack("<II", rate, n) + pcm.tobytes()


def test_audio_fingerprint_near_dup(spark):
    """Spectral audio fingerprints: additive-noise copies stay within the
    hamming budget, re-leveled (0.5x gain) copies fingerprint IDENTICALLY
    (the median comparison cancels gain), distinct clips stay far (seeds
    chosen with cross distance >= 10 via the NumPy mirror, noisy-copy
    distance 0 — re-picked for the all-bands-live edge construction the
    round-6 linear fallback restored), and audio_pairs surfaces exactly
    the planted copies."""
    seeds = [0, 27, 49, 117, 132, 157]
    rows = []
    for i, s in enumerate(seeds):
        buf = _rich_clip(s)
        rows.append((i, buf))
        x = np.frombuffer(buf[16:], dtype="<i2").astype(np.int32)
        rng = np.random.default_rng(1000 + s)
        noisy = np.clip(x + rng.integers(-150, 151, len(x)), -32768, 32767)
        rows.append((100 + i, buf[:16] + noisy.astype("<i2").tobytes()))
        rows.append((200 + i, buf[:16] + (x * 0.5).astype("<i2").tobytes()))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    h = {r.media_id: r.afp for r in multimodal.audio_fingerprint(media).collect()}
    n = len(seeds)
    for i in range(n):
        assert bin(h[i] ^ h[100 + i]).count("1") <= 8
        assert h[i] == h[200 + i]  # gain invariance, exactly
    for a in range(n):
        for b in range(a + 1, n):
            assert bin(h[a] ^ h[b]).count("1") > 8
    pairs = {
        (r.id_a, r.id_b)
        for r in multimodal.audio_pairs(media, max_hamming=8).collect()
    }
    for i in range(n):
        assert (i, 100 + i) in pairs and (i, 200 + i) in pairs
    assert all(a % 100 == b % 100 for a, b in pairs)


def test_audio_fingerprint_min_length_fills_all_bands(spark):
    """At the minimum accepted clip length (n_frames*2*(n_bands+1)
    samples), the per-window spectrum has only n_bands+1 magnitude bins
    and integer geomspace edges collapse (<n_bands+1 distinct) — the
    linear-spacing fallback must keep all n_bands bands live, so the top
    band bits are reachable instead of permanently zero."""
    import struct

    n_frames, n_bands = 9, 7
    n_min = n_frames * 2 * (n_bands + 1)  # 144: the guard's exact boundary

    def noise_clip(seed: int) -> bytes:  # flat spectrum: all bands live
        pcm = (
            np.random.default_rng(seed)
            .integers(-20000, 20000, n_min)
            .astype("<i2")
        )
        return b"FAKEAUD\x00" + struct.pack("<II", 16000, n_min) + pcm.tobytes()

    rows = [(s, noise_clip(s)) for s in range(6)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    fps = [r.afp for r in multimodal.audio_fingerprint(media).collect()]
    assert len(fps) == 6  # boundary length is accepted, not rejected
    set_bits = {b for fp in fps for b in range(63) if fp >> b & 1}
    # bits in the top two band positions of some frame must be settable
    # (the collapsed-geomspace bug zeroed every bit with b % n_bands >= 5)
    assert any(b % n_bands == n_bands - 1 for b in set_bits)
    assert any(b % n_bands == n_bands - 2 for b in set_bits)
    # one sample below the boundary still fails loudly
    import pytest as _pytest

    short = spark.createDataFrame(
        [(0, _rich_clip(1, n=n_min - 1))], "media_id long, content binary"
    )
    with _pytest.raises(Exception, match="too short to fingerprint"):
        multimodal.audio_fingerprint(short).collect()


def test_video_hot_frame_df_cap_bounds_candidates(spark):
    """A frame hash shared by many videos (flat frames / common intros)
    must not drive O(n²) candidates: hashes with df > max_df are dropped
    from the candidate index, while surviving pairs' shared_frames stay
    EXACT over the full hash sets (hot frame included)."""
    import struct

    def video_of(frame_ids):
        frames = [multimodal.make_fake_image(i, 16, 16) for i in frame_ids]
        return (
            b"FAKEVID\x00"
            + struct.pack("<I", len(frames))
            + b"".join(struct.pack("<I", len(f)) + f for f in frames)
        )

    # frame ids picked for pairwise-distinct pHashes (the synthetic
    # pattern family has genuine pHash collisions — e.g. fake images 31
    # and 63 hash identically — which would legitimately pair their
    # videos through the df-capped index and muddy the assertion)
    HOT = 5000  # the intro frame every video carries
    rows = [
        (1, video_of([HOT, 0, 1, 2, 3])),
        (2, video_of([HOT, 0, 1, 2, 13])),  # near-dup of 1 (3 + hot)
        (3, video_of([HOT, 20, 21, 22, 23])),  # shares ONLY the hot frame
        (4, video_of([HOT, 30, 31, 32, 33])),
        (5, video_of([HOT, 40, 41, 42, 43])),
        (6, video_of([HOT, 50, 51, 52, 53])),
    ]
    vids = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        (r.id_a, r.id_b): r.shared_frames
        for r in multimodal.video_near_dup_pairs(
            vids, min_shared=1, max_df=3
        ).collect()
    }
    # the hot frame (df=6 > 3) generates no candidates by itself: even at
    # min_shared=1 the only pair is the one sharing discriminative frames
    assert set(got) == {(1, 2)}
    # ...but its shared count is exact over the FULL sets: 3 capped-in
    # frames + the hot frame = 4
    assert got[(1, 2)] == 4


def test_video_near_dup_by_frame_overlap(spark):
    """Video dedup by frame-fingerprint overlap: a trimmed re-containered
    copy (4 of 6 frames shared) pairs with its source; an unrelated video
    does not; the demux loud-fails on unknown containers."""
    import struct

    import pytest as _pytest

    va = multimodal.make_fake_video(1, 6)

    def frames_of(buf):
        (n,) = struct.unpack("<I", buf[8:12])
        off, out = 12, []
        for _ in range(n):
            (ln,) = struct.unpack("<I", buf[off : off + 4])
            off += 4
            out.append(buf[off : off + ln])
            off += ln
        return out

    fa = frames_of(va)
    fb = fa[2:] + [
        multimodal.make_fake_image(999001, 16, 16),
        multimodal.make_fake_image(999002, 16, 16),
    ]
    vb = (
        b"FAKEVID\x00"
        + struct.pack("<I", len(fb))
        + b"".join(struct.pack("<I", len(f)) + f for f in fb)
    )
    vc = multimodal.make_fake_video(7, 6)
    vids = spark.createDataFrame(
        [(1, va), (2, vb), (3, vc)], "media_id long, content binary"
    )
    got = [
        (r.id_a, r.id_b, r.shared_frames)
        for r in multimodal.video_near_dup_pairs(vids, min_shared=3).collect()
    ]
    assert got == [(1, 2, 4)]

    bad = spark.createDataFrame([(0, b"MP4BOXxx")], "media_id long, content binary")
    with _pytest.raises(Exception, match="video demux"):
        multimodal.video_frame_phashes(bad).collect()


def test_dsir_null_predicate_means_not_target(spark):
    """A NULL target predicate value (e.g. a NULL lang column) must mean
    NOT-target, exactly like a False — no NULL may leak into the bucket
    sums and silently drop log-ratio terms (sum over an all-NULL-flag
    bucket is NULL without the coalesce)."""
    from haf_plug_play_spark.ext import sampling

    docs = spark.createDataFrame(
        [
            (0, "en", "alpha beta gamma delta"),
            (1, None, "zebra xylophone quagga jackal"),
            (2, "de", "alpha beta gamma delta"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in sampling.dsir_weights(docs, F.col("lang") == "en").collect()
    }
    want = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in sampling.dsir_weights(
            docs, F.coalesce(F.col("lang") == "en", F.lit(False))
        ).collect()
    }
    assert got == want
    assert all(w is not None for _, w in got.values()), got


def test_dsir_empty_document_does_not_crash(spark):
    """An empty or whitespace-only document must yield no features — not
    a negative-slice-length SparkRuntimeException from the bigram
    construction (mirrors the oracle's greatest(len-1, 0) guard)."""
    from haf_plug_play_spark.ext import sampling

    docs = spark.createDataFrame(
        [(0, ""), (1, "alpha beta"), (2, "  ")], "doc_id long, text string"
    )
    rows = sampling.dsir_weights(docs, F.col("doc_id") == 1).collect()
    assert sorted(r.doc_id for r in rows) == [1]


def test_semantic_decontam_empty_eval_set_keeps_corpus_rows(spark):
    """An eval filter matching nothing must NOT silently empty the
    output: every corpus row appears with max_cos NULL / contaminated
    False, signaling 'never scored' rather than vanishing."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = dedup.semantic_decontam(emb, F.lit(False), threshold=0.5).collect()
    assert [(r.vec_id, r.max_cos, r.contaminated) for r in out] == [
        (0, None, False),
        (1, None, False),
    ]


def test_audio_fingerprint_short_clip_fails_loudly(spark):
    """A too-short clip must raise the named domain error, not an opaque
    geomspace/rfft traceback; a truncated payload fails at decode."""
    import pytest as _pytest
    import struct as _struct

    short = b"FAKEAUD\x00" + _struct.pack("<II", 16000, 10) + b"\0" * 20
    media = spark.createDataFrame([(0, short)], "media_id long, content binary")
    with _pytest.raises(Exception, match="too short to fingerprint"):
        multimodal.audio_fingerprint(media).collect()

    trunc = b"FAKEAUD\x00" + _struct.pack("<II", 16000, 1600) + b"\0" * 100
    media2 = spark.createDataFrame([(1, trunc)], "media_id long, content binary")
    with _pytest.raises(Exception, match="truncated audio payload"):
        multimodal.audio_fingerprint(media2).collect()


def test_bm25_ranking_behavior(spark):
    """BM25 semantics beyond the oracle: more matching query terms beat
    fewer; at equal tf, the shorter document outranks the longer one
    (length normalization); a document with no query terms is absent."""
    from haf_plug_play_spark.ext import retrieval

    filler = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "hash join scan"),  # 3 terms, short
            (2, "hash join " + filler),  # 2 terms, long
            (3, "hash " + " ".join(f"x{i}" for i in range(2))),  # 1 term, short
            (4, "hash " + filler),  # 1 term, long
            (5, filler),  # no terms
        ],
        "doc_id long, text string",
    )
    out = retrieval.bm25_topk(docs, ["hash", "join", "scan"], k=10)
    rows = {r.doc_id: (r.n_hits, r.bm25) for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # doc 5 never scores
    assert rows[1][0] == 3 and rows[2][0] == 2
    assert rows[1][1] > rows[2][1] > rows[4][1]  # more terms win
    assert rows[3][1] > rows[4][1]  # same tf, shorter doc wins


def test_classifier_trains_and_separates(spark):
    """Declarative LR training (ext/classify.py): the trained model must
    strictly reduce log-loss vs the zero model (which scores p=0.5
    everywhere) and fully separate two planted vocabularies; the
    end-to-end classifier_quality_gate keeps reference-like docs only."""
    import math as _math

    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext import classify

    reactor = "neutron flux moderator coolant turbine reactor core control rods"
    garden = "tulip compost trellis pergola loam seedling mulch arbor shade"
    rows = []
    for i in range(20):
        rows.append((i, f"{reactor} item{i % 5}", "src0"))
        rows.append((100 + i, f"{garden} item{i % 5}", "src1"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    bias, weights = classify.train_lr(
        docs, F.col("source") == "src0", iters=60, lr=5.0
    )
    scored = {
        r.doc_id: r.p_keep
        for r in classify.lr_score(docs, weights, bias=bias).collect()
    }
    pos = [p for d, p in scored.items() if d < 100]
    neg = [p for d, p in scored.items() if d >= 100]
    assert min(pos) > 0.5 > max(neg)  # complete separation
    # strict log-loss reduction vs the zero model (loss = ln 2)
    eps = 1e-12
    loss = -sum(
        _math.log(max(scored[d], eps)) if d < 100
        else _math.log(max(1 - scored[d], eps))
        for d in scored
    ) / len(scored)
    assert loss < _math.log(2.0) * 0.5  # 0.167 measured; zero model = ln 2

    # end-to-end gate: the realistic shape — a crawl that is mostly
    # junk with a few reference-like docs, scored against a reference
    # corpus. The reference-like minority must survive: its features
    # carry 10 positive reference occurrences against 4 "crawl" negative
    # ones, so the trained weights stay positive (the GPT-3 noisy-
    # negatives setup tolerates positives leaking into the crawl side).
    crawl = spark.createDataFrame(
        [(i, f"{reactor} crawlhit{i}") for i in range(4)]
        + [(100 + i, f"{garden} crawljunk{i}") for i in range(20)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(1000 + i, f"{reactor} extra{i}") for i in range(10)],
        "doc_id long, text string",
    )
    gated = classify.classifier_quality_gate(crawl, ref, iters=40)
    kept = {r.doc_id for r in gated.collect() if r.keep}
    assert kept == set(range(4))  # reference-like kept, junk dropped


def test_span_removal_keep_one_copy(spark):
    """remove_duplicated_spans applies the Lee-et-al cut with exactly-one
    surviving copy: a 20-word region shared by two docs survives intact
    in the canonical (lowest-id) doc and is cut to the word from the
    other; a doc repeating its own 8-word block keeps the first block
    only; untouched docs round-trip bit-identically."""
    R = " ".join(f"r{i}" for i in range(20))  # shared region, > window
    u1 = " ".join(f"u{i}" for i in range(10))
    u2 = " ".join(f"v{i}" for i in range(10))
    pre = "p0 p1 p2 p3 p4"
    S = " ".join(f"s{i}" for i in range(8))  # exactly one window
    rows = [
        (1, f"{R} {u1}"),  # canonical holder of R
        (2, f"{pre} {R} {u2}"),  # loses exactly R
        (3, " ".join(f"w{i}" for i in range(30))),  # untouched
        (4, f"{S} {S}"),  # within-doc repeat: second S cut
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.remove_duplicated_spans(docs).collect()}
    assert out[1].n_removed == 0 and out[1].clean_text == f"{R} {u1}"
    assert out[2].n_removed == 20 and out[2].clean_text == f"{pre} {u2}"
    assert out[3].n_removed == 0 and out[3].clean_text == rows[2][1]
    assert out[4].n_removed == 8 and out[4].clean_text == S
    # corpus-wide: each duplicated word is stored exactly once afterwards
    assert sum(r.n_removed for r in out.values()) == 28


def test_bigram_lm_sees_word_order(spark):
    """The interpolated bigram score must separate fluent word order from
    a shuffled bag of the same words — the signal the unigram model is
    blind to (identical bags score identically there)."""
    from haf_plug_play_spark.ext import text as xtext

    fluent = "the quick brown fox jumps over the lazy dog tonight"
    shuffled = "dog the over quick tonight brown the jumps lazy fox"
    assert sorted(fluent.split()) == sorted(shuffled.split())
    rows = [(i, fluent) for i in range(10)] + [(10, shuffled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r.doc_id: r.avg_logp for r in xtext.unigram_lm_scores(docs).collect()}
    assert uni[0] == uni[10]  # same bag, unigram cannot tell
    bi = {r.doc_id: r.avg_logp for r in xtext.bigram_lm_scores(docs).collect()}
    assert bi[10] < bi[0]  # word order matters to the bigram mixture
    assert bi[0] > uni[0]  # fluent docs gain from the bigram term


def test_span_removal_region_contiguity(spark):
    """Region-assembly semantics (r6 verdict #3, replacing the per-span
    sub-span-canonical corner): a window-sized sub-span of a shared
    region that independently occurs in a LOWER-id third doc no longer
    punches a hole in the region's main holder — the region's spans
    merge into ONE maximal interval, and because the holder owns the
    canonicals of the region's other spans, the WHOLE region survives
    contiguously (ExactSubstr's maximal-match reading). Non-canonical
    region copies are still cut entirely, and every duplicated span hash
    keeps ≥ 1 surviving occurrence."""
    R = [f"r{i}" for i in range(20)]
    sub = " ".join(R[4:12])  # one exact window (w=8) inside R
    region = " ".join(R)
    rows = [
        (0, sub),  # lower-id doc owning the sub-span's canonical
        (1, region),  # region's main holder
        (2, region),  # second copy: cut entirely
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.remove_duplicated_spans(docs).collect()}
    assert out[0].n_removed == 0 and out[0].clean_text == sub
    # CONTIGUITY: the main holder survives whole — no mid-region hole at
    # the foreign-canonical sub-span (the r6 behavior cut R[4:12] here)
    assert out[1].n_removed == 0 and out[1].clean_text == region
    # the second region copy is cut to nothing
    assert out[2].n_removed == 20 and out[2].clean_text == ""
    # keep-≥-one-copy per span hash: doc 0 and doc 1 both survive, so
    # every span hash (sub at doc 0, all region spans at doc 1) retains
    # at least its canonical occurrence; bounded extra retention is the
    # sub-span riding inside doc 1's contiguous region


def test_span_removal_rejects_bad_window(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for w in (0, -1):
        with _pytest.raises(ValueError, match="span window"):
            dedup.remove_duplicated_spans(docs, window=w)


def test_mixture_report_disjoint_recipe_zero_rates(spark):
    """A recipe naming no stratum present in the corpus must yield
    all-ZERO sample rates — visibly 'nothing sampled', never the 0/0
    NaN/null that would poison a downstream Bernoulli predicate."""
    from haf_plug_play_spark.ext import sampling as xsampling

    docs = spark.createDataFrame(
        [(0, "a b c", "src0"), (1, "d e", "src1")],
        "doc_id long, text string, source string",
    )
    out = xsampling.mixture_report(
        docs, {"web": 1.0}, F.lit(1)
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.target_share == 0.0 and r.sample_rate == 0.0


def test_mixture_report_zero_token_stratum_rate_zero(spark):
    """A stratum with documents but ZERO total tokens has token share 0;
    target/share would divide by zero (Spark: NULL) — the report must
    instead assign it rate 0.0 so every rate stays well-typed for
    downstream Bernoulli predicates (ADVICE r6)."""
    from haf_plug_play_spark.ext import sampling as xsampling

    docs = spark.createDataFrame(
        [(0, 5, "src0"), (1, 0, "empty"), (2, 0, "empty")],
        "doc_id long, n_tok long, source string",
    )
    out = {
        r.source: r
        for r in xsampling.mixture_report(
            docs, {"src0": 0.5, "empty": 0.5}, F.col("n_tok")
        ).collect()
    }
    assert out["empty"].token_share == 0.0
    assert out["empty"].sample_rate == 0.0  # not NULL/NaN
    assert out["src0"].sample_rate == 1.0  # only contributing stratum keeps all


def test_train_lr_crawl_subsampled_metrics(spark):
    """Crawl-scale training (ext/classify.py:train_lr_crawl): negatives
    hash-subsampled deterministically, a held-out slice never trains, and
    in-query precision/recall come back with the model. The subsampled
    model must still separate the planted vocabularies on the holdout."""
    from haf_plug_play_spark.ext import classify

    reactor = "neutron flux moderator coolant turbine reactor core control rods"
    garden = "tulip compost trellis pergola loam seedling mulch arbor shade"
    rows = [(i, f"{reactor} item{i % 7}", "src0") for i in range(40)]
    # 10x negatives — the imbalance the subsample exists for
    rows += [(1000 + i, f"{garden} junk{i % 7}", "src1") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    bias, weights, m = classify.train_lr_crawl(
        docs,
        F.col("source") == "src0",
        iters=40,
        lr=5.0,
        neg_rate=0.25,
        holdout_frac=0.3,
    )
    # confusion counts total the holdout and the planted vocabularies
    # separate: perfect precision/recall on held-out docs
    assert m["n_holdout"] == m["tp"] + m["fp"] + m["fn"] + m["tn"] > 0
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1"] == 1.0
    # the holdout contains both classes (otherwise the metrics are vacuous)
    assert m["tp"] > 0 and m["tn"] > 0
    # subsampling really dropped negatives: scoring the full corpus still
    # separates, proving the model didn't need the dropped rows
    scored = {
        r.doc_id: r.p_keep
        for r in classify.lr_score(docs, weights, bias=bias).collect()
    }
    assert min(p for d, p in scored.items() if d < 1000) > 0.5
    assert max(p for d, p in scored.items() if d >= 1000) < 0.5


def test_train_lr_crawl_subsample_deterministic(spark):
    """The negative subsample is a pure function of (id, seed): two runs
    return bit-identical weights and metrics; changing the seed redraws
    the subsample (different training pool size is allowed to change the
    model, but determinism per seed is the contract)."""
    from haf_plug_play_spark.ext import classify

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 11} gamma", "src0") for i in range(30)]
        + [(500 + i, f"delta epsilon q{i % 11} zeta", "src1") for i in range(120)],
        "doc_id long, text string, source string",
    )
    runs = [
        classify.train_lr_crawl(
            docs, F.col("source") == "src0", iters=8, neg_rate=0.4
        )
        for _ in range(2)
    ]
    assert runs[0][0] == runs[1][0]
    assert runs[0][1] == runs[1][1]
    assert runs[0][2] == runs[1][2]


def test_kn_trigram_lm_order_and_continuation(spark):
    """Kneser-Ney trigram scoring (ext/text.py:kn_trigram_lm_scores):
    (a) sees word order beyond bigrams — a doc preserving the corpus's
    trigram structure outscores one that only preserves its bigram-pair
    multiset edges locally; (b) the KN signature: a high-frequency word
    locked to ONE context ('francisco' after 'san') carries a LOW
    continuation probability, so it scores worse in a novel context than
    an equally-frequent word seen in many contexts."""
    from haf_plug_play_spark.ext import text as xtext

    fluent = "the quick brown fox jumps over the lazy dog tonight"
    shuffled = "dog the over quick tonight brown the jumps lazy fox"
    rows = [(i, fluent) for i in range(10)] + [(10, shuffled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sc = {r.doc_id: r.avg_logp for r in xtext.kn_trigram_lm_scores(docs).collect()}
    assert sc[10] < sc[0]  # order matters at trigram granularity

    # continuation property: 'francisco' and 'store' both occur 8 times;
    # francisco ONLY ever after 'san', store after 8 different words.
    # Probe docs put each after the same novel context — KN's
    # continuation backoff must penalize the one-context word.
    ctxs = ["big", "small", "old", "new", "nice", "good", "red", "blue"]
    rows = [(i, f"san francisco {ctxs[i]} store visit") for i in range(8)]
    rows += [(100, "we saw francisco"), (101, "we saw store")]
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")
    sc2 = {
        r.doc_id: r.avg_logp
        for r in xtext.kn_trigram_lm_scores(docs2).collect()
    }
    assert sc2[100] < sc2[101]


def test_kn_trigram_count_cutoff(spark):
    """The KenLM-style min_count dial (ext/text.py:kn_trigram_lm_scores):
    (a) cutoff <= 1 is exactly the unpruned model (the no-op pin — both
    0 and 1 reproduce the default scores bit-for-bit); (b) cutoff=2 on a
    corpus with singleton n-grams changes scores through the backoff
    fallbacks yet every score stays finite (no null/-inf leaks from the
    pruned-entry branches); (c) a corpus whose n-grams all clear the
    cutoff is untouched by it."""
    import math

    from haf_plug_play_spark.ext import text as xtext

    # 10 repeats make every 'fluent' n-gram count 10; the singleton doc
    # contributes count-1 bigrams/trigrams that a cutoff of 2 prunes
    fluent = "the quick brown fox jumps over the lazy dog tonight"
    rare = "zig zag zog the quick wombat"
    rows = [(i, fluent) for i in range(10)] + [(10, rare)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = {r.doc_id: r.avg_logp for r in xtext.kn_trigram_lm_scores(docs).collect()}
    for mc in (0, 1):
        again = {
            r.doc_id: r.avg_logp
            for r in xtext.kn_trigram_lm_scores(docs, min_count=mc).collect()
        }
        assert again == base  # the no-op pin

    pruned = {
        r.doc_id: r.avg_logp
        for r in xtext.kn_trigram_lm_scores(docs, min_count=2).collect()
    }
    assert all(math.isfinite(v) for v in pruned.values())
    assert pruned[10] != base[10]  # the singleton doc scores via backoff
    assert pruned[10] < pruned[0]  # and still ranks below the fluent docs

    # every n-gram at count >= 2 -> cutoff 2 changes nothing
    docs2 = spark.createDataFrame(
        [(i, fluent) for i in range(4)], "doc_id long, text string"
    )
    a = {r.doc_id: r.avg_logp for r in xtext.kn_trigram_lm_scores(docs2).collect()}
    b = {
        r.doc_id: r.avg_logp
        for r in xtext.kn_trigram_lm_scores(docs2, min_count=2).collect()
    }
    assert a == b


def test_ivfadc_recall_meets_production_floor(spark):
    """XS-recall's meets_floor must actually be True at the oracle SF —
    the driver hash-check proves Spark and DuckDB agree, THIS pins that
    the agreed number clears the production bound (the 0.8 trained-
    recall floor from tests/test_scale_smoke.py)."""
    row = EXT_QUERIES["XS-recall"](spark, SF_ORACLE).collect()[0]
    assert row.meets_floor and row.recall >= 0.8
    assert row.k == 10 and row.n_hits == row.k  # full cluster recovery


def test_hll_distinct_certified_and_mergeable(spark):
    """HLL sketch (ext/sketch.py:hll_distinct): (a) in the HLL regime
    (thousands of distinct items, m=256 registers) the estimate lands
    within the certified 4-sigma band and the per-source-then-merge path
    equals the direct sketch EXACTLY; (b) tiny cardinalities ride the
    linear-counting branch and stay certified; (c) duplicate items never
    move the estimate (a sketch over a multiset sees only the set)."""
    from haf_plug_play_spark.ext.sketch import hll_distinct

    items = spark.range(5000).selectExpr(
        "concat('src', CAST(id % 3 AS STRING)) AS source",
        "md5(CAST(id AS STRING)) AS item",
    )
    row = hll_distinct(items).collect()[0]
    assert row.n_exact == 5000
    assert row.certified and row.merge_consistent
    assert row.rel_err <= 4 * 1.04 / (256 ** 0.5)

    tiny = spark.range(30).selectExpr(
        "'s' AS source", "md5(CAST(id AS STRING)) AS item"
    )
    t = hll_distinct(tiny).collect()[0]
    assert t.n_exact == 30 and t.certified and t.merge_consistent

    # multiset invariance: every item duplicated 4x across sources
    dup = spark.range(20000).selectExpr(
        "concat('src', CAST(id % 4 AS STRING)) AS source",
        "md5(CAST(id % 5000 AS STRING)) AS item",
    )
    d = hll_distinct(dup).collect()[0]
    assert d.n_exact == 5000 and d.hll_est == row.hll_est


def test_calibration_report_bins_and_ece(spark):
    """Calibration report (ext/classify.py:calibration_report): known
    hand-built bins produce the exact per-bin gaps and the
    prevalence-weighted ECE; a perfectly calibrated scorer reports
    ece == 0; boundary p = 1.0 clamps into the last bin."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext.classify import calibration_report

    rows = [(i, 0.05, i == 3) for i in range(4)]  # bin 0: mean .05, frac .25
    rows += [(10 + i, 0.95, True) for i in range(4)]  # bin 9: mean .95, frac 1
    rows += [(20, 1.0, True)]  # p=1.0 must clamp into bin 9, not bin 10
    df = spark.createDataFrame(rows, "doc_id long, p_keep double, y boolean")
    out = {r.bin: r for r in calibration_report(df, F.col("y")).collect()}
    assert set(out) == {0, 9}
    assert out[0].n_docs == 4 and out[0].mean_p == 0.05
    assert out[0].frac_pos == 0.25 and out[0].gap == 0.2
    assert out[9].n_docs == 5
    assert out[9].mean_p == 0.96 and out[9].frac_pos == 1.0
    assert out[9].gap == 0.04
    # ECE = (4*0.2 + 5*0.04) / 9
    assert out[0].ece == out[9].ece == round((4 * 0.2 + 5 * 0.04) / 9, 6)

    # perfect calibration: frac_pos == mean_p in every bin
    rows2 = [(i, 0.25, i % 4 == 0) for i in range(8)]
    df2 = spark.createDataFrame(rows2, "doc_id long, p_keep double, y boolean")
    out2 = calibration_report(df2, F.col("y")).collect()
    assert len(out2) == 1 and out2[0].gap == 0.0 and out2[0].ece == 0.0


def test_packing_report_accounts_for_fill(spark):
    """Packing report (ext/sampling.py:packing_report): chunk counts,
    token totals, and fill ratios follow exactly from the pack_chunks
    assignment — a stratum whose tokens exactly fill its chunks reports
    fill_ratio 1.0; a fragmenting stratum reports the deficit."""
    from haf_plug_play_spark.ext.sampling import pack_chunks, packing_report

    # srcA: 4 docs x 50 tokens, budget 100 -> 2 chunks, fill 1.0
    rows = [(i, "srcA", 50) for i in range(4)]
    # srcB: 3 docs x 40 tokens = 120 tokens -> chunks 0 (40+40+40 start
    # offsets 0/40/80 -> ids 0,0,0)... all start under 100: 1 chunk, 120/100
    rows += [(10 + i, "srcB", 40) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    packed = pack_chunks(df, ["source"], "n_tok", budget=100, order_col="doc_id")
    out = {r.source: r for r in packing_report(
        packed, ["source"], "n_tok", budget=100
    ).collect()}
    a, b = out["srcA"], out["srcB"]
    assert (a.n_docs, a.n_chunks, a.n_tokens) == (4, 2, 200)
    assert a.docs_per_chunk == 2.0 and a.fill_ratio == 1.0
    assert (b.n_docs, b.n_chunks, b.n_tokens) == (3, 1, 120)
    assert b.fill_ratio == 1.2  # last doc straddles past the budget


def test_perplexity_gate_terciles_and_monotone(spark):
    """Perplexity gate (ext/text.py:perplexity_gate): with the whole
    group sampled and 9 distinct perplexities per group, the integer-
    rank cutoffs split exact thirds; buckets are monotone in ppl; keep
    drops exactly the tail; groups compute independent cutoffs."""
    from haf_plug_play_spark.ext.text import perplexity_gate

    rows = []
    for g, (lang, base) in enumerate([("en", 1.0), ("de", 3.0)]):
        for i in range(9):
            # distinct avg_logp per doc: ppl = exp(-logp) strictly
            # increasing in i
            rows.append((g * 100 + i, lang, 50, -(base + 0.1 * i)))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_words long, avg_logp double"
    )
    out = perplexity_gate(df).collect()
    assert len(out) == 18
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.ppl)
        buckets = [r.ppl_bucket for r in rs]
        assert buckets == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        assert [r.keep for r in rs] == [True] * 6 + [False] * 3


def test_perplexity_gate_sampled_cutoffs_cover_all_rows(spark):
    """sample_denom > 1: cutoffs are learned from the hash sample, but
    EVERY row is bucketed (the sample only trains the cutoffs, as in
    CCNet); the bucket stays monotone in ppl per group."""
    from haf_plug_play_spark.ext.text import perplexity_gate

    df = spark.createDataFrame(
        [(i, "en", 10, -(1.0 + 0.01 * i)) for i in range(60)],
        "doc_id long, lang string, n_words long, avg_logp double",
    )
    out = sorted(perplexity_gate(df, sample_denom=2).collect(),
                 key=lambda r: r.ppl)
    assert len(out) == 60  # no row lost to the sampling
    order = {"head": 0, "middle": 1, "tail": 2}
    ranks = [order[r.ppl_bucket] for r in out]
    assert ranks == sorted(ranks)
    assert ranks[0] == 0 and ranks[-1] == 2


def test_roc_auc_separation_ties_and_degenerate(spark):
    """ROC-AUC (ext/classify.py:roc_auc): perfect separation -> 1.0;
    inverted -> 0.0; a single shared score -> 0.5 by half-credit ties;
    a hand-computed mixed case matches the rank formula; no negatives
    -> NULL, not a fabricated value."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext.classify import roc_auc

    def auc_of(rows):
        df = spark.createDataFrame(rows, "p_keep double, y boolean")
        return roc_auc(df, F.col("y")).collect()[0]

    perfect = [(0.9, True)] * 3 + [(0.1, False)] * 4
    assert auc_of(perfect).auc == 1.0
    inverted = [(0.1, True)] * 3 + [(0.9, False)] * 4
    assert auc_of(inverted).auc == 0.0
    ties = [(0.5, True)] * 3 + [(0.5, False)] * 4
    r = auc_of(ties)
    assert r.auc == 0.5 and r.n_distinct_scores == 1
    # mixed: pos at .8,.6, neg at .7,.2 -> pairs: (.8 beats both)=2,
    # (.6 beats .2)=1 -> U=3 of 4 -> 0.75
    mixed = [(0.8, True), (0.6, True), (0.7, False), (0.2, False)]
    r = auc_of(mixed)
    assert r.auc == 0.75 and (r.n_pos, r.n_neg) == (2, 2)
    assert auc_of([(0.5, True), (0.9, True)]).auc is None


def test_minhash_accuracy_exact_duplicates_zero_error(spark):
    """MinHash accuracy (ext/dedup.py:minhash_accuracy): byte-identical
    docs have identical signatures AND Jaccard 1, so their pair
    contributes zero error; the audit over a corpus of two dup pairs
    reports mae 0 and full 2-sigma coverage."""
    from haf_plug_play_spark.ext.dedup import minhash_accuracy

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine"),
            (4, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    r = minhash_accuracy(docs, num_hashes=8, bands=4).collect()[0]
    assert r.n_pairs == 2
    assert r.mae == 0.0 and r.max_err == 0.0
    assert r.frac_within_2se == 1.0 and r.certified


def test_loglinear_quantiles_known_values(spark):
    """Log-linear quantile sketch (ext/sketch.py:loglinear_quantiles):
    (a) for 1..100 across two sources, exact quantiles are the integer
    ranks, every estimate is certified within its bucket bound, and the
    per-source merge equals the direct sketch; (b) a power-of-two value
    sits on its bucket's lower bound (the boundary the difference-based
    rel_err exists for) and still certifies; (c) the relative-error
    bound never exceeds 1/(2S) = 1/16."""
    from haf_plug_play_spark.ext.sketch import loglinear_quantiles

    items = spark.createDataFrame(
        [(f"s{v % 2}", v) for v in range(1, 101)], "source string, value long"
    )
    rows = loglinear_quantiles(items).collect()
    assert [r.q for r in rows] == [0.5, 0.9, 0.99]
    assert [r.exact_v for r in rows] == [50, 90, 99]
    for r in rows:
        assert r.certified and r.merge_consistent
        assert r.err_bound <= 1 / 16 + 1e-12
        assert abs(r.est - r.exact_v) / r.exact_v <= r.err_bound + 1e-12

    # every value = 64: p50 exact IS the bucket lower bound
    const = spark.createDataFrame(
        [("s", 64)] * 10, "source string, value long"
    )
    r = loglinear_quantiles(const).collect()[0]
    assert r.exact_v == 64 and r.certified


def test_cluster_best_tiebreak_is_order_agnostic(spark):
    """dedup_decision_by_quality (ext/dedup.py): the keeper tie-break is
    min(struct(-score, id)) — max score, ties to MINIMUM id — and must
    work for STRING doc ids too (ADVICE r8: the previous max(struct(
    score, -id)) assumed a numeric id and failed at -F.col(id))."""
    from haf_plug_play_spark.ext.dedup import dedup_decision_by_quality
    from pyspark.sql import functions as F

    for ids, typ in [
        ((10, 20, 30), "long"),
        (("d10", "d20", "d30"), "string"),
    ]:
        df = spark.createDataFrame(
            [(ids[0], 0.5), (ids[1], 0.5), (ids[2], 0.9)],
            f"doc_id {typ}, q double",
        )
        pairs = spark.createDataFrame(
            [(ids[0], ids[1])], f"id_a {typ}, id_b {typ}"
        )
        out = {
            r.doc_id: (r.best_id, r.keep)
            for r in dedup_decision_by_quality(
                df, pairs, score=F.col("q")
            ).collect()
        }
        # tie on q=0.5 → minimum id wins the 2-cluster; singleton keeps
        assert out[ids[0]] == (ids[0], True)
        assert out[ids[1]] == (ids[0], False)
        assert out[ids[2]] == (ids[2], True)

    # a NULL score must LOSE to any scored copy (struct-min sorts NULL
    # fields first, which un-coalesced would keep the unscored dup and
    # drop the best copy); an all-NULL cluster degrades to min id
    df = spark.createDataFrame(
        [(1, None), (2, 0.9), (5, None), (6, None)], "doc_id long, q double"
    )
    pairs = spark.createDataFrame([(1, 2), (5, 6)], "id_a long, id_b long")
    out = {
        r.doc_id: (r.best_id, r.keep)
        for r in dedup_decision_by_quality(df, pairs, score=F.col("q")).collect()
    }
    assert out[1] == (2, False) and out[2] == (2, True)
    assert out[5] == (5, True) and out[6] == (5, False)


def test_chunk_no_redundant_final_chunk(spark):
    """chunk_documents (review r9): a doc whose length lands in the
    overlap window past a stride boundary must NOT emit a final chunk
    that is a strict subset of its predecessor (pure duplicated text)."""
    from haf_plug_play_spark.ext.text import chunk_documents

    # size=8, overlap=4, stride=4: a 10-word doc previously produced
    # starts [1,5,9] where chunk@9 (words 9-10) ⊂ chunk@5 (words 5-10)
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(1, 11)))], "doc_id long, text string"
    )
    rows = chunk_documents(docs, size=8, overlap=4).orderBy("chunk_idx").collect()
    texts = [r.chunk_text for r in rows]
    assert texts == ["w1 w2 w3 w4 w5 w6 w7 w8", "w5 w6 w7 w8 w9 w10"]
    # every word still covered, no chunk a subset of another
    for i, t in enumerate(texts):
        for j, u in enumerate(texts):
            assert i == j or not set(t.split()) <= set(u.split())


def test_ppl_gate_keeps_unsampled_groups(spark):
    """perplexity_gate (review r9): a group whose hash sample is empty
    (or a NULL group) is kept as 'unsampled', not dropped by the join or
    cut as 'tail'."""
    from pyspark.sql import functions as F
    from haf_plug_play_spark.ext.text import perplexity_gate

    scored = spark.createDataFrame(
        [(i, 3, -1.0 - 0.1 * i, "en") for i in range(1, 13)]
        + [(100, 3, -1.5, "pt"), (101, 3, -1.5, None)],
        "doc_id long, n_words long, avg_logp double, lang string",
    )
    # denom so large that tiny groups will certainly miss the sample for
    # SOME denominator; find one deterministically for the pt/None docs
    out = None
    for denom in (7, 11, 13, 17, 19, 23):
        res = perplexity_gate(scored, sample_denom=denom)
        got = {r.doc_id: r for r in res.collect()}
        if 100 in got and got[100].ppl_bucket == "unsampled":
            out = got
            break
    assert out is not None, "no denominator left pt unsampled; widen the list"
    assert out[100].keep is True
    assert out[101].ppl_bucket == "unsampled" and out[101].keep is True
    assert len(out) == 14  # nothing silently dropped


def test_roc_auc_and_calibration_exclude_null_labels(spark):
    """roc_auc / calibration_report (review r9): NULL labels are neither
    negatives (count inflation) nor weight (population mismatch)."""
    from pyspark.sql import functions as F
    from haf_plug_play_spark.ext.classify import calibration_report, roc_auc

    scored = spark.createDataFrame(
        [(0.9, True), (0.8, False), (0.7, None), (0.6, None)],
        "p_keep double, y boolean",
    )
    auc = roc_auc(scored, F.col("y")).collect()[0]
    assert (auc.n_pos, auc.n_neg) == (1, 1) and auc.auc == 1.0
    cal = calibration_report(scored, F.col("y"), n_bins=10).collect()
    assert sum(r.n_docs for r in cal) == 2  # NULL-labeled rows excluded


def test_temperature_mix_keeps_null_stratum(spark):
    """temperature_mix (review r9): NULL-stratum rows survive via the
    null-safe join; at alpha=1 every row is kept with rate 1.0."""
    from haf_plug_play_spark.ext.sampling import temperature_mix

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None), (4, "de")],
        "doc_id long, lang string",
    )
    out = temperature_mix(df, "lang", "doc_id", alpha=1.0).collect()
    assert len(out) == 4
    assert all(r.mix_rate == 1.0 for r in out)
    assert {r.doc_id for r in out} == {1, 2, 3, 4}


def test_gopher_alpha_frac_boundary_inclusive(spark):
    """gopher_gates (review r9): a doc at exactly min_alpha_frac passes,
    matching every other inclusive bound."""
    from haf_plug_play_spark.ext.text import gopher_gates

    # 5 words, 4 alphabetic → alpha_frac = 0.8 exactly; lots of stopwords
    docs = spark.createDataFrame(
        [(1, "the and that with 42")], "doc_id long, text string"
    )
    r = gopher_gates(docs, min_words=3).collect()[0]
    assert r.g_alpha_frac == 0.8
    assert r.g_pass is True


def test_simhash_drops_null_text(spark):
    """simhash (review r9): NULL-text rows are dropped, not fingerprinted
    as 0 (which made every NULL pair a hamming-0 'duplicate' with no
    verify stage on this path)."""
    from haf_plug_play_spark.ext.dedup import simhash

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real words here")],
        "doc_id long, text string",
    )
    out = simhash(df).collect()
    assert {r.doc_id for r in out} == {3}


def test_exact_dedup_deterministic_under_order_ties(spark):
    """exact_dedup (review r9): tied order_col values break by content
    hash, so reruns (and different partitionings) keep the same row."""
    from haf_plug_play_spark.ext.dedup import exact_dedup

    rows = [("k", 5, "payload-a"), ("k", 5, "payload-b"), ("k", 9, "later")]
    outs = set()
    for parts in (1, 2, 3):
        df = spark.createDataFrame(
            rows, "key string, ts long, payload string"
        ).repartition(parts)
        kept = exact_dedup(df, ["key"], "ts").collect()
        assert len(kept) == 1
        outs.add(kept[0].payload)
    assert len(outs) == 1  # same winner under every partitioning


def test_embedding_exact_rejects_string_ids(spark):
    """embedding_cosine_pairs_exact (review r9): a non-numeric id fails
    loudly at plan time, not as an opaque numpy TypeError mid-job."""
    import pytest as _pytest
    from haf_plug_play_spark.ext.dedup import embedding_cosine_pairs_exact

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    with _pytest.raises(TypeError, match="numeric"):
        embedding_cosine_pairs_exact(df)


def test_minhash_bands_divisibility_is_value_error(spark):
    """review r9: misconfigured bands raise ValueError (asserts vanish
    under python -O and would silently degrade the collision curve)."""
    import pytest as _pytest
    from haf_plug_play_spark.ext.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="divide evenly"):
        minhash_lsh_pairs(df, num_hashes=16, bands=3)
    with _pytest.raises(ValueError, match="divide evenly"):
        incremental_minhash_pairs(df, df, num_hashes=16, bands=3)


def test_minhash_accuracy_empty_candidate_set_certifies_true(spark):
    """minhash_accuracy (review r9): zero LSH candidates → certified is
    an explicit True (vacuous), never the tri-state NULL a gate would
    misread; mae/max_err honestly NULL."""
    from haf_plug_play_spark.ext.dedup import minhash_accuracy

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    r = minhash_accuracy(docs, num_hashes=8, bands=4).collect()[0]
    assert r.n_pairs == 0
    assert r.certified is True
    assert r.mae is None and r.max_err is None


def test_span_removal_null_text_zero_counters(spark):
    """remove_duplicated_spans (review r9): NULL-text docs report zero
    counters (not NULL arithmetic); clean_text stays NULL, faithful to
    the input."""
    from haf_plug_play_spark.ext.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e f g h i j")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(df).collect()}
    assert out[1].n_words == 0 and out[1].n_removed == 0
    assert out[1].clean_text is None
    assert out[2].n_words == 10 and out[2].clean_text is not None


def test_exact_dedup_tolerates_map_columns(spark):
    """ADVICE r9: exact_dedup is a public operator; a map-typed payload
    column must not break it (xxhash64 raises on MapType, so map columns
    are excluded from the tie-break hash). Determinism on the HASHABLE
    columns is preserved: ties that differ in a non-map column still
    resolve by content."""
    from haf_plug_play_spark.ext.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            ("k", 1, "b", {"x": 1}),
            ("k", 1, "a", {"y": 2}),
            ("k", 2, "z", {"z": 3}),
        ],
        "key string, ts int, payload string, meta map<string,int>",
    )
    kept = exact_dedup(df, ["key"], "ts").collect()
    assert len(kept) == 1
    # tie on ts=1 resolves by the hash over (key, ts, payload): stable
    # across reruns regardless of arrival order
    again = exact_dedup(df.orderBy(F.rand(7)), ["key"], "ts").collect()
    assert kept[0].payload == again[0].payload

    # all-map tie (only unhashable columns differ): must still dedup to
    # one row rather than raise
    allmap = spark.createDataFrame(
        [("k", 1, {"x": 1}), ("k", 1, {"y": 2})],
        "key string, ts int, meta map<string,int>",
    )
    assert exact_dedup(allmap, ["key"], "ts").count() == 1


def test_pgm_parse_agrees_with_pil_when_present():
    """Opportunistic real-codec cross-check (VERDICT r9 #8, mirroring
    tests/test_s3_real_client.py's boto3 pattern): when Pillow is
    installed, the pure-NumPy P5 parser must decode byte-identical pixels
    to PIL on the same PGM bytes. Skips cleanly in codec-less containers —
    zero behavior change when PIL is absent."""
    pytest.importorskip("PIL")
    import numpy as np
    from PIL import Image

    px = np.arange(16, dtype=np.uint8).reshape(2, 8) * 16 + 3
    buf = multimodal.make_pgm(px)
    w, h, ours = multimodal._parse_pgm(buf)
    import io

    theirs = np.asarray(Image.open(io.BytesIO(buf)))
    assert (w, h) == (8, 2)
    assert theirs.shape == ours.shape
    assert (theirs == ours).all()
    assert (ours == px).all()


def test_connected_components_reliable_checkpoint_equivalence(spark, tmp_path):
    """reliable_checkpoint=True (the 100 TB executor-loss posture) must
    produce the identical census as the local-mode default — the flag
    changes lineage-truncation durability, never results. Requires a
    checkpoint dir, which the caller owns."""
    from haf_plug_play_spark.ext.dedup import dedup_decision

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9), (6, 8)], "id_a long, id_b long"
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "chk"))
    fast = dedup_decision(docs, pairs).collect()
    durable = dedup_decision(docs, pairs, reliable_checkpoint=True).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, durable))


def test_zipf_degenerate_vocabulary_is_null_in_both_engines(tmp_path, spark):
    """ADVICE r10: on a corpus whose histogram has ≤1 distinct count
    (every word unique → zero rank variance) the slope/R² division is
    degenerate; without the guard Spark yields NULL while DuckDB yields
    NaN/inf — the engines disagree exactly on the pathological input the
    diagnostic exists to flag. Both must return NULL."""
    import pandas as pd

    pd.DataFrame({"text": ["alpha beta", "gamma delta"]}).to_parquet(
        tmp_path / "documents.parquet"
    )
    row = EXT_QUERIES["XT-zipf"](spark, str(tmp_path)).collect()[0]
    assert (row.n_tokens, row.n_types) == (4, 4)
    assert row.zipf_slope is None and row.zipf_r2 is None
    import duckdb

    con = duckdb.connect()  # own catalog: never clobber the shared fixture
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    o = con.execute(EXT_ORACLE_SQL["XT-zipf"]).fetchall()[0]
    assert (o[0], o[1]) == (4, 4)
    assert o[3] is None and o[4] is None


def test_resize_path_output_decodes_with_pil_when_present(spark):
    """VERDICT r10 carry #9: extend the conditional real-codec golden
    from decode-only to the RESIZE path. The full Spark mapInPandas
    resize runs on a real PGM; Pillow then decodes the output container
    and must see exactly the pixels the documented nearest-neighbor
    index map ((i*h)//out_h gather) produces. PIL's own NEAREST uses a
    center-sampling convention, so parity is asserted on our declared
    kernel through a PIL decode of our output bytes — proving the
    emitted container is a real image a real codec agrees about, not
    just bytes our own parser round-trips. Skips cleanly without PIL."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    px = (np.arange(48, dtype=np.uint8).reshape(6, 8) * 5 + 1)
    media = spark.createDataFrame(
        [(1, bytearray(multimodal.make_pgm(px)))],
        "media_id long, content binary",
    )
    out = multimodal.resize_images(media, out_w=4, out_h=3).collect()
    assert [(r.media_id, r.width, r.height) for r in out] == [(1, 4, 3)]
    theirs = np.asarray(Image.open(io.BytesIO(bytes(out[0].content))))
    ys = (np.arange(3) * 6) // 3
    xs = (np.arange(4) * 8) // 4
    assert theirs.shape == (3, 4)
    assert (theirs == px[ys][:, xs]).all()


def test_rrf_fuse_closed_form_ranks(spark):
    """rrf_fuse golden: a doc that tops BOTH legs scores exactly
    2/(60+1); single-leg docs score 1/(60+2) and tie-break on id."""
    from haf_plug_play_spark.ext import retrieval

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0)], "doc_id long, bm25 double"
    )
    dense = spark.createDataFrame(
        [(1, 0.9), (3, 0.5)], "doc_id long, cosine double"
    )
    rows = retrieval.rrf_fuse(lex, "bm25", dense, "cosine", k=10).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3]
    assert rows[0].rrf == round(2.0 / 61.0, 6)
    assert rows[1].rrf == rows[2].rrf == round(1.0 / 62.0, 6)
    assert (rows[0].lex_rank, rows[0].dense_rank) == (1, 1)
    assert (rows[1].lex_rank, rows[1].dense_rank) == (2, None)
    assert (rows[2].lex_rank, rows[2].dense_rank) == (None, 2)


def test_lsh_planner_closed_form_and_house_config(spark):
    """Planner goldens: (b=1, r=1) has P(s)=s, so both error masses are
    the exact midpoint-rule integrals 0.125 and s50=1; the house MinHash
    config (bands=4, rows=2) has its 50% crossover EXACTLY at the house
    Jaccard threshold 0.5 — (1/4)^(1/2); and at a fixed signature
    budget b·r=8, many-bands (8,1) is the permissive corner (more false
    positives) while many-rows (1,8) is the conservative one."""
    from haf_plug_play_spark.ext.registry import EXT_QUERIES

    rows = {
        (r.b, r.r): r
        for r in EXT_QUERIES["XD-lsh-planner"](spark, SF_ORACLE).collect()
    }
    unit = rows[(1, 1)]
    assert unit.s50 == 1.0
    assert unit.fp_mass == 0.125 and unit.fn_mass == 0.125
    assert rows[(4, 2)].s50 == 0.5
    assert rows[(8, 1)].fp_mass > rows[(1, 8)].fp_mass
    assert rows[(8, 1)].fn_mass < rows[(1, 8)].fn_mass
    assert all(r.n_hashes == r.b * r.r for r in rows.values())


def test_dedup_savings_cross_source_accounting(spark, tmp_path):
    """Planted cross-source duplicate: the globally-first doc_id keeps
    the text, the OTHER source pays the savings — per-source token
    accounting must reflect exactly that."""
    from haf_plug_play_spark.ext.registry import EXT_QUERIES

    spark.createDataFrame(
        [
            (1, "x x x", "en", "a", 5),
            (2, "x x x", "en", "b", 5),
            (3, "y", "en", "b", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.source: r
        for r in EXT_QUERIES["XA-dedup-savings"](spark, str(tmp_path)).collect()
    }
    a, b = rows["a"], rows["b"]
    assert (a.n_docs, a.n_tokens, a.kept_docs, a.kept_tokens) == (1, 3, 1, 3)
    assert a.savings_pct == 0.0
    assert (b.n_docs, b.n_tokens, b.kept_docs, b.kept_tokens) == (2, 4, 1, 1)
    assert b.savings_pct == 75.0


def test_burstiness_planted_values(spark, tmp_path):
    """Planted dispersion: a word dumped 4× into one doc of four has
    vmr − 1 = Q/S − S/N = 16/4 − 4/4 = 3; a word spread once per doc is
    exactly Poisson-uniform, Q/S − S/N = 0."""
    from haf_plug_play_spark.ext.registry import EXT_QUERIES

    spark.createDataFrame(
        [
            (1, "bursty bursty bursty bursty even", "en", "a", 33),
            (2, "even pad1", "en", "a", 8),
            (3, "even pad2", "en", "a", 8),
            (4, "even pad3", "en", "a", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.word: r
        for r in EXT_QUERIES["XT-burstiness"](spark, str(tmp_path)).collect()
    }
    assert rows["bursty"].burstiness == 3.0
    assert rows["even"].burstiness == 0.0
    assert (rows["bursty"].n_total, rows["bursty"].n_docs) == (4, 1)
    assert (rows["even"].n_total, rows["even"].n_docs) == (4, 4)


def test_doc_entropy_closed_form(spark):
    """Entropy goldens: a four-way repeated token is zero entropy; four
    distinct tokens are exactly 2 bits and norm 1; a single-token doc
    takes the guarded 0.0."""
    from haf_plug_play_spark.ext.report import doc_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "only")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in doc_entropy(docs).collect()}
    assert rows[1].entropy_bits == 0.0 and rows[1].norm_entropy == 0.0
    assert rows[2].entropy_bits == 2.0 and rows[2].norm_entropy == 1.0
    assert rows[3].n_tokens == 1 and rows[3].norm_entropy == 0.0


def test_doremi_identical_sources_get_share_weights(spark):
    """When every source has the corpus distribution, excess surprisal is
    zero everywhere, so the DoReMi weight must equal the token share
    exactly; a source with out-of-distribution tokens must be upweighted
    ABOVE its share."""
    from haf_plug_play_spark.ext.report import doremi_weights

    same = spark.createDataFrame(
        [(1, "x y", "a"), (2, "x y", "a"), (3, "x y", "a"), (4, "x y", "b")],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in doremi_weights(same).collect()}
    assert rows["a"].excess_nats == 0.0 and rows["b"].excess_nats == 0.0
    assert rows["a"].weight == rows["a"].token_share == 0.75
    assert rows["b"].weight == rows["b"].token_share == 0.25

    hard = spark.createDataFrame(
        [(1, "x x x x x x", "a"), (2, "q z w v", "b")],
        "doc_id long, text string, source string",
    )
    hrows = {r.source: r for r in doremi_weights(hard).collect()}
    assert hrows["b"].excess_nats > 0.0
    assert hrows["b"].weight > hrows["b"].token_share
    assert abs(hrows["a"].weight + hrows["b"].weight - 1.0) < 2e-6


def test_embedding_qc_closed_form(spark):
    """Embedding QC goldens: two orthogonal unit vectors share a label —
    centroid [.5, .5], every cosine to it is exactly 1/√2 (micro-unit
    quantized: 0.707107); a single-vector label is its own centroid
    (cos 1, mean_norm = its norm)."""
    from haf_plug_play_spark.ext.embqc import embedding_qc

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 0),
            (3, [3.0, 4.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    rows = {r.label: r for r in embedding_qc(emb).collect()}
    assert rows[0].n_vecs == 2
    assert rows[0].zero_vecs == 0
    assert rows[0].mean_norm == 1.0
    assert rows[0].mean_cos == rows[0].min_cos == 0.707107
    assert rows[1].n_vecs == 1
    assert rows[1].mean_norm == 5.0
    assert rows[1].mean_cos == rows[1].min_cos == 1.0


def test_embedding_qc_custom_column_names(spark):
    """label_col/id_col/vec_col must thread through the whole two-pass
    plan (the ADVICE r11 hardcoded-column bug class): non-default names
    produce the identical report, keyed by the custom label column."""
    from haf_plug_play_spark.ext.embqc import embedding_qc

    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [3.0, 4.0], 1)]
    default = embedding_qc(
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
    ).collect()
    custom = embedding_qc(
        spark.createDataFrame(
            rows, "row_key long, vec array<double>, cluster int"
        ),
        label_col="cluster",
        id_col="row_key",
        vec_col="vec",
    ).collect()
    assert [r.asDict() for r in default] == [
        {("label" if k == "cluster" else k): v for k, v in r.asDict().items()}
        for r in custom
    ]


def test_report_frames_equal_standalone_forms(spark):
    """The shared-vocab report bundle (VERDICT r11 #5) is a pure plan
    refactor: on normal, degenerate (single-token docs), and
    single-source corpora, every leg of report_frames must equal its
    standalone per-function form — including the entropy leg, whose
    carry-through aggregation replaces the old doc_entropy + join-back
    and must reproduce it row-for-row."""
    from pyspark.sql import functions as F

    from haf_plug_play_spark.ext.report import (
        doc_entropy,
        doremi_weights,
        fertility_report,
        kl_drift_report,
        report_frames,
        zipf_diagnostic,
    )

    corpora = {
        "normal": [
            (1, "the cat sat on the mat", "en", "a"),
            (2, "a dog ran over the hill and far away", "en", "a"),
            (3, "reactor coolant loop pressure falling fast", "en", "b"),
            (4, "tulip compost trellis pergola loam", "de", "b"),
        ],
        "degenerate": [(1, "x", "en", "a"), (2, "y", "en", "b")],
        "single_source": [
            (1, "alpha beta gamma", "en", "only"),
            (2, "beta gamma delta", "en", "only"),
        ],
    }
    for name, rows in corpora.items():
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        frames, _sw = report_frames(docs)
        assert frames["zipf"].collect() == zipf_diagnostic(docs).collect(), name
        assert (
            frames["kl_drift"].collect() == kl_drift_report(docs).collect()
        ), name
        assert (
            frames["doremi_weights"].collect() == doremi_weights(docs).collect()
        ), name
        assert (
            frames["fertility"].collect() == fertility_report(docs).collect()
        ), name
        old_ent = (
            doc_entropy(docs.select("doc_id", "text"))
            .join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.round(F.avg("norm_entropy"), 6).alias("mean_norm_entropy"),
                F.round(F.min("norm_entropy"), 6).alias("min_norm_entropy"),
            )
            .orderBy("source")
        )
        assert frames["entropy_by_source"].collect() == old_ent.collect(), name


def test_embedding_qc_zero_norm_vectors(spark):
    """Zero-norm guard (ADVICE r11): a zero vector takes cosine 0 (not a
    NULL that silently shrinks the mean_cos numerator while n_vecs keeps
    the row), counts into zero_vecs, and drags min_cos to 0; an all-zero
    label reports mean_cos 0 instead of NULL."""
    from haf_plug_play_spark.ext.embqc import embedding_qc

    emb = spark.createDataFrame(
        [
            # label 0: one unit vector + one zero vector
            (1, [1.0, 0.0], 0),
            (2, [0.0, 0.0], 0),
            # label 1: entirely zero vectors → zero centroid
            (3, [0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    rows = {r.label: r for r in embedding_qc(emb).collect()}
    assert rows[0].n_vecs == 2 and rows[0].zero_vecs == 1
    assert rows[0].mean_norm == 0.5
    # centroid [.5, 0]: the unit vector's cosine is 1, the zero vector's
    # is defined 0 → mean (1+0)/2, min 0 — no NULL anywhere
    assert rows[0].mean_cos == 0.5 and rows[0].min_cos == 0.0
    assert rows[1].n_vecs == 1 and rows[1].zero_vecs == 1
    assert rows[1].mean_cos == 0.0 and rows[1].min_cos == 0.0


def test_epoch_plan_closed_form(spark):
    """Epoch accounting golden: identical-distribution sources get
    share-proportional allocations, epochs = budget·share/tokens, and
    the repeat flag trips exactly when the allocation exceeds the
    source's corpus."""
    from haf_plug_play_spark.ext.report import epoch_plan

    docs = spark.createDataFrame(
        # a: 6 tokens (share .75), b: 2 tokens (share .25), same dist
        [(1, "x y x y x y", "a"), (2, "x y", "b")],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in epoch_plan(docs, budget=80).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.weight, b.weight) == (0.75, 0.25)
    assert (a.allocated_tokens, b.allocated_tokens) == (60, 20)
    assert (a.epochs, b.epochs) == (10.0, 10.0)
    assert a.repeated and b.repeated
    small = {r.source: r for r in epoch_plan(docs, budget=4).collect()}
    # budget under the corpus size: nobody repeats (a: 3/6, b: 1/2 epochs)
    assert not small["a"].repeated and small["a"].epochs == 0.5
    assert not small["b"].repeated and small["b"].epochs == 0.5


def test_image_pixel_stats_exact_moments_both_formats(spark):
    """image_pixel_stats must (1) agree with hand-computed exact-integer
    moments on a FAKEIMG container, (2) decode the real PGM branch with
    fmt='pgm', and (3) compute std via Sx/Sx2 (not np.std's
    subtract-order sums) — pinned by comparing against the explicit
    moment formula, the property that makes the XM-imagestats oracle
    reproducible in SQL."""
    import math

    from haf_plug_play_spark.ext import multimodal

    w, h = 5, 3
    fake = multimodal.make_fake_image(7, w, h)
    pix = [(7 * 31 + i) % 256 for i in range(w * h)]
    pgm_pix = [[(r * 16 + c) for c in range(4)] for r in range(2)]
    pgm = multimodal.make_pgm(pgm_pix)
    media = spark.createDataFrame(
        [(7, "image", fake, None), (8, "image", pgm, None)],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.image_pixel_stats(media).collect()}

    def moments(vals):
        n, s1, s2 = len(vals), sum(vals), sum(v * v for v in vals)
        mean = s1 / n
        return mean, math.sqrt(max(s2 / n - mean * mean, 0.0))

    r7 = out[7]
    m, s = moments(pix)
    assert (r7.format, r7.width, r7.height, r7.n_pixels) == ("fakeimg", w, h, w * h)
    assert r7.px_mean == m and r7.px_std == s

    r8 = out[8]
    m, s = moments([v for row in pgm_pix for v in row])
    assert (r8.format, r8.width, r8.height, r8.n_pixels) == ("pgm", 4, 2, 8)
    assert r8.px_mean == m and r8.px_std == s


def test_pmi_collocations_planted_pair(spark):
    """PMI goldens: a pair that ALWAYS co-occurs adjacently and whose
    members never appear apart is the maximal collocation — with
    one-off filler bigrams floored out by min_count, it is the ONLY
    surviving row, with the closed-form PMI ln(N^2 / (Nb * c))."""
    import math

    from haf_plug_play_spark.ext.colloc import pmi_collocations

    docs = spark.createDataFrame(
        [(i, f"los angeles w{i}a w{i}b") for i in range(6)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs).collect()
    assert len(rows) == 1  # every filler pair is below the count floor
    r = rows[0]
    assert (r.w1, r.w2, r.n_pair) == ("los", "angeles", 6)
    n, nb, c = 24, 18, 6  # 4 tokens x 6 docs; 3 bigrams x 6; 6 pairs
    assert r.pmi == round(math.log((c / nb) / ((c / n) * (c / n))), 6)
    assert r.pmi > 0


def test_jsd_drift_closed_form_endpoints(spark):
    """JSD goldens against hand-computed values: identical per-source
    distributions give exactly 0; equal-size single-word disjoint
    sources give the closed form ½(ln(4/3) + ½ln(2/3)) + ¼ln2 for BOTH
    sources (symmetry), strictly inside (0, ln 2)."""
    import math

    from haf_plug_play_spark.ext.report import jsd_drift_report

    same = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in jsd_drift_report(same).collect()}
    assert rows["s1"].jsd_nats == 0.0 and rows["s2"].jsd_nats == 0.0

    disjoint = spark.createDataFrame(
        [(1, "a a a", "s1"), (2, "b b b", "s2")],
        "doc_id long, text string, source string",
    )
    expect = round(
        0.5 * (math.log(4.0 / 3.0) + 0.5 * math.log(2.0 / 3.0))
        + 0.25 * math.log(2.0),
        6,
    )
    drows = {r.source: r for r in jsd_drift_report(disjoint).collect()}
    for r in drows.values():
        assert r.jsd_nats == expect
        assert 0.0 < r.jsd_nats < math.log(2.0)
        assert r.n_tokens == 3 and r.n_types == 1
