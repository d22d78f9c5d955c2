"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
Pandas-UDF signatures over mapInPandas, partition-sized batch flow. The
codec boundary is split honestly: PGM (P5, the binary netpbm grayscale
format) decodes FOR REAL with a pure-NumPy parser (no image library
needed), as does the engine's deterministic ``FAKEIMG``/``FAKEAUD`` test
container; compressed IMAGE formats (PNG/JPEG/…) decode through Pillow
when it is importable (import-gated — this container ships no codec
libraries, so here the gate stays closed and the boundary raises
NotImplementedError loudly at exactly the line where the PIL call slots
in); audio/video (WAV/MP4…) remain a declared loud stub either way.

At 100 TB: binary payloads ride in their own parquet column (never
projected unless asked for — column pruning keeps metadata-only queries
cheap), decode/feature steps are mapInPandas (per-partition, no shuffle),
and outputs are fixed-width arrays ready for the similarity operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FAKE_MAGIC = {b"FAKEIMG\x00": "image", b"FAKEAUD\x00": "audio"}

try:  # import-gated codec boundary: Pillow is optional, never required
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised in codec-less containers
    _PILImage = None


def _pil_open(buf: bytes):
    """Pillow Image for ``buf`` when the gate is open, else None. Executors
    and driver gate independently (the import runs wherever the worker
    deserializes this module), so a mixed cluster fails loudly rather than
    silently diverging."""
    if _PILImage is None:
        return None
    import io

    try:
        img = _PILImage.open(io.BytesIO(buf))
        img.load()
        return img
    except Exception:
        return None  # not an image Pillow recognizes - fall through to raise


def _parse_pgm(buf: bytes):
    """Pure-NumPy decoder for binary PGM (P5) — real public image format,
    no codec library required. Returns (width, height, pixels[h, w]).
    Supports maxval <= 255 (8-bit); comments (#) in the header are valid
    netpbm and handled."""
    import numpy as np

    if buf[:2] != b"P5":
        raise ValueError("not a P5 PGM")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with optional #-comments; a single whitespace byte ends the header
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PGM not supported")
    px = np.frombuffer(buf[pos : pos + w * h], dtype=np.uint8).reshape(h, w)
    return w, h, px


def make_pgm(pixels) -> bytes:
    """Encode a 2-D uint8 array as binary PGM (P5)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def make_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image container: magic + dims + seeded pixel bytes."""
    header = b"FAKEIMG\x00" + struct.pack("<II", width, height)
    body = bytes((media_id * 31 + i) % 256 for i in range(width * height))
    return header + body


def attach_fake_media(documents: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Derive a deterministic media table from documents (test harness):
    content = a decodable fake-image container seeded by doc_id
    (``make_fake_image``), so the output feeds straight into
    ``decode_media``/``byte_histogram``."""
    w, h = width, height

    def _attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized container build (guide §4.2): the whole batch's pixel
        # streams come from one numpy broadcast — (id·31 + i) mod 256 ==
        # ((id mod 256)·31 + i) mod 256, so the reduced form never
        # overflows int64 regardless of media_id. Byte-identical to
        # make_fake_image (property-tested).
        import numpy as np

        n = w * h
        header = b"FAKEIMG\x00" + struct.pack("<II", w, h)
        offsets = np.arange(n, dtype=np.int64)[None, :]
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            body = ((ids % 256)[:, None] * 31 + offsets) % 256
            body = body.astype(np.uint8)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "content": [header + row.tobytes() for row in body],
                }
            )

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(documents.sparkSession)
    return documents.select("doc_id").mapInPandas(
        _attach, "media_id long, kind string, content binary"
    )


DECODED_SCHEMA = "media_id long, format string, width int, height int, n_pixels long"


def decode_media(media: DataFrame) -> DataFrame:
    """Decode the binary column into typed image metadata via mapInPandas.

    Real decode (PNG/JPEG/WAV…) is NotImplemented in this container — the
    stub handles the engine's fake container and fails loudly otherwise.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                magic = buf[:8]
                if magic == b"FAKEIMG\x00":
                    w, h = struct.unpack("<II", buf[8:16])
                    out.append((mid, "fakeimg", w, h, len(buf) - 16))
                elif magic in _FAKE_MAGIC:
                    out.append((mid, "fakeaud", None, None, len(buf) - 16))
                elif buf[:2] == b"P5":
                    w, h, px = _parse_pgm(buf)
                    out.append((mid, "pgm", w, h, int(px.size)))
                else:
                    img = _pil_open(buf)
                    if img is not None:
                        out.append((
                            mid, (img.format or "unknown").lower(),
                            img.width, img.height, img.width * img.height,
                        ))
                    else:
                        # audio/video or a codec-less container: ffmpeg /
                        # Pillow would slot in here.
                        raise NotImplementedError(
                            f"media decode for this format not available "
                            f"(media_id={mid}, magic={magic!r}; Pillow "
                            f"{'found no image' if _PILImage else 'not installed'})"
                        )
            yield pd.DataFrame(
                out, columns=["media_id", "format", "width", "height", "n_pixels"]
            )

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_decode, DECODED_SCHEMA)


HIST_SCHEMA = "media_id long, histogram array<long>"


def byte_histogram(media: DataFrame) -> DataFrame:
    """256-bin byte histogram of the binary payload — a real, deterministic
    feature extractor (stands in for pixel/audio features), Arrow-batched."""

    def _hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = [
                (mid, np.bincount(np.frombuffer(bytes(c), dtype=np.uint8), minlength=256).tolist())
                for mid, c in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "histogram"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_hist, HIST_SCHEMA)


def _decode_image_fmt(mid, buf: bytes):
    """(pixel grid, format label) from any format the engine can decode
    without codec libraries: the FAKEIMG test container or real binary
    PGM; Pillow formats when the gate is open (labelled exactly as
    ``decode_media`` labels them, so the two format columns can never
    disagree on the same row). Compressed formats without Pillow raise
    where the PIL call would go."""
    import numpy as np

    if buf[:8] == b"FAKEIMG\x00":
        w, h = struct.unpack("<II", buf[8:16])
        px = np.frombuffer(buf[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)
        return px, "fakeimg"
    if buf[:2] == b"P5":
        _, _, px = _parse_pgm(buf)
        return px, "pgm"
    img = _pil_open(buf)
    if img is not None:
        # grayscale grid keeps every downstream op (resize/features)
        # format-agnostic; color-preserving paths add a channel axis
        fmt = (img.format or "unknown").lower()
        return np.asarray(img.convert("L"), dtype=np.uint8), fmt
    raise NotImplementedError(
        f"image decode for this format not available "
        f"(media_id={mid}, magic={buf[:8]!r}; Pillow "
        f"{'found no image' if _PILImage else 'not installed'})"
    )


def _decode_image(mid, buf: bytes):
    """Pixel grid only — the historical signature used by resize/
    features/phash, now a thin wrapper over ``_decode_image_fmt``."""
    return _decode_image_fmt(mid, buf)[0]


RESIZED_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, Arrow-batched per partition (no shuffle).
    The resample math is real (index-mapped NumPy gather on the pixel
    grid) and runs on real PGM inputs as well as the fake container; a
    full impl adds PIL for compressed formats."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _decode_image(mid, bytes(content))
                h, w = px.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = px[ys][:, xs]
                # output container follows the input format
                if bytes(content)[:2] == b"P5":
                    body = make_pgm(out)
                else:
                    body = b"FAKEIMG\x00" + struct.pack("<II", out_w, out_h) + out.tobytes()
                rows.append((mid, out_w, out_h, body))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_resize, RESIZED_SCHEMA)


FEATURES_SCHEMA = "media_id long, px_mean double, px_std double, embedding array<double>"


def image_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Feature extraction: global pixel stats + a grid×grid mean-pooled,
    unit-normalized embedding (array<double>) — the output column feeds the
    similarity/dedup operators directly (ext/similarity.py), so media
    near-dup detection composes from these two operators."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = _decode_image(mid, bytes(content)).astype(np.float64)
                h, w = px.shape
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                pooled = np.add.reduceat(np.add.reduceat(px, ys, axis=0), xs, axis=1)
                emb = pooled.ravel()
                n = np.linalg.norm(emb)
                if n > 0:
                    emb = emb / n
                rows.append((mid, float(px.mean()), float(px.std()), emb.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "px_mean", "px_std", "embedding"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_features, FEATURES_SCHEMA)


PIXEL_STATS_SCHEMA = (
    "media_id long, format string, width int, height int, n_pixels long, "
    "px_mean double, px_std double"
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Decode + per-image pixel statistics in one Arrow-batched
    mapInPandas pass (no shuffle): format/dims from the container, mean
    and std from EXACT INTEGER moments — Σx and Σx² are exact int64
    sums of uint8 pixels, so ``mean = Σx/n`` and
    ``std = sqrt(Σx²/n − mean²)`` are the same two correctly-rounded
    double operations in any engine. That (not ``np.std``, whose
    subtract-then-sum order reassociates) is what lets a SQL oracle
    reproduce the numbers bit-for-bit: the oracle regenerates the fake
    container's pixel stream arithmetically and runs the identical
    moment expressions (the registry's XM-imagestats)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            mids = pdf["media_id"]
            contents = pdf["content"]
            # Vectorized fast path (guide §4.2) when the whole batch is
            # FAKEIMG containers of one geometry (the attach_fake_media
            # stream): stack the payloads as views and take both integer
            # moments with two matrix reductions. Exact int64 sums — the
            # same two correctly-rounded double ops as the scalar path,
            # so results are bit-identical (s2 ≤ n·255² never overflows).
            first = bytes(contents.iloc[0])[:16] if len(contents) else b""
            if first[:8] == b"FAKEIMG\x00" and all(
                bytes(c)[:16] == first for c in contents
            ):
                w, h = struct.unpack("<II", first[8:16])
                n = w * h
                mat = np.stack(
                    [
                        np.frombuffer(bytes(c), np.uint8, count=n, offset=16)
                        for c in contents
                    ]
                ).astype(np.int64)
                s1 = mat.sum(axis=1)
                s2 = (mat * mat).sum(axis=1)
                mean = s1 / n
                std = np.sqrt(np.maximum(s2 / n - mean * mean, 0.0))
                yield pd.DataFrame(
                    {
                        "media_id": mids,
                        "format": "fakeimg",
                        "width": np.int32(w),
                        "height": np.int32(h),
                        "n_pixels": np.int64(n),
                        "px_mean": mean,
                        "px_std": std,
                    }
                )
                continue
            rows = []
            for mid, content in zip(mids, contents):
                px, fmt = _decode_image_fmt(mid, bytes(content))
                h, w = px.shape
                n = int(px.size)
                px64 = px.astype(np.int64)
                s1 = int(px64.sum())
                s2 = int((px64 * px64).sum())
                mean = s1 / n
                var = s2 / n - mean * mean
                rows.append(
                    (mid, fmt, w, h, n, mean, math.sqrt(max(var, 0.0)))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height",
                    "n_pixels", "px_mean", "px_std",
                ],
            )

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(
        _stats, PIXEL_STATS_SCHEMA
    )


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling: split the payload into n_frames equal
    byte windows (a real impl samples decoded video frames)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                step = max(1, len(buf) // n_frames)
                for i in range(n_frames):
                    chunk = buf[i * step : (i + 1) * step]
                    if chunk:
                        rows.append((mid, i, chunk))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_frames, FRAME_SCHEMA)


def make_fake_audio(media_id: int, n_samples: int = 1600, rate: int = 16000) -> bytes:
    """Deterministic fake audio clip: FAKEAUD magic + (rate, n_samples)
    header + int16-LE PCM of a seeded sine with a DC-free ramp — the
    audio twin of ``make_fake_image`` (real WAV/MP3 decode is the same
    declared codec boundary as PNG/JPEG)."""
    import math

    header = b"FAKEAUD\x00" + struct.pack("<II", rate, n_samples)
    amp = 8000 + (media_id % 7) * 1000
    freq = 110.0 * (1 + media_id % 5)
    samples = [
        int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n_samples)
    ]
    return header + struct.pack(f"<{n_samples}h", *samples)


def attach_fake_audio(documents: DataFrame, n_samples: int = 1600, rate: int = 16000) -> DataFrame:
    """Deterministic audio media table derived from documents (test
    harness), feeding ``audio_stats``/``byte_histogram`` directly."""

    def _attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "content": [
                        make_fake_audio(int(d), n_samples, rate)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(documents.sparkSession)
    return documents.select("doc_id").mapInPandas(
        _attach, "media_id long, kind string, content binary"
    )


AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_s double, "
    "rms double, peak int, zero_cross_rate double"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Waveform statistics per clip — RMS level, peak amplitude, zero-
    crossing rate, duration — the audio quality-gate features (silence /
    clipping / noise filters key off exactly these). NumPy-vectorized
    under Arrow batches; one mapper pass, no shuffle. Decodes the
    engine's FAKEAUD PCM container and fails loudly on anything else
    (the declared codec boundary — soundfile/ffmpeg would slot in)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                if buf[:8] != b"FAKEAUD\x00":
                    raise NotImplementedError(
                        f"audio decode for this container not available "
                        f"(media_id={mid}, magic={buf[:8]!r})"
                    )
                rate, n = struct.unpack("<II", buf[8:16])
                x = np.frombuffer(buf[16 : 16 + 2 * n], dtype="<i2").astype(np.float64)
                zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                out.append(
                    (
                        mid,
                        rate,
                        n,
                        round(n / rate, 6),
                        round(float(np.sqrt(np.mean(x * x))), 6),
                        int(np.abs(x).max()),
                        round(zc / max(n - 1, 1), 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "peak", "zero_cross_rate",
                ],
            )

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_stats, AUDIO_SCHEMA)


PHASH_SCHEMA = "media_id long, phash long"

_DCT_CACHE: dict = {}


def _dct_mat(n: int):
    """Orthonormal DCT-II matrix (cached per size)."""
    import numpy as np

    if n not in _DCT_CACHE:
        i = np.arange(n)
        d = np.sqrt(2.0 / n) * np.cos(np.pi * (i[None, :] + 0.5) * i[:, None] / n)
        d[0] /= np.sqrt(2.0)
        _DCT_CACHE[n] = d
    return _DCT_CACHE[n]


def _phash_bits(mid, buf: bytes) -> int:
    """63-bit DCT perceptual hash of one image payload (shared by the
    per-image and per-video-frame paths).

    The 8x8 low-frequency block is computed with FIXED-ORDER summation
    (non-optimized einsum — plain C loops, no BLAS dispatch): a BLAS
    matmul reassociates the inner sums differently per implementation
    (OpenBLAS/MKL/generic), and coefficients sitting within fp-noise of
    the median then flip bits between machines — the same image hashed
    on two boxes must agree for cross-corpus dedup to be meaningful.
    Slicing the DCT matrices to their first 8 rows BEFORE the product
    also drops the per-image cost from O(n^3) (full n x n DCT, 63/4096
    of it used) to O(8 n^2)."""
    import numpy as np

    px = _decode_image(mid, buf).astype(np.float64)
    h, w = px.shape
    if h < 8 or w < 8:
        raise ValueError(f"phash needs >=8x8 pixels, got {h}x{w} (media_id={mid})")
    dh8 = _dct_mat(h)[:8]
    dw8 = _dct_mat(w)[:8]
    t = np.einsum("ki,ij->kj", dh8, px, optimize=False)
    c = np.einsum("kj,lj->kl", t, dw8, optimize=False).ravel()[1:]
    med = np.median(c)
    bits = 0
    for j, v in enumerate(c):
        if v > med:
            bits |= 1 << j
    return bits


def phash_images(media: DataFrame) -> DataFrame:
    """DCT perceptual hash per image (pHash, public method): 2-D DCT-II of
    the grayscale pixel grid (orthonormal DCT as two matrix multiplies —
    pure NumPy, no scipy), keep the top-left 8×8 low-frequency block, and
    set bit j iff coefficient j clears the block's median (DC coefficient
    excluded from both the bits and the median) — a 63-bit fingerprint
    that survives resizing, re-encoding, and small edits, which byte-level
    dedup cannot.

    Scale shape: one Arrow-batched ``mapInPandas`` pass, no shuffle; the
    output feeds ``ext/dedup.py:hamming_pairs`` (the simhash pigeonhole
    banding, 63 bits = 7 chunks × 9 bits at max_hamming=6) for image
    near-dup pairs without an all-pairs cross."""

    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rows.append((mid, _phash_bits(mid, bytes(content))))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_ph, PHASH_SCHEMA)


def phash_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs: pHash fingerprints → pigeonhole-banded
    hamming join (ext/dedup.py:hamming_pairs). 63 bits / 7 chunks at the
    default max_hamming=6 — every pair within distance 6 is guaranteed a
    shared chunk, candidates stay a chunk-keyed equi-join."""
    from haf_plug_play_spark.ext.dedup import hamming_pairs

    return hamming_pairs(
        phash_images(media), "media_id", "phash", bits=63, max_hamming=max_hamming
    )


def _decode_audio(mid, buf: bytes):
    """(rate, float64 waveform) from the FAKEAUD PCM container; loud fail
    elsewhere (the declared codec boundary, same as images)."""
    import numpy as np

    if buf[:8] != b"FAKEAUD\x00":
        raise NotImplementedError(
            f"audio decode for this container not available "
            f"(media_id={mid}, magic={buf[:8]!r})"
        )
    rate, n = struct.unpack("<II", buf[8:16])
    if len(buf) < 16 + 2 * n:
        raise ValueError(
            f"truncated audio payload: header declares {n} samples but "
            f"only {(len(buf) - 16) // 2} present (media_id={mid})"
        )
    return rate, np.frombuffer(buf[16 : 16 + 2 * n], dtype="<i2").astype(np.float64)


AUDIO_FP_SCHEMA = "media_id long, afp long"


def audio_fingerprint(
    media: DataFrame, n_frames: int = 9, n_bands: int = 7
) -> DataFrame:
    """Spectral audio fingerprint (the chromaprint/Shazam family of
    public methods, reduced to its robust core): split the waveform into
    ``n_frames`` windows, take ``n_bands`` log-spaced FFT-magnitude band
    energies per window, and set a bit iff the band's energy clears the
    window's median — 9×7 = 63 bits, scale-invariant (gain cancels in
    the median comparison) and stable under small additive noise, so
    re-encoded/re-leveled copies of a clip fingerprint near-identically
    while different content diverges.

    One Arrow-batched mapInPandas pass, no shuffle; pairs come from the
    shared pigeonhole banding (``audio_pairs``)."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, x = _decode_audio(mid, bytes(content))
                # every window needs enough samples for n_bands rfft bins
                # — fail loudly like the other decoder boundaries instead
                # of an opaque geomspace/rfft error deep in an executor
                if len(x) < n_frames * 2 * (n_bands + 1):
                    raise ValueError(
                        f"audio clip too short to fingerprint: {len(x)} "
                        f"samples < {n_frames * 2 * (n_bands + 1)} needed "
                        f"for {n_frames} frames x {n_bands} bands "
                        f"(media_id={mid})"
                    )
                step = max(1, len(x) // n_frames)
                bits = 0
                for f in range(n_frames):
                    win = x[f * step : (f + 1) * step]
                    mag = np.abs(np.fft.rfft(win))[1:]  # drop DC
                    edges = np.unique(
                        np.geomspace(1, len(mag), n_bands + 1).astype(int)
                    )
                    if len(edges) < n_bands + 1:
                        # geomspace integer edges collapse when len(mag) is
                        # only slightly above n_bands (e.g. 8 bins, 7 bands
                        # → 6 edges), which would leave the top band bits
                        # permanently zero right at the length boundary the
                        # loud-fail guard admits. Linear spacing guarantees
                        # n_bands+1 distinct edges whenever
                        # len(mag) >= n_bands + 1 — which the minimum-length
                        # guard above ensures (step >= 2*(n_bands+1) ⇒
                        # len(mag) = step//2 >= n_bands+1).
                        edges = np.unique(
                            np.linspace(1, len(mag), n_bands + 1).astype(int)
                        )
                    e = np.add.reduceat(mag, edges[:-1])[:n_bands]
                    med = np.median(e)
                    for b, v in enumerate(e):
                        if v > med:
                            bits |= 1 << (f * n_bands + b)
                rows.append((mid, bits))
            yield pd.DataFrame(rows, columns=["media_id", "afp"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_fp, AUDIO_FP_SCHEMA)


def audio_pairs(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Audio near-duplicate pairs over the spectral fingerprint — the
    same pigeonhole hamming join as text simhash and image pHash
    (ext/dedup.py:hamming_pairs; 63 bits = 9 chunks x 7 at the default)."""
    from haf_plug_play_spark.ext.dedup import hamming_pairs

    return hamming_pairs(
        audio_fingerprint(media), "media_id", "afp", bits=63, max_hamming=max_hamming
    )


# ------------------------------------------------------------- video

def make_fake_video(media_id: int, n_frames: int = 6, width: int = 16, height: int = 16) -> bytes:
    """Deterministic fake video: FAKEVID magic + frame count + length-
    prefixed FAKEIMG frames (frame j of video v = fake image v*1000+j) —
    the video twin of the image/audio containers; real MP4 demux is the
    same declared codec boundary."""
    frames = [
        make_fake_image(media_id * 1000 + j, width, height) for j in range(n_frames)
    ]
    out = [b"FAKEVID\x00", struct.pack("<I", n_frames)]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


VIDEO_FP_SCHEMA = "media_id long, frame_idx int, phash long"


def video_frame_phashes(media: DataFrame) -> DataFrame:
    """Per-frame perceptual hashes of a video: demux the FAKEVID
    container (loud codec boundary elsewhere) and pHash every frame —
    the fingerprint table video dedup runs on. One mapper pass; row
    expansion is the frame count."""

    def _vf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                if buf[:8] != b"FAKEVID\x00":
                    raise NotImplementedError(
                        f"video demux for this container not available "
                        f"(media_id={mid}, magic={buf[:8]!r})"
                    )
                (n,) = struct.unpack("<I", buf[8:12])
                off = 12
                for j in range(n):
                    (ln,) = struct.unpack("<I", buf[off : off + 4])
                    off += 4
                    rows.append((mid, j, _phash_bits(mid, buf[off : off + ln])))
                    off += ln
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "phash"])

    from haf_plug_play_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "content").mapInPandas(_vf, VIDEO_FP_SCHEMA)


def video_near_dup_pairs(
    media: DataFrame, min_shared: int = 3, max_df: int = 100
) -> DataFrame:
    """Video near-duplicate pairs by frame-fingerprint overlap: videos
    sharing ≥ ``min_shared`` distinct frame pHashes pair up — the
    re-upload/clip-detection shape (a trimmed or re-containered copy
    keeps most frame hashes). Output: (id_a, id_b, shared_frames).

    Scale contract (the same capped-index + full-set-verify shape as the
    n-gram Jaccard path, ext/dedup.py): CANDIDATES come from an inverted
    index on the frame hash with hashes appearing in more than ``max_df``
    videos dropped — black/flat frames and shared intros are exactly where
    pHash is least discriminative, and an uncapped self-join on one such
    hash is O(n²) candidate rows. The ``shared_frames`` COUNT is then
    exact over the FULL per-video hash sets (hot hashes included), joined
    per candidate pair — so capping bounds the pair space without
    distorting surviving scores. Documented recall trade: a pair whose
    overlap consists ONLY of >max_df hashes is missed (it shares nothing
    discriminative)."""
    fp = video_frame_phashes(media).select(
        F.col("media_id"), F.col("phash")
    ).distinct()
    hot = (
        fp.groupBy("phash")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("phash")
    )
    idx = fp.join(hot, "phash", "left_anti")
    ia, ib = idx.alias("ia"), idx.alias("ib")
    cand = (
        ia.join(
            ib,
            (F.col("ia.phash") == F.col("ib.phash"))
            & (F.col("ia.media_id") < F.col("ib.media_id")),
        )
        .select(
            F.col("ia.media_id").alias("id_a"), F.col("ib.media_id").alias("id_b")
        )
        .distinct()
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        cand.join(a, F.col("id_a") == F.col("a.media_id"))
        .join(
            b,
            (F.col("id_b") == F.col("b.media_id"))
            & (F.col("a.phash") == F.col("b.phash")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )
