"""Portable deterministic hashing primitives shared by the dedup/similarity
operators.

The engine and the DuckDB oracle must agree bit-for-bit, so every hash is
derived from md5 (identical in both) rather than engine-native hash functions:
``md5_int(s)`` = first 15 hex chars of md5(s) as a positive int64 (60 bits).
Universal hashes are ``(a * (x % P) + b) % P`` with P = 2^31 - 1 — all
intermediates stay under 2^62, no int64 overflow in either engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1


def md5_int(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    DuckDB equivalent: ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash_params(n: int, seed: int = 1) -> list[tuple[int, int]]:
    """n deterministic (a, b) universal-hash coefficient pairs, a >= 1."""
    rng = random.Random(seed)
    return [(rng.randint(1, MERSENNE_P - 1), rng.randint(0, MERSENNE_P - 1)) for _ in range(n)]


def universal_hash(x: Column, a: int, b: int) -> Column:
    return (F.lit(a) * (x % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


def universal_hash_sql(x_expr: str, a: int, b: int) -> str:
    return f"(({a} * ({x_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def unigram_bigram_features(text: Column) -> Column:
    """Array of hashed-feature input strings — non-empty lowercased words
    plus space-joined adjacent bigrams. THE portable feature scheme,
    defined once and shared by DSIR (ext/sampling.py:dsir_weights) and
    the quality classifier (ext/classify.py), so the two scorers (and
    the SQL oracles generated against this spelling) can never silently
    diverge. greatest(n−1, 0): an empty word array must yield an empty
    bigram slice, not a negative-length runtime error."""
    words = F.filter(F.split(F.lower(text), " "), lambda w: w != "")
    n = F.size(words)
    blen = F.greatest(n - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(words, 1, blen),
        F.slice(words, 2, blen),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(words, bigrams)
