"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: a single scan with a
JVM-side zip_with/aggregate dot product (no Python), then
TakeOrderedAndProject — at 100 TB this is one pass, no shuffle.

The scale path is hyperplane-LSH bucketing: vectors land in 2^n_planes
buckets keyed by dot-product sign patterns; queries probe their bucket (+
hamming-1 neighbors), turning top-k into a bucket-local problem. Verified
against the brute-force baseline in tests (recall), since ANN is
approximate by construction (FIXTURES.md excludes float top-k from the
DuckDB oracle; a NumPy golden covers it instead).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_bucket(vec: Column, n_planes: int = 8, seed: int = 5, dim: int = 64) -> Column:
    """LSH bucket id: bit i = sign(vec · plane_i). Deterministic planes from
    the seed, evaluated JVM-side as literal arrays."""
    bucket = F.lit(0)
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(x * x for x in query_vec))
    sim = dot(F.col(vec_col).cast("array<double>"), q) / (norm(F.col(vec_col).cast("array<double>")) * F.lit(qn))
    return (
        emb.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ann_lsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, seed: int = 5,
) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket and its
    hamming-1 neighbors, then exact-rank the candidates."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes, seed)
    qbucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qbucket |= 1 << i
    probe = [qbucket] + [qbucket ^ (1 << i) for i in range(n_planes)]
    v = emb.withColumn(
        "_b", hyperplane_bucket(F.col(vec_col).cast("array<double>"), n_planes, seed, dim)
    ).filter(F.col("_b").isin(probe))
    return cosine_topk(v, query_vec, k, id_col, vec_col)
