"""Embedding-quality audit over a labeled vector table — the QC report a
training-data pipeline runs BEFORE trusting its embedding column for
semantic dedup, ANN retrieval, or clustering-based curation: per label,
the vector count, the mean L2 norm (a broken encoder shows as a norm-scale
shift or zero vectors), and the intra-class cosine coherence against the
label centroid (mean and minimum — a low minimum flags mislabeled or
corrupted rows; the standard centroid-coherence screen, e.g. the SemDeDup
family's cluster-quality check, public method).

Scale shape: two linear passes over the vectors, both ending in keyed
hash aggregations — (1) per-(label, position) component sums build the
centroids (output ≤ |labels| × dim rows, broadcast from then on), and
(2) per-vector dot products against the broadcast centroid components
re-aggregate to the ≤|labels|-row report. The positional explode is a
dim-× row multiplier inside one stage (map-side combinable, no shuffle
of the exploded stream beyond its keyed agg), never a pairwise product —
the same posture as the classifier featurizer's unigram explode. No
driver-side collect: unlike XS-kmeans (which legitimately collects its
refined centroids), the one-shot centroid here stays a DataFrame and
joins back broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from haf_plug_play_spark.ext.similarity import norm


def embedding_qc(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, n_vecs, zero_vecs, mean_norm, mean_cos, min_cos) per
    label — cosine is against the label's mean vector (centroid);
    zero-norm vectors (and all-zero centroids) take cosine 0 instead of
    NULL so they depress mean_cos/min_cos loudly rather than silently
    shrinking the numerator, and are counted per label in zero_vecs.
    Oracle-parity: norms
    and dots are sequential array folds on the engine side vs DuckDB
    list_dot_product (~1 ulp); centroid components are exact-count
    averages; per-vector norm and cosine quantize to BIGINT micro-units
    (×1e6) before the per-label mean — the integer sum is exact and
    order-independent, so the shuffle cannot land the average on a
    rounding boundary (a plain double mean DID, at sf0.01 label 4)."""
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        v.alias("_v"),
        norm(v).alias("_vnorm"),
    )
    comp = base.select(
        "_lbl", F.posexplode("_v").alias("_pos", "_val")
    ).groupBy("_lbl", "_pos").agg(F.avg("_val").alias("_cval"))
    cnorm = comp.groupBy("_lbl").agg(
        F.sqrt(F.sum(F.col("_cval") * F.col("_cval"))).alias("_cnorm")
    )
    dots = (
        base.select("_id", "_lbl", "_vnorm", F.posexplode("_v").alias("_pos", "_val"))
        .join(F.broadcast(comp), ["_lbl", "_pos"])
        .groupBy("_id", "_lbl", "_vnorm")
        .agg(F.sum(F.col("_val") * F.col("_cval")).alias("_dot"))
    )
    # per-vector values quantize to integer MICRO-units before the
    # per-label mean: a double sum reassociates across the shuffle and
    # lands the average ON a 6-dp rounding boundary (observed at sf0.01,
    # label 4), but a BIGINT micro-sum is exact and order-independent,
    # so both engines divide the identical integer
    # zero-norm guard: a zero vector (or an all-zero label centroid) has
    # no defined cosine — rather than a NULL that silently drops out of
    # the mean while the row still counts in n_vecs, define cosine as 0
    # (dragging mean_cos/min_cos down loudly) and surface the broken rows
    # in an explicit zero_vecs count
    denom = F.col("_vnorm") * F.col("_cnorm")
    cos = dots.join(F.broadcast(cnorm), "_lbl").select(
        "_lbl",
        (F.col("_vnorm") == 0).cast("long").alias("_is_zero"),
        F.round(F.col("_vnorm") * 1e6).cast("long").alias("_vnorm_u"),
        F.when(denom == 0, F.lit(0))
        .otherwise(F.round(F.col("_dot") / denom * 1e6))
        .cast("long")
        .alias("_cos_u"),
    )
    return (
        cos.groupBy(F.col("_lbl").alias(label_col))
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("_is_zero").cast("long").alias("zero_vecs"),
            F.round(F.sum("_vnorm_u") / F.count("*") / 1e6, 6).alias("mean_norm"),
            F.round(F.sum("_cos_u") / F.count("*") / 1e6, 6).alias("mean_cos"),
            F.round(F.min("_cos_u") / 1e6, 6).alias("min_cos"),
        )
        .orderBy(label_col)
    )
