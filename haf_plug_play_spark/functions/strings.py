"""String functions mirroring the reference's Python-side helpers.

X7 slugify (/root/reference/haf_plug_play/server/plug_endpoints/polls.py:54-74):
'&' → ' and ', collapse whitespace, accumulate whole words while the slug
stays ≤ 32 chars, lowercase, strip everything outside [a-z-], hyphen-join.
The reference appends a uniqueness suffix ``-N`` by probing the DB; that
loop stays app-side (it needs the existence probe F8) — here as
``unique_slug`` over a taken-set DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def slugify(text: Column, max_len: int = 32) -> Column:
    """Pure-expression slugify: whole-word accumulation via an aggregate
    fold over the split words (no UDF, stays in the JVM).

    Mirrors the reference loop exactly: words accumulate while the running
    sum of WORD lengths (hyphens excluded) stays ≤ max_len, and the first
    overflowing word stops accumulation for good (break, not skip). The
    only intent-fix: full whitespace collapse instead of the reference's
    single ``replace('  ', ' ')`` pass (SURVEY §7.4 treatment).
    """
    cleaned = F.regexp_replace(
        F.regexp_replace(text, "&", " and "), r"\s+", " "
    )
    words = F.split(F.trim(cleaned), " ")
    # fold state: (slug so far, stopped) — stop is sticky to mirror `break`
    word_len = lambda acc: F.length(F.regexp_replace(acc["s"], "-", ""))
    folded = F.aggregate(
        words,
        F.struct(F.lit("").alias("s"), F.lit(False).alias("stop")),
        lambda acc, w: F.when(acc["stop"], acc)
        .when(
            word_len(acc) + F.length(w) <= max_len,
            F.struct(
                F.when(F.length(acc["s"]) == 0, w)
                .otherwise(F.concat(acc["s"], F.lit("-"), w))
                .alias("s"),
                F.lit(False).alias("stop"),
            ),
        )
        .otherwise(F.struct(acc["s"].alias("s"), F.lit(True).alias("stop"))),
        lambda acc: acc["s"],
    )
    return F.regexp_replace(F.lower(folded), "[^a-z-]", "")


def unique_slug(
    candidates: DataFrame,
    slug_col: str,
    taken: DataFrame,
    taken_col: str,
    order_col: str,
) -> DataFrame:
    """Uniqueness pass: left-anti against taken slugs; colliding candidates
    get ``-N`` suffixes by collision rank (the set-based form of the
    reference's probe-and-increment loop).

    ``order_col`` is REQUIRED and must be a unique key: it supplies the
    deterministic collision order (the reference probes in op-arrival
    order, so callers pass their op sequence column). Suffixes must not
    depend on partitioning — SURVEY §4.3.2 bans nondeterministic ids — and
    a non-unique order column would silently reshuffle suffixes between
    runs, so there is deliberately no default.
    """
    from pyspark.sql import Window as W

    assert order_col in candidates.columns, f"order_col {order_col!r} not in candidates"
    t = taken.select(F.col(taken_col).alias("_slug")).distinct()
    c = candidates.withColumn("_slug", F.col(slug_col))
    free = c.join(t, "_slug", "left_anti").withColumn("slug_final", F.col("_slug"))
    clash = c.join(t, "_slug", "left_semi")
    w = W.partitionBy("_slug").orderBy(F.col(order_col))
    suffixed = clash.withColumn(
        "slug_final", F.concat(F.col("_slug"), F.lit("-"), F.row_number().over(w))
    )
    return free.unionByName(suffixed).drop("_slug")
