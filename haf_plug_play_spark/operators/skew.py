"""Skew-safe join: explicit key salting.

AQE's skew-join handling splits oversized SORT-MERGE partitions at runtime,
but it only fires on the shuffle sizes it can observe and never helps a
broadcast-ineligible hot key inside a single task's build side. Explicit
salting is the deterministic, planner-independent version every large
pipeline keeps in its toolbox: split each join key into ``n_salts``
sub-keys on the big side and replicate the other side once per salt, so a
key that owns 30% of a 100 TB table spreads across ``n_salts`` tasks
instead of melting one executor.

The result set provably equals the unsalted join — oracle-gated as
QJ8-salted against a plain SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    row_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted into
    ``n_salts`` sub-keys and the small side replicated once per salt.

    ``row_key`` names a unique column on the big side: the salt must vary
    WITHIN a join key (that is the whole point) yet stay deterministic
    across retries and repartitions, so it is a hash of the row's own
    identity, never ``rand()`` (a retried task would re-salt rows into
    different sub-keys mid-shuffle). Replication multiplies the small side
    by ``n_salts`` — use where the small side is modest but above the
    broadcast threshold, or where a residual hot key defeats AQE.

    ``how`` supports the join types where replication is sound for the
    big side ('inner', 'left', 'left_semi'): every big row carries exactly
    one salt, so it meets each matching small row exactly once. Small-side
    outer variants would need a post-join dedup and are rejected.

    The merge hint pins a shuffled join: salting only does anything when
    the join shuffles on the key, and without the hint a small-enough
    small side silently becomes a broadcast join where the salt is pure
    overhead (a broadcast join is already skew-immune — use it directly
    instead of this operator when the small side fits).
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salt = F.pmod(F.xxhash64(F.col(row_key)), F.lit(n_salts))
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    out = b.hint("merge").join(s, on + [_SALT], how)
    return out.drop(_SALT)
