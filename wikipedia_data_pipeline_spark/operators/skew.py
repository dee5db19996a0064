"""Skew-resistant join: salting recipe for hot keys.

AQE's skew-join split handles most skew at runtime, but it only splits
the SHUFFLE side of a sort-merge join — a hot key that is too large for
one task on *both* sides, or a skewed join that must stay shuffled
(right side too big to broadcast), needs salting: replicate the
small(er) side S ways and scatter the big side's hot keys across the
S sub-partitions. Result is identical to the plain join; the hot key's
work is spread over S tasks instead of one straggler.

Cost model: the salted join shuffles big_side once (unchanged) and
S copies of small_side — choose S ≈ (hot-key rows / rows-per-task);
16-64 covers most real skew. Salting is wasted work when no key is hot,
so it's an explicit operator here, not a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``big_key == small_key`` with the
    big side scattered over ``num_salts`` sub-keys and the small side
    replicated to match. Output columns = both inputs' columns (salt
    columns are internal).

    The big side's salt is derived from a hash of the whole row's
    partition id surrogate — ``rand`` would also be correct (any
    assignment is), but a hash keeps the operator deterministic."""
    big_salted = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col(big_key), F.monotonically_increasing_id()),
            F.lit(num_salts),
        ).cast("int"),
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_salted.join(
        small_replicated,
        (F.col(big_key) == F.col(small_key))
        & (big_salted["_salt"] == small_replicated["_salt"]),
        how,
    )
    return out.drop(big_salted["_salt"]).drop(small_replicated["_salt"])
