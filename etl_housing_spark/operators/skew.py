"""Skew-mitigation joins (SCALE.md §Joins).

AQE's skew-join split handles most skew at runtime; ``salted_join`` is the
explicit fallback for the cases AQE cannot fix — e.g. a single hot key on
BOTH build and probe sides, or a non-sort-merge plan. The classic recipe:

- fact side: append a uniform salt in [0, buckets) to the join key
- dim side:  explode each row into all ``buckets`` salted copies
- join on (key, salt) — the hot key's rows now spread over ``buckets``
  reducers instead of one.

Cost model: dim-side rows × buckets extra tuples through the shuffle — pick
``buckets`` ≈ (hot-key rows / average-key rows), bounded by parallelism.
The salt is ``pmod(hash(monotonically_increasing_id()), b)`` — deterministic
per row within a run (no rand(), so retried tasks salt identically and
exactly-once sinks stay correct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salt_column(buckets: int):
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets))


def explode_salts(df: DataFrame, buckets: int) -> DataFrame:
    """Dim side: one copy of every row per salt value."""
    return df.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the hot-key rows of ``fact``
    spread across ``buckets`` shuffle partitions per key."""
    f = fact.withColumn(SALT, salt_column(buckets))
    d = explode_salts(dim, buckets)
    return f.join(d, on + [SALT], how).drop(SALT)
