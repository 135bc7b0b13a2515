"""Explicit skew-handling joins (SURVEY.md §4.1).

When the dimension side fits in memory, ``F.broadcast`` already defeats
key skew (no shuffle on the skewed key at all) — that is the pipeline's
default.  ``salted_join`` is the explicit strategy for when it does not:
replicate the hot-key rows of the small side K times and spread the big
side's hot keys across K salt buckets, so no single reducer owns 'London'.
AQE's skew-join split (enabled in session.py) is the runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` (the skew head)."""
    return (
        df.groupBy(key).count().filter(F.col("count") > threshold).select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with salt spreading.

    big gets a deterministic salt from a second column-independent hash;
    small is exploded to every salt value.  Output columns = big ∪ small
    (minus the duplicate key), like a plain ``join(..., key)``.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key), F.lit(42)), F.lit(salt_buckets))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
