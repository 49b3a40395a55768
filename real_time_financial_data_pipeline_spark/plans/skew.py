"""Skew-handling utilities: key salting for hot-key joins and aggregates.

AQE's skew-join split (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one key dominates so hard
that even split partitions bottleneck (the classic "null key" / "AAPL is
half the ticks" problem at 100 TB).

- ``salt_aggregate``: two-stage aggregation — partial agg on
  (key, salt) spreads a hot key over N reducers, then a cheap final agg on
  key merges the N partials.  Works for any algebraic aggregate set.
- ``salted_join``: replicate the small side N× (one copy per salt value),
  salt the big side randomly — the hot key's rows land on N reducers
  instead of one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the partials
    per key (e.g. partial ``sum(x) AS s`` then final ``sum(s) AS s``).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side.

    The small side is replicated ``n_salts``× (cheap — it is small by
    assumption); the big side's hot keys scatter uniformly over the salt
    space, so no single reducer owns a hot key.
    """
    big_salted = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_exploded, [key, "_salt"], how)
    return out.drop("_salt")
