"""Slowly-changing-dimension (SCD Type 2) merge — versioned dimension
history with plain DataFrame ops.

Without a transactional table format there is no MERGE INTO; the Type-2
apply is still expressible as one join + a union of three row classes,
which is exactly what a 100 TB engine wants anyway (a single shuffle on
the business key; every branch reuses it):

- HISTORICAL rows (``valid_to`` set) pass through untouched;
- CURRENT rows with a differing update are CLOSED (``valid_to`` :=
  update's effective timestamp); unchanged / un-updated current rows pass
  through;
- each change INSERTS a new current version (``valid_from`` := effective
  timestamp, ``valid_to`` NULL).

Updates that equal the current attribute values are no-ops (no spurious
versions).  The output is a full replacement image of the dimension —
write it with ``DataLake.save(mode="overwrite")`` or partition-swap it.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply a batch of updates to a Type-2 dimension; returns the new full
    dimension image (same schema as ``dim``).

    ``dim`` carries ``key_cols + attr_cols + valid_from + valid_to``
    (``valid_to`` NULL marks the current version).  ``updates`` carries
    ``key_cols + attr_cols + effective_col`` — keys absent from the
    dimension INSERT as brand-new current rows (the MERGE "not matched"
    branch).  At most one update per key per batch (pre-aggregate
    upstream with ``latest_per_key`` otherwise); a NULL effective
    timestamp is invalid input and raises.
    """
    if not key_cols or not attr_cols:
        raise ValueError("scd2_apply requires non-empty key_cols and attr_cols")
    if updates.filter(F.col(effective_col).isNull()).limit(1).count():
        raise ValueError(f"scd2_apply: {effective_col} must be non-null on every update")

    # r17 single-pass shape (guide §1.2/§2.4).  The original
    # hist/current split + left join + anti join + 4-way union
    # instantiated `dim` three times and `updates` twice (six scans of
    # the dimension at the scd2_customer_dim call site) and paid two
    # join exchanges.  One FULL OUTER join of the whole dimension
    # against the update batch — the equi key plus `valid_to IS NULL`
    # as the join condition, so history rows never match — classifies
    # every MERGE branch, and each joined row then emits its 1-2 output
    # rows through one explode:
    #   dim row, no/unchanged update  -> kept as-is (history + no-ops)
    #   dim current row + changed     -> closed row AND new version row
    #   update with no current row    -> brand-new current row (insert)
    # Scans: dim once, updates once; one join; no union.
    up = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols + attr_cols],
        F.col(effective_col).alias("_u_eff"),
        F.lit(True).alias("_u_matched"),  # join-presence flag; never null-ambiguous
    )
    tagged_dim = dim.withColumn("_d_matched", F.lit(True))
    joined = tagged_dim.join(
        up,
        _all([F.col(k) == F.col(f"_u_{k}") for k in key_cols])
        & F.col(valid_to_col).isNull(),
        "full",
    )

    # an update "changes" the row if ANY attribute differs (null-safe)
    changed = _any([~F.col(a).eqNullSafe(F.col(f"_u_{a}")) for a in attr_cols])
    has_update = F.coalesce(F.col("_u_matched"), F.lit(False))
    has_dim = F.coalesce(F.col("_d_matched"), F.lit(False))
    vt_type = dim.schema[valid_to_col].dataType

    kept_or_closed = F.struct(
        *[F.col(c).alias(c) for c in key_cols + attr_cols],
        F.col(valid_from_col).alias(valid_from_col),
        F.when(has_update & changed, F.col("_u_eff"))
        .otherwise(F.col(valid_to_col))
        .alias(valid_to_col),
    )
    new_current = F.struct(
        *[F.col(f"_u_{c}").alias(c) for c in key_cols + attr_cols],
        F.col("_u_eff").alias(valid_from_col),
        F.lit(None).cast(vt_type).alias(valid_to_col),
    )
    emitted = F.array_compact(
        F.array(
            F.when(has_dim, kept_or_closed),
            F.when(has_update & (changed | ~has_dim), new_current),
        )
    )
    return joined.select(F.explode(emitted).alias("_r")).select("_r.*")


def _all(cols: list[Column]) -> Column:
    return functools.reduce(operator.and_, cols)


def _any(cols: list[Column]) -> Column:
    return functools.reduce(operator.or_, cols)
