"""Clean operator — reference ``clean_data`` (transformers.py:17-53).

Reference semantics, re-expressed declaratively:

1. drop rows containing any null      (``df.dropna()``, transformers.py:29-30)
2. drop exact duplicate rows          (``drop_duplicates()``, transformers.py:32-33)
3. parse a timestamp column           (``pd.to_datetime``, transformers.py:36-40)
4. coerce known numeric columns, unparseable -> null
                                      (``pd.to_numeric(errors='coerce')``,
                                       transformers.py:43-49)

Scale notes: ``dropDuplicates`` over all columns is a hash aggregate on the
full row — the one shuffle in this operator.  Spark's partial (map-side)
aggregation collapses duplicates before the exchange, so the shuffle volume
is bounded by the distinct-row count, which is the best any engine can do.
Null filtering and casts are narrow, codegen'd, and pushed below the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

# Reference coerces exactly these when present (transformers.py:44-49).
NUMERIC_COLUMNS = ["open", "high", "low", "close", "volume", "value", "rate"]
TIMESTAMP_COLUMNS = ["timestamp", "ts"]


def drop_null_rows(df: DataFrame, how: str = "any") -> DataFrame:
    """F1 — whole-row null drop (transformers.py:29-30)."""
    return df.na.drop(how=how)


def drop_exact_duplicates(df: DataFrame) -> DataFrame:
    """F2 — full-row dedup (transformers.py:32-33).  Deterministic because
    exact duplicates are interchangeable."""
    return df.dropDuplicates()


def coerce_types(df: DataFrame) -> DataFrame:
    """P6 + P7 — numeric/timestamp coercion with null-on-failure.

    ``try_cast`` mirrors ``errors='coerce'`` regardless of the ANSI flag.
    ``volume`` stays integral (reference downcasts it, alphavantage.py:72).
    """
    cols = []
    for field in df.schema.fields:
        name = field.name
        if name in TIMESTAMP_COLUMNS and not isinstance(field.dataType, TimestampType):
            cols.append(F.col(name).try_cast("timestamp").alias(name))
        elif name == "volume":
            cols.append(F.col(name).try_cast("long").alias(name))
        elif name in NUMERIC_COLUMNS:
            cols.append(F.col(name).try_cast("double").alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def clean_data(df: DataFrame, dropna: bool = True, dedup: bool = True) -> DataFrame:
    """Full clean pipeline (transformers.py:17-53): dropna -> dedup -> coerce."""
    out = df
    if dropna:
        out = drop_null_rows(out)
    if dedup:
        out = drop_exact_duplicates(out)
    return coerce_types(out)
