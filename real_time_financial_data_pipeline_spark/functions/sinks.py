"""Serving-edge sinks — reference routes.py JSON/CSV responses (K2/K3).

The reference sanitizes inf/NaN to null (routes.py:194) and formats
timestamps as ISO-8601 with a literal Z (routes.py:200-205) before
``to_dict(orient='records')``.  Here both are expressions applied at the
serving edge only — the lake keeps native types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, TimestampType

ISO_Z = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"  # strftime('%Y-%m-%dT%H:%M:%S.%fZ'), routes.py:205


def sanitize_floats(df: DataFrame) -> DataFrame:
    """P9 — replace ±inf/NaN with null in every float column
    (``df.replace([inf,-inf,nan], None)``, routes.py:194)."""
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (DoubleType, FloatType)):
            c = F.col(field.name)
            cols.append(
                F.when(F.isnan(c) | (c == float("inf")) | (c == float("-inf")), None)
                .otherwise(c)
                .alias(field.name)
            )
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def timestamps_to_iso(df: DataFrame) -> DataFrame:
    """P8 — timestamp columns to ISO-8601 strings with literal Z
    (routes.py:198-208)."""
    cols = [
        F.date_format(F.col(f.name), ISO_Z).alias(f.name)
        if isinstance(f.dataType, TimestampType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def to_json_records(df: DataFrame, limit: int | None = None) -> list[str]:
    """K2 — JSON records response body.  Sanitization + ISO formatting are
    pushed into the plan; only the (bounded) result is collected."""
    out = timestamps_to_iso(sanitize_floats(df))
    if limit is not None:
        out = out.limit(limit)
    # ignoreNullFields=false: the reference emits explicit nulls
    # (NaN/inf -> null, routes.py:194), and so do we
    json_col = F.to_json(F.struct(*out.columns), {"ignoreNullFields": "false"})
    return [r[0] for r in out.select(json_col).collect()]


def to_csv_string(df: DataFrame, limit: int | None = None) -> str:
    """K3 — CSV download body (routes.py:238-259).  Arrow-accelerated
    ``toPandas`` at the serving edge; bound it with ``limit`` for API use
    (for lake-scale export use ``df.write.csv`` instead)."""
    out = timestamps_to_iso(sanitize_floats(df))
    if limit is not None:
        out = out.limit(limit)
    return out.toPandas().to_csv(index=False)
