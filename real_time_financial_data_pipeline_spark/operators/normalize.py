"""Normalize operator — reference ``normalize_data`` (transformers.py:56-97).

Per-data-type column validation plus derived columns:

- stock:    require OHLCV columns (warn-only in the reference,
            transformers.py:71-76 — we keep the permissive behavior).
- forex:    derive ``mid_rate = (open + close) / 2`` (transformers.py:81-82).
- crypto:   require price column.
- economic: require value column.
- always:   append a literal ``data_type`` column (transformers.py:94).

All derivations are narrow projections — zero shuffles, fully codegen'd.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

EXPECTED_COLUMNS = {
    "stock": ["symbol", "timestamp", "open", "high", "low", "close", "volume"],
    "forex": ["from_currency", "to_currency", "timestamp", "rate"],
    "crypto": ["symbol", "timestamp", "price"],
    "economic": ["indicator", "timestamp", "value"],
}


def normalize_data(df: DataFrame, data_type: str) -> DataFrame:
    """Normalize per data_type; unknown columns pass through untouched."""
    present = set(df.columns)
    expected = EXPECTED_COLUMNS.get(data_type, [])
    missing = [c for c in expected if c not in present]
    if missing:
        # Reference only warns (transformers.py:71-76).
        logger.warning("normalize(%s): missing columns %s", data_type, missing)

    out = df
    if data_type == "forex" and {"open", "close"} <= present:
        # P3 — arithmetic derived column (transformers.py:81-82).
        out = out.withColumn("mid_rate", (F.col("open") + F.col("close")) / F.lit(2.0))
    return out.withColumn("data_type", F.lit(data_type))


def derive_mid(df: DataFrame, lo: str, hi: str, name: str = "mid_rate") -> DataFrame:
    """Generic (a+b)/2 derivation — the forex mid-rate generalized."""
    return df.withColumn(name, (F.col(lo) + F.col(hi)) / F.lit(2.0))
