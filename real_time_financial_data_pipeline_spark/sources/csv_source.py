"""CSV loaders with column auto-detection — reference ``csv_loader.py``.

The reference detects columns by lowercase-synonym lists and fills missing
required stock columns with NaN rather than rejecting (csv_loader.py:40-101).
Here detection is driver-side logic over ``df.columns`` (schema metadata —
no data moves), and the actual read is ``spark.read.csv`` with header +
schema inference; renames/casts/fills are narrow projections.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Synonym tables — csv_loader.py:40-54, 67-82, 134-152
DATE_SYNONYMS = ["date", "time", "timestamp", "datetime"]
SYMBOL_SYNONYMS = ["symbol", "ticker", "stock", "name"]
PRICE_SYNONYMS: dict[str, list[str]] = {
    "open": ["open", "opening", "open_price"],
    "high": ["high", "highest", "high_price"],
    "low": ["low", "lowest", "low_price"],
    "close": ["close", "closing", "close_price", "adj_close", "adjusted_close"],
    "volume": ["volume", "vol", "quantity"],
}
VALUE_SYNONYMS = ["value", "indicator", "rate", "price", "amount"]

REQUIRED_STOCK_COLUMNS = ["symbol", "timestamp", "open", "high", "low", "close", "volume"]


def _find(columns: list[str], synonyms: list[str]) -> str | None:
    lower = {c.lower(): c for c in columns}
    for syn in synonyms:
        if syn in lower:
            return lower[syn]
    return None


def load_stock_csv(
    spark: SparkSession,
    file_path: str,
    symbol_col: str | None = None,
    date_col: str | None = None,
) -> DataFrame:
    """S6 — stock CSV with auto-detection (csv_loader.py:20-111).

    Detection order: explicit arg > synonym match > (symbol only) filename
    stem.  Missing required columns are null-filled, not rejected.
    """
    raw = spark.read.option("header", True).option("inferSchema", True).csv(file_path)
    cols = raw.columns

    date_col = date_col or _find(cols, DATE_SYNONYMS)
    symbol_col = symbol_col or _find(cols, SYMBOL_SYNONYMS)

    renames: dict[str, str] = {}
    if date_col:
        renames[date_col] = "timestamp"
    if symbol_col:
        renames[symbol_col] = "symbol"
    for canonical, syns in PRICE_SYNONYMS.items():
        found = _find(cols, syns)
        if found and found not in renames:
            renames[found] = canonical
    out = raw.withColumnsRenamed(renames)

    if "timestamp" in out.columns:
        out = out.withColumn("timestamp", F.col("timestamp").try_cast("timestamp"))
    if "symbol" not in out.columns:
        # infer from filename prefix (csv_loader.py:84-88)
        stem = os.path.splitext(os.path.basename(file_path))[0]
        out = out.withColumn("symbol", F.lit(stem.split("_")[0].upper()))

    for c in ("open", "high", "low", "close"):
        if c in out.columns:
            out = out.withColumn(c, F.col(c).try_cast("double"))
        else:  # null-fill, not reject (csv_loader.py:93-101)
            out = out.withColumn(c, F.lit(None).cast("double"))
    out = (
        out.withColumn("volume", F.col("volume").try_cast("long"))
        if "volume" in out.columns
        else out.withColumn("volume", F.lit(None).cast("long"))
    )
    return out.withColumn("source", F.lit("csv_import"))


def load_economic_csv(
    spark: SparkSession,
    file_path: str,
    indicator_name: str,
    date_col: str | None = None,
    value_col: str | None = None,
    country: str = "Unknown",
) -> DataFrame:
    """S7 — economic-indicator CSV (csv_loader.py:113-177)."""
    raw = spark.read.option("header", True).option("inferSchema", True).csv(file_path)
    cols = raw.columns
    date_col = date_col or _find(cols, DATE_SYNONYMS)
    value_col = value_col or _find(cols, VALUE_SYNONYMS)
    if not date_col or not value_col:
        raise ValueError(f"could not detect date/value columns in {cols}")
    return raw.select(
        F.col(date_col).try_cast("timestamp").alias("timestamp"),
        F.col(value_col).try_cast("double").alias("value"),
        F.lit(indicator_name).alias("indicator"),
        F.lit(country).alias("country"),
        F.lit("csv_import").alias("source"),
    )
