"""Entity schemas — explicit StructTypes for the reference's Pydantic models.

The reference declares its entities in ``schema.py:13-46`` but never enforces
them on DataFrames; connectors build matching columns by convention
(SURVEY.md §1.4).  Here schemas are first-class: every source produces a
DataFrame with one of these StructTypes, so downstream plans are fully typed
and Catalyst can prune/push down against real column metadata.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# StockPrice — reference schema.py:13-21
STOCK_PRICE = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("close", DoubleType(), True),
        StructField("volume", LongType(), True),
        StructField("source", StringType(), True),
    ]
)

# ForexRate — reference schema.py:24-29 (+ open/high/low produced in practice,
# alphavantage.py:131-154)
FOREX_RATE = StructType(
    [
        StructField("from_currency", StringType(), False),
        StructField("to_currency", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("rate", DoubleType(), True),
        StructField("source", StringType(), True),
    ]
)

# CryptoPrice — reference schema.py:32-38 (+ base_symbol/data_type in
# practice, yahoo_finance.py:157-189)
CRYPTO_PRICE = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("base_symbol", StringType(), True),
        StructField("timestamp", TimestampType(), False),
        StructField("price", DoubleType(), True),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("volume", LongType(), True),
        StructField("market_cap", DoubleType(), True),
        StructField("data_type", StringType(), True),
        StructField("source", StringType(), True),
    ]
)

# EconomicIndicator — reference schema.py:41-46
ECONOMIC_INDICATOR = StructType(
    [
        StructField("indicator", StringType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("country", StringType(), True),
        StructField("source", StringType(), True),
    ]
)

ENTITY_SCHEMAS: dict[str, StructType] = {
    "stock": STOCK_PRICE,
    "forex": FOREX_RATE,
    "crypto": CRYPTO_PRICE,
    "economic": ECONOMIC_INDICATOR,
}
