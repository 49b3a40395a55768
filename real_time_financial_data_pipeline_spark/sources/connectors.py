"""Market-data connectors — Alpha Vantage (alphavantage.py) and Yahoo
Finance (yahoo_finance.py) re-expressed for Spark.

Design split, per SURVEY.md §3.1: the HTTP fetch stays driver-side Python
(ingestion rate is governed by API limits, not cluster throughput), while
payload PARSING is a pure ``dict -> DataFrame`` function so it is unit-
testable offline and reusable from streaming ``foreachBatch``.

Network access is optional: parsers never touch the network, and ``fetch``
gates ``requests`` behind an import-try.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.schemas import (
    CRYPTO_PRICE,
    ECONOMIC_INDICATOR,
    FOREX_RATE,
    STOCK_PRICE,
)

# indicator name -> API function code (alphavantage.py:179-185)
ECONOMIC_FUNCTIONS = {
    "GDP": "REAL_GDP",
    "INFLATION": "INFLATION",
    "UNEMPLOYMENT": "UNEMPLOYMENT",
    "RETAIL_SALES": "RETAIL_SALES",
    "CPI": "CPI",
}

# endpoint bases (alphavantage.py:11, yahoo_finance.py:20)
ALPHAVANTAGE_BASE_URL = "https://www.alphavantage.co/query"
YAHOO_CHART_BASE_URL = "https://query1.finance.yahoo.com/v8/finance/chart/"


# ---------------------------------------------------------------------------
# payload parsers (offline-pure)
# ---------------------------------------------------------------------------


def parse_alphavantage_daily(
    spark: SparkSession, payload: dict[str, Any], symbol: str
) -> DataFrame:
    """S1 — TIME_SERIES_DAILY JSON (dict-of-dicts keyed by date) to a typed
    StockPrice DataFrame (alphavantage.py:21-92): rename ``"1. open"`` ->
    open etc., cast OHLC to double / volume to long, literal symbol+source."""
    series = payload.get("Time Series (Daily)", {})
    rows = [
        (
            symbol,
            date_str,
            vals.get("1. open"),
            vals.get("2. high"),
            vals.get("3. low"),
            vals.get("4. close"),
            vals.get("5. volume"),
            "alphavantage",
        )
        for date_str, vals in series.items()
    ]
    raw = spark.createDataFrame(
        rows,
        "symbol string, ts string, open string, high string, low string, close string, volume string, source string",
    )
    return raw.select(
        F.col("symbol"),
        F.col("ts").try_cast("timestamp").alias("timestamp"),
        F.col("open").try_cast("double").alias("open"),
        F.col("high").try_cast("double").alias("high"),
        F.col("low").try_cast("double").alias("low"),
        F.col("close").try_cast("double").alias("close"),
        F.col("volume").try_cast("long").alias("volume"),
        F.col("source"),
    )


def parse_alphavantage_forex(
    spark: SparkSession, payload: dict[str, Any], from_currency: str, to_currency: str
) -> DataFrame:
    """S2 — FX_DAILY JSON; ``"4. close"`` becomes ``rate``
    (alphavantage.py:94-166)."""
    series = payload.get("Time Series FX (Daily)", {})
    rows = [
        (
            from_currency,
            to_currency,
            date_str,
            vals.get("1. open"),
            vals.get("2. high"),
            vals.get("3. low"),
            vals.get("4. close"),
            "alphavantage",
        )
        for date_str, vals in series.items()
    ]
    raw = spark.createDataFrame(
        rows,
        "from_currency string, to_currency string, ts string, open string, high string, low string, rate string, source string",
    )
    return raw.select(
        "from_currency",
        "to_currency",
        F.col("ts").try_cast("timestamp").alias("timestamp"),
        F.col("open").try_cast("double").alias("open"),
        F.col("high").try_cast("double").alias("high"),
        F.col("low").try_cast("double").alias("low"),
        F.col("rate").try_cast("double").alias("rate"),
        "source",
    )


def parse_alphavantage_economic(
    spark: SparkSession, payload: dict[str, Any], indicator: str, country: str = "USA"
) -> DataFrame:
    """S3 — economic indicator ``data`` list (alphavantage.py:168-244);
    ``date`` -> timestamp (dropped), value coerced."""
    rows = [(indicator, d.get("date"), d.get("value"), country, "alphavantage") for d in payload.get("data", [])]
    raw = spark.createDataFrame(
        rows, "indicator string, date string, value string, country string, source string"
    )
    return raw.select(
        "indicator",
        F.col("date").try_cast("timestamp").alias("timestamp"),
        F.col("value").try_cast("double").alias("value"),
        "country",
        "source",
    )  # raw `date` column dropped by projection (alphavantage.py:226)


def parse_yahoo_chart(spark: SparkSession, payload: dict[str, Any], symbol: str) -> DataFrame:
    """S4 — Yahoo v8 chart API parallel arrays -> StockPrice rows
    (yahoo_finance.py:89-155); rows with any null dropped as the reference
    does post-scan (yahoo_finance.py:148-149)."""
    result = payload.get("chart", {}).get("result", [{}])[0]
    ts = result.get("timestamp", [])
    quote = result.get("indicators", {}).get("quote", [{}])[0]
    rows = list(
        zip(
            ts,
            quote.get("open", []),
            quote.get("high", []),
            quote.get("low", []),
            quote.get("close", []),
            quote.get("volume", []),
        )
    )
    raw = spark.createDataFrame(
        rows, "ts long, open double, high double, low double, close double, volume long"
    )
    return (
        raw.select(
            F.lit(symbol).alias("symbol"),
            F.timestamp_seconds("ts").alias("timestamp"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            F.lit("yahoo_finance").alias("source"),
        )
        .na.drop("any")
    )


def parse_yahoo_crypto(spark: SparkSession, payload: dict[str, Any], symbol: str) -> DataFrame:
    """S5 — crypto via the chart scan: suffix ``-USD`` if absent, rename
    close -> price, derive base_symbol (yahoo_finance.py:157-189)."""
    full = symbol if "-" in symbol else f"{symbol}-USD"
    stock = parse_yahoo_chart(spark, payload, full)
    return (
        stock.withColumnRenamed("close", "price")
        .withColumn("base_symbol", F.split(F.col("symbol"), "-").getItem(0))
        .withColumn("data_type", F.lit("crypto"))
    )


# ---------------------------------------------------------------------------
# driver-side fetch with throttle/retry — T2/T3 (yahoo_finance.py:34-87)
# ---------------------------------------------------------------------------


class Fetcher:
    """Rate-limited HTTP GET with exponential backoff + jitter.

    Parity: min inter-request delay (default 2 s), up to ``max_retries``
    attempts, 429 -> ``min(30, 2^attempt·(1+U(0,1)))``, other errors ->
    ``min(30, 2^attempt + U(1,3))`` (yahoo_finance.py:19-21,47-87).
    """

    def __init__(self, request_delay: float = 2.0, max_retries: int = 5, timeout: float = 10.0):
        self.request_delay = request_delay
        self.max_retries = max_retries
        self.timeout = timeout
        self._last_request = 0.0

    def _throttle(self) -> None:
        elapsed = time.time() - self._last_request
        if elapsed < self.request_delay:
            time.sleep(self.request_delay - elapsed + random.uniform(0, 0.5))

    def get_json(self, url: str, params: dict[str, str] | None = None) -> dict[str, Any]:
        try:
            import requests  # gated: container may be offline
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("requests not available; use the offline parsers") from e

        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            self._throttle()
            self._last_request = time.time()
            try:
                resp = requests.get(url, params=params, timeout=self.timeout)
                if resp.status_code == 429:
                    time.sleep(min(30.0, (2**attempt) * (1 + random.random())))
                    continue
                resp.raise_for_status()
                return resp.json()
            except Exception as e:  # noqa: BLE001
                last_err = e
                time.sleep(min(30.0, 2**attempt + random.uniform(1, 3)))
        raise RuntimeError(f"fetch failed after {self.max_retries} attempts: {last_err}")


class AlphaVantageConnector:
    """Endpoint composition for Alpha Vantage — builds the exact URL/params
    the reference builds and delegates to ``Fetcher.get_json`` + the offline
    parsers above.  Network stays optional: inject a stub fetcher to test
    (or run offline); only ``get_json`` ever touches HTTP.
    """

    def __init__(self, spark: SparkSession, api_key: str, fetcher: Fetcher | None = None):
        self.spark = spark
        self.api_key = api_key
        self.fetcher = fetcher or Fetcher()

    # S1 (alphavantage.py:21-47): TIME_SERIES_DAILY params incl.
    # outputsize compact|full and datatype json.
    def fetch_stock_data(self, symbol: str, output_size: str = "full") -> DataFrame:
        payload = self.fetcher.get_json(
            ALPHAVANTAGE_BASE_URL,
            {
                "function": "TIME_SERIES_DAILY",
                "symbol": symbol,
                "outputsize": output_size,
                "datatype": "json",
                "apikey": self.api_key,
            },
        )
        return parse_alphavantage_daily(self.spark, payload, symbol)

    # S2 (alphavantage.py:93-112): FX_DAILY with from_symbol/to_symbol.
    def fetch_forex_data(self, from_currency: str, to_currency: str) -> DataFrame:
        payload = self.fetcher.get_json(
            ALPHAVANTAGE_BASE_URL,
            {
                "function": "FX_DAILY",
                "from_symbol": from_currency,
                "to_symbol": to_currency,
                "outputsize": "full",
                "datatype": "json",
                "apikey": self.api_key,
            },
        )
        return parse_alphavantage_forex(self.spark, payload, from_currency, to_currency)

    # S3 (alphavantage.py:168-199): friendly name -> function code, fixed
    # quarterly interval.  The reference logs-and-returns-None on an unknown
    # indicator; we fail loud instead.
    def fetch_economic_indicator(self, indicator: str) -> DataFrame:
        if indicator not in ECONOMIC_FUNCTIONS:
            raise ValueError(
                f"unknown economic indicator {indicator!r}; expected one of "
                f"{sorted(ECONOMIC_FUNCTIONS)}"
            )
        payload = self.fetcher.get_json(
            ALPHAVANTAGE_BASE_URL,
            {
                "function": ECONOMIC_FUNCTIONS[indicator],
                "interval": "quarterly",
                "datatype": "json",
                "apikey": self.api_key,
            },
        )
        return parse_alphavantage_economic(self.spark, payload, indicator)


class YahooFinanceConnector:
    """Endpoint composition for the Yahoo v8 chart API — URL is
    ``{base}{symbol}`` with period1/period2/interval params and the 730-day
    default lookback (yahoo_finance.py:89-118).  ``now_fn`` is injectable so
    the default window is testable."""

    def __init__(
        self,
        spark: SparkSession,
        fetcher: Fetcher | None = None,
        now_fn: Callable[[], float] = time.time,
    ):
        self.spark = spark
        # reference default request_delay is 2.0 s (yahoo_finance.py:19)
        self.fetcher = fetcher or Fetcher(request_delay=2.0)
        self.now_fn = now_fn

    def _chart_payload(
        self, symbol: str, period1: int | None, period2: int | None, interval: str
    ) -> dict[str, Any]:
        # default window: last 730 days (yahoo_finance.py:104-107)
        if period1 is None:
            period1 = int(self.now_fn() - 730 * 86400)
        if period2 is None:
            period2 = int(self.now_fn())
        return self.fetcher.get_json(
            f"{YAHOO_CHART_BASE_URL}{symbol}",
            {
                "period1": period1,
                "period2": period2,
                "interval": interval,
                "includePrePost": "false",
                "events": "div,split",
            },
        )

    # S4 (yahoo_finance.py:89-155)
    def fetch_stock_data(
        self,
        symbol: str,
        period1: int | None = None,
        period2: int | None = None,
        interval: str = "1d",
    ) -> DataFrame:
        payload = self._chart_payload(symbol, period1, period2, interval)
        return parse_yahoo_chart(self.spark, payload, symbol)

    # S5 (yahoo_finance.py:157-189): same endpoint, -USD suffix if absent
    def fetch_crypto_data(
        self,
        symbol: str,
        period1: int | None = None,
        period2: int | None = None,
        interval: str = "1d",
    ) -> DataFrame:
        if "-USD" not in symbol and not symbol.endswith("USDT"):
            symbol = f"{symbol}-USD"
        payload = self._chart_payload(symbol, period1, period2, interval)
        return parse_yahoo_crypto(self.spark, payload, symbol)


def batch_fetch(
    symbols: list[str],
    fetch_one: Callable[[str], DataFrame],
    batch_delay: float = 5.0,
) -> list[DataFrame]:
    """T4 — sequential multi-symbol fetch with inter-symbol delay
    (yahoo_finance.py:224-250)."""
    out = []
    for i, sym in enumerate(symbols):
        if i:
            time.sleep(batch_delay + random.uniform(1, 3))
        out.append(fetch_one(sym))
    return out
