"""Endpoint composition: the connectors must build EXACTLY the URLs/params
the reference builds (alphavantage.py:21-199, yahoo_finance.py:89-189),
then hand the payload to the offline parsers.  A recording stub stands in
for Fetcher.get_json — no network."""

from __future__ import annotations

import pytest

from real_time_financial_data_pipeline_spark.sources.connectors import (
    ALPHAVANTAGE_BASE_URL,
    YAHOO_CHART_BASE_URL,
    AlphaVantageConnector,
    ECONOMIC_FUNCTIONS,
    YahooFinanceConnector,
)

AV_DAILY_PAYLOAD = {
    "Time Series (Daily)": {
        "2024-01-02": {"1. open": "10", "2. high": "12", "3. low": "9", "4. close": "11", "5. volume": "100"},
    }
}
AV_FX_PAYLOAD = {
    "Time Series FX (Daily)": {
        "2024-01-02": {"1. open": "1.1", "2. high": "1.2", "3. low": "1.0", "4. close": "1.15"},
    }
}
AV_ECON_PAYLOAD = {"data": [{"date": "2024-01-01", "value": "27000"}]}
YAHOO_PAYLOAD = {
    "chart": {
        "result": [
            {
                "timestamp": [1704153600],
                "indicators": {
                    "quote": [
                        {"open": [10.0], "high": [12.0], "low": [9.0], "close": [11.0], "volume": [100]}
                    ]
                },
            }
        ]
    }
}


class StubFetcher:
    def __init__(self, payload):
        self.payload = payload
        self.calls: list[tuple[str, dict]] = []

    def get_json(self, url, params=None):
        self.calls.append((url, params))
        return self.payload


def test_av_stock_endpoint(spark):
    stub = StubFetcher(AV_DAILY_PAYLOAD)
    df = AlphaVantageConnector(spark, api_key="KEY", fetcher=stub).fetch_stock_data("AAPL")
    assert stub.calls == [
        (
            ALPHAVANTAGE_BASE_URL,
            {
                "function": "TIME_SERIES_DAILY",
                "symbol": "AAPL",
                "outputsize": "full",
                "datatype": "json",
                "apikey": "KEY",
            },
        )
    ]
    row = df.collect()[0]
    assert (row.symbol, row.close, row.volume, row.source) == ("AAPL", 11.0, 100, "alphavantage")


def test_av_stock_compact(spark):
    stub = StubFetcher(AV_DAILY_PAYLOAD)
    AlphaVantageConnector(spark, api_key="KEY", fetcher=stub).fetch_stock_data(
        "MSFT", output_size="compact"
    )
    assert stub.calls[0][1]["outputsize"] == "compact"
    assert stub.calls[0][1]["symbol"] == "MSFT"


def test_av_forex_endpoint(spark):
    stub = StubFetcher(AV_FX_PAYLOAD)
    df = AlphaVantageConnector(spark, api_key="KEY", fetcher=stub).fetch_forex_data("USD", "EUR")
    assert stub.calls == [
        (
            ALPHAVANTAGE_BASE_URL,
            {
                "function": "FX_DAILY",
                "from_symbol": "USD",
                "to_symbol": "EUR",
                "outputsize": "full",
                "datatype": "json",
                "apikey": "KEY",
            },
        )
    ]
    assert df.collect()[0].rate == 1.15


def test_av_economic_endpoint_fn_code_map(spark):
    stub = StubFetcher(AV_ECON_PAYLOAD)
    av = AlphaVantageConnector(spark, api_key="KEY", fetcher=stub)
    df = av.fetch_economic_indicator("GDP")
    # friendly name GDP maps to function code REAL_GDP (alphavantage.py:179-185)
    assert stub.calls == [
        (
            ALPHAVANTAGE_BASE_URL,
            {"function": "REAL_GDP", "interval": "quarterly", "datatype": "json", "apikey": "KEY"},
        )
    ]
    assert df.collect()[0].value == 27000.0
    assert ECONOMIC_FUNCTIONS["CPI"] == "CPI"
    with pytest.raises(ValueError, match="unknown economic indicator"):
        av.fetch_economic_indicator("NOT_A_THING")


def test_yahoo_stock_endpoint_default_730d(spark):
    stub = StubFetcher(YAHOO_PAYLOAD)
    now = 1_700_000_000.0
    yf = YahooFinanceConnector(spark, fetcher=stub, now_fn=lambda: now)
    df = yf.fetch_stock_data("AAPL")
    url, params = stub.calls[0]
    assert url == f"{YAHOO_CHART_BASE_URL}AAPL"
    # default lookback is exactly 730 days (yahoo_finance.py:104-107)
    assert params["period1"] == int(now - 730 * 86400)
    assert params["period2"] == int(now)
    assert params["interval"] == "1d"
    assert params["includePrePost"] == "false"
    assert params["events"] == "div,split"
    assert df.collect()[0].close == 11.0


def test_yahoo_explicit_window_passthrough(spark):
    stub = StubFetcher(YAHOO_PAYLOAD)
    yf = YahooFinanceConnector(spark, fetcher=stub, now_fn=lambda: 0.0)
    yf.fetch_stock_data("AAPL", period1=123, period2=456, interval="1wk")
    _, params = stub.calls[0]
    assert (params["period1"], params["period2"], params["interval"]) == (123, 456, "1wk")


def test_yahoo_crypto_suffix(spark):
    stub = StubFetcher(YAHOO_PAYLOAD)
    yf = YahooFinanceConnector(spark, fetcher=stub, now_fn=lambda: 1_700_000_000.0)
    df = yf.fetch_crypto_data("BTC")
    url, _ = stub.calls[0]
    # -USD appended before URL composition (yahoo_finance.py:171-174)
    assert url == f"{YAHOO_CHART_BASE_URL}BTC-USD"
    row = df.collect()[0]
    assert (row.symbol, row.base_symbol, row.price, row.data_type) == ("BTC-USD", "BTC", 11.0, "crypto")
    # already-suffixed and USDT symbols pass through untouched
    yf.fetch_crypto_data("ETH-USD")
    assert stub.calls[1][0] == f"{YAHOO_CHART_BASE_URL}ETH-USD"
    yf.fetch_crypto_data("BNBUSDT")
    assert stub.calls[2][0] == f"{YAHOO_CHART_BASE_URL}BNBUSDT"
