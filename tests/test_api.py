"""Serving façade — full route-level flow over a temp lake."""

from __future__ import annotations

import json

import pytest

from real_time_financial_data_pipeline_spark import api
from real_time_financial_data_pipeline_spark.lake import DataLake
from real_time_financial_data_pipeline_spark.sources.connectors import parse_alphavantage_daily

PAYLOAD = {
    "Time Series (Daily)": {
        "2024-01-02": {"1. open": "10", "2. high": "12", "3. low": "9", "4. close": "11", "5. volume": "100"},
        "2024-02-05": {"1. open": "11", "2. high": "13", "3. low": "10", "4. close": "12", "5. volume": "150"},
    }
}


@pytest.fixture()
def lake(spark, tmp_path):
    return DataLake(spark, str(tmp_path / "lake"))


def test_full_route_flow(spark, lake):
    df = parse_alphavantage_daily(spark, PAYLOAD, "AAPL")

    res = api.ingest(lake, df, "alphavantage", "stock")
    assert res["status"] == "success" and res["records_count"] == 2

    listing = api.list_datasets(lake)
    assert res["dataset"] in listing["bronze"]

    info = api.dataset_info(lake, res["dataset"])
    assert info["record_count"] == 2 and info["symbols"] == ["AAPL"]

    tr = api.transform(lake, f"bronze/{res['dataset']}", "gold", "aggregate", {"time_period": "M"})
    assert tr["status"] == "success" and tr["records_count"] == 2

    # the reference frontend sends destination as "layer/name"
    # (index.html:1104) — the explicit name must be honored
    named = api.transform(
        lake, f"bronze/{res['dataset']}", "silver/my_cleaned_set", "clean", {}
    )
    assert named["status"] == "success" and named["dataset"] == "my_cleaned_set"
    assert "my_cleaned_set" in api.list_datasets(lake)["silver"]

    recs = [json.loads(r) for r in api.get_data(lake, "gold", tr["dataset"])]
    assert len(recs) == 2 and recs[0]["period"].endswith("Z")

    latest = api.get_latest(lake, "stock", "alphavantage")
    assert len(latest) == 2

    csv = api.download_csv(lake, "gold", tr["dataset"])
    assert csv.splitlines()[0].startswith("period,")

    assert api.delete_dataset(lake, res["dataset"], "bronze")["status"] == "success"
    assert api.delete_dataset(lake, res["dataset"], "bronze")["status"] == "error"
