"""The driver regenerates the testdata parquet every round, and events.ts has
shipped under different physical encodings across rounds: TIMESTAMP(NANOS)
(read by Spark 4 as long when nanosAsLong is pinned), naive TIMESTAMP(MICROS)
(read as TIMESTAMP_NTZ unless inferTimestampNTZ is disabled), and UTC-adjusted
TIMESTAMP(MICROS).  `catalog.load_table` must normalize ALL of them to the
same LTZ `timestamp` column with identical UTC wall-clock values — watermarks
reject NTZ event-time columns, and oracle hashes depend on the values."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from real_time_financial_data_pipeline_spark.catalog import load_table

WALL = [
    dt.datetime(2024, 1, 10, 0, 0, 0),
    dt.datetime(2024, 1, 10, 12, 34, 56, 789000),
    dt.datetime(2024, 2, 1, 23, 59, 59),
]


def _write_events(dirpath, ts_type):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(WALL).cast(ts_type),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(table, str(dirpath / "events.parquet"), version="2.6")


@pytest.mark.parametrize(
    "ts_type",
    [
        pa.timestamp("us"),            # naive µs -> NTZ unless pinned
        pa.timestamp("ns"),            # TIMESTAMP(NANOS) -> long under nanosAsLong
        pa.timestamp("us", tz="UTC"),  # adjusted-to-UTC µs -> LTZ natively
    ],
    ids=["naive_us", "nanos", "utc_us"],
)
def test_load_table_normalizes_ts_encoding(spark, tmp_path, ts_type):
    _write_events(tmp_path, ts_type)
    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [r.ts for r in df.orderBy("event_id").collect()]
    # UTC session zone: collected naive datetimes equal the written wall clock
    assert got == WALL


def test_naive_us_events_can_watermark_in_a_stream(spark, tmp_path):
    """The round-7 failure mode: a file-source stream over naive-µs parquet
    must carry an LTZ event-time column or withWatermark raises
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE at analysis."""
    from real_time_financial_data_pipeline_spark.streaming.ingest import (
        dedup_stream,
        file_stream,
    )

    (tmp_path / "src").mkdir()
    _write_events(tmp_path / "src", pa.timestamp("us"))
    schema = load_table(spark, str(tmp_path / "src"), "events").schema
    stream = file_stream(spark, str(tmp_path / "src" / "*"), schema)
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("enc_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("enc_sink").count() == 3
