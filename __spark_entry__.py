"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()``  — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents.

Determinism policy (so Spark and the DuckDB oracle hash-match):
- every float produced by arithmetic is rounded to 6 decimals on BOTH sides
  (raw column passthroughs are left untouched — they're bit-identical);
- value-at-first/last semantics use min_by/max_by on a time column that is
  unique within each group (verified for the test data);
- window orderings always include a unique tiebreak column;
- date_trunc period-START labels on both sides (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.operators.aggregate import ohlcv
from real_time_financial_data_pipeline_spark.operators.clean import clean_data
from real_time_financial_data_pipeline_spark.operators.normalize import derive_mid
from real_time_financial_data_pipeline_spark.operators.query import (
    correlation,
    latest_per_key,
    moving_average,
    preview,
    timeseries,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full transform pipeline shape
    (transformers.py:145-214) on the events table — clean -> daily OHLCV
    per event_type (A1 with first/last/min/max/sum semantics)."""
    events = load_table(spark, SF0001, "events")
    cleaned = clean_data(events)
    return ohlcv(cleaned, "D", "ts", "value", ["event_type"])


# ---------------------------------------------------------------------------
# queries() — each callable takes (spark, sf_dir) and returns a DataFrame.
# ---------------------------------------------------------------------------


def _ohlcv_query(period: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        out = ohlcv(ev, period, "ts", "value", ["event_type"])
        return out.withColumn("sum_value", F.round("sum_value", 6))

    return q


def _clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_data(load_table(spark, sf_dir, "events"))


def _timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return timeseries(ev, "event_type", "purchase", "ts", "2024-01-10", "2024-01-20")


def _moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = moving_average(ev.select("event_id", "event_type", "ts", "value"),
                         "value", 7, ["event_type"], ["ts", "event_id"])
    return out.withColumn("moving_avg", F.round("moving_avg", 6))


def _correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = correlation(ev, "event_type", "click", "purchase", "ts", "value", "hour")
    return out.withColumn("correlation", F.round("correlation", 6))


def _latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id"], "ts")


def _preview_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return preview(ev, 100, ["event_id"])


def _mid_value_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — derived mid column on top of the daily OHLCV (forex mid_rate
    shape, transformers.py:81-82)."""
    ev = load_table(spark, sf_dir, "events")
    out = derive_mid(ohlcv(ev, "D", "ts", "value", ["event_type"]), "open", "close")
    return (
        out.select("event_type", "period", "open", "close", "mid_rate")
        .withColumn("mid_rate", F.round("mid_rate", 6))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "clean_events": _clean_events,
        "timeseries_purchase": _timeseries,
        "moving_average_7": _moving_average,
        "correlation_click_purchase": _correlation,
        "latest_per_user": _latest_per_user,
        "preview_events": _preview_events,
        "mid_value_daily": _mid_value_daily,
    }
    for period, name in [("D", "daily"), ("W", "weekly"), ("M", "monthly"),
                         ("Q", "quarterly"), ("Y", "yearly")]:
        qs[f"ohlcv_{name}"] = _ohlcv_query(period)
    return qs


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB ANSI SQL on the same tables.
# ---------------------------------------------------------------------------

_OHLCV_SQL = """
SELECT event_type,
       CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS period,
       arg_min(value, ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, ts) AS close,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


def oracle_sql() -> dict[str, str]:
    sqls = {
        "clean_events": """
            SELECT DISTINCT * FROM events
            WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
              AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
        """,
        "timeseries_purchase": """
            SELECT * FROM events
            WHERE event_type = 'purchase'
              AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
            ORDER BY ts
        """,
        "moving_average_7": """
            SELECT event_id, event_type, ts, value,
                   round(avg(value) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS moving_avg
            FROM events
        """,
        "correlation_click_purchase": """
            SELECT round(corr(a, b), 6) AS correlation FROM (
                SELECT date_trunc('hour', ts) AS bucket,
                       avg(CASE WHEN event_type = 'click' THEN value END) AS a,
                       avg(CASE WHEN event_type = 'purchase' THEN value END) AS b
                FROM events
                WHERE event_type IN ('click', 'purchase')
                GROUP BY 1
            )
        """,
        "latest_per_user": """
            SELECT user_id, event_id, ts, event_type, value, props FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "preview_events": """
            SELECT * FROM events ORDER BY event_id LIMIT 100
        """,
        "mid_value_daily": """
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS period,
                   arg_min(value, ts) AS open,
                   arg_max(value, ts) AS close,
                   round((arg_min(value, ts) + arg_max(value, ts)) / 2, 6) AS mid_rate
            FROM events GROUP BY 1, 2
        """,
    }
    for unit, name in [("day", "daily"), ("week", "weekly"), ("month", "monthly"),
                       ("quarter", "quarterly"), ("year", "yearly")]:
        sqls[f"ohlcv_{name}"] = _OHLCV_SQL.format(unit=unit)
    return sqls
