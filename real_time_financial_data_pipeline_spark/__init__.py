"""PySpark-native analytics engine with the query and data-processing
capabilities of SunainaMakkena/Real-Time-Financial-Data-pipeline.

The reference (/root/reference) is a Pandas/FastAPI medallion data lake for
financial time series.  This package re-expresses its entire operator
inventory (SURVEY.md §2) Spark-first:

- ``session``     — SparkSession factory (UTC, non-ANSI coerce casts, AQE).
- ``schemas``     — explicit StructType per reference entity (schema.py:13-46).
- ``lake``        — bronze/silver/gold medallion lake (storage.py, helpers.py).
- ``catalog``     — test-table loading and temp-view registration.
- ``operators``   — clean / normalize / aggregate / query / dedup /
                    similarity / text / multimodal / asof (as-of +
                    range join) / quality / sketches / linkage.
- ``sources``     — CSV auto-detect loader, Alpha Vantage / Yahoo payload
                    parsers (csv_loader.py, alphavantage.py, yahoo_finance.py).
- ``streaming``   — Structured Streaming ingestion + windowed aggregates
                    (the reference's BackgroundTasks pull loop, reimagined).
- ``pipeline``    — transform orchestrator (transformers.py:145-214).

Everything is declarative DataFrame code: Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where no builtin exists.
"""

__version__ = "0.1.0"

from real_time_financial_data_pipeline_spark.session import get_spark  # noqa: F401
