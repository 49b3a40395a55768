"""Scalar/serving-edge functions (SURVEY.md §2.3, §2.8) and sinks (§2.2)."""

from real_time_financial_data_pipeline_spark.functions.sinks import (  # noqa: F401
    sanitize_floats,
    timestamps_to_iso,
    to_json_records,
    to_csv_string,
)
