"""Operator library: pure ``DataFrame -> DataFrame`` functions implementing
the reference's operator inventory (SURVEY.md §2) plus the large-scale
training-data-pipeline extensions (dedup, similarity, text, multimodal)."""

from real_time_financial_data_pipeline_spark.operators.clean import clean_data  # noqa: F401
from real_time_financial_data_pipeline_spark.operators.normalize import normalize_data  # noqa: F401
from real_time_financial_data_pipeline_spark.operators.aggregate import aggregate_data  # noqa: F401
