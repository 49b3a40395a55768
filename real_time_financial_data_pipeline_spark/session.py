"""SparkSession factory.

Semantics pinned for reference parity (SURVEY.md §4):

- ``spark.sql.session.timeZone=UTC`` — the reference uses naive
  ``datetime64[ns]`` (transformers.py:36-40); a fixed UTC session zone keeps
  parquet round-trips and DuckDB-oracle comparisons deterministic.
- ``spark.sql.ansi.enabled=false`` — the reference coerces unparseable
  numerics/dates to null (``pd.to_numeric(errors='coerce')``,
  transformers.py:43-49); non-ANSI casts reproduce that, and ``try_cast`` is
  used where we want the intent explicit.
- AQE on (coalesce + skew-join): at 100 TB the runtime re-plan is what keeps
  shuffle partition counts and skewed keys sane; free at small SF.

Scale defaults are environment-driven so the same code runs on ``local[32]``
here and on a real cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rtfdp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    ``shuffle_partitions`` defaults to the core count — right-sized for local
    runs; on a cluster pass the usual 2-3× total-cores figure or let AQE
    coalesce from a higher initial number.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(8, int(cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for any toPandas()/pandas_udf edges (sinks, ANN UDF path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet: push count/min/max into footers where possible.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unsupported by Spark's
        # vectorized reader; read as long ns and convert at the catalog edge
        # (catalog.load_table) with µs truncation, matching DuckDB/pandas.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive parquet timestamps load as LTZ (UTC), never NTZ — watermarks
        # and windows require LTZ; see catalog.load_table.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Keep driver/UI quiet and light in CI.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
