"""Test-table catalog: load the driver-generated parquet tables and register
them as temp views so both the DataFrame API and ``spark.sql`` can reach them.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table.  A plain ``spark.read.parquet`` keeps the scan lazy so
    Catalyst pushes filters and prunes columns into the parquet reader.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as long ns
    (``spark.sql.legacy.parquet.nanosAsLong``); convert to a microsecond
    timestamp here (``div 1000`` truncation — same as DuckDB/pandas ns->µs).

    The confs below are also set by ``session.get_spark``, but the driver
    calls ``entry``/``queries`` with its *own* SparkSession — set the
    runtime-settable ones defensively so results don't depend on who built
    the session (UTC keeps collected datetimes oracle-comparable).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # engine semantics are coerce-to-null (reference errors='coerce'), not
    # ANSI aborts — pin it regardless of the caller's session defaults
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # Parquet naive timestamps (isAdjustedToUTC=false) must load as
    # TIMESTAMP (LTZ-at-UTC), not TIMESTAMP_NTZ: watermarks/windows require
    # LTZ, and with the UTC session zone the wall-clock values are identical
    # to what DuckDB sees, keeping oracle hashes stable.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Belt-and-braces for sessions where the conf can't take effect (e.g. a
    # caller resolved the scan before we pinned it): NTZ -> LTZ is a no-op
    # on values under the UTC session zone.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (``spark.sql`` parity with the
    DuckDB oracle's pre-registered views)."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
