"""Skew + percentile scale bench: measures salted vs unsalted shuffle join
on a deliberately skewed key, and exact vs approx percentiles, at
$SPARK_GRAFT_SF_DIR (default sf0.1).  Prints ONE JSON line.

Setup notes:
- the big side gets a hot key (90% of rows collapse to key 0) — the
  classic "one symbol is half the ticks" shape;
- auto-broadcast is disabled for the join comparison (a broadcast join
  sidesteps shuffle skew entirely, which is the right fix when the small
  side fits — salting is for when it doesn't);
- AQE stays ON, as in production: AQE's skew split only kicks in for
  sort-merge joins above its size thresholds, so explicit salting is
  still the lever for hash joins / moderate sizes.

Usage: python tools/skew_bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.operators.query import percentiles
from real_time_financial_data_pipeline_spark.plans.skew import salted_join
from real_time_financial_data_pipeline_spark.session import get_spark


def median_of(fn, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    # hot key: 90% of rows land on key 0; the rest keep their user_id
    big = ev.select(
        F.when(F.pmod("event_id", F.lit(10)) < 9, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
    )
    small = (
        ev.select(F.col("user_id").alias("k")).distinct()
        .union(spark.range(1).select(F.lit(0).alias("k")))
        .distinct()
        .withColumn("label", F.concat(F.lit("u"), F.col("k")))
    )
    big.persist().count()
    small.persist().count()

    def run_join(df):
        df.groupBy("label").agg(F.sum("value")).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, float] = {}
    with_conf = spark.conf
    prev = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_plain = big.join(small, "k").count()
        n_salted = salted_join(big, small, "k").count()
        assert n_plain == n_salted, (n_plain, n_salted)
        results["join_unsalted"] = median_of(lambda: run_join(big.join(small, "k")))
        results["join_salted"] = median_of(lambda: run_join(salted_join(big, small, "k")))
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def run_pct(approx: bool):
        percentiles(ev, "value", ["event_type"], [0.5, 0.9, 0.99], approx=approx).write.format(
            "noop"
        ).mode("overwrite").save()

    results["percentiles_exact"] = median_of(lambda: run_pct(False))
    results["percentiles_approx"] = median_of(lambda: run_pct(True))

    big.unpersist()
    small.unpersist()
    print(
        json.dumps(
            {
                "metric": "skew_and_percentile_bench",
                "unit": "sec",
                "rows_joined": n_plain,
                "timings": results,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
