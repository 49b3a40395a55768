"""10x-data probe for the r17-changed operators: old shape vs new shape
at 1x and Nx replicated inputs, interleaved in one session — the
evidence behind OPTIMIZATION_r17.md's "the win grows with scale"
claims.  MIN of runs is the comparable signal (steal bursts, see
OPTIMIZATION_r17.md "Measurement environment").

Usage: python tools/r17_scale_probe.py [replication=10] [runs=3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_single_scan,
)
from real_time_financial_data_pipeline_spark.plans.relational import lapsed_customers
from real_time_financial_data_pipeline_spark.session import get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_pair(name: str, old_fn, new_fn, runs: int) -> None:
    old_fn(); new_fn()  # warm
    a, b = [], []
    for _ in range(runs):
        t0 = time.perf_counter(); old_fn(); a.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); new_fn(); b.append(time.perf_counter() - t0)
    print(
        f"PROBE {name}: old min={min(a):.3f} new min={min(b):.3f} "
        f"({min(b) / min(a):.2f}x) old={[round(x, 3) for x in a]} "
        f"new={[round(x, 3) for x in b]}"
    )


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r17-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # events replicated along the time axis (structure-preserving)
    ev1 = load_table(spark, sf, "events")
    span = ev1.agg((F.max("ts").cast("long") - F.min("ts").cast("long"))).collect()[0][0] + 86400
    ev = ev1
    for i in range(1, rep):
        ev = ev.unionByName(
            ev1.withColumn("ts", F.col("ts") + F.expr(f"make_dt_interval(0, 0, 0, {i * span})"))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
    ev = ev.repartition(32).persist()
    ev.count()

    # --- asof: union-2-instantiation vs single-scan tag projection ----
    def asof_old():
        p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id", "value")
        c = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
        noop(asof_join(p, c, ["user_id"], "ts", ["value"]))

    def asof_new():
        noop(asof_join_single_scan(
            ev, ["user_id"], "ts",
            left_filter=F.col("event_type") == "purchase",
            right_filter=F.col("event_type") == "click",
            left_extra_cols=["event_id", "value"], right_value_cols=["value"],
        ))

    bench_pair(f"asof@{rep}x", asof_old, asof_new, runs)

    # --- cohort: two-agg + join vs one distinct + window ----------------
    def cohort_old():
        first_week = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
        activity = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("active_week")).distinct()
        noop(
            activity.join(first_week, "user_id")
            .groupBy("cohort_week",
                     ((F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week")) / (7 * 86400)).cast("long").alias("weeks_since"))
            .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        )

    def cohort_new():
        from pyspark.sql import Window
        pairs = (ev.filter(F.col("user_id").isNotNull())
                 .select("user_id", F.date_trunc("week", F.col("ts")).alias("active_week")).distinct())
        cohorted = pairs.withColumn("cohort_week", F.min("active_week").over(Window.partitionBy("user_id")))
        noop(
            cohorted.groupBy("cohort_week",
                             ((F.unix_timestamp("active_week") - F.unix_timestamp("cohort_week")) / (7 * 86400)).cast("long").alias("weeks_since"))
            .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        )

    bench_pair(f"cohort@{rep}x", cohort_old, cohort_new, runs)
    ev.unpersist()

    # --- lapsed: subtract-2-scan vs flag aggregate ----------------------
    o1 = load_table(spark, sf, "orders")
    orders = o1
    for i in range(1, rep):
        orders = orders.unionByName(o1.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000)))
    orders = orders.repartition(32).persist()
    orders.count()

    def lapsed_old():
        def keys(y):
            return orders.filter(F.year("o_orderdate") == y).select(F.col("o_custkey").alias("custkey"))
        noop(keys(1996).subtract(keys(1997)))

    def lapsed_new():
        noop(lapsed_customers(orders, 1996, 1997))

    bench_pair(f"lapsed@{rep}x", lapsed_old, lapsed_new, runs)
    orders.unpersist()


if __name__ == "__main__":
    main()
