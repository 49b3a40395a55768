"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "spread": {name: [min, max]},
"runs": N, "sf": ...}.

Hygiene: each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and the
reported per-query number is the MEDIAN; min/max per query go to "spread".
The first execution of a query pays one-off costs (plan compilation,
Python-worker fork for Arrow UDF stages) that a long-lived cluster
amortizes, and single-shot wall times on a shared box drift 20-40% run to
run — the median is the stable signal.  "value" is the sum of medians.

Each query is materialized with the noop sink (full plan execution, no
driver collect).  Streaming queries execute inside their callable
(availableNow drain) — their cost is the stream run itself.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_financial_data_pipeline_spark.session import get_spark

import __spark_entry__ as entrymod

# Headline set — FROZEN since round 1 (BASELINE.md "Operative baseline"):
# the reference-parity analytical core + joins + LLM-pipeline ops +
# streaming — the queries whose 100 TB behavior matters most.
HEADLINE = [
    "ohlcv_daily",
    "ohlcv_monthly",
    "clean_events",
    "moving_average_7",
    "correlation_click_purchase",
    "latest_per_user",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "order_priority_counts",
    "token_stats",
    "quality_score",
    "dedup_exact_docs",
    "minhash_pairs",
    "ann_cosine_topk",
    "asof_purchase_click",
    "gap_fill_daily",
    "value_percentiles",
    "revenue_rollup",
    "stream_tumbling_daily",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("rtfdp-bench")

    qs = entrymod.queries()
    # warm-up: session/codegen/readers, not measured (the bounded preview is
    # no longer a registry entry — call its helper directly)
    entrymod._preview_events(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # staged-oracle queries append a coalesce(1) parquet write so DuckDB can
    # read the candidate set back — verification plumbing, not operator work.
    # Bench the un-staged operator instead (BENCH_OVERRIDES).
    fns = {**qs, **entrymod.BENCH_OVERRIDES}

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        # One UNMEASURED warm-up execution per query (scale-probe protocol):
        # the first run carries plan compilation + Python-worker fork, which
        # a long-lived cluster amortizes; without this, 2-of-3 cold samples
        # on a loaded host poison a median-of-3 (the r15 gap_fill_daily
        # pattern: cold 3.3 s vs warm 0.7-0.9 s).
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fns[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs": runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
