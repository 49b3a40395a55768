"""Serving-path latency smoke: p50/p95 of GET /api/data over the stdlib
HTTP shell, with an sf0.1-scale events table in the lake.

The REST surface is correctness-tested in tests/test_http_app.py; this
records its latency once per round (VERDICT r6 item 9).  The measured path
is the full serving edge: route → lake parquet scan → bounded preview →
sanitize/ISO-format → JSON encode — i.e. a Spark job per request, which is
the honest cost of serving straight off the lake (a real deployment fronts
this with a result cache or a serving store; the number here is the
uncached floor).

Usage: python tools/serving_bench.py [sf_dir] [n_requests]
Prints ONE JSON line: {"route": ..., "p50_ms": ..., "p95_ms": ..., ...}.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.http_app import serve
from real_time_financial_data_pipeline_spark.lake import DataLake
from real_time_financial_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("serving-bench")
    with tempfile.TemporaryDirectory() as root:
        lake = DataLake(spark, root)
        lake.save(load_table(spark, sf_dir, "events"), "events_bench", layer="bronze")
        server = serve(lake, port=0)  # ephemeral port
        url = f"http://127.0.0.1:{server.server_port}/api/data/bronze/events_bench?limit=100"
        try:
            for _ in range(3):  # warm-up: plan compile, reader init
                urllib.request.urlopen(url).read()
            samples = []
            for _ in range(n):
                t0 = time.perf_counter()
                body = urllib.request.urlopen(url).read()
                samples.append((time.perf_counter() - t0) * 1000)
            rows = len(json.loads(body))
        finally:
            server.shutdown()
        samples.sort()
        print(
            json.dumps(
                {
                    "route": "GET /api/data/{layer}/{name}?limit=100",
                    "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                    "requests": n,
                    "rows_per_response": rows,
                    "p50_ms": round(statistics.median(samples), 1),
                    "p95_ms": round(samples[int(0.95 * (n - 1))], 1),
                    "min_ms": round(samples[0], 1),
                    "max_ms": round(samples[-1], 1),
                }
            )
        )


if __name__ == "__main__":
    main()
