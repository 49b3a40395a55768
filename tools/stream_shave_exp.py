"""One-off experiment: where does stream_tumbling_daily's drain wall go,
and how much does pinning the stream's shuffle/state partitions save?

Runs the bench twin at sf0.1 with state-partition counts {32 (current),
8, 4, 1} x 4 reps (1 warm-up discarded) and prints medians.  Not part of
the suite — evidence for the r16 structural shave.
"""
from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from real_time_financial_data_pipeline_spark.session import get_spark
from real_time_financial_data_pipeline_spark.streaming.aggregates import tumbling_ohlc
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.1"


def drain(spark, n_parts: int, tag: str) -> tuple[float, int]:
    ck = f"/dev/shm/rtfdp_exp_ck/{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    os.makedirs(ck, exist_ok=True)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        t0 = time.perf_counter()
        agg = tumbling_ohlc(entrymod._events_stream(spark, SF_DIR))
        q = (
            agg.writeStream.format("memory")
            .queryName(tag)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        n = spark.table(tag).count()
        return wall, n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main():
    spark = get_spark("stream-shave-exp")
    seq = [0]
    for n_parts in (32, 8, 4, 1, 32):
        samples = []
        nrows = None
        for rep in range(4):
            seq[0] += 1
            wall, n = drain(spark, n_parts, f"exp_{seq[0]}")
            nrows = n
            if rep > 0:  # first rep is warm-up
                samples.append(wall)
        print(
            f"state_partitions={n_parts}: median={statistics.median(samples):.3f}s "
            f"min={min(samples):.3f} max={max(samples):.3f} rows={nrows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
