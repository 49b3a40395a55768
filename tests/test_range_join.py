"""Batch range/interval join: bucket-decomposition semantics and plan shape.

The ground truth everywhere is the naive inequality join (fine at test
size, the exact thing the operator exists to avoid at scale).
"""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.asof import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "pid long, key string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _intervals(spark, rows):
    return spark.createDataFrame(
        rows, "iid long, key string, w_start string, w_end string"
    ).select(
        "iid",
        "key",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
    )


def _naive(left, right, key=True, end_inclusive=False):
    cond = left.ts >= right.w_start
    cond &= left.ts <= right.w_end if end_inclusive else left.ts < right.w_end
    if key:
        cond &= left.key == right.key
    pairs = left.join(right, cond)
    return {(r.pid, r.iid) for r in pairs.select(left.pid, right.iid).collect()}


def test_range_join_matches_naive_keyed(spark):
    left = _points(
        spark,
        [
            (1, "a", "2024-01-01 06:00:00"),
            (2, "a", "2024-01-02 23:59:59"),
            (3, "a", "2024-01-05 00:00:00"),
            (4, "b", "2024-01-01 06:00:00"),
            (5, "a", "2023-12-31 23:59:59"),
        ],
    )
    right = _intervals(
        spark,
        [
            (10, "a", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
            (11, "a", "2024-01-02 12:00:00", "2024-01-02 13:00:00"),
            (12, "b", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
            (13, "a", "2024-01-05 00:00:00", "2024-01-06 00:00:00"),
        ],
    )
    out = range_join(
        left, right.withColumnRenamed("key", "key_r"), "ts", "w_start", "w_end"
    )  # keyless: every key pair allowed
    naive_keyless = _naive(left, right, key=False)
    assert {(r.pid, r.iid) for r in out.select("pid", "iid").collect()} == naive_keyless

    keyed = range_join(left, right, "ts", "w_start", "w_end", key_cols=["key"])
    assert {(r.pid, r.iid) for r in keyed.select("pid", "iid").collect()} == _naive(
        left, right
    )
    # boundary semantics: start inclusive, end exclusive by default
    assert (3, 13) in _naive(left, right)  # ts == start matches
    assert all(iid != 10 or pid != 3 for pid, iid in _naive(left, right))


def test_range_join_end_inclusive(spark):
    left = _points(spark, [(1, "a", "2024-01-03 00:00:00")])
    right = _intervals(
        spark, [(10, "a", "2024-01-01 00:00:00", "2024-01-03 00:00:00")]
    )
    assert range_join(left, right, "ts", "w_start", "w_end", key_cols=["key"]).count() == 0
    inc = range_join(
        left, right, "ts", "w_start", "w_end", key_cols=["key"], end_inclusive=True
    )
    assert [(r.pid, r.iid) for r in inc.select("pid", "iid").collect()] == [(1, 10)]


def test_range_join_random_parity_all_bucket_regimes(spark):
    """Intervals shorter than, equal to, and much longer than the bucket —
    plus duplicate points — against the naive join, at several grains."""
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, rng.choice(["a", "b"]), str(base + dt.timedelta(minutes=rng.randrange(0, 14 * 24 * 60))))
        for i in range(200)
    ]
    pts += [(200 + i, k, t) for i, (_, k, t) in enumerate(pts[:10])]  # dup ts rows
    ivs = []
    for j in range(60):
        start = base + dt.timedelta(minutes=rng.randrange(0, 13 * 24 * 60))
        length = rng.choice([5, 90, 60 * 24, 60 * 24 * 4])  # min .. 4 days
        ivs.append((j, rng.choice(["a", "b"]), str(start), str(start + dt.timedelta(minutes=length))))
    left, right = _points(spark, pts), _intervals(spark, ivs)
    want = _naive(left, right)
    for bucket in ["6 hours", "1 day", "3 days"]:
        got = range_join(
            left, right, "ts", "w_start", "w_end", key_cols=["key"], bucket=bucket
        )
        pairs = [(r.pid, r.iid) for r in got.select("pid", "iid").collect()]
        assert len(pairs) == len(set(pairs)), f"duplicate pairs at {bucket}"
        assert set(pairs) == want, f"mismatch at {bucket}"


def test_range_join_left_outer_keeps_unmatched(spark):
    left = _points(
        spark,
        [(1, "a", "2024-01-01 06:00:00"), (2, "a", "2030-01-01 00:00:00")],
    )
    right = _intervals(
        spark, [(10, "a", "2024-01-01 00:00:00", "2024-01-02 00:00:00")]
    )
    out = range_join(
        left, right, "ts", "w_start", "w_end", key_cols=["key"], how="left",
        left_id_col="pid",
    )
    rows = {r.pid: r.iid for r in out.collect()}
    assert rows == {1: 10, 2: None}
    with pytest.raises(ValueError, match="left_id_col"):
        range_join(left, right, "ts", "w_start", "w_end", how="left")


def test_range_join_drops_null_and_inverted_intervals(spark):
    left = _points(spark, [(1, "a", "2024-01-01 06:00:00")])
    right = _intervals(
        spark,
        [
            (10, "a", None, "2024-01-02 00:00:00"),
            (11, "a", "2024-01-01 00:00:00", None),
            (12, "a", "2024-01-02 00:00:00", "2024-01-01 00:00:00"),
            (13, "a", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
        ],
    )
    out = range_join(left, right, "ts", "w_start", "w_end", key_cols=["key"])
    assert [(r.pid, r.iid) for r in out.select("pid", "iid").collect()] == [(1, 13)]


def test_range_join_point_interval(spark):
    """Zero-length interval: empty half-open, a point when end-inclusive."""
    left = _points(spark, [(1, "a", "2024-01-01 06:00:00")])
    right = _intervals(
        spark, [(10, "a", "2024-01-01 06:00:00", "2024-01-01 06:00:00")]
    )
    assert range_join(left, right, "ts", "w_start", "w_end", key_cols=["key"]).count() == 0
    assert (
        range_join(
            left, right, "ts", "w_start", "w_end", key_cols=["key"], end_inclusive=True
        ).count()
        == 1
    )


def test_range_join_collision_and_bad_args(spark):
    left = _points(spark, [(1, "a", "2024-01-01 06:00:00")])
    right = _intervals(
        spark, [(10, "a", "2024-01-01 00:00:00", "2024-01-02 00:00:00")]
    ).withColumnRenamed("iid", "pid")
    with pytest.raises(ValueError, match="collision"):
        range_join(left, right, "ts", "w_start", "w_end", key_cols=["key"])
    with pytest.raises(ValueError, match="how"):
        range_join(left, left.withColumnRenamed("pid", "x"), "ts", "ts", "ts", how="full")
    with pytest.raises(Exception, match="positive interval"):
        range_join(
            left,
            right.withColumnRenamed("pid", "iid"),
            "ts",
            "w_start",
            "w_end",
            key_cols=["key"],
            bucket="0 seconds",
        )


def test_range_join_bucket_blowup_guard(spark):
    left = _points(spark, [(1, "a", "2024-06-01 00:00:00")])
    right = _intervals(
        spark, [(10, "a", "2024-01-01 00:00:00", "2025-01-01 00:00:00")]
    )
    with pytest.raises(Exception, match="coarsen the bucket"):
        range_join(
            left, right, "ts", "w_start", "w_end", key_cols=["key"],
            bucket="1 minute", max_buckets_per_interval=1000,
        ).count()
    # same grain, generous cap: fine
    assert (
        range_join(
            left, right, "ts", "w_start", "w_end", key_cols=["key"], bucket="30 days"
        ).count()
        == 1
    )


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    """The whole point: the executed plan must be a hash join on the
    bucket key — never BroadcastNestedLoopJoin or CartesianProduct,
    which is what the raw inequality predicate plans as."""
    left = _points(spark, [(i, "a", "2024-01-01 06:00:00") for i in range(5)])
    right = _intervals(
        spark, [(10, "a", "2024-01-01 00:00:00", "2024-01-02 00:00:00")]
    )
    plan = (
        range_join(left, right, "ts", "w_start", "w_end", key_cols=["key"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "_rj_bucket" in plan  # the equality conjunct Catalyst joins on
    naive_plan = (
        left.join(right, (left.ts >= right.w_start) & (left.ts < right.w_end))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # what we are avoiding: the raw predicate plans as a product join
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_range_join_numeric_band(spark):
    """Numeric bucket: price-into-price-band join, same decomposition."""
    left = spark.createDataFrame(
        [(1, 5.0), (2, 17.5), (3, 99.9), (4, -3.0)], "pid long, price double"
    )
    bands = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 10.0, 50.0), (12, 15.0, 20.0)],
        "iid long, lo double, hi double",
    )
    out = range_join(left, bands, "price", "lo", "hi", bucket=7)
    got = {(r.pid, r.iid) for r in out.select("pid", "iid").collect()}
    assert got == {(1, 10), (2, 11), (2, 12)}


def test_stream_range_join_matches_batch(spark, tmp_path):
    """Stream-static range join drains to exactly the batch result, and
    the guards reject wrong-side streaming inputs."""
    from real_time_financial_data_pipeline_spark.streaming.joins import (
        stream_range_join,
    )

    pts = _points(
        spark,
        [
            (1, "a", "2024-01-01 06:00:00"),
            (2, "a", "2024-01-02 23:59:59"),
            (3, "b", "2024-01-01 06:00:00"),
            (4, "a", "2024-01-09 00:00:00"),
        ],
    )
    ivs = _intervals(
        spark,
        [
            (10, "a", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
            (11, "b", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
            (12, "a", "2024-01-08 12:00:00", "2024-01-10 00:00:00"),
        ],
    )
    src = tmp_path / "pts"
    pts.write.parquet(str(src))
    stream = spark.readStream.schema(pts.schema).parquet(str(src))

    q = (
        stream_range_join(stream, ivs, "ts", "w_start", "w_end", key_cols=["key"])
        .writeStream.format("memory")
        .queryName("rj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {(r.pid, r.iid) for r in spark.table("rj_stream").collect()}
    want = {
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "ts", "w_start", "w_end", key_cols=["key"])
        .select("pid", "iid")
        .collect()
    }
    assert got == want == {(1, 10), (2, 10), (3, 11), (4, 12)}

    with pytest.raises(ValueError, match="must be a streaming"):
        stream_range_join(pts, ivs, "ts", "w_start", "w_end")
    with pytest.raises(ValueError, match="must be static"):
        stream_range_join(stream, stream, "ts", "w_start", "w_end")
