"""Custom stateful streaming + skew utilities."""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_financial_data_pipeline_spark.plans.skew import salt_aggregate, salted_join
from real_time_financial_data_pipeline_spark.streaming.stateful import running_stats


def test_running_stats_state_accumulates_across_batches(spark, events, tmp_path):
    """Two file drops -> two micro-batches; final state must equal the batch
    aggregate over ALL rows (state survived between triggers)."""
    src = tmp_path / "src"
    first = events.filter(F.col("event_id") < 500)
    second = events.filter(F.col("event_id") >= 500)
    first.write.parquet(str(src / "d1"))
    second.write.parquet(str(src / "d2"))
    schema = spark.read.parquet(str(src / "d1")).schema

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src / "*"))
    )
    q = (
        running_stats(stream)
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    # memory sink in update mode appends one row per key per batch: the LAST
    # row per key is the final state
    final = {
        r.key: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_events DESC) rn FROM running) WHERE rn = 1"
        ).collect()
    }
    expected = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.max("value").alias("mx"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for k, e in expected.items():
        f = final[k]
        assert f.n_events == e.n and abs(f.total - e.total) < 1e-6 and f.max_value == e.mx
        assert f.last_ts == e.last_ts


def test_running_stats_last_ts_survives_across_batches(spark, events, tmp_path):
    """The LAST micro-batch contains only EARLIER timestamps than the first,
    so the final emitted last_ts is correct only if it was carried in the
    state store across micro-batches — not recomputed batch-locally.
    maxFilesPerTrigger=1 + forced distinct mtimes pin the batch order."""
    import os
    import time

    src = tmp_path / "src2"
    src.mkdir()
    late = events.filter(F.col("ts") >= "2024-01-15")
    early = events.filter(F.col("ts") < "2024-01-15")
    assert late.count() > 0 and early.count() > 0
    late.coalesce(1).write.parquet(str(src / "b1"))
    early.coalesce(1).write.parquet(str(src / "b2"))
    now = time.time()
    for d, mtime in (("b1", now - 600), ("b2", now)):  # b1 strictly older
        for f in (src / d).glob("*.parquet"):
            os.utime(f, (mtime, mtime))
    schema = spark.read.parquet(str(src / "b1")).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        running_stats(stream)
        .writeStream.format("memory")
        .queryName("run_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)

    expected_last = {
        r.event_type: r.mx
        for r in events.groupBy("event_type").agg(F.max("ts").alias("mx")).collect()
    }
    expected_n = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # final state per key = the emitted row with the highest running count
    final = {
        r.key: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_events DESC) rn"
            " FROM run_state) WHERE rn = 1"
        ).collect()
    }
    assert set(final) == set(expected_last)
    for k, row in final.items():
        assert row.n_events == expected_n[k], k  # both batches seen
        assert row.last_ts == expected_last[k], k  # late batch's max, via state


def test_rocksdb_state_store_runs_stateful_query(spark, events, tmp_path):
    """r11 scale posture: the stateful streaming family on the RocksDB
    state store (bounded executor memory at 100× key cardinality) — the
    knob maps to the right provider class, a REAL stateful query runs
    under it (provider engagement proven by rocksdb* state metrics in the
    query progress, not just the conf string), and results equal the
    in-memory-provider run."""
    import pytest

    from real_time_financial_data_pipeline_spark.session import state_store_conf

    conf = state_store_conf("rocksdb")
    key = "spark.sql.streaming.stateStore.providerClass"
    assert conf[key].endswith("RocksDBStateStoreProvider")
    assert state_store_conf("hdfs")[key].endswith("HDFSBackedStateStoreProvider")
    with pytest.raises(ValueError, match="unknown state_store"):
        state_store_conf("magnetic-tape")

    src = tmp_path / "rsrc"
    events.limit(2000).write.parquet(str(src / "d1"))
    schema = spark.read.parquet(str(src / "d1")).schema
    expected = {
        (r.event_type, r.n)
        for r in spark.read.parquet(str(src / "d1"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    prev = spark.conf.get(key, None)
    spark.conf.set(key, conf[key])
    try:
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = (
            stream.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("rocks_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "rckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = {(r.event_type, r.n) for r in spark.table("rocks_counts").collect()}
        assert got == expected
        # the provider really engaged: RocksDB-specific state metrics
        # appear in the stateful operator's progress
        ops = q.lastProgress["stateOperators"]
        assert ops and any(
            m.startswith("rocksdb") for m in ops[0]["customMetrics"]
        ), ops
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_resolve_dup_clusters_custom_id_col_and_convergence(spark):
    """Distributed path honors id_col aliasing and raises instead of emitting
    wrong components when the diameter exceeds the round budget."""
    import pytest

    from real_time_financial_data_pipeline_spark.operators.dedup import resolve_dup_clusters

    # a 6-node chain: diameter 5
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    out = resolve_dup_clusters(chain, driver_threshold=0, id_col="item_id")
    assert set(out.columns) == {"item_id", "canonical_id"}
    assert {r.canonical_id for r in out.collect()} == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        resolve_dup_clusters(chain, driver_threshold=0, max_rounds=1)


def test_salt_aggregate_matches_plain_aggregate(events):
    plain = {
        (r.event_type,): (r.n, round(r.s, 6))
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, round(r.s, 6))
        for r in salt_aggregate(
            events,
            ["event_type"],
            partial_aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")],
            final_aggs=[F.sum("n").alias("n"), F.sum("s").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark, events):
    dim = spark.createDataFrame(
        [("click", "c"), ("error", "e"), ("purchase", "p"), ("signup", "s"), ("view", "v")],
        "event_type string, code string",
    )
    plain = events.join(dim, "event_type").groupBy("code").count()
    salted = salted_join(events, dim, "event_type").groupBy("code").count()
    assert {(r.code, r["count"]) for r in plain.collect()} == {
        (r.code, r["count"]) for r in salted.collect()
    }


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge-join with zero
    Exchange operators in the physical plan."""
    from real_time_financial_data_pipeline_spark.catalog import load_table
    from real_time_financial_data_pipeline_spark.lake import DataLake

    lake = DataLake(spark, str(tmp_path / "blake"))
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    od = load_table(spark, "/root/testdata/sf0.001", "orders")
    lake.save_bucketed(li, "lineitem_b", "l_orderkey", 8)
    lake.save_bucketed(od, "orders_b", "o_orderkey", 8)

    joined = lake.read_table("lineitem_b").join(
        lake.read_table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_batch_sessionize_equals_streaming(spark, events):
    """Batch gaps-and-islands sessionization aggregated to session stats
    must EQUAL the streaming session_window aggregate drained over the same
    static backlog — the batch-backfill ≡ live-stream guarantee that
    previously rode on the two queries sharing one oracle definition
    (the duplicate oracle row was retired in the r8 registry rotation)."""
    import pyspark.sql.functions as F

    from real_time_financial_data_pipeline_spark.operators.query import sessionize
    from real_time_financial_data_pipeline_spark.streaming.aggregates import (
        run_stream_to_memory,
        session_stats,
    )

    sess = sessionize(events, ["user_id"], "ts", gap="30 minutes")
    batch = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 minutes")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("session_id")
        .collect()
    )

    # replay the same static events as a file stream
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        events.write.mode("overwrite").parquet(f"{d}/src")
        schema = spark.read.parquet(f"{d}/src").schema
        stream = spark.readStream.schema(schema).parquet(f"{d}/src")
        run_stream_to_memory(
            session_stats(stream), "batch_vs_stream_sessions"
        ).awaitTermination(120)
        got = spark.table("batch_vs_stream_sessions").collect()

    key = lambda r: (r.user_id, r.session_start)
    assert sorted(got, key=key) == sorted(batch, key=key)
