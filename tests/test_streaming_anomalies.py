"""Streaming anomaly screen (streaming/anomalies.py): batch-parity with
operators.finance.detect_price_anomalies across micro-batches, planted
spike/stale detection, and the out-of-order drop contract."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.finance import (
    detect_price_anomalies,
)
from real_time_financial_data_pipeline_spark.streaming.anomalies import (
    stream_anomalies,
)


def _bars(spark, series: dict[str, list[float]]):
    rows = [
        (key, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(v))
        for key, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, day timestamp, close double")


def _run_stream(spark, tmp_path, bars, cut, **kw):
    src = tmp_path / "bars"
    bars.filter(F.col("day") < F.lit(cut)).coalesce(1).write.parquet(str(src / "f1"))
    bars.filter(F.col("day") >= F.lit(cut)).coalesce(1).write.parquet(str(src / "f2"))
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_anomalies(stream, key_col="sym", **kw)
        .writeStream.format("memory")
        .queryName("anomaly_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    return spark.table("anomaly_stream").toPandas()


class TestStreamAnomalies:
    def test_matches_batch_across_micro_batches(self, spark, tmp_path):
        """Every emitted row must equal the batch window pass's row: the
        trailing-return state has to survive the state store between the
        two triggers."""
        rng = np.random.default_rng(5)
        series = {
            "A": (100 + np.cumsum(rng.normal(0, 2, 40))).tolist(),
            "B": (40 + np.cumsum(rng.normal(0, 1, 40))).tolist(),
        }
        # plant a spike and a stale run well inside symbol A
        series["A"][25] = series["A"][24] * 1.8
        series["B"][20:24] = [series["B"][19]] * 4
        bars = _bars(spark, series)
        batch = (
            detect_price_anomalies(bars, ["sym"], z_window=10, z_threshold=3.0)
            .toPandas()
            .sort_values(["sym", "day"], ignore_index=True)
        )
        got = _run_stream(
            spark, tmp_path, bars, dt.datetime(2024, 1, 21),
            z_window=10, z_threshold=3.0,
        ).rename(columns={"key": "sym"}).sort_values(["sym", "day"], ignore_index=True)

        assert len(got) == len(batch) == 80
        assert (got["sym"] == batch["sym"]).all()
        for c in ("log_return", "z_score"):
            # JVM Math.log and libm log differ by 1 ulp on some inputs
            # (measured: <=1.2e-16 abs on this series), so parity is
            # tight-tolerance, not bitwise, unlike the shared-kernel
            # stream_ema twin
            np.testing.assert_allclose(
                batch[c].to_numpy(dtype=float),
                got[c].to_numpy(dtype=float),
                rtol=1e-9, atol=1e-12, equal_nan=True, err_msg=c,
            )
        assert (got["stale_run"] == batch["stale_run"]).all()
        for c in ("is_spike", "is_stale"):
            bv, gv = batch[c], got[c]
            assert ((bv == gv) | (bv.isna() & gv.isna())).all(), c
        # the planted anomalies actually fire on both paths
        assert got[got.sym == "A"]["is_spike"].eq(True).any()
        assert got[got.sym == "B"]["is_stale"].any()

    def test_out_of_order_bar_dropped(self, spark, tmp_path):
        src = tmp_path / "bars"
        d = dt.datetime(2024, 1, 1)
        f1 = [("A", d + dt.timedelta(days=i), 100.0 + i) for i in range(5)]
        # second file replays day 2 (dup) and adds day 5
        f2 = [("A", d + dt.timedelta(days=2), 999.0),
              ("A", d + dt.timedelta(days=5), 105.0)]
        schema = "sym string, day timestamp, close double"
        spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(src / "f1"))
        spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(src / "f2"))
        stream = (
            spark.readStream.schema(spark.read.parquet(str(src / "f1")).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream_anomalies(stream, key_col="sym", z_window=5)
            .writeStream.format("memory")
            .queryName("ooo_anomaly")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("ooo_anomaly").toPandas()
        assert len(got) == 6  # replayed day-2 bar dropped
        assert 999.0 not in set(got["close"])

    def test_stale_run_increments_and_resets(self, spark, tmp_path):
        series = {"A": [10.0, 10.0, 10.0, 11.0, 11.0]}
        got = _run_stream(
            spark, tmp_path, _bars(spark, series), dt.datetime(2024, 1, 3),
            stale_min_run=3,
        ).sort_values("day", ignore_index=True)
        assert got["stale_run"].tolist() == [1, 2, 3, 1, 2]
        assert got["is_stale"].tolist() == [False, False, True, False, False]


class TestStreamAnchoredVwap:
    def test_matches_batch_on_ordered_ticks(self, spark, tmp_path):
        """Running VWAP state (3 scalars/key) must survive the state store
        and reset at the day boundary, matching the batch window pass on
        strictly-increasing tick times."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            anchored_vwap,
        )
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_anchored_vwap,
        )

        rng = np.random.default_rng(13)
        rows = []
        for sym in ("A", "B"):
            for day in (1, 2):
                for i in range(30):
                    ts = dt.datetime(2024, 3, day, 9, 0) + dt.timedelta(minutes=i)
                    rows.append(
                        (sym, ts, float(100 + rng.normal(0, 1)), float(rng.integers(0, 300)))
                    )
        ticks = spark.createDataFrame(
            rows, "sym string, ts timestamp, price double, size double"
        )
        batch = (
            anchored_vwap(ticks, "ts", "price", "size", ["sym"], anchor="D")
            .toPandas()
            .sort_values(["sym", "ts"], ignore_index=True)
        )
        src = tmp_path / "ticks"
        cut = dt.datetime(2024, 3, 2)
        ticks.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(str(src / "f1"))
        ticks.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(str(src / "f2"))
        stream = (
            spark.readStream.schema(spark.read.parquet(str(src / "f1")).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream_anchored_vwap(stream, key_col="sym")
            .writeStream.format("memory")
            .queryName("vwap_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.table("vwap_stream")
            .toPandas()
            .rename(columns={"key": "sym"})
            .sort_values(["sym", "ts"], ignore_index=True)
        )
        assert len(got) == len(batch) == 120
        bv = batch["vwap"].to_numpy(dtype=float)
        gv = got["vwap"].to_numpy(dtype=float)
        assert ((bv == gv) | (np.isnan(bv) & np.isnan(gv))).all()
        # day-2 reset: first tick of each (sym, day-2) equals its own price
        for sym in ("A", "B"):
            first = got[(got.sym == sym) & (got.ts >= cut)].iloc[0]
            if first["size"] > 0:
                assert first["vwap"] == first["price"]

    def test_null_price_and_size_match_batch(self, spark, tmp_path):
        """A null price must not poison the running notional (batch skips
        the null product but still counts the size into volume); a null
        size contributes to neither sum."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            anchored_vwap,
        )
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_anchored_vwap,
        )

        d = dt.datetime(2024, 3, 1, 9, 0)
        rows = [
            ("A", d, 10.0, 5.0),
            ("A", d + dt.timedelta(minutes=1), None, 3.0),   # null price
            ("A", d + dt.timedelta(minutes=2), 12.0, None),  # null size
            ("A", d + dt.timedelta(minutes=3), 11.0, 2.0),
        ]
        ticks = spark.createDataFrame(
            rows, "sym string, ts timestamp, price double, size double"
        )
        batch = (
            anchored_vwap(ticks, "ts", "price", "size", ["sym"], anchor="D")
            .toPandas().sort_values("ts", ignore_index=True)
        )
        src = tmp_path / "ticks"
        ticks.coalesce(1).write.parquet(str(src / "f1"))
        stream = spark.readStream.schema(
            spark.read.parquet(str(src / "f1")).schema
        ).parquet(str(src / "*"))
        q = (
            stream_anchored_vwap(stream, key_col="sym")
            .writeStream.format("memory").queryName("vwap_null_stream")
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt")).start()
        )
        q.awaitTermination(120)
        got = spark.table("vwap_null_stream").toPandas().sort_values("ts", ignore_index=True)
        bv = batch["vwap"].to_numpy(dtype=float)
        gv = got["vwap"].to_numpy(dtype=float)
        assert ((bv == gv) | (np.isnan(bv) & np.isnan(gv))).all()
        # sanity: the null-price tick's size DID move the denominator
        assert got["vwap"].iloc[1] == (10.0 * 5.0) / 8.0


class TestNullClose:
    def test_null_close_matches_batch(self, spark, tmp_path):
        """A null close must not poison the recurrence: null return/z,
        stale run continues through the gap, next bar starts a fresh run
        — exactly the batch window pass's null semantics."""
        series_days = [10.0, 10.0, None, 10.0, 11.0, 11.0, 11.0]
        d = dt.datetime(2024, 1, 1)
        rows = [
            ("A", d + dt.timedelta(days=i), v) for i, v in enumerate(series_days)
        ]
        bars = spark.createDataFrame(rows, "sym string, day timestamp, close double")
        batch = (
            detect_price_anomalies(bars, ["sym"], z_window=5, stale_min_run=3)
            .toPandas().sort_values("day", ignore_index=True)
        )
        got = _run_stream(
            spark, tmp_path, bars, dt.datetime(2024, 1, 4),
            z_window=5, stale_min_run=3,
        ).sort_values("day", ignore_index=True)
        assert (got["stale_run"] == batch["stale_run"]).all()
        for c in ("log_return", "z_score"):
            bv = batch[c].to_numpy(dtype=float)
            gv = got[c].to_numpy(dtype=float)
            assert ((bv == gv) | (np.isnan(bv) & np.isnan(gv))).all(), c
        assert (got["is_stale"] == batch["is_stale"]).all()
        bs, gs = batch["is_spike"], got["is_spike"]
        assert ((bs == gs) | (bs.isna() & gs.isna())).all()
        # the stale run survives the gap: [1,2,3,1,1,2,3] per the batch rule
        assert got["stale_run"].tolist() == [1, 2, 3, 1, 1, 2, 3]


class TestStreamActivityBars:
    def test_closed_bars_match_batch(self, spark, tmp_path):
        """Drained-backlog parity: every CLOSED streaming bar equals the
        batch activity_bars row; each key's final (still-open) bar stays
        in state."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
        )
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_activity_bars,
        )

        rng = np.random.default_rng(7)
        d = dt.datetime(2024, 2, 1, 9, 30)
        rows = []
        for sym in ("A", "B"):
            for i in range(150):
                rows.append(
                    (sym, d + dt.timedelta(seconds=i),
                     float(100 + rng.normal(0, 1)), float(rng.integers(1, 30)))
                )
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        batch = (
            activity_bars(ticks, 300.0, "volume")
            .toPandas().sort_values(["event_type", "bar_id"], ignore_index=True)
        )
        src = tmp_path / "ticks"
        cut = d + dt.timedelta(seconds=75)
        ticks.filter(F.col("ts") < F.lit(cut)).coalesce(1).write.parquet(str(src / "f1"))
        ticks.filter(F.col("ts") >= F.lit(cut)).coalesce(1).write.parquet(str(src / "f2"))
        stream = (
            spark.readStream.schema(spark.read.parquet(str(src / "f1")).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream_activity_bars(stream, 300.0, "volume")
            .writeStream.format("memory").queryName("bars_stream")
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt")).start()
        )
        q.awaitTermination(120)
        got = (
            spark.table("bars_stream").toPandas()
            .rename(columns={"key": "event_type"})
            .sort_values(["event_type", "bar_id"], ignore_index=True)
        )
        # stream emits every batch bar except each key's final open one
        for sym in ("A", "B"):
            b = batch[batch.event_type == sym].reset_index(drop=True)
            g = got[got.event_type == sym].reset_index(drop=True)
            assert len(g) == len(b) - 1
            for col in ("bar_id", "n_ticks"):
                assert (g[col] == b[col].iloc[:-1].to_numpy()).all(), col
            for col in ("open", "high", "low", "close", "vwap", "volume"):
                np.testing.assert_allclose(
                    g[col].to_numpy(dtype=float),
                    b[col].iloc[:-1].to_numpy(dtype=float),
                    rtol=1e-12, err_msg=col,
                )
            assert (g["open_ts"] == b["open_ts"].iloc[:-1].to_numpy()).all()
            assert (g["close_ts"] == b["close_ts"].iloc[:-1].to_numpy()).all()

    def test_bad_args(self, spark):
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_activity_bars,
        )

        stream = spark.readStream.format("rate").load().selectExpr(
            "'A' AS event_type", "timestamp AS ts",
            "CAST(value AS double) AS price", "1.0 AS size"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            stream_activity_bars(stream, 0)
        with _pytest.raises(ValueError):
            stream_activity_bars(stream, 10, by="trades")

    def test_tied_timestamps_processed_not_dropped(self, spark, tmp_path):
        """Regression (review): ticks tied on the timestamp must all fold
        into the bars (only an exact duplicate (ts, price, size) print is
        a replay) — parity with batch on a tie-heavy feed."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
        )
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_activity_bars,
        )

        d = dt.datetime(2024, 2, 1, 9, 30)
        rows = []
        rng = np.random.default_rng(3)
        for i in range(40):
            ts = d + dt.timedelta(seconds=i // 2)  # every timestamp tied twice
            rows.append(("A", ts, float(100 + rng.normal(0, 1)), float(rng.integers(1, 10))))
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        batch = (
            activity_bars(ticks, 40.0, "volume")
            .toPandas().sort_values("bar_id", ignore_index=True)
        )
        src = tmp_path / "ticks"
        ticks.coalesce(1).write.parquet(str(src / "f1"))
        stream = spark.readStream.schema(
            spark.read.parquet(str(src / "f1")).schema
        ).parquet(str(src / "*"))
        q = (
            stream_activity_bars(stream, 40.0, "volume")
            .writeStream.format("memory").queryName("tied_bars")
            .outputMode("append").trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt")).start()
        )
        q.awaitTermination(120)
        got = spark.table("tied_bars").toPandas().sort_values("bar_id", ignore_index=True)
        assert len(got) == len(batch) - 1  # all closed bars present
        assert int(got["n_ticks"].sum()) + int(batch["n_ticks"].iloc[-1]) == 40
        for col in ("volume", "open", "close"):
            np.testing.assert_allclose(
                got[col].to_numpy(dtype=float),
                batch[col].iloc[:-1].to_numpy(dtype=float), rtol=1e-12, err_msg=col,
            )
