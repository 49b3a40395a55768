"""Technical-indicator operators (operators/finance.py): pandas/numpy
reference parity, recurrence-seed edge cases, and plan-shape asserts."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.finance import (
    ANNUALIZE_DAILY,
    _ema_alpha,
    daily_close_bars,
    recursive_indicators,
    window_indicators,
)


def _bars_df(spark, series: dict[str, list[float]]):
    rows = [
        (key, dt.date(2024, 1, 1) + dt.timedelta(days=i), float(v))
        for key, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "sym string, day date, close double")


def _py_recursive(xs: list[float], fast=12, slow=26, signal=9, rsi_n=14):
    """Independent scalar-Python reference for the EMA/MACD/RSI recurrences."""
    af, asl, asg = _ema_alpha(fast), _ema_alpha(slow), _ema_alpha(signal)
    ef = es = xs[0]
    sig = 0.0
    ag = al = None
    out = [(ef, es, 0.0, sig, None)]
    for i in range(1, len(xs)):
        ef = af * xs[i] + (1 - af) * ef
        es = asl * xs[i] + (1 - asl) * es
        macd = ef - es
        sig = asg * macd + (1 - asg) * sig
        g, l = max(xs[i] - xs[i - 1], 0.0), max(xs[i - 1] - xs[i], 0.0)
        if ag is None:
            ag, al = g, l
        else:
            ag = (ag * (rsi_n - 1) + g) / rsi_n
            al = (al * (rsi_n - 1) + l) / rsi_n
        rsi = 100.0 * ag / (ag + al) if ag + al > 0 else None
        out.append((ef, es, macd, sig, rsi))
    return out


class TestWindowIndicators:
    def test_matches_pandas_reference(self, spark):
        rng = np.random.default_rng(7)
        xs = (100 + np.cumsum(rng.normal(0, 2, 60))).tolist()
        bars = _bars_df(spark, {"A": xs})
        got = (
            window_indicators(bars, ["sym"], band_window=20, vol_window=10)
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        s = pd.Series(xs)
        sma = s.rolling(20, min_periods=1).mean()
        sd = s.rolling(20, min_periods=2).std()
        lr = np.log(s / s.shift(1))
        vol = lr.rolling(10, min_periods=2).std() * ANNUALIZE_DAILY
        run_max = s.cummax()
        assert np.allclose(got["sma"], sma, rtol=1e-9)
        assert np.allclose(got["boll_up"].iloc[1:], (sma + 2 * sd).iloc[1:], rtol=1e-9)
        assert np.allclose(got["boll_dn"].iloc[1:], (sma - 2 * sd).iloc[1:], rtol=1e-9)
        assert np.allclose(got["log_return"].iloc[1:], lr.iloc[1:], rtol=1e-12)
        assert np.allclose(got["volatility"].iloc[2:], vol.iloc[2:], rtol=1e-9)
        sharpe = (
            lr.rolling(10, min_periods=2).mean()
            / lr.rolling(10, min_periods=2).std()
            * ANNUALIZE_DAILY
        )
        assert np.allclose(got["sharpe"].iloc[2:], sharpe.iloc[2:], rtol=1e-9)
        assert np.allclose(got["run_max"], run_max, rtol=0)
        assert np.allclose(got["drawdown"], s / run_max - 1.0, rtol=1e-12)

    def test_underfilled_frames_are_null(self, spark):
        bars = _bars_df(spark, {"A": [10.0]})
        row = window_indicators(bars, ["sym"]).toPandas().iloc[0]
        assert row["sma"] == 10.0  # frame of one: mean defined
        assert pd.isna(row["boll_up"]) and pd.isna(row["boll_dn"])
        assert pd.isna(row["log_return"]) and pd.isna(row["volatility"])
        assert row["run_max"] == 10.0 and row["drawdown"] == 0.0

    def test_keys_do_not_leak_across_partitions(self, spark):
        bars = _bars_df(spark, {"A": [10.0, 20.0], "B": [1000.0, 500.0]})
        got = window_indicators(bars, ["sym"]).toPandas()
        a = got[got.sym == "A"].sort_values("day")
        assert pytest.approx(a["log_return"].iloc[1]) == math.log(2.0)
        b = got[got.sym == "B"].sort_values("day")
        assert b["drawdown"].iloc[1] == pytest.approx(-0.5)

    def test_single_exchange_plan(self, spark):
        bars = _bars_df(spark, {"A": [1.0, 2.0, 3.0]})
        plan = window_indicators(bars, ["sym"])._jdf.queryExecution().executedPlan().toString()
        # chained Window specs share (partition, order): exactly one shuffle
        assert plan.count("Exchange") == 1


class TestRecursiveIndicators:
    def test_matches_python_reference(self, spark):
        rng = np.random.default_rng(11)
        series = {
            "A": (100 + np.cumsum(rng.normal(0, 2, 50))).tolist(),
            "B": (50 + np.cumsum(rng.normal(0, 1, 35))).tolist(),
        }
        got = recursive_indicators(_bars_df(spark, series), ["sym"]).toPandas()
        for sym, xs in series.items():
            g = got[got.sym == sym].sort_values("day", ignore_index=True)
            ref = _py_recursive(xs)
            for i, (ef, es, macd, sig, rsi) in enumerate(ref):
                assert g["ema_fast"].iloc[i] == pytest.approx(ef, rel=1e-12)
                assert g["ema_slow"].iloc[i] == pytest.approx(es, rel=1e-12)
                assert g["macd"].iloc[i] == pytest.approx(macd, abs=1e-9)
                assert g["macd_signal"].iloc[i] == pytest.approx(sig, abs=1e-9)
                if rsi is None:
                    assert pd.isna(g["rsi"].iloc[i])
                else:
                    assert g["rsi"].iloc[i] == pytest.approx(rsi, rel=1e-12)

    def test_ema_matches_pandas_ewm(self, spark):
        xs = [100.0, 101.5, 99.0, 102.0, 104.0, 103.0]
        got = (
            recursive_indicators(_bars_df(spark, {"A": xs}), ["sym"], fast=12, slow=26)
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        ewm = pd.Series(xs).ewm(span=12, adjust=False).mean()
        assert np.allclose(got["ema_fast"], ewm, rtol=1e-12)

    def test_flat_series_rsi_null_macd_zero(self, spark):
        got = (
            recursive_indicators(_bars_df(spark, {"A": [5.0] * 10}), ["sym"])
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        assert got["rsi"].isna().all()
        assert (got["macd"] == 0.0).all() and (got["macd_signal"] == 0.0).all()

    def test_monotonic_up_rsi_100(self, spark):
        got = (
            recursive_indicators(_bars_df(spark, {"A": [1.0, 2.0, 3.0, 4.0]}), ["sym"])
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        assert (got["rsi"].iloc[1:] == 100.0).all()

    def test_single_exchange_plan(self, spark):
        bars = _bars_df(spark, {"A": [1.0, 2.0]})
        plan = recursive_indicators(bars, ["sym"])._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestReturnsCorrelation:
    def test_matches_numpy_corrcoef(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            returns_correlation,
        )

        rng = np.random.default_rng(5)
        base = rng.normal(0, 1, 41)
        series = {
            "A": (100 + np.cumsum(base)).tolist(),
            "B": (50 + np.cumsum(0.7 * base + rng.normal(0, 0.5, 41))).tolist(),
            "C": (200 + np.cumsum(rng.normal(0, 2, 41))).tolist(),
        }
        got = returns_correlation(_bars_df(spark, series), "sym").toPandas()
        got = got.set_index(["key_a", "key_b"])
        rets = {k: np.diff(np.log(v)) for k, v in series.items()}
        for ka, kb in [("A", "B"), ("A", "C"), ("B", "C")]:
            exp = np.corrcoef(rets[ka], rets[kb])[0, 1]
            row = got.loc[(ka, kb)]
            assert row["n_days"] == 40
            assert row["correlation"] == pytest.approx(exp, rel=1e-9)
        # A/B share a driver: correlated well above the independent pair
        assert got.loc[("A", "B")]["correlation"] > 0.5

    def test_partial_calendar_overlap(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            returns_correlation,
        )

        # B starts 5 days later: correlation over the shared days only
        rows = [("A", dt.date(2024, 1, 1) + dt.timedelta(days=i), 100.0 + i)
                for i in range(10)]
        rows += [("B", dt.date(2024, 1, 1) + dt.timedelta(days=i), 50.0 + i)
                 for i in range(5, 10)]
        bars = spark.createDataFrame(rows, "sym string, day date, close double")
        got = returns_correlation(bars, "sym").collect()[0]
        # A has returns on days 2-10, B on days 7-10 -> 4 shared return days
        assert got.n_days == 4


class TestBetaAndGaps:
    def test_beta_matches_numpy(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            beta_to_benchmark,
        )

        rng = np.random.default_rng(9)
        mkt = rng.normal(0, 0.01, 61)
        series = {
            "MKT": (100 * np.exp(np.cumsum(mkt))).tolist(),
            "HI": (50 * np.exp(np.cumsum(1.8 * mkt + rng.normal(0, 0.002, 61)))).tolist(),
            "LO": (80 * np.exp(np.cumsum(0.4 * mkt + rng.normal(0, 0.002, 61)))).tolist(),
        }
        got = (
            beta_to_benchmark(_bars_df(spark, series), "MKT", key_col="sym")
            .toPandas()
            .set_index("sym")
        )
        assert set(got.index) == {"HI", "LO"}  # benchmark not self-reported
        rets = {k: np.diff(np.log(v)) for k, v in series.items()}
        for k in ("HI", "LO"):
            cov = np.cov(rets[k], rets["MKT"], ddof=1)
            exp_beta = cov[0, 1] / cov[1, 1]
            assert got.loc[k, "n_days"] == 60
            assert got.loc[k, "beta"] == pytest.approx(exp_beta, rel=1e-9)
        assert got.loc["HI", "beta"] > 1.2 > 0.8 > got.loc["LO", "beta"]

    def test_beta_plan_broadcasts_benchmark(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            beta_to_benchmark,
        )

        bars = _bars_df(spark, {"M": [1.0, 2.0], "X": [3.0, 4.0]})
        plan = (
            beta_to_benchmark(bars, "M", key_col="sym")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    def test_correlation_and_beta_match_duckdb_oracle(self, spark, events):
        """Oracle-grade check without a registry slot: DuckDB re-derives
        the full pairwise correlation matrix AND the benchmark betas from
        the same daily bars with its own window/corr/covar machinery."""
        import duckdb

        from real_time_financial_data_pipeline_spark.operators.finance import (
            beta_to_benchmark,
            returns_correlation,
        )

        bars = daily_close_bars(events)
        corr = returns_correlation(bars).toPandas()
        beta = beta_to_benchmark(bars, "purchase").toPandas()

        bars_pd = bars.toPandas()
        con = duckdb.connect()
        con.register("bars", bars_pd)
        rets_sql = """
            SELECT event_type AS k, day AS d,
                   ln(close / lag(close) OVER (PARTITION BY event_type ORDER BY day)) AS r
            FROM bars QUALIFY r IS NOT NULL
        """
        ocorr = con.execute(f"""
            WITH rets AS ({rets_sql})
            SELECT a.k AS key_a, b.k AS key_b, count(*) AS n_days,
                   corr(a.r, b.r) AS correlation
            FROM rets a JOIN rets b ON a.d = b.d AND a.k < b.k
            GROUP BY 1, 2
        """).df()
        obeta = con.execute(f"""
            WITH rets AS ({rets_sql})
            SELECT a.k AS event_type, count(*) AS n_days,
                   covar_samp(a.r, m.r) / var_samp(m.r) AS beta,
                   corr(a.r, m.r) AS correlation
            FROM rets a JOIN rets m ON a.d = m.d AND m.k = 'purchase'
            WHERE a.k != 'purchase'
            GROUP BY 1
        """).df()

        c = corr.sort_values(["key_a", "key_b"], ignore_index=True)
        oc = ocorr.sort_values(["key_a", "key_b"], ignore_index=True)
        assert c[["key_a", "key_b", "n_days"]].values.tolist() == \
            oc[["key_a", "key_b", "n_days"]].values.tolist()
        assert np.allclose(c["correlation"], oc["correlation"], rtol=1e-9)

        b = beta.sort_values("event_type", ignore_index=True)
        ob = obeta.sort_values("event_type", ignore_index=True)
        assert b["event_type"].tolist() == ob["event_type"].tolist()
        assert np.allclose(b["beta"], ob["beta"], rtol=1e-9)
        assert np.allclose(b["correlation"], ob["correlation"], rtol=1e-9)

    def test_calendar_gaps(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            calendar_gaps,
        )

        d = dt.date(2024, 1, 1)
        rows = [("A", d + dt.timedelta(days=i), 1.0) for i in (0, 1, 2, 5, 6, 10)]
        rows += [("B", d + dt.timedelta(days=i), 1.0) for i in (0, 1, 2)]
        bars = spark.createDataFrame(rows, "sym string, day date, close double")
        got = sorted(
            calendar_gaps(bars, "sym").collect(), key=lambda r: (r.sym, r.gap_start)
        )
        assert [(r.sym, str(r.gap_start), str(r.gap_end), r.n_missing) for r in got] == [
            ("A", "2024-01-04", "2024-01-05", 2),
            ("A", "2024-01-08", "2024-01-10", 3),
        ]


class TestStreamEma:
    def test_stream_ema_matches_batch(self, spark, tmp_path):
        """The stateful streaming twin must emit the bitwise-identical
        indicator row for every bar the batch prefix scan produces, with
        state carrying the recurrence seeds across micro-batches."""
        rng = np.random.default_rng(3)
        series = {
            "A": (100 + np.cumsum(rng.normal(0, 2, 30))).tolist(),
            "B": (40 + np.cumsum(rng.normal(0, 1, 30))).tolist(),
        }
        bars = _bars_df(spark, series).withColumn(
            "day", F.col("day").cast("timestamp")
        )
        batch = recursive_indicators(bars, ["sym"]).toPandas()

        # split by day range into two files -> two micro-batches, so the
        # seeds must survive the state store between triggers
        src = tmp_path / "bars"
        cut = dt.datetime(2024, 1, 16)
        # one part file per micro-batch: a multi-part f1 would split its
        # day range across triggers in listing order, tripping the
        # out-of-order drop and breaking parity
        bars.filter(F.col("day") < F.lit(cut)).coalesce(1).write.parquet(str(src / "f1"))
        bars.filter(F.col("day") >= F.lit(cut)).coalesce(1).write.parquet(str(src / "f2"))
        schema = spark.read.parquet(str(src / "f1")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_ema,
        )

        q = (
            stream_ema(stream, key_col="sym")
            .writeStream.format("memory")
            .queryName("ema_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("ema_stream").toPandas()

        assert len(got) == len(batch) == 60
        key = ["ema_fast", "ema_slow", "macd", "macd_signal", "rsi"]
        b = batch.sort_values(["sym", "day"], ignore_index=True)
        g = got.rename(columns={"key": "sym"}).sort_values(
            ["sym", "day"], ignore_index=True
        )
        assert (b["sym"] == g["sym"]).all()
        for c in key:  # exact: same advance_state arithmetic on both paths
            bv, gv = b[c].to_numpy(), g[c].to_numpy()
            assert ((bv == gv) | (np.isnan(bv) & np.isnan(gv))).all()

    def test_stream_ema_drops_out_of_order_bars(self, spark, tmp_path):
        """A bar at or before a key's last processed day is dropped, not
        folded into the recurrence out of order."""
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_ema,
        )

        src = tmp_path / "bars"
        d = dt.datetime(2024, 1, 1)
        f1 = [("A", d, 10.0), ("A", d + dt.timedelta(days=1), 11.0)]
        f2 = [("A", d, 99.0),  # duplicate/late day: must be ignored
              ("A", d + dt.timedelta(days=2), 12.0)]
        schema_str = "sym string, day timestamp, close double"
        # one part file each: a multi-slice write can land day-1 in an
        # earlier-sorted part than day-0, making the drop test flaky
        spark.createDataFrame(f1, schema_str).coalesce(1).write.parquet(str(src / "f1"))
        spark.createDataFrame(f2, schema_str).coalesce(1).write.parquet(str(src / "f2"))
        schema = spark.read.parquet(str(src / "f1")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream_ema(stream, key_col="sym")
            .writeStream.format("memory")
            .queryName("ema_ooo")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("ema_ooo").toPandas().sort_values("day", ignore_index=True)
        assert got["close"].tolist() == [10.0, 11.0, 12.0]  # 99.0 dropped


class TestDailyCloseBars:
    def test_close_is_value_at_max_ts(self, spark, events):
        bars = daily_close_bars(events).toPandas()
        ev = events.toPandas()
        ev["day"] = ev["ts"].dt.floor("D").dt.date
        last = ev.sort_values("ts").groupby(["event_type", "day"]).tail(1)
        ref = last.set_index(["event_type", "day"])["value"]
        got = bars.set_index(["event_type", "day"])["close"]
        assert len(got) == len(ref)
        assert np.allclose(got.sort_index(), ref.sort_index(), rtol=0)


class TestStreamEmaChunking:
    def test_multi_chunk_micro_batch_is_globally_sorted(self):
        """Review regression: Arrow hands one key's micro-batch as SEVERAL
        chunks in no particular order — the update fn must concat before
        sorting, or in-order bars in a later chunk would be mis-dropped
        as out-of-order."""
        import pandas as pd

        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            _make_update,
        )
        from real_time_financial_data_pipeline_spark.operators.finance import (
            _ema_alpha,
        )

        class FakeState:
            exists = False
            hasTimedOut = False

            def update(self, v):
                self.exists, self._v = True, v

            @property
            def get(self):
                return self._v

        # chunk 2 holds EARLIER days than chunk 1
        c1 = pd.DataFrame({"day": pd.to_datetime(["2024-01-03", "2024-01-04"]),
                           "close": [3.0, 4.0]})
        c2 = pd.DataFrame({"day": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                           "close": [1.0, 2.0]})
        upd = _make_update(_ema_alpha(12), _ema_alpha(26), _ema_alpha(9), 14)
        out = list(upd(("A",), iter([c1, c2]), FakeState()))
        rows = pd.concat(out, ignore_index=True)
        assert rows["close"].tolist() == [1.0, 2.0, 3.0, 4.0]  # nothing dropped


class TestBacktest:
    def test_matches_pandas_reference_no_lookahead(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            backtest_sma_crossover,
        )

        rng = np.random.default_rng(13)
        xs = (100 * np.exp(np.cumsum(rng.normal(0.001, 0.02, 80)))).tolist()
        got = (
            backtest_sma_crossover(_bars_df(spark, {"A": xs}), ["sym"], fast=5, slow=20)
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        s = pd.Series(xs)
        sig = (
            s.rolling(5, min_periods=1).mean() > s.rolling(20, min_periods=1).mean()
        ).astype(int)
        pos = sig.shift(1, fill_value=0)
        lr = np.log(s / s.shift(1))
        strat = pos * lr.fillna(0.0)
        assert got["position"].tolist() == pos.tolist()
        assert np.allclose(got["strategy_return"], strat, rtol=1e-12)
        assert np.allclose(got["cum_return"], strat.cumsum(), rtol=1e-9)
        assert np.allclose(got["cum_bh"], lr.fillna(0.0).cumsum(), rtol=1e-9)
        # the strategy holds long only AFTER the signal bar (no look-ahead)
        first_sig = sig.idxmax() if sig.any() else None
        if first_sig is not None and first_sig + 1 < len(pos):
            assert got["position"].iloc[first_sig] == 0 or first_sig == 0

    def test_flat_when_never_crossed(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            backtest_sma_crossover,
        )

        # strictly decreasing: fast SMA stays below slow SMA after bar 1
        xs = [float(100 - i) for i in range(30)]
        got = (
            backtest_sma_crossover(_bars_df(spark, {"A": xs}), ["sym"])
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        assert (got["position"] == 0).all()
        assert (got["strategy_return"] == 0.0).all()
        assert got["cum_return"].iloc[-1] == 0.0
        assert got["cum_bh"].iloc[-1] < 0  # buy-and-hold lost money

    def test_single_exchange_plan(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            backtest_sma_crossover,
        )

        bars = _bars_df(spark, {"A": [1.0, 2.0, 3.0]})
        plan = (
            backtest_sma_crossover(bars, ["sym"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1


class TestGoldStreamComposition:
    def test_tick_stream_to_bars_to_incremental_indicators(
        self, spark, events, tmp_path
    ):
        """The documented deployment chain (streaming/indicators.py): tick
        stream -> watermarked tumbling OHLC (append mode emits only
        FINALIZED bars, in watermark order) -> landed gold bars ->
        stream_ema.  The incremental indicators over the landed bars must
        equal the batch prefix scan over the same bar set exactly."""
        from real_time_financial_data_pipeline_spark.streaming.aggregates import (
            tumbling_ohlc,
        )
        from real_time_financial_data_pipeline_spark.streaming.indicators import (
            stream_ema,
        )

        src = tmp_path / "ticks"
        events.select("event_type", "ts", "value").write.parquet(str(src / "f1"))
        schema = spark.read.parquet(str(src / "f1")).schema
        ticks = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        bars_dir = str(tmp_path / "gold_bars")
        q1 = (
            tumbling_ohlc(ticks, watermark="10 minutes")
            .selectExpr("event_type", "period AS day", "close")
            .writeStream.format("parquet")
            .option("path", bars_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt1"))
            .outputMode("append")  # only watermark-finalized bars land
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(120)
        landed = spark.read.parquet(bars_dir)
        assert landed.count() > 0  # finalized bars made it to gold

        bars_stream = spark.readStream.schema(landed.schema).parquet(bars_dir)
        q2 = (
            stream_ema(bars_stream, key_col="event_type")
            .writeStream.format("memory")
            .queryName("gold_ema")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q2.awaitTermination(120)
        got = spark.table("gold_ema").toPandas()

        batch = recursive_indicators(
            landed.withColumn("day", F.col("day").cast("date")), ["event_type"]
        ).toPandas()
        assert len(got) == len(batch) > 0
        b = batch.sort_values(["event_type", "day"], ignore_index=True)
        g = got.rename(columns={"key": "event_type"}).sort_values(
            ["event_type", "day"], ignore_index=True
        )
        for c in ["ema_fast", "ema_slow", "macd", "macd_signal", "rsi"]:
            bv, gv = b[c].to_numpy(), g[c].to_numpy()
            assert ((bv == gv) | (np.isnan(bv) & np.isnan(gv))).all()


class TestPriceAnomalies:
    def test_planted_spike_and_stale_run_flagged(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            detect_price_anomalies,
        )

        rng = np.random.default_rng(21)
        xs = (100 * np.exp(np.cumsum(rng.normal(0, 0.01, 40)))).tolist()
        xs[30] = xs[29] * 1.5  # ~40% jump against ~1% daily vol
        xs[31] = xs[30]  # then the feed goes dead for 4 bars
        xs[32] = xs[30]
        xs[33] = xs[30]
        got = (
            detect_price_anomalies(_bars_df(spark, {"A": xs}), ["sym"])
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        assert bool(got["is_spike"].iloc[30])
        # .eq(True) treats the nullable None as not-spike without the
        # object-dtype fillna downcast pandas is deprecating
        assert not got["is_spike"].iloc[:30].eq(True).any()
        assert got["stale_run"].iloc[30:34].tolist() == [1, 2, 3, 4]
        assert not got["is_stale"].iloc[30:32].any()
        assert got["is_stale"].iloc[32:34].all()
        # healthy series: no stale flags anywhere before the plant
        assert (got["stale_run"].iloc[:30] == 1).all()

    def test_spike_does_not_poison_its_own_baseline(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            detect_price_anomalies,
        )

        # the bar AFTER a spike has a large reverse return; with the spike
        # EXCLUDED from its own baseline but INCLUDED in the next bar's,
        # the next-day z must be damped relative to the spike's own z
        rng = np.random.default_rng(22)
        xs = (100 * np.exp(np.cumsum(rng.normal(0.01, 0.003, 25)))).tolist()
        xs[20] = xs[19] * 1.4
        xs[21] = xs[19] * 1.02
        got = (
            detect_price_anomalies(_bars_df(spark, {"A": [float(x) for x in xs]}), ["sym"])
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        assert abs(got["z_score"].iloc[20]) > abs(got["z_score"].iloc[21])


class TestVwap:
    def _ticks(self, spark):
        rows = []
        rng = np.random.default_rng(11)
        for sym in ("A", "B"):
            for day in (1, 2):
                for i in range(40):
                    ts = dt.datetime(2024, 3, day, 9, 30) + dt.timedelta(minutes=i)
                    price = float(100 + rng.normal(0, 1))
                    size = int(rng.integers(1, 500))
                    rows.append((sym, ts, price, size))
        return spark.createDataFrame(
            rows, "sym string, ts timestamp, price double, size long"
        )

    def test_vwap_bars_matches_pandas(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import vwap_bars

        ticks = self._ticks(spark)
        got = (
            vwap_bars(ticks, "D", "ts", "price", "size", ["sym"])
            .toPandas()
            .sort_values(["sym", "period"])
            .reset_index(drop=True)
        )
        pdf = ticks.toPandas()
        pdf["period"] = pdf["ts"].dt.floor("D")
        exp = (
            pdf.groupby(["sym", "period"])
            .apply(
                lambda g: pd.Series(
                    {
                        "vwap": (g.price * g["size"]).sum() / g["size"].sum(),
                        "twap": g.price.mean(),
                        "volume": float(g["size"].sum()),
                        "n_trades": len(g),
                        "high": g.price.max(),
                        "low": g.price.min(),
                    }
                ),
                include_groups=False,
            )
            .reset_index()
            .sort_values(["sym", "period"])
            .reset_index(drop=True)
        )
        for col in ("vwap", "twap", "volume", "high", "low"):
            np.testing.assert_allclose(got[col], exp[col], rtol=1e-12)
        assert (got["n_trades"] == exp["n_trades"]).all()

    def test_vwap_null_on_zero_volume(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import vwap_bars

        df = spark.createDataFrame(
            [("A", dt.datetime(2024, 3, 1, 10), 10.0, 0),
             ("A", dt.datetime(2024, 3, 1, 11), 12.0, 0)],
            "sym string, ts timestamp, price double, size long",
        )
        row = vwap_bars(df, "D", "ts", "price", "size", ["sym"]).collect()[0]
        assert row["vwap"] is None and row["twap"] == 11.0 and row["volume"] == 0.0

    def test_anchored_vwap_runs_and_resets(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            anchored_vwap,
        )

        ticks = self._ticks(spark)
        got = (
            anchored_vwap(ticks, "ts", "price", "size", ["sym"], anchor="D")
            .toPandas()
            .sort_values(["sym", "ts"])
            .reset_index(drop=True)
        )
        pdf = ticks.toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
        pdf["day"] = pdf["ts"].dt.floor("D")
        pdf["notional"] = pdf.price * pdf["size"]
        grp = pdf.groupby(["sym", "day"])
        exp = grp["notional"].cumsum() / grp["size"].cumsum()
        np.testing.assert_allclose(got["vwap"], exp, rtol=1e-12)
        # reset check: the first tick of day 2 equals its own price
        first_d2 = got[(got.sym == "A") & (got.ts.dt.day == 2)].iloc[0]
        assert math.isclose(first_d2["vwap"], first_d2["price"], rel_tol=1e-12)

    def test_anchored_final_equals_bar_vwap(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            anchored_vwap,
            vwap_bars,
        )

        ticks = self._ticks(spark)
        anchored = anchored_vwap(ticks, "ts", "price", "size", ["sym"], anchor="D")
        last = (
            anchored.withColumn("day", F.date_trunc("day", "ts"))
            .groupBy("sym", "day")
            .agg(F.max_by("vwap", "ts").alias("final_vwap"))
            .toPandas()
            .sort_values(["sym", "day"])
            .reset_index(drop=True)
        )
        bars = (
            vwap_bars(ticks, "D", "ts", "price", "size", ["sym"])
            .toPandas()
            .sort_values(["sym", "period"])
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(last["final_vwap"], bars["vwap"], rtol=1e-12)

    def test_vwap_bars_single_exchange(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import vwap_bars

        plan = (
            vwap_bars(self._ticks(spark), "D", "ts", "price", "size", ["sym"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 1
        assert "HashAggregate" in plan


class TestPortfolioReturns:
    def _bars3(self, spark):
        rng = np.random.default_rng(21)
        series = {
            "A": (100 + np.cumsum(rng.normal(0, 2, 25))).tolist(),
            "B": (50 + np.cumsum(rng.normal(0, 1, 25))).tolist(),
            "C": (10 + np.cumsum(rng.normal(0, 0.2, 25))).tolist(),
        }
        return _bars_df(spark, series), series

    def test_matches_numpy(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            portfolio_returns,
        )

        bars, series = self._bars3(spark)
        w = {"A": 0.5, "B": 0.3}  # C unheld -> excluded
        got = (
            portfolio_returns(bars, w)
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        a, b = np.array(series["A"]), np.array(series["B"])
        ra = np.concatenate([[0.0], a[1:] / a[:-1] - 1])
        rb = np.concatenate([[0.0], b[1:] / b[:-1] - 1])
        exp = 0.5 * ra + 0.3 * rb
        # day 1 has no returns on either leg -> the weighted sum is null
        assert got["portfolio_return"].iloc[0] is None or np.isnan(
            got["portfolio_return"].iloc[0]
        )
        np.testing.assert_allclose(
            got["portfolio_return"].iloc[1:].to_numpy(dtype=float), exp[1:], rtol=1e-12
        )
        np.testing.assert_allclose(
            got["cum_growth"].to_numpy(dtype=float), np.cumprod(1 + exp), rtol=1e-12
        )

    def test_duckdb_oracle(self, spark):
        """In-test DuckDB re-derivation (registry is at its 50-row cap):
        weighted lag-returns + running log-sum equity curve."""
        import duckdb

        from real_time_financial_data_pipeline_spark.operators.finance import (
            portfolio_returns,
        )

        bars, _ = self._bars3(spark)
        got = (
            portfolio_returns(bars, {"A": 0.6, "C": 0.4})
            .toPandas()
            .sort_values("day", ignore_index=True)
        )
        pdf = bars.toPandas()
        con = duckdb.connect()
        con.register("bars", pdf)
        exp = con.execute(
            """
            WITH r AS (
                SELECT sym, day,
                       close / lag(close) OVER (PARTITION BY sym ORDER BY day) - 1 AS ret,
                       CASE sym WHEN 'A' THEN 0.6 WHEN 'C' THEN 0.4 END AS w
                FROM bars WHERE sym IN ('A', 'C')
            ), d AS (
                SELECT day, sum(w * ret) AS portfolio_return FROM r GROUP BY day
            )
            SELECT day, portfolio_return,
                   exp(sum(ln(1 + coalesce(portfolio_return, 0)))
                       OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) AS cum_growth
            FROM d ORDER BY day
            """
        ).df()
        np.testing.assert_allclose(
            got["portfolio_return"].to_numpy(dtype=float),
            exp["portfolio_return"].to_numpy(dtype=float),
            rtol=1e-12, equal_nan=True,
        )
        np.testing.assert_allclose(
            got["cum_growth"].to_numpy(dtype=float),
            exp["cum_growth"].to_numpy(dtype=float), rtol=1e-12,
        )

    def test_empty_weights_raise(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            portfolio_returns,
        )

        bars, _ = self._bars3(spark)
        with pytest.raises(ValueError):
            portfolio_returns(bars, {})

    def test_single_key_shuffle_plan(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            portfolio_returns,
        )

        bars, _ = self._bars3(spark)
        plan = (
            portfolio_returns(bars, {"A": 1.0})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    def test_wipeout_day_zeroes_equity_permanently(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            portfolio_returns,
        )

        # 2x levered long: day 2 drops 60% -> levered return -120% (wiped);
        # the recovery day must NOT resurrect the curve
        bars = _bars_df(spark, {"A": [100.0, 40.0, 80.0]})
        got = (
            portfolio_returns(bars, {"A": 2.0})
            .toPandas().sort_values("day", ignore_index=True)
        )
        assert got["portfolio_return"].iloc[1] == pytest.approx(-1.2)
        assert got["cum_growth"].iloc[1] == 0.0
        assert got["cum_growth"].iloc[2] == 0.0


class TestAdjustPrices:
    def _data(self, spark):
        """Raw prices SIMULATE the splits: underlying value v=100+i is
        smooth; the quoted (raw) price is v / (product of factors of
        FUTURE actions), so the raw series jumps 4x at day 3 and 2x at
        day 7 — back-adjustment must recover the smooth series."""
        d = dt.datetime(2024, 1, 1)

        def raw(i):
            f = 1.0
            if i < 3:
                f *= 0.25
            if i < 7:
                f *= 0.5
            return (100.0 + i) / f

        prices = spark.createDataFrame(
            [("A", d + dt.timedelta(days=i), raw(i)) for i in range(10)]
            + [("B", d + dt.timedelta(days=i), 50.0 + i) for i in range(10)],
            "sym string, ts timestamp, close double",
        )
        actions = spark.createDataFrame(
            [
                ("A", d + dt.timedelta(days=3), 0.25),   # 4:1 split
                ("A", d + dt.timedelta(days=7), 0.5),    # 2:1 split
            ],
            "sym string, effective_date timestamp, factor double",
        )
        return prices, actions

    def test_back_adjustment_compounds(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            adjust_prices,
        )

        prices, actions = self._data(spark)
        got = {
            (r.sym, r.ts.day): (r.close_adj, r.adj_factor)
            for r in adjust_prices(prices, actions).collect()
        }
        # back-adjustment recovers the smooth underlying 100+i everywhere
        for day in range(1, 11):
            assert got[("A", day)] == (100.0 + day - 1, got[("A", day)][1])
        # factor regimes: both (0.125), later only (0.5), none (1.0)
        assert got[("A", 1)][1] == 0.125 and got[("A", 3)][1] == 0.125
        assert got[("A", 4)][1] == 0.5
        assert got[("A", 8)][1] == 1.0 and got[("A", 10)][1] == 1.0
        # symbol with no actions: identity
        assert got[("B", 1)] == (50.0, 1.0)

    def test_row_count_and_continuity(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            adjust_prices,
        )

        prices, actions = self._data(spark)
        out = adjust_prices(prices, actions)
        assert out.count() == prices.count()
        # the adjusted series has no split-sized jump: max abs daily move
        # of A's adjusted closes stays ~1 (the raw daily drift)
        a = (
            out.filter(F.col("sym") == "A")
            .orderBy("ts")
            .select("close_adj")
            .toPandas()["close_adj"]
        )
        # the RAW series jumps 4x at the split; adjusted is the smooth
        # 1-per-day drift
        assert a.diff().abs().max() == 1.0

    def test_duplicate_ticks_each_adjusted(self, spark):
        """Two identical prints at the same (sym, ts) are distinct trades:
        both rows must survive with the same factor (a groupBy over every
        column would silently merge them)."""
        from real_time_financial_data_pipeline_spark.operators.finance import (
            adjust_prices,
        )

        d = dt.datetime(2024, 1, 1)
        prices = spark.createDataFrame(
            [("A", d, 400.0), ("A", d, 400.0), ("A", d + dt.timedelta(days=2), 105.0)],
            "sym string, ts timestamp, close double",
        )
        actions = spark.createDataFrame(
            [("A", d + dt.timedelta(days=1), 0.25)],
            "sym string, effective_date timestamp, factor double",
        )
        out = adjust_prices(prices, actions).collect()
        assert len(out) == 3
        dup = [r for r in out if r.ts == d]
        assert len(dup) == 2 and all(r.close_adj == 100.0 for r in dup)


    def test_duckdb_oracle(self, spark):
        import duckdb

        from real_time_financial_data_pipeline_spark.operators.finance import (
            adjust_prices,
        )

        prices, actions = self._data(spark)
        got = (
            adjust_prices(prices, actions)
            .toPandas().sort_values(["sym", "ts"], ignore_index=True)
        )
        con = duckdb.connect()
        con.register("p", prices.toPandas())
        con.register("a", actions.toPandas())
        exp = con.execute(
            """
            SELECT p.sym, p.ts, p.close,
                   round(p.close * coalesce(product(a.factor), 1.0), 6) AS close_adj,
                   round(coalesce(product(a.factor), 1.0), 9) AS adj_factor
            FROM p LEFT JOIN a ON p.sym = a.sym AND p.ts < a.effective_date
            GROUP BY p.sym, p.ts, p.close
            ORDER BY p.sym, p.ts
            """
        ).df()
        import numpy as np

        np.testing.assert_allclose(got["close_adj"], exp["close_adj"], rtol=1e-12)
        np.testing.assert_allclose(got["adj_factor"], exp["adj_factor"], rtol=1e-12)


class TestConvertCurrency:
    def test_asof_rate_applied(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            convert_currency,
        )

        d = dt.datetime(2024, 1, 1)
        trades = spark.createDataFrame(
            [
                ("EUR", d + dt.timedelta(days=1, hours=3), 100.0),
                ("EUR", d + dt.timedelta(days=5), 200.0),   # weekend gap -> friday rate
                ("GBP", d + dt.timedelta(days=2), 50.0),
                ("JPY", d + dt.timedelta(days=2), 1000.0),  # no rate history
                ("EUR", d, 10.0),                           # before any rate
            ],
            "currency string, ts timestamp, amount double",
        )
        rates = spark.createDataFrame(
            [
                ("EUR", d + dt.timedelta(days=1), 1.10),
                ("EUR", d + dt.timedelta(days=3), 1.20),
                ("GBP", d + dt.timedelta(days=2), 1.30),
            ],
            "from_currency string, timestamp timestamp, rate double",
        )
        got = {
            (r.currency, r.ts): (r.amount_conv, r.asof_rate)
            for r in convert_currency(trades, rates, ["amount"]).collect()
        }
        assert got[("EUR", d + dt.timedelta(days=1, hours=3))] == (110.0, 1.10)
        assert got[("EUR", d + dt.timedelta(days=5))] == (240.0, 1.20)
        assert got[("GBP", d + dt.timedelta(days=2))] == (65.0, 1.30)
        # no history / pre-history rows surface as NULL, never dropped
        assert got[("JPY", d + dt.timedelta(days=2))] == (None, None)
        assert got[("EUR", d)] == (None, None)
        assert len(got) == 5


class TestMicrostructure:
    def test_tick_rule_known_sequence(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            tick_rule_signs,
        )

        d = dt.datetime(2024, 1, 1, 9, 30)
        prices = [10.0, 10.1, 10.1, 10.0, 10.0, 10.2]
        #         first  up    zero  down  zero  up
        expected = [0, 1, 1, -1, -1, 1]
        df = spark.createDataFrame(
            [("A", d + dt.timedelta(seconds=i), p) for i, p in enumerate(prices)],
            "sym string, ts timestamp, price double",
        )
        got = (
            tick_rule_signs(df, ["sym"])
            .orderBy("ts").select("trade_sign").toPandas()["trade_sign"].tolist()
        )
        assert got == expected

    def test_ofi_and_duckdb_oracle(self, spark):
        import duckdb
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            order_flow_imbalance,
        )

        rng = np.random.default_rng(3)
        d = dt.datetime(2024, 1, 1, 9, 30)
        rows = []
        for sym in ("A", "B"):
            for i in range(200):
                rows.append(
                    (sym, d + dt.timedelta(seconds=i),
                     float(100 + rng.normal(0, 0.5)), float(rng.integers(1, 50)))
                )
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        got = (
            order_flow_imbalance(ticks, "D")
            .toPandas().sort_values("event_type", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", ticks.toPandas())
        exp = con.execute(
            """
            WITH raw AS (
                SELECT event_type, ts, size,
                       CASE WHEN price > lag(price) OVER w THEN 1
                            WHEN price < lag(price) OVER w THEN -1 END AS s
                FROM t WINDOW w AS (PARTITION BY event_type ORDER BY ts)
            ), filled AS (
                SELECT event_type, ts, size,
                       coalesce(last_value(s IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY ts
                           ROWS UNBOUNDED PRECEDING), 0) AS sign
                FROM raw
            )
            SELECT event_type,
                   sum(sign * size) / sum(size) AS ofi,
                   sum(sign * size) AS signed_volume,
                   sum(size) AS volume,
                   count(*) AS n_trades
            FROM filled GROUP BY event_type ORDER BY event_type
            """
        ).df()
        np.testing.assert_allclose(got["ofi"], exp["ofi"], rtol=1e-12)
        np.testing.assert_allclose(got["signed_volume"], exp["signed_volume"], rtol=1e-12)
        assert (got["n_trades"] == exp["n_trades"]).all()
        assert (got["ofi"].abs() <= 1).all()

    def test_amihud(self, spark):
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            amihud_illiquidity,
        )

        d = dt.date(2024, 1, 1)
        closes = [100.0, 102.0, 101.0, 101.0]
        vols = [1000.0, 500.0, 0.0, 800.0]  # zero-volume day excluded
        bars = spark.createDataFrame(
            [("A", d + dt.timedelta(days=i), c, v)
             for i, (c, v) in enumerate(zip(closes, vols))],
            "sym string, day date, close double, volume double",
        )
        row = amihud_illiquidity(bars, ["sym"]).collect()[0]
        impacts = [
            abs(102.0 / 100.0 - 1) / (102.0 * 500.0),
            abs(101.0 / 101.0 - 1) / (101.0 * 800.0),
        ]
        # day 3 (zero volume) and day 1 (no prior close) excluded
        assert row["n_days"] == 2
        assert row["amihud"] == pytest.approx(np.mean(impacts) * 1e6, rel=1e-6)


class TestReviewRegressions:
    def test_adjust_prices_null_key_rows_survive(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            adjust_prices,
        )

        d = dt.datetime(2024, 1, 1)
        prices = spark.createDataFrame(
            [("A", d, 100.0), (None, d, 7.0), ("A", None, 9.0)],
            "sym string, ts timestamp, close double",
        )
        actions = spark.createDataFrame(
            [("A", d + dt.timedelta(days=1), 0.5)],
            "sym string, effective_date timestamp, factor double",
        )
        out = adjust_prices(prices, actions).collect()
        assert len(out) == 3  # nothing dropped
        by_close = {r.close: (r.close_adj, r.adj_factor) for r in out}
        assert by_close[100.0] == (50.0, 0.5)
        assert by_close[7.0] == (7.0, 1.0)   # null sym: untouched
        assert by_close[9.0] == (9.0, 1.0)   # null ts: untouched

    def test_convert_currency_multi_pair_guard(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            convert_currency,
        )

        d = dt.datetime(2024, 1, 1)
        trades = spark.createDataFrame(
            [("EUR", d + dt.timedelta(days=3), 100.0)],
            "currency string, ts timestamp, amount double",
        )
        rates = spark.createDataFrame(
            [
                ("EUR", "USD", d + dt.timedelta(days=1), 1.10),
                ("EUR", "JPY", d + dt.timedelta(days=2), 160.2),
            ],
            "from_currency string, to_currency string, timestamp timestamp, rate double",
        )
        # ambiguous multi-pair table without a target: refuse loudly
        with pytest.raises(ValueError, match="target currencies"):
            convert_currency(trades, rates, ["amount"]).collect()
        # explicit target picks the right pair even when the other printed later
        usd = convert_currency(trades, rates, ["amount"], to_currency="USD").collect()[0]
        assert usd.amount_conv == pytest.approx(110.0) and usd.asof_rate == 1.10
        jpy = convert_currency(trades, rates, ["amount"], to_currency="JPY").collect()[0]
        assert jpy.amount_conv == pytest.approx(16020.0)
        with pytest.raises(ValueError, match="no 'missing_col' column"):
            convert_currency(
                trades, rates, ["amount"], to_currency="USD",
                rate_to_currency_col="missing_col",
            )

    def test_tick_rule_tied_timestamps_layout_independent(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            tick_rule_signs,
        )

        d = dt.datetime(2024, 1, 1, 9, 30)
        rows = [
            ("A", d, 10.0, 1),
            ("A", d + dt.timedelta(seconds=1), 10.2, 2),  # tie below
            ("A", d + dt.timedelta(seconds=1), 10.1, 3),
            ("A", d + dt.timedelta(seconds=2), 10.0, 4),
        ]
        df = spark.createDataFrame(
            rows, "sym string, ts timestamp, price double, trade_id long"
        )
        s1 = sorted(
            (r.trade_id, r.trade_sign)
            for r in tick_rule_signs(df, ["sym"], tiebreak_col="trade_id").collect()
        )
        s2 = sorted(
            (r.trade_id, r.trade_sign)
            for r in tick_rule_signs(
                df.repartition(5), ["sym"], tiebreak_col="trade_id"
            ).collect()
        )
        assert s1 == s2
        # tie orders by price: 10.1 (up from 10.0) then 10.2 (up) — both +1;
        # final 10.0 is a down-tick
        assert dict(s1) == {1: 0, 2: 1, 3: 1, 4: -1}


class TestActivityBars:
    def test_volume_bars_partition_by_threshold(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
        )

        d = dt.datetime(2024, 1, 1, 9, 30)
        # sizes: 3,4,5 | 6 | 2,3,8 -> cum-before: 0,3,7 | 12 | 18,20,23
        sizes = [3, 4, 5, 6, 2, 3, 8]
        prices = [10.0, 11.0, 9.0, 12.0, 10.5, 10.6, 10.0]
        rows = [
            ("A", d + dt.timedelta(seconds=i), p, float(s))
            for i, (p, s) in enumerate(zip(prices, sizes))
        ]
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        out = {r.bar_id: r for r in activity_bars(ticks, 10.0, "volume").collect()}
        # bar 0: cum-before 0,3,7 (<10): ticks 0-2; bar 1: 12,18 -> ticks 3,4; bar 2: 20,23
        assert sorted(out) == [0, 1, 2]
        assert out[0].n_ticks == 3 and out[0].open == 10.0 and out[0].close == 9.0
        assert out[0].high == 11.0 and out[0].low == 9.0
        assert out[1].n_ticks == 2 and out[1].volume == 8.0
        assert out[2].n_ticks == 2
        # total volume conserved
        assert sum(r.volume for r in out.values()) == float(sum(sizes))

    def test_dollar_bars_and_duckdb_oracle(self, spark):
        import duckdb
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
        )

        rng = np.random.default_rng(9)
        d = dt.datetime(2024, 1, 2, 9, 30)
        rows = []
        for sym in ("A", "B"):
            for i in range(120):
                rows.append(
                    (sym, d + dt.timedelta(seconds=i),
                     float(50 + rng.normal(0, 1)), float(rng.integers(1, 20)))
                )
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        got = (
            activity_bars(ticks, 5000.0, "dollar")
            .toPandas().sort_values(["event_type", "bar_id"], ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", ticks.toPandas())
        exp = con.execute(
            """
            WITH cum AS (
                SELECT *, coalesce(sum(price * size) OVER (
                    PARTITION BY event_type ORDER BY ts, price, size
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                FROM t
            )
            SELECT event_type, CAST(floor(cb / 5000.0) AS BIGINT) AS bar_id,
                   arg_min(price, ts) AS open, max(price) AS high,
                   min(price) AS low, arg_max(price, ts) AS close,
                   sum(price * size) / sum(size) AS vwap,
                   sum(size) AS volume, count(*) AS n_ticks
            FROM cum GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        assert (got["bar_id"] == exp["bar_id"]).all()
        for c in ("open", "high", "low", "close", "vwap", "volume"):
            np.testing.assert_allclose(got[c], exp[c], rtol=1e-12, err_msg=c)
        assert (got["n_ticks"] == exp["n_ticks"]).all()

    def test_bad_args(self, spark):
        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
            activity_bars_sliced,
        )

        ticks = spark.createDataFrame(
            [("A", dt.datetime(2024, 1, 1), 1.0, 1.0)],
            "event_type string, ts timestamp, price double, size double",
        )
        with pytest.raises(ValueError):
            activity_bars(ticks, 0)
        with pytest.raises(ValueError):
            activity_bars(ticks, 10, by="trades")
        with pytest.raises(ValueError):
            activity_bars_sliced(ticks, 0)
        with pytest.raises(ValueError):
            activity_bars_sliced(ticks, 10, by="trades")

    def test_tick_rule_sliced_equals_monolithic(self, spark):
        """The sliced tick-rule twin must be ROW-IDENTICAL to the
        monolithic window across every boundary shape: a first tick of a
        slice whose raw sign depends on the PREVIOUS slice's closing
        print (up/down/zero), zero-tick runs crossing midnight, whole
        slices of only zero-ticks (the carry must pass through them),
        null prices, and the cold start before any price move."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            kyle_lambda,
            order_flow_imbalance,
            tick_rule_signs,
            tick_rule_signs_sliced,
        )

        rng = np.random.default_rng(23)
        d = dt.datetime(2024, 3, 1)
        rows = []
        # HOT: 1200 ticks over 4 days from a SMALL price grid (many exact
        # repeats -> long zero-tick runs, some spanning slice boundaries)
        for i in range(1200):
            px = float(rng.choice([10.0, 10.0, 10.0, 10.5, 11.0]))
            if rng.random() < 0.02:
                px = None  # bad prints
            rows.append(("HOT", d + dt.timedelta(minutes=int(i * 4.8)), px,
                         float(rng.integers(1, 9))))
        # FLAT: day 1 has moves, day 2 is ALL zero-ticks (constant price),
        # day 3 opens equal to day 2's close (zero-tick across midnight)
        flat = (
            [("FLAT", d + dt.timedelta(minutes=m), p, 1.0)
             for m, p in [(0, 5.0), (30, 6.0), (60, 6.0)]]
            + [("FLAT", d + dt.timedelta(days=1, minutes=m), 6.0, 1.0)
               for m in range(0, 120, 30)]
            + [("FLAT", d + dt.timedelta(days=2, minutes=m), p, 1.0)
               for m, p in [(0, 6.0), (30, 5.0)]]
        )
        # COLD-START: constant price forever -> every sign must be 0
        cold = [("ZERO", d + dt.timedelta(hours=h * 13), 7.0, 2.0) for h in range(8)]
        ticks = spark.createDataFrame(
            rows + flat + cold,
            "event_type string, ts timestamp, price double, size double",
        ).repartition(9)

        mono = sorted(
            map(tuple, tick_rule_signs(ticks, ["event_type"]).collect()),
            key=lambda t: (t[0], t[1]),
        )
        sliced = sorted(
            map(tuple, tick_rule_signs_sliced(ticks, ["event_type"]).collect()),
            key=lambda t: (t[0], t[1]),
        )
        assert mono == sliced
        signs = {(r[0], r[1]): r[4] for r in mono}
        assert all(signs[k] == 0 for k in signs if k[0] == "ZERO")
        # day-2 FLAT rows carry day-1's +1 across the all-zero-tick slice
        assert signs[("FLAT", d + dt.timedelta(days=1, minutes=90))] == 1
        assert signs[("FLAT", d + dt.timedelta(days=2, minutes=30))] == -1

        # the composed operators agree between kernels too.  OFI compares
        # exactly (signs are ints, sizes integral -> every sum is exact in
        # float64); kyle's covar/var moments accumulate REAL floats whose
        # fold order is partition-layout-dependent on BOTH plans, so the
        # lambda matches to relative ulps, not bitwise
        import math

        a = sorted(map(tuple, order_flow_imbalance(ticks, "D", ["event_type"]).collect()))
        b = sorted(map(tuple, order_flow_imbalance(
            ticks, "D", ["event_type"], sliced=True).collect()))
        assert a == b
        km = {r.event_type: r for r in kyle_lambda(ticks, ["event_type"]).collect()}
        ks = {r.event_type: r for r in kyle_lambda(
            ticks, ["event_type"], sliced=True).collect()}
        assert set(km) == set(ks)
        for k in km:
            assert km[k].n_ticks == ks[k].n_ticks
            ml, sl = km[k].kyle_lambda, ks[k].kyle_lambda
            assert (ml is None and sl is None) or math.isclose(
                ml, sl, rel_tol=1e-9, abs_tol=1e-12
            ), (k, ml, sl)

    def test_tick_rule_sliced_randomized_equivalence(self, spark):
        """Randomized adversarial tables (beyond the hand-built boundary
        cases): heavy price repetition, null prints, ragged multi-key
        multi-day layouts, and BOTH slice units — the sliced kernel must
        equal the monolithic window on every one."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            tick_rule_signs,
            tick_rule_signs_sliced,
        )

        d = dt.datetime(2024, 5, 1)
        for seed, unit in ((3, "day"), (4, "hour"), (5, "day")):
            rng = np.random.default_rng(seed)
            rows = []
            for sym in ("A", "B", "C"):
                n = int(rng.integers(30, 300))
                t = 0
                for _ in range(n):
                    t += int(rng.integers(1, 600))  # ragged gaps, minutes
                    px = float(rng.choice([1.0, 1.0, 2.0, 3.0]))
                    if rng.random() < 0.05:
                        px = None
                    rows.append((sym, d + dt.timedelta(minutes=t), px,
                                 float(rng.integers(1, 5))))
            ticks = spark.createDataFrame(
                rows, "event_type string, ts timestamp, price double, size double"
            ).repartition(int(rng.integers(2, 11)))
            mono = sorted(
                map(tuple, tick_rule_signs(ticks, ["event_type"]).collect())
            )
            sliced = sorted(
                map(
                    tuple,
                    tick_rule_signs_sliced(
                        ticks, ["event_type"], slice_unit=unit
                    ).collect(),
                )
            )
            assert mono == sliced, (seed, unit)

    def test_activity_bars_sliced_equals_monolithic(self, spark):
        """The two-phase prefix-sum variant must be ROW-IDENTICAL to the
        monolithic window on integral sizes — including bars that span
        slice boundaries (multi-day hot symbol, ticks deliberately dense
        enough that most bars cross midnight) and a cold symbol whose
        slices are sparse."""
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
            activity_bars_sliced,
        )

        rng = np.random.default_rng(17)
        d = dt.datetime(2024, 1, 1)
        rows = []
        # hot symbol: 2000 ticks over 5 days; cold: 40 ticks over 20 days
        for i in range(2000):
            rows.append(
                ("HOT", d + dt.timedelta(minutes=int(i * 3.6)),
                 float(50 + rng.normal(0, 1)), float(rng.integers(1, 30)))
            )
        for i in range(40):
            rows.append(
                ("COLD", d + dt.timedelta(hours=i * 12),
                 float(20 + rng.normal(0, 1)), float(rng.integers(1, 30)))
            )
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        ).repartition(7)
        import math

        for by, thr in (("volume", 500.0), ("dollar", 20000.0)):
            mono = sorted(
                map(tuple, activity_bars(ticks, thr, by).collect())
            )
            sliced = sorted(
                map(tuple, activity_bars_sliced(ticks, thr, by).collect())
            )
            # bar ASSIGNMENT and every pick/count column must be exact;
            # vwap = notional/volume is an aggregate SUM whose fold order
            # is layout-dependent on both plans, so it matches to 1 ulp,
            # not bitwise (same caveat as any Spark re-partitioned sum)
            assert len(mono) == len(sliced), (by, thr)
            for m, s in zip(mono, sliced):
                assert m[:6] == s[:6], (by, thr, m, s)      # keys..close
                assert m[7:] == s[7:], (by, thr, m, s)      # volume..ts
                assert math.isclose(m[6], s[6], rel_tol=1e-12), (by, thr, m, s)
            assert len(mono) > 10  # real bar structure, not one bucket


class TestRangeVolAndKyle:
    def test_range_vol_matches_formulas(self, spark):
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            ANNUALIZE_DAILY,
            range_volatility,
        )

        rng = np.random.default_rng(15)
        d = dt.date(2024, 1, 1)
        rows = []
        closes = 100 + np.cumsum(rng.normal(0, 1, 30))
        for i, c in enumerate(closes):
            o = c + rng.normal(0, 0.5)
            h = max(o, c) + abs(rng.normal(0, 0.5))
            l = min(o, c) - abs(rng.normal(0, 0.5))
            rows.append(("A", d + dt.timedelta(days=i), float(o), float(h), float(l), float(c)))
        bars = spark.createDataFrame(
            rows, "sym string, day date, open double, high double, low double, close double"
        )
        got = (
            range_volatility(bars, ["sym"], window=10)
            .toPandas().sort_values("day", ignore_index=True)
        )
        import pandas as pd

        pdf = bars.toPandas().sort_values("day", ignore_index=True)
        pk = (np.log(pdf.high / pdf.low) ** 2) / (4 * np.log(2))
        gk = 0.5 * np.log(pdf.high / pdf.low) ** 2 - (2 * np.log(2) - 1) * np.log(pdf.close / pdf.open) ** 2
        exp_pk = pk.rolling(10, min_periods=1).mean()
        exp_gk = gk.rolling(10, min_periods=1).mean()
        np.testing.assert_allclose(got["parkinson_var"], exp_pk, rtol=1e-12)
        np.testing.assert_allclose(got["gk_var"], exp_gk, rtol=1e-12)
        np.testing.assert_allclose(
            got["parkinson_vol"], np.sqrt(exp_pk) * ANNUALIZE_DAILY, rtol=1e-12
        )

    def test_kyle_lambda_recovers_planted_impact(self, spark):
        import numpy as np

        from real_time_financial_data_pipeline_spark.operators.finance import (
            kyle_lambda,
        )

        rng = np.random.default_rng(33)
        d = dt.datetime(2024, 1, 1, 9, 30)
        lam = 0.003
        price = 100.0
        rows = []
        for i in range(800):
            q = 1 if rng.random() < 0.5 else -1
            v = float(rng.integers(1, 100))
            # planted linear impact: the NEXT price moves by lam * q * v
            price = price + lam * q * v + rng.normal(0, 0.01)
            rows.append(("A", d + dt.timedelta(seconds=i), float(price), v))
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        row = kyle_lambda(ticks, ["event_type"]).collect()[0]
        # tick-rule signs recover the trade direction (impact dominates
        # noise), so the regression slope lands near the planted lambda
        assert row["kyle_lambda"] == pytest.approx(lam, rel=0.15)
        assert row["n_ticks"] == 799

    def test_kyle_lambda_moments_share_one_sample(self, spark):
        """Regression (review): the first tick's undefined dP must drop
        out of BOTH moments — 3-tick series where keeping the spurious
        sv=0 row in the variance halves the slope."""
        from real_time_financial_data_pipeline_spark.operators.finance import (
            kyle_lambda,
        )

        d = dt.datetime(2024, 1, 1)
        ticks = spark.createDataFrame(
            [("A", d, 100.0, 10.0),
             ("A", d + dt.timedelta(seconds=1), 101.0, 10.0),
             ("A", d + dt.timedelta(seconds=2), 103.0, 20.0)],
            "event_type string, ts timestamp, price double, size double",
        )
        row = kyle_lambda(ticks, ["event_type"]).collect()[0]
        # valid pairs: (dp, sv) = (1, 10), (2, 20) -> exact OLS slope 0.1
        assert row["kyle_lambda"] == pytest.approx(0.1, rel=1e-12)
        assert row["n_ticks"] == 2


class TestActivityBarsNulls:
    def test_null_boundary_prints(self, spark):
        """Regression (review): a bar whose FIRST/LAST tick has a null
        price must take open/close from the nearest valid print, and the
        null print's size still counts toward volume/activity."""
        from real_time_financial_data_pipeline_spark.operators.finance import (
            activity_bars,
        )

        d = dt.datetime(2024, 1, 1, 9, 30)
        rows = [
            ("A", d, None, 3.0),                          # bad boundary print
            ("A", d + dt.timedelta(seconds=1), 10.0, 4.0),
            ("A", d + dt.timedelta(seconds=2), 11.0, 2.0),
            ("A", d + dt.timedelta(seconds=3), None, 1.0),  # bad closing print
        ]
        ticks = spark.createDataFrame(
            rows, "event_type string, ts timestamp, price double, size double"
        )
        bar = activity_bars(ticks, 100.0, "volume").collect()[0]
        assert bar.open == 10.0 and bar.close == 11.0
        assert bar.high == 11.0 and bar.low == 10.0
        assert bar.volume == 10.0 and bar.n_ticks == 4
        assert bar.vwap == pytest.approx((10.0 * 4 + 11.0 * 2) / 10.0)
