"""Streaming heavy hitters (streaming/heavy_hitters.py): planted-hitter
recovery across micro-batches, MG bound preservation, state-fold kernel
parity with the batch fold, and the null contract."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_financial_data_pipeline_spark.streaming.heavy_hitters import (
    _mg_fold,
    stream_heavy_hitters,
)


class TestFoldKernel:
    def test_bound_holds_under_adversarial_folds(self):
        rng = np.random.default_rng(11)
        capacity = 16
        true: dict[str, int] = {}
        counters: dict[str, int] = {}
        for _ in range(30):  # 30 micro-batches
            batch = {}
            for _ in range(rng.integers(5, 40)):
                item = f"i{rng.zipf(1.5) % 200}"
                batch[item] = batch.get(item, 0) + int(rng.integers(1, 5))
            for it, c in batch.items():
                true[it] = true.get(it, 0) + c
            counters = _mg_fold(counters, batch, capacity)
            assert len(counters) <= capacity
            n = sum(true.values())
            for it, c in counters.items():
                assert c <= true[it]
                assert c >= true[it] - n / (capacity + 1)
            # every item above the guarantee line is present
            for it, t in true.items():
                if t > n / (capacity + 1):
                    assert it in counters, (it, t, n)

    def test_exact_when_under_capacity(self):
        counters = _mg_fold({}, {"a": 5, "b": 2}, capacity=10)
        counters = _mg_fold(counters, {"a": 1, "c": 4}, capacity=10)
        assert counters == {"a": 6, "b": 2, "c": 4}


class TestStream:
    def test_planted_hitters_across_micro_batches(self, spark, tmp_path):
        rng = np.random.default_rng(5)
        rows1 = [("g1", "heavy") for _ in range(300)] + [
            ("g1", f"t{int(x)}") for x in rng.integers(0, 500, 400)
        ]
        rows2 = [("g1", "heavy2") for _ in range(250)] + [
            ("g1", f"u{int(x)}") for x in rng.integers(0, 500, 300)
        ] + [("g2", "only") for _ in range(5)]
        src = tmp_path / "src"
        schema = "grp string, item string"
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "f1"))
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "f2"))
        stream = (
            spark.readStream.schema(spark.read.parquet(str(src / "f1")).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream_heavy_hitters(stream, "grp", "item", k=5, capacity=64)
            .writeStream.format("memory")
            .queryName("hh_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        out = spark.table("hh_stream").toPandas()
        # final emission for g1: state folded BOTH micro-batches
        g1 = out[(out.group == "g1") & (out.n_total == out[out.group == "g1"].n_total.max())]
        assert int(g1.n_total.iloc[0]) == 700 + 550
        top2 = set(g1[g1["rank"] <= 2]["item"])
        assert top2 == {"heavy", "heavy2"}
        heavy_row = g1[g1.item == "heavy"].iloc[0]
        n = int(heavy_row.n_total)
        assert heavy_row.approx_count <= 300
        assert heavy_row.approx_count >= 300 - n / 65
        g2 = out[out.group == "g2"]
        assert set(g2.item) == {"only"} and int(g2.approx_count.iloc[0]) == 5

    def test_capacity_guard(self, spark):
        df = spark.readStream.format("rate").load().selectExpr(
            "CAST(value AS string) AS grp", "CAST(value AS string) AS item"
        )
        with pytest.raises(ValueError):
            stream_heavy_hitters(df, "grp", "item", k=10, capacity=3)
        with pytest.raises(ValueError):
            stream_heavy_hitters(df, "grp", "item", k=10, idle_ttl_ms=0)


class _FakeState:
    """Minimal GroupState stand-in for driving the update function's
    eviction branch deterministically."""

    def __init__(self):
        self._s = None
        self.removed = False
        self.timeout_set = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._s is not None

    @property
    def get(self):
        return self._s

    def update(self, t):
        self._s = t

    def remove(self):
        self._s, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


class TestIdleTtlGuard:
    """The bounded-groups guard (idle-TTL eviction): the update function
    must re-arm the timeout on every active batch, evict silently when
    the timeout fires, and restart a returning group from zero."""

    def test_timeout_armed_evicted_and_restarted(self):
        import pandas as pd

        from real_time_financial_data_pipeline_spark.streaming.heavy_hitters import (
            _make_update,
        )

        upd = _make_update(k=3, capacity=8, idle_ttl_ms=60_000)
        st = _FakeState()
        batch = [pd.DataFrame({"item": ["a", "a", "b"]})]
        out = list(upd(("g",), iter(batch), st))
        assert st.timeout_set == 60_000  # armed on activity
        assert st.exists and st._s[2] == 3
        assert len(out) == 1 and int(out[0].n_total.iloc[0]) == 3

        # idle: the timeout fires — state removed, nothing emitted
        st.hasTimedOut = True
        out = list(upd(("g",), iter([]), st))
        assert out == [] and st.removed and not st.exists

        # the group returns: counts restart from zero (documented cost)
        st.hasTimedOut = False
        out = list(upd(("g",), iter([pd.DataFrame({"item": ["a"]})]), st))
        assert int(out[0].n_total.iloc[0]) == 1

    def test_no_ttl_means_no_timeout_arming(self):
        import pandas as pd

        from real_time_financial_data_pipeline_spark.streaming.heavy_hitters import (
            _make_update,
        )

        upd = _make_update(k=3, capacity=8)
        st = _FakeState()
        list(upd(("g",), iter([pd.DataFrame({"item": ["a"]})]), st))
        assert st.timeout_set is None

    def test_ttl_stream_runs_end_to_end(self, spark, tmp_path):
        """Live smoke: the ProcessingTimeTimeout configuration must be
        accepted by a real streaming query (a long TTL so nothing evicts
        inside the drain — eviction logic is pinned by the fake-state
        tests above)."""
        src = tmp_path / "src"
        spark.createDataFrame(
            [("g1", "x")] * 10, "grp string, item string"
        ).coalesce(1).write.parquet(str(src / "f1"))
        stream = (
            spark.readStream.schema(spark.read.parquet(str(src / "f1")).schema)
            .parquet(str(src / "*"))
        )
        q = (
            stream_heavy_hitters(stream, "grp", "item", k=3, idle_ttl_ms=3_600_000)
            .writeStream.format("memory")
            .queryName("hh_ttl_stream")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
            .start()
        )
        # A stateful query with ProcessingTimeTimeout keeps scheduling
        # timer batches, so availableNow does NOT self-terminate here —
        # a bare awaitTermination(120) burned its full budget every
        # suite run (r15 suite-wall fix).  Poll for the drained result,
        # then stop the query explicitly; the 120 s budget remains the
        # failure bound, not the happy-path cost.
        import time

        deadline = time.time() + 120
        out = None
        while time.time() < deadline:
            if q.awaitTermination(2):
                break
            got = spark.table("hh_ttl_stream").toPandas()
            if len(got) and int(got[got.group == "g1"].approx_count.max()) == 10:
                out = got
                break
        q.stop()
        out = spark.table("hh_ttl_stream").toPandas() if out is None else out
        assert int(out[out.group == "g1"].approx_count.max()) == 10
