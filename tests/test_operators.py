"""Core operator semantics: clean / normalize / aggregate / query surface."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.aggregate import aggregate_data, ohlcv
from real_time_financial_data_pipeline_spark.operators.clean import clean_data
from real_time_financial_data_pipeline_spark.operators.normalize import normalize_data
from real_time_financial_data_pipeline_spark.operators.query import (
    correlation,
    latest_per_key,
    moving_average,
    preview,
    timeseries,
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        ("A", "2024-01-01 10:00:00", "10.5", "100"),
        ("A", "2024-01-01 10:00:00", "10.5", "100"),  # exact dup
        ("A", "2024-01-02 10:00:00", "not_a_number", "200"),
        ("B", "2024-01-01 10:00:00", "7.25", None),  # null volume
        ("B", "2024-01-03 10:00:00", "8.0", "50"),
    ]
    return spark.createDataFrame(rows, "symbol string, timestamp string, close string, volume string")


def test_clean_drops_nulls_dups_and_coerces(dirty):
    out = clean_data(dirty)
    rows = {(r.symbol, str(r.timestamp), r.close) for r in out.collect()}
    # dup removed, null-volume row removed; bad numeric kept but coerced to null
    assert len(rows) == 3
    bad = [r for r in out.collect() if r.close is None]
    assert len(bad) == 1  # 'not_a_number' -> null, row retained (dropna ran before coercion)
    types = dict(out.dtypes)
    assert types["timestamp"] == "timestamp" and types["close"] == "double" and types["volume"] == "bigint"


def test_normalize_forex_mid_rate(spark):
    fx = spark.createDataFrame([(1.0, 2.0)], "open double, close double")
    out = normalize_data(fx, "forex").collect()[0]
    assert out.mid_rate == 1.5 and out.data_type == "forex"


def test_normalize_missing_columns_warns_not_raises(spark):
    df = spark.createDataFrame([(1,)], "x int")
    assert normalize_data(df, "stock").columns == ["x", "data_type"]


def test_aggregate_named_agg_map_and_period_start_labels(spark):
    rows = [
        ("2024-03-05 01:00:00", 10.0, 5),
        ("2024-03-20 01:00:00", 30.0, 7),
        ("2024-04-02 01:00:00", 20.0, 2),
    ]
    df = spark.createDataFrame(rows, "timestamp string, close double, volume long").withColumn(
        "timestamp", F.col("timestamp").cast("timestamp")
    )
    out = {r.period: r for r in aggregate_data(df, "M", {"close": "last", "volume": "sum"}).collect()}
    mar = out[dt.datetime(2024, 3, 1)]  # period-START label
    assert mar.close == 30.0 and mar.volume == 12
    assert out[dt.datetime(2024, 4, 1)].close == 20.0


def test_aggregate_rejects_unknown_period_and_function(spark):
    df = spark.createDataFrame([("2024-01-01", 1.0)], "timestamp string, close double")
    with pytest.raises(ValueError):
        aggregate_data(df, "X")
    with pytest.raises(ValueError):
        aggregate_data(df, "M", {"close": "median"})


def test_ohlcv_first_last_by_time_not_position(spark):
    # rows deliberately out of time order: positional first/last would differ
    rows = [("2024-01-01 12:00:00", 5.0), ("2024-01-01 01:00:00", 1.0), ("2024-01-01 23:00:00", 9.0)]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn("ts", F.col("ts").cast("timestamp"))
    r = ohlcv(df.withColumn("k", F.lit("x")), "D", "ts", "value", ["k"]).collect()[0]
    assert r.open == 1.0 and r.close == 9.0 and r.high == 9.0 and r.low == 1.0 and r.n_events == 3


def test_moving_average_window(spark):
    df = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(5)], "id long, k string, v double"
    )
    out = {r.id: r.ma for r in moving_average(df, "v", 3, ["k"], ["id"], "ma").collect()}
    assert out[0] == 0.0 and out[2] == 1.0 and out[4] == 3.0  # trailing 3-row means


def test_correlation_perfect_series(spark):
    rows = []
    for h in range(10):
        ts = f"2024-01-01 {h:02d}:30:00"
        rows.append(("x", ts, float(h)))
        rows.append(("y", ts, 2.0 * h + 1))  # perfectly correlated
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    r = correlation(df, "k", "x", "y", "ts", "v", "hour").collect()[0]
    assert abs(r.correlation - 1.0) < 1e-9


def test_latest_per_key_matches_window_formulation(events):
    a = latest_per_key(events, ["user_id"], "ts")
    from real_time_financial_data_pipeline_spark.operators.query import latest_per_key_window

    b = latest_per_key_window(events, ["user_id"], ["ts"])
    sa = {(r.user_id, r.event_id) for r in a.collect()}
    sb = {(r.user_id, r.event_id) for r in b.collect()}
    assert sa == sb and len(sa) > 0


def test_timeseries_bounds_and_order(events):
    out = timeseries(events, "event_type", "purchase", "ts", "2024-01-05", "2024-01-10").collect()
    assert all(r.event_type == "purchase" for r in out)
    ts = [r.ts for r in out]
    assert ts == sorted(ts)
    assert all(dt.datetime(2024, 1, 5) <= t < dt.datetime(2024, 1, 10) for t in ts)


def test_preview_bounded(events):
    assert len(preview(events, 7, ["event_id"]).collect()) == 7


def test_cardinality_exact_vs_hll_tolerance(spark):
    """approx_count_distinct (HLL++) must land within ~5·rsd of the exact
    distinct count on a high-cardinality column."""
    from real_time_financial_data_pipeline_spark.operators.query import cardinality_stats

    df = spark.range(200_000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS k",
        "CAST(pmod(id * 2654435761, 50000) AS LONG) AS v",
    )
    exact = {r.k: r.n_distinct for r in cardinality_stats(df, ["k"], "v").collect()}
    approx = {r.k: r.n_distinct for r in
              cardinality_stats(df, ["k"], "v", approx=True, rsd=0.02).collect()}
    for k in exact:
        assert abs(approx[k] - exact[k]) <= 0.1 * exact[k], (k, exact[k], approx[k])


def test_percentiles_exact_vs_approx_tolerance(spark):
    """Documented tolerance: approx_percentile at accuracy=10_000 must land
    within +-0.01 quantile rank of the exact percentile (rank error is
    bounded by n/accuracy rows per group)."""
    from real_time_financial_data_pipeline_spark.operators.query import percentiles

    n = 10_000
    df = spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS k",
        # deterministic non-uniform values
        "CAST(pmod(id * 2654435761, 100000) AS DOUBLE) / 100 AS v",
    )
    ps = [0.5, 0.9, 0.99]
    exact = {r.k: r for r in percentiles(df, "v", ["k"], ps).collect()}
    approx = {r.k: r for r in percentiles(df, "v", ["k"], ps, approx=True).collect()}
    # exact values at the +-0.01 rank bounds bracket the approx answer
    lo = {r.k: r for r in percentiles(df, "v", ["k"], [max(p - 0.01, 0.0) for p in ps]).collect()}
    hi = {r.k: r for r in percentiles(df, "v", ["k"], [min(p + 0.01, 1.0) for p in ps]).collect()}
    for k in ("a", "b"):
        for p, plo, phi in [(50, 49, 51), (90, 89, 91), (99, 98, 100)]:
            a = approx[k][f"p{p}"]
            assert lo[k][f"p{plo}"] <= a <= hi[k][f"p{phi}"], (k, p, a, exact[k][f"p{p}"])


def test_quality_check_counts_planted_violations(spark):
    """Each rule counts exactly its planted violations (null predicate
    results count as failures); uniqueness = total - distinct."""
    from real_time_financial_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [
            (1, "click", 50.0),
            (2, "click", -1.0),     # range violation
            (3, "bogus", 10.0),     # set violation
            (None, "view", 20.0),   # null violation
            (4, None, None),        # set (null) + range (null) violations
            (4, "view", 30.0),      # duplicate id
        ],
        "id long, kind string, v double",
    )
    out = {r.rule: (r.violations, r.total, r.passed) for r in Q.check(
        df,
        [Q.not_null("id"), Q.in_range("v", 0, 100), Q.in_set("kind", ["click", "view"])],
        unique_cols=["id"],
    ).collect()}
    assert out["id_not_null"] == (1, 6, False)
    assert out["v_in_range"] == (2, 6, False)   # -1 and NULL both fail
    assert out["kind_in_set"] == (2, 6, False)  # 'bogus' and NULL both fail
    # count_distinct ignores the NULL id: 6 rows - 4 distinct non-null = 2
    assert out["id_unique"] == (2, 6, False)

    clean = spark.createDataFrame([(1, "click", 5.0)], "id long, kind string, v double")
    assert all(r.passed for r in Q.check(
        clean, [Q.not_null("id"), Q.in_range("v", 0, 100)], unique_cols=["id"]
    ).collect())


def test_quality_check_edge_cases(spark):
    """Empty input reports 0 violations / passed (not nulls); duplicate
    rule names coexist; quoted values don't break the predicate."""
    from real_time_financial_data_pipeline_spark.operators import quality as Q

    empty = spark.createDataFrame([], "id long, kind string, v double")
    rows = Q.check(empty, [Q.not_null("id"), Q.in_range("v", 0, 10)], unique_cols=["id"]).collect()
    assert all(r.violations == 0 and r.passed and r.total == 0 for r in rows)

    dup = spark.createDataFrame([(1, 5.0)], "id long, v double")
    out = Q.check(dup, [Q.in_range("v", 0, 10), Q.in_range("v", 0, 4)]).collect()
    assert [(r.rule, r.violations) for r in out] == [("v_in_range", 0), ("v_in_range", 1)]

    quo = spark.createDataFrame([("o'brien",), ("x",)], "kind string")
    assert Q.check(quo, [Q.in_set("kind", ["o'brien"])]).collect()[0].violations == 1


def test_sessionize_assigns_gap_based_ids(spark):
    from real_time_financial_data_pipeline_spark.operators.query import sessionize

    rows = [
        ("u", "2024-01-01 10:00:00"), ("u", "2024-01-01 10:20:00"),  # session 1
        ("u", "2024-01-01 11:30:00"),                                 # gap > 30m -> 2
        ("u", "2024-01-01 11:59:00"),                                 # still 2
        ("v", "2024-01-01 10:00:00"),                                 # own key -> 1
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {(r.user_id, str(r.ts)): r.session_id
           for r in sessionize(df, ["user_id"], "ts").collect()}
    assert out[("u", "2024-01-01 10:00:00")] == 1
    assert out[("u", "2024-01-01 10:20:00")] == 1
    assert out[("u", "2024-01-01 11:30:00")] == 2
    assert out[("u", "2024-01-01 11:59:00")] == 2
    assert out[("v", "2024-01-01 10:00:00")] == 1


def test_ohlcv_all_period_buckets(spark):
    """All five calendar frequencies bucket correctly (pytest anchor for the
    ohlcv_weekly/quarterly/yearly registry twins retired to fit the driver's
    50-query correctness cap — same parametrized code path as the
    oracle-checked daily/monthly entries)."""
    rows = [
        ("2023-12-31 12:00:00", 1.0),  # Sunday, Q4, 2023
        ("2024-01-01 12:00:00", 2.0),  # Monday (new ISO week), Q1, 2024
        ("2024-01-06 12:00:00", 3.0),  # same ISO week as Jan 1
        ("2024-04-01 12:00:00", 4.0),  # Q2
    ]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withColumn("k", F.lit("x"))

    def buckets(period: str) -> dict[dt.datetime, tuple[float, float, int]]:
        return {
            r.period: (r.open, r.close, r.n_events)
            for r in ohlcv(df, period, "ts", "value", ["k"]).collect()
        }

    w = buckets("W")  # date_trunc('week') = Monday start
    assert w[dt.datetime(2023, 12, 25)] == (1.0, 1.0, 1)
    assert w[dt.datetime(2024, 1, 1)] == (2.0, 3.0, 2)
    q = buckets("Q")
    assert q[dt.datetime(2023, 10, 1)] == (1.0, 1.0, 1)
    assert q[dt.datetime(2024, 1, 1)] == (2.0, 3.0, 2)
    assert q[dt.datetime(2024, 4, 1)] == (4.0, 4.0, 1)
    y = buckets("Y")
    assert y[dt.datetime(2023, 1, 1)] == (1.0, 1.0, 1)
    assert y[dt.datetime(2024, 1, 1)] == (2.0, 4.0, 3)


def test_with_lag_delta(spark):
    """Per-series lag/delta: first row of each series has null prev/delta,
    later rows difference against the previous value in (ts, id) order."""
    from real_time_financial_data_pipeline_spark.operators.query import with_lag

    rows = [("a", 1, 10.0), ("a", 2, 13.0), ("a", 3, 11.5), ("b", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    out = {(r.k, r.id): (r.prev_value, r.delta)
           for r in with_lag(df, "v", ["k"], ["id"]).collect()}
    assert out[("a", 1)] == (None, None)
    assert out[("a", 2)] == (10.0, 3.0)
    assert out[("a", 3)] == (13.0, -1.5)
    assert out[("b", 1)] == (None, None)


def test_pivot_melt_round_trip(events, spark):
    """pivot → melt (dropping manufactured null cells) must equal the direct
    per-(day, type) aggregate — the losslessness invariant that used to be
    the events_pivot/unpivot oracle pair."""
    from real_time_financial_data_pipeline_spark.operators.query import pivot_series

    types = [r[0] for r in events.select("event_type").distinct().collect()]
    wide = pivot_series(
        events, F.date_trunc("day", F.col("ts")), "event_type", sorted(types),
        "value", "day",
    )
    melted = wide.melt(
        ids=["day"], values=sorted(types),
        variableColumnName="event_type", valueColumnName="avg_value",
    ).filter(F.col("avg_value").isNotNull())
    direct = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.round(F.avg("value"), 6).alias("avg_value"))
    got = {(r.day, r.event_type): r.avg_value for r in melted.collect()}
    want = {(r.day, r.event_type): r.avg_value for r in direct.collect()}
    assert got == want and len(want) > 0


def test_sql_dataframe_parity(spark):
    """The engine's SQL face: registered temp views + spark.sql produce the
    same result as the DataFrame formulation (Catalyst plans both)."""
    from real_time_financial_data_pipeline_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    via_sql = {
        (r.mktsegment, r.n_customers)
        for r in spark.sql(
            "SELECT c_mktsegment AS mktsegment, count(*) AS n_customers "
            "FROM customer GROUP BY 1"
        ).collect()
    }
    from real_time_financial_data_pipeline_spark.catalog import load_table

    via_df = {
        (r.mktsegment, r.n_customers)
        for r in load_table(spark, "/root/testdata/sf0.001", "customer")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .collect()
    }
    assert via_sql == via_df and len(via_sql) > 0


def test_scd2_apply_versions_only_real_changes(spark):
    from real_time_financial_data_pipeline_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "gold", "2024-01-01 00:00:00", None),          # will change
            (2, "silver", "2024-01-01 00:00:00", None),        # no-op update
            (3, "bronze", "2024-01-01 00:00:00", None),        # no update
            (1, "silver", "2023-01-01 00:00:00", "2024-01-01 00:00:00"),  # history
        ],
        "k long, tier string, valid_from string, valid_to string",
    ).select(
        "k", "tier",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [(1, "platinum", "2024-06-01 00:00:00"), (2, "silver", "2024-06-01 00:00:00")],
        "k long, tier string, effective_ts string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))

    out = scd2_apply(dim, updates, ["k"], ["tier"])
    rows = {(r.k, r.tier, str(r.valid_from), str(r.valid_to)) for r in out.collect()}
    assert rows == {
        (1, "silver", "2023-01-01 00:00:00", "2024-01-01 00:00:00"),  # history kept
        (1, "gold", "2024-01-01 00:00:00", "2024-06-01 00:00:00"),    # closed
        (1, "platinum", "2024-06-01 00:00:00", "None"),               # new current
        (2, "silver", "2024-01-01 00:00:00", "None"),                 # no-op: untouched
        (3, "bronze", "2024-01-01 00:00:00", "None"),                 # no update
    }
    # exactly one current version per live key
    assert out.filter(F.col("valid_to").isNull()).count() == 3

    # MERGE "not matched": an update for a key absent from the dimension
    # inserts a brand-new current row (previously silently dropped)
    new_key = spark.createDataFrame(
        [(42, "iron", "2024-06-01 00:00:00")], "k long, tier string, effective_ts string"
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out2 = scd2_apply(dim, new_key, ["k"], ["tier"]).filter(F.col("k") == 42).collect()
    assert len(out2) == 1 and out2[0].tier == "iron" and out2[0].valid_to is None
    assert str(out2[0].valid_from) == "2024-06-01 00:00:00"

    # invalid input fails loudly instead of silently no-opping
    null_eff = spark.createDataFrame(
        [(1, "x", None)], "k long, tier string, effective_ts timestamp"
    )
    with pytest.raises(ValueError):
        scd2_apply(dim, null_eff, ["k"], ["tier"])
    with pytest.raises(ValueError):
        scd2_apply(dim, updates, ["k"], [])


class TestFrequentItems:
    def _zipf_df(self, spark, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        # 5 planted heavy hitters over a long uniform tail
        heavy = [f"hh{i}" for i in range(5)]
        rows = [(h,) for i, h in enumerate(heavy) for _ in range(500 - 50 * i)]
        rows += [(f"tail{int(x)}",) for x in rng.integers(0, 5000, 4000)]
        rng.shuffle(rows)
        return spark.createDataFrame(rows, "item string")

    def test_exact_matches_full_groupby(self, spark):
        from real_time_financial_data_pipeline_spark.operators.query import (
            frequent_items,
        )

        df = self._zipf_df(spark).repartition(8)
        got = [(r.item, r["count"]) for r in frequent_items(df, "item", k=5, capacity=64).collect()]
        exp = [
            (r.item, r.n)
            for r in df.groupBy("item").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("item")).limit(5).collect()
        ]
        assert got == exp
        assert [i for i, _ in got] == [f"hh{i}" for i in range(5)]

    def test_approx_counts_are_lower_bounds(self, spark):
        from real_time_financial_data_pipeline_spark.operators.query import (
            frequent_items,
        )

        df = self._zipf_df(spark).repartition(8)
        n = df.count()
        capacity = 64
        true = {
            r.item: r.n
            for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
        }
        approx = {
            r.item: r.approx_count
            for r in frequent_items(df, "item", k=5, capacity=capacity, exact=False).collect()
        }
        assert approx  # heavy hitters surface
        for item, c in approx.items():
            assert c <= true[item]
            assert c >= true[item] - n / (capacity + 1)

    def test_capacity_guard(self, spark):
        from real_time_financial_data_pipeline_spark.operators.query import (
            frequent_items,
        )

        df = self._zipf_df(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            frequent_items(df, "item", k=10, capacity=5)

    def test_nulls_excluded_by_contract(self, spark):
        from real_time_financial_data_pipeline_spark.operators.query import (
            frequent_items,
        )

        rows = [(None,)] * 50 + [("a",)] * 10 + [("b",)] * 5
        df = spark.createDataFrame(rows, "item string")
        got = [(r.item, r["count"]) for r in frequent_items(df, "item", k=2, capacity=8).collect()]
        assert got == [("a", 10), ("b", 5)]  # null never competes
