"""As-of join and gap-fill semantics."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from real_time_financial_data_pipeline_spark.operators.asof import asof_join, gap_fill


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1), ("k", "2024-01-01 12:00:00", 2), ("k", "2024-01-01 08:00:00", 3)],
        "key string, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 09:00:00", 100.0), ("k", "2024-01-01 11:00:00", 200.0)],
        "key string, ts string, px double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {r.event_id: (r.asof_ts, r.px_asof) for r in asof_join(left, right, ["key"], "ts", ["px"]).collect()}
    assert out[1] == (_ts("2024-01-01 09:00:00"), 100.0)  # between quotes
    assert out[2] == (_ts("2024-01-01 11:00:00"), 200.0)  # after both
    assert out[3] == (None, None)  # before any quote


def test_asof_join_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([("k", "2024-01-01 09:00:00", 1)], "key string, ts string, event_id long").withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame([("k", "2024-01-01 09:00:00", 5.0)], "key string, ts string, px double").withColumn("ts", F.col("ts").cast("timestamp"))
    r = asof_join(left, right, ["key"], "ts", ["px"]).collect()[0]
    assert r.px_asof == 5.0  # ts >= ts is inclusive


def test_asof_join_respects_keys(spark):
    left = spark.createDataFrame([("a", "2024-01-01 10:00:00", 1)], "key string, ts string, event_id long").withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame([("b", "2024-01-01 09:00:00", 9.0)], "key string, ts string, px double").withColumn("ts", F.col("ts").cast("timestamp"))
    r = asof_join(left, right, ["key"], "ts", ["px"]).collect()[0]
    assert r.px_asof is None  # other key's quotes are invisible


def test_asof_join_tiebreak_resolves_equal_right_ts(spark):
    """Two right rows at the same ts: the tiebreak column decides
    deterministically (max wins), regardless of input/partition order."""
    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1)], "key string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tied = [("k", "2024-01-01 09:00:00", 7, 100.0), ("k", "2024-01-01 09:00:00", 9, 200.0)]
    for rows in (tied, tied[::-1]):  # both input orders
        right = spark.createDataFrame(
            rows, "key string, ts string, quote_id long, px double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(4)
        r = asof_join(
            left, right, ["key"], "ts", ["px"], right_tiebreak_col="quote_id"
        ).collect()[0]
        assert r.px_asof == 200.0  # quote_id 9 > 7 wins


def test_latest_per_key_tiebreak(spark):
    from real_time_financial_data_pipeline_spark.operators.query import latest_per_key

    rows = [("u", "2024-01-01 09:00:00", 1, "a"), ("u", "2024-01-01 09:00:00", 3, "c"),
            ("u", "2024-01-01 09:00:00", 2, "b"), ("v", "2024-01-01 08:00:00", 9, "z")]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(
            perm, "user_id string, ts string, event_id long, val string"
        ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(4)
        out = {r.user_id: (r.event_id, r.val) for r in
               latest_per_key(df, ["user_id"], "ts", tiebreak_col="event_id").collect()}
        assert out["u"] == (3, "c")  # max event_id among tied ts
        assert out["v"] == (9, "z")


def test_gap_fill_densifies_and_forward_fills(spark):
    df = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", 1.0), ("s", "2024-01-04 00:00:00", 4.0)],
        "key string, period string, v double",
    ).withColumn("period", F.col("period").cast("timestamp"))
    out = {str(r.period)[:10]: r.v_ff for r in gap_fill(df, "key", "period", ["v"]).collect()}
    assert out == {"2024-01-01": 1.0, "2024-01-02": 1.0, "2024-01-03": 1.0, "2024-01-04": 4.0}


def test_gap_fill_single_pass_plan_and_null_fill(spark):
    """r17 contract: gap_fill is ONE pass over its input — no bounds
    aggregate + calendar join back (which instantiated the feeding subtree
    twice = two scans at warehouse scale).  Null-valued observations keep
    the pre-r17 per-column ignorenulls fill: the null observation inherits
    the last non-null value, gaps after it fill from the same."""
    rows = [
        ("k", "2024-01-01 00:00:00", 1.0),
        ("k", "2024-01-03 00:00:00", None),   # null observation mid-series
        ("k", "2024-01-06 00:00:00", 6.0),
        ("m", "2024-02-01 00:00:00", 9.0),    # single-observation key
    ]
    df = spark.createDataFrame(rows, "key string, period string, v double").withColumn(
        "period", F.col("period").cast("timestamp")
    )
    out = gap_fill(df, "key", "period", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no calendar join back
    got = {(r.key, str(r.period)[:10]): r.v_ff for r in out.collect()}
    assert got == {
        ("k", "2024-01-01"): 1.0,
        ("k", "2024-01-02"): 1.0,
        ("k", "2024-01-03"): 1.0,  # null observation forward-fills through
        ("k", "2024-01-04"): 1.0,
        ("k", "2024-01-05"): 1.0,
        ("k", "2024-01-06"): 6.0,
        ("m", "2024-02-01"): 9.0,
    }


def test_asof_join_single_scan_matches_union_form(spark):
    """r17 single-scan form: row-identical to asof_join on two disjoint
    filtered slices of one table, from ONE scan (plan-pinned: one source
    subtree, no Union).  Adversarial edges: equal-ts left/right ties
    (inclusive semantics), a key with no right rows, NULL type rows
    (dropped by both forms), a tiebreak column with tied right ts."""
    from real_time_financial_data_pipeline_spark.operators.asof import (
        asof_join_single_scan,
    )

    rows = [
        ("u1", "2024-01-01 09:00:00", "click", 1, 10.0),
        ("u1", "2024-01-01 10:00:00", "purchase", 2, 99.0),
        ("u1", "2024-01-01 10:00:00", "click", 3, 20.0),   # equal-ts tie
        ("u1", "2024-01-01 10:00:00", "purchase", 4, 98.0),
        ("u2", "2024-01-01 08:00:00", "purchase", 5, 97.0),  # no clicks at all
        ("u2", "2024-01-01 09:00:00", "view", 6, 1.0),       # neither side
        ("u3", None, "purchase", 7, 96.0),                   # null ts
        ("u1", "2024-01-01 09:00:00", "click", 8, 11.0),     # tied right ts
        (None, "2024-01-01 09:30:00", "purchase", 9, 95.0),  # null key
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, ts string, event_type string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(4)

    for tb in (None, "event_id"):
        union_form = asof_join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", "ts", "event_id", "value"
            ),
            ev.filter(F.col("event_type") == "click").select(
                "user_id", "ts", *([tb] if tb else []), "value"
            ),
            ["user_id"],
            "ts",
            ["value"],
            right_tiebreak_col=tb,
        )
        single = asof_join_single_scan(
            ev,
            ["user_id"],
            "ts",
            left_filter=F.col("event_type") == "purchase",
            right_filter=F.col("event_type") == "click",
            left_extra_cols=["event_id", "value"],
            right_value_cols=["value"],
            right_tiebreak_col=tb,
        )
        assert union_form.columns == single.columns
        key = lambda r: tuple(str(v) for v in r)
        assert sorted(map(key, union_form.collect())) == sorted(
            map(key, single.collect())
        )

    plan = (
        asof_join_single_scan(
            ev,
            ["user_id"],
            "ts",
            left_filter=F.col("event_type") == "purchase",
            right_filter=F.col("event_type") == "click",
            left_extra_cols=["event_id", "value"],
            right_value_cols=["value"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Union" not in plan


def test_asof_join_single_scan_rejects_overlapping_filters(spark):
    """The mutual-exclusivity precondition is ENFORCED per row: a row
    matching both filters raises instead of silently dropping the
    union form's right-side copy (review-caught, r17)."""
    import pyspark.errors
    import pytest

    from real_time_financial_data_pipeline_spark.operators.asof import (
        asof_join_single_scan,
    )

    ev = spark.createDataFrame(
        [("u1", "2024-01-01 09:00:00", 7.0, 1)],
        "user_id string, ts string, value double, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join_single_scan(
        ev, ["user_id"], "ts",
        left_filter=F.col("value") > 1.0,   # overlaps right_filter
        right_filter=F.col("value") > 5.0,
        left_extra_cols=["event_id"], right_value_cols=["value"],
    )
    with pytest.raises(Exception, match="overlap"):
        out.collect()
