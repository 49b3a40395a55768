"""r18 relational-plan shape + equivalence pins.

The conditional keyed spread (`plans/relational._spread_fact`) and the
two-level rollup change WHERE work runs, never WHAT is computed — these
tests pin both halves: the plan shapes that carry the win, and row-exact
equivalence against the single-level forms.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from real_time_financial_data_pipeline_spark.catalog import load_table
from real_time_financial_data_pipeline_spark.plans.relational import (
    _dec,
    _frac,
    _spread_fact,
    pricing_summary,
    revenue_rollup,
)

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tpch(spark):
    return {
        t: load_table(spark, SF0001, t)
        for t in ["lineitem", "orders", "customer", "nation", "region"]
    }


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spread_fact_exchange_is_reused_by_groupby(spark, tpch):
    """The keyed spread's exchange must BE the aggregation exchange: one
    hashpartitioning Exchange on the key, no second exchange above the
    partial aggregate (ClusteredDistribution reuse)."""
    fact = _spread_fact(
        tpch["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey",
    )
    agg = fact.groupBy("l_orderkey").agg(
        F.sum(_dec("l_extendedprice")).alias("_s")
    )
    plan = _plan(agg)
    assert plan.count("Exchange hashpartitioning(l_orderkey") == 1, plan
    # the spread fired (local single-file scan < cores): exchange below agg
    assert "REPARTITION_BY_NUM" in plan, plan


def test_spread_fact_noop_on_wide_input(spark):
    """An input already at >= defaultParallelism partitions passes through
    untouched — the warehouse-scale branch."""
    parallelism = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, parallelism + 2).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    out = _spread_fact(wide, "k")
    assert out is wide


def test_revenue_rollup_expand_is_above_groupby_agg(spark, tpch):
    """Two-level rollup: Expand's input must be the (region, nation)
    aggregate (25-ish rows), not the order-grain join output."""
    df = revenue_rollup(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["nation"], tpch["region"],
    )
    plan = _plan(df)
    expand_pos = plan.index("Expand")
    # the pre-rollup (region, nation) hash aggregate appears BELOW Expand
    below = plan[expand_pos:]
    assert "HashAggregate(keys=[r_name" in below, plan


def _sorted_rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_revenue_rollup_two_level_matches_single_level(spark, tpch):
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(6,4)") - _frac("l_discount")
    )
    per_order = tpch["lineitem"].groupBy("l_orderkey").agg(
        F.sum(revenue).alias("_rev")
    )
    single = (
        per_order.join(tpch["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(tpch["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(tpch["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(tpch["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum("_rev"), 2).cast("double").alias("revenue"))
    )
    two_level = revenue_rollup(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["nation"], tpch["region"],
    )
    assert _sorted_rows(single) == _sorted_rows(two_level)


def test_pricing_summary_spread_keeps_pushed_filter(spark, tpch):
    """The spread must not lift the shipdate predicate off the scan."""
    plan = _plan(pricing_summary(tpch["lineitem"]))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan, plan
