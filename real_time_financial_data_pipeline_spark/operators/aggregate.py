"""Calendar-period aggregation — reference ``aggregate_data``
(transformers.py:99-142), the analytical core of the reference (A1).

Reference semantics: ``df.groupby(pd.Grouper(key='timestamp', freq=T))``
with T in {D,W,M,Q,Y} and agg map ``{open:'first', high:'max', low:'min',
close:'last', volume:'sum'}``, optionally caller-supplied
``{column: func_name}`` (transformers.py:101,120-131).

Deliberate semantic decisions for distributed execution (SURVEY.md §4):

- pandas ``first``/``last`` are *positional* within the group — meaningless
  under partitioning.  We define them as value-at-min/max of the time column
  (``min_by``/``max_by``), which is deterministic on any cluster as long as
  the time column is unique within a group (true for all test data; ties
  would need a secondary key).
- pandas labels bins at period *end* (month-end, Sunday); we standardize on
  period-*start* labels via ``date_trunc``, which is also what ANSI SQL
  engines produce.  Documented divergence.

Scale notes: a single hash-aggregate with map-side partial aggregation; all
agg functions (min_by/max_by/min/max/sum/avg/count) have partial
implementations, so shuffle volume is O(groups), not O(rows).  No window
functions, no sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pandas Grouper freq -> date_trunc unit (frontend exposes all five,
# index.html:446-452; default 'M' at transformers.py:99).
FREQ_TO_TRUNC = {
    "D": "day",
    "W": "week",
    "M": "month",
    "Q": "quarter",
    "Y": "year",
}

# Named-agg whitelist: reference agg-map names -> deterministic Spark
# aggregates (SURVEY.md §2.11).  first/last take (value_col, time_col).
_SIMPLE_AGGS: dict[str, Callable[[str], Column]] = {
    "max": F.max,
    "min": F.min,
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "count": F.count,
}

DEFAULT_OHLCV_AGGS = {
    "open": "first",
    "high": "max",
    "low": "min",
    "close": "last",
    "volume": "sum",
}


def _agg_expr(col: str, func: str, time_col: str) -> Column:
    if func == "first":
        return F.min_by(col, time_col).alias(col)
    if func == "last":
        return F.max_by(col, time_col).alias(col)
    if func in _SIMPLE_AGGS:
        return _SIMPLE_AGGS[func](col).alias(col)
    raise ValueError(f"unsupported aggregate function: {func!r}")


def aggregate_data(
    df: DataFrame,
    time_period: str = "M",
    agg_columns: dict[str, str] | None = None,
    time_col: str = "timestamp",
    group_cols: list[str] | None = None,
    bucket_col: str = "period",
) -> DataFrame:
    """Calendar-period aggregation with a named-agg map.

    ``group_cols`` extends the reference (which groups by time only) with
    per-entity grouping (symbol / event_type) — required for multi-series
    tables and the natural shuffle key at scale.
    """
    unit = FREQ_TO_TRUNC.get(time_period.upper())
    if unit is None:
        raise ValueError(f"unsupported time_period {time_period!r}; expected one of {list(FREQ_TO_TRUNC)}")

    aggs = agg_columns or DEFAULT_OHLCV_AGGS
    # Reference prunes the agg map to present columns (transformers.py:131).
    aggs = {c: f for c, f in aggs.items() if c in df.columns}
    if not aggs:
        raise ValueError("no aggregatable columns present")

    keys = [F.date_trunc(unit, F.col(time_col)).alias(bucket_col)] + [
        F.col(c) for c in (group_cols or [])
    ]
    exprs = [_agg_expr(c, f, time_col) for c, f in aggs.items()]
    return df.groupBy(*keys).agg(*exprs)


def ohlcv(
    df: DataFrame,
    time_period: str,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    bucket_col: str = "period",
) -> DataFrame:
    """OHLC + count + sum over a single value column — the reference's OHLCV
    shape applied to a tick-like table (one price column).

    open/close are deterministic value-at-min/max-timestamp (min_by/max_by);
    the time column must be unique per (group, bucket).
    """
    unit = FREQ_TO_TRUNC.get(time_period.upper())
    if unit is None:
        raise ValueError(f"unsupported time_period {time_period!r}")
    keys = [F.col(c) for c in group_cols] + [
        F.date_trunc(unit, F.col(time_col)).alias(bucket_col)
    ]
    return df.groupBy(*keys).agg(
        F.min_by(value_col, time_col).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, time_col).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )
