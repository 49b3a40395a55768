"""Declared-but-unimplemented query surface of the reference, implemented.

The reference declares ``QueryRequest`` with query_type in {'timeseries',
'correlation', 'moving_average'} (schema.py:73-76) but ships no ``/query``
route (SURVEY.md §2.9).  These are first-class operators here.

Also implements the sort/limit operators (SURVEY.md §2.6): latest-top-1 (O1),
preview limit (O3).

Scale notes:
- ``timeseries`` is filter + sort; the equality/range predicates push into
  the parquet scan (partition pruning when the lake is date-partitioned).
- ``moving_average`` is one window per series — shuffle on the series key
  only, then a per-partition sort; no global sort.
- ``correlation`` aligns two series by time bucket with a single
  shuffle-on-bucket aggregate, then one ``corr``; avoids a row-level
  self-join entirely.
- ``latest_per_key`` is max_by per key (single partial-agg shuffle) rather
  than a window + filter, which would sort every partition.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def timeseries(
    df: DataFrame,
    key_col: str,
    key: str,
    time_col: str,
    start: str | dt.datetime | None = None,
    end: str | dt.datetime | None = None,
) -> DataFrame:
    """query_type='timeseries' (schema.py:74): one series, time-bounded,
    time-ordered."""
    out = df.filter(F.col(key_col) == key)
    if start is not None:
        out = out.filter(F.col(time_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        out = out.filter(F.col(time_col) < F.lit(end).cast("timestamp"))
    return out.orderBy(time_col)


def moving_average(
    df: DataFrame,
    value_col: str,
    n: int,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str = "moving_avg",
) -> DataFrame:
    """query_type='moving_average' (schema.py:75): trailing n-row mean per
    series.  ``order_cols`` must be a deterministic total order within each
    partition (include a unique tiebreak column)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn(out_col, F.avg(value_col).over(w))


def correlation(
    df: DataFrame,
    key_col: str,
    key_a: str,
    key_b: str,
    time_col: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """query_type='correlation' (schema.py:75): Pearson correlation of two
    series aligned on a time bucket.

    Alignment is a conditional-aggregate pivot — one shuffle on the bucket —
    not a self-join: ``groupBy(bucket).agg(avg(value) filtered per key)``
    then ``corr(a, b)``.
    """
    bucketed = (
        df.filter(F.col(key_col).isin(key_a, key_b))
        .groupBy(F.date_trunc(bucket, F.col(time_col)).alias("bucket"))
        .agg(
            F.avg(F.when(F.col(key_col) == key_a, F.col(value_col))).alias("a"),
            F.avg(F.when(F.col(key_col) == key_b, F.col(value_col))).alias("b"),
        )
    )
    return bucketed.agg(F.corr("a", "b").alias("correlation"))


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """O1 generalized — latest full row per key.

    Implemented as ``max_by(struct(*), ordering)`` per key: a single hash
    aggregate with partial combine, strictly cheaper at scale than
    row_number-over-window + filter (no per-partition sort).

    With ``tiebreak_col`` the ordering is the lexicographic struct
    ``(time, tiebreak)`` — rows tied on the time column resolve to the max
    tiebreak value, deterministically.  Without it, max_by picks an
    arbitrary row among exact time ties — pass a unique column (an event
    id) whenever the time column isn't unique per key.
    """
    others = [c for c in df.columns if c not in key_cols]
    ordering = (
        F.struct(F.col(time_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(time_col)
    )
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*others), ordering).alias("_row")
    )
    return packed.select(*key_cols, *[F.col(f"_row.{c}").alias(c) for c in others])


def latest_per_key_window(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """O1 via row_number — the window formulation, kept for composite
    orderings where max_by's single ordering column isn't enough."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_lag(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    lag_col: str = "prev_value",
    delta_col: str = "delta",
) -> DataFrame:
    """Per-series lag + delta — the tick-to-tick change primitive
    (lag/lead window family).  One shuffle on the series key."""
    w = Window.partitionBy(*partition_cols).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(value_col).over(w)
    return df.withColumn(lag_col, prev).withColumn(delta_col, F.col(value_col) - prev)


def pivot_series(
    df: DataFrame,
    row_key: Column,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    row_key_name: str = "bucket",
) -> DataFrame:
    """Wide alignment of series: one row per bucket, one column per series
    (the reference's correlation-alignment shape generalized).  With pivot
    values supplied explicitly Spark skips the extra distinct-values job —
    at 100 TB that first pass is a full scan worth skipping."""
    return (
        df.groupBy(row_key.alias(row_key_name))
        .pivot(pivot_col, pivot_values)
        .agg(F.round(F.avg(value_col), 6))
    )


def preview(df: DataFrame, n: int = 100, order_cols: list[str] | None = None) -> DataFrame:
    """O3 — bounded preview (UI cap 100 rows, index.html:945).  An explicit
    order makes the result deterministic; Spark turns orderBy+limit into a
    TakeOrderedAndProject (top-k per partition, no full sort)."""
    out = df.orderBy(*order_cols) if order_cols else df
    return out.limit(n)


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Batch gaps-and-islands sessionization: a new session starts wherever
    the gap to the previous event (per key) exceeds ``gap``; the session id
    is the running count of such starts.

    Two window functions over ONE (key, time) sort — a single shuffle and
    per-partition sort regardless of session count, the batch twin of the
    streaming ``session_window`` (same gap-based semantics, so batch
    backfills agree with the live stream).
    """
    w = Window.partitionBy(*key_cols).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > F.expr(f"INTERVAL {gap}")),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*key_cols).orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # collision-safe temp name: the input may legitimately carry any column
    tmp = "_new_session"
    while tmp in df.columns:
        tmp += "_"
    return df.withColumn(tmp, new_session).withColumn(
        session_col, F.sum(tmp).over(running).cast("long")
    ).drop(tmp)


def cardinality_stats(
    df: DataFrame,
    key_cols: list[str],
    count_col: str,
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct cardinality per key, exact or sketched.

    Exact ``count(DISTINCT x)`` plans as an expand + two-phase aggregate —
    fine when per-group distinct sets fit the shuffle.  ``approx=True``
    switches to ``approx_count_distinct`` (HyperLogLog++, relative standard
    deviation ``rsd``): fixed-size mergeable sketch per group, the 100 TB
    path for high-cardinality columns (tolerance-tested in
    tests/test_operators.py; the sketch itself isn't oracle-able since HLL
    internals differ across engines — the exact twin is the oracle query).
    """
    fn = (
        F.approx_count_distinct(count_col, rsd)
        if approx
        else F.countDistinct(count_col)
    )
    return df.groupBy(*key_cols).agg(fn.cast("long").alias("n_distinct"))


def percentiles(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    ps: list[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key quantiles, exact or approximate.

    Exact ``percentile`` (linear interpolation, = ANSI percentile_cont)
    buffers each group's values — fine up to millions of rows per group.
    ``approx=True`` switches to ``approx_percentile`` (KLL-style sketch,
    bounded memory, mergeable across partitions): the 100 TB path, with
    rank error <= n/accuracy rows per group — at the default accuracy the
    result sits within +-0.01 quantile rank of exact (tolerance test in
    tests/test_operators.py).
    """
    fn = (
        (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(accuracy)))
        if approx
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    # %g avoids float truncation (int(0.57*100)==56) and gives fractional
    # quantiles distinct names (0.575 -> p57_5) instead of duplicate aliases
    aggs = [
        F.round(fn(F.col(value_col), p), 6).alias(f"p{p * 100:g}".replace(".", "_"))
        for p in ps
    ]
    return df.groupBy(*key_cols).agg(*aggs)


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Top-k heavy hitters over a potentially unbounded-cardinality column
    with BOUNDED memory — the frequent-items member of the sketch family
    (alongside the HLL distinct and percentile sketches).

    A plain ``groupBy(col).count()`` shuffles one row per DISTINCT value;
    over a 100 TB user-id or URL column that intermediate is itself huge.
    This operator runs Misra-Gries per partition (state ≤ ``capacity``
    counters, default ``8k``) via ``mapInPandas``, so the shuffle carries
    at most partitions × capacity candidate rows.  MG summaries merge by
    summation: any item with true frequency > n/(capacity+1) per
    partition is guaranteed to surface as a candidate (the classic bound;
    misses are only ever items BELOW the guarantee line).

    ``exact=True`` adds the standard second pass: re-count ONLY the
    candidate set with one broadcast-semi-join aggregate, so reported
    counts are exact and the result is provably the true top-k whenever
    the k-th item clears the guarantee threshold.  ``exact=False`` skips
    the second scan and returns MG lower-bound counts.

    Nulls are excluded up front (sketch convention: null is the absence
    of an item, not a value competing for top-k — pandas ``value_counts``
    would drop it silently and the exact-pass semi-join can't match it;
    count nulls with one ``filter(isNull).count()`` if needed)."""
    import pandas as pd

    capacity = capacity or 8 * k
    if capacity < k:
        raise ValueError(f"capacity {capacity} < k {k}")
    df = df.filter(F.col(col).isNotNull())

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
                # fold down to capacity with the MG decrement whenever the
                # working set overflows (value_counts pre-aggregates the
                # batch, so decrements happen on compact data)
            while len(counters) > capacity:
                dead = [key for key, n in counters.items() if n <= 1]
                if not dead:
                    m = min(counters.values())
                    counters = {key: n - m for key, n in counters.items() if n > m}
                else:
                    counters = {key: n - 1 for key, n in counters.items() if n > 1}
        if counters:
            yield pd.DataFrame({col: list(counters), "_mg": list(counters.values())})

    out_schema = df.select(col).withColumn("_mg", F.lit(0).cast("long")).schema
    candidates = (
        df.select(col)
        .mapInPandas(summarize, out_schema)
        .groupBy(col)
        .agg(F.sum("_mg").alias("_mg_count"))
        .orderBy(F.desc("_mg_count"), F.asc(col))
        .limit(capacity)
    )
    if not exact:
        return candidates.select(
            col, F.col("_mg_count").alias("approx_count")
        ).limit(k)
    exact_counts = (
        df.select(col)
        .join(F.broadcast(candidates.select(col)), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
        .limit(k)
    )
    return exact_counts
