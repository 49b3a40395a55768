"""Financial technical indicators over bar (candle) tables.

The reference pipeline stops at OHLCV resampling (transformers.py:17-142 —
its aggregation ladder ends at candle bars); every charting/screening user
of a financial data pipeline immediately computes indicators ON those bars.
This module adds the standard ladder — SMA/Bollinger bands, log returns,
rolling volatility, running-max drawdown, EMA/MACD/signal, Wilder RSI — as
two operators chosen by their execution shape:

* :func:`window_indicators` — everything expressible as a frame aggregate
  (SMA, bands, returns, volatility, drawdown) in ONE window pass: a single
  shuffle on the series keys, one sort per partition, all arithmetic
  JVM-side in whole-stage codegen.  At 100 TB of ticks the bar table this
  runs on is already reduced by the OHLCV aggregate (rows = symbols x
  periods), so the window partitions are small and skew-free.

* :func:`recursive_indicators` — EMA-family recurrences
  (``y_t = a*x_t + (1-a)*y_{t-1}``) have no bounded-frame form; they are
  inherently a per-key prefix scan.  Implemented as one Arrow-batched
  ``applyInPandas`` per series key: one shuffle on the keys, then a linear
  numpy scan per series.  Per-task memory is one key's bar history
  (periods-per-symbol — thousands of rows, not the tick table), which is
  exactly the state any engine needs to compute an EMA.

Variance uses the explicit ``(sum(x^2) - n*mean^2)/(n-1)`` form (not the
builtin ``stddev_samp``) so the DuckDB oracle can reproduce the arithmetic
operation-for-operation; the recurrences in the pandas kernel are written
as the same fused multiply-adds the oracle's recursive CTE evaluates, so
both engines walk bitwise-identical float64 sequences.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .aggregate import ohlcv

ANNUALIZE_DAILY = math.sqrt(252.0)  # trading days per year


def daily_close_bars(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    group_cols: list[str] | None = None,
    day_col: str = "day",
) -> DataFrame:
    """Per-key daily close bars from a tick-like table — the OHLCV 'D'
    aggregate (aggregate.py:ohlcv) projected to (keys, day, close).  One
    map-side-combined hash aggregate; output rows = keys x days."""
    group_cols = group_cols if group_cols is not None else ["event_type"]
    bars = ohlcv(df, "D", time_col, value_col, group_cols, bucket_col="_period")
    return bars.select(
        *group_cols, F.col("_period").cast("date").alias(day_col), F.col("close")
    )


def window_indicators(
    bars: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    close_col: str = "close",
    band_window: int = 20,
    band_k: float = 2.0,
    vol_window: int = 10,
    annualize: float = ANNUALIZE_DAILY,
) -> DataFrame:
    """Frame-aggregate indicator pass: trailing SMA + Bollinger bands
    (``band_window`` bars, ``band_k`` sample standard deviations), log
    return, trailing annualized log-return volatility and Sharpe ratio
    (``vol_window``, rf=0), running max and drawdown from it.

    Plan shape: one Exchange on ``key_cols``, one sort per partition, two
    chained Window operators over the SAME (partition, order) spec — the
    second (volatility over the derived log-return column) reuses the sort,
    so no second shuffle.  Rows with an under-filled frame (fewer than two
    samples) yield NULL bands/volatility rather than a degenerate 0.
    """
    w = Window.partitionBy(*key_cols).orderBy(day_col)
    frame = w.rowsBetween(-(band_window - 1), 0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)

    c = F.col(close_col)
    cnt = F.count(c).over(frame)
    s1 = F.sum(c).over(frame)
    s2 = F.sum(c * c).over(frame)
    sma = s1 / cnt
    # sample variance, explicit form; clamp the catastrophic-cancellation
    # negative at 0 so sqrt never NaNs (both engines do the same clamp)
    var = F.greatest((s2 - cnt * sma * sma) / (cnt - 1), F.lit(0.0))
    sd = F.when(cnt > 1, F.sqrt(var))

    prev = F.lag(c).over(w)
    log_ret = F.log(c / prev)

    stage1 = bars.select(
        *key_cols,
        F.col(day_col),
        c.alias(close_col),
        sma.alias("sma"),
        (sma + F.lit(band_k) * sd).alias("boll_up"),
        (sma - F.lit(band_k) * sd).alias("boll_dn"),
        log_ret.alias("log_return"),
        F.max(c).over(run).alias("run_max"),
        (c / F.max(c).over(run) - F.lit(1.0)).alias("drawdown"),
    )

    vframe = w.rowsBetween(-(vol_window - 1), 0)
    r = F.col("log_return")
    vcnt = F.count(r).over(vframe)
    v1 = F.sum(r).over(vframe)
    v2 = F.sum(r * r).over(vframe)
    vmean = v1 / vcnt
    vvar = F.greatest((v2 - vcnt * vmean * vmean) / (vcnt - 1), F.lit(0.0))
    vsd = F.sqrt(vvar)
    vol = F.when(vcnt > 1, vsd * F.lit(annualize))
    # rolling Sharpe (rf=0): annualized mean / annualized sd = mean/sd * sqrt(252)
    sharpe = F.when((vcnt > 1) & (vvar > 0), vmean / vsd * F.lit(annualize))
    return stage1.withColumn("volatility", vol).withColumn("sharpe", sharpe)


def returns_correlation(
    bars: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    close_col: str = "close",
) -> DataFrame:
    """Pairwise Pearson correlation matrix of per-key daily log returns —
    the cross-asset diversification view every portfolio screen wants.

    Output: (key_a, key_b, n_days, correlation) for key_a < key_b.

    Plan shape: one window pass for the log returns (shuffle on the key),
    then a day-keyed self-equi-join and ONE partial-aggregated
    ``corr``/``count`` per pair — joined rows number |days| x |pairs on
    that day|, which is the size of the answer's support, not the tick
    table.  The join aligns returns on shared days only, so series with
    different calendars correlate over their intersection (and ``n_days``
    reports it).  For symbol universes where |pairs| itself explodes
    (10^4 symbols = 5x10^7 pairs), filter the key set first — a full
    correlation MATRIX at that scale is the quadratic object, not this
    plan."""
    w = Window.partitionBy(key_col).orderBy(day_col)
    rets = bars.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).alias("_d"),
        F.log(F.col(close_col) / F.lag(close_col).over(w)).alias("_r"),
    ).filter(F.col("_r").isNotNull())
    a = rets.select(
        F.col("_k").alias("key_a"), F.col("_d").alias("_d"), F.col("_r").alias("_ra")
    )
    b = rets.select(
        F.col("_k").alias("key_b"), F.col("_d").alias("_db"), F.col("_r").alias("_rb")
    )
    joined = a.join(b, (a["_d"] == b["_db"]) & (a["key_a"] < b["key_b"]))
    return joined.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.corr("_ra", "_rb").alias("correlation"),
    )


def beta_to_benchmark(
    bars: DataFrame,
    benchmark_key: str,
    key_col: str = "event_type",
    day_col: str = "day",
    close_col: str = "close",
) -> DataFrame:
    """CAPM beta (and correlation) of every series' daily log returns
    against one benchmark series: ``beta = cov(r_i, r_m) / var(r_m)`` over
    the days both traded.

    Output: (``key_col``, n_days, beta, correlation).

    Unlike the full pairwise matrix (:func:`returns_correlation`), this is
    LINEAR in the symbol universe: the benchmark's return series (|days|
    rows) broadcasts, every other series equi-joins it map-side on the
    day, and one partial-aggregated covar/var per key finishes it — no
    symbol-side self-join, no quadratic pair blowup.  Note var(r_m) is
    computed per key over the SHARED days, which is the statistically
    consistent choice when calendars differ (beta over the days both
    series actually traded)."""
    w = Window.partitionBy(key_col).orderBy(day_col)
    rets = bars.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).alias("_d"),
        F.log(F.col(close_col) / F.lag(close_col).over(w)).alias("_r"),
    ).filter(F.col("_r").isNotNull())
    bench = F.broadcast(
        rets.filter(F.col("_k") == benchmark_key).select(
            F.col("_d").alias("_db"), F.col("_r").alias("_rm")
        )
    )
    joined = rets.filter(F.col("_k") != benchmark_key).join(
        bench, F.col("_d") == F.col("_db")
    )
    return joined.groupBy(F.col("_k").alias(key_col)).agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.covar_samp("_r", "_rm") / F.var_samp("_rm")).alias("beta"),
        F.corr("_r", "_rm").alias("correlation"),
    )


def calendar_gaps(
    bars: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
) -> DataFrame:
    """Missing-day report per series: every hole in a key's daily calendar
    as (``key_col``, gap_start, gap_end, n_missing) — the time-series
    data-quality check that catches silently dropped partitions or feed
    outages before an indicator quietly computes across the hole.

    One window pass (shuffle on the key, sort by day) and a filter —
    output rows = number of gaps, not days."""
    w = Window.partitionBy(key_col).orderBy(day_col)
    prev = F.lag(day_col).over(w)
    missing = F.datediff(F.col(day_col), prev) - 1
    return (
        bars.select(
            F.col(key_col),
            prev.alias("_prev"),
            F.col(day_col).alias("_day"),
            missing.alias("n_missing"),
        )
        .filter(F.col("n_missing") > 0)
        .select(
            key_col,
            F.date_add("_prev", 1).alias("gap_start"),
            F.date_sub("_day", 1).alias("gap_end"),
            "n_missing",
        )
    )


def _ema_alpha(span: int) -> float:
    return 2.0 / (span + 1.0)


def seed_state(x0: float) -> tuple:
    """Recurrence state at the first bar: (ema_fast, ema_slow, signal,
    avg_gain, avg_loss) — EMAs seed at the close (so MACD_0 == 0 exactly),
    signal at 0, Wilder averages undefined until the first delta."""
    return (x0, x0, 0.0, None, None)


def advance_state(
    state: tuple,
    prev_close: float,
    x: float,
    a_fast: float,
    a_slow: float,
    a_sig: float,
    rsi_n: int,
) -> tuple[tuple, float | None]:
    """One recurrence step shared by the batch scan and the streaming
    stateful op — the SINGLE source of the update arithmetic (textually
    the oracle CTE's recursive arm), so batch, stream, and oracle walk
    bitwise-identical float64 sequences.  Returns (new_state, rsi)."""
    ef, es, sig, ag, al = state
    ef = a_fast * x + (1.0 - a_fast) * ef
    es = a_slow * x + (1.0 - a_slow) * es
    macd = ef - es
    sig = a_sig * macd + (1.0 - a_sig) * sig
    g = max(x - prev_close, 0.0)
    loss = max(prev_close - x, 0.0)
    if ag is None:
        ag, al = g, loss
    else:
        ag = (ag * (rsi_n - 1) + g) / rsi_n
        al = (al * (rsi_n - 1) + loss) / rsi_n
    rsi = 100.0 * ag / (ag + al) if ag + al > 0.0 else None
    return (ef, es, sig, ag, al), rsi


def _recursive_kernel(
    pdf: pd.DataFrame,
    day_col: str,
    close_col: str,
    a_fast: float,
    a_slow: float,
    a_sig: float,
    rsi_n: int,
) -> pd.DataFrame:
    """Linear scan of one series via :func:`advance_state` (the single
    source of the update arithmetic, textually identical to the oracle
    CTE's recursive arm) so float64 results match bitwise, not just to
    rounding."""
    pdf = pdf.sort_values(day_col, ignore_index=True)
    x = pdf[close_col].to_numpy(dtype=np.float64)
    n = len(x)
    ef = np.empty(n)
    es = np.empty(n)
    sig = np.empty(n)
    rsi = np.full(n, np.nan)
    if n:
        state = seed_state(x[0])
        ef[0], es[0], sig[0] = state[0], state[1], state[2]
        for i in range(1, n):
            state, rsi_i = advance_state(
                state, x[i - 1], x[i], a_fast, a_slow, a_sig, rsi_n
            )
            ef[i], es[i], sig[i] = state[0], state[1], state[2]
            if rsi_i is not None:
                rsi[i] = rsi_i
    out = pdf.copy()
    out["ema_fast"] = ef
    out["ema_slow"] = es
    out["macd"] = ef - es
    out["macd_signal"] = sig
    out["rsi"] = rsi
    return out


def recursive_indicators(
    bars: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    close_col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    rsi_n: int = 14,
) -> DataFrame:
    """EMA-family recurrences per series: EMA(fast), EMA(slow), MACD =
    EMA(fast) - EMA(slow), signal = EMA(signal) of MACD, and Wilder RSI
    (first-delta-seeded smoothing: ``avg_1 = gain_1`` then
    ``avg_t = (avg*(n-1) + gain)/n``; ``rsi = 100*ag/(ag+al)``, NULL when
    the series hasn't moved).  Seeds: ``ema_0 = close_0`` so
    ``macd_0 = 0`` exactly, signal seeded at 0.

    One shuffle on ``key_cols``, then one Arrow batch + numpy scan per
    series — the only state is that key's bar history, already reduced to
    (symbols x periods) rows by the upstream OHLCV aggregate.
    """
    a_fast, a_slow, a_sig = _ema_alpha(fast), _ema_alpha(slow), _ema_alpha(signal)
    schema = StructType(
        list(bars.schema.fields)
        + [
            StructField("ema_fast", DoubleType()),
            StructField("ema_slow", DoubleType()),
            StructField("macd", DoubleType()),
            StructField("macd_signal", DoubleType()),
            StructField("rsi", DoubleType()),
        ]
    )

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _recursive_kernel(pdf, day_col, close_col, a_fast, a_slow, a_sig, rsi_n)

    return bars.groupBy(*key_cols).applyInPandas(apply_fn, schema=schema)


def backtest_sma_crossover(
    bars: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    close_col: str = "close",
    fast: int = 5,
    slow: int = 20,
    annualize: float = ANNUALIZE_DAILY,
) -> DataFrame:
    """Vectorized SMA-crossover backtest per series: long 1 unit while
    the ``fast``-bar SMA is above the ``slow``-bar SMA, flat otherwise,
    entering on the NEXT bar after the signal (no look-ahead: position_t
    = signal_{t-1}).

    Output per (key, day): close, position (0/1), log_return,
    strategy_return (= position * log_return), cum_return (strategy
    equity curve as a log-return sum), and buy-and-hold cum_bh for
    comparison.

    Everything is the same one-shuffle window pass as
    :func:`window_indicators` — a backtest over 10^4 symbols x 10^4 bars
    is one Exchange and a per-partition sort, no Python, no loop over
    days.  This is deliberately the SIMPLE vectorizable strategy shape
    (stateless signal -> shifted position -> returns product); pathwise
    strategies with order state belong in the streaming stateful op
    family, not a window."""
    w = Window.partitionBy(*key_cols).orderBy(day_col)
    c = F.col(close_col)
    sma_f = F.avg(c).over(w.rowsBetween(-(fast - 1), 0))
    sma_s = F.avg(c).over(w.rowsBetween(-(slow - 1), 0))
    signal = F.when(sma_f > sma_s, F.lit(1)).otherwise(F.lit(0))
    log_ret = F.log(c / F.lag(c).over(w))

    staged = bars.select(
        *key_cols,
        F.col(day_col),
        c.alias(close_col),
        F.coalesce(F.lag(signal).over(w), F.lit(0)).alias("position"),
        log_ret.alias("log_return"),
    )
    strat = F.col("position") * F.coalesce(F.col("log_return"), F.lit(0.0))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return staged.select(
        *key_cols,
        day_col,
        close_col,
        "position",
        "log_return",
        strat.alias("strategy_return"),
        F.sum(strat).over(run).alias("cum_return"),
        F.sum(F.coalesce(F.col("log_return"), F.lit(0.0))).over(run).alias("cum_bh"),
    )


def detect_price_anomalies(
    bars: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    close_col: str = "close",
    z_window: int = 20,
    z_threshold: float = 4.0,
    stale_min_run: int = 3,
) -> DataFrame:
    """Per-series price data-quality screen — the two classic feed
    failure modes:

    * ``is_spike``: |z| of today's log return against the TRAILING
      ``z_window`` returns EXCLUDING today (the spike must not inflate
      its own baseline) exceeds ``z_threshold``;
    * ``is_stale``: the close has repeated identically for at least
      ``stale_min_run`` bars (dead feed repeating the last print).

    Output: every bar with (log_return, z_score, stale_run, is_spike,
    is_stale).  One shuffle on the keys; the stale-run computation is the
    gaps-and-islands sum-of-change-markers trick — no self-join, no
    Python, all in the same sorted window pass."""
    w = Window.partitionBy(*key_cols).orderBy(day_col)
    c = F.col(close_col)
    log_ret = F.log(c / F.lag(c).over(w))
    staged = bars.select(
        *key_cols, F.col(day_col), c.alias(close_col),
        log_ret.alias("log_return"),
        # gaps-and-islands: run id = count of change-points so far
        F.sum(
            F.when(F.lag(c).over(w).isNull() | (c != F.lag(c).over(w)), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_grp"),
    )
    w2 = Window.partitionBy(*key_cols).orderBy(day_col)
    base = w2.rowsBetween(-z_window, -1)
    r = F.col("log_return")
    n = F.count(r).over(base)
    s1 = F.sum(r).over(base)
    s2 = F.sum(r * r).over(base)
    mean = s1 / n
    sd = F.when(
        n > 1, F.sqrt(F.greatest((s2 - n * mean * mean) / (n - 1), F.lit(0.0)))
    )
    z = F.when(sd > 0, (r - mean) / sd)
    run = Window.partitionBy(*key_cols, "_grp").orderBy(day_col)
    return staged.select(
        *key_cols,
        day_col,
        close_col,
        "log_return",
        z.alias("z_score"),
        F.row_number().over(run).alias("stale_run"),
        (F.abs(z) >= F.lit(z_threshold)).alias("is_spike"),
        (F.row_number().over(run) >= F.lit(stale_min_run)).alias("is_stale"),
    )


def vwap_bars(
    df: DataFrame,
    time_period: str = "D",
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    group_cols: list[str] | None = None,
    bucket_col: str = "period",
) -> DataFrame:
    """Volume-weighted bars per (keys, calendar period): VWAP
    (``sum(price*size)/sum(size)``), TWAP as the unweighted mean print,
    total volume, trade count, and the high/low range — the execution-
    quality benchmark every trading desk computes from the tick table.

    The reference's aggregation ladder stops at OHLCV candles
    (transformers.py:17-142, one agg per column); VWAP needs a RATIO of
    two sums, which its named-agg map cannot express — this operator is
    the natural extension of the same groupBy shape.

    One map-side-combined hash aggregate over the tick table — identical
    execution shape (and cost) to :func:`~..operators.aggregate.ohlcv`:
    at 100 TB of ticks the only shuffle carries the partially-aggregated
    (keys x periods) grain, not ticks.  ``sum(size) = 0`` (or all-null
    sizes) yields a NULL vwap rather than a division error."""
    from .aggregate import FREQ_TO_TRUNC

    unit = FREQ_TO_TRUNC.get(time_period.upper())
    if unit is None:
        raise ValueError(f"unsupported time_period {time_period!r}")
    keys = [F.col(c) for c in (group_cols or [])] + [
        F.date_trunc(unit, F.col(time_col)).alias(bucket_col)
    ]
    p, s = F.col(price_col), F.col(size_col).cast("double")
    notional = F.sum(p * s)
    volume = F.sum(s)
    return df.groupBy(*keys).agg(
        F.when(volume > 0, notional / volume).alias("vwap"),
        F.avg(p).alias("twap"),
        volume.alias("volume"),
        F.count(p).alias("n_trades"),
        F.max(p).alias("high"),
        F.min(p).alias("low"),
    )


def anchored_vwap(
    df: DataFrame,
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    group_cols: list[str] | None = None,
    anchor: str = "D",
    out_col: str = "vwap",
) -> DataFrame:
    """Running (anchored) VWAP: for every tick, the volume-weighted mean
    price from the anchor-period open up to AND INCLUDING that tick —
    the intraday benchmark line charted against live prints.

    One window pass partitioned by (keys, anchor bucket) ordered by time:
    two running sums and a divide, all JVM-side codegen.  The partition
    grain is one key's single anchor period (a symbol-day of ticks), so
    partitions stay small and skew-free no matter how large the total
    tick table grows.  Ties on ``time_col`` are closed in ``rows``
    (arrival) order within the deterministic (time, price, size) sort."""
    from .aggregate import FREQ_TO_TRUNC

    unit = FREQ_TO_TRUNC.get(anchor.upper())
    if unit is None:
        raise ValueError(f"unsupported anchor {anchor!r}")
    keys = [F.col(c) for c in (group_cols or [])]
    bucket = F.date_trunc(unit, F.col(time_col))
    w = (
        Window.partitionBy(*keys, bucket.alias("_anchor"))
        .orderBy(F.col(time_col), F.col(price_col), F.col(size_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = F.col(size_col).cast("double")
    run_notional = F.sum(F.col(price_col) * s).over(w)
    run_volume = F.sum(s).over(w)
    return df.withColumn(
        out_col, F.when(run_volume > 0, run_notional / run_volume)
    )


def portfolio_returns(
    bars: DataFrame,
    weights: dict[str, float],
    key_col: str = "sym",
    day_col: str = "day",
    close_col: str = "close",
) -> DataFrame:
    """Daily portfolio return series from per-symbol close bars and a
    static weight map: simple per-symbol returns (close/lag − 1) weighted
    by ``weights`` and summed per day, plus the compounded equity curve
    (``cum_growth`` = running product of (1 + r_p)).

    Missing symbols in ``weights`` are excluded (weight 0); a day where a
    held symbol has no prior close contributes nothing for that symbol
    (its first bar has no return), mirroring how a backtest treats the
    inception bar.  Weights may lever or short; a day losing >= 100%
    zeroes ``cum_growth`` permanently (sticky wipe-out) rather than
    silently skipping the unrepresentable log term.  Weights are injected as a literal CASE map — no join,
    no broadcast table; the plan is one shuffle on the series keys for
    the lag, one day-grain aggregate, and a final single-partition
    running product over the (days)-sized result, which is the
    output-sized table, not the bar table."""
    if not weights:
        raise ValueError("weights must be non-empty")
    w = F.lit(0.0)
    for k, v in weights.items():
        w = F.when(F.col(key_col) == F.lit(k), F.lit(float(v))).otherwise(w)
    per_key = Window.partitionBy(key_col).orderBy(day_col)
    c = F.col(close_col)
    r = c / F.lag(c).over(per_key) - 1
    contrib = (
        bars.filter(F.col(key_col).isin(list(weights)))
        .select(F.col(day_col), (w * r).alias("_wr"))
    )
    daily = contrib.groupBy(day_col).agg(
        F.sum("_wr").alias("portfolio_return")
    )
    run = Window.orderBy(day_col).rowsBetween(Window.unboundedPreceding, 0)
    growth = 1 + F.coalesce(F.col("portfolio_return"), F.lit(0.0))
    # weights may lever or short (no validation by design), so a day can
    # lose >= 100%: growth <= 0 has no log, and letting F.sum skip the
    # null would silently report a healthy curve for a bankrupt
    # portfolio.  Sticky wipe-out instead: once min(growth) over the
    # running window hits <= 0, cum_growth is 0 from that day on.
    wiped = F.min(growth).over(run) <= 0
    return daily.select(
        day_col,
        "portfolio_return",
        F.when(wiped, F.lit(0.0))
        .otherwise(F.exp(F.sum(F.log(growth)).over(run)))
        .alias("cum_growth"),
    )


def adjust_prices(
    prices: DataFrame,
    actions: DataFrame,
    key_col: str = "sym",
    time_col: str = "ts",
    price_cols: list[str] | None = None,
    action_time_col: str = "effective_date",
    factor_col: str = "factor",
    suffix: str = "_adj",
) -> DataFrame:
    """Back-adjust price series for corporate actions (splits/dividends):
    every price strictly BEFORE an action's effective date is multiplied
    by that action's factor, so the adjusted series is continuous through
    the event and the LATEST prices are unchanged — the standard
    convention charting and backtesting libraries apply.

    A 4:1 split has factor 0.25; a cash dividend's factor is
    (close − div) / close on the ex-date.  Factors COMPOUND: a price
    before two actions is scaled by both.

    Execution: the actions table is tiny at any scale (thousands of rows
    for a whole market) and is BROADCAST; the factor product is computed
    once per DISTINCT (key, time) — not per row, and never by grouping on
    every column, which would silently merge genuinely duplicate ticks —
    then joined back, so duplicate prints each carry their factor.  Cost:
    one distinct + one map-side-combined product over
    |distinct (key, ts)| × avg-actions-per-symbol rows, one (key, ts)
    shuffle join back.  Rows of symbols with no actions (or none later)
    get factor 1 exactly."""
    price_cols = price_cols or ["close"]
    acts = F.broadcast(
        actions.select(
            F.col(key_col).alias("_a_key"),
            F.col(action_time_col).alias("_a_ts"),
            F.col(factor_col).cast("double").alias("_a_factor"),
        )
    )
    factors = (
        prices.select(key_col, time_col)
        .distinct()
        .join(
            acts,
            (F.col(key_col) == F.col("_a_key"))
            & (F.col(time_col) < F.col("_a_ts")),
            "left",
        )
        .groupBy(key_col, time_col)
        .agg(F.coalesce(F.product("_a_factor"), F.lit(1.0)).alias("_cum_factor"))
    )
    # LEFT join + coalesce: a null key/timestamp row can't equi-match its
    # own factor group (nulls never equal), but it must pass through with
    # factor 1, not vanish — the operator preserves row count always
    adj = prices.join(factors, [key_col, time_col], "left").withColumn(
        "_cum_factor", F.coalesce(F.col("_cum_factor"), F.lit(1.0))
    )
    out_cols = [F.col(c) for c in prices.columns]
    out_cols += [
        F.round(F.col(c) * F.col("_cum_factor"), 6).alias(f"{c}{suffix}")
        for c in price_cols
    ]
    return adj.select(*out_cols, F.round("_cum_factor", 9).alias("adj_factor"))


def convert_currency(
    df: DataFrame,
    rates: DataFrame,
    value_cols: list[str],
    currency_col: str = "currency",
    time_col: str = "ts",
    rate_currency_col: str = "from_currency",
    rate_time_col: str = "timestamp",
    rate_col: str = "rate",
    suffix: str = "_conv",
    to_currency: str | None = None,
    rate_to_currency_col: str = "to_currency",
) -> DataFrame:
    """Convert monetary columns with the most recent FX rate AT OR BEFORE
    each row's own timestamp (as-of semantics — the only correct join for
    rates: an equi-join on date misses weekends/holidays, and joining the
    LATEST rate repricess history with today's rate).

    The reference ingests forex rate series as first-class data
    (alphavantage.py:131-154) but never applies them; this operator
    closes that loop over the engine's as-of machinery
    (operators/asof.py:asof_join — one shuffle on the currency key, union
    + forward-fill, no range explosion).  Rows whose currency has no rate
    at or before their time get NULL conversions (asof_rate is null) —
    surfaced, never silently dropped.

    A multi-pair rate table (the reference's ForexRate schema carries
    BOTH ``from_currency`` and ``to_currency``, schema.py:24-29) MUST be
    narrowed to one target: pass ``to_currency`` and the table is
    filtered on ``rate_to_currency_col`` first — without it, a table
    quoting EUR/USD and EUR/JPY would as-of-match whichever pair printed
    last and misprice silently, so ambiguity raises instead."""
    from .asof import asof_join

    if to_currency is not None:
        if rate_to_currency_col not in rates.columns:
            raise ValueError(
                f"to_currency given but rates has no {rate_to_currency_col!r} column"
            )
        rates = rates.filter(F.col(rate_to_currency_col) == to_currency)
    elif rate_to_currency_col in rates.columns:
        n_targets = rates.select(rate_to_currency_col).distinct().count()
        if n_targets > 1:
            raise ValueError(
                f"rates table quotes {n_targets} target currencies; pass "
                "to_currency to pick one (as-of matching across pairs "
                "would misprice silently)"
            )
    r = rates.select(
        F.col(rate_currency_col).alias(currency_col),
        F.col(rate_time_col).alias(time_col),
        F.col(rate_col).cast("double").alias("_fx_rate"),
    )
    joined = asof_join(
        df, r, [currency_col], time_col, ["_fx_rate"], right_ts_out="rate_ts"
    )
    out_cols = [F.col(c) for c in df.columns]
    out_cols += [
        F.round(F.col(c) * F.col("_fx_rate_asof"), 6).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    return joined.select(
        *out_cols, F.col("_fx_rate_asof").alias("asof_rate"), "rate_ts"
    )


def tick_rule_signs(
    ticks: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    price_col: str = "price",
    out_col: str = "trade_sign",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Classify each trade as buyer- (+1) or seller-initiated (−1) by the
    tick rule (the quote-free half of Lee-Ready): up-tick ⇒ +1, down-tick
    ⇒ −1, zero-tick carries the PREVIOUS sign forward; a series' first
    trade (no prior print) gets sign 0.

    One window pass on the series keys: the carry-forward is
    ``last(sign, ignorenulls)`` over the unbounded-preceding frame — the
    same forward-fill shape as gap_fill, no Python, no second shuffle.

    Tied timestamps (constant in real tick data at second granularity)
    order by price as a secondary key, which makes the SIGN sequence
    layout-independent: equal-(ts, price) rows are interchangeable for
    the rule (one takes the earlier print's tick, the rest are zero-ticks
    carrying the same sign).  Pass ``tiebreak_col`` (a unique trade id)
    when rows must additionally keep a stable per-row identity — the
    same contract as ``asof_join(right_tiebreak_col=)``."""
    order = [F.col(time_col), F.col(price_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    p, prev = F.col(price_col), F.lag(F.col(price_col)).over(w)
    raw = F.when(p > prev, F.lit(1)).when(p < prev, F.lit(-1))  # null on zero/first
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return ticks.withColumn(
        out_col,
        F.coalesce(F.last(raw, ignorenulls=True).over(run), F.lit(0)).cast("int"),
    )


def tick_rule_signs_sliced(
    ticks: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    price_col: str = "price",
    out_col: str = "trade_sign",
    tiebreak_col: str | None = None,
    slice_unit: str = "day",
    prev_col: str | None = None,
) -> DataFrame:
    """:func:`tick_rule_signs` with a BOUNDED per-task sort — the same
    two-phase slicing story as :func:`activity_bars_sliced`, applied to
    the sign carry-forward (a last-non-null prefix fold instead of a
    sum).  Row-identical to the monolithic window
    (test_finance.py::test_tick_rule_sliced_equals_monolithic, including
    zero-tick runs and all-zero-tick slices crossing slice boundaries).

    Decomposition: a tick's sign is the last non-null raw tick (+1/-1)
    at or before it.  Within a slice that is one bounded window pass;
    across slices it is the cascade of each earlier slice's LAST
    non-null raw sign — a per-(keys, slice) aggregate (tiny, map-side
    combined) cascaded by a second last-non-null window over the slice
    summary table, joined back on (keys, slice) where the tick side
    already hashes.  The only cross-slice price dependency is the FIRST
    tick of each slice (its raw sign compares against the previous
    slice's closing print), carried on the same summary table.

    ``prev_col`` additionally emits the previous-print price each row's
    raw sign compared against — :func:`kyle_lambda`'s ``sliced=True``
    mode consumes it for the price-change series so the whole impact
    regression runs task-bounded.  ``time_col`` must be non-null.

    When to engage it (measured, tools/skew_bench.py): this twin is the
    MEMORY-CEILING escape hatch, not a latency optimization — on the
    90%-hot-key table at 2.4M local ticks it is ~1.6x SLOWER than the
    monolithic window (it pays a second tick-table pass for the slice
    summaries plus two co-partitioned joins, while a 2M-row single-task
    sort is still cheap in-memory).  Engage it when the hottest key's
    history stops fitting a task — past the spill cliff the monolithic
    form degrades unboundedly while this one's tasks stay symbol-day
    sized.  Contrast ``activity_bars_sliced`` (one extra aggregate, no
    prev-price machinery), which is already faster at this size."""
    order = [F.col(time_col), F.col(price_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    staged = ticks.withColumn("_slice", F.date_trunc(slice_unit, F.col(time_col)))
    w_in = Window.partitionBy(*key_cols, "_slice").orderBy(*order)
    p = F.col(price_col)
    order_key = F.struct(*order)
    # per-slice boundary summary: the slice's closing PRINT (last row's
    # price, null included — struct-wrap so max_by can't skip null
    # prices) — the raw-sign fold below adds the slice's last non-null
    # raw sign once boundary-corrected raws exist
    bounds = staged.groupBy(*key_cols, "_slice").agg(
        F.max_by(F.struct(p.alias("p")), order_key)["p"].alias("_close_px")
    )
    w_sl = Window.partitionBy(*key_cols).orderBy("_slice")
    bounds = bounds.withColumn("_prev_close", F.lag("_close_px").over(w_sl)).select(
        *key_cols, "_slice", "_prev_close"
    )
    with_prev = (
        staged.withColumn("_rn", F.row_number().over(w_in))
        .withColumn("_lag_in", F.lag(p).over(w_in))
        .join(bounds, [*key_cols, "_slice"])
        .withColumn(
            "_prev_px",
            F.when(F.col("_rn") == 1, F.col("_prev_close")).otherwise(F.col("_lag_in")),
        )
    )
    raw = (
        F.when(p > F.col("_prev_px"), F.lit(1))
        .when(p < F.col("_prev_px"), F.lit(-1))
    )
    run_in = w_in.rowsBetween(Window.unboundedPreceding, 0)
    scored = with_prev.withColumn("_raw", raw).withColumn(
        "_run_in", F.last(F.col("_raw"), ignorenulls=True).over(run_in)
    )
    # slice's last non-null raw sign (masked order key skips null raws),
    # cascaded per key over earlier slices
    sl_last = scored.groupBy(*key_cols, "_slice").agg(
        F.max_by(F.col("_raw"), F.when(F.col("_raw").isNotNull(), order_key)).alias(
            "_sl_last"
        )
    )
    carry = sl_last.withColumn(
        "_carry",
        F.last(F.col("_sl_last"), ignorenulls=True).over(
            w_sl.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).select(*key_cols, "_slice", "_carry")
    out = scored.join(carry, [*key_cols, "_slice"]).withColumn(
        out_col,
        F.coalesce(F.col("_run_in"), F.col("_carry"), F.lit(0)).cast("int"),
    )
    keep = list(ticks.columns) + [out_col] + ([prev_col] if prev_col else [])
    if prev_col:
        out = out.withColumn(prev_col, F.col("_prev_px"))
    return out.select(*keep)


def order_flow_imbalance(
    ticks: DataFrame,
    time_period: str = "D",
    key_cols: list[str] | None = None,
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    bucket_col: str = "period",
    sliced: bool = False,
) -> DataFrame:
    """Order-flow imbalance per (keys, calendar period): signed volume
    over total volume, OFI = Σ(sign·size)/Σ(size) ∈ [−1, 1] — the
    standard pressure gauge built on :func:`tick_rule_signs`.

    Execution: the tick-rule window pass (one shuffle on the keys), then
    the same map-side-combined calendar hash aggregate as
    :func:`vwap_bars`; zero total volume yields NULL OFI.
    ``sliced=True`` swaps in :func:`tick_rule_signs_sliced` (identical
    result, task size bounded at the hottest symbol-day) — the hot-key
    escape hatch."""
    from .aggregate import FREQ_TO_TRUNC

    key_cols = key_cols or ["event_type"]
    unit = FREQ_TO_TRUNC.get(time_period.upper())
    if unit is None:
        raise ValueError(f"unsupported time_period {time_period!r}")
    if sliced:
        signed = tick_rule_signs_sliced(ticks, key_cols, time_col, price_col)
    else:
        signed = tick_rule_signs(ticks, key_cols, time_col, price_col)
    s = F.col(size_col).cast("double")
    signed_vol = F.sum(F.col("trade_sign") * s)
    volume = F.sum(s)
    return signed.groupBy(
        *key_cols, F.date_trunc(unit, F.col(time_col)).alias(bucket_col)
    ).agg(
        F.when(volume > 0, signed_vol / volume).alias("ofi"),
        signed_vol.alias("signed_volume"),
        volume.alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


def amihud_illiquidity(
    bars: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    close_col: str = "close",
    volume_col: str = "volume",
    scale: float = 1e6,
) -> DataFrame:
    """Amihud (2002) illiquidity per series: mean over days of
    |daily return| / dollar volume, scaled by ``scale`` — the classic
    price-impact proxy computable from daily bars alone.

    Days with zero/null dollar volume or no prior close are excluded from
    the mean (the published convention).  One window pass for returns +
    one hash aggregate; output rows = series."""
    w = Window.partitionBy(*key_cols).orderBy(day_col)
    c = F.col(close_col)
    ret = c / F.lag(c).over(w) - 1
    dollar_vol = c * F.col(volume_col)
    staged = bars.select(
        *key_cols,
        F.when(dollar_vol > 0, F.abs(ret) / dollar_vol).alias("_impact"),
    )
    return staged.groupBy(*key_cols).agg(
        F.round(F.avg("_impact") * F.lit(scale), 9).alias("amihud"),
        F.count("_impact").alias("n_days"),
    )


def activity_bars(
    ticks: DataFrame,
    threshold: float,
    by: str = "volume",
    key_cols: list[str] | None = None,
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    bar_col: str = "bar_id",
) -> DataFrame:
    """Activity-clock bars (López de Prado, AFML ch. 2): resample ticks by
    cumulative VOLUME (``by='volume'``) or DOLLAR value (``by='dollar'``)
    instead of wall time — bar k holds the ticks whose running activity
    total lies in [k·threshold, (k+1)·threshold).  Time bars undersample
    busy regimes and oversample quiet ones; activity bars equalize
    information per bar, which is why the microstructure literature
    prefers them for downstream ML.

    Output: per (keys, bar_id) OHLC + VWAP + volume + tick count + the
    bar's open/close times.  Execution: ONE running-sum window per key
    (the same one-shuffle prefix shape as ``anchored_vwap``) to assign
    ``bar_id = floor(cum_activity / threshold)``, then the standard
    map-side-combined bar aggregate — no Python, no second shuffle on the
    tick table (the agg reuses the key partitioning).  Null sizes count
    as zero activity; null prices join their bar but contribute no
    OHLC/VWAP term (same null contract as ``vwap_bars``).

    Skew bound: the window sorts each key's ENTIRE history in one task —
    fine while the hottest symbol's ticks fit an executor; past that,
    use :func:`activity_bars_sliced` (two-phase prefix sum, per-task
    work bounded by the hottest symbol-SLICE).  tools/skew_bench.py
    measures the 90%-hot-key shape: 1.44x faster at 2.4M ticks, 1.61x at
    6.4M, the gap widening with the hot task — and on a cluster the
    monolithic single-task sort hits the spill/OOM cliff the sliced form
    structurally cannot.  The stateful streaming twin covers the
    real-time path."""
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    if by not in ("volume", "dollar"):
        raise ValueError(f"by must be volume|dollar, got {by!r}")
    key_cols = key_cols or ["event_type"]
    s = F.coalesce(F.col(size_col).cast("double"), F.lit(0.0))
    activity = s if by == "volume" else s * F.col(price_col)
    activity = F.coalesce(activity, F.lit(0.0))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col), F.col(price_col), F.col(size_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bar of a tick = bars completed BEFORE it (activity sum over strictly
    # preceding ticks), so a bar closes exactly when its threshold fills
    cum_before = F.coalesce(F.sum(activity).over(w), F.lit(0.0))
    tagged = ticks.withColumn(
        bar_col, F.floor(cum_before / F.lit(float(threshold))).cast("long")
    )
    return _bar_aggregate(tagged, key_cols, bar_col, time_col, price_col, size_col)


def _bar_aggregate(
    tagged: DataFrame,
    key_cols: list[str],
    bar_col: str,
    time_col: str,
    price_col: str,
    size_col: str,
) -> DataFrame:
    """The per-(keys, bar) OHLC + VWAP aggregate shared by the monolithic
    and sliced activity-bar paths — map-side-combined, reuses the key
    partitioning of the upstream window, no second shuffle of the ticks."""
    p = F.col(price_col)
    sz = F.col(size_col).cast("double")
    notional = F.sum(p * sz)
    volume = F.sum(sz)
    # open/close = first/last NON-NULL price in the bar's total order
    # (ts, price, size): the struct ordering key (masked to null for
    # null-price rows so min_by/max_by skip them) both excludes bad
    # boundary prints AND breaks timestamp ties deterministically — a
    # bare min_by(p, ts) returns an ARBITRARY member of a tie and the
    # null price of a bad first print
    order_key = F.when(p.isNotNull(), F.struct(F.col(time_col), p, sz))
    return tagged.groupBy(*key_cols, bar_col).agg(
        F.min_by(p, order_key).alias("open"),
        F.max(p).alias("high"),
        F.min(p).alias("low"),
        F.max_by(p, order_key).alias("close"),
        F.when(volume > 0, notional / volume).alias("vwap"),
        volume.alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.min(time_col).alias("open_ts"),
        F.max(time_col).alias("close_ts"),
    )


def activity_bars_sliced(
    ticks: DataFrame,
    threshold: float,
    by: str = "volume",
    key_cols: list[str] | None = None,
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    bar_col: str = "bar_id",
    slice_unit: str = "day",
) -> DataFrame:
    """:func:`activity_bars` with a BOUNDED per-task sort — the hot-symbol
    skew escape hatch for the batch tick-window family.

    The monolithic form sorts each key's ENTIRE tick history inside one
    window partition; at 100 TB a decade of one hot symbol's ticks is a
    single straggler task.  This variant computes the same running
    activity prefix in two phases (the classic distributed prefix sum):

    1. ticks window-sum WITHIN (keys, calendar slice) — task size is
       bounded by the hottest symbol-slice, not the hottest symbol;
    2. per-(keys, slice) activity totals (one map-side-combined
       aggregate, |keys|x|slices| rows) get a per-key running OFFSET via
       a window over that tiny totals table;
    3. offsets join back on (keys, slice) — the tick side already hashes
       on those columns from phase 1, so the join reuses the exchange —
       and ``bar_id = floor((offset + local_prefix) / threshold)`` feeds
       the shared bar aggregate.

    The slice column is ``date_trunc(slice_unit, time_col)`` — a MONOTONE
    function of the window order, which is what makes phase-1-then-offset
    equal to the monolithic prefix.  With integral sizes (exactly
    representable in float64) the regrouped additions are exact, so the
    BAR ASSIGNMENT is row-identical to :func:`activity_bars`
    (test_finance.py::test_activity_bars_sliced_equals_monolithic); with
    fractional activities (dollar bars) a boundary can shift by an ulp.
    The per-bar vwap, an aggregate SUM, matches to ~1 ulp rather than
    bitwise — true of ANY Spark sum under a different partition layout,
    not a slicing artifact.  ``time_col`` must be non-null.  The same
    two-phase shape covers the family's other prefix folds:
    ``anchored_vwap`` is already anchor-partitioned (skew-free by
    construction), and ``tick_rule_signs`` has its own sliced twin
    (:func:`tick_rule_signs_sliced`, a last-non-null fold with a
    boundary-print carry) that ``order_flow_imbalance(sliced=True)`` and
    ``kyle_lambda(sliced=True)`` consume; the real-time overflow path is
    the stateful streaming twin (streaming/indicators.py), which never
    re-sorts history at all."""
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    if by not in ("volume", "dollar"):
        raise ValueError(f"by must be volume|dollar, got {by!r}")
    key_cols = key_cols or ["event_type"]
    s = F.coalesce(F.col(size_col).cast("double"), F.lit(0.0))
    activity = s if by == "volume" else s * F.col(price_col)
    activity = F.coalesce(activity, F.lit(0.0))
    staged = ticks.withColumn(
        "_slice", F.date_trunc(slice_unit, F.col(time_col))
    ).withColumn("_act", activity)
    order = [F.col(time_col), F.col(price_col), F.col(size_col)]
    w_in = (
        Window.partitionBy(*key_cols, "_slice")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = staged.withColumn(
        "_cum_in", F.coalesce(F.sum("_act").over(w_in), F.lit(0.0))
    )
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        staged.groupBy(*key_cols, "_slice")
        .agg(F.sum("_act").alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0.0)))
        .select(*key_cols, "_slice", "_off")
    )
    tagged = (
        local.join(offsets, [*key_cols, "_slice"])
        .withColumn(
            bar_col,
            F.floor(
                (F.col("_off") + F.col("_cum_in")) / F.lit(float(threshold))
            ).cast("long"),
        )
        .drop("_slice", "_act", "_cum_in", "_off")
    )
    return _bar_aggregate(tagged, key_cols, bar_col, time_col, price_col, size_col)


def range_volatility(
    bars: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    window: int = 20,
    annualize: float = ANNUALIZE_DAILY,
) -> DataFrame:
    """Range-based volatility estimators over OHLC bars — Parkinson (1980,
    high/low range) and Garman-Klass (1980, range + open/close), both ~5-7×
    more efficient than close-to-close on the same sample:

    * ``parkinson_var``  = mean over the window of ln(H/L)² / (4·ln 2)
    * ``gk_var``         = mean of 0.5·ln(H/L)² − (2·ln 2 − 1)·ln(C/O)²
    * ``parkinson_vol`` / ``gk_vol`` = sqrt(var) × ``annualize``

    One trailing-frame window pass on the series keys — the same
    single-shuffle shape as :func:`window_indicators`; bars with any
    missing OHLC leg yield null terms that drop out of the mean."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(-(window - 1), 0)
    )
    ln2 = math.log(2.0)
    hl2 = F.pow(F.log(F.col("high") / F.col("low")), 2)
    co2 = F.pow(F.log(F.col("close") / F.col("open")), 2)
    pk_term = hl2 / F.lit(4.0 * ln2)
    gk_term = F.lit(0.5) * hl2 - F.lit(2.0 * ln2 - 1.0) * co2
    out = bars.withColumn("_pk", pk_term).withColumn("_gk", gk_term)
    pk_var = F.avg("_pk").over(w)
    gk_var = F.avg("_gk").over(w)
    return out.select(
        *key_cols,
        F.col(day_col),
        "open", "high", "low", "close",
        pk_var.alias("parkinson_var"),
        F.sqrt(pk_var).alias("_pk_sd"),
        gk_var.alias("gk_var"),
    ).select(
        *key_cols,
        day_col,
        "open", "high", "low", "close",
        "parkinson_var",
        (F.col("_pk_sd") * F.lit(annualize)).alias("parkinson_vol"),
        "gk_var",
        (F.sqrt(F.greatest(F.col("gk_var"), F.lit(0.0))) * F.lit(annualize)).alias("gk_vol"),
    )


def kyle_lambda(
    ticks: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    tiebreak_col: str | None = None,
    sliced: bool = False,
) -> DataFrame:
    """Kyle's lambda per series: the OLS slope of per-tick price changes on
    signed volume (tick-rule signs), λ = cov(Δp, q·v) / var(q·v) — the
    classic price-impact coefficient (price moves λ per unit of net order
    flow).

    One window pass for Δp and the tick-rule sign (shared sort), then one
    map-side-combined ``covar_samp``/``var_samp`` aggregate per series —
    no regression library, no driver math.  Ticks with no previous print
    (Δp undefined) drop out of the moments.  ``sliced=True`` runs BOTH
    the sign rule and the Δp series through
    :func:`tick_rule_signs_sliced` (its ``prev_col`` output is exactly
    the previous print the monolithic lag reads), bounding task size at
    the hottest symbol-day — identical result, test-pinned."""
    if sliced:
        signed = tick_rule_signs_sliced(
            ticks, key_cols, time_col, price_col,
            tiebreak_col=tiebreak_col, prev_col="_prev_px",
        )
        dp = F.col(price_col) - F.col("_prev_px")
    else:
        signed = tick_rule_signs(
            ticks, key_cols, time_col, price_col, tiebreak_col=tiebreak_col
        )
        order = [F.col(time_col), F.col(price_col)] + (
            [F.col(tiebreak_col)] if tiebreak_col else []
        )
        w = Window.partitionBy(*key_cols).orderBy(*order)
        dp = F.col(price_col) - F.lag(price_col).over(w)
    sv = F.col("trade_sign") * F.col(size_col).cast("double")
    # both moments must run over the SAME sample: covar_samp silently
    # skips null-dp rows but var_samp would keep them, biasing the slope
    # — filter the undefined first tick out of BOTH
    staged = signed.select(*key_cols, dp.alias("_dp"), sv.alias("_sv")).filter(
        F.col("_dp").isNotNull()
    )
    return staged.groupBy(*key_cols).agg(
        (F.covar_samp("_dp", "_sv") / F.var_samp("_sv")).alias("kyle_lambda"),
        F.count("_dp").alias("n_ticks"),
    )
