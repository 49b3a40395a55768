"""Streaming technical indicators: the EMA/MACD/RSI recurrence family as
a custom stateful op (``applyInPandasWithState``).

The batch form (``operators.finance.recursive_indicators``) is a per-key
prefix scan over the FULL bar history; a live deployment cannot re-scan
history per update.  This is the incremental twin: per-key state is just
the recurrence seeds — (ema_fast, ema_slow, signal, avg_gain, avg_loss,
prev_close, last_day_us), a handful of scalars per symbol — updated per
micro-batch via the SAME :func:`~..operators.finance.advance_state` step
the batch kernel uses, so a bar processed by either path yields the
bitwise-identical indicator row (parity pinned by
tests/test_finance.py::test_stream_ema_matches_batch).

Ordering contract: the recurrences are order-sensitive, so bars must
arrive per key in non-decreasing ``day`` order across micro-batches;
in-batch rows are sorted, and an out-of-order bar (day <= the last
processed day for its key) is DROPPED and counted nowhere — feed this
operator from the watermark-finalized tumbling-OHLC gold stream
(``streaming.aggregates.tumbling_ohlc``), which emits bars exactly once
in window order.

State is O(live symbols) x 7 scalars — effectively unbounded-safe for
any real symbol universe; for synthetic unbounded key spaces the same
``GroupStateTimeout`` eviction pattern as ``stateful.running_stats``
applies (not wired here: indicator state is deliberately permanent —
evicting a symbol's seeds silently restarts its EMA history).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.finance import _ema_alpha, advance_state, seed_state

STREAM_EMA_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("day", TimestampType(), True),
        StructField("close", DoubleType(), True),
        StructField("ema_fast", DoubleType(), True),
        StructField("ema_slow", DoubleType(), True),
        StructField("macd", DoubleType(), True),
        StructField("macd_signal", DoubleType(), True),
        StructField("rsi", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ef", DoubleType(), True),
        StructField("es", DoubleType(), True),
        StructField("sig", DoubleType(), True),
        StructField("ag", DoubleType(), True),   # None until the 2nd bar
        StructField("al", DoubleType(), True),
        StructField("prev_close", DoubleType(), True),
        # epoch MICROS (same rationale as stateful.py: scalar longs
        # round-trip the state store without tz/unit ambiguity)
        StructField("last_day_us", LongType(), True),
    ]
)


def _make_update(a_fast: float, a_slow: float, a_sig: float, rsi_n: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ef, es, sig, ag, al, prev_close, last_us = state.get
            st = (ef, es, sig, ag, al)
        else:
            st = prev_close = last_us = None
        out: list[tuple] = []
        # Arrow hands one key's micro-batch as SEVERAL chunks in no
        # particular order: concat before the single sort, or in-order
        # bars landing in a later chunk would be mis-dropped as
        # out-of-order.  Memory = one key's rows for this trigger.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "day", ignore_index=True
            )
            for day, close in zip(pdf["day"], pdf["close"]):
                day_us = int(day.value // 1_000)  # pandas ns -> us
                if last_us is not None and day_us <= last_us:
                    continue  # out-of-order bar: dropped (see module doc)
                x = float(close)
                if st is None:
                    st = seed_state(x)
                    rsi = None
                else:
                    st, rsi = advance_state(
                        st, prev_close, x, a_fast, a_slow, a_sig, rsi_n
                    )
                prev_close, last_us = x, day_us
                out.append(
                    (key[0], day, x, st[0], st[1], st[0] - st[1], st[2], rsi)
                )
        if st is not None:
            state.update((st[0], st[1], st[2], st[3], st[4], prev_close, last_us))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in STREAM_EMA_SCHEMA.fields])

    return _update


def stream_ema(
    bars: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    close_col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    rsi_n: int = 14,
) -> DataFrame:
    """Incremental EMA/MACD/RSI over a streaming bar frame — one output
    row per consumed bar (append mode), per-key state = the recurrence
    seeds.  See the module docstring for the ordering contract.  State is
    O(keys) × a handful of scalars; at high key cardinality run the
    session with ``state_store='rocksdb'`` (``session.state_store_conf``)."""
    normalized = bars.selectExpr(
        f"CAST({key_col} AS string) AS key",
        f"CAST({day_col} AS timestamp) AS day",
        f"CAST({close_col} AS double) AS close",
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _make_update(_ema_alpha(fast), _ema_alpha(slow), _ema_alpha(signal), rsi_n),
        outputStructType=STREAM_EMA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STREAM_VWAP_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("ts", TimestampType(), True),
        StructField("price", DoubleType(), True),
        StructField("size", DoubleType(), True),
        StructField("vwap", DoubleType(), True),
    ]
)

_VWAP_STATE_SCHEMA = StructType(
    [
        StructField("anchor_us", LongType(), True),
        StructField("notional", DoubleType(), True),
        StructField("volume", DoubleType(), True),
        StructField("last_ts_us", LongType(), True),
    ]
)


def _make_vwap_update(anchor_us_len: int):
    def _update(key, pdfs, state):
        if state.exists:
            anchor_us, notional, volume, last_us = state.get
        else:
            anchor_us = notional = volume = last_us = None
        out = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "ts", ignore_index=True
            )
            for ts, price, size in zip(pdf["ts"], pdf["price"], pdf["size"]):
                ts_us = int(ts.value // 1_000)
                if last_us is not None and ts_us <= last_us:
                    continue  # out-of-order tick: dropped (indicator contract)
                a = (ts_us // anchor_us_len) * anchor_us_len
                if anchor_us is None or a > anchor_us:
                    anchor_us, notional, volume = a, 0.0, 0.0
                # batch null semantics: a null price skips the notional
                # term (F.sum drops the null product) but its size still
                # accumulates into run_volume; a null size contributes to
                # neither sum.  Matching exactly keeps the twins equal —
                # one NaN folded into the running notional would poison
                # every later tick of the anchor period.
                p = None if price is None or pd.isna(price) else float(price)
                s = None if size is None or pd.isna(size) else float(size)
                if s is not None:
                    volume += s
                    if p is not None:
                        notional += p * s
                vwap = (notional / volume) if volume > 0 else None
                out.append((key[0], ts, p, s, vwap))
                last_us = ts_us
        if anchor_us is not None:
            state.update((anchor_us, notional, volume, last_us))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in STREAM_VWAP_SCHEMA.fields])

    return _update


def stream_anchored_vwap(
    ticks: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    anchor_days: int = 1,
) -> DataFrame:
    """Per-tick running (anchored) VWAP over a live tick stream — the
    incremental twin of ``operators.finance.anchored_vwap``: one output
    row per consumed tick carrying the volume-weighted mean price since
    the anchor-period (UTC day) open.

    State per key is THREE scalars (anchor start, running notional,
    running volume) plus the last-seen tick time — the anchored window
    needs no history buffer because both running sums are incremental;
    a new anchor period resets them.  Same ordering contract as
    ``stream_ema``: ticks must arrive per key in increasing event time;
    in-batch rows are sorted, late ticks (ts <= last processed) are
    dropped.  Batch parity is exact on strictly-increasing tick times
    (pinned by tests/test_streaming_anomalies.py) — the batch window's
    (ts, price, size) tie-break has no streaming counterpart since
    equal-ts ticks are dropped as out-of-order here.  State is O(keys) ×
    four scalars; at high key cardinality run the session with
    ``state_store='rocksdb'`` (``session.state_store_conf``)."""
    us_per_day = 86_400_000_000
    normalized = ticks.selectExpr(
        f"CAST({key_col} AS string) AS key",
        f"CAST({time_col} AS timestamp) AS ts",
        f"CAST({price_col} AS double) AS price",
        f"CAST({size_col} AS double) AS size",
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _make_vwap_update(anchor_days * us_per_day),
        outputStructType=STREAM_VWAP_SCHEMA,
        stateStructType=_VWAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STREAM_BAR_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("bar_id", LongType(), True),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("close", DoubleType(), True),
        StructField("vwap", DoubleType(), True),
        StructField("volume", DoubleType(), True),
        StructField("n_ticks", LongType(), True),
        StructField("open_ts", TimestampType(), True),
        StructField("close_ts", TimestampType(), True),
    ]
)

_BAR_STATE_SCHEMA = StructType(
    [
        StructField("cum_activity", DoubleType(), True),
        StructField("bar_id", LongType(), True),
        StructField("open", DoubleType(), True),
        StructField("high", DoubleType(), True),
        StructField("low", DoubleType(), True),
        StructField("close", DoubleType(), True),
        StructField("notional", DoubleType(), True),
        StructField("n_prod", LongType(), True),   # valid (price,size) products
        StructField("volume", DoubleType(), True),
        StructField("n_ticks", LongType(), True),
        StructField("open_ts_us", LongType(), True),
        StructField("close_ts_us", LongType(), True),
        # last processed tick as the FULL sort tuple, so tied timestamps
        # (constant in real tick data) are processed, not mis-dropped:
        # only a tick at or before the last (ts, price, size) is late
        StructField("last_ts_us", LongType(), True),
        StructField("last_price", DoubleType(), True),
        StructField("last_size", DoubleType(), True),
    ]
)


def _make_bar_update(threshold: float, by_dollar: bool):
    NEG_INF = float("-inf")

    def _us_to_ts(us):
        return pd.Timestamp(us, unit="us")

    def _key(ts_us, price, size):
        # Spark window order (ts, price, size) with nulls FIRST — encode
        # null as -inf so the cross-batch late check agrees with the
        # in-batch sort below
        return (
            ts_us,
            NEG_INF if price is None or pd.isna(price) else float(price),
            NEG_INF if size is None or pd.isna(size) else float(size),
        )

    def _update(key, pdfs, state):
        if state.exists:
            (cum, bar_id, o, h, l, c, notional, n_prod, volume, n,
             open_us, close_us, last_us, last_p, last_s) = state.get
            last_key = None if last_us is None else _key(last_us, last_p, last_s)
        else:
            cum, bar_id, last_key = 0.0, None, None
            o = h = l = c = None
            notional = volume = None
            n_prod = n = open_us = close_us = 0
        out = []

        def flush():
            # vwap None when the bar saw no valid (price, size) product
            # (batch: SUM over all-null products is null) or no volume
            vwap = (
                notional / volume
                if volume and volume > 0 and n_prod > 0
                else None
            )
            out.append((key[0], bar_id, o, h, l, c, vwap,
                        volume, n, _us_to_ts(open_us), _us_to_ts(close_us)))

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "price", "size"], ignore_index=True, na_position="first"
            )
            for ts, price, size in zip(pdf["ts"], pdf["price"], pdf["size"]):
                ts_us = int(ts.value // 1_000)
                k = _key(ts_us, price, size)
                if last_key is not None and k <= last_key:
                    continue  # late/duplicate tick: dropped (see docstring)
                p = None if price is None or pd.isna(price) else float(price)
                sz = 0.0 if size is None or pd.isna(size) else float(size)
                this_bar = int(cum // threshold)
                if bar_id is not None and this_bar > bar_id:
                    flush()  # the previous bar's threshold filled: emit it
                    bar_id = None
                if bar_id is None:
                    bar_id = this_bar
                    o = h = l = c = None
                    notional, n_prod, volume, n = 0.0, 0, 0.0, 0
                    open_us = ts_us
                if p is not None:
                    if o is None:
                        o = p
                    h = p if h is None else max(h, p)
                    l = p if l is None else min(l, p)
                    c = p
                    if size is not None and not pd.isna(size):
                        notional += p * sz
                        n_prod += 1
                volume += sz
                n += 1
                close_us = ts_us
                activity = (p * sz) if by_dollar else sz
                if by_dollar and p is None:
                    activity = 0.0
                cum += activity
                last_key = k
        lp = None if last_key is None or last_key[1] == NEG_INF else last_key[1]
        ls = None if last_key is None or last_key[2] == NEG_INF else last_key[2]
        state.update((cum, bar_id, o, h, l, c, notional, n_prod, volume, n,
                      open_us, close_us,
                      None if last_key is None else last_key[0], lp, ls))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in STREAM_BAR_SCHEMA.fields])

    return _update


def stream_activity_bars(
    ticks: DataFrame,
    threshold: float,
    by: str = "volume",
    key_col: str = "event_type",
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
) -> DataFrame:
    """Real-time activity-clock bars — the streaming twin of
    ``operators.finance.activity_bars``: per-key state holds the running
    activity total plus ONE in-progress bar's accumulators (~10 scalars),
    and a bar is emitted the moment a tick lands beyond its threshold.
    CLOSED bars match the batch operator's output exactly (batch-parity
    test: stream over a drained backlog ≡ batch bars minus each key's
    final, still-open bar); the open bar stays in state until its
    threshold fills — an activity clock has no wall-clock deadline, so
    there is nothing to watermark.

    Ordering contract: late ticks are dropped by comparing the FULL
    (ts, price, size) sort tuple (nulls first, matching the batch window
    order), so tied timestamps — constant in real tick feeds — are
    processed, not mis-dropped; only an exact duplicate print (same
    tuple) is treated as a replay.  Feeds carrying genuinely duplicate
    prints need a unique trade id upstream, the same contract as
    ``tick_rule_signs(tiebreak_col=)``/``asof_join``.  State is O(keys) ×
    ~10 scalars; at high key cardinality run the session with
    ``state_store='rocksdb'`` (``session.state_store_conf``)."""
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    if by not in ("volume", "dollar"):
        raise ValueError(f"by must be volume|dollar, got {by!r}")
    normalized = ticks.selectExpr(
        f"CAST({key_col} AS string) AS key",
        f"CAST({time_col} AS timestamp) AS ts",
        f"CAST({price_col} AS double) AS price",
        f"CAST({size_col} AS double) AS size",
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _make_bar_update(float(threshold), by == "dollar"),
        outputStructType=STREAM_BAR_SCHEMA,
        stateStructType=_BAR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
