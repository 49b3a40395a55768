"""Streaming price data-quality screen: the incremental twin of
``operators.finance.detect_price_anomalies`` (spike + stale-feed flags)
as a custom stateful op (``applyInPandasWithState``).

A live feed monitor cannot re-scan bar history per print; per-key state
here is exactly what the batch window pass holds in its frame — the last
``z_window`` return ROWS (nulls included, mirroring the batch ROWS
BETWEEN frame), the previous close, the current stale-run length, and
the last processed day — so every bar produces the same (log_return,
z_score, stale_run, is_spike, is_stale) row the batch operator derives
(parity pinned by tests/test_streaming_anomalies.py; exact for
runs/flags, 1-ulp for the float columns because the batch path's
``F.log`` is JVM ``Math.log`` while this kernel uses libm — measured
<= 1.2e-16 absolute, far inside any alerting threshold).

The z baseline EXCLUDES the current return (the spike must not inflate
its own baseline) and uses the batch expression's arithmetic verbatim:
n = non-null returns in the trailing frame, sd = sqrt(max((s2 -
n*mean^2)/(n-1), 0)) evaluated in frame (day) order, z defined only when
n > 1 and sd > 0.

Same ordering contract as ``streaming.indicators``: bars must arrive
per key in non-decreasing day order across micro-batches (feed from the
watermark-finalized tumbling-OHLC gold stream); in-batch rows are
sorted, out-of-order bars are dropped.  State is O(live symbols) x
(z_window + 3) scalars — bounded by construction, no timeout eviction
needed (evicting a symbol would silently restart its baseline).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STREAM_ANOMALY_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("day", TimestampType(), True),
        StructField("close", DoubleType(), True),
        StructField("log_return", DoubleType(), True),
        StructField("z_score", DoubleType(), True),
        StructField("stale_run", IntegerType(), True),
        StructField("is_spike", BooleanType(), True),
        StructField("is_stale", BooleanType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        # trailing return ROWS (NaN encodes the batch frame's null rows)
        StructField("rets", ArrayType(DoubleType()), True),
        StructField("prev_close", DoubleType(), True),
        StructField("stale_run", IntegerType(), True),
        StructField("last_day_us", LongType(), True),
    ]
)


def _z_score(rets: list[float], r: float | None) -> float | None:
    """The batch z expression in frame order: count/sum/sum2 over the
    trailing non-null returns, sample sd with the same max(.., 0) clamp."""
    if r is None:
        return None
    vals = [x for x in rets if not math.isnan(x)]
    n = len(vals)
    if n <= 1:
        return None
    s1 = 0.0
    s2 = 0.0
    for x in vals:
        s1 += x
        s2 += x * x
    mean = s1 / n
    var = (s2 - n * mean * mean) / (n - 1)
    sd = math.sqrt(var if var > 0 else 0.0)
    if sd <= 0:
        return None
    return (r - mean) / sd


def _make_update(z_window: int, z_threshold: float, stale_min_run: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            rets_raw, prev_close, run, last_us = state.get
            rets = list(rets_raw)
        else:
            rets, prev_close, run, last_us = [], None, 0, None
        out: list[tuple] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "day", ignore_index=True
            )
            for day, close in zip(pdf["day"], pdf["close"]):
                day_us = int(day.value // 1_000)
                if last_us is not None and day_us <= last_us:
                    continue  # out-of-order bar: dropped (see module doc)
                # batch null semantics: a null close yields null
                # return/z/spike, CONTINUES the current stale run (the
                # gaps-and-islands change marker's `c != lag(c)` is null
                # -> otherwise(0)), and the following bar starts a new
                # run with a null return (lag is null -> marker 1).
                # Folding NaN into prev_close instead would poison every
                # later comparison in the partition.
                x = None if close is None or pd.isna(close) else float(close)
                if x is None:
                    r = z = spike = None
                    run = run + 1 if prev_close is not None else 1
                else:
                    r = None if prev_close is None else math.log(x / prev_close)
                    z = _z_score(rets, r)
                    run = run + 1 if prev_close is not None and x == prev_close else 1
                    spike = None if z is None else abs(z) >= z_threshold
                out.append(
                    (key[0], day, x, r, z, run, spike, run >= stale_min_run)
                )
                rets.append(math.nan if r is None else r)
                if len(rets) > z_window:
                    rets = rets[-z_window:]
                prev_close, last_us = x, day_us
        state.update((rets, prev_close, run, last_us))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in STREAM_ANOMALY_SCHEMA.fields]
            )

    return _update


def stream_anomalies(
    bars: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    close_col: str = "close",
    z_window: int = 20,
    z_threshold: float = 4.0,
    stale_min_run: int = 3,
) -> DataFrame:
    """Incremental spike/stale screen over a streaming bar frame — one
    output row per consumed bar (append mode).  See the module docstring
    for the state and ordering contracts.  State is O(keys) × (z_window
    returns + a few scalars); at high key cardinality run the session
    with ``state_store='rocksdb'`` (``session.state_store_conf``)."""
    normalized = bars.selectExpr(
        f"CAST({key_col} AS string) AS key",
        f"CAST({day_col} AS timestamp) AS day",
        f"CAST({close_col} AS double) AS close",
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _make_update(z_window, z_threshold, stale_min_run),
        outputStructType=STREAM_ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
