"""Streaming windowed aggregates — the gold layer computed continuously.

The reference only gestures at real-time analytics; this module supplies the
idiomatic Spark version: event-time windows + watermark-bounded state.

- tumbling  : ``window(ts, '1 day')`` — the streaming twin of the batch
              calendar aggregation A1 (epoch-aligned, so a '1 day' window
              equals ``date_trunc('day')``);
- sliding   : ``window(ts, '1 hour', '15 minutes')``;
- session   : ``session_window(ts, '30 minutes')`` — gap-based.

Watermarks bound state (late rows beyond the horizon are dropped), which is
what makes a 100 TB/day stream's state finite.  OHLC first/last use
min_by/max_by on the event time — same deterministic semantics as batch.

State store: the watermark bounds state in TIME; (keys × open windows)
still sizes it.  At high key cardinality run the session with
``state_store='rocksdb'`` (``session.get_spark``/``state_store_conf``) so
window state spills to local disk instead of living on the executor heap —
the knob applies to every operator in this module and the stateful family
(`stateful.py`, `heavy_hitters.py`, `indicators.py`, `anomalies.py`,
watermark dedup in `ingest.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ohlc_aggs(value_col: str, time_col: str) -> list:
    return [
        F.min_by(value_col, time_col).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, time_col).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
    ]


def tumbling_ohlc(
    stream: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_type",
    window_size: str = "1 day",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window OHLC per key — streaming A1."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(time_col), window_size).alias("win"))
        .agg(*_ohlc_aggs(value_col, time_col))
        .select(
            key_col,
            F.col("win.start").alias("period"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event counts (each event lands in size/slide windows)."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(time_col), window_size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(key_col, F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "n_events")
    )


def session_stats(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity — the reference has nothing like this; pure Spark win."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(time_col), gap).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(stream_agg: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a streaming aggregate with availableNow into an in-memory table
    (test/verification harness; complete mode emits every window, giving
    batch parity on a static backlog)."""
    q = (
        stream_agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def tumbling_vwap(
    stream: DataFrame,
    time_col: str = "ts",
    price_col: str = "price",
    size_col: str = "size",
    key_col: str = "event_type",
    window_size: str = "1 day",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window VWAP/TWAP bars per key — the streaming
    twin of :func:`~..operators.finance.vwap_bars`.

    The ratio-of-sums VWAP is stream-legal as-is: both sums are
    incrementally-mergeable aggregates, so the divide happens once per
    finalized window at emission — no custom state needed, unlike the
    recurrence indicators.  Epoch-aligned windows make the finalized bar
    equal the batch ``date_trunc`` bar (same parity contract as
    ``tumbling_ohlc``); state is watermark-bounded.  Zero/all-null volume
    emits a NULL vwap, matching batch."""
    p, s = F.col(price_col), F.col(size_col).cast("double")
    notional = F.sum(p * s)
    volume = F.sum(s)
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(time_col), window_size).alias("win"))
        .agg(
            F.when(volume > 0, notional / volume).alias("vwap"),
            F.avg(p).alias("twap"),
            volume.alias("volume"),
            F.count(p).alias("n_trades"),
            F.max(p).alias("high"),
            F.min(p).alias("low"),
        )
        .select(
            key_col,
            F.col("win.start").alias("period"),
            "vwap",
            "twap",
            "volume",
            "n_trades",
            "high",
            "low",
        )
    )
