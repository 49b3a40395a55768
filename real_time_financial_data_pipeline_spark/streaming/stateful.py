"""Custom stateful streaming — ``applyInPandasWithState``.

The reference has no stateful processing at all; this supplies the piece
Structured Streaming's built-in windows can't express: arbitrary per-key
running state across micro-batches.

``running_stats``: per-key cumulative count / sum / mean / max plus the
last-seen event time, updated every micro-batch and emitted as one row per
key per batch.  The state dict survives between triggers in the state
store (checkpointed, recoverable).

Idle-key eviction: pass ``idle_timeout_ms`` to bound state by activity —
the stream gets a watermark and each key arms an event-time timeout at
``last_seen + idle_timeout_ms``; once the watermark passes it, the key's
state is dropped (``GroupStateTimeout.EventTimeTimeout``).  Default is
``NoTimeout`` (state = O(live keys) forever) — right for low-cardinality
keys like event_type, wrong for unbounded key spaces like user ids at
100 TB/day, where the timeout is the difference between O(active users)
and O(all users ever) state.

Scale: state is O(retained keys) × a few scalars; updates are
Arrow-batched per key-group.  This is the pattern to extend for running
VWAP, order-book imbalance, per-user sessionization with custom logic, etc.

State-schema compatibility: ``last_ts_us`` was ADDED to ``_STATE_SCHEMA``
after the initial release — a streaming query restarted from a checkpoint
written with the 3-field state will fail the state-store schema check (and
a 3-tuple would not unpack into 4 values).  All in-repo checkpoints are
ephemeral tmp dirs so nothing here migrates; if long-lived checkpoints
ever matter, version the state or unpack ``state.get`` defensively.
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

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_events", LongType(), True),
        StructField("total", DoubleType(), True),
        StructField("mean", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
        # epoch MICROS, not TimestampType: scalar longs round-trip the state
        # store without tz/unit ambiguity
        StructField("last_ts_us", LongType(), True),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_seen + idle_timeout: evict, emit nothing
            state.remove()
            return
        (n, total, max_value, last_us) = (
            state.get if state.exists else (0, 0.0, float("-inf"), None)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                max_value = max(max_value, float(pdf["value"].max()))
                batch_max = pdf["ts"].max()
                # all-null ts slice -> NaT, whose .value is a garbage sentinel
                if pd.notna(batch_max):
                    batch_us = int(batch_max.value // 1_000)  # pandas ns -> us
                    last_us = batch_us if last_us is None else max(last_us, batch_us)
        state.update((n, total, max_value, last_us))
        if idle_timeout_ms is not None and last_us is not None:
            state.setTimeoutTimestamp(last_us // 1_000 + idle_timeout_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total": [round(total, 6)],
                "mean": [round(total / n, 6) if n else None],
                "max_value": [max_value if n else None],
                "last_ts": [pd.Timestamp(last_us * 1_000) if last_us is not None else None],
            }
        )

    return _update


def running_stats(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    time_col: str = "ts",
    idle_timeout_ms: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key running statistics across micro-batches (update mode).

    With ``idle_timeout_ms``, keys idle past the event-time watermark are
    evicted (state restarts from zero if the key reappears) — the bounded-
    state posture for unbounded key spaces.

    State size: O(live keys) × a fixed per-key struct.  At 100× key
    cardinality the default in-memory state store becomes the executor-
    heap ceiling — run the session with ``state_store='rocksdb'``
    (``session.get_spark``/``state_store_conf``) to spill state to local
    disk with a bounded block cache.
    """
    normalized = stream.selectExpr(
        f"{key_col} AS key", f"CAST({value_col} AS double) AS value", f"{time_col} AS ts"
    )
    timeout = GroupStateTimeout.NoTimeout
    if idle_timeout_ms is not None:
        # EventTimeTimeout requires a watermark on the input stream
        normalized = normalized.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return normalized.groupBy("key").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
