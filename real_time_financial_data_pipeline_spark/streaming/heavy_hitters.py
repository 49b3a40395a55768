"""Streaming heavy hitters: per-group frequent items over an unbounded
stream with BOUNDED state (``applyInPandasWithState``).

The batch twin (``operators.query.frequent_items``) bounds memory with
per-partition Misra-Gries summaries; a live deployment needs the same
bound across TIME: per (group) state here is one MG summary of at most
``capacity`` counters — never the full distinct-value set — folded with
each micro-batch's pre-aggregated counts and emitted as the current
top-k estimate per trigger.

Guarantees carried over from MG: every item whose true frequency in the
stream so far exceeds n/(capacity+1) is present in the state, and each
kept count underestimates truth by at most n/(capacity+1) (``n`` = the
group's total items so far, tracked exactly in the same state row).
Unlike the batch operator there is no exact second pass — a stream can't
rescan its history — so emitted counts are the MG lower bounds; the
batch operator over the landed bronze table is the nightly exact
re-count, the same batch-refines-stream split as the MinHash/SemDedup
dedup family.

State schema is (keys array<string>, counts array<long>, n long): a few
KB per group at the default capacity.

DEPLOYMENT PRECONDITION — bounded group cardinality: state is permanent
per GROUP (no watermark; evicting a group forgets its history), so
total state is O(groups x capacity).  Run this operator on group keys
with a known bound (symbols, event types, tenants — thousands to
millions), never on unbounded keys (session ids, URLs).  For
high-cardinality groups pass ``idle_ttl_ms``: groups idle longer than
the TTL are evicted via a processing-time timeout — the
least-recently-ACTIVE groups go first, which is exactly the
evict-least-n policy a bounded-memory deployment wants — at the
documented cost that a returning group restarts its counts from zero
(its history is forgotten, and the nightly batch re-count over the
landed bronze table remains the exact source of truth).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STREAM_HH_SCHEMA = StructType(
    [
        StructField("group", StringType(), False),
        StructField("item", StringType(), True),
        StructField("approx_count", LongType(), True),
        StructField("rank", LongType(), True),
        StructField("n_total", LongType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("n", LongType(), True),
    ]
)


def _mg_fold(counters: dict[str, int], batch_counts: dict[str, int], capacity: int) -> dict[str, int]:
    """Fold a batch's exact counts into an MG summary, keeping at most
    ``capacity`` counters via the decrement-by-min rule (same kernel as
    the batch operator's per-partition fold: each decrement round
    destroys m*(|counters|) ≥ m*(capacity+1) total mass while any single
    item loses ≤ m, preserving the n/(capacity+1) undercount bound)."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    while len(counters) > capacity:
        dead = [k for k, v in counters.items() if v <= 1]
        if dead:
            counters = {k: v - 1 for k, v in counters.items() if v > 1}
        else:
            m = min(counters.values())
            counters = {k: v - m for k, v in counters.items() if v > m}
    return counters


def _make_update(k: int, capacity: int, idle_ttl_ms: int | None = None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-TTL eviction (the bounded-groups guard): forget this
            # group's summary — if it returns, counts restart from zero
            state.remove()
            return
        if state.exists:
            items, counts, n = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf["item"].dropna().value_counts()
            n += int(vc.sum())
            counters = _mg_fold(counters, vc.to_dict(), capacity)
        state.update((list(counters), [int(v) for v in counters.values()], n))
        if idle_ttl_ms is not None:
            state.setTimeoutDuration(idle_ttl_ms)
        top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        if top:
            yield pd.DataFrame(
                {
                    "group": key[0],
                    "item": [t for t, _ in top],
                    "approx_count": [c for _, c in top],
                    "rank": range(1, len(top) + 1),
                    "n_total": n,
                }
            )

    return _update


def stream_heavy_hitters(
    stream: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 10,
    capacity: int | None = None,
    idle_ttl_ms: int | None = None,
) -> DataFrame:
    """Current top-k frequent items per group, re-emitted each trigger
    (update mode) with MG lower-bound counts and the group's exact total
    ``n_total`` — see the module docstring for the bound, the
    batch-exact-recount deployment split, and the GROUP-CARDINALITY
    precondition.  Nulls are not items (same contract as the batch
    twin).  ``idle_ttl_ms`` arms the bounded-groups guard: a group with
    no arrivals for that long is evicted (processing-time timeout) and
    restarts from zero if it returns.  State is O(groups × capacity)
    counters; at high group cardinality run the session with
    ``state_store='rocksdb'`` (``session.state_store_conf``) so state
    spills to local disk instead of capping the executor heap."""
    capacity = capacity or 8 * k
    if capacity < k:
        raise ValueError(f"capacity {capacity} < k {k}")
    if idle_ttl_ms is not None and idle_ttl_ms <= 0:
        raise ValueError(f"idle_ttl_ms must be positive, got {idle_ttl_ms}")
    normalized = stream.selectExpr(
        f"CAST({group_col} AS string) AS group",
        f"CAST({item_col} AS string) AS item",
    )
    return normalized.groupBy("group").applyInPandasWithState(
        _make_update(k, capacity, idle_ttl_ms),
        outputStructType=STREAM_HH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
