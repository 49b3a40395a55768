"""Deterministic lifetimes for operator-internal persists (r18).

Several operators persist intermediates to stop Catalyst re-instantiating
a large subtree within ONE invocation (the plan-explosion guard: the
minhash signature tree, the training-set curation ladder).  Spark's
CacheManager matches caches by canonical PLAN, so without a scope a
second same-session invocation of the operator silently reuses the first
invocation's materialized cache — bench loops and long-lived drivers then
time a warm-cache path instead of the query, and dropped caches only ever
happen via a global ``spark.catalog.clearCache()``.

The rotation contract: an operator calls :func:`begin` once per
invocation (unpersisting everything the PREVIOUS invocation registered
under its tag) and :func:`register` for each frame it persists.  The
intra-invocation guard is untouched; every new invocation recomputes from
its inputs.  Previous frames are unpersisted non-blocking — a caller
still holding the prior invocation's returned DataFrame just recomputes
from lineage if it executes again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def begin(tag: str) -> None:
    """Start a new cache scope for ``tag``: unpersist (non-blocking) every
    frame the previous invocation registered."""
    for old in _LIVE.pop(tag, []):
        old.unpersist()


def register(tag: str, df: DataFrame) -> DataFrame:
    """Track ``df`` (already persisted) under ``tag`` and return it."""
    _LIVE.setdefault(tag, []).append(df)
    return df


def live(tag: str) -> list[DataFrame]:
    """The frames the CURRENT scope for ``tag`` holds (for tests)."""
    return list(_LIVE.get(tag, []))
