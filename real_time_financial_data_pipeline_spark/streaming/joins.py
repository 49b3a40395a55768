"""Stream-stream joins — the watermarked interval join.

The reference has no streaming joins at all; this is the idiomatic Spark
construction for "enrich each event with the other stream's events from
the recent past" (trade ⋈ quotes, purchase ⋈ preceding clicks):

    left.withWatermark ⋈ right.withWatermark
      ON key equality AND right.ts ∈ [left.ts - lookback, left.ts]

Both watermarks plus the time-range predicate are what make the state
FINITE: Spark buffers each side only until the other side's watermark
passes the end of the possible-match interval, then evicts — without the
range condition a stream-stream join would buffer both streams forever.
Inner-join rows emit as soon as both inputs arrive (append mode); the
watermark only governs state cleanup and late-data cutoff.

Inputs must be pre-projected to DISTINCT column names (rename before the
join, e.g. ``p_ts``/``c_ts``) — the joined schema is the concatenation of
both sides, and Spark does not qualify duplicate names in streaming
plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: list[tuple[str, str]],
    left_time: str,
    right_time: str,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on key equality + a lookback interval:
    every (left, right) pair with equal keys and
    ``right_time ∈ [left_time - lookback, left_time]``.

    ``key_pairs`` is ``[(left_col, right_col), ...]``; ``lookback`` and
    ``watermark`` are SQL interval strings (``'1 hour'``).  State per key
    is bounded by lookback + watermark on both sides.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond: Column = (
        (F.col(right_time) >= F.col(left_time) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(right_time) <= F.col(left_time))
    )
    for lk, rk in key_pairs:
        cond = cond & (F.col(lk) == F.col(rk))
    return lw.join(rw, cond, how)


def stream_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    key_cols: list[str] | None = None,
    bucket: str = "1 day",
    end_inclusive: bool = False,
) -> DataFrame:
    """Stream-static range join: tag each STREAMING point with every row
    of a STATIC interval table containing it (maintenance windows,
    campaign flights, trading sessions).

    This is the batch ``operators.asof.range_join`` applied verbatim —
    the decomposition is stream-legal by construction: the stream side
    only gains a stateless bucket-id projection, the static side's
    explode happens once per micro-batch plan, and the join is a
    stream-static INNER equi-join on (keys, bucket) — append-mode safe,
    no watermark, no state.  Refresh the interval table by restarting
    the query (static sides are re-resolved per restart, same contract
    as ``known_fingerprints`` in streaming/training.py).

    Only ``how='inner'`` exists here: the batch 'left' form re-matches
    unmatched rows via an anti-join + union, which would make two
    stream-static joins out of one logical operator; filter the output
    against the input if unmatched points matter.
    """
    from ..operators.asof import range_join

    if not points.isStreaming:
        raise ValueError("points must be a streaming DataFrame (use range_join)")
    if intervals.isStreaming:
        raise ValueError("intervals must be static (stream-stream ranges need "
                         "stream_interval_join's watermarks)")
    return range_join(
        points, intervals, ts_col, start_col, end_col,
        key_cols=key_cols, bucket=bucket, end_inclusive=end_inclusive,
    )
