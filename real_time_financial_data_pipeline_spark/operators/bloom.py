"""Bloom-prefiltered membership against a huge key index.

The problem at 100 TB: "drop every incoming document whose content
fingerprint already exists in the lake" is a stream-static (or
batch-batch) LEFT ANTI join where the STATIC side is the billion-row
fingerprint index — the join re-shuffles or re-broadcasts that index for
every micro-batch/run even though almost every incoming row is new.

The fix is the classic Bloom prefilter, kept EXACT by a verify join:

1. build a Bloom filter over the index ONCE (nightly, with the index
   itself) — ``build_bloom``: distributed partial bitmaps OR-reduced,
   ~1.2 GB for 1e9 keys at 1% fpp, broadcastable;
2. test incoming rows map-side — ``might_contain``: a vectorized
   pandas_udf over the broadcast bitmap, no shuffle, no join;
3. rows the Bloom calls DEFINITELY NEW (the overwhelming majority on a
   healthy stream) skip the join entirely; only the ``maybe`` fraction
   (true hits + ~fpp false positives) pays the exact anti-join —
   ``anti_join_known``.

Output is EXACTLY the plain anti-join's (a Bloom false positive is
verified away by the join, never dropped); only the join INPUT shrinks,
from |batch| to ~|hits| + fpp·|batch|.

Hashing: keys are assumed already-uniform 64-bit values (content
fingerprints from ``text.fingerprint`` / ``xxhash64`` — the intended
callers).  Probe positions use Kirsch-Mitzenmacher double hashing
h_i = h1 + i·h2 over a splitmix-style remix of the key, all in wrapping
int64 arithmetic that numpy and the JVM share bit-for-bit, so build and
probe sides agree by construction.  Feeding LOW-ENTROPY keys (sequential
ids, short enums) degrades the fpp — hash them first.

Build uses ``mapPartitions`` + ``treeReduce`` (one bitmap OR per
partition) — one of the rare per-partition imperative aggregates the
DataFrame API cannot express; everything else here is columnar.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _h1_h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent-enough 64-bit streams from an already-uniform key:
    h1 = key, h2 = odd-constant remix (xorshift-multiply) | 1 — h2 must be
    odd so probe positions cycle through all residues of a power-of-two m."""
    k = keys.astype(np.uint64)
    h2 = k ^ (k >> np.uint64(30))
    h2 = h2 * _MIX2
    h2 = h2 ^ (h2 >> np.uint64(27))
    h2 = h2 * _MIX
    h2 = h2 | np.uint64(1)
    return k, h2


class LocalBloom:
    """A plain-numpy Bloom filter value — picklable, broadcastable, and
    engine-agnostic (no JVM object, so it tests membership inside Arrow
    batches without py4j round trips)."""

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        if n_bits < 64 or n_bits & (n_bits - 1):
            raise ValueError(f"n_bits must be a power of two >= 64, got {n_bits}")
        if not 1 <= n_hashes <= 16:
            raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = (
            bits if bits is not None else np.zeros(n_bits // 64, dtype=np.uint64)
        )

    def add_many(self, keys: np.ndarray) -> None:
        # mutating the bitmap invalidates any memoized broadcast of it
        # (might_contain would otherwise keep probing the stale bits);
        # probe columns ALREADY built still hold the old broadcast —
        # rebuild them after adding, the bitmap is effectively
        # copy-on-probe.  The stale broadcast is unpersisted explicitly
        # (non-blocking): a mutate-then-probe cycle per nightly slice
        # would otherwise leave bitmap-sized executor blocks alive until
        # the JVM ContextCleaner happens to reclaim the dropped handle —
        # the exact storage ratchet the memo exists to prevent.  The
        # context-CHANGE path in might_contain stays a plain drop: the
        # old context is dead, there is nothing to unpersist.
        old = getattr(self, "_bc_bits", None)
        if old is not None:
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass  # dead context / already destroyed — nothing held
        self._bc_bits = None
        self._bc_ctx = None
        h1, h2 = _h1_h2(keys)
        mask = np.uint64(self.n_bits - 1)
        for i in range(self.n_hashes):
            pos = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                self.bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _h1_h2(keys)
        mask = np.uint64(self.n_bits - 1)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.n_hashes):
            pos = (h1 + np.uint64(i) * h2) & mask
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (n_bits rounded up to a power of two, n_hashes) for a
    target false-positive rate: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    n_bits = max(64, 1 << math.ceil(math.log2(m)))
    n_hashes = max(1, min(16, round(n_bits / expected_items * math.log(2))))
    return n_bits, n_hashes


def build_bloom(
    df: DataFrame,
    col: str = "fingerprint",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> LocalBloom:
    """Distributed Bloom build over a key column: one partial bitmap per
    partition (``mapPartitions``), OR-combined with ``treeReduce`` — the
    index never collects to the driver, only n_bits/8-byte bitmaps do
    (depth-2 tree keeps driver inbox at ~sqrt(partitions) bitmaps).

    ``expected_items`` defaults to ``df.count()`` (one extra cheap job);
    pass it when the caller already knows the cardinality.  Memory shape:
    one bitmap per TASK plus the reduce partials — at 1e9 items / 1% fpp
    the bitmap is ~1.2 GB, so size executors accordingly or raise fpp;
    this is the standard Bloom trade, stated rather than hidden."""
    if expected_items is None:
        expected_items = df.count()
    n_bits, n_hashes = bloom_params(max(1, expected_items), fpp)

    def part(rows):
        vals = np.fromiter((r[0] for r in rows if r[0] is not None), dtype=np.int64)
        b = LocalBloom(n_bits, n_hashes)
        if len(vals):
            b.add_many(vals)
        yield b.bits

    bits = (
        df.select(F.col(col).cast("long"))
        .rdd.mapPartitions(part)
        .treeReduce(np.bitwise_or, depth=2)
    )
    return LocalBloom(n_bits, n_hashes, bits)


def might_contain(bloom: LocalBloom, col: Column | str) -> Column:
    """Vectorized membership test column, each Arrow batch probing in pure
    numpy.  NULL keys test as 'maybe' (True) so they always reach the exact
    verify join rather than silently passing.

    Two deliberate shapes here:

    * the bitmap travels as an explicit ``SparkContext.broadcast`` — NOT
      inside the pickled UDF closure.  A closure is re-serialized with
      every task set that references the UDF; at the module's own stated
      scale (~1.2 GB for 1e9 keys at 1% fpp) that would blow past task
      serialization limits and re-ship the bitmap per stage.  The
      broadcast ships once per executor and is torrent-distributed.
    * the key column reaches pandas as a NON-NULLABLE long: nulls are
      coalesced to 0 JVM-side and flagged in a separate boolean input.
      Handing pandas a nullable long would silently convert the series to
      float64, and float64 cannot represent every int64 above 2^53 — a
      real fingerprint would then probe the WRONG bit positions, test
      'definitely new', skip the verify join, and break the exactness
      contract.  Keeping the column int64 end-to-end removes that path.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # pragma: no cover - requires no-session misuse
        raise RuntimeError("might_contain requires an active SparkSession")
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes
    # one broadcast PER LocalBloom instance, memoized — building the probe
    # column repeatedly (per nightly slice, per micro-batch restart) must
    # not ratchet up bitmap-sized broadcasts for the session's lifetime.
    # The memo is validated against the CURRENT SparkContext: a bloom
    # reused across a session restart would otherwise probe through a
    # broadcast owned by the dead context and fail at task time — context
    # change means re-broadcast, not reuse.  add_many() drops the memo
    # too, so a mutated bitmap never probes stale.
    sc = spark.sparkContext
    bc_bits = getattr(bloom, "_bc_bits", None)
    if bc_bits is None or getattr(bloom, "_bc_ctx", None) is not sc:
        bc_bits = sc.broadcast(bloom.bits)
        bloom._bc_bits = bc_bits
        bloom._bc_ctx = sc

    @F.pandas_udf("boolean")
    def _probe(keys: pd.Series, isnull: pd.Series) -> pd.Series:
        b = LocalBloom(n_bits, n_hashes, bc_bits.value)
        vals = keys.to_numpy(dtype=np.int64)
        out = b.might_contain_many(vals)
        out[isnull.to_numpy(dtype=bool)] = True
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    # null-flag on the CAST result, not the raw column: under non-ANSI
    # sessions cast('long') quietly nulls unparsable values, and flagging
    # only source-nulls would send those rows to the bitmap as literal 0
    # ('definitely new' on a miss — an exactness-contract breach).  Cast
    # nulls route to 'maybe' and the verify join instead.
    key_long = c.cast("long")
    key_i64 = F.coalesce(key_long, F.lit(0).cast("long"))
    return _probe(key_i64, key_long.isNull())


def anti_join_known(
    df: DataFrame,
    known: DataFrame,
    col: str = "fingerprint",
    bloom: LocalBloom | None = None,
) -> DataFrame:
    """EXACT left-anti join against a known-key index, Bloom-accelerated:
    rows the Bloom calls definitely-new skip the join; only the 'maybe'
    fraction (true hits + ~fpp false positives) pays the exact anti-join,
    which removes any false positive — output is row-identical to
    ``df.join(known, col, 'left_anti')`` for every input (the equivalence
    is test-pinned).  Without ``bloom`` it degrades to the plain join.

    At 100 TB: |join input| drops from |batch| to ~|hits| + fpp·|batch|,
    and the definitely-new path is map-only.  The two filter branches
    scan ``df`` twice — cache the batch frame when the source scan is the
    bottleneck (inside foreachBatch the micro-batch is already small)."""
    if bloom is None:
        return df.join(known.select(col).distinct(), col, "left_anti")
    maybe_flag = might_contain(bloom, col)
    definitely_new = df.filter(~maybe_flag)
    verified = df.filter(maybe_flag).join(
        known.select(col).distinct(), col, "left_anti"
    )
    return definitely_new.unionByName(verified)
