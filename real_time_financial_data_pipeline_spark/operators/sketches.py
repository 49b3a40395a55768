"""Mergeable KMV (k-minimum-values) distinct sketches — persisted
cardinality and set-overlap estimation for corpus snapshots.

Why this exists next to ``approx_count_distinct``: Spark's built-in HLL++
returns a SCALAR — the sketch state itself is not addressable from the
DataFrame API, so you cannot persist tonight's sketch and merge it with
tomorrow's.  Tracking a corpus' distinct-content trend (dup rate over
snapshots, overlap between two crawls, benchmark-vs-corpus contamination
rate) would therefore re-scan ALL history every night.  A KMV sketch is
a plain ``array<long>`` column: the k smallest xxhash64 values of the
distinct value set (Bar-Yossef et al. 2002; set operations per Beyer et
al., SIGMOD 2007).  That makes it

- **persistable** — a normal parquet column, snapshot-versionable like
  any other table;
- **exactly mergeable** — the k smallest of A ∪ B are recoverable from
  the k smallest of A and of B alone: ``merge(kmv(A), kmv(B)) ==
  kmv(A ∪ B)`` as ARRAYS, not approximately (property-tested);
- **composable** — union/intersection/Jaccard estimates between any two
  sketched corpora without touching either corpus again.

Estimator: with u_k = the k-th smallest hash mapped to (0,1),
``distinct ≈ (k-1)/u_k`` (relative std error ~ 1/sqrt(k); k=1024 ≈ 3%).
A sketch holding FEWER than k hashes is the complete distinct hash set,
so small strata are EXACT (64-bit collisions aside).

Scale shape of the build: one ``mapInPandas`` pre-prune bounds every
partition's contribution at k distinct hashes per key (so a 100 TB
column shuffles at most partitions x k rows per key, like the
Misra-Gries pass in ``query.frequent_items``), then a per-key
dense-rank window keeps the global k minima and one bounded
``collect_set`` packs the array.  The global (keyless) sketch is a
single reducer by construction — bounded at partitions x k rows, which
is the point: that reducer's input is independent of corpus size.

The build parameter ``k`` rides as column metadata on the ``kmv``
field (the same artifact-carries-its-params contract as
``dedup.substring_window_index``); merging or comparing sketches built
with different k raises instead of silently mis-estimating.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNIT = 2.0**-64  # signed long -> (0,1): u = h * 2^-64 + 0.5


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    k: int = 1024,
    out_col: str = "kmv",
) -> DataFrame:
    """Build one KMV sketch per ``key_cols`` group (one global row when
    None) over the DISTINCT values of ``value_col``.  Nulls are excluded
    (sketch convention: null is the absence of a value).  Output:
    (key_cols..., ``out_col`` array<long> sorted ascending, carrying
    ``{"kmv_k": k}`` column metadata)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = list(key_cols or [])
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, F.xxhash64(value_col).alias("_h"))
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                deduped = pdf.drop_duplicates()
                if keys:
                    yield (
                        deduped.sort_values("_h")
                        .groupby(keys, dropna=False, sort=False)
                        .head(k)
                    )
                else:
                    yield deduped.nsmallest(k, "_h")

    pruned = hashed.mapInPandas(prune, hashed.schema)
    w = Window.partitionBy(*(keys or [F.lit(0)])).orderBy("_h")
    topk = pruned.withColumn("_r", F.dense_rank().over(w)).filter(F.col("_r") <= k)
    sketch = F.slice(F.array_sort(F.collect_set("_h")), 1, k)
    agg = (
        topk.groupBy(*keys)
        .agg(sketch.alias(out_col))
        .select(*keys, F.col(out_col).alias(out_col, metadata={"kmv_k": k}))
    )
    return agg


def kmv_estimate(sketch: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch array: exact size when the
    sketch is under-full (it IS the distinct hash set), else (k-1)/u_k."""
    size = F.size(sketch)
    u_k = F.element_at(sketch, k).cast("double") * F.lit(_UNIT) + F.lit(0.5)
    return F.when(size < k, size.cast("double")).otherwise(F.lit(k - 1) / u_k)


def kmv_union(a: Column, b: Column, k: int) -> Column:
    """Sketch of the UNION of the two sketched sets — exact w.r.t. the
    sketch definition: the k smallest hashes of A ∪ B all live in the k
    smallest of A or of B.  Null-safe (a stratum present on one side)."""
    both = F.concat(
        F.coalesce(a, F.array().cast("array<long>")),
        F.coalesce(b, F.array().cast("array<long>")),
    )
    return F.slice(F.array_sort(F.array_distinct(both)), 1, k)


def _k_of(df: DataFrame, col: str) -> int:
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        raise ValueError(f"expected a {col!r} sketch column, got {df.columns}")
    k = dict(field.metadata or {}).get("kmv_k")
    if k is None:
        raise ValueError(
            f"{col!r} carries no kmv_k metadata — build sketches with "
            "kmv_sketch so the merge contract is enforceable"
        )
    return int(k)


def merge_kmv_tables(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str] | None = None,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Fold two sketch TABLES (e.g. tonight's snapshot into the running
    one): null-safe full outer on the keys, per-row :func:`kmv_union`.
    Folding day-by-day equals sketching the whole history at once
    (property-tested), so the nightly cadence never re-scans old data.
    Raises when the two tables were built with different k."""
    ka, kb = _k_of(a, sketch_col), _k_of(b, sketch_col)
    if ka != kb:
        raise ValueError(f"cannot merge sketches with different k: {ka} != {kb}")
    keys = list(key_cols or [])
    bb = b.withColumnRenamed(sketch_col, "_kmv_b")
    if keys:
        cond = [a[kc].eqNullSafe(bb[kc]) for kc in keys]
        joined = a.join(bb, cond, "full_outer").select(
            *[F.coalesce(a[kc], bb[kc]).alias(kc) for kc in keys],
            a[sketch_col].alias("_kmv_a"),
            "_kmv_b",
        )
    else:
        joined = a.crossJoin(bb)  # both are single-row global sketches
        joined = joined.select(F.col(sketch_col).alias("_kmv_a"), "_kmv_b")
    return joined.select(
        *keys,
        kmv_union(F.col("_kmv_a"), F.col("_kmv_b"), ka).alias(
            sketch_col, metadata={"kmv_k": ka}
        ),
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str] | None = None,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Per-key set-relationship estimates between two sketched corpora
    (Beyer et al. 2007): restrict attention to M = the union sketch (a
    uniform sample of A ∪ B by hash order); the fraction of M present in
    both input sketches estimates Jaccard, scaled by the union estimate
    it gives the intersection size.  Columns: distinct_a_est,
    distinct_b_est, union_est, jaccard_est, overlap_est — all from
    sketches alone, no corpus access.  Strata present on only one side
    report jaccard 0 and the one-sided cardinality."""
    ka, kb = _k_of(a, sketch_col), _k_of(b, sketch_col)
    if ka != kb:
        raise ValueError(f"cannot compare sketches with different k: {ka} != {kb}")
    k = ka
    keys = list(key_cols or [])
    bb = b.withColumnRenamed(sketch_col, "_kmv_b")
    if keys:
        cond = [a[kc].eqNullSafe(bb[kc]) for kc in keys]
        joined = a.join(bb, cond, "full_outer").select(
            *[F.coalesce(a[kc], bb[kc]).alias(kc) for kc in keys],
            a[sketch_col].alias("_kmv_a"),
            "_kmv_b",
        )
    else:
        joined = a.crossJoin(bb).select(F.col(sketch_col).alias("_kmv_a"), "_kmv_b")
    sa = F.coalesce(F.col("_kmv_a"), F.array().cast("array<long>"))
    sb = F.coalesce(F.col("_kmv_b"), F.array().cast("array<long>"))
    m = kmv_union(sa, sb, k)
    in_both = F.size(F.array_intersect(F.array_intersect(m, sa), sb))
    jaccard = F.when(
        F.size(m) > 0, in_both.cast("double") / F.size(m).cast("double")
    ).otherwise(F.lit(0.0))
    union_est = kmv_estimate(m, k)
    return joined.select(
        *keys,
        F.round(kmv_estimate(sa, k), 1).alias("distinct_a_est"),
        F.round(kmv_estimate(sb, k), 1).alias("distinct_b_est"),
        F.round(union_est, 1).alias("union_est"),
        F.round(jaccard, 6).alias("jaccard_est"),
        F.round(jaccard * union_est, 1).alias("overlap_est"),
    )
