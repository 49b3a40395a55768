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


def kmv_sample_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_cols: list[str] | None = None,
    k: int = 1024,
    out_col: str = "kmv_sample",
) -> DataFrame:
    """Bottom-k uniform SAMPLE sketch (coordinated sampling, Cohen &
    Kaplan): the k rows whose ``xxhash64(id_col)`` is smallest, carrying
    their ``value_col`` — ``array<struct<h:long, v:double>>`` sorted by
    hash.  Because membership is decided by a hash ORDER, not a coin
    flip, two snapshots' sketches merge EXACTLY like the distinct
    sketch: the bottom-k of A ∪ B is recoverable from the two bottom-k
    sets alone.  One persisted sketch per snapshot therefore gives
    quantile / mean estimates (:func:`sample_quantile`,
    :func:`sample_mean`) over ANY union of snapshots without rescanning
    them — the same nightly-trend contract as :func:`kmv_sketch`, for
    distribution shape instead of cardinality.

    Contract: ``id_col`` must identify a row STABLY across the tables
    you intend to merge (a content hash, not a row number) and map to
    one value — duplicate ids within a build resolve deterministically
    to the minimum value; the same id with DIFFERENT values across
    merged snapshots would double-enter the sample.  Rows with null id
    or value are excluded (it is a sample of the non-null values).

    Same scale shape as :func:`kmv_sketch`: mapInPandas pre-prune (≤ k
    rows per key per partition), (keys, h)-grain min aggregate, bounded
    window + collect."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = list(key_cols or [])
    hashed = (
        df.filter(F.col(id_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            *keys,
            F.xxhash64(id_col).alias("_h"),
            F.col(value_col).cast("double").alias("_v"),
        )
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                deduped = pdf.sort_values(["_h", "_v"]).drop_duplicates(
                    subset=[*keys, "_h"]
                )
                if keys:
                    yield deduped.groupby(keys, dropna=False, sort=False).head(k)
                else:
                    yield deduped.head(k)

    pruned = hashed.mapInPandas(prune, hashed.schema)
    distinct = pruned.groupBy(*keys, "_h").agg(F.min("_v").alias("_v"))
    w = Window.partitionBy(*(keys or [F.lit(0)])).orderBy("_h")
    topk = distinct.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    sketch = F.slice(
        F.array_sort(
            F.collect_list(F.struct(F.col("_h").alias("h"), F.col("_v").alias("v")))
        ),
        1,
        k,
    )
    return (
        topk.groupBy(*keys)
        .agg(sketch.alias(out_col))
        .select(
            *keys,
            F.col(out_col).alias(
                out_col, metadata={"kmv_k": k, "kmv_kind": "sample"}
            ),
        )
    )


def sample_quantile(sketch: Column, q: float) -> Column:
    """Quantile estimate from a (possibly merged) bottom-k sample sketch:
    the q-quantile of the sampled values (nearest-rank).  Exact when the
    sketch is underfull (the sample IS the population)."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    vs = F.array_sort(F.transform(sketch, lambda x: x["v"]))
    idx = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.size(vs)).cast("int"))
    return F.try_element_at(vs, idx)  # null (not an ANSI throw) on empty


def sample_mean(sketch: Column) -> Column:
    """Mean estimate from a bottom-k sample sketch (uniform sample mean)."""
    total = F.aggregate(
        F.transform(sketch, lambda x: x["v"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(sketch) > 0, total / F.size(sketch))


def kmv_estimate(sketch: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch array: exact size when the
    sketch is under-full (it IS the distinct hash set), else (k-1)/u_k."""
    # try_element_at: an underfull sketch takes the exact branch, but ANSI
    # sessions (Spark 4 default) evaluate element_at eagerly and would
    # throw on the short array before when() can choose
    size = F.size(sketch)
    u_k = F.try_element_at(sketch, F.lit(k)).cast("double") * F.lit(_UNIT) + F.lit(0.5)
    return F.when(size < k, size.cast("double")).otherwise(F.lit(k - 1) / u_k)


def kmv_union(a: Column, b: Column, k: int, array_type: str = "array<long>") -> Column:
    """Sketch of the UNION of the two sketched sets — exact w.r.t. the
    sketch definition: the k smallest hashes of A ∪ B all live in the k
    smallest of A or of B.  Null-safe (a stratum present on one side);
    pass the sample sketch's struct ``array_type`` for non-long arrays
    (sort order is lexicographic on (h, v), so hash order leads)."""
    empty = F.array().cast(array_type)
    both = F.concat(F.coalesce(a, empty), F.coalesce(b, empty))
    return F.slice(F.array_sort(F.array_distinct(both)), 1, k)


def _k_of(df: DataFrame, col: str) -> tuple[int, str, "object"]:
    """(k, kind, element dtype) from a sketch column's metadata + schema;
    raises when the contract metadata is missing."""
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        raise ValueError(f"expected a {col!r} sketch column, got {df.columns}")
    md = dict(field.metadata or {})
    k = md.get("kmv_k")
    if k is None:
        raise ValueError(
            f"{col!r} carries no kmv_k metadata — build sketches with "
            "kmv_sketch/kmv_sample_sketch so the merge contract is enforceable"
        )
    return int(k), md.get("kmv_kind", "distinct"), field.dataType


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
    Works on distinct AND sample sketches (the bottom-k-of-union
    identity is order-algebra, blind to the payload); raises when the
    two tables were built with different k or are different kinds."""
    ka, kind_a, dt = _k_of(a, sketch_col)
    kb, kind_b, _ = _k_of(b, sketch_col)
    if ka != kb:
        raise ValueError(f"cannot merge sketches with different k: {ka} != {kb}")
    if kind_a != kind_b:
        raise ValueError(f"cannot merge a {kind_a} sketch with a {kind_b} sketch")
    keys = list(key_cols or [])
    empty = F.array().cast(dt)
    bb = b.withColumnRenamed(sketch_col, "_kmv_b")
    if keys:
        cond = [a[kc].eqNullSafe(bb[kc]) for kc in keys]
        joined = a.join(bb, cond, "full_outer").select(
            *[F.coalesce(a[kc], bb[kc]).alias(kc) for kc in keys],
            F.coalesce(a[sketch_col], empty).alias("_kmv_a"),
            F.coalesce(F.col("_kmv_b"), empty).alias("_kmv_b"),
        )
    else:
        joined = a.crossJoin(bb)  # both are single-row global sketches
        joined = joined.select(F.col(sketch_col).alias("_kmv_a"), "_kmv_b")
    return joined.select(
        *keys,
        kmv_union(
            F.col("_kmv_a"), F.col("_kmv_b"), ka, array_type=dt.simpleString()
        ).alias(sketch_col, metadata={"kmv_k": ka, "kmv_kind": kind_a}),
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
    ka, kind_a, _ = _k_of(a, sketch_col)
    kb, kind_b, _ = _k_of(b, sketch_col)
    if ka != kb:
        raise ValueError(f"cannot compare sketches with different k: {ka} != {kb}")
    if kind_a != "distinct" or kind_b != "distinct":
        raise ValueError(
            "kmv_overlap works on distinct sketches; estimate sample-sketch "
            f"distributions with sample_quantile/sample_mean (got {kind_a}/{kind_b})"
        )
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
