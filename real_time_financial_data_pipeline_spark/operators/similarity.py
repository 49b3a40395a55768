"""Similarity search over embedding columns (``array<float>``).

Two paths, same semantics:

- ``cosine_topk`` — exact brute force.  The query set is broadcast; each
  partition of the corpus computes scores with JVM higher-order functions
  (zip_with product + left-fold sum — sequential, so results are bitwise
  deterministic) and top-k is a per-query window.  Cost O(|corpus|·|queries|)
  but embarrassingly parallel and shuffle-free until the final tiny top-k.
- ``lsh_topk`` — the 100 TB path: random-hyperplane signatures bucket the
  corpus (signature = sign pattern of h fixed random projections), queries
  probe only their own bucket (plus optional multi-probe neighbors), then
  exact cosine re-ranks inside buckets.  Recall trades off with bucket
  count; the random planes are seeded and reproducible.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double — deterministic summation
    order, bitwise reproducible across engines and partitionings."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus, per-query window.

    Ranking sorts on (rounded score desc, corpus id asc) — fully
    deterministic even through float ties.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    ).crossJoin(broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("vec"), F.col("query_vec")), 6).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _random_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def rp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane, packed to long."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(v)) for v in plane])) >= 0, F.lit(1)).otherwise(F.lit(0))
        for plane in planes
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(2**i).cast("long"))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket by random-hyperplane signature, exact cosine
    within the shared bucket.

    At 100 TB the corpus is written bucketed-by-signature once, so a query
    probe touches 1/2^n_planes of the data; here both sides compute the
    signature on the fly.  Returns the same schema as ``cosine_topk`` —
    recall < 1 by construction (scale/recall tradeoff).
    """
    planes = _random_planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        rp_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        rp_signature(F.col(vec_col), planes).alias("bucket"),
    )
    joined = c.join(broadcast(q), "bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("vec"), F.col("query_vec")), 6).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
