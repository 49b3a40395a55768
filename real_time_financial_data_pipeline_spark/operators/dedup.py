"""Deduplication operators — exact through fuzzy, all shuffle-aware.

The reference's only dedup is full-row ``drop_duplicates()``
(transformers.py:32-33).  A training-data pipeline needs the whole ladder:

- exact       : hash groupBy on content (or any key subset);
- key-based   : keep newest row per business key;
- fingerprint : 64-bit content hash, groupBy hash;
- MinHash+LSH : shingle -> k minhashes -> bands -> bucket join -> verify.
                Candidate generation is O(docs · bands) with a groupBy on
                (band, signature) — never an all-pairs product;
- SimHash     : 64-bit similarity-preserving signature via vectorized
                pandas_udf (bit-parallel numpy; no builtin expresses it);
- n-gram Jaccard: exact verify step for candidate pairs.

Scale: every stage is a projection or a single hash aggregate.  The LSH
bucket join explodes docs × bands (flat 2-20× row inflation, narrow rows of
(hash, id)), which beats the O(n²) alternative by ~n/bands.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from real_time_financial_data_pipeline_spark.operators.query import latest_per_key
from real_time_financial_data_pipeline_spark.operators.text import ngrams, tokens


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup: full-row (reference F2) or subset-keyed."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def exact_dedup_keep_min(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact content dedup with deterministic survivor (min id per content) —
    one hash aggregate, map-side combined."""
    others = [c for c in df.columns if c != content_col and c != id_col]
    return df.groupBy(content_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
        *[F.min_by(c, id_col).alias(c) for c in others],
    )


def key_dedup_latest(df: DataFrame, key_cols: list[str], time_col: str) -> DataFrame:
    """Keep the newest row per key (ingest-dedup for CDC-style feeds)."""
    return latest_per_key(df, key_cols, time_col)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two string-array columns (as distinct sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document.

    k independent hash families via murmur3 with distinct seed literals;
    minhash_i = min over shingles of hash(shingle, seed_i).  Entirely
    JVM-side: transform + array_min, no shuffle, no UDF.
    """
    shingles = ngrams(tokens(F.col(text_col)), shingle_n)
    # Documents shorter than one shingle fall back to whole-text identity.
    shingles = F.when(F.size(shingles) > 0, shingles).otherwise(F.array(F.col(text_col)))

    def hash_family(seed: int):
        # IMPORTANT: the lambda must take exactly ONE parameter — F.transform
        # passes the array index to a second parameter, which would shadow
        # the seed and collapse all k hash families into one.
        return lambda s: F.hash(s, F.lit(seed))

    sig = F.array(
        *[F.array_min(F.transform(shingles, hash_family(i))) for i in range(num_hashes)]
    )
    return df.select(id_col, sig.alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: equal band-slice => candidate pair.

    explode(bands) -> groupBy (band, slice-hash) -> self-join inside tiny
    buckets.  Pairs are emitted once (id_a < id_b).
    """
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("band_sig"),
                ),
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.band_sig")

    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidates ->
    exact Jaccard verify -> pairs above threshold."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)

    docs = df.select(F.col(id_col), ngrams(tokens(F.col(text_col)), shingle_n).alias("grams"))
    verified = (
        cands.join(docs.withColumnsRenamed({id_col: "id_a", "grams": "grams_a"}), "id_a")
        .join(docs.withColumnsRenamed({id_col: "id_b", "grams": "grams_b"}), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash via Arrow-vectorized pandas_udf.

    Bit-vote accumulation over token hashes has no Spark builtin; the UDF is
    numpy-vectorized per Arrow batch (bit unpack -> ±1 votes -> repack), so
    the Python cost is per-batch, not per-row.  Token hashing uses a
    deterministic FNV-1a so results are reproducible across workers.
    """

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import numpy as np

        def h64(tok: str) -> int:
            # FNV-1a 64-bit — deterministic, dependency-free
            h = 0xCBF29CE484222325
            for ch in tok.encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h

        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [w for w in (t or "").lower().split(" ") if w]
            if not toks:
                out[i] = 0
                continue
            hashes = np.array([h64(w) for w in toks], dtype=np.uint64)
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = bits.sum(axis=0) * 2 - len(toks)  # (+1/-1 votes)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return df.withColumn(out_col, _simhash(F.col(text_col)))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
