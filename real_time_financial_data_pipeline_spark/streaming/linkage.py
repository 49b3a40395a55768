"""Streaming record linkage: match a STREAM of entity strings against a
static reference catalog, append-mode safe.

The batch ``operators.linkage.fuzzy_join`` cannot run on a stream: its
signature build is a per-id groupBy (stateful on a stream) and its
top-k ranking is a window (not append-expressible).  This twin
restructures the same math stream-legally:

- signatures are computed PER ROW with higher-order expressions —
  ``min over shingles of (xxhash64(shingle) * a_i + b_i)`` — the exact
  arithmetic of ``dedup.minhash_signatures``'s aggregate (same affine
  families, same ``__short__`` placeholder), so a stream-side signature
  is bit-identical to what the batch path computes for the same string
  (parity-tested).  Interpreted HOF cost is per-row k x |shingles| —
  fine for entity STRINGS (tens of shingles), which is why the batch
  corpus path uses explode + aggregate instead (dedup.py's measured
  rationale) and this one does not;
- candidate generation is a stream-static inner equi-join on the banded
  catalog index (append-safe, no state);
- verification joins the static catalog grams and computes the exact
  Jaccard per candidate row;
- a pair colliding in SEVERAL bands would emit duplicate rows; the
  standard bounded-state fix is ``dropDuplicatesWithinWatermark`` on
  (stream id, catalog id) — the same re-delivery machinery
  ``stream_training_chunks`` uses, state bounded by the watermark.

No top-k here: ALL matches >= threshold are emitted as they arrive
(ranking needs cross-row state; rank downstream or in the nightly batch
pass).  Long overflow in the signature affine transforms relies on Java
wrap semantics — run under the package session (ANSI off), the same
requirement the batch signature path already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _banded, jaccard
from ..operators.linkage import _linkage_text
from ..operators.text import ngrams, tokens


def _row_signature(grams, id_col: str, num_hashes: int):
    """Per-row MinHash signature column over a gram array — the stateless
    twin of ``minhash_signatures``'s groupBy-min (min over a multiset ==
    min over its set, so no dedup is needed)."""
    shingles = F.when(F.size(grams) > 0, grams).otherwise(
        F.array(F.concat(F.lit("__short__"), F.col(id_col).cast("string")))
    )
    hashes = F.transform(shingles, lambda g: F.xxhash64(g))
    rng_a = [2 * i + 1 for i in range(num_hashes)]
    rng_b = [0x9E3779B97F4A7C15 * (i + 1) % (2**63) for i in range(num_hashes)]
    return F.array(
        *[
            F.array_min(F.transform(hashes, lambda h: h * F.lit(a) + F.lit(b)))
            for a, b in zip(rng_a, rng_b)
        ]
    )


def stream_fuzzy_matches(
    stream: DataFrame,
    catalog: DataFrame,
    stream_col: str,
    catalog_col: str,
    stream_id: str,
    catalog_id: str,
    ts_col: str,
    threshold: float = 0.4,
    mode: str = "char",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    watermark: str = "10 minutes",
    catalog_sigs: DataFrame | None = None,
) -> DataFrame:
    """(stream columns..., matched ``catalog_id``, ``similarity``) for
    every streaming row whose string fuzzy-matches a catalog row at
    Jaccard >= ``threshold`` — same candidates and same exact verified
    similarity as the batch ``fuzzy_join`` over the drained input
    (parity-tested), emitted per match in append mode.  The catalog is
    re-resolved per query restart (static-side refresh contract); pass
    the nightly ``fuzzy_signatures`` table as ``catalog_sigs`` so the
    restart never re-hashes the big side — build parameters are checked
    against the query's (raise on mismatch, the batch contract)."""
    if not stream.isStreaming:
        raise ValueError("stream must be a streaming DataFrame (use fuzzy_join)")
    if catalog.isStreaming:
        raise ValueError("catalog must be static")
    if mode not in ("char", "token"):
        raise ValueError(f"mode must be 'char' or 'token', got {mode!r}")
    rows_per_band = num_hashes // bands

    eff_n = 1 if mode == "char" else shingle_n
    grams_of = lambda c: ngrams(tokens(_linkage_text(c, mode, shingle_n)), eff_n)

    sproj = stream.withWatermark(ts_col, watermark).select(
        F.col(stream_id).alias("_s_id"),
        F.col(ts_col).alias("_s_ts"),
        grams_of(F.col(stream_col)).alias("_s_grams"),
    )
    ssig = sproj.withColumn(
        "minhash", _row_signature(F.col("_s_grams"), "_s_id", num_hashes)
    )
    # same band/slice expression as dedup._banded, with the stream row's
    # payload (ts, grams) carried through — _banded itself projects the
    # payload away, and a re-join to recover it would be a second
    # stream-side shuffle
    sbanded = ssig.select(
        F.col("_s_id"),
        "_s_ts",
        "_s_grams",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.slice(
                                F.col("minhash"), b * rows_per_band + 1, rows_per_band
                            ),
                        )
                    ).alias("band_sig"),
                ),
            )
        ).alias("bs"),
    ).select("_s_id", "_s_ts", "_s_grams", "bs.band", "bs.band_sig")

    from ..operators.linkage import _check_sig_params, fuzzy_signatures

    if catalog_sigs is not None:
        _check_sig_params(catalog_sigs, mode, shingle_n, num_hashes)
        csig = catalog_sigs
    else:
        csig = fuzzy_signatures(
            catalog, catalog_col, catalog_id, mode, shingle_n, num_hashes
        )
    cbanded = _banded(csig, "_lk_id", bands, rows_per_band).withColumnRenamed(
        "_lk_id", "_c_id"
    )
    cgrams = catalog.select(
        F.col(catalog_id).alias("_c_id"),
        grams_of(F.col(catalog_col)).alias("_c_grams"),
    )

    matched = (
        sbanded.join(cbanded, ["band", "band_sig"])  # stream-static inner
        .join(cgrams, "_c_id")
        .withColumn(
            "similarity", F.round(jaccard(F.col("_s_grams"), F.col("_c_grams")), 6)
        )
        .filter(F.col("similarity") >= threshold)
        .select(
            F.col("_s_id").alias(stream_id),
            F.col("_s_ts").alias(ts_col),
            F.col("_c_id").alias(catalog_id),
            "similarity",
        )
        # one pair can collide in several bands -> duplicates within the
        # micro-batch; bounded-state dedup keyed by the pair
        .dropDuplicatesWithinWatermark([stream_id, catalog_id])
    )
    return matched
