"""Blocked fuzzy join (record linkage): match rows across two tables by
string similarity WITHOUT an all-pairs comparison.

The naive fuzzy join — cross join + per-pair similarity — is
O(|left| x |right|) and unusable across two large tables.  The standard
scalable shape is blocking + verify, and the engine already has the
exact machinery: MinHash-LSH banding generates candidate pairs in
O(rows x bands) bucket joins, and exact set-Jaccard verifies only the
candidates (``dedup.minhash_pairs_between``).  This module is the
LINKAGE deployment of that pipeline: two different tables, a similarity
column each, best-match ranking per left row.

Two similarity modes:

- ``mode='char'`` (default) — character n-gram Jaccard over the
  normalized string (lower, trim, whitespace → ``_``).  The right
  granularity for entity strings: names, tickers, addresses, titles —
  "Jonh Smith" ~ "John Smith".  Implemented by rewriting each string as
  its space-joined char-shingle sequence and running the WORD pipeline
  with ``shingle_n=1`` (word 1-grams of the rewrite ARE the char
  n-grams), so the battle-tested LSH path is reused verbatim.
- ``mode='token'`` — word n-gram Jaccard, for document-length fields
  (same space as the dedup family).

Scale contract mirrors the dedup family: the LSH join is banded bucket
equality (never a product), verification touches only candidates, and a
persisted :func:`fuzzy_signatures` table for the big reference side
makes nightly linkage runs index-reuse instead of recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import char_ngrams


def _linkage_text(col: Column, mode: str, n: int) -> Column:
    """The string rewritten into the token space the LSH pipeline hashes:
    char mode = space-joined char n-grams of the normalized string (word
    1-grams of this ARE the char shingles); token mode = normalized
    as-is (the pipeline's own tokenizer applies)."""
    norm = F.trim(F.lower(col))
    if mode == "token":
        return norm
    return F.array_join(char_ngrams(F.regexp_replace(norm, r"\s+", "_"), n), " ")


def _guard_unique_id(proj: DataFrame, side: str, id_name: str) -> DataFrame:
    """Make the documented unique-id contract self-enforcing: a duplicate
    id on either side of a fuzzy join silently FANS OUT every match of
    that id through the rematch equi-joins — the classic quiet row
    explosion.  Same fail-fast-inside-the-plan convention as
    ``range_join``'s bucket-blowup guard: the check rides the id
    expression itself (so column pruning cannot elide it) and costs one
    window count over the 2-column (id, text) projection — a shuffle the
    signature aggregate immediately downstream pays on the same key
    anyway."""
    w = Window.partitionBy("_lk_id")
    guarded = F.when(
        F.count(F.lit(1)).over(w) > 1,
        F.raise_error(
            # id_name/side ride as %s ARGUMENTS, never spliced into the
            # format string — a '%' in a caller-supplied column name must
            # not garble the duplicate-id error being raised about it
            F.format_string(
                "fuzzy_join: duplicate %s %s on the %s side; "
                "ids must be unique per table (dedup or re-key first)",
                F.lit(id_name),
                F.col("_lk_id").cast("string"),
                F.lit(side),
            )
        ).cast(proj.schema["_lk_id"].dataType),
    ).otherwise(F.col("_lk_id"))
    return proj.select(guarded.alias("_lk_id"), "_lk_text")


def fuzzy_signatures(
    df: DataFrame,
    col: str,
    id_col: str,
    mode: str = "char",
    shingle_n: int = 3,
    num_hashes: int = 32,
    check_unique_ids: bool = True,
) -> DataFrame:
    """Persistable MinHash signature table for one side of a fuzzy join —
    build nightly for the big reference catalog and pass as
    ``right_sigs`` so linkage never re-hashes it.  Build parameters ride
    as ``minhash`` column METADATA (survives the parquet round trip —
    the same artifact-carries-its-params contract as
    ``dedup.substring_window_index``), and :func:`fuzzy_join` raises on
    a mismatched query instead of silently never colliding.

    ``check_unique_ids=False`` is the same big-corpus escape hatch
    :func:`fuzzy_join` documents — the nightly index build over a huge
    catalog is exactly where the guard's (id, text) shuffle is real
    money, and an index built from lake-minted-unique ids can skip it."""
    from .dedup import minhash_signatures

    eff_n = 1 if mode == "char" else shingle_n
    proj = df.select(
        F.col(id_col).alias("_lk_id"),
        _linkage_text(F.col(col), mode, shingle_n).alias("_lk_text"),
    )
    if check_unique_ids:
        proj = _guard_unique_id(proj, "signature-index", id_col)
    meta = {"mode": mode, "shingle_n": shingle_n, "num_hashes": num_hashes}
    return minhash_signatures(proj, "_lk_text", "_lk_id", num_hashes, eff_n).select(
        "_lk_id", F.col("minhash").alias("minhash", metadata=meta)
    )


def _check_sig_params(sigs: DataFrame, mode: str, shingle_n: int, num_hashes: int) -> None:
    """Fail fast when a persisted signature index was built with different
    parameters than the join queries it with — signatures would silently
    never band-collide and every match would evade."""
    field = next((f for f in sigs.schema.fields if f.name == "minhash"), None)
    if field is None:
        raise ValueError(f"right_sigs must have a minhash column, got {sigs.columns}")
    md = dict(field.metadata or {})
    expected = {"mode": mode, "shingle_n": shingle_n, "num_hashes": num_hashes}
    if not any(k in md for k in expected):
        import warnings

        warnings.warn(
            "right_sigs carries no build-parameter metadata (pre-contract "
            f"index?); cannot verify it matches {expected} — rebuild with "
            "fuzzy_signatures to enforce",
            stacklevel=3,
        )
        return
    got = {k: md.get(k) for k in expected}
    if got != expected:
        raise ValueError(
            f"right_sigs was built with {got} but the join queries with "
            f"{expected}; rebuild the index or match the parameters"
        )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    threshold: float = 0.4,
    top_k: int = 1,
    mode: str = "char",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    how: str = "inner",
    right_sigs: DataFrame | None = None,
    check_unique_ids: bool = True,
) -> DataFrame:
    """Match each left row to its ``top_k`` most-similar right rows with
    Jaccard >= ``threshold``.  Output: all left columns, the matched
    right columns, ``similarity`` (exact verified Jaccard, not the LSH
    estimate) and ``match_rank`` (1 = best; ties break on ascending
    right id, deterministic).  ``how='left'`` keeps matchless left rows
    with null match columns.

    Recall note (inherited from LSH): a qualifying pair is found only if
    it collides in >= 1 band; with ``bands=16`` of 2 rows each a pair at
    Jaccard j collides with probability 1-(1-j²)¹⁶ (≈ 0.99 at j = 0.5).
    Raise ``bands`` (up to ``num_hashes``) for recall, lower for cost —
    the dedup family's knob, same math.  ``left_id``/``right_id`` must
    be non-null and unique per table — uniqueness is ENFORCED in-plan
    by default (a duplicate id raises at execution rather than silently
    fanning out matches through the rematch joins); null or empty
    similarity strings produce no candidates (they surface only under
    ``how='left'``).

    Guard cost: the uniqueness check is one count-window over each
    side's (id, text) projection — a shuffle the signature aggregate
    downstream pays on the same key anyway for entity-string linkage,
    but a REAL extra full-text exchange for token-mode linkage over
    document-length fields.  ``check_unique_ids=False`` disables it for
    that path once uniqueness is enforced upstream (e.g. ids minted by
    the lake's content-hash identity); the contract itself still holds —
    it just stops being self-enforcing."""
    from .dedup import minhash_pairs_between

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if mode not in ("char", "token"):
        raise ValueError(f"mode must be 'char' or 'token', got {mode!r}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column collision {sorted(overlap)}; rename before joining"
        )
    if right_sigs is not None:
        _check_sig_params(right_sigs, mode, shingle_n, num_hashes)

    eff_n = 1 if mode == "char" else shingle_n
    lproj = left.select(
        F.col(left_id).alias("_lk_id"),
        _linkage_text(F.col(left_col), mode, shingle_n).alias("_lk_text"),
    )
    rproj = right.select(
        F.col(right_id).alias("_lk_id"),
        _linkage_text(F.col(right_col), mode, shingle_n).alias("_lk_text"),
    )
    if check_unique_ids:
        lproj = _guard_unique_id(lproj, "left", left_id)
        rproj = _guard_unique_id(rproj, "right", right_id)
    pairs = minhash_pairs_between(
        lproj,
        rproj,
        "_lk_text",
        "_lk_id",
        num_hashes=num_hashes,
        shingle_n=eff_n,
        bands=bands,
        threshold=threshold,
        corpus_sigs=right_sigs,
    )
    w = Window.partitionBy("id_new").orderBy(F.desc("jaccard"), F.asc("id_corpus"))
    ranked = (
        pairs.withColumn("match_rank", F.row_number().over(w))
        .filter(F.col("match_rank") <= top_k)
        .select(
            F.col("id_new").alias("_m_left"),
            F.col("id_corpus").alias("_m_right"),
            F.col("jaccard").alias("similarity"),
            "match_rank",
        )
    )
    matched = (
        left.join(ranked, left[left_id] == ranked["_m_left"])
        .join(right, ranked["_m_right"] == right[right_id])
        .drop("_m_left", "_m_right")
    )
    if how == "inner":
        return matched

    unmatched = left.join(
        ranked.select(F.col("_m_left").alias(left_id)).distinct(), left_id, "left_anti"
    ).select(
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right.columns],
        F.lit(None).cast("double").alias("similarity"),
        F.lit(None).cast("int").alias("match_rank"),
    )
    return matched.unionByName(unmatched)
