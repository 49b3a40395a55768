"""Streaming training-set preparation: the stateless stages of
``operators.training.prepare_training_set`` lifted onto a document stream.

What streams and what doesn't:

- Quality gate, chunking, split assignment — pure projections/filters, so
  they run unchanged on an unbounded stream.
- Exact-dup suppression — content fingerprint (xxhash64 of the normalized
  token stream) + ``dropDuplicatesWithinWatermark``: state is bounded by the
  watermark horizon, the streaming answer to at-least-once re-delivery.
- MinHash NEAR-dup removal intentionally stays batch: banded candidate
  generation is a corpus-wide self-join with no bounded-state streaming
  form.  The lake pattern is stream-append chunks here, then run the batch
  ``curate_documents`` pass as the nightly compaction job over the landed
  corpus.  A given surviving document's split assignment is identical on
  either path, because the content-hash split is a pure function of
  (doc id, salt), not of which path computed it.

Survivor caveat (cross-id content duplicates): when the SAME text arrives
under DIFFERENT doc ids, the streaming dedup keeps the first-ARRIVING id
(``dropDuplicatesWithinWatermark`` has no min-id state), while the batch
path's ``exact_dedup_keep_min`` keeps the MIN id — so the surviving id, and
hence that content's hash-assigned split, can differ between the two paths.
Re-deliveries under the SAME id are unaffected (any survivor carries the
same id).  Deployments that need path-identical survivors run the nightly
batch compaction over the landed corpus keyed on content with a min-id
survivor BEFORE split assignment — which is exactly what
``curate_documents``'s ``exact_dedup_keep_min`` stage does, making the
compacted lake state canonical regardless of which ids the stream let
through (tests/test_streaming_training.py::test_stream_then_batch_compaction
asserts this end-state equivalence).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import quality_score_expr, tokens
from ..operators.training import assign_split, chunk_documents


def _stream_decontam_filter(
    benchmark: DataFrame, text_col: str, n: int
) -> Column:
    """Stream-legal decontamination predicate: True for documents sharing
    NO token ``n``-gram with the benchmark set.

    The batch operator's shape (explode -> join -> per-doc aggregate) is
    not append-mode legal on an unbounded stream, but its broadcast
    contract transfers: eval sets are tiny next to a training corpus, so
    the DISTINCT benchmark gram set is collected once at plan time and
    broadcast into a stateless Arrow-batched predicate — per-row, no
    state, no shuffle, same verbatim-n-token-run semantics as
    ``flag_contaminated`` (lowercased whitespace tokens, space-joined
    grams; parity asserted in tests/test_streaming_training.py).
    """
    from ..operators.text import gram_set

    # gram_set: no id column required of the benchmark frame (the batch
    # twin flag_contaminated uses the same helper)
    bench_rows = gram_set(benchmark, text_col, n).collect()
    bgrams = frozenset(r.gram for r in bench_rows)
    bc = benchmark.sparkSession.sparkContext.broadcast(bgrams)

    @F.pandas_udf("boolean")
    def _clean(texts: pd.Series) -> pd.Series:
        bench = bc.value
        out = []
        for t in texts:
            toks = [w for w in (t or "").lower().split(" ") if w]
            hit = any(
                " ".join(toks[i : i + n]) in bench
                for i in range(len(toks) - n + 1)
            )
            out.append(not hit)
        return pd.Series(out)

    return _clean(F.col(text_col))


def stream_training_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.7,
    dedup_watermark: str = "10 minutes",
    weights: dict[str, float] | None = None,
    salt: str = "",
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 8,
    scrub: bool = False,
    repetition_gate: bool = False,
    known_fingerprints: DataFrame | None = None,
    known_bloom=None,
    perplexity_model=None,
    max_perplexity: float | None = None,
    embeddings: DataFrame | None = None,
    benchmark_embeddings: DataFrame | None = None,
    semantic_decontam_threshold: float = 0.9,
    quality_model: DataFrame | None = None,
    quality_model_threshold: float = 0.5,
    langs: list[str] | None = None,
    lang_model: DataFrame | None = None,
    anchor_profile: DataFrame | None = None,
    url_col: str | None = None,
    anchor_broadcast: bool | None = None,
) -> DataFrame:
    """(optional) PII scrub -> quality gate -> (optional) repetition gate
    -> (optional) LM perplexity gate -> (optional) benchmark
    decontamination -> content-fingerprint dedup (watermark-bounded) ->
    chunk -> split, on a streaming documents frame.

    ``scrub`` masks emails/IPv4s/phones in-flight (``text.scrub_pii`` — a
    stateless JVM regexp projection, trivially append-legal) BEFORE any
    token-derived stage, so quality/fingerprint/chunks see the masked
    text, exactly as the batch path does.  ``repetition_gate`` applies the
    Gopher repetition filter in-flight — a stateless per-row filter whose
    staging repartition is an intra-micro-batch shuffle, also
    append-legal; thresholds match ``curate_documents(repetition_gate=
    True)``, so batch and stream drop the same documents.

    ``quality_model`` applies the trained quality gate
    (``classifier.quality_model_gate``) right after the heuristic one —
    the weights fold into literal expressions, so it is as
    streaming-legal as the heuristic gate and drops exactly the
    documents the batch ladder drops.

    ``langs`` (+ optional ``lang_model``, r16) applies the language gate
    in-flight with the batch ladder's exact semantics: the marker
    heuristic (``text.lang_id``) or, with a ``train_multiclass_hashed``
    weights table, the trained K-class softmax (``lang_id_trained``) —
    both are zero-exchange scoring projections, so both are
    append-legal; ``lang_model`` without ``langs`` fails fast like the
    batch knob.

    ``anchor_profile`` (+ ``url_col``, ``anchor_broadcast``; r16)
    mirrors the batch ladder's anchor-text feature: the per-domain
    profile is a STATIC frame joined on by registered domain
    (stream-static left join — stateless on the stream side,
    append-legal, re-read per micro-batch so a nightly-refreshed
    profile takes effect without restarting the query), and the TRAINED
    gates score text + anchor terms exactly as
    ``curate_documents(anchor_profile=)`` does.  Heuristic gates stay
    prose-only; NULL anchors are skipped, never a drop.

    Output schema matches ``prepare_training_set``:
    (``id_col``, chunk_id, n_chunk_tokens, chunk_text, split).

    Re-deliveries are dropped by CONTENT (fingerprint), not by id, so a
    producer that re-sends the same document under a fresh id still
    contributes one copy.  The dedup clock is processing time
    (``current_timestamp`` at micro-batch evaluation): documents carry no
    event time, and re-delivery windows are an ingest-side phenomenon.

    ``benchmark`` (a STATIC frame) drops contaminated documents in-flight
    via a broadcast stateless predicate — see ``_stream_decontam_filter``.
    The benchmark gram set is frozen at stream start; a refreshed eval set
    means restarting the query (and the nightly batch compaction re-runs
    full decontamination anyway).

    ``known_fingerprints`` (a STATIC frame with a ``fingerprint`` column —
    e.g. ``text.fingerprint`` over the landed lake corpus) drops documents
    whose content ALREADY EXISTS in the lake, in-flight, via a
    stream-static left-anti join on the content fingerprint — append-legal
    and stateless on the stream side, and unlike the watermark dedup it
    has no time bound: content ingested last month still dedups.  The
    static side is re-read per micro-batch, so a nightly-refreshed
    fingerprint table takes effect without restarting the stream.  Exact
    content only; near-dups against history remain the nightly batch
    compaction's job.  ``known_bloom`` (an ``operators.bloom.LocalBloom``
    built nightly over the same index, r11) accelerates that join at
    lake scale: rows the Bloom calls definitely-new skip the anti-join
    entirely (map-side test, no shuffle) and only the 'maybe' fraction
    pays the exact join — output identical (false positives are verified
    away, never dropped; see ``bloom.anti_join_known``).  The Bloom is
    frozen at stream start (it rides the plan), so content landed SINCE
    the build relies on the per-batch-read fingerprint table — exactly
    the staleness split a nightly build implies.

    ``perplexity_model`` (a :class:`~..operators.lm.LocalBigramLM`, the
    driver-collected form of a batch-fitted model) + ``max_perplexity``
    apply the CCNet-style LM quality gate in-flight: the per-row scorer
    (``lm.perplexity_local``) is a stateless Arrow-batched map, so it is
    append-legal where the batch path's explode+join+aggregate scorer is
    not.  Scores are identical between the two forms (parity pinned in
    tests/test_lm.py), so batch and stream drop the same documents; the
    model is frozen at stream start like the benchmark gram set.

    ``benchmark_embeddings`` + ``embeddings`` (both STATIC; r11) apply
    SEMANTIC benchmark decontamination in-flight — the paraphrase-proof
    complement of the n-gram gate, mirroring the batch composition's
    ``prepare_training_set(benchmark_embeddings=)``: the flagged id set
    is computed on the STATIC embeddings table
    (``similarity.semantic_contamination`` — benchmark matrix broadcast,
    one map-only scan) and the stream left-anti joins it — stream-static,
    stateless on the stream side, append-legal, and re-read per
    micro-batch so a nightly-refreshed embeddings table takes effect
    without restarting the query.  Documents without an embedding row
    pass unexamined (the batch stage's same best-effort caveat).
    """
    if scrub:
        from ..operators.text import scrub_pii

        docs = scrub_pii(docs, text_col)
    toks = tokens(F.col(text_col))
    gated = docs.filter(quality_score_expr(toks) >= F.lit(min_quality))
    # anchor join + gate text: identical composition (and guards) to
    # curate_documents — the trained gates score text + anchor terms,
    # the heuristic gates stay on the page's own prose
    gate_text = text_col
    if anchor_profile is not None:
        if url_col is None:
            raise ValueError(
                "anchor_profile requires url_col — anchor terms join by "
                "the document's registered domain"
            )
        if quality_model is None and lang_model is None:
            raise ValueError(
                "anchor_profile without a trained gate (quality_model or "
                "lang_model+langs) gates nothing — only the trained "
                "classifiers score text + anchor terms; the heuristic "
                "gates stay on the page's own prose"
            )
        from ..operators.crawl_graph import with_anchor_terms

        gated = with_anchor_terms(
            gated, anchor_profile, url_col,
            out_col="_kc_anchor", broadcast=anchor_broadcast,
        )
        gated = gated.withColumn(
            "_kc_gate_text",
            F.concat_ws(" ", F.col(text_col), F.col("_kc_anchor")),
        )
        gate_text = "_kc_gate_text"
    elif anchor_broadcast is not None:
        raise ValueError(
            "anchor_broadcast without anchor_profile gates nothing — pass "
            "the profile table too"
        )
    if quality_model is not None:
        # the trained gate is literal-folded expressions only (no staging,
        # no join), so it composes onto the stream exactly like the
        # heuristic one and drops the same documents as the batch ladder
        from ..operators.classifier import quality_model_gate

        gated = quality_model_gate(gated, quality_model, gate_text, quality_model_threshold)
    if langs is not None:
        if lang_model is not None:
            from ..operators.classifier import lang_id_trained

            gated = lang_id_trained(gated, lang_model, gate_text)
        else:
            from ..operators.text import lang_id

            gated = lang_id(gated, text_col)
        gated = gated.filter(F.col("lang_pred").isin(langs)).drop("lang_pred")
    elif lang_model is not None:
        raise ValueError(
            "lang_model without langs gates nothing — pass the language "
            "codes to keep"
        )
    if anchor_profile is not None:
        gated = gated.drop("_kc_anchor", "_kc_gate_text")
    if repetition_gate:
        from ..operators.text import repetition_filter

        gated = repetition_filter(gated, text_col)
    if perplexity_model is not None and max_perplexity is not None:
        from ..operators.lm import perplexity_local_expr

        gated = gated.filter(
            perplexity_local_expr(perplexity_model, text_col)["perplexity"]
            <= F.lit(max_perplexity)
        )
    if benchmark is not None:
        gated = gated.filter(
            _stream_decontam_filter(benchmark, text_col, decontam_ngram)
        )
    if benchmark_embeddings is not None:
        if embeddings is None:
            raise ValueError(
                "benchmark_embeddings requires embeddings= (a STATIC corpus "
                "vector table keyed by the doc id)"
            )
        from ..operators.similarity import semantic_contamination

        contaminated = (
            semantic_contamination(
                embeddings.select(
                    F.col("vec_id").alias(id_col), F.col("embedding").alias("_vec")
                ),
                benchmark_embeddings.select(F.col("embedding").alias("_vec")),
                semantic_decontam_threshold,
                id_col=id_col,
                vec_col="_vec",
            )
            .filter(F.col("is_contaminated"))
            .select(id_col)
        )
        gated = gated.join(contaminated, id_col, "left_anti")
    fingerprinted = gated.withColumn(
        "_fp", F.xxhash64(F.concat_ws(" ", toks))
    ).withColumn("_ingest_ts", F.current_timestamp())
    if known_fingerprints is not None:
        from ..operators.bloom import anti_join_known

        fingerprinted = anti_join_known(
            fingerprinted,
            known_fingerprints.select(F.col("fingerprint").alias("_fp")),
            "_fp",
            bloom=known_bloom,
        )
    deduped = fingerprinted.withWatermark(
        "_ingest_ts", dedup_watermark
    ).dropDuplicatesWithinWatermark(["_fp"])
    chunks = chunk_documents(
        deduped, text_col, id_col, chunk_tokens, overlap_tokens
    )
    return assign_split(chunks, id_col, weights, salt)
