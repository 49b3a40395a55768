"""Distributed BPE tokenizer training and encoding.

Word-level byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909;
the GPT-2 variant keeps the leading space inside the piece so no
end-of-word marker is needed).  The reference pipeline has no tokenizer
at all; a training-data engine needs one to budget, chunk, and pack by
REAL subword counts instead of the pre-token lower bound
(text.py:token_count_estimate).

Scale shape — the standard one for BPE at corpus scale:

* The part that touches all 100 TB is the WORD COUNT: one explode of the
  GPT-2 pre-token pieces (JVM regex, text.py:regex_tokens) into a
  map-side-combined hash aggregate whose output is bounded by the
  VOCABULARY (Heaps' law: ~10^6-10^7 distinct pieces for a web corpus),
  not the corpus.
* Merge learning then runs over that bounded count table on the driver —
  exactly how single-node BPE trainers (subword-nmt, HuggingFace
  tokenizers) operate; they are handed word counts, never raw text.  The
  driver working set is capped by ``max_words`` (top pieces by count,
  deterministic tie-break), and truncation error is tiny because pair
  counts are count-weighted and piece frequencies are Zipfian.
* Encoding is distributed again: JVM pre-tokenization, then an
  Arrow-batched pandas UDF applies the (tiny, broadcast) merge ranks per
  piece with a per-batch word-level memo — Zipf makes the cache hit rate
  extreme, so the per-row cost is a dict lookup, not a merge walk.

Characters (not bytes) are the base alphabet — a documented
simplification: the engine's corpora are decoded strings end-to-end, and
byte-level fallback only matters for tokenizing arbitrary binary, which
the multimodal column family handles separately.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .text import BPE_PRETOKEN_RE, regex_tokens

Merge = tuple[str, str]


def word_counts(
    corpus: DataFrame,
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_RE,
) -> DataFrame:
    """(word, n) for every distinct GPT-2 pre-token piece in the corpus —
    the distributed half of BPE training.  One narrow projection, one
    explode, one map-side-combined hash aggregate; the shuffle carries
    (piece, partial count) rows bounded by the vocabulary."""
    return (
        corpus.select(F.explode(regex_tokens(F.col(text_col), pattern)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(words: list[tuple[list[str], int]]) -> dict[Merge, int]:
    counts: dict[Merge, int] = {}
    for syms, n in words:
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
    return counts


def _merge_word(syms: list[str], pair: Merge) -> list[str]:
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(
    corpus: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 100_000,
    min_count: int = 1,
    pattern: str = BPE_PRETOKEN_RE,
    counts: DataFrame | None = None,
) -> list[Merge]:
    """Learn an ordered BPE merge list from the corpus.

    Distributed word count (``word_counts``, or a precomputed ``counts``
    frame to reuse one scan across trainings) -> driver-side merge loop
    over the top ``max_words`` pieces.  The collect is a
    TakeOrderedAndProject (count desc, word asc — fully deterministic,
    layout-independent), so driver memory is O(max_words), never corpus-
    or vocabulary-shaped.  Each round merges the (count-weighted) most
    frequent adjacent symbol pair; ties break to the lexicographically
    smallest pair, so equal corpora yield byte-identical merge tables on
    any cluster layout.  Stops early when no pair repeats (count < 2) —
    trailing singleton merges would be dataset noise, not structure.
    Driver cost is O(n_merges x total symbols), total symbols <=
    max_words x max piece length."""
    wc = counts if counts is not None else word_counts(corpus, text_col, pattern)
    top = (
        wc.filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return learn_from_counts({r["word"]: int(r["n"]) for r in top}, n_merges)


def learn_from_counts(word_freqs: dict[str, int], n_merges: int) -> list[Merge]:
    """The driver-side merge loop over a word-frequency table — exposed so
    it is property-testable without a SparkSession and reusable when the
    counts come from somewhere other than ``word_counts`` (a saved count
    table, a sketch, another engine).

    Incremental formulation (the Sennrich reference algorithm's index
    structure): pair counts and a pair->words inverted index are built
    once, each round pops the (count desc, pair asc) best pair from a
    lazy max-heap (stale entries — superseded counts — are skipped on
    pop; every count change pushes a fresh entry), and only the words
    that actually CONTAIN the merged pair are re-segmented, with exact
    count deltas applied to their old/new adjacent-pair multisets.  Cost
    is O(touched-word symbols + changed-pair log-heap) per merge instead
    of the naive O(all words) rescan — the difference between 100 and
    30k merges being feasible (measured in BASELINE.md: 16k merges over
    a 50k-word Zipf table in seconds, where the naive rescan
    extrapolates to hours).  Semantics are byte-identical to the naive
    loop: same (count desc, lexicographically-smallest) selection, same
    left-to-right non-overlapping merge, same stop when no pair repeats
    (tests/test_properties.py pins equivalence on randomized tables)."""
    import heapq

    words: list[tuple[list[str], int]] = [
        (list(w), n) for w, n in sorted(word_freqs.items())
    ]
    counts: dict[Merge, int] = {}
    index: dict[Merge, set[int]] = {}
    for wi, (syms, n) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + n
            index.setdefault(p, set()).add(wi)
    heap: list[tuple[int, Merge]] = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[Merge] = []
    while len(merges) < n_merges and heap:
        neg_c, pair = heapq.heappop(heap)
        cur = counts.get(pair, 0)
        if cur != -neg_c:
            continue  # stale entry — a fresh one is deeper in the heap
        if cur < 2:
            break  # the GLOBAL max no longer repeats — same stop as naive
        merges.append(pair)
        for wi in index.get(pair, ()):
            syms, n = words[wi]
            new_syms = _merge_word(syms, pair)
            if len(new_syms) == len(syms):
                continue
            old_p: dict[Merge, int] = {}
            for p in zip(syms, syms[1:]):
                old_p[p] = old_p.get(p, 0) + 1
            new_p: dict[Merge, int] = {}
            for p in zip(new_syms, new_syms[1:]):
                new_p[p] = new_p.get(p, 0) + 1
            words[wi] = (new_syms, n)
            for p in old_p.keys() | new_p.keys():
                delta = (new_p.get(p, 0) - old_p.get(p, 0)) * n
                if delta:
                    nc = counts.get(p, 0) + delta
                    if nc <= 0:
                        counts.pop(p, None)
                    else:
                        counts[p] = nc
                        heapq.heappush(heap, (-nc, p))
                if new_p.get(p, 0) > 0:
                    index.setdefault(p, set()).add(wi)
                elif old_p.get(p, 0) > 0 and p != pair:
                    s = index.get(p)
                    if s is not None:
                        s.discard(wi)
        counts.pop(pair, None)
        index.pop(pair, None)
    return merges


def encode_word(word: str, ranks: dict[Merge, int]) -> list[str]:
    """Apply learned merges to one piece, lowest-rank pair first — the
    canonical BPE encode loop (same order the trainer created them, so
    training-set words round-trip to their final training segmentation)."""
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[Merge],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    pattern: str = BPE_PRETOKEN_RE,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: JVM pre-token
    pieces -> Arrow-batched per-piece merge application with a word-level
    memo (Zipf: almost every piece in a batch repeats, so the amortized
    cost per token is a dict hit).  Map-only — no shuffle, no driver; the
    merge table (n_merges pairs) ships once in the UDF closure.
    Lossless: ``concat(bpe_tokens) == concat(pieces)`` by construction."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def enc(pieces: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_one(ps: list[str] | None) -> list[str]:
            if ps is None:
                return []
            out: list[str] = []
            for p in ps:
                hit = cache.get(p)
                if hit is None:
                    hit = cache[p] = encode_word(p, ranks)
                out.extend(hit)
            return out

        return pieces.apply(enc_one)

    return df.withColumn(out_col, enc(regex_tokens(F.col(text_col), pattern)))


def bpe_token_count(
    df: DataFrame,
    merges: list[Merge],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    pattern: str = BPE_PRETOKEN_RE,
) -> DataFrame:
    """Exact learned-tokenizer token count per row — the budget number
    chunking/packing should use once a tokenizer exists (upgrades the
    ``n_bpe_pieces`` lower bound).  Same map-only shape as
    :func:`bpe_encode` without materializing the token arrays."""
    enc = bpe_encode(df, merges, text_col, "_bpe_toks", pattern)
    return enc.withColumn(out_col, F.size("_bpe_toks").cast("long")).drop("_bpe_toks")


def vocab_from_merges(merges: list[Merge], base: set[str] | None = None) -> set[str]:
    """The subword vocabulary a merge list induces: every merged symbol
    plus (optionally) a base alphabet."""
    vocab = set(base or [])
    for a, b in merges:
        vocab.add(a + b)
    return vocab


def save_bpe(spark, merges: list[Merge], path: str) -> None:
    """Persist a learned merge table as a lake artifact: (rank, a, b)
    parquet rows — KBs for any real merge count.  Same nightly-train /
    continuously-encode deployment split as the LM artifact
    (lm.py:save_lm): one batch job learns and saves, every encode job
    loads the ranks instead of re-scanning the corpus."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[Merge]:
    """Load a saved merge table in rank order (the order IS the tokenizer
    — encode applies lowest rank first)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]


def chunk_documents_bpe(
    df: DataFrame,
    merges: list[Merge],
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    pattern: str = BPE_PRETOKEN_RE,
) -> DataFrame:
    """Token-window chunking budgeted in REAL learned-tokenizer tokens —
    the upgrade of ``training.chunk_documents`` once a tokenizer exists:
    whitespace-word windows over- or under-fill a model's context by the
    word/subword ratio (30-60% on web text), while these windows hold
    exactly ``chunk_tokens`` subwords.  Parameter order matches the
    whitespace twin's tail (text_col, id_col, sizes) so switching between
    them can't silently misbind positionals.

    Output matches the whitespace chunker's contract: (``id_col``,
    chunk_id, n_chunk_tokens, chunk_text); chunk k starts at subword
    ``k * (chunk_tokens - overlap_tokens)``; consecutive chunks share
    exactly ``overlap_tokens`` subwords.  Because BPE concatenation is
    LOSSLESS (``concat(tokens) == text``), dropping each chunk's first
    ``overlap_tokens`` subwords and concatenating reconstructs the
    document BYTE-EXACTLY — a stronger round-trip than the whitespace
    chunker's token-stream identity (tests assert it).

    Plan shape: the Arrow-batched encode (map-only, ranks broadcast in
    the closure) replaces the JVM split; the window ladder itself is the
    SHARED ``training.chunk_token_windows`` implementation — one set of
    boundary semantics for every token source."""
    from .training import chunk_token_windows

    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    encoded = bpe_encode(df, merges, text_col, "_bpe_toks", pattern)
    return chunk_token_windows(
        encoded.select(F.col(id_col), F.col("_bpe_toks")),
        id_col, chunk_tokens, overlap_tokens, separator="", tokens_col="_bpe_toks",
    )
