"""Text-analysis operators for large-scale training-data pipelines.

All hot-path computation uses Spark higher-order array functions
(transform/filter/aggregate) — JVM-side, whole-stage-codegen'd, no Python in
the loop — so a 100 TB documents table streams through narrow projections
with zero shuffles.

Operators: tokenization, token/quality stats, stopword ratio, n-gram
extraction, language-ID heuristic, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small fixed stopword list (quality scoring; not linguistic completeness).
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "as"]


def tokens(text: Column, lowercase: bool = True) -> Column:
    """Non-empty whitespace tokens as an array column."""
    base = F.lower(text) if lowercase else text
    return F.filter(F.split(base, " "), lambda x: x != F.lit(""))


# GPT-2-style pre-tokenization pattern (the published regex of the GPT-2
# BPE, reused by the r50k/p50k tiktoken families), in Java-regex form:
# contractions, optionally-space-prefixed letter runs / digit runs /
# punctuation runs, then whitespace (trailing-run lookahead keeps one
# space attached to the following word, as the original does).
BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)


def regex_tokens(text: Column, pattern: str = BPE_PRETOKEN_RE) -> Column:
    """BPE-ish pre-token pieces via ``regexp_extract_all`` — JVM-side and
    codegen'd, no Python in the loop.  Each piece is what a byte-pair
    encoder would then split into >= 1 subword, so the piece count is the
    standard cheap LOWER-BOUND estimator of a document's true BPE token
    count (the knob training pipelines budget sequences with when the real
    tokenizer is too expensive to run corpus-wide)."""
    return F.regexp_extract_all(text, F.lit(pattern), 0)


def token_count_estimate(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token-count estimators in one narrow projection:
    whitespace token count (``n_ws_tokens``) and GPT-2-style pre-token
    piece count (``n_bpe_pieces``, includes whitespace-run pieces exactly
    as the GPT-2 pre-tokenizer emits them).  Map-only — both counts are
    single-pass JVM regex/split work, no shuffle, no Python."""
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.size(regex_tokens(F.col(text_col))).cast("long").alias("n_bpe_pieces"),
    )


def _spread_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin the RAW (narrow) rows across the default parallelism —
    but only when the input actually has fewer partitions than cores.

    A single-file local scan arrives as 1 partition; without the spread,
    every map-side expression downstream runs on one core (r17 measured:
    tokenizing 2M docs on a 4-partition input was 2.5-3x the spread wall).
    At warehouse scale the scan already has thousands of partitions and the
    spread is skipped — repartitioning the full corpus "for parallelism"
    there would be a pure-overhead shuffle (guide §2.4).

    ``.rdd`` is illegal on a streaming frame (the lang/repetition gates run
    in-flight), so streams always spread: an intra-micro-batch round robin
    is append-legal and micro-batches are small by construction.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.isStreaming:
        return df.repartition(parallelism)
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df


def _staged_tokens(df: DataFrame, text_col: str, extra_cols: list[Column]) -> DataFrame:
    """(extra_cols..., _toks) with tokenization staged as a NAMED column.

    Every multi-metric text operator references the token array several
    times; interpreted higher-order eval re-computes a referenced subtree
    per use.  Staging ``_toks`` as its own projection keeps it evaluated
    once per row: CollapseProject's isCheap guard never inlines a
    non-cheap alias that the consumer references more than once (the same
    mechanism the r17 URL staging uses).  Until r17 the barrier was a
    repartition placed AFTER the tokenize projection — which serialized
    the expensive split/filter onto the narrow input's partitions (one
    core for a single-file scan) and shuffled the token ARRAYS (wider
    than the text).  Measured on 2M synthetic docs, local[32], noop sink,
    min of 3 warm: tokenize-then-repartition 8.56 s, repartition-raw-
    then-tokenize 2.99 s (0.35x), plan still evaluates split() once.
    """
    return _spread_narrow_input(df).select(
        *extra_cols, tokens(F.col(text_col)).alias("_toks")
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: token count, character count, average
    token length, stopword ratio — the quality-scoring primitives."""
    staged = _staged_tokens(
        df, text_col, [F.col("doc_id"), F.length(text_col).cast("long").alias("n_chars_text")]
    )
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    # long casts: DuckDB/ANSI length functions yield BIGINT — keep schemas
    # aligned.  try_divide: empty docs (0 tokens) -> null, never an ANSI abort.
    return staged.select(
        "doc_id",
        "n_chars_text",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(F.try_divide(total_len.cast("double"), n_tokens), 6).alias("avg_token_len"),
        F.round(F.try_divide(n_stop.cast("double"), n_tokens), 6).alias("stopword_ratio"),
    )


def quality_score_expr(toks: Column) -> Column:
    """The quality formula as a column expression over a token array —
    shared by the batch operator (which stages the array) and the streaming
    path (which can't stage: ``.rdd`` is illegal on a streaming frame)."""
    n_tokens = F.size(toks)
    avg_len = F.try_divide(
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast("double"), n_tokens
    )
    stop_ratio = F.try_divide(F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double"), n_tokens)
    score = (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_len >= 2.0) & (avg_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return F.round(score, 6)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + stopword presence +
    mean-token-length band.  Heuristic weights in the spirit of C4/Gopher
    text-quality filters; every term is a codegen'd expression."""
    staged = _staged_tokens(df, text_col, [F.col(c) for c in df.columns])
    return staged.withColumn("quality_score", quality_score_expr(F.col("_toks"))).drop("_toks")


def ngrams(toks: Column, n: int) -> Column:
    """Token n-grams via index transform — e.g. n=3 trigram strings.
    ``transform(sequence(0, size-n), i -> concat_ws(' ', t[i..i+n-1]))``.
    Empty array when the document has fewer than n tokens."""

    def make(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)])

    return F.when(F.size(toks) >= n, F.transform(F.sequence(F.lit(0), F.size(toks) - n), make)).otherwise(
        F.array().cast("array<string>")
    )


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-gram shingles (dedup/lang-id primitive)."""
    return F.when(
        F.length(text) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (n - 1)),
            lambda i: F.substr(text, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# Tiny per-language character/stopword profiles for the heuristic lang-id.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """N-gram/stopword-marker language-ID heuristic.

    Scores each candidate language by marker-token hits and takes the best
    (ties broken by language code order, so fully deterministic).  English
    wins on empty evidence.  This is a heuristic — tested for determinism
    and plumbing, not linguistic accuracy.  The trained upgrade is
    ``classifier.lang_id_trained`` (a K-class softmax over hashed
    n-grams, the fastText lid shape): it learns whatever languages a
    labeled sample contains instead of the hand-listed marker table, and
    its apply is the same zero-exchange map-only pass.
    """
    staged = _staged_tokens(df, text_col, [F.col(c) for c in df.columns])
    toks = F.col("_toks")
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda x: x.isin(*markers))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, markers in sorted(_LANG_MARKERS.items(), reverse=True)
    ]
    best = F.greatest(*scores)
    return staged.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("en")),
    ).drop("_toks")


def doc_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    out_col: str = "grams",
) -> DataFrame:
    """(id, token-n-gram array) with the tokenization staged BEHIND an
    exchange.  Interpreted higher-order eval re-computes any subtree a
    lambda references per element, so building grams directly over
    ``tokens(text)`` is quadratic-ish in tokens; the exchange materializes
    the token array first (and spreads CPU across cores for small files)."""
    staged = _staged_tokens(df, text_col, [F.col(id_col)])
    return staged.select(F.col(id_col), ngrams(F.col("_toks"), n).alias(out_col))


def gram_set(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """DISTINCT token n-grams of a corpus as one (gram) column — no id
    column required (unlike ``doc_grams``), so a benchmark/eval frame with
    ANY schema works as long as it has the text column.  Same staged-
    tokenization shape as ``doc_grams``."""
    staged = _staged_tokens(df, text_col, [])
    return (
        staged.select(F.explode(ngrams(F.col("_toks"), n)).alias("gram")).distinct()
    )


def term_counts(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """The FULL per-group term-count table ``(group, term, n)`` — the
    MERGEABLE stage of :func:`top_terms`: counts are associative, so
    slice tables fold with :func:`merge_term_counts` and the fold equals
    one pass over the union (a top-k table does not compose this way —
    merging top-ks is lossy).  explode(tokens) → one hash aggregate with
    map-side combine; tokenize + explode run in the SAME stage as the
    scan, and the only shuffle carries (group, term, partial count) —
    bounded by vocabulary, not corpus."""
    stopwords = STOPWORDS if stopwords is None else stopwords
    exploded = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return (
        exploded.filter(~F.col("term").isin(*stopwords) if stopwords else F.lit(True))
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_term_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two ``(group, term, n)`` count tables by summing — the
    nightly incremental step for any term_counts-derived profile.  One
    hash aggregate; addition is associative/commutative, so folding
    slices in any order equals counting the union once (test-pinned)."""
    group_col, term_col = a.columns[0], a.columns[1]
    return (
        a.unionByName(b)
        .groupBy(group_col, term_col)
        .agg(F.sum("n").alias("n"))
    )


def rank_top_terms(counts: DataFrame, k: int, group_col: str = "source") -> DataFrame:
    """Per-group top-k over a ``(group, term, n)`` count table — the
    SERVING stage of :func:`top_terms`.  The window runs on the
    vocabulary-bounded count table, never the corpus; count ties break
    on term order, so the k-set and ranks are deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(group_col, "term", F.col("n").cast("long").alias("n"), "rank")
    )


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 5,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-k most frequent terms per group (corpus vocabulary profiling):
    :func:`term_counts` (the mergeable count stage) ranked by
    :func:`rank_top_terms`.  The only corpus-sized work is the counting
    aggregate's map side; everything after is vocabulary-bounded — what
    makes this viable at 100 TB."""
    return rank_top_terms(
        term_counts(df, text_col, group_col, stopwords), k, group_col
    )


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    stopwords: list[str] | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the scikit-learn smoothing).

    Shuffle ledger: one corpus-sized hash aggregate builds the (doc, term,
    tf) table (map-side combine applies — repeated terms collapse in-map);
    document frequency is one MORE aggregate of that table, bounded by
    vocabulary; the idf join is on term, where AQE picks broadcast when the
    vocabulary fits and a shuffle join when it doesn't — both correct, and
    at 100 TB the vocabulary table is the small side either way.

    N (the corpus document count) must be a driver scalar because it enters
    the idf as a literal.  When ``n_docs`` is None it is computed here as
    ``df.select(id_col).distinct().count()`` — a full distinct+count job
    over the upstream lineage, NOT a cheap metadata read — so composed
    pipelines that already know N (or cached the corpus) should pass
    ``n_docs`` to skip the extra corpus-wide aggregate per call.
    Ranking breaks score ties on term order: the k-set is deterministic.
    """
    from pyspark.sql import Window

    stopwords = STOPWORDS if stopwords is None else stopwords
    if n_docs is None:
        n_docs = df.select(id_col).distinct().count()
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = (
        exploded.filter(~F.col("term").isin(*stopwords) if stopwords else F.lit(True))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    # 9-then-6 dp guard band (same as similarity.py): JVM Math.log and a SQL
    # oracle's ln can differ by ~1 ulp; snapping at 9 dp first makes the
    # 6-dp serving round agree across engines unless the true value sits
    # within 1e-9 of a boundary
    scored = tf.join(docfreq, "term").withColumn(
        "tf_idf", F.round(F.round(F.col("tf") * idf, 9), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tf_idf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "tf_idf", "rank")
    )


# --- repetition statistics (Gopher-style repetition filters) --------------
#
# Deepmind's Gopher paper (Rae et al. 2021, table A1) filters documents by
# repetition: fraction of duplicate lines, fraction of characters in
# duplicate lines, fraction of characters in the most common 2-/3-gram, and
# fraction of characters in duplicated longer n-grams.  The same family
# appears in RefinedWeb and Dolma.  The metrics below follow the common
# open reimplementation: character coverage is approximated as
# occurrences x gram-char-length (overlaps not de-duplicated), clamped to 1.


def _dup_adjacent_chars(sorted_arr: Column, extra_join_chars: int = 0) -> Column:
    """Characters in repeat occurrences (every occurrence after the first)
    of a SORTED string array, as one aggregate pass: equal elements are
    adjacent after the sort, so a single (prev, chars) accumulator counts
    them.  ``extra_join_chars`` is subtracted per element (the ``n-1``
    joiner spaces of a token n-gram, so only token characters count).

    The array expression is the aggregate TARGET, evaluated once per row —
    lambdas only touch the accumulator and element, which keeps interpreted
    higher-order eval linear (the re-evaluation trap ``_staged_tokens``
    documents)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("chars"),
    )
    return F.aggregate(
        sorted_arr,
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            (
                acc["chars"]
                + F.when(
                    x == acc["prev"],
                    (F.length(x) - F.lit(extra_join_chars)).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("chars"),
        ),
        lambda acc: acc["chars"],
    )


def _top_run_chars(sorted_arr: Column, extra_join_chars: int = 0) -> Column:
    """Characters covered by the MOST FREQUENT element of a sorted string
    array (count x element-char-length), again as one accumulator pass over
    runs of equal adjacent elements."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("bestg"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run2 = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(run2 > acc["best"], run2).otherwise(acc["best"]).alias("best"),
            F.when(run2 > acc["best"], x).otherwise(acc["bestg"]).alias("bestg"),
        )

    return F.aggregate(
        sorted_arr,
        zero,
        merge,
        # a gram occurring once is not repetition: require best >= 2 (keeps
        # short repetition-free documents at metric 0 instead of charging
        # them the length of their longest n-gram)
        lambda acc: F.when(
            acc["best"] >= F.lit(2),
            acc["best"] * (F.length(acc["bestg"]) - F.lit(extra_join_chars)).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _repetition_metric_cols(toks: Column, lines: Column) -> dict[str, Column]:
    """The five repetition metrics as expressions over staged token/line
    array ATTRIBUTES (callers must materialize both behind an exchange —
    see ``repetition_stats``).  Empty docs yield nulls via ``try_divide``."""
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
    )
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
    )

    def frac(num: Column, den: Column) -> Column:
        # explicit den > 0 guard (NOT try_divide + least: least SKIPS nulls,
        # which would turn an empty doc's null ratio into a hard 1.0)
        return F.when(
            den > 0, F.round(F.least(F.lit(1.0), num.cast("double") / den), 6)
        )

    return {
        "dup_line_frac": frac((n_lines - F.size(F.array_distinct(lines))), n_lines),
        "dup_line_char_frac": frac(_dup_adjacent_chars(F.array_sort(lines)), line_chars),
        "top_2gram_char_frac": frac(
            _top_run_chars(F.array_sort(ngrams(toks, 2)), extra_join_chars=1), tok_chars
        ),
        "top_3gram_char_frac": frac(
            _top_run_chars(F.array_sort(ngrams(toks, 3)), extra_join_chars=2), tok_chars
        ),
        "dup_5gram_char_frac": frac(
            _dup_adjacent_chars(F.array_sort(ngrams(toks, 5)), extra_join_chars=4),
            tok_chars,
        ),
    }


def _stage_toks_lines(df: DataFrame, text_col: str, keep: list[Column]) -> DataFrame:
    """(keep..., _toks, _lines) staged as named columns — same rationale
    (and the same r17 spread-before-tokenize fix) as ``_staged_tokens``,
    plus trimmed non-empty raw-case lines.  Multiply-referenced non-cheap
    aliases stay materialized via CollapseProject's isCheap guard; the
    spread shuffles the raw text, not the arrays, and is skipped when the
    batch input is already at least core-count partitions wide."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: strip_line(x)),
        lambda x: x != F.lit(""),
    )
    return _spread_narrow_input(df).select(
        *keep, tokens(F.col(text_col)).alias("_toks"), lines.alias("_lines")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics (Gopher table-A1 family):

    - ``dup_line_frac`` — fraction of (trimmed, non-empty) lines that are
      repeat occurrences of an earlier line;
    - ``dup_line_char_frac`` — fraction of line characters in those repeat
      occurrences;
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac`` — fraction of token
      characters covered by the most frequent token 2-/3-gram;
    - ``dup_5gram_char_frac`` — fraction of token characters in repeat
      occurrences of duplicated token 5-grams.

    Map-only and JVM-side: every metric is one ``array_sort`` + one
    single-pass ``aggregate`` over per-row arrays — no shuffle beyond the
    staging exchange, no Python, cost O(tokens log tokens) per document.
    Character coverage counts occurrences x gram length without overlap
    de-duplication (the standard open reimplementation), clamped to 1.
    The top-n-gram metrics require the gram to occur at least twice (a
    unique n-gram is not repetition — without this, every short document
    is charged the length of its longest n-gram).
    """
    staged = _stage_toks_lines(df, text_col, [F.col(id_col)])
    metrics = _repetition_metric_cols(F.col("_toks"), F.col("_lines"))
    return staged.select(
        F.col(id_col), *[c.alias(name) for name, c in metrics.items()]
    )


# Line/paragraph strip class, shared by the repetition metrics, paragraph
# dedup, and their DuckDB oracles.  An EXPLICIT char class, not \s: Java's
# \s includes \x0B where RE2's does not, so \s-based stripping would
# diverge between Spark and a RE2 oracle on vertical-tab-only lines.
# (F.trim strips only ASCII spaces — a '\r' from a CRLF line ending would
# count as a non-empty line, which is why trim() is not used here.)
LINE_STRIP_RE = "^[ \\t\\r\\f]+|[ \\t\\r\\f]+$"


def strip_line(c: Column) -> Column:
    """Strip spaces/tabs/CRs/form-feeds from both ends (CRLF-safe trim)."""
    return F.regexp_replace(c, LINE_STRIP_RE, "")


# Gopher table-A1 thresholds (2-/3-gram and duplicate-line/5-gram cuts).
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "dup_5gram_char_frac": 0.15,
}


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Drop documents exceeding any repetition threshold (defaults =
    ``REPETITION_THRESHOLDS``, the Gopher cuts).  Preserves the input
    schema; documents with no tokens/lines have null metrics and PASS here
    (the quality gate owns the degenerate-doc policy).  Same staged
    map-only shape as ``repetition_stats``."""
    thresholds = REPETITION_THRESHOLDS if thresholds is None else thresholds
    unknown = set(thresholds) - set(REPETITION_THRESHOLDS)
    if unknown:
        raise ValueError(f"unknown repetition metrics: {sorted(unknown)}")
    staged = _stage_toks_lines(df, text_col, [F.col(c) for c in df.columns])
    metrics = _repetition_metric_cols(F.col("_toks"), F.col("_lines"))
    keep = F.lit(True)
    for name, cut in thresholds.items():
        keep = keep & (F.coalesce(metrics[name], F.lit(0.0)) <= F.lit(float(cut)))
    return staged.filter(keep).drop("_toks", "_lines")


# --- PII scrubbing --------------------------------------------------------
#
# The standard pre-training privacy pass (BigScience ROOTS, Dolma): mask
# well-formed emails / IPv4s / phone-shaped digit runs with typed tokens.
# Pattern order matters: IPv4 is masked before phone so dotted digit runs
# resolve to the more specific type.  All patterns are Java-regex,
# evaluated JVM-side by regexp_replace/regexp_count — map-only, no Python.

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"(?<![\d.])(?:\d{1,3}\.){3}\d{1,3}(?![\d.])",
    "phone": r"(?<![\dA-Za-z])\+?\d{0,2}[ .\-]?\(?\d{3}\)?[ .\-]?\d{3}[ .\-]?\d{4}(?![\dA-Za-z])",
}


def pii_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII match counts (``n_email``, ``n_ipv4``, ``n_phone``)
    in one narrow projection — the audit view that decides whether a corpus
    needs the scrub pass at all."""
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS.items()
        ],
    )


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Mask PII matches with typed tokens (``<EMAIL>``, ``<IPV4>``,
    ``<PHONE>``), replacing ``text_col`` in place unless ``out_col`` is
    given.  ``kinds`` selects a subset; application always follows
    ``PII_PATTERNS`` order so email/IPv4 claim their matches before the
    looser phone pattern runs."""
    if kinds is None:
        kinds = list(PII_PATTERNS)
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    scrubbed = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        if kind in kinds:
            scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return df.withColumn(out_col or text_col, scrubbed)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """64-bit content fingerprint (xxhash64 of the normalized token stream) —
    the reference's filename-identity idea upgraded to content identity.
    Collision-safe enough for dedup candidate generation at 1e11 docs
    (~3e-4 expected collisions per 1e8 distinct under 64-bit hashing)."""
    normalized = F.concat_ws(" ", tokens(F.col(text_col)))
    return df.withColumn(out_col, F.xxhash64(normalized))


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
    lang_col: str | None = "lang",
    exact: bool = False,
) -> DataFrame:
    """Dataset-card profile per stratum: doc/token counts, token-length
    quantiles, mean quality score, and an exact-duplicate-rate estimate —
    the one-stop report a training-data release ships alongside the data.

    One FULL-WIDTH pass over the corpus: every numeric metric is a
    conditional/partial aggregate in the same map-side-combined groupBy,
    so the expensive work (tokenize, quality, hash) runs once and the
    shuffle carries only (stratum, partial-state) rows.  The duplicate-
    rate uses ``approx_count_distinct`` over the text hash (HLL++,
    default rsd 5% — mergeable, one-pass) rather than an exact distinct,
    which would shuffle the full text column; the exact-dedup operator
    exists for when precision matters (dedup.exact_dedup_keep_min).
    Quantiles are ``approx_percentile`` (mergeable sketch), same trade.
    The dominant language adds a SECOND scan, but over a two-column
    projection only (``strata_col``, ``lang_col`` — column pruning
    reaches the parquet reader, no tokenization): sketch partials can't
    be re-merged through the DataFrame API, so folding the lang argmax
    into the first aggregate would force the full-width work into both.
    A null stratum is a real group and is reported (null-safe join).

    ``exact=True`` is the oracle/precision twin (the engine's standard
    sketch-twin convention, cf. ``query.percentiles``): interpolated
    exact percentiles instead of the sketch, exact distinct instead of
    HLL — same plan shape, the distinct now shuffles the hash column.
    The default stays approximate because at 100 TB that is the
    one-pass mergeable form."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    base = df.select(
        F.col(strata_col),
        n_tok.alias("_n_tok"),
        quality_score_expr(toks).alias("_q"),
        F.xxhash64(F.col(text_col)).alias("_th"),
    )
    if exact:
        p50 = F.round(F.percentile("_n_tok", F.lit(0.5)), 6)
        p95 = F.round(F.percentile("_n_tok", F.lit(0.95)), 6)
        n_distinct = F.count_distinct("_th")
    else:
        p50 = F.percentile_approx("_n_tok", 0.5)
        p95 = F.percentile_approx("_n_tok", 0.95)
        n_distinct = F.approx_count_distinct("_th")
    per = base.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_tok").alias("n_tokens"),
        F.round(F.avg("_n_tok"), 6).alias("avg_tokens"),
        p50.alias("p50_tokens"),
        p95.alias("p95_tokens"),
        F.round(F.avg("_q"), 6).alias("mean_quality"),
        n_distinct.alias("_approx_distinct"),
    ).withColumn(
        "dup_rate_est",
        F.round(
            F.greatest(
                F.lit(0.0), 1 - F.col("_approx_distinct") / F.col("n_docs")
            ), 6,
        ),
    ).drop("_approx_distinct")
    if lang_col:
        # narrow two-column projection — pruning keeps the second scan cheap
        lang_counts = df.select(strata_col, lang_col).groupBy(
            strata_col, lang_col
        ).agg(F.count(F.lit(1)).alias("_n"))
        top_lang = (
            lang_counts.groupBy(strata_col)
            .agg(
                F.max_by(F.col(lang_col), F.struct(F.col("_n"), F.col(lang_col))).alias("top_lang"),
                F.max("_n").alias("_top_n"),
                F.sum("_n").alias("_tot"),
            )
            .select(
                F.col(strata_col).alias("_tl_stratum"),
                "top_lang",
                F.round(F.col("_top_n") / F.col("_tot"), 6).alias("top_lang_share"),
            )
        )
        # eqNullSafe: a null stratum is a real group — a plain equi-join
        # would silently drop its row from the report
        per = per.join(
            F.broadcast(top_lang),
            per[strata_col].eqNullSafe(top_lang["_tl_stratum"]),
        ).drop("_tl_stratum")
    return per


def corpus_report_drift(
    before: DataFrame,
    after: DataFrame,
    strata_col: str = "source",
) -> DataFrame:
    """Dataset drift between two :func:`corpus_report` outputs (e.g. two
    snapshots of a versioned corpus table): per stratum, the before/after
    doc and token counts with deltas, mean-quality and duplicate-rate
    shifts, and a flag for strata that appeared or vanished — the
    number-one thing a data-quality review wants to see between releases.

    Pure report-table math: both inputs are stratum-sized (rows =
    strata), the join is null-safe full-outer so a null stratum and
    appearing/vanishing strata all surface, and nothing here touches the
    corpus — run `corpus_report` once per snapshot (one scan each) and
    diff the results forever."""
    b = before.select(
        F.col(strata_col).alias("_ks"),
        F.col("n_docs").alias("n_docs_before"),
        F.col("n_tokens").alias("n_tokens_before"),
        F.col("mean_quality").alias("mean_quality_before"),
        F.col("dup_rate_est").alias("dup_rate_before"),
    )
    a = after.select(
        F.col(strata_col).alias("_ka"),
        F.col("n_docs").alias("n_docs_after"),
        F.col("n_tokens").alias("n_tokens_after"),
        F.col("mean_quality").alias("mean_quality_after"),
        F.col("dup_rate_est").alias("dup_rate_after"),
    )
    j = b.join(a, b["_ks"].eqNullSafe(a["_ka"]), "full_outer")
    return j.select(
        F.coalesce(F.col("_ks"), F.col("_ka")).alias(strata_col),
        "n_docs_before",
        "n_docs_after",
        (F.coalesce("n_docs_after", F.lit(0)) - F.coalesce("n_docs_before", F.lit(0))).alias("n_docs_delta"),
        "n_tokens_before",
        "n_tokens_after",
        (F.coalesce("n_tokens_after", F.lit(0)) - F.coalesce("n_tokens_before", F.lit(0))).alias("n_tokens_delta"),
        F.round(F.col("mean_quality_after") - F.col("mean_quality_before"), 6).alias("mean_quality_delta"),
        F.round(F.col("dup_rate_after") - F.col("dup_rate_before"), 6).alias("dup_rate_delta"),
        F.col("n_docs_before").isNull().alias("is_new_stratum"),
        F.col("n_docs_after").isNull().alias("is_vanished_stratum"),
    )
