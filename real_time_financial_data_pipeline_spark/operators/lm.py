"""Count-based n-gram language model: train on a corpus, score documents
by perplexity — the CCNet/RefinedWeb-style quality filter (documents whose
LM perplexity is far above the corpus norm are boilerplate, gibberish, or
wrong-language and get filtered before training).

The reference pipeline has no text-quality stage; this extends the §2.13
training-data family.  Published recipe: CCNet (Wenzek et al., 2020)
filters Common Crawl by KenLM perplexity; here the model is an add-k
bigram LM trained ON the corpus itself with plain Spark aggregates, so the
whole train+score loop is expressible as DataFrame ops (and the DuckDB
oracle can re-derive it end-to-end in SQL).

Execution shape (100 TB posture):

* Training: the corpus explodes to (w1, w2) bigram pairs map-side only —
  tokenize, BOS/EOS-pad, zip-shifted arrays, explode.  The only shuffles
  are hash aggregates whose map-side-combined volume is bounded by the
  DISTINCT gram vocabulary per partition, never the corpus token count.
  Vocabulary selection is a ``TakeOrderedAndProject`` (orderBy+limit), not
  a global sort.
* OOV mapping is two BROADCAST joins against the ≤``vocab_size``-row
  vocab — the exploded corpus never shuffles to get mapped.
* Scoring: the same map-side explode, a broadcast (or shuffle, if the
  observed-bigram table outgrows the broadcast threshold) join against the
  model, then one partial-aggregated sum per document.

``train_bigram_lm`` runs one bounded driver action (``vocab.count()``,
≤ ``vocab_size`` rows) to fix the smoothing denominator — training is
semantically an action (it fits a model), unlike the lazy operators.
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .text import tokens

BOS, EOS, UNK = "<s>", "</s>", "<unk>"


class BigramLM(NamedTuple):
    """A fitted add-k bigram model: the vocab (``token``), per-context
    totals (``w1``, ``ctx_count``), observed bigram counts (``w1``, ``w2``,
    ``cnt``), the prediction-vocabulary size ``v_pred`` (vocab + UNK +
    EOS), and the smoothing constant."""

    vocab: DataFrame
    contexts: DataFrame
    bigrams: DataFrame
    v_pred: int
    add_k: float


def _raw_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1_raw, w2_raw) bigram occurrences of the BOS/EOS-padded
    whitespace token stream.  Map-only: arrays are built and zip-shifted
    with JVM higher-order functions, then exploded — no shuffle, no
    Python."""
    seq = F.concat(
        F.array(F.lit(BOS)), tokens(F.col(text_col)), F.array(F.lit(EOS))
    )
    pair = F.explode(
        F.arrays_zip(
            F.slice(seq, 1, F.size(seq) - 1).alias("w1_raw"),
            F.slice(seq, 2, F.size(seq) - 1).alias("w2_raw"),
        )
    )
    return df.select(F.col(id_col).alias("_doc"), pair.alias("p")).select(
        "_doc", F.col("p.w1_raw").alias("w1_raw"), F.col("p.w2_raw").alias("w2_raw")
    )


def _map_oov(pairs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map raw bigram sides into the model vocabulary (OOV -> UNK) via two
    broadcast joins; the padded sentinels map to themselves.  A literal
    document token equal to a sentinel maps to that sentinel — accepted
    collision, mirrored exactly by the oracle."""
    v1 = F.broadcast(vocab.select(F.col("token").alias("_v1")))
    v2 = F.broadcast(vocab.select(F.col("token").alias("_v2")))
    return (
        pairs.join(v1, pairs["w1_raw"] == v1["_v1"], "left")
        .join(v2, pairs["w2_raw"] == v2["_v2"], "left")
        .select(
            "_doc",
            F.when(F.col("w1_raw") == BOS, F.lit(BOS))
            .otherwise(F.coalesce(F.col("_v1"), F.lit(UNK)))
            .alias("w1"),
            F.when(F.col("w2_raw") == EOS, F.lit(EOS))
            .otherwise(F.coalesce(F.col("_v2"), F.lit(UNK)))
            .alias("w2"),
        )
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", vocab_size: int = 32768
) -> DataFrame:
    """Top-``vocab_size`` whitespace tokens by corpus frequency, ties
    broken by token ascending (deterministic).  One map-side-combined
    count aggregate (shuffle bounded by distinct tokens), then
    TakeOrderedAndProject — no global sort materialization."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .count()
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(vocab_size)
        .select("token")
    )


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 32768,
    add_k: float = 0.5,
) -> BigramLM:
    """Fit the add-k bigram model:
    ``P(w2|w1) = (c(w1,w2) + k) / (ctx(w1) + k * v_pred)`` where
    ``ctx(w1) = sum_w2 c(w1,w2)`` and ``v_pred = |vocab| + 2`` (UNK and
    EOS are predictable outcomes; BOS is context-only)."""
    # The model tables are vocab-bounded (vocab <= vocab_size rows, bigrams
    # <= observed grams over vocab^2) but their LINEAGE is a full corpus
    # aggregate — persist them so the mapping joins and every later scoring
    # query read the tiny cached tables instead of re-scanning the corpus
    # once per reuse.
    vocab = build_vocab(df, text_col, vocab_size).persist()
    mapped = _map_oov(_raw_pairs(df, text_col, id_col), vocab)
    bigrams = mapped.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt")).persist()
    contexts = bigrams.groupBy("w1").agg(F.sum("cnt").alias("ctx_count"))
    v_pred = vocab.count() + 2  # bounded driver action: <= vocab_size rows
    return BigramLM(vocab, contexts, bigrams, v_pred, add_k)


def perplexity(
    df: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document LM score: bigram count, total log-probability, and
    perplexity ``exp(-log_prob / n_bigrams)``.  Unseen (mapped) bigrams
    get the smoothed floor ``k / (ctx + k*v_pred)``; contexts unseen in
    training fall back to the uniform ``k / (k*v_pred)``.

    ``broadcast_model=True`` broadcasts the observed-bigram table (right
    for vocab-bounded models); set False when the model outgrows the
    broadcast threshold and let it shuffle-join on the gram key — the
    scored corpus side still never shuffles before its per-doc partial
    sum."""
    mapped = _map_oov(_raw_pairs(df, text_col, id_col), lm.vocab)
    big = lm.bigrams.select(
        F.col("w1").alias("_bw1"), F.col("w2").alias("_bw2"), F.col("cnt")
    )
    ctx = lm.contexts.select(F.col("w1").alias("_cw1"), F.col("ctx_count"))
    if broadcast_model:
        big, ctx = F.broadcast(big), F.broadcast(ctx)
    k = F.lit(lm.add_k)
    denom_v = F.lit(float(lm.v_pred))
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + k)
        / (F.coalesce(F.col("ctx_count"), F.lit(0)) + k * denom_v)
    )
    scored = (
        mapped.join(big, (mapped["w1"] == big["_bw1"]) & (mapped["w2"] == big["_bw2"]), "left")
        .join(ctx, mapped["w1"] == ctx["_cw1"], "left")
        .select("_doc", logp.alias("logp"))
    )
    return (
        scored.groupBy(F.col("_doc").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp").alias("log_prob"),
        )
        .withColumn("perplexity", F.exp(-F.col("log_prob") / F.col("n_bigrams")))
    )


class LocalBigramLM(NamedTuple):
    """A driver-materialized copy of a fitted model: plain dicts shipped to
    executors inside a pandas UDF closure.  Size contract: bounded by the
    OBSERVED bigram table (<= grams over vocab^2, in practice far less) —
    the right form when the model fits comfortably in executor memory and
    the scored side is a STREAM (no aggregate, no state)."""

    bigrams: dict[tuple[str, str], int]
    contexts: dict[str, int]
    vocab: frozenset[str]
    v_pred: int
    add_k: float


def collect_model(lm: BigramLM) -> LocalBigramLM:
    """Materialize a fitted :class:`BigramLM` on the driver (one bounded
    collect of the persisted model tables)."""
    bigrams = {(r["w1"], r["w2"]): r["cnt"] for r in lm.bigrams.collect()}
    contexts = {r["w1"]: r["ctx_count"] for r in lm.contexts.collect()}
    vocab = frozenset(r["token"] for r in lm.vocab.collect())
    return LocalBigramLM(bigrams, contexts, vocab, lm.v_pred, lm.add_k)


_SCORE_SCHEMA = StructType(
    [
        StructField("n_bigrams", LongType()),
        StructField("log_prob", DoubleType()),
        StructField("perplexity", DoubleType()),
    ]
)


def perplexity_local_expr(local: LocalBigramLM, text_col: str = "text"):
    """Column form of the per-row scorer: a struct<n_bigrams, log_prob,
    perplexity> computed in one Arrow-batched pandas UDF against the
    driver-collected model — a stateless map, no explode, no join, no
    aggregate, hence append-legal on a STREAM.  Python-side tokenization
    mirrors ``text.tokens`` (lower, split on a single space, drop
    empties)."""
    big, ctx, vocab = local.bigrams, local.contexts, local.vocab
    k, v_pred = local.add_k, float(local.v_pred)

    def score_batches(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # positional sentinel mapping, replicated from _map_oov: a raw
        # token equal to BOS maps to BOS in CONTEXT position (and EOS in
        # predicted position) — the distributed scorer's exact semantics,
        # including its literal-sentinel collision behavior
        def m1(w):  # context position
            return w if w == BOS else (w if w in vocab else UNK)

        def m2(w):  # predicted position
            return w if w == EOS else (w if w in vocab else UNK)

        for texts in it:
            rows = []
            for t in texts:
                toks = [w for w in (t or "").lower().split(" ") if w]
                raw = [BOS] + toks + [EOS]
                lp = 0.0
                n = len(raw) - 1
                for a, b in zip(raw, raw[1:]):
                    w1, w2 = m1(a), m2(b)
                    lp += math.log(
                        (big.get((w1, w2), 0) + k) / (ctx.get(w1, 0) + k * v_pred)
                    )
                rows.append((n, lp, math.exp(-lp / n)))
            yield pd.DataFrame(rows, columns=["n_bigrams", "log_prob", "perplexity"])

    scorer = F.pandas_udf(score_batches, returnType=_SCORE_SCHEMA)
    return scorer(F.col(text_col))


def perplexity_local(
    df: DataFrame,
    local: LocalBigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The per-row form of :func:`perplexity` (see
    :func:`perplexity_local_expr`) — equivalent to the distributed scorer
    up to float summation order (parity pinned by
    test_local_scorer_matches_distributed)."""
    return df.select(
        F.col(id_col), perplexity_local_expr(local, text_col).alias("_s")
    ).select(id_col, "_s.n_bigrams", "_s.log_prob", "_s.perplexity")


# --- interpolated trigram LM ---------------------------------------------


class TrigramLM(NamedTuple):
    """Jelinek-Mercer interpolated trigram model: per-order count tables
    (all vocab-bounded), the prediction-vocabulary size, the smoothing
    constant, the mixture weights, and the corpus token total."""

    vocab: DataFrame      # token
    uni: DataFrame        # w, cnt
    bi: DataFrame         # w1, w2, cnt
    bi_ctx: DataFrame     # w1, ctx_count
    tri: DataFrame        # w1, w2, w3, cnt
    tri_ctx: DataFrame    # w1, w2, ctx_count
    v_pred: int
    n_tokens: int
    add_k: float
    lambdas: tuple[float, float, float]


def _raw_triples(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1_raw, w2_raw, w3_raw) trigram occurrences of the
    doubly-BOS-padded token stream — map-only, like ``_raw_pairs``."""
    seq = F.concat(
        F.array(F.lit(BOS), F.lit(BOS)), tokens(F.col(text_col)), F.array(F.lit(EOS))
    )
    n = F.size(seq)
    trip = F.explode(
        F.arrays_zip(
            F.slice(seq, 1, n - 2).alias("w1_raw"),
            F.slice(seq, 2, n - 2).alias("w2_raw"),
            F.slice(seq, 3, n - 2).alias("w3_raw"),
        )
    )
    return df.select(F.col(id_col).alias("_doc"), trip.alias("p")).select(
        "_doc",
        F.col("p.w1_raw").alias("w1_raw"),
        F.col("p.w2_raw").alias("w2_raw"),
        F.col("p.w3_raw").alias("w3_raw"),
    )


def _map_oov3(triples: DataFrame, vocab: DataFrame) -> DataFrame:
    """OOV-map all three trigram positions via three broadcast joins;
    sentinels map to themselves (context positions may legitimately be
    BOS; only the predicted position may be EOS)."""
    vs = [
        F.broadcast(vocab.select(F.col("token").alias(f"_v{i}"))) for i in (1, 2, 3)
    ]
    out = triples
    for i, v in enumerate(vs, start=1):
        out = out.join(v, out[f"w{i}_raw"] == v[f"_v{i}"], "left")
    sent = lambda i, s: F.when(F.col(f"w{i}_raw") == s, F.lit(s))
    return out.select(
        "_doc",
        sent(1, BOS).otherwise(F.coalesce(F.col("_v1"), F.lit(UNK))).alias("w1"),
        sent(2, BOS).otherwise(F.coalesce(F.col("_v2"), F.lit(UNK))).alias("w2"),
        sent(3, EOS).otherwise(F.coalesce(F.col("_v3"), F.lit(UNK))).alias("w3"),
    )


def train_trigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 32768,
    add_k: float = 0.5,
    lambdas: tuple[float, float, float] = (0.1, 0.3, 0.6),
) -> TrigramLM:
    """Fit the interpolated trigram model:
    ``P(w3|w1,w2) = l3*P3 + l2*P2 + l1*P1`` where each order is add-k
    smoothed (``P3 = (c(w1,w2,w3)+k)/(ctx(w1,w2)+k*v_pred)`` etc.), so the
    mixture is strictly positive and needs no backoff logic.  ``lambdas``
    is (l1, l2, l3) and must sum to 1.

    Execution mirrors the bigram trainer: the corpus explodes map-side to
    triples, every count table is a map-side-combined aggregate whose
    shuffle is bounded by the observed gram vocabulary, and the tables
    persist (they are the model — reuse must not re-scan the corpus).
    Count tables are derived from ONE padded stream: unigrams/bigrams are
    marginals of the trigram occurrences over the predicted/last-two
    positions, so every order's denominator counts the same prediction
    events."""
    if abs(sum(lambdas) - 1.0) > 1e-9:
        raise ValueError(f"lambdas must sum to 1, got {lambdas}")
    vocab = build_vocab(df, text_col, vocab_size).persist()
    mapped = _map_oov3(_raw_triples(df, text_col, id_col), vocab)
    tri = (
        mapped.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("cnt")).persist()
    )
    tri_ctx = tri.groupBy("w1", "w2").agg(F.sum("cnt").alias("ctx_count")).persist()
    bi = tri.groupBy(F.col("w2").alias("w1"), F.col("w3").alias("w2")).agg(
        F.sum("cnt").alias("cnt")
    ).persist()
    bi_ctx = bi.groupBy("w1").agg(F.sum("cnt").alias("ctx_count")).persist()
    uni = tri.groupBy(F.col("w3").alias("w")).agg(F.sum("cnt").alias("cnt")).persist()
    v_pred = vocab.count() + 2
    n_tokens = uni.agg(F.sum("cnt")).collect()[0][0]  # = total prediction events
    return TrigramLM(
        vocab, uni, bi, bi_ctx, tri, tri_ctx, v_pred, int(n_tokens), add_k, lambdas
    )


def perplexity_trigram(
    df: DataFrame,
    lm: TrigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document perplexity under the interpolated trigram model —
    same output schema as :func:`perplexity` (n_bigrams is named
    ``n_grams`` here: one prediction event per token plus EOS).  Five
    broadcast joins against the persisted count tables; the scored corpus
    never shuffles before its per-doc partial sum."""
    mapped = _map_oov3(_raw_triples(df, text_col, id_col), lm.vocab)
    k = F.lit(lm.add_k)
    v = F.lit(float(lm.v_pred))
    l1, l2, l3 = (F.lit(x) for x in lm.lambdas)

    tri = lm.tri.select(
        F.col("w1").alias("_t1"), F.col("w2").alias("_t2"),
        F.col("w3").alias("_t3"), F.col("cnt").alias("_c3"),
    )
    tctx = lm.tri_ctx.select(
        F.col("w1").alias("_x1"), F.col("w2").alias("_x2"),
        F.col("ctx_count").alias("_x3c"),
    )
    bi = lm.bi.select(
        F.col("w1").alias("_b1"), F.col("w2").alias("_b2"), F.col("cnt").alias("_c2")
    )
    bctx = lm.bi_ctx.select(F.col("w1").alias("_y1"), F.col("ctx_count").alias("_y2c"))
    uni = lm.uni.select(F.col("w").alias("_u1"), F.col("cnt").alias("_c1"))
    if broadcast_model:
        tri, tctx, bi, bctx, uni = map(F.broadcast, (tri, tctx, bi, bctx, uni))

    j = (
        mapped.join(tri, (F.col("w1") == F.col("_t1")) & (F.col("w2") == F.col("_t2"))
                    & (F.col("w3") == F.col("_t3")), "left")
        .join(tctx, (F.col("w1") == F.col("_x1")) & (F.col("w2") == F.col("_x2")), "left")
        .join(bi, (F.col("w2") == F.col("_b1")) & (F.col("w3") == F.col("_b2")), "left")
        .join(bctx, F.col("w2") == F.col("_y1"), "left")
        .join(uni, F.col("w3") == F.col("_u1"), "left")
    )
    p3 = (F.coalesce(F.col("_c3"), F.lit(0)) + k) / (F.coalesce(F.col("_x3c"), F.lit(0)) + k * v)
    p2 = (F.coalesce(F.col("_c2"), F.lit(0)) + k) / (F.coalesce(F.col("_y2c"), F.lit(0)) + k * v)
    p1 = (F.coalesce(F.col("_c1"), F.lit(0)) + k) / (F.lit(float(lm.n_tokens)) + k * v)
    logp = F.log(l3 * p3 + l2 * p2 + l1 * p1)
    return (
        j.select("_doc", logp.alias("logp"))
        .groupBy(F.col("_doc").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("logp").alias("log_prob"))
        .withColumn("perplexity", F.exp(-F.col("log_prob") / F.col("n_grams")))
    )


def save_lm(lm: BigramLM, path: str) -> None:
    """Persist a fitted bigram model as a lake artifact: the two count
    tables as parquet (vocab-bounded — KBs to MBs), scalars as a JSON
    sidecar.  The nightly-train / continuously-score deployment: the
    batch job trains and saves, serving and streaming jobs load."""
    import json
    import os

    lm.vocab.write.mode("overwrite").parquet(os.path.join(path, "vocab"))
    lm.bigrams.write.mode("overwrite").parquet(os.path.join(path, "bigrams"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"v_pred": lm.v_pred, "add_k": lm.add_k}, f)


def load_lm(spark, path: str) -> BigramLM:
    """Load a saved model.  Contexts are re-derived from the bigram table
    (one aggregate over the vocab-bounded parquet — cheaper than storing
    a third table and can't drift from the bigrams)."""
    import json
    import os

    vocab = spark.read.parquet(os.path.join(path, "vocab"))
    bigrams = spark.read.parquet(os.path.join(path, "bigrams"))
    contexts = bigrams.groupBy("w1").agg(F.sum("cnt").alias("ctx_count"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return BigramLM(vocab, contexts, bigrams, meta["v_pred"], meta["add_k"])
