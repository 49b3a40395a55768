"""Model-based quality filtering: a trained linear classifier over cheap
text features, applied as one shuffle-free codegen'd scoring pass.

This is the CCNet/DCLM/FineWeb-Edu pattern: hand-written quality
heuristics are distilled into (or replaced by) a small trained model —
fastText in the papers, logistic regression here — trained on weak labels
("looks like the gold reference corpus" vs "doesn't") and then run over
the WHOLE crawl.  At 100 TB the economics are all in the apply path, so
the split is deliberate:

- **train** is distributed (``pyspark.ml`` LogisticRegression — JVM LBFGS
  over ``treeAggregate`` gradients) but runs on the weakly-labeled sample,
  which is orders of magnitude smaller than the corpus;
- **apply** collects the learned weights (a ~6-row table) to the driver
  and folds them into ONE literal expression — ``sigmoid(b + Σ wᵢ·fᵢ)``
  with every feature fᵢ a built-in-function column over the raw text.
  No join, no shuffle, no Python: the 100 TB scoring pass is a narrow
  whole-stage-codegen'd projection, exactly like the heuristic
  ``text.quality_score`` gate it upgrades.

Features are deliberately limited to expressions with exact DuckDB
equivalents (integer token/char counts and their ratios — no
transcendentals), so the entire scoring pass is replayable bit-for-bit
by the ``quality_classifier_docs`` oracle: the logit is a fixed-order
chain of IEEE-exact multiplies/adds over identically-derived doubles.

Reference parity: the reference app (a Pandas/FastAPI CRUD service) has
no ML surface — this module is part of the beyond-reference
training-data-pipeline layer alongside ``operators/dedup.py`` and
``operators/training.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, tokens

#: Canonical feature order.  The order is part of the model contract: the
#: logit is evaluated as ``bias + w₀·f₀ + w₁·f₁ + …`` LEFT-ASSOCIATIVELY in
#: this order (floating-point addition is not associative, and the DuckDB
#: oracle replays the same textual order to stay bit-identical).
QUALITY_FEATURES = (
    "n_tokens",
    "avg_token_len",
    "stopword_ratio",
    "digit_ratio",
    "special_char_ratio",
)

#: Feature name reserved for the intercept row of a weights table.
BIAS_FEATURE = "__bias__"

#: Dense K x n_buckets float64 ceiling for :func:`train_multiclass_hashed`
#: — the trainer keeps the whole weight matrix on the driver, so cap it at
#: ~1.6 GiB (fastText's 2M x 100 shape), the docstring's honest ceiling.
#: The APPLY path has no such cap (broadcast kernel streams the matrix).
TRAIN_DENSE_CAP = 200_000_000

# Explicit whitespace class — Java's \s and RE2's \s disagree on \x0b, so
# both engines get the same spelled-out class.
_WS = " \\t\\n\\r\\f"


def _fresh_name(df: DataFrame, base: str) -> str:
    """A scratch column name guaranteed absent from ``df``'s schema, so
    internal ``withColumn``+``drop`` staging can never overwrite (and
    then silently destroy) a caller column that happens to share the
    conventional ``_mc*`` spelling."""
    existing = set(df.columns)
    name, i = base, 0
    while name in existing:
        i += 1
        name = f"{base}_{i}"
    return name


def quality_feature_exprs(text: Column) -> dict[str, Column]:
    """The feature columns as pure expressions over a text column.

    Every feature is built-ins only (split/filter/aggregate/regexp) —
    JVM-side, codegen'd, and legal on a STREAMING frame (nothing here
    stages through ``.rdd``).  Each is ``coalesce``d to 0.0 so null/empty
    documents score as "all features zero" (logit = bias) instead of
    poisoning the logit with nulls.

    The token array is referenced by three features and therefore
    tokenized three times inside the one projection (interpreted
    higher-order eval re-computes referenced subtrees).  That 3× map-side
    cost is the price of staying shuffle-free; the batch ``featurize``
    helper stages the array behind an exchange instead when a shuffle is
    acceptable (training-sample scale).

    NULL text reads as the empty string BEFORE any feature — without the
    coalesce, ``size(split(NULL))`` is -1 under Spark's non-ANSI default
    (legacy sizeOfNull), which turns n_tokens=-1 and stopword_ratio=1.0
    into silent garbage instead of the all-zero row.
    """
    text = F.coalesce(text, F.lit(""))

    def over_tokens(toks: Column) -> dict[str, Column]:
        n = F.size(toks)
        total_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
        n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
        return {
            "n_tokens": n.cast("double"),
            "avg_token_len": F.try_divide(total_len.cast("double"), n),
            "stopword_ratio": F.try_divide(n_stop.cast("double"), n),
        }

    tok_feats = over_tokens(tokens(text))
    n_chars = F.length(text)
    digit_chars = F.length(F.regexp_replace(text, "[^0-9]", ""))
    special_chars = F.length(F.regexp_replace(text, f"[A-Za-z0-9{_WS}]", ""))
    raw = {
        **tok_feats,
        "digit_ratio": F.try_divide(digit_chars.cast("double"), n_chars),
        "special_char_ratio": F.try_divide(special_chars.cast("double"), n_chars),
    }
    return {name: F.coalesce(raw[name], F.lit(0.0)) for name in QUALITY_FEATURES}


def featurize(
    df: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """``keep`` columns + the :data:`QUALITY_FEATURES` columns, with the
    token array staged behind an exchange (see ``text._staged_tokens``) so
    the three token-derived features tokenize once.  Batch-only (the
    staging repartition is illegal on streaming frames) — the apply path
    uses :func:`quality_feature_exprs` directly and never calls this."""
    from .text import _staged_tokens

    # NULL text ≡ empty string (same rule as quality_feature_exprs)
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    keep_cols = [F.col(c) for c in (keep if keep is not None else df.columns)]
    staged = _staged_tokens(df, text_col, keep_cols + [F.col(text_col).alias("_qc_text")])
    toks = F.col("_toks")
    n = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    text = F.col("_qc_text")
    n_chars = F.length(text)
    feats = {
        "n_tokens": n.cast("double"),
        "avg_token_len": F.try_divide(total_len.cast("double"), n),
        "stopword_ratio": F.try_divide(n_stop.cast("double"), n),
        "digit_ratio": F.try_divide(
            F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double"), n_chars
        ),
        "special_char_ratio": F.try_divide(
            F.length(F.regexp_replace(text, f"[A-Za-z0-9{_WS}]", "")).cast("double"),
            n_chars,
        ),
    }
    out = [F.col(c) for c in (keep if keep is not None else df.columns)]
    out += [F.coalesce(feats[name], F.lit(0.0)).alias(name) for name in QUALITY_FEATURES]
    return staged.select(*out)


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 100,
    reg_param: float = 0.01,
    elastic_net_param: float = 0.0,
    weight_col: str | None = None,
    balance_classes: bool = False,
) -> DataFrame:
    """Fit the quality model; return its weights as a 6-row DataFrame
    ``(idx int, feature string, weight double)`` with the intercept at
    ``idx = -1, feature = '__bias__'``.

    ``pyspark.ml`` LogisticRegression with ``standardization=True``: the
    optimizer works in standardized feature space (the raw features span
    0‥1 ratios AND unbounded token counts, so conditioning matters) but
    Spark ML folds the scaling back out, so the returned coefficients
    apply to RAW features — :func:`apply_quality_classifier` needs no
    mean/std sidecar.  The default ``reg_param=0.01`` keeps weights
    finite when the weak labels are (nearly) linearly separable, the
    normal case when they were derived by thresholding a heuristic.

    Weak-label corpora are usually heavily IMBALANCED (a crawl is mostly
    junk, the gold reference is tiny).  Two knobs, mutually exclusive:
    ``weight_col`` names an existing per-row weight column (forwarded to
    the optimizer's weighted log-loss), and ``balance_classes=True``
    derives inverse-class-frequency weights in one aggregate —
    ``n/(2·n_class)``, so each CLASS contributes equally to the loss no
    matter how lopsided the row counts — the standard fastText/sklearn
    'balanced' mode.  Both only reweight the train loss; apply is
    untouched.

    The weights table is ordinary data: persist it with
    ``weights.write.parquet(...)`` next to the other lake artifacts (the
    BPE merge table pattern) and reload for apply.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if weight_col is not None and balance_classes:
        raise ValueError("pass weight_col OR balance_classes, not both")
    keep = ["_qc_label"] + (["_qc_weight"] if weight_col is not None else [])
    cols = [F.col(label_col).cast("double").alias("_qc_label"), F.col(text_col)]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("_qc_weight"))
    feats = featurize(df.select(*cols), text_col, keep=keep)
    if balance_classes:
        # one tiny aggregate (2 rows) -> literal CASE weights; n/(2*n_c)
        # keeps the TOTAL loss weight equal to the row count, so reg_param
        # means the same thing as in the unweighted fit
        counts = {r["_qc_label"]: r["n"] for r in feats.groupBy("_qc_label").agg(F.count("*").alias("n")).collect()}
        missing = {0.0, 1.0} - set(counts)
        if missing:
            raise ValueError(f"balance_classes needs both classes present, missing {sorted(missing)}")
        n = sum(counts.values())
        feats = feats.withColumn(
            "_qc_weight",
            F.when(F.col("_qc_label") == 1.0, F.lit(n / (2.0 * counts[1.0])))
            .otherwise(F.lit(n / (2.0 * counts[0.0]))),
        )
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="_qc_vec"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="_qc_vec",
        labelCol="_qc_label",
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
        standardization=True,
        family="binomial",
    )
    if weight_col is not None or balance_classes:
        lr = lr.setWeightCol("_qc_weight")
    model = lr.fit(assembled)
    rows = [(-1, BIAS_FEATURE, float(model.intercept))] + [
        (i, name, float(w))
        for i, (name, w) in enumerate(zip(QUALITY_FEATURES, model.coefficients))
    ]
    return df.sparkSession.createDataFrame(rows, "idx int, feature string, weight double")


def _collect_weights(weights: DataFrame) -> tuple[float, list[tuple[str, float]]]:
    """(bias, [(feature, weight)] in contract order) from a weights table.

    Tiny by construction (#features + 1 rows), so collecting is the
    broadcast-by-construction pattern.  Order comes from ``idx`` when
    present, else from :data:`QUALITY_FEATURES`; unknown feature names
    raise rather than silently scoring garbage.
    """
    cols = set(weights.columns)
    if not {"feature", "weight"} <= cols:
        raise ValueError(f"weights table needs (feature, weight) columns, got {sorted(cols)}")
    rows = weights.collect()
    by_feat: dict[str, tuple[int, float]] = {}
    for r in rows:
        idx = r["idx"] if "idx" in cols and r["idx"] is not None else None
        if idx is None:
            idx = -1 if r["feature"] == BIAS_FEATURE else QUALITY_FEATURES.index(r["feature"]) if r["feature"] in QUALITY_FEATURES else None
        by_feat[r["feature"]] = (idx if idx is not None else 10**9, float(r["weight"]))
    bias = by_feat.pop(BIAS_FEATURE, (-1, 0.0))[1]
    unknown = set(by_feat) - set(QUALITY_FEATURES)
    if unknown:
        raise ValueError(
            f"unknown quality features {sorted(unknown)} — this model was not "
            f"trained against QUALITY_FEATURES {list(QUALITY_FEATURES)}"
        )
    ordered = sorted(by_feat.items(), key=lambda kv: kv[1][0])
    return bias, [(name, w) for name, (_, w) in ordered]


def apply_quality_classifier(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    logit_col: str = "quality_logit",
    prob_col: str = "quality_prob",
    keep_col: str = "quality_keep",
) -> DataFrame:
    """Score every document with the trained model: appends the raw logit,
    the sigmoid probability, and a boolean keep decision at ``threshold``.

    The weights fold into ONE literal projection — ``bias + Σ wᵢ·fᵢ`` in
    contract order over :func:`quality_feature_exprs` — so the plan is a
    shuffle-free narrow map over the corpus scan (the property the
    ``no-Exchange`` test pins).  The keep test compares the LOGIT against
    ``ln(t/(1-t))`` (0.0 at the default 0.5) instead of the probability
    against ``t``: the logit is a fixed-order chain of exact IEEE ops the
    DuckDB oracle reproduces bitwise, while ``exp`` is libm-dependent —
    so the decision boundary, not just the score, is oracle-checkable.
    Streaming-safe: expressions only, no staging.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    bias, ordered = _collect_weights(weights)
    exprs = quality_feature_exprs(F.col(text_col))
    logit: Column = F.lit(bias)
    for name, w in ordered:
        logit = logit + F.lit(w) * exprs[name]
    logit_threshold = math.log(threshold / (1.0 - threshold))
    out = df.withColumn(logit_col, logit)
    out = out.withColumn(
        prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(logit_col)))
    )
    return out.withColumn(keep_col, F.col(logit_col) >= F.lit(logit_threshold))


def threshold_report(
    scored: DataFrame,
    label_col: str = "label",
    prob_col: str = "quality_prob",
    n_bins: int = 100,
) -> DataFrame:
    """Precision/recall/F1 at every candidate threshold, in ONE corpus
    pass — how a production filter threshold actually gets chosen ("keep
    the most data at ≥95% precision against the held-out labels").

    The corpus-sized work is a single map + one hash aggregate onto
    ``n_bins`` rows (scores bucketed by ``floor(prob·n_bins)``); the
    cumulative TP/FP sweep then runs as an unbounded-preceding window
    ordered by bin DESCENDING over those n_bins rows — predictions at
    threshold t are exactly the rows in bins ≥ t·n_bins, so suffix sums
    give every threshold's confusion counts at once.  At 100 TB the plan
    is scan -> partial agg -> n_bins-row exchange -> window over n_bins
    rows: the window never sees the corpus.

    Thresholds are the bin LOWER edges (bin/n_bins); precision is null
    when a threshold keeps nothing.  Output, one row per non-empty-suffix
    bin: (threshold, tp, fp, fn, precision, recall, f1, kept_frac).

    Rows with a NULL label are EXCLUDED before counting: a partially
    labeled held-out set must not have its unlabeled rows silently
    counted as negatives (which would inflate fp and deflate precision /
    kept_frac).  Counts therefore describe the labeled subset only.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    label = F.col(label_col).cast("double")
    bucket = F.least(
        F.floor(F.col(prob_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    per_bin = (
        scored.filter(label.isNotNull())
        .select(
            bucket.alias("bin"),
            F.when(label == 1.0, F.lit(1)).otherwise(F.lit(0)).alias("is_pos"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_pos").cast("long").alias("n_pos"),
            F.sum(1 - F.col("is_pos")).cast("long").alias("n_neg"),
        )
    )
    from pyspark.sql import Window

    suffix = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = per_bin.select(
        "bin", "n_pos", "n_neg",
        F.sum("n_pos").over(suffix).alias("tp"),
        F.sum("n_neg").over(suffix).alias("fp"),
    )
    total_pos = F.sum("n_pos").over(Window.partitionBy())
    total_all = total_pos + F.sum("n_neg").over(Window.partitionBy())
    out = totals.select(
        F.round(F.col("bin").cast("double") / n_bins, 6).alias("threshold"),
        "tp", "fp",
        (total_pos - F.col("tp")).cast("long").alias("fn"),
        F.round(F.try_divide(F.col("tp").cast("double"), F.col("tp") + F.col("fp")), 6).alias("precision"),
        F.round(F.try_divide(F.col("tp").cast("double"), total_pos), 6).alias("recall"),
        F.round(
            F.try_divide(
                F.lit(2.0) * F.col("tp"),
                F.lit(2.0) * F.col("tp") + F.col("fp") + (total_pos - F.col("tp")),
            ),
            6,
        ).alias("f1"),
        F.round(F.try_divide((F.col("tp") + F.col("fp")).cast("double"), total_all), 6).alias("kept_frac"),
    )
    return out.orderBy("threshold")


def quality_model_gate(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Filter to documents the model keeps, original schema preserved —
    the curation-ladder form (``curate_documents(quality_model=...)``).
    Map-only like the heuristic gate it slots in beside.

    Dispatches on the weights-table schema (:func:`apply_quality_model`),
    so the ladder (and its streaming twin) take EITHER model form."""
    scored = apply_quality_model(df, weights, text_col, threshold)
    return scored.filter(F.col("quality_keep")).select(*df.columns)


def apply_quality_model(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score with whichever model the weights table holds: ``(feature,
    weight)`` rows route to the dense 5-feature scorer, ``(bucket,
    weight)`` rows to the hashed n-gram scorer (whose bucketing contract
    rides in the column metadata).  Ambiguous or unrecognizable schemas
    raise.  Both paths append the same (logit, prob, keep) columns."""
    cols = set(weights.columns)
    if "feature" in cols and "bucket" not in cols:
        return apply_quality_classifier(df, weights, text_col, threshold)
    if "bucket" in cols and "feature" not in cols:
        return apply_quality_classifier_hashed(df, weights, text_col, threshold)
    raise ValueError(
        f"weights table columns {sorted(cols)} match neither the dense "
        "(feature, weight) nor the hashed (bucket, weight) contract"
    )


# ---------------------------------------------------------------------------
# Hashed n-gram (fastText-style) variant: lexical sensitivity
# ---------------------------------------------------------------------------
#
# The five aggregate features above cannot tell "finance ledger invoice"
# from "casino jackpot bonus" — same lengths, same stopword ratio.  The
# actual fastText filter of CCNet/DCLM hashes token n-grams into a fixed
# bucket table and learns one weight per bucket.  Same economics here:
#
# - bucketing is pure JVM expression work (xxhash64 + pmod inside a
#   higher-order transform) — no HashingTF/VectorUDT plumbing, so the
#   apply path needs no ML runtime and no Python;
# - the learned bucket table folds into ONE array literal and the logit
#   is bias + mean(w[bucket]) via F.aggregate — codegen'd, zero shuffle,
#   streaming-legal, exactly like the dense apply above;
# - training is full-batch gradient descent expressed as DataFrame ops
#   on the weak-label SAMPLE: per iteration one scoring projection and
#   one explode->groupBy(bucket) aggregate (shuffle bounded by n_buckets,
#   never the sample), weights updated driver-side (a numpy array of
#   n_buckets doubles — broadcast-by-construction, the BPE merge-table
#   scale).  No row-at-a-time Python anywhere.
#
# MEAN (not sum) pooling bounds the feature scale per document — the
# fastText convention — so a fixed step size conditions well across
# 10-token and 10k-token docs.

#: weight-column metadata keys — the build-parameter contract (same
#: artifact-carries-its-params pattern as the KMV and substring indexes):
#: apply MUST bucket queries exactly as training did, so a weights table
#: without this metadata (or a mismatched one) raises instead of silently
#: scoring against the wrong hash space.
QC_HASHED_META = ("qc_n_buckets", "qc_ngram", "qc_hash")

#: Bucketing scheme identifier, stored in (and checked against) the
#: weights metadata.  Bump this whenever the gram-hash changes — a weights
#: table trained under another scheme would score silent garbage.
QC_HASH_SCHEME = "xxh64-rolling-v2"


def hashed_ngram_buckets(text: Column, n_buckets: int, ngram: int = 2) -> Column:
    """Token 1..ngram grams hashed into ``[0, n_buckets)`` — an
    ``array<int>`` with one entry per gram OCCURRENCE (repeats count).
    NULL text ≡ empty.  Pure expressions, so it composes onto batch and
    streaming frames alike.

    Rolling pair-hash, NOT string concatenation: each token hashes once
    (``xxhash64``), then the k-gram hash combines the (k-1)-gram hash
    with the next token's hash via the two-argument ``xxhash64`` —
    fixed-width long hashing with no gram-string allocation and no
    overflow-prone arithmetic (long ``*``/``+`` would abort under ANSI).
    Measured 8.4× faster than building bigram strings and hashing them
    (4.21 s -> 0.50 s for 536k grams on one core, identical gram
    counts) — gram assembly dominates hashed scoring, so this is the
    apply path's hot loop.  The scheme is versioned (:data:`QC_HASH_SCHEME`)
    in the weights metadata; train and apply must agree.
    """
    toks = tokens(F.coalesce(text, F.lit("")))
    h1 = F.transform(toks, lambda x: F.xxhash64(x))
    parts = [h1]
    prev = h1
    for k in range(2, ngram + 1):
        # pair the (k-1)-gram hash at i with the token hash at i+k-1;
        # zip_with pads the tail with nulls -> filtered out
        shifted = F.slice(h1, k, F.size(h1))
        prev = F.filter(
            F.zip_with(
                prev, shifted,
                lambda a, c: F.when(c.isNotNull() & a.isNotNull(), F.xxhash64(a, c)),
            ),
            lambda v: v.isNotNull(),
        )
        parts.append(prev)
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    return F.transform(grams, lambda h: F.pmod(h, F.lit(n_buckets)).cast("int"))


def _dense_array_lit(w: list[float]) -> Column:
    """array<double> literal built through ONE parser call instead of
    ``F.lit(list)``'s one py4j round trip per element — at model widths
    (thousands of weights) the per-element form costs whole seconds of
    driver wall per array (measured 1.66 s for 2048 doubles vs 7 ms).
    ``repr`` emits the shortest round-trip decimal and the ``D`` suffix
    makes the parser read it as a DOUBLE literal (bare decimals would
    parse as DECIMAL and re-round), so the values are BIT-IDENTICAL to
    ``F.lit``'s (test-pinned).  Non-finite values fall back to ``F.lit``
    — repr's inf/nan spellings are not SQL literals (trained weights are
    always finite; the fallback keeps the helper total)."""
    if all(math.isfinite(x) for x in w):
        return F.expr("array(" + ",".join(repr(x) + "D" for x in w) + ")")
    return F.lit(w)


def _hashed_logit(buckets: Column, bias: float, w: list[float]) -> Column:
    """bias + mean(w[bucket]) as a literal-folded expression (empty doc ->
    bias).  Fixed fold order; the array literal is the whole model."""
    warr = _dense_array_lit(w)
    total = F.aggregate(
        buckets, F.lit(0.0), lambda acc, b: acc + F.element_at(warr, b + F.lit(1))
    )
    return F.lit(bias) + F.coalesce(
        F.try_divide(total, F.size(buckets)), F.lit(0.0)
    )


def train_quality_classifier_hashed(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 4096,
    ngram: int = 2,
    iters: int = 40,
    step: float = 4.0,
    reg_param: float = 1e-3,
    balance_classes: bool = False,
) -> DataFrame:
    """Fit the hashed-n-gram logistic model; return a SPARSE weights table
    ``(bucket int, weight double)`` with the intercept at ``bucket = -1``,
    bucketing parameters riding as column metadata on ``weight``.

    Full-batch GD on the weak-label sample: the bucketed sample persists
    once, then each iteration re-scores it with the current weights as an
    array literal and aggregates the residual gradient per bucket
    (explode -> hash aggregate, <= n_buckets result rows).  L2-regularized
    mean log-loss; ``balance_classes`` reweights residuals by
    n/(2·n_class) like the dense trainer.
    """
    if n_buckets < 2 or ngram < 1:
        raise ValueError(f"need n_buckets >= 2 and ngram >= 1, got {n_buckets}, {ngram}")
    spark = df.sparkSession
    staged = (
        df.select(
            F.col(label_col).cast("double").alias("_y"),
            hashed_ngram_buckets(F.col(text_col), n_buckets, ngram).alias("_b"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    try:
        if balance_classes:
            counts = {r["_y"]: r["n"] for r in staged.groupBy("_y").agg(F.count("*").alias("n")).collect()}
            missing = {0.0, 1.0} - set(counts)
            if missing:
                raise ValueError(f"balance_classes needs both classes present, missing {sorted(missing)}")
            n_rows = sum(counts.values())
            rw = F.when(F.col("_y") == 1.0, F.lit(n_rows / (2.0 * counts[1.0]))).otherwise(
                F.lit(n_rows / (2.0 * counts[0.0]))
            )
            n_eff = float(n_rows)
        else:
            n_eff = float(staged.count())
            rw = F.lit(1.0)
        w = np.zeros(n_buckets)
        bias = 0.0
        for _ in range(iters):
            z = _hashed_logit(F.col("_b"), bias, w.tolist())
            resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("_y")) * rw
            scored = staged.select(
                resid.alias("_r"),
                F.col("_b"),
                F.size(F.col("_b")).alias("_l"),
            ).persist()
            bias_grad = scored.agg(F.sum("_r")).first()[0] / n_eff
            # each occurrence contributes resid/len (mean pooling), so the
            # exploded value IS the per-occurrence gradient term
            grads = (
                scored.filter(F.col("_l") > 0)
                .select((F.col("_r") / F.col("_l")).alias("_g"), F.explode("_b").alias("_j"))
                .groupBy("_j")
                .agg(F.sum("_g").alias("_grad"))
                .collect()
            )
            scored.unpersist()
            g = np.zeros(n_buckets)
            for r in grads:
                g[r["_j"]] = r["_grad"] / n_eff
            w -= step * (g + reg_param * w)
            bias -= step * bias_grad
    finally:
        staged.unpersist()
    rows = [(-1, float(bias))] + [
        (j, float(w[j])) for j in range(n_buckets) if w[j] != 0.0
    ]
    out = spark.createDataFrame(rows, "bucket int, weight double")
    return out.select(
        "bucket",
        F.col("weight").alias(
            "weight",
            metadata={
                "qc_n_buckets": n_buckets,
                "qc_ngram": ngram,
                "qc_hash": QC_HASH_SCHEME,
            },
        ),
    )


def _hashed_params(weights: DataFrame) -> tuple[int, int]:
    field = {f.name: f for f in weights.schema.fields}.get("weight")
    md = dict(field.metadata or {}) if field is not None else {}
    if not all(k in md for k in QC_HASHED_META):
        raise ValueError(
            "weights table carries no qc_n_buckets/qc_ngram/qc_hash metadata "
            "— build it with train_quality_classifier_hashed (scoring "
            "against the wrong hash space would be silent garbage)"
        )
    if md["qc_hash"] != QC_HASH_SCHEME:
        raise ValueError(
            f"weights were trained under bucketing scheme {md['qc_hash']!r} "
            f"but this build buckets with {QC_HASH_SCHEME!r} — retrain"
        )
    return int(md["qc_n_buckets"]), int(md["qc_ngram"])


#: Largest model the apply path will fold into an in-plan array literal.
#: 64k doubles ≈ a ~1.5 MB expression tree — comfortably inside plan /
#: codegen limits.  fastText-realistic bucket counts (2M+) would inflate
#: the serialized plan by tens of MB and stress constant-folding, so above
#: the cap scoring switches to an explicit ``SparkContext.broadcast`` of
#: the dense weight vector probed by an Arrow-batched pandas_udf — still
#: zero-exchange (a map-only projection, streaming-legal), just no longer
#: whole-stage-codegen'd.  The two paths are bit-identical by construction
#: (the numpy fold uses ``cumsum`` — strict left-to-right accumulation,
#: the same IEEE order as the JVM ``aggregate`` fold) and parity is
#: test-pinned at the boundary.
HASHED_LITERAL_CAP = 65_536


def _hashed_logit_broadcast(
    df_spark, buckets: Column, bias: float, w: list[float]
) -> Column:
    """bias + mean(w[bucket]) via an explicitly broadcast weight vector —
    the above-cap twin of :func:`_hashed_logit`.  One broadcast per apply
    (torrent-shipped once per executor, never re-serialized per stage),
    probed batch-at-a-time in numpy."""
    bc = df_spark.sparkContext.broadcast(np.asarray(w, dtype=np.float64))

    @F.pandas_udf("double")
    def _score(bks: pd.Series) -> pd.Series:
        warr = bc.value
        out = np.empty(len(bks), dtype=np.float64)
        for i, b in enumerate(bks):
            arr = np.asarray(b, dtype=np.int64)
            if arr.size == 0:
                out[i] = bias
            else:
                # cumsum = strict sequential accumulation -> identical
                # IEEE order to the JVM aggregate() fold
                out[i] = bias + np.cumsum(warr[arr])[-1] / arr.size
        return pd.Series(out)

    return _score(buckets)


def apply_quality_classifier_hashed(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    logit_col: str = "quality_logit",
    prob_col: str = "quality_prob",
    keep_col: str = "quality_keep",
    literal_cap: int = HASHED_LITERAL_CAP,
) -> DataFrame:
    """Score with the hashed model.  Up to ``literal_cap`` buckets the
    sparse table densifies into one array literal and the whole pass is a
    zero-exchange codegen'd projection (same contract as the dense apply;
    streaming-legal).  Above the cap the dense vector ships as an explicit
    broadcast probed by an Arrow-batched numpy kernel instead — same
    zero-exchange map-only shape, bit-identical logits (parity is
    test-pinned), chosen automatically so a fastText-realistic
    ``n_buckets`` cannot balloon the serialized plan.  Bucketing
    parameters come from the weights' column metadata — the artifact
    carries its build contract."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    n_buckets, ngram = _hashed_params(weights)
    dense = [0.0] * n_buckets
    bias = 0.0
    for r in weights.select("bucket", "weight").collect():
        if r["bucket"] == -1:
            bias = float(r["weight"])
        elif 0 <= r["bucket"] < n_buckets:
            dense[r["bucket"]] = float(r["weight"])
        else:
            raise ValueError(f"bucket {r['bucket']} outside [0, {n_buckets})")
    buckets = hashed_ngram_buckets(F.col(text_col), n_buckets, ngram)
    if n_buckets <= literal_cap:
        logit = _hashed_logit(buckets, bias, dense)
    else:
        logit = _hashed_logit_broadcast(df.sparkSession, buckets, bias, dense)
    logit_threshold = math.log(threshold / (1.0 - threshold))
    out = df.withColumn(logit_col, logit)
    out = out.withColumn(prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(logit_col))))
    return out.withColumn(keep_col, F.col(logit_col) >= F.lit(logit_threshold))


# ---------------------------------------------------------------------------
# Multi-class (softmax) hashed variant: the fastText lang-id shape
# ---------------------------------------------------------------------------
#
# CommonCrawl-scale language-ID is not a binary keep/drop — it is a
# K-class assignment (fastText's lid.176 is the de-facto tool), and the
# marker-list heuristic in ``text.lang_id`` only knows the handful of
# languages someone hand-listed stopwords for.  This is the same hashed
# n-gram machinery as the binary model above — identical rolling
# pair-hash bucketing (the ONE scheme both trainers version-stamp into
# the weights metadata) — with one weight array PER CLASS and a softmax
# head.  The apply path stays a zero-exchange map-only projection: ONE
# ``aggregate`` pass over the gram array accumulates all K per-class
# weight sums in a struct accumulator (the bucketing evaluates once, not
# K times), and the argmax is a ``greatest`` over (logit, tiebreak)
# structs — deterministic, streaming-legal, codegen'd.


def _multiclass_totals(buckets: Column, ws: list[list[float]]) -> Column:
    """The K-sum struct accumulator: ONE fold pass over the gram array
    accumulating all K per-class weight sums (the bucketing expression
    is referenced — and therefore evaluated — exactly once)."""
    k = len(ws)
    warrs = [_dense_array_lit(w) for w in ws]
    zero = F.struct(*[F.lit(0.0).alias(f"s{c}") for c in range(k)])
    return F.aggregate(
        buckets,
        zero,
        lambda acc, b: F.struct(
            *[
                (acc[f"s{c}"] + F.element_at(warrs[c], b + F.lit(1))).alias(f"s{c}")
                for c in range(k)
            ]
        ),
    )


def _multiclass_logits(
    buckets: Column, biases: list[float], ws: list[list[float]]
) -> list[Column]:
    """Per-class logits ``bias_c + mean(w_c[bucket])`` from the single
    struct-accumulator pass.  Empty doc -> per-class biases.

    CAUTION (the r16 analysis-cost finding): each returned Column embeds
    the full K x n_buckets literal fold — a consumer that references
    several of them in one plan multiplies Catalyst's analysis work by
    the reference count (measured: 18 s of flat driver wall per apply at
    K=5 x 2048 when the fold appeared ~2K times).  Plan-building code
    should materialize :func:`_multiclass_totals` as a NAMED column once
    and derive the logits from the attribute (what
    :func:`apply_multiclass_hashed` does); this list form is for
    single-reference consumers."""
    k = len(ws)
    totals = _multiclass_totals(buckets, ws)
    n = F.size(buckets)
    return [
        F.lit(biases[c])
        + F.coalesce(F.try_divide(totals[f"s{c}"], n), F.lit(0.0))
        for c in range(k)
    ]


def _multiclass_z_broadcast(
    df_spark, buckets: Column, biases: list[float], ws: list[list[float]]
) -> tuple[Column, "object"]:
    """Per-class logit VECTOR ``array<double>`` via an explicitly
    broadcast (K, n_buckets) weight matrix — the scoring kernel the
    TRAINER uses above the literal cap (the apply path's
    :func:`_multiclass_argmax_broadcast` is this plus a numpy argmax).
    Same cumsum fold order as the literal struct-accumulator, so the
    logits are bit-identical across paths.  Returns (column, broadcast
    handle) — the trainer re-broadcasts fresh weights every iteration
    and must unpersist the stale handle after the gradient action, or a
    40-iteration fit would pin 40 copies of the matrix on the executors."""
    bc = df_spark.sparkContext.broadcast(np.asarray(ws, dtype=np.float64))
    b_arr = np.asarray(biases, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _score(bks: pd.Series) -> pd.Series:
        wm = bc.value
        out = []
        for b in bks:
            arr = np.asarray(b, dtype=np.int64)
            if arr.size == 0:
                z = b_arr.copy()
            else:
                z = b_arr + np.cumsum(wm[:, arr], axis=1)[:, -1] / arr.size
            out.append([float(v) for v in z])
        return pd.Series(out)

    return _score(buckets), bc


def train_multiclass_hashed(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 4096,
    ngram: int = 2,
    iters: int = 40,
    step: float = 4.0,
    reg_param: float = 1e-3,
    balance_classes: bool = False,
    literal_cap: int = 0,
) -> DataFrame:
    """Fit a K-class softmax over hashed n-gram buckets; return a SPARSE
    weights table ``(bucket int, label string, weight double)`` with one
    intercept row per class at ``bucket = -1`` (always present, even at
    0.0 — the bias rows ARE the class roster) and the bucketing contract
    riding as column metadata, exactly like the binary trainer.

    Classes are the distinct ``label_col`` strings, ordered
    lexicographically (the order is part of the model: ties at apply
    break toward the FIRST class).  Full-batch softmax gradient descent
    on the weak-label sample: per iteration one scoring projection
    (numerically stable max-shifted softmax; all K logits come from one
    broadcast-matrix Arrow kernel by default, or from the single
    struct-accumulator literal fold when ``literal_cap`` admits the
    model — bit-identical either way) and ONE explode -> hash aggregate
    carrying the K residual columns — shuffle bounded by n_buckets rows
    of K sums, never the sample.  L2-regularized mean cross-entropy;
    ``balance_classes`` reweights by n/(K·n_class) so each class
    contributes equally no matter how lopsided the crawl is.

    With K=2 and labels {'neg','pos'} this is the binary model in
    one-vs-rest parametrization; the binary trainer stays the right tool
    for keep/drop gates (one array instead of two).  For language ID,
    train on a labeled sample and apply with
    :func:`lang_id_trained` — the upgrade path ``text.lang_id``'s
    docstring points at.

    Driver-memory shape (the honest ceiling): the per-iteration gradient
    collect is <= min(n_buckets, distinct sample grams) rows x K sums,
    and the weight matrix itself is a dense K x n_buckets float64 array
    — ~1.6 GB at fastText's 2M x 100.  That bounds THIS trainer to
    weak-label SAMPLES (the production posture: DCLM/fastText gates are
    fit on 10^5-10^7 labeled docs, then applied to the full corpus by
    the zero-exchange scorer, which has no such ceiling — 2M x 20 apply
    is test-pinned).  A full-corpus fit at fastText width would need
    weights kept as a DataFrame and joined per iteration — a different
    cost regime this module deliberately does not enter.  The ceiling is
    ENFORCED: K·n_buckets above :data:`TRAIN_DENSE_CAP` raises
    ``ValueError`` before the first iteration rather than OOMing the
    driver mid-fit."""
    if n_buckets < 2 or ngram < 1:
        raise ValueError(
            f"need n_buckets >= 2 and ngram >= 1, got {n_buckets}, {ngram}"
        )
    spark = df.sparkSession
    staged = (
        df.select(
            F.col(label_col).cast("string").alias("_y"),
            hashed_ngram_buckets(F.col(text_col), n_buckets, ngram).alias("_b"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    try:
        counts = {
            r["_y"]: r["n"]
            for r in staged.groupBy("_y").agg(F.count("*").alias("n")).collect()
        }
        if None in counts:
            raise ValueError("labels must be non-null strings")
        classes = sorted(counts)
        k = len(classes)
        if k < 2:
            raise ValueError(f"need >= 2 classes, got {classes}")
        if k * n_buckets > TRAIN_DENSE_CAP:
            raise ValueError(
                f"K x n_buckets = {k} x {n_buckets} = {k * n_buckets:,} "
                f"exceeds the trainer's dense driver-weight ceiling "
                f"({TRAIN_DENSE_CAP:,} float64 cells ~ "
                f"{TRAIN_DENSE_CAP * 8 / 2**30:.1f} GiB). This trainer "
                "fits weak-label SAMPLES (see docstring); a full-corpus "
                "fit at this width needs weights kept as a DataFrame and "
                "joined per iteration — a different cost regime this "
                "module deliberately does not enter."
            )
        n_rows = sum(counts.values())
        if balance_classes:
            rw = F.lit(None).cast("double")
            for c in classes:
                rw = F.when(
                    F.col("_y") == c, F.lit(n_rows / (k * counts[c]))
                ).otherwise(rw)
        else:
            rw = F.lit(1.0)
        n_eff = float(n_rows)
        w = np.zeros((k, n_buckets))
        biases = np.zeros(k)
        for _ in range(iters):
            # Training scores via the BROADCAST kernel by default
            # (literal_cap=0): unlike the apply path — one plan, reused
            # per batch, where in-plan literals buy whole-stage codegen
            # — the trainer re-embeds FRESH weights every iteration, so
            # the literal path pays K x n_buckets of plan analysis per
            # iteration with nothing amortized (review-measured ~4 s/
            # iter at K=4/512; 2.4x slower end-to-end even at K=3/64).
            # The two kernels share the fold order (bit-identical
            # logits AND therefore bit-identical trained weights —
            # parity test-pinned), so the gate never changes the fit;
            # literal_cap stays a parameter so the parity pin can force
            # either path.
            bc_handle = None
            if k * n_buckets <= literal_cap:
                base = staged
                zs = _multiclass_logits(
                    F.col("_b"), biases.tolist(), [w[c].tolist() for c in range(k)]
                )
            else:
                zcol, bc_handle = _multiclass_z_broadcast(
                    spark,
                    F.col("_b"),
                    biases.tolist(),
                    [w[c].tolist() for c in range(k)],
                )
                # name the vector so downstream residuals reference ONE
                # evaluated ArrowEvalPython column, not K re-evaluations
                base = staged.select("_y", "_b", zcol.alias("_z"))
                zs = [F.col("_z")[c] for c in range(k)]
            m = F.greatest(*zs) if k > 1 else zs[0]
            es = [F.exp(z - m) for z in zs]
            denom = es[0]
            for e in es[1:]:
                denom = denom + e
            resid_cols = [
                (
                    (es[c] / denom
                     - F.when(F.col("_y") == classes[c], F.lit(1.0)).otherwise(
                         F.lit(0.0)
                     ))
                    * rw
                ).alias(f"_r{c}")
                for c in range(k)
            ]
            scored = base.select(
                F.col("_b"), F.size(F.col("_b")).alias("_l"), *resid_cols
            )
            # ONE action per iteration: each bucket occurrence contributes
            # resid/len (mean pooling) and a SENTINEL entry at j = -1
            # carries the raw residual, so the bias gradient rides the
            # same explode -> hash aggregate as the bucket gradients
            # (empty docs emit only the sentinel — they still move the
            # bias, never a bucket)
            entries = F.concat(
                F.transform(
                    "_b",
                    lambda b: F.struct(
                        b.alias("j"),
                        *[
                            (F.col(f"_r{c}") / F.col("_l")).alias(f"g{c}")
                            for c in range(k)
                        ],
                    ),
                ),
                F.array(
                    F.struct(
                        F.lit(-1).alias("j"),
                        *[F.col(f"_r{c}").alias(f"g{c}") for c in range(k)],
                    )
                ),
            )
            grads = (
                scored.select(F.explode(entries).alias("_e"))
                .groupBy(F.col("_e.j").alias("_j"))
                .agg(*[F.sum(f"_e.g{c}").alias(f"_g{c}") for c in range(k)])
                .collect()
            )
            if bc_handle is not None:
                bc_handle.unpersist()
            g = np.zeros((k, n_buckets))
            bg = np.zeros(k)
            for r in grads:
                if r["_j"] == -1:
                    for c in range(k):
                        bg[c] = (r[f"_g{c}"] or 0.0) / n_eff
                else:
                    for c in range(k):
                        g[c, r["_j"]] = r[f"_g{c}"] / n_eff
            w -= step * (g + reg_param * w)
            biases -= step * bg
    finally:
        staged.unpersist()
    rows = [(-1, classes[c], float(biases[c])) for c in range(k)] + [
        (j, classes[c], float(w[c, j]))
        for c in range(k)
        for j in range(n_buckets)
        if w[c, j] != 0.0
    ]
    out = spark.createDataFrame(rows, "bucket int, label string, weight double")
    return out.select(
        "bucket",
        "label",
        F.col("weight").alias(
            "weight",
            metadata={
                "qc_n_buckets": n_buckets,
                "qc_ngram": ngram,
                "qc_hash": QC_HASH_SCHEME,
            },
        ),
    )


def _multiclass_weights(
    weights: DataFrame,
) -> tuple[list[str], list[float], list[list[float]], int, int]:
    """(classes, biases, dense per-class weights, n_buckets, ngram) from a
    multiclass weights table.  Classes come from the mandatory bias rows
    (lexicographic order re-imposed, so a shuffled parquet round trip
    cannot reorder the tie-break); bucketing params from the metadata
    contract shared with the binary hashed model."""
    n_buckets, ngram = _hashed_params(weights)
    rows = weights.select("bucket", "label", "weight").collect()
    biases_by: dict[str, float] = {}
    for r in rows:
        if r["bucket"] == -1:
            biases_by[r["label"]] = float(r["weight"])
    if len(biases_by) < 2:
        raise ValueError(
            "multiclass weights need a bucket = -1 bias row per class "
            f"(found {sorted(biases_by)}) — train with train_multiclass_hashed"
        )
    classes = sorted(biases_by)
    idx = {c: i for i, c in enumerate(classes)}
    dense = [[0.0] * n_buckets for _ in classes]
    for r in rows:
        b = r["bucket"]
        if b == -1:
            continue
        if r["label"] not in idx:
            raise ValueError(f"weight row for unknown class {r['label']!r}")
        if not 0 <= b < n_buckets:
            raise ValueError(f"bucket {b} outside [0, {n_buckets})")
        dense[idx[r["label"]]][b] = float(r["weight"])
    return classes, [biases_by[c] for c in classes], dense, n_buckets, ngram


def _multiclass_argmax_broadcast(
    df_spark, buckets: Column, classes: list[str],
    biases: list[float], ws: list[list[float]],
) -> Column:
    """(pred, z[]) via an explicitly broadcast (K, n_buckets) weight
    matrix — the above-cap twin of the literal path, same cumsum fold
    order per class, ties toward the first (lexicographically smallest)
    class via argmax-on-first-max.  The kernel returns the raw LOGIT
    vector (class order) and leaves the softmax to JVM expressions, so
    probabilities are bit-identical across paths — numpy's exp and the
    JVM's disagree in the last ulp, the logit arithmetic does not."""
    bc = df_spark.sparkContext.broadcast(np.asarray(ws, dtype=np.float64))
    b_arr = np.asarray(biases, dtype=np.float64)

    @F.pandas_udf("pred string, z array<double>")
    def _score(bks: pd.Series) -> pd.DataFrame:
        wm = bc.value
        preds, zss = [], []
        for b in bks:
            arr = np.asarray(b, dtype=np.int64)
            if arr.size == 0:
                z = b_arr.copy()
            else:
                z = b_arr + np.cumsum(wm[:, arr], axis=1)[:, -1] / arr.size
            preds.append(classes[int(np.argmax(z))])  # first max = smallest class
            zss.append([float(v) for v in z])
        return pd.DataFrame({"pred": preds, "z": zss})

    return _score(buckets)


def apply_multiclass_hashed(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    out_col: str = "pred",
    prob_col: str | None = None,
    literal_cap: int = HASHED_LITERAL_CAP,
) -> DataFrame:
    """Assign every document its argmax class; optionally append the
    softmax probability of the winner (``prob_col``).

    Up to ``literal_cap`` TOTAL weights (K·n_buckets) the model folds
    into K array literals and the pass is a zero-exchange codegen'd
    projection: one struct-accumulator fold over the gram array (the
    bucketing evaluates once), then ``greatest`` over (logit, tiebreak,
    label) structs — ties break toward the lexicographically smallest
    class.  Above the cap the weight MATRIX ships as one explicit
    broadcast probed by an Arrow-batched numpy kernel — same map-only
    shape, same tie rule (parity test-pinned).  Streaming-legal either
    way."""
    classes, biases, dense, n_buckets, ngram = _multiclass_weights(weights)
    k = len(classes)
    # scratch names must not shadow caller columns — a frame that already
    # carries one would get it silently overwritten and then dropped
    tot_c, n_c, mc_c = (
        _fresh_name(df, base) for base in ("_mc_tot", "_mc_n", "_mc")
    )
    buckets = hashed_ngram_buckets(F.col(text_col), n_buckets, ngram)
    if k * n_buckets <= literal_cap:
        # materialize the literal-bearing struct fold ONCE as a named
        # column; every downstream consumer (K logits, the K argmax
        # structs, the softmax terms) references the ATTRIBUTE.  Embedding
        # the fold expression per consumer made Catalyst analysis the
        # dominant cost — ~2K copies of a K x n_buckets literal tree,
        # measured 18 s of flat driver wall per apply at K=5 x 2048 —
        # while the named-column form analyzes the fold once.  Runtime is
        # unchanged (same projection, codegen CSE already de-duplicated
        # the evaluation); results are bit-identical.
        tmp = df.withColumn(
            tot_c, _multiclass_totals(buckets, dense)
        ).withColumn(n_c, F.size(buckets))
        zs = [
            F.lit(biases[c])
            + F.coalesce(
                F.try_divide(F.col(tot_c)[f"s{c}"], F.col(n_c)),
                F.lit(0.0),
            )
            for c in range(k)
        ]
        # greatest over (z, tiebreak, label): equal logits pick the row
        # with the LARGER tiebreak = the SMALLER class index
        cands = [
            F.struct(
                zs[c].alias("z"),
                F.lit(k - 1 - c).alias("tb"),
                F.lit(classes[c]).alias("label"),
            )
            for c in range(k)
        ]
        best = F.greatest(*cands)
        out = tmp.withColumn(out_col, best["label"])
        if prob_col is not None:
            m = F.greatest(*zs)
            denom = F.exp(zs[0] - m)
            for z in zs[1:]:
                denom = denom + F.exp(z - m)
            out = out.withColumn(prob_col, F.exp(best["z"] - m) / denom)
        return out.drop(tot_c, n_c)
    scored = _multiclass_argmax_broadcast(
        df.sparkSession, buckets, classes, biases, dense
    )
    out = df.withColumn(mc_c, scored).withColumn(out_col, F.col(mc_c)["pred"])
    if prob_col is not None:
        # softmax JVM-side from the returned logit vector, same fold
        # order as the literal path (0.0 + e_0 is exact, so the leading
        # zero of the aggregate changes nothing) -> bit-identical probs
        z = F.col(mc_c)["z"]
        m = F.array_max(z)
        denom = F.aggregate(z, F.lit(0.0), lambda acc, x: acc + F.exp(x - m))
        out = out.withColumn(prob_col, F.exp(m - m) / denom)
    return out.drop(mc_c)


def lang_id_trained(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    prob_col: str | None = None,
) -> DataFrame:
    """Trained language ID — the fastText-shape upgrade to the marker
    heuristic ``text.lang_id``: same output column, but the decision
    comes from a :func:`train_multiclass_hashed` softmax over hashed
    n-grams (which knows whatever languages the labeled sample taught
    it) instead of a hand-listed stopword table.  Drop-in for the
    curation ladder's lang gate; zero-exchange, streaming-legal."""
    return apply_multiclass_hashed(
        df, weights, text_col, out_col=out_col, prob_col=prob_col
    )


def multiclass_report(
    scored: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
) -> DataFrame:
    """Per-class precision/recall/F1 + support against held-out labels —
    the K-class analogue of :func:`threshold_report`, and how a lang-id
    model actually gets accepted ("≥99% F1 on every language we keep").

    One corpus pass: the only corpus-sized work is a hash aggregate onto
    the (label, pred) confusion pairs (≤ K² rows, map-side combined);
    per-class supports and true positives then derive from that tiny
    frame, full-outer joined so a class that appears ONLY in labels
    (never predicted — recall 0) or ONLY in predictions (a phantom class
    — precision 0) still gets its row.  Rows with a NULL label are
    excluded, same rule as ``threshold_report``: a partially labeled
    eval set must not count unlabeled rows as errors.  Output, one row
    per class: (class, n_true, n_pred, tp, precision, recall, f1) with
    the 6-dp serving round; precision/recall are NULL when their
    denominator is zero (never a divide error)."""
    pairs = (
        scored.filter(F.col(label_col).isNotNull())
        .groupBy(
            F.col(label_col).alias("_y"), F.col(pred_col).alias("_p")
        )
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    truth = pairs.groupBy(F.col("_y").alias("class")).agg(
        F.sum("_n").alias("n_true")
    )
    preds = pairs.groupBy(F.col("_p").alias("class")).agg(
        F.sum("_n").alias("n_pred")
    )
    tp = pairs.filter(F.col("_y") == F.col("_p")).select(
        F.col("_y").alias("class"), F.col("_n").alias("tp")
    )
    out = (
        truth.join(preds, "class", "full_outer")
        .join(tp, "class", "left")
        .select(
            "class",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    precision = F.try_divide(F.col("tp").cast("double"), F.col("n_pred"))
    recall = F.try_divide(F.col("tp").cast("double"), F.col("n_true"))
    f1 = F.try_divide(
        F.lit(2.0) * F.col("tp"), (F.col("n_pred") + F.col("n_true")).cast("double")
    )
    return out.select(
        "class", "n_true", "n_pred", "tp",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("class")
