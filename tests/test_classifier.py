"""Trained quality classifier (operators/classifier.py): the DCLM-style
model-based quality filter — distributed train, literal-folded map-only
apply, DuckDB-replayable scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.classifier import (
    BIAS_FEATURE,
    QUALITY_FEATURES,
    apply_quality_classifier,
    featurize,
    quality_feature_exprs,
    quality_model_gate,
    train_quality_classifier,
)


def _labeled_corpus(spark, n_each=60):
    good = [
        (i, f"the quick brown fox and the lazy dog sat on a log in the sun for hours {i}")
        for i in range(n_each)
    ]
    junk = [(1000 + i, ("x7#$%9 " * 12) + str(i)) for i in range(n_each)]
    df = spark.createDataFrame(good + junk, "doc_id long, text string")
    return df.withColumn("label", (F.col("doc_id") < 1000).cast("double"))


@pytest.fixture(scope="module")
def model(spark):
    df = _labeled_corpus(spark)
    return df, train_quality_classifier(df, "label")


def test_weights_schema_and_contract_order(model):
    _, w = model
    rows = {r.feature: r for r in w.collect()}
    assert set(rows) == set(QUALITY_FEATURES) | {BIAS_FEATURE}
    assert rows[BIAS_FEATURE].idx == -1
    assert [f for f, _ in sorted(((r.feature, r.idx) for r in rows.values()), key=lambda t: t[1]) if f != BIAS_FEATURE] == list(QUALITY_FEATURES)


def test_separates_planted_classes(model):
    df, w = model
    scored = apply_quality_classifier(df, w)
    acc = (
        scored.withColumn("ok", (F.col("quality_keep") == (F.col("label") == 1.0)).cast("double"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95


def test_apply_matches_spark_ml_transform(model):
    """The literal-folded logit must reproduce pyspark.ml's own scoring
    (same model, same features) — the folding step loses nothing."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    df, w = model
    feats = featurize(
        df.select(F.col("label").alias("_qc_label"), "text", "doc_id"),
        keep=["_qc_label", "doc_id"],
    )
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="_qc_vec"
    ).transform(feats)
    ml_model = LogisticRegression(
        featuresCol="_qc_vec", labelCol="_qc_label", maxIter=100,
        regParam=0.01, standardization=True, family="binomial",
    ).fit(assembled)
    ml_probs = {
        r.doc_id: float(r.probability[1])
        for r in ml_model.transform(assembled).select("doc_id", "probability").collect()
    }
    # rebuild OUR weights from the same fitted model for an apples-to-apples
    # scoring comparison (train_quality_classifier's own fit may land on a
    # microscopically different optimum)
    rows = [(-1, BIAS_FEATURE, float(ml_model.intercept))] + [
        (i, f, float(c)) for i, (f, c) in enumerate(zip(QUALITY_FEATURES, ml_model.coefficients))
    ]
    w2 = df.sparkSession.createDataFrame(rows, "idx int, feature string, weight double")
    ours = {
        r.doc_id: r.quality_prob
        for r in apply_quality_classifier(df, w2).select("doc_id", "quality_prob").collect()
    }
    for doc_id, p in ml_probs.items():
        assert math.isclose(ours[doc_id], p, rel_tol=1e-9, abs_tol=1e-12)


def test_weights_parquet_round_trip(model, tmp_path):
    df, w = model
    path = str(tmp_path / "qc_weights")
    w.write.parquet(path)
    reloaded = df.sparkSession.read.parquet(path)
    a = {r.doc_id: r.quality_logit for r in apply_quality_classifier(df, w).collect()}
    b = {r.doc_id: r.quality_logit for r in apply_quality_classifier(df, reloaded).collect()}
    assert a == b  # exact: same literals fold in


def test_unknown_feature_raises(spark, model):
    df, _ = model
    bad = spark.createDataFrame(
        [(-1, BIAS_FEATURE, 0.1), (0, "embedding_norm", 2.0)],
        "idx int, feature string, weight double",
    )
    with pytest.raises(ValueError, match="unknown quality features"):
        apply_quality_classifier(df, bad)


def test_missing_idx_falls_back_to_contract_order(spark, model):
    df, w = model
    no_idx = w.select("feature", "weight")
    a = {r.doc_id: r.quality_logit for r in apply_quality_classifier(df, w).collect()}
    b = {r.doc_id: r.quality_logit for r in apply_quality_classifier(df, no_idx).collect()}
    assert a == b


def test_threshold_moves_boundary(model):
    df, w = model
    strict = apply_quality_classifier(df, w, threshold=0.99)
    lax = apply_quality_classifier(df, w, threshold=0.01)
    n_strict = strict.filter("quality_keep").count()
    n_lax = lax.filter("quality_keep").count()
    assert n_strict <= n_lax
    with pytest.raises(ValueError, match="threshold"):
        apply_quality_classifier(df, w, threshold=1.0)


def test_null_and_empty_text_score_bias_only(spark, model):
    _, w = model
    bias = {r.feature: r.weight for r in w.collect()}[BIAS_FEATURE]
    edge = spark.createDataFrame([(1, None), (2, ""), (3, "   ")], "doc_id long, text string")
    rows = {r.doc_id: r for r in apply_quality_classifier(edge, w).collect()}
    for doc_id in (1, 2):
        assert rows[doc_id].quality_logit == bias
        assert rows[doc_id].quality_keep == (bias >= 0.0)
    # whitespace-only: zero tokens, but char-ratio denominators are len>0
    assert rows[3].quality_logit is not None


def test_featurize_matches_exprs(spark, documents):
    """The staged batch featurizer and the pure-expression path (the apply
    path) must agree exactly on the real corpus."""
    docs = documents.select("doc_id", "text")
    staged = {r.doc_id: r for r in featurize(docs, keep=["doc_id"]).collect()}
    exprs = quality_feature_exprs(F.col("text"))
    pure = {
        r.doc_id: r
        for r in docs.select("doc_id", *[exprs[n].alias(n) for n in QUALITY_FEATURES]).collect()
    }
    for doc_id, row in pure.items():
        for name in QUALITY_FEATURES:
            assert row[name] == staged[doc_id][name], (doc_id, name)


def test_apply_plan_is_map_only(model):
    """The 100 TB scoring pass: no Exchange anywhere in the physical plan —
    the weights fold into literals, never a join or shuffle."""
    df, w = model
    plan = (
        apply_quality_classifier(df, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_apply_works_on_streaming_frame(spark, model, tmp_path):
    """quality_feature_exprs is expression-only, so scoring composes onto a
    readStream source (the ingest-time quality gate)."""
    df, w = model
    src = str(tmp_path / "stream_src")
    df.select("doc_id", "text").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scored = apply_quality_classifier(stream, w)
    assert scored.isStreaming
    q = (
        scored.writeStream.format("memory")
        .queryName("qc_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.quality_logit for r in spark.table("qc_stream_test").collect()}
    want = {r.doc_id: r.quality_logit for r in apply_quality_classifier(df, w).collect()}
    assert got == want


def test_unit_weight_col_equals_unweighted(spark):
    """weight_col of all-ones is the same optimization problem — weights
    must come back (numerically) identical to the unweighted fit."""
    df = _labeled_corpus(spark, n_each=30).withColumn("w", F.lit(1.0))
    plain = {r.feature: r.weight for r in train_quality_classifier(df, "label").collect()}
    weighted = {
        r.feature: r.weight
        for r in train_quality_classifier(df, "label", weight_col="w").collect()
    }
    for feat, w in plain.items():
        assert math.isclose(weighted[feat], w, rel_tol=1e-6, abs_tol=1e-9), feat


def test_balance_classes_recovers_minority(spark):
    """Imbalanced weak labels (the crawl norm: mostly junk, tiny gold
    slice) with OVERLAPPING class distributions: the unweighted fit is
    majority-prior-dominated and writes off the overlap region (most of
    the good docs), the balanced fit places the boundary between the
    class-conditional densities and recovers them.

    Construction: essentially 1-D on stopword_ratio — k stopwords out of
    20 tokens.  good k ∈ {3..7}, junk k ∈ {0..5}: the {3,4,5} band is
    shared, but junk outnumbers good 25:1 there, so the posterior (what
    the unweighted fit optimizes) says drop while the balanced likelihood
    ratio says keep."""

    def text(k, i):
        return " ".join(["the"] * k + ["rock"] * (20 - k)) + f" x{i}"

    good = [(i, text(3 + i % 5, i)) for i in range(15)]
    junk = [(1000 + i, text(i % 6, i)) for i in range(375)]
    df = spark.createDataFrame(good + junk, "doc_id long, text string").withColumn(
        "label", (F.col("doc_id") < 1000).cast("double")
    )
    good_ids = {i for i, _ in good}

    def recall(weights):
        kept = {
            r.doc_id
            for r in apply_quality_classifier(df, weights).filter("quality_keep").collect()
        }
        return len(kept & good_ids) / len(good_ids)

    recall_bal = recall(train_quality_classifier(df, "label", balance_classes=True))
    recall_plain = recall(train_quality_classifier(df, "label"))
    assert recall_bal >= 0.9
    assert recall_plain <= 0.6  # the prior-dominated fit drops the overlap band
    assert recall_bal > recall_plain


def test_balance_classes_guards(spark):
    df = _labeled_corpus(spark, n_each=5).withColumn("w", F.lit(1.0))
    with pytest.raises(ValueError, match="not both"):
        train_quality_classifier(df, "label", weight_col="w", balance_classes=True)
    one_class = df.filter(F.col("label") == 1.0)
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier(one_class, "label", balance_classes=True)


def test_curation_ladder_forwards_quality_model(spark, model):
    """prepare_training_set(quality_model=...) drops what the model drops:
    junk docs vanish from the chunk output even when every other gate is
    permissive."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    df, w = model
    docs = df.select("doc_id", "text")
    out = prepare_training_set(
        docs,
        min_quality=0.0,
        near_dup_threshold=None,
        quality_model=w,
    )
    kept_ids = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert kept_ids and all(i < 1000 for i in kept_ids)
    # and without the model the junk survives the permissive ladder
    base = prepare_training_set(docs, min_quality=0.0, near_dup_threshold=None)
    base_ids = {r.doc_id for r in base.select("doc_id").distinct().collect()}
    assert any(i >= 1000 for i in base_ids)


def _brute_report(rows, n_bins):
    """Python reference: confusion counts at every bin lower edge."""
    out = {}
    bins = sorted({min(int(p * n_bins), n_bins - 1) for p, _ in rows}, reverse=True)
    total_pos = sum(1 for _, y in rows if y == 1.0)
    for b in bins:
        kept = [(p, y) for p, y in rows if min(int(p * n_bins), n_bins - 1) >= b]
        tp = sum(1 for _, y in kept if y == 1.0)
        fp = len(kept) - tp
        out[b] = dict(
            tp=tp, fp=fp, fn=total_pos - tp,
            precision=tp / (tp + fp) if tp + fp else None,
            recall=tp / total_pos,
            kept_frac=len(kept) / len(rows),
        )
    return out


def test_threshold_report_matches_brute_force(spark):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        threshold_report,
    )

    # probs chosen away from the 0.1 bin edges so binning is unambiguous
    rows = [
        (0.982, 1.0), (0.871, 1.0), (0.843, 0.0), (0.712, 1.0), (0.655, 0.0),
        (0.551, 1.0), (0.348, 0.0), (0.217, 0.0), (0.146, 1.0), (0.032, 0.0),
    ]
    df = spark.createDataFrame(rows, "quality_prob double, label double")
    got = {
        round(r.threshold * 10): r
        for r in threshold_report(df, "label", n_bins=10).collect()
    }
    want = _brute_report(rows, 10)
    assert set(got) == set(want)
    for b, w in want.items():
        g = got[b]
        assert (g.tp, g.fp, g.fn) == (w["tp"], w["fp"], w["fn"]), b
        assert g.recall == round(w["recall"], 6)
        assert g.kept_frac == round(w["kept_frac"], 6)
        if w["precision"] is None:
            assert g.precision is None
        else:
            assert g.precision == round(w["precision"], 6)
        p, r = w["precision"], w["recall"]
        f1 = 2 * p * r / (p + r) if p else None
        if f1 is not None:
            assert abs(g.f1 - f1) < 1e-6, b


def test_threshold_report_monotone_and_trained_end_to_end(spark, model):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        threshold_report,
    )

    df, w = model
    scored = apply_quality_classifier(df, w)
    rep = threshold_report(scored, "label").collect()
    assert rep == sorted(rep, key=lambda r: r.threshold)
    recalls = [r.recall for r in rep]
    kept = [r.kept_frac for r in rep]
    assert recalls == sorted(recalls, reverse=True)  # suffix sums shrink
    assert kept == sorted(kept, reverse=True)
    assert rep[0].recall == 1.0  # lowest non-empty bin keeps every positive
    assert max(r.f1 for r in rep) >= 0.9  # separable corpus: a great cut exists
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        threshold_report(scored, "label", n_bins=1)


# --- hashed n-gram (fastText-style) variant --------------------------------

FIN = ["ledger", "invoice", "audit", "credit", "equity", "margin"]
SPAM = ["casino", "jackpot", "poker", "payout", "prizes", "bettor"]
# pairwise same character lengths -> the five DENSE features are identical
# between the two classes by construction
assert [len(w) for w in FIN] == [len(w) for w in SPAM]


def _topical_corpus(spark):
    def doc(vocab, i):
        ws = [vocab[(i + j) % len(vocab)] for j in range(10)]
        return "the " + " ".join(ws) + f" on x{i}"

    rows = [(i, doc(FIN, i), 1.0) for i in range(40)] + [
        (100 + i, doc(SPAM, i), 0.0) for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def hashed_model(spark):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        train_quality_classifier_hashed,
    )

    df = _topical_corpus(spark)
    return df, train_quality_classifier_hashed(df, iters=30, n_buckets=512)


def _accuracy(scored):
    return (
        scored.withColumn(
            "ok", (F.col("quality_keep") == (F.col("label") == 1.0)).cast("double")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )


def test_hashed_separates_vocabulary_the_dense_model_cannot(spark, hashed_model):
    """The whole point of the hashed variant: two corpora with IDENTICAL
    aggregate stats (same token counts, same per-position word lengths,
    same stopwords/digits/punctuation) but different vocabularies.  The
    dense 5-feature model is blind by construction; the hashed n-gram
    model must separate them."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
    )

    df, w = hashed_model
    assert _accuracy(apply_quality_classifier_hashed(df, w)) >= 0.95
    dense = train_quality_classifier(df, "label")
    assert _accuracy(apply_quality_classifier(df, dense)) <= 0.7


def test_hashed_apply_is_map_only_and_streaming_legal(spark, hashed_model, tmp_path):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
    )

    df, w = hashed_model
    scored = apply_quality_classifier_hashed(df, w)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    src = str(tmp_path / "hstream")
    df.select("doc_id", "text").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        apply_quality_classifier_hashed(stream, w)
        .writeStream.format("memory")
        .queryName("qc_hashed_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.quality_logit for r in spark.table("qc_hashed_stream").collect()}
    want = {r.doc_id: r.quality_logit for r in scored.select("doc_id", "quality_logit").collect()}
    assert got == want


def test_hashed_weights_round_trip_with_metadata_contract(spark, hashed_model, tmp_path):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
    )

    df, w = hashed_model
    path = str(tmp_path / "hashed_w")
    w.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = {r.doc_id: r.quality_logit for r in apply_quality_classifier_hashed(df, w).collect()}
    b = {r.doc_id: r.quality_logit for r in apply_quality_classifier_hashed(df, reloaded).collect()}
    assert a == b
    # stripping the metadata voids the build contract -> raise, never score
    stripped = spark.createDataFrame(
        [(r.bucket, r.weight) for r in w.collect()], "bucket int, weight double"
    )
    with pytest.raises(ValueError, match="metadata"):
        apply_quality_classifier_hashed(df, stripped)


def test_hashed_empty_and_null_text_score_bias(spark, hashed_model):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
    )

    _, w = hashed_model
    bias = {r.bucket: r.weight for r in w.collect()}[-1]
    edge = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {r.doc_id: r for r in apply_quality_classifier_hashed(edge, w).collect()}
    for i in (1, 2):
        assert rows[i].quality_logit == bias


def test_hashed_balance_classes_and_guards(spark):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
        train_quality_classifier_hashed,
    )

    def doc(vocab, i):
        return "the " + " ".join(vocab[(i + j) % len(vocab)] for j in range(10)) + f" on x{i}"

    # 10:1 imbalance; balanced training must still recover the minority
    rows = [(i, doc(FIN, i), 1.0) for i in range(8)] + [
        (100 + i, doc(SPAM, i), 0.0) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    w = train_quality_classifier_hashed(df, iters=30, n_buckets=512, balance_classes=True)
    kept = {
        r.doc_id
        for r in apply_quality_classifier_hashed(df, w).filter("quality_keep").collect()
    }
    assert {i for i in range(8)} <= kept
    assert not any(d >= 100 for d in kept)
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier_hashed(df.filter("label = 0.0"), balance_classes=True)
    with pytest.raises(ValueError, match="n_buckets"):
        train_quality_classifier_hashed(df, n_buckets=1)


def test_hashed_scheme_version_mismatch_raises(spark, hashed_model):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
    )

    df, w = hashed_model
    stale = w.select(
        "bucket",
        F.col("weight").alias(
            "weight",
            metadata={"qc_n_buckets": 512, "qc_ngram": 2, "qc_hash": "strings-v1"},
        ),
    )
    with pytest.raises(ValueError, match="bucketing scheme"):
        apply_quality_classifier_hashed(df, stale)


def test_ladder_dispatches_hashed_weights(spark, hashed_model):
    """curate_documents/prepare_training_set accept the hashed model too:
    quality_model_gate dispatches on the weights schema, so the ladder
    drops topical junk the dense features cannot see."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    df, w = hashed_model
    docs = df.select("doc_id", "text")
    out = prepare_training_set(
        docs, min_quality=0.0, near_dup_threshold=None, quality_model=w
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert kept and all(i < 100 for i in kept)  # SPAM-vocab docs gone
    bad = spark.createDataFrame([(0, "x", 1.0)], "bucket int, feature string, weight double")
    with pytest.raises(ValueError, match="neither the dense"):
        quality_model_gate(docs, bad)


def test_curriculum_order(spark, model):
    """Band-monotone global order, deterministic under layout changes,
    within-band order = the content-hash shuffle convention."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        curriculum_order,
    )

    df, w = model
    out = curriculum_order(df, w, key_cols=["doc_id"], bands=4)
    rows = out.collect()
    assert [r.quality_band for r in rows] == sorted(r.quality_band for r in rows)
    # junk docs (low prob) land in the earliest bands, good docs last
    ids = [r.doc_id for r in rows]
    junk_positions = [i for i, d in enumerate(ids) if d >= 1000]
    good_positions = [i for i, d in enumerate(ids) if d < 1000]
    assert max(junk_positions) < min(good_positions)
    # layout independence: a different partitioning produces the same order
    rows2 = curriculum_order(df.repartition(7), w, key_cols=["doc_id"], bands=4).collect()
    assert [r.doc_id for r in rows2] == ids
    # descending flips the band order
    desc = curriculum_order(df, w, key_cols=["doc_id"], bands=4, ascending=False).collect()
    assert [r.quality_band for r in desc] == sorted((r.quality_band for r in desc), reverse=True)
    # a different seed reshuffles WITHIN bands but moves nothing across
    reseeded = curriculum_order(df, w, key_cols=["doc_id"], bands=4, seed=7).collect()
    assert {(r.doc_id, r.quality_band) for r in reseeded} == {(r.doc_id, r.quality_band) for r in rows}
    assert [r.doc_id for r in reseeded] != ids
    # the global sort is range-partitioned (the scalable shape)
    plan = curriculum_order(df, w, key_cols=["doc_id"])._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    with pytest.raises(ValueError, match="key_cols"):
        curriculum_order(df, w, key_cols=[])
    # hashed model dispatch works through the same path
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        train_quality_classifier_hashed,
    )

    hw = train_quality_classifier_hashed(df, iters=10, n_buckets=256)
    out_h = curriculum_order(df, hw, key_cols=["doc_id"], bands=4)
    bands_h = [r.quality_band for r in out_h.collect()]
    assert bands_h == sorted(bands_h)


def test_curriculum_order_raises_on_scoring_column_collision(spark, model):
    """The r11 advisor finding: an input that already carries the scorer's
    working columns (or band_col) must raise, not get silently
    overwritten and re-emitted as if it were the caller's data."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        curriculum_order,
    )

    df, w = model
    for clash in ("quality_logit", "quality_prob", "quality_keep", "quality_band"):
        poisoned = df.withColumn(clash, F.lit(0.123))
        with pytest.raises(ValueError, match=clash):
            curriculum_order(poisoned, w, key_cols=["doc_id"])
    # a custom band_col collides on ITS name, not the default's
    with pytest.raises(ValueError, match="my_band"):
        curriculum_order(
            df.withColumn("my_band", F.lit(1)), w, key_cols=["doc_id"],
            band_col="my_band",
        )
    # and renaming the clash away restores normal operation
    ok = curriculum_order(
        df.withColumnRenamed("label", "gold_label"), w, key_cols=["doc_id"]
    )
    assert ok.count() == df.count()


def test_threshold_report_excludes_null_labels(spark):
    """Partially-labeled held-out sets: NULL-label rows must not be counted
    as negatives (they would inflate fp / deflate precision & kept_frac) —
    the report describes the labeled subset only."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        threshold_report,
    )

    labeled = [(0.9, 1.0), (0.8, 1.0), (0.7, 0.0), (0.2, 0.0), (0.1, 1.0)]
    unlabeled = [(0.95, None), (0.85, None), (0.15, None)]
    df = spark.createDataFrame(
        labeled + unlabeled, "quality_prob double, label double"
    )
    want = {
        (r.threshold, r.tp, r.fp, r.fn, r.kept_frac)
        for r in threshold_report(
            spark.createDataFrame(labeled, "quality_prob double, label double"),
            "label", n_bins=10,
        ).collect()
    }
    got = {
        (r.threshold, r.tp, r.fp, r.fn, r.kept_frac)
        for r in threshold_report(df, "label", n_bins=10).collect()
    }
    assert got == want  # unlabeled rows are invisible to the report


def test_hashed_apply_broadcast_fallback_bit_identical(spark, hashed_model):
    """Above HASHED_LITERAL_CAP the apply path swaps the in-plan array
    literal for an explicit broadcast + Arrow kernel.  The two paths must
    be BIT-identical (the numpy fold replays the JVM aggregate()'s strict
    left-to-right IEEE order), so we force the fallback with literal_cap=1
    and compare logits exactly."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
    )

    df, w = hashed_model
    lit_rows = {
        r.doc_id: (r.quality_logit, r.quality_prob, r.quality_keep)
        for r in apply_quality_classifier_hashed(df, w).collect()
    }
    bc_rows = {
        r.doc_id: (r.quality_logit, r.quality_prob, r.quality_keep)
        for r in apply_quality_classifier_hashed(df, w, literal_cap=1).collect()
    }
    assert lit_rows == bc_rows  # exact float equality, not approx
    # empty/null text scores bias on the fallback path too
    edge = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    lit = {r.doc_id: r.quality_logit for r in apply_quality_classifier_hashed(edge, w).collect()}
    bc = {r.doc_id: r.quality_logit for r in apply_quality_classifier_hashed(edge, w, literal_cap=1).collect()}
    assert lit == bc


def test_curriculum_packing_composition(spark, model):
    """The epoch-write composition (chunk -> pack -> curriculum order):
    pack assignment is a pure content-hash function so it neither
    depends on nor perturbs the curriculum order; the composed output is
    band-monotone, carries pack_id through, matches the unpacked
    curriculum's (doc, chunk) sequence exactly, is deterministic across
    partition layouts, and keeps the per-pack token budget."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        chunk_documents,
        curriculum_order,
        pack_sequences,
    )

    df, w = model
    chunks = chunk_documents(df, chunk_tokens=8, overlap_tokens=2)
    packed = pack_sequences(chunks, token_budget=32, n_buckets=4)
    epoch = curriculum_order(
        packed, w, key_cols=["doc_id", "chunk_id"], text_col="chunk_text", bands=4
    )
    rows = epoch.collect()
    assert all(r.pack_id is not None for r in rows)  # pack rides through
    bands = [r.quality_band for r in rows]
    assert bands == sorted(bands)  # band-monotone after packing

    bare = curriculum_order(
        chunks, w, key_cols=["doc_id", "chunk_id"], text_col="chunk_text", bands=4
    ).collect()
    # packing changes NOTHING about the epoch order — same key sequence
    assert [(r.doc_id, r.chunk_id) for r in rows] == [
        (r.doc_id, r.chunk_id) for r in bare
    ]
    # ... and the same bands per chunk
    assert {(r.doc_id, r.chunk_id): r.quality_band for r in rows} == {
        (r.doc_id, r.chunk_id): r.quality_band for r in bare
    }

    # layout independence of the WHOLE composition (content-hash pack
    # assignment + content-hash curriculum order)
    rows2 = curriculum_order(
        pack_sequences(chunks.repartition(7), token_budget=32, n_buckets=4),
        w, key_cols=["doc_id", "chunk_id"], text_col="chunk_text", bands=4,
    ).collect()
    key = lambda r: (r.doc_id, r.chunk_id, r.pack_id, r.quality_band)
    assert [key(r) for r in rows2] == [key(r) for r in rows]

    # budget invariant survives the composition
    from collections import defaultdict

    per_pack = defaultdict(int)
    for r in rows:
        per_pack[r.pack_id] += r.n_chunk_tokens
    assert per_pack and all(v <= 32 for v in per_pack.values())


# ---------------------------------------------------------------------------
# Multi-class (softmax) hashed variant — the fastText lang-id shape
# ---------------------------------------------------------------------------

#: Four synthetic "languages" with disjoint function-word vocabularies
#: chosen so NONE of them hits the marker table in text._LANG_MARKERS —
#: the exact regime where the heuristic is blind and the trained model
#: must win.
_LANGS = {
    "aa": ["zor", "bek", "tam", "rup", "vel"],
    "bb": ["mul", "quen", "sorv", "plin", "dra"],
    "cc": ["ketu", "rano", "silv", "ormo", "tain"],
    "dd": ["wex", "jull", "brom", "stev", "karn"],
}


def _multilang_corpus(spark, n_each=30, offset=0):
    rows = []
    i = 0
    for code, vocab in sorted(_LANGS.items()):
        for j in range(n_each):
            ws = [vocab[(offset + j + p) % len(vocab)] for p in range(12)]
            rows.append((i, " ".join(ws) + f" doc{offset + j}", code))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def lang_model(spark):
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        train_multiclass_hashed,
    )

    df = _multilang_corpus(spark)
    # iters=10 is deliberate suite-wall budgeting: the vocabularies are
    # disjoint, so separation saturates by ~8 iterations (measured 1.000
    # train AND held-out accuracy at 8)
    return df, train_multiclass_hashed(
        df, label_col="lang", iters=10, n_buckets=512
    )


def test_multiclass_separates_languages_the_marker_heuristic_cannot(
    spark, lang_model
):
    """The planted-separation contract from the r14 verdict: four fake
    languages with disjoint vocabularies that share ZERO tokens with the
    marker table.  text.lang_id labels everything 'en' (no evidence ->
    English default) — 25% accuracy by construction; the trained softmax
    must recover the labels on both the train sample and a held-out
    slice built from the same vocabularies at shifted phase."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        lang_id_trained,
    )
    from real_time_financial_data_pipeline_spark.operators.text import lang_id

    df, w = lang_model
    heur = lang_id(df.select("doc_id", "text", "lang"))
    heur_acc = (
        heur.withColumn("ok", (F.col("lang_pred") == F.col("lang")).cast("double"))
        .agg(F.avg("ok")).first()[0]
    )
    assert heur_acc <= 0.25  # blind: every doc falls to the 'en' default

    def acc(frame):
        scored = lang_id_trained(frame, w)
        return (
            scored.withColumn(
                "ok", (F.col("lang_pred") == F.col("lang")).cast("double")
            ).agg(F.avg("ok")).first()[0]
        )

    assert acc(df) >= 0.95
    held_out = _multilang_corpus(spark, n_each=10, offset=100)
    assert acc(held_out) >= 0.95


def test_multiclass_apply_is_map_only_and_streaming_parity(
    spark, lang_model, tmp_path
):
    """The 100 TB contract: zero Exchange, zero Join in the executed
    plan (argmax + softmax fold entirely into one projection), and the
    SAME weights applied to a readStream frame yield identical
    predictions and probabilities."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_multiclass_hashed,
    )

    df, w = lang_model
    scored = apply_multiclass_hashed(df, w, out_col="pred", prob_col="p")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    src = str(tmp_path / "mcstream")
    df.select("doc_id", "text").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        apply_multiclass_hashed(stream, w, out_col="pred", prob_col="p")
        .writeStream.format("memory")
        .queryName("mc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: (r.pred, r.p) for r in spark.table("mc_stream").collect()}
    want = {r.doc_id: (r.pred, r.p) for r in scored.collect()}
    assert got == want and len(got) == df.count()


def test_multiclass_broadcast_fallback_bit_identical(spark, lang_model):
    """Forcing the above-cap broadcast path (literal_cap=1) must give
    byte-identical predictions AND probabilities — the numpy cumsum fold
    mirrors the JVM aggregate order, and argmax-on-first-max mirrors the
    greatest tiebreak toward the smallest class."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_multiclass_hashed,
    )

    df, w = lang_model
    lit = {
        r.doc_id: (r.pred, r.p)
        for r in apply_multiclass_hashed(df, w, out_col="pred", prob_col="p").collect()
    }
    bc = {
        r.doc_id: (r.pred, r.p)
        for r in apply_multiclass_hashed(
            df, w, out_col="pred", prob_col="p", literal_cap=1
        ).collect()
    }
    assert lit == bc


def test_multiclass_tie_break_and_empty_text(spark):
    """A zero-weight model scores every class identically: the argmax
    must deterministically pick the lexicographically SMALLEST class on
    both the literal and broadcast paths, and null/empty text must not
    poison anything (logits = per-class biases)."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        QC_HASH_SCHEME,
        apply_multiclass_hashed,
    )

    rows = [(-1, "bb", 0.0), (-1, "aa", 0.0), (-1, "cc", 0.0)]
    w = spark.createDataFrame(rows, "bucket int, label string, weight double")
    w = w.select(
        "bucket", "label",
        F.col("weight").alias(
            "weight",
            metadata={"qc_n_buckets": 64, "qc_ngram": 2, "qc_hash": QC_HASH_SCHEME},
        ),
    )
    df = spark.createDataFrame(
        [(1, "some words here"), (2, ""), (3, None)], "doc_id long, text string"
    )
    for cap in (10**9, 1):
        got = {
            r.doc_id: r.pred
            for r in apply_multiclass_hashed(df, w, literal_cap=cap).collect()
        }
        assert got == {1: "aa", 2: "aa", 3: "aa"}


def test_multiclass_trainer_and_weights_guards(spark, lang_model):
    """Contract guards: single-class corpora refuse to train; a weights
    table without bias rows refuses to apply; metadata contract is the
    SAME one the binary hashed model enforces (scheme mismatch raises);
    balance_classes recovers a planted minority class."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_multiclass_hashed,
        train_multiclass_hashed,
    )

    mono = spark.createDataFrame(
        [(1, "zor bek tam", "aa")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match=">= 2 classes"):
        train_multiclass_hashed(mono, label_col="lang", iters=1, n_buckets=16)

    df, w = lang_model
    no_bias = w.filter(F.col("bucket") >= 0)
    with pytest.raises(ValueError, match="bias row"):
        apply_multiclass_hashed(df, no_bias)

    # imbalanced corpus: class dd shrunk to 3 docs; balanced training
    # must still recover it on its own vocabulary
    small = _multilang_corpus(spark, n_each=30).filter(
        (F.col("lang") != "dd") | (F.col("doc_id") % 10 == 0)
    )
    wb = train_multiclass_hashed(
        small, label_col="lang", iters=10, n_buckets=256, balance_classes=True
    )
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        lang_id_trained,
    )

    dd_docs = _multilang_corpus(spark, n_each=8, offset=50).filter(
        F.col("lang") == "dd"
    )
    scored = lang_id_trained(dd_docs, wb)
    frac_dd = (
        scored.withColumn("ok", (F.col("lang_pred") == "dd").cast("double"))
        .agg(F.avg("ok")).first()[0]
    )
    assert frac_dd >= 0.75


def test_multiclass_trainer_dense_cap_fails_fast(spark):
    """The trainer's documented driver-memory ceiling is ENFORCED (r16
    verdict): K x n_buckets above TRAIN_DENSE_CAP raises a ValueError
    before the first iteration (and before the dense matrix allocates)
    instead of OOMing the driver mid-fit."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        TRAIN_DENSE_CAP,
        train_multiclass_hashed,
    )

    df = spark.createDataFrame(
        [(1, "aa bb cc", "x"), (2, "dd ee ff", "y")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="dense driver-weight ceiling"):
        train_multiclass_hashed(
            df, label_col="lang", iters=1, n_buckets=TRAIN_DENSE_CAP // 2 + 1
        )


def test_multiclass_apply_scratch_names_do_not_clobber_caller_columns(
    spark, lang_model
):
    """A caller frame already carrying _mc_tot/_mc_n/_mc columns must
    pass through untouched on BOTH apply paths (r16 advice: the literal
    path silently overwrote then dropped them), with predictions
    identical to the untagged apply."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_multiclass_hashed,
    )

    df, w = lang_model
    tagged = (
        df.withColumn("_mc_tot", F.lit(7))
        .withColumn("_mc_n", F.lit(8))
        .withColumn("_mc", F.lit(9))
    )
    base = {
        r.doc_id: r.pred
        for r in apply_multiclass_hashed(df, w, out_col="pred").collect()
    }
    for cap_kw in ({}, {"literal_cap": 0}):  # literal and broadcast paths
        out = apply_multiclass_hashed(
            tagged, w, out_col="pred", prob_col="p", **cap_kw
        )
        assert {"_mc_tot", "_mc_n", "_mc"} <= set(out.columns)
        rows = out.collect()
        assert all((r["_mc_tot"], r["_mc_n"], r["_mc"]) == (7, 8, 9) for r in rows)
        assert {r.doc_id: r.pred for r in rows} == base


def test_multiclass_lang_gate_in_curation_ladder(spark, lang_model):
    """lang_model= upgrades the ladder's language gate: on the planted
    fake-language corpus the marker heuristic routes EVERYTHING to 'en'
    (so langs=['aa'] keeps nothing), while the trained gate keeps
    exactly the aa documents — same ladder, same slot, different
    decision.  lang_model without langs fails fast."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
    )

    df, w = lang_model
    base = dict(min_quality=0.0, near_dup_threshold=None)
    heur = curate_documents(df, langs=["aa"], **base)
    assert heur.count() == 0  # heuristic is blind: everything is 'en'
    trained = curate_documents(df, langs=["aa"], lang_model=w, **base)
    got = {r.doc_id for r in trained.select("doc_id").collect()}
    want = {r.doc_id for r in df.filter(F.col("lang") == "aa").collect()}
    assert got == want and len(want) > 0
    with pytest.raises(ValueError, match="lang_model without langs"):
        curate_documents(df, lang_model=w, **base)


def test_multiclass_report_confusion_metrics(spark):
    """multiclass_report against a hand-computed confusion table,
    including the two degenerate class shapes: a class that is never
    predicted (recall 0, precision NULL) and a phantom class predicted
    but never true (precision 0, recall NULL); NULL labels excluded."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        multiclass_report,
    )

    rows = (
        [("aa", "aa")] * 3 + [("aa", "bb")] * 1        # aa: 3 tp of 4 true
        + [("bb", "bb")] * 2 + [("bb", "cc")] * 2      # bb: 2 tp of 4 true
        + [("dd", "aa")] * 2                           # dd never predicted
        + [(None, "aa")]                               # unlabeled: excluded
    )
    scored = spark.createDataFrame(rows, "label string, pred string")
    got = {r["class"]: r.asDict() for r in multiclass_report(scored).collect()}
    assert set(got) == {"aa", "bb", "cc", "dd"}
    aa = got["aa"]
    # n_pred counts only LABELED rows: 3 (aa,aa) + 2 (dd,aa); the
    # unlabeled (None, aa) row is excluded from every count
    assert (aa["n_true"], aa["n_pred"], aa["tp"]) == (4, 5, 3)
    assert aa["precision"] == 0.6 and aa["recall"] == 0.75
    assert aa["f1"] == 0.666667
    bb = got["bb"]
    assert (bb["n_true"], bb["n_pred"], bb["tp"]) == (4, 3, 2)
    # cc: phantom class — predicted twice, never true
    cc = got["cc"]
    assert (cc["n_true"], cc["n_pred"], cc["tp"]) == (0, 2, 0)
    assert cc["precision"] == 0.0 and cc["recall"] is None and cc["f1"] == 0.0
    # dd: never predicted — recall 0, precision undefined
    dd = got["dd"]
    assert (dd["n_true"], dd["n_pred"], dd["tp"]) == (2, 0, 0)
    assert dd["precision"] is None and dd["recall"] == 0.0 and dd["f1"] == 0.0


def test_multiclass_report_on_trained_model(spark, lang_model):
    """End to end: the trained planted-language model's report shows
    perfect per-class metrics on its separable corpus — and the report's
    totals reconcile (Σ n_pred == Σ n_true == corpus size)."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        lang_id_trained,
        multiclass_report,
    )

    df, w = lang_model
    scored = lang_id_trained(df, w)
    rep = multiclass_report(scored, label_col="lang", pred_col="lang_pred")
    rows = rep.collect()
    assert {r["class"] for r in rows} == {"aa", "bb", "cc", "dd"}
    assert all(r.f1 == 1.0 for r in rows)
    assert sum(r.n_pred for r in rows) == sum(r.n_true for r in rows) == df.count()


def test_multiclass_trainer_scoring_paths_bit_identical(spark):
    """The trainer's two scoring kernels (broadcast matrix — the default
    — vs in-plan literal fold, forced via literal_cap) must produce
    BYTE-identical trained weight tables: the numpy cumsum fold mirrors
    the JVM aggregate order, so the per-iteration logits, residuals,
    and therefore every gradient step agree exactly.  This is what
    makes the default-path switch (r16: training broadcasts, apply
    keeps literals below the cap) a pure performance change."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        train_multiclass_hashed,
    )

    df = _multilang_corpus(spark, n_each=6)
    # 3 iterations: any kernel divergence compounds per step, so three
    # full update cycles (scoring + gradient + bias) already witness the
    # bit-identity; more iterations only add suite wall
    kw = dict(label_col="lang", iters=3, n_buckets=64)
    bc_rows = sorted(
        (r.bucket, r.label, r.weight)
        for r in train_multiclass_hashed(df, **kw).collect()
    )
    lit_rows = sorted(
        (r.bucket, r.label, r.weight)
        for r in train_multiclass_hashed(df, **kw, literal_cap=1 << 30).collect()
    )
    assert bc_rows == lit_rows and len(bc_rows) > 4


def test_multiclass_apply_at_fasttext_width(spark):
    """fastText-realistic model width — K=20 classes x 2,097,152 buckets
    (a 40M-weight, ~335 MB dense matrix, far past HASHED_LITERAL_CAP):
    the apply must (a) take the broadcast-matrix path without inflating
    the plan, (b) stay ZERO-exchange map-only (the 100 TB contract: the
    pass scales with executor count and nothing else), and (c) agree
    exactly with a driver-side numpy replay of bias + mean-pooled
    weights + first-max argmax on every document."""
    import numpy as np

    from real_time_financial_data_pipeline_spark.operators.classifier import (
        HASHED_LITERAL_CAP,
        QC_HASH_SCHEME,
        apply_multiclass_hashed,
        hashed_ngram_buckets,
    )

    k, n_buckets = 20, 1 << 21
    assert k * n_buckets > HASHED_LITERAL_CAP
    classes = [f"c{i:02d}" for i in range(k)]
    # deterministic sparse weights: ~60 nonzero buckets per class plus
    # distinct biases (distinct biases keep no-evidence docs tie-free;
    # the tie RULE itself is pinned by test_multiclass_tie_break_*)
    rows = [(-1, classes[c], 0.01 * c - 0.1) for c in range(k)]
    for c in range(k):
        for j in range(60):
            b = (c * 104729 + j * 34807) % n_buckets
            rows.append((b, classes[c], ((c * 31 + j * 7) % 11 - 5) * 0.25))
    w = spark.createDataFrame(
        rows, "bucket int, label string, weight double"
    ).select(
        "bucket",
        "label",
        F.col("weight").alias(
            "weight",
            metadata={
                "qc_n_buckets": n_buckets,
                "qc_ngram": 2,
                "qc_hash": QC_HASH_SCHEME,
            },
        ),
    )
    # coalesce(2): each reused Python worker unpickles the 335 MB
    # broadcast once — tiny test data spread over 32 partitions would pay
    # that 32x (measured: the unpickle fan-out, not the scoring, was
    # ~100 s of this test's wall).  Production amortizes the same
    # per-worker cost over billions of rows.
    docs = _multilang_corpus(spark, n_each=12).select("doc_id", "text").coalesce(2)
    scored = apply_multiclass_hashed(docs, w, out_col="pred", prob_col="p")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan

    # numpy replay with the kernel's own fold order
    dense = np.zeros((k, n_buckets))
    biases = np.zeros(k)
    for b, lab, wt in rows:
        c = classes.index(lab)
        if b == -1:
            biases[c] = wt
        else:
            dense[c, b] = wt
    bks = {
        r.doc_id: list(r.bks)
        for r in docs.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), n_buckets, 2).alias("bks")
        ).collect()
    }
    got = {r.doc_id: r.pred for r in scored.collect()}
    assert len(got) == len(bks) > 0
    for doc_id, arr in bks.items():
        a = np.asarray(arr, dtype=np.int64)
        z = (
            biases.copy()
            if a.size == 0
            else biases + np.cumsum(dense[:, a], axis=1)[:, -1] / a.size
        )
        assert got[doc_id] == classes[int(np.argmax(z))], doc_id


def test_anchor_profile_flips_borderline_doc_in_curation_ladder(spark):
    """End-to-end closure of the anchor-text surface (r15 verdict #3):
    a quality model TRAINED on text + anchor terms (the same
    with_anchor_terms composition the ladder applies) keeps a planted
    borderline document that the text-only ladder drops — the web's
    description of the domain is the deciding evidence.  Also pins: a
    doc on an unlinked domain scores on its prose alone (NULL anchor is
    skipped, never a drop), and the knob guards fail fast."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier_hashed,
        train_quality_classifier_hashed,
    )
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        anchor_profile,
        with_anchor_terms,
    )
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
        prepare_training_set,
    )

    vocab_a = "alpha beta gamma delta epsilon zeta eta theta".split()
    vocab_b = "zork grib mulx vren klop snib trag womp".split()
    links = spark.createDataFrame(
        [
            (f"https://good.example/p{i}", "trusted reference encyclopedia archive")
            for i in range(6)
        ]
        + [
            (f"https://spam.example/p{i}", "casino pills lottery banner")
            for i in range(6)
        ],
        "dst string, anchor_text string",
    )
    profile = anchor_profile(links, k=4, stopwords=[])

    def mk(doc_id, uri, words, label):
        return (doc_id, uri, " ".join(words), label)

    train_rows = [
        mk(i, f"https://good.example/p{i}",
           [vocab_a[(i + p) % 8] for p in range(8)], 1.0)
        for i in range(12)
    ] + [
        mk(100 + i, f"https://spam.example/p{i}",
           [vocab_b[(i + p) % 8] for p in range(8)], 0.0)
        for i in range(12)
    ]
    train = spark.createDataFrame(
        train_rows, "doc_id long, uri string, text string, label double"
    )
    # train on the SAME composition the ladder scores with
    combined = with_anchor_terms(train, profile, "uri", out_col="_a").withColumn(
        "text_plus", F.concat_ws(" ", F.col("text"), F.col("_a"))
    )
    w = train_quality_classifier_hashed(
        combined, "label", "text_plus", n_buckets=8192, iters=15
    )

    # borderline doc: one spam-vocab token + three unseen tokens, but it
    # lives on the well-described domain; control doc: same text on an
    # unlinked domain
    borderline_text = "grib quuxone quuxtwo quuxthree"
    docs = spark.createDataFrame(
        [
            (1, "https://good.example/border", borderline_text),
            (2, "https://unlinked.example/x", borderline_text),
        ],
        "doc_id long, uri string, text string",
    )
    anchored = with_anchor_terms(docs, profile, "uri", out_col="_a").withColumn(
        "text_plus", F.concat_ws(" ", F.col("text"), F.col("_a"))
    )
    logits = {
        r.doc_id: (r.text_logit, r.anchored_logit)
        for r in apply_quality_classifier_hashed(
            apply_quality_classifier_hashed(
                anchored, w, "text", logit_col="text_logit",
                prob_col="_p1", keep_col="_k1",
            ),
            w, "text_plus", logit_col="anchored_logit",
            prob_col="_p2", keep_col="_k2",
        ).collect()
    }
    # the planted geometry: text alone scores negative (spam evidence
    # only), the anchor terms carry it positive
    assert logits[1][0] < 0 < logits[1][1]
    assert logits[2][0] == logits[2][1]  # unlinked: anchors change nothing

    base = dict(min_quality=0.0, near_dup_threshold=None,
                quality_model=w, quality_model_threshold=0.5)
    text_only = curate_documents(docs, **base)
    assert {r.doc_id for r in text_only.collect()} == set()
    with_anchors = curate_documents(
        docs, anchor_profile=profile, url_col="uri", **base
    )
    assert {r.doc_id for r in with_anchors.collect()} == {1}
    # anchor scratch columns are dropped: same schema as the plain ladder
    assert set(with_anchors.columns) == set(text_only.columns)
    assert not {"_kc_anchor", "_kc_gate_text"} & set(with_anchors.columns)

    with pytest.raises(ValueError, match="anchor_profile requires url_col"):
        curate_documents(docs, anchor_profile=profile, **base)
    with pytest.raises(ValueError, match="anchor_broadcast without"):
        curate_documents(docs, anchor_broadcast=True, **base)
    with pytest.raises(ValueError, match="anchor_profile requires url_col"):
        prepare_training_set(docs, anchor_profile=profile)


def test_dense_array_lit_bit_identical_to_lit(spark):
    """_dense_array_lit (the one-parser-call array literal that removed
    ~6 s of per-element py4j wall from every hashed-model plan build)
    must produce BIT-identical doubles to F.lit across the value edge
    cases (signed zero, denormal min, huge/tiny magnitudes), and fall
    back to F.lit when a value is non-finite."""
    import math
    import struct as st

    from real_time_financial_data_pipeline_spark.operators.classifier import (
        _dense_array_lit,
    )

    w = [0.0, -0.0, 1.5, -2.25, 1e-300, -1e300, 5e-324,
         123456789.123456789, 0.1 + 0.2, math.pi]
    r = spark.range(1).select(
        F.lit(w).alias("a"), _dense_array_lit(w).alias("b")
    ).first()
    assert [st.pack("<d", x) for x in r.a] == [st.pack("<d", x) for x in r.b]
    nf = [1.0, float("inf"), 2.0]
    r2 = spark.range(1).select(
        F.lit(nf).alias("a"), _dense_array_lit(nf).alias("b")
    ).first()
    assert list(r2.a) == list(r2.b) and math.isinf(r2.b[1])
