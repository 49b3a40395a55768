"""KMV sketch family: exactness, merge identity, estimate accuracy,
overlap estimation, layout independence, and the k metadata contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.sketches import (
    kmv_estimate,
    kmv_overlap,
    kmv_sketch,
    kmv_union,
    merge_kmv_tables,
)


def _values(spark, vals, stratum=None):
    rows = [(v, stratum if stratum is not None else "s") for v in vals]
    return spark.createDataFrame(rows, "v string, stratum string")


def test_underfull_sketch_is_exact(spark):
    df = _values(spark, [f"x{i}" for i in range(50)] * 3)  # 50 distinct, dups
    sk = kmv_sketch(df, "v", k=256)
    row = sk.select(
        F.size("kmv").alias("n"), kmv_estimate(F.col("kmv"), 256).alias("est")
    ).head()
    assert row.n == 50 and row.est == 50.0


def test_estimate_accuracy_at_scale(spark):
    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    est = kmv_sketch(df, "v", k=1024).select(
        kmv_estimate(F.col("kmv"), 1024).alias("est")
    ).head().est
    assert abs(est - n) / n < 0.12, est  # RSE ~ 1/sqrt(k) ~ 3%; 4 sigma


def test_merge_equals_sketch_of_union_exactly(spark):
    a = spark.range(0, 3000).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(0, 3000).select(
        F.concat(F.lit("a"), (F.col("id") + 1500)).alias("v")  # 50% overlap
    )
    k = 128
    ska, skb = kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k)
    merged = merge_kmv_tables(ska, skb).head().kmv
    direct = kmv_sketch(a.union(b), "v", k=k).head().kmv
    assert merged == direct  # exact array equality, not an approximation


def test_daily_fold_equals_all_at_once(spark):
    days = [
        spark.range(i * 400, (i + 1) * 400 + 100).select(  # overlapping days
            F.concat(F.lit("d"), F.col("id")).alias("v")
        )
        for i in range(4)
    ]
    k = 64
    folded = kmv_sketch(days[0], "v", k=k)
    for d in days[1:]:
        folded = merge_kmv_tables(folded, kmv_sketch(d, "v", k=k))
    whole = days[0]
    for d in days[1:]:
        whole = whole.union(d)
    assert folded.head().kmv == kmv_sketch(whole, "v", k=k).head().kmv


def test_keyed_sketches_and_one_sided_strata(spark):
    df = _values(spark, [f"p{i}" for i in range(300)], "en").union(
        _values(spark, [f"q{i}" for i in range(40)], "de")
    )
    sk = kmv_sketch(df, "v", key_cols=["stratum"], k=128)
    rows = {r.stratum: r for r in sk.collect()}
    assert set(rows) == {"en", "de"}
    assert len(rows["de"].kmv) == 40  # underfull -> complete hash set
    # overlap vs a table having only 'en': 'de' reports one-sided
    other = kmv_sketch(
        _values(spark, [f"p{i}" for i in range(150, 450)], "en"),
        "v", key_cols=["stratum"], k=128,
    )
    ov = {r.stratum: r for r in kmv_overlap(sk, other, ["stratum"]).collect()}
    assert ov["de"].distinct_b_est == 0.0 and ov["de"].jaccard_est == 0.0
    assert ov["de"].distinct_a_est == 40.0
    assert ov["en"].jaccard_est > 0.2  # true J = 150/450 = 0.333


def test_overlap_estimates_known_jaccard(spark):
    # |A| = |B| = 4000, |A ∩ B| = 2000 -> J = 1/3, union = 6000
    a = spark.range(0, 4000).select(F.concat(F.lit("n"), F.col("id")).alias("v"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("n"), F.col("id")).alias("v"))
    row = kmv_overlap(kmv_sketch(a, "v", k=1024), kmv_sketch(b, "v", k=1024)).head()
    assert abs(row.jaccard_est - 1 / 3) < 0.06
    assert abs(row.union_est - 6000) / 6000 < 0.12
    assert abs(row.overlap_est - 2000) / 2000 < 0.2


def test_layout_independence_and_null_exclusion(spark):
    base = _values(spark, [f"x{i}" for i in range(500)])
    with_nulls = base.union(spark.createDataFrame([(None, "s")], base.schema))
    k = 64
    one = kmv_sketch(with_nulls.coalesce(1), "v", k=k).head().kmv
    many = kmv_sketch(with_nulls.repartition(13), "v", k=k).head().kmv
    assert one == many


def test_persistence_round_trip_keeps_contract(spark, tmp_path):
    df = _values(spark, [f"x{i}" for i in range(100)])
    p = str(tmp_path / "sk")
    kmv_sketch(df, "v", k=32).write.parquet(p)
    loaded = spark.read.parquet(p)
    # metadata survives parquet -> merge works and k mismatch still raises
    merged = merge_kmv_tables(loaded, kmv_sketch(df, "v", k=32))
    assert merged.head().kmv == kmv_sketch(df, "v", k=32).head().kmv
    with pytest.raises(ValueError, match="different k"):
        merge_kmv_tables(loaded, kmv_sketch(df, "v", k=64))
    stripped = loaded.select(F.col("kmv").alias("kmv", metadata={"wiped": True}))
    with pytest.raises(ValueError, match="kmv_k metadata"):
        merge_kmv_tables(stripped, loaded)


def test_bad_args(spark):
    df = _values(spark, ["a"])
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "v", k=1)
    with pytest.raises(ValueError, match="sketch column"):
        merge_kmv_tables(df, df)


def test_union_expr_null_safe(spark):
    df = spark.createDataFrame([([1, 5], None)], "a array<long>, b array<long>")
    out = df.select(kmv_union(F.col("a"), F.col("b"), 4).alias("u")).head().u
    assert out == [1, 5]


# ---- bottom-k sample sketch (quantiles/means over snapshot unions) ----


def _iddf(spark, pairs):
    return spark.createDataFrame(pairs, "id string, x double")


def test_sample_sketch_underfull_quantiles_exact(spark):
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_sample_sketch,
        sample_mean,
        sample_quantile,
    )

    df = _iddf(spark, [(f"i{i}", float(i)) for i in range(100)])
    sk = kmv_sample_sketch(df, "x", "id", k=256)
    row = sk.select(
        F.size("kmv_sample").alias("n"),
        sample_quantile(F.col("kmv_sample"), 0.5).alias("med"),
        sample_quantile(F.col("kmv_sample"), 1.0).alias("mx"),
        F.round(sample_mean(F.col("kmv_sample")), 6).alias("mean"),
    ).head()
    assert row.n == 100 and row.mx == 99.0 and row.mean == 49.5
    assert row.med == 49.0  # nearest-rank: ceil(0.5*100) = 50th of 0..99


def test_sample_sketch_quantile_accuracy(spark):
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_sample_sketch,
        sample_quantile,
    )

    n = 30_000
    df = spark.range(n).select(
        F.concat(F.lit("i"), F.col("id")).alias("id"),
        F.col("id").cast("double").alias("x"),
    )
    row = kmv_sample_sketch(df, "x", "id", k=1024).select(
        sample_quantile(F.col("kmv_sample"), 0.9).alias("p90")
    ).head()
    assert abs(row.p90 - 0.9 * n) / n < 0.05, row.p90


def test_sample_sketch_merge_equals_direct_and_trend_contract(spark):
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_sample_sketch,
        merge_kmv_tables,
        sample_quantile,
    )

    day1 = _iddf(spark, [(f"a{i}", float(i)) for i in range(2000)])
    day2 = _iddf(spark, [(f"b{i}", float(i) * 2) for i in range(2000)])
    k = 128
    folded = merge_kmv_tables(
        kmv_sample_sketch(day1, "x", "id", k=k),
        kmv_sample_sketch(day2, "x", "id", k=k),
        sketch_col="kmv_sample",
    )
    direct = kmv_sample_sketch(day1.union(day2), "x", "id", k=k)
    assert folded.head().kmv_sample == direct.head().kmv_sample
    # and quantiles compose from the fold without rescanning day1/day2
    q = folded.select(sample_quantile(F.col("kmv_sample"), 0.5).alias("m")).head().m
    assert 1000 < q < 3000  # true pooled median ~1500 +- sampling error


def test_sample_sketch_duplicate_id_resolves_to_min_and_layout_free(spark):
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_sample_sketch,
    )

    df = _iddf(spark, [("dup", 9.0), ("dup", 3.0), ("only", 1.0)])
    one = kmv_sample_sketch(df.coalesce(1), "x", "id", k=8).head().kmv_sample
    many = kmv_sample_sketch(df.repartition(7), "x", "id", k=8).head().kmv_sample
    assert one == many
    assert sorted(e.v for e in one) == [1.0, 3.0]  # min value wins for dup


def test_sample_and_distinct_sketches_do_not_mix(spark):
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_overlap,
        kmv_sample_sketch,
        kmv_sketch,
        merge_kmv_tables,
        sample_quantile,
    )

    df = _iddf(spark, [(f"i{i}", float(i)) for i in range(20)])
    dist = kmv_sketch(df, "id", k=16).withColumnRenamed("kmv", "kmv_sample")
    samp = kmv_sample_sketch(df, "x", "id", k=16)
    with pytest.raises(ValueError, match="distinct sketch with a sample"):
        merge_kmv_tables(dist, samp, sketch_col="kmv_sample")
    with pytest.raises(ValueError, match="works on distinct"):
        kmv_overlap(samp.withColumnRenamed("kmv_sample", "kmv"),
                    samp.withColumnRenamed("kmv_sample", "kmv"))
    with pytest.raises(ValueError, match="q must be"):
        sample_quantile(F.col("kmv_sample"), 0.0)


def test_sample_sketch_keyed_persist_round_trip(spark, tmp_path):
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_sample_sketch,
        merge_kmv_tables,
        sample_quantile,
    )

    df = spark.createDataFrame(
        [(f"i{i}", float(i % 50), "en" if i % 2 else "de") for i in range(400)],
        "id string, x double, stratum string",
    )
    sk = kmv_sample_sketch(df, "x", "id", key_cols=["stratum"], k=64)
    p = str(tmp_path / "samp")
    sk.write.parquet(p)
    loaded = spark.read.parquet(p)
    again = merge_kmv_tables(loaded, sk, ["stratum"], sketch_col="kmv_sample")
    meds = {
        r.stratum: r.m
        for r in again.select(
            "stratum", sample_quantile(F.col("kmv_sample"), 0.5).alias("m")
        ).collect()
    }
    assert set(meds) == {"en", "de"} and all(0 <= m <= 49 for m in meds.values())


def test_sketch_tracks_curation_ladder_on_real_corpus(spark, documents):
    """Cross-family integration: sketch the documents table before and
    after the curation ladder.  Survivors are a SUBSET, so the overlap
    report must show intersection ~= |after| and jaccard ~=
    |after|/|before| — the nightly 'what did curation remove' readout,
    computed from two persisted sketches alone."""
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_overlap,
        kmv_sketch,
    )
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
    )

    before = documents
    after = curate_documents(before, min_quality=0.5)
    n_before, n_after = before.count(), after.count()
    assert 0 < n_after < n_before

    k = 256
    sk_before = kmv_sketch(before, "text", k=k)
    sk_after = kmv_sketch(after, "text", k=k)
    row = kmv_overlap(sk_before, sk_after).head()
    true_j = n_after / n_before  # subset => J = |after| / |before-distinct|
    assert abs(row.jaccard_est - true_j) < 0.15, (row.jaccard_est, true_j)
    assert row.overlap_est <= row.distinct_a_est * 1.2
    assert abs(row.distinct_b_est - n_after) / n_after < 0.25


def test_merge_keyed_tables_with_one_sided_strata(spark):
    """Full-outer fold: a stratum present in only one night's sketch
    table survives the merge unchanged (coalesced against empty)."""
    a = kmv_sketch(
        _values(spark, [f"p{i}" for i in range(60)], "en"), "v",
        key_cols=["stratum"], k=32,
    )
    b = kmv_sketch(
        _values(spark, [f"q{i}" for i in range(60)], "de"), "v",
        key_cols=["stratum"], k=32,
    )
    merged = {r.stratum: r.kmv for r in merge_kmv_tables(a, b, ["stratum"]).collect()}
    assert set(merged) == {"en", "de"}
    assert merged["en"] == a.head().kmv and merged["de"] == b.head().kmv


# --------------------------------------------------------------------------
# streaming fold (streaming/sketches.py)
# --------------------------------------------------------------------------


def _write_stream_files(spark, tmp_path, rows_per_file):
    src = tmp_path / "kmv_stream"
    for i, rows in enumerate(rows_per_file):
        spark.createDataFrame(rows, "lang string, text string").coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    schema = spark.read.parquet(str(src / "f0")).schema
    return spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*")), src


def test_stream_fold_equals_batch_sketch(spark, tmp_path):
    """availableNow drain of the fold == kmv_sketch over everything that
    arrived — EXACT array equality via the bottom-k-of-union identity,
    per key, across multiple micro-batches."""
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        latest_kmv_snapshot,
        read_kmv_trend,
        stream_kmv_fold,
    )

    files = [
        [("en", f"doc en {i}") for i in range(40)] + [("de", f"doc de {i}") for i in range(5)],
        [("en", f"doc en {i}") for i in range(20, 60)],  # overlap with file 0
        [("fr", f"doc fr {i}") for i in range(12)],
    ]
    stream, src = _write_stream_files(spark, tmp_path, files)
    sketch_path = str(tmp_path / "kmv_snap")
    q = stream_kmv_fold(
        stream, sketch_path, str(tmp_path / "ck"), "text",
        key_cols=["lang"], k=16, trigger_available_now=True,
    )
    q.awaitTermination(120)

    v, folded = latest_kmv_snapshot(spark, sketch_path)
    all_rows = [r for f in files for r in f]
    from real_time_financial_data_pipeline_spark.operators.sketches import kmv_sketch

    direct = kmv_sketch(
        spark.createDataFrame(all_rows, "lang string, text string"),
        "text", ["lang"], k=16,
    )
    got = {r.lang: list(r.kmv) for r in folded.collect()}
    want = {r.lang: list(r.kmv) for r in direct.collect()}
    assert got == want  # exact, as arrays

    # the trend ladder: one version per non-empty micro-batch, per-key
    # estimates monotone non-decreasing for the growing 'en' stratum
    trend = read_kmv_trend(spark, sketch_path, ["lang"]).collect()
    versions = sorted({r.version for r in trend})
    assert len(versions) == 3  # maxFilesPerTrigger=1 -> one fold per file
    en = [r.distinct_est for r in sorted(trend, key=lambda r: r.version) if r.lang == "en"]
    # a growing stratum's estimate is monotone BY CONSTRUCTION (superset
    # sketches have u_k <= the subset's), and the stratum persists in
    # every snapshot after it first appears
    assert en == sorted(en)
    assert len(en) >= 2


def test_fold_replay_is_idempotent(spark, tmp_path):
    """The exactly-once-in-effect claim: re-running the foreachBatch body
    with the SAME batch (the at-least-once crash-replay case) leaves the
    snapshot bit-identical — the union algebra absorbs re-delivery."""
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        latest_kmv_snapshot,
        make_sketch_folder,
    )

    sketch_path = str(tmp_path / "kmv_replay")
    fold = make_sketch_folder(sketch_path, "text", ["lang"], k=8)
    b0 = spark.createDataFrame(
        [("en", f"t{i}") for i in range(30)], "lang string, text string"
    )
    b1 = spark.createDataFrame(
        [("en", f"t{i}") for i in range(15, 45)] + [("de", "d0")],
        "lang string, text string",
    )
    fold(b0, 0)
    fold(b1, 1)
    after_once = {r.lang: list(r.kmv) for r in latest_kmv_snapshot(spark, sketch_path)[1].collect()}
    fold(b1, 1)  # crash-replay of batch 1
    after_replay = {r.lang: list(r.kmv) for r in latest_kmv_snapshot(spark, sketch_path)[1].collect()}
    assert after_once == after_replay

    # an empty batch adds no version and cannot annihilate the snapshot
    empty = spark.createDataFrame([], "lang string, text string")
    fold(empty, 2)
    v, snap = latest_kmv_snapshot(spark, sketch_path)
    assert v == 1
    assert {r.lang: list(r.kmv) for r in snap.collect()} == after_once


def test_fold_global_sketch_and_version_pruning(spark, tmp_path):
    """Keyless (global) fold + keep_versions retention: the ladder keeps
    only the newest N snapshots, and the surviving head still equals the
    batch sketch of everything folded."""
    from real_time_financial_data_pipeline_spark.operators.sketches import kmv_sketch
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        _list_versions,
        latest_kmv_snapshot,
        make_sketch_folder,
    )

    sketch_path = str(tmp_path / "kmv_global")
    fold = make_sketch_folder(sketch_path, "text", None, k=8, keep_versions=2)
    batches = [
        [(f"a{i}",) for i in range(20)],
        [(f"b{i}",) for i in range(20)],
        [(f"c{i}",) for i in range(20)],
        [(f"a{i}",) for i in range(10)],  # pure re-delivery
    ]
    for i, rows in enumerate(batches):
        fold(spark.createDataFrame(rows, "text string"), i)
    assert _list_versions(spark, sketch_path) == [2, 3]  # pruned to 2
    _, snap = latest_kmv_snapshot(spark, sketch_path)
    direct = kmv_sketch(
        spark.createDataFrame([r for b in batches for r in b], "text string"),
        "text", None, k=8,
    )
    assert [list(r.kmv) for r in snap.collect()] == [list(r.kmv) for r in direct.collect()]


def test_stream_fold_rejects_batch_frame(spark):
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        stream_kmv_fold,
    )

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="streaming"):
        stream_kmv_fold(df, "/tmp/x", "/tmp/ck", "text")


def test_stream_sample_sketch_fold_equals_batch(spark, tmp_path):
    """sample_id_col switches the fold to the bottom-k SAMPLE sketch:
    drained snapshot == kmv_sample_sketch over everything that arrived
    (exact, as struct arrays), replay stays idempotent, and the trend
    reader refuses sample snapshots (estimator-kind safety)."""
    from real_time_financial_data_pipeline_spark.operators.sketches import (
        kmv_sample_sketch,
        sample_quantile,
    )
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        latest_kmv_snapshot,
        make_sketch_folder,
        read_kmv_trend,
    )

    sketch_path = str(tmp_path / "kmv_sample_fold")
    fold = make_sketch_folder(
        sketch_path, "v", ["lang"], k=8, sample_id_col="rid"
    )
    b0 = spark.createDataFrame(
        [("en", i, float(i)) for i in range(25)], "lang string, rid long, v double"
    )
    b1 = spark.createDataFrame(
        [("en", i, float(i)) for i in range(10, 40)] + [("de", 1000, 5.0)],
        "lang string, rid long, v double",
    )
    fold(b0, 0)
    fold(b1, 1)
    fold(b1, 1)  # crash replay
    _, snap = latest_kmv_snapshot(spark, sketch_path)
    snap = snap.withColumnRenamed("kmv_sample", "s")
    direct = kmv_sample_sketch(
        b0.unionByName(b1), "v", "rid", ["lang"], k=8
    ).withColumnRenamed("kmv_sample", "s")
    got = {r.lang: [(x.h, x.v) for x in r.s] for r in snap.collect()}
    want = {r.lang: [(x.h, x.v) for x in r.s] for r in direct.collect()}
    assert got == want
    # quantiles read straight off the folded snapshot
    import pyspark.sql.functions as SF

    q = {
        r.lang: r.q
        for r in snap.select("lang", sample_quantile(SF.col("s"), 0.5).alias("q")).collect()
    }
    assert q["de"] == 5.0
    with pytest.raises(ValueError, match="sample_quantile"):
        read_kmv_trend(spark, sketch_path, ["lang"], sketch_col="kmv_sample")


def test_fold_replay_of_latest_batch_keyless(spark, tmp_path):
    """The review-caught crash-replay wedge: replaying the LATEST batch
    merges snapshot v=n while writing v=n — the stage-and-rename swap
    must make that safe (a direct overwrite deletes the lazy scan's
    input mid-job), for the GLOBAL sketch whose cross-join merge has no
    early shuffle to accidentally save it."""
    from real_time_financial_data_pipeline_spark.operators.sketches import kmv_sketch
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        latest_kmv_snapshot,
        make_sketch_folder,
    )

    sketch_path = str(tmp_path / "kmv_global_replay")
    fold = make_sketch_folder(sketch_path, "text", None, k=8)
    b0 = spark.createDataFrame([(f"a{i}",) for i in range(30)], "text string")
    b1 = spark.createDataFrame([(f"b{i}",) for i in range(30)], "text string")
    fold(b0, 0)
    fold(b1, 1)
    fold(b1, 1)  # replay of the LATEST batch: reads v=1 while writing v=1
    fold(b1, 1)  # and again (every restart replays it)
    v, snap = latest_kmv_snapshot(spark, sketch_path)
    assert v == 1
    direct = kmv_sketch(b0.unionByName(b1), "text", None, k=8)
    assert [list(r.kmv) for r in snap.collect()] == [
        list(r.kmv) for r in direct.collect()
    ]


def test_fold_keep_versions_validated(spark, tmp_path):
    """Review-caught silent no-op: keep_versions=0 made versions[:-0] the
    empty slice (nothing ever pruned, behaving like None) and negatives
    pruned a surprising prefix — both now fail fast at construction."""
    import pytest

    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        make_sketch_folder,
    )

    for bad in (0, -1):
        with pytest.raises(ValueError, match="keep_versions"):
            make_sketch_folder(str(tmp_path / "s"), "text", None, keep_versions=bad)
