"""Text analysis + multimodal plumbing."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    extract_features,
    fake_image_features,
    frame_sample_plan,
    media_stats,
)
from real_time_financial_data_pipeline_spark.operators.text import (
    char_ngrams,
    doc_grams,
    fingerprint,
    lang_id,
    ngrams,
    quality_score,
    token_stats,
    tokens,
)


def test_tokens_and_ngrams_edges(spark):
    df = spark.createDataFrame([(1, "A  b c d")], "doc_id long, text string")
    toks = df.select(tokens(F.col("text")).alias("t")).collect()[0].t
    assert toks == ["a", "b", "c", "d"]  # lowercased, empty tokens dropped
    g = df.select(ngrams(tokens(F.col("text")), 3).alias("g")).collect()[0].g
    assert g == ["a b c", "b c d"]
    short = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert short.select(ngrams(tokens(F.col("text")), 3).alias("g")).collect()[0].g == []
    cg = spark.createDataFrame([(1, "abcd")], "id long, text string").select(
        char_ngrams(F.col("text"), 2).alias("g")
    ).collect()[0].g
    assert cg == ["ab", "bc", "cd"]


def test_token_stats_values(spark):
    df = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    r = token_stats(df).collect()[0]
    assert r.n_tokens == 3 and r.n_chars_text == 11
    assert abs(r.avg_token_len - 3.0) < 1e-9
    assert abs(r.stopword_ratio - 1 / 3) < 1e-6


def test_staged_tokens_plan_shape(spark):
    """r17 staging contract: the token array is evaluated ONCE per row
    (CollapseProject's isCheap guard keeps the multiply-referenced alias
    materialized), the spread exchange carries the RAW text (tokenize runs
    AFTER it, on all cores), and the spread is skipped entirely when the
    batch input is already at least core-count partitions wide — at
    warehouse scale the corpus must not be shuffled 'for parallelism'."""
    narrow = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)],
        "doc_id long, text string",
    ).coalesce(1)
    plan = token_stats(narrow)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(") == 1  # single tokenize eval
    # the exchange input is the raw (doc_id, text) row, not the token array
    assert "RoundRobinPartitioning" in plan
    # top-down toString: the tokenize projection prints ABOVE the exchange,
    # i.e. it executes after it, on the spread partitions
    assert "split(" in plan.split("Exchange")[0]

    parallelism = spark.sparkContext.defaultParallelism
    wide = spark.createDataFrame(
        [(i, "a b c") for i in range(parallelism * 2)], "doc_id long, text string"
    ).repartition(parallelism * 2)
    wide_plan = token_stats(wide)._jdf.queryExecution().executedPlan().toString()
    # exactly the caller's repartition — _staged_tokens adds NO exchange
    assert wide_plan.count("RoundRobinPartitioning") == 1
    assert wide_plan.count("split(") == 1


def test_quality_score_bands(spark):
    rows = [(1, "the quick brown fox jumps high today"), (2, "x"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.quality_score for r in quality_score(df).collect()}
    assert out[1] == 1.0  # length ok + stopword + avg len ok
    assert out[2] <= 0.3 and out[3] <= 0.3


def test_lang_id_markers_and_determinism(spark):
    rows = [(1, "der hund und die katze"), (2, "le chat et les chiens"), (3, "zzz qqq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out[1] == "de" and out[2] == "fr" and out[3] == "en"
    out2 = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out == out2


def test_fingerprint_normalized_stability(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello world!")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert out[1] == out[2]  # case/whitespace-normalized identity
    assert out[1] != out[3]


def test_doc_grams_matches_inline_ngrams(documents):
    staged = {r.doc_id: r.grams for r in doc_grams(documents, n=3).collect()}
    inline = {
        r.doc_id: r.g
        for r in documents.select("doc_id", ngrams(tokens(F.col("text")), 3).alias("g")).collect()
    }
    assert staged == inline


def test_multimodal_plumbing(documents):
    media = attach_binary(documents)
    stats = media_stats(media).collect()[0]
    assert stats.kind == "image" and stats.n_media == documents.count()
    # byte totals (backing anchor for the retired multimodal_stats oracle
    # row): the fabric encodes text as UTF-8, so totals equal text bytes
    exp_total = sum(
        len(r.text.encode("utf-8")) for r in documents.select("text").collect()
    )
    assert stats.total_bytes == exp_total
    assert abs(stats.avg_bytes - exp_total / stats.n_media) < 1e-6

    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == documents.count()
    one = rows[0]
    blob_df = media.filter(F.col("media_id") == one.media_id).collect()[0]
    exp_mean, exp_std = fake_image_features(bytes(blob_df.bytes))
    assert abs(one.feat_mean - exp_mean) < 1e-9 and one.byte_len == len(bytes(blob_df.bytes))


def test_decode_image_is_a_stub_without_codec():
    # non-netpbm formats still need an injected codec (the one remaining
    # environment stub, opt-in since r11)
    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")
    assert decode_image(b"x", codec=lambda b: len(b)) == 1


def test_decode_ppm_roundtrip_and_header_edges():
    """r11: PPM/PGM are REAL decodes now — encode→decode is the identity,
    headers with comments parse, truncation and 2-byte maxvals raise."""
    import numpy as np

    from real_time_financial_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rgb = (np.arange(7 * 5 * 3, dtype=np.int64) * 37 % 256).astype(np.uint8).reshape(5, 7, 3)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    gray = (np.arange(6 * 4, dtype=np.int64) * 11 % 256).astype(np.uint8).reshape(4, 6)
    out = decode_ppm(encode_ppm(gray))
    assert out.ndim == 2 and np.array_equal(out, gray)
    # decode_image dispatches netpbm natively, no codec argument
    assert np.array_equal(decode_image(encode_ppm(rgb)), rgb)

    # comment lines and multi-whitespace in the header are legal netpbm
    commented = b"P6\n# a comment\n7 # trailing\n# another\n 5\n255\n" + rgb.tobytes()
    assert np.array_equal(decode_ppm(commented), rgb)

    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(rgb)[:-1])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="P6/P5"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII variant unsupported
    with pytest.raises(ValueError, match="shape"):
        encode_ppm(np.zeros((2, 2, 4), dtype=np.uint8))


def test_wav_roundtrip_and_audio_features(documents):
    """r11: WAV decodes REAL audio (stdlib wave + numpy) — encode→decode
    identity incl. stereo, non-PCM16 raises, and the distributed feature
    pass matches a local numpy recompute on the same blobs."""
    import numpy as np

    from real_time_financial_data_pipeline_spark.operators.multimodal import (
        attach_wav_audio,
        decode_wav,
        encode_wav,
        extract_audio_features,
    )

    mono = (np.sin(np.linspace(0, 20, 400)) * 10000).astype(np.int16)
    got, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(got, mono)
    stereo = np.stack([mono, -mono], axis=1)
    got2, _ = decode_wav(encode_wav(stereo, 16000))
    assert got2.shape == stereo.shape and np.array_equal(got2, stereo)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")

    media = attach_wav_audio(documents.limit(30))
    feats = {r.media_id: r for r in extract_audio_features(media).collect()}
    blobs = {r.media_id: bytes(r.bytes) for r in media.collect()}
    assert set(feats) == set(blobs) and len(feats) == 30
    for mid, blob in blobs.items():
        samples, rate = decode_wav(blob)
        x = samples.astype(np.float64) / 32768.0
        f = feats[mid]
        assert f.sample_rate == rate and f.n_samples == len(x)
        assert abs(f.duration_s - len(x) / rate) < 1e-12
        assert abs(f.rms - float(np.sqrt((x**2).mean()))) < 1e-12
        assert abs(
            f.zero_cross_rate - float((np.diff(np.signbit(x)) != 0).mean())
        ) < 1e-12
        assert f.byte_len == len(blob)
    # id-derived frequencies differ -> zero-crossing rates differ
    zcrs = {round(f.zero_cross_rate, 6) for f in feats.values()}
    assert len(zcrs) > 5


def test_ppm_stream_and_frame_extraction(documents):
    """r11: the video path is real — multi-frame netpbm streams round-trip,
    extract_frames executes the sampling plan on actual bytes, and the
    per-frame features prove WHICH frame was decoded (each frame's pixel
    ramp is index-shifted)."""
    import math

    import numpy as np

    from real_time_financial_data_pipeline_spark.operators.multimodal import (
        attach_ppm_video,
        decode_ppm_stream,
        encode_ppm_stream,
        extract_frames,
        frame_sample_plan,
    )

    frames = [
        (np.arange(4 * 6 * 3, dtype=np.int64) * (7 + i) % 256)
        .astype(np.uint8)
        .reshape(4, 6, 3)
        for i in range(3)
    ]
    got = decode_ppm_stream(encode_ppm_stream(frames))
    assert len(got) == 3 and all(np.array_equal(a, b) for a, b in zip(got, frames))
    with pytest.raises(ValueError, match="empty|P6/P5"):
        decode_ppm_stream(b"")

    media = attach_ppm_video(documents.limit(20), fps=4.0)
    plan_counts = {
        r.media_id: r.n
        for r in frame_sample_plan(media, 0.5)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = extract_frames(media, 0.5)
    rows = out.collect()
    by_media: dict = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(plan_counts)
    blobs = {r.media_id: (bytes(r.bytes), r.duration_s) for r in media.collect()}
    for mid, rs in by_media.items():
        assert len(rs) == plan_counts[mid]  # every planned ts extracted
        local = decode_ppm_stream(blobs[mid][0])
        dur = blobs[mid][1]
        for r in rs:
            idx = min(len(local) - 1, max(0, int(r.frame_ts / dur * len(local))))
            px = local[idx].astype(np.float64)
            assert r.frame_index == idx
            assert (r.height, r.width) == px.shape[:2]
            assert abs(r.feat_mean - px.mean()) < 1e-9
            assert abs(r.feat_std - px.std()) < 1e-9
        # multiple distinct frames actually sampled (not frame 0 repeated)
        if len(rs) > 2:
            assert len({r.frame_index for r in rs}) > 1


def test_extract_features_on_real_pixels(documents):
    """End-to-end distributed decode: deterministic PPM payloads through
    mapInPandas with the real pixel kernel — feat_mean/std must equal a
    local numpy decode of the same blob, and differ from raw-byte stats
    (the header bytes prove the kernel really decoded)."""
    import numpy as np

    from real_time_financial_data_pipeline_spark.operators.multimodal import (
        attach_ppm_images,
        decode_ppm,
        fake_image_features,
        image_pixel_features,
    )

    media = attach_ppm_images(documents.limit(40))
    feats = {r.media_id: r for r in extract_features(media, kernel=image_pixel_features).collect()}
    blobs = {r.media_id: bytes(r.bytes) for r in media.collect()}
    assert set(feats) == set(blobs) and len(feats) == 40
    for mid, blob in blobs.items():
        px = decode_ppm(blob).astype(np.float64)
        assert abs(feats[mid].feat_mean - px.mean()) < 1e-9
        assert abs(feats[mid].feat_std - px.std()) < 1e-9
        assert feats[mid].byte_len == len(blob)
        # decoded stats differ from raw-byte stats (header included there)
        raw_mean, _ = fake_image_features(blob)
        assert abs(raw_mean - px.mean()) > 1e-12
    # metadata matches the actual decoded dimensions
    for r in media.collect():
        px = decode_ppm(bytes(r.bytes))
        assert (r.height, r.width) == px.shape[:2]


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, "video", 2.5), (2, "image", None)], "media_id long, kind string, duration_s double"
    )
    plan = frame_sample_plan(media, 1.0).collect()
    assert [r.frame_ts for r in plan] == [0.0, 1.0, 2.0]  # only the video, sampled


def test_top_terms_ranks_and_excludes_stopwords(spark):
    from real_time_financial_data_pipeline_spark.operators.text import top_terms

    df = spark.createDataFrame(
        [
            ("s1", "apple apple apple banana banana the the the the cherry"),
            ("s2", "dog dog cat"),
        ],
        "source string, text string",
    )
    out = {(r.source, r.rank): (r.term, r.n) for r in top_terms(df, k=2).collect()}
    assert out[("s1", 1)] == ("apple", 3)   # 'the' excluded despite 4 hits
    assert out[("s1", 2)] == ("banana", 2)
    assert out[("s2", 1)] == ("dog", 2)
    assert out[("s2", 2)] == ("cat", 1)
    assert ("s1", 3) not in out  # k bound holds


def test_tf_idf_matches_python_reference(spark):
    from collections import Counter
    from math import log

    from real_time_financial_data_pipeline_spark.operators.text import tf_idf_top_terms

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry durian"),
        (3, "apple apple apple elderberry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.term): (r.tf, r.tf_idf, r.rank)
        for r in tf_idf_top_terms(df, k=10, stopwords=[]).collect()
    }

    tfs = {i: Counter(t.split()) for i, t in docs}
    dfreq = Counter(term for c in tfs.values() for term in c)
    n = len(docs)
    for doc_id, counts in tfs.items():
        scored = sorted(
            (
                (round(tf * (log((n + 1) / (dfreq[term] + 1)) + 1), 6), term, tf)
                for term, tf in counts.items()
            ),
            key=lambda s: (-s[0], s[1]),
        )
        for rank, (score, term, tf) in enumerate(scored, start=1):
            assert got[(doc_id, term)] == (tf, pytest.approx(score, abs=1e-6), rank)


def test_tf_idf_rare_term_outranks_common_term(spark):
    from real_time_financial_data_pipeline_spark.operators.text import tf_idf_top_terms

    # "common" appears in every doc, each unique term in exactly one — with
    # equal tf the unique term must score higher
    df = spark.createDataFrame(
        [(i, f"common unique{i}") for i in range(5)], "doc_id long, text string"
    )
    out = tf_idf_top_terms(df, k=1, stopwords=[]).collect()
    assert all(r.term == f"unique{r.doc_id}" for r in out)


def test_tf_idf_precomputed_n_docs_parity(spark):
    """Passing n_docs (the composed-pipeline fast path that skips the eager
    per-call distinct+count) must give the identical result as the
    self-counting default."""
    from real_time_financial_data_pipeline_spark.operators.text import tf_idf_top_terms

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry durian"),
        (3, "apple apple apple elderberry"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    key = lambda r: (r.doc_id, r.rank)
    self_counted = sorted(tf_idf_top_terms(df, k=10, stopwords=[]).collect(), key=key)
    precomputed = sorted(
        tf_idf_top_terms(df, k=10, stopwords=[], n_docs=3).collect(), key=key
    )
    assert self_counted == precomputed
    # a WRONG n_docs shifts every idf: the caller owns the contract
    wrong = tf_idf_top_terms(df, k=10, stopwords=[], n_docs=30).collect()
    assert {r.tf_idf for r in wrong} != {r.tf_idf for r in self_counted}


def test_regex_tokens_gpt2_pretokenizer_pinned_cases(spark):
    """BPE-ish pre-tokenization: pinned piece sequences for contractions,
    space-prefixed words, digit runs, punctuation runs, and trailing
    whitespace — the published GPT-2 pre-tokenizer behavior."""
    from real_time_financial_data_pipeline_spark.operators.text import regex_tokens

    cases = {
        "Hello world": ["Hello", " world"],
        "don't stop": ["don", "'t", " stop"],
        "a1b2": ["a", "1", "b", "2"],
        "price: $5.99": ["price", ":", " $", "5", ".", "99"],
        "hi!!": ["hi", "!!"],
        "a  ": ["a", "  "],
        "": [],
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r.text: r.pieces for r in df.select(
        "text", regex_tokens(F.col("text")).alias("pieces")).collect()}
    for text, expected in cases.items():
        assert got[text] == expected, (text, got[text])


def test_token_count_estimate_map_only_and_bounds(documents):
    """The estimator must be a zero-Exchange narrow projection, and on real
    prose the BPE-ish piece count is >= the whitespace token count (pieces
    split punctuation off words) while staying within a sane multiple."""
    from real_time_financial_data_pipeline_spark.operators.text import (
        token_count_estimate,
    )

    est = token_count_estimate(documents.limit(200))
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    rows = est.collect()
    assert rows
    for r in rows:
        if r.n_ws_tokens > 0:
            assert r.n_bpe_pieces >= r.n_ws_tokens
            assert r.n_bpe_pieces <= 4 * r.n_ws_tokens


class TestCorpusReport:
    def test_planted_profile(self, spark):
        from real_time_financial_data_pipeline_spark.operators.text import (
            corpus_report,
        )

        text_a = "the quick brown fox jumps over the lazy dog today"  # 10 toks
        rows = (
            [(i, text_a, "en", "web") for i in range(8)]          # 8 copies
            + [(8, "completely different words entirely here now", "en", "web")]
            + [(9, "kurze deutsche zeile ohne bedeutung hier", "de", "web")]
            + [(10 + i, f"book text number {i} with several plain words", "en", "books")
               for i in range(5)]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
        rep = {r["source"]: r for r in corpus_report(df).collect()}
        web, books = rep["web"], rep["books"]
        assert web["n_docs"] == 10 and books["n_docs"] == 5
        # 10 web docs, 3 distinct texts -> dup rate 0.7 (HLL exact at this size)
        assert abs(web["dup_rate_est"] - 0.7) < 0.05
        assert books["dup_rate_est"] == 0.0
        assert web["top_lang"] == "en" and abs(web["top_lang_share"] - 0.9) < 1e-9
        assert books["top_lang"] == "en" and books["top_lang_share"] == 1.0
        assert web["n_tokens"] == 8 * 10 + 6 + 6
        assert books["p50_tokens"] == 8

    def test_one_corpus_scan(self, spark, documents):
        from real_time_financial_data_pipeline_spark.operators.text import (
            corpus_report,
        )

        rep = corpus_report(documents)
        plan = rep._jdf.queryExecution().executedPlan().toString()
        # the corpus-grain aggregate appears once with a partial phase;
        # the lang join is broadcast (no SMJ of the corpus against itself)
        assert "SortMergeJoin" not in plan
        assert plan.count("FileScan") <= 2  # corpus + the tiny lang re-scan
        rows = rep.collect()
        assert rows and all(r["n_docs"] > 0 for r in rows)

    def test_null_stratum_reported(self, spark):
        from real_time_financial_data_pipeline_spark.operators.text import (
            corpus_report,
        )

        rows = [
            (0, "alpha beta gamma delta epsilon", "en", None),
            (1, "one two three four five six", "en", None),
            (2, "sieben acht neun zehn elf", "de", "web"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        rep = {r["source"]: r for r in corpus_report(df).collect()}
        assert None in rep and rep[None]["n_docs"] == 2
        assert rep[None]["top_lang"] == "en"
        assert rep["web"]["n_docs"] == 1
        # totals across strata cover the whole corpus
        assert sum(r["n_docs"] for r in rep.values()) == 3

    def test_drift_between_snapshots(self, spark, tmp_path):
        """Versioned-corpus drift chain: corpus_report per snapshot,
        corpus_report_drift across them — mix shifts, new and vanished
        strata all surface."""
        from real_time_financial_data_pipeline_spark.operators.text import (
            corpus_report,
            corpus_report_drift,
        )
        from real_time_financial_data_pipeline_spark.versioning import (
            VersionedTable,
        )

        t = VersionedTable(spark, str(tmp_path / "corpus"))
        v0_rows = (
            [(i, f"web text number {i} with plain words", "en", "web") for i in range(10)]
            + [(100 + i, f"book text {i} longer prose here", "en", "books") for i in range(4)]
        )
        schema = "doc_id long, text string, lang string, source string"
        t.commit(spark.createDataFrame(v0_rows, schema))
        v1_rows = [(200 + i, f"fresh crawl item {i} words", "en", "web") for i in range(6)] + [
            (300, "brand new code snippet lang", "en", "code")
        ]
        t.commit(spark.createDataFrame(v1_rows, schema))

        before = corpus_report(t.read(0))
        after = corpus_report(t.read(1))
        drift = {r[ "source"]: r for r in corpus_report_drift(before, after).collect()}
        assert drift["web"]["n_docs_delta"] == 6
        assert drift["books"]["n_docs_delta"] == 0
        assert drift["code"]["is_new_stratum"] and drift["code"]["n_docs_after"] == 1
        assert not drift["web"]["is_vanished_stratum"]
        # a stratum only in BEFORE surfaces as vanished
        shrunk = corpus_report(t.read(1).filter(F.col("source") != "books"))
        d2 = {r["source"]: r for r in corpus_report_drift(after, shrunk).collect()}
        assert d2["books"]["is_vanished_stratum"]
