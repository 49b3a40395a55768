"""Streaming training-set prep: batch ≡ stream on the stateless stages,
content-dedup across micro-batches, quality gating in-flight."""

from __future__ import annotations

from real_time_financial_data_pipeline_spark.operators.training import (
    assign_split,
    chunk_documents,
)
from real_time_financial_data_pipeline_spark.streaming.training import (
    stream_training_chunks,
)

GOOD_A = " ".join(f"alpha{i} the quick brown" for i in range(10))
GOOD_B = " ".join(f"beta{i} is of lazy dog" for i in range(12))
LOW_Q = "short"


def test_stream_training_chunks_matches_batch_and_dedups(spark, tmp_path):
    src = tmp_path / "docs"
    rows1 = [
        (1, GOOD_A),
        (2, GOOD_A),  # same content, different id -> one copy must survive
        (3, GOOD_B),
        (4, LOW_Q),   # quality-gated out
    ]
    rows2 = [
        (1, GOOD_A),  # exact re-delivery in a later micro-batch
        (3, GOOD_B),
    ]
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(rows2, "doc_id long, text string").write.parquet(
        str(src / "f2")
    )
    schema = spark.read.parquet(str(src / "f1")).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_training_chunks(stream, chunk_tokens=8, overlap_tokens=2)
        .writeStream.format("memory")
        .queryName("train_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("train_chunks").collect()

    # one surviving copy per distinct content, none for the low-quality doc
    assert {r.doc_id for r in got} <= {1, 2, 3}
    surviving_a = {r.doc_id for r in got if r.doc_id in (1, 2)}
    assert len(surviving_a) == 1

    # chunk CONTENT matches the batch operator on the distinct good docs
    batch_docs = spark.createDataFrame(
        [(10, GOOD_A), (11, GOOD_B)], "doc_id long, text string"
    )
    batch = chunk_documents(batch_docs, chunk_tokens=8, overlap_tokens=2).collect()
    assert sorted(r.chunk_text for r in got) == sorted(r.chunk_text for r in batch)

    # split values equal the batch assignment for the same ids (pure hash)
    expected_split = {
        r.doc_id: r.split
        for r in assign_split(
            spark.createDataFrame([(i,) for i in (1, 2, 3)], "doc_id long"), "doc_id"
        ).collect()
    }
    assert all(r.split == expected_split[r.doc_id] for r in got)

    # no duplicated (doc_id, chunk_id) — exactly-once per surviving doc
    keys = [(r.doc_id, r.chunk_id) for r in got]
    assert len(keys) == len(set(keys))


def test_stream_then_batch_compaction(spark, tmp_path):
    """The documented lake deployment pattern end-to-end: stream chunks into
    a bronze table (quality gate + content dedup in-flight), then run the
    nightly batch compaction — reconstruct the landed token streams and
    re-run the full curation ladder (incl. the near-dup pass that has no
    streaming form) + chunk + split — and assert the compacted end state
    EQUALS the pure-batch prepare_training_set on the same input."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    near_b = GOOD_B.replace("beta3", "gamma", 1)  # near-dup of GOOD_B
    rows1 = [(1, GOOD_A), (3, GOOD_B), (5, LOW_Q)]
    rows2 = [(1, GOOD_A), (2, GOOD_A), (4, near_b)]  # re-delivery + cross-id dup
    src = tmp_path / "docs"
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(rows2, "doc_id long, text string").write.parquet(
        str(src / "f2")
    )
    schema = spark.read.parquet(str(src / "f1")).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    bronze = tmp_path / "bronze_chunks"
    q = (
        stream_training_chunks(stream, chunk_tokens=8, overlap_tokens=2)
        .writeStream.format("parquet")
        .option("path", str(bronze))
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)

    # nightly compaction: reconstruct each landed doc's token stream from its
    # chunks (drop the first `overlap` tokens of every chunk_id > 0), then
    # the full batch pipeline over the reconstructed corpus
    landed = spark.read.parquet(str(bronze)).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in landed:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text
    recon = []
    for did, chunks in by_doc.items():
        toks: list[str] = []
        for cid in sorted(chunks):
            ct = chunks[cid].split()
            toks.extend(ct if cid == 0 else ct[2:])
        recon.append((did, " ".join(toks)))
    recon_df = spark.createDataFrame(recon, "doc_id long, text string")
    compacted = prepare_training_set(
        recon_df, chunk_tokens=8, overlap_tokens=2
    ).collect()

    # pure-batch twin on the ORIGINAL input (all ids, re-deliveries included)
    all_docs = spark.createDataFrame(
        sorted(set(rows1 + rows2)), "doc_id long, text string"
    )
    pure = prepare_training_set(all_docs, chunk_tokens=8, overlap_tokens=2).collect()

    key = lambda r: (r.doc_id, r.chunk_id)
    assert sorted(compacted, key=key) == sorted(pure, key=key)
    # the near-dup (4) and the low-quality doc (5) are gone; min-id survivors remain
    assert {r.doc_id for r in compacted} == {1, 3}


def test_stream_scrub_and_repetition_gate_match_batch(spark, tmp_path):
    """In-flight PII scrub + repetition gate: the stream must emit exactly
    the chunks the batch pipeline emits with the same knobs — masked text
    and all — and drop the repetitive doc on both paths."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    pii_doc = (
        "the contact is bob@example.com and the backup host is 10.0.0.1 "
        + " ".join(f"word{i}" for i in range(12))
    )
    repetitive = "spam ham " * 40  # top-2-gram saturated -> gated
    # every token distinct after the leading stopword: repetition-free
    varied = "the " + " ".join(f"w{i} v{i} u{i}" for i in range(10))
    rows = [(1, varied), (2, pii_doc), (3, repetitive)]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    schema = spark.read.parquet(str(src / "f1")).schema

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, chunk_tokens=8, overlap_tokens=2,
            min_quality=0.5, scrub=True, repetition_gate=True,
        )
        .writeStream.format("memory")
        .queryName("scrubbed_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("scrubbed_chunks").collect()

    batch = prepare_training_set(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_quality=0.5, chunk_tokens=8, overlap_tokens=2,
        scrub=True, repetition_gate=True,
    ).collect()

    key = lambda r: (r.doc_id, r.chunk_id)
    assert sorted(got, key=key) == sorted(batch, key=key)
    assert {r.doc_id for r in got} == {1, 2}  # repetitive doc gone
    masked = " ".join(
        c.chunk_text for c in sorted((r for r in got if r.doc_id == 2), key=key)
    )
    assert "<EMAIL>" in masked and "<IPV4>" in masked
    assert "bob@example.com" not in masked and "10.0.0.1" not in masked


def test_stream_perplexity_gate_matches_batch(spark, tmp_path):
    """In-flight LM perplexity gate: the stream (local-model stateless
    scorer) must emit exactly the chunks the batch pipeline (distributed
    scorer) emits with the same model and cutoff, and both must drop the
    planted token-salad document."""
    from real_time_financial_data_pipeline_spark.operators.lm import (
        collect_model,
        perplexity,
        train_bigram_lm,
    )
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    # same small vocabulary, distinct text per doc (no content dedup here)
    natural = [
        (i, " ".join(f"tok{(i + j) % 7} word{j % 5} the" for j in range(12)))
        for i in range(1, 5)
    ]
    salad = (99, " ".join(f"zz{j} qq{j * 7} xx{j * 13}" for j in range(12)))
    rows = natural + [salad]
    train_df = spark.createDataFrame(natural, "doc_id long, text string")
    lm = train_bigram_lm(train_df, vocab_size=50, add_k=0.5)
    cutoff = float(
        perplexity(train_df, lm).agg({"perplexity": "max"}).collect()[0][0]
    ) + 0.5

    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, chunk_tokens=8, overlap_tokens=2, min_quality=0.0,
            perplexity_model=collect_model(lm), max_perplexity=cutoff,
        )
        .writeStream.format("memory")
        .queryName("ppl_gated_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ppl"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ppl_gated_chunks").collect()

    batch = prepare_training_set(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_quality=0.0, chunk_tokens=8, overlap_tokens=2,
        perplexity_lm=lm, max_perplexity=cutoff,
    ).collect()

    key = lambda r: (r.doc_id, r.chunk_id)
    assert sorted(got, key=key) == sorted(batch, key=key)
    assert {r.doc_id for r in got} == {1, 2, 3, 4}  # salad gone on both paths


def test_stream_known_fingerprint_exclusion(spark, tmp_path):
    """known_fingerprints drops in-flight any document whose CONTENT is
    already in the lake — regardless of id, matching text.fingerprint's
    normalized-token identity (case/whitespace-insensitive)."""
    from real_time_financial_data_pipeline_spark.operators.text import fingerprint

    landed = spark.createDataFrame(
        [(900, GOOD_A), (901, GOOD_B)], "doc_id long, text string"
    )
    known = fingerprint(landed).select("fingerprint")

    fresh = " ".join(f"fresh{i} the newly crawled words" for i in range(10))
    rows = [
        (1, GOOD_A),                 # exact known content, new id -> dropped
        (2, GOOD_B.upper() + " "),   # case/whitespace variant -> same fingerprint
        (3, fresh),
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, chunk_tokens=8, overlap_tokens=2, known_fingerprints=known
        )
        .writeStream.format("memory")
        .queryName("known_fp_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt5"))
        .start()
    )
    q.awaitTermination(120)
    got_ids = {r.doc_id for r in spark.table("known_fp_chunks").collect()}
    assert got_ids == {3}


def test_stream_decontamination_matches_batch(spark, tmp_path):
    """In-flight decontamination: the stream must drop exactly the docs the
    batch remove_contaminated drops (verbatim 8-gram run -> gone; reordered
    benchmark words -> kept), with the stateless broadcast predicate."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        remove_contaminated,
    )

    bench_text = "the quick brown fox jumps over the lazy dog again tonight"
    run8 = " ".join(bench_text.split()[:8])
    rows = [
        (1, GOOD_A),
        (2, f"intro words {run8} trailing content is here now"),  # contaminated
        (3, " ".join(reversed(bench_text.split()))),              # reordered: clean
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    benchmark = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")
    schema = spark.read.parquet(str(src / "f1")).schema

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, chunk_tokens=8, overlap_tokens=2,
            min_quality=0.5, benchmark=benchmark,
        )
        .writeStream.format("memory")
        .queryName("decontam_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    got_ids = {r.doc_id for r in spark.table("decontam_chunks").collect()}

    batch_ids = {
        r.doc_id
        for r in remove_contaminated(
            spark.createDataFrame(rows, "doc_id long, text string"), benchmark, n=8
        ).collect()
    }
    assert got_ids == batch_ids == {1, 3}


def test_stream_semantic_decontamination_matches_batch(spark, tmp_path):
    """r11 in-flight SEMANTIC decontamination: the paraphrase of a
    benchmark item (no shared 8-gram, near in embedding space) is dropped
    by the stream-static anti-join on the flagged id set; embedding-less
    and far-away docs pass — exactly the docs the batch composition
    drops."""
    import math

    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    def basis(j, dim=8, tilt=None):
        v = [0.0] * dim
        if tilt is None:
            v[j] = 1.0
        else:
            v[j], v[j + 1] = math.cos(math.radians(tilt)), math.sin(math.radians(tilt))
        return v

    base = (
        "the quick x{i}a brown fox x{i}b jumps over x{i}c the lazy x{i}d "
        "dog walks x{i}e onward today x{i}f in the x{i}g usual way x{i}h"
    )
    rows = [(i, base.format(i=i)) for i in range(4)]
    # doc 0 = paraphrase (2° off the benchmark axis); 1,2 far; 3 no embedding
    emb = spark.createDataFrame(
        [(0, basis(0, tilt=2.0)), (1, basis(2)), (2, basis(4))],
        "vec_id long, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(9, basis(0))], "vec_id long, embedding array<double>"
    )
    src = tmp_path / "sdocs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src / "f1")
    )
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, chunk_tokens=8, overlap_tokens=2, min_quality=0.5,
            embeddings=emb, benchmark_embeddings=bench_emb,
        )
        .writeStream.format("memory")
        .queryName("sem_decontam_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sem"))
        .start()
    )
    q.awaitTermination(120)
    got_ids = {r.doc_id for r in spark.table("sem_decontam_chunks").collect()}

    batch_ids = {
        r.doc_id
        for r in prepare_training_set(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_quality=0.5, near_dup_threshold=None,
            embeddings=emb, benchmark_embeddings=bench_emb, semantic_k=2,
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got_ids == batch_ids == {1, 2, 3}

    import pytest

    with pytest.raises(ValueError, match="requires embeddings"):
        stream_training_chunks(stream, benchmark_embeddings=bench_emb)


def test_stream_quality_model_gate_matches_batch(spark, tmp_path):
    """The trained quality gate in-flight: stream and batch must drop the
    SAME documents under the same weights table, and the surviving chunks
    must match exactly (literal-folded expressions are micro-batch
    agnostic by construction — this pins the wiring)."""
    from pyspark.sql import functions as F

    from real_time_financial_data_pipeline_spark.operators.classifier import (
        apply_quality_classifier,
        train_quality_classifier,
    )
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    good = [(i, f"the quick brown fox and the lazy dog number {i} on a log") for i in range(6)]
    junk = [(100 + i, ("z9#@! qq7 " * 8) + str(i)) for i in range(6)]
    rows = good + junk
    train_df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "label", (F.col("doc_id") < 100).cast("double")
    )
    weights = train_quality_classifier(train_df, "label", max_iter=25)
    # sanity: the model actually discriminates on this corpus
    kept = {
        r.doc_id
        for r in apply_quality_classifier(train_df, weights).filter("quality_keep").collect()
    }
    assert kept == {i for i, _ in good}

    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(str(src / "f1"))
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, chunk_tokens=8, overlap_tokens=2, min_quality=0.0,
            quality_model=weights,
        )
        .writeStream.format("memory")
        .queryName("qc_gated_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_qc"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("qc_gated_chunks").collect()

    batch = prepare_training_set(
        spark.createDataFrame(rows, "doc_id long, text string"),
        min_quality=0.0, near_dup_threshold=None,
        chunk_tokens=8, overlap_tokens=2, quality_model=weights,
    ).collect()

    key = lambda r: (r.doc_id, r.chunk_id)
    assert sorted(got, key=key) == sorted(batch, key=key)
    assert {r.doc_id for r in got} == {i for i, _ in good}


def test_stream_lang_and_anchor_gates_match_batch(spark, tmp_path):
    """r16 knob parity: the streaming twin takes langs= (marker or
    trained) and anchor_profile= — the lang gate is a zero-exchange
    scoring projection, the anchor join is stream-static on the
    registered domain — and keeps EXACTLY the documents the batch
    composition keeps: the planted borderline doc survives only via its
    domain's anchor terms, the unlinked twin drops, the French doc
    passes quality but falls to the language gate.  Guards mirror the
    batch ladder's."""
    import pytest
    from pyspark.sql import functions as F

    from real_time_financial_data_pipeline_spark.operators.classifier import (
        train_quality_classifier_hashed,
    )
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        anchor_profile,
        with_anchor_terms,
    )
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    vocab_a = "alpha beta gamma delta epsilon zeta eta theta".split()
    vocab_b = "zork grib mulx vren klop snib trag womp".split()
    links = spark.createDataFrame(
        [(f"https://good.example/p{i}", "trusted reference encyclopedia archive")
         for i in range(6)]
        + [(f"https://spam.example/p{i}", "casino pills lottery banner")
           for i in range(6)],
        "dst string, anchor_text string",
    )
    profile = anchor_profile(links, k=4, stopwords=[]).persist()
    train = spark.createDataFrame(
        [(i, f"https://good.example/p{i}",
          " ".join(vocab_a[(i + p) % 8] for p in range(8)), 1.0)
         for i in range(12)]
        + [(100 + i, f"https://spam.example/p{i}",
            " ".join(vocab_b[(i + p) % 8] for p in range(8)), 0.0)
           for i in range(12)],
        "doc_id long, uri string, text string, label double",
    )
    combined = with_anchor_terms(train, profile, "uri", out_col="_a").withColumn(
        "text_plus", F.concat_ws(" ", F.col("text"), F.col("_a"))
    )
    w = train_quality_classifier_hashed(
        combined, "label", "text_plus", n_buckets=8192, iters=15
    ).persist()

    borderline = "grib quuxone quuxtwo quuxthree"
    docs_rows = [
        (1, "https://good.example/border", borderline),        # anchors flip -> kept
        (2, "https://unlinked.example/x", borderline),         # no anchors -> dropped
        (3, "https://unlinked.example/y",
         " ".join(vocab_a) + " " + " ".join(vocab_a)),         # good prose -> kept
        (4, "https://good.example/fr",
         "le la les et je suis dans la maison " + " ".join(vocab_a)),  # lang-gated
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, uri string, text string")
    knobs = dict(
        min_quality=0.0, quality_model=w, quality_model_threshold=0.5,
        langs=["en"], anchor_profile=profile, url_col="uri",
        chunk_tokens=8, overlap_tokens=2,
    )
    batch_ids = {
        r.doc_id
        for r in prepare_training_set(docs, near_dup_threshold=None, **knobs).collect()
    }

    src = tmp_path / "docs"
    docs.write.parquet(str(src / "f1"))
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(stream, **knobs)
        .writeStream.format("memory")
        .queryName("anchor_lang_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_al"))
        .start()
    )
    q.awaitTermination(120)
    stream_ids = {r.doc_id for r in spark.table("anchor_lang_chunks").collect()}
    assert stream_ids == batch_ids == {1, 3}

    # guards mirror the batch ladder
    with pytest.raises(ValueError, match="anchor_profile requires url_col"):
        stream_training_chunks(stream, anchor_profile=profile)
    with pytest.raises(ValueError, match="anchor_broadcast without"):
        stream_training_chunks(stream, anchor_broadcast=True)
    with pytest.raises(ValueError, match="lang_model without langs"):
        stream_training_chunks(stream, lang_model=w)
    profile.unpersist(), w.unpersist()


def test_stream_trained_lang_gate_keeps_requested_language(spark, tmp_path):
    """The trained lang gate (lang_model=) in-flight: on a two-fake-
    language corpus the marker heuristic routes everything to 'en' (so
    langs=['aa'] would keep nothing), while the trained softmax keeps
    exactly the aa documents — same contrast as the batch ladder test,
    on a streaming frame."""
    from real_time_financial_data_pipeline_spark.operators.classifier import (
        train_multiclass_hashed,
    )

    vocab = {"aa": "wuga mupo zelt kravi donk plif".split(),
             "bb": "xind folu qarn besh trom ylva".split()}
    rows = [
        (100 * k + i, " ".join(vocab[code][(i + p) % 6] for p in range(8)), code)
        for k, code in enumerate(sorted(vocab), start=1)
        # range(6), not 8: the phase wraps mod 6, so i=6,7 would be exact
        # content duplicates of i=0,1 and the stream's fingerprint dedup
        # (correctly) drops them
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = train_multiclass_hashed(df, label_col="lang", n_buckets=256, iters=10)

    src = tmp_path / "docs"
    df.select("doc_id", "text").write.parquet(str(src / "f1"))
    schema = spark.read.parquet(str(src / "f1")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = (
        stream_training_chunks(
            stream, min_quality=0.0, chunk_tokens=8, overlap_tokens=2,
            langs=["aa"], lang_model=w,
        )
        .writeStream.format("memory")
        .queryName("trained_lang_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_tl"))
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.table("trained_lang_chunks").collect()}
    assert got == {r[0] for r in rows if r[2] == "aa"} and len(got) == 6
