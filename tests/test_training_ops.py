"""Training-set assembly: deterministic splits/sampling and chunking.

These operators guard against the classic 100 TB pipeline bug — split or
sample assignments that silently change when partition layout changes — so
the tests hammer determinism and layout-independence specifically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.training import (
    assign_split,
    chunk_documents,
    curate_documents,
    prepare_training_set,
    sample_by_hash,
)


def _assignments(df):
    return {r.doc_id: r.split for r in df.select("doc_id", "split").collect()}


def test_assign_split_disjoint_complete_and_deterministic(documents):
    out = assign_split(documents, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    a1 = _assignments(out)
    assert len(a1) == documents.count()  # every row assigned, none dropped
    assert set(a1.values()) <= {"train", "val", "test"}
    # re-running AND re-layouting the input must not move a single row
    a2 = _assignments(
        assign_split(
            documents.repartition(13, "source"), "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        )
    )
    assert a1 == a2


def test_assign_split_proportions_and_salt(spark):
    n = 20000
    df = spark.range(n).withColumnRenamed("id", "k")
    out = assign_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02
    # a different salt re-deals a large share of the assignments
    resalted = assign_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2")
    moved = (
        out.alias("a")
        .join(resalted.alias("b"), "k")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert moved > 0.1 * n


def test_assign_split_equal_keys_stay_together(spark):
    # leakage guard: rows sharing a key always share a split
    df = spark.range(1000).select((F.col("id") % 97).alias("k"), F.col("id").alias("row"))
    out = assign_split(df, "k")
    assert out.select("k", "split").distinct().count() == 97


def test_assign_split_rejects_bad_weights(documents):
    with pytest.raises(ValueError):
        assign_split(documents, "doc_id", {})
    with pytest.raises(ValueError):
        assign_split(documents, "doc_id", {"train": 1.0, "val": -0.1})


def test_sample_by_hash_nested_and_deterministic(documents):
    s10 = {r.doc_id for r in sample_by_hash(documents, "doc_id", 0.10).collect()}
    s20 = {r.doc_id for r in sample_by_hash(documents, "doc_id", 0.20).collect()}
    assert s10 <= s20  # growing a sample never re-draws
    n = documents.count()
    assert abs(len(s20) / n - 0.20) < 0.08
    again = {r.doc_id for r in sample_by_hash(documents, "doc_id", 0.10).collect()}
    assert s10 == again
    with pytest.raises(ValueError):
        sample_by_hash(documents, "doc_id", 1.5)


def test_sample_exact_k_counts_prefix_and_disjoint_salts(documents):
    from real_time_financial_data_pipeline_spark.operators.training import (
        sample_exact_k,
    )

    sizes = {r["source"]: r["n"] for r in documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    k = 7
    got = sample_exact_k(documents, ["source"], k)
    per = {r["source"]: r["n"] for r in got.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # EXACTLY min(k, |stratum|) per stratum
    assert per == {s: min(k, n) for s, n in sizes.items()}
    # layout independence: repartitioned input yields the identical set
    again = sample_exact_k(documents.repartition(13), ["source"], k)
    assert {r.doc_id for r in got.collect()} == {r.doc_id for r in again.collect()}
    # growing k keeps the smaller sample as a prefix
    bigger = {r.doc_id for r in sample_exact_k(documents, ["source"], 2 * k).collect()}
    assert {r.doc_id for r in got.collect()} <= bigger
    # different salts draw (near-)independent samples
    other = {r.doc_id for r in sample_exact_k(documents, ["source"], k, salt="b").collect()}
    assert other != {r.doc_id for r in got.collect()}
    with pytest.raises(ValueError):
        sample_exact_k(documents, ["source"], 0)
    with pytest.raises(ValueError):
        sample_exact_k(documents, [], 3)


def test_sample_token_budget_bound_prefix_and_python_parity(documents):
    from real_time_financial_data_pipeline_spark.operators.training import (
        sample_token_budget,
    )

    budget = 800
    got = sample_token_budget(documents, ["source"], budget)
    rows = got.collect()
    # scalar-Python reference: per stratum, docs in (xxhash order) taken
    # until the cumulative-token total reaches the budget — recompute the
    # order via the operator's own hash column on a 1-row-per-doc frame
    order = {
        (r["source"], r.doc_id): (r.h, r.doc_id)
        for r in documents.select(
            "source", "doc_id", F.xxhash64(F.col("doc_id"), F.lit("")).alias("h")
        ).collect()
    }
    from real_time_financial_data_pipeline_spark.operators.text import tokens

    toks = {
        r.doc_id: r.n
        for r in documents.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    by_src: dict = {}
    for (src, did), o in order.items():
        by_src.setdefault(src, []).append((o, did))
    expected = set()
    for src, items in by_src.items():
        cum = 0
        for _, did in sorted(items):
            if cum >= budget:
                break
            expected.add(did)
            cum += toks[did]
    assert {r.doc_id for r in rows} == expected
    # per-stratum bound: total minus the boundary doc stays under budget
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(toks[r.doc_id])
    for src, ns in per.items():
        assert ns, src
        assert sum(ns) - max(ns) < budget
    # layout independence + budget prefix-monotonicity
    again = sample_token_budget(documents.repartition(13), ["source"], budget)
    assert {r.doc_id for r in again.collect()} == expected
    bigger = sample_token_budget(documents, ["source"], 3 * budget)
    assert expected <= {r.doc_id for r in bigger.collect()}
    # tokens_col variant: a precomputed count column drives the budget
    pre = documents.withColumn("n_tok", F.size(tokens(F.col("text"))))
    via_col = sample_token_budget(
        pre, ["source"], budget, tokens_col="n_tok"
    )
    assert {r.doc_id for r in via_col.collect()} == expected
    with pytest.raises(ValueError):
        sample_token_budget(documents, ["source"], 0)
    with pytest.raises(ValueError):
        sample_token_budget(documents, [], 100)


def test_sample_token_budget_per_stratum_dict(documents):
    """r11: budget_tokens as a per-stratum map — the form real mixes are
    written in.  Scalar parity (uniform dict == int), per-stratum bound,
    per-stratum prefix-monotonicity, coverage enforcement, and the
    order_hash swap staying consistent between int and dict forms."""
    from pyspark.sql.utils import AnalysisException

    from real_time_financial_data_pipeline_spark.operators.text import tokens
    from real_time_financial_data_pipeline_spark.operators.training import (
        sample_token_budget,
    )

    srcs = [r["source"] for r in documents.select("source").distinct().collect()]
    assert len(srcs) >= 3

    # scalar parity: a dict assigning every stratum the same budget IS the
    # int form
    uniform = {s: 800 for s in srcs}
    via_int = {r.doc_id for r in sample_token_budget(documents, ["source"], 800).collect()}
    via_map = {
        r.doc_id
        for r in sample_token_budget(documents, ["source"], uniform).collect()
    }
    assert via_int == via_map

    # heterogeneous budgets: each stratum honors ITS bound, and column
    # order survives the lookup join
    budgets = {s: 300 + 400 * (i % 3) for i, s in enumerate(srcs)}
    got = sample_token_budget(documents, ["source"], budgets)
    assert got.columns == documents.columns
    toks = {
        r.doc_id: r.n
        for r in documents.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    per: dict = {}
    for r in got.collect():
        per.setdefault(r["source"], []).append(toks[r.doc_id])
    assert set(per) == set(srcs)  # every stratum sampled (>=1 doc each)
    for s, ns in per.items():
        assert sum(ns) - max(ns) < budgets[s], s

    # per-stratum prefix-monotonicity: raising ONE stratum's budget only
    # appends to that stratum, other strata byte-identical
    raised = dict(budgets)
    raised[srcs[0]] = budgets[srcs[0]] * 4
    got2 = {(r.doc_id, r["source"]) for r in sample_token_budget(documents, ["source"], raised).collect()}
    base = {(r.doc_id, r["source"]) for r in sample_token_budget(documents, ["source"], budgets).collect()}
    assert {p for p in base if p[1] == srcs[0]} <= {p for p in got2 if p[1] == srcs[0]}
    assert {p for p in base if p[1] != srcs[0]} == {p for p in got2 if p[1] != srcs[0]}

    # coverage: a missing stratum raises at execution, never silently
    # passes/drops
    missing = {s: 800 for s in srcs[:-1]}
    with pytest.raises(Exception, match="has no budget"):
        sample_token_budget(documents, ["source"], missing).collect()

    # composite strata take tuple keys; wrong arity raises eagerly
    with pytest.raises(ValueError, match="parts"):
        sample_token_budget(documents, ["source", "lang"], {("a",): 100})
    with pytest.raises(ValueError, match=">= 1"):
        sample_token_budget(documents, ["source"], {srcs[0]: 0})

    # order_hash swap: md5 order differs from xxhash64 order but obeys the
    # same budget discipline, identically for int and dict forms
    md5h = lambda key, salt: F.md5(F.concat(key.cast("string"), F.lit(salt)))
    a = {
        r.doc_id
        for r in sample_token_budget(
            documents, ["source"], 800, order_hash=md5h
        ).collect()
    }
    b = {
        r.doc_id
        for r in sample_token_budget(
            documents, ["source"], uniform, order_hash=md5h
        ).collect()
    }
    assert a == b and a != via_int


def _chunk_rows(spark, texts, chunk_tokens, overlap_tokens):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return (
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap_tokens=overlap_tokens)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )


def test_chunking_reconstructs_token_stream(spark):
    texts = [
        " ".join(f"t{i}" for i in range(23)),   # several chunks + short tail
        " ".join(f"t{i}" for i in range(8)),    # exactly one chunk
        "one two",                              # shorter than a chunk
        "",                                     # empty -> zero chunks
        "  padded   with   runs   of spaces ",  # tokenizer robustness
    ]
    rows = _chunk_rows(spark, texts, chunk_tokens=8, overlap_tokens=3)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # empty doc yields no chunks
    for doc_id, chunks in by_doc.items():
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert all(c.n_chunk_tokens <= 8 for c in chunks)
        assert all(c.n_chunk_tokens == len(c.chunk_text.split(" ")) for c in chunks)
        # the reconstruction property: chunk 0 + later chunks minus overlap
        rebuilt = chunks[0].chunk_text.split(" ")
        for c in chunks[1:]:
            toks = c.chunk_text.split(" ")
            assert toks[:3] == rebuilt[-(8 - 1):][-3:] or len(rebuilt) >= 3
            assert toks[:3] == rebuilt[len(rebuilt) - 3:]
            rebuilt += toks[3:]
        expected = [t for t in texts[doc_id].split(" ") if t]
        assert rebuilt == expected


def test_chunking_zero_overlap_partitions_exactly(spark):
    rows = _chunk_rows(spark, [" ".join(f"t{i}" for i in range(10))], 4, 0)
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 2]
    assert " ".join(r.chunk_text for r in rows) == " ".join(f"t{i}" for i in range(10))


def test_chunking_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_curate_removes_planted_exact_and_near_dups(spark):
    base = " ".join(f"token{i} the of and" for i in range(12))
    rows = [
        (1, base),
        (2, base),                                    # exact dup of 1
        (3, base.replace("token3", "changed", 1)),    # near dup of 1
        (4, " ".join(f"other{i} is on for" for i in range(15))),
        (5, "short"),                                 # fails the quality gate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in curate_documents(docs, min_quality=0.7).collect()}
    assert kept == {1, 4}  # min-id canonical survives each cluster


def test_prepare_training_set_end_to_end(documents):
    out = prepare_training_set(
        documents.limit(200),
        weights={"train": 0.9, "val": 0.1},
        chunk_tokens=64,
        overlap_tokens=8,
    )
    rows = out.collect()
    assert set(out.columns) == {"doc_id", "chunk_id", "n_chunk_tokens", "chunk_text", "split"}
    assert rows and all(r.n_chunk_tokens <= 64 for r in rows)
    assert {r.split for r in rows} <= {"train", "val"}
    # every chunk of a document shares the document's split (no leakage)
    per_doc: dict[int, set] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(s) == 1 for s in per_doc.values())
    # deterministic end-to-end
    again = prepare_training_set(
        documents.limit(200),
        weights={"train": 0.9, "val": 0.1},
        chunk_tokens=64,
        overlap_tokens=8,
    ).collect()
    key = lambda r: (r.doc_id, r.chunk_id)
    assert sorted(rows, key=key) == sorted(again, key=key)


def test_prepare_training_set_token_budget_stage(documents):
    """r11 mix-composition stage: token_budgets samples the CURATED,
    DECONTAMINATED corpus per stratum before chunking.  Wiring parity
    (composition == sampling the curated frame directly), per-stratum
    bound, corpus-wide [] form, dict-over-[] guard, and the ordering
    semantics that make the placement right: a document the decontam
    gate removes never consumes budget — its slot goes to the next doc
    in hash order."""
    from real_time_financial_data_pipeline_spark.operators.text import tokens
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
        sample_token_budget,
    )

    budgets = {"en": 1500, "de": 600, "es": 600, "fr": 600, "zh": 500}
    out = prepare_training_set(
        documents, near_dup_threshold=None,
        token_budgets=budgets, budget_strata=["lang"], budget_salt="mix",
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    # wiring parity: the composition samples exactly what sampling the
    # curated frame directly would
    curated = curate_documents(documents, near_dup_threshold=None)
    direct = {
        r.doc_id
        for r in sample_token_budget(
            curated, ["lang"], budgets, salt="mix"
        ).collect()
    }
    assert kept == direct and kept
    # per-stratum bound holds on the sampled docs
    toks = {
        (r.doc_id, r.lang): r.n
        for r in curated.select(
            "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    per: dict = {}
    for (did, lang), n in toks.items():
        if did in kept:
            per.setdefault(lang, []).append(n)
    for lang, ns in per.items():
        assert sum(ns) - max(ns) < budgets[lang], lang

    # corpus-wide [] form takes one int; dict over [] is rejected
    corpus_out = prepare_training_set(
        documents, near_dup_threshold=None,
        token_budgets=2000, budget_strata=[],
    )
    cdocs = {r.doc_id for r in corpus_out.select("doc_id").distinct().collect()}
    ctoks = sum(n for (did, _), n in toks.items() if did in cdocs)
    assert ctoks - max(n for (did, _), n in toks.items() if did in cdocs) < 2000
    assert "_stratum" not in corpus_out.columns
    with pytest.raises(ValueError, match="single int budget"):
        prepare_training_set(
            documents, near_dup_threshold=None,
            token_budgets={"x": 1}, budget_strata=[],
        )


def test_token_budget_after_decontam_frees_slots(spark):
    """Placement semantics: the budget stage runs AFTER decontamination,
    so a contaminated document early in the take order frees its budget
    slot for the next clean document — the same budget with the doc
    decontaminated away must admit MORE of the remaining docs, never
    fewer."""
    from real_time_financial_data_pipeline_spark.operators.text import tokens as _t

    # an id-specific token every ~4 positions: no 8-token run is shared
    # across documents, so the benchmark contaminates ONLY the planted doc
    base = (
        "the quick x{i}a brown fox x{i}b jumps over x{i}c the lazy x{i}d "
        "dog walks x{i}e onward today x{i}f in the x{i}g usual way x{i}h"
    )
    docs = spark.createDataFrame(
        [(i, base.format(i=i)) for i in range(12)], "doc_id long, text string"
    ).withColumn("n_tok", F.size(_t(F.col("text"))))
    per_doc = docs.select("n_tok").collect()[0].n_tok
    budget = int(per_doc * 3.5)  # admits ~4 docs (crossing doc included)

    def kept(benchmark):
        out = prepare_training_set(
            docs, near_dup_threshold=None,
            benchmark=benchmark,
            token_budgets=budget, budget_strata=[],
            budget_salt="slots",
        )
        return {r.doc_id for r in out.select("doc_id").distinct().collect()}

    no_decontam = kept(None)
    assert len(no_decontam) >= 2
    # contaminate the FIRST doc in the take order (benchmark = its text):
    # recompute the operator's own hash order to find it
    order = {
        r.doc_id: (r.h, r.doc_id)
        for r in docs.select(
            "doc_id", F.xxhash64(F.col("doc_id"), F.lit("slots")).alias("h")
        ).collect()
    }
    first_doc = min(no_decontam, key=lambda d: order[d])
    bench = spark.createDataFrame(
        [(docs.filter(F.col("doc_id") == first_doc).collect()[0].text,)],
        "text string",
    )
    with_decontam = kept(bench)
    assert first_doc not in with_decontam
    # the freed slot admits the next doc in order: same count survives
    # (the gated doc never consumed budget)
    assert len(with_decontam) >= len(no_decontam - {first_doc})
    survivors_in_both = no_decontam - {first_doc}
    assert survivors_in_both <= with_decontam  # prefix stability


def test_semantic_benchmark_decontam_catches_paraphrase(spark):
    """r11: a PARAPHRASED eval item shares no 8-token run with the
    benchmark text, so n-gram decontam alone keeps it — but its embedding
    sits within the cosine threshold of the benchmark vector, so
    benchmark_embeddings drops it.  Both passes run together; docs
    without an embedding row pass the semantic stage unexamined."""
    import math

    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    # mutually ORTHOGONAL corpus vectors (pairwise cosine 0, so the shared
    # embeddings= param's in-corpus SemDedup stage stays inert); only the
    # paraphrase tilts 2° off the benchmark axis (cosine 0.9994)
    def basis(j, dim=16, tilt=None):
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
    # doc 0 = the PARAPHRASE of the benchmark item (distinct wording, near
    # benchmark in embedding space); docs 1-9 clean; doc 10 = VERBATIM
    # benchmark copy (the n-gram pass's job); doc 11 has NO embedding row
    docs = spark.createDataFrame(
        [(i, base.format(i=i)) for i in range(12)], "doc_id long, text string"
    )
    bench_text = base.format(i=10)
    bench = spark.createDataFrame([(bench_text,)], "text string")
    bench_emb = spark.createDataFrame(
        [(0, basis(0))], "vec_id long, embedding array<double>"
    )
    emb_rows = [(0, basis(0, tilt=2.0))]  # paraphrase: 2° off the benchmark
    emb_rows += [(i, basis(i + 1)) for i in range(1, 10)]  # orthogonal clean docs
    emb_rows += [(10, basis(12))]  # verbatim copy orthogonal in embedding space
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")

    def kept(**kw):
        if "embeddings" in kw:
            kw.setdefault("semantic_k", 4)  # 11 vectors; k=16 default is for corpora
        out = prepare_training_set(docs, near_dup_threshold=None, **kw)
        return {r.doc_id for r in out.select("doc_id").distinct().collect()}

    # n-gram pass alone: catches the verbatim copy, misses the paraphrase
    ngram_only = kept(benchmark=bench)
    assert 10 not in ngram_only and 0 in ngram_only
    # both passes: the paraphrase goes too; the embedding-less doc and the
    # clean docs survive
    both = kept(benchmark=bench, embeddings=emb, benchmark_embeddings=bench_emb)
    assert 0 not in both and 10 not in both
    assert 11 in both and set(range(1, 10)) <= both
    # semantic stage alone also drops the paraphrase but not the verbatim
    # copy (they are far apart in embedding space)
    sem_only = kept(embeddings=emb, benchmark_embeddings=bench_emb)
    assert 0 not in sem_only and 10 in sem_only
    # guard: benchmark_embeddings without corpus embeddings is an error
    with pytest.raises(ValueError, match="requires embeddings"):
        prepare_training_set(
            docs, near_dup_threshold=None, benchmark_embeddings=bench_emb
        )


def test_semantic_n_probe_recall_through_prepare_training_set(spark):
    """r11 multiprobe-parity gate: a planted PARAPHRASE pair straddling a
    cluster boundary (cosine 0.998, but the two clones single-assign to
    DIFFERENT clusters) is structurally invisible to the n_probe=1
    SemDedup stage and must be caught at semantic_n_probe=2 — asserted
    end-to-end through prepare_training_set, plus the monotone gate that
    multiprobe never keeps MORE documents than single-probe (pairs only
    grow, components only merge, min-id survivorship only shrinks)."""
    import math

    import numpy as np

    from real_time_financial_data_pipeline_spark.operators.similarity import (
        cluster_assign,
        train_centroids,
    )

    def vec(deg):
        a = math.radians(deg)
        return [math.cos(a), math.sin(a), 0.0, 0.0]

    # two tight lobes around 0° and 90°, and the planted boundary pair at
    # 43°/47° — within-lobe spread 10° (cos >= 0.985, all near-dups at the
    # 0.9 threshold), cross-lobe ~0.1 (never pairs), clone gap 4°
    # (cos 0.9976 — a true semantic dup)
    angles = {i: i * 0.5 for i in range(20)}  # lobe A: 0..9.5°
    angles.update({20 + i: 80.0 + i * 0.5 for i in range(20)})  # lobe B
    angles[40], angles[41] = 43.0, 47.0  # the planted paraphrase clones
    text = (
        "the quick brown fox number {i} jumps over the lazy dog and the "
        "story continues in the usual way for a while longer"
    )
    docs = spark.createDataFrame(
        [(i, text.format(i=i)) for i in angles], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(i, vec(a)) for i, a in angles.items()],
        "vec_id long, embedding array<double>",
    )

    # precondition that makes the pair boundary-straddling: under the SAME
    # seeded quantizer prepare_training_set trains (k=2 over these
    # vectors), the clones single-assign to different clusters
    cents = train_centroids(emb, 2)
    assign = {
        r.vec_id: r.cluster_id
        for r in cluster_assign(emb.filter(F.col("vec_id") >= 40), 2, centroids=cents).collect()
    }
    assert assign[40] != assign[41]

    def kept_ids(n_probe):
        out = prepare_training_set(
            docs,
            near_dup_threshold=None,  # isolate the semantic stage
            embeddings=emb,
            semantic_threshold=0.9,
            semantic_k=2,
            semantic_n_probe=n_probe,
        )
        return {r.doc_id for r in out.select("doc_id").distinct().collect()}

    k1, k2 = kept_ids(1), kept_ids(2)
    # single-probe: each lobe collapses to its min id; the straddling pair
    # survives intact (structurally invisible)
    assert {40, 41} <= k1
    # multiprobe: the clone pair is seen, min id survives
    assert 40 in k2 and 41 not in k2
    assert k2 <= k1  # monotone: more probes can only drop more
    assert 0 in k2 and 20 in k2  # lobe canonicals always survive


def test_incremental_semantic_dedup_forwards_n_probe(spark):
    """r11: the anti-join form forwards the multiprobe knob — a new vector
    whose paraphrase twin sits just across the corpus's cluster boundary
    is kept at n_probe=1 (invisible) and dropped at n_probe=2, with the
    corpus-side assignment untouched (same persisted centroids)."""
    import math

    from real_time_financial_data_pipeline_spark.operators.similarity import (
        cluster_assign,
        incremental_semantic_dedup,
        train_centroids,
    )

    def vec(deg):
        a = math.radians(deg)
        return [math.cos(a), math.sin(a), 0.0, 0.0]

    corpus_rows = [(i, vec(i * 0.5)) for i in range(20)]
    corpus_rows += [(20 + i, vec(80.0 + i * 0.5)) for i in range(20)]
    corpus_rows.append((40, vec(43.0)))  # the standing twin, near boundary
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")
    cents = train_centroids(corpus, 2)
    new = spark.createDataFrame(
        [(100, vec(47.0)), (101, vec(160.0))],  # twin-across-boundary + a novel vector
        "vec_id long, embedding array<double>",
    )
    assign = {
        r.vec_id: r.cluster_id
        for r in cluster_assign(
            corpus.filter(F.col("vec_id") == 40).unionByName(new), 2, centroids=cents
        ).collect()
    }
    assert assign[100] != assign[40]  # genuinely straddling under this quantizer

    kept1 = {
        r.vec_id
        for r in incremental_semantic_dedup(
            new, corpus, 0.9, 2, centroids=cents, n_probe=1
        ).collect()
    }
    kept2 = {
        r.vec_id
        for r in incremental_semantic_dedup(
            new, corpus, 0.9, 2, centroids=cents, n_probe=2
        ).collect()
    }
    assert kept1 == {100, 101}  # boundary twin invisible at single probe
    assert kept2 == {101}  # multiprobe catches it; the novel vector stays


def test_chunking_is_map_only(documents):
    """100 TB posture: the chunking plan must contain no Exchange — it has
    to stream through as a narrow map stage."""
    plan = chunk_documents(
        documents, chunk_tokens=64, overlap_tokens=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decontamination_flags_verbatim_runs_only(spark):
    from real_time_financial_data_pipeline_spark.operators.training import (
        flag_contaminated,
        remove_contaminated,
    )

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    corpus = spark.createDataFrame(
        [
            # contains a verbatim 8-token run from the benchmark
            (1, "prefix words " + " ".join(bench_text.split()[:8]) + " suffix"),
            # shares only 7 consecutive tokens -> zero shared 8-grams
            (2, "prefix " + " ".join(bench_text.split()[:7]) + " different tail"),
            # same words, different order -> no verbatim run
            (3, " ".join(reversed(bench_text.split()))),
            (4, "completely unrelated content about spark engines here"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    flagged = {r.doc_id: r.n_shared_grams for r in flag_contaminated(corpus, benchmark, n=8).collect()}
    assert set(flagged) == {1}
    assert flagged[1] == 1  # exactly one shared 8-gram from an 8-token run

    survivors = {r.doc_id for r in remove_contaminated(corpus, benchmark, n=8).collect()}
    assert survivors == {2, 3, 4}


def test_decontamination_counts_distinct_shared_grams(spark):
    from real_time_financial_data_pipeline_spark.operators.training import flag_contaminated

    run = "a1 a2 a3 a4 a5"  # 5 tokens -> three 3-grams
    corpus = spark.createDataFrame(
        [(1, f"{run} x y z {run}")],  # repeated run: grams counted once
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(9, run)], "doc_id long, text string")
    got = flag_contaminated(corpus, benchmark, n=3).collect()
    assert [(r.doc_id, r.n_shared_grams) for r in got] == [(1, 3)]


def test_pack_sequences_budget_coverage_determinism(spark, documents):
    from real_time_financial_data_pipeline_spark.operators.training import (
        chunk_documents,
        pack_sequences,
    )

    chunks = chunk_documents(documents.limit(150), chunk_tokens=40, overlap_tokens=4)
    packed = pack_sequences(chunks, token_budget=100, n_buckets=8)
    rows = packed.collect()

    # every chunk assigned exactly once
    assert len(rows) == chunks.count()
    keys = [(r.doc_id, r.chunk_id) for r in rows]
    assert len(keys) == len(set(keys))

    # every pack within budget
    sums: dict[str, int] = {}
    for r in rows:
        sums[r.pack_id] = sums.get(r.pack_id, 0) + r.n_chunk_tokens
    assert all(s <= 100 for s in sums.values())

    # FFD keeps waste low: per bucket at most one pack under half-full
    by_bucket: dict[str, list[int]] = {}
    for pid, s in sums.items():
        by_bucket.setdefault(pid.split("_")[0], []).append(s)
    for b, packs in by_bucket.items():
        assert sum(1 for s in packs if s < 50) <= 1, (b, sorted(packs))

    # layout-independent: identical assignment from a reshuffled input
    again = pack_sequences(
        chunks.repartition(17, "chunk_id"), token_budget=100, n_buckets=8
    ).collect()
    assert sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)) == sorted(
        again, key=lambda r: (r.doc_id, r.chunk_id)
    )


def test_pack_sequences_rejects_oversized_chunk(spark):
    import pytest as _pytest

    from real_time_financial_data_pipeline_spark.operators.training import pack_sequences

    df = spark.createDataFrame(
        [(1, 0, 50, "x"), (2, 0, 9, "y")],
        "doc_id long, chunk_id int, n_chunk_tokens int, chunk_text string",
    )
    with _pytest.raises(Exception, match="token_budget"):
        pack_sequences(df, token_budget=20).collect()
    with _pytest.raises(ValueError):
        pack_sequences(df, token_budget=0)


def test_pack_sequences_auto_bucket_sizing(spark, documents):
    """Safe-by-default sizing: with n_buckets=None the bucket count derives
    from the rows_per_bucket target, so the default can never concentrate an
    unbounded corpus into a fixed handful of single-task pandas frames."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        chunk_documents,
        pack_sequences,
    )

    chunks = chunk_documents(documents.limit(100), chunk_tokens=40, overlap_tokens=4)
    n_chunks = chunks.count()
    target = 20
    packed = pack_sequences(chunks, token_budget=100, rows_per_bucket=target)
    rows = packed.collect()
    assert len(rows) == n_chunks
    # derived n_buckets = ceil(n_chunks / target); bucket ids in pack_id must
    # stay inside that range, and the sizing must actually have spread the
    # chunks over more than one bucket
    derived = -(-n_chunks // target)
    buckets = {int(r.pack_id.split("_")[0]) for r in rows}
    assert buckets <= set(range(derived))
    assert len(buckets) > 1
    # every pack still within budget under auto-sizing
    sums: dict[str, int] = {}
    for r in rows:
        sums[r.pack_id] = sums.get(r.pack_id, 0) + r.n_chunk_tokens
    assert all(s <= 100 for s in sums.values())


def test_pack_sequences_bucket_overflow_raises(spark):
    """A bucket that exceeds 4x the rows_per_bucket target must raise in the
    task (memory guard) instead of silently materializing it."""
    import pytest as _pytest

    from real_time_financial_data_pipeline_spark.operators.training import pack_sequences

    rows = [(i, 0, 3, "a b c") for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, n_chunk_tokens int, chunk_text string"
    )
    # n_buckets=1 forces all 50 rows into one bucket; 4 * rows_per_bucket = 8
    with _pytest.raises(Exception, match="bucket holds"):
        pack_sequences(df, token_budget=10, n_buckets=1, rows_per_bucket=2).collect()


def test_prepare_training_set_decontaminates(spark):
    """End-to-end composition: a curated doc carrying a verbatim benchmark
    8-gram run is dropped before chunking when `benchmark` is passed, and
    kept when it is not.  Reordered benchmark words do not flag."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    bench_text = "the quick brown fox jumps over the lazy dog again tonight"
    run8 = " ".join(bench_text.split()[:8])
    clean = "all of the tokens in this document are original and on topic"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words {run8} trailing content is here now"),   # contaminated
            (2, clean),                                                # clean
            (3, " ".join(reversed(bench_text.split()))),               # reordered: clean
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")

    with_decontam = prepare_training_set(
        corpus, min_quality=0.5, chunk_tokens=8, overlap_tokens=0, benchmark=benchmark
    )
    assert {r.doc_id for r in with_decontam.collect()} == {2, 3}

    without = prepare_training_set(
        corpus, min_quality=0.5, chunk_tokens=8, overlap_tokens=0
    )
    assert {r.doc_id for r in without.collect()} == {1, 2, 3}


def test_curate_semantic_stage_drops_paraphrases(spark):
    """Two lexically-distinct paraphrases with near-identical embeddings:
    the MinHash stages keep both, the SemDedup stage drops the higher id;
    docs WITHOUT an embedding row pass through unexamined."""
    import numpy as np

    rows = [
        (1, " ".join(f"alpha{i} the of and" for i in range(12))),
        (2, " ".join(f"beta{i} is on for" for i in range(12))),   # paraphrase of 1
        (3, " ".join(f"gamma{i} at to by" for i in range(12))),
        (4, " ".join(f"delta{i} we he it" for i in range(12))),   # no embedding
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rng = np.random.default_rng(9)
    v1 = rng.normal(size=16)
    v3 = rng.normal(size=16)
    emb = spark.createDataFrame(
        [
            (1, [float(x) for x in v1]),
            (2, [float(x) for x in v1 + rng.normal(0, 1e-4, 16)]),
            (3, [float(x) for x in v3]),
        ],
        "vec_id long, embedding array<double>",
    )
    no_sem = {r.doc_id for r in curate_documents(docs, min_quality=0.0).collect()}
    assert no_sem == {1, 2, 3, 4}  # lexical stages see no duplicates
    kept = {
        r.doc_id
        for r in curate_documents(
            docs, min_quality=0.0, embeddings=emb,
            semantic_threshold=0.999, semantic_k=2,
        ).collect()
    }
    assert kept == {1, 3, 4}  # paraphrase 2 dropped, embedding-less 4 kept


def test_prepare_training_set_semantic_stage(spark):
    """End-to-end: a paraphrase pair (lexically distinct, embedding-near)
    yields chunks only for the min-id member when embeddings are passed."""
    import numpy as np

    rows = [
        (1, " ".join(f"alpha{i} the of and" for i in range(20))),
        (2, " ".join(f"beta{i} is on for" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rng = np.random.default_rng(31)
    v = rng.normal(size=16)
    emb = spark.createDataFrame(
        [(1, [float(x) for x in v]),
         (2, [float(x) for x in v + rng.normal(0, 1e-4, 16)])],
        "vec_id long, embedding array<double>",
    )
    out = prepare_training_set(
        docs, min_quality=0.0, chunk_tokens=16, overlap_tokens=0,
        embeddings=emb, semantic_threshold=0.999, semantic_k=1,
    )
    assert {r.doc_id for r in out.collect()} == {1}


class TestWalkForward:
    def _events(self, spark):
        import datetime as dt

        d = dt.datetime(2024, 1, 1)
        rows = [(i, d + dt.timedelta(hours=i)) for i in range(500)]
        return spark.createDataFrame(rows, "id long, ts timestamp")

    def test_folds_are_contiguous_time_blocks(self, spark):
        from real_time_financial_data_pipeline_spark.operators.training import (
            assign_time_folds,
        )

        df = assign_time_folds(self._events(spark), "ts", n_folds=5)
        pdf = df.toPandas().sort_values("ts", ignore_index=True)
        # fold ids are non-decreasing in time and cover 0..4
        assert (pdf["fold"].diff().fillna(0) >= 0).all()
        assert set(pdf["fold"]) == set(range(5))
        # near-equal block sizes (approx_percentile boundaries)
        sizes = pdf.groupby("fold").size()
        assert sizes.min() > 500 / 5 * 0.7

    def test_no_leakage_and_embargo(self, spark):
        from real_time_financial_data_pipeline_spark.operators.training import (
            walk_forward_split,
        )

        df = self._events(spark)
        for k in (1, 3, 4):
            train, test = walk_forward_split(df, k, "ts", n_folds=5)
            t_max = train.agg(F.max("ts")).first()[0]
            s_min = test.agg(F.min("ts")).first()[0]
            assert t_max < s_min
        # embargo: the last 24h before the test block is excluded
        tr_e, te = walk_forward_split(df, 3, "ts", n_folds=5, embargo="24 hours")
        t_max = tr_e.agg(F.max("ts")).first()[0]
        s_min = te.agg(F.min("ts")).first()[0]
        assert (s_min - t_max).total_seconds() > 24 * 3600

    def test_train_grows_with_fold(self, spark):
        from real_time_financial_data_pipeline_spark.operators.training import (
            walk_forward_split,
        )

        df = self._events(spark)
        counts = [walk_forward_split(df, k, "ts", n_folds=5)[0].count() for k in (1, 2, 3, 4)]
        assert counts == sorted(counts) and counts[0] > 0

    def test_layout_independent(self, spark):
        from real_time_financial_data_pipeline_spark.operators.training import (
            assign_time_folds,
        )

        df = self._events(spark)
        a = {r.id: r.fold for r in assign_time_folds(df, "ts", 4).collect()}
        b = {r.id: r.fold for r in assign_time_folds(df.repartition(7), "ts", 4).collect()}
        assert a == b

    def test_bad_args(self, spark):
        from real_time_financial_data_pipeline_spark.operators.training import (
            assign_time_folds,
            walk_forward_split,
        )

        df = self._events(spark)
        with pytest.raises(ValueError):
            assign_time_folds(df, "ts", 1)
        with pytest.raises(ValueError):
            walk_forward_split(df, 0, "ts", n_folds=5)
        with pytest.raises(ValueError):
            walk_forward_split(df, 5, "ts", n_folds=5)

    def test_duckdb_reassigns_folds_from_boundaries(self, spark):
        """Staged-boundary oracle (in-test): DuckDB re-derives every row's
        fold from the SAME boundary literals Spark computed — the map-only
        assignment projection, the part that touches all the data, is
        engine-independently confirmed."""
        import duckdb

        from real_time_financial_data_pipeline_spark.operators.training import (
            assign_time_folds,
        )

        df = self._events(spark)
        assigned = assign_time_folds(df, "ts", n_folds=4).toPandas()
        bounds = (
            df.select(
                F.percentile_approx(F.col("ts").cast("double"), [0.25, 0.5, 0.75]).alias("b")
            ).first()["b"]
        )
        con = duckdb.connect()
        con.register("a", assigned)
        mismatches = con.execute(
            f"""
            SELECT count(*) FROM (
                SELECT fold,
                       CASE WHEN epoch(ts) <= {bounds[0]} THEN 0
                            WHEN epoch(ts) <= {bounds[1]} THEN 1
                            WHEN epoch(ts) <= {bounds[2]} THEN 2
                            ELSE 3 END AS fold_oracle
                FROM a
            ) WHERE fold <> fold_oracle
            """
        ).fetchone()[0]
        assert mismatches == 0
