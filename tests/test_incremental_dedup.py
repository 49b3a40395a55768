"""Incremental dedup: new batch vs existing corpus index (two-sided
MinHash-LSH) — the daily-crawl deployment pattern."""

from __future__ import annotations

from real_time_financial_data_pipeline_spark.operators.dedup import (
    incremental_dedup,
    minhash_pairs_between,
    minhash_signatures,
)

BASE = " ".join(f"tok{i} common words flow here" for i in range(12))
OTHER = " ".join(f"alt{i} different material entirely now" for i in range(12))


def _corpus(spark):
    return spark.createDataFrame(
        [(100, BASE), (101, OTHER)], "doc_id long, text string"
    )


def _new_batch(spark):
    near = BASE.replace("tok3", "changed", 1)  # near-dup of corpus 100
    fresh = " ".join(f"new{i} fresh unseen content item" for i in range(12))
    return spark.createDataFrame(
        [(1, BASE), (2, near), (3, fresh)], "doc_id long, text string"
    )


def test_pairs_between_flags_exact_and_near(spark):
    pairs = minhash_pairs_between(_new_batch(spark), _corpus(spark)).collect()
    by_new = {r.id_new: r for r in pairs}
    assert set(by_new) == {1, 2}
    assert by_new[1].id_corpus == 100 and by_new[1].jaccard == 1.0  # exact copy
    assert by_new[2].id_corpus == 100 and 0.7 <= by_new[2].jaccard < 1.0


def test_incremental_dedup_keeps_only_fresh(spark):
    kept = incremental_dedup(_new_batch(spark), _corpus(spark)).collect()
    assert {r.doc_id for r in kept} == {3}


def test_precomputed_index_signatures_equivalent(spark):
    corpus = _corpus(spark)
    index = minhash_signatures(corpus).persist()
    index.count()
    with_index = minhash_pairs_between(
        _new_batch(spark), corpus, corpus_sigs=index
    ).collect()
    without = minhash_pairs_between(_new_batch(spark), corpus).collect()
    key = lambda r: (r.id_new, r.id_corpus)
    assert sorted(with_index, key=key) == sorted(without, key=key)


def test_incremental_dedup_layout_independent(spark):
    new = _new_batch(spark)
    a = {r.doc_id for r in incremental_dedup(new, _corpus(spark)).collect()}
    b = {
        r.doc_id
        for r in incremental_dedup(new.repartition(5), _corpus(spark).repartition(3)).collect()
    }
    assert a == b == {3}
