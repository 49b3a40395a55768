"""Corpus-curation extensions: Gopher-style repetition filters, PII
scrubbing, target-mix (domain-reweighting) sampling, and embedding-space
corpus clustering.

Reference anchor: these extend the training-data family (SURVEY.md §2.13)
beyond the reference's declared surface — published pipeline stages
(Gopher table A1 repetition cuts, ROOTS/Dolma PII masking, mixture
reweighting, k-means corpus bucketing) re-expressed Spark-first.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.similarity import (
    cluster_assign,
    cluster_mix,
    train_centroids,
)
from real_time_financial_data_pipeline_spark.operators.text import (
    PII_PATTERNS,
    REPETITION_THRESHOLDS,
    pii_counts,
    repetition_filter,
    repetition_stats,
    scrub_pii,
)
from real_time_financial_data_pipeline_spark.operators.training import (
    domain_mix,
    target_mix_sample,
)


# --- repetition stats -----------------------------------------------------


def _rep_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near my warm window"),
            (2, "x y\nx y\nx y\nz w"),  # 3 copies of one line out of 4
            (3, "spam ham " * 40),  # one 2-gram dominates everything
            (4, ""),  # degenerate: no tokens, no lines
            (5, "alpha beta gamma delta epsilon " * 3 + "zeta"),  # dup 5-grams
        ],
        "doc_id long, text string",
    )


def test_repetition_stats_values(spark):
    rows = {r.doc_id: r for r in repetition_stats(_rep_docs(spark)).collect()}
    # clean doc: nothing repeats (unique top grams are NOT charged)
    r1 = rows[1]
    assert r1.dup_line_frac == 0.0
    assert r1.top_2gram_char_frac == 0.0
    assert r1.dup_5gram_char_frac == 0.0
    # 4 lines, 2 distinct -> half the lines (and half the line chars) are dups
    assert rows[2].dup_line_frac == 0.5
    assert rows[2].dup_line_char_frac == 0.5
    # fully periodic text saturates the gram metrics (clamped at 1)
    assert rows[3].top_2gram_char_frac == 1.0
    assert rows[3].dup_5gram_char_frac == 1.0
    # empty doc -> null metrics, not 0/1 (the quality gate owns that policy)
    assert rows[4].dup_line_frac is None
    assert rows[4].top_3gram_char_frac is None
    # repeated 5-token run -> duplicate 5-grams but zero duplicate lines
    assert rows[5].dup_5gram_char_frac > 0.0
    assert rows[5].dup_line_frac == 0.0


def test_repetition_stats_layout_independent(documents):
    base = {r.doc_id: r for r in repetition_stats(documents).collect()}
    moved = {
        r.doc_id: r
        for r in repetition_stats(documents.repartition(7, "source")).collect()
    }
    assert base == moved


def test_repetition_filter_gates_and_preserves_schema(spark):
    docs = _rep_docs(spark)
    kept = repetition_filter(docs)
    assert kept.columns == docs.columns
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 3 not in ids  # periodic doc dropped
    assert 2 not in ids  # dup-line doc dropped
    assert {1, 4} <= ids  # clean + degenerate docs pass
    # unknown metric name is a hard error, not a silent no-op
    with pytest.raises(ValueError):
        repetition_filter(docs, thresholds={"nope": 0.5})
    # single-threshold override: only that metric gates
    only_lines = repetition_filter(docs, thresholds={"dup_line_frac": 0.3})
    assert {r.doc_id for r in only_lines.select("doc_id").collect()} == {1, 3, 4, 5}


def test_repetition_thresholds_are_gopher_cuts():
    assert REPETITION_THRESHOLDS["top_2gram_char_frac"] == 0.20
    assert REPETITION_THRESHOLDS["top_3gram_char_frac"] == 0.18
    assert REPETITION_THRESHOLDS["dup_line_frac"] == 0.30


# --- PII scrubbing --------------------------------------------------------


def test_pii_counts_and_scrub(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach bob@example.com or jane.doe+x@sub.example.org today"),
            (2, "call +1 (555) 123-4567 or 555.987.6543 now"),
            (3, "host 10.0.0.1 and 192.168.255.3 respond"),
            (4, "nothing sensitive here, version 1.2 of doc 2024"),
        ],
        "doc_id long, text string",
    )
    counts = {r.doc_id: r for r in pii_counts(docs).collect()}
    assert counts[1].n_email == 2 and counts[1].n_phone == 0
    assert counts[2].n_phone == 2 and counts[2].n_ipv4 == 0
    assert counts[3].n_ipv4 == 2 and counts[3].n_email == 0
    assert (counts[4].n_email, counts[4].n_ipv4, counts[4].n_phone) == (0, 0, 0)

    scrubbed = {r.doc_id: r.text for r in scrub_pii(docs).collect()}
    assert scrubbed[1] == "reach <EMAIL> or <EMAIL> today"
    assert scrubbed[2] == "call <PHONE> or <PHONE> now"
    assert scrubbed[3] == "host <IPV4> and <IPV4> respond"
    assert scrubbed[4] == "nothing sensitive here, version 1.2 of doc 2024"


def test_scrub_pii_subset_and_out_col(spark):
    docs = spark.createDataFrame(
        [(1, "bob@example.com at 10.0.0.1")], "doc_id long, text string"
    )
    out = scrub_pii(docs, kinds=["email"], out_col="clean").first()
    assert out.text == "bob@example.com at 10.0.0.1"  # original untouched
    assert out.clean == "<EMAIL> at 10.0.0.1"  # only emails masked
    with pytest.raises(ValueError):
        scrub_pii(docs, kinds=["ssn"])


def test_pii_ipv4_claims_dotted_runs_before_phone(spark):
    # a dotted quad must become <IPV4>, never a partial <PHONE> match
    docs = spark.createDataFrame(
        [(1, "ping 172.16.254.1 then dial 555-123-4567")], "doc_id long, text string"
    )
    assert scrub_pii(docs).first().text == "ping <IPV4> then dial <PHONE>"
    assert set(PII_PATTERNS) == {"email", "ipv4", "phone"}


# --- target-mix sampling --------------------------------------------------


def test_target_mix_sample_rates_and_determinism(documents):
    fracs = {"src0": 0.0, "src1": 1.0}
    mixed = target_mix_sample(
        documents, "source", fracs, key_col="doc_id", default_fraction=0.5
    )
    base = {r.source: r["count"] for r in documents.groupBy("source").count().collect()}
    kept = {r.source: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert "src0" not in kept  # fraction 0 keeps nothing
    assert kept["src1"] == base["src1"]  # fraction 1 keeps every row, exactly
    # pooled default strata land near the 0.5 target
    default_total = sum(n for s, n in base.items() if s not in fracs)
    default_kept = sum(n for s, n in kept.items() if s not in fracs)
    assert abs(default_kept / default_total - 0.5) < 0.1
    # deterministic under re-layout
    again = target_mix_sample(
        documents.repartition(11), "source", fracs, key_col="doc_id",
        default_fraction=0.5,
    )
    assert sorted(r.doc_id for r in mixed.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )


def test_target_mix_sample_nested_per_stratum(documents):
    small = target_mix_sample(
        documents, "source", {"src2": 0.2}, key_col="doc_id", default_fraction=0.0
    )
    big = target_mix_sample(
        documents, "source", {"src2": 0.6}, key_col="doc_id", default_fraction=0.0
    )
    s = {r.doc_id for r in small.select("doc_id").collect()}
    b = {r.doc_id for r in big.select("doc_id").collect()}
    assert s <= b  # growing a stratum's fraction never re-draws


def test_target_mix_sample_validates():
    with pytest.raises(ValueError):
        target_mix_sample(None, "source", {"web": 1.5}, key_col="doc_id")


def test_domain_mix_shares_sum_to_one(documents):
    rows = domain_mix(documents).collect()
    assert {r.source for r in rows} == {
        r.source for r in documents.select("source").distinct().collect()
    }
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    total_docs = documents.count()
    assert sum(r.n_docs for r in rows) == total_docs


# --- deterministic epoch shuffle ------------------------------------------


def test_deterministic_shuffle_reproducible_and_seed_sensitive(documents):
    from real_time_financial_data_pipeline_spark.operators.training import (
        deterministic_shuffle,
    )

    a = [r.doc_id for r in deterministic_shuffle(documents, ["doc_id"], seed=1).collect()]
    b = [
        r.doc_id
        for r in deterministic_shuffle(
            documents.repartition(13, "source"), ["doc_id"], seed=1
        ).collect()
    ]
    assert a == b  # layout-independent global order
    assert sorted(a) == sorted(r.doc_id for r in documents.collect())  # permutation
    c = [r.doc_id for r in deterministic_shuffle(documents, ["doc_id"], seed=2).collect()]
    assert a != c  # another epoch, another order
    assert sorted(a) == sorted(c)
    with pytest.raises(ValueError):
        deterministic_shuffle(documents, [])


# --- corpus clustering ----------------------------------------------------


def test_cluster_assign_deterministic_and_complete(embeddings):
    out = cluster_assign(embeddings, k=8)
    rows = {r.vec_id: r.cluster_id for r in out.select("vec_id", "cluster_id").collect()}
    assert len(rows) == embeddings.count()  # every vector tagged
    assert set(rows.values()) <= set(range(8))
    again = {
        r.vec_id: r.cluster_id
        for r in cluster_assign(embeddings.repartition(9), k=8)
        .select("vec_id", "cluster_id")
        .collect()
    }
    assert rows == again  # layout-independent fit + assign


def test_cluster_assign_reuses_centroids(embeddings):
    cents = train_centroids(embeddings, n_lists=4)
    assert cents.shape[0] == 4
    # assigning a SLICE of the corpus with the fitted quantizer agrees with
    # the full-corpus assignment on those rows (new-batch assignment path)
    full = {
        r.vec_id: r.cluster_id
        for r in cluster_assign(embeddings, centroids=cents).collect()
    }
    part = {
        r.vec_id: r.cluster_id
        for r in cluster_assign(
            embeddings.filter(F.col("vec_id") % 3 == 0), centroids=cents
        ).collect()
    }
    assert part == {k: v for k, v in full.items() if k % 3 == 0}


def test_cluster_assign_groups_similar_vectors(spark):
    # two tight, well-separated blobs -> k=2 splits them exactly
    rng = np.random.default_rng(7)
    a = rng.normal(loc=(10, 0, 0), scale=0.01, size=(20, 3))
    b = rng.normal(loc=(0, 10, 0), scale=0.01, size=(20, 3))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([a, b]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_assign(df, k=2, sample_size=40).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.vec_id)
    assert len(by_cluster) == 2
    groups = sorted(frozenset(v) for v in by_cluster.values())
    assert sorted(map(sorted, groups)) == [list(range(20)), list(range(20, 40))]


def test_cluster_mix_shares(embeddings):
    assigned = cluster_assign(embeddings, k=4)
    mix = cluster_mix(assigned).collect()
    assert abs(sum(r.share for r in mix) - 1.0) < 1e-4
    assert sum(r.n_vecs for r in mix) == embeddings.count()
    by_label = cluster_mix(assigned, strata_col="label").collect()
    assert sum(r.n_vecs for r in by_label) == embeddings.count()


def test_anchor_profile_without_trained_gate_fails_fast(spark):
    """anchor_profile feeds ONLY the trained gates (quality_model /
    lang_model) — passed with neither configured, the anchor join would
    run and then gate nothing (r16 advice).  Both ladder twins raise
    instead, mirroring the sibling anchor_broadcast / lang_model
    guards; heuristic-only ladders (langs without lang_model) raise
    too, since the marker heuristic stays on the page's own prose."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
    )
    from real_time_financial_data_pipeline_spark.streaming.training import (
        stream_training_chunks,
    )

    docs = spark.createDataFrame(
        [(1, "hello world text", "http://a.com/x")],
        "doc_id long, text string, uri string",
    )
    profile = spark.createDataFrame(
        [("a.com", "hello", 3, 1)],
        "dst_domain string, term string, n long, rank long",
    )
    for kwargs in ({}, {"langs": ["en"]}):
        with pytest.raises(ValueError, match="anchor_profile without a trained gate"):
            curate_documents(
                docs,
                anchor_profile=profile,
                url_col="uri",
                near_dup_threshold=None,
                **kwargs,
            )
        with pytest.raises(ValueError, match="anchor_profile without a trained gate"):
            stream_training_chunks(
                docs, anchor_profile=profile, url_col="uri", **kwargs
            )
