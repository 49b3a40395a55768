"""Embedding maintenance: numpy parity for L2 normalization, error bounds
for int8 quantization round-trips, zero-vector edges, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.embeddings import (
    dequantize_int8,
    l2_normalize,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    rows = [(int(i), [float(x) for x in rng.normal(0, 3, 16)]) for i in range(40)]
    rows.append((40, [0.0] * 16))  # zero vector edge
    rows.append((41, [1e-8] * 16))  # tiny-magnitude edge
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), {
        i: np.array(v, dtype=np.float64) for i, v in rows
    }


def test_l2_normalize_matches_numpy(vecs):
    df, ref = vecs
    got = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in l2_normalize(df).collect()}
    for i, v in ref.items():
        n = np.linalg.norm(np.asarray(v, dtype=np.float32).astype(np.float64))
        expected = v if n == 0 else np.asarray(v, dtype=np.float32).astype(np.float64) / n
        assert np.allclose(got[i], expected, atol=1e-6), i
    nz = [np.linalg.norm(got[i]) for i in ref if np.linalg.norm(ref[i]) > 0]
    assert np.allclose(nz, 1.0, atol=1e-5)


def test_quantize_roundtrip_error_bounds(vecs):
    df, ref = vecs
    out = dequantize_int8(quantize_int8(df)).collect()
    for r in out:
        orig = np.asarray(ref[r.vec_id], dtype=np.float32).astype(np.float64)
        deq = np.array(r.embedding_deq, dtype=np.float64)
        scale = float(r.embedding_q8.scale)
        assert all(-127 <= q <= 127 for q in r.embedding_q8.q)
        # round-to-nearest: per-element error <= scale/2 (+ float32 slack)
        assert np.abs(orig - deq).max() <= scale / 2 + 1e-6, r.vec_id
        if scale == 0.0:
            assert np.array_equal(deq, orig)  # zero vector reconstructs exactly


def test_quantize_preserves_cosine(vecs):
    df, ref = vecs
    deq = {
        r.vec_id: np.array(r.embedding_deq, dtype=np.float64)
        for r in dequantize_int8(quantize_int8(df)).collect()
    }
    ids = [i for i in ref if np.linalg.norm(ref[i]) > 1e-6]
    for a, b in zip(ids, ids[1:]):
        va, vb = ref[a], ref[b]
        cos_ref = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        qa, qb = deq[a], deq[b]
        cos_q = qa @ qb / (np.linalg.norm(qa) * np.linalg.norm(qb))
        assert abs(cos_ref - cos_q) < 0.02, (a, b)


def test_embedding_ops_are_map_only(embeddings):
    plan = (
        dequantize_int8(quantize_int8(l2_normalize(embeddings.limit(50))))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_quantized_search_recall(embeddings):
    """int8-quantized vectors must stay search-usable: brute-force top-10
    over the dequantized corpus recovers >= 0.9 of the exact float top-10
    on the sf0.001 embeddings."""
    from real_time_financial_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        recall_at_k,
    )

    corpus = embeddings.select("vec_id", "embedding")
    queries = corpus.filter(F.col("vec_id") < 5)
    exact = cosine_topk(corpus, queries, k=10)
    q8 = (
        dequantize_int8(quantize_int8(corpus))
        .select("vec_id", F.col("embedding_deq").alias("embedding"))
    )
    approx = cosine_topk(q8, queries, k=10)
    assert recall_at_k(exact, approx) >= 0.9


def test_quantized_topk_first_class_call(embeddings):
    """cosine_topk_q8 / quantized_cosine_topk: searching the int8 table
    directly (f64 in-kernel dequantization) recovers >= 0.9 of the exact
    float top-10 and stays within 2e-3 of the exact scores on overlapping
    neighbors."""
    from real_time_financial_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
        recall_at_k,
    )

    corpus = embeddings.select("vec_id", "embedding")
    queries = corpus.filter(F.col("vec_id") < 5)
    exact = cosine_topk(corpus, queries, k=10)
    approx = quantized_cosine_topk(corpus, queries, k=10)
    assert recall_at_k(exact, approx) >= 0.9

    e = {(r.query_id, r.neighbor_id): r.score for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id): r.score for r in approx.collect()}
    shared = set(e) & set(a)
    assert shared
    assert all(abs(e[k] - a[k]) < 2e-3 for k in shared)


def test_ivf_over_int8_corpus(embeddings):
    """IVF+SQ composition: full-probe IVF over the quantized corpus must
    EQUAL the brute-force quantized search (same dequantized f64 scoring
    kernel), and the probed variant must keep recall@10 >= 0.4 vs the
    exact float top-10 (the float IVF gate is 0.45; quantization may shave
    a little)."""
    from real_time_financial_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_q8,
        ivf_topk_q8,
        recall_at_k,
    )

    corpus = embeddings.select("vec_id", "embedding")
    queries = corpus.filter(F.col("vec_id") < 5)
    q8 = quantize_int8(corpus, "embedding", "_q8").select(
        "vec_id", F.col("_q8.q").alias("q"), F.col("_q8.scale").alias("scale")
    )

    full_probe = ivf_topk_q8(q8, queries, k=10, n_lists=8, n_probe=8).collect()
    brute = cosine_topk_q8(q8, queries, k=10).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(full_probe, key=key) == sorted(brute, key=key)

    exact = cosine_topk(corpus, queries, k=10)
    probed = ivf_topk_q8(q8, queries, k=10, n_lists=8, n_probe=3)
    assert recall_at_k(exact, probed) >= 0.4
