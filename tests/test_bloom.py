"""Bloom-prefiltered known-key exclusion (operators/bloom.py): exactness
(zero false negatives; anti_join_known row-identical to the plain anti
join), bounded false-positive rate, distributed build ≡ local build, and
the streaming known-content wiring."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.bloom import (
    LocalBloom,
    anti_join_known,
    bloom_params,
    build_bloom,
    might_contain,
)


def _rand_keys(n, seed, lo=-(2**62), hi=2**62):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=n, dtype=np.int64)


def test_bloom_params_math():
    n_bits, n_hashes = bloom_params(10_000, 0.01)
    assert n_bits & (n_bits - 1) == 0  # power of two
    assert n_bits >= 10_000 * 9  # ~9.6 bits/key at 1% fpp
    assert 5 <= n_hashes <= 9  # optimum k ≈ 7
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_bounded_fpp():
    keys = _rand_keys(20_000, seed=1)
    n_bits, n_hashes = bloom_params(len(keys), 0.01)
    b = LocalBloom(n_bits, n_hashes)
    b.add_many(keys)
    # EVERY inserted key tests positive — the property correctness rests on
    assert b.might_contain_many(keys).all()
    # fresh keys: fpp near the design point (generous 3x envelope)
    fresh = _rand_keys(20_000, seed=2)
    fresh = fresh[~np.isin(fresh, keys)]
    fp_rate = b.might_contain_many(fresh).mean()
    assert fp_rate < 0.03, fp_rate


def test_distributed_build_matches_local(spark):
    keys = _rand_keys(5_000, seed=3)
    df = spark.createDataFrame([(int(k),) for k in keys], "fingerprint long")
    dist = build_bloom(df.repartition(7), expected_items=len(keys), fpp=0.01)
    local = LocalBloom(dist.n_bits, dist.n_hashes)
    local.add_many(keys)
    assert np.array_equal(dist.bits, local.bits)  # bit-identical bitmaps
    # the Column probe agrees with the numpy probe
    probe_keys = np.concatenate([keys[:100], _rand_keys(100, seed=4)])
    pdf = spark.createDataFrame(
        [(int(k),) for k in probe_keys], "k long"
    ).withColumn("maybe", might_contain(dist, "k"))
    got = {r.k: r.maybe for r in pdf.collect()}
    want = dict(zip(probe_keys.tolist(), local.might_contain_many(probe_keys)))
    assert got == want
    assert all(got[int(k)] for k in keys[:100])  # inserted keys all 'maybe'


def test_anti_join_known_exactly_equals_plain_anti_join(spark):
    known_keys = _rand_keys(3_000, seed=5)
    batch_keys = np.concatenate([known_keys[:500], _rand_keys(3_000, seed=6)])
    known = spark.createDataFrame([(int(k),) for k in known_keys], "fingerprint long")
    batch = spark.createDataFrame(
        [(int(k), f"doc{i}") for i, k in enumerate(batch_keys)],
        "fingerprint long, payload string",
    )
    bloom = build_bloom(known, fpp=0.05)  # deliberately sloppy fpp: the
    # verify join must absorb every false positive
    plain = {tuple(r) for r in batch.join(known, "fingerprint", "left_anti").collect()}
    fast = {tuple(r) for r in anti_join_known(batch, known, bloom=bloom).collect()}
    nofilter = {tuple(r) for r in anti_join_known(batch, known).collect()}
    assert fast == plain == nofilter
    # NULL keys route to the verify join, never silently pass
    with_null = batch.unionByName(
        spark.createDataFrame([(None, "nullkey")], "fingerprint long, payload string")
    )
    out = {r.payload for r in anti_join_known(with_null, known, bloom=bloom).collect()}
    assert "nullkey" in out  # null fingerprint is not 'known'


def test_streaming_known_content_bloom_wiring(spark, tmp_path):
    """known_bloom through stream_training_chunks: output ids identical to
    the plain known_fingerprints run — the Bloom changes the plan, never
    the result."""
    from real_time_financial_data_pipeline_spark.operators.text import (
        fingerprint,
        tokens,
    )
    from real_time_financial_data_pipeline_spark.streaming.training import (
        stream_training_chunks,
    )

    base = (
        "the quick x{i}a brown fox x{i}b jumps over x{i}c the lazy x{i}d "
        "dog walks x{i}e onward today x{i}f in the x{i}g usual way x{i}h"
    )
    rows = [(i, base.format(i=i)) for i in range(8)]
    docs_df = spark.createDataFrame(rows, "doc_id long, text string")
    # lake already holds docs 0-2 (by content fingerprint)
    lake = fingerprint(docs_df.filter(F.col("doc_id") < 3), "text")
    known = lake.select("fingerprint")
    bloom = build_bloom(known, fpp=0.01)

    src = tmp_path / "bdocs"
    docs_df.write.parquet(str(src / "f1"))
    schema = spark.read.parquet(str(src / "f1")).schema

    def run(name, **kw):
        q = (
            stream_training_chunks(
                spark.readStream.schema(schema).parquet(str(src / "*")),
                chunk_tokens=8, overlap_tokens=2, min_quality=0.5,
                known_fingerprints=known, **kw,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        q.awaitTermination(120)
        return {r.doc_id for r in spark.table(name).collect()}

    plain_ids = run("bloom_plain")
    bloom_ids = run("bloom_fast", known_bloom=bloom)
    assert plain_ids == bloom_ids == set(range(3, 8))
