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


def test_probe_exact_on_full_int64_range_with_nulls_in_batch(spark):
    """The r11 advisor finding: a NULL in the batch used to turn the key
    column float64 in pandas, corrupting |key| > 2^53 and probing wrong
    bit positions — a known fingerprint could then test 'definitely new'
    and sail past the verify join.  Keys now reach pandas as non-nullable
    int64, so full-range keys probe exactly, nulls or not."""
    big_keys = np.array(
        [2**63 - 25, 2**63 - 1, -(2**63), -(2**63) + 11, 2**53 + 1, -(2**53) - 3],
        dtype=np.int64,
    )
    n_bits, n_hashes = bloom_params(len(big_keys), 0.01)
    local = LocalBloom(n_bits, n_hashes)
    local.add_many(big_keys)
    rows = [(int(k),) for k in big_keys] + [(None,)]
    probed = (
        spark.createDataFrame(rows, "k long")
        .withColumn("maybe", might_contain(local, "k"))
        .collect()
    )
    got = {r.k: r.maybe for r in probed}
    assert all(got[int(k)] for k in big_keys)  # zero false negatives
    assert got[None] is True  # null still routes to the verify join

    # end-to-end: anti_join_known stays row-identical to the plain anti
    # join when the batch mixes nulls with full-magnitude known keys
    known = spark.createDataFrame([(int(k),) for k in big_keys[:3]], "fingerprint long")
    batch = spark.createDataFrame(
        [(int(k), f"d{i}") for i, k in enumerate(big_keys)] + [(None, "dnull")],
        "fingerprint long, payload string",
    )
    bloom = build_bloom(known, fpp=0.01)
    plain = {r.payload for r in batch.join(known, "fingerprint", "left_anti").collect()}
    fast = {r.payload for r in anti_join_known(batch, known, bloom=bloom).collect()}
    assert fast == plain == {"d3", "d4", "d5", "dnull"}


def test_probe_broadcasts_bitmap_not_closure(spark, monkeypatch):
    """The bitmap must ride an explicit SparkContext broadcast (shipped
    once per executor, torrent-distributed), not the pickled UDF closure
    (re-serialized with every task set) — at the module's stated 1e9-key
    scale a closure-borne bitmap exceeds task serialization limits."""
    keys = _rand_keys(1_000, seed=9)
    n_bits, n_hashes = bloom_params(len(keys), 0.01)
    b = LocalBloom(n_bits, n_hashes)
    b.add_many(keys)

    sc = spark.sparkContext
    broadcast_payloads = []
    orig = sc.broadcast

    def spy(value):
        broadcast_payloads.append(value)
        return orig(value)

    monkeypatch.setattr(sc, "broadcast", spy)
    col = might_contain(b, "k")
    assert any(
        isinstance(v, np.ndarray) and v is b.bits for v in broadcast_payloads
    ), "bits array was not explicitly broadcast"
    # and the broadcast-backed probe still answers correctly
    df = spark.createDataFrame([(int(k),) for k in keys[:50]], "k long")
    assert all(r.m for r in df.withColumn("m", col).collect())


def test_batch_ladder_known_content_composition(spark):
    """known_fingerprints= / known_bloom= through the BATCH curation
    ladder (curate_documents and prepare_training_set): already-landed
    content is excluded, the Bloom changes the plan but never the result,
    and both knobs mirror the streaming twin's semantics."""
    from real_time_financial_data_pipeline_spark.operators.text import fingerprint
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
        prepare_training_set,
    )

    base = (
        "the quick y{i}a brown fox y{i}b jumps over y{i}c the lazy y{i}d "
        "dog walks y{i}e onward today y{i}f in the y{i}g usual way y{i}h"
    )
    docs = spark.createDataFrame(
        [(i, base.format(i=i)) for i in range(10)], "doc_id long, text string"
    )
    # lake already holds docs 0-3, under DIFFERENT ids (content identity)
    landed = docs.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    known = fingerprint(landed, "text").select("fingerprint")
    bloom = build_bloom(known, fpp=0.01)

    plain = {
        r.doc_id
        for r in curate_documents(
            docs, min_quality=0.5, near_dup_threshold=None,
            known_fingerprints=known,
        ).collect()
    }
    fast = {
        r.doc_id
        for r in curate_documents(
            docs, min_quality=0.5, near_dup_threshold=None,
            known_fingerprints=known, known_bloom=bloom,
        ).collect()
    }
    assert plain == fast == set(range(4, 10))
    # the fingerprint working column never leaks out (n_copies is the
    # ladder's own exact-dedup annotation, present with or without knobs)
    out = curate_documents(
        docs, min_quality=0.5, near_dup_threshold=None,
        known_fingerprints=known, known_bloom=bloom,
    )
    assert "_kc_fp" not in out.columns
    assert set(docs.columns) <= set(out.columns)

    # end-to-end: prepare_training_set forwards both knobs; chunk output
    # contains no chunk of any already-known document
    chunks_plain = prepare_training_set(
        docs, min_quality=0.5, near_dup_threshold=None,
        chunk_tokens=8, overlap_tokens=2, known_fingerprints=known,
    )
    chunks_fast = prepare_training_set(
        docs, min_quality=0.5, near_dup_threshold=None,
        chunk_tokens=8, overlap_tokens=2,
        known_fingerprints=known, known_bloom=bloom,
    )
    rows_plain = {(r.doc_id, r.chunk_id, r.chunk_text) for r in chunks_plain.collect()}
    rows_fast = {(r.doc_id, r.chunk_id, r.chunk_text) for r in chunks_fast.collect()}
    assert rows_plain == rows_fast
    assert {d for d, _, _ in rows_fast} == set(range(4, 10))


def test_probe_broadcast_memoized_per_bloom(spark, monkeypatch):
    """Review-caught leak: building the probe column repeatedly must not
    create a fresh bitmap-sized broadcast each time — one broadcast per
    LocalBloom instance, memoized."""
    keys = _rand_keys(500, seed=11)
    n_bits, n_hashes = bloom_params(len(keys), 0.01)
    b = LocalBloom(n_bits, n_hashes)
    b.add_many(keys)
    sc = spark.sparkContext
    count = [0]
    orig = sc.broadcast

    def spy(value):
        count[0] += 1
        return orig(value)

    monkeypatch.setattr(sc, "broadcast", spy)
    for _ in range(4):
        might_contain(b, "k")
    assert count[0] == 1


def test_unparsable_string_keys_route_to_verify_join(spark):
    """Review-caught exactness breach: non-ANSI cast('long') nulls an
    unparsable string key; flagging the CAST result (not the source
    column) sends those rows to 'maybe' and the exact verify join, so
    anti_join_known stays row-identical to the plain anti join even on
    a string fingerprint column."""
    known = spark.createDataFrame([("alpha",), ("beta",)], "fingerprint string")
    batch = spark.createDataFrame(
        [("alpha", "dup"), ("gamma", "new1"), ("42", "numericstr"), (None, "nullkey")],
        "fingerprint string, payload string",
    )
    bloom = build_bloom(
        spark.createDataFrame([(1,), (2,)], "fingerprint long"), fpp=0.01
    )  # bitmap contents are irrelevant: every string key must bypass it
    plain = {r.payload for r in batch.join(known, "fingerprint", "left_anti").collect()}
    fast = {r.payload for r in anti_join_known(batch, known, bloom=bloom).collect()}
    assert fast == plain == {"new1", "numericstr", "nullkey"}


def test_probe_memo_invalidated_on_mutation_and_context_change(spark):
    """Review-caught staleness: the per-bloom broadcast memo must not
    outlive either (a) a bitmap mutation via add_many — a NEW probe
    column must see the new keys — or (b) the SparkContext it was
    created under — a bloom reused across a session restart must
    re-broadcast, not probe through the dead context's handle."""
    keys = spark.createDataFrame([(11,), (22,)], "k long")
    bloom = build_bloom(keys, "k", expected_items=64)
    probe_df = spark.range(1).select(F.lit(33).alias("k"))
    first = probe_df.select(might_contain(bloom, "k").alias("m")).first().m
    assert first is False  # 33 not yet added (fpp negligible at this size)
    bc_before = bloom._bc_bits
    assert bc_before is not None
    # (a) mutation drops the memo; the next probe column re-broadcasts
    # the NEW bitmap and finds the added key
    # review-caught storage ratchet: the superseded broadcast must be
    # UNPERSISTED on mutation (non-blocking), not just dropped — a
    # dropped-but-live handle keeps bitmap-sized executor blocks until
    # JVM GC.  unpersist (not destroy) on purpose: probe columns built
    # before the mutation still hold the old handle, and unpersist
    # keeps it re-fetchable from the driver (copy-on-probe semantics)
    # while freeing the executor-side blocks.
    unpersist_calls = []
    orig_unpersist = bc_before.unpersist

    def spy(blocking=False):
        unpersist_calls.append(blocking)
        return orig_unpersist(blocking)

    bc_before.unpersist = spy
    bloom.add_many(np.array([33], dtype=np.int64))
    assert bloom._bc_bits is None
    assert unpersist_calls == [False]
    assert probe_df.select(might_contain(bloom, "k").alias("m")).first().m is True
    assert bloom._bc_bits is not bc_before
    # (b) a memo stamped by a DIFFERENT context is not reused
    bc_mut = bloom._bc_bits
    bloom._bc_ctx = object()  # simulate a restarted SparkContext
    probe_df.select(might_contain(bloom, "k").alias("m")).first()
    assert bloom._bc_bits is not bc_mut
    assert bloom._bc_ctx is spark.sparkContext
