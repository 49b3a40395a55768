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
