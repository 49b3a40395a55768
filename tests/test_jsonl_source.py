"""JSONL document ingestion (sources/jsonl_source.py): synonym
normalization, content-addressed missing ids, malformed-line quarantine
with raw preservation, rule routing, and the downstream-operators
round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.quality import Rule
from real_time_financial_data_pipeline_spark.sources.jsonl_source import (
    default_document_rules,
    load_documents_jsonl,
)


def _write(tmp_path, lines, name="dump.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestLoad:
    def test_synonyms_and_schema(self, spark, tmp_path):
        path = _write(tmp_path, [
            '{"id": 1, "content": "alpha beta", "language": "en", "url": "web"}',
            '{"doc_id": 2, "text": "gamma", "lang": "fr", "source": "books"}',
            '{"document_id": 3, "body": "delta epsilon zeta", "subset": "code"}',
        ])
        good, bad = load_documents_jsonl(spark, path)
        assert bad.count() == 0
        rows = {r.doc_id: r for r in good.collect()}
        assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        assert rows[1].text == "alpha beta" and rows[1].lang == "en" and rows[1].source == "web"
        assert rows[2].source == "books"
        assert rows[3].text == "delta epsilon zeta" and rows[3].source == "code"
        assert rows[3].lang is None  # absent optional field stays null
        assert rows[1].n_chars == 10

    def test_missing_ids_content_addressed(self, spark, tmp_path):
        path = _write(tmp_path, [
            '{"text": "same text"}',
            '{"text": "same text"}',
            '{"text": "other text"}',
        ])
        good, bad = load_documents_jsonl(spark, path)
        ids = [r.doc_id for r in good.collect()]
        assert bad.count() == 0
        assert len(set(ids)) == 2  # identical texts collide BY DESIGN
        again, _ = load_documents_jsonl(spark, path)
        assert sorted(ids) == sorted(r.doc_id for r in again.collect())

    def test_string_ids_resolved_not_quarantined(self, spark, tmp_path):
        """Dolma/FineWeb/RedPajama dumps ship STRING ids; the loader must
        ingest them (numeric strings pass through as their value,
        non-numeric ids are content-addressed via xxhash64) instead of
        marking the records corrupt under the long-typed schema."""
        path = _write(tmp_path, [
            '{"id": "doc-abc-001", "text": "string id doc"}',
            '{"id": "42", "text": "numeric string id"}',
            '{"id": 7, "text": "plain numeric id"}',
        ])
        good, bad = load_documents_jsonl(spark, path)
        assert bad.count() == 0
        rows = {r.text: r.doc_id for r in good.collect()}
        assert rows["numeric string id"] == 42  # "42" and 42 agree
        assert rows["plain numeric id"] == 7
        assert rows["string id doc"] is not None
        # deterministic across runs: hashed ids are content-addressed
        again, _ = load_documents_jsonl(spark, path)
        assert rows == {r.text: r.doc_id for r in again.collect()}

    def test_malformed_lines_quarantined_with_raw(self, spark, tmp_path):
        path = _write(tmp_path, [
            '{"doc_id": 1, "text": "fine"}',
            'this is not json at all',
            '{"doc_id": 3, "text": "also fine"}',
        ])
        good, bad = load_documents_jsonl(spark, path)
        assert {r.doc_id for r in good.collect()} == {1, 3}
        brows = bad.collect()
        assert len(brows) == 1
        assert "well_formed_json" in brows[0]._violations
        assert "not json" in brows[0]._corrupt_record
        # the content-address fallback must NOT stamp textless rows:
        # Spark's xxhash64 skips null inputs and returns its seed (42),
        # so an unguarded hash would give every malformed row id 42 and
        # silently dodge the doc_id_not_null rule
        assert brows[0].doc_id is None
        assert "doc_id_not_null" in brows[0]._violations

    def test_rule_routing_not_dropping(self, spark, tmp_path):
        path = _write(tmp_path, [
            '{"doc_id": 1, "text": "ok doc"}',
            '{"doc_id": 2, "text": ""}',          # fails the length band
            '{"doc_id": 3}',                       # no text at all
        ])
        good, bad = load_documents_jsonl(spark, path)
        assert {r.doc_id for r in good.collect()} == {1}
        viol = {r.doc_id: set(r._violations) for r in bad.collect()}
        assert viol[2] == {"text_length_band"}
        assert "text_not_null" in viol[3]
        # counts conserve: nothing silently dropped
        assert good.count() + bad.count() == 3

    def test_custom_rules(self, spark, tmp_path):
        path = _write(tmp_path, [
            '{"doc_id": 1, "text": "short", "lang": "en"}',
            '{"doc_id": 2, "text": "short", "lang": "xx"}',
        ])
        rules = default_document_rules() + [
            Rule("lang_known", "lang IN ('en', 'fr')")
        ]
        good, bad = load_documents_jsonl(spark, path, rules=rules)
        assert [r.doc_id for r in good.collect()] == [1]
        assert {r.doc_id for r in bad.collect()} == {2}

    def test_gzipped_dump(self, spark, tmp_path):
        """Corpus dumps ship compressed; the loader must read .jsonl.gz
        transparently (Spark's json source decompresses by extension)."""
        import gzip

        p = tmp_path / "dump.jsonl.gz"
        with gzip.open(p, "wt") as f:
            f.write('{"doc_id": 1, "text": "zipped doc"}\n')
            f.write('{"doc_id": 2, "text": "another one"}\n')
        good, bad = load_documents_jsonl(spark, str(p))
        assert bad.count() == 0
        assert {r.text for r in good.collect()} == {"zipped doc", "another one"}

    def test_stream_twin_equals_batch(self, spark, tmp_path):
        """stream_documents_jsonl over two micro-batches lands exactly the
        batch loader's (good, quarantine) split of the same files — the
        family's batch ≡ stream contract."""
        from real_time_financial_data_pipeline_spark.sources.jsonl_source import (
            stream_documents_jsonl,
        )

        src = tmp_path / "drop"
        src.mkdir()
        (src / "f1.jsonl").write_text(
            '{"doc_id": 1, "text": "first doc"}\n'
            "garbage line\n"
        )
        (src / "f2.jsonl").write_text(
            '{"doc_id": 2, "text": "second doc"}\n'
            '{"doc_id": 3, "text": ""}\n'
        )
        q = stream_documents_jsonl(
            spark, str(src), str(tmp_path / "good"), str(tmp_path / "quar"),
            str(tmp_path / "ckpt"), trigger_available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        # the streaming sink partitions by batch_id for idempotent
        # retries; drop it to compare against the batch loader's shape
        got_good = {
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "good"))
            .drop("batch_id")
            .collect()
        }
        got_bad = {
            (r.doc_id, tuple(sorted(r._violations)))
            for r in spark.read.parquet(str(tmp_path / "quar")).collect()
        }
        bg, bb = load_documents_jsonl(spark, str(src / "*.jsonl"))
        assert got_good == {tuple(r) for r in bg.collect()}
        assert got_bad == {
            (r.doc_id, tuple(sorted(r._violations))) for r in bb.collect()
        }
        assert len(got_good) == 2 and len(got_bad) == 2

    def test_stream_rerun_is_idempotent(self, spark, tmp_path):
        """Replaying the same input with a fresh checkpoint lands on the
        same batch_id partitions and OVERWRITES them — row counts do not
        grow, which is exactly the retry-after-partial-write guarantee
        (foreachBatch is at-least-once; the per-batch overwrite makes the
        sink effectively-once)."""
        from real_time_financial_data_pipeline_spark.sources.jsonl_source import (
            stream_documents_jsonl,
        )

        src = tmp_path / "drop"
        src.mkdir()
        (src / "f1.jsonl").write_text('{"doc_id": 1, "text": "first doc"}\n')
        (src / "f2.jsonl").write_text('{"doc_id": 2, "text": ""}\n')
        for ckpt in ("ckpt_a", "ckpt_b"):  # second run simulates a replay
            q = stream_documents_jsonl(
                spark, str(src), str(tmp_path / "good"), str(tmp_path / "quar"),
                str(tmp_path / ckpt), trigger_available_now=True,
                max_files_per_trigger=1,
            )
            q.awaitTermination(120)
        assert spark.read.parquet(str(tmp_path / "good")).count() == 1
        assert spark.read.parquet(str(tmp_path / "quar")).count() == 1

    def test_feeds_downstream_operators(self, spark, tmp_path):
        """The ingested frame is a drop-in documents table: token stats
        and exact dedup run unmodified on it."""
        from real_time_financial_data_pipeline_spark.operators.dedup import (
            exact_dedup_keep_min,
        )
        from real_time_financial_data_pipeline_spark.operators.text import (
            token_stats,
        )

        path = _write(tmp_path, [
            '{"doc_id": 10, "text": "the quick brown fox", "lang": "en", "source": "a"}',
            '{"doc_id": 11, "text": "the quick brown fox", "lang": "en", "source": "a"}',
            '{"doc_id": 12, "text": "lazy dog", "lang": "en", "source": "b"}',
        ])
        good, _ = load_documents_jsonl(spark, path)
        stats = {r.doc_id: r for r in token_stats(good).collect()}
        assert stats[10].n_tokens == 4
        deduped = exact_dedup_keep_min(good, "text", "doc_id")
        assert {r.doc_id for r in deduped.collect()} == {10, 12}
