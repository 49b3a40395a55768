"""Substring-level (ExactSubstr-style) dedup — dedup.py:
substring_dup_spans / apply_substring_dedup: planted shared passages,
keep-first survivorship, overlap/adjacency merging into maximal spans,
stride recall contract, and a content-keyed DuckDB span oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.dedup import (
    apply_substring_dedup,
    substring_dup_spans,
)


def _doc(words):
    return " ".join(words)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rand_words(rng, n, tag):
    return [f"{tag}{int(x)}" for x in rng.integers(0, 5000, n)]


class TestSpans:
    def test_planted_passage_marked_in_all_but_first(self, spark):
        """A 60-token passage shared by three documents (unique filler
        around it): with window 50 every occurrence except the smallest
        (doc, start) is covered by exactly one maximal span of the
        passage's length."""
        rng = np.random.default_rng(1)
        passage = [f"p{i}" for i in range(60)]
        rows = [
            (0, _doc(_rand_words(rng, 30, "a") + passage + _rand_words(rng, 20, "b"))),
            (1, _doc(_rand_words(rng, 10, "c") + passage + _rand_words(rng, 40, "d"))),
            (2, _doc(passage + _rand_words(rng, 25, "e"))),
            (3, _doc(_rand_words(rng, 80, "f"))),  # untouched bystander
        ]
        spans = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_dup_spans(_mk(spark, rows), window_tokens=50).collect()
        }
        # doc 0 holds the canonical first occurrence (min (doc, start))
        assert spans == {(1, 10, 70), (2, 0, 60)}

    def test_internal_repeat_merges_to_one_span(self, spark):
        """A document repeating a passage back-to-back: the second copy's
        windows overlap/adjoin pairwise and must merge into ONE maximal
        span; the first copy survives as canonical."""
        passage = [f"q{i}" for i in range(50)]
        rows = [(7, _doc(passage + passage + ["tail1", "tail2"]))]
        got = substring_dup_spans(_mk(spark, rows), window_tokens=50).collect()
        assert [(r.doc_id, r.span_start, r.span_end) for r in got] == [(7, 50, 100)]

    def test_stride_content_anchored_recall(self, spark):
        """stride > 1 samples CONTENT-anchored window starts, so a long
        shared passage is detected across occurrences even at
        deliberately adversarial alignments (offsets 1 and 2 mod 3 —
        the case an arithmetic per-document stride can NEVER catch,
        because the two occurrences would sample disjoint relative
        positions).  Dense stride=1 remains position-exhaustive, and the
        sampled-window count actually shrinks (~1/s): the cost knob is
        real, not cosmetic."""
        rng = np.random.default_rng(5)
        passage = [f"v{i}" for i in range(80)]  # 31 eligible anchor slots
        rows = [
            (0, _doc(_rand_words(rng, 1, "x") + passage + _rand_words(rng, 6, "y"))),
            (1, _doc(_rand_words(rng, 2, "m") + passage + _rand_words(rng, 4, "n"))),
        ]
        s3 = substring_dup_spans(_mk(spark, rows), window_tokens=50, stride=3)
        marked = {(r.doc_id, r.span_start, r.span_end) for r in s3.collect()}
        # doc 1's copy (non-canonical) must carry a span inside [2, 82)
        assert any(d == 1 and s >= 2 and e <= 82 for d, s, e in marked), marked
        # the knob really samples: strided window count well under dense
        from real_time_financial_data_pipeline_spark.operators.dedup import (
            substring_dup_spans as _sds,
        )

        s1_spans = _sds(_mk(spark, rows), window_tokens=50, stride=1)
        m1 = {(r.doc_id, r.span_start, r.span_end) for r in s1_spans.collect()}
        # dense mode marks doc 1's whole copy as one maximal span
        assert (1, 2, 82) in m1

    def test_winnow_catches_anchor_free_passage(self, spark):
        """The winnowing sampler's deterministic guarantee: a passage
        built EXCLUSIVELY from non-anchor tokens (every token hash != 0
        mod stride — the pathological content that evades the anchor
        sampler entirely) is still caught across occurrences at
        adversarial alignments, because every length-s start
        neighborhood keeps its content-determined leftmost-min
        position."""
        rng = np.random.default_rng(31)
        s = 3
        # mine non-anchor tokens with a throwaway Spark query
        pool = spark.createDataFrame(
            [(f"t{i}",) for i in range(400)], "tok string"
        ).select(
            "tok", F.pmod(F.xxhash64("tok"), F.lit(s)).alias("m")
        )
        non_anchors = [r.tok for r in pool.filter(F.col("m") != 0).collect()]
        assert len(non_anchors) >= 60
        passage = non_anchors[:60]  # 60 >= 50 + 3 - 1
        rows = [
            (0, _doc(_rand_words(rng, 1, "x") + passage + _rand_words(rng, 5, "y"))),
            (1, _doc(_rand_words(rng, 2, "m") + passage + _rand_words(rng, 3, "n"))),
        ]
        anchor = substring_dup_spans(
            _mk(spark, rows), window_tokens=50, stride=s, sampling="anchor"
        ).collect()
        assert anchor == []  # the evasion is real
        winnow = {
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_dup_spans(
                _mk(spark, rows), window_tokens=50, stride=s, sampling="winnow"
            ).collect()
        }
        assert any(d == 1 and st >= 2 and e <= 62 for d, st, e in winnow), winnow

    def test_winnow_dense_equivalence_at_stride_1(self, spark):
        passage = [f"e{i}" for i in range(25)]
        rows = [(0, _doc(passage)), (1, _doc(passage))]
        a = sorted(map(tuple, substring_dup_spans(
            _mk(spark, rows), window_tokens=25, stride=1, sampling="winnow").collect()))
        b = sorted(map(tuple, substring_dup_spans(
            _mk(spark, rows), window_tokens=25, stride=1).collect()))
        assert a == b == [(1, 0, 25)]

    def test_bad_args(self, spark):
        df = _mk(spark, [(0, "a b")])
        with pytest.raises(ValueError):
            substring_dup_spans(df, window_tokens=1)
        with pytest.raises(ValueError):
            substring_dup_spans(df, stride=0)
        with pytest.raises(ValueError):
            substring_dup_spans(df, min_count=1)
        with pytest.raises(ValueError):
            substring_dup_spans(df, sampling="every-other")

    def test_duckdb_span_oracle(self, spark):
        """Content-keyed DuckDB replay of the whole operator on a random
        corpus with planted repeats: windows, counts, keep-first marking,
        and the maximal-interval merge recomputed in SQL (window CONTENT
        as the key where Spark hashes — collision-free at this size)."""
        import duckdb
        import pandas as pd

        rng = np.random.default_rng(11)
        shared = [f"s{i}" for i in range(23)]
        rows = []
        for d in range(12):
            words = _rand_words(rng, int(rng.integers(5, 40)), f"u{d}_")
            if d % 3 == 0:
                k = int(rng.integers(0, max(1, len(words) - 1)))
                words = words[:k] + shared + words[k:]
            rows.append((d, _doc(words)))
        W = 20
        got = sorted(
            (r.doc_id, r.span_start, r.span_end)
            for r in substring_dup_spans(_mk(spark, rows), window_tokens=W).collect()
        )
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
        exp = sorted(
            tuple(r)
            for r in con.execute(f"""
            WITH toks AS (
                SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
                FROM docs
            ), wins AS (
                SELECT doc_id, i - 1 AS pos,
                       array_to_string(t[i : i + {W} - 1], ' ') AS content
                FROM toks CROSS JOIN LATERAL
                    (SELECT unnest(generate_series(1, len(t) - {W} + 1)) AS i) g
                WHERE len(t) >= {W}
            ), dup AS (
                SELECT content, min(struct_pack(id := doc_id, pos := pos)) AS first
                FROM wins GROUP BY content HAVING count(*) >= 2
            ), marked AS (
                SELECT w.doc_id, w.pos
                FROM wins w JOIN dup d USING (content)
                WHERE NOT (d.first.id = w.doc_id AND d.first.pos = w.pos)
            ), seq AS (
                SELECT doc_id, pos,
                       CASE WHEN pos <= max(pos + {W}) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            THEN 0 ELSE 1 END AS brk
                FROM marked
            ), grp AS (
                SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS g
                FROM seq
            )
            SELECT doc_id, min(pos) AS span_start, max(pos) + {W} AS span_end
            FROM grp GROUP BY doc_id, g
            """).fetchall()
        )
        assert got == exp and len(got) >= 3


class TestIncremental:
    def test_new_batch_vs_corpus_and_persisted_index(self, spark):
        """The incremental form: a new doc repeating a corpus passage is
        span-cut (corpus wins, no keep-first), new-only content passes;
        querying a precomputed substring_window_index gives the identical
        spans as deriving the corpus windows on the fly; and the batch
        form run on corpus+new agrees on the new doc's span."""
        from real_time_financial_data_pipeline_spark.operators.dedup import (
            substring_dup_spans_between,
            substring_window_index,
        )

        rng = np.random.default_rng(41)
        passage = [f"g{i}" for i in range(30)]
        corpus = _mk(spark, [
            (0, _doc(_rand_words(rng, 8, "a") + passage + _rand_words(rng, 5, "b"))),
            (1, _doc(_rand_words(rng, 40, "c"))),
        ])
        new = _mk(spark, [
            (100, _doc(_rand_words(rng, 3, "x") + passage + _rand_words(rng, 4, "y"))),
            (101, _doc(_rand_words(rng, 35, "z"))),
        ])
        live = sorted(map(tuple, substring_dup_spans_between(
            new, corpus, window_tokens=30).collect()))
        assert live == [(100, 3, 33)]
        idx = substring_window_index(corpus, window_tokens=30)
        via_idx = sorted(map(tuple, substring_dup_spans_between(
            new, corpus_index=idx, window_tokens=30).collect()))
        assert via_idx == live
        # batch form over the union marks the same new-doc span (and the
        # corpus occurrence survives as canonical there)
        batch = {
            (r.doc_id, r.span_start, r.span_end)
            for r in __import__(
                "real_time_financial_data_pipeline_spark.operators.dedup",
                fromlist=["substring_dup_spans"],
            ).substring_dup_spans(corpus.union(new), window_tokens=30).collect()
        }
        assert (100, 3, 33) in batch and not any(d == 0 for d, *_ in batch)

    def test_index_param_contract_enforced(self, spark, tmp_path):
        """The persisted index carries its (window_tokens, stride,
        sampling) build parameters as window_hash column metadata; a
        mismatched query raises instead of silently under-detecting, the
        contract survives a parquet round trip, and a pre-contract index
        (no metadata) warns rather than passing silently."""
        from real_time_financial_data_pipeline_spark.operators.dedup import (
            substring_dup_spans_between,
            substring_window_index,
        )

        rng = np.random.default_rng(43)
        # 40 tokens > window + stride - 1 = 31: above winnowing's
        # deterministic recall bound, so the shared passage MUST be hit
        passage = [f"h{i}" for i in range(40)]
        corpus = _mk(spark, [(0, _doc(passage + _rand_words(rng, 5, "b")))])
        new = _mk(spark, [(100, _doc(_rand_words(rng, 3, "x") + passage))])

        idx_path = str(tmp_path / "widx")
        substring_window_index(
            corpus, window_tokens=30, stride=2, sampling="winnow"
        ).write.parquet(idx_path)
        idx = spark.read.parquet(idx_path)

        # matched query works through the round trip: sampled marks land
        # inside the planted passage (tokens 3..43 of doc 100)
        got = substring_dup_spans_between(
            new, corpus_index=idx, window_tokens=30, stride=2, sampling="winnow"
        ).collect()
        assert got
        assert all(
            r.doc_id == 100 and 3 <= r.span_start < r.span_end <= 43 for r in got
        )

        # any single mismatched parameter raises
        for kw in (
            {"window_tokens": 20, "stride": 2, "sampling": "winnow"},
            {"window_tokens": 30, "stride": 3, "sampling": "winnow"},
            {"window_tokens": 30, "stride": 2, "sampling": "anchor"},
        ):
            with pytest.raises(ValueError, match="built with"):
                substring_dup_spans_between(new, corpus_index=idx, **kw)

        # legacy index without metadata: warn, don't silently pass
        # (plain select preserves metadata; alias with empty metadata
        # simulates an index persisted before the contract existed)
        legacy = idx.select(F.col("window_hash").alias("window_hash", metadata={}))
        with pytest.warns(UserWarning, match="no build-parameter metadata"):
            substring_dup_spans_between(
                new, corpus_index=legacy, window_tokens=30, stride=2,
                sampling="winnow",
            ).collect()

    def test_requires_exactly_one_corpus_side(self, spark):
        from real_time_financial_data_pipeline_spark.operators.dedup import (
            substring_dup_spans_between,
        )

        df = _mk(spark, [(0, "a b c")])
        with pytest.raises(ValueError):
            substring_dup_spans_between(df)
        with pytest.raises(ValueError):
            substring_dup_spans_between(df, df, corpus_index=df.selectExpr(
                "CAST(doc_id AS bigint) AS window_hash"))


class TestApply:
    def test_cut_and_passthrough(self, spark):
        rng = np.random.default_rng(3)
        passage = [f"z{i}" for i in range(30)]
        head = _rand_words(rng, 11, "h")
        tail = _rand_words(rng, 6, "t")
        rows = [
            (0, _doc(passage)),                    # canonical — survives
            (1, _doc(head + passage + tail)),      # cut from the middle
            (2, _doc(_rand_words(rng, 40, "k"))),  # no spans: byte-identical
        ]
        df = _mk(spark, rows)
        spans = substring_dup_spans(df, window_tokens=30)
        out = {r.doc_id: r.text for r in apply_substring_dedup(df, spans).collect()}
        assert out[0] == rows[0][1]
        assert out[1] == _doc(head + tail)
        assert out[2] == rows[2][1]

    def test_curation_ladder_integration(self, spark):
        """dedup_substrings= wires the stage into curate_documents ahead
        of scoring: a mid-document shared passage (invisible to
        paragraph- and doc-level dedup — different docs, one paragraph
        each) is cut from all but its canonical occurrence while both
        documents otherwise survive the ladder."""
        from real_time_financial_data_pipeline_spark.operators.training import (
            curate_documents,
        )

        rng = np.random.default_rng(9)
        passage = [f"dup{i}" for i in range(30)]
        # stopword-bearing filler so the quality gate passes
        filler = lambda n, tag: [
            w for i in range(n) for w in ("the", f"{tag}{i}")
        ]
        rows = [
            (0, _doc(filler(15, "a") + passage + filler(10, "b")), "en"),
            (1, _doc(filler(12, "c") + passage + filler(14, "d")), "en"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {
            r.doc_id: r.text
            for r in curate_documents(df, dedup_substrings=30).collect()
        }
        assert set(out) == {0, 1}
        assert "dup0" in out[0] and "dup29" in out[0]
        assert "dup0" not in out[1] and "dup29" not in out[1]
        assert "c0" in out[1] and "d13" in out[1]  # only the passage cut

    def test_non_text_columns_pass_through(self, spark):
        passage = " ".join(f"c{i}" for i in range(25))
        df = spark.createDataFrame(
            [(0, passage, "en"), (1, passage, "fr")],
            "doc_id long, text string, lang string",
        )
        spans = substring_dup_spans(df, window_tokens=25)
        out = apply_substring_dedup(df, spans)
        assert out.columns == ["doc_id", "text", "lang"]
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[0].text == passage and rows[1].text == ""
        assert rows[1].lang == "fr"
