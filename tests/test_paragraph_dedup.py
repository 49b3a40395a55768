"""Corpus-level paragraph dedup (CCNet/Dolma sub-document stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.dedup import paragraph_dedup

BOILER = "subscribe to our newsletter"
UNIQ_A = "alpha paragraph with its own words"
UNIQ_B = "beta paragraph tells another story"
UNIQ_C = "gamma paragraph closes the set"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"{UNIQ_A}\n{BOILER}", "web"),
            (2, f"{BOILER}\n{UNIQ_B}", "web"),
            (3, f"{UNIQ_C}\n\n{BOILER}", "wiki"),
            (4, BOILER, "web"),  # nothing but boilerplate
            (5, f"{UNIQ_A} variant\nrepeat me\nrepeat me", "wiki"),  # within-doc dup
        ],
        "doc_id long, text string, source string",
    )


def test_paragraph_dedup_keeps_first_occurrence_only(spark):
    out = {r.doc_id: r.text for r in paragraph_dedup(_docs(spark)).collect()}
    # doc 1 holds the (min doc, min idx) occurrence of the boilerplate
    assert out[1] == f"{UNIQ_A}\n{BOILER}"
    assert out[2] == UNIQ_B
    # blank structural line survives in place
    assert out[3] == f"{UNIQ_C}\n"
    assert out[4] == ""  # fully-boilerplate doc comes back empty
    # within-doc repeats count toward the corpus threshold
    assert out[5] == f"{UNIQ_A} variant\nrepeat me"


def test_paragraph_dedup_drop_all_occurrences(spark):
    out = {
        r.doc_id: r.text
        for r in paragraph_dedup(_docs(spark), keep_first=False).collect()
    }
    assert out[1] == UNIQ_A  # even the first occurrence goes
    assert out[4] == ""


def test_paragraph_dedup_unique_docs_unchanged(spark):
    docs = spark.createDataFrame(
        [(1, f"{UNIQ_A}\n\n{UNIQ_B}"), (2, f"{UNIQ_C}\ntrailing line here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in paragraph_dedup(docs).collect()}
    # byte-identical round trip when nothing is duplicated — untouched docs
    # skip the split/rejoin entirely, so even odd whitespace survives
    assert out == {1: f"{UNIQ_A}\n\n{UNIQ_B}", 2: f"{UNIQ_C}\ntrailing line here"}
    weird = spark.createDataFrame(
        [(1, f"  {UNIQ_A}  \n\r tabs\tand \r carriage ")], "doc_id long, text string"
    )
    assert paragraph_dedup(weird).first().text == f"  {UNIQ_A}  \n\r tabs\tand \r carriage "


def test_paragraph_dedup_min_count_and_validation(spark):
    docs = _docs(spark)
    # raising the threshold above the boilerplate's 5 occurrences disables it
    out = {r.doc_id: r.text for r in paragraph_dedup(docs, min_count=6).collect()}
    assert out[2] == f"{BOILER}\n{UNIQ_B}"
    with pytest.raises(ValueError):
        paragraph_dedup(docs, min_count=1)


def test_paragraph_dedup_crlf_blank_lines_are_structural(spark):
    """A '\\r' left by a CRLF line ending is a blank separator, not a
    dedup-eligible paragraph — it must never boilerplate-collapse."""
    docs = spark.createDataFrame(
        [
            (1, f"{UNIQ_A}\r\n\r\n{BOILER}\r"),
            (2, f"{BOILER}\r\n\r\n{UNIQ_B}\r"),
            (3, f"{UNIQ_C}\r\n\r\n{UNIQ_C} extended\r"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in paragraph_dedup(docs).collect()}
    # doc 1 keeps the first BOILER occurrence; blank \r lines untouched
    assert out[1] == f"{UNIQ_A}\r\n\r\n{BOILER}\r"
    # doc 2 loses only the BOILER paragraph; the blank \r line survives
    assert out[2] == f"\r\n{UNIQ_B}\r"
    # doc 3: nothing duplicated -> byte-identical (CRs and all)
    assert out[3] == f"{UNIQ_C}\r\n\r\n{UNIQ_C} extended\r"


def test_curate_documents_paragraph_rung(spark):
    """With dedup_paragraphs=True the pure-boilerplate doc empties and the
    quality gate then removes it; prose docs keep their prose."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
    )

    prose = "the quick brown fox jumps over a lazy dog near my warm window today"
    other = "a curious reader walks in the park and finds one quiet bench to rest on"
    docs = spark.createDataFrame(
        [
            (1, f"{prose}\n{BOILER} again and again for all of us"),
            (2, f"{BOILER} again and again for all of us\n{other}"),
            (3, f"{BOILER} again and again for all of us"),  # boilerplate-only
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in curate_documents(docs, min_quality=0.5, dedup_paragraphs=True).collect()
    }
    assert set(out) == {1, 2}
    assert out[2] == other  # boilerplate stripped, prose intact


def test_paragraph_dedup_plan_never_shuffles_corpus_text(spark):
    """The scale contract: document text is rebuilt map-side from the
    removal set — no corpus-wide collect_list aggregate, and the only
    grouping aggregates run over exploded paragraph keys / removal
    indices, never over the text column itself."""
    plan = paragraph_dedup(_docs(spark))._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan  # the old whole-corpus rebuild shape
    # removal indices aggregate exists (collect_set over _idx), text does not
    assert "collect_set" in plan
    assert plan.count("text#") > 0


def test_paragraph_dedup_preserves_columns_and_layout_independence(spark):
    docs = _docs(spark)
    out = paragraph_dedup(docs)
    assert out.columns == docs.columns
    sources = {r.doc_id: r.source for r in out.collect()}
    assert sources == {1: "web", 2: "web", 3: "wiki", 4: "web", 5: "wiki"}
    again = {
        r.doc_id: r.text
        for r in paragraph_dedup(docs.repartition(7, "source")).collect()
    }
    assert again == {r.doc_id: r.text for r in out.collect()}
