"""WARC ingestion (sources/warc.py): exact-framing strict reader, the
splittable fast path's parity with it, HTML-to-text reduction, the
documents-shape composition into the curation ladder, and gz members."""

from __future__ import annotations

import gzip

import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.sources.warc import (
    html_to_text,
    read_warc,
    read_warc_strict,
    warc_documents,
)

_HTML = (
    b"<html><head><title>T</title><style>body{x:1}</style>"
    b"<script>var a = '<p>not text</p>';</script></head>"
    b"<body><!-- hidden --><h1>Hello &amp; welcome</h1>"
    b"<p>fast   cars &lt;3</p></body></html>"
)


def _record(rtype, rid, uri, date, payload, ctype="application/http"):
    hdrs = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return hdrs + b"\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Server: x\r\n\r\n" + body
    )


def _warc_bytes():
    return (
        _record("warcinfo", "000", None, "2024-03-01T00:00:00Z",
                b"software: test-writer 1.0", ctype="application/warc-fields")
        + _record("request", "001", "http://a.example/x", "2024-03-01T00:00:01Z",
                  b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n")
        + _record("response", "002", "http://a.example/x", "2024-03-01T00:00:01Z",
                  _http_response(_HTML))
        + _record("response", "003", "http://b.example/y", "2024-03-02T10:30:00Z",
                  _http_response(b"<p>plain words only</p>"))
        + _record("metadata", "004", "http://a.example/x", "2024-03-01T00:00:02Z",
                  b"fetchTimeMs: 12", ctype="application/warc-fields")
    )


@pytest.fixture()
def warc_file(spark, tmp_path):
    p = tmp_path / "crawl" / "member-00000.warc"
    p.parent.mkdir()
    p.write_bytes(_warc_bytes())
    return str(p)


def test_strict_reader_exact_framing(spark, warc_file):
    rows = {r.record_id: r for r in read_warc_strict(spark, warc_file).collect()}
    assert len(rows) == 5
    r2 = rows["<urn:uuid:002>"]
    assert r2.warc_type == "response"
    assert r2.target_uri == "http://a.example/x"
    assert r2.warc_date == "2024-03-01T00:00:01Z"
    assert r2.content_length == len(_http_response(_HTML))
    assert r2.payload.endswith("</html>")
    assert rows["<urn:uuid:000>"].warc_type == "warcinfo"
    assert rows["<urn:uuid:004>"].content_type == "application/warc-fields"


def test_fast_path_parity_with_strict(spark, warc_file):
    cols = [
        "warc_type", "record_id", "target_uri", "warc_date",
        "content_type", "content_length", "payload",
    ]
    fast = {tuple(r) for r in read_warc(spark, warc_file).select(cols).collect()}
    strict = {tuple(r) for r in read_warc_strict(spark, warc_file).select(cols).collect()}
    assert fast == strict


def test_gz_member_both_paths(spark, tmp_path):
    p = tmp_path / "gz" / "member-00000.warc.gz"
    p.parent.mkdir()
    p.write_bytes(gzip.compress(_warc_bytes()))
    fast = read_warc(spark, str(p)).count()
    strict = read_warc_strict(spark, str(p)).count()
    assert fast == strict == 5


def test_html_to_text_reduction(spark):
    df = spark.createDataFrame([(_HTML.decode(),)], "h string")
    out = df.select(html_to_text(F.col("h")).alias("t")).first().t
    assert out == "T Hello & welcome fast cars <3"
    assert "not text" not in out  # script bodies dropped
    assert "hidden" not in out  # comments dropped


def test_warc_documents_shape_and_ladder_composition(spark, warc_file):
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
    )

    docs = warc_documents(read_warc_strict(spark, warc_file))
    rows = {r.uri: r for r in docs.collect()}
    assert set(rows) == {"http://a.example/x", "http://b.example/y"}  # responses only
    assert rows["http://b.example/y"].text == "plain words only"
    a = rows["http://a.example/x"]
    assert "HTTP/1.1" not in a.text  # HTTP envelope stripped
    assert a.text.startswith("T Hello")
    assert a.ts is not None and a.ts.month == 3
    assert a.source == "warc"
    # doc_id is stable across re-reads of the same crawl
    again = {r.uri: r.doc_id for r in warc_documents(read_warc_strict(spark, warc_file)).collect()}
    assert {u: r.doc_id for u, r in rows.items()} == again
    # and the shape composes straight into the curation ladder
    kept = curate_documents(
        docs.select("doc_id", "text"), min_quality=0.0, near_dup_threshold=None
    )
    assert kept.count() == 2


def test_fast_path_desync_is_detectable_strict_is_not(spark, tmp_path):
    """The documented caveat, pinned: a payload containing the separator
    SEQUENCE splits the fast path early (surfacing as extra/garbled
    records), while the strict reader frames by Content-Length and
    parses the hostile payload byte-exactly."""
    hostile = _http_response(
        b"<p>quoted warc: </p>\r\n\r\nWARC/1.0\r\n<p>in body</p>"
    )
    blob = (
        _record("response", "00a", "http://h.example/1", "2024-03-03T00:00:00Z", hostile)
        + _record("response", "00b", "http://h.example/2", "2024-03-03T00:00:01Z",
                  _http_response(b"<p>clean</p>"))
    )
    p = tmp_path / "hostile" / "m.warc"
    p.parent.mkdir()
    p.write_bytes(blob)
    strict = read_warc_strict(spark, str(p)).collect()
    assert {r.record_id for r in strict} == {"<urn:uuid:00a>", "<urn:uuid:00b>"}
    hostile_payload = next(r.payload for r in strict if r.record_id == "<urn:uuid:00a>")
    assert "in body" in hostile_payload  # byte-exact through the separator
    fast = read_warc(spark, str(p)).collect()
    # fast path desyncs on the planted separator: record 00a is truncated
    # at it (Content-Length mismatch is the detectable symptom)
    fast_a = next(r for r in fast if r.record_id == "<urn:uuid:00a>")
    assert len(fast_a.payload) < fast_a.content_length


def test_stream_warc_drain_parity_with_batch(spark, tmp_path):
    """The streaming front door: stream_warc over a landing directory
    drains to EXACTLY read_warc's record set, and the composed
    stream -> warc_documents path emits the same documents — every
    stage stateless/append-legal."""
    from real_time_financial_data_pipeline_spark.sources.warc import (
        read_warc,
        stream_warc,
    )

    land = tmp_path / "landing"
    land.mkdir()
    (land / "m0.warc").write_bytes(_warc_bytes())
    blob2 = _record(
        "response", "200", "http://c.example/z", "2024-03-05T08:00:00Z",
        _http_response(b"<p>late arriving member</p>"),
    )
    (land / "m1.warc").write_bytes(blob2)

    q = (
        warc_documents(stream_warc(spark, str(land)))
        .writeStream.format("memory")
        .queryName("warc_stream_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.doc_id, r.uri, r.text) for r in spark.table("warc_stream_docs").collect()
    }
    batch = {
        (r.doc_id, r.uri, r.text)
        for r in warc_documents(read_warc(spark, str(land))).collect()
    }
    assert streamed == batch
    assert {u for _, u, _ in streamed} == {
        "http://a.example/x", "http://b.example/y", "http://c.example/z"
    }


def test_fast_path_version_guard_and_strict_accepts_1_1(spark, tmp_path):
    """Review-caught silent loss: a WARC/1.1 member framed with the 1.0
    separator collapses to one row and quietly drops records 2..n.  The
    fast path now fails LOUDLY on a version mismatch (both directions);
    version='1.1' and the strict reader handle 1.1 members fully."""
    from pyspark.errors import PySparkException

    blob_11 = _warc_bytes().replace(b"WARC/1.0\r\n", b"WARC/1.1\r\n")
    p = tmp_path / "v11" / "m.warc"
    p.parent.mkdir()
    p.write_bytes(blob_11)
    with pytest.raises(PySparkException, match="WARC/1.1"):
        read_warc(spark, str(p)).collect()
    assert read_warc(spark, str(p), version="1.1").count() == 5
    assert read_warc_strict(spark, str(p)).count() == 5
    # and the reverse mismatch (1.0 member read as 1.1) also raises
    p10 = tmp_path / "v10" / "m.warc"
    p10.parent.mkdir()
    p10.write_bytes(_warc_bytes())
    with pytest.raises(PySparkException, match="WARC/1.0"):
        read_warc(spark, str(p10), version="1.1").collect()


def test_html_double_escaped_entities_decode_once(spark):
    """Review-caught corpus corruption: '&amp;lt;' is a page DISPLAYING
    the text '&lt;' — decoding '&amp;' first double-decoded it to '<'.
    '&amp;' now decodes last."""
    df = spark.createDataFrame(
        [("<p>use &amp;lt; to write a less-than sign, &amp; enjoy</p>",)],
        "h string",
    )
    out = df.select(html_to_text(F.col("h")).alias("t")).first().t
    assert out == "use &lt; to write a less-than sign, & enjoy"


def test_strict_desync_raises_by_default_and_flag_quarantines(spark, tmp_path):
    """Review-caught silent truncation: a record with NO Content-Length
    desyncs the strict parser (clen defaults to 0, the next frame lands
    mid-payload) — the reader recommended for adversarial members must
    not silently drop everything after it.  Default = raise naming the
    file/offset; on_desync='flag' keeps the clean prefix plus ONE
    queryable quarantine row that warc_documents never ingests."""
    from real_time_financial_data_pipeline_spark.sources.warc import DESYNC_TYPE

    poisoned = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:bad>\r\n"
        b"WARC-Date: 2024-03-01T00:00:00Z\r\nContent-Type: application/http\r\n"
        b"\r\n"  # no Content-Length header at all
        + _http_response(b"<p>poison</p>")
        + b"\r\n\r\n"
    )
    blob = (
        _record("response", "0c1", "http://c.example/1", "2024-03-01T00:00:00Z",
                _http_response(b"<p>clean one</p>"))
        + poisoned
        + _record("response", "0c2", "http://c.example/2", "2024-03-01T00:00:01Z",
                  _http_response(b"<p>censored victim</p>"))
    )
    p = tmp_path / "poison" / "m.warc"
    p.parent.mkdir()
    p.write_bytes(blob)
    with pytest.raises(Exception, match="desynced at byte"):
        read_warc_strict(spark, str(p)).collect()
    flagged = read_warc_strict(spark, str(p), on_desync="flag").collect()
    types = [r.warc_type for r in flagged]
    assert types.count(DESYNC_TYPE) == 1
    # the Content-Length-less record itself still frames (empty payload);
    # everything AFTER its unframed payload bytes is the desynced region
    assert {r.record_id for r in flagged if r.warc_type == "response"} == {
        "<urn:uuid:0c1>",
        "<urn:uuid:bad>",
    }
    flag = next(r for r in flagged if r.warc_type == DESYNC_TYPE)
    assert flag.target_uri.endswith("m.warc")
    assert flag.content_length > 0  # bytes that never framed
    # the quarantine row never reaches the documents ladder
    docs = warc_documents(
        read_warc_strict(spark, str(p), on_desync="flag")
    ).collect()
    assert len(docs) == 1 and "clean one" in docs[0].text
    # trailing CRLF padding after the final record is NOT a desync
    clean = tmp_path / "padded" / "m.warc"
    clean.parent.mkdir()
    clean.write_bytes(_warc_bytes() + b"\r\n\r\n")
    assert read_warc_strict(spark, str(clean)).count() == 5
    with pytest.raises(ValueError, match="on_desync"):
        read_warc_strict(spark, str(p), on_desync="bogus")


def test_version_guard_message_survives_percent_in_version(spark, tmp_path):
    """Review-caught format_string splice: a '%' in the caller's version
    value must come through the mismatch error verbatim, not garble it."""
    p = tmp_path / "pct" / "m.warc"
    p.parent.mkdir()
    p.write_bytes(_warc_bytes())
    with pytest.raises(Exception, match=r"version='1%s\.0'"):
        read_warc(spark, str(p), version="1%s.0").collect()


def test_strict_desync_on_oversized_and_nonnumeric_content_length(spark, tmp_path):
    """Review-caught censorship bypass: a crafted Content-Length that
    runs PAST the member (or does not parse as a number) must hit the
    same loud desync path as a framing break — not clamp at EOF and
    silently swallow every later record (oversized), and not crash the
    task with a raw int() ValueError (non-numeric)."""
    from real_time_financial_data_pipeline_spark.sources.warc import DESYNC_TYPE

    def poisoned(clen_value):
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:bad>\r\n"
            b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
            b"Content-Type: application/http\r\n"
            b"Content-Length: " + clen_value + b"\r\n\r\n"
            + _http_response(b"<p>poison</p>")
            + b"\r\n\r\n"
        )

    for clen in (b"1000000000", b"abc", b"-7"):
        blob = (
            _record("response", "0d1", "http://d.example/1", "2024-03-01T00:00:00Z",
                    _http_response(b"<p>clean</p>"))
            + poisoned(clen)
            + _record("response", "0d2", "http://d.example/2", "2024-03-01T00:00:01Z",
                      _http_response(b"<p>victim</p>"))
        )
        p = tmp_path / f"poison_{clen.decode(errors='replace')}"
        p.mkdir()
        (p / "m.warc").write_bytes(blob)
        with pytest.raises(Exception, match="desynced at byte"):
            read_warc_strict(spark, str(p)).collect()
        flagged = read_warc_strict(spark, str(p), on_desync="flag").collect()
        assert [r.warc_type for r in flagged].count(DESYNC_TYPE) == 1
        # the crafted record itself is NOT emitted, the victim is lost to
        # the quarantined region, the clean prefix survives
        assert {r.record_id for r in flagged if r.warc_type == "response"} == {
            "<urn:uuid:0d1>"
        }
