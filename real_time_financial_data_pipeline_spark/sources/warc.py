"""WARC (Web ARChive, ISO 28500) ingestion — the Common-Crawl-shaped
source a 100 TB training-data pipeline actually starts from.

A WARC file is a concatenation of records, each:

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n        (Content-Length, WARC-Type, ...)
    ...\\r\\n
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                          (record separator)

For ``WARC-Type: response`` records the payload is itself an HTTP
message (status line + headers + \\r\\n\\r\\n + body).

Two readers, one scale trade each:

- :func:`read_warc` — **splittable fast path**: ``spark.read.text`` with
  ``lineSep = "\\r\\n\\r\\nWARC/1.0\\r\\n"`` turns each record into one row,
  parsed entirely with JVM expressions (regexp header extraction, one
  split for the payload) — no Python, and an UNCOMPRESSED warc splits
  across tasks mid-file like any text file.  Caveat, stated not hidden:
  this frames records by the separator SEQUENCE, not by Content-Length,
  so a payload that happens to contain the exact bytes
  ``\\r\\n\\r\\nWARC/1.0\\r\\n`` would split early (vanishingly rare in HTML,
  impossible to rule out).  The strict reader exists for when that
  matters.
- :func:`read_warc_strict` — **exact framing**: ``binaryFile`` source +
  a per-file Content-Length-driven parser in ``mapInPandas``.  A WARC
  corpus ships as many ~1 GB members, so per-FILE parallelism is the
  natural unit (the same reason Common Crawl publishes 64k members per
  crawl); each task walks its file's records sequentially, exactly as
  the spec frames them.  Python touches each byte once per file —
  acceptable at ingestion (a one-time pass), not something the query
  path ever repays.

Both produce the same schema and are parity-tested against each other:
(warc_type, record_id, target_uri, warc_date, content_type,
content_length, payload) — plus, through :func:`warc_documents`,
the engine's canonical documents shape (doc_id, text, source, ts) with
HTTP headers stripped and HTML reduced to text
(:func:`html_to_text` — regexp tag stripping: script/style/comment
blocks dropped, tags removed, core entities decoded, whitespace
collapsed; the crude-but-standard first pass every crawl pipeline runs
before real boilerplate removal, which is ``paragraph_dedup``'s and the
quality gates' job downstream).

gzip: the fast path's ``spark.read.text`` decompresses ``.warc.gz``
transparently (one task per member — gzip is not splittable, matching
the per-file unit above); the strict path's ``binaryFile`` source hands
over RAW bytes, so its parser sniffs the gz magic and decompresses
in-task.  Fast-path Content-Length trimming counts CHARACTERS, so it
only ever trims separator-damage overshoot on ASCII payloads and never
corrupts multibyte text (chars <= bytes ⇒ the trim condition stays
false); byte-exact framing is the strict reader's job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

def _record_sep(version: str) -> str:
    return f"\r\n\r\nWARC/{version}\r\n"

#: Output schema shared by both readers (payload as string — WARC text
#: payloads; binary media payloads come through as replacement-char-
#: damaged strings on either path — media extraction belongs to the
#: multimodal binary-column pipeline, not this text front door).
WARC_SCHEMA = (
    "warc_type string, record_id string, target_uri string, warc_date string, "
    "content_type string, content_length long, payload string"
)


def _header(block: Column, name: str) -> Column:
    """Extract one WARC header value from the header block (first match,
    case-sensitive per the common crawl writers; values run to CRLF)."""
    return F.nullif(F.regexp_extract(block, rf"(?m)^{name}:[ \t]*([^\r\n]*)", 1), F.lit(""))


def _parse_records(raw: DataFrame, version: str) -> DataFrame:
    """The shared expression-only record projection behind the batch and
    streaming fast paths (every step stateless, hence stream-legal).

    Version guard: the separator is a LITERAL (lineSep takes no regex),
    so a member written by a different WARC revision would silently
    collapse into one row per file and the Content-Length trim would
    quietly truncate it to its first record.  Each file's first row
    keeps its leading magic — if that magic names a different version
    than the separator was built for, the row fails LOUDLY in-plan
    instead of losing records 2..n."""
    magic = F.regexp_extract(F.col("value"), r"\A(WARC/\d+\.\d+)", 1)
    guarded = F.when(
        (magic != "") & (magic != f"WARC/{version}"),
        F.raise_error(
            # version rides as a %s ARGUMENT, never spliced into the
            # format string — a '%' in a caller value must not garble
            # the error being raised about it
            F.format_string(
                "read_warc(version='%s'): member starts with "
                "%s — pass version= to match (or use read_warc_strict, "
                "which accepts any WARC/x.y)",
                F.lit(version),
                magic,
            )
        ).cast("string"),
    ).otherwise(F.col("value"))
    # the first record of each file keeps its leading magic; later rows
    # had it consumed by the separator — normalize it away
    rec = F.regexp_replace(guarded, r"\A(WARC/\d+\.\d+\r\n)", "")
    parts = F.split(rec, r"\r\n\r\n", 2)
    headers = F.element_at(parts, 1)
    body = F.coalesce(F.element_at(parts, 2), F.lit(""))
    clen = _header(headers, "Content-Length").cast("long")
    # mid-file rows are exact (the separator consumed the record-final
    # CRLFCRLF); only each file's LAST record carries a bare \r\n\r\n
    # tail — Content-Length identifies and trims exactly that, without
    # eating payload-final CRLFs the way an unconditional trim would.
    # clen counts BYTES and length() counts CHARS, so multibyte payloads
    # never trip the trim (chars <= bytes) — the tail then survives on a
    # final multibyte record, the documented fast-path approximation.
    payload = F.when(
        clen.isNotNull() & (F.length(body) > clen), F.substring(body, 1, clen.cast("int"))
    ).when(
        clen.isNull(), F.regexp_replace(body, r"(\r\n)+\Z", "")
    ).otherwise(body)
    out = raw.select(
        _header(headers, "WARC-Type").alias("warc_type"),
        _header(headers, "WARC-Record-ID").alias("record_id"),
        _header(headers, "WARC-Target-URI").alias("target_uri"),
        _header(headers, "WARC-Date").alias("warc_date"),
        _header(headers, "Content-Type").alias("content_type"),
        clen.alias("content_length"),
        payload.alias("payload"),
    )
    return out.filter(F.col("warc_type").isNotNull())


def read_warc(spark: SparkSession, path: str, version: str = "1.0") -> DataFrame:
    """Splittable expression-only WARC reader (see module docstring for
    the framing caveat).  One row per record, WARC headers parsed into
    columns, payload = everything after the header block's blank line,
    with the Content-Length prefix applied when the payload is LONGER
    than declared (separator-in-payload damage shows up as a mismatch
    the strict reader would not produce).  ``version`` selects the
    record magic the splitter frames on ("1.0" — Common Crawl's — or
    "1.1", the current ISO revision); a member written under a
    DIFFERENT version fails loudly instead of silently losing records
    (see ``_parse_records``)."""
    return _parse_records(
        spark.read.option("lineSep", _record_sep(version)).text(path), version
    )


#: warc_type stamped on the synthetic row ``read_warc_strict`` emits (in
#: ``on_desync="flag"`` mode) when a member's bytes stop framing as WARC
#: records before the end of the file — the quarantine-not-drop marker.
DESYNC_TYPE = "__desync__"


def read_warc_strict(
    spark: SparkSession, path: str, on_desync: str = "error"
) -> DataFrame:
    """Exact Content-Length-framed WARC reader: ``binaryFile`` + a
    sequential per-file parser (one task per member file — the WARC
    corpus unit).  Immune to separator-in-payload splits; the one to use
    when payloads may be binary or adversarial.

    Desync is LOUD, never silent: a sequential parser that hits bytes it
    cannot frame (a header block that does not start with ``WARC/``, a
    missing blank line, a Content-Length that walks past a malformed
    region) can no longer trust any later offset — but silently dropping
    the rest of a ~1 GB member would let ONE crafted record censor
    everything after it.  ``on_desync`` picks the failure mode:

    - ``"error"`` (default): raise, naming the file, the byte offset,
      and how many records parsed cleanly before the desync.
    - ``"flag"``: keep the clean prefix and append ONE synthetic row per
      desynced file — ``warc_type = DESYNC_TYPE``, ``target_uri`` = the
      file path, ``content_length`` = unparsed bytes remaining,
      ``record_id`` = the byte offset — the repo's quarantine-not-drop
      convention.  Downstream ``warc_documents`` filters on
      ``warc_type == "response"`` so the flag row never enters the text
      ladder, but it stays queryable for monitoring.

    Trailing CRLF padding after the final record is not a desync."""
    if on_desync not in ("error", "flag"):
        raise ValueError(f"on_desync must be 'error' or 'flag', got {on_desync!r}")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":  # gz member (binaryFile gives raw bytes)
                    data = gzip.decompress(data)
                pos = 0
                n = len(data)
                n_clean = 0
                while pos < n:
                    head_end = data.find(b"\r\n\r\n", pos)
                    if head_end < 0:
                        break
                    head = data[pos:head_end].decode("utf-8", "replace")
                    if not head.startswith("WARC/"):
                        break  # desynced: stop framing, report below
                    fields = {}
                    for line in head.split("\r\n")[1:]:
                        k, _, v = line.partition(":")
                        if _:
                            fields[k.strip()] = v.strip()
                    try:
                        clen = int(fields.get("Content-Length", "0") or 0)
                    except ValueError:
                        break  # non-numeric Content-Length: desync, report below
                    # a declared length running PAST the member is the
                    # oversized-Content-Length attack (one crafted record
                    # swallowing everything after it) — desync, not a
                    # record; the guard below makes it loud
                    if clen < 0 or head_end + 4 + clen > n:
                        break
                    body = data[head_end + 4 : head_end + 4 + clen]
                    rows.append(
                        (
                            fields.get("WARC-Type"),
                            fields.get("WARC-Record-ID"),
                            fields.get("WARC-Target-URI"),
                            fields.get("WARC-Date"),
                            fields.get("Content-Type"),
                            clen,
                            body.decode("utf-8", "replace"),
                        )
                    )
                    n_clean += 1
                    pos = head_end + 4 + clen
                    # skip the inter-record CRLFs
                    while data.startswith(b"\r\n", pos):
                        pos += 2
                # anything left that is not bare CRLF padding means the
                # member stopped framing before its end — never silent
                if pos < n and data[pos:].strip(b"\r\n"):
                    remaining = n - pos
                    if on_desync == "error":
                        raise ValueError(
                            f"read_warc_strict: {fpath} desynced at byte {pos} "
                            f"({n_clean} records parsed cleanly, {remaining} "
                            "bytes unparsed) — malformed or adversarial member; "
                            "pass on_desync='flag' to keep the clean prefix "
                            "with a quarantine row instead"
                        )
                    rows.append(
                        (DESYNC_TYPE, str(pos), str(fpath), None, None,
                         remaining, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_type", "record_id", "target_uri", "warc_date",
                    "content_type", "content_length", "payload",
                ],
            )

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(parse, WARC_SCHEMA).filter(F.col("warc_type").isNotNull())


def stream_warc(spark: SparkSession, path: str, version: str = "1.0") -> DataFrame:
    """STREAMING twin of :func:`read_warc`: watch a directory for new
    WARC members (the live-crawl landing zone) and emit parsed records
    as they arrive.  Every parsing step is a stateless projection —
    regexp header extraction, one split, the Content-Length trim — so
    the whole reader is append-legal as-is; compose with
    :func:`warc_documents` (also stateless) and feed
    ``streaming.training.stream_training_chunks`` for the end-to-end
    live pipeline.  Fast-path framing caveat applies unchanged; the
    strict reader has no streaming form (binaryFile is not a stream
    source) — exact re-framing of hostile members is the nightly batch
    pass's job, the usual division of labor."""
    raw = (
        spark.readStream.option("lineSep", _record_sep(version))
        .format("text")
        .schema("value string")
        .load(path)
    )
    return _parse_records(raw, version)


def html_to_text(html: Column) -> Column:
    """Crawl-grade HTML -> text: drop script/style/comment blocks, strip
    tags, decode the core entities, collapse whitespace.  Pure JVM
    regexps — the cheap first pass; semantic boilerplate removal is the
    downstream dedup/quality ladder's job."""
    t = F.regexp_replace(html, r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    # '&amp;' decodes LAST: decoding it first would double-decode
    # double-escaped entities ('&amp;lt;' — a page DISPLAYING the text
    # '&lt;' — must come out as '&lt;', not '<')
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.regexp_replace(t, ent, ch)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _http_body(payload: Column) -> Column:
    """Body of an HTTP message payload: everything after the first blank
    line (status line + headers split off); a payload with no envelope
    is all body.  ONE definition shared by the text ladder
    (:func:`warc_documents`) and the link graph
    (:func:`warc_page_links`) so the two can never disagree on which
    bytes are the body."""
    parts = F.split(payload, r"\r\n\r\n", 2)
    return F.coalesce(F.element_at(parts, 2), F.element_at(parts, 1))


def warc_page_links(warc: DataFrame, with_text: bool = False) -> DataFrame:
    """Hyperlink edges straight off the crawl: response records ->
    (src, dst) resolved page links, extracted from the RAW HTML body
    before :func:`warc_documents`' text reduction throws the markup
    away.  Stateless projections end-to-end (regexp extraction +
    explode + string resolution), so it composes with both the batch
    and streaming WARC readers; feed ``operators.crawl_graph.
    host_graph`` -> ``pagerank`` for the domain quality prior.
    ``with_text=True`` forwards to ``extract_links``' anchor-text mode
    (adds the ``anchor_text`` column — still stateless/stream-legal)."""
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import extract_links

    responses = warc.filter(
        (F.col("warc_type") == "response") & F.col("target_uri").isNotNull()
    )
    pages = responses.select(
        F.col("target_uri").alias("uri"), _http_body(F.col("payload")).alias("html")
    )
    return extract_links(pages, "html", "uri", with_text=with_text)


def warc_documents(
    warc: DataFrame,
    source: str = "warc",
) -> DataFrame:
    """Response records -> the engine's canonical documents shape:
    (doc_id, text, source, ts).  The HTTP envelope is split off the
    payload (status line + headers up to the first blank line), the body
    goes through :func:`html_to_text`, and doc_id is the 64-bit hash of
    the record id (stable across re-reads of the same crawl — the same
    identity rule as ``jsonl_source``'s id stamping).  Compose the
    result straight into ``training.prepare_training_set`` /
    ``curate_documents``."""
    responses = warc.filter(F.col("warc_type") == "response")
    return responses.select(
        F.xxhash64(F.col("record_id")).alias("doc_id"),
        html_to_text(_http_body(F.col("payload"))).alias("text"),
        F.lit(source).alias("source"),
        F.to_timestamp(F.col("warc_date")).alias("ts"),
        F.col("target_uri").alias("uri"),
    ).filter(F.length("text") > 0)
