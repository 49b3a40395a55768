"""URL-level crawl curation (operators/urls.py): canonicalization rules,
registered-domain approximation, canonical-URL dedup survivor rule,
per-domain cap determinism, and the WARC composition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.urls import (
    canonical_url,
    domain_cap,
    domain_profile,
    registered_domain,
    url_dedup,
)


def _canon(spark, u):
    return (
        spark.createDataFrame([(u,)], "u string")
        .select(canonical_url(F.col("u")).alias("c"))
        .first()
        .c
    )


def test_canonical_url_rules(spark):
    # scheme/host case, default port, fragment, trailing slash collapse
    assert _canon(spark, "HTTPS://WWW.Example.COM:443/a/b/?q=1#frag") == "www.example.com/a/b?q=1"
    assert _canon(spark, "http://example.com/a/b/") == "example.com/a/b"
    # http and https of the same resource canonicalize identically
    assert _canon(spark, "http://example.com/x") == _canon(spark, "https://example.com/x")
    # bare host gets the root path; duplicate slashes collapse
    assert _canon(spark, "http://example.com") == "example.com/"
    assert _canon(spark, "http://example.com//a///b") == "example.com/a/b"
    # query is identity-bearing and kept verbatim
    assert _canon(spark, "http://e.com/p?b=2&a=1") == "e.com/p?b=2&a=1"
    # junk and null canonicalize to NULL, never to a real page
    assert _canon(spark, "not a url") is None
    assert _canon(spark, None) is None


def test_registered_domain_approximation(spark):
    rows = [
        ("https://www.example.com/x", "example.com"),
        ("http://a.b.shop.example.co.uk/", "example.co.uk"),
        ("http://deep.sub.example.com.au/p", "example.com.au"),
        ("http://example.org", "example.org"),
        ("nonsense", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "u string")
    got = [
        r.d for r in df.select(registered_domain(F.col("u")).alias("d")).collect()
    ]
    assert got == [want for _, want in rows]
    # extra_suffixes extends the multi-part table (PSL snapshot hook)
    df2 = spark.createDataFrame([("http://alice.github.io/blog",)], "u string")
    assert df2.select(registered_domain(F.col("u")).alias("d")).first().d == "github.io"
    assert (
        df2.select(
            registered_domain(F.col("u"), extra_suffixes=("github.io",)).alias("d")
        ).first().d
        == "alice.github.io"
    )


def test_url_dedup_min_id_survivor_and_null_passthrough(spark):
    docs = spark.createDataFrame(
        [
            (5, "https://example.com/a/"),
            (3, "HTTP://EXAMPLE.com:80/a"),  # same canonical page
            (9, "http://example.com/b"),
            (7, "junk-url"),
            (8, "also junk"),
        ],
        "doc_id long, uri string",
    )
    kept = {r.doc_id for r in url_dedup(docs).collect()}
    # min id 3 wins the /a group; junk rows never dedup against each other
    assert kept == {3, 9, 7, 8}
    # layout independence
    kept2 = {r.doc_id for r in url_dedup(docs.repartition(7)).collect()}
    assert kept2 == kept


def test_domain_cap_deterministic_and_bounded(spark):
    rows = [(i, f"http://big.example.com/p{i}") for i in range(50)] + [
        (100 + i, f"http://small{i}.org/x") for i in range(5)
    ] + [(900, "junk")]
    docs = spark.createDataFrame(rows, "doc_id long, uri string")
    capped = domain_cap(docs, max_per_domain=10)
    out = capped.collect()
    big = [r.doc_id for r in out if "big.example" in (r.uri or "")]
    assert len(big) == 10  # hot domain bounded
    assert {r.doc_id for r in out if r.doc_id >= 100} == set(
        range(100, 105)
    ) | {900}  # small domains + junk pass through
    # deterministic across layouts AND across re-runs (same salt)
    again = {r.doc_id for r in domain_cap(docs.repartition(5), max_per_domain=10).collect()}
    assert again == {r.doc_id for r in out}
    # a different salt re-rolls WHICH pages survive, not how many
    other = [r.doc_id for r in domain_cap(docs, 10, salt="other").collect() if r.doc_id < 100]
    assert len(other) == 10 and set(other) != set(big)
    with pytest.raises(ValueError, match="max_per_domain"):
        domain_cap(docs, 0)
    # schema preserved
    assert capped.columns == docs.columns


def test_domain_profile_shares(spark):
    docs = spark.createDataFrame(
        [(1, "http://a.com/1"), (2, "http://a.com/2"), (3, "http://b.org/1"),
         (4, "junk")],
        "doc_id long, uri string",
    )
    prof = {r.domain: (r.n_docs, r.doc_share) for r in domain_profile(docs).collect()}
    assert prof["a.com"] == (2, 0.5)
    assert prof["b.org"] == (1, 0.25)
    assert prof[None] == (1, 0.25)


def test_warc_to_url_curation_composition(spark, tmp_path):
    """The crawl front door end-to-end: WARC responses -> documents with
    uri -> canonical-URL dedup -> domain cap -> the content ladder."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        curate_documents,
    )
    from real_time_financial_data_pipeline_spark.sources.warc import (
        read_warc_strict,
        warc_documents,
    )
    from tests.test_warc import _http_response, _record

    blob = b"".join(
        _record(
            "response", f"{i:03d}", f"http://hot.example.com/p{i}",
            "2024-03-01T00:00:00Z",
            _http_response(f"<p>the quick brown fox number {i} jumps over the lazy dog</p>".encode()),
        )
        for i in range(8)
    ) + _record(
        "response", "100", "http://COLD.example.org/q/",
        "2024-03-01T00:00:00Z", _http_response(b"<p>the calm white owl rests on a high branch today</p>"),
    ) + _record(
        "response", "101", "http://cold.example.org:80/q",  # same canonical page
        "2024-03-01T00:00:00Z", _http_response(b"<p>the calm white owl rests on a high branch today</p>"),
    )
    p = tmp_path / "front" / "m.warc"
    p.parent.mkdir()
    p.write_bytes(blob)
    docs = warc_documents(read_warc_strict(spark, str(p)))
    assert docs.count() == 10
    deduped = url_dedup(docs)
    assert deduped.count() == 9  # the two cold.example spellings collapse
    capped = domain_cap(deduped, max_per_domain=3)
    per_dom = {r.domain: r.n_docs for r in domain_profile(capped).collect()}
    assert per_dom == {"example.com": 3, "example.org": 1}
    kept = curate_documents(
        capped.select("doc_id", "text"), min_quality=0.0, near_dup_threshold=None
    )
    assert kept.count() == 4


def test_domain_cap_two_phase_identical_to_one_phase(spark):
    """prefilter_buckets engages the KMV-style pre-prune; the kept set
    must be IDENTICAL (the global N smallest order-hashes are each among
    their own bucket's N smallest), across bucket counts and layouts."""
    rows = [(i, f"http://hot.example.com/p{i}") for i in range(400)] + [
        (1000 + i, f"http://site{i % 7}.org/x{i}") for i in range(60)
    ] + [(5000, "junk")]
    docs = spark.createDataFrame(rows, "doc_id long, uri string")
    base = {r.doc_id for r in domain_cap(docs, 12).collect()}
    for b in (2, 8, 32):
        two = {r.doc_id for r in domain_cap(docs, 12, prefilter_buckets=b).collect()}
        assert two == base, b
    # layout independence of the two-phase form
    again = {
        r.doc_id
        for r in domain_cap(docs.repartition(11), 12, prefilter_buckets=8).collect()
    }
    assert again == base
    with pytest.raises(ValueError, match="prefilter_buckets"):
        domain_cap(docs, 12, prefilter_buckets=1)


def test_prepare_training_set_url_front_door(spark):
    """url_col/max_per_domain through the whole pipeline: URL-duplicate
    and over-cap pages produce NO chunks, schema is the canonical chunk
    shape (no URL column), and the guard rejects a cap without a URL."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    text = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, text + f" page {i}", f"http://hot.example.com/p{i}") for i in range(6)]
    rows += [(100, text + " cold page", "http://cold.org/q/"),
             (101, text + " cold page copy", "HTTP://COLD.org:80/q")]  # same URL
    docs = spark.createDataFrame(rows, "doc_id long, text string, uri string")
    out = prepare_training_set(
        docs, min_quality=0.0, near_dup_threshold=None,
        chunk_tokens=8, overlap_tokens=2,
        url_col="uri", max_per_domain=2,
    )
    assert set(out.columns) == {"doc_id", "chunk_id", "n_chunk_tokens", "chunk_text", "split"}
    kept_docs = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    hot_kept = {d for d in kept_docs if d < 100}
    assert len(hot_kept) == 2  # capped
    assert kept_docs - hot_kept == {100}  # URL-duplicate 101 collapsed to min id
    with pytest.raises(ValueError, match="url_col"):
        prepare_training_set(docs, url_col=None, max_per_domain=2)


def test_domain_cap_plan_shape(spark):
    """Scale contract in the plan: the cap is keyed-window work — hash
    partitioning on the domain, no product joins in either phase form."""
    docs = spark.createDataFrame(
        [(i, f"http://s{i % 9}.com/p{i}") for i in range(100)],
        "doc_id long, uri string",
    )
    for kw in ({}, {"prefilter_buckets": 8}):
        plan = (
            domain_cap(docs, 5, **kw)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "hashpartitioning(_dom" in plan  # the keyed window shuffle


def test_canonical_url_keeps_non_default_ports(spark):
    """Review-caught aliasing: parse_url's HOST drops every port, so a
    non-default port must be re-appended — two services on :8080 and :80
    are different resources and must not dedup together."""
    assert _canon(spark, "http://example.com:8080/x") == "example.com:8080/x"
    assert _canon(spark, "http://example.com:8080/x") != _canon(
        spark, "http://example.com/x"
    )
    # defaults still strip, per scheme
    assert _canon(spark, "http://example.com:80/x") == "example.com/x"
    assert _canon(spark, "https://example.com:443/x") == "example.com/x"
    # a port that is the OTHER scheme's default is kept
    assert _canon(spark, "https://example.com:80/x") == "example.com:80/x"


def test_non_web_scheme_keeps_protocol_identity(spark):
    """Review-caught aliasing: scheme-relative identity is an http/https
    convention only — ftp://host/x names a different protocol endpoint
    than https://host/x and must not dedup against it, while two
    spellings of the SAME non-web URL still canonicalize together."""
    assert _canon(spark, "ftp://example.com/x") == "ftp://example.com/x"
    assert _canon(spark, "ftp://example.com/x") != _canon(
        spark, "https://example.com/x"
    )
    # same-scheme normalization still applies (case, trailing slash)
    assert _canon(spark, "FTP://Example.COM/x/") == "ftp://example.com/x"
    # non-web schemes have no default-port rule here: ports are kept
    assert _canon(spark, "ftp://example.com:21/x") == "ftp://example.com:21/x"
    # web schemes unchanged: still scheme-relative
    assert _canon(spark, "https://example.com/x") == "example.com/x"


def test_domain_cap_order_hash_swap_point(spark):
    """The md5 swap point (the token_budget_sample convention): the kept
    set under order_hash=md5(id||salt) is exactly the N smallest md5
    ranks per domain — content-replayable by an engine without xxhash64
    — and the two-phase prefilter form returns the IDENTICAL set under
    the swapped hash too."""
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"http://d{i % 3}.com/p{i}") for i in range(90)],
        "doc_id long, uri string",
    )
    md5_order = lambda key, salt: F.md5(
        F.concat(key.cast("string"), F.lit(salt))
    )
    got = {
        r.doc_id
        for r in domain_cap(docs, 4, order_hash=md5_order).collect()
    }
    want = set()
    for dom in range(3):
        ids = sorted(
            (i for i in range(90) if i % 3 == dom),
            key=lambda i: (hashlib.md5(f"{i}domcap".encode()).hexdigest(), i),
        )
        want |= set(ids[:4])
    assert got == want
    two_phase = {
        r.doc_id
        for r in domain_cap(
            docs, 4, order_hash=md5_order, prefilter_buckets=4
        ).collect()
    }
    assert two_phase == got
