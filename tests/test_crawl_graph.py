"""Crawl-graph family (operators/crawl_graph.py): href extraction and
RFC-lite resolution, the weighted host graph, distributed PageRank
against a numpy power-iteration reference (dangling + weighted +
convergence), the domain quality-prior join, and the end-to-end
WARC -> links -> graph -> rank -> prior composition."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
    extract_links,
    host_graph,
    pagerank,
    with_domain_rank,
)


def test_extract_links_href_forms_and_resolution(spark):
    html = (
        '<html><body>'
        '<a href="https://other.example/x">abs</a>'
        "<a class='z' href='//cdn.example/lib.js'>proto-rel</a>"
        '<a href="/root/page">root-rel</a>'
        '<a href="sibling.html">rel</a>'
        '<a href="#frag">fragment-only (skipped)</a>'
        '<a href="mailto:a@b.c">mail (dropped)</a>'
        '<a href="javascript:void(0)">js (dropped)</a>'
        '<A HREF="HTTPS://UPPER.example/Y">case-insensitive tag</A>'
        '<a href="https://twice.example/t">1</a>'
        '<a href="https://twice.example/t">2</a>'
        "<a href=https://bare.example/u>unquoted abs</a>"
        "<a href=plain.html rel=nofollow>unquoted rel, more attrs</a>"
        "<a href=#only>unquoted fragment-only (skipped)</a>"
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("http://site.example/dir/page.html", html)], "uri string, html string"
    )
    got = [
        r.dst for r in extract_links(pages, "html", "uri").orderBy("dst").collect()
    ]
    assert got == sorted(
        [
            "https://other.example/x",
            "http://cdn.example/lib.js",
            "http://site.example/root/page",
            "http://site.example/dir/sibling.html",
            "HTTPS://UPPER.example/Y",
            "https://twice.example/t",
            "https://twice.example/t",  # duplicates preserved as weight
            "https://bare.example/u",  # unquoted href= forms extract too
            "http://site.example/dir/plain.html",
        ]
    )
    # unparsable base resolves everything to NULL -> dropped
    junk = spark.createDataFrame(
        [("not a url", '<a href="/x">y</a>')], "uri string, html string"
    )
    assert extract_links(junk, "html", "uri").count() == 0


def test_extract_links_quote_aware_attribute_scan(spark):
    """Review-caught false positives in the attribute-scan prefix: the
    old lazy ``[^>]*?`` could stop INSIDE a quoted attribute value
    (``title="see href=foo"``) and emit its content as a second edge,
    and ``data-href=...`` could pass as an href.  The quote-aware
    prefix consumes quoted values atomically and the boundary
    lookbehind pins ``href`` to a real attribute position — pinned in
    BOTH extraction modes (default two-pass and with_text element
    grain)."""
    html = (
        '<a title="see href=foo" href="/real">quoted decoy</a>'
        "<a title='see href=bar' href=/real2>unquoted target after decoy</a>"
        '<a data-href="/not-a-link">data-href only</a>'
        "<a data-href=/also-not>unquoted data-href only</a>"
        '<a data-href="/decoy" href="/kept">data-href plus real</a>'
    )
    pages = spark.createDataFrame(
        [("http://site.example/", html)], "uri string, html string"
    )
    got = sorted(r.dst for r in extract_links(pages, "html", "uri").collect())
    assert got == [
        "http://site.example/kept",
        "http://site.example/real",
        "http://site.example/real2",
    ]
    with_text = {
        (r.dst, r.anchor_text)
        for r in extract_links(pages, "html", "uri", with_text=True).collect()
    }
    assert with_text == {
        ("http://site.example/real", "quoted decoy"),
        ("http://site.example/real2", "unquoted target after decoy"),
        ("http://site.example/kept", "data-href plus real"),
    }


def test_extract_links_with_anchor_text(spark):
    """with_text=True: the anchor's inner HTML reduces to text with the
    SAME html_to_text pass documents get (tag strip + entity decode +
    whitespace collapse); href semantics (quoted/unquoted, fragment-only
    and mailto drops, resolution) match the default path.  The one
    documented divergence: never-closed anchors are skipped in text
    mode (element-grain extraction) while the default edge-only path
    still yields their edge."""
    html = (
        '<a href="https://t1.example/x">Click <b>here</b></a>'
        "<a href='/rel'>R&amp;D   dept</a>"
        "<a href=bare.html rel=nofollow>bare text</a>"
        '<a href="https://t1.example/x"></a>'
        '<a href="#frag">fragment skipped</a>'
        '<a href="mailto:a@b.c">mail skipped</a>'
        '<a href="https://open.example/y">never closed'
    )
    pages = spark.createDataFrame(
        [("http://site.example/dir/page.html", html)], "uri string, html string"
    )
    got = {
        (r.dst, r.anchor_text)
        for r in extract_links(pages, "html", "uri", with_text=True).collect()
    }
    assert got == {
        ("https://t1.example/x", "Click here"),
        ("http://site.example/rel", "R&D dept"),
        ("http://site.example/dir/bare.html", "bare text"),
        ("https://t1.example/x", ""),
    }
    # the default path extracts the never-closed anchor's edge too
    dsts = [r.dst for r in extract_links(pages, "html", "uri").collect()]
    assert "https://open.example/y" in dsts and len(dsts) == 5


def test_host_graph_weights_self_loops_and_suffixes(spark):
    links = spark.createDataFrame(
        [
            ("http://a.example.com/1", "http://b.other.org/x"),
            ("http://www.example.com/2", "http://other.org/y"),  # same domain pair
            ("http://a.example.com/1", "http://deep.example.com/self"),  # self-loop
            ("http://news.site.co.uk/p", "http://example.com/z"),
            ("not a url", "http://example.com/z"),  # unparsable src dropped
        ],
        "src string, dst string",
    )
    got = {
        (r.src_domain, r.dst_domain): r.weight for r in host_graph(links).collect()
    }
    assert got == {
        ("example.com", "other.org"): 2,
        ("site.co.uk", "example.com"): 1,
    }


def _numpy_pagerank(edges, d=0.85, iters=200, teleport=None):
    """Dense reference: row-normalized transition + dangling + teleport
    along the restart vector (uniform, or normalized seed weights for
    the personalized/TrustRank form), iterated to fixpoint."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t, w in edges:
        M[idx[t], idx[s]] += w
    col = M.sum(axis=0)
    dangling = col == 0
    M[:, ~dangling] /= col[~dangling]
    if teleport is None:
        t = np.full(n, 1.0 / n)
    else:
        t = np.zeros(n)
        for k, v in teleport.items():
            if k in idx:
                t[idx[k]] += v
        t = t / t.sum()
    r = t.copy()
    for _ in range(iters):
        r = (1 - d) * t + d * (M @ r + r[dangling].sum() * t)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_reference(spark):
    """Weighted digraph with a dangling node and an asymmetric hub —
    the distributed iterate must match the dense reference to 1e-9."""
    edges = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("c", "d", 1.0),
        ("e", "a", 2.0),  # d and (nothing->e) make d dangling, e source-only
    ]
    df = spark.createDataFrame(edges, "src_domain string, dst_domain string, weight double")
    # d=0.6 contracts at 0.6^k, so tol=1e-12 is reached well inside the
    # budget with a comfortable margin (error at stop <= tol/(1-d))
    got = {r.node: r.rank for r in pagerank(df, d=0.6, tol=1e-12, max_iter=80).collect()}
    want = _numpy_pagerank(edges, d=0.6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_fixed_budget_and_convergence_modes(spark):
    edges = [("a", "b", 1.0), ("b", "a", 1.0), ("b", "c", 1.0)]
    df = spark.createDataFrame(edges, "src_domain string, dst_domain string, weight double")
    # tol=None runs exactly max_iter rounds: 1 round from uniform is the
    # one-step iterate, reproduced by the reference with iters=1
    got1 = {r.node: r.rank for r in pagerank(df, tol=None, max_iter=1).collect()}
    want1 = _numpy_pagerank(edges, iters=1)
    for k in want1:
        assert got1[k] == pytest.approx(want1[k], abs=1e-12)
    # an unreachable tol under require_convergence raises; reached passes
    with pytest.raises(RuntimeError, match="not reached"):
        pagerank(df, tol=1e-30, max_iter=2, require_convergence=True)
    out = pagerank(df, d=0.5, tol=1e-10, max_iter=100, require_convergence=True)
    assert out.count() == 3
    # invalid knobs fail fast
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, d=1.0)
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(df, max_iter=0)


def test_pagerank_unweighted_and_empty(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "src_domain string, dst_domain string"
    )
    # weight=None: duplicate rows still count once each as uniform weight
    got = {
        r.node: r.rank
        for r in pagerank(edges, weight=None, d=0.55, tol=1e-12, max_iter=80).collect()
    }
    want = _numpy_pagerank([("a", "b", 1.0), ("a", "b", 1.0), ("a", "c", 1.0)], d=0.55)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    empty = spark.createDataFrame([], "src_domain string, dst_domain string, weight double")
    assert pagerank(empty).count() == 0


def test_pagerank_personalized_teleport_trustrank(spark):
    """teleport= switches to personalized PageRank (the TrustRank form):
    the restart vector AND the dangling redistribution flow to the seed
    set.  Parity against the dense numpy reference on the weighted
    dangling-hub graph; the defining trust property — a node unreachable
    from the seeds scores EXACTLY zero, however it is linked FROM — and
    the fail-fast knob semantics (duplicate seeds sum, out-of-graph
    seeds drop from normalization, negative/empty-intersection raise)."""
    edges = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("c", "d", 1.0),
        ("e", "a", 2.0),  # e is source-only: NO in-links
    ]
    df = spark.createDataFrame(
        edges, "src_domain string, dst_domain string, weight double"
    )
    seeds = spark.createDataFrame(
        # duplicate 'a' rows sum to 2.0; 'zzz' is not in the graph and
        # must drop out of the normalization, not distort it
        [("a", 1.0), ("a", 1.0), ("c", 1.0), ("zzz", 5.0)],
        "node string, weight double",
    )
    got = {
        r.node: r.rank
        for r in pagerank(df, d=0.6, tol=1e-12, max_iter=80, teleport=seeds)
        .collect()
    }
    want = _numpy_pagerank(edges, d=0.6, teleport={"a": 2.0, "c": 1.0})
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the trust property: e has no in-links and is not a seed, so no
    # walk from the seed set ever reaches it — rank EXACTLY 0.0, not
    # merely small (with uniform teleport e would get the (1-d)/n floor)
    assert got["e"] == 0.0
    assert want["e"] == 0.0
    with pytest.raises(ValueError, match=">= 0"):
        pagerank(df, max_iter=1, teleport=spark.createDataFrame(
            [("a", -1.0)], "node string, weight double"))
    # validation runs BEFORE the node join: a negative weight on a seed
    # ABSENT from the graph fails fast too (review-caught), and a
    # negative component summed away by a positive duplicate still fails
    with pytest.raises(ValueError, match=">= 0"):
        pagerank(df, max_iter=1, teleport=spark.createDataFrame(
            [("not-in-graph", -1.0), ("a", 1.0)], "node string, weight double"))
    with pytest.raises(ValueError, match=">= 0"):
        pagerank(df, max_iter=1, teleport=spark.createDataFrame(
            [("a", -1.0), ("a", 2.0)], "node string, weight double"))
    with pytest.raises(ValueError, match="no seed"):
        pagerank(df, max_iter=1, teleport=spark.createDataFrame(
            [("zzz", 1.0)], "node string, weight double"))


def test_with_domain_rank_prior_join(spark):
    ranks = spark.createDataFrame(
        [("example.com", 0.6), ("other.org", 0.4)], "node string, rank double"
    )
    docs = spark.createDataFrame(
        [
            (1, "http://www.example.com/a"),
            (2, "https://deep.other.org/b"),
            (3, "http://unknown.net/c"),
            (4, "junk"),
        ],
        "doc_id long, uri string",
    )
    got = {r.doc_id: r.domain_rank for r in with_domain_rank(docs, ranks).collect()}
    assert got == {1: 0.6, 2: 0.4, 3: None, 4: None}
    filled = {
        r.doc_id: r.domain_rank
        for r in with_domain_rank(docs, ranks, fill=0.0).collect()
    }
    assert filled == {1: 0.6, 2: 0.4, 3: 0.0, 4: 0.0}
    # schema preserved
    out = with_domain_rank(docs, ranks)
    assert set(out.columns) == {"doc_id", "uri", "domain_rank"}
    # join strategy is SIZE-GATED, not forced blind (review finding: a
    # full crawl graph's rank table is multiple GB — an unconditional
    # F.broadcast has an absolute ceiling).  All three modes agree on
    # values; auto picks broadcast for a provably tiny table, True
    # forces it, False forces the shuffled-hash fallback — and no mode
    # ever degrades to a product shape.
    want = {r.doc_id: r.domain_rank for r in out.collect()}
    for mode, expect in ((None, "BroadcastHashJoin"), (True, "BroadcastHashJoin"),
                         (False, "ShuffledHashJoin")):
        o = with_domain_rank(docs, ranks, broadcast=mode)
        # collect FIRST: mode None is the AQE path — the size gate fires
        # at runtime on real stats, so the broadcast shows in the FINAL
        # adaptive plan, not the static one (a python-built rank table
        # has no static size estimate).  True/False force their shape
        # statically and AQE respects the hint.
        got = {r.doc_id: r.domain_rank for r in o.collect()}
        assert got == want
        plan = o._jdf.queryExecution().executedPlan().toString()
        assert expect in plan, (mode, plan)
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_anchor_profile_top_terms_per_target_domain(spark):
    """anchor_profile: (dst, anchor_text) link rows -> top-k anchor
    terms per TARGET registered domain — frequency-ranked, ties broken
    on term order, stopwords dropped, unparseable targets dropped, and
    the grouping at eTLD+1 grain (www./deep hosts collapse)."""
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        anchor_profile,
    )

    links = spark.createDataFrame(
        [
            ("http://www.shop.example/a", "cheap widgets store"),
            ("http://shop.example/b", "widgets and the best widgets"),
            ("http://deep.shop.example/c", "cheap deals"),
            ("http://news.example/x", "daily news"),
            ("not a url", "dropped entirely"),
        ],
        "dst string, anchor_text string",
    )
    got = [
        (r.dst_domain, r.term, r.n, r.rank)
        for r in anchor_profile(links, k=2)
        .orderBy("dst_domain", "rank")
        .collect()
    ]
    # shop.example: widgets x3, cheap x2 ("and"/"the" are stopwords);
    # news.example: daily/news tie at 1 -> term order breaks it
    assert got == [
        ("news.example", "daily", 1, 1),
        ("news.example", "news", 1, 2),
        ("shop.example", "widgets", 3, 1),
        ("shop.example", "cheap", 2, 2),
    ]
    # stopwords=[] keeps everything
    all_terms = {
        r.term
        for r in anchor_profile(links, k=10, stopwords=[]).collect()
    }
    assert {"and", "the"} <= all_terms


def test_anchor_profile_ladder_from_html_and_feature_join(spark):
    """The full anchor ladder: raw HTML pages -> extract_links
    (with_text=True) -> anchor_profile -> with_anchor_terms — the
    extraction's quote/entity handling feeds the aggregate, and the
    collapsed rank-ordered feature column joins back onto docs by
    registered domain (NULL where nobody links)."""
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        anchor_profile,
        extract_links,
        with_anchor_terms,
    )

    pages = spark.createDataFrame(
        [
            (
                "http://a.example/p1",
                '<a href="http://target.example/x">great <b>tools</b></a>'
                "<a href='http://target.example/y'>great R&amp;D tools</a>",
            ),
            (
                "http://b.example/p2",
                "<a href=http://target.example/z>free tools</a>"
                '<a href="http://other.example/q">boring page</a>',
            ),
        ],
        "uri string, html string",
    )
    prof = anchor_profile(
        extract_links(pages, "html", "uri", with_text=True), k=2
    )
    got = [
        (r.dst_domain, r.term, r.n, r.rank)
        for r in prof.orderBy("dst_domain", "rank").collect()
    ]
    # target.example: tools x3, great x2; other.example: boring/page tie
    assert got == [
        ("other.example", "boring", 1, 1),
        ("other.example", "page", 1, 2),
        ("target.example", "tools", 3, 1),
        ("target.example", "great", 2, 2),
    ]
    docs = spark.createDataFrame(
        [
            (1, "http://www.target.example/landing"),
            (2, "http://nobody-links.example/p"),
            (3, "junk"),
        ],
        "doc_id long, uri string",
    )
    feat = {
        r.doc_id: r.anchor_terms
        for r in with_anchor_terms(docs, prof).collect()
    }
    assert feat == {1: "tools great", 2: None, 3: None}
    # join strategy gate mirrors with_domain_rank: keyed join, no product
    for mode, expect in ((True, "BroadcastHashJoin"), (False, "ShuffledHashJoin")):
        o = with_anchor_terms(docs, prof, broadcast=mode)
        assert {r.doc_id: r.anchor_terms for r in o.collect()} == feat
        plan = o._jdf.queryExecution().executedPlan().toString()
        assert expect in plan, (mode, plan)
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_pagerank_plan_no_products(spark):
    """The per-round join must stay a keyed hash join — a product shape
    here would be O(|edges| x |nodes|) per round at crawl scale."""
    edges = spark.createDataFrame(
        [(f"d{i}", f"d{(i * 7 + 1) % 40}", 1.0) for i in range(200)],
        "src_domain string, dst_domain string, weight double",
    )
    out = pagerank(edges, tol=None, max_iter=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_warc_to_prior_composition(spark, tmp_path):
    """End to end: a WARC member whose pages interlink -> warc_page_links
    -> host_graph -> pagerank -> the prior joined back onto the parsed
    documents.  The heavily-cited domain must outrank the link farm."""
    from real_time_financial_data_pipeline_spark.sources.warc import (
        read_warc_strict,
        warc_documents,
        warc_page_links,
    )

    def record(rid, uri, body):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-03-01T00:00:00Z\r\n"
            f"Content-Type: application/http\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    cite = b'<p>w</p><a href="https://hub.example/home">hub</a>'
    blob = (
        record("p1", "http://one.example/a", cite)
        + record("p2", "http://two.example/b", cite)
        + record("p3", "http://three.example/c", cite)
        + record("p4", "https://hub.example/home",
                 b'<p>hub page</p><a href="http://one.example/a">back</a>')
        + record("p5", "http://farm.example/spam",
                 b'<a href="/self1">s</a><a href="/self2">s</a>')
    )
    p = tmp_path / "graph" / "m.warc"
    p.parent.mkdir()
    p.write_bytes(blob)
    warc = read_warc_strict(spark, str(p))
    # tol=1e-6, not 1e-12 (r15 suite-wall trim): this test pins the
    # COMPOSITION and the rank ORDERING (hub >> everything, farm absent),
    # both settled long before 1e-6; numeric fixpoint precision is the
    # numpy-parity tests' job, and the prior-join equality below compares
    # the same iterate's values, exact at any tol
    ranks = pagerank(host_graph(warc_page_links(warc)), d=0.5, tol=1e-6, max_iter=100)
    rank_map = {r.node: r.rank for r in ranks.collect()}
    assert rank_map["hub.example"] == max(rank_map.values())
    assert "farm.example" not in rank_map  # only self-links -> no edges
    docs = warc_documents(warc)
    prior = with_domain_rank(docs, ranks, url_col="uri", fill=0.0)
    got = {r.uri: r.domain_rank for r in prior.collect()}
    assert got["https://hub.example/home"] == rank_map["hub.example"]
    assert got["http://farm.example/spam"] == 0.0


def test_pagerank_warm_start_incremental_fold(spark):
    """The nightly incremental form: merge tonight's edge slice into the
    persisted graph (merge_host_graphs fold == one host_graph over the
    union of all links), re-rank warm-started from yesterday's fixpoint
    — the warm fixpoint equals the cold recompute to tol and arrives in
    FEWER rounds (the damped walk's stationary distribution is unique;
    the warm start only changes the distance to it)."""
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        merge_host_graphs,
    )

    def links(pairs):
        return spark.createDataFrame(
            [(f"http://{s}/p", f"http://{t}/q") for s, t in pairs],
            "src string, dst string",
        )

    night1 = [("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"),
              ("a.com", "b.com")]
    night2 = [("c.com", "d.com"), ("d.com", "a.com"), ("b.com", "c.com")]
    g1 = host_graph(links(night1))
    folded = merge_host_graphs(g1, host_graph(links(night2)))
    direct = host_graph(links(night1 + night2))
    assert {tuple(r) for r in folded.collect()} == {
        tuple(r) for r in direct.collect()
    }
    # new-node delta (d.com enters): the warm iterate must land on the
    # SAME fixpoint a cold recompute would.  r15 suite-wall trim: the
    # cold side is the NUMPY dense reference (200 exact rounds) instead
    # of a second ~45-round Spark fit — a stronger independent oracle
    # and ~1/3 of this scenario's Spark-job bill; tol=1e-8 bounds the
    # warm iterate's distance to the fixpoint by delta*d/(1-d) = 1.5e-8
    # at d=0.6, so the 5e-8 equality holds with margin.  (The default
    # checkpoint_every=5 stays: an attempted every-10 trim OOMed the
    # driver heap — the frequent cut is what bounds plan/heap growth in
    # a long shared-session suite, not just checkpoint storage.)
    warm_stats = {}
    y0 = pagerank(g1, d=0.6, tol=1e-8, max_iter=100)
    warm = pagerank(
        folded, d=0.6, tol=1e-8, max_iter=100, init_ranks=y0,
        stats=warm_stats,
    )
    w = {r.node: r.rank for r in warm.collect()}
    ref = _numpy_pagerank(
        [(r.src_domain, r.dst_domain, float(r.weight)) for r in folded.collect()],
        d=0.6,
    )
    assert set(w) == set(ref)
    for k in ref:
        assert w[k] == pytest.approx(ref[k], abs=5e-8)
    assert warm_stats["converged"]
    assert sum(w.values()) == pytest.approx(1.0, abs=1e-9)
    # fewer-rounds claim, on a structurally-tiny delta: the base graph is
    # asymmetric (multi-out-edge nodes, so its fixpoint is NOT uniform —
    # a single-out-edge-per-node graph is a permutation walk whose
    # fixpoint IS uniform and converges in one round from anywhere,
    # which is exactly the degenerate case the first version of this
    # test tripped on) and the nightly delta bumps one heavy edge by a
    # ~0.3% weight share, so the warm iterate starts ~2-3 orders of
    # magnitude closer than uniform; at d=0.6 that is a 10+ round gap —
    # structural, not a margin summation-order noise could flip
    base = spark.createDataFrame(
        [("a.com", "b.com", 200.0), ("a.com", "c.com", 100.0),
         ("b.com", "c.com", 100.0), ("b.com", "a.com", 100.0),
         ("c.com", "a.com", 100.0)],
        "src_domain string, dst_domain string, weight double",
    )
    bumped = merge_host_graphs(base, host_graph(links([("a.com", "b.com")])))
    # tol=1e-9 preserves the structural gap: warm starts ~2-3 orders of
    # magnitude closer, a 10+ round difference at d=0.6 — far above the
    # `- 5` margin — while cutting ~15 rounds per call off the suite's
    # Spark-job bill (same driver-heap rationale as above)
    y_base = pagerank(base, d=0.6, tol=1e-9, max_iter=100)
    cs, ws = {}, {}
    pagerank(bumped, d=0.6, tol=1e-9, max_iter=100, stats=cs)
    pagerank(bumped, d=0.6, tol=1e-9, max_iter=100, init_ranks=y_base,
             stats=ws)
    assert cs["converged"] and ws["converged"]
    assert ws["n_iter"] < cs["n_iter"] - 5


def test_training_set_min_domain_rank_gate(spark):
    """prepare_training_set(domain_ranks=, min_domain_rank=): docs on a
    below-threshold domain are dropped BEFORE any content stage; docs on
    unknown domains (or with unparsable URLs) pass unexamined — unknown
    is not low-rank."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    body = "the quick brown fox jumps over the lazy dog and keeps going"
    docs = spark.createDataFrame(
        [
            (1, body, "http://good.example/a"),
            (2, body + " two", "http://farm.example/spam"),
            (3, body + " three", "http://unknown.example/x"),
            (4, body + " four", "junk url"),
        ],
        "doc_id long, text string, uri string",
    )
    ranks = spark.createDataFrame(
        [("good.example", 0.8), ("farm.example", 0.01)], "node string, rank double"
    )
    out = prepare_training_set(
        docs,
        min_quality=0.0,
        near_dup_threshold=None,
        chunk_tokens=64,
        overlap_tokens=8,
        url_col="uri",
        domain_ranks=ranks,
        min_domain_rank=0.1,
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert kept == {1, 3, 4}  # low-rank dropped; unknown + junk pass
    assert set(out.columns) == {
        "doc_id", "chunk_id", "n_chunk_tokens", "chunk_text", "split"
    }
    with pytest.raises(ValueError, match="requires domain_ranks"):
        prepare_training_set(docs, min_domain_rank=0.1, url_col="uri")
    with pytest.raises(ValueError, match="requires domain_ranks"):
        prepare_training_set(docs, min_domain_rank=0.1, domain_ranks=ranks)


def test_training_set_domain_rank_quantile_gate_is_scale_stable(spark):
    """Review finding: ranks sum to 1, so a RAW min_domain_rank means
    "N x the uniform floor" only at a fixed graph size — as the nightly
    graph grows, every rank shrinks ~1/N and the same number silently
    tightens the gate.  min_domain_rank_quantile gates on the rank
    DISTRIBUTION instead: pinned here by doubling the graph (every rank
    halves, new domains enter with the same shape) and asserting the
    survivor set among the ORIGINAL documents is identical — while the
    raw-threshold form, fed its old threshold, drops everything."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    body = "the quick brown fox jumps over the lazy dog and keeps going"
    docs = spark.createDataFrame(
        [(i, f"{body} {i}", f"http://dom{i}.example/p") for i in range(20)],
        "doc_id long, text string, uri string",
    )
    # 5 low-rank domains (weight w), 15 high (4w); sum = 65w = 1
    ranks1 = spark.createDataFrame(
        [(f"dom{i}.example", (1.0 if i < 5 else 4.0) / 65.0) for i in range(20)],
        "node string, rank double",
    )
    # the doubled graph: every original rank HALVES (10 low + 30 high,
    # sum = 130v = 1) and 20 new domains enter with the same shape —
    # the exact nightly-growth drift the quantile form must absorb
    ranks2 = spark.createDataFrame(
        [(f"dom{i}.example", (1.0 if i < 5 else 4.0) / 130.0) for i in range(20)]
        + [(f"new{i}.example", (1.0 if i < 5 else 4.0) / 130.0) for i in range(20)],
        "node string, rank double",
    )

    def kept(ranks, **gate):
        out = prepare_training_set(
            docs, min_quality=0.0, near_dup_threshold=None, chunk_tokens=64,
            overlap_tokens=8, url_col="uri", domain_ranks=ranks, **gate,
        )
        return {r.doc_id for r in out.select("doc_id").distinct().collect()}

    # q=0.3 sits safely inside the high-value block at BOTH sizes
    # (position 5.7 of 20, 11.7 of 40), so the cut is boundary-stable
    k1 = kept(ranks1, min_domain_rank_quantile=0.3)
    assert k1 == set(range(5, 20))
    assert kept(ranks2, min_domain_rank_quantile=0.3) == k1  # stable
    # the raw form with yesterday's threshold (the high value, 4/65)
    # drops every original doc after doubling — the documented drift
    assert kept(ranks2, min_domain_rank=4.0 / 65.0) == set()
    # knob validation: the two forms are exclusive, quantile in [0, 1)
    with pytest.raises(ValueError, match="exactly one"):
        prepare_training_set(
            docs, url_col="uri", domain_ranks=ranks1,
            min_domain_rank=0.1, min_domain_rank_quantile=0.3,
        )
    with pytest.raises(ValueError, match="quantile must be in"):
        prepare_training_set(
            docs, url_col="uri", domain_ranks=ranks1,
            min_domain_rank_quantile=1.0,
        )
    # an empty (or all-null-rank) table cannot yield a quantile — a
    # descriptive curation error, not a bare IndexError (review-caught)
    empty_ranks = spark.createDataFrame([], "node string, rank double")
    with pytest.raises(ValueError, match="no non-null rank"):
        kept(empty_ranks, min_domain_rank_quantile=0.3)
    null_ranks = spark.createDataFrame(
        [("a.example", None)], "node string, rank double"
    )
    with pytest.raises(ValueError, match="no non-null rank"):
        kept(null_ranks, min_domain_rank_quantile=0.3)


def test_warc_page_links_is_stream_legal(spark, tmp_path):
    """warc_page_links is stateless projections end-to-end, so the
    live-crawl landing zone can emit link edges in append mode; the
    drained edge set equals the batch extraction exactly."""
    from real_time_financial_data_pipeline_spark.sources.warc import (
        read_warc,
        stream_warc,
        warc_page_links,
    )

    def record(rid, uri, body):
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-03-01T00:00:00Z\r\n"
            f"Content-Type: application/http\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    land = tmp_path / "landing"
    land.mkdir()
    (land / "m0.warc").write_bytes(
        record("L1", "http://one.example/a",
               b'<a href="https://two.example/x">t</a><a href="/local">l</a>')
        + record("L2", "http://two.example/b",
                 b'<a href="//cdn.example/r">c</a>')
    )
    q = (
        warc_page_links(stream_warc(spark, str(land)))
        .writeStream.format("memory")
        .queryName("warc_stream_links")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.src, r.dst) for r in spark.table("warc_stream_links").collect()
    }
    batch = {
        (r.src, r.dst)
        for r in warc_page_links(read_warc(spark, str(land))).collect()
    }
    assert streamed == batch
    assert ("http://one.example/a", "http://one.example/local") in streamed
    assert ("http://two.example/b", "http://cdn.example/r") in streamed


def test_pagerank_review_guards(spark):
    """Review-caught edges: checkpoint_every=0 must fail fast (not
    ZeroDivisionError mid-loop with caches pinned); the empty-graph
    early return fills the stats hook and leaves no cache behind;
    domain_ranks without min_domain_rank raises instead of silently
    gating nothing."""
    from real_time_financial_data_pipeline_spark.operators.training import (
        prepare_training_set,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "src_domain string, dst_domain string, weight double"
    )
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(edges, checkpoint_every=0)
    s = {}
    empty = spark.createDataFrame(
        [], "src_domain string, dst_domain string, weight double"
    )
    assert pagerank(empty, stats=s).count() == 0
    assert s == {"n_iter": 0, "converged": True, "delta": None}
    docs = spark.createDataFrame(
        [(1, "text body here", "http://a.example/x")],
        "doc_id long, text string, uri string",
    )
    ranks = spark.createDataFrame([("a.example", 0.5)], "node string, rank double")
    with pytest.raises(ValueError, match="domain_ranks without min_domain_rank"):
        prepare_training_set(docs, url_col="uri", domain_ranks=ranks)


def test_stream_host_graph_fold_replay_and_drain_parity(spark, tmp_path):
    """The streaming graph fold: weight addition is NOT idempotent (the
    KMV fold's algebra trick doesn't apply), so effectively-once comes
    from the version ladder — each fold reads only snapshots STRICTLY
    BELOW its own batch_id.  Pinned: (a) replaying a batch (same frame,
    same id) leaves the snapshot bit-identical — no double counting;
    (b) an availableNow drain over a landing directory folds to EXACTLY
    host_graph over every link; (c) keep_versions prunes; (d) empty
    batches add no version."""
    from real_time_financial_data_pipeline_spark.streaming.crawl_graph import (
        latest_graph_snapshot,
        make_graph_folder,
        stream_host_graph_fold,
    )

    gp = str(tmp_path / "graph")
    fold = make_graph_folder(gp, keep_versions=2)

    def links(pairs):
        return spark.createDataFrame(
            [(f"http://{s}/p", f"http://{t}/q") for s, t in pairs],
            "src string, dst string",
        )

    b0 = links([("a.com", "b.com"), ("a.com", "b.com"), ("b.com", "c.com")])
    b1 = links([("a.com", "b.com"), ("c.com", "a.com")])
    fold(b0, 0)
    fold(b1, 1)
    after = {
        (r.src_domain, r.dst_domain): r.weight
        for r in latest_graph_snapshot(spark, gp)[1].collect()
    }
    assert after == {
        ("a.com", "b.com"): 3, ("b.com", "c.com"): 1, ("c.com", "a.com"): 1,
    }
    # (a) replay of the LATEST batch: reads v=0 (strictly below 1), not
    # the v=1 it is rewriting — snapshot unchanged, no double count
    fold(b1, 1)
    v, snap = latest_graph_snapshot(spark, gp)
    assert v == 1
    assert {
        (r.src_domain, r.dst_domain): r.weight for r in snap.collect()
    } == after
    # (d) empty batch adds no version
    fold(links([]), 2)
    assert latest_graph_snapshot(spark, gp)[0] == 1
    # (c) retention: a third real fold prunes v=0
    fold(links([("d.com", "a.com")]), 3)
    from real_time_financial_data_pipeline_spark.streaming.sketches import (
        _list_versions,
    )
    assert _list_versions(spark, gp) == [1, 3]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep_versions"):
        make_graph_folder(gp, keep_versions=0)
    # keep_versions=1 is valid for the KMV fold but NOT here: a replay of
    # batch n reads strictly below n, so the penultimate version must
    # survive the prune (review-caught replay-safety breach)
    with _pytest.raises(ValueError, match="penultimate"):
        make_graph_folder(gp, keep_versions=1)

    # (b) the streaming form drains to host_graph-over-everything
    land = tmp_path / "landing"
    land.mkdir()
    all_pairs = [("x.com", "y.com"), ("x.com", "y.com"), ("y.com", "z.com")]
    links(all_pairs[:2]).write.mode("overwrite").parquet(str(land / "p0"))
    links(all_pairs[2:]).write.mode("append").parquet(str(land / "p0"))
    schema = spark.read.parquet(str(land / "p0")).schema
    stream = spark.readStream.schema(schema).parquet(str(land / "p0"))
    gp2 = str(tmp_path / "graph2")
    q = stream_host_graph_fold(
        stream, gp2, str(tmp_path / "ck"), trigger_available_now=True
    )
    q.awaitTermination(120)
    folded = {
        (r.src_domain, r.dst_domain): r.weight
        for r in latest_graph_snapshot(spark, gp2)[1].collect()
    }
    direct = {
        (r.src_domain, r.dst_domain): r.weight
        for r in host_graph(links(all_pairs)).collect()
    }
    assert folded == direct
    with pytest.raises(ValueError, match="streaming"):
        stream_host_graph_fold(links(all_pairs), gp2, str(tmp_path / "ck2"))

    # (e) write-shape knob: n_files=None writes the snapshot at the
    # merge's own parallelism (crawl scale — no single-task funnel),
    # n_files=k coalesces to k files; the FOLDED VALUES are identical
    # under every shape, including under replay (the ladder semantics
    # are orthogonal to the write shape)
    import glob as _glob
    gp3 = str(tmp_path / "graph3")
    fold_part = make_graph_folder(gp3, keep_versions=2, n_files=None)
    fold_part(b0, 0)
    fold_part(b1, 1)
    fold_part(b1, 1)  # replay, partitioned shape
    v3, snap3 = latest_graph_snapshot(spark, gp3)
    assert v3 == 1
    assert {
        (r.src_domain, r.dst_domain): r.weight for r in snap3.collect()
    } == after
    # single-file shape really is one data file; partitioned shape is
    # free to be many (and at least exists as a committed version dir)
    one_file = _glob.glob(f"{gp}/v=3/part-*.parquet")
    assert len(one_file) == 1
    assert _glob.glob(f"{gp3}/v=1/part-*.parquet")
    with pytest.raises(ValueError, match="n_files"):
        make_graph_folder(gp3, n_files=0)


def test_pagerank_warm_init_lineage_cut(spark):
    """Probe-caught warm-start perf bug: init_ranks is typically LAST
    NIGHT'S pagerank output, whose logical plan is the entire previous
    iteration — without a lineage cut at init, every warm round
    re-analyzes that plan inside its own (measured ~8x the per-round
    wall; caching does not truncate plans).  Pinned structurally: with
    in-loop cuts disabled, the warm result's plan must bottom out in a
    checkpoint leaf (Scan ExistingRDD) and be no bigger for a deep-DAG
    init than for a flat one — the cut normalizes both to a leaf."""
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 1.0)],
        "src_domain string, dst_domain string, weight double",
    )
    # a deep-plan init: 4 uncut rounds of a previous ranking
    deep = pagerank(edges, d=0.6, tol=None, max_iter=4, checkpoint_every=100)
    flat = spark.createDataFrame(
        [("a", 0.4), ("b", 0.3), ("c", 0.3)], "node string, rank double"
    )

    def warm_plan(init):
        out = pagerank(
            edges, d=0.6, tol=None, max_iter=2, checkpoint_every=100,
            init_ranks=init,
        )
        return out._jdf.queryExecution().optimizedPlan().toString()

    deep_plan, flat_plan = warm_plan(deep), warm_plan(flat)
    assert "ExistingRDD" in deep_plan  # the init checkpoint leaf
    # without the cut the deep init's whole iteration DAG rides inside:
    # the plan string would be several times the flat-init one
    assert len(deep_plan) < 2 * len(flat_plan) + 500


def test_pagerank_releases_superseded_checkpoints(spark):
    """Review-caught long-session heap ratchet: the iteration's lineage
    cuts must RELEASE the previous checkpoint's blocks once the new one
    is materialized — `localCheckpoint(eager=False)` RDDs otherwise live
    until JVM GC, and a nightly job re-ranking many slices (or a long
    shared-session suite) accumulates them until the driver heap dies.
    Pinned structurally: the number of persistent RDDs left behind by a
    run must NOT grow with the round count (every superseded cut freed),
    and repeated invocations leave the same per-run residue."""
    sc = spark.sparkContext

    def n_persistent():
        return sc._jsc.getPersistentRDDs().size()

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 1.0)],
        "src_domain string, dst_domain string, weight double",
    )
    residues = []
    for max_iter in (4, 12, 12):
        before = n_persistent()
        pagerank(edges, d=0.6, tol=None, max_iter=max_iter, checkpoint_every=1)
        residues.append(n_persistent() - before)
    # 3x the cuts, same residue: only the FINAL checkpoint + final rank
    # cache survive a run — superseded cuts were freed inside the loop
    assert residues[0] == residues[1] == residues[2]
    assert residues[0] <= 2


def test_pagerank_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir= switches the lineage cuts to RELIABLE
    checkpoint() — the cluster mode where executor loss must not kill
    the iteration.  The iterate is unchanged (same fixpoint as the
    default local mode to float noise), checkpoint files actually land
    in the directory, and superseded cuts delete their files (only the
    final checkpoint's directory survives the run)."""
    import os

    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 1.0)],
        "src_domain string, dst_domain string, weight double",
    )
    ckd = str(tmp_path / "pr_ck")
    local = {r.node: r.rank for r in
             pagerank(edges, d=0.6, tol=None, max_iter=8).collect()}
    rel = {r.node: r.rank for r in
           pagerank(edges, d=0.6, tol=None, max_iter=8, checkpoint_every=2,
                    checkpoint_dir=ckd).collect()}
    assert set(local) == set(rel)
    for k in local:
        assert rel[k] == pytest.approx(local[k], abs=1e-12)
    # 4 cuts happened; 3 were superseded and deleted — exactly the final
    # checkpoint's rdd-* directory remains under the app's checkpoint dir
    rdd_dirs = [
        os.path.join(root, d)
        for root, dirs, _ in os.walk(ckd)
        for d in dirs
        if d.startswith("rdd-")
    ]
    assert len(rdd_dirs) == 1
    # session-global hygiene (review-caught): a previously-set
    # checkpoint dir is RESTORED after the run, so later callers'
    # Dataset.checkpoint does not silently inherit pagerank's directory
    sc = spark.sparkContext
    before = sc.getCheckpointDir()
    try:
        prior = str(tmp_path / "caller_ck")
        sc.setCheckpointDir(prior)
        resolved_prior = sc.getCheckpointDir()
        pagerank(edges, d=0.6, tol=None, max_iter=2, checkpoint_every=1,
                 checkpoint_dir=str(tmp_path / "pr_ck2"))
        restored = sc.getCheckpointDir()
        # restore re-issues setCheckpointDir on the resolved prior path
        # (a fresh UUID nests under it) — the caller's TREE is restored
        assert restored is not None and restored.startswith(resolved_prior)
    finally:
        if before is not None:
            sc.setCheckpointDir(before)


def test_anchor_term_counts_fold_equals_direct_profile(spark):
    """The nightly incremental form (r16): anchor_term_counts is the
    MERGEABLE artifact — folding slice count tables with
    merge_term_counts in either order, then ranking with
    profile_from_counts, must equal one anchor_profile over the union
    of all links (counts are associative; top-k profiles are NOT
    mergeable, which is why the count table is what a nightly crawl
    persists).  The serving form is schema- and tie-rule-identical, so
    with_anchor_terms consumes either."""
    from pyspark.sql import functions as F

    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        anchor_profile,
        anchor_term_counts,
        profile_from_counts,
        with_anchor_terms,
    )
    from real_time_financial_data_pipeline_spark.operators.text import (
        merge_term_counts,
    )

    terms = ["news", "sports", "maps", "mail", "video"]
    slices = []
    rows_all = []
    for s in range(3):
        rows = [
            (
                f"https://site{(s + i) % 4}.com/p{i}",
                f"{terms[(s + i) % 5]} {terms[(s + 2 * i) % 5]} portal",
            )
            for i in range(12)
        ]
        rows_all += rows
        slices.append(
            spark.createDataFrame(rows, "dst string, anchor_text string")
        )
    all_links = spark.createDataFrame(rows_all, "dst string, anchor_text string")

    counts = [anchor_term_counts(sl, stopwords=[]) for sl in slices]
    fold_ab_c = merge_term_counts(merge_term_counts(counts[0], counts[1]), counts[2])
    fold_c_ab = merge_term_counts(counts[2], merge_term_counts(counts[1], counts[0]))
    direct = anchor_profile(all_links, k=3, stopwords=[])

    want = {tuple(r) for r in direct.collect()}
    assert {tuple(r) for r in profile_from_counts(fold_ab_c, 3).collect()} == want
    assert {tuple(r) for r in profile_from_counts(fold_c_ab, 3).collect()} == want
    assert len(want) > 0

    # the serving form is a drop-in for the join consumer
    docs = spark.createDataFrame(
        [(1, "https://site0.com/x"), (2, "https://nowhere.example/y")],
        "doc_id long, uri string",
    )
    via_direct = {
        (r.doc_id, r.anchor_terms)
        for r in with_anchor_terms(docs, direct, "uri").collect()
    }
    via_fold = {
        (r.doc_id, r.anchor_terms)
        for r in with_anchor_terms(
            docs, profile_from_counts(fold_ab_c, 3), "uri"
        ).collect()
    }
    assert via_direct == via_fold
    assert any(t is not None for _, t in via_direct)


def test_stream_anchor_counts_fold_replay_and_serving(spark, tmp_path):
    """The anchor-text twin of the streaming graph fold (r16): term-count
    addition is as non-idempotent as edge-weight addition, so the fold
    rides the same strictly-below version ladder.  Pinned: (a) replaying
    a batch leaves the snapshot bit-identical; (b) an availableNow drain
    folds to EXACTLY anchor_term_counts over every link that arrived,
    and profile_from_counts over the snapshot equals a direct
    anchor_profile; (c) the keep_versions >= 2 guard holds."""
    import pytest as _pytest
    from real_time_financial_data_pipeline_spark.operators.crawl_graph import (
        anchor_profile,
        anchor_term_counts,
        profile_from_counts,
    )
    from real_time_financial_data_pipeline_spark.streaming.crawl_graph import (
        latest_snapshot,
        make_anchor_counts_folder,
        stream_anchor_counts_fold,
    )

    cp = str(tmp_path / "anchor_counts")
    fold = make_anchor_counts_folder(cp, stopwords=[], keep_versions=2)

    def links(rows):
        return spark.createDataFrame(
            [(f"https://{d}/p", t) for d, t in rows],
            "dst string, anchor_text string",
        )

    b0 = links([("a.com", "news portal"), ("a.com", "news daily"),
                ("b.com", "maps")])
    b1 = links([("a.com", "news"), ("b.com", "maps maps")])
    fold(b0, 0)
    fold(b1, 1)
    want = {("a.com", "news"): 3, ("a.com", "portal"): 1, ("a.com", "daily"): 1,
            ("b.com", "maps"): 3}
    after = {
        (r.dst_domain, r.term): r.n for r in latest_snapshot(spark, cp)[1].collect()
    }
    assert after == want
    # (a) replay reads v=0 (strictly below), rewrites v=1 identically
    fold(b1, 1)
    v, snap = latest_snapshot(spark, cp)
    assert v == 1 and {(r.dst_domain, r.term): r.n for r in snap.collect()} == want
    with _pytest.raises(ValueError, match="penultimate"):
        make_anchor_counts_folder(cp, keep_versions=1)

    # (b) streaming drain == one anchor_term_counts over everything;
    # serving top-k == direct anchor_profile
    land = tmp_path / "landing"
    land.mkdir()
    rows_a = [("x.com", "video hub"), ("x.com", "video site")]
    rows_b = [("y.com", "mail"), ("x.com", "video")]
    links(rows_a).write.mode("overwrite").parquet(str(land / "p0"))
    links(rows_b).write.mode("overwrite").parquet(str(land / "p1"))
    schema = spark.read.parquet(str(land / "p0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "*"))
    )
    cp2 = str(tmp_path / "anchor_counts2")
    q = stream_anchor_counts_fold(
        stream, cp2, str(tmp_path / "ck"), stopwords=[],
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    direct_counts = {
        (r.dst_domain, r.term): r.n
        for r in anchor_term_counts(links(rows_a + rows_b), stopwords=[]).collect()
    }
    folded = latest_snapshot(spark, cp2)[1]
    assert {
        (r.dst_domain, r.term): r.n for r in folded.collect()
    } == direct_counts
    assert {
        tuple(r) for r in profile_from_counts(folded, 2).collect()
    } == {
        tuple(r)
        for r in anchor_profile(links(rows_a + rows_b), k=2, stopwords=[]).collect()
    }
    with _pytest.raises(ValueError, match="streaming"):
        stream_anchor_counts_fold(links(rows_a), cp2, str(tmp_path / "ck2"))
