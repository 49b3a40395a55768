"""URL-level crawl curation: canonical-URL dedup, per-domain caps, and
domain profiling — the RefinedWeb/C4-style stages that run BEFORE any
content is even fetched or scored, because they are orders of magnitude
cheaper than content work (a URL is ~80 bytes; its document is ~80 KB).

Where these sit in the ladder: url_dedup collapses the same page
crawled twice under trivially different spellings (fragment, default
port, case of the host, trailing slash); domain_cap bounds any one
site's share of the corpus (the "no more than N pages per domain" rule
every serious crawl pipeline applies — unbounded, a handful of
template-heavy domains dominate the token budget); domain_profile is
the before/after report.  All three are pure DataFrame ops over the URL
column: JVM `parse_url` + regexps, one hash-partitioned window for the
cap, no Python.

Registered-domain note, stated not hidden: exact eTLD+1 extraction
needs the Public Suffix List (a ~15k-rule table that changes monthly).
:func:`registered_domain` implements the last-two-labels approximation
with a built-in multi-part-suffix table for the common country schemes
(co.uk, com.au, ...); pass ``extra_suffixes`` to extend it from a
current PSL snapshot when grouping fidelity matters.  The approximation
groups too COARSELY only for unlisted multi-part suffixes (it would
treat user1.github.io and user2.github.io as one domain — conservative
for capping: over-grouping caps harder, never leaks more).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Common multi-part public suffixes for the last-two-labels fallback.
#: Not the PSL — the high-traffic country schemes where two labels are
#: a SUFFIX, not a registration.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def _fresh(df: DataFrame, base: str) -> str:
    """A staging column name absent from ``df`` — internal parts columns
    must never overwrite a caller column."""
    existing = set(df.columns)
    name, i = base, 0
    while name in existing:
        i += 1
        name = f"{base}{i}"
    return name


def _canonical_from_parts(
    host: Column, proto: Column, authority: Column, path: Column, query: Column
) -> Column:
    """:func:`canonical_url`'s body over PRE-PARSED part columns.

    The split exists for codegen health, not semantics: each part is
    referenced 2-4 times below, so building the canonical form straight
    off the URL re-embeds the whole ``parse_url`` chain per reference —
    compose a few such columns into one stage and Janino's 64 KB method
    ceiling kills whole-stage codegen for the plan (observed on the
    url-curation gate fabric).  With the parts staged as NAMED columns
    (``with_canonical_url``), every reference here is an attribute and
    the projection stays a few hundred bytes of generated code.
    CollapseProject cannot re-inline the parts: they are non-cheap and
    multiply-referenced, exactly the case its isCheap guard keeps
    materialized.

    Null contract (``url_dedup``'s host-based split relies on it): the
    result is null IFF ``host`` is null — every other operand is
    defaulted non-null (path coalesced, ports/query/scheme fall to ''),
    so a parseable host always yields a canonical string."""
    port = F.nullif(F.regexp_extract(authority, r":(\d+)$", 1), F.lit(""))
    default_port = F.when(proto == "http", F.lit("80")).when(
        proto == "https", F.lit("443")
    )
    kept_port = F.when(
        port.isNotNull() & ~port.eqNullSafe(default_port),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    npath = F.regexp_replace(path, "//+", "/")
    npath = F.regexp_replace(npath, "/\\Z", "")
    scheme_prefix = F.when(
        proto.isin("http", "https") | proto.isNull(), F.lit("")
    ).otherwise(F.concat(proto, F.lit("://")))
    base = F.concat(
        scheme_prefix,
        host,
        kept_port,
        F.when(npath == "", F.lit("/")).otherwise(npath),
        F.when(query.isNotNull(), F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(host.isNotNull(), base)


def _domain_of_host(
    host: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """:func:`registered_domain`'s body over a pre-lowered HOST column —
    same codegen-health split as :func:`_canonical_from_parts` (the host
    is referenced ~6 times below)."""
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    suffixes = tuple(MULTI_SUFFIXES) + tuple(extra_suffixes)
    is_multi = two.isin(*suffixes)
    dom = F.when(is_multi & (three != ""), three).otherwise(two)
    return F.when(host.isNotNull() & (dom != ""), dom)


def with_canonical_url(
    df: DataFrame, url_col: str, out_col: str
) -> DataFrame:
    """``df`` plus ``out_col`` = :func:`canonical_url` of ``url_col``,
    built through one named-parts staging projection (each ``parse_url``
    evaluated and codegen'd ONCE) — the DataFrame-level form every
    corpus-sized consumer should use; the raw Column form re-embeds the
    parse chain per reference and can blow Janino's 64 KB method limit
    when composed."""
    url = F.col(url_col)
    h, p, a, t, q = (
        _fresh(df, n)
        for n in ("_u_host", "_u_proto", "_u_auth", "_u_path", "_u_query")
    )
    return (
        df.withColumns(
            {
                h: F.lower(F.parse_url(url, F.lit("HOST"))),
                p: F.lower(F.parse_url(url, F.lit("PROTOCOL"))),
                a: F.parse_url(url, F.lit("AUTHORITY")),
                t: F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")),
                q: F.parse_url(url, F.lit("QUERY")),
            }
        )
        .withColumn(
            out_col,
            _canonical_from_parts(
                F.col(h), F.col(p), F.col(a), F.col(t), F.col(q)
            ),
        )
        .drop(h, p, a, t, q)
    )


def with_registered_domain(
    df: DataFrame,
    url_col: str,
    out_col: str,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """``df`` plus ``out_col`` = :func:`registered_domain` of
    ``url_col`` via a named-host staging projection — one ``parse_url``
    per row instead of one per reference (see
    :func:`with_canonical_url`)."""
    h = _fresh(df, "_u_host")
    return (
        df.withColumn(h, F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))))
        .withColumn(out_col, _domain_of_host(F.col(h), extra_suffixes))
        .drop(h)
    )


def canonical_url(url: Column) -> Column:
    """Canonical spelling for exact-URL identity: lowercase scheme+host,
    strip the fragment, DEFAULT ports only (:80 for http, :443 for
    https — a NON-default port names a different server and is kept:
    ``parse_url``'s HOST part drops every port, so the port is
    re-extracted from AUTHORITY and re-appended unless it is the
    scheme's default), duplicate slashes in the path, and one trailing
    slash; query string KEPT verbatim (query params are content-bearing
    — dropping utm_* style noise is a site-specific policy, not an
    identity rule).  Scheme handling: http and https collapse to one
    scheme-relative identity (the crawler convention); every OTHER
    scheme keeps a ``scheme://`` prefix so ftp://host/x never aliases
    https://host/x.  Null-safe: a null or unparsable URL canonicalizes
    to NULL (parse_url returns null hosts), so junk never aliases to a
    real page.

    Scheme-relative identity for the WEB schemes only: http and https
    of the same resource are the same PAGE for dedup purposes (crawlers
    canonicalize to https).  Any OTHER scheme names a different
    protocol endpoint — ftp://host/x and https://host/x must NOT alias
    — so the non-web canonical form keeps its scheme prefix (and its
    port: only http/https default ports are stripped, other schemes
    have no default registered here).

    Expression-composition caveat: this raw Column form re-embeds the
    ``parse_url`` chain once per part reference; corpus-sized plans
    should stage through :func:`with_canonical_url` instead (named
    parts, codegen'd once)."""
    return _canonical_from_parts(
        F.lower(F.parse_url(url, F.lit("HOST"))),
        F.lower(F.parse_url(url, F.lit("PROTOCOL"))),
        F.parse_url(url, F.lit("AUTHORITY")),
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")),
        F.parse_url(url, F.lit("QUERY")),
    )


def registered_domain(
    url: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """eTLD+1 approximation (see module docstring): the last two host
    labels, or three when the last two form a known multi-part suffix.
    ``www.`` is never part of it (stripped by taking trailing labels).

    Corpus-sized plans should stage through
    :func:`with_registered_domain` (named host, codegen'd once) — this
    raw Column form re-embeds ``parse_url`` per reference."""
    return _domain_of_host(
        F.lower(F.parse_url(url, F.lit("HOST"))), extra_suffixes
    )


def url_dedup(
    docs: DataFrame, url_col: str = "uri", id_col: str = "doc_id"
) -> DataFrame:
    """Keep ONE row per canonical URL — min id wins (the batch family's
    deterministic-survivor rule, same as ``exact_dedup_keep_min``).
    Rows whose URL does not parse keep themselves (null canonical forms
    are never grouped together — junk must not dedup against junk).
    One hash aggregate + a semi join on (canonical, winner).

    The parsable/junk split tests HOST nullity, not ``_cu`` nullity —
    equivalent by :func:`_canonical_from_parts`'s null contract (the
    canonical form is null iff the host is), and deliberately minimal:
    predicate pushdown re-substitutes the filtered column's whole alias
    chain down to the scan, and the ``_cu`` expression inlines ~13
    ``parse_url`` copies where the host test inlines one."""
    tagged = with_canonical_url(docs, url_col, "_cu")
    has_host = F.parse_url(F.col(url_col), F.lit("HOST")).isNotNull()
    parsable = tagged.filter(has_host)
    winners = parsable.groupBy("_cu").agg(F.min(id_col).alias(id_col))
    kept = parsable.join(winners, ["_cu", id_col], "left_semi")
    return kept.unionByName(
        tagged.filter(F.parse_url(F.col(url_col), F.lit("HOST")).isNull())
    ).drop("_cu")


def domain_cap(
    docs: DataFrame,
    max_per_domain: int,
    url_col: str = "uri",
    id_col: str = "doc_id",
    salt: str = "domcap",
    extra_suffixes: tuple[str, ...] = (),
    prefilter_buckets: int | None = None,
    order_hash=None,
) -> DataFrame:
    """At most ``max_per_domain`` documents per registered domain, chosen
    by deterministic content-hash order (``xxhash64(id, salt)`` with the
    id as tie-break — the ``deterministic_shuffle`` convention), so the
    kept set is layout-independent and re-runs keep the SAME pages
    rather than re-rolling.  Unparsable-URL rows pass through uncapped
    (they form no domain; the quality gates own them).

    Cost and the skew it must survive: the domain key is skewed BY
    CONSTRUCTION — the mega-domain is exactly why the cap exists — and a
    plain keyed window sorts that domain's ENTIRE row set in one task.
    ``prefilter_buckets = B`` engages the two-phase shape (the KMV
    pre-prune pattern): phase one caps per (domain, hash-bucket) — B
    tasks share the hot domain, each emitting at most N rows — and
    phase two re-caps the ≤ B·N survivors per domain.  Output is
    IDENTICAL to the one-phase form (the global N smallest order-hashes
    are each among their own bucket's N smallest — test-pinned), while
    the hot domain's single-task row bound drops from |domain| to B·N.
    Default ``None`` keeps the one-window plan (right below ~10⁶ rows
    per domain); set B ≈ parallelism when one domain can dominate a
    crawl slice.

    ``order_hash(id_column, salt)`` swaps the take-order hash (default
    ``xxhash64(id, salt)``) for another pure content hash — e.g.
    ``md5(id || salt)`` when the kept set must be replayable by an
    engine without xxhash64 (the DuckDB oracle row uses exactly that;
    same swap-point contract as ``training.token_budget_sample``).  The
    phase-one BUCKET hash stays xxhash64 — bucketing never changes the
    output, only which task ranks which rows."""
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    if prefilter_buckets is not None and prefilter_buckets < 2:
        raise ValueError(
            f"prefilter_buckets must be >= 2 (or None), got {prefilter_buckets}"
        )
    tagged = with_registered_domain(docs, url_col, "_dom", extra_suffixes)
    with_dom = tagged.filter(F.col("_dom").isNotNull())
    order = (
        order_hash(F.col(id_col), salt)
        if order_hash is not None
        else F.xxhash64(F.col(id_col), F.lit(salt))
    )
    if prefilter_buckets is not None:
        bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt + "|b")), F.lit(prefilter_buckets))
        w1 = Window.partitionBy("_dom", "_db").orderBy(order, F.col(id_col))
        with_dom = (
            with_dom.withColumn("_db", bucket)
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= max_per_domain)
            .drop("_rn", "_db")
        )
    w = Window.partitionBy("_dom").orderBy(order, F.col(id_col))
    capped = (
        with_dom.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_domain)
        .drop("_rn")
    )
    return capped.unionByName(tagged.filter(F.col("_dom").isNull())).drop("_dom")


def domain_profile(
    docs: DataFrame,
    url_col: str = "uri",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Per-registered-domain corpus shares — the before/after view for
    ``domain_cap`` decisions (the URL-keyed sibling of
    ``training.domain_mix``).  One map-side-combined aggregate; the
    corpus total comes from a second one-row aggregate broadcast onto
    the per-domain table — NOT an unpartitioned window, which would
    funnel every per-domain row (a web crawl has 10⁷–10⁸ registered
    domains) through one task.
    Output: (domain, n_docs, doc_share), unparsable URLs under NULL."""
    per = (
        with_registered_domain(docs, url_col, "domain", extra_suffixes)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = per.agg(F.sum("n_docs").alias("_tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        F.round(F.col("n_docs") / F.col("_tot"), 6).alias("doc_share"),
    )
