"""Crawl-graph analysis: hyperlink extraction, the host/domain graph,
distributed PageRank, and the domain quality prior — the web-graph
signal serious crawl curation runs BEFORE content scoring (Common
Crawl publishes exactly this as its host- and domain-level ranking;
RefinedWeb/CCNet-style pipelines consume it as a per-domain prior).

Where this sits in the ladder: ``extract_links`` pulls hrefs out of
the raw WARC response bodies (the HTML the text ladder is about to
throw away carries the graph), ``host_graph`` collapses page links to
weighted registered-domain edges, ``pagerank`` turns the graph into a
stationary importance score, and ``with_domain_rank`` joins that score
back onto any documents frame as a prior column for the quality gates
(low-rank link-farm domains get down-weighted before a single token is
scored).

Scale shape, stated up front:

- link extraction and URL resolution are pure JVM regexp/string
  expressions over the payload column — map-only, no Python;
- the host graph is ONE hash aggregate (page edges -> weighted domain
  edges) — the web's 10^10 page links collapse to ~10^8 domain edges,
  which is the grain everything downstream runs at;
- PageRank is the classic synchronous power iteration: per round, one
  equi-join of the (pre-normalized, cached) edge table with the rank
  table on the source key + one hash aggregate on the destination key.
  Both sides hash-partition on the join key — no broadcast of anything
  rank-sized, no collect of anything graph-sized.  The only driver-side
  values are two SCALARS per round (the dangling mass and the L1
  delta), which is how every published Spark/Pregel PageRank runs.
  Lineage is cut every ``checkpoint_every`` rounds — an iterative
  DataFrame loop otherwise re-plans a growing DAG (documented Spark
  iterative-algorithm practice): ``localCheckpoint`` by default,
  reliable ``checkpoint()`` when ``checkpoint_dir=`` is set (the
  cluster mode — executor loss no longer kills the iteration), and
  superseded checkpoint storage is released at each cut either way.

Weighted edges: a domain linking another domain 10k times counts 10k
(or pass ``weight=None`` after pre-deduping for the unweighted form) —
shares are normalized per source so each source distributes exactly
its rank.  Dangling nodes (no out-edges) redistribute uniformly, the
standard Page et al. correction, computed as ``1 - Σ contribs`` (one
scalar aggregate — no anti-join).

Reference parity note: the reference app has no graph surface at all
(`app/routes.py` serves CRUD over per-symbol frames); this family is
part of the beyond-reference training-data-pipeline charter.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_financial_data_pipeline_spark.operators.urls import (
    with_registered_domain,
)

_log = logging.getLogger(__name__)

#: href extraction: the value of the first href attribute of each <a>
#: tag, fragment-only targets excluded at the match.  Two passes —
#: quoted (both quote styles) and UNQUOTED (``href=foo``, legal HTML
#: and common in old crawl data; value runs to whitespace/``>``/a
#: quote, the HTML5 unquoted-attribute charset).  The attribute-scan
#: prefix is QUOTE-AWARE — it consumes quoted attribute values
#: atomically (``"[^"]*"`` / ``'[^']*'``) so the scan can never stop
#: INSIDE one and read e.g. ``title="see href=foo"`` as a link — and
#: the lookbehind pins ``href`` to an attribute boundary
#: (whitespace or a closing quote), so ``data-href=...`` is not an
#: href.  The unquoted pattern's first value char excludes quotes, so
#: for an anchor with a single href attribute exactly one pass
#: matches; an anchor carrying DUPLICATE href attributes of mixed
#: styles (pathological markup) can still emit one edge per style —
#: the domain-grain graph tolerates the extra weight.
_ATTR_PREFIX = r"""(?:[^>"']|"[^"]*"|'[^']*')*?(?<=[\s"'])"""
_HREF_RE = (
    r"(?is)<a\s" + _ATTR_PREFIX + r"""href\s*=\s*["']([^"'#][^"']*)["']"""
)
_HREF_UNQUOTED_RE = (
    r"(?is)<a\s" + _ATTR_PREFIX + r"""href\s*=\s*([^\s"'<>`#][^\s"'<>`]*)"""
)

#: scheme-prefixed but NON-hierarchical targets (mailto:, javascript:,
#: data:, tel:) — linkable, not crawlable; resolved to NULL.
_NON_HIER_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:(?!//)"
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def resolve_href(href: Column, base: Column) -> Column:
    """RFC-3986-lite reference resolution as pure JVM expressions:
    absolute refs pass through, ``//host/...`` inherits the base
    scheme, ``/path`` is root-relative, anything else is resolved
    against the base path's directory.  Non-hierarchical targets
    (mailto:, javascript:, data:) and refs with an unparsable base
    resolve to NULL — droppable, never aliased.  Dot-segment
    (``../``) normalization is NOT performed — a documented
    approximation: ``canonical_url`` downstream never merges two
    distinct spellings incorrectly because of it, it only fails to
    merge the rare dotted spelling with its clean twin (conservative
    for dedup, harmless for the domain-grain graph where only the
    host matters)."""
    scheme = F.lower(F.parse_url(base, F.lit("PROTOCOL")))
    authority = F.parse_url(base, F.lit("AUTHORITY"))
    base_dir = F.regexp_replace(
        F.coalesce(F.parse_url(base, F.lit("PATH")), F.lit("/")), r"[^/]*$", ""
    )
    root = F.concat(scheme, F.lit("://"), authority)
    return F.when(
        scheme.isNull() | authority.isNull(), F.lit(None).cast("string")
    ).when(
        href.rlike(_NON_HIER_RE), F.lit(None).cast("string")
    ).when(
        href.rlike(_ABS_RE), href
    ).when(
        href.startswith("//"), F.concat(scheme, F.lit(":"), href)
    ).when(
        href.startswith("/"), F.concat(root, href)
    ).otherwise(
        F.concat(root, base_dir, href)
    )


#: whole <a ...>inner</a> elements, for the anchor-text path (nested
#: anchors are illegal HTML, so non-greedy inner capture is exact).
_ANCHOR_ELEM_RE = r"(?is)<a\s[^>]*>.*?</a>"


def extract_links(
    pages: DataFrame,
    html_col: str = "payload",
    base_col: str = "uri",
    with_text: bool = False,
) -> DataFrame:
    """(src, dst) page-level link edges out of raw HTML — one
    ``regexp_extract_all`` + explode + the resolver above, all
    JVM-side.  Run it on the WARC response payloads BEFORE
    ``html_to_text`` throws the markup away (see ``warc_page_links``
    in ``sources/warc.py`` for the composed front door).  Unresolvable
    and fragment-only targets are dropped; one row per anchor
    occurrence (duplicates preserved — ``host_graph`` counts them as
    weight).  Quoted and unquoted href forms both extract (two
    regexp passes with a quote-aware attribute scan, disjoint per
    href attribute — see ``_HREF_RE`` for the one pathological
    duplicate-href carve-out); the graph is order-insensitive, so
    concatenating the two match arrays loses nothing.

    ``with_text=True`` adds an ``anchor_text`` column — what the
    LINKING page calls the target, the classic external-description
    signal (search engines index it; crawl curation uses aggregated
    anchor text as a target-page relevance/label source).  The inner
    HTML is reduced with the same ``html_to_text`` pass the document
    ladder uses (tag strip + entity decode + whitespace collapse), so
    ``<a href=x>Click <b>here</b></a>`` yields ``Click here``; an
    anchor with no text yields ``''``.  Still map-only JVM regexps,
    but a different extraction grain: whole ``<a ...>...</a>``
    elements, so anchors never closed (malformed markup) are skipped
    in this mode — a documented approximation the default edge-only
    path does not share.  Default stays the cheaper two-pass form."""
    if with_text:
        from real_time_financial_data_pipeline_spark.sources.warc import html_to_text

        elems = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_ELEM_RE), 0)
        exploded = pages.select(
            F.col(base_col).alias("src"), F.explode(elems).alias("_a")
        )
        quoted = F.regexp_extract("_a", _HREF_RE, 1)
        unquoted = F.regexp_extract("_a", _HREF_UNQUOTED_RE, 1)
        href = F.when(quoted != "", quoted).otherwise(unquoted)
        inner = F.regexp_extract("_a", r"(?is)<a\s[^>]*>(.*)</a>", 1)
        dst = resolve_href(href, F.col("src"))
        return (
            exploded.filter(href != "")
            .select(
                "src", dst.alias("dst"), html_to_text(inner).alias("anchor_text")
            )
            .filter(F.col("dst").isNotNull())
        )
    hrefs = F.concat(
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1),
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_UNQUOTED_RE), 1),
    )
    exploded = pages.select(
        F.col(base_col).alias("src"), F.explode(hrefs).alias("_href")
    )
    dst = resolve_href(F.col("_href"), F.col("src"))
    return exploded.select("src", dst.alias("dst")).filter(F.col("dst").isNotNull())


def host_graph(
    links: DataFrame,
    src: str = "src",
    dst: str = "dst",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Page links -> weighted registered-domain edges: (src_domain,
    dst_domain, weight = link count), self-edges dropped (intra-domain
    navigation is not endorsement — the PageRank convention), rows
    whose either side has no parseable domain dropped.  ONE hash
    aggregate; this is the collapse that makes the graph tractable —
    the domain grain is what Common Crawl ranks too."""
    staged = with_registered_domain(
        with_registered_domain(links, src, "src_domain", extra_suffixes),
        dst,
        "dst_domain",
        extra_suffixes,
    )
    return (
        staged.select("src_domain", "dst_domain")
        .filter(
            F.col("src_domain").isNotNull()
            & F.col("dst_domain").isNotNull()
            & (F.col("src_domain") != F.col("dst_domain"))
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _warn_release_drift(detail: str) -> None:
    """Warn ONCE per process when the checkpoint-release reach-through
    fails — without this signal, any Spark-internal drift would
    silently reinstate the storage ratchet the release path exists to
    fix (review-caught observability gap).  One warning, not one per
    round: a nightly job cutting every 5 iterations must not flood."""
    global _RELEASE_DRIFT_WARNED
    if not _RELEASE_DRIFT_WARNED:
        _RELEASE_DRIFT_WARNED = True
        _log.warning(
            "superseded-checkpoint release disabled for this session "
            "(Spark internal API drift?): %s — checkpoint storage of "
            "superseded iterates will accumulate until GC / session end",
            detail,
        )


_RELEASE_DRIFT_WARNED = False


def _checkpointed_jrdd(df: DataFrame):
    """The JVM RDD a checkpointed Dataset's ``LogicalRDD`` leaf wraps —
    the handle needed to release superseded checkpoint state (Spark's
    public API offers no way back from ``Dataset.checkpoint`` to the
    RDD it persisted).  Defensive: returns None (warning once) if the
    plan is not the expected leaf shape, and callers treat release as
    best-effort."""
    try:
        return df._jdf.queryExecution().logical().rdd()
    except Exception as exc:  # pragma: no cover - internal-API drift guard
        _warn_release_drift(f"logical-plan->RDD reach-through failed: {exc!r}")
        return None


def _release_checkpoint(df: DataFrame, reliable: bool) -> None:
    """Free a SUPERSEDED checkpoint's storage: unpersist the block-backed
    RDD (local mode) or delete the checkpoint files (reliable mode).
    Only call once a NEWER checkpoint is materialized — the released
    iterate becomes unrecoverable by design."""
    jrdd = _checkpointed_jrdd(df)
    if jrdd is None:
        return
    try:
        if reliable:
            f = jrdd.getCheckpointFile()
            if f.isDefined():
                jvm = df.sparkSession.sparkContext._jvm
                conf = df.sparkSession.sparkContext._jsc.hadoopConfiguration()
                p = jvm.org.apache.hadoop.fs.Path(f.get())
                p.getFileSystem(conf).delete(p, True)
        else:
            jrdd.unpersist(False)
    except Exception as exc:  # pragma: no cover - release is best-effort
        _warn_release_drift(f"release of superseded checkpoint failed: {exc!r}")


def pagerank(
    edges: DataFrame,
    src: str = "src_domain",
    dst: str = "dst_domain",
    weight: str | None = "weight",
    d: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    checkpoint_every: int = 5,
    require_convergence: bool = False,
    init_ranks: DataFrame | None = None,
    stats: dict | None = None,
    checkpoint_dir: str | None = None,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Distributed PageRank over a weighted directed edge table —
    returns (node, rank) with Σ rank = 1 (up to float accumulation).

    Synchronous power iteration on the row-normalized transition
    matrix with uniform teleport (damping ``d``) and uniform dangling
    redistribution:

        rank' = (1-d)/N + d * (Mᵀ rank + dangling_mass/N)

    Per round: one shuffled hash join (edge shares × source ranks) +
    one hash aggregate (sum per destination) + two scalar actions
    (the dangling mass, derived as ``1 - Σ contribs`` so no anti-join
    runs in the loop, and — when ``tol`` is set — the L1 delta for
    early stop).  ``tol=None`` skips the delta action entirely and
    runs exactly ``max_iter`` rounds (one action fewer per round — the
    fixed-budget production mode).  ``require_convergence=True``
    raises if ``tol`` is set and never reached (the connected-
    components fail-fast convention); the default returns the
    ``max_iter`` iterate, which is the textbook fixed-budget estimate.

    The edge-share table (weight normalized per source) is computed
    once, hash-partitioned on the source key and cached — every
    iteration reuses the same layout, so only the (small) rank table
    moves.  Power iteration converges at rate d^k regardless of graph
    shape (the Perron eigenvalue gap of the damped walk), so 20–50
    rounds is the whole story even at 10^8 nodes — there is no
    pathological-diameter blowup to guard against, unlike label
    propagation.

    ``init_ranks`` warm-starts the iteration from a previous (node,
    rank) snapshot — the NIGHTLY INCREMENTAL form: merge tonight's
    edges into the persisted graph (``merge_host_graphs``), re-rank
    from yesterday's fixpoint.  The damped walk has a UNIQUE stationary
    distribution, so the warm fixpoint equals the cold one to ``tol``
    — the warm start only changes how fast you get there (a nightly
    edge delta moves the fixpoint a little, so the old iterate is
    already close and convergence needs a handful of rounds, not
    20–50; test-pinned).  Unseen nodes enter at the uniform floor and
    the vector is renormalized to sum 1 before iterating.

    ``teleport`` switches to PERSONALIZED PageRank — the TrustRank
    form (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) crawl curation
    uses to propagate trust from a hand-audited seed set: a (node,
    weight) frame replaces the uniform restart vector, so both the
    (1-d) teleport and the dangling redistribution flow to the seeds
    (normalized over the seeds present in the graph; duplicates sum;
    negative weights and seed sets disjoint from the graph fail fast).
    Nodes unreachable from the seed set get rank EXACTLY 0 — the
    property that makes the score a trust prior rather than a
    popularity prior (a link farm no trusted domain points at scores
    zero no matter how densely it links itself).  The default
    ``teleport=None`` is the uniform vector, i.e. classic PageRank.

    ``stats``, when a dict is passed, is filled in place with
    ``n_iter`` / ``converged`` / ``delta`` — the monitoring hook the
    nightly job logs (out-param so the return type stays a plain
    DataFrame).

    Lineage cuts and their storage: every ``checkpoint_every`` rounds
    the iterate is checkpointed, and the PREVIOUS checkpoint's storage
    is released as soon as the new one is materialized — a long session
    re-ranking many slices must not ratchet up superseded checkpoint
    blocks waiting for JVM GC.  By default the cut is
    ``localCheckpoint`` (executor-local blocks — fast, but an executor
    loss mid-iteration kills the job).  Pass ``checkpoint_dir`` to use
    RELIABLE ``checkpoint()`` into that directory instead: the iterate
    survives executor loss at the cost of a filesystem write per cut —
    the right mode on a real cluster ranking the full crawl graph.
    Superseded reliable checkpoint files are deleted the same way; the
    final iterate's files remain until the caller removes the
    directory.  ``checkpoint_dir`` necessarily goes through the
    session-global ``setCheckpointDir``; any previously-set directory
    is restored on exit (when none was set, ours remains — Spark has
    no unset API)."""
    if not 0 < d < 1:
        raise ValueError(f"damping d must be in (0, 1), got {d}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        if stats is not None:
            stats.update(n_iter=0, converged=True, delta=None)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_tot = edges.groupBy(F.col(src).alias("_src")).agg(F.sum(w).alias("_wout"))
    shares = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w"))
        .join(out_tot, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_wout")).alias("_share"))
        .repartition("_src")
        .cache()
    )
    shares.count()  # materialize once; every round reuses this layout
    # the restart vector t as a (node, _t) table the loop joins against:
    # uniform 1/n (classic), or the normalized seed weights (TrustRank).
    # The personalized base caches (it carries a join); the uniform base
    # is a projection off the already-cached nodes table — free.
    base_cached = teleport is not None
    if teleport is not None:
        # validate on the RAW frame, BEFORE the node join: a negative
        # weight on a seed absent from the graph must fail fast too
        # (review-caught — the post-join check silently dropped it),
        # and summed duplicates must not mask a negative component
        t_min = teleport.agg(F.min(F.col("weight").cast("double"))).first()[0]
        if t_min is not None and t_min < 0:
            raise ValueError(f"teleport weights must be >= 0, min was {t_min}")
        seeds = teleport.groupBy("node").agg(
            F.sum(F.col("weight").cast("double")).alias("_tw")
        )
        raw = nodes.join(seeds, "node", "left").select(
            "node", F.coalesce("_tw", F.lit(0.0)).alias("_t")
        )
        t_tot = raw.agg(F.sum("_t")).first()[0]
        if not t_tot or t_tot <= 0:
            raise ValueError(
                "teleport: no seed with positive weight appears in the graph "
                "— the restart vector would be zero"
            )
        base = raw.select("node", (F.col("_t") / F.lit(t_tot)).alias("_t")).cache()
        base.count()
    else:
        base = nodes.select("node", F.lit(1.0 / n).alias("_t"))
    # setCheckpointDir is SESSION-GLOBAL state; save the previous dir and
    # restore it after the run so a later caller's Dataset.checkpoint
    # does not silently inherit ours (review-caught).  Caveat, documented:
    # Spark offers no unset API, so when no dir was set before, ours
    # remains set afterwards; and the restore re-issues setCheckpointDir
    # on the RESOLVED previous path (Spark nests a fresh UUID subdir
    # under it), which keeps later checkpoints inside the caller's
    # original tree rather than ours.
    reliable = checkpoint_dir is not None
    prev_ck_dir = None
    if reliable:
        sc = edges.sparkSession.sparkContext
        prev_ck_dir = sc.getCheckpointDir()
        sc.setCheckpointDir(checkpoint_dir)
    live_ck = None  # the newest MATERIALIZED checkpoint backing `ranks`
    # try/finally so a Spark job failure mid-iteration (or any raise
    # between setCheckpointDir and here) still restores the caller's
    # checkpoint dir and releases the loop-only executor storage — an
    # unprotected raise would leave the session pointing at pagerank's
    # checkpoint directory, the exact leak the save/restore exists to fix
    # (review-caught).
    try:
        if init_ranks is not None:
            warm = nodes.join(
                init_ranks.select("node", F.col("rank").alias("_r0")), "node", "left"
            ).select("node", F.coalesce("_r0", F.lit(1.0 / n)).alias("rank"))
            tot = warm.agg(F.sum("rank")).first()[0] or 1.0
            r0 = warm.select("node", (F.col("rank") / F.lit(tot)).alias("rank"))
            # lineage-cut the init like any other round: the caller's
            # init_ranks is typically LAST NIGHT'S pagerank output, whose
            # logical plan is the whole previous iteration — without a cut
            # every warm round re-analyzes that plan inside its own
            # (measured ~8x wall on the per-round cost before the first
            # in-loop cut; caching alone does not truncate plans)
            r0 = r0.checkpoint(eager=False) if reliable else r0.localCheckpoint(
                eager=False
            )
            ranks = r0.cache()
            live_ck = ranks
        else:
            # cold start AT the restart vector — uniform for classic, the
            # seed distribution for personalized (the textbook choice; any
            # start converges to the same unique fixpoint)
            ranks = base.select("node", F.col("_t").alias("rank")).cache()
        converged = tol is None
        delta = None
        it = -1
        for it in range(max_iter):
            # cached BEFORE the scalar action: the dangling-mass aggregate
            # and the new-rank materialization are separate actions, and an
            # uncached contribs would re-run the round's join+aggregate twice
            contribs = (
                shares.join(ranks.withColumnRenamed("node", "_src"), "_src")
                .groupBy(F.col("_dst").alias("node"))
                .agg(F.sum(F.col("_share") * F.col("rank")).alias("_c"))
                .cache()
            )
            # Σ contribs = Σ rank over non-dangling sources; ranks sum to 1
            # by the update's own invariant, so the dangling mass is the gap
            c_tot = contribs.agg(F.sum("_c")).first()[0] or 0.0
            dangling = max(0.0, 1.0 - c_tot)
            # rank' = (1-d)·t + d·(Mᵀrank + dangling·t): both the teleport
            # and the dangling redistribution flow along the restart vector
            # (uniform t reduces this to the classic Page et al. update)
            new = (
                base.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(1.0 - d) * F.col("_t")
                        + F.lit(d)
                        * (
                            F.coalesce(F.col("_c"), F.lit(0.0))
                            + F.lit(dangling) * F.col("_t")
                        )
                    ).alias("rank"),
                )
            )
            cut = (it + 1) % checkpoint_every == 0
            if cut:
                new = (
                    new.checkpoint(eager=False)
                    if reliable
                    else new.localCheckpoint(eager=False)
                )
            new = new.cache()
            if tol is not None:
                delta = (
                    new.join(ranks.withColumnRenamed("rank", "_old"), "node")
                    .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))))
                    .first()[0]
                )
                contribs.unpersist()  # new is materialized; round scratch drops
                ranks.unpersist()
            else:
                new.count()  # materialize so the old cache can drop
                contribs.unpersist()
                ranks.unpersist()
            if cut:
                # the new checkpoint is materialized (the action above ran),
                # so the previous one is superseded: release its blocks/files
                # NOW rather than letting them ratchet until JVM GC — the
                # long-session leak the review caught.  Everything still
                # referenced (the cached `new`) recomputes from the new
                # checkpoint, never the released one.
                if live_ck is not None:
                    _release_checkpoint(live_ck, reliable)
                live_ck = new
            ranks = new
            if tol is not None and delta is not None and delta < tol:
                converged = True
                break
    finally:
        # the final iterate is materialized (cached + acted on every round),
        # so the loop-only tables can release their executor storage now —
        # a nightly job re-ranking many slices must not ratchet up caches
        shares.unpersist()
        nodes.unpersist()
        if base_cached:
            base.unpersist()
        if reliable and prev_ck_dir is not None:
            sc.setCheckpointDir(prev_ck_dir)
    if stats is not None:
        stats.update(n_iter=it + 1, converged=converged, delta=delta)
    if require_convergence and not converged:
        raise RuntimeError(
            f"pagerank: tol={tol} not reached within max_iter={max_iter} "
            f"(power iteration contracts at d^k = {d}^k — raise max_iter)"
        )
    return ranks.select("node", "rank")


def merge_host_graphs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two weighted domain-edge tables, summing weights — the
    nightly incremental step: fold tonight's crawl slice's
    ``host_graph`` into the persisted graph, then re-rank warm-started
    from the previous snapshot (``pagerank(init_ranks=...)``).  One
    hash aggregate; weight addition is associative/commutative, so
    folding slices in any order equals one ``host_graph`` over the
    union of all links (test-pinned)."""
    return (
        a.unionByName(b)
        .groupBy("src_domain", "dst_domain")
        .agg(F.sum("weight").alias("weight"))
    )


def with_domain_rank(
    docs: DataFrame,
    ranks: DataFrame,
    url_col: str = "uri",
    rank_col: str = "domain_rank",
    extra_suffixes: tuple[str, ...] = (),
    fill: float | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """Join the PageRank prior back onto a documents frame by
    registered domain — the per-document quality prior the content
    gates consume (down-weight link-farm domains before scoring a
    single token).  Docs whose domain is absent from the rank table
    (or whose URL does not parse) get ``fill`` (default NULL — let the
    caller decide whether unknown means suspect).

    Join strategy (``broadcast``): the rank table is a per-domain
    aggregate — usually orders of magnitude smaller than the doc table
    — but "smaller" is not "small": a full crawl graph has ~10^8
    registered domains, multiple GB as a broadcast, past the 8 GB
    absolute broadcast ceiling and enough to OOM an executor.  So the
    hint is SIZE-GATED, never forced blind:

    - ``None`` (default): no forced hint — Catalyst/AQE pick a
      broadcast when the rank table's ACTUAL runtime size clears
      ``spark.sql.autoBroadcastJoinThreshold`` (AQE re-plans on real
      stats, the most reliable size gate there is), and a shuffled
      join otherwise;
    - ``True``: force ``F.broadcast`` — the caller asserts the rank
      table fits (e.g. a curated-domain subset);
    - ``False``: force a SHUFFLED HASH join (``shuffle_hash`` hint —
      one partitioned hash build, no sort of the doc table) — the
      rank-table-too-big mode at full crawl scale.

    Either way the join stays keyed on the domain — no product shape
    (plan-audited both ways in tests)."""
    keyed = ranks.select(
        F.col("node").alias("_rank_dom"), F.col("rank").alias(rank_col)
    )
    if broadcast is True:
        keyed = F.broadcast(keyed)
    elif broadcast is False:
        keyed = keyed.hint("shuffle_hash")
    joined = with_registered_domain(
        docs, url_col, "_rank_dom", extra_suffixes
    ).join(keyed, "_rank_dom", "left")
    if fill is not None:
        joined = joined.withColumn(rank_col, F.coalesce(F.col(rank_col), F.lit(fill)))
    return joined.drop("_rank_dom")


def anchor_profile(
    links: DataFrame,
    dst_col: str = "dst",
    text_col: str = "anchor_text",
    k: int = 5,
    extra_suffixes: tuple[str, ...] = (),
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-k anchor terms per TARGET registered domain — "what the web
    calls this page", the classic external-description signal (anchor
    text is the one quality feature the linked page cannot write for
    itself; search engines have indexed it since PageRank's own paper,
    and crawl curation uses the aggregate as a relevance/label source).
    Consumes the ``extract_links(with_text=True)`` surface: (dst,
    anchor_text) link rows in, (dst_domain, term, n, rank) out, rank
    1..k per domain by term frequency with ties broken on term order
    (fully deterministic).

    Scale shape is ``top_terms``'s (operators/text.py): tokenize +
    explode run in the scan stage, the ONLY shuffle carries (domain,
    term, partial count) with map-side combine — bounded by domain
    count x vocabulary, not by link count, which is what survives a
    full-crawl link table.  Rows whose target has no parseable
    registered domain are dropped (same rule as ``host_graph``);
    stopwords default to the corpus list (pass ``[]`` to keep all)."""
    from .text import top_terms

    frame = (
        with_registered_domain(links, dst_col, "dst_domain", extra_suffixes)
        .select("dst_domain", F.col(text_col).alias("_anchor"))
        .filter(F.col("dst_domain").isNotNull())
    )
    return top_terms(
        frame, text_col="_anchor", group_col="dst_domain", k=k,
        stopwords=stopwords,
    )


def anchor_term_counts(
    links: DataFrame,
    dst_col: str = "dst",
    text_col: str = "anchor_text",
    extra_suffixes: tuple[str, ...] = (),
    stopwords: list[str] | None = None,
) -> DataFrame:
    """The MERGEABLE form of :func:`anchor_profile`: the full
    ``(dst_domain, term, n)`` anchor-term count table — the artifact a
    nightly crawl actually persists.  A top-k profile does not compose
    across slices (merging top-ks is lossy: tonight's #6 term may be
    the all-time #3), but counts are associative, so the incremental
    posture is: persist tonight's slice's count table, fold it into the
    running table with ``text.merge_term_counts`` (one hash aggregate,
    the ``merge_host_graphs`` shape), and derive the serving top-k with
    :func:`profile_from_counts` — fold ≡ one anchor_profile over the
    union of all links, test-pinned.  Same scan shape as
    anchor_profile: the only shuffle is domains x vocabulary bounded."""
    from .text import term_counts

    frame = (
        with_registered_domain(links, dst_col, "dst_domain", extra_suffixes)
        .select("dst_domain", F.col(text_col).alias("_anchor"))
        .filter(F.col("dst_domain").isNotNull())
    )
    return term_counts(
        frame, text_col="_anchor", group_col="dst_domain", stopwords=stopwords
    )


def profile_from_counts(counts: DataFrame, k: int = 5) -> DataFrame:
    """Serving top-k over an :func:`anchor_term_counts` table — the read
    side of the nightly fold.  Output schema and tie rule are identical
    to :func:`anchor_profile`, so ``with_anchor_terms`` and the curation
    ladder's ``anchor_profile=`` knob consume either form."""
    from .text import rank_top_terms

    return rank_top_terms(counts, k, group_col="dst_domain")


def with_anchor_terms(
    docs: DataFrame,
    profile: DataFrame,
    url_col: str = "uri",
    out_col: str = "anchor_terms",
    extra_suffixes: tuple[str, ...] = (),
    broadcast: bool | None = None,
) -> DataFrame:
    """Join an ``anchor_profile`` back onto a documents frame by
    registered domain as ONE text feature column: the domain's top
    anchor terms, rank-ordered and space-joined (``out_col``; NULL for
    domains nobody links to or unparseable URLs).  This is the feature-
    table wiring that lets the web's description of a domain feed the
    trained quality classifier (append ``anchor_terms`` to the text the
    hashed featurizer sees) or serve as a human-auditable column next
    to ``with_domain_rank``'s prior.

    The profile collapses to one row per domain first (vocabulary-
    bounded aggregate, ``array_agg`` sorted by rank), so the join is a
    keyed left join against a per-domain table — same size story as
    ``with_domain_rank`` and the same three-way ``broadcast`` gate:
    ``None`` lets AQE pick on runtime size, ``True`` forces broadcast
    (curated subset), ``False`` forces a shuffled-hash join (full-crawl
    profile)."""
    collapsed = profile.groupBy(F.col("dst_domain").alias("_anchor_dom")).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rank"), F.col("term")))
                ),
                lambda s: s["term"],
            ),
            " ",
        ).alias(out_col)
    )
    if broadcast is True:
        collapsed = F.broadcast(collapsed)
    elif broadcast is False:
        collapsed = collapsed.hint("shuffle_hash")
    return (
        with_registered_domain(docs, url_col, "_anchor_dom", extra_suffixes)
        .join(collapsed, "_anchor_dom", "left")
        .drop("_anchor_dom")
    )
