"""Host-level link graph over crawled HTML — outlink extraction, degree
profiles, and PageRank-style host authority.

A web-scale corpus pipeline uses the link graph in two places: spam/SEO
demotion (host authority as a quality prior — low-authority link farms get
down-weighted before any text model runs) and crawl-frontier/host-cap
policy (in-degree as a popularity proxy). soda-core has no graph surface
(SURVEY §2.5); the public analogues are Common Crawl's host-level webgraph
releases and the classic PageRank-over-Spark formulation.

Scale shape:

* outlink extraction is ONE ``regexp_extract_all`` + ``explode`` — pure
  JVM, no Python, fuses with the scan;
* the edge list aggregates to (src_host, dst_host) — hosts, not pages, so
  the graph is ~4 orders of magnitude smaller than the page graph before
  any iteration touches it;
* PageRank iterates rank-join-aggregate on the host graph with
  RELIABLE checkpoint lineage truncation per round (same discipline as
  connected components, operators/dedup.py — localCheckpoint retains
  the physical chain and decays into exponential recompute) — work
  stays O(1) per round instead of nesting.

Every regex stays in the Java/RE2 common subset and the arithmetic is
plain double algebra, so a DuckDB oracle replays extraction, degrees, and
unrolled PageRank iterations verbatim (q62/q63).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from soda_core_spark.operators.urls import url_host_col

#: href values of <a> tags, attribute double-quoted (the overwhelmingly
#: dominant form in real markup; single-quoted/bare attrs are a documented
#: non-goal of the regex extractor — a full parser is the upgrade path).
HREF_PATTERN = r'<a\s[^>]*href="([^"]+)"'


def outlink_hosts(
    df: DataFrame,
    html_col: str = "html",
    src_host: Column | None = None,
    url_col: str = "url",
) -> DataFrame:
    """One row per (src_host, dst_host) LINK occurrence: extract every
    double-quoted ``<a href>`` value, resolve http(s) and
    protocol-relative links to their host, and attribute path-relative
    links (``/about``, ``page.html``, ``#frag``, ``?q=``) to the source
    host itself (self-edge — how host-level graphs model internal
    navigation). Links with any OTHER scheme (``mailto:``,
    ``javascript:``, ``ftp://``, ...) are dropped — host graphs are
    http-only. ``src_host`` defaults to the host of ``url_col``.
    Rows with an unresolvable source or destination host are dropped.
    """
    if src_host is None:
        src_host = url_host_col(F.col(url_col))
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit(HREF_PATTERN), F.lit(1)
    )
    e = df.select(
        src_host.alias("src_host"), F.explode(hrefs).alias("href")
    ).where(F.col("src_host").isNotNull())
    dst = resolve_dst_host(F.col("href"), F.col("src_host"))
    return (
        e.select("src_host", dst.alias("dst_host"))
        .where(F.col("dst_host").isNotNull())
    )


def resolve_dst_host(href: Column, src_host: Column) -> Column:
    """Destination host of one href: http(s) and protocol-relative
    links resolve through the URL parser, path-relative links resolve
    to the source host (self-edge), any other scheme → NULL."""
    is_http = href.rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://")
    has_scheme = href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    is_proto_rel = href.startswith("//")
    return (
        F.when(is_http, url_host_col(href))
        .when(is_proto_rel, url_host_col(F.concat(F.lit("http:"), href)))
        .when(~has_scheme, src_host)
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Collapse link occurrences to weighted host-graph edges
    (src_host, dst_host, n_links). One groupBy; map-side partial
    aggregation absorbs the heavy repetition (a host's internal links
    collapse within each task before the shuffle)."""
    return links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def host_degrees(edges: DataFrame) -> DataFrame:
    """Per-host degree profile from a weighted edge list: distinct out/in
    neighbors and summed out/in link counts. Two tiny aggregates over the
    host graph, full-outer-merged (a host may appear only as a source or
    only as a destination)."""
    out_d = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_hosts"),
        F.sum("n_links").cast("long").alias("out_links"),
    )
    in_d = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_hosts"),
        F.sum("n_links").cast("long").alias("in_links"),
    )
    z = F.lit(0).cast("long")
    return out_d.join(in_d, "host", "full_outer").select(
        "host",
        F.coalesce("out_hosts", z).alias("out_hosts"),
        F.coalesce("out_links", z).alias("out_links"),
        F.coalesce("in_hosts", z).alias("in_hosts"),
        F.coalesce("in_links", z).alias("in_links"),
    )


def host_pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    weighted: bool = True,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Host authority via the classic Spark PageRank formulation
    (Page et al. 1999; semantics of the canonical Spark example):
    rank starts at 1.0 per host and iterates

        rank'(v) = (1 - d) + d * Σ_{u→v} rank(u) * w(u→v)

    with w = n_links(u→v) / Σ n_links(u→*) when ``weighted`` (link-count
    proportional) else 1/outdeg(u). Dangling hosts keep the baseline
    (1 - d) and their mass leaks — the standard simplification; the
    normalized-with-redistribution variant is a drop-in replacement and
    changes only the per-iteration tail below.

    Scale shape: the edge+weight frame is computed once and persisted
    for the iterations, then unpersisted before return (result is
    checkpointed at host grain first — no leaked executor cache);
    each iteration is one join + one groupBy on the host graph; ranks are
    reliably checkpointed every ``checkpoint_every`` rounds so the plan
    AND the physical lineage stay bounded at high iteration counts (the
    connected-components discipline). Ranks round to 12dp each iteration — drift
    from shuffle-order float summation stays quantized away, so the
    trajectory is reproducible across partitionings AND engines (the
    DuckDB oracle unrolls the same iterations).
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    if weighted:
        tot = edges.groupBy("src_host").agg(
            F.sum("n_links").cast("double").alias("__out_total")
        )
        w = edges.join(tot, "src_host").select(
            "src_host",
            "dst_host",
            (F.col("n_links") / F.col("__out_total")).alias("w"),
        )
    else:
        outd = edges.groupBy("src_host").agg(
            F.count(F.lit(1)).cast("double").alias("__outdeg")
        )
        w = edges.join(outd, "src_host").select(
            "src_host", "dst_host", (F.lit(1.0) / F.col("__outdeg")).alias("w")
        )
    w = w.persist()
    ranks = nodes.select("host", F.lit(1.0).alias("rank"))
    d = float(damping)
    for i in range(iterations):
        contrib = (
            w.join(ranks, w.src_host == ranks.host)
            .select("dst_host", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst_host")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes.host == contrib.dst_host, "left"
        ).select(
            "host",
            F.round(
                F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("c"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # RELIABLE checkpoint — localCheckpoint retains the physical
            # lineage as a recompute fallback, and ContextCleaner eviction
            # then turns later iterations into exponential recompute (the
            # measured connected_components failure mode, operators/
            # dedup.py) — reliable checkpoint() severs the chain for real
            from soda_core_spark.operators.dedup import _reliable_checkpoint

            ranks = _reliable_checkpoint(ranks)
    from soda_core_spark.operators.dedup import _reliable_checkpoint

    # same lifecycle as host_hits: checkpoint the tiny host-grain result
    # so the persisted weight frame can be released here, not leaked
    ranks = _reliable_checkpoint(ranks)
    w.unpersist()
    return ranks


#: href + inner text of <a> elements: group 1 = href, group 2 = anchor
#: text (may contain inline markup — cleaned by frag_text downstream).
ANCHOR_HREF_TEXT_PATTERN = r'(?is)<a\s[^>]*href="([^"]+)"[^>]*>(.*?)</a\s*>'


def host_anchor_texts(
    df: DataFrame,
    html_col: str = "html",
    src_host: Column | None = None,
    url_col: str = "url",
    external_only: bool = True,
) -> DataFrame:
    """One row per (dst_host, anchor_text) link occurrence — the
    classic document-augmentation / ranking signal: the anchors OTHER
    pages use to link to a host describe it better than its own markup
    (the original PageRank-era insight; used for query expansion and
    crawl-frontier labeling).

    href and inner text come from the SAME pattern via two
    ``regexp_extract_all`` group extractions zipped positionally (match
    order is shared, so the zip is exact); inner markup is stripped and
    entities decoded by the extraction chain's fragment rules. Pure JVM
    until the one explode; empty anchors (image links) drop.

    ``external_only`` (default) keeps only cross-host anchors —
    internal navigation ("Home", "next page") is noise for the
    augmentation use case; pass False to keep self-links too.
    """
    from soda_core_spark.operators.justext import frag_text

    if src_host is None:
        src_host = url_host_col(F.col(url_col))
    h = F.col(html_col)
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(ANCHOR_HREF_TEXT_PATTERN), F.lit(1)).alias(
            "href"
        ),
        F.regexp_extract_all(h, F.lit(ANCHOR_HREF_TEXT_PATTERN), F.lit(2)).alias(
            "raw"
        ),
    )
    e = df.select(
        src_host.alias("src_host"), F.explode(pairs).alias("p")
    ).where(F.col("src_host").isNotNull())
    dst = resolve_dst_host(F.col("p.href"), F.col("src_host"))
    out = e.select(
        "src_host",
        dst.alias("dst_host"),
        frag_text(F.col("p.raw")).alias("anchor_text"),
    ).where(F.col("dst_host").isNotNull() & (F.col("anchor_text") != ""))
    if external_only:
        out = out.where(F.col("dst_host") != F.col("src_host"))
    return out.drop("src_host")


def top_host_anchors(anchors: DataFrame, k: int = 5) -> DataFrame:
    """Per-host top-k anchor texts: ``(dst_host, anchor_text, n,
    rank)``. The groupBy collapses occurrences to distinct texts with
    map-side partial aggregation BEFORE the rank window, so the window
    input is one row per (host, distinct text) — orders of magnitude
    smaller than the link stream. A host with pathologically many
    distinct anchor texts is the same skew case as the per-host corpus
    cap; its exact two-stage top-k (operators/dedup.py per_host_cap)
    drops in unchanged if profiling shows one."""
    from pyspark.sql import Window

    counts = anchors.groupBy("dst_host", "anchor_text").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n").desc(), F.col("anchor_text")
    )
    return counts.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= int(k))


def host_hits(
    edges: DataFrame,
    iterations: int = 3,
    weighted: bool = True,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Hub/authority scores via HITS (Kleinberg 1999) over the weighted
    host graph — the complementary prior to :func:`host_pagerank`:
    PageRank finds globally-endorsed hosts, HITS separates *directories/
    aggregators* (high hub — they link to many good authorities) from
    *content hosts* (high authority — linked by many good hubs). Link
    farms score high on one axis but not both, so the (hub, authority)
    pair is a stronger spam feature than either alone.

    Per iteration (mutual recursion, hubs seeded at 1.0):

        auth'(v) = Σ_{u→v} hub(u)·w(u→v)   then  auth'' = auth' / max(auth')
        hub'(u)  = Σ_{u→v} auth''(v)·w(u→v) then  hub''  = hub'  / max(hub')

    with w = n_links / Σ n_links per source when ``weighted`` else 1.
    Max-normalization (not the textbook L2) is deliberate: ``max`` over a
    double set is exact under ANY summation/partition order, so the only
    order-sensitive step is the per-node Σ — quantized away by the same
    12 dp per-step rounding the PageRank trajectory uses. The q108 DuckDB
    oracle unrolls identical iterations and matches bit-for-bit.

    Scale shape: the weight frame is computed once and persisted for the
    duration of the iterations, then unpersisted before return (the
    result is checkpointed at host grain first, so the returned frame
    carries no dependency on the cache — no leaked executor memory); each
    iteration is two (join + groupBy) passes over the HOST graph plus two
    1-row max aggregates broadcast back (no global sort, no collect);
    reliable checkpoints every ``checkpoint_every`` rounds bound lineage
    exactly as in :func:`host_pagerank` / connected components — but the
    default here is EVERY round, not every 5: each HITS round references
    the previous frame from two join sides plus a max aggregate, so the
    un-truncated plan tree grows ~4× per round (measured: a 3-round
    3-join-deep plan OOM'd a 1 GiB driver during planning; checkpointed,
    the same job runs in seconds). The checkpoint is host-grain — tiny
    relative to any corpus.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    if weighted:
        tot = edges.groupBy("src_host").agg(
            F.sum("n_links").cast("double").alias("__out_total")
        )
        w = edges.join(tot, "src_host").select(
            "src_host",
            "dst_host",
            (F.col("n_links") / F.col("__out_total")).alias("w"),
        )
    else:
        w = edges.select("src_host", "dst_host", F.lit(1.0).alias("w"))
    w = w.persist()

    def _max_normalized(df: DataFrame, col: str) -> DataFrame:
        # 1-row aggregate, broadcast back — max is summation-order exact
        m = df.agg(F.max(col).alias("__m"))
        return df.crossJoin(F.broadcast(m)).select(
            "host",
            F.round(
                F.when(F.col("__m") > 0, F.col(col) / F.col("__m")).otherwise(
                    F.lit(0.0)
                ),
                12,
            ).alias(col),
        )

    hubs = nodes.select("host", F.lit(1.0).alias("hub"))
    auths = None
    for i in range(iterations):
        a_c = (
            w.join(hubs, w.src_host == hubs.host)
            .select("dst_host", (F.col("hub") * F.col("w")).alias("c"))
            .groupBy("dst_host")
            .agg(F.sum("c").alias("c"))
        )
        auths = nodes.join(
            a_c, nodes.host == a_c.dst_host, "left"
        ).select(
            "host",
            F.round(F.coalesce(F.col("c"), F.lit(0.0)), 12).alias("authority"),
        )
        auths = _max_normalized(auths, "authority")
        h_c = (
            w.join(auths, w.dst_host == auths.host)
            .select("src_host", (F.col("authority") * F.col("w")).alias("c"))
            .groupBy("src_host")
            .agg(F.sum("c").alias("c"))
        )
        hubs = nodes.join(h_c, nodes.host == h_c.src_host, "left").select(
            "host",
            F.round(F.coalesce(F.col("c"), F.lit(0.0)), 12).alias("hub"),
        )
        hubs = _max_normalized(hubs, "hub")
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            from soda_core_spark.operators.dedup import _reliable_checkpoint

            hubs = _reliable_checkpoint(hubs)
            auths = _reliable_checkpoint(auths)
    from soda_core_spark.operators.dedup import _reliable_checkpoint

    # materialize the final host-grain frame (tiny) so the persisted
    # weight scaffold can be released HERE instead of leaking to the
    # caller — the returned frame no longer references `w`
    out = _reliable_checkpoint(auths.join(hubs, "host"))
    w.unpersist()
    return out


def undirected_host_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list from weighted directed host
    edges: self-loops dropped, endpoints ordered (u < v), duplicates
    collapsed. The shared base of the triangle / assortativity
    diagnostics. One distinct on the (already host-grain) edge
    table."""
    e = edges.where(F.col("src_host") != F.col("dst_host"))
    return e.select(
        F.least("src_host", "dst_host").alias("u"),
        F.greatest("src_host", "dst_host").alias("v"),
    ).distinct()


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering (transitivity) of the
    undirected host graph — the community-density fingerprint: organic
    web neighborhoods close triangles, link farms and ring schemes
    show extreme transitivity (near 0 or near 1) for their size.

    ONE row::

        n_nodes, n_edges, n_wedges, n_triangles: bigint,
        transitivity: double (6 dp)  -- 3·T / wedges, NULL when no
                                        wedge

    Algorithm: degree-ordered orientation (each undirected edge points
    from the (degree, name)-smaller endpoint to the larger), then
    wedge join + closing-edge semi-join — every triangle is counted
    exactly ONCE at its smallest-degree apex, and per-node join
    fan-out is bounded by the ORIENTED out-degree ≤ O(√|E|), the
    standard MapReduce triangle bound (Suri & Vassilvitskii, WWW'11).
    Scale: two joins on host keys over the host-grain edge table —
    never page-grain."""
    und = undirected_host_edges(edges)
    deg = (
        und.select(F.col("u").alias("h"))
        .unionAll(und.select(F.col("v").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("h").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("h").alias("v"), F.col("d").alias("dv"))
    keyed = und.join(du, "u").join(dv, "v")
    # orient: smaller (degree, name) -> larger
    fwd = F.col("du") < F.col("dv")
    tie = (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    oriented = keyed.select(
        F.when(fwd | tie, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd | tie, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1 = oriented.select(F.col("a"), F.col("b"))
    e2 = oriented.select(
        F.col("a").alias("b"), F.col("b").alias("c")
    )
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = oriented.select(
        F.col("a"), F.col("b").alias("c")
    )
    tri = wedges.join(closing, ["a", "c"], "left_semi")
    counts = und.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).crossJoin(
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long")
            .alias("n_wedges"),
        )
    ).crossJoin(
        tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return counts.select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ),
            6,
        ).alias("transitivity"),
    )


def edge_reciprocity(edges: DataFrame) -> DataFrame:
    """Reciprocity of the directed host graph: the share of non-loop
    directed edges whose reverse edge also exists — organic linking is
    partially mutual, scraper/mirror rings are near-fully mutual, and
    pure spam-target patterns are near-zero. ONE self-join on the
    host-grain edge table.

    ONE row::

        n_edges: bigint, n_reciprocal: bigint,
        reciprocity: double (6 dp) -- NULL when no edges
    """
    e = edges.where(F.col("src_host") != F.col("dst_host")).select(
        "src_host", "dst_host"
    )
    rev = e.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
    )
    mutual = e.join(rev, ["src_host", "dst_host"], "left_semi")
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    ).crossJoin(
        mutual.agg(
            F.count(F.lit(1)).cast("long").alias("n_reciprocal")
        )
    ).select(
        "n_edges", "n_reciprocal",
        F.round(
            F.when(
                F.col("n_edges") > 0,
                F.col("n_reciprocal").cast("double") / F.col("n_edges"),
            ),
            6,
        ).alias("reciprocity"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman degree assortativity of the undirected host graph:
    Pearson correlation of endpoint degrees over the edge list (each
    edge counted in both directions). Social/organic webs are mildly
    disassortative (hubs link to leaves, r < 0); r near +1 flags a
    stratified link scheme where same-size hosts exchange links.

    ONE row::

        n_nodes, n_edges: bigint, assortativity: double (6 dp)
            -- NULL when degenerate (all degrees equal or < 2 edges)

    Determinism: degree sums are exact integers; the correlation is
    the q177 six-sums expression over those integers — identical
    doubles on both engines. Scale: degrees via one groupBy, two
    broadcast-or-key joins to pin endpoint degrees, one fused sum."""
    und = undirected_host_edges(edges)
    deg = (
        und.select(F.col("u").alias("h"))
        .unionAll(und.select(F.col("v").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # double the edge list so each edge contributes (dj,dk) and (dk,dj)
    both = und.unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    dj = deg.select(F.col("h").alias("u"), F.col("d").alias("dj"))
    dk = deg.select(F.col("h").alias("v"), F.col("d").alias("dk"))
    pairs = both.join(dj, "u").join(dk, "v")
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("dj").cast("long").alias("sj"),
        F.sum("dk").cast("long").alias("sk"),
        F.sum(F.col("dj") * F.col("dk")).cast("long").alias("sjk"),
        F.sum(F.col("dj") * F.col("dj")).cast("long").alias("sjj"),
        F.sum(F.col("dk") * F.col("dk")).cast("long").alias("skk"),
    ).crossJoin(
        und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    ).crossJoin(
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    n = F.col("m2").cast("double")
    vx = n * F.col("sjj") - F.col("sj") * F.col("sj")
    vy = n * F.col("skk") - F.col("sk") * F.col("sk")
    num = n * F.col("sjk") - F.col("sj") * F.col("sk")
    return s.select(
        "n_nodes", "n_edges",
        F.round(
            F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy)), 6
        ).alias("assortativity"),
    )
