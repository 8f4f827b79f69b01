"""URL canonicalization — the key-normalization step URL-level dedup
and per-host policy (blocklists, host caps) both depend on.

Two crawls of one page rarely present byte-identical URLs: scheme/host
case, default ports, fragments, and tracking parameters (utm_*,
fbclid, ...) all vary without changing the resource. Canonicalizing
before any URL-keyed operation (exact URL dedup, host caps, blocklist
probes) collapses those spurious distinctions.

The whole transform is pure column algebra over regexes and array
higher-order functions — zero shuffle, zero Python — and every regex
stays inside the Java/RE2 common subset so the DuckDB oracle (q55)
replays it verbatim. soda-core has no URL surface (SURVEY §2.5); the
closest public analogues are the WARC/CDX canonicalizers.

Steps (ordered, each mirrored in the oracle):
1. scheme + host lowercased; userinfo (``user:pass@``) dropped;
2. default port stripped (``:80`` for http, ``:443`` for https);
3. fragment (``#...``) dropped;
4. tracking params dropped: ``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``, ``ref_src``;
5. remaining query params sorted bytewise (param order is almost never
   semantic; sorting makes equal-resource URLs compare equal);
6. empty path → ``/``; empty query → no ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dropped query parameters (name match, case-sensitive — trackers are
#: emitted lowercase in practice)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=|$)"

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?([^/?#]*)([^?#]*)(?:\?([^#]*))?"


def canonical_url_col(url: Column) -> Column:
    """The canonical form as one Column expression; NULL for inputs
    that don't parse as absolute http(s)-style URLs."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path = F.regexp_extract(url, _URL_RE, 3)
    query = F.regexp_extract(url, _URL_RE, 4)

    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, 1, F.length(host) - 3),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, 1, F.length(host) - 4),
    ).otherwise(host)

    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")

    base = F.concat(scheme, F.lit("://"), host, path)
    out = F.when(q != "", F.concat(base, F.lit("?"), q)).otherwise(base)
    return F.when((scheme != "") & (host != ""), out)


def url_host_col(url: Column) -> Column:
    """Lowercased host (port and userinfo stripped) — the key for host
    caps / blocklists; NULL when unparseable."""
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host = F.regexp_replace(host, r":[0-9]+$", "")
    return F.when(host != "", host)


def with_canonical_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    host_col: str | None = "url_host",
) -> DataFrame:
    cols = {out_col: canonical_url_col(F.col(url_col))}
    if host_col:
        cols[host_col] = url_host_col(F.col(url_col))
    return df.withColumns(cols)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per canonical URL (min-id survivor) — the
    URL-keyed twin of exact_dedup: one hash shuffle on the canonical
    key, min_by aggregation, no window. Unparseable URLs are all kept
    (NULL keys never merge)."""
    tagged = df.withColumn("__cu", canonical_url_col(F.col(url_col)))
    surviv = (
        tagged.where(F.col("__cu").isNotNull())
        .groupBy("__cu")
        .agg(F.min(id_col).alias(id_col))
    )
    dupes = (
        tagged.where(F.col("__cu").isNotNull())
        .join(surviv.select(id_col), id_col, "left_anti")
        .select(id_col)
    )
    return df.join(dupes, id_col, "left_anti")


#: multi-label public suffixes (representative publicsuffix.org subset —
#: the full PSL is a data file swap: broadcast the set, logic unchanged).
#: Covers the ccTLD second-level registries a web crawl hits most.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = tuple(sorted({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.za", "com.mx", "com.ar", "com.tr", "com.sg", "com.hk",
    "co.kr", "or.kr", "com.tw", "co.id", "com.my", "com.ph",
    "com.pl", "com.ru", "com.ua",
}))


def registered_domain_col(host: Column) -> Column:
    """eTLD+1 (the "registered domain") from a lowercased host — the
    grain at which per-site policy actually applies: ``a.blog.co.uk``
    and ``b.blog.co.uk`` are one registrant, and host-level caps /
    reputation / dedup under-count a site that shards itself across
    subdomains. Pure column algebra over the label array (zero shuffle,
    zero Python): if the last TWO labels form a known multi-label public
    suffix the registered domain is the last THREE labels, else the last
    two; bare/1-label hosts pass through; NULL host → NULL. IP literals
    (IPv4 dotted-quad or bracketed/colon IPv6) pass through unchanged —
    an IP host has no registrant hierarchy, and truncating one to its
    last two octets would collapse unrelated hosts into one key.

    The suffix set is a representative publicsuffix.org subset carried
    as module data; for the full ~9k-entry PSL use
    :func:`with_registered_domain`, which switches to a broadcast join
    above a size threshold (same logic, no giant literal in the plan)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.contains(":")
    return (
        F.when(is_ip, host)
        .when((n >= 3) & last2.isin(list(MULTI_LABEL_SUFFIXES)), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def with_registered_domain(
    df: DataFrame,
    host_col: str,
    out_col: str = "registered_domain",
    suffixes: tuple[str, ...] | None = None,
    broadcast_threshold: int = 256,
) -> DataFrame:
    """DataFrame form of :func:`registered_domain_col` that scales to
    the FULL public-suffix list: at or below ``broadcast_threshold``
    entries the suffix set stays an ``isin`` literal (bit-identical to
    the column form — zero shuffle, zero extra plan nodes); above it
    the last-two-label key LEFT-joins a broadcast suffix table instead,
    so a ~9k-entry PSL never becomes a ~9k-branch literal in every
    task's generated code (plan size, codegen limits, and per-row
    linear literal scans all go away — the SemDeDup literal/broadcast
    pattern). Both paths produce identical values by construction: the
    join marks exactly the hosts whose last two labels are in the set,
    which is what ``isin`` tested. NULL hosts yield NULL; IP literals
    pass through (both paths share the guards)."""
    sufs = tuple(suffixes) if suffixes is not None else MULTI_LABEL_SUFFIXES
    host = F.col(host_col)
    if len(sufs) <= broadcast_threshold:
        labels = F.split(host, r"\.")
        n = F.size(labels)
        last2 = F.concat_ws(
            ".", F.element_at(labels, -2), F.element_at(labels, -1)
        )
        last3 = F.concat_ws(
            ".", F.element_at(labels, -3), F.element_at(labels, -2),
            F.element_at(labels, -1),
        )
        is_ip = (
            host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.contains(":")
        )
        return df.withColumn(
            out_col,
            F.when(is_ip, host)
            .when((n >= 3) & last2.isin(list(sufs)), last3)
            .when(n >= 2, last2)
            .otherwise(host),
        )
    if "__rd_last2" in df.columns or "__rd_sfx" in df.columns:
        raise ValueError(
            "internal column name collision: __rd_last2/__rd_sfx"
        )
    spark = df.sparkSession
    suffix_df = spark.createDataFrame(
        [(s,) for s in sorted(set(sufs))], "__rd_sfx string"
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.contains(":")
    tagged = df.withColumn("__rd_last2", F.when(n >= 3, last2))
    joined = tagged.join(
        F.broadcast(suffix_df),
        tagged["__rd_last2"] == suffix_df["__rd_sfx"],
        "left",
    )
    return joined.withColumn(
        out_col,
        F.when(is_ip, host)
        .when((n >= 3) & F.col("__rd_sfx").isNotNull(), last3)
        .when(n >= 2, last2)
        .otherwise(host),
    ).drop("__rd_last2", "__rd_sfx")


def path_template_col(url: Column) -> Column:
    """URL path with digit runs collapsed to ``N`` and query/fragment
    dropped — the shape key for crawl-trap detection. Two URLs that
    differ only in numeric path segments (``/2024/01/03/``,
    ``/page/7341``) share one template; NULL for unparseable URLs."""
    path = F.regexp_extract(url, _URL_RE, 3)
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(host != "", F.regexp_replace(path, "[0-9]+", "N"))


def crawl_trap_hosts(
    df: DataFrame,
    url_col: str = "url",
    min_pages: int = 100,
    max_template_ratio: float = 0.05,
) -> DataFrame:
    """Crawl-trap / URL-explosion detection: hosts whose page count is
    huge relative to their count of distinct PATH TEMPLATES (digit runs
    collapsed). Calendars, session-id paths, and faceted-search traps
    emit millions of URLs from a handful of templates; genuine sites
    grow templates with pages. The standard crawler defense (Heritrix's
    path-regularity heuristics) recast as one aggregate.

    Returns ``(host, n_pages, n_templates, template_ratio, is_trap)``
    for every host with ``n_pages >= min_pages``; ``is_trap`` fires when
    templates/pages ≤ ``max_template_ratio``.

    Shape for scale: one groupBy(host) with map-side partial aggregation
    over (host, template) pairs — count-distinct is exact via a two-level
    groupBy (host+template first, then host), never a corpus window; only
    the template string (short) shuffles, never page text. A pathological
    host is ONE hot reducer key — the same skew class AQE handles for the
    per-host cap."""
    host = url_host_col(F.col(url_col))
    tmpl = path_template_col(F.col(url_col))
    pairs = (
        df.select(host.alias("host"), tmpl.alias("tmpl"))
        .where(F.col("host").isNotNull())
        .groupBy("host", "tmpl")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_host = pairs.groupBy("host").agg(
        F.sum("n").cast("long").alias("n_pages"),
        F.count(F.lit(1)).cast("long").alias("n_templates"),
    )
    ratio = F.round(
        F.col("n_templates").cast("double") / F.col("n_pages").cast("double"),
        6,
    )
    return (
        per_host.where(F.col("n_pages") >= int(min_pages))
        .select(
            "host",
            "n_pages",
            "n_templates",
            ratio.alias("template_ratio"),
            (ratio <= float(max_template_ratio)).alias("is_trap"),
        )
    )


def url_dedup_latest(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Keep the NEWEST crawl per canonical URL — the recrawl survivor
    policy: when one page was fetched in several crawl snapshots, the
    freshest capture supersedes the rest (stale price pages, edited
    articles, removed boilerplate). Complements :func:`url_dedup`
    (min-id = stable/reproducible survivor) — the policies differ
    exactly when content changed between fetches, which is when the
    choice matters.

    Survivor per key = max by (timestamp, id): the id tiebreak makes the
    survivor deterministic when one snapshot carries a URL twice.
    Same scale shape as url_dedup: ONE hash shuffle on the canonical
    key, ``max_by`` with a unique struct key (no window over the
    corpus), left-anti to drop the superseded rows — page text never
    shuffles. NULL timestamps sort before every real timestamp (a dated
    capture beats an undated one); unparseable URLs all survive (NULL
    keys never merge)."""
    tagged = df.withColumn("__cu", canonical_url_col(F.col(url_col)))
    # NULL ts must lose to any real ts: coalesce to the epoch floor
    key = F.struct(
        F.coalesce(
            F.col(ts_col), F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("t"),
        F.col(id_col).alias("i"),
    )
    surviv = (
        tagged.where(F.col("__cu").isNotNull())
        .groupBy("__cu")
        .agg(F.max_by(F.col(id_col), key).alias(id_col))
    )
    dupes = (
        tagged.where(F.col("__cu").isNotNull())
        .join(surviv.select(id_col), id_col, "left_anti")
        .select(id_col)
    )
    return df.join(dupes, id_col, "left_anti")


#: (class, path regex) — first match wins, evaluated in this order.
#: Java/RE2-safe subset so the DuckDB oracle replays the table verbatim.
URL_CLASS_RULES: tuple[tuple[str, str], ...] = (
    ("feed", r"(^|/)(feed|rss|atom)(\.xml)?(/|$)"),
    ("api", r"(^|/)(api|graphql|wp-json)(/|$)"),
    ("media", r"\.(jpg|jpeg|png|gif|webp|svg|mp4|mp3|pdf|zip|css|js)$"),
    ("pagination", r"(^|/)page/[0-9]+(/|$)"),
    ("tag", r"(^|/)(tag|tags|label|labels)(/|$)"),
    ("category", r"(^|/)(category|categories|topics?)(/|$)"),
    ("search", r"(^|/)(search|find)(/|$)"),
    ("auth", r"(^|/)(login|signin|signup|register|account)(/|$)"),
    ("date_archive", r"(^|/)[0-9]{4}/[0-9]{2}(/|$)"),
)


def url_class_col(url: Column) -> Column:
    """Coarse URL-type classification from the path — the crawl-curation
    prior: feeds/APIs/media/auth pages are non-content by construction,
    tag/category/pagination/search pages are low-value link farms
    (near-duplicate listings of the same titles), date archives overlap
    their articles. Training-corpus builders drop or down-weight these
    BEFORE fetching text, which is why the signal must come from the URL
    alone. First matching rule wins (rules ordered most- to
    least-specific); anything else is ``content``; NULL for unparseable
    URLs. Pure regex column algebra — zero shuffle, zero Python, and the
    rule table is shared with the q120 oracle as data."""
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    path = F.lower(F.regexp_extract(url, _URL_RE, 3))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    expr = None
    for cls, pat in URL_CLASS_RULES:
        cond = path.rlike(pat)
        expr = F.when(cond, F.lit(cls)) if expr is None else expr.when(
            cond, F.lit(cls)
        )
    expr = expr.otherwise(F.lit("content"))
    return F.when(host != "", expr)
