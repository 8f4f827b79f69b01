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
