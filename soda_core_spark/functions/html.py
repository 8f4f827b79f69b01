"""HTML → text extraction as a pure JVM regexp pipeline.

The input table (BASELINE.json input_hint) carries ``html:binary`` next
to the extracted ``text:string``; a Common-Crawl-style pipeline must be
able to (re-)extract text from markup itself — e.g. when the upstream
extraction is missing or needs re-running under new rules. soda-core has
no markup surface (its type system stops at scalars, SURVEY §1.2); this
is first-class quality-filter machinery.

Design: an ORDERED chain of ``regexp_replace`` steps — whole-stage
codegen, zero Python, zero shuffle — published as a data table
(:data:`HTML_EXTRACT_RULES`) so the DuckDB/any-SQL oracle can replay the
exact same chain (same pattern strings, same order; the patterns stay
inside the syntax subset Java regex and RE2 agree on: inline ``(?is)``
flags, non-greedy ``.*?``, character classes — no backrefs, no
lookaround). This mirrors how the PII scrub achieves cross-engine byte
parity (functions/scrub.py).

This is deliberately a STRUCTURAL extractor (script/style/comment
removal, block-tag line breaks, tag stripping, entity decode, whitespace
normalization) — the boilerplate/main-content decision is a separate
concern solved by the quality rules downstream (line dedup, link
density, stopword density), matching the trafilatura/jusText division
of labor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) applied IN ORDER. \x07 (BEL) is the internal
#: newline sentinel: real newlines in source HTML are insignificant
#: whitespace, so they are folded first and block boundaries then
#: introduce sentinel breaks that survive the whitespace collapse.
HTML_EXTRACT_RULES: tuple[tuple[str, str], ...] = (
    # non-content subtrees go first, while their contents are still intact
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # source-format newlines are plain whitespace in HTML
    (r"[\n\r\t]", " "),
    # block-level boundaries become the newline sentinel
    (
        r"(?i)</?(p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|"
        r"blockquote|section|article|header|footer|pre|hr)\b[^>]*>",
        "\x07",
    ),
    # every remaining tag is inline: drop it
    (r"<[^>]*>", " "),
    # minimal named-entity set + numeric decimal entities are handled
    # below via explicit replaces (regexp_replace can't compute chr())
    # whitespace collapse: spaces around sentinels, runs of either
    (r" +", " "),
    (r" ?\x07 ?", "\x07"),
    (r"\x07+", "\n"),
    # explicit [ \n] (not \s): Java and RE2 disagree on \x0B membership
    (r"^[ \n]+|[ \n]+$", ""),
)

#: entity → literal, applied between tag-strip and whitespace collapse.
#: &amp; must come LAST so "&amp;lt;" decodes to "&lt;" not "<"
#: (single-pass decode, the standard non-recursive rule).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

#: index in HTML_EXTRACT_RULES before which the entity replaces run
_ENTITY_STAGE = 7


def html_text_col(html: Column) -> Column:
    """The extraction chain as one nested Column expression.

    ``html`` may be string or binary (binary is UTF-8 decoded first —
    real WARC payloads need charset sniffing, which is metadata the
    caller owns; UTF-8-with-replacement is the deterministic default).
    """
    col = html.cast("string")
    for i, (pat, rep) in enumerate(HTML_EXTRACT_RULES):
        if i == _ENTITY_STAGE:
            for ent, lit in HTML_ENTITIES:
                col = F.replace(col, F.lit(ent), F.lit(lit))
        col = F.regexp_replace(col, pat, rep)
    return col


def html_title_col(html: Column) -> Column:
    """<title> contents (first match), entity-decoded, whitespace
    collapsed; NULL when absent."""
    col = F.regexp_extract(
        html.cast("string"), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1
    )
    for ent, lit in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(lit))
    col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return F.when(col != "", col)


def link_density_col(html: Column) -> Column:
    """Fraction of extracted-text characters inside <a> elements —
    a classic boilerplate signal (jusText): nav/footer chrome is mostly
    links. Computed as anchor-text length over total text length, both
    through the same extraction chain, so the two sides cancel
    consistently. 0.0 for empty text."""
    body = html.cast("string")
    anchors = html_text_col(
        F.array_join(
            F.regexp_extract_all(
                body, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1)
            ),
            " ",
        )
    )
    full = html_text_col(body)
    return F.when(
        F.length(full) > 0,
        F.least(
            F.lit(1.0),
            F.length(anchors).cast("double") / F.length(full).cast("double"),
        ),
    ).otherwise(F.lit(0.0))


def with_extracted_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
    title_col: str | None = "title",
    link_density: str | None = "link_density",
) -> DataFrame:
    """Attach extraction columns. NULL html → NULL outputs (never fails
    a row). Pure projection: zero shuffle, codegen throughout, and the
    html column is read once per output column with no Python round-trip
    — at 100 TB the binary column stays executor-side and only the
    extracted text (typically 10-50× smaller) flows on."""
    src = F.col(html_col)
    cols = {out_col: F.when(src.isNotNull(), html_text_col(src))}
    if title_col:
        cols[title_col] = F.when(src.isNotNull(), html_title_col(src))
    if link_density:
        cols[link_density] = F.when(src.isNotNull(), link_density_col(src))
    return df.withColumns(cols)


#: metadata extraction patterns — Java/RE2 common subset (inline flags,
#: non-greedy, classes; no lookaround), attribute order as emitted by
#: the dominant CMSes (property/name/rel first, content/href second).
CANONICAL_PATTERN = (
    r'(?is)<link\s[^>]*rel="canonical"[^>]*href="([^"]+)"'
)
PUBLISHED_PATTERNS: tuple[str, ...] = (
    # OpenGraph / article meta (WordPress, most news CMSes)
    r'(?is)<meta\s[^>]*property="article:published_time"[^>]*'
    r'content="([^"]+)"',
    r'(?is)<meta\s[^>]*name="date"[^>]*content="([^"]+)"',
    # HTML5 <time datetime=...>
    r'(?is)<time\s[^>]*datetime="([^"]+)"',
)
OG_TITLE_PATTERN = (
    r'(?is)<meta\s[^>]*property="og:title"[^>]*content="([^"]+)"'
)
META_DESCRIPTION_PATTERN = (
    r'(?is)<meta\s[^>]*name="description"[^>]*content="([^"]+)"'
)


def _first_match(col: Column, patterns: tuple[str, ...]) -> Column:
    out = None
    for pat in patterns:
        m = F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))
        out = m if out is None else F.coalesce(out, m)
    return out


def with_html_metadata(
    df: DataFrame,
    html_col: str = "html",
    canonical_col: str = "canonical_href",
    published_col: str = "published_ts",
    og_title_col: str = "og_title",
    description_col: str = "meta_description",
) -> DataFrame:
    """Page metadata from markup, pure JVM regexp — the other half of
    extraction (functions/html.py does body text; this does the head):

    * ``canonical_href`` — ``<link rel="canonical">``: the PAGE'S OWN
      statement of its canonical URL, the strongest crawl-dedup signal
      there is (dedup on it collapses print views, AMP pages, tracking
      variants before any content hashing runs; pair with
      ``operators/urls.url_dedup``),
    * ``published_ts`` — first of article:published_time / meta date /
      ``<time datetime>``, parsed with ``try_to_timestamp`` (ISO forms;
      unparseable → NULL, never a failed row) — temporal filtering and
      crawl-delta priority,
    * ``og_title`` / ``meta_description`` — entity-decoded snippets for
      retrieval/labeling.

    Every extraction is one ``regexp_extract`` over the html column —
    zero shuffle, zero Python; NULL html → NULL columns."""
    src = F.col(html_col).cast("string")
    canon = F.nullif(F.regexp_extract(src, CANONICAL_PATTERN, 1), F.lit(""))
    pub_raw = _first_match(src, PUBLISHED_PATTERNS)
    pub = F.try_to_timestamp(pub_raw)

    def _decoded(pat: str) -> Column:
        col = F.nullif(F.regexp_extract(src, pat, 1), F.lit(""))
        for ent, lit in HTML_ENTITIES:
            col = F.replace(col, F.lit(ent), F.lit(lit))
        return col

    return df.withColumns(
        {
            canonical_col: canon,
            published_col: pub,
            og_title_col: _decoded(OG_TITLE_PATTERN),
            description_col: _decoded(META_DESCRIPTION_PATTERN),
        }
    )


ROBOTS_META_PATTERN = (
    r'(?is)<meta\s[^>]*name="robots"[^>]*content="([^"]*)"'
)
HTML_LANG_PATTERN = r'(?is)<html\s[^>]*lang="([^"]+)"'


def with_robots_directives(
    df: DataFrame,
    html_col: str = "html",
    noindex_col: str = "meta_noindex",
    nofollow_col: str = "meta_nofollow",
) -> DataFrame:
    """Per-page ``<meta name="robots">`` directive flags — the page-level
    half of crawl compliance (``operators/robots.py`` gates on the
    host-level robots.txt; this honours the page's own opt-out, which a
    responsible corpus build excludes just like RFC 9309 disallows).

    Directive matching is token-exact over the comma-separated content
    list (split + trim + equality, the blocklist idiom — no substring
    regex, so ``noindexing`` in prose can never fire a directive):
    ``noindex`` / ``nofollow`` fire their own flag, ``none`` fires both
    (robots meta spec). Pages with no robots meta (or NULL html) get
    false — absence of markup is consent, matching crawler behaviour.

    Pure column algebra over one ``regexp_extract``: zero shuffle, zero
    Python, prunes to the html column at the scan."""
    src = F.col(html_col).cast("string")
    content = F.lower(F.regexp_extract(src, ROBOTS_META_PATTERN, 1))
    toks = F.split(content, ",")

    def _has(directive: str) -> Column:
        return F.coalesce(
            F.exists(toks, lambda t: F.trim(t) == directive), F.lit(False)
        )

    none = _has("none")
    return df.withColumns(
        {
            noindex_col: _has("noindex") | none,
            nofollow_col: _has("nofollow") | none,
        }
    )


def robots_meta_gate(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages that declare ``noindex`` (directly or via ``none``) in
    their robots meta tag; the filter composes with
    ``operators/robots.robots_filter`` for full crawl compliance."""
    flagged = with_robots_directives(df, html_col=html_col)
    return flagged.where(~F.col("meta_noindex")).drop(
        "meta_noindex", "meta_nofollow"
    )


def html_lang_col(html: Column) -> Column:
    """Primary language subtag declared by the page itself
    (``<html lang="en-US">`` → ``en``), lowercased; NULL when the
    attribute is absent or empty. BCP 47 primary subtag = the leading
    alpha run."""
    raw = F.nullif(
        F.regexp_extract(html.cast("string"), HTML_LANG_PATTERN, 1),
        F.lit(""),
    )
    return F.nullif(
        F.lower(F.regexp_extract(raw, r"^([A-Za-z]+)", 1)), F.lit("")
    )


def with_lang_mismatch(
    df: DataFrame,
    html_col: str = "html",
    lang_col: str = "lang",
    declared_col: str = "declared_lang",
    mismatch_col: str = "lang_mismatch",
) -> DataFrame:
    """Declared-vs-detected language disagreement signal: the page's own
    ``<html lang>`` claim against the table's ``lang`` column (detector
    output or upstream label). A high mismatch rate flags a broken
    detector, a mislabeled source, or boilerplate-dominated extractions
    — a contract-able metric (``metric: avg(CASE WHEN lang_mismatch
    THEN 1.0 ELSE 0.0 END)``), not a hard drop rule: pages routinely
    lie in either direction, so disagreement is evidence, not verdict.

    ``lang_mismatch`` is NULL (signal unavailable) unless BOTH sides are
    present — the per-language stopword-pack discipline: a missing
    input never counts as bad quality. Zero shuffle, zero Python."""
    declared = html_lang_col(F.col(html_col))
    detected = F.lower(F.col(lang_col))
    return df.withColumns(
        {
            declared_col: declared,
            mismatch_col: F.when(
                declared.isNotNull() & detected.isNotNull(),
                declared != detected,
            ),
        }
    )
