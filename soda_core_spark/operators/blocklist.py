"""Source/term blocklist filtering — the RefinedWeb/UT1-style curation
step: drop documents from blocked hosts/sources and documents containing
blocked terms, with a per-row reason.

Scale shape: the blocklists are tiny curation artifacts → pure broadcast
semantics (``isin`` compiles to an InSet probe; no join, no shuffle);
term matching is token-exact over the engine's tokenization contract
(lowercased ASCII-whitespace split) via a single ``exists`` over the
token array — no regex scans, no per-term passes.

soda-core analogue: an ``invalid`` check with ``invalid_values`` on the
host column plus a ``failed_rows`` condition on the text — this operator
fuses both into one annotated pass with a reason column, the form a
training pipeline consumes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_RE = "^https?://([^/]+)"


def blocklist_filter(
    df: DataFrame,
    blocked_hosts: Optional[Sequence[str]] = None,
    blocked_terms: Optional[Sequence[str]] = None,
    host_col: Optional[str] = None,
    url_col: Optional[str] = None,
    text_col: str = "text",
) -> DataFrame:
    """Annotate every row with ``block_reason`` (NULL = clean, ``host``
    or ``term`` — host takes precedence) and ``blocked`` boolean.

    ``host_col`` names an existing host/source column; alternatively
    ``url_col`` extracts the host from a URL. Hosts compare
    case-insensitively; terms match whole TOKENS (lowercased), never
    substrings — 'class' does not trip a 'ass' entry, matching how
    UT1-style token lists are meant to be applied.
    """
    if not blocked_hosts and not blocked_terms:
        raise ValueError("provide blocked_hosts and/or blocked_terms")
    if blocked_hosts and not (host_col or url_col):
        raise ValueError("blocked_hosts needs host_col or url_col")
    reasons: list[Column] = []
    if blocked_hosts:
        hosts = [h.lower() for h in blocked_hosts]
        host = (
            F.col(host_col)
            if host_col
            else F.regexp_extract(F.col(url_col), HOST_RE, 1)
        )
        reasons.append(F.when(F.lower(host).isin(hosts), F.lit("host")))
    if blocked_terms:
        from soda_core_spark.functions.text import words_col

        terms = sorted({t.lower() for t in blocked_terms})
        # THE engine tokenization contract — shared with with_signals and
        # BM25, so the token-exact guarantee can't drift
        words = words_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        reasons.append(
            F.when(F.exists(words, lambda w: w.isin(terms)), F.lit("term"))
        )
    reason = F.coalesce(*reasons) if len(reasons) > 1 else reasons[0]
    return df.withColumns(
        {"block_reason": reason, "blocked": reason.isNotNull()}
    )
