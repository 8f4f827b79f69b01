"""Mojibake (encoding-artifact) detection and repair, Spark-native.

Web crawls are full of text that took a wrong encode/decode round trip
— UTF-8 bytes decoded as Latin-1/Windows-1252 — leaving the telltale
artifacts ``Ã©`` (for ``é``), ``â€™``
(for ``’``), ``Â«`` (for ``«``), etc. This module
provides:

* :func:`mojibake_signals` — per-document artifact counts / ratio /
  flag as pure codegen arithmetic (replace-diff occurrence counting,
  the same formula as the DuckDB oracle in entry_queries q82), and
* :func:`repair_mojibake` — the ftfy-style repair, expressed ENTIRELY
  in JVM built-ins: fold the 27 visible Windows-1252 code points back
  to their C1-control positions (``translate``), byte-reverse the bad
  decode with ``encode(.., 'ISO-8859-1')`` → ``decode(.., 'UTF-8')``,
  and run the reversal only when it is provably safe: no codepoint
  above 0xFF in the folded input (those cannot have come from a
  Latin-1 decode) AND the folded bytes validate as structural UTF-8
  via the RFC 3629 regex — Spark's ``decode`` THROWS on malformed
  input, so validity is proven before the decode ever evaluates.
  Unrepairable or clean rows pass through byte-identical.

Scale shape: detection and repair are both single-projection column
algebra — no UDF, no shuffle, no Python. ftfy itself is a per-row
Python library; this is the vectorized JVM re-expression of its
core Latin-1/cp1252 path (the path that covers the overwhelming
majority of real-web mojibake).

Why cp1252 needs the fold: Spark's ``encode`` supports only the six
standard charsets (no windows-1252), but cp1252 differs from Latin-1
ONLY in the 0x80-0x9F band — mapping those 27 printables back to the
control codepoints makes the Latin-1 byte reversal exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Windows-1252 printables at 0x80-0x9F (the five undefined slots
# 0x81 0x8D 0x8F 0x90 0x9D excluded) and their C1-control positions.
_CP1252 = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6,
    0x89: 0x2030, 0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152,
    0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019, 0x93: 0x201C,
    0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}
CP1252_VISIBLE = "".join(chr(u) for u in _CP1252.values())
CP1252_CONTROLS = "".join(chr(b) for b in _CP1252)

#: artifact markers: lead bytes of 2-byte UTF-8 sequences decoded as
#: Latin-1 (U+00C3, U+00C2) and the 3-byte punctuation lead pair
#: U+00E2 U+20AC ("â€", the cp1252 face of E2 80)
_A_C3 = "Ã"
_A_C2 = "Â"
_A_E2 = "â€"

#: flag thresholds: at least 2 artifacts AND more than 0.5% of chars
MIN_ARTIFACTS = 2
MIN_RATIO = 0.005


def _occ(text: Column, needle: str) -> Column:
    removed = F.replace(text, F.lit(needle), F.lit(""))
    return (F.length(text) - F.length(removed)) / F.lit(len(needle))


def mojibake_signals(text: Column) -> dict[str, Column]:
    """``n_artifacts`` (long), ``mojibake_ratio`` (double, 6dp),
    ``is_mojibake`` (boolean) — replace-diff counting, identical
    formula to the q82 DuckDB oracle."""
    t = F.coalesce(text, F.lit(""))
    n = (
        _occ(t, _A_C3) + _occ(t, _A_C2) + _occ(t, _A_E2)
    ).cast("long")
    nc = F.length(t)
    ratio = F.round(
        F.when(nc > 0, n.cast("double") / nc.cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return {
        "n_artifacts": n,
        "mojibake_ratio": ratio,
        "is_mojibake": (n >= MIN_ARTIFACTS) & (ratio > MIN_RATIO),
    }


#: RFC 3629 UTF-8 byte-structure validation as a regex over the folded
#: Latin-1 string (each char IS one byte): ASCII, 2/3/4-byte sequences
#: with the exact continuation ranges — overlongs (C0/C1, E0 80-9F,
#: F0 80-8F) and >U+10FFFF (F5+) rejected, like a strict decoder.
#: Spark's ``decode(..., 'UTF-8')`` THROWS on malformed input
#: (MALFORMED_CHARACTER_CODING), so validity must be proven BEFORE the
#: decode ever evaluates — a real crawl is full of truncated artifact
#: runs like 0xC3 0xC3.
_UTF8_VALID_RE = (
    "\\A(?:[\\x00-\\x7f]"
    "|[\\xc2-\\xdf][\\x80-\\xbf]"
    "|\\xe0[\\xa0-\\xbf][\\x80-\\xbf]"
    "|[\\xe1-\\xec][\\x80-\\xbf]{2}"
    "|\\xed[\\x80-\\x9f][\\x80-\\xbf]"
    "|[\\xee-\\xef][\\x80-\\xbf]{2}"
    "|\\xf0[\\x90-\\xbf][\\x80-\\xbf]{2}"
    "|[\\xf1-\\xf3][\\x80-\\xbf]{3}"
    "|\\xf4[\\x80-\\x8f][\\x80-\\xbf]{2})*\\z"
)


def repair_mojibake(text: Column) -> Column:
    """Reverse a UTF-8-read-as-Latin-1/cp1252 decode when (and only
    when) it is provably lossless; otherwise return the input
    unchanged. NULL stays NULL. Never raises: the byte reversal only
    evaluates once the folded string is proven (a) pure Latin-1 range
    and (b) structurally valid UTF-8 — both as JVM regexes."""
    t = text
    folded = F.translate(t, CP1252_VISIBLE, CP1252_CONTROLS)
    latin1_able = ~folded.rlike("[^\\x00-\\xff]")
    utf8_valid = folded.rlike(_UTF8_VALID_RE)
    repaired = F.decode(F.encode(folded, "ISO-8859-1"), "UTF-8")
    detected = mojibake_signals(t)["is_mojibake"]
    return F.when(detected & latin1_able & utf8_valid, repaired).otherwise(t)
