"""Unicode NFC text normalization — an Arrow-batched pandas UDF with an
O(1) ASCII fast path.

Why a quality pipeline needs it: dedup keys, shingle sets, and blocklist
probes all compare *byte sequences*, but web text spells the same
character two ways (``é`` vs ``e`` + U+0301). Un-normalized corpora leak
duplicates past exact dedup and split MinHash shingles that should
collide. Normal Form C is the canonical composition the W3C prescribes
for web content, so it is the right key form; it must run BEFORE any
hash-keyed operator. soda-core has no normalization primitive (its
validity checks compare strings as-is); this is training-pipeline
surface, parity-checked against DuckDB's utf8proc ``nfc_normalize`` —
Python's ``unicodedata`` and utf8proc both implement the same Unicode
normalization algorithm, and tests/the q75 oracle pin them byte-equal.

Scale shape: NFC has no JVM builtin in Spark SQL, so this is a
legitimate pandas-UDF case — but the hot path never reaches Python for
most rows: CPython strings carry an O(1) ``str.isascii`` flag, ASCII is
closed under NFC, and real web corpora are majority-ASCII, so the
per-row cost is a flag test. Rows are normalized in place per Arrow
batch; nothing shuffles, nothing collects.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def nfc_normalize_text(text: str | None) -> str | None:
    """Scalar twin (the oracle/reference form): NFC-normalize one
    string; None passes through; ASCII short-circuits (closed under
    every Unicode normal form)."""
    if text is None or text.isascii():
        return text
    return unicodedata.normalize("NFC", text)


def nfc_batch(texts: pd.Series) -> pd.Series:
    """Vectorized NFC over an Arrow batch. ``str.isascii`` gates the
    normalize call, so pure-ASCII batches cost one flag test per row."""
    return texts.map(
        lambda s: unicodedata.normalize("NFC", s)
        if isinstance(s, str) and not s.isascii()
        else s
    )


@pandas_udf(T.StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    return nfc_batch(texts)


def nfc_normalize_col(text: Column) -> Column:
    """NFC-normalized copy of ``text`` (NULL-preserving)."""
    return nfc_udf(text)
