"""NFC normalization: scalar parity with unicodedata, DuckDB utf8proc
byte-parity, null/ASCII fast paths, and the e2e UDF."""

import unicodedata

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from soda_core_spark.functions.normalize import (
    nfc_batch,
    nfc_normalize_col,
    nfc_normalize_text,
)

TRICKY = [
    "café",          # e + combining acute → é
    "café",                # already composed (stable)
    "Åä",      # Å, ä decomposed
    "ṩ",              # ṩ composed
    "ṩ",       # ṩ decomposed, marks in non-canonical order
    "q̣̇",       # reorders under canonical ordering
    "한국어",               # Hangul syllables (compose from jamo)
    "한",  # Hangul jamo → 한
    "ascii only",
    "",
]


def test_scalar_matches_unicodedata():
    for s in TRICKY:
        assert nfc_normalize_text(s) == unicodedata.normalize("NFC", s), repr(s)
    assert nfc_normalize_text(None) is None


def test_duckdb_parity():
    con = duckdb.connect()
    for s in TRICKY:
        d = con.sql("select nfc_normalize(?)", params=[s]).fetchone()[0]
        assert d == nfc_normalize_text(s), repr(s)
    con.close()


def test_batch_nulls_and_ascii_identity():
    s = pd.Series(["abc", None, "café"])
    out = nfc_batch(s)
    assert out[0] == "abc"
    assert out[1] is None
    assert out[2] == "café"
    # ASCII fast path returns the identical object (no copy)
    assert out[0] is s[0]


def test_udf_end_to_end(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRICKY)] + [(99, None)],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["norm"]
        for r in df.select(
            "doc_id", nfc_normalize_col(F.col("text")).alias("norm")
        ).collect()
    }
    for i, s in enumerate(TRICKY):
        assert got[i] == unicodedata.normalize("NFC", s), repr(s)
    assert got[99] is None


def test_hypothesis_parity():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=40))
    def inner(s):
        assert nfc_normalize_text(s) == unicodedata.normalize("NFC", s)

    inner()
