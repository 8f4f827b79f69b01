"""Unicode char-class / script profile (functions/text.py)."""

import duckdb

from pyspark.sql import functions as F

from soda_core_spark.functions.text import (
    SCRIPT_RANGES,
    char_class_counts,
    dominant_script,
    script_profile,
)

ROWS = [
    (1, "Hello, World! 42"),
    (2, "你好世界 and some latin"),       # CJK-heavy
    (3, "Привет мир"),  # Cyrillic
    (4, "مرحبا"),                # Arabic
    (5, "café résumé naïve"),         # accented latin
    (6, ""),
    (7, None),
    (8, "1234 ... !!!"),
]


def _profile(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}


def test_dominant_scripts(spark):
    p = _profile(spark)
    assert p[1]["dominant_script"] == "latin"
    assert p[2]["dominant_script"] == "latin"   # 12 latin chars vs 4 CJK
    assert p[3]["dominant_script"] == "cyrillic"
    assert p[4]["dominant_script"] == "arabic"
    assert p[5]["dominant_script"] == "latin"   # ASCII letters outnumber accents
    assert p[6]["dominant_script"] == "none"
    assert p[7]["dominant_script"] == "none"
    assert p[8]["dominant_script"] == "none"


def test_fractions_hand_values(spark):
    p = _profile(spark)
    # "Hello, World! 42": 16 cp = 10 letters, 2 digits, 3 spaces, 2 punct?
    # H e l l o , space W o r l d ! space 4 2 → 16 cp: 10 letters,
    # 2 digits, 2 spaces, 2 punct (, !)
    r = p[1]
    assert r["n_cp"] == 16
    assert r["letter_frac"] == round(10 / 16, 6)
    assert r["digit_frac"] == round(2 / 16, 6)
    assert r["space_frac"] == round(2 / 16, 6)
    assert r["punct_frac"] == round(2 / 16, 6)
    assert r["other_frac"] == 0.0
    # empty / null docs: all zero
    assert p[6]["n_cp"] == 0 and p[6]["letter_frac"] == 0.0
    assert p[7]["n_cp"] == 0


def test_cjk_counts_exact(spark):
    df = spark.createDataFrame([(1, ROWS[1][1])], ["doc_id", "text"])
    c = char_class_counts(F.col("text"))
    row = df.select(
        c["cjk"].alias("cjk"), c["latin"].alias("latin")
    ).collect()[0]
    assert row["cjk"] == 4
    assert row["latin"] == 12  # "and some latin"


def test_tie_breaks_by_preference_order(spark):
    # 2 latin + 2 cjk chars → tie → 'latin' (first in SCRIPT_RANGES)
    df = spark.createDataFrame([(1, "ab一丁")], ["doc_id", "text"])
    c = char_class_counts(F.col("text"))
    assert df.select(dominant_script(c).alias("d")).collect()[0]["d"] == "latin"


def test_script_ranges_agree_with_duckdb_re2(spark):
    """The cross-engine pin the oracle can't provide (documents.parquet is
    pure ASCII): per-range counts on multi-script text must agree between
    Java regex and DuckDB's RE2 for the \\x{...} class syntax."""
    con = duckdb.connect()
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    for name, pat in SCRIPT_RANGES:
        spark_counts = {
            r["doc_id"]: r["n"]
            for r in df.select(
                "doc_id",
                (
                    F.length(F.coalesce(F.col("text"), F.lit("")))
                    - F.length(
                        F.regexp_replace(
                            F.coalesce(F.col("text"), F.lit("")), pat, ""
                        )
                    )
                ).alias("n"),
            ).collect()
        }
        for doc_id, text in ROWS:
            t = text or ""
            duck = con.execute(
                "SELECT length(?) - length(regexp_replace(?, ?, '', 'g'))",
                [t, t, pat],
            ).fetchone()[0]
            assert duck == spark_counts[doc_id], (name, doc_id)
