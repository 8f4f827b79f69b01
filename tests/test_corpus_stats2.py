"""Source cosine / temporal mentions / quoted share / ANOVA /
Brown–Forsythe: hand values and degenerate-input semantics."""

import math

import pytest

from soda_core_spark.operators.profiling import (
    anova_oneway,
    brown_forsythe,
    quoted_text_share,
    source_token_cosine,
    temporal_mentions,
)


def test_source_token_cosine_hand_values(spark):
    rows = [
        ("a", "x x y"),   # a: {x:2, y:1}  |a|^2 = 5
        ("b", "x y y"),   # b: {x:1, y:2}  |b|^2 = 5
        ("c", "z z"),     # c: {z:2}       disjoint from a and b
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {(r["source_a"], r["source_b"]): r
           for r in source_token_cosine(df).collect()}
    # a·b = 2*1 + 1*2 = 4; cos = 4/5
    assert got[("a", "b")]["dot"] == 4
    assert got[("a", "b")]["cos_sim"] == pytest.approx(0.8)
    # disjoint vocabularies never produce a pair row (dot would be 0)
    assert ("a", "c") not in got and ("b", "c") not in got


def test_source_token_cosine_identical_sources(spark):
    rows = [("a", "p q r"), ("b", "p q r")]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = source_token_cosine(df).collect()[0]
    assert got["cos_sim"] == pytest.approx(1.0)


def test_temporal_mentions_word_boundaries(spark):
    rows = [
        (1, "built in 1999 and again in 1999"),
        (2, "year 2024 arrived; serial A2024B must NOT count"),
        (3, "2030 is outside the window, 1899 too"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["year"]: r for r in temporal_mentions(df).collect()}
    assert got[1999]["n_mentions"] == 2 and got[1999]["n_docs"] == 1
    assert got[2024]["n_mentions"] == 1 and got[2024]["n_docs"] == 1
    assert 2030 not in got and 1899 not in got


def test_quoted_text_share_hand_values(spark):
    rows = [
        ("s", 'he said "ab" then "cde".'),  # inner chars 2 + 3 = 5
        ("s", "no quotes here"),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = quoted_text_share(df).collect()[0]
    assert got["n_docs"] == 2
    assert got["docs_with_quotes"] == 1
    assert got["n_quotes"] == 2
    total = len(rows[0][1]) + len(rows[1][1])
    assert got["quoted_char_share"] == pytest.approx(
        round(5 / total, 6)
    )
    assert got["mean_quote_len"] == pytest.approx(2.5)


def test_anova_oneway_hand_values(spark):
    # groups: [1,2,3] and [7,8,9] -> grand mean 5, SSB = 2*3*(3)^2/..
    # means 2 and 8: SSB = 3*(2-5)^2 + 3*(8-5)^2 = 54; SSW = 2+2 = 4
    # F = (54/1)/(4/4) = 54; eta^2 = 54/58
    rows = [("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
            ("g2", 7.0), ("g2", 8.0), ("g2", 9.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = anova_oneway(df, "g", "v").collect()[0]
    assert got["k_groups"] == 2 and got["n"] == 6
    assert got["ssb"] == pytest.approx(54.0)
    assert got["ssw"] == pytest.approx(4.0)
    assert got["f_stat"] == pytest.approx(54.0)
    assert got["eta_sq"] == pytest.approx(round(54 / 58, 6))


def test_anova_oneway_degenerate_one_group(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0)], ["g", "v"]
    )
    got = anova_oneway(df, "g", "v").collect()[0]
    assert got["k_groups"] == 1 and got["f_stat"] is None


def test_brown_forsythe_equal_vs_unequal_spread(spark):
    # same medians, very different spreads -> bf_stat should be large
    tight = [("t", 10.0 + d) for d in (-0.1, 0.0, 0.1, -0.05, 0.05)]
    wide = [("w", 10.0 + d) for d in (-9.0, 0.0, 9.0, -5.0, 5.0)]
    df = spark.createDataFrame(tight + wide, ["g", "v"])
    got = brown_forsythe(df, "g", "v").collect()[0]
    assert got["k_groups"] == 2 and got["n"] == 10
    assert got["bf_stat"] is not None and got["bf_stat"] > 5.0
    # identical distributions -> deviations match -> bf ~ 0
    same = [("x", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("y", float(v)) for v in (1, 2, 3, 4, 5)
    ]
    df2 = spark.createDataFrame(same, ["g", "v"])
    got2 = brown_forsythe(df2, "g", "v").collect()[0]
    assert got2["bf_stat"] == pytest.approx(0.0, abs=1e-9)
