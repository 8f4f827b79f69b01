"""Sentence-length / capitalization / punctuation-run / bracket-balance
profiles: hand values and edge semantics (empty text, no sentences)."""

import pytest

from soda_core_spark.operators.profiling import (
    bracket_balance_audit,
    capitalization_profile,
    punctuation_run_profile,
    sentence_length_profile,
)


def test_sentence_length_profile_hand_values(spark):
    rows = [
        # 6 words, 2 sentence runs -> wps 3.0; ends terminal
        ("s", "one two three. four five six!"),
        # no sentence terminator at all -> wps NULL -> degenerate
        ("s", "just a fragment with no end"),
        # 2 words 1 sentence -> wps 2.0 (< 3 -> degenerate); "..." is
        # ONE run; ends terminal (trailing space ok)
        ("s", "too short... "),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = sentence_length_profile(df).collect()[0]
    assert got["n_docs"] == 3
    # wps values: [3.0, NULL, 2.0] -> median of (2.0, 3.0) = 2.5
    assert got["median_wps"] == pytest.approx(2.5)
    assert got["share_wps_degenerate"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["share_no_terminal_end"] == pytest.approx(1 / 3, abs=1e-6)


def test_capitalization_profile_hand_values(spark):
    rows = [
        # tokens: NASA(caps) rocks x2 -> 1/3 allcaps; alpha 13, upper 5
        ("s", "NASA rocks Rocks"),
        # I is 1 char -> not an ALL-CAPS token (needs >= 2)
        ("s", "I am ok"),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = capitalization_profile(df).collect()[0]
    assert got["n_docs"] == 2 and got["n_tokens"] == 6
    assert got["allcaps_token_share"] == pytest.approx(1 / 6, abs=1e-6)
    # uppers: NASA(4) + R(1) + I(1) = 6; alpha: 14 + 5 = 19
    assert got["upper_char_share"] == pytest.approx(6 / 19, abs=1e-6)


def test_capitalization_profile_empty_text(spark):
    df = spark.createDataFrame([("s", ""), ("s", None)],
                               ["source", "text"])
    got = capitalization_profile(df).collect()[0]
    assert got["n_tokens"] == 0
    assert got["allcaps_token_share"] is None
    assert got["upper_char_share"] is None


def test_punctuation_run_profile_hand_values(spark):
    rows = [
        ("s", "wow!!! really????"),   # runs: !!! (3), ???? (4)
        ("s", "calm text."),          # single '.' -> no run
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = punctuation_run_profile(df).collect()[0]
    assert got["n_docs"] == 2
    assert got["docs_with_runs"] == 1
    assert got["n_runs"] == 2
    assert got["max_run_len"] == 4
    total_chars = len(rows[0][1]) + len(rows[1][1])
    assert got["runs_per_kchar"] == pytest.approx(
        round(1000.0 * 2 / total_chars, 4)
    )


def test_bracket_balance_audit_hand_values(spark):
    rows = [
        ("s", 'balanced (a) [b] {c} "quoted"'),   # all fine
        ("s", "broken (open [only"),              # paren + bracket bad
        ("s", 'odd "quote'),                      # odd quotes
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = bracket_balance_audit(df).collect()[0]
    assert got["n_docs"] == 3
    assert got["n_unbalanced_paren"] == 1
    assert got["n_unbalanced_bracket"] == 1
    assert got["n_unbalanced_brace"] == 0
    assert got["n_odd_quotes"] == 1
    assert got["share_any_unbalanced"] == pytest.approx(2 / 3, abs=1e-6)
