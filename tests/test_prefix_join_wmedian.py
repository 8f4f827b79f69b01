"""Prefix-filter Jaccard join (losslessness vs brute force) and
weighted median (hand values, integer half-total semantics)."""

import itertools

import pytest

from soda_core_spark.operators.dedup import prefix_filter_jaccard
from soda_core_spark.operators.profiling import weighted_median


def _shingles(text, n=3):
    ws = [w for w in text.lower().split() if w]
    if len(ws) >= n:
        return set(
            " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)
        )
    return {" ".join(ws)}


def test_prefix_filter_matches_brute_force(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near 1
        (3, "completely different words in this one here now"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # == 1
        (5, "completely different words in this one here also"),
        (6, "short doc"),
        (7, "short doc"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard(df, threshold=t).collect()
    }
    expect = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = _shingles(ta), _shingles(tb)
        j = len(sa & sb) / len(sa | sb)
        if round(j, 6) >= t:
            expect[(ia, ib)] = round(j, 6)
    assert got == expect
    assert (1, 4) in got and got[(1, 4)] == 1.0
    assert (6, 7) in got and got[(6, 7)] == 1.0   # sub-n fallback


def test_prefix_filter_high_threshold_prunes(spark):
    docs = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i k"),
        (3, "z y x w v u t s r q"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = prefix_filter_jaccard(df, threshold=0.95).collect()
    assert got == []   # best pair is 7/9 < 0.95
    got2 = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard(df, threshold=0.7).collect()
    }
    assert got2 == {(1, 2)}


def test_weighted_median_hand_values(spark):
    # values 1..4 with weights 1,1,1,7 -> W=10, half reached at v=4
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1),
            ("g", 4.0, 7)]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = weighted_median(df, "g", "v", "w").collect()[0]
    assert got["total_weight"] == 10
    assert got["weighted_median"] == 4.0


def test_weighted_median_exact_half_boundary(spark):
    # W=4; cumw at v=1 is 2 -> 2*2 >= 4 holds: lower median = 1
    rows = [("g", 1.0, 2), ("g", 5.0, 2)]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = weighted_median(df, "g", "v", "w").collect()[0]
    assert got["weighted_median"] == 1.0


def test_weighted_median_duplicate_values_collapse(spark):
    # duplicates of the same value must merge BEFORE the cumsum
    rows = [("g", 2.0, 1), ("g", 2.0, 1), ("g", 2.0, 1),
            ("g", 9.0, 2)]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    got = weighted_median(df, "g", "v", "w").collect()[0]
    assert got["total_weight"] == 5
    assert got["weighted_median"] == 2.0
