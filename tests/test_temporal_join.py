"""As-of and range joins: hand-matched values, <=-vs-strict tie
semantics, unmatched NULLs, and the one-shuffle plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.temporal_join import (
    asof_join,
    range_count_join,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-10T00:00:00")),
            (2, "k1", _ts("2024-01-20T00:00:00")),
            (3, "k1", _ts("2024-01-05T00:00:00")),  # before any right
            (4, "k2", _ts("2024-01-15T00:00:00")),  # key with no right
            (5, "k1", _ts("2024-01-12T00:00:00")),  # exactly on a right ts
        ],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-08T00:00:00"), 100),
            ("k1", _ts("2024-01-12T00:00:00"), 200),
            ("k3", _ts("2024-01-01T00:00:00"), 999),
        ],
        ["k", "rts", "val"],
    )
    return left, right


def test_asof_join_matches_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "k", "ts", "rts", ["val"]
        ).collect()
    }
    assert got[1]["val"] == 100                      # 08 <= 10 < 12
    assert got[2]["val"] == 200                      # latest is 12
    assert got[3]["val"] is None and got[3]["asof_ts"] is None
    assert got[4]["val"] is None                     # key never on right
    assert got[5]["val"] == 200                      # tie: <= includes
    assert got[5]["asof_ts"] == _ts("2024-01-12T00:00:00")
    # left columns survive untouched
    assert got[2]["k"] == "k1" and got[2]["ts"] == _ts(
        "2024-01-20T00:00:00"
    )


def test_asof_join_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "k", "ts", "rts", ["val"], strict=True
        ).collect()
    }
    assert got[5]["val"] == 100   # the 01-12 right row no longer matches
    assert got[1]["val"] == 100
    assert got[2]["val"] == 200   # 12 < 20 still matches


def test_asof_join_null_value_carries_not_leaks(spark):
    # the MATCHED right row's NULL value must come through as NULL —
    # per-column last-non-null would leak the older row's 100 here
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-15T00:00:00"))], ["event_id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-08T00:00:00"), 100),
            ("k1", _ts("2024-01-12T00:00:00"), None),  # matched, NULL val
        ],
        "k string, rts timestamp, val int",
    )
    got = asof_join(left, right, "k", "ts", "rts", ["val"]).collect()[0]
    assert got["asof_ts"] == _ts("2024-01-12T00:00:00")
    assert got["val"] is None


def test_asof_join_one_shuffle_no_python(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "k", "ts", "rts", ["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # exactly one hash exchange on the key (plus nothing else):
    # the union + window ride the same partitioning
    assert plan.count("hashpartitioning") <= 2, plan


def test_range_count_join_hand_values(spark):
    left = spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-01T00:00:00")),
            (11, "k1", _ts("2024-02-01T00:00:00")),
            (12, "k2", _ts("2024-01-01T00:00:00")),
        ],
        ["order_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-02T00:00:00")),
            ("k1", _ts("2024-01-30T23:59:59")),
            ("k1", _ts("2024-01-31T00:00:01")),  # outside 30d of 01-01
            ("k1", _ts("2023-12-31T23:59:59")),  # before window
        ],
        ["k", "rts"],
    )
    got = {
        r["order_id"]: r["n_in_window"]
        for r in range_count_join(
            left, right, "k", "ts", "rts", horizon_days=30
        ).collect()
    }
    assert got[10] == 2
    assert got[11] == 0
    assert got[12] == 0   # key with no right rows -> 0, not a lost row


def test_range_count_join_duplicate_left_rows_keep_row_grain(spark):
    # two byte-identical left rows must each produce an output row
    left = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T00:00:00")),
            ("k", _ts("2024-01-01T00:00:00")),
        ],
        ["k", "ts"],
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-02T00:00:00"))], ["k", "rts"]
    )
    got = range_count_join(
        left, right, "k", "ts", "rts", horizon_days=30
    ).collect()
    assert len(got) == 2
    assert sorted(r["n_in_window"] for r in got) == [1, 1]


def test_range_count_join_boundary_is_half_open(spark):
    # rts == left_ts counts; rts == left_ts + horizon does NOT
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T00:00:00")),
            ("k", _ts("2024-01-31T00:00:00")),
        ],
        ["k", "rts"],
    )
    got = range_count_join(
        left, right, "k", "ts", "rts", horizon_days=30
    ).collect()[0]
    assert got["n_in_window"] == 1


def test_asof_join_null_keys_never_match(spark):
    """Equi-join semantics for NULL keys (the r5 ADVICE hazard): a
    NULL-key RIGHT row matches nothing, and a NULL-key LEFT row is
    kept but always unmatched — before the fix the window's
    partitionBy grouped the NULL keys together and 'matched' them."""
    from soda_core_spark.operators.temporal_join import asof_join

    left = spark.createDataFrame(
        [(None, 10), (1, 10), (2, 10)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(None, 5, 99.0), (1, 5, 42.0)], "k int, ts int, v double"
    )
    got = {
        r["k"]: (r["asof_ts"], r["v"])
        for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    assert got[1] == (5, 42.0)          # normal match
    assert got[2] == (None, None)       # no right row for key 2
    assert got[None] == (None, None)    # NULL key: present, unmatched
