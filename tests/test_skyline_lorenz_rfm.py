"""Pareto frontier / Lorenz deciles / RFM segments: hand values,
dominance and tie semantics."""

import datetime as dt

import pytest

from soda_core_spark.operators.profiling import (
    lorenz_deciles,
    pareto_frontier2d,
    rfm_segments,
)


def test_pareto_frontier_hand_values(spark):
    # (price, size): frontier = cheapest-and-biggest tradeoffs
    rows = [
        (1, 10.0, 5),   # frontier (cheapest)
        (2, 20.0, 7),   # frontier (pays more, gets more)
        (3, 25.0, 6),   # dominated by 2 (more expensive, smaller)
        (4, 30.0, 7),   # dominated by 2 (same size, more expensive)
        (5, 40.0, 9),   # frontier
        (6, 10.0, 4),   # dominated by 1 (same price, smaller)
    ]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = [
        (r["id"], r["price"], r["size"])
        for r in pareto_frontier2d(df, "price", "size", "id").collect()
    ]
    assert got == [(1, 10.0, 5), (2, 20.0, 7), (5, 40.0, 9)]


def test_pareto_frontier_duplicate_points_smallest_id(spark):
    rows = [(9, 10.0, 5), (1, 10.0, 5)]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = pareto_frontier2d(df, "price", "size", "id").collect()
    assert [(r["id"],) for r in got] == [(1,)]


def test_lorenz_deciles_uniform_and_shares(spark):
    # 20 keys with value = key: deciles of 2 keys each; shares are
    # cumulative triangular sums over 210
    rows = [(k, float(k)) for k in range(1, 21)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = lorenz_deciles(df, "k", "v").collect()
    assert [r["decile"] for r in got] == list(range(1, 11))
    assert all(r["n_keys"] == 2 for r in got)
    assert got[0]["decile_value"] == pytest.approx(3.0)   # 1+2
    assert got[-1]["cum_value_share"] == pytest.approx(1.0)
    # first decile share = 3/210
    assert got[0]["cum_value_share"] == pytest.approx(
        round(3 / 210, 6)
    )
    # monotone non-decreasing
    shares = [r["cum_value_share"] for r in got]
    assert shares == sorted(shares)


def test_rfm_segments_hand_values(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # 5 customers with strictly increasing recency/frequency/monetary:
    # customer i places i orders, last one i days after base, each
    # worth 100*i -> all three scores equal rank i
    for i in range(1, 6):
        for j in range(i):
            rows.append((i, base + dt.timedelta(days=i - j),
                         100.0 * i))
    df = spark.createDataFrame(rows, ["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    got = rfm_segments(df, buckets=5).collect()
    # perfectly aligned metrics -> diagonal cells only, one customer
    # each
    assert [(r["r_score"], r["f_score"], r["m_score"],
             r["n_customers"]) for r in got] == [
        (i, i, i, 1) for i in range(1, 6)
    ]
    assert got[4]["total_amount"] == pytest.approx(5 * 500.0)


def test_exact_ntiles_matches_window_ntile(spark):
    """_exact_ntiles must reproduce ntile() OVER (ORDER BY v, k)
    bit-for-bit: ties, NULL values (Spark sorts them FIRST), N not
    divisible by tiles, and N < tiles all covered. This is the
    provable-equivalence pin behind the q248/q249 rewrite."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from soda_core_spark.operators.profiling import _exact_ntiles

    rng = random.Random(7)
    for n_rows, tiles in ((157, 10), (23, 5), (3, 5), (40, 7)):
        rows = []
        for k in range(n_rows):
            v = rng.choice([None, 0, 1, 5, 5, 5, 17, 17, 1000, -3])
            rows.append((k, v))
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            (r["k"]): r["t"]
            for r in _exact_ntiles(df, [("v", "k", "t")], tiles)
            .select("k", "t")
            .collect()
        }
        w = Window.orderBy(F.col("v").asc_nulls_first(), F.col("k"))
        want = {
            r["k"]: r["t"]
            for r in df.select(
                "k", F.ntile(tiles).over(w).cast("long").alias("t")
            ).collect()
        }
        assert got == want, (n_rows, tiles)


def test_exact_ntiles_multi_spec_shared_sketch(spark):
    """Multiple specs over one frame (the rfm shape) each match their
    own window ntile."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from soda_core_spark.operators.profiling import _exact_ntiles

    rows = [(k, k % 13, (k * 7) % 5) for k in range(97)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out = _exact_ntiles(
        df, [("a", "k", "ta"), ("b", "k", "tb")], 4
    ).select("k", "ta", "tb")
    got = {r["k"]: (r["ta"], r["tb"]) for r in out.collect()}
    wa = Window.orderBy(F.col("a").asc_nulls_first(), F.col("k"))
    wb = Window.orderBy(F.col("b").asc_nulls_first(), F.col("k"))
    want = {
        r["k"]: (r["ta"], r["tb"])
        for r in df.select(
            "k",
            F.ntile(4).over(wa).cast("long").alias("ta"),
            F.ntile(4).over(wb).cast("long").alias("tb"),
        ).collect()
    }
    assert got == want


def test_rfm_segments_timestamp_intraday_ordering(spark):
    """Timestamps differing only within one day must still order the
    recency quintiles (the numeric encode is exact epoch micros, not
    truncated days)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # 4 customers, one order each, SAME day, strictly increasing time
    # of day; amounts/frequency identical -> r_score must follow the
    # intra-day order (tiebreak never reached)
    for i in range(1, 5):
        rows.append((i, base + dt.timedelta(minutes=i), 100.0))
    df = spark.createDataFrame(
        rows, ["o_custkey", "o_orderdate", "o_totalprice"]
    )
    got = rfm_segments(df, buckets=4).collect()
    # each cell has one customer; r_scores 1..4 all present
    assert sorted(r["r_score"] for r in got) == [1, 2, 3, 4]
