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
