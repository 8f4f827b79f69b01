"""Spearman matrix / Cramér's V / MAD outliers / vocabulary richness /
knn hubness: hand values, python twins, tie + NULL semantics."""

import math

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.profiling import (
    _avg_rank_table,
    cramers_v,
    mad_outlier_audit,
    spearman_matrix,
    vocabulary_richness,
)
from soda_core_spark.operators.similarity import knn_hubness


def _py_avg_ranks(values):
    """Sorted-list twin: average 1-based rank per distinct value."""
    s = sorted(values)
    out = {}
    for v in set(values):
        lo = s.index(v) + 1
        hi = lo + s.count(v) - 1
        out[v] = (lo + hi) / 2.0
    return out


def _py_spearman(xs, ys):
    rx, ry = _py_avg_ranks(xs), _py_avg_ranks(ys)
    a = [rx[x] for x in xs]
    b = [ry[y] for y in ys]
    n = len(a)
    sx, sy = sum(a), sum(b)
    sxy = sum(p * q for p, q in zip(a, b))
    sxx = sum(p * p for p in a)
    syy = sum(q * q for q in b)
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den


def test_avg_rank_table_ties_are_half_integers(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {
        r["__v"]: r["__rank"]
        for r in _avg_rank_table(df, "x", buckets=3).collect()
    }
    assert got == _py_avg_ranks(vals)


def test_avg_rank_table_single_bucket_matches(spark):
    vals = [2.0, 2.0, 2.0, 7.0]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {
        r["__v"]: r["__rank"]
        for r in _avg_rank_table(df, "x", buckets=1).collect()
    }
    assert got == {2.0: 2.0, 7.0: 4.0}


def test_spearman_monotone_nonlinear_is_one(spark):
    # y = x^3 is monotone: rho must be exactly 1 even though Pearson
    # r < 1
    rows = [(float(x), float(x) ** 3) for x in range(1, 30)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = spearman_matrix(df, ["a", "b"]).collect()
    assert len(got) == 1
    assert got[0]["col_a"] == "a" and got[0]["col_b"] == "b"
    assert got[0]["rho"] == pytest.approx(1.0, abs=1e-9)
    assert got[0]["n"] == 29


def test_spearman_with_ties_matches_python_twin(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 4.0, 5.0]
    ys = [10.0, 9.0, 11.0, 8.0, 7.0, 7.5, 6.0, 5.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["a", "b"])
    got = spearman_matrix(df, ["a", "b"]).collect()[0]
    assert got["rho"] == pytest.approx(
        round(_py_spearman(xs, ys), 6), abs=1e-9
    )


def test_spearman_listwise_null_policy(spark):
    rows = [
        (1.0, 1.0, 1.0),
        (2.0, 2.0, None),  # dropped: NULL in any column
        (3.0, 3.0, 3.0),
        (4.0, 4.0, 2.0),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = spearman_matrix(df, ["a", "b", "c"]).collect()
    by_pair = {(r["col_a"], r["col_b"]): r for r in got}
    assert all(r["n"] == 3 for r in got)
    assert by_pair[("a", "b")]["rho"] == pytest.approx(1.0)


def test_cramers_v_perfect_association(spark):
    rows = [("x", "p")] * 5 + [("y", "q")] * 7
    df = spark.createDataFrame(rows, ["a", "b"])
    got = cramers_v(df, "a", "b").collect()[0]
    assert got["n"] == 12
    assert got["dof"] == 1
    assert got["v"] == pytest.approx(1.0, abs=1e-9)
    # chi2 == n for a perfect 2x2
    assert got["chi2"] == pytest.approx(12.0, abs=1e-6)


def test_cramers_v_independence_and_nulls(spark):
    # perfectly balanced 2x2 -> chi2 = 0, v = 0; NULL rows excluded
    rows = (
        [("x", "p")] * 3 + [("x", "q")] * 3
        + [("y", "p")] * 3 + [("y", "q")] * 3
        + [(None, "p"), ("x", None)]
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    got = cramers_v(df, "a", "b").collect()[0]
    assert got["n"] == 12
    assert got["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert got["v"] == pytest.approx(0.0, abs=1e-9)


def test_cramers_v_degenerate_single_category(spark):
    # one-category column: mindim = 0 -> v NULL, dof 0
    df = spark.createDataFrame([("x", "p"), ("x", "q")], ["a", "b"])
    got = cramers_v(df, "a", "b").collect()[0]
    assert got["dof"] == 0
    assert got["v"] is None


def test_mad_outlier_audit_hand_values(spark):
    # group g: median 10, adevs [0,1,1,2,90] -> MAD 1,
    # fence 3*1.4826*1 = 4.4478 -> exactly one outlier (100)
    rows = [("g", 10.0), ("g", 9.0), ("g", 11.0), ("g", 12.0),
            ("g", 100.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = mad_outlier_audit(df, "k", "v").collect()[0]
    assert got["n"] == 5
    assert got["median"] == pytest.approx(11.0)
    assert got["mad"] == pytest.approx(1.0)
    assert got["n_outliers"] == 1
    assert got["outlier_share"] == pytest.approx(0.2)


def test_mad_outlier_audit_constant_group(spark):
    # constant column: mad = 0, nothing exceeds a zero fence
    rows = [("c", 5.0)] * 4
    df = spark.createDataFrame(rows, ["k", "v"])
    got = mad_outlier_audit(df, "k", "v").collect()[0]
    assert got["mad"] == 0.0 and got["n_outliers"] == 0


def test_vocabulary_richness_hand_values(spark):
    # "a a b": N=3, V=2, m2=5 -> K = 1e4*(5-3)/9 = 2222.2222
    #                            D = 2/(3*2) = 0.33333333
    df = spark.createDataFrame(
        [("s1", "a a b"), ("s2", "x y z")], ["source", "text"]
    )
    got = {r["source"]: r for r in
           vocabulary_richness(df, "source", "text").collect()}
    assert got["s1"]["n_tokens"] == 3 and got["s1"]["vocab"] == 2
    assert got["s1"]["yule_k"] == pytest.approx(2222.2222, abs=1e-3)
    assert got["s1"]["simpson_d"] == pytest.approx(1 / 3, abs=1e-6)
    # all-distinct tokens: K = 0, D = 0
    assert got["s2"]["yule_k"] == pytest.approx(0.0)
    assert got["s2"]["simpson_d"] == pytest.approx(0.0)


def test_knn_hubness_matches_numpy_twin(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(12, 6).astype("float32")
    k = 3
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = knn_hubness(df, k=k).collect()[0]

    v = vecs.astype("float64")
    norms = np.linalg.norm(v, axis=1)
    sims = (v @ v.T) / np.outer(norms, norms)
    occ = np.zeros(len(v), dtype=int)
    for q in range(len(v)):
        order = sorted(
            (i for i in range(len(v)) if i != q),
            key=lambda i: (-sims[q, i], i),
        )
        for i in order[:k]:
            occ[i] += 1
    assert got["n_vectors"] == 12
    assert got["sum_occ"] == 12 * k == int(occ.sum())
    assert got["max_occ"] == int(occ.max())
    assert got["n_antihubs"] == int((occ == 0).sum())
    assert got["n_hubs"] == int((occ >= 2 * k).sum())
    n = float(len(v))
    m = occ.mean()
    m2 = ((occ - m) ** 2).mean()
    m3 = ((occ - m) ** 3).mean()
    expect = round(m3 / m2**1.5, 4) if m2 > 0 else None
    assert got["occ_skewness"] == pytest.approx(expect, abs=1e-9)
