"""Distributed logistic-regression distillation (operators/training.py)."""

from pyspark.sql import functions as F

from soda_core_spark.operators.training import (
    distill_quality_classifier,
    logreg_fit,
    logreg_score,
    standardize_stats,
)


def _sep_frame(spark):
    # linearly separable in one feature
    rows = [(i, float(i), 1.0 if i >= 5 else 0.0) for i in range(10)]
    return spark.createDataFrame(rows, ["id", "x", "y"])


def test_fit_learns_separable_boundary(spark):
    df = _sep_frame(spark)
    mu, sd = standardize_stats(df, ["x"])
    xs = (F.col("x") - F.lit(mu[0])) / F.lit(sd[0])
    w, b = logreg_fit(df, [xs], "y", lr=1.0, iterations=30)
    assert w[0] > 0  # higher x → keep
    scored = df.withColumn("p", logreg_score([xs], w, b))
    got = {r["id"]: r["p"] for r in scored.collect()}
    assert all(got[i] < 0.5 for i in range(5))
    assert all(got[i] > 0.5 for i in range(5, 10))


def test_standardize_stats_hand_values(spark):
    df = spark.createDataFrame(
        [(1.0, 7.0), (3.0, 7.0)], ["a", "c"]
    )
    mu, sd = standardize_stats(df, ["a", "c"])
    assert mu == [2.0, 7.0]
    assert sd[0] == 1.0  # pop stddev of {1,3}
    assert sd[1] == 1.0  # constant feature → guarded to 1.0


def test_weights_deterministic_across_partitionings(spark):
    df = _sep_frame(spark)
    w1, b1 = logreg_fit(df.repartition(1), ["x"], "y", iterations=5)
    w2, b2 = logreg_fit(df.repartition(7), ["x"], "y", iterations=5)
    assert (w1, b1) == (w2, b2)


def test_distill_end_to_end(spark):
    out = distill_quality_classifier(
        _sep_frame(spark), ["x"], "y", iterations=30
    )
    rows = out.collect()
    acc = sum(
        1 for r in rows if r["pred_keep"] == bool(r["y"])
    ) / len(rows)
    assert acc == 1.0
    assert set(out.columns) >= {"x", "y", "score", "pred_keep"}
