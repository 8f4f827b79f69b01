"""Threshold sweep: hand-computed confusion cells, NULL exclusion,
monotonicity, and the tiny-aggregate plan shape."""
import pytest

from pyspark.sql import functions as F

from soda_core_spark.operators.calibration import threshold_sweep


def _sweep_rows(spark, rows, n_bins=4):
    df = spark.createDataFrame(rows, ["score", "label"])
    out = threshold_sweep(
        df, F.col("score"), F.col("label"), n_bins=n_bins
    ).collect()
    return {round(r["threshold"], 6): r for r in out}


def test_hand_confusion(spark):
    # scores in quarters; labels chosen so every cell is exercised
    rows = [
        (0.10, 0),  # low score, negative
        (0.10, 1),  # low score, positive (missed at high thresholds)
        (0.40, 0),
        (0.60, 1),
        (0.90, 1),
        (0.90, 0),
    ]
    by_t = _sweep_rows(spark, rows, n_bins=4)
    assert set(by_t) == {0.0, 0.25, 0.5, 0.75, 1.0}
    # t=0.0: everything predicted positive
    r0 = by_t[0.0]
    assert (r0["tp"], r0["fp"], r0["fn"], r0["tn"]) == (3, 3, 0, 0)
    assert r0["recall"] == 1.0 and r0["precision"] == 0.5
    # t=0.5: scores {0.6, 0.9, 0.9} predicted positive
    r5 = by_t[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (2, 1, 1, 2)
    assert r5["precision"] == round(2 / 3, 6)
    assert r5["recall"] == round(2 / 3, 6)
    assert r5["f1"] == round(4 / 6, 6)
    # t=1.0: nothing reaches score >= 1.0 → empty prediction, NULL P/F1
    r1 = by_t[1.0]
    assert (r1["tp"], r1["fp"], r1["fn"], r1["tn"]) == (0, 0, 3, 3)
    assert r1["precision"] is None and r1["recall"] == 0.0
    # F1's denominator (pp + tot_pos = 3) is nonzero, so F1 is a real 0.0
    # (NULL only when there are neither predictions nor positives)
    assert r1["f1"] == 0.0


def test_boundary_is_inclusive(spark):
    # score exactly at a threshold counts as predicted-positive there
    by_t = _sweep_rows(spark, [(0.25, 1)], n_bins=4)
    assert by_t[0.25]["tp"] == 1
    assert by_t[0.5]["tp"] == 0


def test_null_rows_excluded(spark):
    rows = [(0.9, 1), (None, 1), (0.9, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = threshold_sweep(df, F.col("score"), F.col("label"), n_bins=2)
    r = {round(x["threshold"], 6): x for x in out.collect()}
    # only the (0.9, 1) row counts
    assert (r[0.0]["tp"], r[0.0]["fp"], r[0.0]["fn"], r[0.0]["tn"]) == (
        1,
        0,
        0,
        0,
    )


def test_monotone_and_complete(spark):
    import itertools

    rows = [
        (i / 37.0, (i * 7) % 3 == 0) for i in range(38)
    ]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = (
        threshold_sweep(df, F.col("score"), F.col("label").cast("int"), 10)
        .orderBy("threshold")
        .collect()
    )
    assert len(out) == 11
    # every row partitions the corpus: tp+fp+fn+tn == n
    for r in out:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 38
    # predicted-positive mass shrinks as the threshold rises
    for a, b in itertools.pairwise(out):
        assert a["tp"] >= b["tp"]
        assert a["tp"] + a["fp"] >= b["tp"] + b["fp"]


def test_single_corpus_pass_plan(spark):
    # the corpus-side plan must contain exactly ONE aggregate over the
    # input scan; everything downstream operates on the tiny grid
    df = spark.range(1000).select(
        (F.col("id") / 1000.0).alias("score"),
        (F.col("id") % 2).alias("label"),
    )
    plan = threshold_sweep(
        df, F.col("score"), F.col("label"), 20
    )._jdf.queryExecution().optimizedPlan().toString()
    # the input relation is referenced by exactly two leaves: the bucket
    # aggregate and the totals aggregate (both partial-agg absorbed);
    # no join touches raw rows
    assert plan.count("Range (0, 1000") <= 2


def test_group_thresholds_hand_computed(spark):
    # group A: values 0..9 -> 10% quantile (quantile_cont) = 0.9;
    # drops v < 0.9 -> just v=0 -> realized 0.1
    # group B: values 100,200,300,400 -> q0.1 = 130; drops 100 -> 0.25
    from soda_core_spark.operators.calibration import (
        calibrate_group_thresholds,
    )

    rows = [("A", float(v)) for v in range(10)] + [
        ("B", v) for v in (100.0, 200.0, 300.0, 400.0)]
    df = spark.createDataFrame(rows, "lang string, sig double")
    out = {r.group: r for r in calibrate_group_thresholds(
        df, "lang", "sig", direction="low", target_drop=0.1).collect()}
    assert out["A"].threshold == 0.9 and out["A"].n_dropped == 1
    assert out["A"].realized_drop == 0.1
    assert out["B"].threshold == 130.0 and out["B"].n_dropped == 1
    assert out["B"].realized_drop == 0.25


def test_group_thresholds_high_direction_and_nulls(spark):
    from soda_core_spark.operators.calibration import (
        calibrate_group_thresholds,
    )

    rows = [("A", float(v)) for v in range(10)] + [("A", None)]
    df = spark.createDataFrame(rows, "lang string, sig double")
    out = calibrate_group_thresholds(
        df, "lang", "sig", direction="high", target_drop=0.1
    ).collect()[0]
    # percentile ignores the NULL: q0.9 of 0..9 = 8.1; drops v > 8.1
    # -> just 9; NULL is never dropped but counts in n
    assert out.threshold == 8.1 and out.n_dropped == 1 and out.n == 11
    assert out.realized_drop == round(1 / 11, 6)


def test_group_thresholds_validation(spark):
    from soda_core_spark.operators.calibration import (
        calibrate_group_thresholds,
    )

    df = spark.createDataFrame([("A", 1.0)], "lang string, sig double")
    with pytest.raises(ValueError):
        calibrate_group_thresholds(df, "lang", "sig", direction="sideways")
    with pytest.raises(ValueError):
        calibrate_group_thresholds(df, "lang", "sig", target_drop=1.5)


def test_token_budget_curve(spark):
    import pytest
    from pyspark.sql import functions as F

    from soda_core_spark.operators.calibration import token_budget_curve

    df = spark.createDataFrame(
        [
            (0.9, 100), (0.9, 50),      # best grain: 150 tokens
            (0.5, 200),                 # cum 350
            (0.2, 500),                 # cum 850 — breaks a 400 budget
            (None, 999),                # NULL score excluded
            (0.5, None),                # NULL tokens cost 0
        ],
        ["score", "toks"],
    )
    rows = token_budget_curve(
        df, F.col("score"), F.col("toks"), budget=400
    ).collect()
    assert [r["score"] for r in rows] == [0.9, 0.5, 0.2]
    assert [r["cum_tokens"] for r in rows] == [150, 350, 850]
    assert [r["cum_docs"] for r in rows] == [2, 4, 5]
    assert [r["within_budget"] for r in rows] == [True, True, False]
    with pytest.raises(ValueError, match="budget"):
        token_budget_curve(df, F.col("score"), F.col("toks"), budget=0)
    with pytest.raises(ValueError, match="precision"):
        token_budget_curve(
            df, F.col("score"), F.col("toks"), budget=1, precision=9
        )
