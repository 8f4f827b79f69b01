"""Operator-level check utilities (operators/checks.py): referential-integrity profile."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

# -- referential_integrity_profile ---------------------------------------------


def test_ri_profile_hand_values(spark):
    from soda_core_spark.operators.checks import (
        referential_integrity_profile,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = referential_integrity_profile(
        [(child, "fk", parent, "pk", "child->parent")]
    ).collect()[0]
    assert r.edge == "child->parent"
    assert r.n_child == 5 and r.n_null_fk == 1
    assert r.n_orphans == 2 and r.n_orphan_keys == 1  # 99 twice
    assert r.orphan_rate == pytest.approx(0.4)


def test_ri_profile_multi_edge_and_validation(spark):
    import pytest as _pytest

    from soda_core_spark.operators.checks import (
        referential_integrity_profile,
    )

    a = spark.createDataFrame([(1,), (2,)], "k int")
    p = spark.createDataFrame([(1,), (2,)], "p int")
    out = referential_integrity_profile(
        [(a, "k", p, "p", "clean"), (a, "k", p.where("p = 1"), "p", "dirty")]
    ).collect()
    by = {r.edge: r for r in out}
    assert by["clean"].n_orphans == 0 and by["clean"].orphan_rate == 0.0
    assert by["dirty"].n_orphans == 1
    with _pytest.raises(ValueError):
        referential_integrity_profile([])


# -- reconciliation_audit --------------------------------------------------------


def test_reconciliation_hand_values(spark):
    from soda_core_spark.operators.checks import reconciliation_audit

    parent = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 5.0), (4, None)],
        "k int, total double",
    )
    child = spark.createDataFrame(
        [(1, 4.0), (1, 6.0),     # matches 10.0
         (2, 50.0), (2, 48.0)],  # 98 != 99
        "k int, amt double",
    )
    r = reconciliation_audit(
        parent, "k", "total", child, "k", F.col("amt")
    ).collect()[0]
    assert r.n_parents == 4
    assert r.n_with_children == 2 and r.n_childless == 2
    assert r.n_matched == 1 and r.n_mismatched == 1
    assert r.max_abs_err == pytest.approx(1.0)
    assert r.mean_abs_err == pytest.approx(0.5)


def test_reconciliation_tolerance(spark):
    from soda_core_spark.operators.checks import reconciliation_audit

    parent = spark.createDataFrame([(1, 10.005)], "k int, total double")
    child = spark.createDataFrame([(1, 10.0)], "k int, amt double")
    tight = reconciliation_audit(
        parent, "k", "total", child, "k", F.col("amt"), tolerance=0.001
    ).collect()[0]
    loose = reconciliation_audit(
        parent, "k", "total", child, "k", F.col("amt"), tolerance=0.01
    ).collect()[0]
    assert tight.n_mismatched == 1 and loose.n_matched == 1
