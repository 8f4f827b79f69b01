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
