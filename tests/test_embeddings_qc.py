"""Embedding sanity checks (functions/embeddings_qc.py)."""

import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from soda_core_spark.functions.embeddings_qc import (
    l2_norm,
    with_embedding_diagnostics,
)


def _frame(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [
        (1, [3.0, 4.0]),                 # norm 5
        (2, None),                        # missing
        (3, [1.0, 2.0, 3.0]),             # wrong dim
        (4, [float("nan"), 1.0]),         # NaN
        (5, [0.0, 0.0]),                  # zero vector
    ]
    return spark.createDataFrame(rows, schema)


def test_diagnostics_flags(spark):
    out = with_embedding_diagnostics(_frame(spark), expected_dim=2)
    got = {
        r["vec_id"]: (
            r["dim"], r["dim_ok"], r["has_nan"], r["is_zero"],
            r["l2_norm"], r["vec_valid"],
        )
        for r in out.collect()
    }
    assert got[1] == (2, True, False, False, 5.0, True)
    assert got[2] == (0, False, False, True, 0.0, False)
    assert got[3] == (3, False, False, False, round(math.sqrt(14), 6), False)
    assert got[4][:4] == (2, True, True, True)
    assert got[4][4] is None and got[4][5] is False  # poisoned norm is NULL
    assert got[5] == (2, True, False, True, 0.0, False)


def test_norm_is_deterministic_fold(spark):
    df = _frame(spark).where(F.col("vec_id") == 1)
    a = df.select(l2_norm(F.col("embedding")).alias("n")).collect()[0]["n"]
    b = (
        df.repartition(4)
        .select(l2_norm(F.col("embedding")).alias("n"))
        .collect()[0]["n"]
    )
    assert a == b == 5.0


def test_diagnostics_are_shuffle_free(spark):
    plan = (
        with_embedding_diagnostics(_frame(spark), expected_dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


# -- embedding_anisotropy ------------------------------------------------------


def test_anisotropy_identical_vectors_is_one(spark):
    from soda_core_spark.functions.embeddings_qc import embedding_anisotropy

    df = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    r = embedding_anisotropy(df).collect()[0]
    assert r.n_vectors == 10 and r.dim == 2 and r.n_degenerate == 0
    assert r.mean_norm == pytest.approx(5.0)
    assert r.anisotropy == pytest.approx(1.0, abs=1e-6)


def test_anisotropy_orthonormal_basis_is_isotropic(spark):
    from soda_core_spark.functions.embeddings_qc import embedding_anisotropy

    # +e1, -e1, +e2, -e2: every pair is 0 or ±1, pairwise sum exactly
    # -4 over 12 pairs -> -1/3
    rows = [
        (1, [1.0, 0.0]), (2, [-1.0, 0.0]),
        (3, [0.0, 1.0]), (4, [0.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = embedding_anisotropy(df).collect()[0]
    assert r.anisotropy == pytest.approx(-1 / 3, abs=1e-6)


def test_anisotropy_matches_brute_force(spark):
    import itertools
    import math
    import random

    from soda_core_spark.functions.embeddings_qc import embedding_anisotropy

    rng = random.Random(161)
    vecs = [[rng.gauss(0.3, 1.0) for _ in range(8)] for _ in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    # brute force over float32-cast vectors (the table stores float)
    import numpy as np

    unit = [
        (np.array(v, dtype=np.float32).astype(np.float64)
         / np.linalg.norm(np.array(v, dtype=np.float32).astype(np.float64)))
        for v in vecs
    ]
    pair = [
        float(np.dot(a, b))
        for a, b in itertools.combinations(unit, 2)
    ]
    expected = 2 * sum(pair) / (40 * 39)
    r = embedding_anisotropy(df).collect()[0]
    assert r.anisotropy == pytest.approx(expected, abs=1e-5)


def test_anisotropy_degenerate_rows_excluded(spark):
    from soda_core_spark.functions.embeddings_qc import embedding_anisotropy

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 0.0]),   # zero norm
            (3, None),         # NULL
            (4, [1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    r = embedding_anisotropy(df).collect()[0]
    assert r.n_vectors == 2 and r.n_degenerate == 2
    assert r.anisotropy == pytest.approx(1.0, abs=1e-6)
    single = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    r2 = embedding_anisotropy(single).collect()[0]
    assert r2.n_vectors == 1 and r2.anisotropy is None


# -- participation_ratio -------------------------------------------------------


def test_participation_ratio_isotropic_and_collapsed(spark):
    from soda_core_spark.functions.embeddings_qc import participation_ratio

    schema = "embedding array<float>"
    # isotropic 2-d: C = diag(0.5, 0.5) -> PR = 2, fraction 1
    iso = spark.createDataFrame(
        [([1.0, 0.0],), ([-1.0, 0.0],), ([0.0, 1.0],), ([0.0, -1.0],)],
        schema,
    )
    r = participation_ratio(iso, dim=2).collect()[0]
    assert r.n == 4 and r.dim == 2 and r.n_degenerate == 0
    assert r.participation_ratio == pytest.approx(2.0, abs=1e-6)
    assert r.effective_rank_fraction == pytest.approx(1.0, abs=1e-6)
    # collapsed onto one axis: C = diag(1, 0) -> PR = 1, fraction 0.5
    flat = spark.createDataFrame([([1.0, 0.0],), ([-1.0, 0.0],)], schema)
    r2 = participation_ratio(flat, dim=2).collect()[0]
    assert r2.participation_ratio == pytest.approx(1.0, abs=1e-6)
    assert r2.effective_rank_fraction == pytest.approx(0.5, abs=1e-6)


def test_participation_ratio_degenerate_rows_and_empty(spark):
    from soda_core_spark.functions.embeddings_qc import participation_ratio

    schema = "embedding array<float>"
    df = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],), (None,), ([1.0, 2.0, 3.0],)],
        schema,
    )
    r = participation_ratio(df, dim=2).collect()[0]
    assert r.n == 2 and r.n_degenerate == 2
    # constant cloud: C = 0 -> PR undefined (NULL), tr_cov = 0
    const = spark.createDataFrame([([3.0, 3.0],), ([3.0, 3.0],)], schema)
    r2 = participation_ratio(const, dim=2).collect()[0]
    assert r2.tr_cov == 0.0 and r2.participation_ratio is None
    # empty frame with inferred dim
    empty = spark.createDataFrame([], schema)
    r3 = participation_ratio(empty).collect()[0]
    assert r3.n == 0 and r3.participation_ratio is None


# -- simplified_silhouette -----------------------------------------------------


def test_simplified_silhouette_separated_vs_mislabeled(spark):
    from soda_core_spark.functions.embeddings_qc import (
        simplified_silhouette,
    )

    schema = "embedding array<float>, label int"
    # two tight, well-separated clusters -> silhouette near 1
    good = spark.createDataFrame(
        [([0.0, 0.1], 0), ([0.0, -0.1], 0),
         ([10.0, 0.1], 1), ([10.0, -0.1], 1)],
        schema,
    )
    rows = {r.label: r for r in simplified_silhouette(good).collect()}
    assert rows[0].mean_silhouette > 0.9
    assert rows[0].nearest_label == 1 and rows[1].nearest_label == 0
    assert rows[0].p_negative == 0.0
    # a point sitting in the OTHER cluster scores negative
    bad = spark.createDataFrame(
        [([0.0, 0.1], 0), ([0.0, -0.1], 0), ([10.0, 0.0], 0),
         ([10.0, 0.1], 1), ([10.0, -0.1], 1)],
        schema,
    )
    r0 = {r.label: r for r in simplified_silhouette(bad).collect()}[0]
    assert r0.p_negative == pytest.approx(1 / 3, abs=1e-6)


def test_simplified_silhouette_single_label_is_null(spark):
    from soda_core_spark.functions.embeddings_qc import (
        simplified_silhouette,
    )

    df = spark.createDataFrame(
        [([1.0, 0.0], 7), ([0.0, 1.0], 7), (None, 7)],
        "embedding array<float>, label int",
    )
    r = simplified_silhouette(df).collect()[0]
    assert r.n_vecs == 2  # NULL vector excluded
    assert r.mean_silhouette is None and r.nearest_label is None
