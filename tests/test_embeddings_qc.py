"""Embedding sanity checks (functions/embeddings_qc.py)."""

import math

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
