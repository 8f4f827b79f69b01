"""Approx duplicate flag + failed-rows sample collection."""

from pyspark.sql import types as T

from soda_core_spark import CheckOutcome, verify_contract
from soda_core_spark.operators.diagnostics import failed_rows_sample
from soda_core_spark.plans.model import contract_from_dict


def test_approx_duplicate(spark):
    df = spark.range(0, 10000).selectExpr("id % 1000 AS k")
    contract = contract_from_dict(
        {"dataset": "t", "columns": [{"name": "k", "checks": [
            {"duplicate": {"approx": True, "must_be_between": [8800, 9200]}}
        ]}]}
    )
    res = verify_contract(spark, contract, df)
    r = res.check_results[0]
    # exact dup = 10000 - 1000 = 9000; HLL rsd 1% stays inside the band
    assert r.outcome == CheckOutcome.PASSED, (r.metric_value, r.diagnostics)


def test_failed_rows_sample_missing_invalid_condition(spark):
    schema = T.StructType([
        T.StructField("id", T.StringType()), T.StructField("n", T.IntegerType()),
    ])
    df = spark.createDataFrame(
        [("a", 1), (None, -5), ("b", 200), ("a", 3)], schema
    )
    contract = contract_from_dict({
        "dataset": "t",
        "columns": [
            {"name": "id", "checks": ["missing", "duplicate"]},
            {"name": "n", "valid_min": 0, "valid_max": 100, "checks": ["invalid"]},
        ],
        "checks": [{"failed_rows": {"condition": "n < 0"}}],
    })
    checks = contract.all_checks()
    by = {c.type + (c.column or ""): c for c in checks}

    missing_rows = failed_rows_sample(contract, df, by["missingid"]).collect()
    assert len(missing_rows) == 1 and missing_rows[0].n == -5

    invalid_rows = failed_rows_sample(contract, df, by["invalidn"]).collect()
    assert {r.n for r in invalid_rows} == {-5, 200}

    cond_rows = failed_rows_sample(contract, df, by["failed_rows"]).collect()
    assert len(cond_rows) == 1

    dup_rows = failed_rows_sample(contract, df, by["duplicateid"]).collect()
    assert {r.id for r in dup_rows} == {"a"} and len(dup_rows) == 2

    # non-row-level check → None
    assert failed_rows_sample(
        contract, df,
        contract_from_dict({"dataset": "t", "checks": ["row_count"]}).checks[0],
    ) is None
