"""Declarative contracts over the round-4 signal columns — the
integration story: signals attach as plain columns (mojibake, OOV,
per-language stopword density, embedding validity), then ordinary
contract checks threshold them. No new check types needed; this is the
north-star shape (heuristic rules as declarative definitions compiled
to column expressions)."""

from pyspark.sql import functions as F

from soda_core_spark import verify_contract
from soda_core_spark.plans.model import contract_from_dict
from soda_core_spark.plans.results import CheckOutcome


def test_webtext_signal_contract_end_to_end(spark):
    from soda_core_spark.functions.mojibake import mojibake_signals
    from soda_core_spark.operators.profiling import (
        top_vocabulary,
        with_oov_rate,
    )

    clean = "the cat sat on the mat and the dog sat too"
    moji = ("café " * 5).encode("utf-8").decode("latin-1")
    rows = [(1, clean), (2, clean + " extra"), (3, moji), (4, clean)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df = df.withColumns(
        {
            k: v
            for k, v in mojibake_signals(F.col("text")).items()
            if k in ("mojibake_ratio", "is_mojibake")
        }
    )
    df = with_oov_rate(df, top_vocabulary(df, k=10))

    contract = contract_from_dict(
        {
            "dataset": "web_docs",
            "checks": [
                # corpus-level gates over the signal columns
                {"metric": {"expression": "AVG(oov_rate)", "must_be_less_than": 0.5, "qualifier": "oov"}},
                {
                    "metric": {
                        "expression": (
                            "SUM(CASE WHEN is_mojibake THEN 1 ELSE 0 END)"
                        ),
                        "must_be_less_than": 2,
                        "qualifier": "moji",
                    }
                },
            ],
            "columns": [
                {
                    "name": "mojibake_ratio",
                    "checks": [
                        {"missing": {}},
                        {
                            "invalid": {
                                "valid_min": 0.0,
                                "valid_max": 1.0,
                            }
                        },
                    ],
                },
            ],
        }
    )
    result = verify_contract(spark, contract, df)
    assert all(
        r.outcome == CheckOutcome.PASSED for r in result.check_results
    ), [str(r) for r in result.check_results]


def test_embedding_contract_catches_corruption(spark):
    from pyspark.sql import types as T

    from soda_core_spark.functions.embeddings_qc import (
        with_embedding_diagnostics,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [(1, [1.0, 2.0]), (2, None), (3, [float("nan"), 0.5])]
    df = with_embedding_diagnostics(
        spark.createDataFrame(rows, schema), expected_dim=2
    )
    contract = contract_from_dict(
        {
            "dataset": "emb",
            "checks": [
                {
                    "metric": {
                        "expression": (
                            "SUM(CASE WHEN vec_valid THEN 0 ELSE 1 END)"
                        ),
                        "must_be": 0,
                    }
                }
            ],
        }
    )
    result = verify_contract(spark, contract, df)
    r = result.check_results[0]
    assert r.outcome == CheckOutcome.FAILED  # 2 invalid vectors
    assert r.metric_value == 2.0
