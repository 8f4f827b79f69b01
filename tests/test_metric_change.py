"""Change-over-time checks over the local metrics sink
(operators/history.py)."""

import pytest

from soda_core_spark import verify_contract
from soda_core_spark.operators.checks import unregister_check_type
from soda_core_spark.operators.history import register_metric_change_check
from soda_core_spark.plans.model import contract_from_dict
from soda_core_spark.plans.results import CheckOutcome
from soda_core_spark.sources.sinks import write_scan_results


@pytest.fixture()
def change_check():
    register_metric_change_check(replace=True)
    yield
    unregister_check_type("metric_change")


def _contract(sink, mode="absolute", compare="last", bounds=(-5, 5)):
    return contract_from_dict(
        {
            "dataset": "docs",
            "checks": [
                {
                    "metric_change": {
                        "expression": "AVG(score)",
                        "must_be_between": list(bounds),
                        "attributes": {
                            "history": sink,
                            "mode": mode,
                            "compare": compare,
                            "n": 7,
                        },
                    }
                }
            ],
        }
    )


def test_bootstrap_then_stable_then_drift(spark, tmp_path, change_check):
    sink = str(tmp_path / "wh")
    df10 = spark.createDataFrame([(i, 10.0) for i in range(4)], ["id", "score"])

    # run 1: no history — NOT_EVALUATED, metric_unavailable, no crash
    r1 = verify_contract(spark, _contract(sink), df10)
    c1 = r1.check_results[0]
    assert c1.outcome == CheckOutcome.NOT_EVALUATED
    assert c1.metric_unavailable
    write_scan_results(spark, r1, sink)

    # the sink row for run 1 has metric_value NULL (unavailable) — run 2
    # still bootstraps, so seed a real metric row via a passing run... by
    # writing the current value into history through a second contract
    # run whose change evaluates once a numeric row exists. Simplest
    # seeding: record a plain metric check run with the same identity is
    # impossible (identities differ by type) — so run the change check
    # again after manually recording run 1's CURRENT as its metric_value.
    import pyspark.sql.functions as F

    h = spark.read.parquet(sink)
    seeded = spark.createDataFrame(
        h.withColumn(
            "metric_value",
            F.when(F.col("check_type") == "metric_change", 10.0).otherwise(
                F.col("metric_value")
            ),
        ).collect(),
        h.schema,
    )
    seeded.write.mode("overwrite").parquet(sink)

    # run 2: same data → change 0, PASSES
    r2 = verify_contract(spark, _contract(sink), df10)
    c2 = r2.check_results[0]
    assert c2.outcome == CheckOutcome.PASSED
    assert c2.metric_value == 0.0

    # run 3: data drifts beyond the band → FAILS; change = +20
    df30 = spark.createDataFrame([(i, 30.0) for i in range(4)], ["id", "score"])
    r3 = verify_contract(spark, _contract(sink), df30)
    c3 = r3.check_results[0]
    assert c3.outcome == CheckOutcome.FAILED
    assert c3.metric_value == 20.0


def test_percent_mode_and_mean_compare(spark, tmp_path, change_check):
    import datetime as dt

    import pyspark.sql.functions as F

    sink = str(tmp_path / "wh")
    # seed three historical rows for this identity: 8, 10, 12 (mean 10)
    base = verify_contract(
        spark,
        _contract(sink),
        spark.createDataFrame([(1, 10.0)], ["id", "score"]),
    )
    write_scan_results(spark, base, sink)
    h = spark.read.parquet(sink)
    rows = []
    for i, v in enumerate((8.0, 10.0, 12.0)):
        rows.append(
            h.withColumn("metric_value", F.lit(v)).withColumn(
                "scan_ts",
                F.lit(dt.datetime(2026, 8, 1 + i, tzinfo=dt.timezone.utc)),
            )
        )
    r = rows[0]
    for x in rows[1:]:
        r = r.unionByName(x)
    r = spark.createDataFrame(r.collect(), h.schema)
    r.write.mode("overwrite").parquet(sink)

    # current AVG(score)=11; mean baseline 10 → percent change +10%
    out = verify_contract(
        spark,
        _contract(sink, mode="percent", compare="mean", bounds=(-15, 15)),
        spark.createDataFrame([(1, 11.0)], ["id", "score"]),
    )
    c = out.check_results[0]
    assert c.outcome == CheckOutcome.PASSED
    assert c.metric_value == pytest.approx(10.0)


def test_validation_errors_isolate(spark, tmp_path, change_check):
    # missing history attr → that check NOT_EVALUATED, siblings fine
    contract = contract_from_dict(
        {
            "dataset": "docs",
            "checks": [
                {"metric_change": {"expression": "AVG(score)", "must_be": 0}},
                {"row_count": {"must_be_greater_than": 0}},
            ],
        }
    )
    df = spark.createDataFrame([(1, 1.0)], ["id", "score"])
    res = verify_contract(spark, contract, df)
    by_type = {r.check_type: r for r in res.check_results}
    assert by_type["metric_change"].outcome == CheckOutcome.NOT_EVALUATED
    assert by_type["row_count"].outcome == CheckOutcome.PASSED


# ---------------------------------------------------------------------------
# metric_anomaly (z-score over history)
# ---------------------------------------------------------------------------


@pytest.fixture()
def anomaly_check():
    from soda_core_spark.operators.history import (
        register_metric_anomaly_check,
    )

    register_metric_anomaly_check(replace=True)
    yield
    unregister_check_type("metric_anomaly")


def _anomaly_contract(sink, z=3.0, min_history=3):
    return contract_from_dict(
        {
            "dataset": "docs",
            "checks": [
                {
                    "metric_anomaly": {
                        "expression": "AVG(score)",
                        "must_be_less_than": z,
                        "attributes": {
                            "history": sink,
                            "min_history": min_history,
                        },
                    }
                }
            ],
        }
    )


def _seed_history(spark, sink, values):
    import datetime as dt

    import pyspark.sql.functions as F

    base = verify_contract(
        spark,
        _anomaly_contract(sink),
        spark.createDataFrame([(1, 1.0)], ["id", "score"]),
    )
    write_scan_results(spark, base, sink)
    h = spark.read.parquet(sink)
    frames = []
    for i, v in enumerate(values):
        frames.append(
            h.withColumn("metric_value", F.lit(float(v))).withColumn(
                "scan_ts",
                F.lit(dt.datetime(2026, 7, 1 + i, tzinfo=dt.timezone.utc)),
            )
        )
    out = frames[0]
    for x in frames[1:]:
        out = out.unionByName(x)
    out = spark.createDataFrame(out.collect(), h.schema)
    out.write.mode("overwrite").parquet(sink)


def test_anomaly_z_score(spark, tmp_path, anomaly_check):
    sink = str(tmp_path / "wh")
    _seed_history(spark, sink, [9.0, 10.0, 11.0])  # mean 10, sd ~0.8165

    # current 10.5 → z ≈ 0.61 → passes
    ok = verify_contract(
        spark,
        _anomaly_contract(sink),
        spark.createDataFrame([(1, 10.5)], ["id", "score"]),
    )
    assert ok.check_results[0].outcome == CheckOutcome.PASSED
    assert ok.check_results[0].metric_value == pytest.approx(0.6123724, abs=1e-5)

    # current 30 → z ≈ 24 → anomaly
    bad = verify_contract(
        spark,
        _anomaly_contract(sink),
        spark.createDataFrame([(1, 30.0)], ["id", "score"]),
    )
    assert bad.check_results[0].outcome == CheckOutcome.FAILED


def test_anomaly_needs_history_and_spread(spark, tmp_path, anomaly_check):
    sink = str(tmp_path / "wh")
    df = spark.createDataFrame([(1, 10.0)], ["id", "score"])

    # bootstrap: no history
    r = verify_contract(spark, _anomaly_contract(sink), df)
    assert r.check_results[0].outcome == CheckOutcome.NOT_EVALUATED
    assert r.check_results[0].metric_unavailable

    # constant history: zero spread → unavailable, not a crash
    _seed_history(spark, sink, [10.0, 10.0, 10.0])
    r2 = verify_contract(spark, _anomaly_contract(sink), df)
    assert r2.check_results[0].outcome == CheckOutcome.NOT_EVALUATED
    assert "zero spread" in (r2.check_results[0].message or "")
