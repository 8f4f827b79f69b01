"""Scan-result sinks: check-results + measurements tables."""

from datetime import datetime, timezone

from soda_core_spark import verify_contract
from soda_core_spark.plans.model import contract_from_dict
from soda_core_spark.sources.sinks import write_scan_results


def test_write_scan_results(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), (None, 2)], ["id", "n"])
    contract = contract_from_dict(
        {"dataset": "t", "checks": ["row_count"],
         "columns": [{"name": "id", "checks": ["missing"]}]}
    )
    result = verify_contract(spark, contract, df)
    ts = datetime(2026, 8, 16, tzinfo=timezone.utc)
    cr_path = str(tmp_path / "check_results")
    mm_path = str(tmp_path / "measurements")
    write_scan_results(spark, result, cr_path, mm_path, scan_ts=ts)
    # append a second scan — table accumulates
    write_scan_results(spark, result, cr_path, mm_path, scan_ts=ts)

    cr = spark.read.parquet(cr_path)
    assert cr.count() == 4  # 2 checks × 2 scans
    row = cr.where("check_type = 'missing'").first()
    assert row.outcome == "failed"
    assert row.failed_rows_count == 1
    assert row.failed_rows_percent == 50.0
    assert row.dataset_rows_tested == 2
    assert len(row.identity) == 16

    mm = spark.read.parquet(mm_path)
    assert mm.count() >= 4
    names = {r.metric_name for r in mm.collect()}
    # the shared unfiltered row count dedupes to one metric (first name wins)
    assert "missing_count(id)" in names
    assert "check_rows_tested" in names or "dataset_rows_tested" in names
