"""Metadata-only (parquet-footer) contract verification
(sources/metadata_checks.py)."""

from pyspark.sql import functions as F

from soda_core_spark import verify_contract
from soda_core_spark.plans.model import contract_from_dict
from soda_core_spark.plans.results import CheckOutcome
from soda_core_spark.sources.metadata_checks import (
    parquet_footer_stats,
    verify_contract_metadata_only,
)


def _write(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else f"t{i}") for i in range(100)],
        ["id", "text"],
    )
    p = str(tmp_path / "docs")
    df.repartition(4).write.parquet(p)
    return p, df


CONTRACT = {
    "dataset": "docs",
    "checks": [{"row_count": {"must_be": 100}}],
    "columns": [
        {"name": "text", "checks": [{"missing": {"must_be": 20}}]},
        {"name": "id", "checks": [{"duplicate": {"must_be": 0}}]},
    ],
}


def test_footer_stats_exact(spark, tmp_path):
    p, _df = _write(spark, tmp_path)
    total, nulls = parquet_footer_stats(p)
    assert total == 100
    assert nulls["text"] == 20 and nulls["id"] == 0


def test_metadata_only_matches_full_scan(spark, tmp_path):
    p, df = _write(spark, tmp_path)
    contract = contract_from_dict(CONTRACT)
    meta = verify_contract_metadata_only(spark, contract, p)
    full = verify_contract(spark, contract, df)
    m = {r.identity: r for r in meta.check_results}
    f = {r.identity: r for r in full.check_results}
    for ident, fr in f.items():
        mr = m[ident]
        if mr.outcome != CheckOutcome.NOT_EVALUATED:
            # footer-evaluable checks agree with the scan engine exactly
            assert (mr.outcome, mr.metric_value) == (
                fr.outcome,
                fr.metric_value,
            ), fr.check_type
    # the duplicate check correctly defers to the scan engine
    dup = [r for r in meta.check_results if r.check_type == "duplicate"][0]
    assert dup.outcome == CheckOutcome.NOT_EVALUATED
    assert "data scan" in dup.message


def test_metadata_only_catches_violations(spark, tmp_path):
    p, _df = _write(spark, tmp_path)
    contract = contract_from_dict(
        {
            "dataset": "docs",
            "checks": [{"row_count": {"must_be_greater_than": 1000}}],
            "columns": [
                {"name": "text", "checks": [{"missing": {"must_be": 0}}]}
            ],
        }
    )
    res = verify_contract_metadata_only(spark, contract, p)
    assert all(
        r.outcome == CheckOutcome.FAILED for r in res.check_results
    )
    assert res.status == "failed"


def test_custom_missing_semantics_defer(spark, tmp_path):
    p, _df = _write(spark, tmp_path)
    contract = contract_from_dict(
        {
            "dataset": "docs",
            "columns": [
                {
                    "name": "text",
                    "checks": [
                        {"missing": {"missing_values": ["t1"], "must_be": 21}}
                    ],
                }
            ],
        }
    )
    res = verify_contract_metadata_only(spark, contract, p)
    r = res.check_results[0]
    assert r.outcome == CheckOutcome.NOT_EVALUATED
    assert r.metric_unavailable


def test_bounds_proven_invalid(spark, tmp_path):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                               ["id", "score"])
    p = str(tmp_path / "b")
    df.write.parquet(p)
    contract = contract_from_dict(
        {
            "dataset": "docs",
            "columns": [
                {
                    "name": "score",
                    "checks": [
                        # bounds [0, 49] prove zero invalid
                        {"invalid": {"valid_min": 0, "valid_max": 100,
                                     "must_be": 0, "qualifier": "wide"}},
                        # bounds CANNOT prove this one — defer
                        {"invalid": {"valid_min": 10, "valid_max": 100,
                                     "must_be": 0, "qualifier": "narrow"}},
                        # non-bounds validity always defers
                        {"invalid": {"valid_values": [1.0],
                                     "must_be": 0, "qualifier": "vals"}},
                    ],
                }
            ],
        }
    )
    res = verify_contract_metadata_only(spark, contract, p)
    by_q = {}
    for r in res.check_results:
        for q in ("wide", "narrow", "vals"):
            if q in r.identity or (r.name and q in r.name):
                by_q[q] = r
    # identities don't carry qualifier text; map by order instead
    wide, narrow, vals = res.check_results
    assert wide.outcome == CheckOutcome.PASSED and wide.metric_value == 0.0
    assert "proof" in wide.diagnostics
    assert narrow.outcome == CheckOutcome.NOT_EVALUATED
    assert "cannot prove" in narrow.message
    assert vals.outcome == CheckOutcome.NOT_EVALUATED


def test_cli_metadata_only(tmp_path, spark):
    import yaml

    from soda_core_spark.cli import main

    p, _df = _write(spark, tmp_path)
    cpath = tmp_path / "c.yml"
    cpath.write_text(yaml.safe_dump(CONTRACT))
    rc = main(
        ["contract", "verify", "-c", str(cpath), "-ds", f"docs={p}",
         "--metadata-only", "--use-active-session"]
    )
    assert rc == 0  # row_count + missing pass; duplicate deferred, not an error

    bad = dict(CONTRACT)
    bad["checks"] = [{"row_count": {"must_be": 1}}]
    bpath = tmp_path / "b.yml"
    bpath.write_text(yaml.safe_dump(bad))
    rc2 = main(
        ["contract", "verify", "-c", str(bpath), "-ds", f"docs={p}",
         "--metadata-only", "--use-active-session"]
    )
    assert rc2 == 1  # footer-proven failure


# ---------------------------------------------------------------------------
# Round-5: footer-stats freshness + schema join the no-scan path.
# ---------------------------------------------------------------------------


def _write_ts(spark, tmp_path, timestamp_type="TIMESTAMP_MICROS"):
    from datetime import datetime

    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 10, 0, 0), "a"),
            (2, datetime(2026, 1, 1, 11, 30, 0), "b"),
            (3, datetime(2026, 1, 1, 9, 15, 0), None),
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("event_ts", T.TimestampType()),
                T.StructField("label", T.StringType()),
            ]
        ),
    )
    p = str(tmp_path / "events")
    # INT96 (Spark's legacy default) writes NO min/max stats for
    # timestamps — the engine session pins TIMESTAMP_MICROS (cli.py
    # build_session) so its own tables keep the no-scan freshness path
    key = "spark.sql.parquet.outputTimestampType"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, timestamp_type)
    try:
        df.repartition(2).write.parquet(p)
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    return p, df


def test_footer_freshness_equals_full_scan(spark, tmp_path):
    from datetime import datetime, timezone

    p, df = _write_ts(spark, tmp_path)
    contract = contract_from_dict(
        {
            "dataset": "e",
            "columns": [
                {
                    "name": "event_ts",
                    "checks": [
                        {"freshness": {"unit": "minute",
                                       "must_be_less_than": 60}},
                        {"freshness": {"unit": "hour",
                                       "must_be_less_than": 1,
                                       "qualifier": "h"}},
                    ],
                }
            ],
        }
    )
    now = datetime(2026, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    meta = verify_contract_metadata_only(
        spark, contract, p, data_timestamp=now
    )
    full = verify_contract(spark, contract, df, data_timestamp=now)
    m = {r.identity: r for r in meta.check_results}
    for fr in full.check_results:
        mr = m[fr.identity]
        assert mr.outcome == fr.outcome, fr.name
        assert mr.metric_value == fr.metric_value, fr.name
        assert mr.diagnostics["maxTimestamp"] == fr.diagnostics["maxTimestamp"]
    assert m[full.check_results[0].identity].metric_value == 30


def test_footer_freshness_fails_without_data_timestamp(spark, tmp_path):
    p, _ = _write_ts(spark, tmp_path)
    contract = contract_from_dict(
        {"dataset": "e",
         "columns": [{"name": "event_ts", "checks": ["freshness"]}]}
    )
    res = verify_contract_metadata_only(spark, contract, p)
    # scan-path semantics: max known, "now" unknown → FAILED outright
    assert res.check_results[0].outcome == CheckOutcome.FAILED
    assert "data_timestamp" in res.check_results[0].message


def test_footer_schema_equals_full_scan(spark, tmp_path):
    p, df = _write_ts(spark, tmp_path)
    for cols in (
        # matching contract
        [{"name": "id", "data_type": "bigint"},
         {"name": "event_ts", "data_type": "timestamp"},
         {"name": "label", "data_type": "string"}],
        # type mismatch + missing declared + extra actual
        [{"name": "id", "data_type": "int"},
         {"name": "event_ts", "data_type": "timestamp"},
         {"name": "nope", "data_type": "string"}],
    ):
        contract = contract_from_dict(
            {"dataset": "e", "checks": ["schema"], "columns": cols}
        )
        meta = verify_contract_metadata_only(spark, contract, p)
        full = verify_contract(spark, contract, df)
        mr = meta.check_results[0]
        fr = full.check_results[0]
        assert mr.outcome == fr.outcome
        assert mr.metric_value == fr.metric_value
        for k in ("missingColumns", "extraColumns", "typeMismatches",
                  "orderMismatch"):
            assert mr.diagnostics[k] == fr.diagnostics[k], k


def test_footer_schema_mixed_directory_defers(spark, tmp_path):
    import os

    p = str(tmp_path / "mixed")
    os.makedirs(p)
    spark.createDataFrame([(1,)], "id long").write.parquet(p + "/a.parquet")
    spark.createDataFrame([(1, "x")], "id long, label string") \
        .write.parquet(p + "/b.parquet")
    # flatten: move part files up so the dir holds two conflicting files
    import glob as g
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(
        g.glob(p + "/a.parquet/*.parquet") + g.glob(p + "/b.parquet/*.parquet")
    ):
        shutil.copy(f, f"{flat}/part-{i}.parquet")
    contract = contract_from_dict(
        {"dataset": "e", "checks": ["schema"],
         "columns": [{"name": "id", "data_type": "bigint"}]}
    )
    res = verify_contract_metadata_only(spark, contract, flat)
    assert res.check_results[0].outcome == CheckOutcome.NOT_EVALUATED
    assert "disagree" in res.check_results[0].message


def test_footer_freshness_int96_defers_conservatively(spark, tmp_path):
    from datetime import datetime, timezone

    # legacy INT96 timestamps carry no footer min/max → NOT_EVALUATED,
    # never a guess (the missing-check conservatism, same rule)
    p, _ = _write_ts(spark, tmp_path, timestamp_type="INT96")
    contract = contract_from_dict(
        {"dataset": "e",
         "columns": [{"name": "event_ts",
                      "checks": [{"freshness": {"unit": "minute",
                                                "must_be_less_than": 60}}]}]}
    )
    res = verify_contract_metadata_only(
        spark, contract, p,
        data_timestamp=datetime(2026, 1, 1, 12, tzinfo=timezone.utc),
    )
    assert res.check_results[0].outcome == CheckOutcome.NOT_EVALUATED
    assert "min-max" in res.check_results[0].message
