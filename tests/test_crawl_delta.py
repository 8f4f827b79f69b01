"""Crawl delta: status adjudication, summary rollup, incremental work
set, and the single-join plan shape."""

from pyspark.sql import functions as F

from soda_core_spark.operators.crawl_delta import (
    crawl_delta,
    delta_summary,
    incremental_work_set,
)


def _frames(spark):
    old = spark.createDataFrame(
        [
            ("u1", "fp_a"),
            ("u2", "fp_b"),
            ("u3", "fp_c"),
            ("u5", None),
        ],
        ["url", "fingerprint"],
    )
    new = spark.createDataFrame(
        [
            ("u2", "fp_b"),       # unchanged
            ("u3", "fp_c2"),      # changed
            ("u4", "fp_d"),       # added
            ("u5", None),         # NULL == NULL is unchanged (null-safe)
        ],
        ["url", "fingerprint"],
    )
    return old, new


def test_statuses(spark):
    old, new = _frames(spark)
    got = {
        r["url"]: (r["status"], r["old_fp"], r["new_fp"])
        for r in crawl_delta(old, new).collect()
    }
    assert got["u1"] == ("removed", "fp_a", None)
    assert got["u2"] == ("unchanged", "fp_b", "fp_b")
    assert got["u3"] == ("changed", "fp_c", "fp_c2")
    assert got["u4"] == ("added", None, "fp_d")
    assert got["u5"][0] == "unchanged"
    assert len(got) == 5


def test_summary_counts(spark):
    old, new = _frames(spark)
    counts = {
        r["status"]: r["n_docs"]
        for r in delta_summary(crawl_delta(old, new)).collect()
    }
    assert counts == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}


def test_incremental_work_set(spark):
    old, new = _frames(spark)
    delta = crawl_delta(old, new)
    work = incremental_work_set(delta, new)
    assert sorted(r["url"] for r in work.collect()) == ["u3", "u4"]
    # the work rows are the NEW crawl's rows, full schema preserved
    assert work.columns == new.columns


def test_single_join_plan(spark):
    old, new = _frames(spark)
    plan = (
        crawl_delta(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
    assert "FullOuter" in plan
