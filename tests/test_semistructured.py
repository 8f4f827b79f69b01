"""JSON payload-field audit (operators/semistructured.py)."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.semistructured import json_field_profile


def test_json_field_profile_hand_values(spark):
    df = spark.createDataFrame(
        [
            ("a", '{"k": 5}'),
            ("a", '{"k": 7, "other": 1}'),
            ("a", '{"other": 1}'),      # valid object, field absent
            ("a", 'not json'),           # malformed
            ("a", '[1, 2]'),             # valid JSON, not an object
            ("a", '{"k": "abc"}'),       # field present, not numeric
            ("a", None),                 # NULL payload
            ("b", '{"k": -3}'),
        ],
        ["event_type", "props"],
    )
    out = {r.group: r for r in
           json_field_profile(df, "props", "k").collect()}
    a = out["a"]
    assert a.n_rows == 7
    assert a.n_valid_json == 4   # three objects + {"k":"abc"}
    assert a.n_with_field == 2   # 5 and 7; "abc" is non-numeric
    assert a.f_min == 5 and a.f_max == 7 and a.f_avg == 6.0
    assert a.field_null_rate == pytest.approx(1 - 2 / 7, abs=1e-6)
    b = out["b"]
    assert b.n_with_field == 1 and b.f_min == -3


def test_json_field_profile_null_group_bucket(spark):
    df = spark.createDataFrame(
        [(None, '{"k": 1}'), ("x", '{"k": 2}')],
        ["event_type", "props"],
    )
    out = {r.group: r for r in
           json_field_profile(df, "props", "k").collect()}
    assert "<null>" in out and out["<null>"].n_with_field == 1


def test_json_field_profile_plan_one_fused_aggregate(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 5}')] * 10, ["event_type", "props"]
    )
    plan = (
        json_field_profile(df, "props", "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_json_key_census_hand_values(spark):
    from soda_core_spark.operators.semistructured import json_key_census

    df = spark.createDataFrame(
        [
            ("a", '{"k": 1, "x": 2}'),
            ("a", '{"k": 3}'),
            ("a", '{}'),           # valid object, zero keys
            ("a", 'broken'),       # -> <invalid>
            ("a", None),           # -> <invalid>
            ("b", '[1]'),          # non-object -> <invalid>
        ],
        ["event_type", "props"],
    )
    out = {(r.group, r.key): r for r in
           json_key_census(df, "props").collect()}
    assert out[("a", "k")].n_present == 2
    assert out[("a", "x")].n_present == 1
    assert out[("a", "<invalid>")].n_present == 2
    assert out[("a", "k")].n_rows == 5
    assert out[("a", "k")].presence_rate == 0.4
    assert out[("b", "<invalid>")].n_present == 1
    # the empty object contributes to n_rows but no key rows
    assert ("a", "") not in out


def test_json_key_census_null_group(spark):
    from soda_core_spark.operators.semistructured import json_key_census

    df = spark.createDataFrame(
        [(None, '{"z": 9}')], "event_type string, props string"
    )
    out = json_key_census(df, "props").collect()
    assert out[0].group == "<null>" and out[0].key == "z"
