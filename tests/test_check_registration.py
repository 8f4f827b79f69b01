"""Public check-type registration — the Spark twin of the reference's
paired plugin registries (CheckImpl.register
contract_verification_impl.py:1049-1058; CheckYaml.register
contract_yaml.py:619-628). A registered type must work end-to-end:
YAML text → contract_from_yaml → verify_contract → fused metrics →
CheckResult."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark import (
    CheckOutcome,
    CheckResult,
    register_check_type,
    unregister_check_type,
    verify_contract,
)
from soda_core_spark.operators.checks import AggMetric, CheckPlan
from soda_core_spark.plans.model import (
    CheckSpec,
    ContractParseError,
    Threshold,
    contract_from_yaml,
)
from soda_core_spark.plans.results import check_identity


def _plan_starts_with(check, ctx):
    prefix = check.attributes.get("prefix", "")
    key = f"starts_with|{check.column}|{prefix}"
    m = AggMetric(
        key,
        f"starts_with({check.column})",
        lambda: F.sum(
            F.when(F.col(check.column).startswith(prefix), F.lit(1)).otherwise(0)
        ),
        True,
    )

    def evaluate(values, ctx):
        v = values.get(key)
        if v is None:
            outcome = CheckOutcome.NOT_EVALUATED
        elif check.threshold.passes(v):
            outcome = CheckOutcome.PASSED
        else:
            outcome = CheckOutcome.FAILED
        return CheckResult(
            identity=check_identity(
                ctx.contract.dataset, check.type, check.column, check.qualifier
            ),
            check_type=check.type,
            name=check.default_name(),
            column=check.column,
            outcome=outcome,
            metric_value=v,
            threshold=check.threshold.describe(),
        )

    return CheckPlan(check, metrics=[m], evaluate=evaluate)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(i, f"u{i}" if i % 2 else f"x{i}") for i in range(10)],
        "id bigint, name string",
    )


CONTRACT = """
dataset: reg_people
columns:
  - name: name
    checks:
      - starts_with:
          attributes:
            prefix: "u"
          must_be: 5
checks:
  - row_count:
      must_be: 10
"""


def test_unknown_type_rejected_before_registration():
    with pytest.raises(ContractParseError, match="starts_with"):
        contract_from_yaml(CONTRACT)


def test_register_check_type_end_to_end(spark, people):
    register_check_type("starts_with", _plan_starts_with)
    try:
        c = contract_from_yaml(CONTRACT)
        res = verify_contract(spark, c, people)
        by_type = {r.check_type: r for r in res.check_results}
        assert by_type["row_count"].outcome == CheckOutcome.PASSED
        sw = by_type["starts_with"]
        assert sw.outcome == CheckOutcome.PASSED
        assert sw.metric_value == 5
        assert sw.column == "name"
        # the custom metric fused into the same scan — it appears among
        # the measurements like any built-in metric
        assert any(m.metric_name.startswith("starts_with") for m in res.measurements)
    finally:
        unregister_check_type("starts_with")
    # unregistration restores the parse error
    with pytest.raises(ContractParseError):
        contract_from_yaml(CONTRACT)


def test_register_custom_yaml_parser(spark, people):
    """A custom yaml_parser replaces the generic body parsing entirely
    (reference CheckYaml.register dispatches parsing per type)."""

    def parse_starts_with(type_name, body, column):
        return CheckSpec(
            type=type_name,
            column=column.name if column is not None else body.get("column"),
            threshold=Threshold(must_be=float(body["expected"])),
            attributes={"prefix": body["prefix"]},
        )

    register_check_type(
        "starts_with", _plan_starts_with, yaml_parser=parse_starts_with
    )
    try:
        c = contract_from_yaml(
            """
dataset: reg_people2
columns:
  - name: name
    checks:
      - starts_with:
          prefix: "x"
          expected: 5
"""
        )
        res = verify_contract(spark, c, people)
        assert res.check_results[0].outcome == CheckOutcome.PASSED
        assert res.check_results[0].metric_value == 5
    finally:
        unregister_check_type("starts_with")


def test_register_conflicts():
    with pytest.raises(ValueError, match="already registered"):
        register_check_type("missing", _plan_starts_with)
    register_check_type("starts_with", _plan_starts_with)
    try:
        with pytest.raises(ValueError, match="already registered"):
            register_check_type("starts_with", _plan_starts_with)
        register_check_type("starts_with", _plan_starts_with, replace=True)
    finally:
        unregister_check_type("starts_with")


def test_override_builtin_and_restore(spark, people):
    """replace=True on a BUILT-IN overrides both the planner and (when a
    yaml_parser is given) the parsing; unregister restores the original
    behavior instead of deleting the type."""
    from soda_core_spark.operators.checks import CHECK_PLANNERS, plan_row_count

    def parse_row_count(type_name, body, column):
        return CheckSpec(
            type=type_name, threshold=Threshold(must_be=float(body["exactly"]))
        )

    def plan_constant(check, ctx):
        def evaluate(values, ctx):
            return CheckResult(
                identity=check_identity(ctx.contract.dataset, check.type, None, None),
                check_type=check.type,
                name="constant",
                column=None,
                outcome=CheckOutcome.PASSED,
                metric_value=-1,
            )

        return CheckPlan(check, evaluate=evaluate)

    register_check_type(
        "row_count", plan_constant, yaml_parser=parse_row_count, replace=True
    )
    try:
        c = contract_from_yaml(
            "dataset: ov_people\nchecks:\n  - row_count:\n      exactly: 10\n"
        )
        assert c.checks[0].threshold.must_be == 10.0  # custom parser ran
        res = verify_contract(spark, c, people)
        assert res.check_results[0].metric_value == -1  # custom planner ran
    finally:
        unregister_check_type("row_count")
    assert CHECK_PLANNERS["row_count"] is plan_row_count
    # generic parsing is back: 'exactly' is not a standard key
    c2 = contract_from_yaml(
        "dataset: ov_people\nchecks:\n  - row_count:\n      must_be: 10\n"
    )
    res2 = verify_contract(spark, c2, people)
    assert res2.check_results[0].metric_value == 10


def test_reregister_builtin_without_parser_restores_generic_parsing(spark, people):
    """Re-registering a built-in WITHOUT a yaml_parser must restore the
    generic parsing, not keep a stale custom parser (review finding)."""
    from soda_core_spark.operators.checks import plan_row_count

    def parse_exactly(type_name, body, column):
        return CheckSpec(
            type=type_name, threshold=Threshold(must_be=float(body["exactly"]))
        )

    register_check_type(
        "row_count", plan_row_count, yaml_parser=parse_exactly, replace=True
    )
    try:
        register_check_type("row_count", plan_row_count, replace=True)
        # generic keys parse again; 'exactly' would now be ignored/rejected
        c = contract_from_yaml(
            "dataset: rr_people\nchecks:\n  - row_count:\n      must_be: 10\n"
        )
        assert c.checks[0].threshold.must_be == 10.0
        res = verify_contract(spark, c, people)
        assert res.check_results[0].metric_value == 10
    finally:
        unregister_check_type("row_count")
