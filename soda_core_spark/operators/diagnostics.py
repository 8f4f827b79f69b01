"""Failed-rows diagnostics: materialize the rows behind a failing check.

The reference streams failing rows through paged SELECTs with a 10k warn
threshold (failed_rows_check.py:314-372) and ships keys to a diagnostics
warehouse; here the same ask is one predicate + ``limit`` on the scan —
pushdown does the paging. Supported row-level checks: missing, invalid
(non-reference), failed_rows (condition form), duplicate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soda_core_spark.operators.compiler import (
    apply_scan_filter,
    check_filter_col,
    combined_key,
    is_invalid_col,
    is_missing_col,
    value_col,
)
from soda_core_spark.plans.model import CheckSpec, Contract


def failing_row_predicate(check: CheckSpec):
    """Row-level TRUE == this row fails the check; None if the check has
    no row-level form (schema, row_count, freshness, aggregate, metric)."""
    if check.type == "missing":
        return is_missing_col(check.column, check.missing, check.column_expression)
    if check.type == "invalid" and not check.validity.has_reference():
        return is_invalid_col(
            check.column, check.validity, check.missing, check.column_expression
        )
    if check.type == "failed_rows" and check.condition:
        return F.expr(check.condition)
    return None


def failed_rows_sample(
    contract: Contract,
    df: DataFrame,
    check: CheckSpec,
    limit: int = 100,
) -> Optional[DataFrame]:
    """Up to ``limit`` rows failing ``check`` under the contract + check
    filters. Duplicate checks return one row per member of a duplicate
    class (key occurs >1), found with a groupBy + semi join — no window
    sort."""
    scoped = apply_scan_filter(df, contract.filter)
    f = check_filter_col(check)
    if f is not None:
        scoped = scoped.where(f)

    if check.type == "duplicate":
        if check.columns:
            key = combined_key(list(check.columns))
        else:
            # the duplicate key must be the same value the check counted:
            # the column_expression when configured, else the raw column
            scoped = scoped.where(
                ~is_missing_col(check.column, check.missing, check.column_expression)
            )
            key = F.coalesce(
                value_col(check.column, check.column_expression).cast("string"),
                F.lit(""),
            )
        keyed = scoped.withColumn("__key", key)
        dups = (
            keyed.groupBy("__key")
            .count()
            .where(F.col("count") > 1)
            .select("__key")
        )
        return keyed.join(dups, "__key", "left_semi").drop("__key").limit(limit)

    pred = failing_row_predicate(check)
    if pred is None:
        return None
    return scoped.where(pred).limit(limit)
