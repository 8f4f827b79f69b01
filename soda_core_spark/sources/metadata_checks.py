"""Metadata-only contract verification — footer statistics instead of a
data scan.

At 100 TB the cheapest scan is the one that never reads a row: parquet
footers already carry exact per-row-group row counts and null counts,
so ``row_count`` and ``missing`` (NULL-definition) checks can evaluate
from pure driver-side metadata I/O — milliseconds against any corpus
size, no executors involved. This is the engine's analogue of
metadata-driven monitoring on warehouse backends (the reference's
dataset row-count discovery reads catalog metadata the same way;
``data-source discover``, cli/cli.py:446-548) and of Iceberg's
manifest-level stats.

Semantics are deliberately conservative:

* ``row_count`` — exact from footers (parquet row counts are not
  optional statistics).
* ``missing`` with the default NULL definition and NO custom values /
  filter / column_expression — exact from footer ``null_count`` when
  every row group carries it; any row group without the statistic →
  NOT_EVALUATED (never a guess).
* every other check type (or a missing check with custom semantics) →
  NOT_EVALUATED with a "requires a data scan" message — run the full
  engine for those; the result object says exactly which checks still
  need it.

The outcome/threshold/identity machinery is the SAME code the scan
engine uses (operators/checks.py helpers), so a check passes here iff
it would pass a full scan when the statistics cover it.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from soda_core_spark.plans.model import Contract
from soda_core_spark.plans.results import (
    CheckOutcome,
    CheckResult,
    ContractVerificationResult,
    check_identity,
)


def parquet_footer_stats(path: str) -> tuple[int, dict[str, int | None]]:
    """(total_rows, {column: exact_null_count_or_None}) from parquet
    footers only. A column maps to None when ANY row group lacks the
    null-count statistic — partial statistics must not masquerade as
    exact counts."""
    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    total = 0
    nulls: dict[str, int | None] = {}
    for f in files:
        md = pq.read_metadata(f)
        total += md.num_rows
        names = list(md.schema.names)
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = names[ci]
                st = md.row_group(rg).column(ci).statistics
                if st is None or st.null_count is None:
                    nulls[col] = None
                elif nulls.get(col, 0) is not None:
                    nulls[col] = nulls.get(col, 0) + st.null_count
    return total, nulls


def parquet_footer_bounds(path: str) -> dict[str, tuple]:
    """{column: (min, max)} from footers; a column is absent when any
    row group lacks min-max statistics."""
    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    bounds: dict[str, tuple | None] = {}
    for f in files:
        md = pq.read_metadata(f)
        names = list(md.schema.names)
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = names[ci]
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    bounds[col] = None
                    continue
                cur = bounds.get(col)
                if cur is None and col in bounds:
                    continue
                lo = st.min if cur is None else min(cur[0], st.min)
                hi = st.max if cur is None else max(cur[1], st.max)
                bounds[col] = (lo, hi)
    return {c: b for c, b in bounds.items() if b is not None}


def _bounds_only_invalid(check) -> tuple | None:
    """(valid_min, valid_max) when the check's validity config is ONLY
    numeric bounds (either side optional) — the subset footer min/max
    can reason about; None otherwise."""
    v = getattr(check, "validity", None)
    if v is None:
        return None
    others = any(
        getattr(v, k, None) is not None
        for k in (
            "valid_values",
            "invalid_values",
            "valid_format",
            "invalid_format",
            "valid_min_length",
            "valid_max_length",
            "valid_length",
        )
    )
    lo = getattr(v, "valid_min", None)
    hi = getattr(v, "valid_max", None)
    if others or (lo is None and hi is None):
        return None
    if getattr(check, "filter", None) or getattr(check, "column_expression", None):
        return None
    return (lo, hi)


def _plain_missing(check) -> bool:
    """True when the check's missing semantics are exactly SQL NULL —
    the one definition footer null counts measure."""
    m = getattr(check, "missing", None)
    configured = m.is_configured() if m is not None else False
    return (
        not configured
        and not getattr(check, "filter", None)
        and not getattr(check, "column_expression", None)
    )


def verify_contract_metadata_only(
    spark: SparkSession, contract: Contract, path: str
) -> ContractVerificationResult:
    """Evaluate the metadata-expressible subset of ``contract`` against
    the parquet footers at ``path`` (file or directory). Returns the
    standard result object; checks needing a data scan come back
    NOT_EVALUATED with an explanatory message."""
    total, nulls = parquet_footer_stats(path)
    bounds = parquet_footer_bounds(path)
    results: list[CheckResult] = []
    for check in contract.all_checks():
        ident = check_identity(
            contract.dataset,
            check.type,
            check.column,
            check.qualifier,
            ",".join(check.columns) if check.columns else None,
        )
        value = None
        message = None
        diagnostics: dict = {"source": "parquet-footer"}
        if check.type == "row_count" and not getattr(check, "filter", None):
            value = float(total)
        elif check.type == "missing" and _plain_missing(check):
            nc = nulls.get(check.column) if check.column else None
            if check.column not in nulls:
                message = f"column {check.column!r} not in footer schema"
            elif nc is None:
                message = "footer null-count statistic incomplete"
            elif getattr(check, "metric", "") == "percent":
                value = 100.0 * nc / total if total else 0.0
            else:
                value = float(nc)
        elif check.type == "invalid" and _bounds_only_invalid(check):
            lo, hi = _bounds_only_invalid(check)
            b = bounds.get(check.column)
            if b is None:
                message = "footer min-max statistic unavailable"
            else:
                col_lo, col_hi = b
                try:
                    proven = (lo is None or float(col_lo) >= float(lo)) and (
                        hi is None or float(col_hi) <= float(hi)
                    )
                except (TypeError, ValueError):
                    proven = False
                    message = "column bounds are not numeric"
                if proven:
                    # the bounds PROVE zero out-of-range values; footers
                    # cannot COUNT violations, so anything else defers
                    value = 0.0
                    diagnostics["proof"] = f"bounds [{col_lo}, {col_hi}]"
                elif message is None:
                    message = (
                        "bounds cannot prove zero invalid — requires a "
                        "data scan"
                    )
        else:
            message = "requires a data scan (run verify_contract)"
        if value is None:
            outcome = CheckOutcome.NOT_EVALUATED
        elif check.threshold.passes(value):
            outcome = CheckOutcome.PASSED
        else:
            outcome = (
                CheckOutcome.WARNED
                if check.level == "warn"
                else CheckOutcome.FAILED
            )
        results.append(
            CheckResult(
                identity=ident,
                check_type=check.type,
                name=check.default_name(),
                column=check.column,
                outcome=outcome,
                metric_value=value,
                threshold=check.threshold.describe(),
                level=check.level,
                diagnostics=diagnostics,
                message=message,
                metric_unavailable=value is None,
            )
        )
    return ContractVerificationResult(
        dataset=contract.dataset, check_results=results, measurements=[]
    )
