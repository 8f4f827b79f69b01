"""Verification engine: contract + DataFrame → one fused scan → results.

The reference's lifecycle (SURVEY §3.1): parse → plan (metric dedup +
aggregation batching) → sequential SQL roundtrips → derived metrics →
threshold evaluation. Here:

* planning = collecting ``AggMetric``s from every check and deduping by
  identity key (reference ``MetricsResolver.resolve_metric``
  ``contract_verification_impl.py:826-839``),
* ALL aggregation metrics fuse into **one** ``df.agg(m_0, m_1, ...)`` —
  a single Spark job / single pass over the data; the reference needs
  greedy statement-length batching (``:1577-1644``), Spark doesn't,
* side queries (reference-data anti-joins, user metric queries) run as
  their own jobs afterwards,
* a failing metric/check marks its checks NOT_EVALUATED without sinking
  the scan (reference per-query error isolation, base.py:876-889).
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from soda_core_spark.operators.checks import (
    AggMetric,
    CheckContext,
    CheckPlan,
    CHECK_PLANNERS,
    SIDE_QUERY_ERROR_PREFIX,
    SideQuery,
)
from soda_core_spark.operators.compiler import apply_scan_filter
from soda_core_spark.plans.model import CheckSpec, Contract
from soda_core_spark.plans.selectors import CheckSelector
from soda_core_spark.plans.results import (
    CheckOutcome,
    CheckResult,
    ContractVerificationResult,
    Measurement,
    check_identity,
)


class DuplicateCheckIdentityError(Exception):
    """Two checks resolved to the same identity — a contract error in the
    reference too (base.py:1263-1282)."""


def verify_contract(
    spark: SparkSession,
    contract: Contract,
    df: Optional[DataFrame] = None,
    datasets: Optional[dict[str, DataFrame]] = None,
    data_timestamp: Optional[datetime] = None,
    check_selectors: Optional[list[Union[str, CheckSelector]]] = None,
    primary_keys: Optional[list[str]] = None,
) -> ContractVerificationResult:
    """Run all checks of ``contract`` against ``df`` in (at most) one fused
    aggregation job plus one job per side query.

    ``df`` defaults to ``spark.table(contract.dataset)`` /
    ``datasets[contract.dataset]``. ``datasets`` supplies reference-data
    tables for ``valid_reference_data`` checks. ``primary_keys`` is the
    dataset's actual key columns for the schema check's ``primary_key:``
    comparison; when omitted it is introspected from the catalog (Iceberg
    identifier fields; None on parquet/views = source doesn't introspect,
    reference metadata_types.py:95-97) — only attempted when the contract
    declares a primary key, so the common path pays nothing.
    """
    datasets = dict(datasets or {})
    if df is None:
        df = datasets.get(contract.dataset)
    if df is None:
        # '/'-qualified names (data_source/prefix…/dataset — reference
        # dataset_identifier.py) resolve through their parsed form: the
        # datasets dict may bind either the full qualified string, the
        # bare dataset name, or the dotted catalog path; otherwise the
        # prefixes become the spark.table namespace
        ident = contract.dataset_identifier
        if ident.data_source_name is not None:
            df = datasets.get(ident.spark_name) or datasets.get(ident.dataset_name)
            if df is None:
                df = spark.table(ident.spark_name)
        else:
            df = spark.table(contract.dataset)
    datasets.setdefault(contract.dataset, df)

    filtered = apply_scan_filter(df, contract.filter)
    sample_cache = None
    if contract.sample.is_configured():
        # dataset-level sampling, applied under the contract filter and
        # ahead of ALL metrics (reference attaches SAMPLE to the filtered
        # CTE, check_collections/base.py:595-605). percentage → df.sample
        # (Bernoulli, seeded; deterministic given the partition layout, so
        # the fused agg and the ctx.filtered-based side queries — e.g. the
        # reference-data anti-join — see the same rows; raw-SQL side
        # queries CANNOT be made consistent and are rejected at planning
        # time, see _reject_raw_sql_under_sampling); an
        # un-ordered limit is NOT stable across jobs (each job takes
        # whichever partitions answer first), so the limited frame is
        # cached — bounded by `limit` rows by construction — to pin one
        # subset for the whole verification.
        if contract.sample.percent is not None:
            filtered = filtered.sample(
                fraction=contract.sample.percent / 100.0, seed=contract.sample.seed
            )
        else:
            sample_cache = filtered = filtered.limit(contract.sample.limit).cache()
    if primary_keys is None and any(
        c.is_primary_key for c in contract.columns
    ):
        from soda_core_spark.sources.tables import introspect_primary_keys

        primary_keys = introspect_primary_keys(spark, contract.dataset)
    try:
        return _verify_contract_body(
            spark, contract, df, filtered, datasets, data_timestamp,
            check_selectors, primary_keys,
        )
    finally:
        # unpersist on EVERY exit path — a raised DuplicateCheckIdentityError
        # (or any planning exception) must not leak the cached sample frame
        # for the session lifetime
        if sample_cache is not None:
            sample_cache.unpersist()


def _verify_contract_body(
    spark: SparkSession,
    contract: Contract,
    df: DataFrame,
    filtered: DataFrame,
    datasets: dict[str, DataFrame],
    data_timestamp: Optional[datetime],
    check_selectors: Optional[list[Union[str, CheckSelector]]],
    primary_keys: Optional[list[str]] = None,
) -> ContractVerificationResult:
    selectors = CheckSelector.parse_all(check_selectors)
    ctx = CheckContext(
        spark=spark,
        contract=contract,
        df=df,
        filtered=filtered,
        datasets=datasets,
        data_timestamp=data_timestamp,
        primary_keys=primary_keys,
    )

    # --- plan -------------------------------------------------------------
    checks = contract.all_checks()
    plans: list[tuple[CheckSpec, Optional[CheckPlan], Optional[str]]] = []
    seen_identities: set[str] = set()
    for check in checks:
        ident = check_identity(
            contract.dataset,
            check.type,
            check.column,
            check.qualifier,
            ",".join(check.columns) if check.columns else None,
        )
        if ident in seen_identities:
            raise DuplicateCheckIdentityError(
                f"duplicate check identity {ident} for {check.default_name()}; "
                "add a distinct 'qualifier'"
            )
        seen_identities.add(ident)
        if not CheckSelector.all_match(selectors, check, contract):
            plans.append((check, None, "excluded"))
            continue
        try:
            plans.append((check, CHECK_PLANNERS[check.type](check, ctx), None))
        except Exception as e:  # planning error → NOT_EVALUATED, scan continues
            plans.append((check, None, f"planning failed: {e}"))

    # --- metric dedup + fused aggregation ----------------------------------
    agg_metrics: dict[str, AggMetric] = {}
    side_queries: dict[str, SideQuery] = {}
    for _, plan, _err in plans:
        if plan is None:
            continue
        for m in plan.metrics:
            agg_metrics.setdefault(m.key, m)
        for sq in plan.side_queries:
            side_queries.setdefault(sq.key, sq)

    # Error isolation (reference: per-query try/except, base.py:876-889).
    # Fusing all metrics into one df.agg must not let one bad expression
    # (parse/analysis error in a check's filter/condition/expression) sink
    # the whole scan: build+analyze each metric individually first; fuse
    # only the valid ones; on a runtime failure of the fused job fall back
    # to per-metric jobs. A metric with no value leaves its checks
    # NOT_EVALUATED via None-propagation.
    values: dict[str, Any] = {}
    measurements: list[Measurement] = []
    built: list[AggMetric] = []
    built_cols = []
    candidates: list[tuple[AggMetric, Any]] = []
    for m in agg_metrics.values():
        try:
            candidates.append((m, m.build()))
        except Exception:
            measurements.append(Measurement(m.key, None, m.name))
    # analysis cost: ONE batched analyze when every expression is valid
    # (the overwhelmingly common case — O(1) driver roundtrips however
    # many metrics a contract has); only a failing batch falls back to
    # per-metric analysis to isolate the bad expression(s)
    if candidates:
        try:
            filtered.select(
                *[c.alias(f"__soda_validate_{i}") for i, (_m, c) in enumerate(candidates)]
            )
            built = [m for m, _c in candidates]
            built_cols = [c for _m, c in candidates]
        except Exception:
            for m, col in candidates:
                try:
                    filtered.select(col.alias("__soda_validate"))
                    built.append(m)
                    built_cols.append(col)
                except Exception:
                    measurements.append(Measurement(m.key, None, m.name))
    if built:
        exprs = [c.alias(f"m_{i}") for i, c in enumerate(built_cols)]
        try:
            row = filtered.agg(*exprs).collect()[0]
            rows = [row[i] for i in range(len(built))]
        except Exception:
            rows = []
            for c in built_cols:
                try:
                    rows.append(filtered.agg(c.alias("m_0")).collect()[0][0])
                except Exception:
                    rows.append(None)
        for m, v in zip(built, rows):
            if v is None and m.coerce_zero:
                v = 0  # SUM(CASE WHEN ...) is NULL over zero rows (ref missing_check.py:137-140)
            values[m.key] = v
            measurements.append(Measurement(m.key, v, m.name))

    for sq in side_queries.values():
        try:
            v = sq.run(ctx)
        except Exception as e:
            v = None  # dependent checks → NOT_EVALUATED
            # error marker lets evaluators tell "query errored" apart from
            # "query legitimately returned NULL" (reference treats a NULL
            # rows_tested denominator as valid, failed_rows_check.py:133-140)
            values[SIDE_QUERY_ERROR_PREFIX + sq.key] = f"{type(e).__name__}: {e}"
        values[sq.key] = v
        measurements.append(Measurement(sq.key, v, sq.name))

    # --- evaluate -----------------------------------------------------------
    results: list[CheckResult] = []
    for check, plan, err in plans:
        if plan is None:
            outcome = (
                CheckOutcome.EXCLUDED if err == "excluded" else CheckOutcome.NOT_EVALUATED
            )
            results.append(
                CheckResult(
                    identity=check_identity(
                        contract.dataset, check.type, check.column, check.qualifier,
                        ",".join(check.columns) if check.columns else None,
                    ),
                    check_type=check.type,
                    name=check.default_name(),
                    column=check.column,
                    outcome=outcome,
                    threshold=check.threshold.describe(),
                    level=check.level,
                    message=None if err == "excluded" else err,
                )
            )
            continue
        try:
            results.append(plan.evaluate(values, ctx))
        except Exception as e:
            results.append(
                CheckResult(
                    identity=check_identity(
                        contract.dataset, check.type, check.column, check.qualifier,
                        ",".join(check.columns) if check.columns else None,
                    ),
                    check_type=check.type,
                    name=check.default_name(),
                    column=check.column,
                    outcome=CheckOutcome.NOT_EVALUATED,
                    threshold=check.threshold.describe(),
                    level=check.level,
                    message=f"evaluation failed: {e}",
                )
            )

    return ContractVerificationResult(
        dataset=contract.dataset,
        check_results=results,
        measurements=measurements,
    )


def verify_contracts(
    spark: SparkSession,
    contracts: list[Contract],
    datasets: Optional[dict[str, DataFrame]] = None,
    data_timestamp: Optional[datetime] = None,
    check_selectors: Optional[list[str]] = None,
) -> "SessionResult":
    """Session entry point: verify N contracts against shared datasets
    with per-contract isolation — one contract crashing (missing table,
    unparseable filter) records an error and the remaining contracts
    still verify, mirroring the reference's per-file isolation
    (check_collections/session.py:45-180, per-collection try/except).

    Contracts run sequentially on the driver; each contract's metrics are
    still one fused Spark job, so the session is N jobs for N contracts —
    Spark parallelizes within each job, which is where the data is.
    """
    from soda_core_spark.plans.results import SessionResult

    results: list[ContractVerificationResult] = []
    errors: list[tuple[str, str]] = []
    for contract in contracts:
        try:
            results.append(
                verify_contract(
                    spark,
                    contract,
                    datasets=datasets,
                    data_timestamp=data_timestamp,
                    check_selectors=check_selectors,
                )
            )
        except Exception as e:
            errors.append((contract.dataset, f"{type(e).__name__}: {e}"))
    return SessionResult(results=results, errors=errors)
