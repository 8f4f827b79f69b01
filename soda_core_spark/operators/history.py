"""Change-over-time checks against the LOCAL metrics sink — the
self-hosted replacement for the reference's Cloud-side anomaly /
metric-monitoring checks.

The reference routes "did this metric move?" through Soda Cloud's
metric history (v4 ``type: "anomalyDetection"`` arrives via the Cloud
wire format, contract_verification.py:400-420; the v3 local
``simulate_anomaly_detection`` command is retired, cli/cli.py:58-65) —
deliberately absent here along with the rest of the Cloud client. But
the ENGINE already persists every check result to a parquet/Iceberg
sink (sources/sinks.py, CLI ``-dw``), which IS a metric history. This
module closes the loop: a ``metric_change`` check type, registered
through the public :func:`register_check_type` extension point (the
same API users get), that evaluates a metric expression in the fused
aggregation and compares it to the SAME check's previous values from
the sink.

Semantics (modeled on soda v3's public change-over-time checks):

.. code-block:: yaml

    checks:
      - metric_change:
          expression: AVG(quality_score)
          must_be_between: [-0.05, 0.05]
          attributes:
            history: /warehouse/check_results      # the -dw sink
            compare: last        # last | mean (of the last n runs)
            n: 7
            mode: absolute       # absolute | percent

The check's VALUE is the change (current − baseline; percent mode:
100·(cur−base)/|base|), thresholded like any metric. First run — no
history rows for this identity yet — lands NOT_EVALUATED with
``metric_unavailable`` (the freshness-NULL convention), never a crash:
the pipeline bootstraps itself.

Scale shape: the current value rides the scan's single fused
aggregation like every metric check; the baseline is one tiny
TakeOrdered over the sink filtered by check identity (parquet predicate
pushdown on the identity column; the sink table is per-run rows —
thousands, not billions).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from soda_core_spark.operators.checks import (
    AggMetric,
    CheckContext,
    CheckPlan,
    SideQuery,
    _base_result,
    _identity,
    register_check_type,
)
from soda_core_spark.plans.model import CheckSpec


def metric_history(
    spark: SparkSession,
    path: str,
    identity: str | None = None,
    dataset: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """The check-results sink as a queryable frame, optionally filtered
    to one check identity / dataset (both filters push down to the
    scan)."""
    df = spark.read.format(fmt).load(path)
    if dataset is not None:
        df = df.where(F.col("dataset") == dataset)
    if identity is not None:
        df = df.where(F.col("identity") == identity)
    return df


def _baseline(
    ctx: CheckContext, ident: str, path: str, fmt: str, compare: str, n: int
) -> float | None:
    try:
        h = metric_history(ctx.spark, path, identity=ident, fmt=fmt)
        rows = (
            h.where(F.col("metric_value").isNotNull())
            .orderBy(F.col("scan_ts").desc())
            .select("metric_value")
            .limit(int(n))
            .collect()
        )
    except Exception:
        return None  # no sink yet — bootstrap run
    if not rows:
        return None
    vals = [float(r[0]) for r in rows]
    if compare == "last":
        return vals[0]
    return sum(vals) / len(vals)


def plan_metric_change(check: CheckSpec, ctx: CheckContext) -> CheckPlan:
    attrs = check.attributes or {}
    path = attrs.get("history")
    if not check.expression:
        raise ValueError("metric_change requires 'expression'")
    if not path:
        raise ValueError("metric_change requires attributes.history")
    mode = str(attrs.get("mode", "absolute"))
    compare = str(attrs.get("compare", "last"))
    n = int(attrs.get("n", 7))
    fmt = str(attrs.get("format", "parquet"))
    if mode not in ("absolute", "percent"):
        raise ValueError(f"metric_change mode must be absolute|percent, got {mode!r}")
    if compare not in ("last", "mean"):
        raise ValueError(f"metric_change compare must be last|mean, got {compare!r}")

    cur_key = f"metric_change|{check.expression}|{check.filter or ''}"
    m = AggMetric(
        cur_key, f"metric_change({check.expression})",
        lambda: F.expr(check.expression), False,
    )
    ident = _identity(ctx, check)
    base_key = f"metric_change_baseline|{ident}"
    sq = SideQuery(
        base_key,
        "metric_change_history",
        lambda c: _baseline(c, ident, path, fmt, compare, n),
    )

    def evaluate(values: dict[str, Any], ctx: CheckContext):
        cur = values.get(cur_key)
        base = values.get(base_key)
        diag = {
            "current": cur,
            "baseline": base,
            "compare": compare,
            "mode": mode,
            "history": path,
        }
        change = None
        message = None
        if cur is None or base is None:
            message = "no metric history yet for this check identity"
        elif mode == "percent":
            if base == 0:
                message = "baseline is 0 — percent change undefined"
            else:
                change = 100.0 * (float(cur) - base) / abs(base)
        else:
            change = float(cur) - base
        result = _base_result(ctx, check, change, diag, message)
        if change is None:
            result.metric_unavailable = True
        return result

    return CheckPlan(check, metrics=[m], side_queries=[sq], evaluate=evaluate)


def _history_values(
    ctx: CheckContext, ident: str, path: str, fmt: str, n: int
) -> list[float]:
    try:
        h = metric_history(ctx.spark, path, identity=ident, fmt=fmt)
        rows = (
            h.where(F.col("metric_value").isNotNull())
            .orderBy(F.col("scan_ts").desc())
            .select("metric_value")
            .limit(int(n))
            .collect()
        )
    except Exception:
        return []
    return [float(r[0]) for r in rows]


def plan_metric_anomaly(check: CheckSpec, ctx: CheckContext) -> CheckPlan:
    """Local z-score anomaly check — the self-hosted analogue of the
    reference's Cloud ``anomalyDetection`` monitoring type
    (contract_verification.py:400-420): check value = |current −
    mean(history)| / stddev(history) over the last ``n`` runs; threshold
    it like any metric (``must_be_less_than: 3`` is the classic band).
    Needs ≥ ``min_history`` (default 3) numeric rows and a non-zero
    spread — otherwise NOT_EVALUATED with ``metric_unavailable`` (a
    constant history makes every deviation infinitely surprising; a
    change band, not a z-score, is the right tool there)."""
    attrs = check.attributes or {}
    path = attrs.get("history")
    if not check.expression:
        raise ValueError("metric_anomaly requires 'expression'")
    if not path:
        raise ValueError("metric_anomaly requires attributes.history")
    n = int(attrs.get("n", 30))
    min_history = int(attrs.get("min_history", 3))
    fmt = str(attrs.get("format", "parquet"))

    cur_key = f"metric_anomaly|{check.expression}|{check.filter or ''}"
    m = AggMetric(
        cur_key, f"metric_anomaly({check.expression})",
        lambda: F.expr(check.expression), False,
    )
    ident = _identity(ctx, check)
    base_key = f"metric_anomaly_history|{ident}"
    sq = SideQuery(
        base_key,
        "metric_anomaly_history",
        lambda c: _history_values(c, ident, path, fmt, n),
    )

    def evaluate(values: dict[str, Any], ctx: CheckContext):
        cur = values.get(cur_key)
        hist = values.get(base_key) or []
        diag: dict[str, Any] = {
            "current": cur,
            "history_n": len(hist),
            "history": path,
        }
        z = None
        message = None
        if cur is None:
            message = "current metric is NULL"
        elif len(hist) < min_history:
            message = (
                f"need >= {min_history} historical values, have {len(hist)}"
            )
        else:
            mean = sum(hist) / len(hist)
            var = sum((v - mean) ** 2 for v in hist) / len(hist)
            sd = var**0.5
            diag["mean"] = round(mean, 6)
            diag["stddev"] = round(sd, 6)
            if sd == 0:
                message = (
                    "history has zero spread — z-score undefined; use "
                    "metric_change"
                )
            else:
                z = abs(float(cur) - mean) / sd
        result = _base_result(ctx, check, z, diag, message)
        if z is None:
            result.metric_unavailable = True
        return result

    return CheckPlan(check, metrics=[m], side_queries=[sq], evaluate=evaluate)


def register_metric_change_check(replace: bool = False) -> None:
    """Wire ``metric_change`` into the YAML + planner registries."""
    register_check_type("metric_change", plan_metric_change, replace=replace)


def register_metric_anomaly_check(replace: bool = False) -> None:
    """Wire ``metric_anomaly`` into the YAML + planner registries."""
    register_check_type("metric_anomaly", plan_metric_anomaly, replace=replace)
