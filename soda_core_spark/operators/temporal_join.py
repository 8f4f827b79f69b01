"""As-of and range joins — the temporal join operators Spark's API
lacks natively, composed from one keyed shuffle + window (never a
per-row Python path and never a crossJoin).

``asof_join`` is the point-in-time join: for every left row, the
single most recent right row at-or-before its timestamp, per key —
feature lookup at event time, price-at-trade, config-at-request. The
classic formulation is a correlated ``max(right_ts) WHERE right_ts <=
left_ts`` subquery per row; here both sides union into ONE stream
ordered by (key, ts, side) and a running ``last(value, ignorenulls)``
window pins the match — one shuffle on the key, linear work, no
range-fan-out. DuckDB's native ``ASOF JOIN`` is the oracle twin.

``range_count_join`` counts right rows inside a per-left-row window
[ts, ts + horizon) per key — conversion windows, post-order activity,
exposure windows. The join fans out on the key then filters the range
predicate; per-key fan-out is bounded by the key's own row counts (the
natural grain of the question), with AQE skew-split handling hot keys.

Reference semantics: soda-core's freshness/metric checks compile a
"latest row at or before the data timestamp" predicate
(soda-core/src/soda_core/contracts/impl/check_types/freshness_check.py),
i.e. exactly the as-of match; this module generalizes it to a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_count_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Point-in-time join: each left row picks the single right row
    with the greatest ``right_ts <= left_ts`` (or ``<`` when
    ``strict``) for the same ``key``, carrying ``value_cols`` from it
    (NULL when no right row precedes).

    Output: all left columns + ``asof_ts`` (the matched right
    timestamp, NULL when unmatched) + ``value_cols``.

    Determinism contract (CALLER precondition, not checked here):
    ``right`` must be unique per (key, right_ts) — pre-aggregate ties
    away, choosing the tiebreak explicitly. Duplicate (key, right_ts)
    right rows would be resolved by the window's residual sort order,
    which is not deterministic; this operator does NOT scan for
    violations (an eager uniqueness pass over the full right side is a
    scale cost the caller may not want to pay — run
    ``right.groupBy(key, right_ts).count().where("count > 1")`` as a
    one-off check when in doubt).

    NULL keys follow equi-join semantics: a NULL-key right row matches
    NOTHING (it is dropped before the union — without that filter the
    window's partitionBy would group NULL keys together and "match"
    them); a NULL-key left row is kept and is always unmatched.

    Scale shape: union the two sides, ONE hash shuffle on the key,
    per-key window ordered by (ts, side) with a running
    last-non-null — right rows at ts == left_ts sort before (after,
    when ``strict``) the left row, which is the entire <=-vs-<
    semantic. Work is linear in |left| + |right|; contrast with the
    correlated-subquery form, which rescans right per left row.

    The match payload rides in ONE struct (ts + every value column),
    and the running last-non-null applies to the struct as a whole:
    a matched right row whose value column is genuinely NULL carries
    that NULL (the struct itself is non-null), exactly as a real join
    against that row would — per-column last-non-null would instead
    leak an OLDER row's value into the NULL slot."""
    lc = set(left.columns)
    for c in ("__side", "__ts", "__payload"):
        if c in lc or c in set(right.columns):
            raise ValueError(f"internal column name collision: {c}")
    # right rows sort BEFORE left at equal ts for <= semantics, AFTER
    # for strict <
    right_rank = 0 if not strict else 2
    payload_type = T.StructType(
        [T.StructField("__ats", right.schema[right_ts].dataType)]
        + [T.StructField(f"__v_{v}", right.schema[v].dataType)
           for v in value_cols]
    )
    r = right.where(F.col(key).isNotNull()).select(
        F.col(key).alias(key),
        F.col(right_ts).alias("__ts"),
        F.lit(right_rank).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__ats"),
            *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        ).cast(payload_type).alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(key).alias(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        r.unionByName(l)
        .select(
            "*",
            F.last("__payload", ignorenulls=True).over(w)
            .alias("__match"),
        )
        .where(F.col("__side") == 1)
    )
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__match.__ats").alias("asof_ts"),
        *[F.col(f"__match.__v_{v}").alias(v) for v in value_cols],
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_days: int,
    count_alias: str = "n_in_window",
    right_key: str | None = None,
) -> DataFrame:
    """Per-left-row count of right rows with ``left_ts <= right_ts <
    left_ts + horizon_days`` on the same key — the conversion-window
    primitive (orders→events: activity in the 30 days after an
    order).

    Output: all left columns + ``<count_alias>: bigint`` (0 when
    none).

    Scale shape: ONE equi-join on the key with the range predicate as
    a join condition (rows drop before the aggregate), then a groupBy
    back to left grain. Fan-out is |left_k|·|right_k| per key — the
    question's own grain; AQE skew-join splits hot keys. A
    sort-merge-interval optimization is unnecessary while the key
    cardinality dominates (hosts/users), the common corpus case.

    Left grain is ROW grain, not distinct-column grain: the regroup
    keys on a per-row id minted before the join, so two byte-identical
    left rows each keep their own count instead of collapsing to one
    output row (the id never leaves this operator).

    PRECONDITION (documented, not checked): the minted id is
    ``monotonically_increasing_id``, whose values depend on the left
    plan's partition layout — the left input's partitioning must be
    deterministic under task retry (a plain scan, or any deterministic
    lineage). Downstream of a nondeterministic repartition (e.g. AQE
    re-coalescing after a fetch failure) a stage retry could reassign
    ids between the join and the groupBy, merging or splitting
    duplicate-row counts; ``left.localCheckpoint()`` first if that
    lineage cannot be guaranteed."""
    if "__rowid" in left.columns or "__rts" in left.columns:
        raise ValueError("internal column name collision: __rowid/__rts")
    lk = [F.col(c) for c in left.columns]
    lt = F.col(left_ts)
    rt = F.col("__rts")
    r = right.select(
        F.col(right_key or key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
    )
    cond = (
        (F.col(key) == F.col("__rk"))
        & (rt >= lt)
        & (rt < F.timestamp_add("DAY", F.lit(horizon_days), lt))
    )
    tagged = left.withColumn(
        "__rowid", F.monotonically_increasing_id()
    )
    joined = tagged.join(r, cond, "left")
    return (
        joined.groupBy(F.col("__rowid"), *lk)
        .agg(
            F.sum(F.when(F.col("__rts").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(count_alias)
        )
        .drop("__rowid")
    )
