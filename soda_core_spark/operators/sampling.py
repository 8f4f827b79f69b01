"""Deterministic, engine-portable sampling.

``df.sample`` is seeded-deterministic *within* Spark but its RNG stream is
engine-specific and partitioning-sensitive — useless for resumable corpus
subsampling or cross-engine verification. The portable primitive is a pure
filter on a cryptographic hash of a stable row key: the same rows survive
across engines, restarts, and repartitioning, and the predicate pushes past
the scan with no shuffle (reference FROM.SAMPLE sql_ast.py:113-124 is the
count-level analogue; this is the row-deterministic variant a training
pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_sample(df: DataFrame, key: Column, sixteenths: int) -> DataFrame:
    """Keep rows whose md5(key) first hex digit falls in the lowest
    ``sixteenths`` of the 16 hex buckets — an exact ``sixteenths/16``
    expected rate, reproducible in any engine with md5. ``key`` must be a
    string column that uniquely (or at least stably) identifies the row."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    digit = F.substring(F.md5(key), 1, 1)
    return df.where(digit.isin(*_HEX[:sixteenths]))


def hash_sample_sql_predicate(key_sql: str, sixteenths: int) -> str:
    """The DuckDB/ANSI twin of :func:`hash_sample`'s predicate."""
    digits = ", ".join(f"'{c}'" for c in _HEX[:sixteenths])
    return f"substr(md5({key_sql}), 1, 1) IN ({digits})"


def _hash_fraction(key: Column) -> Column:
    """md5(key)'s first 8 hex digits as a uniform double in [0, 1) —
    finer-grained than the 16-bucket form, still engine-portable
    (any engine: parse 8 hex chars, divide by 16^8)."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") / float(
        16**8
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: Column,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep each row iff its portable
    hash fraction is below its stratum's rate — the training-mix
    primitive (e.g. keep 100 % of books, 10 % of common-crawl, 0 % of
    the rest). Same survivor set across engines, restarts, and
    partitionings; the predicate is a pure per-row probe (no shuffle,
    pushes past the scan). Strata missing from ``fractions`` get
    ``default_fraction``.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0,1], got {default_fraction}"
        )
    rate = F.lit(float(default_fraction))
    for s, f in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(f))).otherwise(rate)
    return df.where(_hash_fraction(key) < rate)


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic token-budget selection: order documents by the
    portable hash of their id (a stable shuffle) and keep them while the
    running token total stays ≤ ``budget_tokens`` — per ``group_col``
    when given (per-source budgets for data mixing), else globally. The
    kept set is identical across engines/restarts/partitionings because
    both the order and the cumulative sum are hash-determined.

    Scale note: cumulative selection is inherently sequential per group,
    so each group's window runs on one reducer (like any running total).
    For groups with 10^9+ candidate rows, pre-thin with
    :func:`stratified_hash_sample` or :func:`hash_sample` to a few× the
    budget first — the budget cut itself then touches a bounded set.
    The global (ungrouped) form uses a single-partition window: correct,
    driver-side-free, but only appropriate after such pre-thinning.
    """
    from pyspark.sql import Window

    order = F.md5(F.col(id_col).cast("string"))
    w = Window.orderBy(order, F.col(id_col))
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    cum = F.sum(F.col(token_col).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum_tokens", cum)
        .where(F.col("__cum_tokens") <= budget_tokens)
        .drop("__cum_tokens")
    )
