"""Embedding-column sanity checks — the vector twin of the scalar
contract checks.

An embedding pipeline fails in characteristic ways long before any ANN
index notices: NULL vectors (upstream encoder skipped a row), dimension
drift (model swap mid-corpus), NaN/Inf components (fp16 overflow), and
zero vectors (padding rows that poison cosine similarity with 0/0).
soda-core's check vocabulary stops at scalars (SURVEY §1.2); this module
extends missing/invalid semantics to ``array<float>`` columns so the
declarative layer can gate an embedding table the way it gates text.

All diagnostics are row-local column algebra over the array — one
projection, zero shuffle, zero Python: ``aggregate`` left-fold for the
norm (deterministic summation order, so the 6 dp-rounded value is
engine-reproducible), ``exists`` for NaN scanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_norm(vec: Column) -> Column:
    """Euclidean norm as a deterministic left fold, 6 dp."""
    s = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return F.round(F.sqrt(s), 6)


def embedding_diagnostics(
    vec: Column, expected_dim: int
) -> dict[str, Column]:
    """Per-row flags: ``dim`` (0 for NULL), ``dim_ok``, ``has_nan``,
    ``is_zero`` (norm exactly 0 — includes NULL/empty), ``l2_norm``
    (NULL when any component is NaN: a poisoned norm must not look like
    a valid magnitude)."""
    v = F.coalesce(vec, F.array().cast("array<float>"))
    dim = F.size(v)
    has_nan = F.exists(v, lambda x: F.isnan(x))
    norm = F.when(~has_nan, l2_norm(v))
    return {
        "dim": dim.cast("long"),
        "dim_ok": dim == F.lit(int(expected_dim)),
        "has_nan": has_nan,
        "is_zero": F.coalesce(norm == 0.0, F.lit(True)),
        "l2_norm": norm,
    }


def with_embedding_diagnostics(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int = 64,
) -> DataFrame:
    """Attach the diagnostic columns plus an overall ``vec_valid``
    (right dimension, no NaN, non-zero) — the predicate an embedding
    contract check thresholds on."""
    d = embedding_diagnostics(F.col(vec_col), expected_dim)
    out = df.withColumns(d)
    return out.withColumn(
        "vec_valid",
        F.col("dim_ok") & ~F.col("has_nan") & ~F.col("is_zero"),
    )
