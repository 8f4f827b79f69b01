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
