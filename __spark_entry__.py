"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship per-source quality/lineage summary at sf0.001.
``queries()`` / ``oracle_sql()`` — operator registry with DuckDB twins,
implemented in soda_core_spark/entry_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from soda_core_spark.entry_queries import REGISTRY, flagship

SF0_001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0_001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; operators
    whose semantics have no DuckDB twin (xxhash64 signatures, pandas-UDF
    model scores) are omitted → driver records a rows-only check."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
