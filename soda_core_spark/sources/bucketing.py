"""Bucketed corpus tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of id-keyed operations (dedup survivor
re-join, annotation joins, incremental merges) is the shuffle. Writing
the corpus ONCE bucketed by the join key moves that shuffle into the
write; every later equi-join or groupBy on the key is then
partition-local — Spark plans bucket-aware SortMergeJoin with NO
Exchange on the bucketed side(s).

Spark's bucketing needs a catalog table (``saveAsTable``; plain
``.parquet(path)`` cannot record bucket metadata — a real deployment
uses the metastore or Iceberg's bucket partition transform, same idea).
The reference has no storage-layout control at all (it reads whatever
the warehouse exposes, SURVEY §2.4); this is a Spark-native scale
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket-sorted)
    catalog table. Sorting within buckets lets SortMergeJoin skip its
    sort too — the join becomes a pure streaming zip of bucket files."""
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides the catalog entry,
    so joins on the bucket column plan without an Exchange)."""
    return spark.table(table)
