"""Range-clustered layout: file skipping via parquet min-max stats."""

import pytest
from pyspark.sql import functions as F


def test_clustered_layout_narrows_file_ranges(spark, tmp_path):
    from soda_core_spark.sources.layout import cluster_stats, write_clustered

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scattered = str(tmp_path / "scattered")
    clustered = str(tmp_path / "clustered")
    # baseline: hash-scattered layout — every file spans ~every source
    df.repartition(8).write.parquet(scattered)
    write_clustered(df, clustered, ["source"], num_files=8)

    s = cluster_stats(scattered, "source")
    c = cluster_stats(clustered, "source")
    assert c.n_files >= 4
    # clustering shrinks point-predicate amplification dramatically
    assert c.overlap_factor <= 2.0 < s.overlap_factor
    # every clustered file owns a narrow contiguous range
    for _f, lo, hi in c.per_file:
        assert lo is not None and lo <= hi


def test_clustered_scan_pushes_filter(spark, tmp_path):
    from soda_core_spark.sources.layout import write_clustered

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "bysource")
    write_clustered(df, path, ["source"], num_files=8)
    q = spark.read.parquet(path).where(F.col("source") == "src3")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "src3" in plan
    assert q.count() == df.where(F.col("source") == "src3").count()


def test_write_clustered_validation(spark, tmp_path):
    from soda_core_spark.sources.layout import write_clustered

    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    with pytest.raises(ValueError):
        write_clustered(df, str(tmp_path / "x"), [])


def test_cluster_stats_unknown_column(spark, tmp_path):
    from soda_core_spark.sources.layout import cluster_stats

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["id", "s"]).write.parquet(p)
    with pytest.raises(ValueError):
        cluster_stats(p, "nope")
