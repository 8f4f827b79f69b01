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


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def test_zorder_key_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from soda_core_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(0.0, 0.0), (255.0, 0.0), (0.0, 255.0), (255.0, 255.0)],
        ["x", "y"],
    )
    z = zorder_key(["x", "y"], [(0.0, 256.0), (0.0, 256.0)], bits=8)
    got = [r["z"] for r in df.select(z.alias("z")).collect()]

    def morton(a, b):
        out = 0
        for i in range(8):
            out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return out

    assert got == [morton(0, 0), morton(255, 0), morton(0, 255),
                   morton(255, 255)]
    # corners: all-zero and all-one keys
    assert got[0] == 0 and got[3] == (1 << 16) - 1


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    from soda_core_spark.sources.layout import (
        cluster_stats,
        write_clustered,
        write_zordered,
    )

    # two independent uniform dimensions
    df = spark.range(4096).selectExpr(
        "cast(id % 64 as double) as x",
        "cast(cast(id / 64 as int) as double) as y",
        "id as payload",
    )
    p_range = str(tmp_path / "range")
    p_z = str(tmp_path / "zord")
    write_clustered(df, p_range, ["x"], num_files=16)
    write_zordered(df, p_z, ["x", "y"], num_files=16)

    range_x = cluster_stats(p_range, "x").overlap_factor
    range_y = cluster_stats(p_range, "y").overlap_factor
    z_x = cluster_stats(p_z, "x").overlap_factor
    z_y = cluster_stats(p_z, "y").overlap_factor
    # range clustering: perfect on x, useless on y (every file spans y)
    assert range_x <= 2.0
    assert range_y > 10.0
    # z-order: decent on BOTH (each file owns a hyper-rectangle)
    assert z_x <= 6.0 and z_y <= 6.0


def test_zorder_roundtrip_and_validation(spark, tmp_path):
    import pytest

    from soda_core_spark.sources.layout import write_zordered

    df = spark.range(100).selectExpr(
        "cast(id as double) as x", "cast(id % 10 as double) as y", "id"
    )
    p = str(tmp_path / "t")
    write_zordered(df, p, ["x", "y"], num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))
    assert "__z" not in back.columns
    with pytest.raises(ValueError, match=">= 2"):
        write_zordered(df, p, ["x"])


def test_partitioned_overwrite_is_partition_scoped(spark, tmp_path):
    """Re-running one day replaces only that day's partition; Spark's
    default static overwrite would wipe the other days."""
    from soda_core_spark.sources.layout import write_partitioned_idempotent

    path = str(tmp_path / "corpus")
    df1 = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c")],
        "id long, day string, v string",
    )
    write_partitioned_idempotent(df1, path, ["day"])
    # crash-replay of day d2 with corrected rows
    df2 = spark.createDataFrame(
        [(30, "d2", "c2"), (31, "d2", "c3")], "id long, day string, v string"
    )
    write_partitioned_idempotent(df2, path, ["day"])
    got = {
        (r.id, r.day, r.v) for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "d1", "a"), (2, "d1", "b"), (30, "d2", "c2"),
                   (31, "d2", "c3")}


def test_static_overwrite_footgun_contrast(spark, tmp_path):
    """Document WHY the wrapper exists: static mode drops day d1."""
    path = str(tmp_path / "corpus2")
    df1 = spark.createDataFrame(
        [(1, "d1", "a"), (3, "d2", "c")], "id long, day string, v string"
    )
    df1.write.mode("overwrite").partitionBy("day").parquet(path)
    df2 = spark.createDataFrame(
        [(30, "d2", "c2")], "id long, day string, v string"
    )
    df2.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("day").parquet(path)
    days = {r.day for r in spark.read.parquet(path).collect()}
    assert days == {"d2"}  # d1 gone — the behavior the wrapper prevents
