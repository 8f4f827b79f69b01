"""Bucketed-table storage: joins on the bucket key must plan WITHOUT an
Exchange on the bucketed sides (the 100-TB co-located-join story)."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    annots = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("score")
    )
    write_bucketed(docs, "bt_docs", n_buckets=8)
    write_bucketed(annots, "bt_annots", n_buckets=8)
    yield "bt_docs", "bt_annots"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_annots")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a = read_bucketed(spark, bucketed_pair[0])
    b = read_bucketed(spark, bucketed_pair[1])
    # merge hint: at test size Spark would otherwise broadcast the small
    # side (also shuffle-free, but not the property under test — at
    # corpus scale both sides are huge and SMJ is what actually plans)
    joined = a.join(b.hint("merge"), "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan
    assert joined.count() == 2000


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    a = read_bucketed(spark, bucketed_pair[0])
    agg = a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 2000


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    # control: joining a bucketed table to an UNBUCKETED frame still
    # shuffles the unbucketed side only
    a = read_bucketed(spark, bucketed_pair[0])
    c = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    plan = a.join(c, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
