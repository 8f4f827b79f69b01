"""Source facade + salted pipeline run."""

from pyspark.sql import types as T

from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
from soda_core_spark.sources.tables import list_tables, load_table
from soda_core_spark.sources.webtext_gen import generate_web_pages


def test_load_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    for fmt in ["parquet", "csv", "json", "orc"]:
        p = str(tmp_path / fmt)
        df.write.format(fmt).option("header", "true").save(p)
        schema = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
        )
        back = load_table(spark, p, fmt=fmt, schema=schema)
        assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_table_format_and_catalog(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    df.createOrReplaceTempView("tbl_src_test")
    assert load_table(spark, "tbl_src_test", fmt="table").count() == 1
    assert "tbl_src_test" in list_tables(spark)


def test_salted_run_same_results(spark):
    pdf = generate_web_pages(500, seed=3)
    for c in ("url", "text", "lang"):
        pdf[c] = pdf[c].astype(object)
    df = spark.createDataFrame(pdf)
    pipe = QualityFilterPipeline(scrub=False, langid=False, perplexity=False)
    plain = pipe.run(df)
    salted = pipe.run(df, salt=True, salt_partitions=8)
    assert salted.n_input == plain.n_input
    assert salted.n_kept == plain.n_kept
    assert salted.per_rule_fail == plain.per_rule_fail
