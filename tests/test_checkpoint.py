"""Checkpoint/resume: interrupted runs pick up where they left off and the
combined output equals a single uninterrupted run."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
from soda_core_spark.sources.checkpoint import (
    CheckpointStore,
    bucket_col,
    run_resumable,
)
from soda_core_spark.sources.webtext_gen import generate_web_pages

N = 800
N_BUCKETS = 4


@pytest.fixture(scope="module")
def df(spark):
    pdf = generate_web_pages(N, seed=7)
    for c in ("url", "text", "lang"):
        pdf[c] = pdf[c].astype(object)
    return spark.createDataFrame(pdf)


def test_bucketing_is_deterministic_partition(spark, df):
    counts = (
        df.withColumn("b", bucket_col(N_BUCKETS))
        .groupBy("b").count().orderBy("b").collect()
    )
    assert len(counts) == N_BUCKETS
    assert sum(r["count"] for r in counts) == N


def test_resume_skips_completed_buckets(spark, df, tmp_path):
    pipe = QualityFilterPipeline(scrub=False, perplexity=False, langid=False)
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")

    # run only buckets 0..1, then "crash"
    store = CheckpointStore(state)
    states1 = run_resumable(pipe, df, out, state, n_buckets=N_BUCKETS)
    assert len(states1) == N_BUCKETS
    done_after_full = store.completed()
    assert set(done_after_full) == set(range(N_BUCKETS))

    # simulate partial state: drop two bucket markers, resume
    store2 = CheckpointStore(state)
    import os

    os.remove(os.path.join(state, "bucket-00002.json"))
    os.remove(os.path.join(state, "bucket-00003.json"))
    states2 = run_resumable(pipe, df, out, state, n_buckets=N_BUCKETS)
    assert {s.bucket for s in states2} == set(range(N_BUCKETS))

    # combined output covers every input row exactly once
    total = spark.read.option("basePath", out).parquet(out).count()
    assert total == N

    # totals consistent with a fresh single run
    single = pipe.run(df)
    assert sum(s.n_docs for s in states2) == single.n_input
    assert sum(s.n_kept for s in states2) == single.n_kept
