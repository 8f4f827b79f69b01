"""DSIR importance-resampling selection (operators/dsir.py)."""

import math

from pyspark.sql import functions as F

from soda_core_spark.operators.dsir import (
    bucket_log_ratios,
    dsir_scores,
    dsir_select,
    hashed_token_counts,
)


def _frame(spark):
    # target docs are about "alpha"; the raw pool mixes alpha-like and
    # beta-like candidates — DSIR must rank the alpha-like one first.
    rows = [
        (1, "alpha alpha beta", True),
        (2, "alpha gamma alpha", True),
        (10, "alpha alpha alpha gamma", False),
        (11, "beta beta delta delta", False),
        (12, "", False),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "is_target"])


def test_counts_are_integer_and_empty_docs_drop(spark):
    counts = hashed_token_counts(_frame(spark), buckets=64)
    rows = counts.collect()
    assert all(r["n"] >= 1 for r in rows)
    assert 12 not in {r["id"] for r in rows}  # empty doc never tokenizes
    # per (id, bucket, flag) counts reconstruct the token totals
    per_doc = {r["id"]: 0 for r in rows}
    for r in rows:
        per_doc[r["id"]] += r["n"]
    assert per_doc == {1: 3, 2: 3, 10: 4, 11: 4}


def test_log_ratio_hand_value(spark):
    # collapse everything into one bucket → the ratio is computable by
    # hand: lr = ln((tgt+1)/(tgt_t+B)) - ln((raw+1)/(raw_t+B)) with B=1.
    counts = hashed_token_counts(_frame(spark), buckets=1)
    lr = bucket_log_ratios(counts, buckets=1).collect()
    assert len(lr) == 1
    tgt_t, raw_t = 6.0, 14.0
    expect = round(
        math.log((6 + 1) / (tgt_t + 1)) - math.log((14 + 1) / (raw_t + 1)), 12
    )
    assert lr[0]["lr"] == expect


def test_select_prefers_target_like_candidates(spark):
    out = dsir_select(_frame(spark), k=2, buckets=64).collect()
    assert [r["doc_id"] for r in out] == [10, 11]
    assert out[0]["dsir_score"] > out[1]["dsir_score"]
    # target docs are never selected
    assert {r["doc_id"] for r in out}.isdisjoint({1, 2})


def test_scores_deterministic_across_partitionings(spark):
    df = _frame(spark)
    a = dsir_select(df.repartition(1), k=10, buckets=64).collect()
    b = dsir_select(df.repartition(7), k=10, buckets=64).collect()
    assert [(r["doc_id"], r["dsir_score"]) for r in a] == [
        (r["doc_id"], r["dsir_score"]) for r in b
    ]


def test_log_ratio_table_is_broadcast(spark):
    counts = hashed_token_counts(_frame(spark), buckets=64)
    lrs = bucket_log_ratios(counts, buckets=64)
    plan = dsir_scores(counts, lrs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
