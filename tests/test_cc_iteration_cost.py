"""Regression: iterative lineage/statistics truncation in
connected_components (operators/dedup.py _reliable_checkpoint).

The failure this pins (diagnosed by jstack at sf0.1): checkpointing
preserves the origin plan's Catalyst statistics; the size-only
estimator multiplies child sizes through each round's ~4 joins, so the
inherited sizeInBytes BigInt is raised to the ~4th power per round.
From ~round 16 the driver spends its time in BigInteger.multiply
(0.6 s → 385 s per round, then OOM) — while the logical plan stays a
constant-size LogicalRDD. A graph needing ~25+ rounds is therefore the
regression trigger: under the bug this test effectively never
finishes; with real-stats checkpointing it runs in round-count × small
constant."""

import time

from pyspark.sql import functions as F

from soda_core_spark.operators.dedup import (
    best_of_cluster,
    connected_components,
)


def test_many_round_convergence_stays_linear(spark):
    # a single long PATH maximizes rounds: min-label propagation with one
    # pointer jump per round needs ~25 rounds at this length
    n = 20_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.time()
    out = connected_components(edges)
    comps = out.agg(
        F.countDistinct("component").alias("k"),
        F.count(F.lit(1)).alias("n"),
        F.min("component").alias("m"),
    ).collect()[0]
    dt = time.time() - t0
    assert (comps["k"], comps["n"], comps["m"]) == (1, n, 0)
    # generous wall bound: the broken code exceeds this by ORDERS OF
    # MAGNITUDE (exponential per-round cost), the fixed code by nothing
    # even on a degraded host
    assert dt < 600, f"iterative rounds degraded: {dt:.0f}s"


def test_checkpointed_stats_stay_bounded(spark):
    from soda_core_spark.operators.dedup import _reliable_checkpoint

    df = spark.range(100).select(
        F.col("id").alias("node"), (F.col("id") % 7).alias("label")
    )
    for _ in range(6):
        hop = df.select(F.col("node").alias("p"), F.col("label").alias("pl"))
        df = _reliable_checkpoint(
            df.join(hop, df["label"] == hop["p"], "left").select(
                "node", F.coalesce(F.col("pl"), F.col("label")).alias("label")
            )
        )
        stats = (
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        # real (materialized-cache) stats: bytes of a 100-row frame, not
        # a Long.MaxValue power tower
        assert int(str(stats)) < 10**9, str(stats)[:80]
    assert df.count() == 100


def test_pagerank_high_iteration_count_stays_linear(spark):
    import random

    from soda_core_spark.operators.linkgraph import host_pagerank

    rng = random.Random(1)
    edges = spark.createDataFrame(
        [
            (f"h{rng.randrange(200)}", f"h{rng.randrange(200)}",
             rng.randrange(1, 5))
            for _ in range(2000)
        ],
        ["src_host", "dst_host", "n_links"],
    )
    t0 = time.time()
    out = host_pagerank(edges, iterations=25, checkpoint_every=5)
    assert out.count() == 200
    assert time.time() - t0 < 300  # broken stats would blow far past this
