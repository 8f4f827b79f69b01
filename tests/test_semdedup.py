"""SemDeDup k-means + intra-cluster cosine dedup (operators/semdedup.py)."""

import math

from pyspark.sql import functions as F

from soda_core_spark.operators.semdedup import (
    assign_clusters,
    kmeans_fit_assign,
    semdedup,
    update_centroids,
)


def _vec_frame(spark):
    # two tight groups on orthogonal axes + one echo pair inside group A
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # near vec 0
        (3, [0.95, 0.05, 0.0, 0.0]),  # near vec 0 and 2
        (4, [0.1, 0.9, 0.0, 0.0]),   # near vec 1
        (5, [0.0, 0.0, 1.0, 0.0]),   # its own direction
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_assignment_is_argmin_with_low_cluster_tiebreak(spark):
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])],
        ["id", "e"],
    ).select("id", F.transform("e", lambda x: x.cast("double")).alias("e"))
    cents = [[0.0, 0.0], [2.0, 0.0]]
    got = {
        r["id"]: r["cluster"]
        for r in assign_clusters(pts, cents).collect()
    }
    # vec 2 is equidistant → first (lowest) cluster wins
    assert got == {0: 0, 1: 1, 2: 0}


def test_update_rounds_and_keeps_empty_clusters(spark):
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [1.0, 1.0], 0)], ["id", "e", "cluster"]
    ).select(
        "id",
        F.transform("e", lambda x: x.cast("double")).alias("e"),
        "cluster",
    )
    prev = [[9.0, 9.0], [5.0, 5.0]]
    out = update_centroids(pts, prev)
    assert out[0] == [0.5, 0.5]
    assert out[1] == [5.0, 5.0]  # no members → unchanged


def test_clusters_separate_directions(spark):
    assigned = kmeans_fit_assign(_vec_frame(spark), k=3, iterations=2)
    cl = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert cl[0] == cl[2] == cl[3]
    assert cl[1] == cl[4]
    assert cl[5] not in (cl[0], cl[1])


def test_semdedup_keeps_lowest_id_representative(spark):
    out = {
        r["vec_id"]: r["is_semdup"]
        for r in semdedup(
            _vec_frame(spark), k=3, iterations=2, threshold=0.97
        ).collect()
    }
    # 0 is the representative of the {0,2,3} near-set; 2 and 3 are dups
    # (cos(0,2)≈0.994, cos(0,3)≈0.998, cos(2,3)≈0.999 ≥ .97)
    assert out[0] is False
    assert out[2] is True and out[3] is True
    # cluster representatives (lowest id of their near-set) survive
    assert out[1] is False and out[5] is False
    # vec 4 vs vec 1: cos = 0.9/√0.82 ≈ 0.994 ≥ .97 → dup of 1
    assert out[4] is True


def test_deterministic_across_partitionings(spark):
    df = _vec_frame(spark)
    a = sorted(
        (r["vec_id"], r["cluster"], r["is_semdup"])
        for r in semdedup(df.repartition(1), k=3, iterations=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["is_semdup"])
        for r in semdedup(df.repartition(5), k=3, iterations=2).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Broadcast-centroid assignment path (round-5): bit-parity with the
# literal path, O(1) plan size in k, size-derived k defaults, and the
# blocked (salted) pair-search skew fallback.
# ---------------------------------------------------------------------------


def _rand_pts(spark, n, dim, seed):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 6) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "e"]).select(
        "id", F.transform("e", lambda x: x.cast("double")).alias("e")
    )


def _rand_cents(k, dim, seed):
    import random

    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1, 1), 6) for _ in range(dim)] for _ in range(k)
    ]


def test_assign_literal_vs_broadcast_parity_small_k(spark):
    pts = _rand_pts(spark, 200, 6, seed=11)
    cents = _rand_cents(8, 6, seed=12)
    lit = {r["id"]: r["cluster"]
           for r in assign_clusters(pts, cents, method="literal").collect()}
    bc = {r["id"]: r["cluster"]
          for r in assign_clusters(pts, cents, method="broadcast").collect()}
    assert lit == bc


def test_assign_literal_vs_broadcast_parity_large_k(spark):
    # k=512 > BROADCAST_K_THRESHOLD: auto picks broadcast; parity vs the
    # literal form must still be exact (same fold order, same first-min)
    from soda_core_spark.operators.semdedup import BROADCAST_K_THRESHOLD

    assert BROADCAST_K_THRESHOLD < 512
    pts = _rand_pts(spark, 300, 4, seed=21)
    cents = _rand_cents(512, 4, seed=22)
    lit = {r["id"]: r["cluster"]
           for r in assign_clusters(pts, cents, method="literal").collect()}
    auto = {r["id"]: r["cluster"]
            for r in assign_clusters(pts, cents, method="auto").collect()}
    assert lit == auto


def test_assign_broadcast_plan_size_bounded_in_k(spark):
    # the whole point of the broadcast path: plan text must not grow
    # with k (the literal path's grows ~linearly in k*dim)
    pts = _rand_pts(spark, 10, 4, seed=31)

    def plan_len(k, method):
        df = assign_clusters(pts, _rand_cents(k, 4, seed=32), method=method)
        return len(df._jdf.queryExecution().optimizedPlan().toString())

    bc_small, bc_big = plan_len(8, "broadcast"), plan_len(2048, "broadcast")
    assert bc_big < bc_small * 1.5  # O(1) in k
    lit_small, lit_big = plan_len(8, "literal"), plan_len(256, "literal")
    assert lit_big > lit_small * 2  # literal grows with k (plan toString
    # elides long expression text, so the printed growth understates the
    # real k*dim expression-tree growth — direction is what's pinned)


def test_derive_k_targets_mean_cluster_size():
    from soda_core_spark.operators.semdedup import (
        DEFAULT_TARGET_CLUSTER_SIZE,
        derive_k,
    )

    assert derive_k(0) == 1
    assert derive_k(1) == 1            # k never exceeds n
    assert derive_k(500) == 2          # floor of 2 clusters
    assert derive_k(10_000) == 10      # ceil(10000/1024)
    assert derive_k(10**9) == math.ceil(10**9 / DEFAULT_TARGET_CLUSTER_SIZE)


def test_semdedup_derived_k_runs(spark):
    # k=None derives from corpus size; tiny corpus → k=2, still correct
    out = {r["vec_id"]: r["is_semdup"]
           for r in semdedup(_vec_frame(spark), iterations=2,
                             threshold=0.99).collect()}
    assert len(out) == 6


def test_semdedup_blocked_equals_plain_on_pathological_cluster(spark):
    # every vector near one direction → k-means puts ~all of them in ONE
    # cluster (the hot-key case); triangle blocking must return the
    # identical verdict set
    import random

    rng = random.Random(77)
    rows = [
        (i, [1.0 + rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plain = {(r["vec_id"], r["cluster"], r["is_semdup"])
             for r in semdedup(df, k=2, iterations=2,
                               threshold=0.995).collect()}
    blocked = {(r["vec_id"], r["cluster"], r["is_semdup"])
               for r in semdedup(df, k=2, iterations=2, threshold=0.995,
                                 block_factor=4).collect()}
    assert plain == blocked
    assert any(s for (_, _, s) in plain)  # the fixture does contain dups


def test_semdedup_blocked_join_keys_bound_hot_cluster(spark):
    # structural check of the salted plan: with B blocks the pair join
    # carries (cluster, p, q) equality keys, so the hottest single key
    # holds |c|/B rows per side instead of |c|
    import random

    rng = random.Random(99)
    rows = [(i, [1.0, rng.uniform(-0.01, 0.01)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semdedup(df, k=2, iterations=1, threshold=0.9999, block_factor=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__p" in plan and "__q" in plan  # block-pair key in the join


def test_semdedup_pair_join_aqe_skew_activation(spark):
    """The FIRST skew defense for the cluster-keyed pair join is AQE
    skew-join: with one pathological cluster holding ~all rows, the
    runtime must split the hot shuffle partition (skew=true in the
    final adaptive plan). block_factor is the fallback for when even a
    split partition's pair work is too large."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # the semdedup pair-join shape: self-join on a cluster key where
        # one cluster dominates (payload pads bytes past the threshold)
        rows = [(i, 0 if i < 4000 else 1 + i % 7, "x" * 200)
                for i in range(4400)]
        df = spark.createDataFrame(rows, "id long, cluster int, payload string")
        a, b = df.alias("a"), df.alias("b")
        j = (
            a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert j.collect()[0]["n"] > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1  # the hot key WAS split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
