"""Bloom-filter membership pre-filter (operators/bloom.py)."""

from pyspark.sql import functions as F

from soda_core_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
    bloom_position,
)

M, K = 1 << 14, 3


def _keys(spark, lo, hi):
    return spark.createDataFrame([(f"key{i}",) for i in range(lo, hi)], ["k"])


def test_no_false_negatives(spark):
    seen = _keys(spark, 0, 300)
    bl = bloom_build(seen, "k", m=M, k=K)
    probed = bloom_might_contain(seen, bl, "k", m=M, k=K).collect()
    assert all(r["bloom_maybe"] for r in probed)


def test_definite_new_keys_mostly_miss(spark):
    # 300 keys * 3 hashes ≈ 5.5% fill of 2^14 bits → fp rate ~1e-4;
    # 200 fresh probes should essentially all come back definite-new.
    bl = bloom_build(_keys(spark, 0, 300), "k", m=M, k=K)
    probed = bloom_might_contain(_keys(spark, 1000, 1200), bl, "k", m=M, k=K)
    n_maybe = probed.where("bloom_maybe").count()
    assert n_maybe <= 2


def test_filter_frame_is_bounded_and_words_packed(spark):
    bl = bloom_build(_keys(spark, 0, 500), "k", m=M, k=K)
    rows = bl.collect()
    assert len(rows) <= M // 64
    assert all(0 <= r["word"] < M // 64 for r in rows)
    # packed bits reproduce the raw position set exactly
    set_bits = set()
    for r in rows:
        for b in range(64):
            if (r["bits"] >> b) & 1:
                set_bits.add(r["word"] * 64 + b)
    expected = {
        r["p"]
        for i in range(K)
        for r in _keys(spark, 0, 500)
        .select(bloom_position(F.col("k"), i, M).alias("p"))
        .collect()
    }
    assert set_bits == expected


def test_merge_is_union_of_memberships(spark):
    a, b = _keys(spark, 0, 100), _keys(spark, 100, 200)
    merged = bloom_merge(
        [bloom_build(a, "k", m=M, k=K), bloom_build(b, "k", m=M, k=K)]
    )
    probed = bloom_might_contain(
        _keys(spark, 0, 200), merged, "k", m=M, k=K
    ).collect()
    assert all(r["bloom_maybe"] for r in probed)


def test_probe_plan_has_no_shuffle(spark):
    # feed a pre-materialized (word, bits) frame so the only operators in
    # the plan are the probe's own: k broadcast joins, zero shuffles.
    bl = spark.createDataFrame([(0, 1), (5, 9)], ["word", "bits"])
    probed = bloom_might_contain(_keys(spark, 0, 80), bl, "k", m=M, k=K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == K
    assert "Exchange hashpartitioning" not in plan
