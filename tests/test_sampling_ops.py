

def test_length_buckets_and_waste(spark):
    from soda_core_spark.operators.sampling import (
        assign_length_buckets,
        padding_waste_report,
    )

    import pytest

    df = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 9), (4, 64), (5, 100)], ["doc_id", "n_tokens"]
    )
    b = assign_length_buckets(df, [8, 16, 32, 64])
    got = {r["doc_id"]: (r["len_bucket"], r["pad_tokens"]) for r in b.collect()}
    assert got == {
        1: (0, 3),   # pads to 8
        2: (0, 0),   # exactly 8
        3: (1, 7),   # pads to 16
        4: (3, 0),   # exactly 64
        5: (4, 0),   # overflow: pads to itself
    }
    rep = {
        r["len_bucket"]: (r["n_rows"], r["real_tokens"], r["pad_tokens"])
        for r in padding_waste_report(b).collect()
    }
    assert rep[0] == (2, 13, 3)
    assert rep[4] == (1, 100, 0)
    with pytest.raises(ValueError, match="ascending"):
        assign_length_buckets(df, [16, 8])
    # assignment is pure projection: no shuffle
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_review_sample_plan_wilson(spark):
    import math

    import pytest
    from pyspark.sql import functions as F

    from soda_core_spark.operators.sampling import review_sample_plan

    # src a: 2/4 violate; src b: 0/3 (one NULL flag counts as non-violation)
    df = spark.createDataFrame(
        [("a", True), ("a", True), ("a", False), ("a", False),
         ("b", False), ("b", None), ("b", False)],
        ["source", "bad"],
    )
    got = {
        r["group"]: r.asDict()
        for r in review_sample_plan(
            df, group_col="source", flag=F.col("bad")
        ).collect()
    }
    a = got["a"]
    assert (a["n"], a["k"], a["rate"]) == (4, 2, 0.5)
    # hand-computed Wilson at z=1.96, n=4, p=0.5
    z, n, p = 1.96, 4.0, 0.5
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z / denom * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert a["wilson_lo"] == pytest.approx(center - half, abs=1e-6)
    assert a["wilson_hi"] == pytest.approx(center + half, abs=1e-6)
    assert a["n_required"] == math.ceil(z * z * 0.25 / 0.02**2)
    b = got["b"]
    # zero observed violations: lower bound clamps to exactly 0.0,
    # n_required degenerates to 0 (observed p carries no variance)
    assert (b["n"], b["k"], b["rate"]) == (3, 0, 0.0)
    assert b["wilson_lo"] == 0.0
    assert b["wilson_hi"] > 0.0  # Wilson, not Wald: nonzero width at p=0
    assert b["n_required"] == 0
    with pytest.raises(ValueError, match="margin"):
        review_sample_plan(df, "source", F.col("bad"), margin=1.5)
    with pytest.raises(ValueError, match="z must"):
        review_sample_plan(df, "source", F.col("bad"), z=0.0)


def test_neyman_allocation(spark):
    import pytest

    from soda_core_spark.operators.sampling import neyman_allocation

    # stratum a: high variance, stratum b: constant (sd=0),
    # stratum c: single row (stddev_samp NULL -> 0)
    rows = (
        [("a", float(v)) for v in (0, 100, 0, 100)]
        + [("b", 50.0)] * 4
        + [("c", 7.0)]
        + [("d", None)]  # NULL excluded entirely
    )
    df = spark.createDataFrame(rows, ["source", "v"])
    got = {r["group"]: r.asDict() for r in
           neyman_allocation(df, "source", "v", budget=10).collect()}
    assert set(got) == {"a", "b", "c"}  # d had only NULLs
    # only stratum a has variance: it takes the whole budget, capped at N
    assert got["a"]["weight"] == 1.0
    assert got["a"]["alloc"] == 4  # floor(10) capped at n_rows=4
    assert got["b"]["sd"] == 0.0 and got["b"]["alloc"] == 0
    assert got["c"]["sd"] == 0.0 and got["c"]["alloc"] == 0
    with pytest.raises(ValueError, match="budget"):
        neyman_allocation(df, "source", "v", budget=0)


# -- exemplar_sample ---------------------------------------------------------------


def test_exemplar_sample_covers_strata_deterministically(spark):
    from soda_core_spark.operators.sampling import exemplar_sample

    rows = [(i, "s", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    out = exemplar_sample(df, "score", "source", n_buckets=10).collect()
    assert len(out) == 10  # every decile populated
    assert [r.bucket for r in out] == list(range(10))
    assert sum(r.n_docs for r in out) == 100
    # monotone: each bucket's mean score grows
    means = [r.mean_score for r in out]
    assert means == sorted(means)
    # exemplar lives inside its bucket's range
    for r in out:
        assert r.n_docs == 10
        assert r.bucket * 10 <= r.exemplar_score <= r.bucket * 10 + 9
    # determinism across partitionings
    out2 = exemplar_sample(
        df.repartition(13), "score", "source", n_buckets=10
    ).collect()
    assert out == out2


def test_exemplar_sample_constant_scores_single_bucket(spark):
    import pytest as _pytest

    from soda_core_spark.operators.sampling import exemplar_sample

    df = spark.createDataFrame(
        [(i, "s", 5.0) for i in range(20)], ["doc_id", "source", "score"]
    )
    out = exemplar_sample(df, "score", "source").collect()
    assert len(out) == 1 and out[0].bucket == 0 and out[0].n_docs == 20
    with _pytest.raises(ValueError):
        exemplar_sample(df, "score", n_buckets=1)
