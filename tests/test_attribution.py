"""rule_attribution + host_reputation_gate: hand values, invariants,
plan shape (one aggregation pass; broadcast verdict join)."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.attribution import rule_attribution
from soda_core_spark.operators.blocklist import host_reputation_gate


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    # n_chars, has_x: engineered so every overlap cell is known
    rows = [
        (1, 50, True),   # fails both
        (2, 50, False),  # fails short only
        (3, 500, True),  # fails has_x only
        (4, 500, False), # clean
        (5, 50, True),   # fails both
        (6, 500, False), # clean
    ]
    return spark.createDataFrame(rows, "id int, n int, x boolean")


def test_hand_values(docs):
    out = rule_attribution(
        docs, {"short": F.col("n") < 100, "flagged": F.col("x")}
    )
    rows = {r["rule"]: r for r in out.collect()}
    assert rows["short"]["n_fail"] == 3
    assert rows["short"]["n_only_fail"] == 1      # doc 2
    assert rows["short"]["n_first_fail"] == 3     # declared first
    assert rows["flagged"]["n_fail"] == 3
    assert rows["flagged"]["n_only_fail"] == 1    # doc 3
    assert rows["flagged"]["n_first_fail"] == 1   # doc 3 only (1,5 hit short first)
    assert rows["short"]["fail_rate"] == 0.5
    # cascade invariant: Σ n_first_fail == total dropped docs
    assert rows["short"]["n_first_fail"] + rows["flagged"]["n_first_fail"] == 4


def test_single_aggregation_pass(docs):
    out = rule_attribution(
        docs,
        {
            "a": F.col("n") < 100,
            "b": F.col("x"),
            "c": F.col("n") > 400,
            "d": F.col("id") % 2 == 0,
        },
    )
    plan = _plan(out)
    # rule count must not multiply scans or aggregations
    assert plan.count("HashAggregate") <= 2, plan  # partial + final
    assert plan.count("Scan") <= 1, plan


def test_empty_rules_rejected(docs):
    with pytest.raises(ValueError):
        rule_attribution(docs, {})


@pytest.fixture(scope="module")
def hosted(spark):
    # host a: 3 docs, low score (supported+bad -> blocked)
    # host b: 3 docs, high score (supported+good)
    # host c: 1 doc, low score (unsupported -> never blocked)
    rows = (
        [("a", 0.1), ("a", 0.2), ("a", 0.3)]
        + [("b", 0.9), ("b", 0.8), ("b", 0.7)]
        + [("c", 0.0)]
    )
    return spark.createDataFrame(rows, "host string, sc double")


def test_gate_verdicts(hosted):
    out = host_reputation_gate(
        hosted, F.col("sc"), host_col="host", min_support=2, min_mean_score=0.5
    )
    v = {r["host"]: r for r in out.collect()}
    assert v["a"]["host_blocked"] is True
    assert v["a"]["host_mean_score"] == 0.2
    assert v["a"]["host_n_docs"] == 3
    assert v["b"]["host_blocked"] is False
    assert v["c"]["host_blocked"] is False  # support floor protects it
    # every input row survives annotation (gate annotates, caller drops)
    assert out.count() == 7


def test_gate_broadcasts_verdicts(hosted):
    out = host_reputation_gate(
        hosted, F.col("sc"), host_col="host", min_support=2, min_mean_score=0.5
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rule_pack_diff_hand_values(docs):
    from soda_core_spark.operators.attribution import rule_pack_diff

    pack_a = {"short": F.col("n") < 100, "flagged": F.col("x")}
    pack_b = {"short": F.col("n") < 600, "big": F.col("id") > 4}
    out = rule_pack_diff(docs, pack_a, pack_b)
    v = {r["rule"]: r for r in out.collect()}
    # short: a fails {1,2,5}; b fails all 6 -> newly_fail {3,4,6}
    assert (v["short"]["n_fail_a"], v["short"]["n_fail_b"]) == (3, 6)
    assert (v["short"]["n_newly_fail"], v["short"]["n_newly_pass"]) == (3, 0)
    # flagged retired in b: full win-back
    assert (v["flagged"]["n_fail_a"], v["flagged"]["n_fail_b"]) == (3, 0)
    assert v["flagged"]["n_newly_pass"] == 3
    # big introduced in b: fails {5,6}
    assert (v["big"]["n_fail_a"], v["big"]["n_fail_b"]) == (0, 2)
    # __any__: a fails {1,2,3,5}; b fails all -> keep->drop = {4,6}
    assert (v["__any__"]["n_fail_a"], v["__any__"]["n_fail_b"]) == (4, 6)
    assert (v["__any__"]["n_newly_fail"], v["__any__"]["n_newly_pass"]) == (2, 0)
    assert set(v) == {"short", "flagged", "big", "__any__"}


def test_rule_pack_diff_single_pass(docs):
    from soda_core_spark.operators.attribution import rule_pack_diff

    out = rule_pack_diff(
        docs, {"a": F.col("n") < 100}, {"b": F.col("x")}
    )
    plan = _plan(out)
    assert plan.count("HashAggregate") <= 2, plan
    assert plan.count("Scan") <= 1, plan


def test_group_diversity_hand_values(spark):
    import math

    from soda_core_spark.operators.profiling import group_diversity

    rows = [("s1", "h1")] * 4 + [("s1", "h2")] * 4 + [("s2", "h1")] * 7 + [
        ("s2", "h2")
    ]
    df = spark.createDataFrame(rows, "shard string, host string")
    v = {r["shard"]: r for r in
         group_diversity(df, "shard", "host", min_entropy=0.5).collect()}
    assert v["s1"]["entropy"] == round(math.log(2), 6)  # uniform 2 keys
    assert v["s1"]["top_share"] == 0.5
    assert v["s1"]["low_diversity"] is False
    # s2: p = 7/8, 1/8
    h = -(7 / 8) * math.log(7 / 8) - (1 / 8) * math.log(1 / 8)
    assert v["s2"]["entropy"] == round(h, 6)
    assert v["s2"]["top_share"] == 0.875
    assert v["s2"]["low_diversity"] is True
    assert (v["s2"]["n_docs"], v["s2"]["n_keys"]) == (8, 2)


def test_empty_corpus_reports_zeros(spark):
    from soda_core_spark.operators.attribution import rule_pack_diff

    empty = spark.createDataFrame([], "id int, n int, x boolean")
    rows = rule_attribution(empty, {"short": F.col("n") < 100}).collect()
    assert rows[0]["n_fail"] == 0 and rows[0]["fail_rate"] == 0.0
    rows = rule_pack_diff(
        empty, {"a": F.col("n") < 100}, {"a": F.col("n") < 200}
    ).collect()
    assert all(r["n_fail_a"] == 0 and r["n_newly_fail"] == 0 for r in rows)


def test_null_host_never_blocked(spark):
    df = spark.createDataFrame(
        [(None, 0.1), (None, 0.1), ("a", 0.1), ("a", 0.2)],
        "host string, sc double",
    )
    out = host_reputation_gate(
        df, F.col("sc"), host_col="host", min_support=2, min_mean_score=0.5
    )
    v = {r["host"]: r for r in out.collect()}
    assert v[None]["host_blocked"] is False
    assert v["a"]["host_blocked"] is True


def test_daily_trend_hand_values(spark):
    from soda_core_spark.operators.profiling import daily_trend

    rows = [
        ("f", "2026-01-01 10:00:00", 1.0),
        ("f", "2026-01-01 11:00:00", 3.0),
        ("f", "2026-01-02 10:00:00", 5.0),
        ("f", "2026-01-04 10:00:00", 7.0),  # gap day: ROWS frame skips it
        ("g", "2026-01-01 10:00:00", 100.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double"
                               ).withColumn("ts", F.to_timestamp("ts"))
    out = daily_trend(df, "ts", "k", "value", ma_days=2)
    v = {(r["k"], str(r["day"])): r for r in out.collect()}
    assert v[("f", "2026-01-01")]["n"] == 2
    assert v[("f", "2026-01-01")]["sum_value"] == 4.0
    assert v[("f", "2026-01-01")]["delta_n"] is None
    assert v[("f", "2026-01-02")]["ma2_n"] == 1.5   # avg(2, 1)
    assert v[("f", "2026-01-02")]["delta_n"] == -1
    assert v[("f", "2026-01-04")]["ma2_n"] == 1.0   # avg(1, 1) over ROWS
    assert v[("g", "2026-01-01")]["n"] == 1


def test_attribution_random_pandas_twin(spark):
    """200-row random frame, 5 rules: every counter recomputed by an
    independent pandas twin — the same oracle discipline as the
    registry's DuckDB twins, in-process."""
    import random

    import pandas as pd

    rng = random.Random(7)
    pdf = pd.DataFrame({
        "a": [rng.randint(0, 9) for _ in range(200)],
        "b": [rng.random() for _ in range(200)],
    })
    df = spark.createDataFrame(pdf)
    rules = {
        "r1": F.col("a") < 3,
        "r2": F.col("b") > 0.7,
        "r3": (F.col("a") % 2) == 0,
        "r4": F.col("b") < 0.1,
        "r5": F.col("a") == 9,
    }
    flags = pd.DataFrame({
        "r1": pdf.a < 3,
        "r2": pdf.b > 0.7,
        "r3": pdf.a % 2 == 0,
        "r4": pdf.b < 0.1,
        "r5": pdf.a == 9,
    })
    tot = flags.sum(axis=1)
    got = {r["rule"]: r for r in rule_attribution(df, rules).collect()}
    earlier = pd.Series(False, index=flags.index)
    for name in flags.columns:
        f = flags[name]
        assert got[name]["n_fail"] == int(f.sum()), name
        assert got[name]["n_only_fail"] == int((f & (tot == 1)).sum()), name
        assert got[name]["n_first_fail"] == int((f & ~earlier).sum()), name
        assert got[name]["fail_rate"] == round(f.sum() / 200, 6), name
        earlier = earlier | f
    # conservation: Σ first-fail = dropped docs
    assert sum(got[n]["n_first_fail"] for n in flags.columns) == int(
        (tot > 0).sum()
    )


# -- rule_overlap -----------------------------------------------------------


def test_rule_overlap_hand_values(docs):
    from soda_core_spark.operators.attribution import rule_overlap

    out = rule_overlap(
        docs, {"short": F.col("n") < 100, "flagged": F.col("x")}
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["rule_a"], r["rule_b"]) == ("short", "flagged")
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["n_both"] == 2                      # docs 1, 5
    assert r["jaccard"] == 0.5                   # 2 / (3+3-2)
    # lift = (2/6) / ((3/6)*(3/6)) = 4/3
    assert r["lift"] == round(4 / 3, 6)


def test_rule_overlap_never_firing_rule(docs):
    from soda_core_spark.operators.attribution import rule_overlap

    out = rule_overlap(
        docs, {"short": F.col("n") < 100, "never": F.col("n") < 0}
    )
    r = out.collect()[0]
    assert r["n_b"] == 0 and r["n_both"] == 0
    assert r["jaccard"] == 0.0                   # union = 3, both = 0
    assert r["lift"] is None                     # no base rate


def test_rule_overlap_empty_corpus(docs):
    from soda_core_spark.operators.attribution import rule_overlap

    out = rule_overlap(
        docs.where(F.lit(False)),
        {"a": F.col("n") < 100, "b": F.col("x")},
    )
    r = out.collect()[0]
    assert r["n_a"] == 0 and r["n_b"] == 0 and r["n_both"] == 0
    assert r["jaccard"] == 0.0 and r["lift"] is None


def test_rule_overlap_single_pass(docs):
    from soda_core_spark.operators.attribution import rule_overlap

    out = rule_overlap(
        docs,
        {
            "a": F.col("n") < 100,
            "b": F.col("x"),
            "c": F.col("n") > 400,
            "d": F.col("id") % 2 == 0,
        },
    )
    plan = _plan(out)
    # 4 rules -> 6 pairs, still ONE scan + partial/final aggregation
    assert plan.count("HashAggregate") <= 2, plan
    assert plan.count("Scan") <= 1, plan
    assert out.count() == 6


def test_rule_overlap_needs_two(docs):
    from soda_core_spark.operators.attribution import rule_overlap

    with pytest.raises(ValueError):
        rule_overlap(docs, {"only": F.col("x")})


# -- poisson_bootstrap_rates ---------------------------------------------------


def test_poisson1_cdf_constants():
    import math

    from soda_core_spark.operators.attribution import POISSON1_CDF

    assert POISSON1_CDF[0] == pytest.approx(math.exp(-1.0))
    assert POISSON1_CDF[1] == pytest.approx(2 * math.exp(-1.0))
    assert len(POISSON1_CDF) == 8
    assert all(a < b for a, b in zip(POISSON1_CDF, POISSON1_CDF[1:]))
    assert POISSON1_CDF[-1] > 0.99998  # P(X<=7) = 1 - 1.02e-5


def test_bootstrap_rates_point_estimate_and_ci(spark):
    from soda_core_spark.operators.attribution import poisson_bootstrap_rates

    # 200 docs, exactly 50 flagged -> rate 0.25; binomial SE ~ 0.031
    df = spark.createDataFrame(
        [(i, i % 4 == 0) for i in range(200)], ["doc_id", "bad"]
    )
    r = poisson_bootstrap_rates(
        df, {"bad": F.col("bad")}, replicates=64
    ).collect()[0]
    assert r.flag == "bad" and r.n_docs == 200 and r.n_replicates == 64
    assert r.rate == 0.25  # exact: integer counts, weight-1 replicate
    # bootstrap SE should be in the ballpark of sqrt(p(1-p)/n) = 0.0306
    assert 0.015 < r.boot_se < 0.06
    assert r.ci_lo <= 0.25 <= r.ci_hi
    assert 0.0 <= r.ci_lo and r.ci_hi <= 1.0


def test_bootstrap_rates_deterministic_across_partitioning(spark):
    from soda_core_spark.operators.attribution import poisson_bootstrap_rates

    rows = [(i, i % 7 == 0, i % 3 == 0) for i in range(150)]
    a = poisson_bootstrap_rates(
        spark.createDataFrame(rows, ["doc_id", "x", "y"]).repartition(1),
        {"x": F.col("x"), "y": F.col("y")},
    ).collect()
    b = poisson_bootstrap_rates(
        spark.createDataFrame(rows, ["doc_id", "x", "y"]).repartition(11),
        {"x": F.col("x"), "y": F.col("y")},
    ).collect()
    assert a == b  # md5-seeded weights: partitioning-invariant


def test_bootstrap_rates_degenerate_flags(spark):
    from soda_core_spark.operators.attribution import poisson_bootstrap_rates

    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    out = {
        r.flag: r
        for r in poisson_bootstrap_rates(
            df,
            {"always": F.lit(True), "never": F.lit(False)},
            replicates=16,
        ).collect()
    }
    # constant flags: every replicate rate identical -> SE exactly 0
    assert out["always"].rate == 1.0 and out["always"].boot_se == 0.0
    assert out["never"].rate == 0.0 and out["never"].boot_se == 0.0
    assert out["always"].ci_lo == 1.0 and out["never"].ci_hi == 0.0
    with pytest.raises(ValueError):
        poisson_bootstrap_rates(df, {})
    with pytest.raises(ValueError):
        poisson_bootstrap_rates(df, {"a": F.lit(True)}, replicates=1)
