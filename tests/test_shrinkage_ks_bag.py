"""Tests for shrunk_group_rate, ks_drift (operators/profiling.py) and
bag_fingerprint_classes (operators/dedup.py)."""

from soda_core_spark.operators.dedup import bag_fingerprint_classes
from soda_core_spark.operators.profiling import ks_drift, shrunk_group_rate


class TestShrunkGroupRate:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "source string, kept boolean")

    def test_mom_shrinkage_hand_computed(self, spark):
        # A: 8/10, B: 1/10, C: 5/10 -> m=(0.8+0.1+0.5)/3, s2=var_pop
        rows = (
            [("A", True)] * 8 + [("A", False)] * 2
            + [("B", True)] * 1 + [("B", False)] * 9
            + [("C", True)] * 5 + [("C", False)] * 5
        )
        out = {r.group: r for r in shrunk_group_rate(
            self._df(spark, rows), "source", "kept").collect()}
        rates = [0.8, 0.1, 0.5]
        m = sum(rates) / 3
        s2 = sum((p - m) ** 2 for p in rates) / 3
        nu = m * (1 - m) / s2 - 1
        assert out["A"].prior_strength == round(nu, 6)
        for g, k in (("A", 8), ("B", 1), ("C", 5)):
            exp = (k + m * nu) / (10 + nu)
            assert out[g].shrunk_rate == round(exp, 6), g
        # shrinkage direction: extreme groups pull toward the mean
        assert out["A"].shrunk_rate < out["A"].rate
        assert out["B"].shrunk_rate > out["B"].rate

    def test_small_group_shrinks_more(self, spark):
        # two hosts at the same raw rate 1.0, different evidence mass,
        # plus a low-rate anchor giving the prior variance
        rows = (
            [("big", True)] * 50
            + [("tiny", True)] * 1
            + [("anchor", False)] * 20 + [("anchor", True)] * 5
        )
        out = {r.group: r for r in shrunk_group_rate(
            self._df(spark, rows), "source", "kept").collect()}
        assert out["tiny"].shrunk_rate < out["big"].shrunk_rate

    def test_degenerate_policies(self, spark):
        # single group -> no shrinkage, prior_strength 0
        one = shrunk_group_rate(
            self._df(spark, [("A", True), ("A", False)]), "source", "kept"
        ).collect()[0]
        assert one.prior_strength == 0.0 and one.shrunk_rate == one.rate
        # all groups at the same rate (s2 == 0) -> no-op
        eq = shrunk_group_rate(
            self._df(spark, [("A", True), ("A", False),
                             ("B", True), ("B", False)]),
            "source", "kept",
        ).collect()
        assert all(r.prior_strength == 0.0 and r.shrunk_rate == r.rate
                   for r in eq)

    def test_null_flag_counts_as_false(self, spark):
        rows = [("A", True), ("A", None), ("B", False), ("B", True)]
        out = {r.group: r for r in shrunk_group_rate(
            self._df(spark, rows), "source", "kept").collect()}
        assert out["A"].k == 1 and out["A"].n == 2


class TestKsDrift:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "day string, score double")

    def test_identical_distributions_zero(self, spark):
        rows = [("d1", v) for v in (1.0, 2.0, 3.0)] + [
            ("d2", v) for v in (1.0, 2.0, 3.0)]
        out = ks_drift(self._df(spark, rows)).collect()
        assert len(out) == 1
        assert out[0].day == "d2" and out[0].ks == 0.0

    def test_hand_computed_gap(self, spark):
        # d1: {1,2}, d2: {2,3}; ECDFs: at v=1 |0.5-0|=0.5, v=2 |1-0.5|=0.5,
        # v=3 |1-1|=0 -> ks = 0.5
        rows = [("d1", 1.0), ("d1", 2.0), ("d2", 2.0), ("d2", 3.0)]
        out = ks_drift(self._df(spark, rows)).collect()[0]
        assert out.ks == 0.5 and out.n_prev == 2 and out.n_cur == 2

    def test_disjoint_supports_ks_one(self, spark):
        rows = [("d1", 1.0), ("d1", 2.0), ("d2", 10.0), ("d2", 11.0)]
        assert ks_drift(self._df(spark, rows)).collect()[0].ks == 1.0

    def test_chain_of_days_and_null_exclusion(self, spark):
        rows = [("d1", 1.0), ("d2", 1.0), ("d2", None), ("d3", 5.0)]
        out = {r.day: r for r in ks_drift(self._df(spark, rows)).collect()}
        # first day has no predecessor; NULL on d2 excluded from n
        assert set(out) == {"d2", "d3"}
        assert out["d2"].n_prev == 1 and out["d2"].n_cur == 1
        assert out["d2"].ks == 0.0 and out["d3"].ks == 1.0


class TestBagFingerprintClasses:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_reordered_tokens_same_class(self, spark):
        rows = [
            (1, "alpha beta gamma"),
            (2, "gamma alpha beta"),
            (3, "Beta  GAMMA\nalpha"),
            (4, "alpha beta delta"),
        ]
        out = bag_fingerprint_classes(self._df(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_docs == 3 and r.survivor_id == 1
        assert list(r.sample_ids) == [1, 2, 3]

    def test_multiset_counts_distinguish(self, spark):
        rows = [(1, "buy buy now"), (2, "buy now now"), (3, "now buy buy")]
        out = bag_fingerprint_classes(self._df(spark, rows)).collect()
        assert len(out) == 1
        assert set(out[0].sample_ids) == {1, 3}

    def test_sample_cap_and_full_count(self, spark):
        rows = [(i, "same words here") for i in range(30)]
        r = bag_fingerprint_classes(self._df(spark, rows), max_ids=5).collect()[0]
        assert r.n_docs == 30 and r.survivor_id == 0
        assert list(r.sample_ids) == [0, 1, 2, 3, 4]

    def test_no_false_classes(self, spark):
        rows = [(1, "one doc"), (2, "another doc"), (3, "")]
        assert bag_fingerprint_classes(self._df(spark, rows)).count() == 0


class TestGroupGini:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "source string, n_chars double")

    def test_known_values(self, spark):
        from soda_core_spark.operators.profiling import group_gini

        # perfect equality -> 0; [0,0,0,10] -> G = 3/4 * ... compute by
        # all-pairs definition: sum|xi-xj| / (2 n^2 mu)
        rows = [("eq", 5.0)] * 4 + [("skew", 0.0)] * 3 + [("skew", 10.0)]
        out = {r.group: r for r in group_gini(
            self._df(spark, rows), "source", "n_chars").collect()}
        assert out["eq"].gini == 0.0 and out["eq"].n == 4
        xs = [0.0, 0.0, 0.0, 10.0]
        mu = sum(xs) / len(xs)
        g = sum(abs(a - b) for a in xs for b in xs) / (2 * len(xs) ** 2 * mu)
        assert out["skew"].gini == round(g, 6)
        assert out["skew"].total == 10.0

    def test_matches_allpairs_with_ties(self, spark):
        from soda_core_spark.operators.profiling import group_gini

        xs = [1.0, 1.0, 2.0, 3.0, 3.0, 3.0, 8.0]
        out = group_gini(
            self._df(spark, [("a", x) for x in xs]), "source", "n_chars"
        ).collect()[0]
        mu = sum(xs) / len(xs)
        g = sum(abs(a - b) for a in xs for b in xs) / (2 * len(xs) ** 2 * mu)
        assert out.gini == round(g, 6)

    def test_null_negative_and_zero_total(self, spark):
        from soda_core_spark.operators.profiling import group_gini

        rows = [("z", 0.0), ("z", 0.0), ("m", 1.0), ("m", None), ("m", -5.0)]
        out = {r.group: r for r in group_gini(
            self._df(spark, rows), "source", "n_chars").collect()}
        assert out["z"].gini == 0.0 and out["z"].total == 0.0
        # NULL and negative excluded: group m keeps only the single 1.0
        assert out["m"].n == 1 and out["m"].gini == 0.0


def test_hill_tail_index(spark):
    import math

    import pytest

    from soda_core_spark.operators.profiling import hill_tail_index

    rows = (
        [("a",)] * 8 + [("b",)] * 4 + [("c",)] * 2 + [("d",)] * 1
    )
    df = spark.createDataFrame(rows, ["host"])
    r = hill_tail_index(df, "host", k=2).collect()[0]
    # X=(8,4), X_(3)=2: inv = (ln8+ln4)/2 - ln2 = 1.5*ln2
    inv = 1.5 * math.log(2.0)
    assert (r["n_groups"], r["k"], r["x_k1"]) == (4, 2, 2)
    assert r["inv_alpha"] == pytest.approx(inv, abs=1e-6)
    assert r["alpha"] == pytest.approx(1.0 / inv, abs=1e-6)
    # fewer than k+1 groups: reported NULL, not fabricated
    r2 = hill_tail_index(df, "host", k=5).collect()[0]
    assert r2["alpha"] is None and r2["inv_alpha"] is None
    with pytest.raises(ValueError, match="k must"):
        hill_tail_index(df, "host", k=0)
    # top-k must compile to TakeOrderedAndProject, never a global sort
    plan = hill_tail_index(df, "host", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_burrows_delta(spark):
    import pytest

    from soda_core_spark.operators.profiling import burrows_delta

    # a and b share style exactly (identical relative frequencies);
    # c inverts the function-word ratio — Delta(a,b) must be ~0 and
    # strictly below Delta(a,c).
    df = spark.createDataFrame(
        [
            ("a", "the the the of"),
            ("b", "the the the of the the the of"),
            ("c", "of of of the"),
        ],
        ["source", "text"],
    )
    rows = burrows_delta(df, top_k=2).collect()
    got = {(r["g1"], r["g2"]): (r["n_terms"], r["delta"]) for r in rows}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")][1] == pytest.approx(0.0, abs=1e-9)
    assert got[("a", "c")][1] > 1.0
    assert got[("a", "c")] == got[("b", "c")]
    assert all(v[0] == 2 for v in got.values())
    # constant-frequency words carry no signal: with one source all
    # stddevs are NULL-or-zero -> zero scored terms, delta NULL
    one = spark.createDataFrame([("a", "x y")], ["source", "text"])
    assert burrows_delta(one, top_k=2).collect() == []
    with pytest.raises(ValueError, match="top_k"):
        burrows_delta(df, top_k=0)
