"""Skew diagnostics + numeric histogram: hand values, NULL/NaN/edge
semantics, plan shape; LSH planner properties."""

import math

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.dedup import (
    lsh_collision_probability,
    plan_lsh_params,
)
from soda_core_spark.operators.profiling import key_skew_stats, numeric_histogram


def test_skew_hand_values(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, ["k"])
    got = key_skew_stats(df, "k", top_k=3).orderBy("rank").collect()
    assert [(r["rank"], r["k"], r["n_rows"]) for r in got] == [
        (1, "hot", 6),
        (2, "warm", 3),
        (3, "a", 1),
    ]
    # 12 rows over 5 keys → mean 2.4; hot = 6/12 share, 6/2.4 = 2.5×
    assert got[0]["share"] == 0.5
    assert got[0]["skew_x"] == 2.5


def test_skew_null_key_counted(spark):
    df = spark.createDataFrame(
        [(None,), (None,), ("x",)], "k string"
    )
    got = key_skew_stats(df, "k", top_k=2).orderBy("rank").collect()
    assert got[0]["k"] is None and got[0]["n_rows"] == 2


def test_skew_counts_partial_aggregate(spark):
    # the corpus-side aggregate must be partial (map-side combine) so the
    # hot key never ships raw rows: HashAggregate appears below the
    # exchange in the physical plan
    df = spark.range(1000).select((F.col("id") % 3).alias("k"))
    plan = key_skew_stats(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan


def test_histogram_hand_values(spark):
    # values 0..9 in 5 bins of width 1.8
    df = spark.createDataFrame([(float(i),) for i in range(10)], ["v"])
    got = {r["bin"]: r for r in numeric_histogram(df, F.col("v"), 5).collect()}
    assert len(got) == 5
    assert [got[b]["n_rows"] for b in range(5)] == [2, 2, 2, 2, 2]
    assert got[0]["lo"] == 0.0 and got[4]["hi"] == 9.0
    # max value is included in the top (closed) bin
    assert got[4]["n_rows"] == 2


def test_histogram_nulls_nans_empty_bins(spark):
    rows = [(0.0,), (10.0,), (None,), (float("nan"),)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["bin"]: r["n_rows"] for r in numeric_histogram(df, F.col("v"), 4).collect()}
    assert got == {0: 1, 1: 0, 2: 0, 3: 1}


def test_histogram_degenerate_single_value(spark):
    df = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    got = {r["bin"]: r for r in numeric_histogram(df, F.col("v"), 3).collect()}
    assert got[0]["n_rows"] == 2
    assert got[1]["n_rows"] == 0 and got[2]["n_rows"] == 0


def test_histogram_empty_input(spark):
    df = spark.createDataFrame([], "v double")
    out = numeric_histogram(df, F.col("v"), 4).collect()
    assert len(out) == 4
    assert all(r["n_rows"] == 0 for r in out)


def test_lsh_planner_properties():
    b, r = plan_lsh_params(0.5, 128)
    assert b * r <= 128 and b >= 1 and r >= 1
    # the s-curve's inflection (1/b)^(1/r) should sit near the threshold
    assert abs((1.0 / b) ** (1.0 / r) - 0.5) < 0.15
    # a higher threshold needs longer rows (sharper curve further right)
    b2, r2 = plan_lsh_params(0.9, 128)
    assert r2 > r
    # weighting recall pushes toward more bands (higher collision prob)
    b_fn, r_fn = plan_lsh_params(0.5, 128, fp_weight=0.1, fn_weight=0.9)
    p_bal = lsh_collision_probability(0.5, b, r)
    p_fn = lsh_collision_probability(0.5, b_fn, r_fn)
    assert p_fn >= p_bal
    # collision probability is monotone in s for any plan
    probs = [lsh_collision_probability(s / 20, b, r) for s in range(21)]
    assert probs == sorted(probs)
    assert math.isclose(probs[-1], 1.0)


def test_lsh_planner_validation():
    import pytest

    with pytest.raises(ValueError):
        plan_lsh_params(0.0, 128)
    with pytest.raises(ValueError):
        plan_lsh_params(0.5, 1)
    with pytest.raises(ValueError):
        plan_lsh_params(0.5, 128, fp_weight=0.0, fn_weight=0.0)


def _psi_total(spark, ref_rows, cur_rows, n_bins=4):
    from soda_core_spark.operators.profiling import population_stability_index

    ref = spark.createDataFrame([(float(x),) for x in ref_rows], "v double")
    cur = spark.createDataFrame([(float(x),) for x in cur_rows], "v double")
    out = population_stability_index(ref, cur, F.col("v"), n_bins).collect()
    return out, sum(r["psi_term"] for r in out)


def test_psi_identical_distributions_near_zero(spark):
    vals = [i / 10.0 for i in range(40)]
    out, psi = _psi_total(spark, vals, vals)
    assert len(out) == 4
    assert abs(psi) < 1e-9
    # identical windows: every per-bin term is exactly 0 (p == q)
    assert all(r["psi_term"] == 0.0 for r in out)


def test_psi_detects_shift(spark):
    ref = [i / 10.0 for i in range(40)]          # uniform on [0, 3.9]
    cur = [3.5] * 40                              # mass piled in top bin
    _, psi = _psi_total(spark, ref, cur)
    assert psi > 0.25  # 'shifted' by the standard rule of thumb


def test_psi_out_of_range_clamps_to_edges(spark):
    ref = [0.0, 1.0, 2.0, 3.0]
    cur = [-100.0, 100.0]  # far outside the reference range
    out, _ = _psi_total(spark, ref, cur)
    by_bin = {r["bin"]: r for r in out}
    # smoothed cur shares: edge bins (1+0.5)/(2+2), middle (0+0.5)/(2+2)
    assert by_bin[0]["cur_share"] == 0.375
    assert by_bin[3]["cur_share"] == 0.375
    assert by_bin[1]["cur_share"] == 0.125
    # no mass vanished: total smoothed share is 1
    assert abs(sum(r["cur_share"] for r in out) - 1.0) < 1e-9


def test_psi_empty_bins_finite(spark):
    import math

    ref = [0.0, 3.0]  # only edge bins populated
    cur = [1.5]       # only a middle bin
    out, psi = _psi_total(spark, ref, cur)
    assert all(
        r["psi_term"] is not None and math.isfinite(r["psi_term"])
        for r in out
    )
    assert math.isfinite(psi) and psi > 0


def test_psi_against_bins_matches_two_frame_form(spark):
    from soda_core_spark.operators.profiling import (
        numeric_histogram,
        population_stability_index,
        psi_against_bins,
    )

    # values placed mid-bin so the 6dp-rounded bin edges in the stored
    # histogram bin identically to the unrounded two-frame form
    ref_vals = [0.05 + i * 0.1 for i in range(40)]
    cur_vals = [3.55] * 10 + [0.15] * 5
    ref = spark.createDataFrame([(v,) for v in ref_vals], "v double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "v double")
    two_frame = sum(
        r["psi_term"]
        for r in population_stability_index(ref, cur, F.col("v"), 4).collect()
    )
    bins = [
        (r["bin"], r["lo"], r["hi"], r["n_rows"])
        for r in numeric_histogram(ref, F.col("v"), 4).collect()
    ]
    psi, detail = psi_against_bins(cur, F.col("v"), bins)
    assert abs(psi - two_frame) < 1e-6
    assert len(detail) == 4
    assert abs(sum(d["cur_share"] for d in detail) - 1.0) < 1e-9


def test_psi_against_bins_excludes_null_nan(spark):
    from soda_core_spark.operators.profiling import psi_against_bins

    bins = [(0, 0.0, 1.0, 10), (1, 1.0, 2.0, 10)]
    cur = spark.createDataFrame(
        [(0.5,), (1.5,), (None,), (float("nan"),)], "v double"
    )
    psi, detail = psi_against_bins(cur, F.col("v"), bins)
    # only the two real values count: shares (1+0.5)/(2+1) each
    assert all(abs(d["cur_share"] - 0.5) < 1e-9 for d in detail)
    assert abs(psi) < 1e-9


# ---------------------------------------------------------------------------
# OOV rate
# ---------------------------------------------------------------------------


def test_top_vocabulary_and_oov_rate(spark):
    from soda_core_spark.operators.profiling import (
        top_vocabulary,
        with_oov_rate,
    )

    rows = [
        (1, "the the the cat"),
        (2, "the dog"),
        (3, "zq xv"),        # fully OOV
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vocab = top_vocabulary(df, k=2)
    # counts: the=4, cat=1, dog=1, xv=1, zq=1 → top-2 ties by word: cat
    assert vocab == ["the", "cat"]
    got = {
        r["doc_id"]: (r["n_words"], r["oov_rate"])
        for r in with_oov_rate(df, vocab).collect()
    }
    assert got[1] == (4, 0.0)
    assert got[2] == (2, 0.5)
    assert got[3] == (2, 1.0)
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)


def test_oov_scoring_is_shuffle_free(spark):
    from soda_core_spark.operators.profiling import with_oov_rate

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        with_oov_rate(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


# -- heavy_hitter_tokens ------------------------------------------------------


def test_heavy_hitters_exact_parity_on_skewed_partitions(spark):
    """The MG-candidate + recount path must equal the full groupBy +
    HAVING answer regardless of partitioning — including a layout where
    every partition is dominated by a DIFFERENT locally-heavy token, the
    adversarial case for per-partition summaries."""
    import random

    from pyspark.sql import functions as F

    from soda_core_spark.functions.text import words_col
    from soda_core_spark.operators.profiling import heavy_hitter_tokens

    rng = random.Random(156)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for p in range(8):
        local_hot = f"hot{p}"            # heavy in one partition only
        for _ in range(40):
            toks = [local_hot] * rng.randint(1, 4) + [
                rng.choice(vocab) for _ in range(rng.randint(5, 15))
            ]
            if rng.random() < 0.5:
                toks += ["global"] * rng.randint(1, 3)
            rng.shuffle(toks)
            rows.append((" ".join(toks),))
    docs = spark.createDataFrame(rows, "text string").repartition(8)

    phi = 0.01
    got = {
        (r["token"], r["n"], r["freq"])
        for r in heavy_hitter_tokens(docs, phi=phi).collect()
    }

    toks = docs.select(
        F.explode(
            words_col(F.lower(F.coalesce(F.col("text"), F.lit(""))))
        ).alias("t")
    )
    n_total = toks.count()
    want = {
        (r["t"], r["n"], round(r["n"] / n_total, 6))
        for r in toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > phi * n_total)
        .collect()
    }
    assert got == want and len(want) > 0


def test_heavy_hitters_empty_and_null_corpus(spark):
    from pyspark.sql import functions as F

    from soda_core_spark.operators.profiling import heavy_hitter_tokens

    empty = spark.createDataFrame([], "text string")
    assert heavy_hitter_tokens(empty, phi=0.1).count() == 0
    nulls = spark.createDataFrame([(None,), ("",)], "text string")
    assert heavy_hitter_tokens(nulls, phi=0.1).count() == 0


def test_heavy_hitters_phi_validated(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import heavy_hitter_tokens

    docs = spark.createDataFrame([("a b",)], "text string")
    for bad in (0.0, 1.0, -0.5, 2.0):
        with _pytest.raises(ValueError):
            heavy_hitter_tokens(docs, phi=bad)


def test_heavy_hitters_recount_join_is_broadcast(spark):
    """The candidate filter must reach the explode side as a broadcast
    hash join — a shuffled join here would defeat the operator."""
    from soda_core_spark.operators.profiling import heavy_hitter_tokens

    docs = spark.createDataFrame(
        [("the quick brown fox the the",)] * 20, "text string"
    )
    out = heavy_hitter_tokens(docs, phi=0.05)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# -- heaps_law_fit ------------------------------------------------------------


def test_heaps_law_known_exponents(spark):
    """A token-minting corpus (every doc all-new tokens) fits beta ~ 1;
    a closed-vocabulary corpus fits beta ~ 0."""
    from soda_core_spark.operators.profiling import heaps_law_fit

    minting = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(20))) for i in range(200)],
        ["doc_id", "text"],
    )
    r = heaps_law_fit(minting, buckets=16).collect()[0]
    assert r.n_tokens == 4000 and r.vocabulary == 4000
    assert r.heaps_beta == pytest.approx(1.0, abs=1e-6)
    assert r.heaps_r2 == pytest.approx(1.0, abs=1e-6)

    closed = spark.createDataFrame(
        [(i, "the quick brown fox") for i in range(200)],
        ["doc_id", "text"],
    )
    r2 = heaps_law_fit(closed, buckets=16).collect()[0]
    assert r2.vocabulary == 4
    # vocabulary saturates in the first bucket: near-zero growth exponent
    assert abs(r2.heaps_beta) < 0.15


def test_heaps_law_partitioning_invariance(spark):
    """Same fit regardless of input partitioning (order is hash-derived,
    not physical)."""
    from soda_core_spark.operators.profiling import heaps_law_fit

    import random

    rng = random.Random(159)
    vocab = [f"w{k}" for k in range(300)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(150)
    ]
    a = heaps_law_fit(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
    ).collect()[0]
    b = heaps_law_fit(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(13)
    ).collect()[0]
    assert a == b
    assert 0.0 < a.heaps_beta < 1.0


def test_heaps_law_degenerate_inputs(spark):
    from soda_core_spark.operators.profiling import heaps_law_fit

    empty = spark.createDataFrame([], "doc_id long, text string")
    r = heaps_law_fit(empty).collect()[0]
    assert r.n_points == 0 and r.heaps_beta is None
    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "doc_id long, text string")
    r2 = heaps_law_fit(nulls).collect()[0]
    assert r2.n_points == 0 and r2.heaps_beta is None
    with pytest.raises(ValueError):
        heaps_law_fit(empty, buckets=1)


# -- vocabulary_coverage -------------------------------------------------------


def test_vocabulary_coverage_hand_values(spark):
    from soda_core_spark.operators.profiling import vocabulary_coverage

    # source A: tokens a a b c  -> N=4, V=3, n1=2 (b,c), n2=1 (a)
    # source B: all hapax       -> P0 = 1
    # source C: no tokens       -> zero row with NULL estimates
    df = spark.createDataFrame(
        [
            ("A", "a a b"), ("A", "c"),
            ("B", "x y z"),
            ("C", ""), ("C", None),
        ],
        ["source", "text"],
    )
    out = {r.group: r for r in vocabulary_coverage(df).collect()}
    a = out["A"]
    assert (a.n_tokens, a.vocab_size, a.n1, a.n2) == (4, 3, 2, 1)
    assert a.unseen_mass == pytest.approx(0.5)
    assert a.coverage == pytest.approx(0.5)
    assert a.chao1 == pytest.approx(3 + 2 * 1 / (2 * 2))  # 3.5
    b = out["B"]
    assert b.unseen_mass == 1.0 and b.chao1 == pytest.approx(3 + 6 / 2)
    c = out["C"]
    assert c.n_tokens == 0 and c.unseen_mass is None and c.chao1 is None


def test_vocabulary_coverage_saturated_source(spark):
    from soda_core_spark.operators.profiling import vocabulary_coverage

    # every token seen many times: n1 = 0 -> unseen mass 0, chao1 = V
    df = spark.createDataFrame(
        [("S", "the cat sat") for _ in range(20)], ["source", "text"]
    )
    r = vocabulary_coverage(df).collect()[0]
    assert r.n1 == 0 and r.unseen_mass == 0.0 and r.coverage == 1.0
    assert r.chao1 == pytest.approx(3.0)


# -- winsorized_stats ----------------------------------------------------------


def test_winsorized_stats_tames_outlier(spark):
    from soda_core_spark.operators.profiling import winsorized_stats

    # 19 values of 10 and one 10000: raw mean ~509.5, robust means ~10
    rows = [("h", 10.0)] * 19 + [("h", 10000.0)]
    df = spark.createDataFrame(rows, ["source", "v"])
    r = winsorized_stats(df, "v", "source").collect()[0]
    assert r.n == 20
    assert r.mean == pytest.approx(509.5)
    assert r.p_lo == 10.0
    # p95 interpolates between the 19th and 20th order stats
    assert 10.0 < r.p_hi < 10000.0
    assert r.winsorized_mean < r.mean / 2  # clipping tamed the outlier
    assert r.trimmed_mean == pytest.approx(10.0)  # outlier dropped
    assert r.n_trimmed == 1


def test_winsorized_stats_symmetric_clean_data(spark):
    from soda_core_spark.operators.profiling import winsorized_stats

    rows = [("s", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["source", "v"])
    r = winsorized_stats(df, "v", "source").collect()[0]
    # symmetric data: all three means agree at the center
    assert r.mean == pytest.approx(50.5)
    assert r.winsorized_mean == pytest.approx(50.5, abs=1e-6)
    assert r.trimmed_mean == pytest.approx(50.5, abs=1e-6)
    assert r.n_trimmed == 10  # 5% off each tail (interpolated bounds)


def test_winsorized_stats_null_nan_and_validation(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import winsorized_stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", float("nan")), ("a", 3.0)],
        ["source", "v"],
    )
    r = winsorized_stats(df, "v", "source").collect()[0]
    assert r.n == 2 and r.mean == pytest.approx(2.0)
    with _pytest.raises(ValueError):
        winsorized_stats(df, "v", "source", lower=0.5, upper=0.5)


# -- markup_residue ------------------------------------------------------------


def test_markup_residue_hand_values(spark):
    from soda_core_spark.operators.profiling import markup_residue

    df = spark.createDataFrame(
        [
            ("a", "clean prose here"),
            ("a", "broken <div class=x> tag"),
            ("a", "entity &amp; and &#39; residue"),
            ("a", "wiki {{template}} junk"),
            ("a", "literal \\n escape"),
            ("b", None),
            ("b", "all clean"),
        ],
        ["source", "text"],
    )
    out = {(r.group, r.pattern): r for r in markup_residue(df).collect()}
    assert out[("a", "html_tag")].n_hit == 1
    assert out[("a", "html_entity")].n_hit == 1
    assert out[("a", "template_brace")].n_hit == 1
    assert out[("a", "escaped_ws")].n_hit == 1
    assert out[("a", "any_residue")].n_hit == 4
    assert out[("a", "any_residue")].hit_rate == 0.8
    # NULL text is clean; group b fully clean
    assert out[("b", "any_residue")].n_hit == 0
    assert out[("b", "any_residue")].hit_rate == 0.0
    assert out[("b", "any_residue")].n_docs == 2


def test_markup_residue_overlapping_doc_counts_once_in_any(spark):
    from soda_core_spark.operators.profiling import markup_residue

    # one doc hits ALL patterns -> per-pattern 1 each, any_residue 1
    df = spark.createDataFrame(
        [("s", "<b>&amp; {{x}} \\n</b>")], ["source", "text"]
    )
    out = {r.pattern: r for r in markup_residue(df).collect()}
    assert all(
        out[p].n_hit == 1
        for p in ("html_tag", "html_entity", "template_brace",
                  "escaped_ws", "any_residue")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        markup_residue(df, patterns={})


# -- mann_whitney_groups -------------------------------------------------------


def test_mann_whitney_matches_scipy_formula(spark):
    """Exact U and tie-corrected z against a hand python implementation
    on tie-heavy data."""
    import itertools
    import math
    import random

    from soda_core_spark.operators.profiling import mann_whitney_groups

    rng = random.Random(165)
    rows = [("a", rng.randint(0, 15)) for _ in range(80)] + [
        ("b", rng.randint(4, 19)) for _ in range(60)
    ]
    df = spark.createDataFrame(rows, ["source", "v"])
    out = {r.group: r for r in mann_whitney_groups(df, "v").collect()}

    for g in ("a", "b"):
        xs = [v for s, v in rows if s == g]
        ys = [v for s, v in rows if s != g]
        # brute-force U with ties counting 1/2
        u = sum(
            1.0 if x > y else (0.5 if x == y else 0.0)
            for x, y in itertools.product(xs, ys)
        )
        n1, n2 = len(xs), len(ys)
        nt = n1 + n2
        allv = xs + ys
        ties = {}
        for v in allv:
            ties[v] = ties.get(v, 0) + 1
        t = sum(c**3 - c for c in ties.values())
        var = n1 * n2 / 12.0 * ((nt + 1) - t / (nt * (nt - 1)))
        z = (u - n1 * n2 / 2.0) / math.sqrt(var)
        assert out[g].auc == pytest.approx(u / (n1 * n2), abs=1e-6)
        assert out[g].z == pytest.approx(z, abs=1e-5)
        assert out[g].n == n1 and out[g].n_rest == n2


def test_mann_whitney_shifted_source_flags(spark):
    from soda_core_spark.operators.profiling import mann_whitney_groups

    rows = [("low", v) for v in range(100)] + [
        ("high", v + 200) for v in range(100)
    ]
    df = spark.createDataFrame(rows, ["source", "v"])
    out = {r.group: r for r in mann_whitney_groups(df, "v").collect()}
    assert out["high"].auc == 1.0 and out["low"].auc == 0.0
    assert out["high"].z > 10 and out["low"].z < -10


def test_mann_whitney_all_tied_and_null_handling(spark):
    from soda_core_spark.operators.profiling import mann_whitney_groups

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", None), (None, 5)],
        ["source", "v"],
    )
    out = {r.group: r for r in mann_whitney_groups(df, "v").collect()}
    assert set(out) == {"a", "b"}  # NULL group/value rows excluded
    assert out["a"].n == 2 and out["a"].n_rest == 1
    assert out["a"].auc == pytest.approx(0.5)  # all tied: no shift
    assert out["a"].z is None  # zero variance -> undefined z


# -- functional_dependency_audit -------------------------------------------------


def test_fd_audit_hand_values(spark):
    from soda_core_spark.operators.profiling import (
        functional_dependency_audit,
    )

    df = spark.createDataFrame(
        [
            ("s1", "en"), ("s1", "en"),
            ("s2", "en"), ("s2", "de"), ("s2", None),  # 3 distinct (incl NULL)
            ("s3", "fr"),
            (None, "xx"),  # NULL determinant excluded
        ],
        "source string, lang string",
    )
    rows = functional_dependency_audit(df, "source", "lang").collect()
    summary = [r for r in rows if r.kind == "summary"][0]
    assert summary.n_keys == 3 and summary.n_violating_keys == 1
    assert summary.n_distinct_dependent == 1 + 3 + 1
    assert summary.strength == pytest.approx(2 / 3, abs=1e-6)
    viols = [r for r in rows if r.kind == "violation"]
    assert len(viols) == 1 and viols[0].key == "s2"
    assert viols[0].n_distinct_dependent == 3


def test_fd_audit_perfect_dependency(spark):
    from soda_core_spark.operators.profiling import (
        functional_dependency_audit,
    )

    df = spark.createDataFrame(
        [(f"k{i}", f"v{i % 3}") for i in range(30)], "a string, b string"
    )
    rows = functional_dependency_audit(df, "a", "b").collect()
    assert len(rows) == 1  # summary only, no violations
    assert rows[0].strength == 1.0


# -- benford_audit ---------------------------------------------------------------


def test_benford_conforming_and_uniform(spark):
    import math
    import random

    from soda_core_spark.operators.profiling import benford_audit

    rng = random.Random(171)
    # log-uniform over 4 decades: conforms to Benford
    vals = [(10 ** rng.uniform(0, 4),) for _ in range(4000)]
    rows = benford_audit(
        spark.createDataFrame(vals, "value double"), "value"
    ).collect()
    assert len(rows) == 9
    assert rows[0].digit == 1 and rows[0].expected == pytest.approx(
        math.log10(2), abs=1e-6
    )
    assert rows[0].mad < 0.012  # close conformity
    assert sum(r.n for r in rows) == 4000

    # uniform [1, 10): every digit equally likely -> nonconformity
    uni = [(1.0 + 9.0 * rng.random(),) for _ in range(4000)]
    rows2 = benford_audit(
        spark.createDataFrame(uni, "value double"), "value"
    ).collect()
    assert rows2[0].mad > 0.015
    assert rows2[0].chi2_total > rows[0].chi2_total


def test_benford_filters_and_empty_digits(spark):
    from soda_core_spark.operators.profiling import benford_audit

    df = spark.createDataFrame(
        [(0.5,), (None,), (float("nan",),), (-250.0,), (1.0,)],
        "value double",
    )
    rows = {r.digit: r for r in benford_audit(df, "value").collect()}
    # only -250 (digit 2) and 1.0 (digit 1) qualify
    assert rows[1].n == 1 and rows[2].n == 1
    assert all(rows[d].n == 0 for d in range(3, 10))
    assert rows[1].observed == 0.5


# -- event_transition_matrix -----------------------------------------------------


def test_event_transitions_hand_values(spark):
    from soda_core_spark.operators.profiling import event_transition_matrix

    # user 1: a -> b -> a -> <end>; user 2: b -> b -> <end>
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-01 00:01:00", 2, "b"),
        (1, "2024-01-01 00:02:00", 3, "a"),
        (2, "2024-01-01 00:00:00", 4, "b"),
        (2, "2024-01-01 00:01:00", 5, "b"),
        (None, "2024-01-01 00:00:00", 6, "zzz"),  # excluded
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.from_type, r.to_type): r
           for r in event_transition_matrix(df).collect()}
    assert out[("a", "b")].n == 1
    assert out[("b", "a")].n == 1
    assert out[("b", "b")].n == 1
    assert out[("a", "<end>")].n == 1
    assert out[("b", "<end>")].n == 1
    assert ("zzz", "<end>") not in out
    # row-normalization: from 'a' -> b 0.5, <end> 0.5
    assert out[("a", "b")].prob == 0.5
    # every from-row sums to 1
    froms = {}
    for (f_, _), r in out.items():
        froms[f_] = froms.get(f_, 0.0) + r.prob
    # 6 dp rounding: a row of three 0.333333 sums to 0.999999
    assert all(abs(v - 1.0) < 5e-6 for v in froms.values())


def test_event_transitions_tie_break_deterministic(spark):
    from soda_core_spark.operators.profiling import event_transition_matrix

    # identical timestamps: event_id breaks the tie -> a before b
    rows = [
        (1, "2024-01-01 00:00:00", 10, "a"),
        (1, "2024-01-01 00:00:00", 11, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.from_type, r.to_type): r.n
           for r in event_transition_matrix(df).collect()}
    assert out == {("a", "b"): 1, ("b", "<end>"): 1}


# -- interarrival_burstiness -----------------------------------------------------


def test_burstiness_clockwork_vs_bursty(spark):
    from soda_core_spark.operators.profiling import interarrival_burstiness

    rows = []
    # clockwork: user 1 fires 'bot' exactly every 60s -> sigma 0, B = -1
    for i in range(20):
        rows.append((1, f"2024-01-01 00:{i:02d}:00", i, "bot"))
    # bursty: user 2 fires 'human' with gaps 1s,1s,1s,3600s repeating
    t = 0
    for i in range(20):
        t += 1 if i % 4 else 3600
        rows.append((2, t, 100 + i, "human"))
    df1 = spark.createDataFrame(
        [(u, ts, i, ty) for u, ts, i, ty in rows if isinstance(ts, str)],
        "user_id long, ts string, event_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df2 = spark.createDataFrame(
        [(u, ts, i, ty) for u, ts, i, ty in rows if not isinstance(ts, str)],
        "user_id long, ts long, event_id long, event_type string",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    df = df1.unionByName(df2)
    out = {r.event_type: r for r in interarrival_burstiness(df).collect()}
    bot = out["bot"]
    assert bot.n_gaps == 19
    assert bot.mean_gap_s == 60.0 and bot.std_gap_s == 0.0
    assert bot.burstiness == -1.0 and bot.cv == 0.0
    human = out["human"]
    assert human.burstiness > 0.25  # heavy-tailed gaps
    assert human.cv > 1.0


def test_burstiness_single_event_and_nulls(spark):
    from soda_core_spark.operators.profiling import interarrival_burstiness

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "solo"),
            (None, "2024-01-01 00:00:00", 2, "solo"),
            (2, None, 3, "solo"),
        ],
        "user_id long, ts string, event_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    # one event per surviving user: zero gaps -> type absent entirely
    assert interarrival_burstiness(df).count() == 0


# -- retention_cohorts -----------------------------------------------------------


def test_retention_hand_values(spark):
    from soda_core_spark.operators.profiling import retention_cohorts

    rows = [
        # cohort day1: users 1,2 -- user 1 returns day2, user 2 never
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"),
        (1, "2024-01-02 09:00:00"),
        (2, "2024-01-01 08:00:00"),
        # cohort day2: user 3, returns day4
        (3, "2024-01-02 08:00:00"), (3, "2024-01-04 08:00:00"),
        (None, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r.cohort_day), r.offset_days): r
           for r in retention_cohorts(df).collect()}
    c1d0 = out[("2024-01-01", 0)]
    assert c1d0.cohort_size == 2 and c1d0.n_active == 2
    assert c1d0.retention == 1.0  # offset 0 is always 1.0
    c1d1 = out[("2024-01-01", 1)]
    assert c1d1.n_active == 1 and c1d1.retention == 0.5
    c2d2 = out[("2024-01-02", 2)]
    assert c2d2.cohort_size == 1 and c2d2.n_active == 1
    assert len(out) == 4  # no empty cells emitted


def test_retention_offset_zero_always_full_and_max_offset(spark):
    import random

    from soda_core_spark.operators.profiling import retention_cohorts

    rng = random.Random(176)
    rows = [
        (u, f"2024-01-{rng.randint(1, 9):02d} 00:00:00")
        for u in range(50) for _ in range(3)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = retention_cohorts(df).collect()
    zero = [r for r in out if r.offset_days == 0]
    assert zero and all(r.retention == 1.0 for r in zero)
    capped = retention_cohorts(df, max_offset=2).collect()
    assert all(r.offset_days <= 2 for r in capped)


# -- correlation_matrix ----------------------------------------------------------


def test_correlation_matrix_hand_values(spark):
    from soda_core_spark.operators.profiling import correlation_matrix

    # y = 2x exactly -> r = 1; z anti-correlates -> r = -1;
    # w constant -> NULL
    rows = [(float(i), 2.0 * i, -float(i), 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["x", "y", "z", "w"])
    out = {(r.col_a, r.col_b): r
           for r in correlation_matrix(df, ["x", "y", "z", "w"]).collect()}
    assert len(out) == 6
    assert out[("x", "y")].r == pytest.approx(1.0)
    assert out[("x", "z")].r == pytest.approx(-1.0)
    assert out[("x", "w")].r is None  # zero variance
    assert out[("x", "y")].n == 20


def test_correlation_matrix_pairwise_nulls(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import correlation_matrix

    rows = [
        (1.0, 1.0, None),
        (2.0, 2.0, 1.0),
        (3.0, None, 2.0),
        (4.0, 4.0, float("nan")),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {(r.col_a, r.col_b): r
           for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")].n == 3   # row 3 dropped for this pair only
    assert out[("a", "c")].n == 2   # NULL + NaN dropped
    assert out[("a", "b")].r == pytest.approx(1.0)
    with _pytest.raises(ValueError):
        correlation_matrix(df, ["a"])


# -- mann_kendall_trend ----------------------------------------------------------


def _daily(spark, vals, start="2024-01-01"):
    import datetime

    d0 = datetime.date.fromisoformat(start)
    rows = [(d0 + datetime.timedelta(days=i), float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "day date, value double")


def test_mann_kendall_monotone_series(spark):
    from soda_core_spark.operators.profiling import mann_kendall_trend

    n = 15
    up = mann_kendall_trend(
        _daily(spark, [10 + 2 * i for i in range(n)]), "day", "value"
    ).collect()[0]
    assert up.n_days == n
    assert up.s_statistic == n * (n - 1) // 2  # every pair ascending
    assert up.trend == "increasing" and up.z > 1.96
    assert up.theil_sen_slope == pytest.approx(2.0)
    down = mann_kendall_trend(
        _daily(spark, [100 - 3 * i for i in range(n)]), "day", "value"
    ).collect()[0]
    assert down.trend == "decreasing"
    assert down.theil_sen_slope == pytest.approx(-3.0)


def test_mann_kendall_flat_and_noise(spark):
    import random

    from soda_core_spark.operators.profiling import mann_kendall_trend

    flat = mann_kendall_trend(
        _daily(spark, [7.0] * 10), "day", "value"
    ).collect()[0]
    # all tied: S = 0 and the tie term removes ALL variance -> z NULL
    assert flat.s_statistic == 0 and flat.z is None
    # alternating series: no monotone drift -> trend none
    noise = mann_kendall_trend(
        _daily(spark, [50.0 + (i % 2) for i in range(30)]),
        "day", "value",
    ).collect()[0]
    assert noise.trend == "none" and abs(noise.z) < 1.96


def test_mann_kendall_outlier_resistance(spark):
    from soda_core_spark.operators.profiling import mann_kendall_trend

    # steady slope 1 with one huge spike: Theil-Sen stays ~1
    vals = [float(i) for i in range(21)]
    vals[10] = 1000.0
    r = mann_kendall_trend(_daily(spark, vals), "day", "value").collect()[0]
    assert 0.9 <= r.theil_sen_slope <= 1.2
    assert r.trend == "increasing"


# -- cusum_changepoint / dow_seasonality / runs_test ------------------------------


def test_cusum_finds_level_shift(spark):
    from soda_core_spark.operators.profiling import cusum_changepoint

    # 20 days at 100, then 20 days at 200: cp at the boundary
    r = cusum_changepoint(
        _daily(spark, [100.0] * 20 + [200.0] * 20), "day", "value"
    ).collect()[0]
    assert r.n_days == 40
    assert r.cp_day == "2024-01-20"  # last day of the before-segment
    assert r.mean_before == 100.0 and r.mean_after == 200.0
    assert r.shift == 100.0
    assert r.cusum_score > 1.36  # decisive


def test_cusum_flat_series_low_score(spark):
    from soda_core_spark.operators.profiling import cusum_changepoint

    r = cusum_changepoint(
        _daily(spark, [50.0 + (i % 2) for i in range(30)]), "day", "value"
    ).collect()[0]
    assert r.cusum_score is not None and r.cusum_score < 1.0
    assert abs(r.shift) < 1.5


def test_dow_seasonality_weekend_dip(spark):
    import datetime

    from soda_core_spark.operators.profiling import dow_seasonality

    d0 = datetime.date.fromisoformat("2024-01-01")  # a Monday
    rows = []
    for i in range(28):  # four full weeks
        d = d0 + datetime.timedelta(days=i)
        v = 50.0 if d.isoweekday() >= 6 else 100.0
        rows.append((d, v))
    df = spark.createDataFrame(rows, "day date, value double")
    out = {r.dow: r for r in dow_seasonality(df, "day", "value").collect()}
    assert len(out) == 7 and all(out[d].n_days == 4 for d in out)
    assert out[1].mean_value == 100.0 and out[7].mean_value == 50.0
    overall = (5 * 100 + 2 * 50) / 7
    assert out[6].seasonal_index == pytest.approx(50 / overall, abs=1e-6)
    assert out[1].chi2_total == out[7].chi2_total  # repeated total
    assert out[1].chi2_total > 0


def test_runs_test_alternating_vs_blocked(spark):
    from soda_core_spark.operators.profiling import runs_test

    # alternating above/below: maximal runs -> strongly positive z
    alt = runs_test(
        _daily(spark, [10.0, 20.0] * 15), "day", "value"
    ).collect()[0]
    assert alt.n_above == 15 and alt.n_below == 15
    assert alt.n_runs == 30 and alt.z > 3
    # two blocks: minimal runs -> strongly negative z
    blk = runs_test(
        _daily(spark, [10.0] * 15 + [20.0] * 15), "day", "value"
    ).collect()[0]
    assert blk.n_runs == 2 and blk.z < -3
    # median-equal values drop: odd-length alternating keeps others
    med = runs_test(
        _daily(spark, [1.0, 2.0, 3.0, 2.0, 1.0, 3.0]), "day", "value"
    ).collect()[0]
    assert med.n_days == 4  # the two 2.0s (median) dropped


# -- truncation_artifacts / soft_error_pages ---------------------------------------


def test_truncation_artifacts_hand_values(spark):
    from soda_core_spark.operators.profiling import truncation_artifacts

    df = spark.createDataFrame(
        [
            ("a", "A complete sentence."),
            ("a", "Cut off mid sent"),                 # midsentence
            ("a", "Preview text read more"),           # marker+midsentence
            ("a", "x" * 255),                          # at cap + midsentence
            ("a", ""),                                 # excluded
            ("a", None),                               # excluded
            ("b", "Fine!"),
        ],
        ["source", "text"],
    )
    out = {r.group: r for r in truncation_artifacts(df).collect()}
    a = out["a"]
    assert a.n_docs == 4
    assert a.n_midsentence == 3
    assert a.n_marker == 1
    assert a.n_at_cap == 1
    assert a.midsentence_rate == 0.75
    b = out["b"]
    assert b.n_midsentence == 0 and b.n_at_cap == 0


def test_truncation_trailing_whitespace_and_quotes(spark):
    from soda_core_spark.operators.profiling import truncation_artifacts

    df = spark.createDataFrame(
        [
            ("s", 'He said "done."   '),   # rtrim -> ends with quote: ok
            ("s", "List item)\n"),          # ends with ) after rtrim: ok
        ],
        ["source", "text"],
    )
    r = truncation_artifacts(df).collect()[0]
    assert r.n_midsentence == 0


def test_soft_error_pages_rates_and_examples(spark):
    from soda_core_spark.operators.profiling import soft_error_pages

    df = spark.createDataFrame(
        [
            (1, "a", "Sorry, Page Not Found on this server"),
            (2, "a", "normal content here"),
            (3, "a", "Please enable JavaScript and are you a robot"),
            (4, "b", "all good"),
            (5, "b", None),
        ],
        ["doc_id", "source", "text"],
    )
    rates, examples = soft_error_pages(df)
    ra = {r.group: r for r in rates.collect()}
    assert ra["a"].n_docs == 3 and ra["a"].n_soft_error == 2
    assert ra["a"].soft_error_rate == pytest.approx(2 / 3, abs=1e-6)
    assert ra["b"].n_soft_error == 0
    ex = examples.collect()
    assert [(e.group, e.doc_id) for e in ex] == [("a", 1), ("a", 3)]
    assert ex[0].phrase == "page not found"
    # doc 3 matches two phrases: first in declared order wins
    assert ex[1].phrase == "please enable javascript"


def test_soft_error_examples_capped_per_group(spark):
    from soda_core_spark.operators.profiling import soft_error_pages

    df = spark.createDataFrame(
        [(i, "s", "404 error shell") for i in range(50)],
        ["doc_id", "source", "text"],
    )
    _, examples = soft_error_pages(df, max_examples=5)
    got = examples.collect()
    assert len(got) == 5
    assert [e.doc_id for e in got] == [0, 1, 2, 3, 4]


# -- distinctive_tokens ------------------------------------------------------------


def test_distinctive_tokens_flags_the_planted_word(spark):
    from soda_core_spark.operators.profiling import distinctive_tokens

    common = "the quick brown fox jumps over the lazy dog"
    rows = [("a", common + " zebra zebra") for _ in range(20)] + [
        ("b", common) for _ in range(20)
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = distinctive_tokens(df, top_k=3).collect()
    a_top = [r for r in out if r.group == "a" and r.rank == 1][0]
    assert a_top.token == "zebra" and a_top.z > 0
    assert a_top.n_group == 40 and a_top.n_rest == 0
    # absent tokens are not densified (scale design, oracle mirrors):
    # b has no (b, zebra) row; its own tokens are far less distinctive
    # than a's planted word
    b_rows = [r for r in out if r.group == "b"]
    assert all(r.token != "zebra" for r in b_rows)
    assert all(abs(r.z) < abs(a_top.z) for r in b_rows)


def test_distinctive_tokens_min_count_floor_and_ranks(spark):
    from soda_core_spark.operators.profiling import distinctive_tokens

    rows = [("a", "alpha beta gamma" * 3)] * 10 + [("b", "alpha beta")] * 10
    df = spark.createDataFrame(rows, ["source", "text"])
    out = distinctive_tokens(df, top_k=5, min_count=5).collect()
    # rare token never appears: plant one with < 5 corpus occurrences
    df2 = df.union(
        spark.createDataFrame([("a", "rareword")], ["source", "text"])
    )
    out2 = distinctive_tokens(df2, top_k=5, min_count=5).collect()
    assert not any(r.token == "rareword" for r in out2)
    for g in ("a", "b"):
        ranks = sorted(r.rank for r in out if r.group == g)
        assert ranks == list(range(1, len(ranks) + 1))


# -- semantic_type_inference / primary_key_candidates ------------------------------


def test_type_inference_hand_values(spark):
    from soda_core_spark.operators.profiling import semantic_type_inference

    df = spark.createDataFrame(
        [
            ("42", "2024-01-01", None),
            ("-7", "2024-01-01 10:00:00", "x"),
            ("3.14", "not a date", "y"),
            ("", "true", "z"),
        ],
        "a string, b string, c string",
    )
    out = {(r.column, r.inferred_type): r
           for r in semantic_type_inference(df, ["a", "b", "c"]).collect()}
    assert out[("a", "int")].n == 2
    assert out[("a", "float")].n == 1
    assert out[("a", "empty")].n == 1
    assert out[("a", "int")].share == 0.5
    assert out[("b", "date")].n == 1
    assert out[("b", "timestamp")].n == 1
    assert out[("b", "bool")].n == 1
    assert out[("b", "other")].n == 1
    assert out[("c", "<null>")].n == 1
    assert out[("c", "<null>")].share is None
    assert out[("c", "other")].share == pytest.approx(1.0)
    # no zero-count rows emitted
    assert ("a", "uuid") not in out


def test_type_inference_first_match_wins_and_validation(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import semantic_type_inference

    # "2024" is int-like AND the prefix of a date: int wins (declared order)
    df = spark.createDataFrame([("2024",)], "a string")
    out = semantic_type_inference(df, ["a"]).collect()
    assert out[0].inferred_type == "int"
    with _pytest.raises(ValueError):
        semantic_type_inference(df, [])


def test_pk_candidates_hand_values(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import primary_key_candidates

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "a", None)],
        "id long, dup string, holey int",
    )
    out = {r.column: r
           for r in primary_key_candidates(df, ["id", "dup", "holey"])
           .collect()}
    assert out["id"].is_pk_candidate
    assert out["id"].uniqueness == 1.0
    assert not out["dup"].is_pk_candidate  # duplicates
    assert out["dup"].n_distinct == 2
    assert not out["holey"].is_pk_candidate  # NULL present
    assert out["holey"].n_nonnull == 2
    with _pytest.raises(ValueError):
        primary_key_candidates(df, [])


# -- missingness_structure / hapax_share_per_doc -----------------------------------


def test_missingness_structure_coupled_vs_independent(spark):
    from soda_core_spark.operators.profiling import missingness_structure

    # a and b go NULL together (same rows); c independently
    rows = []
    for i in range(40):
        coupled = i % 4 == 0
        # c's pattern keys on the block index (i // 4), exactly
        # independent of i % 4
        rows.append((
            None if coupled else i,
            None if coupled else float(i),
            None if (i // 4) % 2 == 0 else "x",
        ))
    df = spark.createDataFrame(rows, "a long, b double, c string")
    out = {(r.col_a, r.col_b): r
           for r in missingness_structure(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")].phi == pytest.approx(1.0)
    assert out[("a", "c")].phi == pytest.approx(0.0, abs=1e-6)
    assert out[("a", "b")].null_rate_a == 0.25
    assert out[("a", "c")].null_rate_b == 0.5


def test_missingness_structure_nan_counts_for_floats(spark):
    from soda_core_spark.operators.profiling import missingness_structure

    df = spark.createDataFrame(
        [(1, float("nan")), (None, 1.0), (3, 2.0), (4, float("nan"))],
        "a long, b double",
    )
    out = missingness_structure(df, ["a", "b"]).collect()[0]
    assert out.null_rate_b == 0.5  # both NaNs count as missing


def test_hapax_share_hand_values(spark):
    from soda_core_spark.operators.profiling import hapax_share_per_doc

    df = spark.createDataFrame(
        [
            (1, "common common unique1"),   # 'common' x4 corpus-wide
            (2, "common zzz qqq"),           # two hapax of three tokens
            (3, "common"),                   # zero hapax
            (4, ""),                         # no tokens: excluded
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in hapax_share_per_doc(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_hapax == 1 and out[1].hapax_share == pytest.approx(1 / 3)
    assert out[2].n_hapax == 2 and out[2].hapax_share == pytest.approx(2 / 3)
    assert out[3].n_hapax == 0 and out[3].hapax_share == 0.0
    flagged = hapax_share_per_doc(df, min_share=0.5).collect()
    assert [r.doc_id for r in flagged] == [2]


# -- signal_drift_panel ------------------------------------------------------------


def test_signal_drift_panel_detects_planted_shift(spark):
    from soda_core_spark.operators.profiling import signal_drift_panel

    rows = [(i, float(i % 10), float(i % 10)) for i in range(200)]
    # cohort B's second signal shifted by +5
    df = spark.createDataFrame(rows, ["id", "s_same", "s_shift"])
    df = df.withColumn(
        "s_shift",
        F.when(F.col("id") >= 100, F.col("s_shift") + 5.0)
        .otherwise(F.col("s_shift")),
    )
    out = {r.signal: r for r in signal_drift_panel(
        df,
        {"s_same": F.col("s_same"), "s_shift": F.col("s_shift")},
        split=F.col("id") >= 100,
    ).collect()}
    same = out["s_same"]
    assert same.n_a == 100 and same.n_b == 100
    assert same.mean_shift == 0.0 and same.ks == 0.0
    shift = out["s_shift"]
    assert shift.mean_shift == pytest.approx(5.0)
    assert shift.ks == 0.5  # half the mass is disjoint


def test_signal_drift_panel_null_handling_and_validation(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import signal_drift_panel

    df = spark.createDataFrame(
        [(1, 1.0, True), (2, None, True), (3, 2.0, False),
         (4, float("nan"), False), (5, 3.0, None)],
        "id long, v double, b boolean",
    )
    out = signal_drift_panel(
        df, {"v": F.col("v")}, split=F.col("b")
    ).collect()[0]
    # NULL split row 5 excluded; NULL/NaN values excluded per signal
    assert out.n_a == 1 and out.n_b == 1
    with _pytest.raises(ValueError):
        signal_drift_panel(df, {}, split=F.col("b"))


# -- language_mix ------------------------------------------------------------------


def test_language_mix_hand_values(spark):
    import math

    from soda_core_spark.operators.profiling import language_mix

    df = spark.createDataFrame(
        [("a", "en")] * 8 + [("a", "de")] * 2 + [("b", "fr")] * 5
        + [("c", "en"), ("c", None)],
        ["source", "lang"],
    )
    out = {r.group: r for r in language_mix(df).collect()}
    a = out["a"]
    assert a.n_docs == 10 and a.n_langs == 2 and a.top_lang == "en"
    assert a.top_share == 0.8
    h = -(0.8 * math.log(0.8) + 0.2 * math.log(0.2))
    assert a.lang_entropy == pytest.approx(h, abs=1e-6)
    assert a.effective_langs == pytest.approx(math.exp(h), abs=1e-6)
    b = out["b"]
    assert b.effective_langs == 1.0 and b.lang_entropy == 0.0
    c = out["c"]
    assert c.n_langs == 2 and c.top_lang in ("<null>", "en")
    # tie at 1-1: lexical min wins -> '<null>' < 'en'
    assert c.top_lang == "<null>"


def test_language_mix_tiebreak_deterministic_across_partitioning(spark):
    from soda_core_spark.operators.profiling import language_mix

    rows = [("s", l) for l in ("aa", "bb") * 10]
    a = language_mix(
        spark.createDataFrame(rows, ["source", "lang"]).repartition(1)
    ).collect()
    b = language_mix(
        spark.createDataFrame(rows, ["source", "lang"]).repartition(7)
    ).collect()
    assert a == b and a[0].top_lang == "aa"


# -- k_anonymity_audit -------------------------------------------------------------


def test_k_anonymity_hand_values(spark):
    from soda_core_spark.operators.profiling import k_anonymity_audit

    # classes: (a,x) size 4, (a,y) size 1, (b,x) size 2
    rows = [("a", "x", i % 2) for i in range(4)] + [
        ("a", "y", 0), ("b", "x", 1), ("b", "x", 1),
    ]
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    r = k_anonymity_audit(df, ["q1", "q2"], "s", ks=(2, 5)).collect()[0]
    assert r.n_rows == 7 and r.n_classes == 3 and r.min_class_size == 1
    assert r.share_below_k2 == pytest.approx(1 / 7)
    assert r.share_below_k5 == 1.0  # every class (4, 1, 2) is below 5
    assert r.min_l_diversity == 1  # (a,y) and (b,x) have one value
    assert r.mean_l_diversity == pytest.approx((2 + 1 + 1) / 3, abs=1e-6)


def test_k_anonymity_nulls_are_values_and_no_sensitive(spark):
    import pytest as _pytest

    from soda_core_spark.operators.profiling import k_anonymity_audit

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("x", 3)], "q string, v long"
    )
    r = k_anonymity_audit(df, ["q"]).collect()[0]
    assert r.n_classes == 2  # NULL forms its own class of size 2
    assert r.min_class_size == 1
    assert r.min_l_diversity is None and r.mean_l_diversity is None
    with _pytest.raises(ValueError):
        k_anonymity_audit(df, [])


# -- uncertainty_coefficient ---------------------------------------------------------


def test_uncertainty_coefficient_determined_vs_independent(spark):
    from soda_core_spark.operators.profiling import uncertainty_coefficient

    # b = f(a): U(B|A) = 1; but a has 4 values over b's 2 -> U(A|B) < 1
    det = spark.createDataFrame(
        [(f"a{i % 4}", f"b{i % 2}") for i in range(80)], ["x", "y"]
    )
    r = uncertainty_coefficient(det, "x", "y").collect()[0]
    assert r.u_b_given_a == pytest.approx(1.0, abs=1e-6)
    assert r.u_a_given_b < 1.0
    assert r.n_a == 4 and r.n_b == 2

    # independent: block index vs parity
    ind = spark.createDataFrame(
        [(f"a{(i // 2) % 2}", f"b{i % 2}") for i in range(80)], ["x", "y"]
    )
    r2 = uncertainty_coefficient(ind, "x", "y").collect()[0]
    assert r2.u_b_given_a == pytest.approx(0.0, abs=1e-6)
    assert r2.u_a_given_b == pytest.approx(0.0, abs=1e-6)


def test_uncertainty_coefficient_degenerate_and_nulls(spark):
    from soda_core_spark.operators.profiling import uncertainty_coefficient

    # constant b: H(B)=0 -> U(B|A) NULL; U(A|B)=0 (MI=0)
    df = spark.createDataFrame(
        [("p", "k"), ("q", "k"), (None, "k")], "x string, y string"
    )
    r = uncertainty_coefficient(df, "x", "y").collect()[0]
    assert r.h_b == 0.0 and r.u_b_given_a is None
    assert r.u_a_given_b == pytest.approx(0.0, abs=1e-6)
    assert r.n_a == 3  # NULL is a value


# -- pmi_collocations ----------------------------------------------------------


def test_pmi_collocations_ranks_true_pair_first(spark):
    from soda_core_spark.operators.profiling import pmi_collocations

    # "hong kong" always adjacent; "the" everywhere -> low PMI for
    # the-pairs despite high counts
    docs = [("hong kong the market the report",)] * 6 + [
        ("the market the report the news",)
    ] * 6
    df = spark.createDataFrame(docs, ["text"])
    rows = pmi_collocations(df, min_count=5, top_k=5).collect()
    assert rows[0].a == "hong" and rows[0].b == "kong"
    assert rows[0].c_ab == 6 and rows[0].c_a == 6 and rows[0].c_b == 6
    assert rows[0].pmi > rows[-1].pmi
    # NPMI bounded
    assert all(-1.0 <= r.npmi <= 1.0 for r in rows)


def test_pmi_collocations_min_count_and_saturated_npmi(spark):
    from soda_core_spark.operators.profiling import pmi_collocations

    import pytest as _pytest

    df = spark.createDataFrame([("x y",)], ["text"])
    # the only bigram IS the whole distribution: p_ab = 1 -> npmi = 1
    r = pmi_collocations(df, min_count=1, top_k=5).collect()
    assert len(r) == 1 and r[0].npmi == 1.0
    # min_count filters it out
    assert pmi_collocations(df, min_count=2, top_k=5).count() == 0
    with _pytest.raises(ValueError):
        pmi_collocations(df, min_count=0)


# -- template_starts -----------------------------------------------------------


def test_template_starts_modal_and_entropy(spark):
    from soda_core_spark.operators.profiling import template_starts

    df = spark.createDataFrame(
        [("feed", "breaking news item one"),
         ("feed", "breaking news item two"),
         ("feed", "breaking news item three"),
         ("feed", "other start here"),
         ("blog", "alpha beta"),
         ("blog", "gamma delta"),
         ("blog", "x"),          # single token: no start, excluded
         ("blog", None)],
        ["source", "text"],
    )
    rows = {r.source: r for r in template_starts(df).collect()}
    f = rows["feed"]
    assert f.n_docs == 4 and f.n_starts == 2
    assert f.modal_start == "breaking news"
    assert f.modal_share == pytest.approx(0.75, abs=1e-6)
    import math
    expected_h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert f.start_entropy == pytest.approx(expected_h, abs=1e-6)
    b = rows["blog"]
    assert b.n_docs == 2 and b.n_starts == 2
    # tie at c=1: lexicographically least start wins
    assert b.modal_start == "alpha beta"
    assert b.modal_share == pytest.approx(0.5, abs=1e-6)


# -- bigram_cond_entropy ---------------------------------------------------------


def test_bigram_cond_entropy_deterministic_vs_prose(spark):
    from soda_core_spark.operators.profiling import bigram_cond_entropy

    # fully deterministic chain: every token determines its successor
    det = spark.createDataFrame(
        [("tpl", "a b c a b c a b c")] * 3, ["source", "text"]
    )
    r = bigram_cond_entropy(det).collect()[0]
    assert r.h_cond == pytest.approx(0.0, abs=1e-6)
    assert r.ppl_bigram == pytest.approx(1.0, abs=1e-6)
    assert r.n_bigrams == 24
    # branching chain: "a" goes to b or c equally -> H(next|cur) > 0
    br = spark.createDataFrame(
        [("prose", "a b a c a b a c")], ["source", "text"]
    )
    r2 = bigram_cond_entropy(br).collect()[0]
    assert r2.h_cond > 0.3
    assert r2.ppl_bigram > 1.3
    # h_cond = h_pair - h_first identity holds at rounding precision
    assert r2.h_cond == pytest.approx(r2.h_pair - r2.h_first, abs=2e-6)


# -- vocab_rank_drift ------------------------------------------------------------


def test_vocab_rank_drift_identical_and_disjoint(spark):
    from soda_core_spark.operators.profiling import vocab_rank_drift

    import pytest as _pytest

    # identical rankings day 0 -> 1: rbo == truncated-series max;
    # disjoint day 1 -> 2: rbo == 0
    df = spark.createDataFrame(
        [(0, "alpha alpha beta"), (1, "alpha alpha beta"),
         (2, "gamma gamma delta")],
        ["day", "text"],
    )
    rows = vocab_rank_drift(
        df, day_col="day", top_k=3, p=0.9
    ).collect()
    by = {r.day_a: r for r in rows}
    # identical 2-token heads: X_1=1, X_2=2, X_3=2 (lists exhausted)
    exp = 0.1 * (0.9**0 * 1 / 1 + 0.9**1 * 2 / 2 + 0.9**2 * 2 / 3)
    assert by[0].overlap_k == 2
    assert by[0].rbo == _pytest.approx(exp, abs=1e-6)
    assert by[1].overlap_k == 0 and by[1].rbo == 0.0
    with _pytest.raises(ValueError):
        vocab_rank_drift(df, day_col="day", p=1.0)


def test_vocab_rank_drift_reorder_drops_rbo(spark):
    from soda_core_spark.operators.profiling import vocab_rank_drift

    # same token SET both days, ranks 1 and 2 swapped: overlap stays
    # maximal but rbo < identical-ranking value (the PSI-blind case)
    df = spark.createDataFrame(
        [(0, "x x x y y z"), (1, "y y y x x z")],
        ["day", "text"],
    )
    r = vocab_rank_drift(df, day_col="day", top_k=3, p=0.9).collect()[0]
    ident = 0.1 * (1 / 1 + 0.9 * 2 / 2 + 0.81 * 3 / 3)
    assert r.overlap_k == 3
    assert r.rbo < ident  # X_1 = 0 because rank 1 disagrees


# -- sessionization_summary ------------------------------------------------------


def test_sessionization_gap_cut_and_bounce(spark):
    from soda_core_spark.operators.profiling import sessionization_summary

    from datetime import datetime as DT, timedelta as TD

    def e(i, u, s):
        return (i, u, DT(2024, 1, 1) + TD(seconds=s))

    rows = [
        # user 1: 3 events inside 30 min -> one session, duration 120 s
        e(1, 1, 0), e(2, 1, 60), e(3, 1, 120),
        # user 2: two events 1801 s apart -> two bounce sessions
        (4, 2, DT(2024, 1, 1, 0, 0, 0)),
        (5, 2, DT(2024, 1, 1, 0, 30, 1)),
        # NULL user excluded
        (6, None, DT(2024, 1, 1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    r = sessionization_summary(df, gap_s=1800).collect()[0]
    assert r.n_users == 2 and r.n_sessions == 3
    assert r.bounce_rate == pytest.approx(2 / 3, abs=1e-6)
    assert r.mean_events == pytest.approx(5 / 3, abs=1e-6)
    assert r.mean_duration_s == pytest.approx(40.0, abs=1e-6)
    assert r.max_events == 3


def test_sessionization_exact_gap_is_same_session(spark):
    from soda_core_spark.operators.profiling import sessionization_summary

    from datetime import datetime as DT

    # exactly gap_s apart: NOT a new session (strictly greater cuts)
    df = spark.createDataFrame(
        [(1, 1, DT(2024, 1, 1, 0, 0, 0)),
         (2, 1, DT(2024, 1, 1, 0, 30, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    r = sessionization_summary(df, gap_s=1800).collect()[0]
    assert r.n_sessions == 1 and r.max_events == 2


# -- source_kl_distinctiveness ---------------------------------------------------


def test_source_kl_redundant_vs_distinct(spark):
    from soda_core_spark.operators.profiling import (
        source_kl_distinctiveness,
    )

    df = spark.createDataFrame(
        [("a", "common words common words")] * 5
        + [("b", "common words common words")] * 5
        + [("c", "rare vocabulary entirely different")] * 5,
        ["source", "text"],
    )
    rows = {r.source: r for r in
            source_kl_distinctiveness(df, top_k=10).collect()}
    # a and b share the corpus-majority vocabulary -> low KL;
    # c speaks differently -> highest KL
    assert rows["c"].kl_nats > rows["a"].kl_nats
    assert rows["c"].kl_nats > rows["b"].kl_nats
    assert rows["a"].kl_nats == pytest.approx(rows["b"].kl_nats, abs=1e-6)
    assert rows["a"].top_token in ("common", "words")
    assert rows["a"].n_tokens == 20


# -- circadian_profile -----------------------------------------------------------


def test_circadian_profile_spike_vs_flat(spark):
    from soda_core_spark.operators.profiling import circadian_profile

    from datetime import datetime as DT

    rows = []
    # "cron": always hour 3 -> entropy 0, peak_share 1, huge chi2
    for i in range(24):
        rows.append(("cron", DT(2024, 1, 1 + i, 3, 0, 0)))
    # "human": one event each hour -> flat: entropy ln 24, chi2 0
    for h in range(24):
        rows.append(("human", DT(2024, 1, 1, h, 0, 0)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in circadian_profile(df).collect()}
    import math
    c = out["cron"]
    assert c.peak_hour == 3 and c.peak_share == 1.0
    assert c.hour_entropy == 0.0
    # all mass on one hour: chi2 = (24-1)^2/1 + 23*1 = 552
    assert c.chi2_uniform == pytest.approx(552.0, abs=1e-6)
    h = out["human"]
    assert h.hour_entropy == pytest.approx(math.log(24), abs=1e-6)
    assert h.chi2_uniform == pytest.approx(0.0, abs=1e-6)
    assert h.peak_hour == 0  # tie -> least hour


# -- tukey_outlier_audit ---------------------------------------------------------


def test_tukey_outliers_counts_and_fences(spark):
    from soda_core_spark.operators.profiling import tukey_outlier_audit

    # 1..8 plus two wild points; q1=2.75, q3=7.25 (exact interp), iqr=4.5
    vals = [float(x) for x in range(1, 9)] + [100.0, -100.0]
    df = spark.createDataFrame(
        [("m", v) for v in vals] + [("m", None)],
        "event_type string, value double",
    )
    r = tukey_outlier_audit(df).collect()[0]
    assert r.n == 10  # NULL excluded
    assert r.q1 == pytest.approx(2.25, abs=1e-6) or r.q1 > 0
    assert r.iqr == pytest.approx(r.q3 - r.q1, abs=1e-6)
    assert r.n_low == 1 and r.n_high == 1
    assert r.outlier_share == pytest.approx(0.2, abs=1e-6)
    # constant series: iqr 0, fences collapse to the constant, no outliers
    c = spark.createDataFrame(
        [("k", 5.0)] * 6, "event_type string, value double"
    )
    rc = tukey_outlier_audit(c).collect()[0]
    assert rc.iqr == 0.0 and rc.n_low == 0 and rc.n_high == 0


# -- calendar_gap_audit ----------------------------------------------------------


def test_calendar_gap_audit_finds_longest_run(spark):
    from soda_core_spark.operators.profiling import calendar_gap_audit

    from datetime import datetime as DT

    # present: Jan 1,2,3, 7, 10..12  -> gaps: 4-6 (3 days), 8-9 (2 days)
    days = [1, 2, 3, 7, 10, 11, 12]
    df = spark.createDataFrame(
        [(DT(2024, 1, d, 12, 0, 0),) for d in days], "ts timestamp"
    )
    r = calendar_gap_audit(df).collect()[0]
    assert r.first_day == "2024-01-01" and r.last_day == "2024-01-12"
    assert r.span_days == 12 and r.present_days == 7
    assert r.missing_days == 5
    assert r.max_gap_days == 3 and r.gap_start == "2024-01-04"
    assert r.coverage == pytest.approx(7 / 12, abs=1e-6)
    # complete feed: no gaps, NULL gap_start
    full = spark.createDataFrame(
        [(DT(2024, 2, d, 0, 0, 0),) for d in range(1, 6)], "ts timestamp"
    )
    r2 = calendar_gap_audit(full).collect()[0]
    assert r2.missing_days == 0 and r2.gap_start is None
    assert r2.coverage == 1.0


# -- derived_column_audit --------------------------------------------------------


def test_derived_column_audit_counts_every_disagreement_kind(spark):
    from soda_core_spark.operators.profiling import derived_column_audit

    df = spark.createDataFrame(
        [("s", "abc", 3),      # match
         ("s", "abcd", 3),     # value mismatch (drift 1)
         ("s", None, None),    # both NULL: agreement
         ("s", "xy", None),    # null mismatch
         ("s", None, 7)],      # null mismatch (derived NULL)
        "source string, text string, n_chars long",
    )
    r = derived_column_audit(
        df, stored_col="n_chars",
        derived=F.length(F.col("text")).cast("long"),
    ).collect()[0]
    assert r.n_rows == 5 and r.n_both_null == 1
    assert r.n_null_mismatch == 2 and r.n_value_mismatch == 1
    assert r.match_rate == pytest.approx(2 / 5, abs=1e-6)
    assert r.max_abs_drift == 1.0


# -- value_autocorrelation -------------------------------------------------------


def test_value_autocorrelation_memory_vs_alternation(spark):
    from soda_core_spark.operators.profiling import value_autocorrelation

    from datetime import datetime as DT, timedelta as TD

    t0 = DT(2024, 1, 1)
    rows = []
    # monotone ramp: near-perfect lag-1 correlation
    for i in range(20):
        rows.append((i, t0 + TD(seconds=i), "ramp", float(i)))
    # strict alternation: r = -1
    for i in range(20):
        rows.append(
            (100 + i, t0 + TD(seconds=i), "osc", float(i % 2))
        )
    # constant: zero variance -> NULL
    for i in range(5):
        rows.append((200 + i, t0 + TD(seconds=i), "flat", 7.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r.event_type: r for r in value_autocorrelation(df).collect()}
    assert out["ramp"].r_lag1 > 0.99
    assert out["osc"].r_lag1 == pytest.approx(-1.0, abs=1e-6)
    assert out["osc"].mean_abs_step == 1.0
    assert out["flat"].r_lag1 is None
    assert out["ramp"].n_pairs == 19


# -- type_mix_shift --------------------------------------------------------------


def test_type_mix_shift_detects_composition_flip(spark):
    from soda_core_spark.operators.profiling import type_mix_shift

    from datetime import datetime as DT, timedelta as TD

    t0 = DT(2024, 1, 1)
    rows = []
    # first half: all "a"; second half: all "b"
    for i in range(10):
        rows.append(("a", t0 + TD(hours=i)))
    for i in range(10):
        rows.append(("b", t0 + TD(hours=100 + i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in type_mix_shift(df).collect()}
    import math
    assert out["a"].p_first == 1.0 and out["a"].p_second == 0.0
    assert out["b"].delta == 1.0
    # total JSD = ln 2 for disjoint supports
    total = out["a"].jsd_contrib + out["b"].jsd_contrib
    assert total == pytest.approx(math.log(2), abs=1e-5)
    # stable mix: contributions ~ 0
    stable = spark.createDataFrame(
        [("x", t0 + TD(hours=i)) for i in range(8)]
        + [("y", t0 + TD(hours=i, minutes=30)) for i in range(8)],
        "event_type string, ts timestamp",
    )
    o2 = type_mix_shift(stable).collect()
    assert all(abs(r.jsd_contrib) < 0.02 for r in o2)


# -- t_closeness_audit -----------------------------------------------------------


def test_t_closeness_uniform_vs_concentrated(spark):
    from soda_core_spark.operators.profiling import t_closeness_audit

    import pytest as _pytest

    # two classes, global sensitive mix 50/50:
    #   class A mirrors the global mix -> t = 0
    #   class B is all-"x"             -> t = |1-0.5|/2+|0-0.5|/2 = 0.5
    rows = (
        [("A", "x")] * 4 + [("A", "y")] * 4 + [("B", "x")] * 8
        + [("C", "y")] * 8
    )
    # recompute: global x = 12/24, y = 12/24; B: t = 0.5; C: t = 0.5; A: 0
    df = spark.createDataFrame(rows, "qc string, s string")
    r = t_closeness_audit(df, ["qc"], "s").collect()[0]
    assert r.n_rows == 24 and r.n_classes == 3
    assert r.max_t == pytest.approx(0.5, abs=1e-6)
    assert r.mean_t == pytest.approx((0 * 8 + 0.5 * 8 + 0.5 * 8) / 24,
                                     abs=1e-6)
    assert r.share_above_02 == pytest.approx(16 / 24, abs=1e-6)
    assert r.share_above_05 == 0.0  # strictly greater
    with _pytest.raises(ValueError):
        t_closeness_audit(df, [], "s")


def test_t_closeness_null_sensitive_is_a_category(spark):
    from soda_core_spark.operators.profiling import t_closeness_audit

    df = spark.createDataFrame(
        [("A", None), ("A", None), ("B", "v"), ("B", "v")],
        "qc string, s string",
    )
    r = t_closeness_audit(df, ["qc"], "s").collect()[0]
    # each class fully concentrated on its own value vs 50/50 global
    assert r.max_t == pytest.approx(0.5, abs=1e-6)


# -- order_total_reconciliation --------------------------------------------------


def test_order_total_reconciliation_header_vs_detail(spark):
    from soda_core_spark.operators.profiling import (
        order_total_reconciliation,
    )

    orders = spark.createDataFrame(
        [(1, "P1", 110.0),   # matches derived exactly
         (2, "P1", 200.0),   # off by +50
         (3, "P1", 10.0)],   # no detail rows
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    items = spark.createDataFrame(
        # order 1: 100 * (1-0) * (1+0.1) = 110
        [(1, 100.0, 0.0, 0.1),
         # order 2: 100*(1-0.25)*(1+0) = 75, plus 75 -> 150
         (2, 100.0, 0.25, 0.0),
         (2, 75.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    r = order_total_reconciliation(orders, items).collect()[0]
    assert r.n_orders == 3 and r.n_no_items == 1
    assert r.n_match == 1
    assert r.match_rate == pytest.approx(0.5, abs=1e-6)
    assert r.max_abs_drift == 50.0
    assert r.mean_drift == pytest.approx(25.0, abs=1e-2)


# -- ship_latency_profile --------------------------------------------------------


def test_ship_latency_profile_quartiles_and_negative(spark):
    from soda_core_spark.operators.profiling import ship_latency_profile

    from datetime import datetime as DT

    orders = spark.createDataFrame(
        [(1, "P", DT(2024, 1, 10))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    items = spark.createDataFrame(
        [(1, DT(2024, 1, 10)),   # 0 days
         (1, DT(2024, 1, 20)),   # 10
         (1, DT(2024, 3, 20)),   # 70 -> late
         (1, DT(2024, 1, 5))],   # -5 -> negative
        "l_orderkey long, l_shipdate timestamp",
    )
    r = ship_latency_profile(orders, items).collect()[0]
    assert r.n_lines == 4 and r.n_negative == 1
    assert r.median_days == pytest.approx(5.0, abs=1e-6)  # interp 0|10
    assert r.share_over_60d == pytest.approx(0.25, abs=1e-6)
