"""Round-5 operators: corpus concentration (HHI), embedding
decontamination, boilerplate n-gram census, Fleiss' kappa."""

import pytest
from pyspark.sql import functions as F


def test_corpus_concentration_hand_values(spark):
    from soda_core_spark.operators.profiling import corpus_concentration

    # 10 docs: a×5, b×3, c×1, d×1 → HHI = (25+9+1+1)/100 = 0.36
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "host string")
    r = corpus_concentration(df, "host", top_n=2).collect()[0]
    assert r.n_docs == 10 and r.n_groups == 4
    assert r.hhi == pytest.approx(0.36)
    assert r.effective_groups == pytest.approx(1 / 0.36, abs=1e-6)
    assert r.top1_share == pytest.approx(0.5)
    assert r.topn_share == pytest.approx(0.8)  # a + b


def test_corpus_concentration_uniform_vs_monopoly(spark):
    from soda_core_spark.operators.profiling import corpus_concentration

    uni = spark.createDataFrame(
        [(f"h{i % 10}",) for i in range(100)], "host string"
    )
    r = corpus_concentration(uni, "host").collect()[0]
    assert r.hhi == pytest.approx(0.1)  # 10 equal groups
    assert r.effective_groups == pytest.approx(10.0)
    mono = spark.createDataFrame([("only",)] * 50, "host string")
    r2 = corpus_concentration(mono, "host").collect()[0]
    assert r2.hhi == 1.0 and r2.effective_groups == 1.0
    assert r2.top1_share == 1.0


def test_embedding_decontamination_flags_near_benchmark(spark):
    from soda_core_spark.operators.similarity import decontaminate_embeddings

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),     # = bench 100 → cos 1.0
            (2, [0.97, 0.05]),   # near bench 100
            (3, [0.0, 1.0]),     # orthogonal to both benches
            (4, [-1.0, 0.0]),    # anti-parallel
        ],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.6, 0.8])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in
           decontaminate_embeddings(corpus, bench, threshold=0.95).collect()}
    assert out[1].contaminated and out[1].max_bench_cosine == 1.0
    assert out[1].nearest_bench_id == 100
    assert out[2].contaminated
    assert not out[3].contaminated
    # orthogonal doc's nearest bench is 200 (cos 0.8 > 0.0)
    assert out[3].nearest_bench_id == 200
    assert not out[4].contaminated  # cos is -1 / -0.6, far below


def test_embedding_decontamination_tie_breaks_low_bench_id(spark):
    from soda_core_spark.operators.similarity import decontaminate_embeddings

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    bench = spark.createDataFrame(
        [(300, [2.0, 0.0]), (100, [3.0, 0.0]), (200, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    r = decontaminate_embeddings(corpus, bench, threshold=0.5).collect()[0]
    assert r.max_bench_cosine == 1.0
    assert r.nearest_bench_id == 100  # all cos=1.0 → lowest id wins


def test_boilerplate_ngrams_doc_frequency_not_occurrences(spark):
    from soda_core_spark.operators.dedup import boilerplate_ngrams

    rows = [
        (1, "accept all cookies to continue accept all cookies now"),
        (2, "please accept all cookies thanks"),
        (3, "accept all cookies"),
        (4, "unrelated text entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.ngram: r.doc_frequency
           for r in boilerplate_ngrams(df, n=3, min_doc_frequency=2,
                                       top=10).collect()}
    # doc 1 contains the trigram TWICE but counts once (doc frequency)
    assert out["accept all cookies"] == 3
    assert "unrelated text entirely" not in out  # df=1 < min
    assert all(v >= 2 for v in out.values())


def test_boilerplate_ngrams_short_docs_and_report_bound(spark):
    from soda_core_spark.operators.dedup import boilerplate_ngrams

    rows = [(i, "one two") for i in range(5)] + [
        (10 + i, "x y z w") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = boilerplate_ngrams(df, n=3, min_doc_frequency=2, top=1).collect()
    # 2-token docs yield no trigram; 4-token docs yield 2 each; top=1
    # keeps the lexicographically-first of the tied pair
    assert len(got) == 1
    assert got[0].ngram == "x y z" and got[0].doc_frequency == 5


def test_fleiss_kappa_perfect_agreement(spark):
    from soda_core_spark.operators.attribution import fleiss_kappa

    rows = [(True, True, True)] * 30 + [(False, False, False)] * 70
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = fleiss_kappa(df, ["a", "b", "c"]).collect()[0]
    assert r.n == 100 and r.m == 3
    assert r.p_bar == 1.0
    assert r.kappa == pytest.approx(1.0)


def test_fleiss_kappa_hand_values(spark):
    from soda_core_spark.operators.attribution import fleiss_kappa

    # 4 items, 3 raters: votes k = 3, 2, 1, 0
    rows = [
        (True, True, True),
        (True, True, False),
        (True, False, False),
        (False, False, False),
    ]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = fleiss_kappa(df, ["a", "b", "c"]).collect()[0]
    # P_i: k=3 → 1; k=2 → (2+0)/6=1/3; k=1 → (0+2)/6=1/3; k=0 → 1
    p_bar = (1 + 1 / 3 + 1 / 3 + 1) / 4
    p = 6 / 12
    pe = p * p + (1 - p) * (1 - p)
    want = (p_bar - pe) / (1 - pe)
    assert r.p_true == pytest.approx(0.5)
    assert r.p_bar == pytest.approx(round(p_bar, 6))
    assert r.kappa == pytest.approx(want, abs=1e-6)


def test_fleiss_kappa_null_rows_excluded_and_constant_null(spark):
    from soda_core_spark.operators.attribution import fleiss_kappa

    rows = [(True, True, True)] * 5 + [(None, True, True)] * 3
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = fleiss_kappa(df, ["a", "b", "c"]).collect()[0]
    assert r.n == 5  # partial panels drop out entirely
    assert r.kappa is None  # all-constant panel → pe=1 → undefined

    with pytest.raises(ValueError):
        fleiss_kappa(df, ["a"])


def test_fleiss_kappa_m2_matches_cohen_direction(spark):
    """With two raters Fleiss and Cohen agree in sign and rough size on
    balanced marginals (identical when marginals match exactly)."""
    from soda_core_spark.operators.attribution import (
        decision_kappa,
        fleiss_kappa,
    )

    rows = ([(True, True)] * 40 + [(False, False)] * 40
            + [(True, False)] * 10 + [(False, True)] * 10)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    fk = fleiss_kappa(df, ["a", "b"]).collect()[0]
    ck = decision_kappa(df, "a", "b").collect()[0]
    assert fk.kappa == pytest.approx(ck.kappa, abs=1e-6)


def test_classifier_reliability_hand_values(spark):
    from soda_core_spark.operators.calibration import classifier_reliability

    # bin 0-0.5: 4 rows score .2, 1 positive (rate .25, gap .05)
    # bin .5-1: 4 rows score .8, 4 positive (rate 1.0, gap .2)
    rows = ([(0.2, True)] + [(0.2, False)] * 3 + [(0.8, True)] * 4)
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r.bin: r for r in classifier_reliability(
        df, F.col("s"), F.col("y"), n_bins=2).collect()}
    assert out[0].n == 4 and out[0].positive_rate == pytest.approx(0.25)
    assert out[0].abs_gap == pytest.approx(0.05)
    assert out[1].positive_rate == pytest.approx(1.0)
    assert out[1].abs_gap == pytest.approx(0.2)
    # ECE = (4/8)*.05 + (4/8)*.2 = 0.125, same scalar on every row
    assert out[0].ece == pytest.approx(0.125)
    assert out[1].ece == out[0].ece


def test_classifier_reliability_top_edge_and_nulls(spark):
    from soda_core_spark.operators.calibration import classifier_reliability

    rows = [(1.0, True), (0.999, True), (None, True), (0.5, None)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = classifier_reliability(df, F.col("s"), F.col("y"),
                                 n_bins=10).collect()
    assert len(out) == 1  # NULL score / NULL label rows dropped
    assert out[0].bin == 9  # score 1.0 clamps into the last bin
    assert out[0].n == 2


def test_mixture_plan_epochs_and_cap(spark):
    from soda_core_spark.operators.sampling import mixture_plan

    rows = [("web", 100), ("code", 100), ("books", 10)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {r.source: r for r in mixture_plan(
        df, {"web": 0.5, "books": 0.5}, token_budget=100,
        max_epochs=2.0).collect()}
    web, books, code = out["web"], out["books"], out["code"]
    # web: target 50 of 100 available → rate .5, epochs .5, uncapped
    assert web.target_tokens == pytest.approx(50.0)
    assert web.sampling_rate == pytest.approx(0.5)
    assert web.epochs == pytest.approx(0.5) and not web.capped
    # books: target 50 of 10 available → 5 epochs, capped at 2 → 20 toks
    assert books.epochs == pytest.approx(5.0) and books.capped
    assert books.planned_tokens == pytest.approx(20.0)
    assert books.sampling_rate == pytest.approx(1.0)
    # code: in data, not in weights → weight 0, nothing planned
    assert code.weight == 0.0 and code.planned_tokens == 0.0


def test_mixture_plan_renormalizes_and_reports_absent_source(spark):
    from soda_core_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([("a", 1000)], "source string, n_tokens long")
    out = {r.source: r for r in mixture_plan(
        df, {"a": 2.0, "ghost": 2.0}, token_budget=100).collect()}
    assert out["a"].weight == pytest.approx(0.5)  # 2.0/4.0
    g = out["ghost"]
    assert g.available_tokens == 0 and g.planned_tokens == 0.0
    assert g.epochs is None and not g.capped

    with pytest.raises(ValueError):
        mixture_plan(df, {}, token_budget=100)
    with pytest.raises(ValueError):
        mixture_plan(df, {"a": 1.0}, token_budget=0)


def test_embedding_decontamination_arrow_join_parity(spark):
    """The zero-shuffle Arrow path and the JVM join path must agree:
    same flags, same nearest ids, same 4dp cosines (both round before
    comparing, and random fixtures don't sit on rounding boundaries)."""
    import random

    from soda_core_spark.operators.similarity import decontaminate_embeddings

    rng = random.Random(123)
    mk = lambda i: [round(rng.uniform(-1, 1), 6) for _ in range(16)]  # noqa
    corpus = spark.createDataFrame(
        [(i, mk(i)) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(1000 + i, mk(i)) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    a = {r.vec_id: (r.max_bench_cosine, r.nearest_bench_id, r.contaminated)
         for r in decontaminate_embeddings(corpus, bench, threshold=0.5,
                                           method="arrow").collect()}
    j = {r.vec_id: (r.max_bench_cosine, r.nearest_bench_id, r.contaminated)
         for r in decontaminate_embeddings(corpus, bench, threshold=0.5,
                                           method="join").collect()}
    assert a == j


def test_embedding_decontamination_arrow_zero_shuffle(spark):
    """The Arrow path's plan must contain NO shuffle exchange — that is
    its entire reason to exist at 10^12 rows."""
    from soda_core_spark.operators.similarity import decontaminate_embeddings

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    bench = spark.createDataFrame(
        [(9, [0.5, 0.5])], "vec_id long, embedding array<float>"
    )
    out = decontaminate_embeddings(corpus, bench, method="arrow")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    r = out.collect()[0]
    assert r.nearest_bench_id == 9
