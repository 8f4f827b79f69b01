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
