"""LLM-output contamination audit + distinct-n diversity
(operators/profiling.py llm_contamination / distinct_ngram_diversity)."""

import pytest


def _by(rows, *keys):
    return {tuple(getattr(r, k) for k in keys): r for r in rows}


def test_llm_contamination_hand_values(spark):
    from soda_core_spark.operators.profiling import llm_contamination

    df = spark.createDataFrame(
        [
            (1, "g", "AS AN AI MODEL I decline."),  # case-insensitive
            (2, "g", "plain text with no markers"),
            (3, "g", "prefix <|im_start|>assistant suffix"),
            (4, "g", None),  # NULL text counts as clean
            (5, "h", "[INST] hi [/INST] and I cannot fulfill it"),
        ],
        "doc_id long, source string, text string",
    )
    out = _by(llm_contamination(df).collect(), "group", "pattern")
    assert out[("g", "ai_self_reference")].n_hit == 1
    assert out[("g", "chat_special_token")].n_hit == 1
    assert out[("g", "refusal_stub")].n_hit == 0
    assert out[("g", "any_marker")].n_hit == 2
    assert out[("g", "any_marker")].n_docs == 4
    assert out[("g", "any_marker")].hit_rate == pytest.approx(0.5)
    # doc 5 fires two patterns but counts ONCE in the OR row
    assert out[("h", "inst_template")].n_hit == 1
    assert out[("h", "refusal_stub")].n_hit == 1
    assert out[("h", "any_marker")].n_hit == 1


def test_markup_residue_any_label_collision_guard(spark):
    from soda_core_spark.operators.profiling import markup_residue

    df = spark.createDataFrame([(1, "g", "x")], "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="collides"):
        markup_residue(df, patterns={"p": "x"}, any_label="p")


def test_distinct_ngram_diversity_hand_values(spark):
    from soda_core_spark.operators.profiling import distinct_ngram_diversity

    df = spark.createDataFrame(
        [(1, "g", "a b a b"), (2, "g", "a b"), (3, "g", None)],
        "doc_id long, source string, text string",
    )
    out = _by(distinct_ngram_diversity(df).collect(), "group", "n")
    r1, r2, r3 = out[("g", 1)], out[("g", 2)], out[("g", 3)]
    assert (r1.total_ngrams, r1.distinct_ngrams) == (6, 2)
    assert r1.distinct_ratio == pytest.approx(2 / 6, abs=1e-6)
    # doc1 bigrams: "a b","b a","a b"; doc2: "a b" -> 4 total, 2 distinct
    assert (r2.total_ngrams, r2.distinct_ngrams) == (4, 2)
    assert r2.distinct_ratio == pytest.approx(0.5)
    # doc1 trigrams: "a b a","b a b"; doc2 too short -> 2 total, 2 distinct
    assert (r3.total_ngrams, r3.distinct_ngrams) == (2, 2)
    assert r3.distinct_ratio == pytest.approx(1.0)


def test_distinct_ngram_diversity_short_docs_only(spark):
    from soda_core_spark.operators.profiling import distinct_ngram_diversity

    # every doc shorter than 3 tokens: the n=3 row must be ABSENT (the
    # SQL twin's empty unnest), not zero/NULL
    df = spark.createDataFrame(
        [(1, "g", "a b"), (2, "g", "c")],
        "doc_id long, source string, text string",
    )
    out = distinct_ngram_diversity(df).collect()
    assert sorted({r.n for r in out}) == [1, 2]


def test_distinct_ngram_diversity_rejects_bad_orders(spark):
    from soda_core_spark.operators.profiling import distinct_ngram_diversity

    df = spark.createDataFrame([(1, "g", "a")], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        distinct_ngram_diversity(df, ns=())
    with pytest.raises(ValueError):
        distinct_ngram_diversity(df, ns=(0, 1))
