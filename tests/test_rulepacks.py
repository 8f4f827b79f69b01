"""Hand-value and contract-e2e tests for the published rule packs
(functions/rulepacks.py): Gopher document rules and C4 line cleaning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from soda_core_spark.functions.rulepacks import (
    GOPHER_STOPWORDS,
    c4_clean_columns,
    c4_line_clean,
    gopher_contract_yaml,
    gopher_filter,
    gopher_flags,
)

# a document that passes every Gopher rule: >= 50 words, mean word
# length in [3, 10], no symbols/bullets/ellipses, alphabetic, and
# containing >= 2 stop words
GOOD_DOC = (
    "the quick brown fox jumps over that lazy sleeping dog near "
    "a quiet river bank while morning light spreads slowly across "
    "green fields and tall trees wave gently with the wind as birds "
    "sing their bright songs from hidden branches above mossy stones "
    "and children walk to school along the winding gravel path have "
    "with careful steps every single day"
)


def _flags_for(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        *(
            expr.alias(name)
            for name, expr in gopher_flags(F.col("text")).items()
        )
    ).first()
    return row.asDict()


def test_gopher_good_doc_keeps(spark):
    d = _flags_for(spark, GOOD_DOC)
    assert d.pop("keep") is True
    assert not any(d.values()), d


def test_gopher_word_count_bounds(spark):
    d = _flags_for(spark, "too few words here the of")
    assert d["fail_word_count"] and not d["keep"]


def test_gopher_mean_word_length(spark):
    # 60 one-char words -> mean length 1 < 3
    d = _flags_for(spark, " ".join(["a"] * 60) + " the of")
    assert d["fail_mean_word_len"]
    # very long pseudo-words -> mean length > 10
    d2 = _flags_for(spark, " ".join(["abcdefghijklmnop"] * 60))
    assert d2["fail_mean_word_len"]


def test_gopher_symbol_ratio(spark):
    base = GOOD_DOC + " " + " ".join(["#"] * 10)
    d = _flags_for(spark, base)
    assert d["fail_symbol_ratio"]
    # ellipsis characters count too
    d2 = _flags_for(spark, GOOD_DOC + " " + "…" * 10)
    assert d2["fail_symbol_ratio"]


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item number %d here" % i for i in range(10)])
    assert _flags_for(spark, bullets)["fail_bullet"]
    ell = "\n".join(["to be continued..." for _ in range(10)])
    assert _flags_for(spark, ell)["fail_ellipsis"]
    # one bullet among many prose lines is fine
    mixed = GOOD_DOC + "\n- a single bullet point line"
    assert not _flags_for(spark, mixed)["fail_bullet"]


def test_gopher_alpha_words_and_stopwords(spark):
    numeric = " ".join(str(i) for i in range(80))
    d = _flags_for(spark, numeric)
    assert d["fail_alpha_words"] and d["fail_stopwords"]
    assert len(GOPHER_STOPWORDS) == 8


def test_gopher_null_text_fails_closed(spark):
    df = spark.createDataFrame([(None,)], "text string")
    row = df.select(
        *(
            e.alias(n)
            for n, e in gopher_flags(F.col("text")).items()
        )
    ).first()
    assert row["keep"] is False


def test_gopher_filter_df(spark):
    df = spark.createDataFrame(
        [(1, GOOD_DOC), (2, "tiny."), (3, None)], "id long, text string"
    )
    kept = gopher_filter(df).select("id").collect()
    assert [r.id for r in kept] == [1]


def test_c4_clean_hand_values(spark):
    text = (
        "This sentence is long enough and ends with a period.\n"
        "short line.\n"
        "Please enable javascript to continue reading this page.\n"
        "no terminal punctuation on this perfectly long line here\n"
        "Another good sentence follows here with plenty of words!\n"
        "Is this a question with enough words to survive cleaning?"
    )
    df = spark.createDataFrame([(text,)], "text string")
    cols = c4_clean_columns(F.col("text"))
    row = df.select(
        *(e.alias(n) for n, e in cols.items())
    ).first()
    assert row["clean_text"] == (
        "This sentence is long enough and ends with a period.\n"
        "Another good sentence follows here with plenty of words!\n"
        "Is this a question with enough words to survive cleaning?"
    )
    assert row["n_lines_total"] == 6
    assert row["n_lines_kept"] == 3
    assert row["page_keep"] is True


def test_c4_page_level_drops(spark):
    good3 = (
        "One proper sentence with enough words sits right here.\n"
        "Two proper sentences with enough words sit right here.\n"
        "Three proper sentences with enough words sit right here."
    )
    rows = spark.createDataFrame(
        [
            (1, good3),
            (2, good3 + "\nfooter with lorem ipsum inside it."),
            (3, good3 + "\nvar x = { a: 1 };"),
            (4, "Only two sentences remain after cleaning happens here."
                "\nAnd this is the second proper sentence right here."),
        ],
        "id long, text string",
    )
    out = {
        r.id: r.page_keep
        for r in c4_line_clean(rows).select("id", "page_keep").collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: False}
    survivors = c4_line_clean(rows, drop_failed_pages=True)
    assert [r.id for r in survivors.select("id").collect()] == [1]
    assert "page_keep" not in survivors.columns


def test_c4_curly_quote_terminators(spark):
    text = "A quoted sentence ending with a curly quote mark here”"
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            c4_clean_columns(F.col("text"))["n_lines_kept"].alias("k")
        )
        .first()
    )
    assert row["k"] == 1


def test_rulepack_plans_stay_narrow(spark):
    """Zero shuffles, zero Python, and the materialize-once aliases
    survive CollapseProject (each expensive array is built once per
    row, not once per referencing output)."""
    from soda_core_spark.functions.rulepacks import with_gopher_flags

    df = spark.createDataFrame([(1, GOOD_DOC)], "id long, text string")
    for frame in (with_gopher_flags(df), c4_line_clean(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
    gplan = (
        with_gopher_flags(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the staged projection materializes the words array exactly once:
    # only one split on the whitespace class appears in the whole plan
    assert gplan.count("split(coalesce(text") == 2  # words + lines
    cplan = c4_line_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert cplan.count("RLIKE") == 1  # kept-lines filter evaluated once


def test_gopher_contract_roundtrip(spark):
    from soda_core_spark.operators.engine import verify_contract
    from soda_core_spark.plans.model import contract_from_yaml

    df = spark.createDataFrame(
        [(i, GOOD_DOC) for i in range(10)], "id long, text string"
    )
    yaml_text = gopher_contract_yaml("docs", max_fail_rate=0.5)
    contract = contract_from_yaml(yaml_text)
    res = verify_contract(spark, contract, df)
    outcomes = {r.name: r.outcome.value for r in res.check_results}
    assert len(outcomes) == 8
    assert set(outcomes.values()) == {"passed"}, outcomes


def test_gopher_contract_fails_on_junk(spark):
    from soda_core_spark.operators.engine import verify_contract
    from soda_core_spark.plans.model import contract_from_yaml

    df = spark.createDataFrame(
        [(i, "# # {}") for i in range(10)], "id long, text string"
    )
    contract = contract_from_yaml(gopher_contract_yaml("docs"))
    res = verify_contract(spark, contract, df)
    vals = {r.name: r.outcome.value for r in res.check_results}
    assert "failed" in vals.values(), vals
    # no engine errors: every rule expression must actually evaluate
    assert "not_evaluated" not in vals.values(), vals


def test_paragraph_dedup_first_occurrence_order(spark):
    from pyspark.sql import functions as F

    from soda_core_spark.functions.rulepacks import (
        dedup_paragraphs_from,
        paragraphs_col,
    )

    rows = [
        (1, "header\nbody one\nheader\nbody two\nheader"),
        (2, "only\n\n  \nonly"),       # blanks drop, dup collapses
        (3, None),
        (4, "a\nb\nc"),                 # nothing duplicated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    staged = df.select(
        "doc_id", paragraphs_col(F.col("text")).alias("__p")
    )
    cols = dedup_paragraphs_from(F.col("__p"))
    got = {
        r["doc_id"]: (r["n"], r["u"], r["t"])
        for r in staged.select(
            "doc_id",
            cols["n_paras"].alias("n"),
            cols["n_unique"].alias("u"),
            cols["dedup_text"].alias("t"),
        ).collect()
    }
    assert got[1] == (5, 3, "header\nbody one\nbody two")
    assert got[2] == (2, 1, "only")
    assert got[3] == (0, 0, None)
    assert got[4] == (3, 3, "a\nb\nc")
    # zero shuffle, zero python
    plan = (
        staged.select(cols["dedup_text"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
