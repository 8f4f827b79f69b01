"""corpus_paragraph_dedup: first-global-occurrence semantics, totality,
and the skew-safe plan shape (partial-agg min(struct), never a window)."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.dedup import corpus_paragraph_dedup


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        (1, "alpha\n\nshared block\n\nbeta"),
        (2, "shared block\n\ngamma\n\nshared block"),
        (3, "shared block"),
        (4, ""),
        (5, None),
        (6, "delta\n\ndelta"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    res = corpus_paragraph_dedup(df)
    return {r["doc_id"]: r for r in res.collect()}, res


def test_first_global_occurrence_survives(out):
    v, _ = out
    # doc 1 owns 'shared block' (lowest (id, pos)); later copies vanish
    assert v[1]["text_deduped"] == "alpha\n\nshared block\n\nbeta"
    assert v[2]["text_deduped"] == "gamma"
    assert v[3]["text_deduped"] == ""
    assert (v[2]["n_paras"], v[2]["n_kept"]) == (3, 1)
    assert (v[3]["n_paras"], v[3]["n_kept"]) == (1, 0)


def test_intra_doc_repeats_also_collapse(out):
    v, _ = out
    assert v[6]["text_deduped"] == "delta"
    assert (v[6]["n_paras"], v[6]["n_kept"]) == (2, 1)


def test_total_over_paragraphless_docs(out):
    v, _ = out
    for d in (4, 5):
        assert v[d]["text_deduped"] == ""
        assert (v[d]["n_paras"], v[d]["n_kept"]) == (0, 0)
    assert len(v) == 6


def test_no_window_in_plan(out):
    _, res = out
    plan = res._jdf.queryExecution().executedPlan().toString()
    # hot-paragraph safety: first-owner must be aggregation, not a
    # row_number window over the paragraph key
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan
