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


def test_cluster_size_histogram_hand_values(spark):
    from soda_core_spark.operators.dedup import cluster_size_histogram

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (7, 7), (8, 7)],
        "node int, component int",
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id int")
    v = {r["cluster_size"]: r for r in
         cluster_size_histogram(comps, all_ids=ids).collect()}
    assert (v[3]["n_clusters"], v[3]["n_docs"], v[3]["n_dropped"]) == (1, 3, 2)
    assert (v[2]["n_clusters"], v[2]["n_docs"], v[2]["n_dropped"]) == (2, 4, 2)
    assert (v[1]["n_clusters"], v[1]["n_dropped"]) == (3, 0)  # docs 6,9,10
    assert sum(r["n_docs"] for r in v.values()) == 10
    assert sum(r["n_dropped"] for r in v.values()) == 4
