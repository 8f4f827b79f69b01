"""BM25 retrieval operator tests: python-oracle parity + plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.retrieval import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "hash join beats sort merge join on small tables"),
        (2, "hash partitioning and hash aggregation"),
        (3, "filter pushdown into the scan"),
        (4, "completely unrelated text about gardens and rivers"),
        (5, "join join join join join"),
        (6, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _python_bm25(rows, terms, k1=1.2, b=0.75):
    docs = {i: (t or "").lower().split() for i, t in rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfreq = {
        t: sum(1 for w in docs.values() if t in w) for t in terms
    }
    out = {}
    for i, w in docs.items():
        score, matched = 0.0, 0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if matched:
            out[i] = (round(score, 6), matched)
    return out


def test_bm25_matches_python_oracle(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expected = _python_bm25(rows, ["hash", "join", "filter"])
    got = {
        r["doc_id"]: (r["bm25"], r["n_terms_matched"])
        for r in bm25_topk(corpus, ["hash", "join", "filter"], k=10).collect()
    }
    assert got == expected
    # ranking sanity: doc 1 matches two terms incl. a double 'join'
    order = [r["doc_id"] for r in
             bm25_topk(corpus, ["hash", "join", "filter"], k=10).collect()]
    assert order[0] == 1
    assert 4 not in got and 6 not in got  # no-match docs never surface


def test_bm25_term_filter_precedes_shuffle(spark, corpus):
    """The query-term predicate must sit under the generate/explode —
    the shuffled relation is query-matches only, never the token
    stream — and the tiny stats sides must broadcast."""
    plan = (
        bm25_topk(corpus, ["hash", "join"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort
    # the isin filter appears as a Filter on the exploded term
    assert "INSET" in plan.upper() or "IN (" in plan


def test_bm25_empty_query_rejected(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])


def test_blocklist_filter(spark):
    from soda_core_spark.operators.blocklist import blocklist_filter

    rows = [
        (1, "https://bad.example.com/p", "clean words here"),
        (2, "https://ok.example.com/p", "contains badword here"),
        (3, "https://ok.example.com/p", "notbadword substring stays clean"),
        (4, "https://BAD.example.com/p", "badword too but host wins"),
        (5, "https://ok.example.com/p", None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    got = {
        r["doc_id"]: (r["block_reason"], r["blocked"])
        for r in blocklist_filter(
            df,
            blocked_hosts=["bad.example.com"],
            blocked_terms=["BADWORD"],
            url_col="url",
        ).collect()
    }
    assert got[1] == ("host", True)
    assert got[2] == ("term", True)
    assert got[3] == (None, False)  # token-exact: substring never trips
    assert got[4] == ("host", True)  # case-insensitive host + precedence
    assert got[5] == (None, False)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        blocklist_filter(df)
    with _pytest.raises(ValueError):
        blocklist_filter(df, blocked_hosts=["x"])  # no host/url col


def test_blocklist_plan_is_shuffle_free(spark):
    from soda_core_spark.operators.blocklist import blocklist_filter

    df = spark.createDataFrame([(1, "s", "t")], ["doc_id", "source", "text"])
    plan = (
        blocklist_filter(df, blocked_hosts=["s"], blocked_terms=["x"], host_col="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure per-row probes, zero shuffle
