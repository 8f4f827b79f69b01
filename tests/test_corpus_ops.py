"""TF-IDF keyword extraction + paragraph-repetition signals: python-oracle
parity and plan shape. Cross-engine (DuckDB) parity runs in
test_oracle_parity via q50/q51."""

import math

from pyspark.sql import functions as F


def test_tfidf_keywords_python_oracle(spark):
    from soda_core_spark.operators.keywords import tfidf_keywords

    rows = [
        (1, "spark spark join the the the"),
        (2, "join filter THE Spark"),
        (3, "gardens rivers gardens"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_keywords(df, k=2).collect()
    }

    docs = {i: (t or "").lower().split() for i, t in rows}
    n = len(rows)
    dfreq = {}
    for words in docs.values():
        for t in set(words):
            dfreq[t] = dfreq.get(t, 0) + 1
    expected = {}
    for i, words in docs.items():
        scored = sorted(
            (
                (-words.count(t) * (math.log((1 + n) / (1 + dfreq[t])) + 1.0), t)
                for t in set(words)
            )
        )
        for rank, (neg, t) in enumerate(scored[:2], start=1):
            expected[(i, rank)] = (t, words.count(t), -neg)

    assert set(got) == set(expected)
    for key, (term, tf, score) in expected.items():
        gt, gtf, gs = got[key]
        assert (gt, gtf) == (term, tf), key
        assert abs(gs - score) < 1e-12, key
    # no-token docs yield no rows
    assert not any(k[0] in (4, 5) for k in got)


def test_tfidf_single_plan_no_driver_action(spark):
    """N enters as a broadcast 1-row aggregate — building the frame must
    trigger zero jobs, and the plan joins docfreq on term (no cartesian
    over the data)."""
    from soda_core_spark.operators.keywords import tfidf_keywords

    df = spark.createDataFrame([(1, "a b"), (2, "b c")], ["doc_id", "text"])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    out = tfidf_keywords(df, k=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before, "plan construction ran a job"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_paragraph_repetition_hand_values(spark):
    from soda_core_spark.functions.text import with_paragraph_signals

    rows = [
        # 4 paras, 3 distinct ("nav menu" ×2, len 8): count 1-3/4, chars
        # tot=8+12+8+7=35, distinct=8+12+7=27 → (35-27)/35
        (1, "nav menu\n\nreal content\n\nnav menu\n\nfooter."),
        (2, "only one paragraph\nwith two lines"),
        (3, "a\n\n\n\nb"),          # \n\n+ collapses: 2 distinct → 0.0
        (4, "x\n\nx\n\nx"),          # 3 paras 1 distinct → 2/3, chars 2/3
        (5, None),
        (6, "pad\n\n \n\npad"),      # whitespace-only para dropped → 2 paras
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_para_frac"], r["dup_para_char_frac"])
        for r in with_paragraph_signals(df).collect()
    }
    assert got[1] == (1 - 3 / 4, (35 - 27) / 35)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (1 - 1 / 3, (3 - 1) / 3)
    assert got[5] == (0.0, 0.0)
    assert got[6] == (1 - 1 / 2, (6 - 3) / 6)


def test_paragraph_signals_no_shuffle(spark):
    from soda_core_spark.functions.text import with_paragraph_signals

    df = spark.createDataFrame([(1, "a\n\nb")], ["doc_id", "text"])
    plan = (
        with_paragraph_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
