"""fastText-style hashed n-gram NB classifier (operators/nbgram.py)."""

import hashlib
import math

from pyspark.sql import functions as F

from soda_core_spark.operators.nbgram import (
    BIGRAM_SEP,
    hashed_gram_counts,
    nb_bucket_llr,
    nb_prior,
    nb_quality_classifier,
    nb_score,
)


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str, buckets: int, bigrams: bool = True) -> list[int]:
    ws = [w for w in text.split() if w]
    g = [_phash(w) % buckets for w in ws]
    if bigrams:
        g += [
            _phash(a + BIGRAM_SEP + b) % buckets for a, b in zip(ws, ws[1:])
        ]
    return g


def _nb_replay(rows, buckets: int, alpha: float = 1.0, bigrams: bool = True):
    """Plain-python replay of the whole train+score pipeline."""
    pos_c: dict[int, int] = {}
    neg_c: dict[int, int] = {}
    n_pos = n_neg = 0
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text, label in rows:
        n_pos += label
        n_neg += not label
        counts: dict[int, int] = {}
        for b in _grams(text or "", buckets, bigrams):
            counts[b] = counts.get(b, 0) + 1
        if counts:
            per_doc[doc_id] = counts
        tgt = pos_c if label else neg_c
        for b, n in counts.items():
            tgt[b] = tgt.get(b, 0) + n
    pos_t, neg_t = sum(pos_c.values()), sum(neg_c.values())
    llr = {
        b: round(
            math.log((pos_c.get(b, 0) + alpha) / (pos_t + alpha * buckets))
            - math.log((neg_c.get(b, 0) + alpha) / (neg_t + alpha * buckets)),
            12,
        )
        for b in set(pos_c) | set(neg_c)
    }
    prior = round(math.log(n_pos + alpha) - math.log(n_neg + alpha), 12)
    out = {}
    for doc_id, counts in per_doc.items():
        s = round(sum(n * llr[b] for b, n in counts.items()) + prior, 6)
        out[doc_id] = (s, s > 0.0)
    return out


ROWS = [
    (1, "good clean prose with varied words", True),
    (2, "another good document about prose", True),
    (3, "spam spam buy buy now now", False),
    (4, "buy now spam click here", False),
    (5, "good prose words", True),
    (6, "", False),
    (7, None, False),
]


def _frame(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text", "label"])


def test_scores_match_python_replay_exactly(spark):
    got = {
        r["doc_id"]: (r["nb_score"], r["nb_pred"])
        for r in nb_quality_classifier(_frame(spark), buckets=64).collect()
    }
    assert got == _nb_replay(ROWS, buckets=64)


def test_separable_labels_classified_correctly(spark):
    preds = {
        r["doc_id"]: r["nb_pred"]
        for r in nb_quality_classifier(_frame(spark), buckets=512).collect()
    }
    labels = {doc_id: label for doc_id, _, label in ROWS}
    # token-less docs (6, 7) carry no evidence and drop out
    assert set(preds) == {1, 2, 3, 4, 5}
    assert all(preds[d] == labels[d] for d in preds)


def test_bigrams_distinguish_word_order(spark):
    # same multiset of words, different order: unigram-only scores tie,
    # bigram features split them
    rows = [
        (1, "alpha beta alpha beta", True),
        (2, "alpha beta alpha beta", True),
        (3, "beta alpha beta alpha", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    uni = {
        r["doc_id"]: r["nb_score"]
        for r in nb_quality_classifier(df, buckets=512, bigrams=False).collect()
    }
    assert uni[1] == uni[3]
    bi = {
        r["doc_id"]: r["nb_score"]
        for r in nb_quality_classifier(df, buckets=512, bigrams=True).collect()
    }
    assert bi[1] > bi[3]


def test_model_reuse_on_unlabeled_corpus(spark):
    # train on the labeled frame, score a new frame with a constant label
    train = _frame(spark)
    counts = hashed_gram_counts(train, buckets=64)
    model = nb_bucket_llr(counts, buckets=64)
    prior = nb_prior(train)
    new = spark.createDataFrame(
        [(100, "good prose", True), (101, "buy spam now", True)],
        ["doc_id", "text", "label"],
    )
    new_counts = hashed_gram_counts(new, buckets=64)
    got = {r["id"]: r["nb_pred"] for r in nb_score(new_counts, model, prior).collect()}
    assert got == {100: True, 101: False}


def test_scoring_plan_broadcasts_model(spark):
    plan = nb_quality_classifier(
        _frame(spark), buckets=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
