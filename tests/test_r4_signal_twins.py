"""Randomized pure-Python twin verification for the round-4 signal
operators (readability, registered domain, lexicon score): one seeded
corpus of adversarial-ish random texts/hosts, ONE Spark job per
operator, every row compared against an independent Python
reimplementation of the documented contract. Catches contract drift the
hand-picked unit fixtures can't (the rule-attribution twin pattern)."""

import random
import re
import string

import pytest
from pyspark.sql import functions as F

ALPHABET = string.ascii_letters + string.digits + " .,!?-\n\t'\"()"


def _rand_texts(n=120, seed=29):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        k = rng.randint(0, 60)
        out.append((i, "".join(rng.choice(ALPHABET) for _ in range(k))))
    # targeted edge rows
    out += [
        (n, ""), (n + 1, None), (n + 2, "..."), (n + 3, "hmm grr brr"),
        (n + 4, "a.b.c!d?e"), (n + 5, " \t\n "), (n + 6, "?!?!?!"),
    ]
    return out


def _py_readability(text):
    t = text or ""
    toks = [w for w in re.split(r"[ \t\n\r]+", t) if w != ""]
    n_words = len(toks)
    n_sent = max(len(re.findall(r"[.!?]+", t)), 1)
    syl = len(re.findall(r"[aeiouy]+", t.lower())) + sum(
        1 for w in toks if not re.search(r"[aeiouy]", w.lower())
    )
    if n_words == 0:
        return n_words, n_sent, syl, None, None
    wps, spw = n_words / n_sent, syl / n_words
    fre = round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    fkgl = round(0.39 * wps + 11.8 * spw - 15.59, 6)
    return n_words, n_sent, syl, fre, fkgl


def test_readability_python_twin(spark):
    from soda_core_spark.functions.readability import with_readability

    rows = _rand_texts()
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.n_words, r.n_sentences, r.n_syllables,
               r.flesch_reading_ease, r.fk_grade)
        for r in with_readability(df).collect()
    }
    for i, text in rows:
        want = _py_readability(text)
        g = got[i]
        assert g[:3] == want[:3], (i, repr(text), g, want)
        for gv, wv in zip(g[3:], want[3:]):
            if wv is None:
                assert gv is None, (i, repr(text))
            else:
                assert gv == pytest.approx(wv, abs=1e-6), (i, repr(text))


def _py_registered_domain(host, suffixes):
    if host is None:
        return None
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in suffixes:
        return ".".join(labels[-3:])
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host


def test_registered_domain_python_twin(spark):
    from soda_core_spark.operators.urls import (
        MULTI_LABEL_SUFFIXES,
        registered_domain_col,
    )

    rng = random.Random(31)
    labels = ["a", "bb", "shop", "co", "uk", "com", "au", "x9", "www"]
    hosts = [(i, ".".join(rng.choices(labels, k=rng.randint(1, 5))))
             for i in range(150)]
    hosts += [(150, None), (151, "co.uk"), (152, "x.co.uk"),
              (153, "y.x.co.uk"), (154, "localhost")]
    df = spark.createDataFrame(hosts, "id long, host string")
    got = {
        r.id: r.rd
        for r in df.withColumn(
            "rd", registered_domain_col(F.col("host"))
        ).collect()
    }
    sfx = set(MULTI_LABEL_SUFFIXES)
    for i, h in hosts:
        assert got[i] == _py_registered_domain(h, sfx), (i, h)


def _py_lexicon(text, weights, per_tokens):
    toks = [w for w in re.split(r"[ \t\n\r]+", (text or "").lower())
            if w != ""]
    hits = sum(1 for t in toks if weights.get(t, 0.0) > 0)
    wsum = sum(weights.get(t, 0.0) for t in toks)
    score = (round(wsum * per_tokens / len(toks), 6) if toks else 0.0)
    return hits, round(wsum, 6), score


def test_lexicon_python_twin(spark):
    from soda_core_spark.operators.blocklist import lexicon_score

    weights = {"bad": 2.5, "a": 0.25, "grr": 1.0}
    rows = _rand_texts(seed=37)
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.lex_hits, r.lex_weight, r.lex_score)
        for r in lexicon_score(df, weights, per_tokens=1000).collect()
    }
    for i, text in rows:
        want = _py_lexicon(text, weights, 1000)
        g = got[i]
        assert g[0] == want[0], (i, repr(text))
        assert g[1] == pytest.approx(want[1], abs=1e-9), (i, repr(text))
        assert g[2] == pytest.approx(want[2], abs=1e-6), (i, repr(text))
