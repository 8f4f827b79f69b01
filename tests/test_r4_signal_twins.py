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
    hits = sum(1 for t in toks if t in weights)  # membership, not sign
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


def _py_paragraph_profile(text, lang_words, langs):
    paras = [p for p in re.split(r"\n\n+", text or "") if p.strip() != ""]
    counts = {}
    for p in paras:
        toks = [w for w in re.split(r"[ \t\n\r]+", p.lower()) if w != ""]
        fracs = {
            lang: (sum(1 for t in toks if t in lang_words[lang]) / len(toks)
                   if toks else 0.0)
            for lang in langs
        }
        conf = max(fracs.values())
        pred = "und" if conf <= 0.0 else min(
            l for l, f in fracs.items() if f == conf
        )
        counts[pred] = counts.get(pred, 0) + 1
    if not counts:
        return None
    n = sum(counts.values())
    dom = min(
        (l for l in counts),
        key=lambda l: (-counts[l], l),
    )
    other = n - counts[dom]
    return n, dom, other, round(other / n, 6)


def test_paragraph_lang_profile_python_twin(spark):
    from soda_core_spark.functions.langid import (
        LANGS,
        LANG_WORDS,
        paragraph_lang_profile,
    )

    rng = random.Random(41)
    frags = {
        "en": "the and is of to in that it was for",
        "de": "der die das und ist ich nicht mit ein eine",
        "fr": "le la les de des un une et est que",
        "noise": "zz9 qqq k2k 777 xx yy",
    }
    rows = []
    for i in range(80):
        paras = [
            frags[rng.choice(list(frags))]
            for _ in range(rng.randint(1, 5))
        ]
        rows.append((i, "\n\n".join(paras)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_paragraphs, r.dominant_lang, r.n_other,
                   r.other_fraction)
        for r in paragraph_lang_profile(df).collect()
    }
    for i, text in rows:
        want = _py_paragraph_profile(text, LANG_WORDS, LANGS)
        assert got[i][:3] == want[:3], (i, repr(text), got[i], want)
        assert got[i][3] == pytest.approx(want[3], abs=1e-6)


def test_group_coherence_numpy_twin(spark):
    import numpy as np

    from soda_core_spark.functions.embeddings_qc import group_coherence

    rng = random.Random(43)
    rows = []
    for i in range(90):
        g = f"g{i % 4}"
        vec = [round(rng.uniform(-1, 1), 3) for _ in range(8)]
        rows.append((g, vec))
    df = spark.createDataFrame(rows, "label string, embedding array<float>")
    got = {r.group: r for r in group_coherence(df).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(np.array(v, dtype=np.float32))
    for g, vecs in by_g.items():
        cent = np.round(np.mean([v.astype(np.float64) for v in vecs],
                                axis=0), 12)
        coss = []
        for v in vecs:
            vd = v.astype(np.float64)
            nv, nc = np.sqrt((vd * vd).sum()), np.sqrt((cent * cent).sum())
            if nv > 0 and nc > 0:
                coss.append(round(float(vd @ cent) / (nv * nc), 6))
        want_mean = round(sum(round(c * 1e6) for c in coss)
                          / len(coss) / 1e6, 6)
        assert got[g].n_vecs == len(vecs)
        assert got[g].coherence == pytest.approx(want_mean, abs=2e-6), g
        assert got[g].min_cos == pytest.approx(min(coss), abs=2e-6), g


def test_url_ops_seeded_fuzz_never_throw(spark):
    """Random byte-ish strings through every URL operator: no exceptions,
    outputs NULL or well-formed (crash-free ingestion contract)."""
    from soda_core_spark.operators.urls import (
        canonical_url_col,
        path_template_col,
        registered_domain_col,
        url_class_col,
        url_host_col,
    )

    rng = random.Random(47)
    alphabet = string.printable
    rows = [(i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 40))))
            for i in range(300)]
    rows += [(300, None), (301, "https://"), (302, "://x"), (303, "a" * 500)]
    df = spark.createDataFrame(rows, "id long, url string")
    out = df.select(
        "id",
        canonical_url_col(F.col("url")).alias("cu"),
        url_host_col(F.col("url")).alias("h"),
        path_template_col(F.col("url")).alias("t"),
        url_class_col(F.col("url")).alias("c"),
        registered_domain_col(F.col("url")).alias("rd"),
    ).collect()
    assert len(out) == len(rows)
    classes = {"feed", "api", "media", "pagination", "tag", "category",
               "search", "auth", "date_archive", "content", None}
    for r in out:
        assert r.c in classes
        if r.cu is not None:
            assert "://" in r.cu
