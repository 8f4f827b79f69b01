"""winnow_fingerprints: python twin, the w+k-1 guarantee, cap, hashes."""

import hashlib
import random

from soda_core_spark.operators.dedup import winnow_fingerprints


def _phash(s: str) -> int:
    """Twin of portable_token_hash: first 15 hex digits of md5, base 16."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _twin(docs, k=5, w=4, min_shared=1, cap=None):
    """docs: {doc_id: text}. Mirrors the operator's selection exactly:
    per-window minima over the gram-hash stream, one fingerprint for
    short docs, distinct per doc, capped inverted-index pairs."""
    fps = {}
    for did, text in docs.items():
        words = [x for x in text.lower().split() if x]
        grams = [
            " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
        ]
        hs = [_phash(g) for g in grams]
        if not hs:
            continue
        if len(hs) < w:
            sel = {min(hs)}
        else:
            sel = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
        fps[did] = sel
    posting = {}
    for did, sel in fps.items():
        for f in sel:
            posting.setdefault(f, set()).add(did)
    pairs = {}
    for f, dids in posting.items():
        if len(dids) < 2 or (cap is not None and len(dids) > cap):
            continue
        ds = sorted(dids)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs[(ds[i], ds[j])] = pairs.get((ds[i], ds[j]), 0) + 1
    out = {}
    for (a, b), shared in pairs.items():
        if shared < min_shared:
            continue
        na, nb = len(fps[a]), len(fps[b])
        out[(a, b)] = (shared, na, nb, round(shared / min(na, nb), 6))
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    rows = winnow_fingerprints(df, hash="portable", **kw).collect()
    return {
        (r["doc_a"], r["doc_b"]): (
            r["shared_fps"],
            r["fp_a"],
            r["fp_b"],
            r["containment"],
        )
        for r in rows
    }


def test_guarantee_shared_run_detected(spark):
    # k=5, w=4: any common run of >= 8 tokens must collide. The shared
    # passage is 9 tokens inside otherwise-disjoint documents.
    passage = "the quick brown fox jumps over the lazy dog"
    docs = {
        1: "alpha beta gamma delta " + passage + " epsilon zeta",
        2: "one two three four five " + passage + " six seven eight",
        3: "totally unrelated words nothing shared here at all today",
    }
    got = _run(spark, docs, min_shared=1)
    assert (1, 2) in got and got[(1, 2)][0] >= 1
    assert not any(3 in p for p in got)


def test_short_exact_duplicates_still_pair(spark):
    # 5 tokens < w+k-1: single-fingerprint path keeps them joinable
    docs = {1: "buy cheap pills online now", 2: "buy cheap pills online now"}
    got = _run(spark, docs, min_shared=1)
    assert got[(1, 2)] == (1, 1, 1, 1.0)


def test_below_k_tokens_no_fingerprints(spark):
    docs = {1: "too short", 2: "too short", 3: ""}
    got = _run(spark, docs, min_shared=1)
    assert got == {}


def test_posting_cap_drops_boilerplate(spark):
    # identical boilerplate-only docs: every selected fingerprint occurs
    # in all 5 docs; cap=4 removes them all, so no pairs survive
    bp = "click here to subscribe to our newsletter today friends"
    docs = {i: bp for i in range(1, 6)}
    assert _run(spark, docs, min_shared=1, max_doc_freq=4) == {}
    capped = _run(spark, docs, min_shared=1, max_doc_freq=None)
    assert len(capped) == 10  # all 5-choose-2 pairs without the cap


def test_random_twin(spark):
    rng = random.Random(1234)
    vocab = [f"tok{i}" for i in range(60)]
    docs = {}
    shared_runs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(8, 14)))
        for _ in range(4)
    ]
    for did in range(1, 25):
        parts = [
            rng.choice(vocab) for _ in range(rng.randrange(0, 20))
        ]
        if rng.random() < 0.6:
            parts.append(rng.choice(shared_runs))
        parts += [rng.choice(vocab) for _ in range(rng.randrange(0, 10))]
        docs[did] = " ".join(parts)
    got = _run(spark, docs, min_shared=1)
    want = _twin(docs, min_shared=1, cap=1000)
    assert got == want


def test_xxhash_path_same_pair_set(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(40)]
    run = " ".join(rng.choice(vocab) for _ in range(10))
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(12))
        + (" " + run if i % 2 == 0 else "")
        for i in range(1, 13)
    }
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    p = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_fingerprints(df, hash="portable").collect()
    }
    x = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_fingerprints(df, hash="xxhash64").collect()
    }
    # different hash family -> different minima may be SELECTED, but the
    # guarantee holds for both: every >=8-token-run pair must be present
    evens = sorted(i for i in docs if i % 2 == 0)
    for i in range(len(evens)):
        for j in range(i + 1, len(evens)):
            assert (evens[i], evens[j]) in p
            assert (evens[i], evens[j]) in x
