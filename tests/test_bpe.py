"""BPE tokenizer (functions/bpe.py)."""

from collections import Counter

from soda_core_spark.functions.bpe import (
    EOW,
    bpe_token_counts,
    bpe_tokenize,
    corpus_word_counts,
    learn_bpe_from_counts,
    segment_word,
    train_bpe,
    _ranks,
    _words,
)


def _naive_learn(word_freqs, num_merges):
    """Full-recount reference trainer (Sennrich's textbook form) —
    independent of the incremental implementation."""
    vocab = {tuple([*w, EOW]): f for w, f in word_freqs}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
        merges.append(best)
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_matches_naive_recount_trainer():
    for k in (1, 5, 10, 30):
        assert learn_bpe_from_counts(SENNRICH, k) == _naive_learn(SENNRICH, k)


def test_classic_sennrich_first_merges():
    merges = learn_bpe_from_counts(SENNRICH, 4)
    # 'es' (9) then 'est' (9) then 'est</w>' (9) are the textbook run;
    # ties at 9 resolve lexicographically: ('e','s') < ('s','t')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)


def test_segment_roundtrip_and_determinism():
    merges = learn_bpe_from_counts(SENNRICH, 8)
    ranks = _ranks(merges)
    for w in ("low", "lowest", "newest", "unseen", "wider"):
        seg = segment_word(w, ranks)
        assert "".join(seg) == w + EOW  # lossless
        assert segment_word(w, ranks) == seg  # deterministic


TEXTS = [
    (1, "low low low lower newest newest"),
    (2, "newest newest newest newest widest widest"),
    (3, "widest lower low newest"),
    (4, None),
    (5, ""),
]


def test_corpus_word_counts_exact(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    got = dict(corpus_word_counts(df))
    want = Counter()
    for _, t in TEXTS:
        want.update(_words(t))
    assert got == dict(want)


def test_distributed_counts_match_replay_across_partitionings(spark):
    df = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    merges = train_bpe(df, num_merges=6)
    merges_repart = train_bpe(df.repartition(7), num_merges=6)
    assert merges == merges_repart  # partitioning-independent training
    ranks = _ranks(merges)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_token_counts(df, merges).collect()
    }
    want = {
        i: sum(len(segment_word(w, ranks)) for w in _words(t))
        for i, t in TEXTS
    }
    assert got == want
    assert got[4] == 0 and got[5] == 0


def test_tokenize_arrays(spark):
    df = spark.createDataFrame(TEXTS[:1], ["doc_id", "text"])
    merges = learn_bpe_from_counts(SENNRICH, 8)
    ranks = _ranks(merges)
    row = bpe_tokenize(df, merges).collect()[0]
    want = []
    for w in _words(TEXTS[0][1]):
        want.extend(segment_word(w, ranks))
    assert row["bpe_token_array"] == want


def test_hypothesis_trainer_parity_and_roundtrip():
    import pytest

    pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=8,
    )
    tables = st.lists(
        st.tuples(word, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=100, deadline=None)
    @given(tables, st.integers(min_value=1, max_value=12))
    def inner(tbl, k):
        merges = learn_bpe_from_counts(tbl, k)
        assert merges == _naive_learn(tbl, k)  # incremental == recount
        ranks = _ranks(merges)
        for w, _ in tbl:
            seg = segment_word(w, ranks)
            assert "".join(seg) == w + EOW  # lossless segmentation
        # additivity: per-word segment lengths compose document counts
        doc = " ".join(w for w, _ in tbl)
        total = sum(len(segment_word(w, ranks)) for w, _ in tbl)
        assert (
            sum(len(segment_word(w, ranks)) for w in _words(doc)) == total
        )

    inner()


def test_repeated_pair_within_word_regression():
    """hypothesis-found: a pair occurring twice inside ONE word ('000')
    crashed the incremental removal with KeyError when its count hit
    zero mid-walk. Occurrence-counted removal fixes it; the merge
    sequence is the obvious one."""
    from soda_core_spark.functions.bpe import learn_bpe_from_counts

    merges = learn_bpe_from_counts([("000", 1)], 3)
    assert merges[0] == ("0", "0")
    assert len(merges) >= 2
    # and longer runs / mixed tables stay stable
    m2 = learn_bpe_from_counts([("0000", 2), ("00", 5), ("ab", 1)], 5)
    assert m2[0] == ("0", "0")
