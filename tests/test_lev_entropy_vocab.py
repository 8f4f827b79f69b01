"""Tests for the round-5 additions: levenshtein_verify_pairs,
cross_source_duplication (operators/dedup.py) and char_entropy,
vocab_stats (operators/profiling.py)."""

import math

from soda_core_spark.operators.dedup import (
    cross_source_duplication,
    levenshtein_verify_pairs,
)
from soda_core_spark.operators.profiling import char_entropy, vocab_stats


def _py_lev(a: bytes, b: bytes) -> int:
    """Plain-Python reference Levenshtein over bytes."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


class TestLevenshteinVerifyPairs:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_matches_python_reference(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, base, "en"),
            (2, base.replace("lazy", "hazy"), "en"),
            (3, base + " extra tail words here", "en"),
            (4, "completely different text that shares no prefix", "en"),
        ]
        out = {
            (r.doc_a, r.doc_b): (r.lev, r.similarity)
            for r in levenshtein_verify_pairs(
                self._df(spark, rows), min_similarity=0.5
            ).collect()
        }
        texts = {i: t for i, t, _ in rows}
        assert (1, 2) in out and (1, 3) in out and (2, 3) in out
        for (a, b), (lev, sim) in out.items():
            xa = texts[a].encode(), texts[b].encode()
            exp = _py_lev(*xa)
            assert lev == exp
            assert sim == round(1.0 - exp / max(len(xa[0]), len(xa[1]), 1), 6)

    def test_unicode_bytes_semantics(self, spark):
        # é is 2 UTF-8 bytes: replacing e->é costs 2 byte edits; the
        # difference sits past the 16-char block prefix so the pair forms
        rows = [(1, "lattes are great at the caf e downtown", "fr"),
                (2, "lattes are great at the caf é downtown", "fr")]
        r = levenshtein_verify_pairs(
            self._df(spark, rows), min_similarity=0.5
        ).collect()
        assert len(r) == 1 and r[0].lev == 2

    def test_threshold_and_prefilter(self, spark):
        # same block prefix, wildly different lengths: the JVM-side
        # length prefilter must drop the pair before the UDF
        rows = [(1, "shared prefix here then short", "en"),
                (2, "shared prefix here then " + "long " * 80, "en")]
        assert levenshtein_verify_pairs(
            self._df(spark, rows), min_similarity=0.8
        ).count() == 0

    def test_block_cap(self, spark):
        rows = [(i, "identical text for everyone", "en") for i in range(10)]
        out = levenshtein_verify_pairs(
            self._df(spark, rows), max_block=3, min_similarity=0.8
        ).collect()
        # capped at 3 lowest ids -> C(3,2)=3 pairs, all lev 0
        assert len(out) == 3
        assert {(r.doc_a, r.doc_b) for r in out} == {(0, 1), (0, 2), (1, 2)}
        assert all(r.lev == 0 and r.similarity == 1.0 for r in out)

    def test_group_isolation(self, spark):
        rows = [(1, "same words exactly", "en"), (2, "same words exactly", "de")]
        assert levenshtein_verify_pairs(
            self._df(spark, rows), min_similarity=0.5
        ).count() == 0


class TestCrossSourceDuplication:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_overlap_matrix(self, spark):
        rows = [
            (1, "alpha doc", "A"), (2, "beta doc", "A"), (3, "gamma doc", "A"),
            (4, "alpha doc", "B"), (5, "beta doc", "B"),
            (6, "delta doc", "B"), (7, "unique c", "C"),
        ]
        out = cross_source_duplication(self._df(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.source_a, r.source_b) == ("A", "B")
        assert r.shared_fps == 2 and r.fps_a == 3 and r.fps_b == 3
        assert r.overlap_a == r.overlap_b == round(2 / 3, 6)

    def test_whitespace_case_normalization(self, spark):
        rows = [(1, "Same   Text\nHere", "A"), (2, "same text here", "B")]
        out = cross_source_duplication(self._df(spark, rows)).collect()
        assert len(out) == 1 and out[0].shared_fps == 1

    def test_hot_fingerprint_cap(self, spark):
        # boilerplate in every source is dropped above the cap
        rows = [(i, "boilerplate footer", f"s{i}") for i in range(5)]
        rows += [(100, "real shared", "s0"), (101, "real shared", "s1")]
        out = cross_source_duplication(
            self._df(spark, rows), max_sources_per_fp=3
        ).collect()
        assert {(r.source_a, r.source_b) for r in out} == {("s0", "s1")}
        assert out[0].shared_fps == 1
        # inventories exclude the capped fingerprint
        assert out[0].fps_a == 1 and out[0].fps_b == 1


class TestCharEntropy:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_known_values(self, spark):
        rows = [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, None)]
        out = {r.doc_id: r for r in char_entropy(self._df(spark, rows)).collect()}
        assert out[1].entropy_bits == 0.0 and out[1].n_cp == 4
        assert out[1].distinct_cp == 1
        assert out[2].entropy_bits == 1.0
        assert out[3].entropy_bits == 2.0 and out[3].distinct_cp == 4
        for i in (4, 5):
            assert out[i].n_cp == 0 and out[i].distinct_cp == 0
            assert out[i].entropy_bits == 0.0

    def test_code_points_not_bytes(self, spark):
        # 4 distinct code points, uniform -> 2 bits even though UTF-8
        # lengths differ per char
        out = char_entropy(self._df(spark, [(1, "aé好𝄞")])).collect()[0]
        assert out.n_cp == 4 and out.distinct_cp == 4
        assert out.entropy_bits == 2.0

    def test_skewed_distribution(self, spark):
        t = "aab"
        exp = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
        out = char_entropy(self._df(spark, [(1, t)])).collect()[0]
        assert abs(out.entropy_bits - round(exp, 6)) < 1e-9


class TestVocabStats:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_counts(self, spark):
        rows = [
            (1, "the cat sat on the mat", "A"),
            (2, "the dog", "A"),
            (3, "x x x x", "B"),
        ]
        out = {r.group: r for r in vocab_stats(self._df(spark, rows)).collect()}
        a = out["A"]
        # tokens: the cat sat on the mat the dog -> 8; vocab 6; hapax 5
        assert a.n_tokens == 8 and a.vocab_size == 6 and a.hapax_count == 5
        assert a.ttr == round(6 / 8, 6) and a.hapax_ratio == round(5 / 6, 6)
        b = out["B"]
        assert b.n_tokens == 4 and b.vocab_size == 1 and b.hapax_count == 0
        assert b.ttr == 0.25 and b.hapax_ratio == 0.0

    def test_empty_group_zeroes(self, spark):
        rows = [(1, "words here", "A"), (2, "   ", "B"), (3, None, "B")]
        out = {r.group: r for r in vocab_stats(self._df(spark, rows)).collect()}
        b = out["B"]
        assert b.n_tokens == 0 and b.vocab_size == 0 and b.hapax_count == 0
        assert b.ttr == 0.0 and b.hapax_ratio == 0.0

    def test_lowercasing(self, spark):
        rows = [(1, "The THE the", "A")]
        out = vocab_stats(self._df(spark, rows)).collect()[0]
        assert out.n_tokens == 3 and out.vocab_size == 1
