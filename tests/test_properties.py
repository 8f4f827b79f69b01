"""Property-based tests (hypothesis) for the pure-Python layers —
a testing layer the reference doesn't have (SURVEY §5: no property
testing upstream)."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from soda_core_spark.functions.scrub import SCRUB_RULES, scrub_text
from soda_core_spark.plans.model import Threshold
from soda_core_spark.sources.webtext_oracle import _langid, _signals

finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


class TestThresholdProperties:
    @given(a=finite, b=finite, v=finite)
    def test_between_is_inclusive_conjunction(self, a, b, v):
        lo, hi = min(a, b), max(a, b)
        t = Threshold(must_be_between=(lo, hi))
        assert t.passes(v) == (lo <= v <= hi)

    @given(a=finite, b=finite, v=finite)
    def test_not_between_is_complement_of_open_interval(self, a, b, v):
        lo, hi = min(a, b), max(a, b)
        t = Threshold(must_be_not_between=(lo, hi))
        assert t.passes(v) == (not (lo < v < hi))

    @given(v=finite)
    def test_no_threshold_passes_everything(self, v):
        assert Threshold().passes(v)
        assert not Threshold().is_configured()

    @given(x=finite, v=finite)
    def test_gt_lt_partition(self, x, v):
        """For any pivot x, exactly one of >x, <x, ==x passes."""
        outcomes = [
            Threshold(must_be_greater_than=x).passes(v),
            Threshold(must_be_less_than=x).passes(v),
            Threshold(must_be=x).passes(v),
        ]
        assert sum(outcomes) == 1


_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,@-+()\n\t!#",
    max_size=400,
)
_EMAIL_RE = re.compile(SCRUB_RULES[0][1])
_SSN_RE = re.compile(SCRUB_RULES[1][1])


class TestScrubProperties:
    @given(t=_TEXT)
    @settings(max_examples=300)
    def test_no_email_survives(self, t):
        out = scrub_text(t)
        assert _EMAIL_RE.search(out) is None

    @given(t=_TEXT)
    @settings(max_examples=300)
    def test_replacements_only_shrink_digit_runs(self, t):
        """Scrub tokens contain no digits/@, so scrubbing can never
        introduce new PII material."""
        out = scrub_text(t)
        assert out.count("@") <= t.count("@")
        assert sum(c.isdigit() for c in out) <= sum(c.isdigit() for c in t)

    @given(local=st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10),
           domain=st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10))
    def test_every_generated_email_is_caught(self, local, domain):
        t = f"write to {local}@{domain}.org today"
        assert f"{local}@{domain}.org" not in scrub_text(t)


class TestSignalProperties:
    @given(t=_TEXT)
    @settings(max_examples=300)
    def test_signal_invariants(self, t):
        s = _signals(t)
        assert s["n_chars"] == len(t)
        assert 0 <= s["n_words"] <= max(1, s["n_chars"])
        assert 0.0 <= s["alnum_ratio"] <= 1.0
        assert 0.0 <= s["stopword_density"] <= 1.0
        assert 0.0 <= s["bigram_repetition"] < 1.0 or s["n_words"] < 2
        assert s["mean_word_length"] >= 0.0

    @given(t=_TEXT)
    @settings(max_examples=200)
    def test_langid_conf_bounds(self, t):
        pred, conf = _langid(t)
        assert 0.0 <= conf <= 1.0
        assert (pred == "und") == (conf <= 0.0)


class TestChunkingProperties:
    """Pure-Python model of operators/chunking.py arithmetic — the Spark
    operator is cross-checked against DuckDB in test_oracle_parity (q41);
    these pin the chunk-count/coverage algebra over the whole input space."""

    @staticmethod
    def _starts(k: int, chunk: int, stride: int) -> list[int]:
        if k <= 0:
            return []
        if k <= chunk:
            return [0]
        n = 1 + -(-(k - chunk) // stride)  # 1 + ceil((k-chunk)/stride)
        return [i * stride for i in range(n)]

    @given(
        k=st.integers(min_value=0, max_value=5000),
        chunk=st.integers(min_value=1, max_value=600),
        data=st.data(),
    )
    def test_windows_cover_every_token_and_respect_bounds(self, k, chunk, data):
        stride = data.draw(st.integers(min_value=1, max_value=chunk))
        starts = self._starts(k, chunk, stride)
        if k == 0:
            assert starts == []
            return
        covered = set()
        for s in starts:
            assert 0 <= s < k  # every window starts inside the doc
            covered.update(range(s, min(s + chunk, k)))
        assert covered == set(range(k))  # full coverage, no token dropped
        # consecutive windows overlap by exactly chunk - stride (except
        # possibly the tail, which may overlap more)
        for a, b in zip(starts, starts[1:]):
            assert b - a == stride

    @given(
        k=st.integers(min_value=1, max_value=5000),
        chunk=st.integers(min_value=1, max_value=600),
    )
    def test_stride_equals_chunk_is_exact_partition(self, k, chunk):
        starts = self._starts(k, chunk, chunk)
        lens = [min(s + chunk, k) - s for s in starts]
        assert sum(lens) == k  # disjoint cover


class TestSelectorProperties:
    @given(
        field=st.sampled_from(["type", "name", "column", "path", "qualifier"]),
        value=st.text(
            alphabet=string.ascii_letters + string.digits + "_-./*?",
            min_size=1,
            max_size=30,
        ),
    )
    def test_parse_roundtrip(self, field, value):
        from soda_core_spark.plans.selectors import CheckSelector

        s = CheckSelector.parse(f"{field}={value}")
        assert (s.field, s.value) == (field, value)

    @given(
        items=st.lists(
            st.text(
                alphabet=string.ascii_letters + string.digits + "_- ",
                min_size=1,
                max_size=10,
            ).map(str.strip).filter(bool),
            min_size=1,
            max_size=5,
        )
    )
    def test_list_value_roundtrip(self, items):
        from soda_core_spark.plans.selectors import _parse_list_value

        rendered = "[" + ",".join(items) + "]"
        assert _parse_list_value(rendered) == items

    @given(
        value=st.text(
            alphabet=string.ascii_letters + string.digits + "[]()+.^$",
            max_size=30,
        )
    )
    def test_literal_bracket_never_globs(self, value):
        """'[' must be literal in selector values — a value equal to the
        check value always matches itself, whatever regex/glob chars it
        contains (only * and ? are magic)."""
        from soda_core_spark.plans.selectors import _values_match

        if "*" not in value and "?" not in value:
            assert _values_match(value, value)


class TestPngCodecProperties:
    """Round-3 stdlib PNG codec: encode∘decode == identity for every
    image shape / channel count / filter choice in the supported space."""

    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        channels=st.sampled_from([1, 3, 4]),
        filt=st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_identity(self, h, w, channels, filt, seed):
        import numpy as np

        from soda_core_spark.functions.multimodal import decode_png, make_png

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
        payload = make_png(img, filters=None if filt is None else [filt])
        out = decode_png(payload)
        if channels == 3:
            assert np.array_equal(out, img)
        elif channels == 4:
            assert np.array_equal(out, img[:, :, :3])
        else:
            assert np.array_equal(out, np.repeat(img, 3, axis=2))

    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        n_colors=st.integers(min_value=1, max_value=256),
        filt=st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_palette_roundtrip_identity(self, h, w, n_colors, filt, seed):
        """Round-4 indexed-color path: decode(make_palette_png(idx, pal))
        == pal[idx] for every shape / palette size / filter, and equals
        the RGB path on identical pixels."""
        import numpy as np

        from soda_core_spark.functions.multimodal import (
            decode_png,
            make_palette_png,
            make_png,
        )

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
        idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
        payload = make_palette_png(idx, pal, filters=None if filt is None else [filt])
        out = decode_png(payload)
        assert np.array_equal(out, pal[idx])
        # feature parity with the RGB encoding of the same pixels
        assert np.array_equal(out, decode_png(make_png(pal[idx])))

    @given(junk=st.binary(min_size=0, max_size=64))
    @settings(max_examples=40, deadline=None)
    def test_garbage_never_decodes_silently(self, junk):
        import pytest as _pytest

        from soda_core_spark.functions.multimodal import PNG_SIG, decode_png

        with _pytest.raises(Exception):
            decode_png(PNG_SIG + junk)


class TestDatasetIdentifierProperties:
    @given(
        parts=st.lists(
            st.text(
                alphabet=string.ascii_lowercase + string.digits + "_",
                min_size=1,
                max_size=8,
            ),
            min_size=2,
            max_size=5,
        )
    )
    def test_parse_to_string_roundtrip(self, parts):
        from soda_core_spark.plans.model import DatasetIdentifier

        raw = "/".join(parts)
        d = DatasetIdentifier.parse(raw)
        assert d.to_string() == raw
        assert d.data_source_name == parts[0]
        assert list(d.prefixes) == parts[1:-1]
        assert d.dataset_name == parts[-1]
        assert d.spark_name == ".".join(parts[1:])

    @given(
        name=st.text(
            alphabet=string.ascii_lowercase + string.digits + "._",
            min_size=1,
            max_size=20,
        )
    )
    def test_plain_names_stay_opaque(self, name):
        from soda_core_spark.plans.model import DatasetIdentifier

        d = DatasetIdentifier.parse(name)
        assert d.data_source_name is None
        assert d.spark_name == name == d.to_string()


class TestCheckRelativePathProperties:
    @given(
        column=st.one_of(
            st.none(),
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
        ),
        qualifier=st.one_of(
            st.none(),
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
        ),
        ctype=st.sampled_from(["missing", "invalid", "row_count"]),
    )
    def test_shape_matches_reference_grammar(self, column, qualifier, ctype):
        from soda_core_spark.plans.model import CheckSpec
        from soda_core_spark.plans.selectors import check_relative_path

        p = check_relative_path(
            CheckSpec(type=ctype, column=column, qualifier=qualifier)
        )
        parts = p.split(".")
        expect = (["columns", column] if column else []) + ["checks", ctype]
        if qualifier:
            expect.append(qualifier)
        assert parts == expect
