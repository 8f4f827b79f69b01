"""Top-n-gram signal, incremental dedup, audio fingerprint dedup."""

import numpy as np

from pyspark.sql import functions as F


def test_top_ngram_char_fractions_hand_values(spark):
    from soda_core_spark.functions.text import top_ngram_char_fractions

    rows = [
        # "buy now buy now buy now" → top bigram "buy now" count 3 (len 7),
        # top trigram "buy now buy" count 2 vs "now buy now" count 2 →
        # tie breaks gram-asc → "buy now buy" (len 11); chars = 23
        (1, "buy now buy now buy now"),
        (2, "one two"),       # single bigram, no trigram row
        (3, "solo"),          # no rows at all
        (4, None),            # no rows
        (5, "MiXed miXED mixed"),  # lowered: top bigram "mixed mixed" x2
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["doc_id"], r["n"]): (
            r["top_ngram"],
            r["top_ngram_count"],
            r["top_ngram_char_frac"],
        )
        for r in top_ngram_char_fractions(df, ns=(2, 3)).collect()
    }
    assert out[(1, 2)] == ("buy now", 3, min(1.0, 3 * 7 / 23))
    assert out[(1, 3)] == ("buy now buy", 2, min(1.0, 2 * 11 / 23))
    assert out[(2, 2)] == ("one two", 1, 1.0)
    assert (2, 3) not in out
    assert not any(d in (3, 4) for d, _ in out)
    assert out[(5, 2)][0] == "mixed mixed"
    assert out[(5, 2)][1] == 2


def test_incremental_exact_dedup(spark):
    from soda_core_spark.operators.dedup import (
        corpus_fingerprints,
        incremental_exact_dedup,
    )

    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], ["doc_id", "text"]
    )
    seen = corpus_fingerprints(old)
    new = spark.createDataFrame(
        [
            (10, "ALPHA   text"),   # dup of old #1 after normalization
            (11, "gamma text"),     # fresh
            (12, "gamma text"),     # in-batch dup of 11 → min id wins
            (13, "delta text"),     # fresh
        ],
        ["doc_id", "text"],
    )
    surv = sorted(
        r["doc_id"] for r in incremental_exact_dedup(new, seen).collect()
    )
    assert surv == [11, 13]
    # survivors keep full rows
    cols = incremental_exact_dedup(new, seen).columns
    assert cols == ["doc_id", "text"]


def test_audio_near_duplicates_e2e(spark):
    from soda_core_spark.functions.multimodal import decode_wav, make_wav
    from soda_core_spark.operators.media_dedup import (
        ahash_audio,
        audio_near_duplicates,
    )
    import io
    import wave

    def reencode_gain(payload: bytes, gain: float) -> bytes:
        x, rate = decode_wav(payload)
        pcm = np.clip(x * gain * 32767.0, -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(pcm.tobytes())
        return buf.getvalue()

    a = make_wav(800, seed=7)
    rows = [
        ("a", a),
        ("b", reencode_gain(a, 0.5)),        # same clip, quieter
        ("c", make_wav(800, seed=123)),      # different clip
        ("d", b"RIFFbroken"),                # malformed → fallback
        ("e", b"RIFFbroken"),                # byte-identical fallback twin
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_duplicates(df, max_hamming=4).collect()
    }
    assert pairs[("a", "b")] <= 2  # quantization may flip a bit or two
    assert ("e", "d") in pairs or ("d", "e") in pairs
    assert not any("c" in p for p in pairs)

    # python-oracle: spark-reported hamming equals local recompute
    x, _ = decode_wav(a)
    y, _ = decode_wav(reencode_gain(a, 0.5))
    local = bin(
        (ahash_audio(x) ^ ahash_audio(y)) & ((1 << 64) - 1)
    ).count("1")
    assert pairs[("a", "b")] == local


def test_trigram_lm_training_matches_import_time_model(spark):
    """Train on the embedded seed corpus AS ONE DOCUMENT via the Spark
    job; the resulting dense table must match the import-time _TABLE
    the scorer gathers from (same counts, same smoothing) — training
    and scoring are one closed loop."""
    import numpy as np

    from soda_core_spark.functions import perplexity as P

    df = spark.createDataFrame([(1, P._SEED_CORPUS)], ["doc_id", "text"])
    rows = P.train_char_trigram_lm(df).collect()
    table = P.lm_table_from_rows(rows)
    assert np.allclose(table, P._TABLE, atol=1e-12)


def test_trigram_lm_training_boundaries(spark):
    """Trigrams never cross documents; short/NULL docs contribute
    nothing; counts and smoothing match a hand computation."""
    import math

    from soda_core_spark.functions.perplexity import train_char_trigram_lm

    df = spark.createDataFrame(
        [(1, "abab"), (2, "ab"), (3, None), (4, "ba!b")], ["doc_id", "text"]
    )
    # doc1 body "abab": aba, bab ; doc4 body "ba b": "ba ", "a b"
    got = {
        r["trigram"]: (r["cnt"], r["ctx_cnt"], r["logp"])
        for r in train_char_trigram_lm(df).collect()
    }
    assert set(got) == {"aba", "bab", "ba ", "a b"}
    assert got["aba"][0] == 1 and got["aba"][1] == 1
    assert abs(got["aba"][2] - math.log(1.1 / (1 + 0.1 * 27))) < 1e-9


def test_incremental_minhash_dedup(spark):
    """A new doc near-identical to a historical one is dropped via the
    band probe; a genuinely new doc survives; empty docs survive."""
    from soda_core_spark.operators.dedup import (
        corpus_band_keys,
        incremental_minhash_dedup,
    )

    base = " ".join(f"tok{i}" for i in range(80))
    old = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    seen = corpus_band_keys(old, num_hashes=16, bands=4)
    new = spark.createDataFrame(
        [
            (10, base.replace("tok7 ", "tok7x ")),  # near-dup of history
            (11, "completely different text about rivers and gardens"),
            (12, ""),                                # no shingles: kept
        ],
        ["doc_id", "text"],
    )
    surv = sorted(
        r["doc_id"]
        for r in incremental_minhash_dedup(
            new, seen, num_hashes=16, bands=4
        ).collect()
    )
    assert surv == [11, 12]
