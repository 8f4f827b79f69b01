"""Perceptual image dedup: dHash python-oracle + Hamming-join e2e."""

import numpy as np
import pytest


def _noisy_copy(img: np.ndarray, seed: int, flips: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = img.copy()
    for _ in range(flips):
        y, x = rng.integers(0, img.shape[0]), rng.integers(0, img.shape[1])
        out[y, x] = (out[y, x].astype(int) + rng.integers(1, 5)) % 256
    return out


def test_dhash_properties():
    from soda_core_spark.operators.media_dedup import dhash_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    h = dhash_image(img)
    assert isinstance(h, int) and -(2**63) <= h < 2**63
    # deterministic
    assert dhash_image(img.copy()) == h
    # tiny pixel noise: small Hamming distance
    noisy = _noisy_copy(img, seed=4)
    d = bin((h ^ dhash_image(noisy)) & ((1 << 64) - 1)).count("1")
    assert d <= 4, d
    # a different random image: large distance
    other = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    d2 = bin((h ^ dhash_image(other)) & ((1 << 64) - 1)).count("1")
    assert d2 > 10, d2


def test_image_near_duplicates_e2e(spark):
    from soda_core_spark.functions.multimodal import (
        make_palette_png,
        make_png,
        make_ppm,
        decode_ppm,
    )
    from soda_core_spark.operators.media_dedup import (
        dhash_images,
        image_near_duplicates,
    )

    rng = np.random.default_rng(11)
    base = decode_ppm(make_ppm(40, 40, seed=5))
    rows = [
        ("a", bytes(make_png(base))),                       # original (PNG)
        ("b", bytes(make_ppm(40, 40, seed=5))),             # same pixels, PPM
        ("c", bytes(make_png(_noisy_copy(base, seed=6)))),  # near-dup
        ("d", bytes(make_png(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)))),  # distinct
        ("e", b"\x00\x01garbage-not-an-image"),             # undecodable
        ("f", b"\x00\x01garbage-not-an-image"),             # byte-identical to e
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])

    fps = {r["media_id"]: (r["dhash"], r["decoded"])
           for r in dhash_images(df).collect()}
    # format-independent: PNG and PPM of the SAME pixels hash identically
    assert fps["a"][0] == fps["b"][0] and fps["a"][1] and fps["b"][1]
    assert fps["e"][1] is False and fps["f"][1] is False
    assert fps["e"][0] == fps["f"][0]  # byte-identical fallback collides

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_duplicates(df, max_hamming=4).collect()}
    assert pairs[("a", "b")] == 0
    assert ("a", "c") in pairs and pairs[("a", "c")] <= 4
    assert ("e", "f") in pairs and pairs[("e", "f")] == 0
    assert not any("d" in p for p in pairs)

    # python-oracle cross-check of every reported distance
    from soda_core_spark.operators.media_dedup import _fingerprint_one

    py = {mid: _fingerprint_one(p)[0] for mid, p in rows}
    for (ia, ib), ham in pairs.items():
        d = bin((py[ia] ^ py[ib]) & ((1 << 64) - 1)).count("1")
        assert d == ham, (ia, ib)


def test_simhash_still_green_after_refactor(spark):
    """hamming_near_duplicates was factored out of simhash_near_duplicates;
    pin that the text path still finds the planted near-pair."""
    from soda_core_spark.operators.dedup import simhash_near_duplicates

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, base),
        (2, base.replace("tok7", "tok7x")),
        (3, "completely different text about rivers and gardens entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_near_duplicates(df, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
