"""Adam7-interlaced PNG decode (functions/multimodal.py)."""

import numpy as np

from soda_core_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_png,
    extract_features,
    make_interlaced_png,
    make_png,
)


def test_adam7_roundtrip_sizes_and_filters():
    rng = np.random.default_rng(11)
    # sizes straddling every pass-grid edge case (passes that vanish,
    # single-pixel rows/cols, multiples of 8)
    for h, w in [(1, 1), (1, 9), (9, 1), (2, 3), (5, 9), (8, 8), (13, 7),
                 (16, 16), (33, 31)]:
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png(make_interlaced_png(img)) == img).all(), (h, w)
        for f in range(5):
            assert (
                decode_png(make_interlaced_png(img, filters=[f])) == img
            ).all(), (h, w, f)
    # RGBA and grayscale channel handling match the plain path
    rgba = rng.integers(0, 256, size=(6, 5, 4)).astype(np.uint8)
    assert (
        decode_png(make_interlaced_png(rgba))
        == decode_png(make_png(rgba))
    ).all()
    gray = rng.integers(0, 256, size=(6, 5, 1)).astype(np.uint8)
    assert (
        decode_png(make_interlaced_png(gray))
        == decode_png(make_png(gray))
    ).all()


def test_adam7_feature_parity_e2e(spark):
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(12, 10, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        [
            ("plain", "image", bytearray(make_png(img)), "image/png",
             10, 12, None),
            ("adam7", "image", bytearray(make_interlaced_png(img)),
             "image/png", 10, 12, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows["adam7"]["decoder"] == "png"
    assert rows["adam7"]["feature"] == rows["plain"]["feature"]


def test_16bit_png_decodes_high_bytes():
    from soda_core_spark.functions.multimodal import make_png16

    rng = np.random.default_rng(13)
    img16 = rng.integers(0, 65536, size=(9, 7, 3)).astype(np.uint16)
    want = (img16 >> 8).astype(np.uint8)
    assert (decode_png(make_png16(img16)) == want).all()
    for f in range(5):
        assert (decode_png(make_png16(img16, filters=[f])) == want).all(), f
    # 16-bit grayscale replicates like the 8-bit path
    g16 = rng.integers(0, 65536, size=(4, 5, 1)).astype(np.uint16)
    out = decode_png(make_png16(g16))
    assert (out == np.repeat((g16 >> 8).astype(np.uint8), 3, axis=2)).all()


def test_sub8bit_png_grayscale_and_palette():
    from soda_core_spark.functions.multimodal import make_png_lowdepth

    rng = np.random.default_rng(5)
    for d in (1, 2, 4):
        s = rng.integers(0, 1 << d, size=(7, 13)).astype(np.uint8)
        want = np.repeat(
            (s * (255 // ((1 << d) - 1)))[:, :, None], 3, axis=2
        )
        for f in range(5):
            got = decode_png(make_png_lowdepth(s, d, filters=[f]))
            assert (got == want).all(), (d, f)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(6, 9)).astype(np.uint8)
    assert (decode_png(make_png_lowdepth(idx, 4, palette=pal)) == pal[idx]).all()
    # 1-bit with a 2-entry palette (classic favicon mask shape)
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    m = rng.integers(0, 2, size=(16, 16)).astype(np.uint8)
    assert (decode_png(make_png_lowdepth(m, 1, palette=pal2)) == pal2[m]).all()
