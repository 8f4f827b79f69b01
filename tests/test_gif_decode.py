"""GIF decode (functions/multimodal.py): GIF-variant LZW, interlacing,
color tables, extension skipping — stdlib + numpy only."""

import numpy as np
import pytest

from soda_core_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_gif,
    extract_features,
    make_gif,
    make_palette_png,
)


def test_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(9)
    for h, w in [(1, 1), (3, 5), (8, 8), (13, 7), (40, 33)]:
        for npal in (2, 4, 16, 200):
            pal = rng.integers(0, 256, size=(npal, 3)).astype(np.uint8)
            idx = rng.integers(0, npal, size=(h, w)).astype(np.uint8)
            for inter in (False, True):
                out = decode_gif(make_gif(idx, pal, interlaced=inter))
                assert (out == pal[idx]).all(), (h, w, npal, inter)


def test_lzw_table_growth_and_width_bumps():
    rng = np.random.default_rng(10)
    # repetitive content drives the code table through width increases
    # and (past 4096 entries) an encoder-side clear/reset
    idx = np.tile(
        np.arange(8, dtype=np.uint8).repeat(97), 30
    )[: 120 * 120].reshape(120, 120)
    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    assert (decode_gif(make_gif(idx, pal)) == pal[idx]).all()


def test_extensions_skipped_and_corruption_rejected():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, size=(5, 6)).astype(np.uint8)
    raw = bytearray(make_gif(idx, pal))
    # splice a graphic-control extension between the tables and the frame
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    insert_at = 13 + 4 * 3  # after header + global color table
    spliced = bytes(raw[:insert_at]) + gce + bytes(raw[insert_at:])
    assert (decode_gif(spliced) == pal[idx]).all()
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # no color table, no frame
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(raw[6:]))


def test_gif_feature_parity_with_png_e2e(spark):
    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, size=(32, 3)).astype(np.uint8)
    idx = rng.integers(0, 32, size=(11, 9)).astype(np.uint8)
    media = spark.createDataFrame(
        [
            ("png0", "image", bytearray(make_palette_png(idx, pal)),
             "image/png", 9, 11, None),
            ("gif0", "image", bytearray(make_gif(idx, pal)),
             "image/gif", 9, 11, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows["gif0"]["decoder"] == "gif"
    assert rows["png0"]["decoder"] == "png"
    # identical pixels through two different container formats →
    # identical features
    assert rows["gif0"]["feature"] == rows["png0"]["feature"]
