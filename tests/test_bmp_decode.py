"""BMP decode: round-trip vs the encoder twin, orientation, palette,
guards, and e2e dispatch through extract_features."""

import numpy as np
import pytest

from soda_core_spark.functions.multimodal import (
    decode_bmp,
    decode_features,
    make_bmp,
)


def _img(h=5, w=7, seed=13):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_round_trip_bottom_up_and_top_down():
    img = _img()
    assert np.array_equal(decode_bmp(make_bmp(img)), img)
    assert np.array_equal(decode_bmp(make_bmp(img, top_down=True)), img)


def test_bmp_row_padding_widths():
    for w in (1, 2, 3, 4, 5):  # exercises every 4-byte-alignment case
        img = _img(3, w, seed=w)
        assert np.array_equal(decode_bmp(make_bmp(img)), img)


def test_bmp_8bit_palette():
    import struct

    # 2x2 paletted image: indices 0..3 → distinct RGB entries
    pal = b""
    colors = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    for r, g, b in colors:
        pal += bytes([b, g, r, 0])  # stored BGRX
    row_bytes = (2 + 3) & ~3
    pix = bytes([0, 1]) + b"\x00" * (row_bytes - 2)
    pix += bytes([2, 3]) + b"\x00" * (row_bytes - 2)
    data_off = 54 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(pix), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 8, 0, len(pix),
                       0, 0, 4, 0)
    out = decode_bmp(hdr + info + pal + pix)
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == colors[0]
    assert tuple(out[1, 1]) == colors[3]


def test_bmp_guards():
    img = _img(2, 2)
    good = make_bmp(img)
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])  # bad magic
    with pytest.raises(ValueError):
        decode_bmp(good[:30])  # truncated header
    with pytest.raises(ValueError):
        decode_bmp(good[:-3])  # truncated pixels
    import struct

    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle))


def test_bmp_dispatch_and_fallback():
    img = _img()
    dec, feat = decode_features(make_bmp(img), "image/bmp")
    assert dec == "bmp" and feat.shape
    dec, _ = decode_features(b"BMgarbage-not-a-real-bmp", "image/bmp")
    assert dec == "hash-fallback"  # malformed → counted fallback, no crash


def test_media_dedup_catches_bmp_png_twins(spark):
    """The same pixels as BMP and PNG must land in one perceptual
    near-dup pair (dhash is format-independent once decode works)."""
    from soda_core_spark.functions.multimodal import make_png
    from soda_core_spark.operators.media_dedup import (
        dhash_images,
        image_near_duplicates,
    )

    img = _img(16, 16, seed=5)
    rows = [("a", bytes(make_bmp(img))), ("b", bytes(make_png(img)))]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    fps = {r.media_id: r for r in dhash_images(df).collect()}
    assert fps["a"].decoded and fps["b"].decoded
    assert fps["a"].dhash == fps["b"].dhash
    pairs = image_near_duplicates(df, max_hamming=2).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {("a", "b")}
