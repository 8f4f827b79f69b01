"""Perceptual image dedup: dHash fingerprints + Hamming-ball join.

The multimodal twin of text near-dedup — a training pipeline dedups
images the same way it dedups documents. Composition of two existing
pieces: the REAL stdlib image decoders (functions/multimodal.py: PPM,
PNG incl. palette) run inside ``mapInPandas`` to fingerprint each image,
and the pigeonhole Hamming join (operators/dedup.py:
hamming_near_duplicates) finds all pairs within the ball exactly,
never all-pairs. No reference analogue (soda-core has no media surface);
dHash per Krawetz's difference-hash construction (public domain).

Scale shape: fingerprinting is a narrow mapInPandas pass (8 bytes out
per image — the decoded pixels never leave the executor); the join
explodes max_hamming+1 block keys per image and equi-joins, with AQE
skew-join handling giant identical-image clusters.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from soda_core_spark.functions.multimodal import (
    GIF_SIGS,
    PNG_SIG,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_ppm,
    decode_wav,
)
from soda_core_spark.operators.dedup import hamming_near_duplicates

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_image(img: np.ndarray, hash_size: int = 8) -> int:
    """64-bit difference hash of an (H, W, 3) uint8 image: grayscale,
    subsample to (hash_size, hash_size+1) by deterministic index
    mapping (``(i·dim)//n`` — no float resampling, so the value is
    reproducible bit-for-bit anywhere), then one bit per horizontal
    gradient sign. Robust to re-encoding and minor pixel noise; NOT to
    crops/rotations (dedup, not retrieval)."""
    h, w = img.shape[0], img.shape[1]
    gray = img.astype(np.uint32).sum(axis=2)  # 3× luminance, order-free
    rows = (np.arange(hash_size) * h) // hash_size
    cols = (np.arange(hash_size + 1) * w) // (hash_size + 1)
    small = gray[np.ix_(rows, cols)]
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return _to_signed64(v)


def _fingerprint_one(payload: bytes | None) -> tuple[int, bool]:
    p = payload or b""
    try:
        if p.startswith(b"P6"):
            return dhash_image(decode_ppm(p)), True
        if p.startswith(PNG_SIG):
            return dhash_image(decode_png(p)), True
        if p[:6] in GIF_SIGS:
            return dhash_image(decode_gif(p)), True
        if p.startswith(b"BM"):
            return dhash_image(decode_bmp(p)), True
    except Exception:
        pass  # malformed media → byte-hash fallback, never a crashed task
    # undecodable: exact-byte-dup semantics only (distinct content never
    # collides into one perceptual bucket)
    digest = hashlib.md5(p).digest()[:8]
    return _to_signed64(int.from_bytes(digest, "big")), False


def dhash_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, dhash, decoded) per image row — Arrow-batched, narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [_fingerprint_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "dhash": pd.Series(
                        [v for v, _ in fps], dtype="int64", index=pdf.index
                    ),
                    "decoded": [d for _, d in fps],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=DHASH_SCHEMA)


def image_near_duplicates(
    df: DataFrame,
    max_hamming: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """All image pairs within ``max_hamming`` bits of dHash — exact in
    the ball via the shared pigeonhole join. Returns
    (id_a, id_b, hamming)."""
    fps = dhash_images(df, id_col=id_col, payload_col=payload_col)
    return hamming_near_duplicates(
        fps, id_col="media_id", hash_col="dhash",
        max_hamming=max_hamming, bits=64,
    )


# ---------------------------------------------------------------------------
# Audio: energy-contour difference hash (dHash-for-audio)
# ---------------------------------------------------------------------------

AHASH_FRAMES = 65  # 64 consecutive-difference sign bits


def ahash_audio(samples: "np.ndarray") -> int:
    """64-bit difference hash of an audio clip: 65 equal frames by
    deterministic index mapping, per-frame RMS energy, one bit per
    consecutive energy increase. Gain-invariant (scaling every sample
    scales every frame energy; difference SIGNS are unchanged) and
    robust to small noise — the audio twin of :func:`dhash_image`,
    feeding the same Hamming-ball join."""
    x = samples.astype(np.float64, copy=False)
    n = x.size
    if n == 0:
        return 0
    bounds = (np.arange(AHASH_FRAMES + 1) * n) // AHASH_FRAMES
    sq = np.concatenate(([0.0], np.cumsum(x * x)))
    counts = np.maximum(bounds[1:] - bounds[:-1], 1)
    energies = (sq[bounds[1:]] - sq[bounds[:-1]]) / counts
    bits = energies[1:] > energies[:-1]
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return _to_signed64(v)


def _fingerprint_audio_one(payload: bytes | None) -> tuple[int, bool]:
    p = payload or b""
    try:
        if p.startswith(b"RIFF"):
            samples, _rate = decode_wav(p)
            return ahash_audio(samples), True
    except Exception:
        pass  # malformed media → byte-hash fallback, never a crashed task
    digest = hashlib.md5(p).digest()[:8]
    return _to_signed64(int.from_bytes(digest, "big")), False


AUDIO_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def ahash_audios(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, ahash, decoded) per audio row — Arrow-batched, narrow
    (8 bytes out per clip; PCM never leaves the executor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [_fingerprint_audio_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "ahash": pd.Series(
                        [v for v, _ in fps], dtype="int64", index=pdf.index
                    ),
                    "decoded": [d for _, d in fps],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=AUDIO_HASH_SCHEMA
    )


def audio_near_duplicates(
    df: DataFrame,
    max_hamming: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """All audio pairs within ``max_hamming`` bits of the energy-contour
    hash — exact in the ball via the shared pigeonhole join."""
    fps = ahash_audios(df, id_col=id_col, payload_col=payload_col)
    return hamming_near_duplicates(
        fps, id_col="media_id", hash_col="ahash",
        max_hamming=max_hamming, bits=64,
    )
