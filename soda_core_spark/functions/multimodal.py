"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, ``mapInPandas`` batch shape, partition
behaviour) is real and tested; the *decode* step is stubbed behind
``DECODERS`` because the media libraries (PIL/ffmpeg/torchaudio) are not
in this container — each stub is a deterministic fake that consumes real
bytes and emits schema-correct features, so swapping in a real decoder
changes one function, not the pipeline.

Pattern: iterator-of-batches ``mapInPandas`` so a real decoder/model loads
once per python worker (same lifecycle as functions/perplexity.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),  # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # fixed dim 16
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """STUB — deterministic stand-in for a real decode→embed step.
    Derives a 16-dim unit vector from the byte content (sha256 chunks).
    Replace with e.g. PIL.Image.open + a vision encoder; the batch
    plumbing around it stays identical."""
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    v = v / np.linalg.norm(v)
    return v


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this environment; "
        "use _fake_decode_features for plumbing tests"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """binary payload → fixed-dim feature vector, via mapInPandas.
    Arrow-batched; no shuffle (narrow transformation)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real decoder/model would be loaded HERE, once per worker
        for pdf in batches:
            feats = [
                _fake_decode_features(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "content_hash": pdf["payload"].map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes one row per sampled timestamp
    using the typed metadata (duration_ms), without decoding — the decode
    of each frame happens downstream in extract_features once a real
    decoder exists. Shows the schema/partitioning shape of the operator."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.integers(64, 512)))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 1920)) if kind != "audio" else None,
                int(rng.integers(16, 1080)) if kind != "audio" else None,
                int(rng.integers(1000, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
