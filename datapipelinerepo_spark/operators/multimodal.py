"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas functions.

The decode step (PIL/librosa/ffmpeg) is STUBBED — those libraries are
not in this container — behind ``decode_media``'s ``real=True`` path
(NotImplementedError) and a deterministic fake (``real=False``) that
derives pseudo-features from the bytes. Everything Spark-side is real
and tested: the schema, the mapInPandas plumbing, the Arrow batch
shapes, and the partitioning posture (binary payloads never shuffle —
feature extraction is map-only; only the small feature vectors move).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so
    the multimodal plumbing is exercised on real testdata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: features seeded from
    the payload digest. Same bytes → same features, everywhere."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big", signed=False)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).round(6).tolist()


def decode_media(payload: bytes, mime: str, real: bool = False) -> list[float]:
    """Decode + feature-extract one media payload.

    ``real=True`` is the production path — image/audio decode via
    PIL/librosa — not available in this container:
    """
    if real:
        raise NotImplementedError(
            "media decode requires PIL/librosa/ffmpeg (not installed); "
            "use real=False for the deterministic fake"
        )
    return _fake_features(payload)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over media batches — the Arrow
    batch boundary a real decoder would plug into. Map-only: runs where
    the payload partition lives; output is id + small feature vector, so
    any downstream shuffle moves ~1e3x less data than the payloads."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) for p in payloads],
                    "payload_sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "features": [decode_media(p, m) for p, m in zip(payloads, pdf["mime"])],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (decode stubbed). Shows the explode-shape a real frame
    sampler produces; duration-less media yields no frames."""
    return media.filter(F.col("duration_ms").isNotNull()).select(
        "media_id",
        "mime",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )


def resize_payload(
    payload: bytes, mime: str, width: int, height: int, real: bool = False
) -> bytes:
    """Resize one image payload to (width, height).

    ``real=True`` is the production path (PIL Image.resize → re-encode)
    — not available in this container; the deterministic fake derives a
    pseudo-payload from the source bytes + target box so the Spark-side
    plumbing (batch shapes, metadata propagation, determinism) is fully
    testable."""
    if real:
        raise NotImplementedError(
            "image resize requires PIL (not installed); use real=False "
            "for the deterministic fake"
        )
    seed = hashlib.sha256(payload + f":{width}x{height}".encode()).digest()
    return (seed * ((width * height * 3 // len(seed)) + 1))[: width * height * 3]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize over media batches (decode/encode stubbed,
    plumbing real): payloads transform where they live — map-only, the
    binary column never shuffles — and the metadata columns are
    rewritten to the target box. At 100 TB the resize stage pipelines
    with the scan exactly like extract_features; output payload size is
    bounded by the target box, so downstream stages shrink."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        resize_payload(p, m, width, height)
                        for p, m in zip(payloads, pdf["mime"])
                    ],
                    "mime": pdf["mime"],
                    "width": np.int64(width),
                    "height": np.int64(height),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), True),
    ]
)


def phash_payload(payload: bytes, mime: str, real: bool = False) -> int:
    """64-bit perceptual hash of one media payload.

    ``real=True`` is the production path — decode, downscale to 32×32
    gray, 2D DCT, sign-of-low-frequency-coefficients (classic pHash) —
    not available in this container. The deterministic fake derives the
    64 bits from the payload digest: same bytes → same hash everywhere,
    so the Spark-side plumbing (map-only hashing, banded Hamming join)
    is fully testable; near-miss robustness is a property of the real
    decoder, not of the join."""
    if real:
        raise NotImplementedError(
            "perceptual hash requires image decode (PIL/scipy DCT, not "
            "installed); use real=False for the deterministic fake"
        )
    digest = hashlib.sha256(payload).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def perceptual_hash(media: DataFrame) -> DataFrame:
    """mapInPandas perceptual hashing over media batches — map-only,
    the binary payload never shuffles; only (media_id, 8-byte phash)
    rows leave the scan stage. Feed the output to
    ``dedup.hamming_pairs`` for banded near-duplicate detection: the
    same candidate-generation shape as SimHash text dedup, so a 100 TB
    media corpus dedups at (id, hash) shuffle cost."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        phash_payload(p, m)
                        for p, m in zip(payloads, pdf["mime"])
                    ],
                }
            )

    return media.mapInPandas(_hash, schema=PHASH_SCHEMA)
