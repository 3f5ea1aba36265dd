"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs over
mapInPandas. The decode kernels themselves are STUBBED (no image/audio
libraries in this container — clearly marked below); the Spark-side contract
— schema, batch shape, partition sizing — is real and tested.

Scale notes: binary payloads inflate row size, so media stages repartition by
size (bytes-aware) before the UDF and keep
spark.sql.execution.arrow.maxRecordsPerBatch low enough that a batch of
payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),       # png|jpeg|wav|mp4...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def _decode_image(payload: bytes, fmt: str | None) -> np.ndarray:
    """STUB: real deployments decode via PIL/libvips here. This container has
    no imaging libraries, so we derive a deterministic fake pixel block from
    the payload digest — keeping the UDF signature, batch shape and feature
    contract real."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).reshape(4, 8).astype(np.float32)


def extract_media_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item feature vector + content hash.

    The feature extractor runs per Arrow batch; payload bytes arrive zero-copy
    through Arrow. Swap _decode_image for a real decoder on a real cluster."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, nbytes, shas, feats = [], [], [], []
            for rec in batch.itertuples(index=False):
                payload = bytes(rec.payload)
                block = _decode_image(payload, (rec.meta or {}).get("format"))
                vec = block.mean(axis=0)
                vec = np.resize(vec, feature_dim) / 255.0
                ids.append(rec.media_id)
                nbytes.append(len(payload))
                shas.append(hashlib.sha256(payload).hexdigest())
                feats.append(vec.astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": nbytes,
                    "content_sha": shas,
                    "features": feats,
                }
            )

    return media.mapInPandas(_map, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per sampled
    frame offset (the decode itself is stubbed — offsets are computed from
    metadata, which IS real).

    Output: (media_id, frame_index, offset_ms, frame_payload)."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_index", IntegerType(), False),
            StructField("offset_ms", LongType(), False),
            StructField("frame_payload", BinaryType(), False),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                meta = rec.meta or {}
                duration = meta.get("duration_ms") or 0
                payload = bytes(rec.payload)
                for i, off in enumerate(range(0, int(duration), every_ms)):
                    # STUB: a real decoder seeks to `off` and decodes a frame;
                    # we emit a deterministic digest block instead.
                    fake = hashlib.blake2b(
                        payload + off.to_bytes(8, "big"), digest_size=16
                    ).digest()
                    rows.append((rec.media_id, i, off, fake))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "offset_ms", "frame_payload"]
            )

    return media.mapInPandas(_map, schema=schema)


def make_synthetic_media(spark, n: int = 50) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks (no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(f"media{i}".encode(), digest_size=64).digest()
        mtype = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                payload,
                {
                    "media_type": mtype,
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[mtype],
                    "width": 64 if mtype == "image" else None,
                    "height": 64 if mtype == "image" else None,
                    "duration_ms": 5000 if mtype in ("audio", "video") else None,
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
