"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / frame-sample run as Arrow-batched pandas UDFs over
mapInPandas. Two decode kernels are REAL stdlib decoders so the feature
contract is actually exercised end to end (the r2 oracle only checked hash
plumbing):

- BMP (24-bit uncompressed) via struct byte-offset parsing;
- PNG (8-bit RGB, non-interlaced) via stdlib zlib: chunk walk, IDAT
  inflate, and full per-scanline filter reconstruction (None/Sub/Up/
  Average/Paeth);
- WAV (16-bit PCM) via the stdlib `wave` module.

Formats needing external codecs (jpeg/mp4) fall back to a clearly-marked
deterministic digest STUB — the Spark-side contract (schema, batch shape,
partition sizing) stays identical, and a real cluster swaps the stub for
PIL/libvips/ffmpeg without touching the DAG.

Scale notes: binary payloads inflate row size, so media stages repartition by
size (bytes-aware) before the UDF and keep
spark.sql.execution.arrow.maxRecordsPerBatch low enough that a batch of
payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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
        StructField("format", StringType(), True),       # bmp|png|wav|mp4...
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

AUDIO_RATE = 8000  # Hz, 16-bit mono PCM for the synthetic corpus


# ---------------------------------------------------------------------------
# Decode kernels
# ---------------------------------------------------------------------------

def _decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder: 24-bit uncompressed BMP -> (h, w, 3) float32 BGR pixel
    block, parsed by byte offsets (BITMAPFILEHEADER + BITMAPINFOHEADER:
    pixel-array offset @10, width @18, height @22, bpp @28; rows bottom-up,
    4-byte padded)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for r in range(abs(h)):
        start = off + r * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=start)
        rows.append(row.reshape(w, 3))
    # positive height = bottom-up storage; normalize to top-down
    block = np.stack(rows[::-1] if h > 0 else rows)
    return block.astype(np.float32)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL decoder: 8-bit RGB non-interlaced PNG -> (h, w, 3) float32
    pixel block via stdlib zlib — chunk walk (IHDR/IDAT/IEND), inflate,
    then per-scanline filter reconstruction: None(0), Sub(1), Up(2),
    Average(3), Paeth(4)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2 or inter != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, w * 3 + 1
    prior = bytearray(w * 3)
    rows = []
    for r in range(h):
        ft = raw[r * stride]
        line = bytearray(raw[r * stride + 1 : (r + 1) * stride])
        if ft == 1:  # Sub
            for i in range(bpp, len(line)):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(line)):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        prior = line
        rows.append(np.frombuffer(bytes(line), np.uint8).reshape(w, 3))
    return np.stack(rows).astype(np.float32)


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder: 16-bit PCM WAV -> (int16 sample array, frame rate) via
    the stdlib wave module."""
    with wave.open(io.BytesIO(payload)) as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        frames = wf.readframes(wf.getnframes())
        rate = wf.getframerate()
    return np.frombuffer(frames, dtype="<i2"), rate


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB for formats whose codecs aren't in this container (jpeg/mp4):
    a deterministic digest block stands in for decoded content so the
    plumbing stays testable. Clearly NOT a content decode."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)


def _decode_values(payload: bytes, media_type: str, fmt: str | None) -> np.ndarray:
    """Unified decode -> float values in [0, 1] (pixels /255, samples
    mapped from [-1,1]; digest stubs /255)."""
    if media_type == "image" and fmt == "bmp":
        return _decode_bmp(payload).ravel() / 255.0
    if media_type == "image" and fmt == "png":
        return _decode_png(payload).ravel() / 255.0
    if media_type == "audio" and fmt == "wav":
        samples, _ = _decode_wav(payload)
        return (samples.astype(np.float32) / 32768.0 + 1.0) / 2.0
    return _decode_stub(payload) / 255.0


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------

def extract_media_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item feature vector + content hash.

    features = per-bin means of the decoded value stream over feature_dim
    equal splits — computed from REAL decoded pixels/samples for bmp/wav,
    digest-stub values otherwise. Payload bytes arrive zero-copy through
    Arrow; one decode per item per pass."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, nbytes, shas, feats = [], [], [], []
            for rec in batch.itertuples(index=False):
                payload = bytes(rec.payload)
                meta = rec.meta or {}
                values = _decode_values(
                    payload, meta.get("media_type"), meta.get("format")
                )
                vec = np.array(
                    [b.mean() if b.size else 0.0
                     for b in np.array_split(values, feature_dim)],
                    dtype=np.float32,
                )
                ids.append(rec.media_id)
                nbytes.append(len(payload))
                shas.append(hashlib.sha256(payload).hexdigest())
                feats.append(vec)
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
    """Frame/window sampling: one row per sampled offset of every item with
    a duration (offsets from typed metadata, which IS real).

    - audio/wav: the frame payload is the REAL PCM byte slice of the
      [offset, offset+every_ms) window, cut from the wave-decoded samples;
    - video/mp4: the decode is STUBBED (no ffmpeg in this container) — the
      payload is a deterministic digest of (payload, offset).

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
                is_wav = (
                    meta.get("media_type") == "audio"
                    and meta.get("format") == "wav"
                )
                if is_wav:
                    samples, rate = _decode_wav(payload)
                for i, off in enumerate(range(0, int(duration), every_ms)):
                    if is_wav:
                        lo = off * rate // 1000
                        hi = (off + every_ms) * rate // 1000
                        frame = samples[lo:hi].astype("<i2").tobytes()
                    else:
                        # STUB: a real decoder seeks to `off` and decodes a
                        # frame; we emit a deterministic digest block.
                        frame = hashlib.blake2b(
                            payload + off.to_bytes(8, "big"), digest_size=16
                        ).digest()
                    rows.append((rec.media_id, i, off, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "offset_ms", "frame_payload"]
            )

    return media.mapInPandas(_map, schema=schema)


# ---------------------------------------------------------------------------
# Synthetic corpus (REAL file formats, deterministic bytes)
# ---------------------------------------------------------------------------

def det_bytes(tag: str, n: int) -> bytes:
    """n deterministic bytes from counter-mode blake2b over `tag` — the
    fixture's randomness source (replicated independently in
    scripts/gen_expected.py)."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{tag}|{c}".encode(), digest_size=64).digest()
        c += 1
    return bytes(out[:n])


def make_bmp(tag: str, width: int = 8, height: int = 8) -> bytes:
    """A real 24-bit uncompressed BMP with deterministic pixel bytes."""
    row_bytes = (width * 3 + 3) & ~3
    pix = bytearray()
    raw = det_bytes(tag, width * 3 * height)
    for r in range(height):
        row = raw[r * width * 3 : (r + 1) * width * 3]
        pix += row + b"\x00" * (row_bytes - len(row))
    off = 14 + 40
    size = off + len(pix)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return header + info + bytes(pix)


def make_png(tag: str, width: int = 8, height: int = 8) -> bytes:
    """A real 8-bit RGB non-interlaced PNG with deterministic pixels and a
    DIFFERENT filter type per scanline (row r uses filter r % 5) so the
    decoder's full None/Sub/Up/Average/Paeth reconstruction is exercised."""
    import zlib

    bpp = 3
    raw = det_bytes(tag, width * 3 * height)
    filtered = bytearray()
    prior = bytes(width * 3)
    for r in range(height):
        row = raw[r * width * 3 : (r + 1) * width * 3]
        ft = r % 5
        filtered.append(ft)
        if ft == 0:
            filtered += row
        elif ft == 1:
            filtered += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ft == 2:
            filtered += bytes(
                (row[i] - prior[i]) & 0xFF for i in range(len(row))
            )
        elif ft == 3:
            filtered += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2)
                & 0xFF
                for i in range(len(row))
            )
        else:
            filtered += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(row))
            )
        prior = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def make_wav(tag: str, duration_ms: int = 5000, rate: int = AUDIO_RATE) -> bytes:
    """A real 16-bit PCM mono WAV with deterministic sample bytes."""
    n_samples = duration_ms * rate // 1000
    pcm = det_bytes(tag, n_samples * 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm)
    return buf.getvalue()


def make_synthetic_media(spark, n: int = 50) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks (no external
    data): REAL BMP + PNG images and WAV audio, digest-backed opaque mp4
    video."""
    rows = []
    for i in range(n):
        mtype = ["image", "png", "audio", "video"][i % 4]
        if mtype == "image":
            payload = make_bmp(f"media{i}")
            meta = {"media_type": "image", "format": "bmp",
                    "width": 8, "height": 8, "duration_ms": None}
        elif mtype == "png":
            payload = make_png(f"media{i}")
            meta = {"media_type": "image", "format": "png",
                    "width": 8, "height": 8, "duration_ms": None}
        elif mtype == "audio":
            payload = make_wav(f"media{i}")
            meta = {"media_type": "audio", "format": "wav",
                    "width": None, "height": None, "duration_ms": 5000}
        else:
            payload = det_bytes(f"media{i}", 4096)
            meta = {"media_type": "video", "format": "mp4",
                    "width": None, "height": None, "duration_ms": 5000}
        rows.append((i, payload, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
