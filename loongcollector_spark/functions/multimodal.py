"""Multimodal column plumbing for training-data pipelines.

Images/audio/video ride as opaque ``binary`` columns next to typed
metadata, and every transform is an Arrow-batched ``mapInPandas`` over
that binary column — the schema, partitioning, UDF signature and batch
shape here are the real 100 TB pattern.

Round 3: the decode step is REAL for self-contained formats — binary
PGM (P5) images and RIFF/WAVE PCM16 audio decode with numpy + struct
alone (``try_decode_pgm`` / ``try_decode_wav``), with nearest-neighbor
resize and feature extraction on the decoded arrays. Container formats
that genuinely need external codecs (JPEG/MP4/…) still fall back to the
deterministic byte stub a PIL/libav decoder would drop into.

Scale shape: mapInPandas streams Arrow batches — one Python worker per
core, no per-row pickling; binary payloads never shuffle except through
the explicit repartition the caller owns. Feature outputs are small typed
columns, so everything downstream of decode is codegen again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# media metadata columns every asset row carries (the typed half of the
# image/audio/video pattern — the binary blob stays opaque)
MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, feat_mean double, feat_dim int, ok boolean"
)


def documents_as_media(df: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic media table derived from ``documents``: the text bytes
    stand in for an encoded payload (same shapes/sizes a thumbnail table
    would have). Purely a fixture builder — real pipelines read binary
    columns straight from parquet."""
    return df.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.col("doc_id"), F.lit(30)) + 1).cast("int").alias("n_frames"),
    )


# ---------------------------------------------------------------------
# REAL codecs for self-contained formats (round 3): PGM (P5) images and
# RIFF/WAVE PCM16 audio decode with numpy + struct alone — no PIL/libav
# needed. Container formats (JPEG/MP4/...) remain behind the stub.
# ---------------------------------------------------------------------

import re as _re
import struct as _struct

import numpy as np


def encode_pgm(width: int, height: int, pixels) -> bytes:
    """Binary PGM (P5): 'P5\\n<w> <h>\\n255\\n' + row-major uint8 bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    return b"P5\n%d %d\n255\n" % (width, height) + arr.tobytes()


def try_decode_pgm(payload):
    """P5 PGM → uint8 ndarray (h, w), or None if not a valid PGM."""
    if not payload:
        return None
    buf = bytes(payload)
    m = _re.match(rb"P5\s+(\d+)\s+(\d+)\s+(\d+)\s", buf[:64])
    if not m:
        return None
    w, h, maxv = map(int, m.groups())
    if not (0 < w and 0 < h and 0 < maxv < 256):
        return None
    off, need = m.end(), w * h
    if len(buf) - off < need:
        return None
    return np.frombuffer(buf, dtype=np.uint8, count=need, offset=off).reshape(h, w)


def encode_wav_pcm16(sample_rate: int, samples) -> bytes:
    """Mono PCM16 RIFF/WAVE container."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                 sample_rate * 2, 2, 16)
        + b"data" + _struct.pack("<I", len(data)) + data
    )


def try_decode_wav(payload):
    """RIFF/WAVE PCM16 mono → (sample_rate, int16 ndarray), else None.
    Walks the chunk list, so extra chunks (LIST/fact) are tolerated."""
    if not payload:
        return None
    buf = bytes(payload)
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, sr, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = _struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            _fmt, channels, sr, _br, _ba, bits = _struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if sr is None or data is None or bits != 16 or channels != 1:
        return None
    return sr, np.frombuffer(data, dtype="<i2", count=len(data) // 2)


def resize_nearest(img: "np.ndarray", new_w: int, new_h: int) -> "np.ndarray":
    """Nearest-neighbor resize via index arithmetic (the thumbnailing
    step of an image-training pipeline, sans interpolation libs)."""
    h, w = img.shape
    rows = (np.arange(new_h) * h) // new_h
    cols = (np.arange(new_w) * w) // new_w
    return img[rows][:, cols]


def synthetic_media(df: DataFrame, media_type: str = "image") -> DataFrame:
    """REAL media fixtures, deterministic from doc_id: PGM images with
    pixel_i = (doc_id*31 + i) % 256, or 1600-sample WAVs with
    sample_i = ((doc_id*7 + i) % 512 - 256) * 64 — closed forms a SQL
    oracle reproduces without any codec."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 64 + 16, d % 48 + 16
                if media_type == "image":
                    px = (d * 31 + np.arange(w * h)) % 256
                    payload = encode_pgm(w, h, px)
                    sr, nf = 0, 1
                else:
                    sr, n = 16000, 1600
                    samples = ((d * 7 + np.arange(n)) % 512 - 256) * 64
                    payload = encode_wav_pcm16(sr, samples)
                    nf = 1
                rows.append((d, media_type, payload, w, h, sr, nf))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "width",
                         "height", "sample_rate", "n_frames"],
            )

    return df.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def image_resize(df: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, per Arrow batch;
    undecodable payloads pass through with ok=False."""
    schema = "doc_id long, payload binary, width int, height int, ok boolean"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = try_decode_pgm(payload)
                if img is None:
                    rows.append((int(doc_id), payload, 0, 0, False))
                else:
                    small = resize_nearest(img, new_w, new_h)
                    rows.append((int(doc_id), encode_pgm(new_w, new_h, small),
                                 new_w, new_h, True))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "width", "height", "ok"])

    return df.mapInPandas(batches, schema)


def _decode_stub(payload: bytes, media_type: str):
    """STUB decode step. A real build replaces this with PIL/libav/etc.
    Raises for media types the stub doesn't fake, exactly like a codec
    missing from the runtime would."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    if payload is None:
        # a null blob decodes to nothing (ok=False downstream) — a
        # poisoned asset row must never kill the worker
        return memoryview(b"")
    # deterministic fake "pixel values": the payload bytes themselves
    return memoryview(payload)


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract over the binary column via mapInPandas.

    Per Arrow batch: one vectorized pass computing a feature vector
    summary per asset (here: mean byte value + dimensionality from the
    stub decode). The iterator-of-frames signature is what keeps memory
    bounded — a batch of blobs is in flight, never a partition of them.
    """

    def one(payload, media_type):
        # real decoders first (PGM pixels / WAV |samples|); anything the
        # real codecs can't parse falls back to the raw-byte stub, so
        # opaque payloads still produce deterministic features
        if media_type == "image":
            img = try_decode_pgm(payload)
            if img is not None:
                return float(img.mean()), int(img.size), True
        elif media_type == "audio":
            wav = try_decode_wav(payload)
            if wav is not None:
                _sr, samples = wav
                return (float(np.abs(samples.astype(np.int64)).mean()),
                        int(samples.size), True)
        d = _decode_stub(payload, media_type)
        return ((sum(d) / len(d)) if len(d) else 0.0, len(d), len(d) > 0)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                one(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat_mean": [f[0] for f in feats],
                "feat_dim": [f[1] for f in feats],
                "ok": [f[2] for f in feats],
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode n_frames into
    sampled frame indexes (codegen), carrying the payload reference — the
    real decoder would slice the container per index inside mapInPandas."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
            "payload",
        )
    )
