"""Multimodal column plumbing for training-data pipelines.

Images/audio/video ride as opaque ``binary`` columns next to typed
metadata, and every transform is an Arrow-batched ``mapInPandas`` over
that binary column — the schema, partitioning, UDF signature and batch
shape here are the real 100 TB pattern; only the codec call itself is
stubbed (no image/audio libraries in this container) behind a
deterministic fake that a real decoder drops into.

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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat_mean": [
                    (sum(d) / len(d)) if len(d) else 0.0 for d in decoded
                ],
                "feat_dim": [len(d) for d in decoded],
                "ok": [len(d) > 0 for d in decoded],
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
