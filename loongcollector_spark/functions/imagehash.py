"""Image perceptual near-duplicate detection — dHash over REALLY
decoded pixels.

The standard web-scale image-dedup primitive (difference hash /
"dHash", public technique — Krawetz, hackerfactor 2013 lineage): box-
filter the grayscale image to a (hash_h x hash_w+1) cell grid, set bit
(r, c) when cell[r, c] < cell[r, c+1], giving a 64-bit signature whose
hamming distance tracks perceptual similarity. This module runs it over
pixels produced by this engine's own from-spec decoders (JPEG/PNG/PGM),
so "multimodal dedup" here means decode → hash → blocked pair join, not
a metadata shortcut.

Exactness story (what makes the hash ORACLE-able, the same trick as
``media_decode_jpeg``): the box filter is an exact area mean, so when
the image dimensions are integer multiples of the cell grid each cell
equals the mean of an aligned pixel block — and for the q50 uniform-
block JPEG fixtures (every 8x8 block a constant 128+2k) the cell value
IS the block value, bit-exactly. A closed-form SQL oracle can therefore
rebuild every signature from the fixture construction while the engine
path runs the full decode + resize + hash for real.

Scale shape: decode+hash runs Arrow-batched in ``mapInPandas`` (one
worker per core, payloads never shuffle; signatures are 4 smallint
bands). Pair generation reuses the SimHash machinery: pigeonhole
banding on the four 16-bit bands (a pair within hamming 3 of a 64-bit
hash must agree on ≥1 of 4 bands), hamming + first-match-band residuals
INSIDE the join so nothing pair-shaped ever shuffles
(functions/dedup.py:330-382 pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def box_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-mean (box-filter) resize: output cell (r, c) is the
    average of the image over [r·h/out_h, (r+1)·h/out_h) ×
    [c·w/out_w, (c+1)·w/out_w), fractional pixel coverage weighted
    exactly. Two small weight matmuls — no Python per pixel."""
    h, w = img.shape

    def weights(n_in, n_out):
        # W[o, i] = overlap of input cell [i, i+1) with output span o
        edges = np.arange(n_out + 1) * (n_in / n_out)
        i = np.arange(n_in)
        lo = np.maximum(edges[:-1, None], i[None, :])
        hi = np.minimum(edges[1:, None], (i + 1)[None, :])
        return np.clip(hi - lo, 0.0, None)

    wr = weights(h, out_h)            # (out_h, h)
    wc = weights(w, out_w).T          # (w, out_w)
    area = (h / out_h) * (w / out_w)
    return (wr @ img.astype(np.float64) @ wc) / area


def dhash_bands(img: np.ndarray, hash_h: int = 8, hash_w: int = 8):
    """(b0..b3) 16-bit bands of the 64-bit dHash: cells = box_resize to
    (hash_h, hash_w+1); bit k = r·hash_w + c set iff
    cells[r, c] < cells[r, c+1]; band b packs rows 2b and 2b+1
    (bit j = (r mod 2)·hash_w + c)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    cells = box_resize(np.asarray(img, dtype=np.float64),
                       hash_h, hash_w + 1)
    bits = cells[:, :-1] < cells[:, 1:]          # (hash_h, hash_w)
    rows = (bits.astype(np.int64)
            << np.arange(hash_w, dtype=np.int64)[None, :]).sum(axis=1)
    bands = rows[0::2] + (rows[1::2] << hash_w)
    return tuple(int(b) for b in bands)


def image_dhash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id") -> DataFrame:
    """(id, dh0..dh3, ok) — decode each payload (JPEG, then PNG, then
    PGM) and hash; undecodable payloads emit ok=false zero bands, never
    a task kill."""
    from loongcollector_spark.functions.jpegcodec import try_decode_jpeg
    from loongcollector_spark.functions.multimodal import (
        try_decode_pgm, try_decode_png,
    )

    schema = f"{id_col} long, dh0 int, dh1 int, dh2 int, dh3 int, ok boolean"

    def batches(it):
        for pdf in it:
            ids, b0, b1, b2, b3, ok = [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = None
                try:
                    raw = bytes(payload)
                    img = try_decode_jpeg(raw)
                    if img is None:
                        img = try_decode_png(raw)
                    if img is None:
                        img = try_decode_pgm(raw)
                except Exception:
                    img = None
                ids.append(int(mid))
                if img is None:
                    b0.append(0)
                    b1.append(0)
                    b2.append(0)
                    b3.append(0)
                    ok.append(False)
                else:
                    v0, v1, v2, v3 = dhash_bands(np.asarray(img))
                    b0.append(v0)
                    b1.append(v1)
                    b2.append(v2)
                    b3.append(v3)
                    ok.append(True)
            yield pd.DataFrame({id_col: ids, "dh0": b0, "dh1": b1,
                                "dh2": b2, "dh3": b3, "ok": ok})

    # repartition before the decode so every core owns a slice (the
    # multimodal decode pattern); payloads never shuffle afterwards
    spark = df.sparkSession
    return (
        df.select(id_col, payload_col)
        .repartition(spark.sparkContext.defaultParallelism, id_col)
        .mapInPandas(batches, schema)
    )


def audio_energy_bands(samples: np.ndarray, frame_len: int = 1024,
                       n_bits: int = 64):
    """Audio energy-difference fingerprint: mean |amplitude| per
    ``frame_len``-sample frame, bit i set iff energy[i] < energy[i+1]
    (the dHash idea on the time axis — tempo/offset-stable the way the
    image hash is resize-stable), packed as four 16-bit bands. Frames
    beyond the clip leave their bits 0, so short clips hash
    deterministically."""
    n = len(samples) // frame_len
    e = (np.abs(samples[:n * frame_len].astype(np.float64))
         .reshape(n, frame_len).mean(axis=1))
    bits = np.zeros(n_bits, dtype=np.int64)
    m = min(n_bits, max(0, n - 1))
    bits[:m] = e[:m] < e[1:m + 1]
    per = n_bits // 4
    vals = (bits.reshape(4, per)
            << np.arange(per, dtype=np.int64)[None, :]).sum(axis=1)
    return tuple(int(v) for v in vals)


def audio_energy_hash(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id",
                      frame_len: int = 1024) -> DataFrame:
    """(id, dh0..dh3, ok) over WAV payloads — same column contract as
    ``image_dhash``, so ``image_near_pairs`` provides the banded
    near-dup join for audio unchanged."""
    from loongcollector_spark.functions.multimodal import try_decode_wav

    schema = f"{id_col} long, dh0 int, dh1 int, dh2 int, dh3 int, ok boolean"

    def batches(it):
        for pdf in it:
            ids, b0, b1, b2, b3, ok = [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = None
                try:
                    dec = try_decode_wav(bytes(payload))
                except Exception:
                    dec = None
                ids.append(int(mid))
                if dec is None:
                    b0.append(0)
                    b1.append(0)
                    b2.append(0)
                    b3.append(0)
                    ok.append(False)
                else:
                    v0, v1, v2, v3 = audio_energy_bands(dec[1], frame_len)
                    b0.append(v0)
                    b1.append(v1)
                    b2.append(v2)
                    b3.append(v3)
                    ok.append(True)
            yield pd.DataFrame({id_col: ids, "dh0": b0, "dh1": b1,
                                "dh2": b2, "dh3": b3, "ok": ok})

    spark = df.sparkSession
    return (
        df.select(id_col, payload_col)
        .repartition(spark.sparkContext.defaultParallelism, id_col)
        .mapInPandas(batches, schema)
    )


def incremental_media_admission(
    batch_sig: DataFrame, index_sig: DataFrame, max_hamming: int = 3,
    id_col: str = "media_id",
) -> DataFrame:
    """Daily-increment admission for media: probe a NEW batch's dHash
    signatures against the persisted fingerprint INDEX (all previously
    admitted media) and against the batch itself — (id, dh0..dh3,
    status) with status ``new`` / ``dup_index`` / ``dup_batch``
    (min-id batch winner), the incremental_minhash statuses.

    Scale shape: banding keeps both probes bucket-local — the index is
    stored banded (4 rows per signature, bucketed on the band value),
    the daily batch shuffles only (id, band) pairs against it, and the
    index itself is never re-read beyond the touched buckets. Matches
    at hamming ≤ ``max_hamming`` via the in-join residual."""
    def banded(sig, prefix):
        return sig.select(
            F.col(id_col).alias(f"{prefix}_id"),
            *[F.col(f"dh{i}").alias(f"{prefix}{i}") for i in range(4)],
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("band_idx"),
                         F.col(f"dh{i}").alias("band"))
                for i in range(4)
            ])).alias("b"),
        ).select(f"{prefix}_id", *[f"{prefix}{i}" for i in range(4)],
                 "b.band_idx", "b.band")

    batch = batch_sig.filter(F.col("ok")) if "ok" in batch_sig.columns \
        else batch_sig
    nb = banded(batch, "n")
    ib = banded(index_sig, "x")
    ham_ix = sum(F.bit_count(F.col(f"n{i}").bitwiseXOR(F.col(f"x{i}")))
                 for i in range(4))
    dup_index = (
        nb.join(ib, (nb["band"] == ib["band"])
                & (nb["band_idx"] == ib["band_idx"])
                & (ham_ix <= max_hamming))
        .select(F.col("n_id").alias(id_col)).distinct()
    )
    a, b = nb.alias("a"), nb.hint("shuffle_merge").alias("b")
    ham_bb = sum(F.bit_count(F.col(f"a.n{i}").bitwiseXOR(F.col(f"b.n{i}")))
                 for i in range(4))
    dup_batch = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.n_id") > F.col("b.n_id"))
               & (ham_bb <= max_hamming))
        .select(F.col("a.n_id").alias(id_col)).distinct()
    )
    return (
        batch.select(id_col, "dh0", "dh1", "dh2", "dh3")
        .join(dup_index.withColumn("_di", F.lit(True)), id_col, "left")
        .join(dup_batch.withColumn("_db", F.lit(True)), id_col, "left")
        .select(
            id_col, "dh0", "dh1", "dh2", "dh3",
            F.when(F.col("_di").isNotNull(), F.lit("dup_index"))
            .when(F.col("_db").isNotNull(), F.lit("dup_batch"))
            .otherwise(F.lit("new")).alias("status"),
        )
    )


def video_frame_dhash(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id",
                      every_n: int = 1) -> DataFrame:
    """(id, frame_idx, dh0..dh3, ok) — walk each video container (AVI
    or MP4, detected by magic), decode every ``every_n``-th frame
    through the real JPEG path, and dHash it. Unparsable containers
    emit one ok=false marker row; per-frame decode failures skip the
    frame (a poisoned frame never hides its siblings)."""
    from loongcollector_spark.functions.multimodal import (
        decode_avi_frame, decode_mp4_frame, try_parse_avi, try_parse_mp4,
    )

    schema = (f"{id_col} long, frame_idx int, dh0 int, dh1 int, dh2 int, "
              f"dh3 int, ok boolean")

    def batches(it):
        for pdf in it:
            rows = {k: [] for k in (id_col, "frame_idx", "dh0", "dh1",
                                    "dh2", "dh3", "ok")}

            def emit(mid, fi, bands, ok):
                rows[id_col].append(mid)
                rows["frame_idx"].append(fi)
                for i in range(4):
                    rows[f"dh{i}"].append(bands[i])
                rows["ok"].append(ok)

            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                mid = int(mid)
                try:
                    raw = bytes(payload)
                    if raw[:4] == b"RIFF":
                        parsed = try_parse_avi(raw)
                        dec = decode_avi_frame
                    else:
                        parsed = try_parse_mp4(raw)
                        dec = decode_mp4_frame
                    if parsed is None:
                        emit(mid, -1, (0, 0, 0, 0), False)
                        continue
                    n = parsed[2]
                    for fi in range(0, n, every_n):
                        img = dec(raw, fi, parsed)
                        if img is None:
                            continue
                        emit(mid, fi, dhash_bands(np.asarray(img)), True)
                except Exception:
                    emit(mid, -1, (0, 0, 0, 0), False)
            yield pd.DataFrame(rows)

    spark = df.sparkSession
    return (
        df.select(id_col, payload_col)
        .repartition(spark.sparkContext.defaultParallelism, id_col)
        .mapInPandas(batches, schema)
    )


def video_near_dups(frames: DataFrame, min_shared: int = 2,
                    id_col: str = "media_id") -> DataFrame:
    """Video near-duplicate pairs by SHARED FRAME FINGERPRINTS: join
    frame signatures on full (dh0..dh3) equality across videos, count
    DISTINCT shared fingerprints per pair, keep pairs sharing at least
    ``min_shared`` — re-encoded / trimmed / re-muxed copies of the same
    footage collide frame-for-frame while unrelated videos don't. Only
    (video_id, 4 smallints) shuffle; per-video duplicate frames
    collapse before the join so a still-frame loop cannot explode the
    pair count."""
    sig = (
        frames.filter(F.col("ok"))
        .select(id_col, "dh0", "dh1", "dh2", "dh3")
        .dropDuplicates([id_col, "dh0", "dh1", "dh2", "dh3"])
    )
    a, b = sig.alias("a"), sig.hint("shuffle_merge").alias("b")
    pairs = a.join(
        b,
        (F.col("a.dh0") == F.col("b.dh0"))
        & (F.col("a.dh1") == F.col("b.dh1"))
        & (F.col("a.dh2") == F.col("b.dh2"))
        & (F.col("a.dh3") == F.col("b.dh3"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        pairs.groupBy(
            F.col(f"a.{id_col}").alias("media_a"),
            F.col(f"b.{id_col}").alias("media_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def video_container_fingerprints(df: DataFrame,
                                 payload_col: str = "payload",
                                 id_col: str = "media_id") -> DataFrame:
    """(id, sample_idx, fp, codec, ok) — per-sample BYTE fingerprints
    straight off the container sample tables (MP4 stsz/stco walk, AVI
    movi chunks), md5 over the COMPRESSED sample bytes, no decode.

    This is the dedup signal for inter-frame codecs (avc1/hvc1) that
    ``video_frame_dhash`` cannot reach (an H.264 motion-compensated
    decoder is a library, not a module): re-muxed / trimmed /
    concatenated copies of the same encoded footage carry identical
    sample bytes, so their fingerprints collide sample-for-sample even
    though no frame is ever decoded. Unparsable containers emit one
    ok=false marker row.

    Scale shape: one hash repartition spreads the payloads across
    workers (the sf fixtures are single-split files; a many-file layout
    skips it), the container walk runs in mapInPandas, and only
    (id, idx, 32-char fp) rows feed downstream — joins carry ids +
    fingerprints, never payload bytes."""
    import hashlib

    from loongcollector_spark.functions.multimodal import (
        try_parse_avi, try_parse_mp4,
    )

    schema = (f"{id_col} long, sample_idx int, fp string, codec string, "
              f"ok boolean")

    def batches(it):
        for pdf in it:
            rows = {k: [] for k in (id_col, "sample_idx", "fp", "codec",
                                    "ok")}

            def emit(mid, si, fp, codec, ok):
                rows[id_col].append(mid)
                rows["sample_idx"].append(si)
                rows["fp"].append(fp)
                rows["codec"].append(codec)
                rows["ok"].append(ok)

            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                mid = int(mid)
                try:
                    raw = bytes(payload)
                    if raw[:4] == b"RIFF":
                        parsed = try_parse_avi(raw)
                        codec = "mjpeg" if parsed else None
                        frames = parsed[3] if parsed else None
                    else:
                        parsed = try_parse_mp4(raw)
                        codec = parsed[4] if parsed else None
                        frames = parsed[3] if parsed else None
                    if not frames:
                        emit(mid, -1, "", "", False)
                        continue
                    for si, (off, size) in enumerate(frames):
                        if off + size > len(raw):
                            continue  # truncated sample: skip, not fail
                        emit(mid, si,
                             hashlib.md5(raw[off:off + size]).hexdigest(),
                             codec, True)
                except Exception:
                    emit(mid, -1, "", "", False)
            yield pd.DataFrame(rows)

    spark = df.sparkSession
    return (
        df.select(id_col, payload_col)
        .repartition(spark.sparkContext.defaultParallelism, id_col)
        .mapInPandas(batches, schema)
    )


def video_container_dedup(fps: DataFrame, min_shared: int = 2,
                          id_col: str = "media_id") -> DataFrame:
    """Video near-duplicate pairs by SHARED SAMPLE BYTES: join container
    fingerprints on equality across videos, count DISTINCT shared
    samples per pair, keep pairs sharing ≥ ``min_shared`` — the
    ``video_near_dups`` shape with byte fingerprints instead of decoded
    dHashes, so it covers every codec the container walk reaches.
    Per-video duplicate samples (still loops) collapse before the
    join."""
    sig = (
        fps.filter(F.col("ok"))
        .select(id_col, "fp")
        .dropDuplicates([id_col, "fp"])
    )
    a, b = sig.alias("a"), sig.hint("shuffle_merge").alias("b")
    pairs = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        pairs.groupBy(
            F.col(f"a.{id_col}").alias("media_a"),
            F.col(f"b.{id_col}").alias("media_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def image_near_pairs(sig: DataFrame, max_hamming: int = 3,
                     id_col: str = "media_id") -> DataFrame:
    """Near-duplicate image pairs by dHash hamming ≤ ``max_hamming``
    from an ``image_dhash`` frame: pigeonhole banding on the four
    16-bit bands, hamming + first-match-band residuals inside the join
    (the simhash_near_pairs shape — ids + four small ints shuffle,
    never pixels)."""
    assert max_hamming < 4, (
        "4-band pigeonhole blocking only guarantees recall for "
        "hamming <= 3; raise the band count before raising max_hamming")
    sig = sig.filter(F.col("ok"))
    bands = sig.select(
        id_col, "dh0", "dh1", "dh2", "dh3",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_idx"),
                     F.col(f"dh{i}").alias("band"))
            for i in range(4)
        ])).alias("b"),
    ).select(id_col, "dh0", "dh1", "dh2", "dh3", "b.band_idx", "b.band")
    a, b = bands.alias("a"), bands.hint("shuffle_merge").alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.dh{i}").bitwiseXOR(F.col(f"b.dh{i}")))
        for i in range(4)
    )
    first_match = F.lit(True)
    for i in range(3):
        first_match = first_match & (
            (F.col("a.band_idx") <= i)
            | (F.col(f"a.dh{i}") != F.col(f"b.dh{i}"))
        )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (hamming <= max_hamming)
            & first_match,
        )
        .select(
            F.col(f"a.{id_col}").alias("media_a"),
            F.col(f"b.{id_col}").alias("media_b"),
            hamming.cast("int").alias("hamming"),
        )
    )
