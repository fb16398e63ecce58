"""Multimodal column plumbing for training-data pipelines.

Images/audio/video ride as opaque ``binary`` columns next to typed
metadata, and every transform is an Arrow-batched ``mapInPandas`` over
that binary column — the schema, partitioning, UDF signature and batch
shape here are the real 100 TB pattern.

Round 3: the decode step is REAL for every self-contained format —
binary PGM (P5) and full PNG (RFC 2083: chunk CRCs, zlib IDAT, all five
row filters) images, RIFF/WAVE PCM16 audio, and Y4M/YUV4MPEG2 raw-frame
video (the stream ffmpeg pipelines emit), all in numpy + stdlib alone,
plus baseline JPEG (ITU-T T.81: Huffman entropy decode, dequant, IDCT,
chroma upsampling — see ``jpegcodec.py``, incl. why block-uniform JPEGs
stay hash-oracle-able despite lossiness). Only MP4/H.264 video remains
behind the deterministic byte stub (a motion-compensated video decoder
is a library, not a module); Y4M is the real video path.

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

from loongcollector_spark.functions.jpegcodec import (  # noqa: F401
    encode_jpeg, try_decode_jpeg,
)


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
    step of an image-training pipeline, sans interpolation libs).
    Works for (h, w) gray and (h, w, c) multi-channel arrays."""
    h, w = img.shape[:2]
    rows = (np.arange(new_h) * h) // new_h
    cols = (np.arange(new_w) * w) // new_w
    return img[rows][:, cols]


def synthetic_media(df: DataFrame, media_type: str = "image") -> DataFrame:
    """REAL media fixtures, deterministic from doc_id: PGM images with
    pixel_i = (doc_id*31 + i) % 256, RGB PNGs with channel offsets
    (+0/+85/+170) over the same series, Y4M videos with frame-f Y plane
    y_i = (doc_id*13 + f*7 + i) % 256, or 1600-sample WAVs with
    sample_i = ((doc_id*7 + i) % 512 - 256) * 64 — closed forms a SQL
    oracle reproduces without any codec.

    ``jpeg`` mode builds genuinely entropy-coded baseline JPEGs that an
    oracle can still check exactly: every 8x8 block is uniform at
    v_b = 128 + 2*((doc_id*5 + b) % 113 - 56), and at quality 50 the DC
    quant step is 16, so 8*(v_b-128) quantizes losslessly and the block
    reconstructs bit-exact (see jpegcodec.py docstring). Every third doc
    additionally carries DRI/RSTn restart markers.

    The doc_id frame is hash-repartitioned across cores FIRST: the sf
    fixtures are one-split parquet files, and without the exchange the
    whole encode (and every chained mapInPandas after it) runs on ONE
    Python worker (media_decode_jpeg measured 3.7 s -> 0.9 s at
    local[32]; the exchange carries only doc_id)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 64 + 16, d % 48 + 16
                out_type = media_type
                if media_type == "image":
                    px = (d * 31 + np.arange(w * h)) % 256
                    payload = encode_pgm(w, h, px)
                    sr, nf = 0, 1
                elif media_type == "png":
                    base = (d * 31 + np.arange(w * h))
                    px = np.stack(
                        [(base + off) % 256 for off in (0, 85, 170)], axis=-1
                    ).reshape(h, w, 3)
                    payload = encode_png(w, h, px)
                    sr, nf = 0, 1
                    out_type = "image"  # rides the image decode path
                elif media_type == "jpeg":
                    bw_, bh_ = d % 6 + 2, d % 4 + 2
                    w, h = 8 * bw_, 8 * bh_
                    vals = 128 + 2 * ((d * 5 + np.arange(bh_ * bw_)) % 113 - 56)
                    img = np.kron(vals.reshape(bh_, bw_),
                                  np.ones((8, 8), np.int64)).astype(np.uint8)
                    payload = encode_jpeg(
                        img, quality=50,
                        restart_interval=3 if d % 3 == 0 else 0)
                    sr, nf = 0, 1
                    out_type = "image"  # rides the image decode path
                elif media_type == "video":
                    w, h = 16, 8
                    nf, sr = d % 12 + 1, 0
                    uv = np.full((h // 2) * (w // 2), 128, np.uint8)
                    frames = [
                        ((d * 13 + f * 7 + np.arange(w * h)) % 256, uv, uv)
                        for f in range(nf)
                    ]
                    payload = encode_y4m(w, h, frames)
                elif media_type == "mp4":
                    # JPEG-codec MP4 (QuickTime Motion-JPEG shape): the
                    # same lossless-DC blocks, frame shift ×11 so mp4
                    # and avi fixtures can't be confused
                    bw_, bh_ = d % 6 + 2, d % 4 + 2
                    w, h = 8 * bw_, 8 * bh_
                    nf, sr = d % 5 + 2, 0
                    jf = []
                    for f in range(nf):
                        vals = 128 + 2 * (
                            (d * 5 + f * 11 + np.arange(bh_ * bw_)) % 113 - 56)
                        img = np.kron(vals.reshape(bh_, bw_),
                                      np.ones((8, 8), np.int64)).astype(np.uint8)
                        jf.append(encode_jpeg(img, quality=50))
                    payload = encode_mp4_mjpeg(w, h, jf)
                    out_type = "video"
                elif media_type == "avi":
                    # MJPEG AVI: per-frame block-uniform JPEGs (the q50
                    # lossless-DC construction, frame-shifted) — an
                    # entropy-coded VIDEO a SQL oracle still checks exactly
                    bw_, bh_ = d % 6 + 2, d % 4 + 2
                    w, h = 8 * bw_, 8 * bh_
                    nf, sr = d % 5 + 2, 0
                    jf = []
                    for f in range(nf):
                        vals = 128 + 2 * (
                            (d * 5 + f * 7 + np.arange(bh_ * bw_)) % 113 - 56)
                        img = np.kron(vals.reshape(bh_, bw_),
                                      np.ones((8, 8), np.int64)).astype(np.uint8)
                        jf.append(encode_jpeg(img, quality=50))
                    payload = encode_avi_mjpeg(w, h, jf)
                    out_type = "video"  # rides the video decode path
                else:
                    sr, n = 16000, 1600
                    samples = ((d * 7 + np.arange(n)) % 512 - 256) * 64
                    payload = encode_wav_pcm16(sr, samples)
                    nf = 1
                rows.append((d, out_type, payload, w, h, sr, nf))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "payload", "width",
                         "height", "sample_rate", "n_frames"],
            )

    ids = df.select("doc_id")
    par = df.sparkSession.sparkContext.defaultParallelism
    return ids.repartition(par, "doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def image_resize(df: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, per Arrow batch;
    undecodable payloads pass through with ok=False."""
    schema = "doc_id long, payload binary, width int, height int, ok boolean"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                png = try_decode_png(payload)
                pgm = None if png is not None else try_decode_pgm(payload)
                jpg = (None if png is not None or pgm is not None
                       else try_decode_jpeg(payload))
                img = png if png is not None else (
                    pgm if pgm is not None else jpg)
                if img is None:
                    rows.append((int(doc_id), payload, 0, 0, False))
                else:
                    small = resize_nearest(img, new_w, new_h)
                    # re-encode in the container the payload arrived in
                    if png is not None:
                        out = encode_png(new_w, new_h, small)
                    elif pgm is not None:
                        out = encode_pgm(new_w, new_h, small)
                    else:
                        out = encode_jpeg(small, quality=90)
                    rows.append((int(doc_id), out, new_w, new_h, True))
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
        # real decoders first (PNG/PGM pixels, Y4M Y-planes, WAV
        # |samples|); anything the real codecs can't parse falls back to
        # the raw-byte stub, so opaque payloads still produce
        # deterministic features
        if media_type == "image":
            img = try_decode_png(payload)
            if img is None:
                img = try_decode_pgm(payload)
            if img is None:
                img = try_decode_jpeg(payload)
            if img is not None:
                return float(img.mean()), int(img.size), True
        elif media_type == "video":
            parsed = try_parse_y4m(payload)
            if parsed is not None:
                w, h, n, _offs = parsed
                means = [decode_y4m_frame(payload, f).mean() for f in range(n)]
                return float(np.mean(means)), int(n * w * h), True
            for parse, decode in ((try_parse_avi, decode_avi_frame),
                                  (try_parse_mp4, decode_mp4_frame)):
                parsed = parse(payload)
                if parsed is None:
                    continue
                n = parsed[2]
                # integral global mean (one exact sum/count division, not
                # a float mean-of-frame-means) so the closed-form SQL
                # oracle's avg() lands on the same double
                tot = px = 0
                for f in range(n):
                    a = decode(payload, f, parsed)
                    if a is None:  # a frame the codec can't decode
                        tot = px = 0  # fall through to the raw-byte stub
                        break
                    tot += int(a.sum(dtype=np.int64))
                    px += a.size
                if px:
                    return tot / px, int(px), True
                break
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


# ---------------------------------------------------------------------
# PNG (lossless, stdlib zlib) and Y4M / YUV4MPEG2 (raw-frame video) —
# real container codecs in pure numpy + stdlib, no PIL/libav. PNG is
# written from the RFC 2083 spec (signature, chunk CRCs, IHDR layout,
# the five row filters); Y4M from the mjpegtools stream format every
# ffmpeg pipeline emits. Both are LOSSLESS, so decoded pixels equal the
# synthesis formula exactly and a SQL oracle can check features
# bit-for-bit — unlike JPEG/MP4, which stay stubbed (lossy codecs can't
# be hash-oracled and their decoders need external libs).
# ---------------------------------------------------------------------

import binascii as _binascii
import zlib as _zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = _binascii.crc32(ctype + data) & 0xFFFFFFFF
    return _struct.pack(">I", len(data)) + ctype + data + _struct.pack(">I", crc)


def encode_png(width: int, height: int, pixels) -> bytes:
    """8-bit PNG encoder (grayscale for (h,w) input, RGB for (h,w,3)),
    filter type 0 per row, one zlib IDAT."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr.reshape(height, width)
    else:
        color_type, channels = 2, 3
        arr = arr.reshape(height, width, 3)
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int):
    """Reverse the five PNG row filters (RFC 2083 §6) → (h, w*bpp) u8."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prior) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur
    return out


def try_decode_png(payload):
    """PNG → uint8 ndarray (h, w) gray or (h, w, 3) RGB; None when the
    payload is not a valid 8-bit non-interlaced PNG (bad signature,
    chunk CRC mismatch, truncated stream, unsupported color type)."""
    if not payload:
        return None
    buf = bytes(payload)
    if len(buf) < 45 or buf[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        (clen,) = _struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + clen]
        if len(data) != clen or pos + 12 + clen > len(buf):
            return None
        (crc,) = _struct.unpack(">I", buf[pos + 8 + clen:pos + 12 + clen])
        if _binascii.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        return None
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    channels = {0: 1, 2: 3}.get(color_type)
    if channels is None or w <= 0 or h <= 0:
        return None
    try:
        raw = _zlib.decompress(b"".join(idat))
    except _zlib.error:
        return None
    if len(raw) != h * (1 + w * channels):
        return None
    flat = _png_unfilter(raw, w, h, channels)
    if flat is None:
        return None
    return flat.reshape(h, w) if channels == 1 else flat.reshape(h, w, 3)


# --- Y4M / YUV4MPEG2: the raw-frame video stream ffmpeg pipelines use ---

def encode_y4m(width: int, height: int, frames) -> bytes:
    """YUV4MPEG2 stream, C420jpeg chroma: header + per-frame
    'FRAME\\n' + Y (w*h) + U + V (w/2*h/2 each). ``frames`` is an
    iterable of (y_plane, u_plane, v_plane) uint8 arrays."""
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (width, height)]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(y, np.uint8).tobytes())
        out.append(np.asarray(u, np.uint8).tobytes())
        out.append(np.asarray(v, np.uint8).tobytes())
    return b"".join(out)


def try_parse_y4m(payload):
    """Y4M container → (width, height, n_frames, frame_offsets) without
    decoding any pixels (the cheap index pass frame sampling needs);
    None if not a YUV4MPEG2 stream."""
    if not payload:
        return None
    buf = bytes(payload)
    if not buf.startswith(b"YUV4MPEG2 "):
        return None
    eol = buf.find(b"\n")
    if eol < 0:
        return None
    w = h = None
    for tok in buf[10:eol].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h or w % 2 or h % 2:
        return None
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    offsets, pos = [], eol + 1
    while (buf[pos:pos + 6] == b"FRAME\n"
           and pos + 6 + frame_bytes <= len(buf)):
        offsets.append(pos + 6)
        pos += 6 + frame_bytes
    if not offsets:
        return None
    return w, h, len(offsets), offsets


def decode_y4m_frame(payload, frame_idx: int):
    """Y plane of frame ``frame_idx`` as a (h, w) uint8 ndarray, or None."""
    parsed = try_parse_y4m(payload)
    if parsed is None:
        return None
    w, h, n, offsets = parsed
    if not (0 <= frame_idx < n):
        return None
    buf = bytes(payload)
    return np.frombuffer(
        buf, np.uint8, w * h, offsets[frame_idx]
    ).reshape(h, w)


# --- AVI / MJPEG: entropy-coded video in a RIFF container -------------
# Motion-JPEG AVI (OpenDML / VfW spec: RIFF 'AVI ' → LIST hdrl(avih) →
# LIST movi with one '00dc' chunk per frame, fourcc MJPG) — each frame
# is a self-contained baseline JPEG, so the T.81 decoder in jpegcodec.py
# makes this a REAL compressed-video path with no external codec. This
# closes the "video stays stubbed" gap for the one mainstream format
# stdlib+numpy can honestly decode; inter-frame codecs (H.264/MP4)
# remain out of scope (a motion-compensated decoder is a library).


def encode_avi_mjpeg(width: int, height: int, jpeg_frames,
                     fps: int = 25) -> bytes:
    """Minimal spec-shaped MJPEG AVI: RIFF('AVI ', LIST hdrl(avih,
    LIST strl(strh,strf)), LIST movi('00dc' per frame))."""
    def chunk(cc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cc + _struct.pack("<I", len(data)) + data + pad

    def lst(cc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", cc + data)

    n = len(jpeg_frames)
    avih = _struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0,
        width, height, 0, 0, 0, 0)
    strh = _struct.pack(
        "<4s4sIHHIIIIIIII4H", b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, n, 0, 0xFFFFFFFF, 0, 0, 0, width, height)
    strf = _struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def try_parse_avi(payload):
    """AVI container → (width, height, n_frames, [(offset, size)]) of the
    video ('..dc'/'..db') chunks, walking the RIFF tree with no pixel
    work; None if not an AVI. Truncated tails stop the walk cleanly."""
    if not payload:
        return None
    buf = bytes(payload)
    if buf[0:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    w = h = None
    frames = []
    # Iterative walk with an explicit stack — a crafted AVI of ~1000
    # nested 12-byte LIST headers must not RecursionError a worker
    # (poisoned-asset contract; the fuzz test has a deep-nesting case).
    stack = [(12, len(buf))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cc = buf[pos:pos + 4]
            (size,) = _struct.unpack("<I", buf[pos + 4:pos + 8])
            body, nxt = pos + 8, pos + 8 + size + (size & 1)
            if nxt > end:
                break  # truncated chunk: ignore the tail
            if cc == b"LIST":
                stack.append((nxt, end))  # resume siblings after the LIST
                pos, end = body + 4, body + size
                continue
            elif cc == b"avih" and size >= 40:
                w, h = _struct.unpack("<II", buf[body + 32:body + 40])
            elif cc[2:4] in (b"dc", b"db"):
                frames.append((body, size))
            pos = nxt
    if w is None or not frames:
        return None
    return int(w), int(h), len(frames), frames


def decode_avi_frame(payload, frame_idx: int, parsed=None):
    """Grayscale pixels of frame ``frame_idx`` (JPEG-decoded) or None
    (unparsable container, out-of-range index, or a frame codec the
    baseline JPEG decoder rejects — e.g. an uncompressed '00db' DIB).
    Pass ``parsed`` (a ``try_parse_avi`` result) when iterating frames —
    re-walking the RIFF tree per frame would be O(frames × container)."""
    if parsed is None:
        parsed = try_parse_avi(payload)
    if parsed is None:
        return None
    _w, _h, n, frames = parsed
    if not (0 <= frame_idx < n):
        return None
    off, size = frames[frame_idx]
    return try_decode_jpeg(bytes(payload)[off:off + size])


# --- MP4 / ISO BMFF: the container walk is stdlib-real ----------------
# ISO/IEC 14496-12 box structure: ftyp + mdat + moov(trak(mdia(hdlr
# 'vide', minf(stbl(stsd codec, stts, stsc, stsz, stco))))). Parsing the
# sample tables — codec fourcc, per-sample sizes, chunk offsets — needs
# nothing beyond struct, so frame indexing/sampling is REAL for any MP4;
# per-frame DECODE is real when the track codec is JPEG ('jpeg'/'mjpa',
# QuickTime Motion-JPEG in MP4) via jpegcodec.py, and None for
# inter-frame codecs (avc1/hvc1 — a motion-compensated decoder is a
# library, not a module; that single step stays stubbed).


def _box(btype: bytes, payload: bytes) -> bytes:
    return _struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return _box(btype, _struct.pack(">I", version << 24) + payload)


def encode_mp4_mjpeg(width: int, height: int, jpeg_frames,
                     fps: int = 25) -> bytes:
    """Minimal spec-shaped MP4 with one 'jpeg'-codec video track; all
    samples in one chunk (stsc 1 entry, stco 1 absolute offset)."""
    return encode_mp4_video(width, height, jpeg_frames, fps=fps,
                            codec="jpeg")


def encode_mp4_video(width: int, height: int, jpeg_frames,
                     fps: int = 25, codec: str = "jpeg") -> bytes:
    """``encode_mp4_mjpeg`` generalized over the sample-entry fourcc:
    with ``codec='avc1'`` (or any other inter-frame fourcc) the sample
    payloads are opaque bytes — decodable=no, container-walkable=yes —
    which is exactly the shape the container-fingerprint dedup path
    exercises."""
    n = len(jpeg_frames)
    codec_4cc = codec.encode("latin-1")[:4].ljust(4, b"\x00")
    ftyp = _box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isommp41")
    mdat_payload = b"".join(jpeg_frames)
    mdat = _box(b"mdat", mdat_payload)
    chunk_off = len(ftyp) + 8  # mdat header is 8 bytes
    dur = n * fps
    mvhd = _full(b"mvhd", _struct.pack(">IIII", 0, 0, fps * fps, dur)
                 + b"\x00" * 80)
    tkhd = _full(b"tkhd", _struct.pack(">IIIII", 0, 0, 1, 0, dur)
                 + b"\x00" * 52
                 + _struct.pack(">II", width << 16, height << 16),
                 version=0)
    mdhd = _full(b"mdhd", _struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _full(b"hdlr", _struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"video\x00")
    # VisualSampleEntry 'jpeg': 6 reserved + data_ref_index, 16 bytes
    # pre_defined/reserved, width/height, resolution, frame_count,
    # compressorname(32), depth, pre_defined
    entry = (b"\x00" * 6 + _struct.pack(">H", 1) + b"\x00" * 16
             + _struct.pack(">HH", width, height)
             + _struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
             + b"\x00" * 32 + _struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", _struct.pack(">I", 1) + _box(codec_4cc, entry))
    stts = _full(b"stts", _struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", _struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", _struct.pack(">II", 0, n) + b"".join(
        _struct.pack(">I", len(f)) for f in jpeg_frames))
    stco = _full(b"stco", _struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", b"\x00" * 8, version=0)
    # dref with one self-contained 'url ' entry (flags=1)
    dref = _full(b"dref", _struct.pack(">I", 1)
                 + _struct.pack(">I", 12) + b"url " + _struct.pack(">I", 1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_children(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = _struct.unpack(">I", buf[pos:pos + 4])
        btype = buf[pos + 4:pos + 8]
        if size < 8 or pos + size > end:
            break  # size-0/64-bit/truncated: stop cleanly
        yield btype, pos + 8, pos + size
        pos += size


def _mp4_find(buf: bytes, pos: int, end: int, path: list[bytes]):
    for btype, body, bend in _mp4_children(buf, pos, end):
        if btype == path[0]:
            if len(path) == 1:
                yield body, bend
            else:
                yield from _mp4_find(buf, body, bend, path[1:])


def try_parse_mp4(payload):
    """MP4 → (width, height, n_samples, [(offset, size)], codec_fourcc)
    for the first video track, from the stsd/stsz/stsc/stco sample
    tables; None if not an ISO BMFF file with a video track."""
    if not payload:
        return None
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        return None
    for trak_body, trak_end in _mp4_find(buf, 0, len(buf),
                                         [b"moov", b"trak"]):
        hdlrs = list(_mp4_find(buf, trak_body, trak_end, [b"mdia", b"hdlr"]))
        if not hdlrs or buf[hdlrs[0][0] + 8:hdlrs[0][0] + 12] != b"vide":
            continue
        stbls = list(_mp4_find(buf, trak_body, trak_end,
                               [b"mdia", b"minf", b"stbl"]))
        if not stbls:
            continue
        sb, se = stbls[0]
        tables = {t: (b, e) for t, b, e in _mp4_children(buf, sb, se)}
        if not {b"stsd", b"stsz", b"stsc", b"stco"} <= set(tables):
            continue
        # stsd: entry_count(4 after version/flags) then first sample
        # entry. Every count is bounds-checked against its box before
        # unpacking — a corrupted table must parse to None, never raise
        db, de = tables[b"stsd"]
        if de - db < 44:
            continue
        codec = buf[db + 12:db + 16].decode("latin-1")
        w, h = _struct.unpack(">HH", buf[db + 40:db + 44])
        zb, ze = tables[b"stsz"]
        if ze - zb < 12:
            continue
        uniform, count = _struct.unpack(">II", buf[zb + 4:zb + 12])
        if count > len(buf):  # corrupted count: would allocate GBs
            continue
        if uniform:
            sizes = [uniform] * count
        elif zb + 12 + 4 * count <= ze:
            sizes = list(_struct.unpack(
                f">{count}I", buf[zb + 12:zb + 12 + 4 * count]))
        else:
            continue
        cb, ce = tables[b"stco"]
        if ce - cb < 8:
            continue
        (n_chunks,) = _struct.unpack(">I", buf[cb + 4:cb + 8])
        if cb + 8 + 4 * n_chunks > ce:
            continue
        chunk_offs = _struct.unpack(
            f">{n_chunks}I", buf[cb + 8:cb + 8 + 4 * n_chunks])
        scb, sce = tables[b"stsc"]
        if sce - scb < 8:
            continue
        (n_sc,) = _struct.unpack(">I", buf[scb + 4:scb + 8])
        if scb + 8 + 12 * n_sc > sce:
            continue
        sc = [_struct.unpack(">III", buf[scb + 8 + 12 * i:scb + 20 + 12 * i])
              for i in range(n_sc)]
        frames, s = [], 0
        for ci in range(n_chunks):
            per = next((spc for first, spc, _d in reversed(sc)
                        if first <= ci + 1), 0)
            off = chunk_offs[ci]
            for _ in range(per):
                if s >= count:
                    break
                frames.append((off, sizes[s]))
                off += sizes[s]
                s += 1
        if not frames:
            continue
        return int(w), int(h), len(frames), frames, codec
    return None


_MP4_JPEG_CODECS = {"jpeg", "mjpa", "mjpb"}


def decode_mp4_frame(payload, frame_idx: int, parsed=None):
    """Pixels of sample ``frame_idx`` when the track codec is JPEG;
    None for inter-frame codecs (avc1/...) or bad indexes."""
    if parsed is None:
        parsed = try_parse_mp4(payload)
    if parsed is None:
        return None
    _w, _h, n, frames, codec = parsed
    if codec not in _MP4_JPEG_CODECS or not (0 <= frame_idx < n):
        return None
    off, size = frames[frame_idx]
    return try_decode_jpeg(bytes(payload)[off:off + size])


def video_frame_features(df: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL frame sampling: every ``every_n``-th frame of each video row
    is decoded (Y4M Y plane, or MJPEG-AVI frame JPEG) and summarized —
    the decode half the codegen ``frame_sample`` plumbing was stubbed
    for. Arrow-batched; unknown containers emit ok=False rows instead of
    failing the worker."""
    schema = ("doc_id long, frame_idx int, y_mean double, "
              "width int, height int, ok boolean")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = try_parse_y4m(payload)
                decode = decode_y4m_frame
                if parsed is None:
                    parsed = try_parse_avi(payload)
                    decode = decode_avi_frame
                if parsed is None:
                    parsed = try_parse_mp4(payload)
                    decode = decode_mp4_frame
                if parsed is None:
                    rows.append((int(doc_id), -1, 0.0, 0, 0, False))
                    continue
                w, h, n = parsed[0], parsed[1], parsed[2]
                for f in range(0, n, every_n):
                    y = (decode(payload, f)
                         if decode is decode_y4m_frame
                         else decode(payload, f, parsed))
                    if y is None:  # per-frame codec failure: mark, don't kill
                        rows.append((int(doc_id), f, 0.0, w, h, False))
                        continue
                    rows.append((int(doc_id), f, float(y.mean()), w, h, True))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "y_mean",
                               "width", "height", "ok"])

    return df.filter(F.col("media_type") == "video").mapInPandas(batches, schema)
