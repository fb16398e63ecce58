"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

Round 3 closes the last multimodal stub: lossy JPEG payloads now DECODE
for real — marker walk, DQT/DHT table parsing, Huffman entropy decode
(with byte unstuffing and RSTn restart handling), dequantize, dezigzag,
float IDCT, chroma upsampling (sampling factors 1 and 2), JFIF
YCbCr→RGB. Everything is written from the public T.81 spec; no external
codec library is touched.

The encoder exists for fixtures and round-trip tests (grayscale and RGB,
optional 4:2:0 subsampling). It emits its Huffman tables in DHT, so the
decoder never assumes the Annex-K defaults — any valid table stream
decodes.

Why JPEG can still be hash-oracled despite being lossy: an image whose
8x8 blocks are each UNIFORM has only DC energy, and when the DC value
8*(v-128) is an exact multiple of the DC quant step the reconstruction
is EXACT (AC coefficients quantize to zero, the IDCT of a pure-DC block
is flat). At quality 50 the Annex-K luminance DC step is 16, so any
v = 128 + 2k round-trips bit-exactly — which is what the
``media_decode_jpeg`` driver query exploits: a closed-form SQL oracle
checks the decoded pixels of a genuinely entropy-coded JPEG.

Scale posture: decode runs inside Arrow-batched ``mapInPandas`` next to
the other codecs — one Python worker per core, payloads never shuffle.
``try_decode_jpeg`` is the vectorized production path (numpy
unstuffing, precomputed 16-bit sliding bit-windows, flat-LUT Huffman,
one batched IDCT per component — only the sequential code-length
dependency chain stays a Python loop, of ~6 integer ops per symbol);
``try_decode_jpeg_ref`` is the from-spec per-symbol decoder kept as the
cross-check, and a fuzz test pins the two byte-identical over the whole
encoder matrix. A production build can still drop libjpeg-turbo into
the same ``try_decode_jpeg`` slot without touching the Spark plan.
(Reference parity note: LoongCollector itself treats binary payloads as
opaque bytes; this module is part of the training-data-pipeline
surface, not a reference port.)
"""

from __future__ import annotations

import struct as _struct

import numpy as np

# --- tables (ITU-T T.81 Annex K, public) --------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (row-major)
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 DC Huffman specs: (bits[1..16] counts, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

# Annex K.3 AC luminance Huffman spec. The encoder uses it for BOTH AC
# tables (legal: tables travel in DHT; the decoder reads whatever the
# stream declares). Values are (run<<4)|size symbols.
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: T[k, n] = 0.5*c(k)*cos((2n+1)k*pi/16)
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = (1 / np.sqrt(2)) if _k == 0 else 1.0
        _T[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16)
del _k, _n, _c


def _scale_qtbl(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --- canonical Huffman construction -------------------------------------

def _huff_encode_table(bits, vals):
    """(bits, vals) → {symbol: (code, length)} canonical assignment."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


def _huff_decode_table(bits, vals):
    """(bits, vals) → {(length, code): symbol} for MSB-first decoding."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


# Lazy per-(bits, vals) caches: the DHT segment stores the raw spec; the
# reference path builds the {(length, code): symbol} dict, the fast path
# a flat 65536-entry LUT indexed by the next 16 bits, each built once per
# distinct table (streams from one encoder share tables across frames).
_HUFF_DICT_CACHE: dict = {}
_HUFF_LUT_CACHE: dict = {}


def _huff_dict(spec):
    t = _HUFF_DICT_CACHE.get(spec)
    if t is None:
        t = _HUFF_DICT_CACHE[spec] = _huff_decode_table(spec[0], spec[1])
    return t


def _huff_lut(spec):
    """16-bit-window LUT: entry = (symbol << 5) | code_length, 0 for an
    unassigned prefix (invalid code). Every valid code of length L fills
    the 2^(16-L) entries sharing its L-bit prefix, so one list index
    replaces up to 16 dict probes. Returned as a plain Python list —
    list indexing beats numpy scalar extraction ~3x in the symbol loop."""
    lut = _HUFF_LUT_CACHE.get(spec)
    if lut is None:
        bits, vals = spec
        arr = np.zeros(1 << 16, np.int32)
        code, i = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                arr[base:base + (1 << (16 - length))] = (
                    (vals[i] << 5) | length)
                code += 1
                i += 1
            code <<= 1
        lut = _HUFF_LUT_CACHE[spec] = arr.tolist()
    return lut


# --- bit I/O with 0xFF byte stuffing -------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Bulk-filled bit reader: bits accumulate in one Python int and every
    consume is shift+mask — no per-bit function calls (the per-bit
    variant spent the whole decode in call overhead; this is ~2.5x)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # marker byte that ended the segment

    def _fill_to(self, want: int):
        if self.nbits <= 32:  # trim consumed high bits so acc stays small
            self.acc &= (1 << self.nbits) - 1
        b = self.buf
        n = len(b)
        while self.nbits < want and self.marker is None:
            pos = self.pos
            if pos >= n:
                break
            byte = b[pos]
            if byte == 0xFF:
                nxt = b[pos + 1] if pos + 1 < n else None
                if nxt == 0x00:      # stuffed 0xFF data byte
                    self.pos = pos + 2
                elif nxt is None:    # dangling 0xFF: truncated stream
                    self.pos = pos + 1
                    break
                else:                # a real marker terminates entropy data
                    self.marker = nxt
                    break
            else:
                self.pos = pos + 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        return self.receive(1)

    def receive(self, n: int) -> int:
        if self.nbits < n:
            self._fill_to(n)
            if self.nbits < n:
                raise EOFError
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self):
        """Drop partial byte and consume an RSTn marker (for DRI)."""
        self.nbits = 0
        self.acc = 0
        self.marker = None
        b = self.buf
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return True
            self.pos += 1
        return False


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a size-bit magnitude to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader: _BitReader, table) -> int:
    if reader.nbits < 16:
        reader._fill_to(16)
    avail = reader.nbits
    if avail == 0:
        raise EOFError
    acc = reader.acc
    get = table.get
    for length in range(1, min(16, avail) + 1):
        sym = get((length, (acc >> (avail - length)) & ((1 << length) - 1)))
        if sym is not None:
            reader.nbits = avail - length
            return sym
    raise ValueError("invalid Huffman code")


# --- encoder --------------------------------------------------------------

def _fdct_quant_all(plane: np.ndarray, qtbl2d: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients for EVERY 8x8 block of a plane in
    one batched einsum — (gy, gx, 64) int32. Per-block Python matmuls
    were the encoder's bottleneck (one numpy call per block ~30us; the
    batch is one call per plane)."""
    h, w = plane.shape
    blocks = (plane.astype(np.float64) - 128.0).reshape(
        h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _T, blocks, _T, optimize=True)
    zz = np.round(coef / qtbl2d).astype(np.int32).reshape(
        h // 8, w // 8, 64)[..., ZIGZAG]
    return zz


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    diff = int(zz[0]) - pred
    mag = abs(diff)
    size = int(mag).bit_length()
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        sz = abs(v).bit_length()
        c, ln = ac_tab[(run << 4) | sz]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    if last < 63:
        c, ln = ac_tab[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + _struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, bits, vals) -> bytes:
    return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)


def _rgb_to_ycbcr(rgb: np.ndarray):
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _pad_to(img: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw_)."""
    h, w = img.shape
    ph = (-h) % bh
    pw = (-w) % bw_
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


def encode_jpeg(pixels, quality: int = 75, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder: (h, w) uint8 → grayscale JPEG; (h, w, 3)
    uint8 RGB → YCbCr 4:4:4 (or 4:2:0 when ``subsample``).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (what a parallel/streaming encoder produces)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy2 = _scale_qtbl(QTBL_LUMA, quality).reshape(8, 8)
    qc2 = _scale_qtbl(QTBL_CHROMA, quality).reshape(8, 8)
    dc_l = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(
        _scale_qtbl(QTBL_LUMA, quality)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(
            _scale_qtbl(QTBL_CHROMA, quality)[ZIGZAG].astype(np.uint8)))
    sfy = 0x22 if (subsample and not gray) else 0x11
    comps = ([(1, sfy, 0)] if gray
             else [(1, sfy, 0), (2, 0x11, 1), (3, 0x11, 1)])
    sof = _struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, sf, tq in comps:
        sof += bytes([cid, sf, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_payload(1, 1, AC_LUMA_BITS, AC_LUMA_VALS))
    if restart_interval:
        out += _seg(0xDD, _struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _sf, _tq in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    if gray:
        planes = [(arr.astype(np.float64), qy2, dc_l, 1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsample:
            ph = _pad_to(y, 2, 2)
            cb = _pad_to(cb, 2, 2)
            cr = _pad_to(cr, 2, 2)
            cb = cb.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean((1, 3))
            y = ph
            planes = [(y, qy2, dc_l, 2, 2), (cb, qc2, dc_c, 1, 1),
                      (cr, qc2, dc_c, 1, 1)]
        else:
            planes = [(y, qy2, dc_l, 1, 1), (cb, qc2, dc_c, 1, 1),
                      (cr, qc2, dc_c, 1, 1)]

    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad every plane to its full MCU-grid extent (edge replication)
    planes2 = []
    for plane, q2, dct, hs, vs in planes:
        plane = np.asarray(plane)
        need_h = mcus_y * 8 * vs
        need_w = mcus_x * 8 * hs
        ph = max(0, need_h - plane.shape[0])
        pw = max(0, need_w - plane.shape[1])
        if ph or pw:
            plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        planes2.append((plane[:need_h, :need_w], q2, dct, hs, vs))

    qblocks = [(_fdct_quant_all(plane, q2), dct, hs, vs)
               for plane, q2, dct, hs, vs in planes2]
    bw = _BitWriter()
    preds = [0] * len(planes2)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(planes2)
            mcu_count += 1
            for ci, (zzs, dct, hs, vs) in enumerate(qblocks):
                for by in range(vs):
                    for bx in range(hs):
                        zz = zzs[my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_block(bw, zz, preds[ci], dct, ac)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------

def try_decode_jpeg(payload):
    """Baseline JPEG → uint8 ndarray (h, w) gray or (h, w, 3) RGB; None
    for anything that isn't a decodable baseline sequential JPEG
    (progressive SOF2, arithmetic coding, 12-bit depth, truncation,
    undefined tables all return None instead of raising).

    Production path: vectorized entropy decode (numpy unstuffing, a
    precomputed 16-bit sliding bit-window, flat-LUT Huffman, one batched
    einsum IDCT per component). ``try_decode_jpeg_ref`` is the from-spec
    per-symbol decoder kept as the cross-check; a fuzz test pins the two
    byte-identical over encoder round-trips."""
    try:
        return _decode_jpeg(bytes(payload)) if payload else None
    except Exception:
        return None


def try_decode_jpeg_ref(payload):
    """The from-spec per-symbol reference decoder (oracle/test path)."""
    try:
        return _decode_jpeg(bytes(payload), fast=False) if payload else None
    except Exception:
        return None


def _decode_jpeg(buf: bytes, fast: bool = True):
    if buf[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            return None  # EOI before SOS
        (seglen,) = _struct.unpack(">H", buf[pos + 2:pos + 4])
        body = buf[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = tbl  # stored zigzag → natural order
                qtables[tid] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1:i + 17])
                n = sum(bits)
                vals = tuple(body[i + 17:i + 17 + n])
                huff[(cls, tid)] = (bits, vals)  # raw spec; built lazily
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _struct.unpack(">H", body[:2])
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, fh, fw, nc = _struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, sf, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            fh, fw, comps = frame
            ns = body[0]
            if ns != len(comps):
                # multi-scan sequential (one scan per component): only
                # the first scan would be read — refuse, don't garble
                return None
            sel = []
            for s in range(ns):
                cs, tabs = body[1 + 2 * s], body[2 + 2 * s]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    return None
                sel.append((comp, tabs >> 4, tabs & 0x0F))
            decode = _decode_scan_fast if fast else _decode_scan
            return decode(buf, pos, fh, fw, sel, qtables, huff,
                          restart_interval)
        # APPn / COM / others: skipped
    return None


def _decode_scan(buf, pos, fh, fw, sel, qtables, huff, dri):
    hmax = max(c["h"] for c, _d, _a in sel)
    vmax = max(c["v"] for c, _d, _a in sel)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return None
    reader = _BitReader(buf, pos)
    preds = [0] * len(sel)

    class _Bad(Exception):
        pass

    def read_block(ci, dc_tab, ac_tab, q2):
        zz = np.zeros(64, np.int32)
        size = _huff_decode(reader, dc_tab)
        diff = _extend(reader.receive(size), size) if size else 0
        preds[ci] += diff
        zz[0] = preds[ci]
        k = 1
        while k < 64:
            sym = _huff_decode(reader, ac_tab)
            if sym == 0x00:  # EOB
                break
            run, sz = sym >> 4, sym & 0x0F
            if sz == 0:
                if run != 15:  # only ZRL is legal
                    raise _Bad
                k += 16
                continue
            k += run
            if k > 63:
                raise _Bad
            zz[k] = _extend(reader.receive(sz), sz)
            k += 1
        nat = np.zeros(64, np.float64)
        nat[ZIGZAG] = zz  # dezigzag to natural order
        return (_T.T @ ((nat.reshape(8, 8) * q2)) @ _T) + 128.0

    def tables(comp, dc_id, ac_id):
        dc_spec = huff.get((0, dc_id))
        ac_spec = huff.get((1, ac_id))
        q2 = qtables.get(comp["tq"])
        if dc_spec is None or ac_spec is None or q2 is None:
            raise _Bad
        return _huff_dict(dc_spec), _huff_dict(ac_spec), q2

    if len(sel) == 1:
        # T.81 A.2.3: a single-component scan is NON-interleaved — the
        # MCU is exactly one 8x8 data unit walking the component's own
        # block grid in raster order, whatever its sampling factors say
        # (a sole component is full resolution; factors are relative).
        comp, dc_id, ac_id = sel[0]
        sel = [(dict(comp, h=1, v=1), dc_id, ac_id)]
        hmax = vmax = 1
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * comp["v"], mcus_x * 8 * comp["h"]),
                 np.float64)
        for comp, _dc, _ac in sel
    ]
    mcu_count = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and mcu_count and mcu_count % dri == 0:
                    if not reader.align_to_marker():
                        return None
                    preds = [0] * len(sel)
                for ci, (comp, dc_id, ac_id) in enumerate(sel):
                    dc_tab, ac_tab, q2 = tables(comp, dc_id, ac_id)
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = read_block(ci, dc_tab, ac_tab, q2)
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
                mcu_count += 1
    except _Bad:
        return None
    # crop + upsample (sample replication) to full resolution
    full = []
    for (comp, _d, _a), plane in zip(sel, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- vectorized decoder (production path) ---------------------------------
#
# Same semantics as _decode_scan, restructured for throughput: the
# per-symbol work drops from dict probes + _BitReader method calls +
# per-block numpy allocations to three Python-list index reads, and ALL
# numeric work (unstuffing, bit-window precompute, dezigzag, dequantize,
# IDCT, plane assembly) becomes whole-frame numpy. The per-MCU Huffman
# DEPENDENCY chain is inherently sequential (each code's length decides
# where the next starts), so the symbol loop stays a Python loop — but a
# loop of O(1) integer ops, not object machinery. Measured ~8-10x on the
# fixture mix; a native codec can still drop into try_decode_jpeg later
# without touching the Spark plan.


def _entropy_stream(buf: bytes, pos: int):
    """Unstuff the entropy-coded bytes starting at ``pos``: drop the
    0x00 after each stuffed 0xFF, record RSTn positions as segment cut
    points, stop at the first real marker (or dangling 0xFF). Returns
    (unstuffed uint8 array, cut offsets in unstuffed coordinates)."""
    arr = np.frombuffer(buf, np.uint8, len(buf) - pos, pos)
    ffs = np.nonzero(arr == 0xFF)[0]
    drops, bounds = [], []
    end = len(arr)
    n = len(arr)
    for p in ffs.tolist():
        if p + 1 >= n:
            end = p  # dangling 0xFF: truncated stream
            break
        nxt = arr[p + 1]
        if nxt == 0x00:
            drops.append(p + 1)
        elif 0xD0 <= nxt <= 0xD7:
            bounds.append(p)
            drops.append(p)
            drops.append(p + 1)
        else:
            end = p  # a real marker terminates entropy data
            break
    da = np.array([d for d in drops if d < end], np.int64)
    mask = np.ones(end, bool)
    mask[da] = False
    unst = arr[:end][mask]
    cuts = [int(b - np.searchsorted(da, b)) for b in bounds if b < end]
    return unst, cuts


def _bit_windows(seg: np.ndarray):
    """win[i] = the 16 bits starting at bit i (MSB-first), zero-padded
    past the end — as a Python list (list indexing beats numpy scalar
    extraction in the symbol loop). Returns (win, n_valid_bits)."""
    by = np.concatenate([seg, np.zeros(4, np.uint8)]).astype(np.uint32)
    w24 = (by[:-2] << 16) | (by[1:-1] << 8) | by[2:]
    win = (w24[:, None] >> (8 - np.arange(8, dtype=np.uint32))[None, :]
           ) & 0xFFFF
    return win.reshape(-1).tolist(), len(seg) * 8


def _decode_scan_fast(buf, pos, fh, fw, sel, qtables, huff, dri):
    hmax = max(c["h"] for c, _d, _a in sel)
    vmax = max(c["v"] for c, _d, _a in sel)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return None
    if len(sel) == 1:
        # T.81 A.2.3 non-interleaved single-component scan (see
        # _decode_scan): one 8x8 unit per MCU at full resolution
        comp, dc_id, ac_id = sel[0]
        sel = [(dict(comp, h=1, v=1), dc_id, ac_id)]
        hmax = vmax = 1
    comps = []
    for comp, dc_id, ac_id in sel:
        dc_spec = huff.get((0, dc_id))
        ac_spec = huff.get((1, ac_id))
        q2 = qtables.get(comp["tq"])
        if dc_spec is None or ac_spec is None or q2 is None:
            return None
        comps.append((comp, _huff_lut(dc_spec), _huff_lut(ac_spec), q2))
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    total_mcus = mcus_x * mcus_y
    stride = sum(c["h"] * c["v"] for c, _d, _a in sel)
    plan = []  # one (ci, dc_lut, ac_lut) per block of an MCU, in order
    for ci, (comp, dcl, acl, _q) in enumerate(comps):
        plan.extend([(ci, dcl, acl)] * (comp["v"] * comp["h"]))

    unst, cuts = _entropy_stream(buf, pos)
    if dri:
        seg_bounds = [0] + cuts + [len(unst)]
        n_segs = -(-total_mcus // dri)
        if len(seg_bounds) - 1 < n_segs:
            return None  # fewer restart segments than MCUs demand
    else:
        if cuts:
            return None  # RST marker without DRI: reject, don't garble
        seg_bounds = [0, len(unst)]
        n_segs = 1

    coefs = np.zeros(total_mcus * stride * 64, np.int32)
    idx_i, vals_i = [], []  # flat block*64+k indices: one append, not two
    blk = 0
    try:
        for s in range(n_segs):
            win, nbits = _bit_windows(unst[seg_bounds[s]:seg_bounds[s + 1]])
            bp = 0
            preds = [0] * len(comps)
            first = s * (dri or total_mcus)
            for _m in range(first, min(total_mcus, first + (dri or total_mcus))):
                for ci, dcl, acl in plan:
                    e = dcl[win[bp]]
                    if e == 0:
                        return None  # invalid Huffman code
                    bp += e & 31
                    size = e >> 5
                    if size:
                        m = win[bp] >> (16 - size)
                        bp += size
                        diff = (m if m >= (1 << (size - 1))
                                else m - (1 << size) + 1)
                        preds[ci] += diff
                    idx_i.append(blk << 6)
                    vals_i.append(preds[ci])
                    k = 1
                    while k < 64:
                        e = acl[win[bp]]
                        if e == 0:
                            return None
                        bp += e & 31
                        sym = e >> 5
                        if sym == 0:  # EOB
                            break
                        run, sz = sym >> 4, sym & 15
                        if sz == 0:
                            if run != 15:  # only ZRL is legal
                                return None
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            return None
                        m = win[bp] >> (16 - sz)
                        bp += sz
                        idx_i.append(blk << 6 | k)
                        vals_i.append(m if m >= (1 << (sz - 1))
                                      else m - (1 << sz) + 1)
                        k += 1
                    blk += 1
                if bp > nbits:
                    return None  # truncated entropy data
    except IndexError:
        return None  # ran far off the padded window array: truncated

    coefs[idx_i] = vals_i
    coefs = coefs.reshape(total_mcus * stride, 64)
    planes = []
    off = 0
    for comp, _d, _a, q2 in comps:
        h_, v_ = comp["h"], comp["v"]
        hb, wb = mcus_y * v_, mcus_x * h_
        my = np.arange(hb) // v_
        by = np.arange(hb) % v_
        mx = np.arange(wb) // h_
        bx = np.arange(wb) % h_
        idx = (((my * mcus_x)[:, None] + mx[None, :]) * stride
               + off + (by * h_)[:, None] + bx[None, :])
        nat = (coefs[idx][..., _UNZIG] * q2.reshape(-1)).astype(np.float64)
        # same association as the reference's (T.T @ M) @ T, batched
        out = np.matmul(np.matmul(_T.T, nat.reshape(hb, wb, 8, 8)), _T) + 128.0
        planes.append(out.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8))
        off += v_ * h_
    # crop + upsample (sample replication) to full resolution — identical
    # tail to _decode_scan
    full = []
    for (comp, _d, _a, _q), plane in zip(comps, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
