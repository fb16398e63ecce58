"""SpookyHash V2 — pure-Python implementation from Bob Jenkins' public-domain
specification (burtleburtle.net/bob/hash/spooky.html, SpookyV2.cpp).

Backs the SPL scalars ``spooky_hash_v2_32`` / ``spooky_hash_v2_64`` (Presto
lineage; the reference registers them in its SPL function table and exercises
them in core/unittest/spl/spl.txt:77-78 on a 4-byte VARBINARY). Presto
computes them via airlift's SpookyHashV2 with seed 0 and returns the hash as
big-endian bytes; we mirror that output contract.

Verification posture (documented in tests/test_spl.py):
- the empty-input vector ``hash64(b"", 0) == 0x232706FC6BF50919`` is the
  widely published known answer for SpookyHash V2 (it appears in the test
  suites of multiple independent open-source ports) and exercises the whole
  ShortEnd constant cascade;
- ``hash32 == hash64 & 0xFFFFFFFF`` is an algebraic identity of the spec
  (Hash32 truncates Hash64, which takes the low half of Hash128);
- inputs < 192 bytes (everything SPL's corpus uses) take the *short* path,
  which the empty vector pins; the long path (>= 192 bytes, Mix/End over
  96-byte blocks) is implemented from the same spec for completeness and is
  covered by determinism + avalanche property tests only — no public vector
  is vendored here.

Python-int arithmetic, masked to 64 bits; used only inside Arrow-batched
pandas UDFs, never in a JVM hot path.
"""
from __future__ import annotations

import struct

_M = 0xFFFFFFFFFFFFFFFF
_SC_CONST = 0xDEADBEEFDEADBEEF
_NUMVARS = 12
_BLOCKSIZE = _NUMVARS * 8      # 96
_BUFSIZE = 2 * _BLOCKSIZE      # 192


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _M


def _short_mix(h0, h1, h2, h3):
    h2 = _rot(h2, 50); h2 = (h2 + h3) & _M; h0 ^= h2
    h3 = _rot(h3, 52); h3 = (h3 + h0) & _M; h1 ^= h3
    h0 = _rot(h0, 30); h0 = (h0 + h1) & _M; h2 ^= h0
    h1 = _rot(h1, 41); h1 = (h1 + h2) & _M; h3 ^= h1
    h2 = _rot(h2, 54); h2 = (h2 + h3) & _M; h0 ^= h2
    h3 = _rot(h3, 48); h3 = (h3 + h0) & _M; h1 ^= h3
    h0 = _rot(h0, 38); h0 = (h0 + h1) & _M; h2 ^= h0
    h1 = _rot(h1, 37); h1 = (h1 + h2) & _M; h3 ^= h1
    h2 = _rot(h2, 62); h2 = (h2 + h3) & _M; h0 ^= h2
    h3 = _rot(h3, 34); h3 = (h3 + h0) & _M; h1 ^= h3
    h0 = _rot(h0, 5);  h0 = (h0 + h1) & _M; h2 ^= h0
    h1 = _rot(h1, 36); h1 = (h1 + h2) & _M; h3 ^= h1
    return h0, h1, h2, h3


def _short_end(h0, h1, h2, h3):
    h3 ^= h2; h2 = _rot(h2, 15); h3 = (h3 + h2) & _M
    h0 ^= h3; h3 = _rot(h3, 52); h0 = (h0 + h3) & _M
    h1 ^= h0; h0 = _rot(h0, 26); h1 = (h1 + h0) & _M
    h2 ^= h1; h1 = _rot(h1, 51); h2 = (h2 + h1) & _M
    h3 ^= h2; h2 = _rot(h2, 28); h3 = (h3 + h2) & _M
    h0 ^= h3; h3 = _rot(h3, 9);  h0 = (h0 + h3) & _M
    h1 ^= h0; h0 = _rot(h0, 47); h1 = (h1 + h0) & _M
    h2 ^= h1; h1 = _rot(h1, 54); h2 = (h2 + h1) & _M
    h3 ^= h2; h2 = _rot(h2, 32); h3 = (h3 + h2) & _M
    h0 ^= h3; h3 = _rot(h3, 25); h0 = (h0 + h3) & _M
    h1 ^= h0; h0 = _rot(h0, 63); h1 = (h1 + h0) & _M
    return h0, h1, h2, h3


def _short(message: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    """SpookyV2::Short — inputs under 192 bytes."""
    length = len(message)
    a, b = seed1 & _M, seed2 & _M
    c = d = _SC_CONST
    i = 0
    if length > 15:
        end = (length // 32) * 32
        while i < end:
            c = (c + struct.unpack_from("<Q", message, i)[0]) & _M
            d = (d + struct.unpack_from("<Q", message, i + 8)[0]) & _M
            a, b, c, d = _short_mix(a, b, c, d)
            a = (a + struct.unpack_from("<Q", message, i + 16)[0]) & _M
            b = (b + struct.unpack_from("<Q", message, i + 24)[0]) & _M
            i += 32
        if length - i >= 16:
            c = (c + struct.unpack_from("<Q", message, i)[0]) & _M
            d = (d + struct.unpack_from("<Q", message, i + 8)[0]) & _M
            a, b, c, d = _short_mix(a, b, c, d)
            i += 16
    remainder = length - i
    d = (d + ((length & _M) << 56)) & _M
    rest = message[i:]
    # the reference switch falls through from 15 down to the break cases
    if remainder >= 12:
        if remainder == 15:
            d = (d + (rest[14] << 48)) & _M
        if remainder >= 14:
            d = (d + (rest[13] << 40)) & _M
        if remainder >= 13:
            d = (d + (rest[12] << 32)) & _M
        d = (d + struct.unpack_from("<I", rest, 8)[0]) & _M
        c = (c + struct.unpack_from("<Q", rest, 0)[0]) & _M
    elif remainder >= 8:
        if remainder == 11:
            d = (d + (rest[10] << 16)) & _M
        if remainder >= 10:
            d = (d + (rest[9] << 8)) & _M
        if remainder >= 9:
            d = (d + rest[8]) & _M
        c = (c + struct.unpack_from("<Q", rest, 0)[0]) & _M
    elif remainder >= 4:
        if remainder == 7:
            c = (c + (rest[6] << 48)) & _M
        if remainder >= 6:
            c = (c + (rest[5] << 40)) & _M
        if remainder >= 5:
            c = (c + (rest[4] << 32)) & _M
        c = (c + struct.unpack_from("<I", rest, 0)[0]) & _M
    elif remainder >= 1:
        if remainder == 3:
            c = (c + (rest[2] << 16)) & _M
        if remainder >= 2:
            c = (c + (rest[1] << 8)) & _M
        c = (c + rest[0]) & _M
    else:
        c = (c + _SC_CONST) & _M
        d = (d + _SC_CONST) & _M
    a, b, c, d = _short_end(a, b, c, d)
    return a, b


def _mix(data, s):
    rots = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
    for j in range(12):
        s[j] = (s[j] + data[j]) & _M
        s[(j + 2) % 12] ^= s[(j + 10) % 12]
        s[(j + 11) % 12] ^= s[j]
        s[j] = _rot(s[j], rots[j])
        s[(j + 11) % 12] = (s[(j + 11) % 12] + s[(j + 1) % 12]) & _M
    return s


def _end_partial(h):
    rots = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)
    for j in range(12):
        h[(j + 11) % 12] = (h[(j + 11) % 12] + h[(j + 1) % 12]) & _M
        h[(j + 2) % 12] ^= h[(j + 11) % 12]
        h[(j + 1) % 12] = _rot(h[(j + 1) % 12], rots[j])
    return h


def _end(data, h):
    for j in range(12):
        h[j] = (h[j] + data[j]) & _M
    h = _end_partial(h)
    h = _end_partial(h)
    h = _end_partial(h)
    return h


def hash128(message: bytes, seed1: int = 0, seed2: int = 0) -> tuple[int, int]:
    """SpookyV2::Hash128 — (hash1, hash2) as unsigned 64-bit ints."""
    if len(message) < _BUFSIZE:
        return _short(message, seed1, seed2)
    length = len(message)
    s = [0] * 12
    s[0] = s[3] = s[6] = s[9] = seed1 & _M
    s[1] = s[4] = s[7] = s[10] = seed2 & _M
    s[2] = s[5] = s[8] = s[11] = _SC_CONST
    nblocks = length // _BLOCKSIZE
    i = 0
    for _ in range(nblocks):
        data = struct.unpack_from("<12Q", message, i)
        s = _mix(data, s)
        i += _BLOCKSIZE
    remainder = length - i
    buf = bytearray(_BLOCKSIZE)
    buf[:remainder] = message[i:]
    buf[_BLOCKSIZE - 1] = remainder
    s = _end(struct.unpack("<12Q", bytes(buf)), s)
    return s[0], s[1]


def hash64(message: bytes, seed: int = 0) -> int:
    return hash128(message, seed, seed)[0]


def hash32(message: bytes, seed: int = 0) -> int:
    return hash64(message, seed & 0xFFFFFFFF) & 0xFFFFFFFF
