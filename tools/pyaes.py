"""Minimal AES-128/192/256 ECB with PKCS#7 padding — pure Python.

Used ONLY as the independent known-answer model for processor_encrypt
(the production path is Spark's JVM-native ``aes_encrypt``): the unit
test encrypts fixed vectors on both sides and compares byte-for-byte,
which pins the JVM output to the public FIPS-197 algorithm.

Implements FIPS-197 directly; tables are derived (GF(2^8) log/antilog)
rather than transcribed. Self-checks the FIPS-197 appendix C.1 vector on
import.
"""

from __future__ import annotations


def _build_tables():
    def xtime(a: int) -> int:
        return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1

    exp, log = [0] * 510, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= xtime(x)  # multiply by generator 0x03
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = []
    for a in range(256):
        b, c = inv(a), 0
        for i in range(8):
            bit = (
                (b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8)) ^ (0x63 >> i)
            ) & 1
            c |= bit << i
        sbox.append(c)

    def gmul(a: int, b: int) -> int:
        return 0 if a == 0 or b == 0 else exp[log[a] + log[b]]

    return sbox, gmul


_SBOX, _GMUL = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    assert nk in (4, 6, 8), "AES key must be 16/24/32 bytes"
    nr = nk + 6
    words = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [sum(words[4 * r: 4 * r + 4], []) for r in range(nr + 1)]


def _encrypt_block(block: bytes, round_keys: list[list[int]]) -> bytes:
    nr = len(round_keys) - 1
    # state in column-major order, matching the FIPS-197 byte layout
    s = [block[r + 4 * c] for c in range(4) for r in range(4)]

    def add_round_key(s, rk):
        return [b ^ k for b, k in zip(s, rk)]

    def sub_shift(s):
        # SubBytes + ShiftRows on the flat column-major list
        out = [0] * 16
        for c in range(4):
            for r in range(4):
                out[r + 4 * c] = _SBOX[s[r + 4 * ((c + r) % 4)]]
        return out

    def mix_columns(s):
        out = [0] * 16
        for c in range(4):
            col = s[4 * c: 4 * c + 4]
            out[4 * c + 0] = _GMUL(col[0], 2) ^ _GMUL(col[1], 3) ^ col[2] ^ col[3]
            out[4 * c + 1] = col[0] ^ _GMUL(col[1], 2) ^ _GMUL(col[2], 3) ^ col[3]
            out[4 * c + 2] = col[0] ^ col[1] ^ _GMUL(col[2], 2) ^ _GMUL(col[3], 3)
            out[4 * c + 3] = _GMUL(col[0], 3) ^ col[1] ^ col[2] ^ _GMUL(col[3], 2)
        return out

    s = add_round_key(s, round_keys[0])
    for rnd in range(1, nr):
        s = add_round_key(mix_columns(sub_shift(s)), round_keys[rnd])
    s = add_round_key(sub_shift(s), round_keys[nr])
    return bytes(s[r + 4 * c] for c in range(4) for r in range(4))


def aes_ecb_encrypt(plaintext: bytes, key: bytes) -> bytes:
    """AES-ECB with PKCS#7 padding (Spark aes_encrypt(..., 'ECB') twin)."""
    rk = _expand_key(key)
    pad = 16 - len(plaintext) % 16
    data = plaintext + bytes([pad]) * pad
    return b"".join(
        _encrypt_block(data[i: i + 16], rk) for i in range(0, len(data), 16)
    )


# FIPS-197 appendix C.1 known-answer self-check
_kat = _encrypt_block(
    bytes.fromhex("00112233445566778899aabbccddeeff"),
    _expand_key(bytes.fromhex("000102030405060708090a0b0c0d0e0f")),
)
assert _kat == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"), _kat.hex()


if __name__ == "__main__":
    import sys

    key = sys.argv[1].encode() if len(sys.argv) > 1 else b"0123456789abcdef"
    for line in sys.stdin:
        print(aes_ecb_encrypt(line.rstrip("\n").encode(), key).hex())
