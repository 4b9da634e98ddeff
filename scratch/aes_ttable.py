"""Scratch: T-table AES (the standard Rijndael 32-bit-word construction
from the public FIPS-197 / Rijndael reference material) to replace the
per-byte _gmul path in core/crypt.py.  Cross-checked against the existing
implementation and the FIPS-197 Appendix C vectors before merging."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pdfparser_spark.core.crypt import (
    _SBOX,
    _INV_SBOX,
    _gmul,
    _expand_key,
    _encrypt_block,
    _decrypt_block,
)

# --- table construction (done once at import) ------------------------------

_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
_TD0 = [0] * 256
_TD1 = [0] * 256
_TD2 = [0] * 256
_TD3 = [0] * 256
for b in range(256):
    s = _SBOX[b]
    t = (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
    _TE0[b] = t
    _TE1[b] = ((t >> 8) | (t << 24)) & 0xFFFFFFFF
    _TE2[b] = ((t >> 16) | (t << 16)) & 0xFFFFFFFF
    _TE3[b] = ((t >> 24) | (t << 8)) & 0xFFFFFFFF
    si = _INV_SBOX[b]
    t = (_gmul(si, 14) << 24) | (_gmul(si, 9) << 16) | (_gmul(si, 13) << 8) | _gmul(si, 11)
    _TD0[b] = t
    _TD1[b] = ((t >> 8) | (t << 24)) & 0xFFFFFFFF
    _TD2[b] = ((t >> 16) | (t << 16)) & 0xFFFFFFFF
    _TD3[b] = ((t >> 24) | (t << 8)) & 0xFFFFFFFF


def _words(w: list) -> list:
    """Round-key byte rows -> big-endian 32-bit words."""
    return [(x[0] << 24) | (x[1] << 16) | (x[2] << 8) | x[3] for x in w]


def _inv_mix_word(x: int) -> int:
    b = [(x >> 24) & 0xFF, (x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF]
    return (
        ((_gmul(b[0], 14) ^ _gmul(b[1], 11) ^ _gmul(b[2], 13) ^ _gmul(b[3], 9)) << 24)
        | ((_gmul(b[0], 9) ^ _gmul(b[1], 14) ^ _gmul(b[2], 11) ^ _gmul(b[3], 13)) << 16)
        | ((_gmul(b[0], 13) ^ _gmul(b[1], 9) ^ _gmul(b[2], 14) ^ _gmul(b[3], 11)) << 8)
        | (_gmul(b[0], 11) ^ _gmul(b[1], 13) ^ _gmul(b[2], 9) ^ _gmul(b[3], 14))
    )


def expand_key_tt(key: bytes):
    """(enc_round_words, dec_round_words, nr): decryption uses the
    equivalent-inverse-cipher schedule (InvMixColumns over the middle
    round keys, order reversed)."""
    w, nr = _expand_key(key)
    rk = _words(w)
    drk = []
    for rnd in range(nr, -1, -1):
        ws = rk[4 * rnd : 4 * rnd + 4]
        if 0 < rnd < nr:
            ws = [_inv_mix_word(x) for x in ws]
        drk.extend(ws)
    return rk, drk, nr


def encrypt_block_tt(block: bytes, rk: list, nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    k = 4
    for _ in range(nr - 1):
        t0 = _TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 0xFF] ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ rk[k]
        t1 = _TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 0xFF] ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ rk[k + 1]
        t2 = _TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 0xFF] ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ rk[k + 2]
        t3 = _TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 0xFF] ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ rk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    # final round: SubBytes + ShiftRows + AddRoundKey, no MixColumns
    b = _SBOX
    t0 = ((b[s0 >> 24] << 24) | (b[(s1 >> 16) & 0xFF] << 16) | (b[(s2 >> 8) & 0xFF] << 8) | b[s3 & 0xFF]) ^ rk[k]
    t1 = ((b[s1 >> 24] << 24) | (b[(s2 >> 16) & 0xFF] << 16) | (b[(s3 >> 8) & 0xFF] << 8) | b[s0 & 0xFF]) ^ rk[k + 1]
    t2 = ((b[s2 >> 24] << 24) | (b[(s3 >> 16) & 0xFF] << 16) | (b[(s0 >> 8) & 0xFF] << 8) | b[s1 & 0xFF]) ^ rk[k + 2]
    t3 = ((b[s3 >> 24] << 24) | (b[(s0 >> 16) & 0xFF] << 16) | (b[(s1 >> 8) & 0xFF] << 8) | b[s2 & 0xFF]) ^ rk[k + 3]
    return b"".join(x.to_bytes(4, "big") for x in (t0, t1, t2, t3))


def decrypt_block_tt(block: bytes, drk: list, nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ drk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ drk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ drk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ drk[3]
    k = 4
    for _ in range(nr - 1):
        t0 = _TD0[s0 >> 24] ^ _TD1[(s3 >> 16) & 0xFF] ^ _TD2[(s2 >> 8) & 0xFF] ^ _TD3[s1 & 0xFF] ^ drk[k]
        t1 = _TD0[s1 >> 24] ^ _TD1[(s0 >> 16) & 0xFF] ^ _TD2[(s3 >> 8) & 0xFF] ^ _TD3[s2 & 0xFF] ^ drk[k + 1]
        t2 = _TD0[s2 >> 24] ^ _TD1[(s1 >> 16) & 0xFF] ^ _TD2[(s0 >> 8) & 0xFF] ^ _TD3[s3 & 0xFF] ^ drk[k + 2]
        t3 = _TD0[s3 >> 24] ^ _TD1[(s2 >> 16) & 0xFF] ^ _TD2[(s1 >> 8) & 0xFF] ^ _TD3[s0 & 0xFF] ^ drk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    b = _INV_SBOX
    t0 = ((b[s0 >> 24] << 24) | (b[(s3 >> 16) & 0xFF] << 16) | (b[(s2 >> 8) & 0xFF] << 8) | b[s1 & 0xFF]) ^ drk[k]
    t1 = ((b[s1 >> 24] << 24) | (b[(s0 >> 16) & 0xFF] << 16) | (b[(s3 >> 8) & 0xFF] << 8) | b[s2 & 0xFF]) ^ drk[k + 1]
    t2 = ((b[s2 >> 24] << 24) | (b[(s1 >> 16) & 0xFF] << 16) | (b[(s0 >> 8) & 0xFF] << 8) | b[s3 & 0xFF]) ^ drk[k + 2]
    t3 = ((b[s3 >> 24] << 24) | (b[(s2 >> 16) & 0xFF] << 16) | (b[(s1 >> 8) & 0xFF] << 8) | b[s0 & 0xFF]) ^ drk[k + 3]
    return b"".join(x.to_bytes(4, "big") for x in (t0, t1, t2, t3))


if __name__ == "__main__":
    import time

    # FIPS-197 Appendix C vectors
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for klen, exp in (
        (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (32, "8ea2b7ca516745bfeafc49904b496089"),
    ):
        key = bytes(range(klen))
        rk, drk, nr = expand_key_tt(key)
        ct = encrypt_block_tt(pt, rk, nr)
        assert ct.hex() == exp, (klen, ct.hex())
        assert decrypt_block_tt(ct, drk, nr) == pt
    print("FIPS-197 OK")
    # cross-check vs the existing implementation on random blocks
    rnd = os.urandom
    for klen in (16, 24, 32):
        key = rnd(klen)
        w, nr0 = _expand_key(key)
        rk, drk, nr = expand_key_tt(key)
        assert nr == nr0
        for _ in range(200):
            blk = rnd(16)
            assert encrypt_block_tt(blk, rk, nr) == _encrypt_block(blk, w, nr0)
            assert decrypt_block_tt(blk, drk, nr) == _decrypt_block(blk, w, nr0)
    print("cross-check OK")
    # speed
    key = rnd(16)
    w, nr0 = _expand_key(key)
    rk, drk, nr = expand_key_tt(key)
    blk = rnd(16)
    N = 20000
    t0 = time.time()
    for _ in range(N):
        blk2 = _encrypt_block(blk, w, nr0)
    told = time.time() - t0
    t0 = time.time()
    for _ in range(N):
        blk2 = encrypt_block_tt(blk, rk, nr)
    tnew = time.time() - t0
    print(f"old {told:.2f}s new {tnew:.2f}s speedup {told/tnew:.1f}x")
