"""ECDSA over NIST P-256 — FIPS 186-4 / SEC 1 / SEC 2 public parameters,
with RFC 6979 deterministic nonces for the synth signer.

The modern real-world PDF signature algorithm (ETSI PAdES profiles sign
ECDSA-with-SHA256); the verifier side consumes the DER (r, s) SEQUENCE
CMS carries in SignerInfo.signature.  Pure Python affine arithmetic
(modular inverses via ``pow(x, -1, p)``): a verification is two scalar
multiplications, ~10 ms — one per signed document, far off any hot
path.  All constants are the published SEC 2 curve parameters."""

from __future__ import annotations

import hashlib
import hmac

# SEC 2 secp256r1
P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
A = P - 3
B = 0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B
GX = 0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296
GY = 0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5
N = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551

_INF = None


def _add(p1, p2):
    if p1 is _INF:
        return p2
    if p2 is _INF:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return _INF
        lam = (3 * x1 * x1 + A) * pow(2 * y1, -1, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _mul(k: int, point):
    acc = _INF
    addend = point
    while k:
        if k & 1:
            acc = _add(acc, addend)
        addend = _add(addend, addend)
        k >>= 1
    return acc


def on_curve(x: int, y: int) -> bool:
    return (y * y - (x * x * x + A * x + B)) % P == 0


def public_key(d: int):
    """Q = d * G."""
    return _mul(d, (GX, GY))


def _bits2int(data: bytes) -> int:
    v = int.from_bytes(data, "big")
    excess = len(data) * 8 - N.bit_length()
    return v >> excess if excess > 0 else v


def rfc6979_nonce(d: int, h1: bytes) -> int:
    """Deterministic k (RFC 6979 §3.2, HMAC-SHA256)."""
    holen = 32
    x = d.to_bytes(32, "big")
    h1i = (_bits2int(h1) % N).to_bytes(32, "big")
    v = b"\x01" * holen
    k = b"\x00" * holen
    k = hmac.new(k, v + b"\x00" + x + h1i, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    k = hmac.new(k, v + b"\x01" + x + h1i, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(k, v, hashlib.sha256).digest()
        cand = _bits2int(v)
        if 1 <= cand < N:
            return cand
        k = hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()


def sign(d: int, digest: bytes) -> tuple[int, int]:
    """Deterministic ECDSA: (r, s) over the message DIGEST."""
    e = _bits2int(digest) % N
    while True:
        k = rfc6979_nonce(d, digest)
        x1, _y1 = _mul(k, (GX, GY))
        r = x1 % N
        if r == 0:
            continue  # pragma: no cover — cryptographically negligible
        s = pow(k, -1, N) * (e + r * d) % N
        if s == 0:
            continue  # pragma: no cover
        return r, s


def verify(qx: int, qy: int, digest: bytes, r: int, s: int) -> bool:
    """SEC 1 §4.1.4 verification; False on any malformed input."""
    if not (1 <= r < N and 1 <= s < N):
        return False
    if not on_curve(qx, qy):
        return False
    e = _bits2int(digest) % N
    w = pow(s, -1, N)
    u1 = e * w % N
    u2 = r * w % N
    pt = _add(_mul(u1, (GX, GY)), _mul(u2, (qx, qy)))
    if pt is _INF:
        return False
    return pt[0] % N == r


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return bytes([0x02, len(b)]) + b


def sig_to_der(r: int, s: int) -> bytes:
    body = _der_int(r) + _der_int(s)
    return bytes([0x30, len(body)]) + body


def sig_from_der(sig: bytes) -> tuple[int, int] | None:
    """Parse SEQUENCE { r INTEGER, s INTEGER }; None on malformed."""
    try:
        if sig[0] != 0x30:
            return None
        pos = 2
        ln = sig[1]
        if ln & 0x80:  # long form (r/s can push past 127 bytes)
            nb = ln & 0x7F
            ln = int.from_bytes(sig[2 : 2 + nb], "big")
            pos = 2 + nb
        vals = []
        for _ in range(2):
            if sig[pos] != 0x02:
                return None
            vlen = sig[pos + 1]
            vals.append(int.from_bytes(sig[pos + 2 : pos + 2 + vlen], "big"))
            pos += 2 + vlen
        return vals[0], vals[1]
    except (IndexError, ValueError):
        return None
