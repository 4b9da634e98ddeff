"""Standard security handler — RC4 (ISO 32000 §7.6: V 1/2, R 2/3).

The reference rejects encrypted input outright (the unsupported /Crypt
filter stance, /root/reference/src/pdf_doc/pdf_file/decode.rs:46,83-87);
this module implements the common real-world case on top of that seam:
the *standard* security handler with RC4 and an empty user password —
the shape most "encrypted" PDFs in a crawl actually have (owner-password
protected, user-openable).  AES (/V 4+) and user-password-protected
documents still surface as the existing unsupported-encryption error row.

Pure Python, deterministic, no external deps; also used by the synthetic
corpus builder to produce genuinely encrypted fixtures.
"""

from __future__ import annotations

import hashlib
import struct

# the 32-byte padding string of Algorithm 2 (ISO 32000 §7.6.3.3)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def compute_file_key(
    o_entry: bytes, p: int, id0: bytes, user_pwd: bytes = b"", n: int = 5, r: int = 2
) -> bytes:
    """Algorithm 2: the file encryption key from the /O entry, /P flags and
    the first document ID string."""
    h = hashlib.md5()
    h.update(_pad_password(user_pwd))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def compute_o_entry(owner_pwd: bytes, user_pwd: bytes = b"", n: int = 5, r: int = 2) -> bytes:
    """Algorithm 3: the /O dictionary entry (writer side — used by the
    synthetic corpus builder)."""
    digest = hashlib.md5(_pad_password(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:n]
    out = rc4(key, _pad_password(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def compute_u_entry(file_key: bytes, id0: bytes = b"", r: int = 2) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U entry used to validate the empty
    user password."""
    if r == 2:
        return rc4(file_key, PAD)
    h = hashlib.md5()
    h.update(PAD)
    h.update(id0)
    out = rc4(file_key, h.digest())
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in file_key), out)
    return out + b"\x00" * 16  # arbitrary 16-byte pad per spec


def check_user_password(file_key: bytes, u_entry: bytes, id0: bytes = b"", r: int = 2) -> bool:
    expect = compute_u_entry(file_key, id0, r)
    cmp_len = 32 if r == 2 else 16
    return expect[:cmp_len] == (u_entry or b"")[:cmp_len]


def object_key(file_key: bytes, obj_id: int, gen: int) -> bytes:
    """Algorithm 1 step b-c: per-object RC4 key (max 16 bytes)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(obj_id.to_bytes(3, "little"))
    h.update(gen.to_bytes(2, "little"))
    return h.digest()[: min(len(file_key) + 5, 16)]
