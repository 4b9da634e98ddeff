"""PNG codec (pure stdlib zlib + numpy — no image libraries).

Real decode of the actual container format: signature, chunk walk with
CRC validation, IHDR geometry, PLTE palette, concatenated IDAT inflate,
and per-row filter reconstruction (None/Sub/Up/Average/Paeth) — the row
filters are exactly the PDF PNG predictors, so reconstruction reuses
``core.filters._apply_predictor`` (predictor 15, the adaptive per-row
form).  Supported: 8-bit depth, color types 0 (gray), 2 (RGB),
3 (palette) and 6 (RGBA), and Adam7 INTERLACED files (the 7-pass
sub-image walk per the PNG spec §8.2 — each pass is filtered
independently, then scattered onto the 8x8 grid).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..core.filters import _apply_predictor

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}

# Adam7 pass layout (PNG spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _pass_dims(w: int, h: int):
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        yield x0, y0, dx, dy, pw, ph


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 image (H x W gray, or H x W x {3,4} RGB/RGBA) -> PNG bytes
    (filter type 0 rows, single IDAT); Adam7 interlaced on request."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
            if pw == 0 or ph == 0:
                continue  # empty pass contributes NO bytes (spec §8.2)
            sub = img[y0::dy, x0::dx]
            parts += [b"\x00" + sub[r].tobytes() for r in range(ph)]
        rows = b"".join(parts)
    else:
        rows = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """-> (width, height, img uint8) — (H, W) for grayscale, (H, W, 3) for
    RGB/palette, (H, W, 4) for RGBA.  Raises ValueError on malformed
    input, bad CRC, or unsupported shape (non-8-bit, interlaced)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({ctype!r})")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError("only 8-bit PNG supported")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
        if interlace:
            # Adam7: each pass is an independently-filtered sub-image;
            # unfilter per pass, scatter onto the 8x8 grid
            img = np.zeros((h, w, ch), dtype=np.uint8)
            pos = 0
            for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
                if pw == 0 or ph == 0:
                    continue
                span = ph * (1 + pw * ch)
                chunk = raw[pos : pos + span]
                if len(chunk) != span:
                    raise ValueError("interlaced PNG data short of geometry")
                pos += span
                flat = _apply_predictor(
                    chunk,
                    {"Predictor": 15, "Colors": ch, "BitsPerComponent": 8, "Columns": pw},
                )
                sub = np.frombuffer(flat, dtype=np.uint8, count=ph * pw * ch)
                img[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        else:
            # per-row filter reconstruction == PDF PNG predictor 15 (adaptive)
            flat = _apply_predictor(
                raw, {"Predictor": 15, "Colors": ch, "BitsPerComponent": 8, "Columns": w}
            )
            img = np.frombuffer(flat, dtype=np.uint8, count=h * w * ch).reshape(h, w, ch)
    except ValueError:
        raise
    except Exception as e:  # zlib.error / FilterError -> documented contract
        raise ValueError(f"malformed PNG image data: {e}") from e
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    elif ch == 1:
        img = img[:, :, 0]
    return w, h, img
