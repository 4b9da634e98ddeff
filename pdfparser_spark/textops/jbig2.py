"""JBIG2 (ITU-T T.88) — the PDF-embedded organization, MMR subset.

PDF's /JBIG2Decode filter (ISO 32000 §7.4.7) wraps a T.88 *embedded*
stream: a bare sequence of segments (no file header), optionally preceded
by a shared /JBIG2Globals stream.  This module implements, from the
public T.88 spec only:

  - the segment-header walk (§7.2: 4-byte number, type flags, the
    short/long referred-to-segment forms, 1- or 4-byte page association,
    4-byte data length),
  - page information segments (§7.4.8) for the page bitmap geometry,
  - generic region segments (§7.4.6, types 36/38/39) **with MMR=1**:
    the region data is ITU-T T.6 (Group 4) two-dimensional coding, which
    is exactly the existing ``textops/ccitt.py`` decoder — JBIG2's MMR
    mode *is* G4 over the region bitmap (T.88 §6.2.6),
  - region composition onto the page bitmap (OR).

Arithmetic-coded regions (MQ coder), symbol dictionaries and text/
halftone/refinement regions are OUT OF SCOPE and raise ``ValueError``
(same honest-subset layering as the baseline-only JPEG decoder in
jpeg.py).  Corrupt input only ever raises ``ValueError``.

The reference has no JBIG2 tier (its filter enumeration errors on every
image codec, pdf_file.rs FilterType).
"""

from __future__ import annotations

import struct

import numpy as np

from .ccitt import decode_ccitt, encode_ccitt

_PAGE_INFO = 48
_END_OF_PAGE = 49
_END_OF_STRIPE = 50
_END_OF_FILE = 51
_GENERIC_REGIONS = (36, 38, 39)  # intermediate / immediate / imm. lossless


def _read_segment_header(data: bytes, pos: int):
    """One §7.2 segment header.  Returns
    ``(seg_num, seg_type, page_assoc, data_start, data_end, next_pos)``."""
    n = len(data)
    if pos + 11 > n:
        raise ValueError("JBIG2: truncated segment header")
    seg_num, flags = struct.unpack_from(">IB", data, pos)
    pos += 5
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    rts = data[pos]
    count = rts >> 5
    if count == 7:  # long form: 4-byte count + retain-bit pad
        if pos + 4 > n:
            raise ValueError("JBIG2: truncated referred-to count")
        count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
        pos += 4 + (count + 8) // 8
    else:
        pos += 1
    # referred-to segment numbers: width scales with this segment's number
    ref_w = 1 if seg_num <= 256 else 2 if seg_num <= 65536 else 4
    pos += count * ref_w
    if page_assoc_4:
        if pos + 8 > n:
            raise ValueError("JBIG2: truncated page association")
        page = struct.unpack_from(">I", data, pos)[0]
        pos += 4
    else:
        if pos + 5 > n:
            raise ValueError("JBIG2: truncated page association")
        page = data[pos]
        pos += 1
    (length,) = struct.unpack_from(">I", data, pos)
    pos += 4
    if length == 0xFFFFFFFF:
        raise ValueError("JBIG2: unknown-length segment unsupported")
    if pos + length > n:
        raise ValueError("JBIG2: segment data overruns stream")
    return seg_num, seg_type, page, pos, pos + length, pos + length


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Embedded JBIG2 stream -> boolean page bitmap (True = black).

    ``globals_data`` is the decoded /JBIG2Globals stream, walked first
    (shared segments precede the per-image segments, T.88 annex on the
    embedded organization)."""
    page_w = page_h = None
    regions: list = []  # (x, y, mask)
    for blob in (globals_data, data):
        pos = 0
        n = len(blob)
        while pos < n:
            _num, styp, _page, ds, de, pos = _read_segment_header(blob, pos)
            if styp == _PAGE_INFO:
                if de - ds < 17:
                    raise ValueError("JBIG2: short page info segment")
                page_w, page_h = struct.unpack_from(">II", blob, ds)
            elif styp in _GENERIC_REGIONS:
                if de - ds < 18:
                    raise ValueError("JBIG2: short generic region segment")
                rw, rh, rx, ry = struct.unpack_from(">IIII", blob, ds)
                gflags = blob[ds + 17]
                if not gflags & 0x01:
                    raise ValueError(
                        "JBIG2: arithmetic-coded generic region unsupported (MMR only)"
                    )
                if rw == 0 or rh == 0 or rw > 1 << 20 or rh > 1 << 20:
                    raise ValueError("JBIG2: implausible region geometry")
                mask = decode_ccitt(blob[ds + 18 : de], rw, rh, k=-1)
                regions.append((rx, ry, mask))
            elif styp in (_END_OF_PAGE, _END_OF_STRIPE, _END_OF_FILE):
                continue
            # other segment types (symbol dicts, text regions, extensions)
            # are skipped by data length; a text region REFERENCED by the
            # page would leave it blank — acceptable for the MMR subset
    if page_w is None or page_h is None:
        raise ValueError("JBIG2: no page information segment")
    if page_h == 0xFFFFFFFF:  # unknown height: infer from regions
        page_h = max((y + m.shape[0] for _x, y, m in regions), default=0)
    if page_w > 1 << 20 or page_h > 1 << 20:
        raise ValueError("JBIG2: implausible page geometry")
    page = np.zeros((page_h, page_w), dtype=bool)
    for x, y, m in regions:
        h, w = m.shape
        if y + h > page_h or x + w > page_w:
            raise ValueError("JBIG2: region outside page")
        page[y : y + h, x : x + w] |= m
    return page


def _segment(num: int, styp: int, page: int, payload: bytes) -> bytes:
    # short referred-to form, zero refs, 1-byte page association
    return struct.pack(">IBBBI", num, styp, 0x00, page, len(payload)) + payload


def encode_jbig2_mmr(mask: np.ndarray) -> bytes:
    """Boolean bitmap -> embedded JBIG2 stream: page info + one immediate
    lossless MMR generic region + end-of-page.  The writer the synth
    scanned family uses; round-trips through :func:`decode_jbig2`."""
    h, w = mask.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    region = (
        struct.pack(">IIIIB", w, h, 0, 0, 0)  # region info, external OR
        + bytes((0x01,))  # generic flags: MMR=1
        + encode_ccitt(mask, k=-1)
    )
    return (
        _segment(0, _PAGE_INFO, 1, page_info)
        + _segment(1, 38, 1, region)
        + _segment(2, _END_OF_PAGE, 1, b"")
    )
