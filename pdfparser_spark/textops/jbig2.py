"""JBIG2 (ITU-T T.88) — the PDF-embedded organization.

PDF's /JBIG2Decode filter (ISO 32000 §7.4.7) wraps a T.88 *embedded*
stream: a bare sequence of segments (no file header), optionally preceded
by a shared /JBIG2Globals stream.  This module implements, from the
public T.88 spec only:

  - the segment-header walk (§7.2: 4-byte number, type flags, the
    short/long referred-to-segment forms, 1- or 4-byte page association,
    4-byte data length),
  - page information segments (§7.4.8) for the page bitmap geometry,
  - generic region segments (§7.4.6, types 36/38/39), BOTH coding modes:
    MMR=1 (the region data is ITU-T T.6 Group 4 coding — exactly the
    existing ``textops/ccitt.py`` decoder, T.88 §6.2.6) and MMR=0
    arithmetic coding — the full MQ coder (Annex E: state table E.1,
    INITDEC/DECODE/BYTEIN and the matching encoder with 0xFF stuffing)
    driving the §6.2.5.7 context models for GBTEMPLATEs 0-3 (nominal AT
    pixels),
  - region composition onto the page bitmap (OR).

TPGDON typical prediction (§6.2.5.6) and ALL FOUR GBTEMPLATEs are
honored in both directions.  Non-nominal AT pixels, symbol dictionaries
and text/halftone/refinement regions are OUT OF SCOPE and raise
``ValueError`` (same honest-subset layering as the baseline-only JPEG
decoder in jpeg.py).  Corrupt input only ever raises ``ValueError``.

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
                if rw == 0 or rh == 0 or rw > 1 << 20 or rh > 1 << 20:
                    raise ValueError("JBIG2: implausible region geometry")
                if gflags & 0x01:  # MMR: the region data is T.6 coding
                    mask = decode_ccitt(blob[ds + 18 : de], rw, rh, k=-1)
                else:  # MQ arithmetic coding
                    template = (gflags >> 1) & 0x03
                    tpgdon = bool(gflags & 0x08)
                    at = ds + 18
                    nominal = _NOMINAL_AT[template]
                    n_at = len(nominal)
                    if at + n_at > de:
                        raise ValueError("JBIG2: truncated AT pixels")
                    if struct.unpack_from("%db" % n_at, blob, at) != nominal:
                        raise ValueError("JBIG2: non-nominal AT pixels unsupported")
                    mask = decode_generic_arith(
                        blob[at + n_at : de], rw, rh, tpgdon=tpgdon, template=template
                    )
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


# ---------------------------------------------------------------------------
# MQ arithmetic coder (ITU-T T.88 Annex E — same coder as JPEG 2000).
# Probability state table E.1: (Qe, NMPS, NLPS, SWITCH).

_MQ = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """T.88 E.3 decoder (software conventions: INITDEC/DECODE/BYTEIN/
    RENORMD).  Past-the-end reads behave as 0xFF marker bytes, per the
    spec's marker-detection convention."""

    def __init__(self, data: bytes):
        self.d = data
        self.bp = 0
        self.c = self._b(0) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _b(self, i: int) -> int:
        return self.d[i] if i < len(self.d) else 0xFF

    def _bytein(self) -> None:
        if self._b(self.bp) == 0xFF:
            if self._b(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._b(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._b(self.bp) << 8
            self.ct = 8

    def decode(self, state: list, cx: int) -> int:
        i, mps = state[cx]
        qe, nmps, nlps, switch = _MQ[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:  # MPS exchange
                d = mps
                state[cx] = (nmps, mps)
            else:
                d = 1 - mps
                state[cx] = (nlps, 1 - mps if switch else mps)
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                state[cx] = (nlps, 1 - mps if switch else mps)
            else:
                d = mps
                state[cx] = (nmps, mps)
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 E.3 encoder (CODEMPS/CODELPS/BYTEOUT/FLUSH with 0xFF bit
    stuffing).  Matched pair with :class:`MQDecoder`; round-trip is the
    correctness contract (same standing as the other synth codecs)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()
        self.b = -1  # pending byte (B register); -1 = none yet

    def encode(self, state: list, cx: int, d: int) -> None:
        i, mps = state[cx]
        qe, nmps, nlps, switch = _MQ[i]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            state[cx] = (nmps, mps)
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            state[cx] = (nlps, 1 - mps if switch else mps)
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _emit(self, v: int) -> None:
        if self.b >= 0:
            self.out.append(self.b)
        self.b = v & 0xFF

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self._emit(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._emit(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.b += 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._emit(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self._emit(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        # SETBITS + two byteouts (E.3.8)
        tempc = (self.c + self.a - 1) & 0xFFFF0000
        self.c = tempc + 0x8000 if tempc < self.c else tempc
        # spec FLUSH does two byteouts; emitting four is equally valid
        # (the decoder ignores bytes past the point it needs) and immune
        # to the CT<8 partial-byte tail edge
        for _ in range(4):
            self.c = (self.c << self.ct) & 0xFFFFFFFF
            self._byteout()
        if self.b != 0xFF:
            self._emit(0xFF)
        self._emit(0xAC)  # spec terminator pair FF AC
        if self.b >= 0:
            self.out.append(self.b)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Arithmetic generic regions, GBTEMPLATEs 0-3 with nominal AT pixels
# (T.88 §6.2.5.7): per-template neighbor coordinate sets, context bits
# packed in raster order, MSB first.  Template 0 = 16 pixels (4 AT),
# 1 = 13 (1 AT), 2 = 10 (1 AT), 3 = 10 single-reference-row (1 AT).
# Non-nominal ATs are out of scope (ValueError).

_TEMPLATE_COORDS = (
    # T0: row -2 x-2..x+2 (A4 .. A3), row -1 x-3..x+3 (A2 .. A1), row 0 x-4..x-1
    tuple(
        [(-2 + dx, -2) for dx in range(5)]
        + [(-3 + dx, -1) for dx in range(7)]
        + [(-4 + dx, 0) for dx in range(4)]
    ),
    # T1: row -2 x-1..x+2, row -1 x-2..x+3 (A1 at +3,-1), row 0 x-3..x-1
    tuple(
        [(-1 + dx, -2) for dx in range(4)]
        + [(-2 + dx, -1) for dx in range(6)]
        + [(-3 + dx, 0) for dx in range(3)]
    ),
    # T2: row -2 x-1..x+1, row -1 x-2..x+2 (A1 at +2,-1), row 0 x-2..x-1
    tuple(
        [(-1 + dx, -2) for dx in range(3)]
        + [(-2 + dx, -1) for dx in range(5)]
        + [(-2 + dx, 0) for dx in range(2)]
    ),
    # T3: single reference row: row -1 x-3..x+2 (A1 at +2,-1), row 0 x-4..x-1
    tuple(
        [(-3 + dx, -1) for dx in range(6)]
        + [(-4 + dx, 0) for dx in range(4)]
    ),
)

# nominal AT pixel lists per template (A1 [, A2-A4]) as signed byte pairs
_NOMINAL_AT = (
    (3, -1, -3, -1, 2, -2, -2, -2),
    (3, -1),
    (2, -1),
    (2, -1),
)


def _gb_context(rows: list, x: int, y: int, w: int, coords) -> int:
    cx = 0
    for dx, dy in coords:
        px, py = x + dx, y + dy
        bit = rows[py][px] if 0 <= px < w and py >= 0 else 0
        cx = (cx << 1) | bit
    return cx


# per-template SLTP pseudo-pixel contexts (T.88 §6.2.5.7)
_TPGD_CX = (0x9B25, 0x0795, 0x00E5, 0x0195)


def decode_generic_arith(
    data: bytes, w: int, h: int, tpgdon: bool = False, template: int = 0
) -> np.ndarray:
    """MQ-decode one generic region (GBTEMPLATE 0-3) -> boolean bitmap.

    ``tpgdon`` = typical prediction (§6.2.5.6): each row starts with an
    SLTP decision in the template's fixed pseudo-pixel context; when the
    running LTP flag is set the row is a COPY of the previous one and no
    pixel decisions are coded for it."""
    if w <= 0 or h <= 0 or w * h > 1 << 22:
        raise ValueError("JBIG2: implausible arithmetic region geometry")
    if template not in (0, 1, 2, 3):
        raise ValueError("JBIG2: unknown GBTEMPLATE")
    coords = _TEMPLATE_COORDS[template]
    dec = MQDecoder(data)
    state = [(0, 0)] * (1 << 16)
    rows: list = []
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(state, _TPGD_CX[template])
            if ltp:
                rows.append(list(rows[-1]) if rows else [0] * w)
                continue
        row = [0] * w
        rows.append(row)
        for x in range(w):
            row[x] = dec.decode(state, _gb_context(rows, x, y, w, coords))
    return np.array(rows, dtype=bool)


def encode_generic_arith(
    mask: np.ndarray, tpgdon: bool = False, template: int = 0
) -> bytes:
    """Matched encoder for any GBTEMPLATE (the synth writer)."""
    coords = _TEMPLATE_COORDS[template]
    h, w = mask.shape
    enc = MQEncoder()
    state = [(0, 0)] * (1 << 16)
    rows = mask.astype(np.uint8).tolist()
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = y > 0 and rows[y] == rows[y - 1]
            sltp = ltp ^ (1 if typical else 0)
            enc.encode(state, _TPGD_CX[template], sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(w):
            enc.encode(state, _gb_context(rows, x, y, w, coords), rows[y][x])
    return enc.flush()


def encode_jbig2_arith(
    mask: np.ndarray, tpgdon: bool = True, template: int = 0
) -> bytes:
    """Boolean bitmap -> embedded JBIG2 stream with an ARITHMETIC
    (MQ-coded, GBTEMPLATE 0-3) immediate lossless generic region;
    typical prediction ON by default (every row codes its SLTP decision,
    so a decoder ignoring TPGDON desynchronizes immediately)."""
    h, w = mask.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    at = _NOMINAL_AT[template]
    region = (
        struct.pack(">IIIIB", w, h, 0, 0, 0)
        + bytes(((0x08 if tpgdon else 0x00) | (template << 1),))
        + struct.pack("%db" % len(at), *at)  # nominal AT pixel pairs
        + encode_generic_arith(mask, tpgdon=tpgdon, template=template)
    )
    return (
        _segment(0, _PAGE_INFO, 1, page_info)
        + _segment(1, 38, 1, region)
        + _segment(2, _END_OF_PAGE, 1, b"")
    )
