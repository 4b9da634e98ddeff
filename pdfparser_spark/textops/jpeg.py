"""Baseline JPEG (ISO/IEC 10918-1) codec in pure numpy — no libjpeg/PIL.

The container has no image libraries, so this module implements the real
codec from the public spec instead of stubbing it:

  * ``encode_jpeg``: baseline sequential DCT, 8-bit, grayscale, YCbCr
    4:4:4 / 4:2:0, or Adobe CMYK (4-channel input -> APP14 transform 0,
    data stored inverted per the Adobe convention), standard Annex-K
    quantization + Huffman tables, restart-interval support.
  * ``decode_jpeg``: a general baseline + PROGRESSIVE decoder — DQT
    (8/16-bit), SOF0/1/2, DHT, DRI, SOS with MCU-interleaved or
    single-component scans, sampling factors up to 2x2, byte-unstuffing
    + restart markers, dequantization, separable float IDCT, chroma
    upsampling and YCbCr->RGB; 4-component Adobe CMYK and YCCK
    (APP14 transform 2) decode to TRUE CMYK.  Progressive (Annex G) covers all four
    scan kinds: DC first / DC refinement / AC first (EOB-run coded) /
    AC refinement (correction bits).  Lossless, hierarchical and
    arithmetic coding are rejected with ValueError.
  * ``encode_jpeg_progressive``: SOF2 spectral-selection + successive-
    approximation writer (matched pair with the decoder; cross-validated
    against javax.imageio in tests) whose refined coefficients equal the
    baseline encoder's, so both forms decode to identical pixels.

Integer pinning for the oracle: both the encoder's quantizer and the
decoder's sample reconstruction round via ``floor(x + 0.5 + EPS)``.  The
``EPS = 1e-6`` guard absorbs float jitter in the (I)DCT, so block-constant
inputs quantize and reconstruct to EXACTLY the integers an all-integer
model predicts — which is what lets DuckDB recompute ``media_decode_real``
pixel sums for the JPEG corpus class analytically (DC quant step 16 makes
the whole dequant->IDCT->level-shift chain integer: out = 2*c + 128).
For natural images the guard is a sub-quantization-step perturbation.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6  # fp guard for round-half-up; see module docstring

# --- tables (ISO/IEC 10918-1 Annex K) --------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# K.1 luminance / K.2 chrominance quantization tables (quality ~50).  The
# DC step of QT_LUMA is 16 — divisible by 8, which makes DC-only blocks
# reconstruct on exact integers (out = 2*c + 128); the oracle relies on it.
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal DCT-II basis: A[u, x] = c_u cos((2x+1) u pi / 16).
# FDCT = A @ block @ A.T, IDCT = A.T @ coef @ A (the spec's 1/4 C(u)C(v)
# scaling folded in; constant block d -> DC coefficient 8d).
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + (0.5 + EPS)).astype(np.int64)


# --- Huffman code construction (canonical, per C.2) -------------------------

def _build_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} canonical assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, values):
    """(bits, values) -> {(length, code): symbol} for bit-serial decode —
    the inverse orientation of the same canonical-code walk."""
    return {(length, code): sym for sym, (code, length) in _build_codes(bits, values).items()}


# --- bit IO -----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # drop already-emitted high bits: without the mask, acc accretes the
        # whole bitstream and every shift copies it (O(n^2) encode)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:  # pad with 1-bits per F.1.2.3
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Bit-serial reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (ssss category, appended bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _extend(bits_val: int, size: int) -> int:
    """appended bits -> value (EXTEND, F.2.2.1)."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


# --- encoder ----------------------------------------------------------------

def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Plane (H, W multiple of 8) -> (n_blocks_y, n_blocks_x, 64) zigzagged
    quantized coefficients."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
    blocks -= 128.0
    coef = np.einsum("ux,nmxy,vy->nmuv", _A, blocks, _A, optimize=True)
    q = _round_half_up(coef / qt)
    return q.reshape(h // 8, w // 8, 64)[..., ZIGZAG]


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph, pw = (-h) % bh, (-w) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    size, extra = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(extra, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, extra = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(extra, size)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_seg(tid: int, qt: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(int(v) for v in qt.reshape(64)[ZIGZAG]))


def _dht_seg(tclass: int, tid: int, table) -> bytes:
    bits, values = table
    return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values))


def encode_jpeg(img: np.ndarray, subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Encode a uint8 image (H x W grayscale, or H x W x 3 RGB) as baseline
    sequential JPEG with the Annex-K tables.  ``subsample=True`` emits
    YCbCr 4:2:0 (2x2 Y sampling), else grayscale stays 1-component and RGB
    is 4:4:4.  ``restart_interval`` > 0 writes DRI + RSTn markers every
    that many MCUs."""
    img = np.asarray(img)
    gray = img.ndim == 2
    cmyk = img.ndim == 3 and img.shape[2] == 4
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = [0]
    elif cmyk:
        # Adobe convention: 4-component data is stored INVERTED; the
        # APP14 marker (transform 0) tells the decoder to un-invert
        planes = [255.0 - img[..., i].astype(np.float64) for i in range(4)]
        samp = [(1, 1)] * 4
        qts = [0, 0, 0, 0]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsample:
            cbp, crp = _pad_to(cb, 2, 2), _pad_to(cr, 2, 2)
            ph, pw = cbp.shape
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]
    h, w = img.shape[:2]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # quantized zigzag blocks per component, padded to the MCU grid
    qtabs = [QT_LUMA, QT_CHROMA]
    comp_blocks = []
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for plane, (hs, vs), tq in zip(planes, samp, qts):
        # component dims per A.1.1: ceil(dim * sampling / max_sampling),
        # then edge-pad the block grid out to whole MCUs
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        plane = _pad_to(plane[:ch, :cw], 8 * mcuy * vs, 8 * mcux * hs)
        comp_blocks.append(_fdct_quant(plane, qtabs[tq]))

    out = bytearray(b"\xff\xd8")  # SOI
    if cmyk:  # APP14 Adobe, transform 0: inverted plain CMYK
        out += _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    else:
        out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, QT_LUMA)
    if not (gray or cmyk):
        out += _dqt_seg(1, QT_CHROMA)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(planes)])
    for i, ((hs, vs), tq) in enumerate(zip(samp, qts)):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, DC_LUMA)
    out += _dht_seg(1, 0, AC_LUMA)
    if not (gray or cmyk):
        out += _dht_seg(0, 1, DC_CHROMA)
        out += _dht_seg(1, 1, AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        tid = 0 if (gray or cmyk or i == 0) else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_tabs = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    ac_tabs = [_build_codes(*AC_LUMA), _build_codes(*AC_CHROMA)]
    bw = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = 0
    rst = 0

    def maybe_restart(bw: _BitWriter) -> _BitWriter:
        """At a restart boundary: flush, emit RSTn, reset DC predictors."""
        nonlocal rst
        if not (restart_interval and n_mcu and n_mcu % restart_interval == 0):
            return bw
        bw.flush()
        out.extend(bw.out)
        out.extend(bytes([0xFF, 0xD0 + rst]))
        rst = (rst + 1) % 8
        preds[:] = [0] * len(planes)
        return _BitWriter()

    if gray:
        blocks = comp_blocks[0]
        for by in range(blocks.shape[0]):
            for bx in range(blocks.shape[1]):
                bw = maybe_restart(bw)
                preds[0] = _encode_block(bw, blocks[by, bx], preds[0], dc_tabs[0], ac_tabs[0])
                n_mcu += 1
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                bw = maybe_restart(bw)
                for ci, (hs, vs) in enumerate(samp):
                    tid = 0 if (cmyk or ci == 0) else 1
                    for v in range(vs):
                        for hh in range(hs):
                            zz = comp_blocks[ci][my * vs + v, mx * hs + hh]
                            preds[ci] = _encode_block(bw, zz, preds[ci], dc_tabs[tid], ac_tabs[tid])
                n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (ITU-T T.81 Annex G) -------------------------------

# AC table for progressive scans: EOB-run symbols ((nbits << 4), size 0)
# are NOT in the Annex K baseline tables, so progressive encoders ship
# their own.  Ours is the simplest valid one — every symbol 0x00..0xFE as
# an 8-bit code (255 codes of one length is a legal canonical table, and
# the forbidden all-ones code is never assigned).  Compression optimality
# is irrelevant here; table VALIDITY and decoder generality are the point.
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0], list(range(255)))


def _flush_eobrun(bw: _BitWriter, acc, st: dict) -> None:
    """Emit the pending EOB run (§G.1.2.2: symbol nbits<<4 + appended
    low bits) and any correction bits buffered during it (§G.1.2.3)."""
    e = st["eobrun"]
    if e > 0:
        nbits = e.bit_length() - 1
        c, ln = acc[nbits << 4]
        bw.write(c, ln)
        if nbits:
            bw.write(e - (1 << nbits), nbits)
        st["eobrun"] = 0
    for b in st["bebits"]:
        bw.write(b, 1)
    st["bebits"] = []


def _enc_ac_first_block(bw: _BitWriter, acc, zz, ss: int, se: int, al: int, st: dict) -> None:
    """One block of an AC FIRST scan (§G.1.2.2): point-transformed band
    run-length coded, trailing zeros folded into the cross-block EOB run."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        _flush_eobrun(bw, acc, st)
        while r > 15:
            c, ln = acc[0xF0]
            bw.write(c, ln)
            r -= 16
        size, extra = _magnitude(t if v >= 0 else -t)
        c, ln = acc[(r << 4) | size]
        bw.write(c, ln)
        bw.write(extra, size)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, acc, st)


def _enc_ac_refine_block(bw: _BitWriter, acc, zz, ss: int, se: int, al: int, st: dict) -> None:
    """One block of an AC REFINEMENT scan (§G.1.2.3, figure G.7):
    newly-nonzero coefficients get (run, 1) symbols + a sign bit;
    already-nonzero history gets one buffered correction bit each, woven
    through the runs in position order exactly as the decoder re-reads
    them."""
    absv = {}
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    br: list = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(bw, acc, st)
            c, ln = acc[0xF0]
            bw.write(c, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:  # history coefficient: correction bit only
            br.append(t & 1)
            continue
        _flush_eobrun(bw, acc, st)
        c, ln = acc[(r << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        r = 0
        for b in br:
            bw.write(b, 1)
        br = []
    if r > 0 or br:
        st["eobrun"] += 1
        st["bebits"].extend(br)
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, acc, st)


def encode_jpeg_progressive(img: np.ndarray) -> bytes:
    """Encode a uint8 image (H x W grayscale, or H x W x 3 RGB 4:4:4) as
    PROGRESSIVE JPEG (SOF2) with a spectral-selection + successive-
    approximation scan script that exercises all four scan kinds:

      1. DC first, interleaved, Al=1
      2. AC first per component, band 1..63, Al=1 (EOB-run coded)
      3. DC refinement (Ah=1 -> Al=0)
      4. AC refinement per component (Ah=1 -> Al=0)

    The transmitted coefficients are IDENTICAL to the baseline encoder's
    after full refinement, so progressive and baseline outputs decode to
    the same pixels — which keeps the media tier's analytic pixel-sum
    oracle layout-invariant."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        qts = [0]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
        qts = [0, 1, 1]
    h, w = img.shape[:2]
    gx, gy = -(-w // 8), -(-h // 8)
    qtabs = [QT_LUMA, QT_CHROMA]
    comp_blocks = [
        _fdct_quant(_pad_to(p, 8 * gy, 8 * gx), qtabs[tq]) for p, tq in zip(planes, qts)
    ]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, QT_LUMA)
    if not gray:
        out += _dqt_seg(1, QT_CHROMA)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, qts[i]])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT
    out += _dht_seg(0, 0, DC_LUMA)
    if not gray:
        out += _dht_seg(0, 1, DC_CHROMA)
    out += _dht_seg(1, 2, _PROG_AC)

    dc_codes = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    acc = _build_codes(*_PROG_AC)
    dtid = lambda ci: 0 if (gray or ci == 0) else 1  # noqa: E731

    def sos(comp_ids, ss, se, ah, al, ta):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, (dtid(ci) << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    # 1) DC first: interleaved, point transform Al=1 (arithmetic shift)
    out += sos(list(range(ncomp)), 0, 0, 0, 1, 0)
    bw = _BitWriter()
    preds = [0] * ncomp
    for m in range(gy * gx):
        my, mx = divmod(m, gx)
        for ci in range(ncomp):
            v = int(comp_blocks[ci][my, mx, 0]) >> 1
            size, extra = _magnitude(v - preds[ci])
            preds[ci] = v
            c, ln = dc_codes[dtid(ci)][size]
            bw.write(c, ln)
            if size:
                bw.write(extra, size)
    bw.flush()
    out += bw.out

    # 2) AC first per component: band 1..63 at Al=1
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 0, 1, 2)
        bw = _BitWriter()
        st = {"eobrun": 0, "bebits": []}
        for m in range(gy * gx):
            my, mx = divmod(m, gx)
            _enc_ac_first_block(bw, acc, comp_blocks[ci][my, mx], 1, 63, 1, st)
        _flush_eobrun(bw, acc, st)
        bw.flush()
        out += bw.out

    # 3) DC refinement: the deferred low bit, one per unit
    out += sos(list(range(ncomp)), 0, 0, 1, 0, 0)
    bw = _BitWriter()
    for m in range(gy * gx):
        my, mx = divmod(m, gx)
        for ci in range(ncomp):
            bw.write(int(comp_blocks[ci][my, mx, 0]) & 1, 1)
    bw.flush()
    out += bw.out

    # 4) AC refinement per component: Ah=1 -> Al=0
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 1, 0, 2)
        bw = _BitWriter()
        st = {"eobrun": 0, "bebits": []}
        for m in range(gy * gx):
            my, mx = divmod(m, gx)
            _enc_ac_refine_block(bw, acc, comp_blocks[ci][my, mx], 1, 63, 0, st)
        _flush_eobrun(bw, acc, st)
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ----------------------------------------------------------------

def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples (float,
    level-shifted back to [0, 255] domain, unclipped)."""
    return np.einsum("ux,nuv,vy->nxy", _A, coefs.astype(np.float64), _A, optimize=True) + 128.0


def _decode_progressive(scans, qt, huff, by_id, comps, hmax, vmax, w, h, dri):
    """Progressive-DCT coefficient decoder (ITU-T T.81 §G.2 / Annex G):
    each SOS refines a spectral band (/Ss../Se) at a successive-
    approximation level (Ah -> Al) into persistent per-component
    coefficient stores.  All four scan kinds are implemented — DC first
    (diffs of point-transformed DC, interleaved MCU order when ns > 1),
    DC refinement (one appended bit per unit), AC first (EOB-run coded
    bands, §G.1.2.2), and AC refinement (correction bits woven through
    the zero runs, §G.1.2.3 / figure G.7).  Restart markers reset the
    DC predictors and the EOB run.  Raises ValueError on any structural
    violation (AC scans must be single-component, bands inside 1..63)."""
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    stores = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    }

    for sc_rec in scans:
        ss, se = sc_rec["ss"], sc_rec["se"]
        ah, al = sc_rec["ah"], sc_rec["al"]
        scomps = sc_rec["comps"]
        segments = sc_rec["segments"]
        for sc in scomps:
            if sc["cs"] not in by_id:
                raise ValueError(f"scan references unknown component {sc['cs']}")
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            _prog_dc_scan(scomps, segments, huff, by_id, stores, mcux, mcuy, ah, al, dri)
        else:
            if len(scomps) != 1:
                raise ValueError("progressive AC scan must be single-component")
            if not (1 <= ss <= se <= 63):
                raise ValueError("bad spectral band")
            _prog_ac_scan(
                scomps[0], segments, huff, by_id, stores, hmax, vmax, w, h, ss, se, ah, al, dri
            )
    return stores


def _prog_dc_scan(scomps, segments, huff, by_id, stores, mcux, mcuy, ah, al, dri):
    interleaved = len(scomps) > 1
    if ah == 0:
        for sc in scomps:
            if (0, sc["td"]) not in huff:
                raise ValueError("scan references missing Huffman table")
    if interleaved:
        n_units = mcux * mcuy
    else:
        c = by_id[scomps[0]["cs"]]
        st = stores[c["id"]]
        n_units = st.shape[0] * st.shape[1]
    reader = _BitReader(segments[0])
    seg_idx = 0
    preds = [0] * len(scomps)
    for m in range(n_units):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(scomps)
        for si, sc in enumerate(scomps):
            c = by_id[sc["cs"]]
            st = stores[c["id"]]
            if interleaved:
                my, mx = divmod(m, mcux)
                units = [
                    (my * c["v"] + v, mx * c["h"] + hh)
                    for v in range(c["v"])
                    for hh in range(c["h"])
                ]
            else:
                units = [divmod(m, st.shape[1])]
            for uy, ux in units:
                if ah == 0:
                    size = reader.decode(huff[(0, sc["td"])])
                    if size > 15:
                        raise ValueError("invalid DC category")
                    preds[si] += _extend(reader.bits(size), size)
                    st[uy, ux, 0] = preds[si] << al
                else:  # refinement: one appended bit per unit
                    if reader.bit():
                        st[uy, ux, 0] |= 1 << al


def _prog_ac_scan(sc, segments, huff, by_id, stores, hmax, vmax, w, h, ss, se, ah, al, dri):
    if (1, sc["ta"]) not in huff:
        raise ValueError("scan references missing Huffman table")
    ac_tab = huff[(1, sc["ta"])]
    c = by_id[sc["cs"]]
    st = stores[c["id"]]
    # non-interleaved scans cover the component's OWN padded grid
    # (§A.2.2), a sub-rectangle of the MCU-padded store
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    gxc, gyc = -(-cw // 8), -(-ch // 8)
    reader = _BitReader(segments[0])
    seg_idx = 0
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for m in range(gxc * gyc):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            eobrun = 0
        uy, ux = divmod(m, gxc)
        zz = st[uy, ux]
        if ah == 0:  # §G.1.2.2 first pass: EOB-run coded band
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode(ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(reader.bits(s), s) << al
                k += 1
        else:  # §G.1.2.3 refinement: correction bits through the runs
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode(ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.bits(r)
                            break
                        sval = 0  # ZRL: 16 zero-history skips
                    elif s == 1:
                        sval = p1 if reader.bit() else m1
                    else:
                        raise ValueError("bad refinement symbol")
                    while k <= se:
                        cv = int(zz[k])
                        if cv != 0:
                            if reader.bit() and (cv & p1) == 0:
                                zz[k] = cv + (p1 if cv >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if sval and k <= se:
                        zz[k] = sval
                    k += 1
            if eobrun > 0:
                while k <= se:  # EOB region: correct remaining history
                    cv = int(zz[k])
                    if cv != 0:
                        if reader.bit() and (cv & p1) == 0:
                            zz[k] = cv + (p1 if cv >= 0 else m1)
                    k += 1
                eobrun -= 1


def decode_jpeg(payload: bytes):
    """-> (width, height, img) with img uint8 of shape (H, W) for
    1-component files or (H, W, 3) RGB for 3-component YCbCr."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    dri = 0
    frame = None
    progressive = False
    scans: list[dict] = []
    adobe = None  # APP14 transform: 0 plain CMYK, 2 YCCK (4-comp files)
    while pos < len(data):
        if data[pos] != 0xFF or pos + 1 >= len(data):
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI without scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated marker segment")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                qt[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                if len(bits) < 16 or len(values) < n:
                    raise ValueError("truncated DHT segment")
                huff[(tc, th)] = _build_decode(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("truncated SOF segment")
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline and progressive DCT supported")
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xEE and body[:5] == b"Adobe":  # APP14
            adobe = body[11] if len(body) > 11 else 0
        elif marker == 0xDA:  # SOS
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            ss, se, ahl = body[1 + 2 * ns : 4 + 2 * ns]
            # split the scan's entropy-coded data into restart segments,
            # unstuffing FF00; stop at the next true marker
            segments: list[bytearray] = [bytearray()]
            while pos < len(data):
                b = data[pos]
                if b != 0xFF:
                    segments[-1].append(b)
                    pos += 1
                    continue
                nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
                if nxt == 0x00:
                    segments[-1].append(0xFF)
                    pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    segments.append(bytearray())
                    pos += 2
                else:
                    # real marker: ends this scan's data.  A baseline file
                    # has exactly one scan, so anything but EOI here means
                    # corrupt entropy data — reject loudly rather than
                    # decoding truncated segments (progressive scans are
                    # legitimately ended by the next SOS/DHT/EOI marker)
                    if not progressive and nxt != 0xD9:
                        raise ValueError("unexpected marker in entropy data")
                    break
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss, "se": se, "ah": ahl >> 4, "al": ahl & 0xF,
                    "segments": [bytes(s) for s in segments],
                }
            )
            if not progressive:
                # we decode exactly one baseline scan; a multi-scan
                # baseline file (one SOS per component) would silently
                # come out color-shifted — fail loudly instead
                if frame is not None and ns != len(frame["comps"]):
                    raise ValueError("multi-scan baseline JPEG not supported")
                break
        # APPn / COM / others: skipped
    if frame is None or not scans:
        raise ValueError("missing SOF/SOS")
    scan = scans[0]["comps"]
    segments = scans[0]["segments"]

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    # structural validation: corrupt headers must fail as ValueError, not
    # leak KeyError/ZeroDivisionError out of the decode loop
    if len(comps) not in (1, 3, 4):
        raise ValueError(f"unsupported component count {len(comps)}")
    for c in comps:
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise ValueError(f"unsupported sampling factors {c['h']}x{c['v']}")
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    by_id = {c["id"]: c for c in comps}
    if progressive:
        stores = _decode_progressive(scans, qt, huff, by_id, comps, hmax, vmax, w, h, dri)
        return _finish_jpeg(stores, comps, qt, hmax, vmax, w, h, adobe)
    for sc in scan:
        if sc["cs"] not in by_id:
            raise ValueError(f"scan references unknown component {sc['cs']}")
        if (0, sc["td"]) not in huff or (1, sc["ta"]) not in huff:
            raise ValueError("scan references missing Huffman table")
        sc["comp"] = by_id[sc["cs"]]

    # allocate zigzag coefficient stores per component (MCU-padded grids)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    stores = {}
    for c in comps:
        if len(scan) == 1:
            cw = -(-w * c["h"] // hmax)
            ch = -(-h * c["v"] // vmax)
            gx, gy = -(-cw // 8), -(-ch // 8)
        else:
            gx, gy = mcux * c["h"], mcuy * c["v"]
        stores[c["id"]] = np.zeros((gy, gx, 64), dtype=np.int64)

    def decode_units(reader, preds):
        """One MCU's worth of data units; updates DC predictors in place."""
        for si, sc in enumerate(scan):
            c = sc["comp"]
            dc_tab = huff[(0, sc["td"])]
            ac_tab = huff[(1, sc["ta"])]
            hs, vs = (c["h"], c["v"]) if len(scan) > 1 else (1, 1)
            for v in range(vs):
                for hh in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    size = reader.decode(dc_tab)
                    if size > 15:  # DC categories are 0-11; a corrupt DHT
                        raise ValueError("invalid DC category")  # value byte can claim 255
                    preds[si] += _extend(reader.bits(size), size)
                    zz[0] = preds[si]
                    k = 1
                    while k < 64:
                        rs = reader.decode(ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _extend(reader.bits(s), s)
                        k += 1
                    yield c["id"], zz, v, hh

    n_mcus = mcux * mcuy if len(scan) > 1 else None
    if len(scan) == 1:
        st = stores[scan[0]["cs"]]
        n_mcus = st.shape[0] * st.shape[1]
    reader = _BitReader(bytes(segments[0]))
    seg_idx = 0
    preds = [0] * len(scan)
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(bytes(segments[seg_idx]))
            preds = [0] * len(scan)
        if len(scan) == 1:
            st = stores[scan[0]["cs"]]
            my, mx = divmod(m, st.shape[1])
        else:
            my, mx = divmod(m, mcux)
        for cid, zz, v, hh in decode_units(reader, preds):
            c = by_id[cid]
            if len(scan) == 1:
                stores[cid][my, mx] = zz
            else:
                stores[cid][my * c["v"] + v, mx * c["h"] + hh] = zz

    return _finish_jpeg(stores, comps, qt, hmax, vmax, w, h, adobe)


def _finish_jpeg(stores, comps, qt, hmax, vmax, w, h, adobe=None):
    """Shared decode tail: dequantize + IDCT per component, reassemble
    planes, upsample, color-convert.  Used by both the baseline and the
    progressive coefficient decoders."""
    planes = {}
    for c in comps:
        st = stores[c["id"]]
        gy, gx = st.shape[:2]
        deq = np.zeros((gy * gx, 64), dtype=np.int64)
        deq[:, ZIGZAG] = st.reshape(-1, 64) * qt[c["tq"]].reshape(64)[ZIGZAG]
        pix = _idct_blocks(deq.reshape(-1, 8, 8))
        plane = pix.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:  # replicate upsample
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes[c["id"]] = plane[:h, :w]

    def _clip8(x):
        return np.clip(_round_half_up(x), 0, 255).astype(np.uint8)

    if len(comps) == 1:
        return w, h, _clip8(planes[comps[0]["id"]])
    if len(comps) == 4:
        # CMYK (Adobe APP14 §: data stored inverted; transform 2 = YCCK).
        # Output is TRUE CMYK, shape (H, W, 4).
        p0, p1, p2, p3 = (planes[c["id"]] for c in comps)
        if adobe == 2:  # YCCK: YCbCr carries the INVERTED CMY channels
            cb, cr = p1 - 128.0, p2 - 128.0
            p0, p1, p2 = (
                p0 + 1.402 * cr,
                p0 - 0.344136286 * cb - 0.714136286 * cr,
                p0 + 1.772 * cb,
            )
        if adobe is not None:
            chans = [255.0 - p for p in (p0, p1, p2, p3)]
        else:  # no Adobe marker: bytes are true CMYK already
            chans = [p0, p1, p2, p3]
        return w, h, np.stack([_clip8(p) for p in chans], axis=-1)
    y = planes[comps[0]["id"]]
    cb = planes[comps[1]["id"]] - 128.0
    cr = planes[comps[2]["id"]] - 128.0
    r = _clip8(y + 1.402 * cr)
    g = _clip8(y - 0.344136286 * cb - 0.714136286 * cr)
    b = _clip8(y + 1.772 * cb)
    return w, h, np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# EXIF (Exif 2.3 / TIFF 6.0 public layouts): APP1 metadata segment
# ---------------------------------------------------------------------------

_EXIF_TAGS = {"make": 0x010F, "model": 0x0110, "orientation": 0x0112, "datetime": 0x0132}


def exif_app1(
    make: str, model: str, orientation: int, datetime: str, big_endian: bool = False
) -> bytes:
    """An APP1 Exif segment: ``Exif\\0\\0`` + TIFF header (II or MM) +
    one IFD0 with Make/Model (ASCII), Orientation (SHORT) and DateTime
    (ASCII, the EXIF ``YYYY:MM:DD HH:MM:SS`` shape); string values
    longer than 4 bytes spill to the value area behind TIFF-relative
    offsets, exactly as the spec lays them out."""
    import struct

    e = ">" if big_endian else "<"
    entries = []  # (tag, type, count, value_bytes-or-int)
    for name, val in (("make", make), ("model", model), ("datetime", datetime)):
        sv = val.encode("ascii") + b"\x00"
        entries.append((_EXIF_TAGS[name], 2, len(sv), sv))
    entries.append((_EXIF_TAGS["orientation"], 3, 1, int(orientation)))
    entries.sort(key=lambda t: t[0])  # TIFF requires ascending tag order
    n = len(entries)
    ifd_at = 8
    value_at = ifd_at + 2 + 12 * n + 4
    body = bytearray()
    body += (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, ifd_at)
    body += struct.pack(e + "H", n)
    spill = bytearray()
    for tag, typ, cnt, val in entries:
        body += struct.pack(e + "HHI", tag, typ, cnt)
        if typ == 3:  # SHORT inline, left-justified in the 4-byte slot
            body += struct.pack(e + "H", val) + b"\x00\x00"
        elif cnt <= 4:
            body += bytes(val).ljust(4, b"\x00")
        else:
            body += struct.pack(e + "I", value_at + len(spill))
            spill += val
    body += struct.pack(e + "I", 0)  # next-IFD = none
    body += spill
    payload = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def parse_exif(data: bytes):
    """Scan a JPEG's marker stream for the Exif APP1 and parse IFD0 in
    either byte order.  Returns ``{"byte_order", "make", "model",
    "orientation", "datetime"}`` (missing tags absent) or None when the
    file carries no Exif segment.  Lenient: malformed TIFF -> None."""
    import struct

    try:
        if data[:2] != b"\xff\xd8":
            return None
        pos = 2
        tiff = None
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = struct.unpack_from(">H", data, pos + 2)[0]
            if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
                tiff = data[pos + 10 : pos + 2 + seglen]
                break
            if marker == 0xDA:  # SOS: entropy data follows, no Exif ahead
                return None
            pos += 2 + seglen
        if tiff is None:
            return None
        if tiff[:2] == b"II":
            e = "<"
        elif tiff[:2] == b"MM":
            e = ">"
        else:
            return None
        magic, ifd_at = struct.unpack_from(e + "HI", tiff, 2)
        if magic != 42:
            return None
        out = {"byte_order": tiff[:2].decode("ascii")}
        n = struct.unpack_from(e + "H", tiff, ifd_at)[0]
        names = {v: k for k, v in _EXIF_TAGS.items()}
        for i in range(min(n, 64)):
            at = ifd_at + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, at)
            if tag not in names:
                continue
            if typ == 3:
                out[names[tag]] = struct.unpack_from(e + "H", tiff, at + 8)[0]
            elif typ == 2:
                if cnt <= 4:
                    raw = tiff[at + 8 : at + 8 + cnt]
                else:
                    off = struct.unpack_from(e + "I", tiff, at + 8)[0]
                    raw = tiff[off : off + cnt]
                out[names[tag]] = raw.split(b"\x00")[0].decode("ascii", "replace")
        return out
    except Exception:
        return None
