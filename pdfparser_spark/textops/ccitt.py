"""CCITTFaxDecode — ITU-T T.4 (Group 3) / T.6 (Group 4) bi-level codec.

The dominant filter in scanned PDFs.  The reference routes CCITT streams
to the unsupported-media path (decode.rs:46 stance, mirrored by
core/filters.py MEDIA_FILTERS); this module implements the real codec on
top of that seam, from the PUBLIC standards:

  - run-length code tables: ITU-T T.4 §4.1 tables 1-3 (white/black
    terminating codes 0-63, makeup codes 64-1728, shared extended
    makeups 1792-2560),
  - one-dimensional Modified Huffman coding (T.4 §4.1; PDF /K = 0),
  - two-dimensional MMR coding (T.6 §2.2; PDF /K < 0 — Group 4):
    pass / horizontal / vertical modes against the reference line,
  - PDF-layer options (ISO 32000 §7.4.6): /Columns, /Rows,
    /EncodedByteAlign (each coded line starts byte-aligned), /BlackIs1
    (sense of the DECODED bits — CCITT itself always codes ink runs;
    the writer using BlackIs1 stores ink as 1-bits).

Both directions are implemented (the encoder doubles as the synthetic
scanned-family writer), masks are numpy bool arrays (True = ink/black),
and — like every media codec here — corrupt input only ever raises
ValueError: the Arrow kernels stay alive on garbage bytes.

Sequential per image by nature (the bitstream is a prefix-code chain);
scanned-corpus parallelism is per document, which is exactly the fused
kernels' partitioning.
"""

from __future__ import annotations

import numpy as np

# --- ITU-T T.4 run-length code tables (run -> bitstring) --------------------

_WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeups (T.4 table 3) — shared by both colors
_EXT = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# 2-D mode codes (T.6 table 1)
_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
_MODE_H = "001"
_MODE_P = "0001"
_EOL = "000000000001"

_MAX_RUN_BITS = 13  # longest run code (black 13-bit makeups)


def _decode_table(codes: dict) -> dict:
    out = {}
    for run, bits in codes.items():
        out[(len(bits), int(bits, 2))] = run
    for run, bits in _EXT.items():
        out[(len(bits), int(bits, 2))] = run
    return out


_WHITE_DEC = _decode_table(_WHITE)
_BLACK_DEC = _decode_table(_BLACK)

_MODE_DEC = {
    (1, 0b1): ("v", 0),
    (3, 0b011): ("v", 1), (3, 0b010): ("v", -1),
    (6, 0b000011): ("v", 2), (6, 0b000010): ("v", -2),
    (7, 0b0000011): ("v", 3), (7, 0b0000010): ("v", -3),
    (3, 0b001): ("h", 0),
    (4, 0b0001): ("p", 0),
    (12, 0b000000000001): ("eol", 0),
}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: str) -> None:
        for b in bits:
            self.acc = (self.acc << 1) | (b == "1")
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = self.n = 0

    def align(self) -> None:
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = self.n = 0

    def finish(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        i = self.pos >> 3
        if i >= len(self.data):
            raise ValueError("CCITT: bitstream exhausted")
        b = (self.data[i] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return (self.pos >> 3) >= len(self.data)


def _encode_run(w: _BitWriter, run: int, black: bool) -> None:
    table = _BLACK if black else _WHITE
    while run >= 2624:  # repeated max extended makeup
        w.write(_EXT[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        w.write(_EXT[makeup] if makeup > 1728 else table[makeup])
        run -= makeup
    w.write(table[run])


def _decode_run(r: _BitReader, black: bool) -> int:
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    while True:
        nbits = 0
        val = 0
        run = None
        while nbits < _MAX_RUN_BITS + 1:
            val = (val << 1) | r.bit()
            nbits += 1
            run = table.get((nbits, val))
            if run is not None:
                break
        if run is None:
            raise ValueError("CCITT: invalid run code")
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _changes(row: np.ndarray) -> list:
    """Changing-element positions of a line (pixel differs from the one
    before it; the imaginary pixel before the line is WHITE)."""
    prev = np.empty_like(row)
    prev[0] = False
    prev[1:] = row[:-1]
    return np.flatnonzero(row != prev).tolist()


def _b1_b2(ref_ch: list, ref: np.ndarray, a0: int, color: bool, W: int):
    """b1 = first changing element of the reference line to the right of
    a0 whose NEW color is opposite to the coding color; b2 = the next
    changing element after b1 (T.6 §2.2.1)."""
    for i, p in enumerate(ref_ch):
        if p > a0 and bool(ref[p]) != color:
            b2 = ref_ch[i + 1] if i + 1 < len(ref_ch) else W
            return p, b2
    return W, W


def encode_g4(mask: np.ndarray, byte_align: bool = False) -> bytes:
    """T.6 (Group 4) encode of a bool ink mask (True = black).  Emits the
    EOFB terminator (PDF /EndOfBlock default)."""
    H, W = mask.shape
    w = _BitWriter()
    ref = np.zeros(W, dtype=bool)  # imaginary all-white line above row 0
    for y in range(H):
        if byte_align:
            w.align()
        cur = mask[y]
        cur_ch = _changes(cur)
        ref_ch = _changes(ref)
        a0 = -1
        color = False
        while a0 < W:
            a1 = next((p for p in cur_ch if p > a0 and bool(cur[p]) != color), W)
            b1, b2 = _b1_b2(ref_ch, ref, a0, color, W)
            if b2 < a1:
                w.write(_MODE_P)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                w.write(_MODE_V[a1 - b1])
                a0 = a1
                color = not color
            else:
                a2 = next((p for p in cur_ch if p > a1 and bool(cur[p]) == color), W)
                w.write(_MODE_H)
                start = a0 if a0 >= 0 else 0
                _encode_run(w, a1 - start, color)
                _encode_run(w, a2 - a1, not color)
                a0 = a2
        ref = cur
    w.write(_EOL + _EOL)  # EOFB
    return w.finish()


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              byte_align: bool = False) -> np.ndarray:
    """T.6 decode -> bool ink mask (True = black).  Stops after ``rows``
    lines or at EOFB; raises ValueError on any malformed bitstream."""
    if columns <= 0 or columns > 1 << 20:
        raise ValueError("CCITT: bad /Columns")
    r = _BitReader(data)
    W = columns
    out: list = []
    ref = np.zeros(W, dtype=bool)
    while rows is None or len(out) < rows:
        if byte_align:
            r.align()
        if r.exhausted():
            if rows is None:
                break
            raise ValueError("CCITT: truncated image data")
        cur = np.zeros(W, dtype=bool)
        ref_ch = _changes(ref)
        a0 = -1
        color = False
        eofb = False
        while a0 < W:
            # read one mode code
            nbits = 0
            val = 0
            mode = None
            while nbits < 12:
                val = (val << 1) | r.bit()
                nbits += 1
                mode = _MODE_DEC.get((nbits, val))
                if mode is not None:
                    break
            if mode is None:
                raise ValueError("CCITT: invalid mode code")
            kind, dv = mode
            if kind == "eol":
                eofb = True
                break
            start = a0 if a0 >= 0 else 0
            b1, b2 = _b1_b2(ref_ch, ref, a0, color, W)
            if kind == "p":
                if color:
                    cur[start:b2] = True
                a0 = b2
            elif kind == "v":
                a1 = b1 + dv
                if a1 < 0 or a1 > W:
                    raise ValueError("CCITT: vertical mode out of range")
                if color:
                    cur[start:a1] = True
                a0 = a1
                color = not color
            else:  # horizontal: two runs from start
                r1 = _decode_run(r, color)
                r2 = _decode_run(r, not color)
                if start + r1 + r2 > W:
                    raise ValueError("CCITT: run overflows line")
                if color:
                    cur[start : start + r1] = True
                else:
                    cur[start + r1 : start + r1 + r2] = True
                a0 = start + r1 + r2
        if eofb:
            break
        out.append(cur)
        ref = cur
    if rows is not None and len(out) < rows:
        raise ValueError("CCITT: fewer lines than /Rows")
    return np.array(out, dtype=bool) if out else np.zeros((0, W), dtype=bool)


def encode_mh(mask: np.ndarray, byte_align: bool = False) -> bytes:
    """T.4 one-dimensional Modified Huffman encode (PDF /K = 0, no EOLs —
    the PDF default /EndOfLine false): each line is the plain run chain
    starting with a (possibly zero-length) white run."""
    H, W = mask.shape
    w = _BitWriter()
    for y in range(H):
        if byte_align:
            w.align()
        row = mask[y]
        x = 0
        color = False
        while x < W:
            run = 0
            while x + run < W and bool(row[x + run]) == color:
                run += 1
            _encode_run(w, run, color)
            x += run
            color = not color
    return w.finish()


def decode_mh(data: bytes, columns: int, rows: int,
              byte_align: bool = False) -> np.ndarray:
    """T.4 1-D decode -> bool ink mask.  ``rows`` is required (the PDF
    /Rows entry): with neither EOLs nor EOFB the line count is external."""
    if columns <= 0 or columns > 1 << 20:
        raise ValueError("CCITT: bad /Columns")
    r = _BitReader(data)
    out = np.zeros((rows, columns), dtype=bool)
    for y in range(rows):
        if byte_align:
            r.align()
        x = 0
        color = False
        while x < columns:
            run = _decode_run(r, color)
            if x + run > columns:
                raise ValueError("CCITT: run overflows line")
            if color:
                out[y, x : x + run] = True
            x += run
            color = not color
    return out


def encode_ccitt(mask: np.ndarray, k: int = -1, byte_align: bool = False,
                 black_is_1: bool = False) -> bytes:
    """PDF-layer encode: a writer storing ink with /BlackIs1 true codes
    the COMPLEMENT as CCITT-black (the filter's decoded 1-bits must land
    on ink, and DeviceGray renders 1 as white — so the bitstream's black
    runs are the page's white)."""
    m = mask if not black_is_1 else ~mask
    if k < 0:
        return encode_g4(m, byte_align=byte_align)
    if k == 0:
        return encode_mh(m, byte_align=byte_align)
    raise ValueError("CCITT: K > 0 (mixed 2-D G3) not implemented")


def decode_ccitt(data: bytes, columns: int, rows: int | None, k: int = -1,
                 byte_align: bool = False, black_is_1: bool = False) -> np.ndarray:
    """PDF-layer decode -> INK mask (True = black on the page), honoring
    /K, /EncodedByteAlign and /BlackIs1 (ISO 32000 §7.4.6 table 11)."""
    if k < 0:
        m = decode_g4(data, columns, rows, byte_align=byte_align)
    elif k == 0:
        if rows is None:
            raise ValueError("CCITT: /K 0 needs /Rows")
        m = decode_mh(data, columns, rows, byte_align=byte_align)
    else:
        raise ValueError("CCITT: K > 0 (mixed 2-D G3) not implemented")
    return m if not black_is_1 else ~m
