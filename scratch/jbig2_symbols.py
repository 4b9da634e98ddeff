"""Scratch draft: JBIG2 symbol dictionary + text region (T.88 §6.4/§6.5,
§7.4.3/§7.4.4) — arithmetic coding only, refinement off.  Will be merged
into pdfparser_spark/textops/jbig2.py after the running oracle sweep
finishes (mid-sweep edits to imported modules leak into fresh workers).
"""

from __future__ import annotations

import struct

import numpy as np

from pdfparser_spark.textops.jbig2 import (
    MQDecoder,
    MQEncoder,
    _gb_context,
    _TEMPLATE_COORDS,
    _NOMINAL_AT,
)

OOB = object()  # out-of-band sentinel for the IAx integer procedure


# ---------------------------------------------------------------------------
# Annex A integer arithmetic decoding (IAx registers).  Each register is a
# 512-entry context array driven by the segment's single MQ coder; the
# PREV context tracker follows A.2 (cap at 9 bits, high bit pinned).

def _ia_new() -> list:
    return [(0, 0)] * 512


class _IABitReader:
    def __init__(self, dec: MQDecoder, state: list):
        self.dec = dec
        self.state = state
        self.prev = 1

    def bit(self) -> int:
        d = self.dec.decode(self.state, self.prev)
        if self.prev < 256:
            self.prev = (self.prev << 1) | d
        else:
            self.prev = ((((self.prev << 1) | d) & 511) | 256)
        return d


def decode_ia(dec: MQDecoder, state: list):
    """A.2 decoding procedure -> int or OOB."""
    r = _IABitReader(dec, state)
    s = r.bit()
    if not r.bit():
        n, off = 2, 0
    elif not r.bit():
        n, off = 4, 4
    elif not r.bit():
        n, off = 6, 20
    elif not r.bit():
        n, off = 8, 84
    elif not r.bit():
        n, off = 12, 340
    else:
        n, off = 32, 4436
    v = 0
    for _ in range(n):
        v = (v << 1) | r.bit()
    v += off
    if s and v == 0:
        return OOB
    return -v if s else v


class _IABitWriter:
    def __init__(self, enc: MQEncoder, state: list):
        self.enc = enc
        self.state = state
        self.prev = 1

    def bit(self, d: int) -> None:
        self.enc.encode(self.state, self.prev, d)
        if self.prev < 256:
            self.prev = (self.prev << 1) | d
        else:
            self.prev = ((((self.prev << 1) | d) & 511) | 256)


def encode_ia(enc: MQEncoder, state: list, v) -> None:
    """Matched A.2 encoder; pass OOB for the out-of-band value."""
    w = _IABitWriter(enc, state)
    if v is OOB:
        w.bit(1)  # S = negative
        # V == 0 in the first (2-bit) range
        w.bit(0)
        w.bit(0)
        w.bit(0)
        return
    s = 1 if v < 0 else 0
    a = -v if v < 0 else v
    w.bit(s)
    for take, n, off in ((1, 2, 0), (1, 4, 4), (1, 6, 20), (1, 8, 84), (1, 12, 340)):
        hi = off + (1 << n) - 1
        if a <= hi:
            w.bit(0)
            rem = a - off
            for i in range(n - 1, -1, -1):
                w.bit((rem >> i) & 1)
            return
        w.bit(1)
    rem = a - 4436
    for i in range(31, -1, -1):
        w.bit((rem >> i) & 1)


def decode_iaid(dec: MQDecoder, state: list, symcodelen: int) -> int:
    """A.3 IAID decoding: a symcodelen-bit tree walk."""
    prev = 1
    for _ in range(symcodelen):
        d = dec.decode(state, prev)
        prev = (prev << 1) | d
    return prev - (1 << symcodelen)


def encode_iaid(enc: MQEncoder, state: list, symcodelen: int, sid: int) -> None:
    prev = 1
    for i in range(symcodelen - 1, -1, -1):
        d = (sid >> i) & 1
        enc.encode(state, prev, d)
        prev = (prev << 1) | d


def _iaid_new(symcodelen: int) -> list:
    return [(0, 0)] * (1 << (symcodelen + 1))


# ---------------------------------------------------------------------------
# generic-region coding against a SHARED coder + context state (the symbol
# dictionary codes every symbol bitmap in one arithmetic stream)

def _decode_generic_shared(
    dec: MQDecoder, state: list, w: int, h: int, template: int
) -> np.ndarray:
    coords = _TEMPLATE_COORDS[template]
    rows: list = []
    for y in range(h):
        row = [0] * w
        rows.append(row)
        for x in range(w):
            row[x] = dec.decode(state, _gb_context(rows, x, y, w, coords))
    return np.array(rows, dtype=bool).reshape(h, w)


def _encode_generic_shared(
    enc: MQEncoder, state: list, mask: np.ndarray, template: int
) -> None:
    coords = _TEMPLATE_COORDS[template]
    h, w = mask.shape
    rows = mask.astype(np.uint8).tolist()
    for y in range(h):
        for x in range(w):
            enc.encode(state, _gb_context(rows, x, y, w, coords), rows[y][x])


# ---------------------------------------------------------------------------
# symbol dictionary (§6.5 decoding, §7.4.3 segment layout)

def decode_symbol_dict(data: bytes) -> list:
    """Symbol dictionary segment payload -> exported symbol bitmaps."""
    if len(data) < 12:
        raise ValueError("JBIG2: short symbol dictionary segment")
    (flags,) = struct.unpack_from(">H", data, 0)
    if flags & 0x01:
        raise ValueError("JBIG2: Huffman symbol dictionaries unsupported")
    if flags & 0x02:
        raise ValueError("JBIG2: refinement/aggregate symbol coding unsupported")
    template = (flags >> 10) & 0x03
    pos = 2
    nominal = _NOMINAL_AT[template]
    n_at = len(nominal)
    if pos + n_at > len(data):
        raise ValueError("JBIG2: truncated symbol dictionary AT pixels")
    if struct.unpack_from("%db" % n_at, data, pos) != nominal:
        raise ValueError("JBIG2: non-nominal AT pixels unsupported")
    pos += n_at
    n_ex, n_new = struct.unpack_from(">II", data, pos)
    pos += 8
    if n_new > 1 << 16 or n_ex > 1 << 16:
        raise ValueError("JBIG2: implausible symbol counts")
    dec = MQDecoder(data[pos:])
    iadh, iadw, iaex = _ia_new(), _ia_new(), _ia_new()
    gb_state = [(0, 0)] * (1 << 16)
    new_syms: list = []
    hcheight = 0
    while len(new_syms) < n_new:
        dh = decode_ia(dec, iadh)
        if dh is OOB:
            raise ValueError("JBIG2: OOB height-class delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 12:
            raise ValueError("JBIG2: implausible symbol height")
        symwidth = 0
        while True:
            dw = decode_ia(dec, iadw)
            if dw is OOB:
                break  # end of this height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 12:
                raise ValueError("JBIG2: implausible symbol width")
            if len(new_syms) >= n_new:
                raise ValueError("JBIG2: more symbols than declared")
            new_syms.append(
                _decode_generic_shared(dec, gb_state, symwidth, hcheight, template)
            )
    # export flags: alternating skip/export run lengths via IAEX (§6.5.10)
    exported: list = []
    exflag = 0
    idx = 0
    total = n_new  # no input symbols in this subset
    while idx < total:
        run = decode_ia(dec, iaex)
        if run is OOB or run < 0 or idx + run > total:
            raise ValueError("JBIG2: bad export run length")
        if exflag:
            exported.extend(new_syms[idx : idx + run])
        idx += run
        exflag ^= 1
    if len(exported) != n_ex:
        raise ValueError("JBIG2: export count mismatch")
    return exported


def encode_symbol_dict(symbols: list, template: int = 0) -> bytes:
    """Matched §7.4.3 writer: symbols MUST be sorted by (height, width).
    All symbols exported."""
    flags = template << 10
    at = _NOMINAL_AT[template]
    out = struct.pack(">H", flags) + struct.pack("%db" % len(at), *at)
    out += struct.pack(">II", len(symbols), len(symbols))
    enc = MQEncoder()
    iadh, iadw, iaex = _ia_new(), _ia_new(), _ia_new()
    gb_state = [(0, 0)] * (1 << 16)
    hcheight = 0
    i = 0
    n = len(symbols)
    while i < n:
        h = symbols[i].shape[0]
        encode_ia(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < n and symbols[i].shape[0] == hcheight:
            w = symbols[i].shape[1]
            encode_ia(enc, iadw, w - symwidth)
            symwidth = w
            _encode_generic_shared(enc, gb_state, symbols[i], template)
            i += 1
        encode_ia(enc, iadw, OOB)
    # export all: run of 0 skipped, then run of n exported
    encode_ia(enc, iaex, 0)
    encode_ia(enc, iaex, n)
    return out + enc.flush()


# ---------------------------------------------------------------------------
# text region (§6.4 decoding, §7.4.4 segment layout); SBSTRIPS=1,
# TRANSPOSED=0, REFCORNER=TL, OR composition, no refinement

def decode_text_region(data: bytes, symbols: list):
    """Text region segment payload -> (x, y, mask)."""
    if len(data) < 23:
        raise ValueError("JBIG2: short text region segment")
    rw, rh, rx, ry = struct.unpack_from(">IIII", data, 0)
    if rw == 0 or rh == 0 or rw > 1 << 20 or rh > 1 << 20:
        raise ValueError("JBIG2: implausible text region geometry")
    (flags,) = struct.unpack_from(">H", data, 17)
    if flags & 0x01:
        raise ValueError("JBIG2: Huffman text regions unsupported")
    if flags & 0x02:
        raise ValueError("JBIG2: refinement text regions unsupported")
    log_strips = (flags >> 2) & 0x03
    strips = 1 << log_strips
    refcorner = (flags >> 4) & 0x03
    transposed = bool(flags & 0x40)
    combop = (flags >> 7) & 0x03
    defpix = bool(flags & 0x200)
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit
    if transposed or defpix or combop != 0:
        raise ValueError("JBIG2: text region variant unsupported")
    (n_inst,) = struct.unpack_from(">I", data, 19)
    if n_inst > 1 << 20:
        raise ValueError("JBIG2: implausible instance count")
    n_syms = len(symbols)
    symcodelen = max(0, (n_syms - 1).bit_length()) if n_syms > 1 else 0
    dec = MQDecoder(data[23:])
    iadt, iafs, iads, iait = _ia_new(), _ia_new(), _ia_new(), _ia_new()
    iaid = _iaid_new(symcodelen)
    region = np.zeros((rh, rw), dtype=bool)
    dt = decode_ia(dec, iadt)
    if dt is OOB:
        raise ValueError("JBIG2: OOB initial DT")
    stript = -dt * strips
    firsts = 0
    drawn = 0
    while drawn < n_inst:
        dt = decode_ia(dec, iadt)
        if dt is OOB:
            raise ValueError("JBIG2: OOB strip DT")
        stript += dt * strips
        dfs = decode_ia(dec, iafs)
        if dfs is OOB:
            raise ValueError("JBIG2: OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = decode_ia(dec, iads)
                if ids is OOB:
                    break  # end of strip
                curs += ids + dsoffset
            first = False
            curt = 0 if strips == 1 else decode_ia(dec, iait)
            if curt is OOB:
                raise ValueError("JBIG2: OOB CURT")
            ti = stript + curt
            sid = decode_iaid(dec, iaid, symcodelen)
            if sid >= n_syms:
                raise ValueError("JBIG2: symbol id out of range")
            sym = symbols[sid]
            hs, ws = sym.shape
            # REFCORNER placement (§6.4.5 3(c)(vi)): TL anchors the top
            # row at TI; BL anchors the BOTTOM row
            y0 = ti if refcorner in (1, 3) else ti - hs + 1
            if y0 < 0 or y0 + hs > rh or curs < 0 or curs + ws > rw:
                raise ValueError("JBIG2: symbol instance outside region")
            region[y0 : y0 + hs, curs : curs + ws] |= sym
            curs += ws - 1
            drawn += 1
            if drawn >= n_inst:
                break
    return rx, ry, region


def encode_text_region(
    placements: list, symbols: list, rw: int, rh: int, rx: int = 0, ry: int = 0
) -> bytes:
    """Matched §7.4.4 writer.  ``placements`` = [(x, y, sym_id)] with TL
    anchoring; one strip per distinct y, instances sorted by x."""
    n_syms = len(symbols)
    symcodelen = max(0, (n_syms - 1).bit_length()) if n_syms > 1 else 0
    flags = 1 << 4  # REFCORNER = TL; everything else 0
    out = struct.pack(">IIIIB", rw, rh, rx, ry, 0) + struct.pack(">H", flags)
    out += struct.pack(">I", len(placements))
    enc = MQEncoder()
    iadt, iafs, iads = _ia_new(), _ia_new(), _ia_new()
    iaid = _iaid_new(symcodelen)
    by_y: dict[int, list] = {}
    for x, y, sid in placements:
        by_y.setdefault(y, []).append((x, sid))
    encode_ia(enc, iadt, 0)  # initial DT -> STRIPT = 0
    stript = 0
    firsts = 0
    for y in sorted(by_y):
        encode_ia(enc, iadt, y - stript)
        stript = y
        row = sorted(by_y[y])
        x0 = row[0][0]
        encode_ia(enc, iafs, x0 - firsts)
        firsts = x0
        curs = x0
        for j, (x, sid) in enumerate(row):
            if j > 0:
                encode_ia(enc, iads, x - curs)
                curs = x
            encode_iaid(enc, iaid, symcodelen, sid)
            curs += symbols[sid].shape[1] - 1
        encode_ia(enc, iads, OOB)
    return out + enc.flush()


# ---------------------------------------------------------------------------
# round-trip harness

def _tile_symbols(mask: np.ndarray, ts: int = 8):
    """Tile the bitmap into <=ts x ts blocks, dedupe inked tiles into a
    dictionary sorted by (h, w, bytes), return (symbols, placements)."""
    h, w = mask.shape
    seen: dict = {}
    tiles = []
    for y in range(0, h, ts):
        for x in range(0, w, ts):
            t = mask[y : y + ts, x : x + ts]
            if not t.any():
                continue
            key = (t.shape, t.tobytes())
            tiles.append((x, y, key, t))
            seen[key] = t
    orderd = sorted(seen, key=lambda k: (k[0][0], k[0][1], k[1]))
    ids = {k: i for i, k in enumerate(orderd)}
    symbols = [seen[k] for k in orderd]
    placements = [(x, y, ids[k]) for x, y, k, _t in tiles]
    return symbols, placements


if __name__ == "__main__":
    rng_masks = []
    # the scanned family's analytic stripe ink at several doc ids
    import sys

    sys.path.insert(0, "/root/repo")
    from pdfparser_spark.synth import scanned_ink, scanned_dims

    for d in (2, 12, 22, 32, 42, 52, 62, 72):
        ink = scanned_ink(d)
        syms, plc = _tile_symbols(ink)
        for tmpl in range(4):
            blob = encode_symbol_dict(syms, template=tmpl)
            back = decode_symbol_dict(blob)
            assert len(back) == len(syms)
            for a, b in zip(back, syms):
                assert np.array_equal(a, b), (d, tmpl, "symbol mismatch")
        h, w = ink.shape
        tr = encode_text_region(plc, syms, w, h)
        x, y, region = decode_text_region(tr, syms)
        assert (x, y) == (0, 0)
        assert np.array_equal(region, ink), (d, "region mismatch")
        print(d, scanned_dims(d), "symbols", len(syms), "instances", len(plc), "OK")
    # IAx edge values round-trip
    enc = MQEncoder()
    st = _ia_new()
    vals = [0, 1, -1, 3, 4, -4, 19, 20, 83, 84, 339, 340, 4435, 4436, 99999, -99999, OOB, 7, OOB, -2]
    for v in vals:
        encode_ia(enc, st, v)
    data = enc.flush()
    dec = MQDecoder(data)
    st2 = _ia_new()
    for v in vals:
        got = decode_ia(dec, st2)
        assert (got is OOB) == (v is OOB) and (got is OOB or got == v), (v, got)
    print("IAx OK")
