"""TrueType font program parsing (the public OpenType/sfnt spec;
PDF embedding shape per ISO 32000 §9.9 /FontFile2).

Widths for a width-less PDF font with an embedded TrueType program come
from the program's own tables: ``head`` (unitsPerEm — advances scale to
text space by 1000/upem), ``hhea`` (numberOfHMetrics), ``hmtx`` (the
advance-width array; glyphs past numberOfHMetrics repeat the last
advance, the sfnt monospace optimization), and ``cmap`` format 4 (the
segmented char-to-glyph mapping, the format every Windows-platform font
carries).  :func:`parse_truetype_widths` walks exactly that chain.

The synth side uses the matched :func:`build_truetype_font` generator —
same tables, both directions (the core/type1.py pattern), so fixtures
are structurally real sfnt, not look-alikes.

Reference parity: none — the reference treats font streams as opaque
bytes; engine-side depth beyond it.
"""

from __future__ import annotations

import struct


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from(">H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def _tables(data: bytes) -> dict:
    if len(data) < 12:
        return {}
    num = _u16(data, 4)
    out = {}
    for i in range(num):
        o = 12 + 16 * i
        if o + 16 > len(data):
            break
        tag = data[o : o + 4]
        off, ln = _u32(data, o + 8), _u32(data, o + 12)
        if off + ln <= len(data):
            out[tag] = data[off : off + ln]
    return out


def _cmap4(sub: bytes) -> dict:
    """One format-4 subtable -> {code: gid} (idRangeOffset==0 fast path
    plus the glyphIdArray indirection, both per spec)."""
    if len(sub) < 14 or _u16(sub, 0) != 4:
        return {}
    seg2 = _u16(sub, 6)
    segs = seg2 // 2
    ends = [_u16(sub, 14 + 2 * i) for i in range(segs)]
    starts = [_u16(sub, 16 + seg2 + 2 * i) for i in range(segs)]
    deltas = [struct.unpack_from(">h", sub, 16 + 2 * seg2 + 2 * i)[0] for i in range(segs)]
    ro_base = 16 + 3 * seg2
    out: dict = {}
    for i in range(segs):
        ro = _u16(sub, ro_base + 2 * i)
        for c in range(starts[i], min(ends[i], 0xFFFE) + 1):
            if ro == 0:
                gid = (c + deltas[i]) & 0xFFFF
            else:
                # spec's self-relative indirection into glyphIdArray
                go = ro_base + 2 * i + ro + 2 * (c - starts[i])
                if go + 2 > len(sub):
                    continue
                gid = _u16(sub, go)
                if gid != 0:
                    gid = (gid + deltas[i]) & 0xFFFF
            if gid:
                out[c] = gid
    return out


def parse_truetype_widths(data: bytes) -> dict:
    """``/FontFile2`` bytes -> ``{code: width}`` in 1/1000 text-space
    units (head.unitsPerEm folded in).  Lenient: malformed tables just
    yield an empty map."""
    try:
        t = _tables(bytes(data))
        head, hhea, hmtx, cmap = (
            t.get(b"head"), t.get(b"hhea"), t.get(b"hmtx"), t.get(b"cmap"),
        )
        if not (head and hhea and hmtx and cmap):
            return {}
        upem = _u16(head, 18)
        if not upem:
            return {}
        num_h = _u16(hhea, 34)
        adv = [
            _u16(hmtx, 4 * i) for i in range(min(num_h, len(hmtx) // 4))
        ]
        if not adv:
            return {}
        # pick a format-4 subtable (prefer Windows BMP 3/1)
        n_sub = _u16(cmap, 2)
        chosen = None
        for i in range(n_sub):
            pid, eid, off = (
                _u16(cmap, 4 + 8 * i),
                _u16(cmap, 6 + 8 * i),
                _u32(cmap, 8 + 8 * i),
            )
            if off < len(cmap) and _u16(cmap, off) == 4:
                if chosen is None or (pid, eid) == (3, 1):
                    chosen = cmap[off:]
                    if (pid, eid) == (3, 1):
                        break
        if chosen is None:
            return {}
        out = {}
        for code, gid in _cmap4(chosen).items():
            a = adv[gid] if gid < len(adv) else adv[-1]
            out[code] = round(a * 1000 / upem)
        return out
    except Exception:
        return {}


def build_truetype_font(widths: dict, upem: int = 1000) -> bytes:
    """A minimal structurally-real sfnt: head/hhea/maxp/cmap(format 4,
    platform 3/1)/hmtx/loca/glyf.  ``widths`` maps codes (contiguous
    range) to advances in font units; gid = code - min(codes) + 1
    (gid 0 = .notdef)."""
    codes = sorted(widths)
    lo, hi = codes[0], codes[-1]
    n_glyphs = hi - lo + 2  # .notdef + the range
    # hmtx: gid 0 then one advance per mapped gid
    hmtx = struct.pack(">Hh", 500, 0)
    for c in range(lo, hi + 1):
        hmtx += struct.pack(">Hh", widths.get(c, 500), 0)
    head = b"".join([
        struct.pack(">I", 0x00010000),      # version
        struct.pack(">I", 0),               # fontRevision
        struct.pack(">I", 0),               # checkSumAdjustment
        struct.pack(">I", 0x5F0F3CF5),      # magicNumber
        struct.pack(">H", 0),               # flags
        struct.pack(">H", upem),            # unitsPerEm
        struct.pack(">Q", 0),               # created
        struct.pack(">Q", 0),               # modified
        struct.pack(">hhhh", 0, 0, upem, upem),  # bbox
        struct.pack(">HHh", 0, 8, 0),       # macStyle, lowestRec, direction
        struct.pack(">hh", 0, 0),           # indexToLoc (short), glyphDataFormat
    ])
    hhea = b"".join([
        struct.pack(">I", 0x00010000),
        struct.pack(">hhh", 800, -200, 0),  # ascent, descent, lineGap
        struct.pack(">H", 1000),            # advanceWidthMax
        struct.pack(">hhh", 0, 0, 0),       # minLSB, minRSB, xMaxExtent
        struct.pack(">hhh", 1, 0, 0),       # caretSlopeRise/Run, caretOffset
        struct.pack(">hhhh", 0, 0, 0, 0),   # reserved
        struct.pack(">h", 0),               # metricDataFormat
        struct.pack(">H", n_glyphs),        # numberOfHMetrics
    ])
    maxp = struct.pack(">IH", 0x00005000, n_glyphs) + b"\x00" * 26
    # cmap format 4: one segment [lo, hi] with idDelta = (1 - lo), plus
    # the required 0xFFFF terminator segment
    seg_count = 2
    f4 = struct.pack(
        ">HHHHHHH", 4, 16 + 8 * seg_count, 0, seg_count * 2,
        2 * 2 ** (seg_count.bit_length() - 1), seg_count.bit_length() - 1, 0,
    )
    f4 += struct.pack(">HH", hi, 0xFFFF)          # endCode[]
    f4 += struct.pack(">H", 0)                    # reservedPad
    f4 += struct.pack(">HH", lo, 0xFFFF)          # startCode[]
    f4 += struct.pack(">hh", 1 - lo, 1)           # idDelta[]
    f4 += struct.pack(">HH", 0, 0)                # idRangeOffset[]
    cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 12) + f4
    loca = b"\x00\x00" * (n_glyphs + 1)           # all-empty glyphs
    glyf = b"\x00\x00\x00\x00"
    tables = [
        (b"cmap", cmap), (b"glyf", glyf), (b"head", head),
        (b"hhea", hhea), (b"hmtx", hmtx), (b"loca", loca), (b"maxp", maxp),
    ]
    n = len(tables)
    sr = 2 ** (n.bit_length() - 1) * 16
    out = struct.pack(">IHHHH", 0x00010000, n, sr, n.bit_length() - 1, n * 16 - sr)
    off = 12 + 16 * n
    dir_entries = b""
    body = b""
    for tag, data in tables:
        pad = (-len(data)) % 4
        dir_entries += tag + struct.pack(">III", 0, off, len(data))
        body += data + b"\x00" * pad
        off += len(data) + pad
    return out + dir_entries + body
