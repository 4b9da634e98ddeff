"""CFF font program parsing (the public Adobe CFF spec TN#5176 and
Type 2 charstring spec TN#5177; PDF embedding per ISO 32000 §9.9
/FontFile3 /Subtype /Type1C).

Width model: a Type 2 charstring declares its width as an OPTIONAL
extra leading operand before its first stem/moveto/endchar operator —
``width = nominalWidthX + operand`` — and a charstring that omits it
advances ``defaultWidthX``; both values live in the font's Private
DICT.  Codes map to glyphs through the CFF Encoding (format 0 here).
:func:`parse_cff_widths` reads exactly that chain: header, the four
leading INDEX structures, Top DICT offsets, Private DICT width
defaults, Encoding, and a bounded Type 2 operand parse per charstring.

The synth side uses the matched :func:`build_cff_font` generator (the
core/type1.py / core/truetype.py pattern) so fixtures are structurally
real CFF.  Reference parity: none — the reference treats font streams
as opaque bytes.
"""

from __future__ import annotations

import struct


def _read_index(data: bytes, pos: int):
    """One CFF INDEX at ``pos`` -> (entries, next_pos)."""
    if pos + 2 > len(data):
        return [], pos
    count = struct.unpack_from(">H", data, pos)[0]
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    opos = pos + 3
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[opos + i * off_size : opos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    base = opos + (count + 1) * off_size - 1
    entries = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return entries, base + offs[count]


def _parse_dict(data: bytes) -> dict:
    """CFF DICT -> {op: [operands]} (ops 12 xx keyed as 1200+xx)."""
    out: dict = {}
    stack: list = []
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12 and i < n:
                op = 1200 + data[i]
                i += 1
            out[op] = stack
            stack = []
        elif 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            stack.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            stack.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            stack.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b0 == 29:
            stack.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b0 == 30:  # real: BCD nibbles until 0xF
            i += 1
            digits = ""
            done = False
            while i < n and not done:
                for nib in (data[i] >> 4, data[i] & 0xF):
                    if nib <= 9:
                        digits += str(nib)
                    elif nib == 0xA:
                        digits += "."
                    elif nib == 0xB:
                        digits += "E"
                    elif nib == 0xC:
                        digits += "E-"
                    elif nib == 0xE:
                        digits += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            try:
                stack.append(float(digits or "0"))
            except ValueError:
                stack.append(0.0)
        else:
            i += 1
    return out


# Type 2 operators whose FIRST extra operand is the width
_T2_STEMS = {1, 3, 18, 23}
_T2_EVEN = {1: 0, 3: 0, 18: 0, 23: 0, 21: 2, 22: 1, 4: 1, 14: 0, 19: 0, 20: 0}


def _t2_width(cs: bytes, default_w, nominal_w):
    """Width a Type 2 charstring advances: the optional leading operand
    (nominalWidthX + v) before the first stem/mask/moveto/endchar, else
    defaultWidthX."""
    stack: list = []
    i, n = 0, len(cs)
    while i < n and len(stack) <= 48:
        b0 = cs[i]
        if 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            if i + 1 >= n:
                return default_w
            stack.append((b0 - 247) * 256 + cs[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            if i + 1 >= n:
                return default_w
            stack.append(-(b0 - 251) * 256 - cs[i + 1] - 108)
            i += 2
        elif b0 == 28:
            if i + 2 >= n:
                return default_w
            stack.append(struct.unpack_from(">h", cs, i + 1)[0])
            i += 3
        elif b0 == 255:  # 16.16 fixed
            if i + 4 >= n:
                return default_w
            stack.append(struct.unpack_from(">i", cs, i + 1)[0] / 65536.0)
            i += 5
        elif b0 in _T2_EVEN:
            expected = _T2_EVEN[b0]
            if b0 in _T2_STEMS or b0 in (19, 20):
                has_w = len(stack) % 2 == 1
            else:
                has_w = len(stack) > expected
            if has_w and stack:
                return nominal_w + stack[0]
            return default_w
        else:
            return default_w  # any other op first: no width operand
    return default_w


def parse_cff_widths(data: bytes) -> dict:
    """``/FontFile3`` CFF bytes -> ``{code: width}`` via the format-0
    Encoding and per-charstring Type 2 width parse.  Lenient: malformed
    input -> empty map."""
    try:
        data = bytes(data)
        hdr_size = data[2]
        _names, p = _read_index(data, hdr_size)
        tops, p = _read_index(data, p)
        _strings, p = _read_index(data, p)
        _gsubrs, p = _read_index(data, p)
        if not tops:
            return {}
        top = _parse_dict(tops[0])
        cs_off = top.get(17)
        if not cs_off:
            return {}
        charstrings, _ = _read_index(data, int(cs_off[0]))
        default_w, nominal_w = 0, 0
        priv = top.get(18)
        if priv and len(priv) >= 2:
            size, off = int(priv[0]), int(priv[1])
            pd = _parse_dict(data[off : off + size])
            if 20 in pd and pd[20]:
                default_w = pd[20][0]
            if 21 in pd and pd[21]:
                nominal_w = pd[21][0]
        enc_off = top.get(16)
        code_to_gid: dict = {}
        if enc_off and int(enc_off[0]) > 1:
            e = int(enc_off[0])
            fmt = data[e] & 0x7F
            if fmt == 0:
                n_codes = data[e + 1]
                for i in range(n_codes):
                    code_to_gid[data[e + 2 + i]] = i + 1  # gid 0 = .notdef
            elif fmt == 1:
                n_ranges = data[e + 1]
                gid = 1
                for r in range(n_ranges):
                    first, n_left = data[e + 2 + 2 * r], data[e + 3 + 2 * r]
                    for k in range(n_left + 1):
                        code_to_gid[first + k] = gid
                        gid += 1
        else:
            # Standard encoding shortcut: gid order == code order is NOT
            # implied by the spec; without a custom encoding we cannot
            # map codes reliably here — return empty (caller falls back)
            return {}
        out: dict = {}
        for code, gid in code_to_gid.items():
            if 0 < gid < len(charstrings):
                w = _t2_width(charstrings[gid], default_w, nominal_w)
                out[code] = int(round(w))
        return out
    except Exception:
        return {}


def _dict_num(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    if -32768 <= v <= 32767:
        return b"\x1c" + struct.pack(">h", v)
    return b"\x1d" + struct.pack(">i", v)


def _t2_num(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    return b"\x1c" + struct.pack(">h", v)


def _index(entries: list) -> bytes:
    if not entries:
        return struct.pack(">H", 0)
    offs = [1]
    for e in entries:
        offs.append(offs[-1] + len(e))
    off_size = 1 if offs[-1] < 256 else (2 if offs[-1] < 65536 else 4)
    out = struct.pack(">H", len(entries)) + bytes([off_size])
    for o in offs:
        out += o.to_bytes(off_size, "big")
    return out + b"".join(entries)


def build_cff_font(widths: dict, default_w: int, nominal_w: int) -> bytes:
    """A minimal real CFF: glyphs for ``widths``' codes in code order
    (format-0 Encoding), each charstring ``[w - nominalWidthX] endchar``
    — EXCEPT codes whose width equals ``default_w``, which omit the
    operand and rely on the Private DICT's defaultWidthX (both width
    paths exercised).  Charset omitted (op 15 default = ISOAdobe) —
    width resolution never needs glyph names."""
    codes = sorted(widths)
    css = [b"\x0e"]  # .notdef: bare endchar
    for c in codes:
        w = int(widths[c])
        if w == default_w:
            css.append(b"\x0e")
        else:
            css.append(_t2_num(w - nominal_w) + b"\x0e")
    cs_index = _index(css)
    enc = bytes([0, len(codes)]) + bytes(codes)
    priv = (
        _dict_num(default_w) + bytes([20])
        + _dict_num(nominal_w) + bytes([21])
    )
    name_index = _index([b"SYNFCFF"])
    string_index = _index([])
    gsubr_index = _index([])
    header = bytes([1, 0, 4, 1])

    # Top DICT references absolute offsets -> fix-point iterate (layout
    # depends on operand widths, which depend on the offsets)
    enc_off = cs_off = priv_off = 0
    for _ in range(4):
        top = (
            _dict_num(enc_off) + bytes([16])
            + _dict_num(cs_off) + bytes([17])
            + _dict_num(len(priv)) + _dict_num(priv_off) + bytes([18])
        )
        top_index = _index([top])
        base = len(header) + len(name_index) + len(top_index) + len(string_index) + len(gsubr_index)
        new_enc, new_cs, new_priv = base, base + len(enc), base + len(enc) + len(cs_index)
        if (new_enc, new_cs, new_priv) == (enc_off, cs_off, priv_off):
            break
        enc_off, cs_off, priv_off = new_enc, new_cs, new_priv
    return header + name_index + top_index + string_index + gsubr_index + enc + cs_index + priv
