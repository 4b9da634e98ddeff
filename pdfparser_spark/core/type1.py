"""Type 1 font program parsing (Adobe Type 1 Font Format, the public
1990 "black book"; PDF embedding shape per ISO 32000 §9.9 /FontFile).

A width-less PDF font with an embedded /FontFile still has exact
metrics — they live INSIDE the font program: the clear-text header
carries the built-in /Encoding (``dup <code> /<glyph> put`` entries),
and the eexec-encrypted private portion carries /CharStrings, where
every glyph's charstring begins with its width declaration (``hsbw``:
side bearing + width, or the rare ``sbw`` 4-argument form).  The
kernel-side :func:`parse_type1_widths` walks that chain — eexec
decrypt (sniffing the ASCII-hex form the spec allows), per-charstring
decrypt under /lenIV, charstring-number decode up to the first width
operator — and returns the ``code -> wx`` map the advance cursor needs.

The synth side uses the matched :func:`build_type1_font` encoder (same
tables, both directions — the JBIG2 MQ-coder pattern), so the fixture
programs are real encrypted Type 1, not look-alikes.

Reference parity: the reference parser treats font streams as opaque
bytes (no font-program support anywhere in pdf_file.rs); this tier is
engine-side depth beyond it.
"""

from __future__ import annotations

import re

# the two standard cipher keys (black book §7.2) and the eexec lead bytes
_EEXEC_R = 55665
_CS_R = 4330
_C1, _C2 = 52845, 22719


def _decrypt(data: bytes, r: int) -> bytes:
    out = bytearray()
    for c in data:
        out.append(c ^ (r >> 8))
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def _encrypt(data: bytes, r: int) -> bytes:
    out = bytearray()
    for p in data:
        c = p ^ (r >> 8)
        out.append(c)
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def eexec_decrypt(data: bytes) -> bytes:
    """Drop the 4 random lead bytes the encryption prepends."""
    return _decrypt(data, _EEXEC_R)[4:]


def eexec_encrypt(plain: bytes, lead: bytes = b"SYNT") -> bytes:
    return _encrypt(lead[:4].ljust(4, b"\x00") + plain, _EEXEC_R)


def charstring_decrypt(data: bytes, len_iv: int = 4) -> bytes:
    return _decrypt(data, _CS_R)[len_iv:]


def charstring_encrypt(plain: bytes, len_iv: int = 4) -> bytes:
    return _encrypt(b"cs--"[:len_iv].ljust(len_iv, b"\x00") + plain, _CS_R)


def encode_cs_num(v: int) -> bytes:
    """Charstring number encoding (black book §6.2)."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    return b"\xff" + v.to_bytes(4, "big", signed=True)


def _cs_width(cs: bytes):
    """The wx declared by a decrypted charstring's leading width operator
    — ``hsbw`` (op 13: sbx wx) or ``sbw`` (op 12 7: sbx sby wx wy).  The
    spec requires one of them first; anything else -> None."""
    stack: list = []
    i, n = 0, len(cs)
    while i < n and len(stack) <= 48:
        v = cs[i]
        if v >= 32:
            if v <= 246:
                stack.append(v - 139)
                i += 1
            elif v <= 250:
                if i + 1 >= n:
                    return None
                stack.append((v - 247) * 256 + cs[i + 1] + 108)
                i += 2
            elif v <= 254:
                if i + 1 >= n:
                    return None
                stack.append(-(v - 251) * 256 - cs[i + 1] - 108)
                i += 2
            else:
                if i + 4 >= n:
                    return None
                stack.append(int.from_bytes(cs[i + 1 : i + 5], "big", signed=True))
                i += 5
        elif v == 13:  # hsbw
            return stack[1] if len(stack) >= 2 else None
        elif v == 12 and i + 1 < n and cs[i + 1] == 7:  # sbw
            return stack[2] if len(stack) >= 3 else None
        else:
            return None
    return None


_HEX_CHARS = frozenset(b"0123456789abcdefABCDEF")


def parse_type1_widths(data: bytes) -> dict:
    """``/FontFile`` program bytes -> ``{code: wx}`` in glyph units
    (FontMatrix 0.001 assumed — universal for Type 1).  Codes come from
    the built-in /Encoding's ``dup`` entries; glyphs the encoding does
    not name fall back to AGL inversion (uniXXXX / single-letter names)
    so StandardEncoding-declared fonts still resolve ASCII.  Lenient:
    anything unparseable just drops out of the map."""
    sep = data.find(b"eexec")
    if sep < 0:
        return {}
    clear, enc = data[:sep], data[sep + 5 :]
    enc = enc.lstrip(b"\r\n\t ")
    # §: if the first 4 bytes are all hex digits the encrypted portion is
    # ASCII-hex; decode up to the first non-hex/non-ws byte
    if len(enc) >= 4 and all(b in _HEX_CHARS for b in enc[:4]):
        hx = bytearray()
        for b in enc:
            if b in _HEX_CHARS:
                hx.append(b)
            elif b not in b" \t\r\n":
                break
        if len(hx) % 2:
            hx.append(ord("0"))
        enc = bytes.fromhex(hx.decode("ascii"))
    try:
        priv = eexec_decrypt(enc)
    except Exception:
        return {}
    m = re.search(rb"/lenIV\s+(\d+)", priv)
    len_iv = int(m.group(1)) if m else 4
    glyph_w: dict = {}
    cpos = priv.find(b"/CharStrings")
    pos = cpos if cpos >= 0 else 0
    head = re.compile(rb"/([^\s/{}()\[\]<>]+)\s+(\d+)\s+(?:RD|-\|)[ ]")
    while True:
        m = head.search(priv, pos)
        if m is None:
            break
        name = m.group(1).decode("latin-1")
        nbytes = int(m.group(2))
        start = m.end()
        pos = start + nbytes
        if pos > len(priv):
            break
        if name in ("lenIV", "Subrs", "password"):
            continue
        w = _cs_width(charstring_decrypt(priv[start:pos], len_iv))
        if w is not None:
            glyph_w[name] = w
    if not glyph_w:
        return {}
    encoding: dict = {}
    for m in re.finditer(rb"dup\s+(\d+)\s*/([^\s/{}()\[\]<>]+)\s+put", clear):
        encoding[int(m.group(1))] = m.group(2).decode("latin-1")
    out: dict = {}
    for code, name in encoding.items():
        if name in glyph_w:
            out[code] = glyph_w[name]
    if not out:
        # no dup entries (e.g. StandardEncoding): AGL-invert glyph names
        from .cmap import glyph_to_char

        for name, w in glyph_w.items():
            ch = glyph_to_char(name)
            if ch and len(ch) == 1 and 32 <= ord(ch) < 256:
                out[ord(ch)] = w
    return out


def build_type1_font(
    name: str, encoding: dict, widths: dict, hex_form: bool = False
) -> bytes:
    """A complete Type 1 program: clear-text header with the built-in
    /Encoding, eexec-encrypted /Private + /CharStrings (every glyph a
    real encrypted charstring: ``sb wx hsbw endchar``), and the
    customary 512-zeros + cleartomark trailer.  ``hex_form`` emits the
    encrypted portion ASCII-hex (the spec's alternate serialization —
    a parser must sniff it)."""
    dups = "\n".join(f"dup {c} /{g} put" for c, g in sorted(encoding.items()))
    clear = (
        f"%!PS-AdobeFont-1.0: {name}\n"
        f"/FontName /{name} def\n"
        "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        "/FontType 1 def\n"
        "/Encoding 256 array\n"
        "0 1 255 {1 index exch /.notdef put} for\n"
        f"{dups}\n"
        "readonly def\n"
        "currentdict end\n"
        "currentfile eexec\n"
    ).encode("latin-1")
    lines = [b"dup /Private 8 dict dup begin\n/lenIV 4 def\n"]
    lines.append(b"/CharStrings %d dict dup begin\n" % (len(widths) + 1))
    for g, w in sorted(widths.items()):
        cs = encode_cs_num(0) + encode_cs_num(int(w)) + bytes([13, 14])  # hsbw endchar
        ecs = charstring_encrypt(cs)
        lines.append(b"/%s %d RD " % (g.encode("latin-1"), len(ecs)) + ecs + b" ND\n")
    lines.append(b"end\nend\nmark currentfile closefile\n")
    enc = eexec_encrypt(b"".join(lines))
    if hex_form:
        h = enc.hex().encode("ascii")
        enc = b"\n".join(h[i : i + 64] for i in range(0, len(h), 64)) + b"\n"
    trailer = (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return clear + enc + b"\n" + trailer
