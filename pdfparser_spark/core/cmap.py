"""Font CMap / ToUnicode glyph-to-text mapping (ISO 32000 §9.10.3).

Absent from the reference entirely (SURVEY.md §2.7: "no font code at all");
required by BASELINE.json:6.  Supports:

  - ``begincodespacerange`` (code byte-width detection, 1- or 2-byte),
  - ``beginbfchar`` pairs ``<src> <dst>``,
  - ``beginbfrange`` runs ``<lo> <hi> <dst>`` and ``<lo> <hi> [<d0> ...]``,
  - UTF-16BE destination strings (surrogate-safe),
  - fallback simple encodings: WinAnsiEncoding ~ cp1252, Standard/MacRoman
    approximated by latin-1 (sufficient for the printable-ASCII corpus;
    full difference tables are a straightforward extension).

The classify stage builds one decoder per (doc, font) and applies it to the
raw Tj/TJ operand bytes.
"""

from __future__ import annotations

import re

_HEX = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_TOKEN = re.compile(
    rb"beginbfchar(.*?)endbfchar|beginbfrange(.*?)endbfrange|begincodespacerange(.*?)endcodespacerange",
    re.S,
)


def _hexbytes(s: bytes) -> bytes:
    s = re.sub(rb"\s+", b"", s)
    if len(s) % 2:
        s += b"0"
    return bytes.fromhex(s.decode("ascii"))


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("utf-16-be", errors="replace")


class CMap:
    """byte-code -> unicode mapping with explicit code width."""

    def __init__(self) -> None:
        self.width = 1
        self.map: dict[int, str] = {}

    @classmethod
    def parse(cls, cmap_bytes: bytes) -> "CMap":
        cm = cls()
        for m in _TOKEN.finditer(cmap_bytes):
            bfchar, bfrange, codespace = m.group(1), m.group(2), m.group(3)
            if codespace:
                hexes = _HEX.findall(codespace)
                if hexes:
                    cm.width = max(1, len(_hexbytes(hexes[0])))
            elif bfchar:
                hexes = _HEX.findall(bfchar)
                for i in range(0, len(hexes) - 1, 2):
                    src = _hexbytes(hexes[i])
                    dst = _hexbytes(hexes[i + 1])
                    cm.width = max(cm.width, len(src))
                    cm.map[int.from_bytes(src, "big")] = _utf16be(dst)
            elif bfrange:
                cm._parse_bfrange(bfrange)
        return cm

    def _parse_bfrange(self, body: bytes) -> None:
        # entries: <lo> <hi> <dst>   |   <lo> <hi> [<d0> <d1> ...]
        pos = 0
        pat_hex = re.compile(rb"\s*<([0-9A-Fa-f\s]*)>")
        pat_arr = re.compile(rb"\s*\[((?:\s*<[0-9A-Fa-f\s]*>)*)\s*\]")
        while True:
            m1 = pat_hex.match(body, pos)
            if not m1:
                break
            m2 = pat_hex.match(body, m1.end())
            if not m2:
                break
            lo = _hexbytes(m1.group(1))
            hi = _hexbytes(m2.group(1))
            self.width = max(self.width, len(lo))
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            marr = pat_arr.match(body, m2.end())
            if marr:
                dsts = _HEX.findall(marr.group(1))
                for k, d in enumerate(dsts):
                    if lo_i + k <= hi_i:
                        self.map[lo_i + k] = _utf16be(_hexbytes(d))
                pos = marr.end()
            else:
                m3 = pat_hex.match(body, m2.end())
                if not m3:
                    break
                base = _hexbytes(m3.group(1))
                base_i = int.from_bytes(base, "big")
                blen = len(base)
                for k in range(hi_i - lo_i + 1):
                    self.map[lo_i + k] = _utf16be((base_i + k).to_bytes(blen, "big"))
                pos = m3.end()

    def decode(self, raw: bytes) -> str:
        w = self.width
        out = []
        for i in range(0, len(raw) - w + 1, w):
            code = int.from_bytes(raw[i : i + w], "big")
            out.append(self.map.get(code, "�"))
        return "".join(out)


def simple_decode(raw: bytes, encoding_name: str | None) -> str:
    """Fallback single-byte decode when the font has no /ToUnicode
    (reference has no equivalent; WinAnsi == cp1252 per ISO 32000 D.2)."""
    if encoding_name == "WinAnsiEncoding":
        enc = "cp1252"
    elif encoding_name == "MacRomanEncoding":
        enc = "mac_roman"
    else:
        enc = "latin-1"
    return raw.decode(enc, errors="replace")
