"""PDF object tokenizer / recursive-descent parser — spec-correct.

Reference: the ~325-line byte state machine ``parse_object_at``
(/root/reference/src/pdf_doc/pdf_file/pdf_file.rs:274-599) with states
Neutral/HexString/CharString/Name/Number/Comment/Keyword
(pdf_file.rs:727-736), and the byte classifiers
(/root/reference/src/pdf_doc/pdf_file/util.rs:8-29).

Covered sub-operators (SURVEY.md §2.3): T1 arrays, T2 dicts, T3 literal
strings (escapes, octal, line continuation, nested parens — spec-correct
CR/LF, unlike pdf_file.rs:428,435), T4 hex strings (both cases, unlike
util.rs:23-25), T5 names (with #xx escapes), T6 numbers, T7 comments,
T8 keywords, T9 indirect references via 3-token lookahead (pdf_file.rs:
347-384 pops the object buffer), T10 ``N G obj``, T11 stream extraction
with indirect-/Length two-pass fallback (pdf_file.rs:601-671), T12 byte
classifiers.

This module is pure Python over ``bytes`` and executes inside Arrow-batch
UDFs; it is sequential per document by nature (single-pass, one char of
backtracking like the reference) but the pipeline vectorizes across
documents.
"""

from __future__ import annotations

import re

from .errors import ParsingError
from .objects import IndirectObject, Name, Ref, Stream

# T12 byte classifiers (reference util.rs:8-29; whitespace set
# {0,9,12,32,10,13}, delimiters ()<>[]{}/%).
WHITESPACE = frozenset(b"\x00\t\n\x0c\r ")
DELIMITERS = frozenset(b"()<>[]{}/%")
_DIGITS = frozenset(b"0123456789")
_NUMBER_START = frozenset(b"0123456789+-.")
_REGULAR_END = WHITESPACE | DELIMITERS
_WS_BYTES = bytes(WHITESPACE)

# C-side scanners for the hot paths (name / number / keyword runs): one
# regex match replaces a per-character Python loop
_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")
_NUM_RE = re.compile(rb"[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]*)")
_KW_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
# `G R` continuation of an `N G R` indirect reference: one C-level match
# replaces two _next_token calls on the 3-token-lookahead hot path (T9)
_REF_TAIL_RE = re.compile(rb"[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R(?=[\x00\t\n\x0c\r ()<>\[\]{}/%]|\Z)")


def skip_ws(data: bytes, pos: int) -> int:
    """Skip whitespace and comments (T7: ``%...`` to EOL, reference
    pdf_file.rs:516-524; comments act as whitespace per spec)."""
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in WHITESPACE:
            pos += 1
        elif c == 0x25:  # '%'
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
        else:
            break
    return pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """T3 (reference pdf_file.rs:418-475): balanced parens, backslash
    escapes, octal ``\\ddd``, line continuation; in-string EOLs normalize
    to \\n (ISO 32000 §7.3.4.2)."""
    assert data[pos] == 0x28  # '('
    pos += 1
    depth = 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in _DIGITS and e < 0x38:  # octal digit 0-7
                val = 0
                k = 0
                while pos < n and k < 3 and 0x30 <= data[pos] <= 0x37:
                    val = val * 8 + (data[pos] - 0x30)
                    pos += 1
                    k += 1
                out.append(val & 0xFF)
                continue
            if e == 0x6E:
                out.append(0x0A)
            elif e == 0x72:
                out.append(0x0D)
            elif e == 0x74:
                out.append(0x09)
            elif e == 0x62:
                out.append(0x08)
            elif e == 0x66:
                out.append(0x0C)
            elif e in (0x28, 0x29, 0x5C):
                out.append(e)
            elif e == 0x0D:  # line continuation \<CR>[<LF>]
                if pos + 1 < n and data[pos + 1] == 0x0A:
                    pos += 1
            elif e == 0x0A:
                pass
            else:  # unknown escape: drop backslash (spec)
                out.append(e)
            pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        elif c == 0x0D:  # raw EOL -> \n
            out.append(0x0A)
            pos += 1
            if pos < n and data[pos] == 0x0A:
                pos += 1
        else:
            out.append(c)
            pos += 1
    raise ParsingError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """T4 (reference pdf_file.rs:401-417): ``<...>``; both hex cases
    accepted (spec-correct vs util.rs:23-25); odd digit => trailing 0."""
    assert data[pos] == 0x3C
    end = data.find(b">", pos + 1)
    if end == -1:
        raise ParsingError("unterminated hex string")
    body = data[pos + 1 : end].translate(None, delete=_WS_BYTES)
    if len(body) % 2:
        body += b"0"
    try:
        return bytes.fromhex(body.decode("ascii")), end + 1
    except (ValueError, UnicodeDecodeError) as e:
        raise ParsingError(f"bad hex string: {e}") from e


_NAME_CACHE: dict = {}


def _parse_name(data: bytes, pos: int) -> tuple[Name, int]:
    """T5 (reference pdf_file.rs:476-485) + spec ``#xx`` escapes.  Names
    repeat heavily (/Type /Page /Length ...) — an interning cache skips the
    decode+construct on every hit; bounded so adversarial docs can't grow
    it without limit."""
    m = _NAME_RE.match(data, pos)
    body = m.group(1)
    cached = _NAME_CACHE.get(body)
    if cached is not None:
        return cached, m.end()
    if b"#" not in body:
        name = Name(body.decode("latin-1"))
        if len(_NAME_CACHE) < 4096:
            _NAME_CACHE[body] = name
        return name, m.end()
    # slow path: resolve #xx hex escapes
    out = bytearray()
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c == 0x23 and i + 2 < n:
            try:
                out.append(int(body[i + 1 : i + 3].decode("ascii"), 16))
                i += 3
                continue
            except (ValueError, UnicodeDecodeError):
                pass
        out.append(c)
        i += 1
    return Name(out.decode("latin-1")), m.end()


def _parse_number(data: bytes, pos: int):
    """T6 (reference pdf_file.rs:486-515): int vs real by '.'; leading
    sign; reals like ``.5`` / ``4.`` allowed by spec."""
    m = _NUM_RE.match(data, pos)
    if not m:
        raise ParsingError(f"malformed number at {pos}")
    text = m.group()
    if text in (b".", b"+.", b"-."):
        # digit-less form — report as a parse error (resync-able)
        raise ParsingError(f"malformed number at {pos}")
    if b"." in text:
        return float(text), m.end()
    return int(text), m.end()


def _read_keyword(data: bytes, pos: int) -> tuple[bytes, int]:
    """T8 (reference pdf_file.rs:525-595, util.rs:35-41)."""
    m = _KW_RE.match(data, pos)
    if not m:
        return b"", pos
    return m.group(), m.end()


_KEYWORD_VALUES = {b"true": True, b"false": False, b"null": None}


def _next_token(data: bytes, pos: int):
    """One token: returns (kind, value, newpos) with kind in
    {'value','name','dict_open','dict_close','array_open','array_close',
    'keyword','number','eof'}."""
    n = len(data)
    # inlined whitespace fast path (skip_ws call overhead dominates when
    # tokens are separated by a single space, the common case)
    while pos < n and data[pos] in WHITESPACE:
        pos += 1
    if pos < n and data[pos] == 0x25:  # '%' comment -> full skipper
        pos = skip_ws(data, pos)
    if pos >= n:
        return "eof", None, pos
    c = data[pos]
    # branch order = measured token frequency: numbers > names > keywords
    # > dict delimiters > strings/arrays (profiled on the synth corpus)
    if c in _NUMBER_START:
        v, p = _parse_number(data, pos)
        return "number", v, p
    if c == 0x2F:
        v, p = _parse_name(data, pos)
        return "name", v, p
    if c == 0x3C:  # '<'
        if pos + 1 < n and data[pos + 1] == 0x3C:
            return "dict_open", None, pos + 2
        v, p = _parse_hex_string(data, pos)
        return "value", v, p
    if c == 0x3E:  # '>'
        if pos + 1 < n and data[pos + 1] == 0x3E:
            return "dict_close", None, pos + 2
        raise ParsingError("stray '>'")
    if c == 0x5B:
        return "array_open", None, pos + 1
    if c == 0x5D:
        return "array_close", None, pos + 1
    if c == 0x28:
        v, p = _parse_literal_string(data, pos)
        return "value", v, p
    kw, p = _read_keyword(data, pos)
    if not kw:
        raise ParsingError(f"unexpected byte {c:#x} at {pos}")
    return "keyword", kw, p


class Tokenizer:
    """Value-level parser with 3-token lookahead for ``N G R`` (T9) and
    stream extraction (T11).  ``length_resolver(Ref) -> int | None`` handles
    indirect ``/Length`` (reference pdf_file.rs:647-656); when it cannot,
    we fall back to scanning for ``endstream`` (SURVEY.md §7.5)."""

    def __init__(self, data: bytes, length_resolver=None):
        self.data = data
        self.length_resolver = length_resolver

    # -- value parsing -----------------------------------------------------
    def parse_value(self, pos: int):
        kind, val, p = _next_token(self.data, pos)
        if kind == "value" or kind == "name":
            return val, p
        if kind == "number":
            return self._maybe_ref(val, p)
        if kind == "array_open":
            return self._parse_array(p)
        if kind == "dict_open":
            return self._parse_dict_or_stream(p)
        if kind == "keyword":
            if val in _KEYWORD_VALUES:
                return _KEYWORD_VALUES[val], p
            raise ParsingError(f"unexpected keyword {val!r} at {pos}")
        raise ParsingError(f"unexpected token {kind} at {pos}")

    def _maybe_ref(self, first, pos: int):
        """3-token lookahead: ``int int R`` -> Ref (T9).  The ``G R`` tail
        is matched with one regex instead of two token reads (hot path:
        every integer in every dict/array pays this probe)."""
        if not isinstance(first, int) or first < 0:
            return first, pos
        m = _REF_TAIL_RE.match(self.data, pos)
        if m:
            return Ref(first, int(m.group(1))), m.end()
        # comments may legally separate the three tokens (they count as
        # whitespace, §7.2.4) but the fast regex has no comment support —
        # if a '%' appears nearby (either between N and G or between G and
        # R), retry with the comment-aware token reader
        data = self.data
        if data.find(b"%", pos, pos + 64) != -1:
            k2, v2, p2 = _next_token(data, pos)
            if k2 == "number" and isinstance(v2, int) and v2 >= 0:
                k3, v3, p3 = _next_token(data, p2)
                if k3 == "keyword" and v3 == b"R":
                    return Ref(first, v2), p3
        return first, pos

    def _parse_array(self, pos: int):
        out = []
        while True:
            kind, val, p = _next_token(self.data, pos)
            if kind == "array_close":
                return out, p
            if kind == "eof":
                raise ParsingError("unterminated array")
            if kind == "number":
                v, pos = self._maybe_ref(val, p)
                out.append(v)
                continue
            if kind in ("value", "name"):
                out.append(val)
                pos = p
                continue
            if kind == "array_open":
                v, pos = self._parse_array(p)
                out.append(v)
                continue
            if kind == "dict_open":
                v, pos = self._parse_dict_or_stream(p)
                out.append(v)
                continue
            if kind == "keyword" and val in _KEYWORD_VALUES:
                out.append(_KEYWORD_VALUES[val])
                pos = p
                continue
            raise ParsingError(f"unexpected {kind} in array")

    def _parse_dict_or_stream(self, pos: int):
        """T2 + T11.  Keys must be names (reference pdf_file.rs:808-829
        errors on odd/non-name keys)."""
        d: dict = {}
        while True:
            kind, key, p = _next_token(self.data, pos)
            if kind == "dict_close":
                pos = p
                break
            if kind != "name":
                raise ParsingError(f"dict key must be a name, got {kind}")
            val, pos = self.parse_value(p)
            d[key] = val  # Name is a str subclass: hashes/compares as str
        # stream?
        save = pos
        kind, kw, p = _next_token(self.data, pos)
        if kind == "keyword" and kw == b"stream":
            return self._extract_stream(d, p)
        return d, save

    def _extract_stream(self, attrs: dict, pos: int):
        """T11 (reference make_stream_object pdf_file.rs:601-671): payload
        begins after CRLF or LF following ``stream``; extent = /Length
        (direct, or indirect via resolver, else endstream scan)."""
        data = self.data
        if pos < len(data) and data[pos] == 0x0D:
            pos += 1
        if pos < len(data) and data[pos] == 0x0A:
            pos += 1
        length = attrs.get("Length")
        if isinstance(length, Ref):
            length = self.length_resolver(length) if self.length_resolver else None
        end = None
        if isinstance(length, int) and length >= 0 and pos + length <= len(data):
            end = pos + length
            # validate: 'endstream' should follow (possibly after EOL)
            probe = skip_ws(data, end)
            if data[probe : probe + 9] != b"endstream":
                end = None  # /Length lied; fall back to scan
        if end is None:
            scan = data.find(b"endstream", pos)
            if scan == -1:
                raise ParsingError("unterminated stream")
            end = scan
            # trim at most one EOL that belongs to the delimiter
            if end > pos and data[end - 1] == 0x0A:
                end -= 1
            if end > pos and data[end - 1] == 0x0D:
                end -= 1
        raw = bytes(data[pos:end])
        after = skip_ws(data, end)
        if data[after : after + 9] == b"endstream":
            after += 9
        return Stream(attrs=attrs, raw=raw, file_len=len(raw)), after

    # -- indirect objects ----------------------------------------------------
    def parse_indirect_at(self, pos: int) -> tuple[IndirectObject, int]:
        """T10: ``N G obj <value> endobj`` (reference pdf_file.rs:548-572,
        831-843)."""
        k1, v1, p1 = _next_token(self.data, pos)
        k2, v2, p2 = _next_token(self.data, p1)
        k3, v3, p3 = _next_token(self.data, p2)
        if k1 != "number" or k2 != "number" or k3 != "keyword" or v3 != b"obj":
            raise ParsingError(f"expected 'N G obj' at {pos}")
        value, p = self.parse_value(p3)
        k, kw, p4 = _next_token(self.data, p)
        if k == "keyword" and kw == b"endobj":
            p = p4
        return IndirectObject(int(v1), int(v2), value), p
