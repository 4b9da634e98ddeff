"""Type 1 font program unit tests (core/type1.py): the eexec and
charstring ciphers, charstring number encoding, the builder->parser
fixpoint in both serializations, and the AGL-name fallback."""

from __future__ import annotations

from pdfparser_spark.core.type1 import (
    _cs_width,
    build_type1_font,
    charstring_decrypt,
    charstring_encrypt,
    eexec_decrypt,
    eexec_encrypt,
    encode_cs_num,
    parse_type1_widths,
)


def test_ciphers_roundtrip():
    for payload in (b"", b"x", b"hello private dict", bytes(range(256))):
        assert eexec_decrypt(eexec_encrypt(payload)) == payload
        assert charstring_decrypt(charstring_encrypt(payload)) == payload
        assert charstring_decrypt(charstring_encrypt(payload, 0), 0) == payload


def test_charstring_numbers_and_width_ops():
    # every encoding range, via a real hsbw prefix
    for v in (0, 1, -1, 107, -107, 108, 1131, -108, -1131, 5000, -5000, 40000):
        assert _cs_width(encode_cs_num(0) + encode_cs_num(v) + bytes([13])) == v
    # sbw (12 7): wx is the THIRD operand
    cs = b"".join(encode_cs_num(v) for v in (1, 2, 777, 0)) + bytes([12, 7])
    assert _cs_width(cs) == 777
    # any other leading operator -> no width
    assert _cs_width(bytes([139, 139, 1])) is None  # hstem first
    assert _cs_width(b"") is None


def test_build_parse_fixpoint_binary_and_hex():
    enc = {c: f"g{c}" for c in range(32, 127)}
    w = {f"g{c}": 350 + (c % 6) * 25 for c in range(32, 127)}
    for hx in (False, True):
        prog = build_type1_font("SYNF+EmbOne", enc, w, hex_form=hx)
        assert prog.startswith(b"%!PS-AdobeFont-1.0")
        assert b"cleartomark" in prog
        # the widths are NOT visible in the clear bytes (really encrypted)
        assert b"hsbw" not in prog
        got = parse_type1_widths(prog)
        assert got == {c: 350 + (c % 6) * 25 for c in range(32, 127)}, hx


def test_agl_fallback_without_dup_encoding():
    """A program whose header declares no dup entries (StandardEncoding
    style) still resolves codes via AGL glyph-name inversion."""
    prog = build_type1_font("S", {}, {"a": 500, "uni0042": 611, "space": 250})
    got = parse_type1_widths(prog)
    assert got[ord("a")] == 500 and got[0x42] == 611 and got[32] == 250


def test_corrupt_programs_are_contained():
    assert parse_type1_widths(b"") == {}
    assert parse_type1_widths(b"no eexec marker here") == {}
    prog = build_type1_font("S", {65: "A"}, {"A": 700})
    # truncating mid-encrypted-region must not raise
    assert isinstance(parse_type1_widths(prog[: len(prog) // 2]), dict)
    # flipping bytes in the encrypted region must not raise
    mut = bytearray(prog)
    mid = prog.find(b"eexec") + 40
    mut[mid : mid + 8] = b"\x00" * 8
    assert isinstance(parse_type1_widths(bytes(mut)), dict)


def test_truetype_build_parse_fixpoint():
    """core/truetype.py: hmtx widths through cmap format 4, scaled by
    head.unitsPerEm; corrupt input contained."""
    from pdfparser_spark.core.truetype import build_truetype_font, parse_truetype_widths

    w = {c: 400 + ((2 * c + 7) % 5) * 30 for c in range(32, 127)}
    assert parse_truetype_widths(build_truetype_font(w)) == w
    # unitsPerEm scaling is real: 1024 font units at upem 2048 = 500/1000
    got = parse_truetype_widths(build_truetype_font({c: 1024 for c in range(65, 70)}, upem=2048))
    assert got == {c: 500 for c in range(65, 70)}
    assert parse_truetype_widths(b"") == {}
    assert parse_truetype_widths(b"\x00\x01\x00\x00\x00\x07") == {}
    assert isinstance(parse_truetype_widths(build_truetype_font(w)[:100]), dict)


def test_cff_build_parse_fixpoint():
    """core/cff.py: Type 2 leading-width operands (nominalWidthX-
    relative) and the defaultWidthX no-operand path, through the
    format-0 Encoding; corrupt input contained."""
    from pdfparser_spark.core.cff import build_cff_font, parse_cff_widths

    def w(doc, c):
        return 480 if c % 16 == 0 else 380 + ((3 * c + doc) % 7) * 20

    for doc in (3, 16, 29):
        widths = {c: w(doc, c) for c in range(32, 127)}
        prog = build_cff_font(widths, default_w=480, nominal_w=107)
        assert parse_cff_widths(prog) == widths, doc
    # negative-relative operands (w < nominalWidthX) round-trip too
    assert parse_cff_widths(build_cff_font({65: 50}, 999, 500)) == {65: 50}
    assert parse_cff_widths(b"") == {}
    assert parse_cff_widths(b"\x01\x00\x04\x01") == {}
    assert isinstance(parse_cff_widths(build_cff_font({65: 500}, 0, 0)[:20]), dict)
