"""Filter decoding units — spec-correct behaviors the reference's own test
suite never asserts (SURVEY.md §5; FIXTURES.md §4)."""

from __future__ import annotations

import zlib

import pytest

from pdfparser_spark.core import filters
from pdfparser_spark.core.errors import FilterError


def test_ascii_hex_basic():
    assert filters.ascii_hex_decode(b"48656C6C6F>") == b"Hello"


def test_ascii_hex_lowercase_and_whitespace():
    # spec-correct: lowercase accepted (reference util.rs:23-25 is uppercase-only)
    assert filters.ascii_hex_decode(b"48 65 6c 6c 6f >") == b"Hello"


def test_ascii_hex_odd_digit_implicit_zero():
    assert filters.ascii_hex_decode(b"7>") == b"\x70"


def test_ascii_hex_eod_is_gt():
    # spec-correct: EOD is '>' (reference decode.rs:93 uses '<')
    assert filters.ascii_hex_decode(b"41>42") == b"A"


def test_ascii85_roundtrip():
    from base64 import a85encode

    payload = b"Hello, PDF world! \x00\x01\x02"
    enc = a85encode(payload, adobe=False) + b"~>"
    assert filters.ascii85_decode(enc) == payload


def test_ascii85_z_group():
    assert filters.ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"


def test_flate_returns_inflated():
    # spec-correct: reference returns the *compressed* input (decode.rs:175)
    payload = b"stream payload " * 10
    assert filters.flate_decode(zlib.compress(payload)) == payload


def test_flate_png_up_predictor():
    import numpy as np

    rows, cols = 4, 6
    raw = np.arange(rows * cols, dtype=np.uint8).reshape(rows, cols)
    # encode with Up filter: first row ft=0? use Up for all rows (prev starts 0)
    enc = bytearray()
    prev = np.zeros(cols, dtype=np.uint8)
    for r in range(rows):
        enc.append(2)
        enc += ((raw[r].astype(np.int32) - prev) & 0xFF).astype(np.uint8).tobytes()
        prev = raw[r]
    out = filters.flate_decode(
        zlib.compress(bytes(enc)), {"Predictor": 12, "Columns": cols, "Colors": 1, "BitsPerComponent": 8}
    )
    assert out == raw.tobytes()


def test_lzw_roundtrip():
    payload = b"TOBEORNOTTOBEORTOBEORNOT" * 20
    assert filters.lzw_decode(filters.lzw_encode(payload)) == payload


def test_lzw_roundtrip_long_resets_table():
    payload = bytes(range(256)) * 40  # forces code widths up and table churn
    assert filters.lzw_decode(filters.lzw_encode(payload)) == payload


def test_run_length():
    # literal run: length 2 -> 3 bytes; repeat run: 257-254=3 copies
    assert filters.run_length_decode(b"\x02abc\xfeX\x80") == b"abcXXX"


def test_filter_chain_fold():
    import binascii

    payload = b"folded"
    enc = binascii.hexlify(zlib.compress(payload)) + b">"
    chain = [("ASCIIHexDecode", None), ("FlateDecode", None)]
    assert filters.decode_chain(enc, chain) == payload


def test_unsupported_filter_raises():
    with pytest.raises(FilterError):
        filters.decode_chain(b"x", [("CCITTFaxDecode", None)])


def test_build_filter_chain_array_with_parms():
    attrs = {"Filter": ["ASCIIHexDecode", "FlateDecode"], "DecodeParms": [None, {"Predictor": 12}]}
    chain = filters.build_filter_chain(attrs)
    assert chain == [("ASCIIHexDecode", None), ("FlateDecode", {"Predictor": 12})]
