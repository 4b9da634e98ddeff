"""Round-5 ADVICE/VERDICT fixes: inline-image /IM keyword truthiness,
EI without preceding whitespace (§8.9.7), Type-2 function negative-base
guard, and the TIFF predictor-2 16-bit lift."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pdfparser_spark.core import extract as ex
from pdfparser_spark.core import filters
from pdfparser_spark.core.content import parse_inline_images
from pdfparser_spark.core.functions import build_function


def _classic_pdf(content: bytes) -> bytes:
    """Minimal one-page classic-xref PDF around ``content``."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def test_inline_imagemask_keyword_true_decodes_inverted():
    # /IM arrives from the content tokenizer as the KEYWORD b"true";
    # with /D [1 0] the all-zero payload decodes to full-white (ADVICE r04)
    content = b"BI /IM true /W 8 /H 2 /D [1 0] ID \x00\x00 EI"
    doc = _classic_pdf(content)
    res = ex.extract_inline_pixels(doc)
    assert res["errors"] == []
    assert res["images"] == [(0, 0, 8, 2, 8 * 2 * 255)]


def test_inline_ei_without_whitespace_geometry_bounded():
    # 2-byte gray payload ends in a non-whitespace byte directly followed
    # by EI; the declared geometry bounds the payload (ADVICE r04)
    content = b"BI /CS /G /W 2 /H 1 /BPC 8 ID \x10\x41EI Q"
    imgs = parse_inline_images(content)
    assert len(imgs) == 1
    params, payload = imgs[0]
    assert payload == b"\x10\x41"
    # and the whitespace-delimited form still drops exactly the delimiter
    content2 = b"BI /CS /G /W 2 /H 1 /BPC 8 ID \x10\x41 EI Q"
    assert parse_inline_images(content2)[0][1] == b"\x10\x41"


def test_inline_ei_embedded_in_payload_not_split_early():
    # payload bytes spell "EI" mid-stream; geometry says 4 bytes, so the
    # embedded candidate (wrong length, no preceding ws needed) is skipped
    content = b"BI /CS /G /W 4 /H 1 /BPC 8 ID EIXYEI Q"
    imgs = parse_inline_images(content)
    assert len(imgs) == 1
    assert imgs[0][1] == b"EIXY"


def test_type2_negative_base_fractional_exponent_raises_valueerror():
    f, _n = build_function(
        {"FunctionType": 2, "Domain": [-1, 1], "C0": [0.0], "C1": [1.0], "N": 0.5}
    )
    with pytest.raises(ValueError):
        f([-0.5])
    # integer exponent on a negative base stays fine
    g, _ = build_function(
        {"FunctionType": 2, "Domain": [-1, 1], "C0": [0.0], "C1": [1.0], "N": 2}
    )
    assert g([-0.5]) == [0.25]


def test_tiff_predictor2_16bit_roundtrip():
    rng = np.random.default_rng(7)
    rows, cols, colors = 5, 9, 3
    raw = rng.integers(0, 1 << 16, size=(rows, cols * colors), dtype=np.uint16)
    # horizontal differencing over component VALUES (TIFF6), big-endian
    diff = raw.copy()
    diff[:, colors:] = raw[:, colors:] - raw[:, :-colors]
    data = diff.astype(">u2").tobytes()
    parms = {
        "Predictor": 2,
        "Columns": cols,
        "Colors": colors,
        "BitsPerComponent": 16,
    }
    out = filters.flate_decode(zlib.compress(data), parms)
    assert out == raw.astype(">u2").tobytes()


def test_tiff_predictor2_16bit_known_vector():
    # one row, one channel: values 1000, +1, +70000(mod) -> wraps
    vals = np.array([[1000, 1, 64536]], dtype=np.uint16)  # deltas
    data = vals.astype(">u2").tobytes()
    out = filters._apply_predictor(
        data, {"Predictor": 2, "Columns": 3, "Colors": 1, "BitsPerComponent": 16}
    )
    got = np.frombuffer(out, dtype=">u2")
    assert list(got) == [1000, 1001, (1001 + 64536) % 65536]
