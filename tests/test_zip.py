"""ZIP archive source (sources/zipsrc.py).

Interop proven against stdlib :mod:`zipfile` — an independent
implementation of the same public APPNOTE layout — in BOTH directions.
"""

import io
import zipfile

import pytest

from pdfparser_spark.sources.zipsrc import build_zip, parse_zip


def test_writer_output_readable_by_stdlib_zipfile():
    blob = build_zip(
        [("a/x.pdf", b"%PDF deflated " * 20, 8), ("a/y.txt", b"stored", 0)]
    )
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.namelist() == ["a/x.pdf", "a/y.txt"]
        assert zf.read("a/x.pdf") == b"%PDF deflated " * 20
        assert zf.read("a/y.txt") == b"stored"
        assert zf.testzip() is None
        infos = zf.infolist()
        assert infos[0].compress_type == zipfile.ZIP_DEFLATED
        assert infos[1].compress_type == zipfile.ZIP_STORED


def test_stdlib_zipfile_output_readable_by_parser():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("p/q.pdf", b"qq" * 500, compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("p/r.txt", b"rr")
    rows = list(parse_zip(buf.getvalue()))
    assert [(r["name"], r["payload"]) for r in rows] == [
        ("p/q.pdf", b"qq" * 500),
        ("p/r.txt", b"rr"),
    ]
    assert all(r["error"] is None for r in rows)


def test_corrupt_member_is_contained_others_survive():
    blob = bytearray(
        build_zip([("a.pdf", b"payload one", 8), ("b.txt", b"payload two", 0)])
    )
    blob[35] ^= 0xFF  # flip a byte inside member 1's deflate stream
    rows = list(parse_zip(bytes(blob)))
    assert rows[0]["payload"] is None and rows[0]["error"] is not None
    assert rows[1]["payload"] == b"payload two" and rows[1]["error"] is None


def test_missing_eocd_rejected():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        list(parse_zip(b"PK not actually a zip archive"))
