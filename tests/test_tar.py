"""ustar archive source (sources/tar.py).

Interop is proven against stdlib :mod:`tarfile` — an independent
implementation of the same public spec — in BOTH directions: our
writer's shards must be readable by tarfile, and tarfile's archives
must be readable by our header walk.
"""

import io
import tarfile

from pdfparser_spark.sources.tar import BLOCK, build_tar_member, parse_tar


def _tario(blob: bytes) -> tarfile.TarFile:
    return tarfile.open(fileobj=io.BytesIO(blob), mode="r:")


def test_writer_output_readable_by_stdlib_tarfile():
    blob = (
        build_tar_member("corpus/doc1.pdf", b"%PDF-1.4 fake", mtime=1)
        + build_tar_member("corpus/notes/doc1.txt", b"note\n", mtime=1)
        + b"\0" * (2 * BLOCK)
    )
    with _tario(blob) as tf:
        members = tf.getmembers()
        assert [m.name for m in members] == ["corpus/doc1.pdf", "corpus/notes/doc1.txt"]
        assert tf.extractfile(members[0]).read() == b"%PDF-1.4 fake"
        assert members[0].mtime == 1 and members[0].mode == 0o644


def test_stdlib_tarfile_output_readable_by_parser():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in (("a/x.pdf", b"xx"), ("a/y.txt", b"y" * 700)):
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 7
            tf.addfile(ti, io.BytesIO(data))
    rows = list(parse_tar(buf.getvalue()))
    assert [(r["name"], r["size"], r["payload"]) for r in rows] == [
        ("a/x.pdf", 2, b"xx"),
        ("a/y.txt", 700, b"y" * 700),
    ]
    assert all(r["error"] is None for r in rows)


def test_long_names_split_into_ustar_prefix():
    name = "deep/" * 25 + "leaf.pdf"  # > 100 chars, needs the prefix field
    blob = build_tar_member(name, b"d", mtime=3) + b"\0" * (2 * BLOCK)
    with _tario(blob) as tf:
        assert tf.getnames() == [name]
    assert [r["name"] for r in parse_tar(blob)] == [name]


def test_checksum_mismatch_is_one_error_row_and_stops():
    good = build_tar_member("ok.pdf", b"fine")
    bad = bytearray(build_tar_member("bad.pdf", b"evil"))
    bad[0] ^= 0xFF  # corrupt the name; stored checksum no longer matches
    rows = list(parse_tar(good + bytes(bad) + b"\0" * (2 * BLOCK)))
    assert rows[0]["name"] == "ok.pdf" and rows[0]["error"] is None
    assert rows[1]["payload"] is None and "checksum" in rows[1]["error"]
    assert len(rows) == 2  # nothing after an untrustworthy header


def test_truncated_member_is_contained():
    blob = build_tar_member("t.pdf", b"0123456789")
    rows = list(parse_tar(blob[: BLOCK + 4]))  # data cut mid-member
    assert rows[-1]["error"] == "truncated member"
