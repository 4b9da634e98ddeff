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


def test_compressed_containers_roundtrip_and_interop():
    """.tar.gz/.tar.xz containers: our gzip/xz shards open in stdlib
    tarfile ("r:gz"/"r:xz"), and tarfile-written compressed archives
    parse through our container sniff + header walk."""
    import gzip
    import lzma

    from pdfparser_spark.sources.tar import build_tar_member, decompress_container, parse_tar

    blob = build_tar_member("a/doc1.pdf", b"payload-1") + build_tar_member(
        "a/doc2.pdf", b"payload-22"
    ) + b"\0" * 1024
    for compress, mode in ((lambda b: gzip.compress(b, mtime=0), "r:gz"),
                           (lambda b: lzma.compress(b, format=lzma.FORMAT_XZ), "r:xz")):
        packed = compress(blob)
        # ours -> stdlib
        tf = tarfile.open(fileobj=io.BytesIO(packed), mode=mode)
        assert [m.name for m in tf.getmembers()] == ["a/doc1.pdf", "a/doc2.pdf"]
        assert tf.extractfile("a/doc2.pdf").read() == b"payload-22"
        # stdlib -> ours (independent writer through the same sniff)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:" + mode.split(":")[1]) as w:
            info = tarfile.TarInfo("x/doc9.pdf")
            data = b"stdlib-member"
            info.size = len(data)
            w.addfile(info, io.BytesIO(data))
        rows = list(parse_tar(buf.getvalue()))
        good = [r for r in rows if r["error"] is None]
        assert [r["name"] for r in good] == ["x/doc9.pdf"]
        assert good[0]["payload"] == b"stdlib-member"
    # corrupt container: one ValueError, contained
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decompress_container(b"\x1f\x8b" + b"garbage")
