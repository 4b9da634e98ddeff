"""MP4 / ISO-BMFF (ISO/IEC 14496-12) box parser — video METADATA without
ffmpeg.

Real container parse: the size/type box walk (including 64-bit largesize
boxes), `ftyp` brand, and the `moov` hierarchy — `mvhd` (version 0/1
timescale + duration) and per-`trak` `tkhd` (track id, 16.16 fixed-point
width/height) + `mdia/hdlr` (handler type: vide/soun).  This upgrades the
video tier from an md5 stub to genuine structure: duration, dimensions
and track layout come from the actual bytes.

FRAME decode is real for the MJPEG tier: ``encode_mp4_mjpeg`` writes a
conforming unfragmented file whose video track carries a full sample
table (stsd 'jpeg' visual sample entry, stts, stsc, stsz, stco) over
baseline-JPEG samples in ``mdat``; ``mjpeg_samples`` walks the sample
table back to per-frame byte ranges, and ``textops.media.decode_video_real``
decodes each frame with the pure-numpy ``textops.jpeg`` codec.  H.264 and
other inter-coded codecs still need external libraries and raise
ValueError — the honest boundary of the no-codec-libs container.

The metadata-only writer emits a minimal-but-conforming unfragmented file
(ftyp + moov with one video and optionally one audio track + an empty
mdat) so the parser round-trips real box structure.
"""

from __future__ import annotations

import struct
from functools import lru_cache as _lru_cache


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def encode_mp4_meta(
    duration_ms: int,
    width: int,
    height: int,
    timescale: int = 1000,
    with_audio: bool = False,
) -> bytes:
    """Minimal conforming ISO-BMFF: ftyp + moov(mvhd + trak(s)) + mdat."""
    dur = duration_ms * timescale // 1000
    mvhd = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3)  # next track id
    )

    def trak(track_id: int, handler: bytes, w: int, h: int) -> bytes:
        tkhd = (
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", track_id)
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 16
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16)  # 16.16 fixed point
        )
        hdlr = b"\x00\x00\x00\x00" + b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00"
        mdia = _box(b"hdlr", hdlr)
        return _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))

    traks = trak(1, b"vide", width, height)
    if with_audio:
        traks += trak(2, b"soun", 0, 0)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + _box(b"mdat", b"")


def _walk(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {btype!r} overruns its container")
        yield btype, body, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(payload, start, end):
        if t == btype:
            return b, e
    return None


def decode_mp4_meta(payload: bytes) -> dict:
    """-> {brand, timescale, duration_ms, n_tracks, video: (w, h) | None,
    handlers: [str]}.  Raises ValueError on malformed/non-ISO-BMFF."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")
    brand = payload[8:12].decode("latin-1")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    ms, me = moov
    mvhd = _find(payload, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("missing mvhd box")
    vs, _ve = mvhd
    if vs >= len(payload):
        raise ValueError("empty mvhd box")
    version = payload[vs]
    try:
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", payload, vs + 20)
        else:
            timescale, duration = struct.unpack_from(">II", payload, vs + 12)
    except struct.error as e:
        raise ValueError("truncated mvhd") from e
    if timescale == 0:
        raise ValueError("mvhd timescale is zero")

    video = None
    handlers = []
    n_tracks = 0
    for t, b, e in _walk(payload, ms, me):
        if t != b"trak":
            continue
        n_tracks += 1
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        handler = None
        if mdia is not None:
            hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                handler = payload[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
                handlers.append(handler)
        if tkhd is not None and handler == "vide" and video is None:
            ts, te = tkhd
            if ts >= te or ts >= len(payload):
                raise ValueError("empty tkhd box")
            tver = payload[ts]
            # width offset inside tkhd: ver+flags(4) + times(8|16) + id(4)
            # + rsvd(4) + duration(4|8) + rsvd/layer/group/volume(16)
            # + matrix(36)
            off = ts + (88 if tver == 1 else 76)
            if off + 8 > te:
                raise ValueError("truncated tkhd")
            w16, h16 = struct.unpack_from(">II", payload, off)
            video = (w16 >> 16, h16 >> 16)
    return {
        "brand": brand,
        "timescale": int(timescale),
        "duration_ms": int(duration) * 1000 // int(timescale),
        "n_tracks": n_tracks,
        "video": video,
        "handlers": handlers,
    }


# --- MJPEG: real frames via the sample table -------------------------------

def _full_box(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    timescale: int = 1000,
    frame_dur: int = 40,
) -> bytes:
    """Unfragmented ISO-BMFF with ONE video track of Motion-JPEG samples:
    a real stbl (stsd 'jpeg' visual sample entry, stts, stsc, stsz, stco)
    over the concatenated frame bytes in ``mdat``.  Every offset in stco
    is an absolute file offset, as the spec requires."""
    n = len(frames)
    dur = n * frame_dur

    # stsd: one 'jpeg' VisualSampleEntry (ISO 14496-12 §12.1.3 layout)
    entry = (
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full_box(b"stts", struct.pack(">III", 1, n, frame_dur))
    stsc = _full_box(b"stsc", struct.pack(">IIII", 1, 1, n, 1))  # 1 chunk, all samples
    stsz = _full_box(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )

    def stbl_of(offset: int) -> bytes:
        stco = _full_box(b"stco", struct.pack(">II", 1, offset))
        return _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full_box(b"vmhd", struct.pack(">H3H", 0, 0, 0, 0), flags=1)
    dref = _full_box(b"dref", struct.pack(">I", 1) + _full_box(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    mdhd = _full_box(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0)
    )
    hdlr = _full_box(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")

    def minf_of(offset: int) -> bytes:
        return _box(b"minf", vmhd + dinf + stbl_of(offset))

    tkhd = _full_box(
        b"tkhd",
        struct.pack(">III", 0, 0, 1)  # times, track id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        flags=7,
    )
    mvhd = _full_box(
        b"mvhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + struct.pack(">i", 0x00010000)
        + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )

    def moov_of(offset: int) -> bytes:
        mdia = _box(b"mdia", mdhd + hdlr + minf_of(offset))
        return _box(b"moov", mvhd + _box(b"trak", _box(b"tkhd", tkhd[8:]) + mdia))

    # moov length does not depend on the stco VALUE (fixed-width uint32),
    # so compute layout with a placeholder, then re-emit with the real one
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    body = b"".join(frames)
    first_sample = len(ftyp) + len(moov_of(0)) + 8  # +8 = mdat header
    return ftyp + moov_of(first_sample) + _box(b"mdat", body)


def _read_stbl_samples(payload: bytes, ss: int, se: int) -> list[tuple[int, int]]:
    """Parse stsz/stco/stsc inside an stbl box -> [(abs_offset, size)] per
    sample, via the general sample-to-chunk mapping."""
    stsz = _find(payload, ss, se, b"stsz")
    stco = _find(payload, ss, se, b"stco")
    stsc = _find(payload, ss, se, b"stsc")
    if stsz is None or stco is None or stsc is None:
        raise ValueError("stbl missing stsz/stco/stsc")
    zb, ze = stsz
    if zb + 12 > ze:
        raise ValueError("truncated stsz")
    fixed, count = struct.unpack_from(">II", payload, zb + 4)
    if count > len(payload):  # a sample needs at least a byte of file
        raise ValueError("implausible stsz sample count")
    if fixed:
        sizes = [fixed] * count
    else:
        if zb + 12 + 4 * count > ze:
            raise ValueError("truncated stsz")
        sizes = list(struct.unpack_from(f">{count}I", payload, zb + 12))
    cb, ce = stco
    if cb + 8 > ce:
        raise ValueError("truncated stco")
    (n_chunks,) = struct.unpack_from(">I", payload, cb + 4)
    if cb + 8 + 4 * n_chunks > ce:
        raise ValueError("truncated stco")
    chunk_offs = list(struct.unpack_from(f">{n_chunks}I", payload, cb + 8))
    sb, sez = stsc
    if sb + 8 > sez:
        raise ValueError("truncated stsc")
    (n_ent,) = struct.unpack_from(">I", payload, sb + 4)
    if sb + 8 + 12 * n_ent > sez:
        raise ValueError("truncated stsc")
    ents = [struct.unpack_from(">III", payload, sb + 8 + 12 * i) for i in range(n_ent)]
    # expand samples-per-chunk runs across the chunk list
    out: list[tuple[int, int]] = []
    si = 0
    for i, (first, per_chunk, _desc) in enumerate(ents):
        if first < 1:
            raise ValueError("stsc first_chunk must be >= 1")
        last = ents[i + 1][0] - 1 if i + 1 < n_ent else n_chunks
        for ch in range(first, last + 1):
            if ch - 1 >= n_chunks:
                raise ValueError("stsc chunk index out of range")
            pos = chunk_offs[ch - 1]
            for _ in range(per_chunk):
                if si >= count:
                    break
                out.append((pos, sizes[si]))
                pos += sizes[si]
                si += 1
    if si != count:
        raise ValueError("stsc/stsz sample count mismatch")
    return out


def mjpeg_samples(payload: bytes) -> tuple[int, int, list[bytes]]:
    """-> (width, height, [frame_bytes]) for the first video track, via a
    REAL sample-table walk (stsd coding check, stsz sizes, stsc chunk
    mapping, stco absolute offsets).  Raises ValueError unless the track's
    sample description is 'jpeg'/'mjpa'/'mjpb' (Motion-JPEG — the only
    intra-only codec decodable without external libraries)."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    for t, b, e in _walk(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if minf is None:
            raise ValueError("video trak missing minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("video trak missing stbl")
        stsd = _find(payload, stbl[0], stbl[1], b"stsd")
        if stsd is None:
            raise ValueError("stbl missing stsd")
        db = stsd[0] + 8  # ver/flags + entry_count
        if db + 36 > stsd[1]:  # through the entry's width/height fields
            raise ValueError("truncated stsd")
        coding = payload[db + 4 : db + 8]
        if coding not in (b"jpeg", b"mjpa", b"mjpb"):
            raise ValueError(f"unsupported video coding {coding!r} (MJPEG only)")
        w, h = struct.unpack_from(">HH", payload, db + 8 + 24)
        frames = []
        for off, size in _read_stbl_samples(payload, stbl[0], stbl[1]):
            if off + size > len(payload):
                raise ValueError("sample range beyond end of file")
            frames.append(payload[off : off + size])
        return int(w), int(h), frames
    raise ValueError("no video track")


# --- Spark wiring (mirrors textops/audio.py) -------------------------------

def _make_video_payload(doc_id: int, media_ref: str) -> bytes:
    import hashlib

    h = hashlib.md5(f"{doc_id}:{media_ref}:mp4".encode()).hexdigest()
    return encode_mp4_meta(
        duration_ms=1000 + 100 * (ord(h[0]) % 60),
        width=16 * (1 + ord(h[1]) % 8),
        height=16 * (1 + ord(h[2]) % 8),
        with_audio=ord(h[3]) % 2 == 1,
    )


def video_payloads(spans_flat):
    """Media spans -> real ISO-BMFF binary payloads (md5-derived duration,
    dimensions, audio-track flag — the synthesis half of the round trip)."""
    from pdfparser_spark.textops.media import media_payload_kernel

    return media_payload_kernel(spans_flat, _make_video_payload)


def _mjpeg_dims(doc_id: int, media_ref: str) -> tuple[int, int, int]:
    """md5 ':mjpeg' salt -> (n_frames, width, height); mirrored verbatim
    by the DuckDB oracle (ascii of hex chars 1-3)."""
    import hashlib

    h = hashlib.md5(f"{doc_id}:{media_ref}:mjpeg".encode()).hexdigest()
    return 4 + ord(h[0]) % 20, 16 * (1 + ord(h[1]) % 8), 16 * (1 + ord(h[2]) % 8)


@_lru_cache(maxsize=4096)
def _mjpeg_frame_cached(w: int, h: int, off: int) -> bytes:
    """One encoded frame: block-constant pattern (7R + 13C + off) % 256.
    Memoized on (w, h, off) — the corpus reuses a small set of shapes, so
    each executor encodes each distinct frame at most once."""
    from pdfparser_spark.textops import jpeg
    from pdfparser_spark.textops.media import _block_pattern

    return jpeg.encode_jpeg(_block_pattern(w, h, off))


def _make_mjpeg_payload(doc_id: int, media_ref: str) -> bytes:
    nf, w, h = _mjpeg_dims(doc_id, media_ref)
    frames = [_mjpeg_frame_cached(w, h, 11 * f) for f in range(nf)]
    return encode_mp4_mjpeg(frames, w, h)


def video_mjpeg_payloads(spans_flat):
    """Media spans -> real Motion-JPEG ISO-BMFF payloads: each span gets a
    conforming MP4 whose video track holds md5-derived-many baseline-JPEG
    frames (frame f's block pattern offset by 11f so frames differ)."""
    from pdfparser_spark.textops.media import media_payload_kernel

    return media_payload_kernel(spans_flat, _make_mjpeg_payload)


def video_frames_real(spans_flat, every: int = 5):
    """REAL frame-sampling decode over the MJPEG payload column: walk the
    actual sample table, decode every ``every``-th frame with the
    pure-numpy JPEG codec, emit (frame_idx, width, height, pixel_sum).
    ``pixel_sum`` pins the decoded pixels exactly — the DC-only pattern
    makes the lossy round trip integer-predictable, so the DuckDB oracle
    recomputes it analytically (the same closed form as
    ``media_decode_real``, plus the per-frame offset)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pdfparser_spark.textops.media import decode_video_real

    payloads = video_mjpeg_payloads(spans_flat)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, m, raw in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                try:
                    v = decode_video_real(bytes(raw))
                except ValueError:
                    continue  # undecodable codec/corrupt: skip, never kill the task
                for f in range(0, v["n_frames"], every):
                    img = v["frames"][f]
                    rows.append(
                        (int(d), m, f, v["width"], v["height"], int(img.sum(dtype=np.int64)))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "frame_idx", "width", "height", "pixel_sum"],
            )

    return payloads.mapInPandas(
        run,
        schema="doc_id long, media_ref string, frame_idx int, width int, "
        "height int, pixel_sum long",
    )


def video_metadata(spans_flat):
    """REAL container parse over the MP4 payload column: walk the actual
    box structure and emit (brand, duration_ms, n_tracks, width, height)
    — all integers/strings, recomputed exactly by the DuckDB oracle."""
    from collections.abc import Iterator

    import pandas as pd

    payloads = video_payloads(spans_flat)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            brands, durs, tracks, ws, hs = [], [], [], [], []
            for raw in pdf["payload"]:
                m = decode_mp4_meta(bytes(raw))
                brands.append(m["brand"])
                durs.append(m["duration_ms"])
                tracks.append(m["n_tracks"])
                ws.append(m["video"][0] if m["video"] else 0)
                hs.append(m["video"][1] if m["video"] else 0)
            out = pdf[["doc_id", "media_ref"]].copy()
            out["brand"] = brands
            out["duration_ms"] = durs
            out["n_tracks"] = tracks
            out["width"] = ws
            out["height"] = hs
            yield out

    return payloads.mapInPandas(
        run,
        schema="doc_id long, media_ref string, brand string, duration_ms int, "
        "n_tracks int, width int, height int",
    )
