"""GIF codec (pure numpy — no image libraries).

Real decode of the actual format: GIF87a/89a header, logical screen
descriptor, global/local color tables, extension-block skipping, and a
full GIF-variant LZW decompressor (LITTLE-endian bit packing, variable
3..12-bit codes, clear/EOI codes, table rebuild — a genuinely different
wire format from the PDF big-endian LZW in ``core/filters.py``).

The encoder writes palette images with the classic spec-valid
"uncompressed GIF" technique: literal LZW codes with a clear code before
the table would outgrow the current width — every conforming decoder
(including this one) accepts it.  Interlaced images and animation are
rejected with ValueError rather than mis-decoded.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 palette indices + (n<=256, 3) palette -> GIF89a."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    # global color table padded to a power of two >= 2
    n = max(2, 1 << (int(len(palette) - 1).bit_length()))
    gct = np.zeros((n, 3), np.uint8)
    gct[: len(palette)] = palette
    depth = n.bit_length() - 1  # log2(n)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1) << 4 | (depth - 1), 0, 0])  # GCT flag+size
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # image descriptor

    min_code = max(2, depth)  # LZW minimum code size
    clear = 1 << min_code
    eoi = clear + 1
    out.append(min_code)

    # "uncompressed" LZW: emit literals at width min_code+1, clearing
    # before the implicit table growth would widen the codes
    bits = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # little-endian bit packing
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    cap = (1 << width) - eoi - 1  # literals before the table widens
    put(clear, width)
    for i, px in enumerate(idx.reshape(-1)):
        if i and i % cap == 0:
            put(clear, width)
        put(int(px), width)
    put(eoi, width)
    if nbits:
        bits.append(acc & 0xFF)

    for i in range(0, len(bits), 255):  # sub-blocks
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code: int, expected: int) -> bytes:
    """GIF-variant LZW: little-endian packing, 3..12-bit variable codes."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW: first code not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW: code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    raise ValueError("GIF LZW: stream ended without EOI")


def decode_gif(payload: bytes):
    """-> (width, height, (H, W, 3) uint8 RGB) for a single-frame GIF."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        w, h = struct.unpack_from("<HH", payload, 6)
        flags = payload[10]
    except (struct.error, IndexError) as e:
        raise ValueError("truncated GIF header") from e
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            size = payload[p]
            p += 1 + size
            if size == 0:
                return p

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        try:
            ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos)
            iflags = payload[pos + 8]
        except (struct.error, IndexError) as e:
            raise ValueError("truncated image descriptor") from e
        pos += 9
        if iflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        if (ix, iy) != (0, 0) or (iw, ih) != (w, h):
            # an optimized sub-frame would make the returned raster shape
            # disagree with the logical-screen dims — fail loudly instead
            raise ValueError("GIF frame does not cover the logical screen")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image without a color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise ValueError("invalid LZW minimum code size")
        chunks = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            chunks += payload[pos : pos + size]
            if len(chunks) < size:
                raise ValueError("truncated GIF sub-block")
            pos += size
        idx = np.frombuffer(_lzw_decode_gif(bytes(chunks), min_code, iw * ih), np.uint8)
        if len(idx) < iw * ih:
            raise ValueError("GIF pixel data short of geometry")
        if (idx >= len(ct)).any():
            raise ValueError("GIF index outside color table")
        img = ct[idx.reshape(ih, iw)]
        return w, h, img  # first (only) frame
    raise ValueError("GIF contains no image block")
