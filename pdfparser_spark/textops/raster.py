"""Raw raster image samples — ISO 32000 §8.9.5 (sample representation).

The most common real-world image form after /DCTDecode: screenshots and
vector-rendered art are Flate-compressed RAW samples, not a media codec.
The filter fold (core/filters.py) already yields the sample bytes; this
module turns them into pixels:

  - rows padded to byte boundaries, samples MSB-first within a byte
    (§8.9.5.2: "packed consecutively ... each row starts on a byte
    boundary")
  - /BitsPerComponent 1, 2, 4, 8
  - /ColorSpace DeviceGray / DeviceRGB / [/Indexed base hival lookup]
    (§8.6.6.3: component values are palette indices)
  - /Decode arrays (§8.9.5.2 Table 90): linear map of each component,
    Dmin + x * (Dmax - Dmin) / (2^bpc - 1); [1 0] inverts
  - /ImageMask stencils (§8.9.6.2): 1 bit/sample, reported as a gray
    raster with pixel = 255 * sample (after /Decode), the convention an
    extraction pipeline can feed to OCR directly

Corrupt or inconsistent geometry raises ValueError only (the shared
media containment contract).  Reference parity: the reference never
rasterizes (decode.rs:197-203 routes images to passthrough); this is a
strict superset.
"""

from __future__ import annotations

import numpy as np


def unpack_rows(samples: bytes, width: int, height: int, ncomp: int, bpc: int) -> np.ndarray:
    """Sample bytes -> (height, width, ncomp) int64 array of raw sample
    values (no /Decode applied).  Each row is padded to a byte boundary;
    sub-byte samples are MSB-first."""
    if bpc not in (1, 2, 4, 8):
        raise ValueError(f"raster: unsupported BitsPerComponent {bpc}")
    if width <= 0 or height <= 0 or ncomp <= 0:
        raise ValueError("raster: bad geometry")
    row_bits = width * ncomp * bpc
    row_bytes = (row_bits + 7) // 8
    need = row_bytes * height
    if len(samples) < need:
        raise ValueError(f"raster: {len(samples)} sample bytes < {need} required")
    arr = np.frombuffer(samples, dtype=np.uint8, count=need).reshape(height, row_bytes)
    if bpc == 8:
        vals = arr[:, : width * ncomp].astype(np.int64)
    else:
        bits = np.unpackbits(arr, axis=1)  # MSB-first per byte
        per = row_bits // bpc  # samples per row
        take = bits[:, : per * bpc].reshape(height, per, bpc)
        weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.int64)
        vals = (take.astype(np.int64) * weights).sum(axis=2)
    return vals.reshape(height, width, ncomp)


def apply_decode(vals: np.ndarray, bpc: int, decode: list | None, defaults: list) -> np.ndarray:
    """§8.9.5.2: per-component linear interpolation into decode range,
    returned as float64 in the target range.  ``defaults`` supplies the
    [Dmin Dmax] pairs when no /Decode is present."""
    ncomp = vals.shape[2]
    pairs = decode if decode is not None else defaults
    if len(pairs) < 2 * ncomp:
        raise ValueError("raster: /Decode array too short")
    maxval = (1 << bpc) - 1
    out = np.empty(vals.shape, dtype=np.float64)
    for i in range(ncomp):
        dmin, dmax = float(pairs[2 * i]), float(pairs[2 * i + 1])
        out[:, :, i] = dmin + vals[:, :, i] * ((dmax - dmin) / maxval)
    return out


def decode_raster(
    samples: bytes,
    width: int,
    height: int,
    bpc: int,
    colorspace,
    decode: list | None = None,
    imagemask: bool = False,
) -> np.ndarray:
    """Full §8.9.5 sample decode -> uint8 image, (H,W) gray or (H,W,3)
    RGB.  ``colorspace`` is one of "gray", "rgb", or
    ("indexed", base, hival, lookup_bytes) with base "gray"/"rgb";
    ignored when ``imagemask``."""
    if imagemask:
        if bpc != 1:
            raise ValueError("raster: ImageMask requires 1 bit per sample")
        vals = unpack_rows(samples, width, height, 1, 1)
        dec = apply_decode(vals, 1, decode, [0, 1])
        return np.clip(np.rint(dec[:, :, 0] * 255.0), 0, 255).astype(np.uint8)
    if isinstance(colorspace, tuple) and colorspace[0] == "separation":
        # §8.6.6.4: one tint component per sample through the tint
        # transform into the alternate space.  Evaluated as a LUT over
        # the 2^bpc input codes (the per-pixel cost a renderer avoids
        # the same way); output pixel = floor(255*c + 0.5) per component
        # — half-up, mirrored literally by the corpus oracle
        _tag, base, tint_fn, n_out = colorspace
        nbase = 3 if base == "rgb" else 1
        if n_out != nbase:
            raise ValueError("raster: tint transform arity != alternate space")
        codes = unpack_rows(samples, width, height, 1, bpc)[:, :, 0]
        maxval = (1 << bpc) - 1
        tvals = apply_decode(
            np.arange(maxval + 1, dtype=np.int64)[None, :, None], bpc, decode, [0.0, 1.0]
        )[0, :, 0]
        lut = np.empty((maxval + 1, n_out), dtype=np.uint8)
        for code in range(maxval + 1):
            comps = tint_fn([float(tvals[code])])
            for j, c in enumerate(comps):
                lut[code, j] = int(np.clip(np.floor(255.0 * c + 0.5), 0, 255))
        out = lut[codes]
        return out[:, :, 0] if nbase == 1 else out
    if isinstance(colorspace, tuple) and colorspace[0] == "indexed":
        _tag, base, hival, lookup = colorspace
        vals = unpack_rows(samples, width, height, 1, bpc)
        # indices interpolate over [0, hival] by default (§8.6.6.3)
        idx = np.rint(apply_decode(vals, bpc, decode, [0, hival])[:, :, 0]).astype(np.int64)
        if (idx < 0).any() or (idx > hival).any():
            idx = np.clip(idx, 0, hival)  # out-of-range indices clip (spec)
        nbase = 3 if base == "rgb" else 1
        need = (hival + 1) * nbase
        if len(lookup) < need:
            raise ValueError("raster: /Indexed lookup table too short")
        pal = np.frombuffer(lookup, dtype=np.uint8, count=need).reshape(hival + 1, nbase)
        out = pal[idx]
        return out[:, :, 0] if nbase == 1 else out
    ncomp = {"rgb": 3, "cmyk": 4}.get(colorspace, 1)
    vals = unpack_rows(samples, width, height, ncomp, bpc)
    dec = apply_decode(vals, bpc, decode, [0.0, 1.0] * ncomp)
    img = np.clip(np.rint(dec * 255.0), 0, 255).astype(np.uint8)
    return img[:, :, 0] if ncomp == 1 else img


# ---------------------------------------------------------------------------
# matched synth-side packers

def pack_rows(vals: np.ndarray, bpc: int) -> bytes:
    """(H,W) or (H,W,C) sample values -> §8.9.5.2 packed bytes (rows
    byte-aligned, MSB-first)."""
    if vals.ndim == 2:
        vals = vals[:, :, None]
    h, w, c = vals.shape
    if bpc == 8:
        return vals.astype(np.uint8).tobytes()
    flat = vals.reshape(h, w * c).astype(np.uint8)
    bits = ((flat[:, :, None] >> np.arange(bpc - 1, -1, -1)) & 1).reshape(h, -1)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros((h, pad), dtype=bits.dtype)], axis=1)
    return np.packbits(bits.astype(np.uint8), axis=1).tobytes()
