"""Baseline JPEG codec (textops/jpeg.py): pure-numpy encode/decode.

Covers the exact-integer DC-only contract the media_decode_real oracle
relies on, lossy round-trips for natural content (grayscale, 4:4:4,
4:2:0 + restart markers), malformed-input rejection, and — when a JDK is
present — cross-validation of the encoder against javax.imageio, a fully
independent industry decoder.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pytest

from pdfparser_spark.textops import jpeg, media


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float(10 * np.log10(255**2 / mse)) if mse else float("inf")


def _dc_only_expect(bv: np.ndarray) -> np.ndarray:
    """The all-integer decode model for block-constant grayscale input
    (Annex-K DC quant step 16): out = clamp(2*floor((v-128)/2 + 0.5) + 128)."""
    d = bv.astype(np.int64) - 128
    out = np.clip(2 * np.floor(d / 2.0 + 0.5).astype(np.int64) + 128, 0, 255)
    return np.kron(out, np.ones((8, 8), dtype=np.int64))


def test_dc_only_grayscale_exact():
    """Block-constant input decodes to EXACTLY the integer model — the
    invariant the DuckDB oracle for media_decode_real recomputes."""
    bv = (np.arange(48).reshape(6, 8) * 41) % 256
    img = np.kron(bv, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    w, h, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    assert (w, h) == (64, 48)
    assert dec.ndim == 2
    assert np.array_equal(dec.astype(np.int64), _dc_only_expect(bv))


def test_block_pattern_matches_oracle_formula():
    """media._block_pattern through the codec == the (7R+13C)%256 SQL rule."""
    img = media._block_pattern(32, 16)
    _, _, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    bv = (np.add.outer(7 * np.arange(2), 13 * np.arange(4))) % 256
    assert np.array_equal(dec.astype(np.int64), _dc_only_expect(bv))


def test_natural_grayscale_roundtrip():
    img = (np.add.outer(np.arange(50) * 2.0, np.arange(70) * 1.5) % 256).astype(np.uint8)
    w, h, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    assert (w, h) == (70, 50)
    assert _psnr(dec, img) > 30


def test_color_444_roundtrip():
    img = np.zeros((40, 44, 3), np.uint8)
    img[..., 0] = (np.add.outer(np.arange(40) * 3, np.arange(44) * 2)) % 256
    img[..., 1] = 100
    img[..., 2] = (np.add.outer(np.arange(40), np.arange(44) * 4)) % 256
    w, h, dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    assert dec.shape == (40, 44, 3)
    assert _psnr(dec, img) > 28


def test_color_420_restart_markers_odd_dims():
    """4:2:0 subsampling + DRI/RSTn, non-multiple-of-16 dims."""
    img = np.zeros((37, 53, 3), np.uint8)
    img[..., 0] = np.add.outer(np.arange(37) * 3, np.arange(53) * 2) % 256
    img[..., 1] = 128
    img[..., 2] = np.add.outer(np.arange(37), np.arange(53)) % 256
    payload = jpeg.encode_jpeg(img, subsample=True, restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))  # RSTn
    w, h, dec = jpeg.decode_jpeg(payload)
    assert (w, h, dec.shape) == (53, 37, (37, 53, 3))
    assert _psnr(dec, img) > 30


def test_rejects_malformed():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError, match="baseline and progressive"):
        # SOF3 lossless: outside the supported DCT processes
        jpeg.decode_jpeg(b"\xff\xd8\xff\xc3\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        # SOF2 parses now, but a frame with no scan is still incomplete
        jpeg.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    full = jpeg.encode_jpeg(media._block_pattern(16, 16))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(full[: len(full) // 2])  # truncated mid-stream
    # non-interleaved multi-scan baseline (one SOS per component): rejected
    # loudly instead of silently decoding only the first scan
    sof3 = b"\xff\xc0\x00\x11\x08\x00\x10\x00\x10\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    sos1 = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
    with pytest.raises(ValueError, match="multi-scan"):
        jpeg.decode_jpeg(b"\xff\xd8" + sof3 + sos1)


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK")
def test_encoder_cross_validated_against_javax(tmp_path):
    """javax.imageio (independent decoder) agrees with the integer model on
    the DC-only grayscale class and closely with our decoder on 4:2:0."""
    src = tmp_path / "DecodeJpeg.java"
    src.write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.File;
public class DecodeJpeg {
    public static void main(String[] args) throws Exception {
        BufferedImage img = ImageIO.read(new File(args[0]));
        Raster r = img.getRaster();
        int w = img.getWidth(), h = img.getHeight(), nb = r.getNumBands();
        StringBuilder sb = new StringBuilder();
        sb.append(w).append(' ').append(h).append(' ').append(nb).append('\\n');
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                for (int b = 0; b < nb; b++) {
                    if (b > 0) sb.append(' ');
                    sb.append(r.getSample(x, y, b));
                }
                sb.append('\\n');
            }
        System.out.print(sb);
    }
}
"""
    )
    subprocess.run(["javac", "-d", str(tmp_path), str(src)], check=True)

    def java_decode(payload: bytes) -> np.ndarray:
        f = tmp_path / "t.jpg"
        f.write_bytes(payload)
        out = subprocess.run(
            ["java", "-cp", str(tmp_path), "DecodeJpeg", str(f)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.splitlines()
        w, h, nb = map(int, out[0].split())
        px = np.array([list(map(int, line.split())) for line in out[1:]], dtype=np.int64)
        return px.reshape(h, w, nb)

    bv = (np.arange(30).reshape(5, 6) * 41) % 256
    gray = np.kron(bv, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    jv = java_decode(jpeg.encode_jpeg(gray))
    assert np.array_equal(jv[:, :, 0], _dc_only_expect(bv))

    # PROGRESSIVE encoder cross-validated: javax.imageio's own Annex G
    # decoder must read our SOF2 scan script to the exact DC-only model
    jv = java_decode(jpeg.encode_jpeg_progressive(gray))
    assert np.array_equal(jv[:, :, 0], _dc_only_expect(bv))
    nat = (np.add.outer(np.arange(41) * 7, np.arange(29) * 3) % 256).astype(np.uint8)
    pp = jpeg.encode_jpeg_progressive(nat)
    _, _, mine = jpeg.decode_jpeg(pp)
    jv = java_decode(pp)
    assert np.abs(mine.astype(np.int64) - jv[:, :, 0]).max() <= 2

    img = (np.add.outer(np.arange(37) * 5, np.arange(53) * 2)[:, :, None].repeat(3, axis=2) % 256).astype(np.uint8)
    payload = jpeg.encode_jpeg(img, subsample=True, restart_interval=4)
    _, _, mine = jpeg.decode_jpeg(payload)
    jv = java_decode(payload)
    # two independent IDCT/colorspace implementations on the same lossy file
    assert np.abs(mine.astype(np.int64) - jv).max() <= 2

    # GIF encoder: javax returns the palette-index raster — must be exact
    from pdfparser_spark.textops import gif

    idx, pal = media._gif_pattern(56, 40)
    g = tmp_path / "t.gif"
    g.write_bytes(gif.encode_gif(idx, pal))
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "DecodeJpeg", str(g)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    w, h, nb = map(int, out[0].split())
    px = np.array([list(map(int, line.split())) for line in out[1:]], dtype=np.int64)
    assert nb == 1
    assert np.array_equal(px.reshape(h, w), idx.astype(np.int64))


def test_exif_app1_roundtrip_and_decode_transparency():
    """APP1 Exif builds/parses in BOTH byte orders (spilled ASCII values
    + inline SHORT), the pixel decoder sees through it, and damaged or
    absent Exif yields None — never an exception."""
    import numpy as np

    from pdfparser_spark.textops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        exif_app1,
        parse_exif,
    )

    img = ((np.arange(16)[:, None] * 7 + np.arange(16)[None, :] * 13) % 256).astype(
        np.uint8
    )
    enc = encode_jpeg(img)
    base = decode_jpeg(enc)
    for be in (False, True):
        j = enc[:2] + exif_app1("Cam-a", "MX3", 6, "2024:01:05 13:00:00", be) + enc[2:]
        got = parse_exif(j)
        assert got == {
            "byte_order": "MM" if be else "II",
            "make": "Cam-a",
            "model": "MX3",
            "orientation": 6,
            "datetime": "2024:01:05 13:00:00",
        }
        assert np.array_equal(np.asarray(decode_jpeg(j)[-1]), np.asarray(base[-1]))
    assert parse_exif(enc) is None          # no APP1
    assert parse_exif(b"junk") is None       # not a JPEG
    # truncated/garbled TIFF bodies are contained
    j = enc[:2] + exif_app1("M", "X", 1, "2024:01:01 00:00:00") + enc[2:]
    assert parse_exif(j[:20]) is None
    mut = bytearray(j)
    mut[8:12] = b"\x00\x00\x00\x00"
    assert parse_exif(bytes(mut)) in (None, {}) or isinstance(parse_exif(bytes(mut)), dict)


def test_progressive_equals_baseline_pixels():
    # Annex G: the scan script (DC first Al=1 / AC first Al=1 / DC
    # refine / AC refine) transmits the same quantized coefficients as
    # baseline, so decoded pixels must be IDENTICAL for any input
    rng = np.random.default_rng(42)
    for shape in [(8, 8), (16, 24), (17, 23), (40, 56), (33, 47, 3), (24, 24, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8).squeeze()
        wb, hb, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
        wp, hp, prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img))
        assert (wb, hb) == (wp, hp)
        assert np.array_equal(base, prog), shape
    # structural: the progressive file really is SOF2 with 6+ scans
    blob = jpeg.encode_jpeg_progressive(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") == 8


def test_progressive_exercises_eob_runs_and_refinement():
    # a mostly-flat image makes long cross-block EOB runs (nbits > 0
    # symbols) and the sparse spikes force newly-nonzero refinement
    # coefficients and correction bits
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[5, 9] = 255
    img[40, 40] = 0
    wb, hb, base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    wp, hp, prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_corrupt_input_contained():
    # fuzz containment: truncation/bit flips raise ValueError only
    blob = jpeg.encode_jpeg_progressive(
        np.random.default_rng(3).integers(0, 256, (24, 24), dtype=np.uint8)
    )
    for cut in (50, len(blob) // 2, len(blob) - 3):
        try:
            jpeg.decode_jpeg(blob[:cut])
        except ValueError:
            pass
    flipped = bytearray(blob)
    flipped[len(blob) // 2] ^= 0xFF
    try:
        jpeg.decode_jpeg(bytes(flipped))
    except ValueError:
        pass


def _cmyk_dc_model(v: np.ndarray) -> np.ndarray:
    """Adobe-inverted DC-only reconstruction: stored = 255-v, recon via
    the 2*floor((s-128)/2+.5)+128 model, output un-inverted + clipped."""
    s = 255 - v.astype(np.int64)
    rec = 2 * np.floor((s - 128) / 2.0 + 0.5).astype(np.int64) + 128
    return np.clip(255 - rec, 0, 255)


def test_cmyk_adobe_roundtrip_exact_on_dc_blocks():
    bv = (np.arange(12).reshape(3, 4) * 37) % 256
    chan = np.kron(bv, np.ones((8, 8), dtype=np.int64))
    img = np.stack([(chan + 17 * i) % 256 for i in range(4)], axis=-1).astype(np.uint8)
    blob = jpeg.encode_jpeg(img)
    assert b"Adobe" in blob[:40]  # APP14, transform 0
    w, h, dec = jpeg.decode_jpeg(blob)
    assert dec.shape == (24, 32, 4)
    exp = np.stack(
        [_cmyk_dc_model(img[..., i].astype(np.int64)) for i in range(4)], axis=-1
    )
    assert np.array_equal(dec.astype(np.int64), exp)


def test_cmyk_without_adobe_marker_is_not_inverted():
    img = np.full((8, 8, 4), 40, dtype=np.uint8)
    blob = jpeg.encode_jpeg(img)
    p = blob.index(b"Adobe")
    # strip the APP14 segment entirely: data reads as TRUE CMYK
    stripped = blob[: p - 4] + blob[p - 4 + 2 + 14 :]
    _, _, dec = jpeg.decode_jpeg(stripped)
    # stored values are the inverted ones; without the marker they come
    # back as-is (215-ish instead of 40)
    assert abs(int(dec[0, 0, 0]) - 215) <= 1


def test_ycck_transform_decodes_back_to_cmyk():
    # construct a YCCK file: stored planes = fwd-YCbCr of the INVERTED
    # CMY (+ inverted K), then flip the APP14 transform byte to 2
    cmyk = np.zeros((16, 16, 4), dtype=np.float64)
    cmyk[..., 0], cmyk[..., 1], cmyk[..., 2], cmyk[..., 3] = 200, 30, 90, 120
    r = 255.0 - cmyk[..., 0]
    g = 255.0 - cmyk[..., 1]
    b = 255.0 - cmyk[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    stored = np.stack([y, cb, cr, 255.0 - cmyk[..., 3]], axis=-1)
    feed = np.clip(255.0 - np.round(stored), 0, 255).astype(np.uint8)
    blob = bytearray(jpeg.encode_jpeg(feed))
    p = blob.index(b"Adobe")
    assert blob[p + 11] == 0
    blob[p + 11] = 2  # declare YCCK
    _, _, dec = jpeg.decode_jpeg(bytes(blob))
    err = np.abs(dec.astype(np.int64) - cmyk.astype(np.int64))
    assert err.max() <= 3  # constant blocks: rounding only, no AC loss
