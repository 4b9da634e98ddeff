"""From-spec JPEG 2000 decoder TWIN (ITU-T T.800) — judge r04 item 1.

This module shares ZERO code with ``pdfparser_spark.textops.jpx_codec``
and ``pdfparser_spark.textops.jbig2``: the MQ probability table is typed
fresh from the published T.88 Table E.1 / T.800 Table C.2, the Tier-1
context tables are re-derived from T.800 Tables D.1/D.3/D.4, the packet
headers are re-read from Annex B.10, and the inverse wavelet uses the
Annex F *interleaved* synthesis formulation (2D_INTERLEAVE + 1D_SR with
whole-sample symmetric index mirroring) rather than the production
codec's split-phase numpy lifting.  Matched-pair synth codecs can hide
co-evolved bugs (the round-4 LZW width-switch episode); a decode through
this module is the independent check the production pair lacked.

Test-support code: intentionally scalar and slow — clarity over speed.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# MQ probability state machine — T.88 Table E.1, independently re-typed.
# Each row: (Qe, NMPS, NLPS, SWITCH).

QE = [0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
      0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
      0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
      0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
      0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
      0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601]
NMPS = [1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
        17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
        33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46]
NLPS = [1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
        15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
        30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46]
SWITCH = [1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
          0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
          0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


class TwinMQDecoder:
    """T.88 Annex E software-conventions decoder (INITDEC / DECODE /
    BYTEIN / RENORMD), written fresh from the flowcharts."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if 0 <= i < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                # marker reached: feed 1-bits forever
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, states: list, cx: int) -> int:
        idx, mps = states[cx]
        qe = QE[idx]
        self.a -= qe
        chigh = (self.c >> 16) & 0xFFFF
        if chigh < qe:
            # LPS exchange (T.88 E.3.2 / Figure E.17)
            if self.a < qe:
                d = mps
                states[cx] = (NMPS[idx], mps)
            else:
                d = 1 - mps
                states[cx] = (NLPS[idx], (1 - mps) if SWITCH[idx] else mps)
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps
            # MPS exchange
            if self.a < qe:
                d = 1 - mps
                states[cx] = (NLPS[idx], (1 - mps) if SWITCH[idx] else mps)
            else:
                d = mps
                states[cx] = (NMPS[idx], mps)
        # RENORMD
        while not (self.a & 0x8000):
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d


# ---------------------------------------------------------------------------
# Tier-1 context modelling — T.800 Tables D.1 / D.3 / D.4, re-derived.

def _zc_context(band: str, sh: int, sv: int, sd: int) -> int:
    if band == "HL":  # Table D.1: HL swaps the H/V roles
        sh, sv = sv, sh
    if band in ("LL", "LH", "HL"):
        if sh == 2:
            return 8
        if sh == 1:
            return 7 if sv >= 1 else (6 if sd >= 1 else 5)
        if sv == 2:
            return 4
        if sv == 1:
            return 3
        return 2 if sd >= 2 else sd
    # HH column of Table D.1
    hv = sh + sv
    if sd >= 3:
        return 8
    if sd == 2:
        return 7 if hv >= 1 else 6
    if sd == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


def _sign_context(hc: int, vc: int) -> tuple[int, int]:
    # Table D.3: horizontal/vertical contributions in -1/0/1
    table = {
        (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
        (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
        (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
    }
    return table[(hc, vc)]


_CX_RL = 17
_CX_UNI = 18


def _initial_states() -> list:
    states = [(0, 0)] * 19
    states[0] = (4, 0)       # zero-coding context 0
    states[_CX_RL] = (3, 0)  # run-length
    states[_CX_UNI] = (46, 0)
    return states


def twin_t1_decode(data: bytes, w: int, h: int, nplanes: int,
                   npasses: int, band: str) -> np.ndarray:
    """Decode one codeblock's coding passes -> signed coefficients."""
    if nplanes <= 0 or npasses <= 0:
        return np.zeros((h, w), dtype=np.int64)
    sig = np.zeros((h, w), dtype=np.int8)
    sgn = np.zeros((h, w), dtype=np.int8)
    mag = np.zeros((h, w), dtype=np.int64)
    visited = np.zeros((h, w), dtype=np.int8)
    refined = np.zeros((h, w), dtype=np.int8)
    mq = TwinMQDecoder(data)
    states = _initial_states()

    def neighbour_sums(x: int, y: int) -> tuple[int, int, int]:
        sh = sv = sd = 0
        for dx in (-1, 1):
            if 0 <= x + dx < w:
                sh += int(sig[y, x + dx])
        for dy in (-1, 1):
            if 0 <= y + dy < h:
                sv += int(sig[y + dy, x])
        for dy in (-1, 1):
            for dx in (-1, 1):
                if 0 <= x + dx < w and 0 <= y + dy < h:
                    sd += int(sig[y + dy, x + dx])
        return sh, sv, sd

    def sign_contrib(x: int, y: int) -> int:
        if not (0 <= x < w and 0 <= y < h) or not sig[y, x]:
            return 0
        return -1 if sgn[y, x] else 1

    def decode_sign(x: int, y: int) -> int:
        hc = max(-1, min(1, sign_contrib(x - 1, y) + sign_contrib(x + 1, y)))
        vc = max(-1, min(1, sign_contrib(x, y - 1) + sign_contrib(x, y + 1)))
        cx, flip = _sign_context(hc, vc)
        return mq.decode(states, cx) ^ flip

    def stripes():
        for top in range(0, h, 4):
            rows = min(4, h - top)
            for x in range(w):
                yield top, x, rows

    def sig_prop(plane: int) -> None:
        for top, x, rows in stripes():
            for y in range(top, top + rows):
                if sig[y, x]:
                    continue
                cx = _zc_context(band, *neighbour_sums(x, y))
                if cx == 0:
                    continue
                visited[y, x] = 1
                if mq.decode(states, cx):
                    sgn[y, x] = decode_sign(x, y)
                    sig[y, x] = 1
                    mag[y, x] = 1 << plane

    def mag_ref(plane: int) -> None:
        for top, x, rows in stripes():
            for y in range(top, top + rows):
                if sig[y, x] and not visited[y, x]:
                    if refined[y, x]:
                        cx = 16
                    else:
                        sh, sv, sd = neighbour_sums(x, y)
                        cx = 15 if sh + sv + sd else 14
                    if mq.decode(states, cx):
                        mag[y, x] |= 1 << plane
                    refined[y, x] = 1

    def cleanup(plane: int) -> None:
        for top, x, rows in stripes():
            y = top
            if rows == 4 and all(
                not sig[yy, x] and not visited[yy, x]
                and _zc_context(band, *neighbour_sums(x, yy)) == 0
                for yy in range(top, top + 4)
            ):
                if not mq.decode(states, _CX_RL):
                    continue
                run = (mq.decode(states, _CX_UNI) << 1) | mq.decode(
                    states, _CX_UNI
                )
                y = top + run
                sgn[y, x] = decode_sign(x, y)
                sig[y, x] = 1
                mag[y, x] = 1 << plane
                y += 1
            while y < top + rows:
                if not sig[y, x] and not visited[y, x]:
                    if mq.decode(
                        states, _zc_context(band, *neighbour_sums(x, y))
                    ):
                        sgn[y, x] = decode_sign(x, y)
                        sig[y, x] = 1
                        mag[y, x] = 1 << plane
                y += 1
        visited[:] = 0

    cleanup(nplanes - 1)
    done = 1
    plane = nplanes - 2
    while done < npasses:
        for kind in (sig_prop, mag_ref, cleanup):
            if done >= npasses:
                break
            if plane < 0:
                raise ValueError("twin: pass count exceeds bitplanes")
            kind(plane)
            done += 1
        plane -= 1
    return mag * np.where(sgn > 0, -1, 1)


# ---------------------------------------------------------------------------
# Packet-header bit reader with 0xFF stuffing (B.10.1)

class TwinBitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.avail = 0
        self.last_was_ff = False

    def bit(self) -> int:
        if self.avail == 0:
            if self.pos >= len(self.data):
                raise ValueError("twin: header past end")
            self.cur = self.data[self.pos]
            self.pos += 1
            self.avail = 7 if self.last_was_ff else 8
            self.last_was_ff = self.cur == 0xFF
        self.avail -= 1
        return (self.cur >> self.avail) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def finish(self) -> int:
        """Byte-align; a terminal 0xFF is followed by a 0x00 stuff byte."""
        self.avail = 0
        if self.last_was_ff:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1
            self.last_was_ff = False
        return self.pos


# ---------------------------------------------------------------------------
# Tag trees (B.10.2)

class TwinTagTree:
    def __init__(self, w: int, h: int):
        sizes = [(w, h)]
        while sizes[-1] != (1, 1):
            pw, ph = sizes[-1]
            sizes.append(((pw + 1) // 2, (ph + 1) // 2))
        self.sizes = sizes  # leaf level first
        self.value = [
            [[0] * lw for _ in range(lh)] for lw, lh in sizes
        ]
        self.lower = [
            [[0] * lw for _ in range(lh)] for lw, lh in sizes
        ]
        self.known = [
            [[False] * lw for _ in range(lh)] for lw, lh in sizes
        ]

    def read(self, rd: TwinBitReader, x: int, y: int, threshold: int) -> bool:
        """True when leaf(x,y)'s value is known and < threshold."""
        # walk root -> leaf
        chain = []
        cx, cy = x, y
        for lvl in range(len(self.sizes)):
            chain.append((lvl, cx, cy))
            cx //= 2
            cy //= 2
        floor_v = 0
        for lvl, nx, ny in reversed(chain):
            if self.lower[lvl][ny][nx] < floor_v:
                self.lower[lvl][ny][nx] = floor_v
            while (not self.known[lvl][ny][nx]
                   and self.lower[lvl][ny][nx] < threshold):
                if rd.bit():
                    self.known[lvl][ny][nx] = True
                    self.value[lvl][ny][nx] = self.lower[lvl][ny][nx]
                else:
                    self.lower[lvl][ny][nx] += 1
            if not self.known[lvl][ny][nx]:
                return False
            floor_v = self.value[lvl][ny][nx]
            if floor_v >= threshold:
                return False
        return True

    def leaf_value(self, x: int, y: int) -> int:
        return self.value[0][y][x]


def _read_pass_count(rd: TwinBitReader) -> int:
    # B.10.6 codewords
    if rd.bit() == 0:
        return 1
    if rd.bit() == 0:
        return 2
    v = rd.bits(2)
    if v != 3:
        return 3 + v
    v = rd.bits(5)
    if v != 31:
        return 6 + v
    return 37 + rd.bits(7)


# ---------------------------------------------------------------------------
# inverse 5/3 DWT — Annex F interleaved synthesis (1D_SR on the
# 2D_INTERLEAVEd signal, whole-sample symmetric extension by index
# mirroring).  Formulation intentionally different from the production
# codec's split-phase lifting.

def _mirror_index(i: int, n: int) -> int:
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i %= period
    return i if i < n else period - i


def _synth_1d_53(y: list) -> list:
    n = len(y)
    if n == 1:
        return list(y)
    x = [0] * n

    def yv(i: int) -> int:
        return y[_mirror_index(i, n)]

    for k in range(0, n, 2):  # F.4.4 step 1: even (low-phase) samples
        x[k] = yv(k) - ((yv(k - 1) + yv(k + 1) + 2) >> 2)

    def xv(i: int) -> int:
        return x[_mirror_index(i, n)]

    for k in range(1, n, 2):  # step 2: odd (high-phase) samples
        x[k] = yv(k) + ((xv(k - 1) + xv(k + 1)) >> 1)
    return x


def twin_idwt53(ll: np.ndarray, details: list) -> np.ndarray:
    """details: [(HL, LH, HH)] ordered coarse -> fine."""
    cur = ll.astype(np.int64)
    for hl, lh, hh in details:
        lh = lh.astype(np.int64)
        hl = hl.astype(np.int64)
        hh = hh.astype(np.int64)
        out_h = cur.shape[0] + lh.shape[0]
        out_w = cur.shape[1] + hl.shape[1]
        inter = np.zeros((out_h, out_w), dtype=np.int64)
        inter[0::2, 0::2] = cur
        inter[0::2, 1::2] = hl
        inter[1::2, 0::2] = lh
        inter[1::2, 1::2] = hh
        # vertical synthesis per column, then horizontal per row (inverse
        # of analysis order: rows analysed first, then columns)
        for cx in range(out_w):
            inter[:, cx] = _synth_1d_53(list(inter[:, cx]))
        for cy in range(out_h):
            inter[cy, :] = _synth_1d_53(list(inter[cy, :]))
        cur = inter
    return cur


# ---------------------------------------------------------------------------
# inverse 9/7 DWT (Annex F.4.8) — scalar interleaved synthesis: undo the
# K scaling, then the four lifting steps reversed with negated constants,
# whole-sample symmetric extension by index mirroring on the CURRENT
# pass's values (each pass only reads the opposite parity, so mirroring
# is exact).  Constants re-typed from Table F.4.

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _synth_1d_97(y: list) -> list:
    n = len(y)
    if n == 1:
        return [float(y[0])]
    x = [0.0] * n
    for k in range(n):  # undo the band normalization
        x[k] = float(y[k]) * (_K97 if k % 2 == 0 else 1.0 / _K97)

    def passthrough(parity: int, coef: float, src: list) -> list:
        out = list(src)
        for k in range(parity, n, 2):
            left = src[_mirror_index(k - 1, n)]
            right = src[_mirror_index(k + 1, n)]
            out[k] = src[k] + coef * (left + right)
        return out

    x = passthrough(0, -_D97, x)
    x = passthrough(1, -_G97, x)
    x = passthrough(0, -_B97, x)
    x = passthrough(1, -_A97, x)
    return x


def twin_idwt97(ll: np.ndarray, details: list) -> np.ndarray:
    cur = ll.astype(np.float64)
    for hl, lh, hh in details:
        out_h = cur.shape[0] + lh.shape[0]
        out_w = cur.shape[1] + hl.shape[1]
        inter = np.zeros((out_h, out_w), dtype=np.float64)
        inter[0::2, 0::2] = cur
        inter[0::2, 1::2] = hl
        inter[1::2, 0::2] = lh
        inter[1::2, 1::2] = hh
        for cx in range(out_w):
            inter[:, cx] = _synth_1d_97(list(inter[:, cx]))
        for cy in range(out_h):
            inter[cy, :] = _synth_1d_97(list(inter[cy, :]))
        cur = inter
    return cur


# ---------------------------------------------------------------------------
# codestream walk

def _find_codestream(data: bytes) -> bytes:
    if len(data) >= 4 and data[:2] == b"\xff\x4f":
        return data
    # minimal JP2 box walk
    pos = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if length == 1:
            (length,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        end = len(data) if length == 0 else pos + length
        if btype == b"jp2c":
            return data[body:end]
        if end <= pos:
            raise ValueError("twin: bad box length")
        pos = end
    raise ValueError("twin: no codestream")


def twin_decode(data: bytes) -> np.ndarray:
    """Decode a reversible single-tile JP2/J2K file -> (H,W) or (H,W,3)
    unsigned array.  Subset mirrors the documented production subset."""
    cs = _find_codestream(data)
    if struct.unpack_from(">H", cs, 0)[0] != 0xFF4F:
        raise ValueError("twin: missing SOC")
    pos = 2
    siz = cod = qcd = None
    while True:
        marker, = struct.unpack_from(">H", cs, pos)
        if marker == 0xFF90:  # SOT
            break
        seglen, = struct.unpack_from(">H", cs, pos + 2)
        seg = cs[pos + 4:pos + 2 + seglen]
        if marker == 0xFF51:
            siz = seg
        elif marker == 0xFF52:
            cod = seg
        elif marker == 0xFF5C:
            qcd = seg
        pos += 2 + seglen
    if siz is None or cod is None or qcd is None:
        raise ValueError("twin: missing main-header segments")

    (_cap, xsiz, ysiz, x0, y0, xt, yt, xt0, yt0, ncomp) = struct.unpack_from(
        ">HIIIIIIIIH", siz, 0
    )
    if x0 or y0 or xt0 or yt0:
        raise ValueError("twin: offsets unsupported")
    depths = []
    for ci in range(ncomp):
        ssiz, dx, dy = struct.unpack_from(">BBB", siz, 36 + 3 * ci)
        if dx != 1 or dy != 1 or ssiz & 0x80:
            raise ValueError("twin: subsampling/signed unsupported")
        depths.append((ssiz & 0x7F) + 1)
    depth = depths[0]

    (_scod, prog, nlayers, mct, ndecomp, cbw, cbh, _modes, wavelet
     ) = struct.unpack_from(">BBHBBBBBB", cod, 0)
    if prog > 4 or not 1 <= nlayers <= 64 or wavelet not in (0, 1):
        raise ValueError("twin: outside subset")
    lossy = wavelet == 0
    cb = 1 << (cbw + 2)
    if cb != 1 << (cbh + 2):
        raise ValueError("twin: non-square codeblocks")

    guard = qcd[0] >> 5
    qstyle = qcd[0] & 0x1F
    if lossy:
        if qstyle != 2:
            raise ValueError("twin: lossy needs scalar-expounded QCD")
        qwords = [
            struct.unpack_from(">H", qcd, 1 + 2 * i)[0]
            for i in range((len(qcd) - 1) // 2)
        ]
        exps = [wd >> 11 for wd in qwords]
        mus = [wd & 0x7FF for wd in qwords]
    else:
        if qstyle != 0:
            raise ValueError("twin: unexpected quantization style")
        exps = [b >> 3 for b in qcd[1:]]
        mus = None

    def _twin_tile(body_t: int, tile_end: int, tw: int, th: int) -> list:
        sizes = [(tw, th)]
        for _ in range(ndecomp):
            pw, ph = sizes[-1]
            sizes.append(((pw + 1) // 2, (ph + 1) // 2))

        def band_shapes(res: int) -> list:
            if res == 0:
                lw, lh = sizes[ndecomp]
                return [("LL", lw, lh)]
            pw, ph = sizes[ndecomp - res]
            lw, lh = (pw + 1) // 2, (ph + 1) // 2
            return [("HL", pw - lw, lh), ("LH", lw, ph - lh),
                    ("HH", pw - lw, ph - lh)]

        comp_bands: list = [[None] * (ndecomp + 1) for _ in range(ncomp)]
        sub_idx_base = [0]
        for r in range(ndecomp + 1):
            sub_idx_base.append(sub_idx_base[-1] + len(band_shapes(r)))
        cursor = body_t
        # packet order (B.12) over (layer, r, c); per-codeblock inclusion /
        # Lblock / contribution state persists across layers and every
        # included block decodes once from its concatenated chunks
        for ci in range(ncomp):
            for r in range(ndecomp + 1):
                comp_bands[ci][r] = [
                    np.zeros((bh, bw), dtype=np.float64 if lossy else np.int64)
                    for _, bw, bh in band_shapes(r)
                ]
        if prog == 0:
            packet_seq = [
                (l, r, ci)
                for l in range(nlayers)
                for r in range(ndecomp + 1)
                for ci in range(ncomp)
            ]
        elif prog == 1:
            packet_seq = [
                (l, r, ci)
                for r in range(ndecomp + 1)
                for l in range(nlayers)
                for ci in range(ncomp)
            ]
        elif prog == 2:
            packet_seq = [
                (l, r, ci)
                for r in range(ndecomp + 1)
                for ci in range(ncomp)
                for l in range(nlayers)
            ]
        else:
            packet_seq = [
                (l, r, ci)
                for ci in range(ncomp)
                for r in range(ndecomp + 1)
                for l in range(nlayers)
            ]
        twin_trees: dict = {}
        twin_state: dict = {}
        for l, r, ci in packet_seq:
            shapes = band_shapes(r)
            rd = TwinBitReader(cs, cursor)
            if rd.bit() == 0:
                cursor = rd.finish()
                continue
            pending = []  # (key, npasses_this_layer, nbytes)
            for bi, (bname, bw, bh) in enumerate(shapes):
                if bw == 0 or bh == 0:
                    continue
                gw = (bw + cb - 1) // cb
                gh = (bh + cb - 1) // cb
                if (r, ci, bi) not in twin_trees:
                    twin_trees[(r, ci, bi)] = (TwinTagTree(gw, gh), TwinTagTree(gw, gh))
                incl, zeros = twin_trees[(r, ci, bi)]
                for gy in range(gh):
                    for gx in range(gw):
                        key = (r, ci, bi, gx, gy)
                        st = twin_state.get(key)
                        if st is None:
                            if not incl.read(rd, gx, gy, l + 1):
                                continue
                            t = 1
                            while not zeros.read(rd, gx, gy, t):
                                t += 1
                                if t > 64:
                                    raise ValueError("twin: zbp runaway")
                            bx = gx * cb
                            by = gy * cb
                            st = {
                                "bname": bname, "bx": bx, "by": by,
                                "cw": min(cb, bw - bx), "ch": min(cb, bh - by),
                                "missing": zeros.leaf_value(gx, gy),
                                "lblock": 3, "passes": 0, "chunks": [],
                            }
                            twin_state[key] = st
                        else:
                            if rd.bit() == 0:
                                continue
                        npasses = _read_pass_count(rd)
                        while rd.bit():
                            st["lblock"] += 1
                        nlen = st["lblock"] + (npasses.bit_length() - 1)
                        pending.append((key, npasses, rd.bits(nlen)))
            cursor = rd.finish()
            for key, npasses, nbytes in pending:
                if cursor + nbytes > tile_end:
                    raise ValueError("twin: segment overrun")
                st = twin_state[key]
                st["chunks"].append(cs[cursor:cursor + nbytes])
                st["passes"] += npasses
                cursor += nbytes
        gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
        for (r, ci, bi, _gx, _gy), st in twin_state.items():
            exp_b = exps[sub_idx_base[r] + bi]
            mb = guard + exp_b - 1
            coeffs = twin_t1_decode(
                b"".join(st["chunks"]), st["cw"], st["ch"],
                mb - st["missing"], st["passes"], st["bname"],
            )
            if lossy:
                sbi = sub_idx_base[r] + bi
                delta = (2.0 ** (depth + gain[st["bname"]] - exps[sbi])) * (
                    1.0 + mus[sbi] / 2048.0
                )
                coeffs = np.where(
                    coeffs != 0,
                    np.sign(coeffs) * (np.abs(coeffs) + 0.5) * delta,
                    0.0,
                )
            comp_bands[ci][r][bi][
                st["by"]:st["by"] + st["ch"], st["bx"]:st["bx"] + st["cw"]
            ] = coeffs
        return comp_bands, band_shapes

    # tile-part loop: decode each tile independently, composite
    ntx = (xsiz + xt - 1) // xt
    nty = (ysiz + yt - 1) // yt
    comp_planes = [
        np.zeros((ysiz, xsiz), dtype=np.float64 if lossy else np.int64)
        for _ in range(ncomp)
    ]
    while pos + 2 <= len(cs):
        marker, = struct.unpack_from(">H", cs, pos)
        if marker == 0xFFD9:
            break
        if marker != 0xFF90:
            raise ValueError("twin: expected SOT")
        _l, isot, psot, _tp, _tn = struct.unpack_from(">HHIBB", cs, pos + 2)
        if struct.unpack_from(">H", cs, pos + 12)[0] != 0xFF93:
            raise ValueError("twin: expected SOD")
        tile_end = pos + psot if psot else len(cs) - 2
        tx, ty = isot % ntx, isot // ntx
        tw = min(xt, xsiz - tx * xt)
        th = min(yt, ysiz - ty * yt)
        comp_bands, _bs = _twin_tile(pos + 14, tile_end, tw, th)
        for ci in range(ncomp):
            ll = comp_bands[ci][0][0]
            details = [tuple(comp_bands[ci][r]) for r in range(1, ndecomp + 1)]
            plane_t = twin_idwt97(ll, details) if lossy else twin_idwt53(ll, details)
            comp_planes[ci][ty * yt : ty * yt + th, tx * xt : tx * xt + tw] = plane_t
        pos = tile_end

    planes = comp_planes
    if mct == 1:
        if ncomp != 3:
            raise ValueError("twin: MCT arity")
        if lossy:  # ICT inverse (Annex G.3)
            yy, cb_, cr = planes
            planes = [
                yy + 1.402 * cr,
                yy - 0.34413 * cb_ - 0.71414 * cr,
                yy + 1.772 * cb_,
            ]
        else:
            yy, cb_, cr = planes
            g = yy - ((cb_ + cr) >> 2)
            planes = [cr + g, g, cb_ + g]
    half = 1 << (depth - 1)
    top = (1 << depth) - 1
    if lossy:
        planes = [np.rint(p) for p in planes]
    out = [np.clip(p + half, 0, top) for p in planes]
    dt = np.uint8 if depth <= 8 else np.uint16
    if ncomp == 1:
        return out[0].astype(dt)
    return np.stack(out, axis=-1).astype(dt)
