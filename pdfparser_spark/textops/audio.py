"""Audio modality: real RIFF/WAV PCM codec (pure numpy) + feature
extraction as an Arrow-batched kernel.

Mirrors the image tier in ``media.py``: media spans get an actual binary
WAV payload (md5-derived rate/channels/length, deterministic integer
waveform), the decoder parses the real RIFF chunk structure, and the
feature kernel emits integer metrics (peak, sum of absolute samples,
duration) that the DuckDB oracle recomputes analytically from the
waveform rule — all-integer, so the check is exact at any scale factor.

Waveform rule per (sample i, channel c):  s = ((7*i*i + 13*i + 31*c)
% 65536) - 32768 — chirp-like, full int16 range, trivially SQL-mirrorable.

Compressed codecs (MP3/AAC) would need ffmpeg (absent from this
container) and stay on the stub tier like video.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RATES = (8000, 16000, 22050, 44100)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 -> RIFF/WAVE with a single PCM ``data`` chunk."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    riff = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_wav(payload: bytes):
    """-> (rate, channels, (n, channels) int16 array).  Walks the real
    chunk structure (skips unknown chunks, honors the declared sizes);
    raises ValueError on malformed/non-PCM input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload, pos + 8)
            if tag != 1:
                raise ValueError("only PCM WAV supported")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    arr = np.frombuffer(data, dtype="<i2")
    return rate, ch, arr.reshape(-1, ch)


def _waveform(n: int, ch: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    return (((7 * i * i + 13 * i + 31 * c) % 65536) - 32768).astype(np.int16)


def _params(doc_id: int, media_ref: str) -> tuple[int, int, int]:
    h = hashlib.md5(f"{doc_id}:{media_ref}:wav".encode()).hexdigest()
    n = 800 + 100 * (ord(h[0]) % 8)
    rate = RATES[ord(h[1]) % 4]
    ch = 1 + ord(h[2]) % 2
    return n, rate, ch


@lru_cache(maxsize=128)
def _wav_payload(n: int, rate: int, ch: int) -> bytes:
    """Memoized: only 8 x 4 x 2 distinct (n, rate, ch) combos exist."""
    return encode_wav(_waveform(n, ch), rate)


def audio_payloads(spans_flat: DataFrame) -> DataFrame:
    """Media spans -> real WAV binary payloads (synthesis half of the
    round trip; at production the bytes come from the source table)."""
    from pdfparser_spark.textops.media import media_payload_kernel

    return media_payload_kernel(
        spans_flat, lambda d, m: _wav_payload(*_params(d, m))
    )


def audio_features(spans_flat: DataFrame) -> DataFrame:
    """REAL decode over the WAV payload column: parse the RIFF bytes,
    emit integer features (rate, channels, n_samples, duration_ms, peak,
    sum_abs).  All-integer so the oracle recomputes them exactly."""
    payloads = audio_payloads(spans_flat)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chs, ns, durs, peaks, sums = [], [], [], [], [], []
            for raw in pdf["payload"]:
                rate, ch, arr = decode_wav(bytes(raw))
                a = np.abs(arr.astype(np.int64))
                rates.append(rate)
                chs.append(ch)
                ns.append(arr.shape[0])
                durs.append(arr.shape[0] * 1000 // rate)
                peaks.append(int(a.max()))
                sums.append(int(a.sum()))
            out = pdf[["doc_id", "media_ref"]].copy()
            out["rate"] = rates
            out["channels"] = chs
            out["n_samples"] = ns
            out["duration_ms"] = durs
            out["peak"] = peaks
            out["sum_abs"] = sums
            yield out

    return payloads.mapInPandas(
        run,
        schema="doc_id long, media_ref string, rate int, channels int, "
        "n_samples int, duration_ms int, peak int, sum_abs long",
    )
