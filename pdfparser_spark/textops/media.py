"""Multimodal column plumbing: media payloads as opaque binary + typed
metadata.

The real pipeline treats image/audio/video as ``binary`` columns with a
metadata struct; decode / feature-extract runs as an Arrow-batched
``mapInPandas`` kernel.  The actual codecs (PIL/ffmpeg) are not available in
this container, so the decode step is STUBBED with a deterministic fake
(md5-derived dimensions) behind ``decode_image_real`` raising
NotImplementedError — the Spark-side plumbing (schema, batch shape, UDF
signature, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image_real(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real decode path (PIL/libjpeg): unavailable in this container."""
    raise NotImplementedError("image codecs not installed; use the deterministic fake")


def _fake_meta(doc_id: int, media_ref: str) -> tuple[str, int, int, int]:
    """Deterministic fake 'decode': md5-derived format/dimensions/frames,
    mirrored in the DuckDB oracle (ascii of md5 hex chars 1-4).  Every 4th
    payload (by hash) is a 'video' with a frame count; the rest are stills."""
    h = hashlib.md5(f"{doc_id}:{media_ref}".encode()).hexdigest()
    width = 16 * (1 + ord(h[0]) % 8)
    height = 16 * (1 + ord(h[1]) % 8)
    if ord(h[2]) % 4 == 0:
        return "mp4-stub", width, height, 1 + ord(h[3]) % 60
    return "jpeg-stub", width, height, 1


def media_metadata(spans_flat: DataFrame) -> DataFrame:
    """Media spans -> typed metadata via the Arrow-batched decode kernel."""
    media = spans_flat.filter(F.col("kind") == "media").select("doc_id", "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_meta(int(d), m) for d, m in zip(pdf["doc_id"], pdf["media_ref"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_ref": pdf["media_ref"],
                    "fmt": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_frames": [m[3] for m in metas],
                }
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_META)


def media_frame_sample(media_meta: DataFrame, every: int = 10) -> DataFrame:
    """(doc_id, media_ref, frame_idx): every ``every``-th frame of each
    payload — the frame-sampling pass a video pipeline runs before feature
    extraction.  Pure JVM (sequence + explode); the downstream per-frame
    decode would be the Arrow kernel (stubbed here, like the decode above).
    """
    return media_meta.select(
        "doc_id",
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))).alias("frame_idx"),
    )


def media_resize(media_meta: DataFrame, target_w: int = 64) -> DataFrame:
    """Aspect-preserving resize plan: output geometry computed JVM-side,
    the resized-payload identity via the Arrow kernel (deterministic md5 in
    place of actual pixel work — the codec is stubbed, the plumbing real).
    Emits (doc_id, media_ref, out_w, out_h, resized_md5)."""
    geo = media_meta.select(
        "doc_id",
        "media_ref",
        F.lit(target_w).alias("out_w"),
        F.greatest(
            F.lit(1), F.round(F.col("height") * target_w / F.col("width")).cast("int")
        ).alias("out_h"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized_md5"] = [
                hashlib.md5(f"{int(d)}:{m}:{int(w)}x{int(h)}".encode()).hexdigest()
                for d, m, w, h in zip(pdf["doc_id"], pdf["media_ref"], pdf["out_w"], pdf["out_h"])
            ]
            yield pdf

    schema = "doc_id long, media_ref string, out_w int, out_h int, resized_md5 string"
    return geo.mapInPandas(run, schema=schema)
