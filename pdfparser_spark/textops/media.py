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


def _fake_dims(doc_id: int, media_ref: str) -> tuple[int, int]:
    """Deterministic fake 'decode': md5-derived dimensions, mirrored in the
    DuckDB oracle (ascii of the first/second md5 hex chars)."""
    h = hashlib.md5(f"{doc_id}:{media_ref}".encode()).hexdigest()
    width = 16 * (1 + ord(h[0]) % 8)
    height = 16 * (1 + ord(h[1]) % 8)
    return width, height


def media_metadata(spans_flat: DataFrame) -> DataFrame:
    """Media spans -> typed metadata via the Arrow-batched decode kernel."""
    media = spans_flat.filter(F.col("kind") == "media").select("doc_id", "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_dims(int(d), m) for d, m in zip(pdf["doc_id"], pdf["media_ref"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_ref": pdf["media_ref"],
                    "fmt": "jpeg-stub",
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_frames": 1,
                }
            )
            yield out

    return media.mapInPandas(run, schema=MEDIA_META)
