"""Spark schemas for every stage boundary (SURVEY.md §1.2).

The input/output span shape is the authoritative one from BASELINE.json:15:
``documents(doc_id, spans: array<struct<kind, text, media_ref, offset>>)``.

Intermediate stage tables are flat and column-prunable: each downstream
stage selects only the columns it needs, so the parquet/Iceberg checkpoint
scan prunes (the distributed analog of the reference's lazy demand-driven
parsing, pdf_file.rs:48-68 — see SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

# pipeline input & final output table shape (BASELINE.json:15)
DOCUMENTS_RAW = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

# decode-stage output: one row per (doc meta | content stream | font binding |
# xobject binding | error).  rtype discriminates; unused columns are NULL.
DECODED = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rtype", T.StringType()),  # meta|content|font|xobj|error
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),  # content-stream order within page
        T.StructField("data", T.BinaryType()),  # decoded content / CMap bytes
        T.StructField("font_name", T.StringType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("media_name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("error_kind", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("detail", T.StringType()),
        T.StructField("n_objects", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_streams", T.IntegerType()),
    ]
)

# tokenize-stage output: postfix-machine events in byte order
TOKENS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("ev_idx", T.IntegerType()),
        T.StructField("ev_type", T.StringType()),  # text | media
        T.StructField("font_name", T.StringType()),
        T.StructField("operand", T.BinaryType()),
        T.StructField("media_name", T.StringType()),
        # byte offsets into operand where a TJ kern at/beyond the
        # word-break threshold fell between string elements — classify
        # inserts a space there (offsets land on operand boundaries, so
        # per-segment font decode is safe even for 2-byte CID codes)
        T.StructField("break_offsets", T.ArrayType(T.IntegerType())),
    ]
)

# classify-stage output: typed spans still carrying their ordering key
CLASSIFIED = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("ev_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("error_kind", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("count", T.LongType()),
    ]
)
