"""Fused single-pass extraction: documents_raw -> (doc_id, spans).

The staged DAG (decode -> tokenize -> classify -> assemble) buys
checkpoint/resume and per-stage lineage at the cost of three shuffles and
two persisted intermediates.  But extraction itself is *per-document*
embarrassingly parallel — nothing in the kernel crosses documents — so the
maximum-throughput production mode is this fused stage: ONE ``mapInPandas``
running the whole kernel (core/extract.py: version -> xref -> objects ->
filters -> page tree -> content tokenize -> CMap decode -> ordered spans)
per document, zero shuffles, no intermediate materialization.

Semantics are identical to the staged DAG (same kernel functions; asserted
by the shared DuckDB oracle and pytest span-equality).  Use the staged
pipeline when you need resumability on very long jobs; use the fused stage
for steady-state throughput — at 1000 executors its only data movement is
the input scan and the output write.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core.extract import (
    extract_advance_spans,
    extract_layout_spans,
    extract_spans,
    extract_tagged_spans,
)
from ..schema import DOCUMENTS_RAW

def _doc_bytes(spans) -> bytes:
    # spans may be NULL (malformed upstream row) — treat as empty, never crash
    if spans is None:
        return b""
    parts = sorted((s for s in spans if s["text"] is not None), key=lambda s: s["offset"])
    return "".join(s["text"] for s in parts).encode("latin-1")


def extract_fused(
    documents_raw: DataFrame, strict: bool = False, password: bytes = b""
) -> DataFrame:
    """-> ``(doc_id, spans array<struct<kind,text,media_ref,offset>>)`` —
    byte-identical to ``Pipeline.run(...)["spans"]``.  ``password`` is the
    credential for encrypted documents (tried as user then owner password;
    constant per job, captured by the Arrow kernel closure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_spans = [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_spans(_doc_bytes(spans), strict=strict, password=password)
                out_ids.append(int(doc_id))
                out_spans.append(
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": i}
                        for i, (k, t, m) in enumerate(res["spans"])
                    ]
                )
            yield pd.DataFrame({"doc_id": out_ids, "spans": out_spans})

    return documents_raw.mapInPandas(run, schema=DOCUMENTS_RAW)


def extract_layout_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """LAYOUT extraction, zero shuffle: the positioning-aware kernel
    (`core.extract.extract_layout_spans` — Td/TD/Tm/TL/T* interpreted)
    emitting each text span's page and text-line origin, presented in
    reading order: `ord` numbers spans per document by (page, -y, x, emit
    order) — top-to-bottom, left-to-right, the layout-analysis convention.
    Emits (doc_id, ord, page_idx, x, y, text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_layout_spans(_doc_bytes(spans), password=password)
                ordered = sorted(
                    enumerate(res["spans"]),
                    key=lambda e: (e[1][0], -e[1][2], e[1][1], e[0]),
                )
                for ordn, (_emit_i, (page_idx, x, y, txt, _size)) in enumerate(ordered):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "ord", "page_idx", "x", "y", "text"]
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, text string",
    )


def extract_advance_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Glyph-advance layout extraction, zero shuffle: the width-modeling
    kernel (`core.extract.extract_advance_spans` — /Widths + Tc/Tw/Tz +
    TJ kerns folded into an exact integer cursor) emitting one span per
    shown string with its x-advance from the line origin in micro-points.
    `ord` numbers spans per document in STREAM order (the cursor itself
    is the within-line order).  `y` carries the text rise (Ts) and
    `mode` the render mode (Tr; 3 = invisible OCR-layer ink, reported
    not dropped).  Emits (doc_id, ord, page_idx, x, y, ax_micro, text,
    size, mode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_advance_spans(_doc_bytes(spans), password=password)
                for ordn, (page_idx, x, y, ax, txt, size, mode) in enumerate(res["spans"]):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "ax_micro": int(ax),
                            "text": txt,
                            "size": float(size),
                            "mode": int(mode),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "ord", "page_idx", "x", "y", "ax_micro",
                    "text", "size", "mode",
                ],
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, "
        "ax_micro long, text string, size double, mode int",
    )


def extract_word_boxes_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Word-geometry extraction, zero shuffle: the glyph-advance kernel
    with ``with_width=True`` — each shown string carries BOTH its start
    cursor (``ax_micro``) and its own glyph advance (``w_micro``), so
    (x + ax/1e5, y) .. (x + (ax+w)/1e5, y + size) is the word's exact
    baseline box.  This is the hOCR-style geometry an OCR layer would
    report, recovered integer-exact from the vector text itself.  A
    strict superset of `extract_advance_fused`'s columns; same plan
    (one mapInPandas, scan-bound)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_advance_spans(
                    _doc_bytes(spans), password=password, with_width=True
                )
                for ordn, (page_idx, x, y, ax, w, txt, size, mode) in enumerate(
                    res["spans"]
                ):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "ax_micro": int(ax),
                            "w_micro": int(w),
                            "text": txt,
                            "size": float(size),
                            "mode": int(mode),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "ord", "page_idx", "x", "y", "ax_micro",
                    "w_micro", "text", "size", "mode",
                ],
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, "
        "ax_micro long, w_micro long, text string, size double, mode int",
    )


def extract_hocr_roundtrip_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """hOCR round-trip, zero shuffle: the word-box kernel's exact
    geometry serialized to hOCR (`core.hocr.words_to_hocr` — the format
    OCR pipelines exchange) and parsed BACK through the curation tier's
    lenient HTML parser.  Rows must equal `extract_word_boxes`' (same
    oracle), so a green row proves the exporter emits hOCR our own
    independent HTML machinery fully agrees with."""
    from ..core.extract import extract_advance_spans
    from ..core.hocr import hocr_to_words, words_to_hocr

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "ord", "page_idx", "x", "y", "ax_micro",
            "w_micro", "text", "size", "mode",
        ]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_advance_spans(
                    _doc_bytes(spans), password=password, with_width=True
                )
                back = hocr_to_words(words_to_hocr(res["spans"]))
                for ordn, (page_idx, x, y, ax, w, txt, size, mode) in enumerate(back):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": int(page_idx),
                            "x": float(x),
                            "y": float(y),
                            "ax_micro": int(ax),
                            "w_micro": int(w),
                            "text": txt,
                            "size": float(size),
                            "mode": int(mode),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, "
        "ax_micro long, w_micro long, text string, size double, mode int",
    )


def cluster_columns(xs, min_gap: float = 100.0) -> list:
    """1-D gap clustering of a page's line-origin x values -> sorted list
    of column START positions: a new column opens when the gap from the
    previous distinct x exceeds ``min_gap`` (intra-column x jitter —
    indents, ragged starts — stays below it; the inter-column gutter is
    far above).  This is the k-column generalization of a fixed split
    point; assignment is a bisect against the starts."""
    starts: list = []
    prev = None
    for x in sorted(set(xs)):
        if prev is None or x - prev > min_gap:
            starts.append(x)
        prev = x
    return starts


def _column_of(x: float, starts: list) -> int:
    from bisect import bisect_right

    return max(0, bisect_right(starts, x) - 1)


def extract_columns_fused(
    documents_raw: DataFrame,
    column_split_x: float | None = None,
    min_gap: float = 100.0,
) -> DataFrame:
    """Multi-COLUMN reading order, zero shuffle: the layout kernel's
    (page, x, y) spans re-ranked COLUMN-major — each column top-to-bottom,
    left column before right — inside the same Arrow kernel (no
    window/exchange; the per-document sort is row-local).  Column
    membership is AUTO-DETECTED per page by 1-D gap clustering of x
    (``cluster_columns``), so k-column pages need no configuration; pass
    ``column_split_x`` to force the fixed two-column split instead.
    Emits (doc_id, ord, page_idx, col, x, y, text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_layout_spans(_doc_bytes(spans))
                if column_split_x is not None:
                    col_of = lambda _p, x: int(x >= column_split_x)  # noqa: E731
                else:
                    page_xs: dict = {}
                    for page_idx, x, _y, _t, _s in res["spans"]:
                        page_xs.setdefault(page_idx, []).append(x)
                    starts = {p: cluster_columns(xs, min_gap) for p, xs in page_xs.items()}
                    col_of = lambda p, x: _column_of(x, starts[p])  # noqa: E731
                ordered = sorted(
                    enumerate(res["spans"]),
                    key=lambda e: (
                        e[1][0],                       # page
                        col_of(e[1][0], e[1][1]),      # column
                        -e[1][2],                      # top-to-bottom
                        e[1][1],                       # left-to-right
                        e[0],                          # emit order
                    ),
                )
                for ordn, (_emit_i, (page_idx, x, y, txt, _size)) in enumerate(ordered):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "col": col_of(page_idx, x),
                            "x": float(x),
                            "y": float(y),
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "ord", "page_idx", "col", "x", "y", "text"]
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, col int, x double, y double, text string",
    )


def extract_layout_sized_fused(documents_raw: DataFrame) -> DataFrame:
    """Layout spans WITH the Tf font size, zero shuffle — the raw
    material for typography-based structure analysis (heading detection,
    body-size estimation).  Emits (doc_id, page_idx, x, y, size, text)
    in emit order; downstream ranking/aggregation is JVM algebra."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_layout_spans(_doc_bytes(spans))
                for page_idx, x, y, txt, size in res["spans"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "size": float(size),
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "page_idx", "x", "y", "size", "text"]
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, page_idx int, x double, y double, size double, text string",
    )


def extract_images_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """PDF-to-pixels end to end, zero shuffle: reconstruct each document,
    pull its image XObjects out of the (decrypted) object graph
    (`core.extract.extract_image_xobjects`), and decode them — media
    codecs via `textops.media.sniff_decode` (JPEG/JP2/PNG/BMP/PPM), RAW
    §8.9.5 sample rasters (fmt 'raw': Flate samples, /Indexed palettes,
    sub-byte /BitsPerComponent, /Decode, /ImageMask) via
    `textops.raster.decode_raster`.  Emits
    (doc_id, media_ref, fmt, width, height, pixel_sum)."""
    import numpy as np

    from ..core.extract import extract_image_xobjects
    from ..textops.media import sniff_decode
    from ..textops.raster import decode_raster

    cols = ["doc_id", "media_ref", "fmt", "width", "height", "pixel_sum", "alpha_sum"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                images = extract_image_xobjects(_doc_bytes(spans), password=password)
                for name, payload, meta in images:
                    try:
                        if meta["is_media"]:
                            dec = sniff_decode(bytes(payload))
                            if dec is None:
                                continue  # video/unknown codec: stub tier
                            fmt, w, h, img = dec
                        else:
                            w, h = int(meta["width"]), int(meta["height"])
                            img = decode_raster(
                                bytes(payload), w, h, int(meta["bpc"] or 8),
                                meta["colorspace"], meta["decode"],
                                meta["imagemask"],
                            )
                            fmt = "raw"
                        alpha_sum = None
                        sm = meta.get("smask")
                        if sm is not None:
                            alpha = decode_raster(
                                bytes(sm["payload"]), int(sm["width"]),
                                int(sm["height"]), int(sm["bpc"] or 8), "gray",
                            )
                            alpha_sum = int(alpha.sum(dtype=np.int64))
                    except Exception:
                        # corrupt payload (truncated JPEG, short samples,
                        # ...): lenient like the rest of the kernel — skip
                        # the image, never kill the task
                        continue
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "media_ref": name,
                            "fmt": fmt,
                            "width": w,
                            "height": h,
                            "pixel_sum": int(img.sum(dtype=np.int64)),
                            "alpha_sum": alpha_sum,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, media_ref string, fmt string, width int, height int, "
            "pixel_sum long, alpha_sum long"
        ),
    )


def extract_meta_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Document-level metadata, zero shuffle: trailer /Info (Title/Author)
    plus the catalog /Outlines First->Next chain walk
    (`core.extract.extract_doc_meta`).  Emits
    (doc_id, title, author, n_outlines, first_outline)."""
    from ..core.extract import extract_doc_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                m = extract_doc_meta(_doc_bytes(spans), password=password)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "title": m["title"],
                        "author": m["author"],
                        "created": m["created"],
                        "n_outlines": int(m["n_outlines"]),
                        "first_outline": m["first_outline"],
                        "first_outline_page": m["first_outline_page"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "title", "author", "created",
                    "n_outlines", "first_outline", "first_outline_page",
                ],
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, title string, author string, created string, "
        "n_outlines int, first_outline string, first_outline_page int",
    )


def extract_outlines_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """FULL outline tree, zero shuffle: the §12.3.3 depth-first walk
    (`core.extract.extract_outline_tree`) — every bookmark in pre-order
    with its nesting depth, resolved /Dest target page, and open/closed
    display state.  Emits (doc_id, ord, depth, title, target_page,
    closed); one mapInPandas, scan-bound like every fused kernel."""
    from ..core.extract import extract_outline_tree

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_outline_tree(_doc_bytes(spans), password=password)
                for ordn, depth, title, target, closed in res["items"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": int(ordn),
                            "depth": int(depth),
                            "title": title,
                            "target_page": None if target is None else int(target),
                            "closed": bool(closed),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "ord", "depth", "title", "target_page", "closed"],
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, depth int, title string, "
        "target_page int, closed boolean",
    )


def extract_shadings_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Smooth-shading inventory (§8.7.4.5), zero shuffle: per-page
    /Shading resources with geometry + the colour function evaluated at
    its /Domain endpoints (`core.extract.extract_shadings`).  Flattened
    one row per (doc, page, name) with per-channel endpoint colours."""
    from ..core.extract import extract_shadings

    schema = (
        "doc_id long, page_idx int, name string, shading_type int, "
        "coord_max int, c0_r int, c0_g int, c0_b int, "
        "c1_r int, c1_g int, c1_b int, n_ops int"
    )
    cols = [f.split(" ")[0] for f in schema.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_shadings(_doc_bytes(spans), password=password)
                for page_idx, name, stype, cmax, c0, c1, n_ops in res["shadings"]:
                    if len(c0) != 3 or len(c1) != 3:
                        continue  # non-RGB alternate: outside this view
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page_idx": page_idx,
                            "name": name,
                            "shading_type": stype,
                            "coord_max": cmax,
                            "c0_r": c0[0], "c0_g": c0[1], "c0_b": c0[2],
                            "c1_r": c1[0], "c1_g": c1[1], "c1_b": c1[2],
                            "n_ops": n_ops,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(run, schema=schema)


def extract_graphics_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Vector-graphics summary, zero shuffle: per-doc path-op counters
    over every page's content stream (`core.extract.extract_graphics`).
    Emits (doc_id, n_rects, n_lines, n_curves, n_subpaths, n_strokes,
    n_fills, n_clips, rect_area)."""
    from ..core.extract import extract_graphics

    cols = [
        "n_rects",
        "n_lines",
        "n_curves",
        "n_subpaths",
        "n_strokes",
        "n_fills",
        "n_clips",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                g = extract_graphics(_doc_bytes(spans), password=password)
                row = {"doc_id": int(doc_id)}
                for c in cols:
                    row[c] = int(g[c])
                row["rect_area"] = int(g["rect_area"])
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + cols + ["rect_area"])

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, n_rects int, n_lines int, n_curves int, "
            "n_subpaths int, n_strokes int, n_fills int, n_clips int, "
            "rect_area long"
        ),
    )


def extract_links_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Interactive tier, zero shuffle: page /Annots link annotations —
    /URI actions AND internal /Dest links resolved to their target page
    (`core.extract.extract_doc_graph`), one row per link.
    Emits (doc_id, page, link_idx, uri, target_page)."""
    from ..core.extract import extract_doc_graph

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                g = extract_doc_graph(_doc_bytes(spans), password=password)
                for page, link_idx, uri, target in g["links"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page": int(page),
                            "link_idx": int(link_idx),
                            "uri": uri,
                            "target_page": target,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "link_idx", "uri", "target_page"]
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, page int, link_idx int, uri string, target_page int",
    )


def extract_forms_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Interactive tier, zero shuffle: catalog /AcroForm terminal fields
    (`core.extract.extract_doc_graph`), one row per field.  Emits
    (doc_id, field_idx, field_name, field_type, field_value) — the value
    is a PDF string for /Tx fields and a NAME for /Btn fields, both
    surfaced as strings; an unset /V surfaces as NULL."""
    from ..core.extract import extract_doc_graph

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                g = extract_doc_graph(_doc_bytes(spans), password=password)
                for field_idx, fname, ftype, fval in g["fields"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "field_idx": int(field_idx),
                            "field_name": fname,
                            "field_type": ftype,
                            "field_value": fval,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "field_idx", "field_name", "field_type", "field_value"],
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, field_idx int, field_name string, field_type string, field_value string",
    )


def extract_fill_form_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Form-FILL round-trip, zero shuffle: extract the AcroForm, fill
    every /Tx terminal with ``filled-<doc>-<name>`` as an INCREMENTAL
    revision (`core.writer.fill_form_fields` — original bytes untouched,
    odd docs save in the xref-stream revision form), then re-extract.
    /Btn fields and every other object must come back byte-identical;
    the filled values replace the old /V — the interactive-editor save
    path, driven end to end."""
    from ..core.extract import extract_doc_graph
    from ..core.writer import fill_form_fields

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "field_idx", "field_name", "field_type", "field_value"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                data = _doc_bytes(spans)
                first = extract_doc_graph(data, password=password)["fields"]
                fills = {
                    name: f"filled-{int(doc_id)}-{name}"
                    for (_i, name, ftype, _v) in first
                    if ftype == "Tx"
                }
                if fills:
                    data = fill_form_fields(
                        data, fills, xref_stream=int(doc_id) % 2 == 1
                    )
                for field_idx, fname, ftype, fval in extract_doc_graph(
                    data, password=password
                )["fields"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "field_idx": int(field_idx),
                            "field_name": fname,
                            "field_type": ftype,
                            "field_value": fval,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, field_idx int, field_name string, field_type string, field_value string",
    )


def extract_attachments_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Embedded-file attachments, zero shuffle: /Names /EmbeddedFiles name
    tree -> /Filespec -> decoded /EF stream
    (`core.extract.extract_attachments`), one row per attachment.  Emits
    (doc_id, att_idx, att_name, size, payload_md5)."""
    from ..core.extract import extract_attachments

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                g = extract_attachments(_doc_bytes(spans), password=password)
                for att_idx, name, size, digest in g["attachments"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "att_idx": int(att_idx),
                            "att_name": name,
                            "size": None if size is None else int(size),
                            "payload_md5": digest,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "att_idx", "att_name", "size", "payload_md5"]
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, att_idx int, att_name string, size int, payload_md5 string",
    )


def extract_tagged_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Tagged-PDF LOGICAL reading order, zero shuffle: the structure-tree
    kernel (core/extract.py ``extract_tagged_spans``, ISO 32000 §14.7/
    §14.8) ranks each show op by its /MCID's depth-first position in the
    /StructTreeRoot walk; untagged (artifact) content follows in drawing
    order with NULL struct_type.  One mapInPandas — the ranking is
    per-document and row-local, so the plan is scan -> kernel -> sink at
    any cluster size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_tagged_spans(_doc_bytes(spans), password=password)
                for page_idx, ordn, stype, lang, txt in res["spans"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "struct_type": stype,
                            "lang": lang,
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "ord", "page_idx", "struct_type", "lang", "text"],
            )

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, ord int, page_idx int, struct_type string, "
            "lang string, text string"
        ),
    )


def extract_scanned_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Scanned-PDF pages to pixels, zero shuffle: pull every
    CCITTFaxDecode / JBIG2Decode image XObject out of the object graph
    (``core.extract.extract_ccitt_images``) and run the REAL codec —
    Group 3/4 (``textops/ccitt.py``, honoring /K, /Columns, /Rows,
    /EncodedByteAlign, /BlackIs1) or the T.88 embedded segment walk with
    MMR generic regions (``textops/jbig2.py``).  Emits one row per image
    with the ink statistics (count + position-weighted signature — any
    single pixel flip changes it).  One mapInPandas; decode per-doc."""
    import numpy as np

    from ..core.extract import extract_ccitt_images
    from ..textops.ccitt import decode_ccitt
    from ..textops.jbig2 import decode_jbig2

    cols = ["doc_id", "page_idx", "media_ref", "width", "height", "n_black", "ink_sig"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_ccitt_images(_doc_bytes(spans), password=password)
                for page_idx, name, codec, k, columns, nrows, ba, b1, payload, gbl in res["images"]:
                    try:
                        if codec == "jbig2":
                            mask = decode_jbig2(payload, gbl)
                        else:
                            mask = decode_ccitt(
                                payload, columns, nrows, k=k,
                                byte_align=ba, black_is_1=b1,
                            )
                    except ValueError:
                        continue  # corrupt scan: contained skip, task lives
                    h, w = mask.shape
                    idx = np.arange(h * w, dtype=np.int64).reshape(h, w) + 1
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page_idx": page_idx,
                            "media_ref": name,
                            "width": w,
                            "height": h,
                            "n_black": int(mask.sum(dtype=np.int64)),
                            "ink_sig": int((idx * mask).sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, page_idx int, media_ref string, width int, "
            "height int, n_black long, ink_sig long"
        ),
    )


def extract_labels_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Page labels (§12.4.2), zero shuffle: the /PageLabels number-tree
    walk + style formatting (decimal/roman/letters, prefix, /St) in one
    mapInPandas.  Every page gets a label (viewer-default ordinal+1 when
    no tree governs it)."""
    from ..core.extract import extract_page_labels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_page_labels(_doc_bytes(spans), password=password)
                for page_idx, label in res["labels"]:
                    rows.append(
                        {"doc_id": int(doc_id), "page_idx": page_idx, "label": label}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "page_idx", "label"])

    return documents_raw.mapInPandas(
        run, schema="doc_id long, page_idx int, label string"
    )


def extract_signatures_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Digital-signature verification (§12.8), zero shuffle: the AcroForm
    walk + ByteRange coverage + CMS digest/RSA verification in one
    mapInPandas — the verdict columns are per-doc scalars, so the plan is
    scan -> kernel -> sink at any corpus size."""
    from ..core.extract import extract_signatures

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "sig_idx", "field", "signer",
            "digest_alg", "key_alg", "coverage_ok", "digest_ok", "sig_ok",
        ]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_signatures(_doc_bytes(spans), password=password)
                for si, field, signer, alg, kalg, cov, dok, sok in res["signatures"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "sig_idx": si,
                            "field": field,
                            "signer": signer,
                            "digest_alg": alg,
                            "key_alg": kalg,
                            "coverage_ok": cov,
                            "digest_ok": dok,
                            "sig_ok": sok,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, sig_idx int, field string, signer string, "
            "digest_alg string, key_alg string, coverage_ok boolean, digest_ok boolean, "
            "sig_ok boolean"
        ),
    )


def extract_markup_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Markup annotations (§12.5.6), zero shuffle: the /Annots walk plus
    the /QuadPoints-to-layout geometric join in one mapInPandas — the
    highlighted TEXT is recovered per document, so no cross-doc data
    movement exists at any corpus size."""
    from ..core.extract import extract_markup_annots

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "page_idx", "annot_idx", "subtype",
            "author", "contents", "covered_text",
        ]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_markup_annots(_doc_bytes(spans), password=password)
                for p, ai, sub, author, contents, covered in res["annots"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page_idx": p,
                            "annot_idx": ai,
                            "subtype": sub,
                            "author": author,
                            "contents": contents,
                            "covered_text": covered,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, page_idx int, annot_idx int, subtype string, "
            "author string, contents string, covered_text string"
        ),
    )


def extract_revisions_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Incremental-update revision history (§7.5.6), zero shuffle: the
    xref /Prev chain replayed oldest-first per document — kind, visible
    object count under the prefix merge, and the ids each revision
    changed.  The PDF-side analog of the snapshot log's changes() feed."""
    from ..core.extract import extract_revisions

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "rev_idx", "kind", "n_objects", "changed"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_revisions(_doc_bytes(spans), password=password)
                for rev_idx, kind, n_objects, changed in res["revisions"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "rev_idx": rev_idx,
                            "kind": kind,
                            "n_objects": n_objects,
                            "changed": changed,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, rev_idx int, kind string, n_objects int, changed string",
    )


def extract_xmp_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """XMP metadata mining (§14.3.2), zero shuffle beyond the leveling
    repartition: one row per document that carries a /Metadata packet."""
    from ..core.extract import extract_xmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "xmp_title", "creator_tool"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_xmp(_doc_bytes(spans), password=password)
                if res["has_xmp"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "xmp_title": res["title"],
                            "creator_tool": res["creator_tool"],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run, schema="doc_id long, xmp_title string, creator_tool string"
    )


def extract_rewrite_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Rewrite FIXPOINT, zero shuffle: extract -> serialize the spans
    back to a fresh PDF (core/writer.py) -> extract the rewritten bytes.
    Output rows equal plain extraction's (same span oracle), so a green
    row proves the writer emits documents the kernel fully agrees with —
    the transformation-pipeline primitive (scrub/edit spans, re-emit)."""
    from ..core.extract import extract_spans
    from ..core.writer import write_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "kind", "text", "media_ref"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                # odd docs rewrite in the modern xref-STREAM form, every
                # third with Flate-compressed content streams — all
                # writer formats must re-extract identically
                again = extract_spans(
                    write_pdf(first["spans"], xref_stream=doc_id % 2 == 1,
                              objstm=doc_id % 4 == 3,
                              compress=doc_id % 3 == 0)
                )
                for ordn, (kind, text, media_ref) in enumerate(again["spans"]):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run, schema="doc_id long, ord int, kind string, text string, media_ref string"
    )


def extract_tagged_rewrite_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """TAGGED-output writer roundtrip, zero shuffle: extract -> serialize
    with ``write_pdf(tagged=True, lang=...)`` (one /P StructElem per
    text page, /ParentTree, catalog /Lang) -> re-extract through the
    STRUCTURE-TREE kernel.  The tagged read of the tagged write must
    recover every text span in order with struct_type 'P' and the
    written language — the PDF/UA-shaped authoring primitive an
    accessibility/remediation pipeline needs.  ``lang`` cycles the
    synth TAG_LANGS by doc%3 so the channel is per-doc observable."""
    from ..core.extract import extract_spans, extract_tagged_spans
    from ..core.writer import write_pdf
    from ..synth import TAG_LANGS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "page_idx", "struct_type", "lang", "text"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                again = extract_tagged_spans(
                    write_pdf(
                        first["spans"],
                        tagged=True,
                        lang=TAG_LANGS[int(doc_id) % 3],
                        xref_stream=doc_id % 2 == 1,
                    )
                )
                for page_idx, ordn, stype, lg, txt in again["spans"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "struct_type": stype,
                            "lang": lg,
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, ord int, page_idx int, struct_type string, "
            "lang string, text string"
        ),
    )


def extract_tagged_fixpoint_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Structure-PRESERVING re-emission fixpoint, zero shuffle: tagged
    extraction -> ``write_tagged_page`` (each element's /S role and
    /Lang override re-authored verbatim, artifact rows drawn unmarked)
    -> tagged re-extraction.  Output rows equal the first extraction's
    (the extract_tagged_order oracle), proving the writer round-trips
    the full structure channel, not just text.  The document default
    language is recovered from the artifact rows (they speak it) or the
    first tagged row."""
    from ..core.extract import extract_tagged_spans
    from ..core.writer import write_tagged_page

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "page_idx", "struct_type", "lang", "text"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_tagged_spans(_doc_bytes(spans), password=password)
                seq = [(st, lg, t) for (_p, _o, st, lg, t) in first["spans"]]
                un = [lg for (st, lg, _t) in seq if st is None]
                base = un[0] if un else (seq[0][1] if seq else None)
                again = extract_tagged_spans(
                    write_tagged_page(seq, base_lang=base, xref_stream=doc_id % 2 == 1)
                )
                for page_idx, ordn, stype, lg, txt in again["spans"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "struct_type": stype,
                            "lang": lg,
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, ord int, page_idx int, struct_type string, "
            "lang string, text string"
        ),
    )


def extract_linearized_roundtrip_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """Linearization round-trip, zero shuffle: extract -> serialize the
    spans in the Annex F "fast web view" layout
    (`core.writer._serialize_linearized`) -> VALIDATE the linearization
    parameters against the produced bytes (`extract_linearization`:
    /L /H /O /T /N checked, not trusted) -> re-extract.  Span rows must
    equal plain extraction's and every check must hold, so one green
    row proves both the byte-range-servable layout and the validator —
    the streaming-delivery write shape."""
    from ..core.extract import extract_linearization, extract_spans
    from ..core.writer import write_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "ord", "kind", "text", "media_ref",
            "linearized", "l_ok", "n_ok", "o_ok", "t_ok", "h_ok",
        ]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                lb = write_pdf(first["spans"], linearized=True)
                flags = extract_linearization(lb)
                again = extract_spans(lb)
                for ordn, (kind, text, media_ref) in enumerate(again["spans"]):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                            "linearized": flags["linearized"],
                            "l_ok": flags["l_ok"],
                            "n_ok": flags["n_ok"],
                            "o_ok": flags["o_ok"],
                            "t_ok": flags["t_ok"],
                            "h_ok": flags["h_ok"],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, kind string, text string, media_ref string, "
        "linearized boolean, l_ok boolean, n_ok boolean, o_ok boolean, "
        "t_ok boolean, h_ok boolean",
    )


def extract_redact_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """REDACTION round-trip, zero shuffle: extract -> scrub PII from the
    span text with the SAME RE2-safe patterns the curation tier and the
    oracle share (email -> phone -> ip, fixed order) -> serialize the
    scrubbed spans back to a PDF (core/writer.py) -> extract the
    redacted document.  The output must equal the span oracle with the
    scrub applied — the end-to-end right-to-be-forgotten shape for
    document corpora (the redacted artifact is a REAL document again,
    not a text column)."""
    import re as _re

    from ..core.extract import extract_spans
    from ..core.writer import write_pdf
    from ..textops.curation import EMAIL_RE, IPV4_RE, PHONE_RE

    subs = [(_re.compile(p), r) for p, r in
            ((EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>"))]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "kind", "text", "media_ref"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                scrubbed = []
                for kind, text, media_ref in first["spans"]:
                    if kind == "text" and text:
                        for rx, repl in subs:
                            text = rx.sub(repl, text)
                    scrubbed.append((kind, text, media_ref))
                again = extract_spans(
                    write_pdf(scrubbed, xref_stream=doc_id % 2 == 1, objstm=doc_id % 4 == 3)
                )
                for ordn, (kind, text, media_ref) in enumerate(again["spans"]):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run, schema="doc_id long, ord int, kind string, text string, media_ref string"
    )


def extract_font_inventory_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """Embedded-font inventory, zero shuffle: every page font reported
    with its §9.9 embedding form and the PARSED program's glyph count +
    space width (core.extract.extract_font_programs) — the corpus font
    forensics a rendering/compliance pipeline runs before committing to
    a font strategy."""
    from ..core.extract import extract_font_programs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "page_idx", "font_name", "subtype",
            "program", "n_glyphs", "w_space",
        ]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_font_programs(_doc_bytes(spans), password=password)
                for p, fname, sub, prog, n, w32 in res["fonts"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page_idx": int(p),
                            "font_name": fname,
                            "subtype": sub,
                            "program": prog,
                            "n_glyphs": int(n),
                            "w_space": int(w32) if w32 is not None else None,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, page_idx int, font_name string, subtype string, "
            "program string, n_glyphs int, w_space int"
        ),
    )


def extract_encrypt_rewrite_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """ENCRYPTED-rewrite fixpoint, zero shuffle: extract -> serialize the
    spans back under the standard security handler (core/writer.py
    ``encrypt=``; even docs V2/R3 128-bit RC4, odd docs V5/R6 AESV3-256,
    serialization form cycling classic / xref-stream / ObjStm by
    doc_id%3) -> re-extract WITH the password.  Rows equal plain
    extraction's (same span oracle), so a green row proves the writer's
    Algorithm 2/3/5 (+ 2.B/8/9/10) entries agree with the reader's
    decryptor end-to-end.  A wrong-password probe per doc must yield
    ZERO spans — asserted in-kernel (a poison row would break the
    oracle), so ciphertext secrecy is part of the checked contract."""
    from ..core.extract import extract_spans
    from ..core.writer import write_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "kind", "text", "media_ref"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                # password + seed are CORPUS-SHARED on purpose: R6 key
                # derivation (Algorithm 2.B) costs ~2.5 s per distinct
                # (pwd, salt) pair in pure Python, and crypt.hash_2b
                # memoizes per worker process — shared salts amortize it
                # to a one-time cost per executor (same trade the
                # protected synth family makes)
                pwd = b"hunter2-rw"
                enc = write_pdf(
                    first["spans"],
                    xref_stream=doc_id % 3 == 1,
                    objstm=doc_id % 3 == 2,
                    encrypt={
                        "mode": "aes256" if doc_id % 2 else "rc4",
                        "user_pwd": pwd,
                        "seed": b"encrw",
                    },
                )
                locked = extract_spans(enc, strict=False, password=b"not-the-key")
                again = extract_spans(enc, password=pwd)
                spans_out = again["spans"] if not locked["spans"] else [
                    ("text", "!CIPHERTEXT-LEAKED!", None)
                ]
                for ordn, (kind, text, media_ref) in enumerate(spans_out):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run, schema="doc_id long, ord int, kind string, text string, media_ref string"
    )


def extract_portfolio_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """PDF-inside-PDF container round-trip, zero shuffle: each document's
    RAW BYTES are embedded as a §7.11 file attachment inside a freshly
    written one-page carrier (write_pdf ``attachments=`` — /EmbeddedFile
    stream -> /Filespec -> catalog /Names /EmbeddedFiles), plus a decoy
    text attachment so the name tree holds >1 key; the kernel then walks
    the carrier's name tree, decodes the payload, and RECURSIVELY runs
    plain extraction on the inner document.  Output rows = the inner
    document's spans — the UNCHANGED span oracle is green only if writer
    name-tree emission, attachment decode, and the recursive kernel all
    agree (the portfolio/e-mail-archive ingestion shape)."""
    from ..core.extract import extract_attachments, extract_spans
    from ..core.writer import write_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "kind", "text", "media_ref"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                inner_bytes = _doc_bytes(spans)
                carrier = write_pdf(
                    [("text", "portfolio %d" % doc_id, None)],
                    xref_stream=doc_id % 2 == 1,
                    objstm=doc_id % 4 == 3,
                    attachments=[
                        ("doc%d.pdf" % doc_id, inner_bytes),
                        ("notes.txt", b"carrier for %d" % doc_id),
                    ],
                )
                atts = extract_attachments(carrier, with_payload=True)
                inner = next(
                    (pl for _i, nm, _sz, _md5, pl in atts["attachments"]
                     if nm.endswith(".pdf") and pl is not None),
                    None,
                )
                spans_out = (
                    extract_spans(inner, password=password)["spans"]
                    if inner is not None
                    else [("text", "!ATTACHMENT-LOST!", None)]
                )
                for ordn, (kind, text, media_ref) in enumerate(spans_out):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run, schema="doc_id long, ord int, kind string, text string, media_ref string"
    )


def extract_merge_pairs_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """Document MERGE (the pdftk/qpdf concat shape): documents pair up by
    ``pair_id = doc_id // 2``, each pair's members are extracted, their
    span lists concatenated in doc_id order, written as ONE merged PDF
    (core/writer.py), and the merged bytes re-extracted.  Output rows key
    on pair_id; the oracle renumbers the same spans with a window over
    (doc_id, ord) — green only if the merged document preserves every
    span of both inputs in order.

    The one exchange here is inherent: merging is a CROSS-document
    operation, so bytes must co-locate by pair.  Pair keys are uniform
    (doc_id//2), each group is exactly 1-2 docs — no skew, and the
    shuffle payload is the raw doc bytes themselves (no amplification).
    At 1000 executors this is hash-partition + per-pair kernel work."""
    import pyspark.sql.functions as F

    from ..core.extract import extract_spans
    from ..core.writer import write_pdf

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["pair_id", "ord", "kind", "text", "media_ref"]
        rows = []
        for pair_id, grp in pdf.groupby("pair_id"):
            grp = grp.sort_values("doc_id")
            spans_all = []
            for _, r in grp.iterrows():
                spans_all.extend(
                    extract_spans(_doc_bytes(r["spans"]), password=password)["spans"]
                )
            merged = write_pdf(
                spans_all,
                xref_stream=pair_id % 2 == 1,
                objstm=pair_id % 4 == 3,
            )
            again = extract_spans(merged)
            for ordn, (kind, text, media_ref) in enumerate(again["spans"]):
                rows.append(
                    {
                        "pair_id": int(pair_id),
                        "ord": ordn,
                        "kind": kind,
                        "text": text,
                        "media_ref": media_ref,
                    }
                )
        return pd.DataFrame(rows, columns=cols)

    paired = documents_raw.withColumn(
        "pair_id", F.floor(F.col("doc_id") / 2).cast("long")
    )
    return paired.groupBy("pair_id").applyInPandas(
        merge,
        schema="pair_id long, ord int, kind string, text string, media_ref string",
    )


def extract_incremental_redact_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """Incremental-update round-trip, zero shuffle: extract -> serialize
    (core/writer.py) -> APPEND a one-page redaction as an incremental
    revision (§7.5.6: original bytes untouched, new xref section with
    /Prev) -> extract the updated file AND replay its revision chain.
    The first text span must come back as [REDACTED] with every other
    span intact, and extract_revisions must see exactly two revisions —
    the minimal-edit write path paired with its own forensics."""
    from ..core.extract import extract_revisions, extract_spans
    from ..core.writer import redact_first_text_incremental, write_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "kind", "text", "media_ref", "n_revisions"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                base = write_pdf(first["spans"], xref_stream=doc_id % 2 == 1)
                # every 4th+2 doc appends the revision in the MODERN
                # xref-STREAM form (same chain semantics, §7.5.8)
                upd = redact_first_text_incremental(
                    base, first["spans"], xref_stream=doc_id % 4 == 2
                )
                again = extract_spans(upd)
                nrev = len(extract_revisions(upd)["revisions"])
                for ordn, (kind, text, media_ref) in enumerate(again["spans"]):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                            "n_revisions": nrev,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, ord int, kind string, text string, "
            "media_ref string, n_revisions int"
        ),
    )


def extract_with_headers_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """Layout extraction of documents that CARRY running headers, zero
    shuffle: layout-extract -> stamp ``CONFIDENTIAL-<doc_id>`` at
    (72, 780) on EVERY page (geometry-preserving layout writer) ->
    re-extract.  Feed for :func:`textops.furniture.strip_page_furniture`
    — multi-page docs repeat the header (furniture), single-page docs
    show it once (content, by the >=2-pages rule).  Emits the layout
    schema (doc_id, ord, page_idx, x, y, text)."""
    from ..core.extract import extract_layout_spans
    from ..core.writer import write_pdf_layout

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "page_idx", "x", "y", "text"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_layout_spans(_doc_bytes(spans), password=password)
                body = [(p, x, y, t) for p, x, y, t, _sz in first["spans"]]
                pages = sorted({p for p, _x, _y, _t in body}) or [0]
                hdr = [(p, 72.0, 780.0, "CONFIDENTIAL-%d" % doc_id) for p in pages]
                stamped = write_pdf_layout(
                    hdr + body,
                    xref_stream=doc_id % 2 == 1,
                    objstm=doc_id % 4 == 3,
                )
                again = extract_layout_spans(stamped)
                ordered = sorted(
                    enumerate(again["spans"]),
                    key=lambda e: (e[1][0], -e[1][2], e[1][1], e[0]),
                )
                for ordn, (_i, (page_idx, x, y, txt, _size)) in enumerate(ordered):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, text string",
    )


def extract_apply_redactions_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """The §12.5.4.5 two-phase redaction workflow in one Arrow kernel,
    zero shuffle: layout-extract -> MARK page ``doc_id % n_pages`` with
    an inline /Redact annotation whose quad brackets that page's line
    origin (writer ``page_annots`` hook) -> APPLY the marks
    (core/redact.py: covered spans removed, marks deleted) -> re-extract
    the sanitized bytes.  Output = the layout rows MINUS the redacted
    page's line; the kernel decides by GEOMETRY (quad containment), the
    oracle by doc_id arithmetic — they agree only if the quad math is
    right.  The sanitized bytes are also probed for the removed text —
    a leak poisons the row so the oracle catches it."""
    from ..core.extract import extract_layout_spans
    from ..core.redact import apply_redactions, redact_mark
    from ..core.writer import write_pdf_layout

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "page_idx", "x", "y", "text"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_layout_spans(_doc_bytes(spans), password=password)
                r = doc_id % (1 + doc_id % 3)
                marked = write_pdf_layout(
                    [(p, x, y, t) for p, x, y, t, _sz in first["spans"]],
                    xref_stream=doc_id % 2 == 1,
                    objstm=doc_id % 4 == 3,
                    page_annots={int(r): [redact_mark(70, 714 - 14 * r, 300, 726 - 14 * r)]},
                )
                res = apply_redactions(marked)
                again = extract_layout_spans(res["bytes"])
                # in-kernel guard: NOTHING may survive inside the marked
                # quad, and the marks themselves must be gone
                leaked = b"/Redact" in res["bytes"] or any(
                    p == r and 714 - 14 * r <= y <= 726 - 14 * r and 70 <= x <= 300
                    for p, x, y, _t, _s in again["spans"]
                )
                ordered = sorted(
                    enumerate(again["spans"]),
                    key=lambda e: (e[1][0], -e[1][2], e[1][1], e[0]),
                )
                for ordn, (_i, (page_idx, x, y, txt, _size)) in enumerate(ordered):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "text": "!REDACTION-LEAKED!" if leaked else txt,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, text string",
    )


def extract_layout_rewrite_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Layout-preserving rewrite fixpoint, zero shuffle: layout-extract ->
    write_pdf_layout (each span re-shown at its origin) -> layout-extract
    the rewritten bytes, re-ranked exactly like extract_layout_fused.
    Green against the UNCHANGED layout oracle = the writer preserves
    geometry, not just text."""
    from ..core.extract import extract_layout_spans
    from ..core.writer import write_pdf_layout

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "page_idx", "x", "y", "text"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_layout_spans(_doc_bytes(spans), password=password)
                rewritten = write_pdf_layout(
                    [(p, x, y, t) for p, x, y, t, _sz in first["spans"]],
                    xref_stream=doc_id % 2 == 1,
                    objstm=doc_id % 4 == 3,
                )
                again = extract_layout_spans(rewritten)
                ordered = sorted(
                    enumerate(again["spans"]),
                    key=lambda e: (e[1][0], -e[1][2], e[1][1], e[0]),
                )
                for ordn, (_i, (page_idx, x, y, txt, _size)) in enumerate(ordered):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "page_idx": page_idx,
                            "x": float(x),
                            "y": float(y),
                            "text": txt,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=cols
            )

    return documents_raw.mapInPandas(
        run,
        schema="doc_id long, ord int, page_idx int, x double, y double, text string",
    )


def extract_sign_roundtrip_fused(
    documents_raw: DataFrame, password: bytes = b""
) -> DataFrame:
    """Writer-side DIGITAL SIGNING round trip, zero shuffle: extract ->
    serialize the spans (form cycling classic / xref-stream / ObjStm by
    doc%3) -> `core.writer.sign_pdf_incremental` (ECDSA P-256 on odd
    docs, RSA on even; revision form xref-stream on doc%4==3) ->
    re-verify with `extract_signatures` AND re-extract the spans.  Span
    rows must equal plain extraction's and every verdict must hold —
    verification failures poison the row set instead of dropping rows,
    so the oracle observes them."""
    from ..core.extract import extract_signatures, extract_spans
    from ..core.writer import sign_pdf_incremental, write_pdf
    from ..synth import SIG_D, SIG_E, SIG_EC_D, SIG_N

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "ord", "kind", "text", "media_ref",
            "key_alg", "coverage_ok", "digest_ok", "sig_ok",
        ]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                base = write_pdf(
                    first["spans"],
                    xref_stream=doc_id % 3 == 1,
                    objstm=doc_id % 3 == 2,
                )
                if doc_id % 2:
                    signed = sign_pdf_incremental(
                        base, ec_d=SIG_EC_D, cn="pdfspark signer",
                        xref_stream=doc_id % 4 == 3,
                    )
                else:
                    signed = sign_pdf_incremental(
                        base, rsa=(SIG_N, SIG_E, SIG_D), cn="pdfspark signer",
                    )
                ver = extract_signatures(signed)
                again = extract_spans(signed)
                ok = (
                    len(ver["signatures"]) == 1
                    and ver["signatures"][0][5] is True   # coverage_ok
                    and ver["signatures"][0][6] is True   # digest_ok
                    and ver["signatures"][0][7] is True   # sig_ok
                )
                spans_out = again["spans"] if ok else [
                    ("text", "!SIGNATURE-INVALID!", None)
                ]
                kalg = ver["signatures"][0][4] if ver["signatures"] else None
                for ordn, (kind, text, media_ref) in enumerate(spans_out):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                            "key_alg": kalg,
                            "coverage_ok": ok,
                            "digest_ok": ok,
                            "sig_ok": ok,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, ord int, kind string, text string, media_ref string, "
            "key_alg string, coverage_ok boolean, digest_ok boolean, sig_ok boolean"
        ),
    )


def extract_inline_images_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """Inline-image pixels (§8.9.7), zero shuffle: BI..ID..EI parse +
    abbreviated filter fold + raster decode per page
    (`core.extract.extract_inline_pixels`)."""
    from ..core.extract import extract_inline_pixels

    schema = "doc_id long, page_idx int, img_idx int, width int, height int, pixel_sum long"
    cols = [f.split(" ")[0] for f in schema.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                res = extract_inline_pixels(_doc_bytes(spans), password=password)
                for page_idx, img_idx, w, h, psum in res["images"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "page_idx": page_idx,
                            "img_idx": img_idx,
                            "width": w,
                            "height": h,
                            "pixel_sum": psum,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(run, schema=schema)


def extract_repair_roundtrip_fused(documents_raw: DataFrame, password: bytes = b"") -> DataFrame:
    """PDF REPAIR, zero shuffle: extract from DAMAGED bytes (footer-cut
    recovery scan, catalog-loss orphan-page scan, xref offset-slop
    re-sync) -> re-serialize the recovered spans with the writer -> the
    repaired document must re-extract with ZERO error rows and identical
    spans.  ``had_errors`` reports whether extraction logged error rows
    (catalog-loss/slop repairs and dangling refs do; the footer-cut
    recovery scan rebuilds silently inside read_xref — documented);
    ``clean`` must be TRUE on every row — a dirty rewrite poisons the
    rows instead of dropping them."""
    from ..core.extract import extract_spans
    from ..core.writer import write_pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "ord", "kind", "text", "media_ref", "had_errors", "clean"]
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                first = extract_spans(_doc_bytes(spans), password=password)
                repaired = write_pdf(first["spans"], xref_stream=doc_id % 3 == 1)
                again = extract_spans(repaired)
                clean = again["errors"] == [] and again["spans"] == first["spans"]
                spans_out = again["spans"] if clean else [
                    ("text", "!REPAIR-DIVERGED!", None)
                ]
                for ordn, (kind, text, media_ref) in enumerate(spans_out):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "ord": ordn,
                            "kind": kind,
                            "text": text,
                            "media_ref": media_ref,
                            "had_errors": bool(first["errors"]),
                            "clean": clean,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return documents_raw.mapInPandas(
        run,
        schema=(
            "doc_id long, ord int, kind string, text string, media_ref string, "
            "had_errors boolean, clean boolean"
        ),
    )
