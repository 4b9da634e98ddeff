"""Stage 1 — decode.

Input:  ``documents_raw(doc_id, spans)`` (interleaved text+media spans).
Output: flat DECODED rows per doc:
    rtype='meta'    version + n_objects/n_pages/n_streams   (lineage/metrics)
    rtype='content' (page_idx, seq, data=decoded bytes)     -> tokenize
    rtype='font'    (page_idx, font_name, data=CMap, encoding) -> classify
    rtype='xobj'    (page_idx, media_name)                  -> classify join
    rtype='error'   (error_kind, stage, detail)             -> metrics

Covers reference operators S1-S2, L1-L4, T1-T12, A1-A4, D1-D9 (SURVEY.md
§2): whole-doc reconstruction, version sniff, trailer/xref resolution
(classic + stream + /Prev), parse-all objects, filter decode with
spec-correct Flate/LZW/AHx/A85 and media routing.  Sequential per document,
vectorized across the documents of each Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core.extract import decode_document
from ..schema import DECODED

_COLS = [f.name for f in DECODED.fields]


def _rows_for_doc(doc_id: int, spans) -> list[dict]:
    # reconstruct: text-bearing spans concatenate in offset order (media
    # markers are zero-width); latin-1 is byte-faithful for ASCII-armored docs.
    # NULL spans (malformed upstream row) -> empty doc, never a task failure
    if spans is None:
        spans = []
    parts = sorted((s for s in spans if s["text"] is not None), key=lambda s: s["offset"])
    data = "".join(s["text"] for s in parts).encode("latin-1")

    d = decode_document(data)
    rows: list[dict] = [
        {
            "doc_id": doc_id,
            "rtype": "meta",
            "version": d["version"],
            "n_objects": d["n_objects"],
            "n_pages": d["n_pages"],
            "n_streams": d["n_streams"],
        }
    ]
    for page_idx, seq, payload, hidden_json in d["contents"]:
        # content rows reuse the (font-row) ``encoding`` column to carry the
        # page's switched-off OCG property names to the tokenize stage
        rows.append(
            {
                "doc_id": doc_id,
                "rtype": "content",
                "page_idx": page_idx,
                "seq": seq,
                "data": payload,
                "encoding": hidden_json,
            }
        )
    for page_idx, fname, cmap, enc in d["fonts"]:
        rows.append(
            {
                "doc_id": doc_id,
                "rtype": "font",
                "page_idx": page_idx,
                "font_name": fname,
                "data": cmap,
                "encoding": enc,
            }
        )
    for page_idx, xname in d["xobjs"]:
        rows.append({"doc_id": doc_id, "rtype": "xobj", "page_idx": page_idx, "media_name": xname})
    for kind, stage, detail in d["errors"]:
        rows.append(
            {"doc_id": doc_id, "rtype": "error", "error_kind": kind, "stage": stage, "detail": detail[:500]}
        )
    return rows


def decode(documents_raw: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                rows.extend(_rows_for_doc(int(doc_id), spans))
            out = pd.DataFrame(rows)
            yield out.reindex(columns=_COLS)

    return documents_raw.mapInPandas(run, schema=DECODED)
