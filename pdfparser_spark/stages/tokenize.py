"""Stage 2 — tokenize.

Input:  DECODED rows with rtype='content' (decoded content-stream bytes).
Output: TOKENS — postfix-machine events in byte order per stream.

This is the content-stream operator layer the reference only sketched
(StreamType::Content pdf_file.rs:705, design notes temp.rs:35-65; SURVEY.md
§2.7): Tj/TJ/'/" text-show operators carrying their raw operand bytes and
the active /Tf font, and Do XObject placements.  Each content stream is
independent, so this stage is embarrassingly parallel — no shuffle is
introduced (narrow mapInPandas over the pruned content columns).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import json

from ..core.content import tokenize_content
from ..core.extract import KERN_SPACE_THRESHOLD
from ..schema import TOKENS

_COLS = [f.name for f in TOKENS.fields]


ATEXT_FONT = "__atext__"  # sentinel font: classify decodes as PDF text string


def tokenize(decoded: DataFrame) -> DataFrame:
    # the content row's ``encoding`` column carries the page's switched-off
    # OCG property names (JSON list, decode stage) — /OC regions naming
    # them are suppressed here, exactly like the fused kernel
    content = decoded.filter(F.col("rtype") == "content").select(
        "doc_id", "page_idx", "seq", "data", "encoding"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, page_idx, seq, data, hidden_json in zip(
                pdf["doc_id"], pdf["page_idx"], pdf["seq"], pdf["data"], pdf["encoding"]
            ):
                hidden = None
                gs_fonts = None
                if isinstance(hidden_json, str) and hidden_json:
                    payload = json.loads(hidden_json)
                    if isinstance(payload, dict):
                        # extended channel: {"hidden": [...], "gs": {name: size}}
                        hidden = frozenset(payload.get("hidden") or []) or None
                        gs_fonts = payload.get("gs") or None
                    else:
                        hidden = frozenset(payload)
                for ev_idx, ev in enumerate(
                    tokenize_content(
                        bytes(data), hidden_props=hidden, gs_fonts=gs_fonts
                    )
                ):
                    if ev[0] == "atext":
                        # /ActualText replacement: not font-encoded — route
                        # to classify's PDF-text-string arm via the
                        # sentinel font name (which matches no font row)
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "page_idx": int(page_idx),
                                "seq": int(seq),
                                "ev_idx": ev_idx,
                                "ev_type": "text",
                                "font_name": ATEXT_FONT,
                                "operand": ev[3],
                            }
                        )
                    elif ev[0] in ("media", "inline"):
                        # inline images carry the INLINE_MEDIA_REF sentinel
                        # as their media_name; classify resolves real names
                        # against /XObject and exempts the sentinel from the
                        # dangling-reference anti-join
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "page_idx": int(page_idx),
                                "seq": int(seq),
                                "ev_idx": ev_idx,
                                "ev_type": "media",
                                "media_name": ev[2],
                            }
                        )
                    else:
                        breaks = None
                        if ev[0] == "text":
                            operand = ev[3]
                        else:
                            # TJ array: join string elements; record the
                            # byte offset of every kern at/beyond the
                            # word-break threshold so classify re-inserts
                            # the implied space (kern-positioned writers
                            # emit no space glyphs — see core/extract.py)
                            segs: list[bytes] = []
                            offs: list[int] = []
                            n = 0
                            for x in ev[3]:
                                if isinstance(x, (bytes, bytearray)):
                                    segs.append(bytes(x))
                                    n += len(x)
                                elif (
                                    isinstance(x, (int, float))
                                    and x <= KERN_SPACE_THRESHOLD
                                ):
                                    offs.append(n)
                            operand = b"".join(segs)
                            breaks = offs or None
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "page_idx": int(page_idx),
                                "seq": int(seq),
                                "ev_idx": ev_idx,
                                "ev_type": "text",
                                "font_name": ev[2],
                                "operand": operand,
                                "break_offsets": breaks,
                            }
                        )
            out = pd.DataFrame(rows).reindex(columns=_COLS)
            # reindex fills missing keys with NaN; Arrow needs None for a
            # null array<int> value
            col = out["break_offsets"]
            out["break_offsets"] = col.astype(object).where(col.notna(), None)
            yield out

    return content.mapInPandas(run, schema=TOKENS)
