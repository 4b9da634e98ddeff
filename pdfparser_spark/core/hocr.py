"""hOCR export of word geometry (the public hOCR 1.2 embedded-OCR
format: ``ocr_page`` / ``ocrx_word`` classes with ``title``-encoded
properties).  The glyph-advance kernel recovers exact word boxes from
the vector text (`extract_advance_spans(with_width=True)`); this module
serializes them to the format OCR pipelines exchange — and parses them
back, so the export round-trips through the SAME lenient HTML parser
the curation tier uses (`textops.dom.parse_html`), an internal interop
check rather than a write-only emitter.

Coordinate convention: hOCR boxes are integer pixels, top-left origin.
We emit MICRO-POINTS (1e-5 pt) as the pixel unit — hOCR is explicitly
unit-agnostic — so every coordinate is an exact integer (no float in
the serialized form).  Engine-specific ``title`` properties (the spec's
``x_*`` extension namespace): ``x_origin`` carries the line-origin x
the advance cursor is relative to (vertical CID text puts word x0 LEFT
of the origin, so it is not recoverable from the box alone), ``x_size``
the font size, ``x_mode`` the Tr render mode (3 = invisible OCR ink —
the convention hOCR itself exists to serve).
"""

from __future__ import annotations

PAGE_H_MICRO = 792 * 100_000  # US-Letter height in micro-points


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def words_to_hocr(words) -> str:
    """``words`` = iterable of (page_idx, x, y, ax_micro, w_micro, text,
    size, mode) — the extract_word_boxes row shape — in reading order.
    Returns one hOCR document string."""
    pages: dict[int, list] = {}
    for page_idx, x, y, ax, w, text, size, mode in words:
        pages.setdefault(int(page_idx), []).append((x, y, ax, w, text, size, mode))
    out = [
        "<?xml version='1.0' encoding='UTF-8'?>\n"
        "<html xmlns='http://www.w3.org/1999/xhtml'>\n<head>\n"
        "<meta name='ocr-system' content='pdfparser-spark'/>\n"
        "<meta name='ocr-capabilities' content='ocr_page ocrx_word'/>\n"
        "</head>\n<body>\n"
    ]
    wid = 0
    for p in sorted(pages):
        out.append(
            f"<div class='ocr_page' id='page_{p + 1}' "
            f"title='bbox 0 0 {612 * 100_000} {PAGE_H_MICRO}'>\n"
        )
        for x, y, ax, w, text, size, mode in pages[p]:
            xo = round(x * 100_000)
            yb = round(y * 100_000)
            # NOTE: vertical CID text has a negative advance, so x1 < x0
            # there — kept RAW (not normalized) so the parse recovers the
            # signed cursor exactly; documented deviation from the
            # min/max box convention
            y0 = PAGE_H_MICRO - yb - round(size * 100_000)
            y1 = PAGE_H_MICRO - yb
            wid += 1
            out.append(
                f"<span class='ocrx_word' id='word_{wid}' "
                f"title='bbox {xo + int(ax)} {y0} {xo + int(ax) + int(w)} {y1}; "
                f"x_origin {xo}; x_size {round(size * 100_000)}; "
                f"x_mode {int(mode)}'>{_esc(text)}</span>\n"
            )
        out.append("</div>\n")
    out.append("</body>\n</html>\n")
    return "".join(out)


def _title_props(title: str) -> dict:
    props: dict = {}
    for part in title.split(";"):
        toks = part.split()
        if toks:
            props[toks[0]] = toks[1:]
    return props


def hocr_to_words(src: str) -> list:
    """Parse an hOCR document back to (page_idx, x, y, ax_micro, w_micro,
    text, size, mode) rows in document order, using the SAME lenient
    HTML parser as the curation tier.  Elements with missing/corrupt
    titles are skipped (lenient, like every reader here)."""
    from ..textops.dom import Elem, node_text, parse_html

    words: list = []
    stack = [(parse_html(src), None)]
    while stack:
        nd, page = stack.pop()
        if not isinstance(nd, Elem):
            continue
        cls = nd.attrs.get("class", "")
        if "ocr_page" in cls:
            pid = nd.attrs.get("id", "")
            try:
                page = int(pid.rsplit("_", 1)[1]) - 1
            except (IndexError, ValueError):
                page = None
        if "ocrx_word" in cls and page is not None:
            try:
                pr = _title_props(nd.attrs.get("title", ""))
                bx0, _y0, bx1, y1 = (int(v) for v in pr["bbox"][:4])
                xo = int(pr["x_origin"][0])
                size_u = int(pr["x_size"][0])
                mode = int(pr["x_mode"][0])
                words.append(
                    (
                        page,
                        xo / 100_000,
                        (PAGE_H_MICRO - y1) / 100_000,
                        bx0 - xo,
                        bx1 - bx0,
                        node_text(nd),
                        size_u / 100_000,
                        mode,
                    )
                )
            except (KeyError, IndexError, ValueError):
                pass  # lenient: a malformed word costs itself
            continue
        for c in reversed(nd.children):
            stack.append((c, page))
    return words
