"""Deterministic interleaved-corpus generator.

Builds real (spec-valid, ASCII-armored) PDF documents from rows of the
driver's ``documents`` table via *SQL-expressible* rules, so the DuckDB
oracle can compute the expected extracted spans analytically while the
Spark pipeline computes them the hard way (reconstruct -> decode ->
tokenize -> classify -> assemble).  Seeded by ``doc_id`` only — no
wall-clock, no RNG (FIXTURES.md §4).

Generation rules (all arithmetic on the integer ``doc_id``):

  n_pages          = 1 + doc_id % 3          (3 pages => 3-level tree, family C)
  page p words     = words[p*8 : (p+1)*8]    (pages with empty slice emit nothing)
  version          = '1.' + str(4 + doc_id % 4)
  xref kind        = classic table if doc_id % 2 == 0 else xref *stream* (family G)
  filter chain     = doc_id % 4: 0 [AHx,Fl] | 1 [A85,Fl] | 2 [AHx,LZW] | 3 [AHx]
                     (ASCII armor keeps every span a valid UTF-8 string)
  font             = ToUnicode CMap 2-byte font if doc_id % 7 == 0 (family H)
                     else simple /Type1 + WinAnsiEncoding
  TJ vs Tj         = page 1 uses a TJ array split after the first word (§2.7)
  octal escapes    = doc_id % 17 == 0: first char of page-0 text as \\ddd (T3)
  media            = doc_id % 5 == 0: image XObject Im1 drawn after page-0 text
                     (family E); expected media span between page 0 and page 1
  dangling Do      = doc_id % 13 == 0: /ImMissing Do with no XObject entry ->
                     media span + ReferenceError metric (family F anti-join)
  indirect /Length = doc_id % 11 == 0 for the page-0 content stream + comment
                     noise (family F; reference pdf_file.rs:647-656)
  links            = doc_id % 6 != 4: 1 + doc_id % 4 page-0 /Annots /Link
                     objects with /A /S /URI actions (host (doc_id+3k) % 5)
  form fields      = doc_id % 4 != 3: /AcroForm with 1 + doc_id % 3 fields
                     (even k /Tx string /V — unset on doc_id%5=1 k=0;
                     odd k /Btn NAME /V) — observed by extract_doc_graph
  field hierarchy  = doc_id % 8 == 1: non-terminal parent + 2 kids with
                     /FT and /V inheritance (+3 objects, §12.7.3.2)
  vector graphics  = every page 0: doc%3 filled rects + doc%4-segment
                     polyline + doc%2 Béziers (gfx_ops; doc_graphics)
  /Info title      = doc%14=5 UTF-16BE hex, doc%14=12 UTF-8-BOM hex,
                     else literal (§7.9.2.2; same text — decode check)
  /CreationDate    = synth_creation_date: short D:YYYYMM on doc%7=2,
                     else full with offset Z/+05'30'/-08'00' by doc%3
  outline /Dest    = item 0 jumps to page doc%n_pages — direct array on
                     even docs, NAMED via /Names /Dests tree on odd;
                     doc%6 in {0,3} writes it as /A << /S /GoTo /D .. >>
                     (§12.6.4.2 action form, the hyperref convention)

Expected spans per doc (ordering key seq = p*10 for page text, 1 for Im1,
1000 for ImMissing; ord = rank of seq):
  [page0 text, (Im1), page1 text, page2 text, (ImMissing)]
"""

from __future__ import annotations

import binascii
import zlib
from base64 import a85encode
from functools import lru_cache

from .core.filters import lzw_encode

WORDS_PER_PAGE = 8


# --------------------------------------------------------------------------
# rule helpers (mirrored 1:1 in the DuckDB oracle SQL — keep in sync with
# __spark_entry__.py oracle_sql())
# --------------------------------------------------------------------------

def doc_rules(doc_id: int) -> dict:
    return {
        "doc_id": doc_id,
        "n_pages": 1 + doc_id % 3,
        "version": f"1.{4 + doc_id % 4}",
        "xref_stream": doc_id % 2 == 1,
        "filter_mode": doc_id % 4,
        "cmap_font": doc_id % 7 == 0,
        "octal": doc_id % 17 == 0,
        "media": doc_id % 5 == 0,
        "dangling": doc_id % 13 == 0,
        "indirect_length": doc_id % 11 == 0,
        # classic-xref docs get an appended incremental update every 19th id
        # (re-written Catalog + second xref with /Prev); output is unchanged
        "incremental": doc_id % 19 == 0 and doc_id % 2 == 0,
        # interactive tier (ISO 32000 §12): page-0 /Annots link annotations
        # with /URI actions on all but every 6th+4 doc, and a catalog
        # /AcroForm with 1 + doc_id % 3 terminal fields on all but every
        # 4th+3 doc — the object-graph arrays the span kernel never touches,
        # observed only by extract_doc_graph (doc_links / doc_form_fields
        # oracles) and by the object_stats count formula
        "links": doc_id % 6 != 4,
        "n_links": 1 + doc_id % 4 if doc_id % 6 != 4 else 0,
        # INTERNAL link annotation (§12.5.6.5 with /Dest instead of an
        # /A action) appended after the URI links on every 10th+8 doc
        # that has an /Annots array: jumps to page doc%n_pages — direct
        # array when doc%4=0, NAMED via the /Names /Dests tree when
        # doc%4=2 (doc%10=8 docs are always even, so the tree never
        # collides with the odd-doc outline name).  +1 object.
        "internal_link": doc_id % 10 == 8 and doc_id % 6 != 4,
        # markup annotations (§12.5.6.4/.10) on every 12th+6 doc: one
        # /Text sticky note + one /Highlight whose /QuadPoints either
        # COVER page 0's text-line origin (doc%24==6) or miss it
        # (doc%24==18) — the quad-to-text geometry test is observable.
        # INLINE dicts inside the /Annots array: zero new objects, so
        # object_stats is untouched; 12th+6 docs always carry links
        # (6 mod 6 = 0), so the array already exists.
        "markup": doc_id % 12 == 6,
        "markup_cover": doc_id % 24 == 6,
        # NESTED outline child (§12.3.3) on every 3rd+1 doc that has at
        # least 2 top-level items (doc%4!=0) and outlines at all
        # (doc%5!=2): item 1 gains ONE child item (/First = /Last,
        # /Count -1 = CLOSED when the doc is even, +1 = open when odd)
        # carrying its own direct /Dest to page (doc+1)%n_pages.  +1
        # object; the flat First->Next metadata walk never visits it —
        # only the depth-first tree walker (extract_outline_tree) does.
        "outl_child": doc_id % 3 == 1 and doc_id % 4 != 0 and doc_id % 5 != 2,
        # XMP metadata stream (§14.3.2) on every 16th+9 doc: the catalog
        # /Metadata points at an uncompressed XML packet carrying
        # dc:title + xmp:CreatorTool; +1 obj +1 stream in object_stats.
        # Observed only by doc_xmp_metadata.
        "xmp": doc_id % 16 == 9,
        "form": doc_id % 4 != 3,
        "n_fields": 1 + doc_id % 3 if doc_id % 4 != 3 else 0,
        # field HIERARCHY (§12.7.3.2) on every 8th+1 doc (always a form
        # doc: 1 mod 4 != 3): one NON-terminal parent (/T grp<doc>, /FT
        # /Tx, /V g<doc> — both inheritable) with two terminal kids —
        # c0 inherits FT AND V from the parent, c1 overrides /V.  The
        # walker must emit fully-qualified names grp<doc>.c0/.c1 with
        # the inherited attributes; +3 objects in object_stats.
        "field_tree": doc_id % 8 == 1,
        # embedded-file attachments (ISO 32000 §7.7.4 name tree + §7.11
        # file specifications) on every 7th+3 doc: 1 + doc_id % 2 files;
        # the 2-file docs route through a /Kids+/Limits intermediate level
        # so the name-tree walk is exercised beyond the flat /Names case
        "attachments": doc_id % 7 == 3,
        "n_attachments": 1 + doc_id % 2 if doc_id % 7 == 3 else 0,
        # /Encoding dictionary with /Differences (§9.6.5.1): every 21st+5
        # doc (never a CMap doc — 5 mod 7 != 0) gets a font whose
        # /Encoding is << /BaseEncoding /WinAnsiEncoding /Differences
        # [142 /e 150 /uni0061 160 /space] >>, and page 0's text writes
        # every e/a/space through the REMAPPED codes as octal escapes
        # (\216 \226 \240).  A decoder ignoring /Differences reads
        # WinAnsi Ž/–/NBSP and fails every span oracle; the AGL
        # identity, uniXXXX, and named-glyph arms are each exercised.
        # Octal-rule docs excluded to keep the escape paths orthogonal.
        "diff_encoding": doc_id % 21 == 5 and doc_id % 17 != 0,
        # ExtGState font selection (§8.4.5 Table 58): every 43rd+21 doc
        # sets page 0's font via ``/GS1 gs`` (an inline /ExtGState whose
        # dict carries /Font [F1 12]) instead of Tf, then applies a
        # font-LESS decoy state ``/GS0 gs`` (alpha only) — a kernel
        # ignoring the /Font entry has no font for page 0 (spans lost),
        # one clobbering on any gs loses it again; zero new objects, so
        # every span/layout oracle doubles as the check.
        "gs_font": doc_id % 43 == 21,
        # /ActualText marked content (§14.9.4): every 23rd+7 doc shows
        # page 0's line as GARBLED glyphs (reversed) wrapped in
        # /Span << /ActualText (true text) >> BDC..EMC — only a kernel
        # honoring the replacement recovers the expected span text, so
        # every span oracle doubles as the check.  Excluded from the
        # cmap/octal/diff-encoding docs to keep the escape and encoding
        # paths orthogonal.
        "actual_text": (
            doc_id % 23 == 7 and doc_id % 21 != 5 and doc_id % 17 != 0 and doc_id % 7 != 0
        ),
        # hidden optional-content layer (§8.11): every 29th+11 doc appends
        # a page-0 text block inside /OC /MC9 BDC..EMC whose OCG sits in
        # the catalog's /OCProperties /D /OFF list — it must NOT extract
        # (spans invariant; +1 object in the object_stats formula)
        "ocg_hidden": doc_id % 29 == 11,
        # /Contents ARRAY (§7.8.2): every 31st+13 doc splits page 0's
        # content into TWO streams at a token boundary (right after the
        # first "Tf "); extraction must concatenate the array before
        # tokenizing, so a kernel processing pieces independently loses
        # the split-off positioning/show tail and fails every span
        # oracle.  +1 object and +1 stream in object_stats.
        "split_content": doc_id % 31 == 13,
        # Form XObject tier (ISO 32000 §8.10): every 9th+2 doc (always
        # 3 pages) routes page 1's ENTIRE content through a nested pair of
        # forms — page /Contents is just `q /Fm1 Do Q`, Fm1's stream is
        # `q /Fm2 Do Q`, Fm2 carries the real body.  Each form has a
        # /Matrix translation (form_offsets) compensated by the inner
        # prelude, and Fm2 declares NO /Resources (legacy-writer fallback
        # to the caller's, §8.10.2).  Extracted spans AND layout origins
        # are invariant, so every pre-existing oracle doubles as a
        # form-execution check; only object_stats sees the +2 objects.
        "form_xobject": doc_id % 9 == 2,
        # positioning-operator family for the layout kernel: every page's
        # text-line origin lands at (72, 720 - 14*p) but REACHES it through
        # a different operator path (Td | Tm | Td+Td | Td+TD | Td+TL+')
        # selected by (layout_variant + page_idx) % 5 — see
        # _position_prelude.  Extracted TEXT spans are variant-invariant,
        # so every pre-existing span oracle is unchanged; only the layout
        # query observes (x, y), and it observes the same analytic values
        # for all variants — a kernel that misinterprets any one operator
        # fails the hash.
        "layout_variant": doc_id % 5,
        # vector graphics (ISO 32000 §8.5) on EVERY page 0, after the text
        # block: doc_id % 3 filled rectangles (re f), a doc_id % 4-segment
        # stroked polyline (m l.. S), and doc_id % 2 stroked Béziers
        # (m c S).  Path ops are ordering-only for the text machine, so
        # every span/layout oracle is invariant; only extract_graphics
        # observes the counts (doc_graphics oracle).  Geometry is integral
        # — rect j is (20+j) x (10+2j), so the analytic summed area is
        # 0 / 200 / 452 by doc_id % 3.
        "gfx": (doc_id % 3, doc_id % 4, doc_id % 2),
        # smooth shading (§8.7.4.5) on every 8th+5 doc: page 0 gains an
        # INLINE /Shading resource (zero new objects) — axial (Type 2)
        # or radial (Type 3) by (doc//8)%2 — whose colour function is an
        # inline Type 2 blend between two palette entries, painted by
        # 1 + doc%3 `sh` ops.  Only extract_shadings observes it
        # (doc_shadings oracle); every text oracle is invariant.
        "shading": doc_id % 8 == 5,
        "shading_radial": doc_id % 8 == 5 and (doc_id // 8) % 2 == 1,
        # kern-positioned words (the TeX/InDesign form): every 37th+12 doc
        # writes EVERY page's line as a TJ array whose words are separate
        # string elements separated by a -300 kern and NO space glyphs —
        # the extraction kernels must re-insert the implied word break
        # (KERN_SPACE_THRESHOLD), so every span/layout oracle doubles as
        # the check (expected text is unchanged, WITH spaces).  Page-0
        # special show forms (octal / diff-encoding / ActualText) win over
        # this rule on their pages — handled by branch order in
        # _content_plain, not by exclusions here.
        "kern_words": doc_id % 37 == 12,
    }


# palette of clean 2-decimal colour literals: parsed into the same IEEE
# doubles by Python and DuckDB (the oracle CASTs each to DOUBLE)
SHADING_PALETTE = (
    ("0.2", "0.4", "0.6"),
    ("0.8", "0.1", "0.3"),
    ("0.5", "0.5", "0.25"),
    ("0.9", "0.7", "0.1"),
)


def shading_dict(doc_id: int) -> str:
    """Inline §8.7.4.5 shading dict for the doc%8==5 rule: axial
    (Type 2) or radial (Type 3) by (doc//8)%2, colour function = inline
    Type 2 blend PAL[doc%4] -> PAL[(doc+1)%4], coords doc-derived."""
    c0 = " ".join(SHADING_PALETTE[doc_id % 4])
    c1 = " ".join(SHADING_PALETTE[(doc_id + 1) % 4])
    fn = f"<< /FunctionType 2 /Domain [0 1] /C0 [{c0}] /C1 [{c1}] /N 1 >>"
    if (doc_id // 8) % 2 == 1:
        coords = f"[50 50 0 50 50 {40 + (doc_id % 5) * 10}]"
        return (
            f"<< /ShadingType 3 /ColorSpace /DeviceRGB /Coords {coords} "
            f"/Function {fn} /Extend [true true] >>"
        )
    ax = 100 + (doc_id % 7) * 20
    coords = f"[0 0 {ax} {ax}]"  # diagonal axis: the reported coord_max
    return (
        f"<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords {coords} "
        f"/Function {fn} /Extend [true false] >>"
    )


def gfx_ops(rules: dict) -> str:
    """Deterministic page-0 vector-graphics tail (see doc_rules['gfx'])."""
    nr, nl, nc = rules.get("gfx", (0, 0, 0))
    parts = []
    for j in range(nr):
        parts.append(f" {10 + 30 * j} 40 {20 + j} {10 + 2 * j} re f")
    if nl:
        pts = " ".join(f"{20 + 15 * i} {60 + 7 * i} l" for i in range(1, nl + 1))
        parts.append(f" 20 60 m {pts} S")
    for _ in range(nc):
        parts.append(" 300 50 m 310 60 330 60 340 50 c S")
    return "".join(parts)


def synth_creation_date(doc_id: int) -> str:
    """Deterministic §7.9.4 date string: D:YYYYMM (short form, field
    defaults) on doc%7=2, else the full form with the offset cycling
    Z / +05'30' / -08'00' by doc%3 (mirrored in the doc_dates oracle)."""
    y, mo = 2000 + doc_id % 20, 1 + doc_id % 12
    if doc_id % 7 == 2:
        return f"D:{y:04d}{mo:02d}"
    dy, hh, mi, ss = 1 + doc_id % 27, doc_id % 24, doc_id % 59, doc_id % 58
    tz = ["Z", "+05'30'", "-08'00'"][doc_id % 3]
    return f"D:{y:04d}{mo:02d}{dy:02d}{hh:02d}{mi:02d}{ss:02d}{tz}"


def expected_created_iso(doc_id: int) -> str:
    """ISO-8601 form of synth_creation_date as parse_pdf_date reports it."""
    y, mo = 2000 + doc_id % 20, 1 + doc_id % 12
    if doc_id % 7 == 2:
        return f"{y:04d}-{mo:02d}-01T00:00:00"
    dy, hh, mi, ss = 1 + doc_id % 27, doc_id % 24, doc_id % 59, doc_id % 58
    tz = ["Z", "+05:30", "-08:00"][doc_id % 3]
    return f"{y:04d}-{mo:02d}-{dy:02d}T{hh:02d}:{mi:02d}:{ss:02d}{tz}"


def form_offsets(doc_id: int) -> tuple[int, int, int, int]:
    """(e1, f1, e2, f2): /Matrix translations of the nested Fm1/Fm2 pair.
    Deterministic, mixed-sign, integer — the inner prelude subtracts the
    accumulated (e1+e2, f1+f2) so the line origin stays analytic."""
    return 6 * (doc_id % 5) - 9, -8, 3, doc_id % 7


def page_texts(text: str, n_pages: int) -> list[str]:
    words = text.split(" ")
    out = []
    for p in range(n_pages):
        chunk = words[p * WORDS_PER_PAGE : (p + 1) * WORDS_PER_PAGE]
        out.append(" ".join(chunk))
    return out


def expected_spans(doc_id: int, text: str) -> list[tuple[str, str | None, str | None]]:
    """Analytic ground truth: (kind, text, media_ref) in reading order."""
    r = doc_rules(doc_id)
    seq: list[tuple[int, tuple]] = []
    for p, ptext in enumerate(page_texts(text, r["n_pages"])):
        if ptext:
            seq.append((p * 10, ("text", ptext, None)))
    if r["media"]:
        seq.append((1, ("media", None, "Im1")))
    if r["dangling"]:
        seq.append((1000, ("media", None, "ImMissing")))
    return [s for _, s in sorted(seq, key=lambda kv: kv[0])]


def link_uri(doc_id: int, k: int) -> str:
    """Deterministic /URI for link annotation k of doc_id (mirrored in the
    doc_links oracle SQL): 5 hosts spread as (doc_id + 3k) % 5 so the
    link_host_stats aggregation sees cross-document host collisions."""
    return f"https://h{(doc_id + 3 * k) % 5}.example.net/d/{doc_id}/{k}"


def expected_links(doc_id: int) -> list[tuple[int, int, str | None, int | None]]:
    """Analytic ground truth for extract_doc_graph links:
    (page, link_idx, uri, target_page) — URI links carry no target,
    the internal /Dest link (doc%10=8) no uri."""
    r = doc_rules(doc_id)
    out = [(0, k, link_uri(doc_id, k), None) for k in range(r["n_links"])]
    if r["internal_link"]:
        out.append((0, r["n_links"], None, doc_id % r["n_pages"]))
    return out


def expected_markup(doc_id: int, text: str) -> list[tuple[int, int, str, str, str, str | None]]:
    """Analytic ground truth for doc_markup_annots:
    (page_idx, annot_idx, subtype, author, contents, covered_text).
    covered_text is the page-0 line when the highlight quad covers its
    origin, '' when it misses, NULL for non-highlight annotations."""
    r = doc_rules(doc_id)
    if not r["markup"]:
        return []
    author = f"reviewer-{doc_id % 4}"
    line = page_texts(text or "", r["n_pages"])[0]
    covered = line if r["markup_cover"] else ""
    return [
        (0, 0, "Text", author, f"note-{doc_id % 10}", None),
        (0, 1, "Highlight", author, f"hl-{doc_id % 10}", covered),
        # FreeText: covered_text = the /AP /N appearance's DRAWN text
        (0, 2, "FreeText", author, f"fb-{doc_id % 10}", f"ap-{doc_id % 10}"),
    ]


def expected_fields(doc_id: int) -> list[tuple[int, str, str, str | None]]:
    """Analytic ground truth for extract_doc_graph form fields:
    (field_idx, name, ftype, value).  Even k: /FT /Tx with a string /V
    (omitted — None — on doc_id%5==1, k==0); odd k: /FT /Btn whose /V is
    a NAME object /Opt<(doc_id+k)%3>."""
    r = doc_rules(doc_id)
    out: list[tuple[int, str, str, str | None]] = []
    for k in range(r["n_fields"]):
        if k % 2 == 1:
            out.append((k, f"f{k}", "Btn", f"Opt{(doc_id + k) % 3}"))
        elif doc_id % 5 == 1 and k == 0:
            out.append((k, f"f{k}", "Tx", None))
        else:
            out.append((k, f"f{k}", "Tx", f"v{doc_id}-{k}"))
    if r["field_tree"]:
        n = r["n_fields"]
        # kid 0 inherits the parent's /FT and /V, kid 1 overrides /V
        out.append((n, f"grp{doc_id}.c0", "Tx", f"g{doc_id}"))
        out.append((n + 1, f"grp{doc_id}.c1", "Tx", f"g{doc_id}-1"))
    return out


def attachment_payload(doc_id: int, j: int) -> str:
    """Deterministic embedded-file payload (mirrored in the
    doc_attachments oracle SQL via repeat())."""
    return f"att payload {doc_id}/{j} " * (1 + (doc_id + j) % 3)


def expected_attachments(doc_id: int) -> list[tuple[int, str, int, str]]:
    """Analytic ground truth for extract_attachments:
    (att_idx, name, size, payload_md5)."""
    import hashlib as _hashlib

    out = []
    for j in range(doc_rules(doc_id)["n_attachments"]):
        payload = attachment_payload(doc_id, j).encode("ascii")
        out.append(
            (j, f"att{j}.txt", len(payload), _hashlib.md5(payload).hexdigest())
        )
    return out


# --------------------------------------------------------------------------
# byte-level document builder
# --------------------------------------------------------------------------

class _Builder:
    """Sequential byte builder tracking span pieces.

    Piece tags: 'struct' (structural bytes), 'text' (encoded content-stream
    payload).  Media markers are zero-width (text NULL) at a byte offset
    strictly inside the surrounding struct piece, so span offsets stay
    strictly increasing (FIXTURES.md §1.1)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.pieces: list[tuple[str, int, bytes | None, str | None]] = []
        self._open_struct_start: int | None = 0

    @property
    def pos(self) -> int:
        return len(self.buf)

    def _close_struct(self) -> None:
        if self._open_struct_start is not None and self.pos > self._open_struct_start:
            seg = bytes(self.buf[self._open_struct_start : self.pos])
            self.pieces.append(("struct", self._open_struct_start, seg, None))
        self._open_struct_start = None

    def struct(self, b: bytes) -> int:
        if self._open_struct_start is None:
            self._open_struct_start = self.pos
        off = self.pos
        self.buf += b
        return off

    def text_payload(self, b: bytes) -> int:
        self._close_struct()
        off = self.pos
        self.buf += b
        self.pieces.append(("text", off, b, None))
        self._open_struct_start = self.pos
        return off

    def media_marker(self, name: str) -> None:
        # zero-width marker strictly inside the currently-open struct run
        self.pieces.append(("media", self.pos, None, name))

    def finish(self) -> bytes:
        self._close_struct()
        return bytes(self.buf)

    def span_rows(self) -> list[dict]:
        rows = []
        for kind, off, payload, media in sorted(self.pieces, key=lambda p: (p[1], p[0] != "media")):
            rows.append(
                {
                    "kind": kind,
                    # latin-1: byte-faithful for BOTH the ASCII-armored and
                    # the binary family (code points < 256 round-trip through
                    # the parquet UTF-8 string column)
                    "text": payload.decode("latin-1") if payload is not None else None,
                    "media_ref": media,
                    "offset": off,
                }
            )
        return rows


def _encode_payload(plain: bytes, mode: int) -> tuple[bytes, str]:
    """ASCII-armored filter chains (decode folds left-to-right)."""
    if mode == 0:
        return binascii.hexlify(zlib.compress(plain)) + b">", "[/ASCIIHexDecode /FlateDecode]"
    if mode == 1:
        return a85encode(zlib.compress(plain), adobe=False) + b"~>", "[/ASCII85Decode /FlateDecode]"
    if mode == 2:
        return binascii.hexlify(lzw_encode(plain)) + b">", "[/ASCIIHexDecode /LZWDecode]"
    return binascii.hexlify(plain) + b">", "/ASCIIHexDecode"


def _octal_escape_first(s: str) -> str:
    return f"\\{ord(s[0]):03o}{s[1:]}" if s else s


_CMAP_BODY = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfrange
<0000> <00FF> <0000>
<0100> <01FF> <0100>
endbfrange
1 beginbfchar
<2603> <2603>
endbfchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def _position_prelude(
    page_idx: int, rules: dict, ox: int = 0, oy: int = 0
) -> tuple[str, bool]:
    """Positioning prelude that lands the text-line origin at
    (72, 720 - 14*page_idx) through one of five operator paths (ISO 32000
    §9.4.2).  Returns ``(prelude, use_quote)``; ``use_quote`` means the
    show op should be ``'`` (whose implicit T* performs the final drop to
    the target line — leading was set by the prelude's TL).

    ``(ox, oy)`` is an ambient translation already applied by the caller
    (Form XObject /Matrix chain): the prelude targets the REMAINDER so
    the final origin stays on the family's analytic grid."""
    x = 72 - ox
    y = 720 - 14 * page_idx - oy
    v = (rules.get("layout_variant", 0) + page_idx) % 5
    if v == 0:
        return f"{x} {y} Td ", False
    if v == 1:
        return f"1 0 0 1 {x} {y} Tm ", False
    if v == 2:  # two relative Td hops accumulate
        return f"{x - 36} {y - 10} Td 36 10 Td ", False
    if v == 3:  # TD = Td + set leading (-ty)
        return f"{x} {y + 14} Td 0 -14 TD ", False
    return f"{x} {y + 14} Td 14 TL ", True  # v == 4: TL + implicit T* of '


def _content_plain(
    ptext: str, page_idx: int, rules: dict, ox: int = 0, oy: int = 0
) -> bytes:
    """The decoded content-stream body for one page."""
    cmap = rules["cmap_font"]
    if cmap:
        def show(s: str) -> str:
            return "<" + "".join(f"{ord(c):04X}" for c in s) + ">"
    else:
        def show(s: str) -> str:
            return "(" + s + ")"

    prelude, quote = _position_prelude(page_idx, rules, ox, oy)
    if page_idx == 0 and rules.get("gs_font"):
        # §8.4.5: the font arrives via the ExtGState's /Font entry; the
        # second gs is the font-less decoy that must not clobber it
        parts = [f"BT /GS1 gs /GS0 gs {prelude}"]
    else:
        parts = [f"BT /F1 12 Tf {prelude}"]
    special0 = page_idx == 0 and (
        (rules.get("diff_encoding") and not cmap)
        or (rules["octal"] and not cmap)
        or rules.get("actual_text")
    )
    if rules.get("kern_words") and " " in ptext and not special0:
        # kern-positioned words: no space glyphs anywhere on the line —
        # only a kernel applying the TJ word-break threshold recovers the
        # expected (spaced) span text.  Empty split parts round-trip too:
        # () decodes to "" and the kern still inserts the space.
        if quote:
            parts.append("T* ")  # TJ takes an array — drop explicitly
        parts.append(
            "[" + " -300 ".join(show(w) for w in ptext.split(" ")) + "] TJ "
        )
    elif page_idx == 1 and " " in ptext:
        first, rest = ptext.split(" ", 1)
        if quote:
            parts.append("T* ")  # TJ takes an array — drop explicitly
        parts.append(f"[{show(first)} -120 {show(' ' + rest)}] TJ ")
    else:
        body = ptext
        if page_idx == 0 and rules.get("diff_encoding") and not cmap and body:
            # write e/a/space through the /Differences-remapped codes
            lit = body.replace("e", r"\216").replace("a", r"\226").replace(" ", r"\240")
            if quote:
                parts.append(f"({lit}) ' ")
            else:
                parts.append(f"({lit}) Tj ")
        elif page_idx == 0 and rules["octal"] and not cmap and body:
            if quote:
                parts.append("T* ")
            parts.append(f"({_octal_escape_first(body)}) Tj ")
        elif page_idx == 0 and rules.get("actual_text") and body:
            # §14.9.4: draw REVERSED glyphs, declare the true text as
            # /ActualText — extraction must emit the declaration, not the
            # glyphs (the ' variant keeps its implicit T*: the atext
            # event is positioned at the show, after the drop)
            op = "'" if quote else "Tj"
            parts.append(
                f"/Span << /ActualText ({body}) >> BDC ({body[::-1]}) {op} EMC "
            )
        elif quote:
            parts.append(f"{show(body)} ' ")
        else:
            parts.append(f"{show(body)} Tj ")
    parts.append("ET")
    if page_idx == 0:
        parts.append(gfx_ops(rules))
        if rules.get("shading"):
            parts.append(" q /Sh1 sh Q" * (1 + rules["doc_id"] % 3))
    if page_idx == 0 and rules["media"]:
        parts.append(" q /Im1 Do Q")
    if page_idx == 0 and rules.get("ocg_hidden"):
        # switched-off layer: NOTHING inside may extract (§8.11.4.3)
        parts.append(
            " /OC /MC9 BDC BT /F1 12 Tf 72 40 Td (hidden layer must not extract) Tj ET EMC"
        )
    if rules["dangling"] and page_idx == rules["_last_page"]:
        parts.append(" q /ImMissing Do Q")
    return "".join(parts).encode("ascii")


def build_document(doc_id: int, text: str) -> dict:
    """Build one document.  Returns {doc_id, bytes, span_rows, expected}."""
    r = doc_rules(doc_id)
    texts = page_texts(text, r["n_pages"])
    pages = [(p, t) for p, t in enumerate(texts)]
    nonempty_last = max((p for p, t in pages if t), default=0)
    r["_last_page"] = nonempty_last

    b = _Builder()
    offsets: dict[int, int] = {}

    b.struct(f"%PDF-{r['version']}\n".encode("ascii"))

    # object numbering
    CATALOG, PAGESROOT, FONT = 1, 2, 3
    next_id = 4
    cmap_id = imgobj_id = inter_id = fnobj_id = smobj_id = None
    if r["cmap_font"]:
        cmap_id = next_id
        next_id += 1
    if r["media"]:
        imgobj_id = next_id
        next_id += 1
        if doc_id % 120 == 115:  # raster v5: Type 4 tint-transform stream
            fnobj_id = next_id
            next_id += 1
        if doc_id % 120 == 15:  # raster v0 carries an /SMask alpha image
            smobj_id = next_id
            next_id += 1
    if r["n_pages"] == 3:
        inter_id = next_id
        next_id += 1
    # nested Form XObject pair carrying page 1's content (rule implies
    # n_pages == 3, so page index 1 always exists; skip when its text
    # slice is empty — there is nothing to wrap)
    fm1_id = fm2_id = None
    if r["form_xobject"] and len(texts) > 1 and texts[1]:
        fm1_id, fm2_id = next_id, next_id + 1
        next_id += 2
    page_ids, content_ids, length_ids = {}, {}, {}
    for p, _t in pages:
        page_ids[p] = next_id
        next_id += 1
    for p, t in pages:
        if t:
            content_ids[p] = next_id
            next_id += 1
            if r["indirect_length"] and p == 0:
                length_ids[p] = next_id
                next_id += 1

    # document metadata: trailer /Info always; catalog /Outlines on all but
    # every 5th+2 doc (missing-outlines path), 1 + doc_id % 4 items
    info_id = next_id
    next_id += 1
    n_outl = 0 if doc_id % 5 == 2 else 1 + doc_id % 4
    outl_root_id = outl_item0 = outl_child_id = None
    if n_outl:
        outl_root_id = next_id
        outl_item0 = next_id + 1
        next_id += 1 + n_outl
        if r["outl_child"]:
            outl_child_id = next_id
            next_id += 1

    # interactive tier: link-annotation objects (page 0) + /AcroForm fields
    link_ids = list(range(next_id, next_id + r["n_links"]))
    next_id += r["n_links"]
    ilink_id = None
    if r["internal_link"]:
        ilink_id = next_id
        next_id += 1
    acro_id = field0_id = ftree_id = None
    if r["n_fields"]:
        acro_id = next_id
        field0_id = next_id + 1
        next_id += 1 + r["n_fields"]
        if r["field_tree"]:
            ftree_id = next_id  # parent; kids are ftree_id+1, +2
            next_id += 3

    # embedded-file attachments: name-tree root (+ kids level when 2 files)
    # + per-file filespec dict + EmbeddedFile stream
    n_att = r["n_attachments"]
    att_tree_id = att_fs0 = att_ef0 = None
    att_kid_ids: list[int] = []
    if n_att:
        att_tree_id = next_id
        next_id += 1
        if n_att == 2:
            att_kid_ids = [next_id, next_id + 1]
            next_id += 2
        att_fs0 = next_id
        next_id += n_att
        att_ef0 = next_id
        next_id += n_att

    # hidden optional-content layer: one OCG object, switched off by the
    # catalog's default configuration
    ocg_id = None
    if r["ocg_hidden"]:
        ocg_id = next_id
        next_id += 1

    # /Contents array: the second stream of page 0's split content
    split_id = None
    if r["split_content"] and 0 in content_ids:
        split_id = next_id
        next_id += 1

    # FreeText appearance stream (§12.5.6.6 + §12.5.5): the annot's visible
    # text lives in its /AP /N Form XObject, NOT in /Contents — one extra
    # object + stream on markup docs
    ap_id = None
    if r["markup"]:
        ap_id = next_id
        next_id += 1
    xmp_id = None
    if r["xmp"]:
        xmp_id = next_id
        next_id += 1

    cat_body = f"<< /Type /Catalog /Pages {PAGESROOT} 0 R"
    if xmp_id is not None:
        cat_body += f" /Metadata {xmp_id} 0 R"
    if outl_root_id is not None:
        cat_body += f" /Outlines {outl_root_id} 0 R"
    if acro_id is not None:
        cat_body += f" /AcroForm {acro_id} 0 R"
    names_parts = []
    if att_tree_id is not None:
        names_parts.append(f"/EmbeddedFiles {att_tree_id} 0 R")
    dest_names = []
    tp = doc_id % r["n_pages"]
    if n_outl and doc_id % 2 == 1:
        dest_names.append(f"(sec-{doc_id}) [{page_ids[tp]} 0 R /XYZ 0 720 null]")
    if r["internal_link"] and doc_id % 4 == 2:
        dest_names.append(f"(lnk-{doc_id}) [{page_ids[tp]} 0 R /XYZ 0 720 null]")
    if dest_names:
        # named-destination tree (§12.3.2.3) — flat /Names, fully inline
        # (no new objects); at most one entry per doc (outline names live
        # on odd docs, link names on doc%4=2 evens), so /Names stays
        # trivially sorted
        names_parts.append("/Dests << /Names [" + " ".join(dest_names) + "] >>")
    if names_parts:
        cat_body += " /Names << " + " ".join(names_parts) + " >>"
    if ocg_id is not None:
        cat_body += (
            f" /OCProperties << /OCGs [{ocg_id} 0 R]"
            f" /D << /OFF [{ocg_id} 0 R] >> >>"
        )
    if doc_id % 9 != 4:
        # /PageLabels number tree (§12.4.2), INLINE so object_stats is
        # untouched: range 0 cycles the 5 numbering styles with an
        # optional prefix and /St, pages 1+ renumber decimally (every
        # other doc omitting /St — the default-1 path); every 9th+4 doc
        # has NO tree (viewer default: ordinal+1 decimal)
        cat_body += " /PageLabels << /Nums [" + _page_labels_nums(doc_id) + "] >>"
    cat_body += " >>"
    trailer_info = f" /Info {info_id} 0 R"

    def obj_open(oid: int) -> None:
        offsets[oid] = b.struct(f"{oid} 0 obj\n".encode("ascii"))

    def obj_close() -> None:
        b.struct(b"\nendobj\n")
        if r["indirect_length"]:
            b.struct(b"% interleaved comment noise\n")

    # 1: Catalog
    obj_open(CATALOG)
    b.struct(cat_body.encode("ascii"))
    obj_close()

    # 2: Pages root (3-level tree when n_pages == 3: kids [inter(p0,p1), p2])
    obj_open(PAGESROOT)
    if inter_id is not None:
        kids = f"[{inter_id} 0 R {page_ids[2]} 0 R]"
        count = len(pages)
    else:
        kids = "[" + " ".join(f"{page_ids[p]} 0 R" for p, _ in pages) + "]"
        count = len(pages)
    b.struct(f"<< /Type /Pages /Kids {kids} /Count {count} >>".encode("ascii"))
    obj_close()

    # 3: Font
    obj_open(FONT)
    if r["cmap_font"]:
        b.struct(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            f"/Encoding /Identity-H /ToUnicode {cmap_id} 0 R >>".encode("ascii")
        )
    elif r["diff_encoding"]:
        b.struct(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [142 /e 150 /uni0061 160 /space] >> >>"
        )
    else:
        b.struct(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    obj_close()

    # CMap stream (ASCIIHex-armored so the row stays valid UTF-8)
    if cmap_id is not None:
        payload = binascii.hexlify(_CMAP_BODY) + b">"
        obj_open(cmap_id)
        b.struct(f"<< /Length {len(payload)} /Filter /ASCIIHexDecode >>\nstream\n".encode("ascii"))
        b.struct(payload)
        b.struct(b"\nendstream")
        obj_close()

    # image XObject: a REAL image payload (JPEG or JPEG 2000 by
    # _embedded_image class) wrapped in ASCIIHex transport armor
    # ([/AHx /DCT] — the old-writer chain shape) so the payload stays
    # ASCII like the rest of this family; the kernel never rasterizes it
    # (SURVEY.md §2.5 D8), but extract_media_payloads strips the armor
    # and hands actual image bytes to the media tier
    if imgobj_id is not None:
        b.media_marker("Im1")
        iw, ih = embedded_image_dims(doc_id)
        payload, media_filter, img_attrs, img_parms = _embedded_image(doc_id)
        if "{pal}" in img_attrs:  # armored family is never encrypted
            img_attrs = img_attrs.format(pal=embedded_palette_bytes().hex())
        if "{fn}" in img_attrs:  # v5: reference the Type 4 function object
            img_attrs = img_attrs.format(fn=f"{fnobj_id} 0 R")
        if "{sm}" in img_attrs:
            img_attrs = img_attrs.format(
                sm=f"/SMask {smobj_id} 0 R " if smobj_id is not None else ""
            )
        armored = binascii.hexlify(payload) + b">"
        # two-filter chain: /DecodeParms aligns positionally (null for AHx)
        parms_frag = f"/DecodeParms [null {img_parms}] " if img_parms else ""
        obj_open(imgobj_id)
        b.struct(
            f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
            f"{img_attrs} {parms_frag}"
            f"/Filter [/ASCIIHexDecode {media_filter}] /Length {len(armored)} >>\nstream\n".encode("ascii")
        )
        b.struct(armored)
        b.struct(b"\nendstream")
        obj_close()

    # raster v0's /SMask alpha plane (§11.6.5.2): its own gray image
    # XObject, ASCIIHex-armored Flate like the base image
    if smobj_id is not None:
        iw, ih = embedded_image_dims(doc_id)
        sm_armored = binascii.hexlify(
            zlib.compress(embedded_smask_samples(iw, ih))
        ) + b">"
        obj_open(smobj_id)
        b.struct(
            f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            f"/Filter [/ASCIIHexDecode /FlateDecode] /Length {len(sm_armored)} >>\nstream\n".encode("ascii")
        )
        b.struct(sm_armored)
        b.struct(b"\nendstream")
        obj_close()

    # raster v5: the /Separation tint transform as a §7.10.5 Type 4
    # calculator STREAM (dict functions inline elsewhere need no object)
    if fnobj_id is not None:
        prog = SEPARATION_PS_PROGRAM
        obj_open(fnobj_id)
        b.struct(
            f"<< /FunctionType 4 /Domain [0 1] /Range [0 1] "
            f"/Length {len(prog)} >>\nstream\n".encode("ascii")
        )
        b.struct(prog)
        b.struct(b"\nendstream")
        obj_close()

    # intermediate Pages node
    if inter_id is not None:
        obj_open(inter_id)
        b.struct(
            f"<< /Type /Pages /Parent {PAGESROOT} 0 R "
            f"/Kids [{page_ids[0]} 0 R {page_ids[1]} 0 R] /Count 2 >>".encode("ascii")
        )
        obj_close()

    # page objects
    for p, t in pages:
        parent = inter_id if (inter_id is not None and p < 2) else PAGESROOT
        res = f"<< /Font << /F1 {FONT} 0 R >>"
        xo_entries = []
        if imgobj_id is not None:
            xo_entries.append(f"/Im1 {imgobj_id} 0 R")
        if fm1_id is not None and p == 1:
            xo_entries.append(f"/Fm1 {fm1_id} 0 R")
        if xo_entries:
            res += " /XObject << " + " ".join(xo_entries) + " >>"
        if ocg_id is not None and p == 0:
            # every second hidden-layer doc routes the suppression
            # through an INLINE /OCMD membership dict (§8.11.2.2,
            # /P /AnyOn over the OFF group — not visible) instead of a
            # direct OCG ref; zero new objects, spans invariant, so a
            # kernel ignoring OCMDs extracts the hidden layer and fails
            # every span oracle
            if (doc_id // 29) % 2 == 1:
                res += (
                    " /Properties << /MC9 << /Type /OCMD"
                    f" /OCGs [{ocg_id} 0 R] /P /AnyOn >> >>"
                )
            else:
                res += f" /Properties << /MC9 {ocg_id} 0 R >>"
        if r["gs_font"] and p == 0:
            # inline ExtGState dicts: zero new objects (object_stats
            # untouched); GS0 is the font-less decoy
            res += (
                " /ExtGState << /GS0 << /Type /ExtGState /CA 0.5 >> "
                f"/GS1 << /Type /ExtGState /Font [{FONT} 0 R 12] >> >>"
            )
        if p == 0 and r["shading"]:
            res += " /Shading << /Sh1 " + shading_dict(doc_id) + " >>"
        res += " >>"
        entry = f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] /Resources {res}"
        if t and p == 0 and split_id is not None:
            entry += f" /Contents [{content_ids[p]} 0 R {split_id} 0 R]"
        elif t:
            entry += f" /Contents {content_ids[p]} 0 R"
        if p == 0 and (link_ids or r["markup"]):
            annots = [f"{a} 0 R" for a in link_ids]
            if ilink_id is not None:
                annots.append(f"{ilink_id} 0 R")
            if r["markup"]:
                author = f"reviewer-{doc_id % 4}"
                # cover quad brackets the page-0 line origin (72, 720);
                # the miss quad sits in empty space at y 100-112
                qy = (714, 726) if r["markup_cover"] else (100, 112)
                annots.append(
                    f"<< /Type /Annot /Subtype /Text /Rect [500 700 520 720] "
                    f"/T ({author}) /Contents (note-{doc_id % 10}) >>"
                )
                annots.append(
                    f"<< /Type /Annot /Subtype /Highlight "
                    f"/Rect [70 {qy[0]} 300 {qy[1]}] /T ({author}) "
                    f"/Contents (hl-{doc_id % 10}) "
                    f"/QuadPoints [70 {qy[1]} 300 {qy[1]} 70 {qy[0]} 300 {qy[0]}] >>"
                )
                # FreeText: /Contents is the FALLBACK; the visible text is
                # drawn by the /AP /N appearance stream and differs — a
                # kernel echoing /Contents instead of parsing the
                # appearance fails the oracle
                annots.append(
                    f"<< /Type /Annot /Subtype /FreeText /Rect [100 600 300 630] "
                    f"/T ({author}) /Contents (fb-{doc_id % 10}) "
                    f"/AP << /N {ap_id} 0 R >> >>"
                )
            entry += " /Annots [" + " ".join(annots) + "]"
        entry += " >>"
        obj_open(page_ids[p])
        b.struct(entry.encode("ascii"))
        obj_close()

    # hidden-layer OCG object
    if ocg_id is not None:
        obj_open(ocg_id)
        b.struct(b"<< /Type /OCG /Name (layer1) >>")
        obj_close()

    # document metadata objects: /Info dict + /Outlines chain.  The
    # /Title exercises all three §7.9.2.2 TEXT-STRING encodings (same
    # text — doc_metadata's oracle is invariant, only a BOM-aware decode
    # agrees): doc%14=5 UTF-16BE <FEFF..>, doc%14=12 UTF-8 <EFBBBF..>
    # (PDF 2.0), else PDFDocEncoding literal.  Hex form keeps the family
    # ASCII-armored.  /CreationDate = synth_creation_date (§7.9.4):
    # short D:YYYYMM on doc%7=2 (field defaults), else full with the
    # offset cycling Z / +05'30' / -08'00' by doc%3.
    obj_open(info_id)
    title = f"Synth Doc {doc_id}"
    if doc_id % 14 == 5:
        tlit = "<FEFF" + title.encode("utf-16-be").hex().upper() + ">"
    elif doc_id % 14 == 12:
        tlit = "<EFBBBF" + title.encode("utf-8").hex().upper() + ">"
    else:
        tlit = f"({title})"
    b.struct(
        (
            f"<< /Title {tlit} /Author (Writer {doc_id % 7}) "
            f"/CreationDate ({synth_creation_date(doc_id)}) >>"
        ).encode("ascii")
    )
    obj_close()
    if outl_root_id is not None:
        # root /Count = VISIBLE descendants (§12.3.3): top-level items
        # plus the nested child only while its parent item is open
        child_open = outl_child_id is not None and doc_id % 2 == 1
        obj_open(outl_root_id)
        b.struct(
            f"<< /Type /Outlines /First {outl_item0} 0 R "
            f"/Last {outl_item0 + n_outl - 1} 0 R "
            f"/Count {n_outl + (1 if child_open else 0)} >>".encode("ascii")
        )
        obj_close()
        for k in range(n_outl):
            oid = outl_item0 + k
            item = f"<< /Title (Sec {doc_id}.{k}) /Parent {outl_root_id} 0 R"
            if k == 1 and outl_child_id is not None:
                item += (
                    f" /First {outl_child_id} 0 R /Last {outl_child_id} 0 R"
                    f" /Count {1 if child_open else -1}"
                )
            if k == 0:
                # destination (§12.3.2): item 0 jumps to page doc%n_pages —
                # DIRECT [page /XYZ ...] array on even docs, a NAMED
                # string resolved through the catalog /Names /Dests name
                # tree on odd docs (both inline: object_stats untouched).
                # doc%6 in {0,3} writes it in the ACTION form
                # /A << /S /GoTo /D dest >> (§12.6.4.2 — the hyperref
                # form; one even and one odd class, so both the direct
                # and the named dest are exercised through the action
                # path) — resolution is identical, oracles invariant.
                tp = doc_id % r["n_pages"]
                dst = (
                    f"[{page_ids[tp]} 0 R /XYZ 0 720 null]"
                    if doc_id % 2 == 0
                    else f"(sec-{doc_id})"
                )
                if doc_id % 6 in (0, 3):
                    item += f" /A << /S /GoTo /D {dst} >>"
                else:
                    item += f" /Dest {dst}"
            if k > 0:
                item += f" /Prev {oid - 1} 0 R"
            if k < n_outl - 1:
                item += f" /Next {oid + 1} 0 R"
            item += " >>"
            obj_open(oid)
            b.struct(item.encode("ascii"))
            obj_close()
        if outl_child_id is not None:
            tp2 = (doc_id + 1) % r["n_pages"]
            obj_open(outl_child_id)
            b.struct(
                (
                    f"<< /Title (Sec {doc_id}.1.0) /Parent {outl_item0 + 1} 0 R"
                    f" /Dest [{page_ids[tp2]} 0 R /XYZ 0 720 null] >>"
                ).encode("ascii")
            )
            obj_close()

    # XMP metadata stream (uncompressed XML packet, §14.3.2 convention)
    if xmp_id is not None:
        packet = xmp_packet(doc_id)
        obj_open(xmp_id)
        b.struct(
            f"<< /Type /Metadata /Subtype /XML /Length {len(packet)} >>\nstream\n".encode("ascii")
        )
        b.text_payload(packet)
        b.struct(b"\nendstream")
        obj_close()

    # FreeText appearance stream: a Form XObject drawing the REAL text
    if ap_id is not None:
        ap_body = f"BT /F1 10 Tf 2 8 Td (ap-{doc_id % 10}) Tj ET".encode("ascii")
        obj_open(ap_id)
        b.struct(
            (
                f"<< /Type /XObject /Subtype /Form /BBox [0 0 200 30] "
                f"/Resources << /Font << /F1 {FONT} 0 R >> >> "
                f"/Length {len(ap_body)} >>\nstream\n"
            ).encode("ascii")
        )
        b.text_payload(ap_body)
        b.struct(b"\nendstream")
        obj_close()

    # interactive-tier objects: /Annots links (URI actions) + AcroForm fields
    for k, oid in enumerate(link_ids):
        obj_open(oid)
        b.struct(
            f"<< /Type /Annot /Subtype /Link /Rect [72 {700 - 16 * k} 240 {714 - 16 * k}] "
            f"/A << /S /URI /URI ({link_uri(doc_id, k)}) >> >>".encode("ascii")
        )
        obj_close()
    if ilink_id is not None:
        # internal navigation link (§12.5.6.5): /Dest, no /A action —
        # direct array on doc%4=0, named through /Names /Dests on doc%4=2
        tp = doc_id % r["n_pages"]
        dest = (
            f"[{page_ids[tp]} 0 R /XYZ 0 720 null]"
            if doc_id % 4 == 0
            else f"(lnk-{doc_id})"
        )
        obj_open(ilink_id)
        b.struct(
            f"<< /Type /Annot /Subtype /Link /Rect [72 100 240 114] "
            f"/Dest {dest} >>".encode("ascii")
        )
        obj_close()
    if acro_id is not None:
        obj_open(acro_id)
        fields_arr = " ".join(f"{field0_id + k} 0 R" for k in range(r["n_fields"]))
        if ftree_id is not None:
            fields_arr += f" {ftree_id} 0 R"
        b.struct(f"<< /Fields [{fields_arr}] >>".encode("ascii"))
        obj_close()
        for k, (_idx, fname, ftype, fval) in enumerate(
            expected_fields(doc_id)[: r["n_fields"]]
        ):
            body = f"<< /FT /{ftype} /T ({fname})"
            if ftype == "Btn":
                body += f" /V /{fval}"
            elif fval is not None:
                body += f" /V ({fval})"
            body += " >>"
            obj_open(field0_id + k)
            b.struct(body.encode("ascii"))
            obj_close()
        if ftree_id is not None:
            # non-terminal parent: /FT and /V are INHERITABLE (§12.7.3.2);
            # kid 0 carries neither, kid 1 overrides /V
            obj_open(ftree_id)
            b.struct(
                f"<< /T (grp{doc_id}) /FT /Tx /V (g{doc_id}) "
                f"/Kids [{ftree_id + 1} 0 R {ftree_id + 2} 0 R] >>".encode("ascii")
            )
            obj_close()
            obj_open(ftree_id + 1)
            b.struct(f"<< /T (c0) /Parent {ftree_id} 0 R >>".encode("ascii"))
            obj_close()
            obj_open(ftree_id + 2)
            b.struct(
                f"<< /T (c1) /Parent {ftree_id} 0 R /V (g{doc_id}-1) >>".encode("ascii")
            )
            obj_close()

    # embedded-file attachments: name tree (flat /Names, or /Kids with
    # /Limits for the 2-file docs) -> /Filespec -> /EF /F stream
    if att_tree_id is not None:
        att_names = [f"att{j}.txt" for j in range(n_att)]
        obj_open(att_tree_id)
        if att_kid_ids:
            b.struct(
                ("<< /Kids [" + " ".join(f"{k} 0 R" for k in att_kid_ids) + "] >>").encode("ascii")
            )
        else:
            b.struct(f"<< /Names [({att_names[0]}) {att_fs0} 0 R] >>".encode("ascii"))
        obj_close()
        for j, kid in enumerate(att_kid_ids):
            obj_open(kid)
            b.struct(
                f"<< /Limits [({att_names[j]}) ({att_names[j]})] "
                f"/Names [({att_names[j]}) {att_fs0 + j} 0 R] >>".encode("ascii")
            )
            obj_close()
        for j in range(n_att):
            obj_open(att_fs0 + j)
            b.struct(
                f"<< /Type /Filespec /F ({att_names[j]}) "
                f"/EF << /F {att_ef0 + j} 0 R >> >>".encode("ascii")
            )
            obj_close()
        for j in range(n_att):
            armored = binascii.hexlify(attachment_payload(doc_id, j).encode("ascii")) + b">"
            obj_open(att_ef0 + j)
            b.struct(
                f"<< /Type /EmbeddedFile /Length {len(armored)} "
                f"/Filter /ASCIIHexDecode >>\nstream\n".encode("ascii")
            )
            b.struct(armored)
            b.struct(b"\nendstream")
            obj_close()

    # nested Form XObjects: Fm1 (own /Resources: Fm2 + the font) invokes
    # Fm2 (NO /Resources — resolves through the caller's, §8.10.2), which
    # carries page 1's real body with the /Matrix chain compensated
    if fm1_id is not None:
        e1, f1, e2, f2 = form_offsets(doc_id)
        fm1_res = f"<< /XObject << /Fm2 {fm2_id} 0 R >> /Font << /F1 {FONT} 0 R >> >>"
        fm1_body = b"q /Fm2 Do Q"
        obj_open(fm1_id)
        b.struct(
            f"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
            f"/Matrix [1 0 0 1 {e1} {f1}] /Resources {fm1_res} "
            f"/Length {len(fm1_body)} >>\nstream\n".encode("ascii")
        )
        b.text_payload(fm1_body)
        b.struct(b"\nendstream")
        obj_close()
        fm2_plain = _content_plain(texts[1], 1, r, ox=e1 + e2, oy=f1 + f2)
        fm2_payload, fm2_filt = _encode_payload(fm2_plain, r["filter_mode"])
        obj_open(fm2_id)
        b.struct(
            f"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
            f"/Matrix [1 0 0 1 {e2} {f2}] /Filter {fm2_filt} "
            f"/Length {len(fm2_payload)} >>\nstream\n".encode("ascii")
        )
        b.text_payload(fm2_payload)
        b.struct(b"\nendstream")
        obj_close()

    # content streams (the *text* input spans)
    for p, t in pages:
        if not t:
            continue
        if fm1_id is not None and p == 1:
            plain = b"q /Fm1 Do Q"
        else:
            plain = _content_plain(t, p, r)
        tail = None
        if p == 0 and split_id is not None:
            # split at a token boundary (§7.8.2: "the division between
            # the streams may occur only between lexical tokens") —
            # right after the first font-setting op: "Tf ", or "gs "
            # on the ExtGState-font docs (which write no page-0 Tf)
            tok = b"Tf " if b"Tf " in plain else b"gs "
            cut = plain.index(tok) + 3
            plain, tail = plain[:cut], plain[cut:]
        payload, filt = _encode_payload(plain, r["filter_mode"])
        obj_open(content_ids[p])
        if p in length_ids:
            b.struct(f"<< /Length {length_ids[p]} 0 R /Filter {filt} >>\nstream\n".encode("ascii"))
        else:
            b.struct(f"<< /Length {len(payload)} /Filter {filt} >>\nstream\n".encode("ascii"))
        b.text_payload(payload)
        b.struct(b"\nendstream")
        obj_close()
        if p in length_ids:
            obj_open(length_ids[p])
            b.struct(str(len(payload)).encode("ascii"))
            obj_close()
        if tail is not None:
            tpayload, tfilt = _encode_payload(tail, r["filter_mode"])
            obj_open(split_id)
            b.struct(
                f"<< /Length {len(tpayload)} /Filter {tfilt} >>\nstream\n".encode("ascii")
            )
            b.text_payload(tpayload)
            b.struct(b"\nendstream")
            obj_close()

    n_objs = next_id  # ids 1..next_id-1, plus obj 0 free
    if not r["xref_stream"]:
        xref_at = b.struct(b"xref\n")
        b.struct(f"0 {n_objs}\n".encode("ascii"))
        b.struct(b"0000000000 65535 f \n")
        for oid in range(1, n_objs):
            b.struct(f"{offsets[oid]:010d} 00000 n \n".encode("ascii"))
        b.struct(
            f"trailer\n<< /Size {n_objs} /Root {CATALOG} 0 R{trailer_info} >>\n"
            f"startxref\n{xref_at}\n%%EOF\n".encode("ascii")
        )
        if r["incremental"]:
            # incremental update (ISO 32000 §7.5.6): append a re-written
            # Catalog (same content, so extraction output is unchanged) plus
            # a second xref section whose trailer /Prev chains to the first.
            # read_xref must take the NEWEST definition and follow /Prev for
            # the rest — exercised end-to-end through the span oracles.
            upd_at = b.struct(f"{CATALOG} 0 obj\n".encode("ascii"))
            b.struct(cat_body.encode("ascii"))
            b.struct(b"\nendobj\n")
            xref2_at = b.struct(b"xref\n")
            b.struct(f"{CATALOG} 1\n".encode("ascii"))
            b.struct(f"{upd_at:010d} 00000 n \n".encode("ascii"))
            b.struct(
                f"trailer\n<< /Size {n_objs} /Root {CATALOG} 0 R{trailer_info}"
                f" /Prev {xref_at} >>\n"
                f"startxref\n{xref2_at}\n%%EOF\n".encode("ascii")
            )
    else:
        # PDF 1.5+ cross-reference stream (/W [1 4 2]), ASCII-armored
        xref_id = n_objs
        rows = bytearray()
        rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for oid in range(1, n_objs):
            rows += bytes([1]) + offsets[oid].to_bytes(4, "big") + (0).to_bytes(2, "big")
        # self-entry for the xref stream object
        xref_at = b.pos
        rows += bytes([1]) + xref_at.to_bytes(4, "big") + (0).to_bytes(2, "big")
        payload = binascii.hexlify(zlib.compress(bytes(rows))) + b">"
        obj_open(xref_id)
        b.struct(
            f"<< /Type /XRef /Size {n_objs + 1} /W [1 4 2] /Root {CATALOG} 0 R{trailer_info} "
            f"/Filter [/ASCIIHexDecode /FlateDecode] /Length {len(payload)} >>\nstream\n".encode("ascii")
        )
        b.struct(payload)
        b.struct(b"\nendstream\nendobj\n")
        b.struct(f"startxref\n{xref_at}\n%%EOF\n".encode("ascii"))

    doc_bytes = b.finish()
    return {
        "doc_id": doc_id,
        "bytes": doc_bytes,
        "span_rows": b.span_rows(),
        "expected": expected_spans(doc_id, text),
    }


# --------------------------------------------------------------------------
# binary real-writer family (judge r01 gap 1): TRUE binary FlateDecode
# streams (no ASCII armor), CRLF EOLs, a binary-marker comment line, a
# generation != 0 object, inline images (BI/ID/EI), and RC4-encrypted
# documents (standard security handler, empty user password) — the
# real-writer shapes the ASCII family can't exercise.
# --------------------------------------------------------------------------

def binary_rules(doc_id: int) -> dict:
    return {
        "n_pages": 1 + doc_id % 2,
        "xref_stream": doc_id % 2 == 1,
        "encrypted": doc_id % 3 == 0,  # standard handler, empty user password
        # cipher precedence among encrypted docs: AESV3 (V5/R6, AES-256) on
        # every 15th (15 is odd -> hits BOTH xref layouts incl. encrypted
        # ObjStm), else AESV2 (V4/R4) on every 9th, else RC4 V1/R2
        "aes256": doc_id % 15 == 0,
        "aes": doc_id % 9 == 0 and doc_id % 15 != 0,
        "media": doc_id % 5 == 0,
        "inline": doc_id % 7 == 0,  # BI .. ID <binary> EI on page 0
    }


def expected_spans_binary(doc_id: int, text: str) -> list[tuple[str, str | None, str | None]]:
    """Analytic ground truth for the binary family (mirrored in the
    extract_binary_corpus oracle SQL)."""
    r = binary_rules(doc_id)
    seq: list[tuple[int, tuple]] = []
    for p, ptext in enumerate(page_texts(text, r["n_pages"])):
        if ptext:
            seq.append((p * 10, ("text", ptext, None)))
    if r["media"]:
        seq.append((1, ("media", None, "Im1")))
    if r["inline"]:
        seq.append((2, ("media", None, "__inline__")))
    return [s for _, s in sorted(seq, key=lambda kv: kv[0])]


def _content_plain_binary(ptext: str, page_idx: int, rules: dict) -> bytes:
    parts = [f"BT /F1 12 Tf 72 {720 - 14 * page_idx} Td ".encode("ascii")]
    if page_idx == 1 and " " in ptext:
        first, rest = ptext.split(" ", 1)
        parts.append(f"[({first}) -120 ( {rest})] TJ ".encode("ascii"))
    else:
        parts.append(f"({ptext}) Tj ".encode("ascii"))
    parts.append(b"ET")
    if page_idx == 0 and rules["media"]:
        parts.append(b" q /Im1 Do Q")
    if page_idx == 0 and rules["inline"]:
        # a CONSISTENT 2x2 RGB raster: pixel(r,c,k) = (7r+13c+31k+doc%17)%256
        # (raw binary, no EOD — still exercises the EI-scan discipline; the
        # consecutive-byte deltas are {31,207,188}, so a whitespace-then-EI
        # sequence can never appear inside the payload for any doc salt)
        salt = rules["_did"] % 17
        payload = bytes(
            (7 * r + 13 * c + 31 * k + salt) % 256
            for r in range(2) for c in range(2) for k in range(3)
        )
        parts.append(b" BI /W 2 /H 2 /BPC 8 /CS /DeviceRGB ID " + payload + b" EI")
    return b"".join(parts)


def embedded_image_cmyk(doc_id: int) -> bool:
    """Media-doc class 1 (counting by doc//5, mod 4) embeds the CMYK
    JPEG variant."""
    return (doc_id // 5) % 4 == 1


def embedded_image_dims(doc_id: int) -> tuple[int, int]:
    """Dims of the real JPEG embedded as the binary family's Im1 XObject
    (mirrored in the extract_embedded_images oracle SQL)."""
    return 16 * (1 + doc_id % 4), 16 * (1 + (doc_id // 4) % 4)


@lru_cache(maxsize=64)
def _embedded_jpeg(w: int, h: int, cmyk: bool = False) -> bytes:
    """Grayscale DC-only JPEG with the (7R+13C)%256 block pattern — the
    integer-exact decode contract (textops/jpeg.py docstring).  Every
    other size class encodes PROGRESSIVE (SOF2): the refinement script
    transmits the same coefficients, so decoded pixels — and the
    pixel-sum oracle — are identical, while the /DCTDecode path through
    the PDF object graph exercises the Annex G decoder.  Memoized: only
    16 distinct (w, h) payloads exist across the corpus, so per-executor
    the DCT+Huffman encode runs at most 16 times."""
    from .textops import jpeg as _jpeg
    from .textops.media import _block_pattern

    import numpy as _np

    if cmyk:
        # print-pipeline variant: 4-channel DeviceCMYK, channel i =
        # (block + 17*i) % 256 — Adobe APP14 inverted storage, decoded
        # back to true CMYK (extract_embedded_images oracle arm)
        bp = _block_pattern(w, h).astype(_np.int64)
        img = _np.stack([(bp + 17 * i) % 256 for i in range(4)], axis=-1)
        return _jpeg.encode_jpeg(img.astype(_np.uint8))
    if (w // 16 + h // 16) % 2 == 1:
        return _jpeg.encode_jpeg_progressive(_block_pattern(w, h))
    return _jpeg.encode_jpeg(_block_pattern(w, h))


@lru_cache(maxsize=64)
def _embedded_jp2(w: int, h: int, lossy: bool = False) -> bytes:
    """JPEG 2000 (textops/jpx_codec.py) of the SAME grayscale block
    pattern — the /JPXDecode corpus slice.  Even docs are lossless 5/3
    (decoded pixels are the exact (7R+13C)%256 blocks; the oracle arm
    sums the raw pattern); odd docs take the irreversible 9/7 +
    quantization path (judge r04 item 3) — the query NULLs their exact
    sum and carries a banded |sum - expected| check instead."""
    from .textops.jpx_codec import encode_jp2_image
    from .textops.media import _block_pattern

    return encode_jp2_image(
        _block_pattern(w, h), n_decomp=2, irreversible=lossy,
        # the larger lossless images also exercise the multi-tile path
        # (pixels are tiling-invariant for reversible coding)
        tile_size=32 if not lossy and w >= 48 else None,
    )


def embedded_raster_variant(doc_id: int) -> int:
    """Sub-variant of the raw-raster class (class-3 docs are
    doc = 20j + 15, so doc//20 cycles j): 0 = RGB 8bpc + PNG Sub
    predictor, 1 = /Indexed palette, 2 = 4-bpc gray /Decode [1 0],
    3 = 1-bpc /ImageMask stencil, 4 = /Separation -> DeviceRGB through
    an inline Type 3 stitched tint transform, 5 = /Separation ->
    DeviceGray through a Type 4 calculator STREAM (those docs — exactly
    doc % 120 == 115 — carry one extra object, accounted in
    object_stats)."""
    return (doc_id // 20) % 6


# the v5 tint transform: §7.10.5 calculator computing (1 - t)^2
SEPARATION_PS_PROGRAM = b"{ 1 exch sub dup mul }"

# the v4 tint transform: Type 3 stitching of two Type 2 linears at 0.5
# (written INLINE in the colorspace array — dict functions need no object)
_SEP_T3_FN = (
    "<< /FunctionType 3 /Domain [0 1] /Bounds [0.5] /Encode [0 1 0 1] "
    "/Functions [ "
    "<< /FunctionType 2 /Domain [0 1] /C0 [0.9 0.1 0.2] /C1 [0.2 0.8 0.4] /N 1 >> "
    "<< /FunctionType 2 /Domain [0 1] /C0 [0.2 0.8 0.4] /C1 [0.1 0.3 0.9] /N 1 >> "
    "] >>"
)


@lru_cache(maxsize=64)
def _embedded_raster(w: int, h: int, v: int) -> tuple[bytes, str, str | None]:
    """RAW §8.9.5 raster Im1: (zlib sample bytes, dict attrs fragment,
    DecodeParms dict or None).  Pixel models (all analytic for the
    oracle): v0 RGB gradient (7r+13c+31k)%256 behind a PNG Sub(1) row
    predictor; v1 /Indexed with the GIF-family palette over idx =
    (7r+13c)%256; v2 4-bpc gray s = (7r+13c)%16 inverted by /Decode
    [1 0] (decodes to 17*(15-s)); v3 /ImageMask with bit =
    ((r//2)+(c//3))%2 (reported as 255*bit).  Memoized: 16 size
    classes x 4 variants."""
    import zlib as _zlib

    import numpy as _np

    from .textops.raster import pack_rows
    rr = _np.arange(h, dtype=_np.int64)[:, None]
    cc = _np.arange(w, dtype=_np.int64)[None, :]
    if v == 0:
        img = _np.stack([(7 * rr + 13 * cc + 31 * k) % 256 for k in range(3)], axis=-1)
        rows = img.astype(_np.uint8).reshape(h, w * 3).astype(_np.int64)
        # PNG Sub filter (type 1): cur[i] - cur[i-bpp], bpp = 3
        prior = _np.zeros_like(rows)
        prior[:, 3:] = rows[:, :-3]
        filtered = ((rows - prior) % 256).astype(_np.uint8)
        body = b"".join(b"\x01" + filtered[r].tobytes() for r in range(h))
        parms = f"<< /Predictor 15 /Colors 3 /BitsPerComponent 8 /Columns {w} >>"
        # {sm} is filled by the call site with "/SMask N 0 R " when this
        # doc carries the alpha-plane sub-image (doc % 120 == 15)
        return _zlib.compress(body), "{sm}/ColorSpace /DeviceRGB /BitsPerComponent 8", parms
    if v == 1:
        idx = ((7 * rr + 13 * cc) % 256).astype(_np.uint8)
        # attrs carries a {pal} placeholder: the call site substitutes the
        # hex form of the palette — ENCRYPTED with the image object's key
        # in encrypted docs, because §7.6.2 ciphers strings everywhere and
        # the reader decrypts them transparently
        attrs = "/ColorSpace [/Indexed /DeviceRGB 255 <{pal}>] /BitsPerComponent 8"
        return _zlib.compress(pack_rows(idx, 8)), attrs, None
    if v == 2:
        s = ((7 * rr + 13 * cc) % 16).astype(_np.uint8)
        attrs = "/ColorSpace /DeviceGray /BitsPerComponent 4 /Decode [1 0]"
        return _zlib.compress(pack_rows(s, 4)), attrs, None
    if v == 3:
        bit = (((rr // 2) + (cc // 3)) % 2).astype(_np.uint8)
        attrs = "/ImageMask true /BitsPerComponent 1"
        return _zlib.compress(pack_rows(bit, 1)), attrs, None
    if v == 4:
        # spot-colour plate: tint t = s * (1/255) through the inline
        # Type 3 stitched transform into DeviceRGB
        s = ((7 * rr + 13 * cc) % 256).astype(_np.uint8)
        attrs = (
            f"/ColorSpace [/Separation /Spot1 /DeviceRGB {_SEP_T3_FN}] "
            "/BitsPerComponent 8"
        )
        return _zlib.compress(pack_rows(s, 8)), attrs, None
    # v5: 4-bpc tint through the Type 4 calculator stream ({fn} is the
    # call site's function-object reference)
    s = ((7 * rr + 13 * cc) % 16).astype(_np.uint8)
    attrs = "/ColorSpace [/Separation /Ink /DeviceGray {fn}] /BitsPerComponent 4"
    return _zlib.compress(pack_rows(s, 4)), attrs, None


def embedded_palette_bytes() -> bytes:
    """The /Indexed lookup table of the raster class (GIF-family model
    pal[i] = ((7i)%256, (11i+3)%256, (29i+7)%256), 256 RGB entries)."""
    import numpy as _np

    i = _np.arange(256, dtype=_np.int64)
    pal = _np.stack([(7 * i) % 256, (11 * i + 3) % 256, (29 * i + 7) % 256], axis=1)
    return pal.astype(_np.uint8).tobytes()


def embedded_smask_samples(w: int, h: int) -> bytes:
    """The /SMask alpha plane of the raster-v0 sub-variant: gray 8-bpc
    alpha(r, c) = (11r + 5c) % 256 (analytic for the oracle)."""
    import numpy as _np

    from .textops.raster import pack_rows

    rr = _np.arange(h, dtype=_np.int64)[:, None]
    cc = _np.arange(w, dtype=_np.int64)[None, :]
    return pack_rows(((11 * rr + 5 * cc) % 256).astype(_np.uint8), 8)


def _embedded_image(doc_id: int) -> tuple[bytes, str, str, str | None]:
    """Im1 payload dispatch for the media docs (doc_id % 5 == 0):
    (payload, /Filter name, dict attrs fragment, DecodeParms or None).
    The attrs fragment may carry a ``{pal}`` placeholder (the /Indexed
    raster sub-variant) for the call site to fill with the — possibly
    encrypted — hex palette.  Class by (doc_id//5) % 4: 0 = grayscale
    JPEG (baseline or progressive by size class), 1 = CMYK JPEG (Adobe
    APP14 inverted), 2 = reversible JPEG 2000, 3 = RAW §8.9.5 Flate
    raster (sub-variants per embedded_raster_variant) — every image
    representation family with a real decoder gets a corpus slice."""
    iw, ih = embedded_image_dims(doc_id)
    cls = (doc_id // 5) % 4
    if cls == 1:
        return (
            _embedded_jpeg(iw, ih, True), "/DCTDecode",
            "/ColorSpace /DeviceCMYK /BitsPerComponent 8", None,
        )
    if cls == 2:
        return (
            _embedded_jp2(iw, ih, (doc_id // 20) % 2 == 1), "/JPXDecode",
            "/ColorSpace /DeviceGray /BitsPerComponent 8", None,
        )
    if cls == 3:
        payload, attrs, parms = _embedded_raster(
            iw, ih, embedded_raster_variant(doc_id)
        )
        return payload, "/FlateDecode", attrs, parms
    return (
        _embedded_jpeg(iw, ih, False), "/DCTDecode",
        "/ColorSpace /DeviceGray /BitsPerComponent 8", None,
    )


def build_document_binary(
    doc_id: int,
    text: str,
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"owner",
    force_encrypted: bool = False,
) -> dict:
    """Build one binary-family document.  Same return shape as
    ``build_document``.  ``user_pwd``/``owner_pwd`` select the standard-
    handler passwords (defaults: empty user password, like most crawled
    PDFs); ``force_encrypted`` makes every doc encrypted (the
    password-protected family)."""
    import hashlib

    from .core import crypt as _crypt

    r = binary_rules(doc_id)
    if force_encrypted:
        r["encrypted"] = True
    r["_did"] = doc_id
    texts = page_texts(text, r["n_pages"])
    pages = list(enumerate(texts))

    b = _Builder()
    offsets: dict[int, tuple[int, int]] = {}  # oid -> (offset, gen)

    # header + the spec-recommended binary-marker comment (bytes >= 0x80)
    b.struct(b"%PDF-1.7\r\n%\xe2\xe3\xcf\xd3\r\n")

    CATALOG, PAGESROOT, FONT = 1, 2, 3
    FONT_GEN = 1  # generation != 0: xref entries + `3 1 R` references
    next_id = 4
    imgobj_id = fnobj_id = smobj_id = None
    if r["media"]:
        imgobj_id = next_id
        next_id += 1
        if doc_id % 120 == 115:  # raster v5: Type 4 tint-transform stream
            fnobj_id = next_id
            next_id += 1
        if doc_id % 120 == 15:  # raster v0 carries an /SMask alpha image
            smobj_id = next_id
            next_id += 1
    page_ids, content_ids = {}, {}
    for p, _t in pages:
        page_ids[p] = next_id
        next_id += 1
    for p, t in pages:
        if t:
            content_ids[p] = next_id
            next_id += 1
    enc_id = None
    if r["encrypted"]:
        enc_id = next_id
        next_id += 1
    # xref-stream docs store the Catalog inside an ObjStm (type-2 entry) —
    # for encrypted docs this exercises the decrypt-before-expansion seam
    # (the container is encrypted as a whole; its contents are not)
    objstm_id = None
    if r["xref_stream"]:
        objstm_id = next_id
        next_id += 1

    file_key = None
    id0 = hashlib.md5(f"binid{doc_id}".encode()).digest()
    P_FLAGS = -4
    if r["encrypted"] and r["aes256"]:
        # V5/R6: random 32-byte file key wrapped by /U + /UE (empty user
        # password).  Salts are corpus-global constants so hash_2b's memo
        # makes synthesis O(1) per doc; the parser handles arbitrary salts.
        file_key = hashlib.sha256(f"fkey{doc_id}".encode()).digest()
        u_entry, ue_entry = _crypt.v5_entries(file_key, b"VSALT690", b"KSALT135", user_pwd)
        # Algorithm 9: the owner hashes take the 48-byte /U string as udata
        o_entry, oe_entry = _crypt.v5_entries(
            file_key, b"OVSALT69", b"OKSALT13", owner_pwd, udata=u_entry[:48]
        )
    elif r["encrypted"]:
        kn, kr = (16, 4) if r["aes"] else (5, 2)
        o_entry = _crypt.compute_o_entry(owner_pwd, user_pwd, n=kn, r=kr)
        file_key = _crypt.compute_file_key(o_entry, P_FLAGS, id0, user_pwd, n=kn, r=kr)
        u_entry = _crypt.compute_u_entry(file_key, id0, r=kr)

    def enc_stream(raw: bytes, oid: int, gen: int = 0) -> bytes:
        if file_key is None:
            return raw
        if r["aes256"]:
            iv = hashlib.md5(f"iv{doc_id}:{oid}".encode()).digest()
            return _crypt.aes_cbc_encrypt(file_key, raw, iv)  # no per-object key in V5
        if r["aes"]:
            iv = hashlib.md5(f"iv{doc_id}:{oid}".encode()).digest()
            return _crypt.aes_cbc_encrypt(
                _crypt.object_key(file_key, oid, gen, aes=True), raw, iv
            )
        return _crypt.rc4(_crypt.object_key(file_key, oid, gen), raw)

    def obj_open(oid: int, gen: int = 0) -> None:
        offsets[oid] = (b.struct(f"{oid} {gen} obj\r\n".encode("ascii")), gen)

    def obj_close() -> None:
        b.struct(b"\r\nendobj\r\n")

    if objstm_id is None:
        obj_open(CATALOG)
        b.struct(f"<< /Type /Catalog /Pages {PAGESROOT} 0 R >>".encode("ascii"))
        obj_close()
    else:
        inner = f"<< /Type /Catalog /Pages {PAGESROOT} 0 R >>".encode("ascii")
        header = f"{CATALOG} 0\n".encode("ascii")
        payload = enc_stream(zlib.compress(header + inner), objstm_id)
        obj_open(objstm_id)
        b.struct(
            f"<< /Type /ObjStm /N 1 /First {len(header)} /Filter /FlateDecode "
            f"/Length {len(payload)} >>\r\nstream\r\n".encode("ascii")
        )
        b.struct(payload)
        b.struct(b"\r\nendstream")
        obj_close()

    obj_open(PAGESROOT)
    kids = "[" + " ".join(f"{page_ids[p]} 0 R" for p, _ in pages) + "]"
    b.struct(f"<< /Type /Pages /Kids {kids} /Count {len(pages)} >>".encode("ascii"))
    obj_close()

    obj_open(FONT, FONT_GEN)
    b.struct(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    obj_close()

    if imgobj_id is not None:
        b.media_marker("Im1")
        # a REAL image payload (JPEG /DCTDecode or JPEG 2000 /JPXDecode
        # by _embedded_image class; block pattern, dims from
        # embedded_image_dims) — the extract_embedded_images query pulls
        # it back out post-decryption and decodes it with the
        # textops/jpeg.py or textops/jpx_codec.py codec
        iw, ih = embedded_image_dims(doc_id)
        raw_img, media_filter, img_attrs, img_parms = _embedded_image(doc_id)
        payload = enc_stream(raw_img, imgobj_id)
        if "{pal}" in img_attrs:
            # §7.6.2: strings inside encrypted documents are ciphered with
            # the containing object's key (same cipher as streams); the
            # reader decrypts them transparently in _apply_decryption
            img_attrs = img_attrs.format(
                pal=enc_stream(embedded_palette_bytes(), imgobj_id).hex()
            )
        if "{fn}" in img_attrs:  # v5: reference the Type 4 function object
            img_attrs = img_attrs.format(fn=f"{fnobj_id} 0 R")
        if "{sm}" in img_attrs:
            img_attrs = img_attrs.format(
                sm=f"/SMask {smobj_id} 0 R " if smobj_id is not None else ""
            )
        parms_frag = f"/DecodeParms {img_parms} " if img_parms else ""
        obj_open(imgobj_id)
        b.struct(
            f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
            f"{img_attrs} {parms_frag}"
            f"/Filter {media_filter} /Length {len(payload)} >>\r\nstream\r\n".encode("ascii")
        )
        b.struct(payload)
        b.struct(b"\r\nendstream")
        obj_close()

    if smobj_id is not None:
        iw, ih = embedded_image_dims(doc_id)
        sm_payload = enc_stream(
            zlib.compress(embedded_smask_samples(iw, ih)), smobj_id
        )
        obj_open(smobj_id)
        b.struct(
            f"<< /Type /XObject /Subtype /Image /Width {iw} /Height {ih} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            f"/Filter /FlateDecode /Length {len(sm_payload)} >>\r\nstream\r\n".encode("ascii")
        )
        b.struct(sm_payload)
        b.struct(b"\r\nendstream")
        obj_close()

    if fnobj_id is not None:
        # the /Separation tint transform stream, ciphered like any other
        # stream when the document is encrypted
        fpayload = enc_stream(SEPARATION_PS_PROGRAM, fnobj_id)
        obj_open(fnobj_id)
        b.struct(
            f"<< /FunctionType 4 /Domain [0 1] /Range [0 1] "
            f"/Length {len(fpayload)} >>\r\nstream\r\n".encode("ascii")
        )
        b.struct(fpayload)
        b.struct(b"\r\nendstream")
        obj_close()

    for p, t in pages:
        res = f"<< /Font << /F1 {FONT} {FONT_GEN} R >>"
        if imgobj_id is not None:
            res += f" /XObject << /Im1 {imgobj_id} 0 R >>"
        res += " >>"
        entry = f"<< /Type /Page /Parent {PAGESROOT} 0 R /MediaBox [0 0 612 792] /Resources {res}"
        if t:
            entry += f" /Contents {content_ids[p]} 0 R"
        entry += " >>"
        obj_open(page_ids[p])
        b.struct(entry.encode("ascii"))
        obj_close()

    # content streams: true binary Flate, RC4-encrypted when the doc is
    for p, t in pages:
        if not t:
            continue
        plain = _content_plain_binary(t, p, r)
        payload = enc_stream(zlib.compress(plain), content_ids[p])
        obj_open(content_ids[p])
        b.struct(f"<< /Length {len(payload)} /Filter /FlateDecode >>\r\nstream\r\n".encode("ascii"))
        b.text_payload(payload)
        b.struct(b"\r\nendstream")
        obj_close()

    if enc_id is not None:
        obj_open(enc_id)
        if r["aes256"]:
            b.struct(
                f"<< /Filter /Standard /V 5 /R 6 /Length 256 "
                f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                f"/StmF /StdCF /StrF /StdCF /P {P_FLAGS} "
                f"/U <{u_entry.hex()}> /UE <{ue_entry.hex()}> "
                f"/O <{o_entry.hex()}> /OE <{oe_entry.hex()}> >>".encode("ascii")
            )
        elif r["aes"]:
            b.struct(
                f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                f"/StmF /StdCF /StrF /StdCF /P {P_FLAGS} "
                f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> >>".encode("ascii")
            )
        else:
            b.struct(
                f"<< /Filter /Standard /V 1 /R 2 /Length 40 /P {P_FLAGS} "
                f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> >>".encode("ascii")
            )
        obj_close()

    trailer_extra = ""
    if enc_id is not None:
        trailer_extra = f" /Encrypt {enc_id} 0 R /ID [<{id0.hex()}> <{id0.hex()}>]"

    n_objs = next_id
    if not r["xref_stream"]:
        xref_at = b.struct(b"xref\r\n")
        b.struct(f"0 {n_objs}\r\n".encode("ascii"))
        b.struct(b"0000000000 65535 f \r\n")
        for oid in range(1, n_objs):
            off, gen = offsets[oid]
            # ISO 32000 §7.5.4: entries are EXACTLY 20 bytes — with a CRLF
            # end-of-line there is no space before it
            b.struct(f"{off:010d} {gen:05d} n\r\n".encode("ascii"))
        b.struct(
            f"trailer\r\n<< /Size {n_objs} /Root {CATALOG} 0 R{trailer_extra} >>\r\n"
            f"startxref\r\n{xref_at}\r\n%%EOF\r\n".encode("ascii")
        )
    else:
        # binary (unarmored) xref stream; NEVER encrypted (ISO 32000 §7.5.8.2)
        xref_id = n_objs
        rows = bytearray()
        rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for oid in range(1, n_objs):
            if objstm_id is not None and oid == CATALOG:
                # type-2 entry: (container ObjStm object number, index within)
                rows += bytes([2]) + objstm_id.to_bytes(4, "big") + (0).to_bytes(2, "big")
            else:
                off, gen = offsets[oid]
                rows += bytes([1]) + off.to_bytes(4, "big") + gen.to_bytes(2, "big")
        xref_at = b.pos
        rows += bytes([1]) + xref_at.to_bytes(4, "big") + (0).to_bytes(2, "big")
        payload = zlib.compress(bytes(rows))
        obj_open(xref_id)
        b.struct(
            f"<< /Type /XRef /Size {n_objs + 1} /W [1 4 2] /Root {CATALOG} 0 R{trailer_extra} "
            f"/Filter /FlateDecode /Length {len(payload)} >>\r\nstream\r\n".encode("ascii")
        )
        b.struct(payload)
        b.struct(b"\r\nendstream\r\nendobj\r\n")
        b.struct(f"startxref\r\n{xref_at}\r\n%%EOF\r\n".encode("ascii"))

    doc_bytes = b.finish()
    return {
        "doc_id": doc_id,
        "bytes": doc_bytes,
        "span_rows": b.span_rows(),
        "expected": expected_spans_binary(doc_id, text),
    }


def _truncate_span_rows(rows: list[dict], cut: int) -> list[dict]:
    out = []
    for r in rows:
        if r["offset"] >= cut:
            continue
        t = r["text"]
        if t is not None and r["offset"] + len(t) > cut:
            r = dict(r, text=t[: cut - r["offset"]])
        out.append(r)
    return out


def _reslice_span_rows(rows: list, blob: bytes) -> list:
    """Re-derive span_rows from LENGTH-PRESERVING in-place damage: each
    row keeps its offset and length but re-reads its text from the
    mutated bytes — the Spark corpus reassembles documents from
    span_rows, so damage must live there too."""
    out = []
    for r in rows:
        if r["text"] is None:
            out.append(r)
            continue
        off = r["offset"]
        out.append(dict(r, text=blob[off : off + len(r["text"])].decode("latin-1")))
    return out


def build_document_damaged(doc_id: int, text: str) -> dict:
    """Family M at corpus scale, four damage arms with the UNDAMAGED span
    expectation as the oracle: %4==0 classic footer cut (reverse-trailer
    recovery), %4==1 xref-STREAM footer cut (no trailer keyword exists —
    the scan synthesizes one from the newest /Type /Catalog object),
    %8==2 catalog loss (orphan-page reconstruction; hidden-OCG docs
    excluded), %8==6 xref offset slop (+-64-byte header re-sync)."""
    d = build_document(doc_id, text)
    if doc_id % 4 == 0 or doc_id % 4 == 1:
        # cut at the FIRST startxref: incremental-update docs (%19) carry a
        # second footer, and cutting only the last one would leave a valid
        # anchor — the recovery path would silently not be exercised.
        # Even docs exercise the classic reverse-trailer recovery; ODD
        # docs are xref-STREAM layouts with no trailer keyword at all —
        # their recovery synthesizes the trailer from the scanned
        # /Type /Catalog object (the modern-PDF repair path)
        cut = d["bytes"].find(b"startxref")
        d = dict(
            d,
            bytes=d["bytes"][:cut],
            span_rows=_truncate_span_rows(d["span_rows"], cut),
        )
    elif doc_id % 8 == 2 and doc_id % 29 != 11:
        # CATALOG-LOSS arm: every `1 0 obj` body (incremental docs carry a
        # re-written catalog too) is blanked IN PLACE — same byte length,
        # so the xref stays valid but /Root resolves to nothing and the
        # kernel must fall back to the orphan-page scan.  Hidden-OCG docs
        # (%29==11) are excluded: their layer suppression lives in the
        # catalog's /OCProperties, so catalog loss would legitimately
        # change the spans and break the undamaged-expectation oracle.
        import re as _re

        blob = bytearray(d["bytes"])
        for m in list(_re.finditer(rb"(?<![0-9])1 0 obj", bytes(blob))):
            start = m.start()
            end = blob.find(b"endobj", start)
            if end == -1:
                continue
            blob[start + 7 : end] = b" " * (end - start - 7)
        d = dict(d, bytes=bytes(blob), span_rows=_reslice_span_rows(d["span_rows"], bytes(blob)))
    elif doc_id % 8 == 6:
        # OFFSET-SLOP arm (the broken-writer classic): every in-use
        # classic-xref entry's 10-digit offset is bumped by +3 in place —
        # the kernel's +-64-byte header re-sync must repair every object
        # and extract the undamaged spans (plus one repair error row per
        # object).
        import re as _re

        blob = bytearray(d["bytes"])
        for m in _re.finditer(rb"(?m)^(\d{10}) (\d{5}) n", bytes(blob)):
            fixed = int(m.group(1)) + 3
            blob[m.start(1) : m.start(1) + 10] = f"{fixed:010d}".encode("ascii")
        d = dict(d, bytes=bytes(blob), span_rows=_reslice_span_rows(d["span_rows"], bytes(blob)))
    return d


PROTECTED_USER_PWD = b"hunter2"
PROTECTED_OWNER_PWD = b"admin123"


def build_document_protected(doc_id: int, text: str) -> dict:
    """Password-protected family: EVERY doc is encrypted (RC4 V1/R2, AESV2
    V4/R4 or AESV3 V5/R6 per the binary_rules cipher mix) with a real user
    password — the shape the parser rejects without credentials.  The
    extraction query supplies ``PROTECTED_USER_PWD``; pytest additionally
    exercises the owner-password recovery path (Algorithm 7 / 2.A-owner)
    with ``PROTECTED_OWNER_PWD``."""
    return build_document_binary(
        doc_id,
        text,
        user_pwd=PROTECTED_USER_PWD,
        owner_pwd=PROTECTED_OWNER_PWD,
        force_encrypted=True,
    )


# --- two-column layout family (reading-order evidence) ---------------------
# Page geometry: two columns at x = 72 / 306, up to 3 text lines per column,
# 3 words per line (18 words/page).  The content stream emits lines in
# ROW-MAJOR INTERLEAVED order (row 0 left, row 0 right, row 1 left, ...) so
# stream order differs from reading order (left column top-to-bottom, then
# right column) on every page with >= 3 non-empty lines.  Words within a
# line are shown as separate TJ array elements separated by a -300
# kerning adjustment and NO space characters — the extractor must interpret
# TJ numeric offsets as inter-word gaps (threshold: see
# core.extract.KERN_SPACE_THRESHOLD) to reproduce the spaced text.
COLUMN_X = (72, 306)
COLUMN_ROWS = 3
COLUMN_WPL = 3
COLUMN_KERN = -300
HEADING_PT = 18  # font size of the first line (page 0, row 0, left col)


def columns_lines(doc_id: int, text: str) -> list[tuple[int, int, int, str]]:
    """(page, row, col, text) for the two-column family in STREAM order
    (row-major interleaved).  Line i of a page sits at row i//2, column
    i%2; a line exists when the text has any word at its start index
    (mirrors the DuckDB oracle's ``len(w) > base`` guard)."""
    words = text.split(" ")
    per_page = 2 * COLUMN_ROWS * COLUMN_WPL
    out = []
    for p in range(1 + doc_id % 2):
        for i in range(2 * COLUMN_ROWS):
            base = p * per_page + i * COLUMN_WPL
            if len(words) > base:
                out.append((p, i // 2, i % 2, " ".join(words[base : base + COLUMN_WPL])))
    return out


def _pdf_escape(s: str) -> str:
    """Escape a literal-string payload (ISO 32000 §7.3.4.2): backslash
    first, then both parens — so arbitrary word content (unbalanced
    parens included) round-trips through the tokenizer's escape
    handling.  Transparent to every oracle: the kernel decodes the
    escapes back to the raw text."""
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def columns_rotation(doc_id: int) -> int:
    """/Rotate for the columns family: cycles 0/90/180/270 by doc_id.
    Rotated docs get a SWAPPED MediaBox (792x612 for 90/270) so the
    READING-space page is always 612x792 — the analytic line grid (and
    the oracle) is rotation-invariant; only a kernel that notices
    /Rotate + /MediaBox and un-rotates the origins reproduces it."""
    return (doc_id % 4) * 90


def _rot_to_pdf(rx: int, ry: int, rot: int, w: int, h: int) -> tuple[int, int]:
    """READING-space line origin -> PDF-space coordinates for a page that
    the viewer will rotate by ``rot`` clockwise (inverse of the kernel's
    ``core.extract._unrotate``)."""
    if rot == 90:
        return (w - ry, rx)
    if rot == 180:
        return (w - rx, h - ry)
    if rot == 270:
        return (ry, h - rx)
    return (rx, ry)


def _columns_content(plines: list[tuple[int, int, int, str]], rot: int = 0, w: int = 612, h: int = 792) -> bytes:
    """One page's content stream: alternate ABSOLUTE (Tm) and RELATIVE (Td
    from the previous line's origin, ISO 32000 §9.4.2) positioning per
    line, words as kerned TJ pieces with no space glyphs; line origins
    are emitted in PDF space (pre-rotated for the page's /Rotate)."""
    parts = ["BT /F1 12 Tf "]
    px = py = 0
    for j, (p, row, col, ltext) in enumerate(plines):
        x, y = _rot_to_pdf(COLUMN_X[col], 720 - 14 * row, rot, w, h)
        # the document's FIRST line (page 0, row 0, left column) is the
        # HEADING, shown at 18 pt — observed only by doc_headings
        size = HEADING_PT if (p, row, col) == (0, 0, 0) else 12
        tj = "[" + f" {COLUMN_KERN} ".join(f"({_pdf_escape(w_)})" for w_ in ltext.split(" ")) + "] TJ "
        if j % 2 == 0:
            parts.append(f"/F1 {size} Tf 1 0 0 1 {x} {y} Tm {tj}")
        else:
            parts.append(f"/F1 {size} Tf {x - px} {y - py} Td {tj}")
        px, py = x, y
    parts.append("ET")
    # latin-1: byte-faithful for any code point < 256 in word content
    return "".join(parts).encode("latin-1")


def build_document_columns(doc_id: int, text: str) -> dict:
    """Two-column family: a clean classic-xref document (no media, no
    encryption) whose pages lay text in two columns with kerning-implied
    word gaps.  Only the ``extract_columns`` query (layout kernel +
    column-aware reading-order re-rank) observes this family."""
    lines = columns_lines(doc_id, text)
    n_pages = 1 + doc_id % 2
    rot = columns_rotation(doc_id)
    pw, ph = (792, 612) if rot in (90, 270) else (612, 792)
    # inheritance exercise: odd docs put /Rotate+/MediaBox on the PAGES
    # node (inherited, §7.7.3.4), even docs on each page directly
    inherited = doc_id % 2 == 1
    page_geo = "" if inherited else f"/MediaBox [0 0 {pw} {ph}] " + (
        f"/Rotate {rot} " if rot else ""
    )
    pages_geo = (
        f"/MediaBox [0 0 {pw} {ph}] " + (f"/Rotate {rot} " if rot else "")
        if inherited
        else ""
    )

    b = _Builder()
    offsets: dict[int, int] = {}
    b.struct(f"%PDF-1.{4 + doc_id % 4}\n".encode("ascii"))
    CATALOG, PAGESROOT, FONT = 1, 2, 3
    page_ids = {p: 4 + p for p in range(n_pages)}
    content_ids = {p: 4 + n_pages + p for p in range(n_pages)}
    offsets[CATALOG] = b.struct(
        f"{CATALOG} 0 obj << /Type /Catalog /Pages {PAGESROOT} 0 R >> endobj\n".encode("ascii")
    )
    kids = " ".join(f"{page_ids[p]} 0 R" for p in range(n_pages))
    offsets[PAGESROOT] = b.struct(
        f"{PAGESROOT} 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} "
        f"{pages_geo}>> endobj\n".encode("ascii")
    )
    offsets[FONT] = b.struct(
        f"{FONT} 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n".encode("ascii")
    )
    for p in range(n_pages):
        offsets[page_ids[p]] = b.struct(
            (
                f"{page_ids[p]} 0 obj << /Type /Page /Parent {PAGESROOT} 0 R "
                f"/Resources << /Font << /F1 {FONT} 0 R >> >> "
                f"{page_geo}/Contents {content_ids[p]} 0 R >> endobj\n"
            ).encode("ascii")
        )
    for p in range(n_pages):
        body = _columns_content([ln for ln in lines if ln[0] == p], rot, pw, ph)
        offsets[content_ids[p]] = b.struct(
            f"{content_ids[p]} 0 obj << /Length {len(body)} >> stream\n".encode("ascii")
        )
        b.text_payload(body)
        b.struct(b"\nendstream endobj\n")
    n_objs = 3 + 2 * n_pages
    xref_pos = b.pos
    b.struct(f"xref\n0 {n_objs + 1}\n".encode("ascii"))
    b.struct(b"0000000000 65535 f\r\n")
    for i in range(1, n_objs + 1):
        b.struct(f"{offsets[i]:010d} 00000 n\r\n".encode("ascii"))
    b.struct(
        (
            f"trailer << /Size {n_objs + 1} /Root {CATALOG} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF"
        ).encode("ascii")
    )
    return {"doc_id": doc_id, "bytes": b.finish(), "span_rows": b.span_rows()}


def expected_columns(doc_id: int, text: str) -> list[tuple[int, int, int, float, float, str]]:
    """Analytic ground truth for ``extract_columns``: (ord, page, col, x,
    y, text) in READING order (page, column, row)."""
    ordered = sorted(columns_lines(doc_id, text), key=lambda l: (l[0], l[2], l[1]))
    return [
        (i, p, c, float(COLUMN_X[c]), float(720 - 14 * r), t)
        for i, (p, r, c, t) in enumerate(ordered)
    ]


# ---------------------------------------------------------------------------
# Table family: pages carrying a rows x cols cell grid plus non-table lines
# (title, footer, staggered trap lines, an optional second table) so the
# DataFrame-side table DETECTOR (pdfparser_spark/tables.py) has real
# decisions to make: cells align on a shared x grid across consecutive
# y-lines; everything else must be excluded.

TABLE_X = (72, 200, 328, 456)  # column grid x origins (max 4 cols)
TABLE_TOP_Y = 700  # first table row baseline
TABLE_ROW_DY = 18  # row pitch
TABLE2_TOP_Y = 400  # second table (doc_id % 7 == 0): far below the first
TABLE_TITLE_Y = 740  # single-cell title line (must NOT become a table row)
TABLE_FOOTER_Y = 100  # single-cell footer line
# trap lines (doc_id % 5 == 0, page 0): two consecutive MULTI-cell lines
# whose x grids differ between the lines — each is a 1-row group, so the
# min-rows >= 2 rule must drop both
TABLE_TRAPS = ((560, (72, 300)), (542, (82, 310)))


def table_shape(doc_id: int) -> tuple[int, int]:
    """(n_rows, n_cols) of the table family's main per-page grid."""
    return 2 + (doc_id // 3) % 3, 2 + doc_id % 3


def table_cell_text(words: list[str], doc_id: int, p: int, r: int, c: int, second: bool = False) -> str:
    """Cell content is data-driven: word at index 2 + p*nr*nc + r*nc + c
    (second table: 100 + p*2*nc + r*nc + c), modulo the word count; an
    empty word falls back to the deterministic placeholder c{p}{r}{c} so
    every grid cell exists (the detector requires a full x signature).
    The LAST column is numeric — str((2 + wi)*37 % 9973) — so column-type
    inference (table_column_profile) has a real decision per table."""
    nr, nc = table_shape(doc_id)
    wi = (100 + p * 2 * nc + r * nc + c) if second else (2 + p * nr * nc + r * nc + c)
    if c == nc - 1:
        return str((2 + wi) * 37 % 9973)
    w = words[wi % len(words)]
    return w if w else f"c{p}{r}{c}"


def table_lines(doc_id: int, text: str) -> list[tuple[int, int, int, str]]:
    """EVERY line the table family draws, as (page, x, y, text) in stream
    order — title, main-grid cells, traps, optional second table, footer."""
    words = (text or "").split(" ")
    nr, nc = table_shape(doc_id)
    out = []
    for p in range(1 + doc_id % 2):
        out.append((p, 72, TABLE_TITLE_Y, "Quarterly Report"))
        for r in range(nr):
            for c in range(nc):
                out.append(
                    (p, TABLE_X[c], TABLE_TOP_Y - TABLE_ROW_DY * r, table_cell_text(words, doc_id, p, r, c))
                )
        if p == 0 and doc_id % 5 == 0:
            for k, (ty, txs) in enumerate(TABLE_TRAPS):
                for j, tx in enumerate(txs):
                    out.append((p, tx, ty, f"t{k}{j}"))
        if doc_id % 7 == 0:
            for r in range(2):
                for c in range(nc):
                    out.append(
                        (
                            p,
                            TABLE_X[c],
                            TABLE2_TOP_Y - TABLE_ROW_DY * r,
                            table_cell_text(words, doc_id, p, r, c, second=True),
                        )
                    )
        out.append((p, 72, TABLE_FOOTER_Y, "end of report"))
    return out


def expected_table_cells(doc_id: int, text: str) -> list[tuple[int, int, int, int, float, float, str]]:
    """Analytic ground truth for ``extract_table_cells``: (page, table_idx,
    row_idx, col_idx, x, y, cell) — grid cells only; title/footer/traps
    excluded by the detector's min-cols/min-rows/signature rules."""
    words = (text or "").split(" ")
    nr, nc = table_shape(doc_id)
    out = []
    for p in range(1 + doc_id % 2):
        for r in range(nr):
            for c in range(nc):
                out.append(
                    (
                        p, 0, r, c,
                        float(TABLE_X[c]), float(TABLE_TOP_Y - TABLE_ROW_DY * r),
                        table_cell_text(words, doc_id, p, r, c),
                    )
                )
        if doc_id % 7 == 0:
            for r in range(2):
                for c in range(nc):
                    out.append(
                        (
                            p, 1, r, c,
                            float(TABLE_X[c]), float(TABLE2_TOP_Y - TABLE_ROW_DY * r),
                            table_cell_text(words, doc_id, p, r, c, second=True),
                        )
                    )
    return out


def _table_content(plines: list[tuple[int, int, int, str]]) -> bytes:
    """One page's content stream: every line shown at an ABSOLUTE Tm
    origin (positioning-operator variance lives in the other families)."""
    parts = ["BT /F1 12 Tf "]
    for _p, x, y, ltext in plines:
        parts.append(f"1 0 0 1 {x} {y} Tm ({_pdf_escape(ltext)}) Tj ")
    parts.append("ET")
    return "".join(parts).encode("latin-1")


def build_document_table(doc_id: int, text: str) -> dict:
    """Table family: a clean classic-xref document whose pages draw an
    aligned cell grid among non-table lines.  Only ``extract_table_cells``
    (layout kernel + DataFrame-side table detector) observes this family."""
    lines = table_lines(doc_id, text)
    n_pages = 1 + doc_id % 2

    b = _Builder()
    offsets: dict[int, int] = {}
    b.struct(f"%PDF-1.{4 + doc_id % 4}\n".encode("ascii"))
    CATALOG, PAGESROOT, FONT = 1, 2, 3
    page_ids = {p: 4 + p for p in range(n_pages)}
    content_ids = {p: 4 + n_pages + p for p in range(n_pages)}
    offsets[CATALOG] = b.struct(
        f"{CATALOG} 0 obj << /Type /Catalog /Pages {PAGESROOT} 0 R >> endobj\n".encode("ascii")
    )
    kids = " ".join(f"{page_ids[p]} 0 R" for p in range(n_pages))
    offsets[PAGESROOT] = b.struct(
        f"{PAGESROOT} 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> endobj\n".encode("ascii")
    )
    offsets[FONT] = b.struct(
        f"{FONT} 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n".encode("ascii")
    )
    for p in range(n_pages):
        offsets[page_ids[p]] = b.struct(
            (
                f"{page_ids[p]} 0 obj << /Type /Page /Parent {PAGESROOT} 0 R "
                f"/Resources << /Font << /F1 {FONT} 0 R >> >> "
                f"/MediaBox [0 0 612 792] /Contents {content_ids[p]} 0 R >> endobj\n"
            ).encode("ascii")
        )
    for p in range(n_pages):
        body = _table_content([ln for ln in lines if ln[0] == p])
        offsets[content_ids[p]] = b.struct(
            f"{content_ids[p]} 0 obj << /Length {len(body)} >> stream\n".encode("ascii")
        )
        b.text_payload(body)
        b.struct(b"\nendstream endobj\n")
    n_objs = 3 + 2 * n_pages
    xref_pos = b.pos
    b.struct(f"xref\n0 {n_objs + 1}\n".encode("ascii"))
    b.struct(b"0000000000 65535 f\r\n")
    for i in range(1, n_objs + 1):
        b.struct(f"{offsets[i]:010d} 00000 n\r\n".encode("ascii"))
    b.struct(
        (
            f"trailer << /Size {n_objs + 1} /Root {CATALOG} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF"
        ).encode("ascii")
    )
    return {"doc_id": doc_id, "bytes": b.finish(), "span_rows": b.span_rows()}


# ---------------------------------------------------------------------------
# Advance family: one-page documents whose lines are shown as MULTIPLE text
# segments on one baseline with NO positioning operator between them, under
# per-doc character spacing (Tc), word spacing (Tw), horizontal scaling (Tz)
# and a TJ kern between the last two segments.  A second segment's x position
# is observable ONLY by a kernel that models glyph-width advance from the
# font's /Widths array (ISO 32000 §9.4.4, §9.3.2-9.3.4) — the documented
# approximation the plain layout kernel makes ("advance is NOT modeled").
# All advance arithmetic is exact integer micro-points (1e-5 pt): widths are
# integers, font sizes are integers, Tc/Tw are exact milli-point values and
# Tz is an integer percent, so the DuckDB oracle reproduces every cursor
# position bit-for-bit with BIGINT algebra.

ADV_WPL = 6  # words per line
ADV_MAX_LINES = 7
ADV_LINE_DY = 16  # baseline pitch: y = 720 - 16 * line


def adv_font_size(doc_id: int) -> int:
    return 12 + (doc_id % 4) * 2


def adv_tc_milli(doc_id: int) -> int:
    """Character spacing in milli-points: 0 / 250 / 500 (0, .25, .5 pt)."""
    return (doc_id % 3) * 250


def adv_tw_milli(doc_id: int) -> int:
    """Word spacing in milli-points: 0 / 500."""
    return (doc_id % 2) * 500


def adv_tz_pct(doc_id: int) -> int:
    """Horizontal scaling percent (§9.3.4): 50 on every 5th doc, else 100."""
    return 50 if doc_id % 5 == 0 else 100


def adv_kern(doc_id: int) -> int:
    """TJ kern (thousandths of em, §9.4.3) between segments 1 and 2;
    positive moves LEFT, negative RIGHT — both signs exercised."""
    return 300 - (doc_id % 7) * 150


def adv_width(code: int) -> int:
    """Per-glyph width in 1/1000 text-space units — the /Widths entry the
    font carries for ``code`` (32..126)."""
    return 300 + (code % 8) * 50


def adv_is_cid(doc_id: int) -> bool:
    """Every 11th+6 doc uses a COMPOSITE font (Type0/Identity-H, §9.7):
    strings are 2-byte hex codes, widths come from the descendant
    CIDFont's /W table (same values, keyed by CID = code), text decodes
    through a 2-byte ToUnicode CMap — and Tw does NOT apply (word
    spacing hits the SINGLE-BYTE code 32 only, §9.3.3).  The CMap's
    bfchar section OVERRIDES two bfrange identities (§9.10.3: later
    entries win) with non-ASCII targets — 'e' -> U+00E9 and 'o' ->
    U+1F600, the second a UTF-16BE SURROGATE PAIR — so the decode path
    is observably Unicode-correct end to end (kernel, Arrow transfer,
    parquet, and both SQL engines), while the CURSOR still runs on the
    original CODES (widths are keyed by CID, not by the mapped text)."""
    return doc_id % 11 == 6


# the CID ToUnicode bfchar overrides: (shown char, mapped replacement)
ADV_CID_MAP = (("e", "é"), ("o", "\U0001f600"))


def adv_is_vert(doc_id: int) -> bool:
    """Every OTHER composite doc writes in VERTICAL mode (§9.7.4.3):
    /Encoding /Identity-V, glyphs advance DOWN the page by the
    descendant CIDFont's w1 metric — /DW2's second element by default,
    /W2 overrides per CID — and the §9.4.4 ty formula replaces tx:
    Tz does NOT scale vertical displacement, Tc does apply, Tw still
    can't (2-byte codes).  ``ax_micro`` reports the (negative) vertical
    cursor."""
    return adv_is_cid(doc_id) and (doc_id // 11) % 2 == 1


def adv_w1y(doc_id: int) -> int:
    """Default vertical displacement (per-mille, negative = down the
    page) carried in /DW2 [880 w1y]: -800 / -900 / -1000 by doc_id%3."""
    return -(800 + (doc_id % 3) * 100)


def adv_has_w2(doc_id: int) -> bool:
    """Every other vertical doc ALSO carries a /W2 override table: the
    range form for lowercase a-z and the triplet form for the space —
    both §9.7.4.3 entry shapes — at w1y + 200 (a smaller drop)."""
    return adv_is_vert(doc_id) and (doc_id // 11) % 4 == 3


def adv_w1(doc_id: int, code: int) -> int:
    """Effective w1 (vertical per-mille displacement) of ``code``."""
    if adv_has_w2(doc_id) and (97 <= code <= 122 or code == 32):
        return adv_w1y(doc_id) + 200
    return adv_w1y(doc_id)


def adv_cid_text(seg: str) -> str:
    """The decoded text of a CID-doc segment (bfchar overrides applied)."""
    for src, dst in ADV_CID_MAP:
        seg = seg.replace(src, dst)
    return seg


def adv_is_type3(doc_id: int) -> bool:
    """Every 13th+2 non-CID doc uses a TYPE3 font (§9.6.4): glyphs are
    content-stream procedures (/CharProcs), codes map to glyph names via
    an /Encoding /Differences table (uniXXXX names), and — the part the
    advance kernel must honor — /Widths values live in GLYPH space, so
    the text-space advance is width × FontMatrix[0].  The family's
    /FontMatrix is [0.002 0 0 0.002 0 0]: effective width = 2× the
    per-mille value, which the oracle replays as an integer factor."""
    return doc_id % 13 == 2 and not adv_is_cid(doc_id)


def adv_is_courier(doc_id: int) -> bool:
    """Every 13th+9 non-CID doc uses /BaseFont /Courier with NO /Widths
    at all — a standard-14 font whose metrics the viewer must supply
    (§9.6.2.2).  Courier is monospace at 600/1000 em in the public Adobe
    Core-14 AFMs, so every glyph advances 600."""
    return doc_id % 13 == 9 and not adv_is_cid(doc_id)


def adv_is_helv(doc_id: int) -> bool:
    """Every 13th+11 non-CID doc uses width-less /BaseFont /Helvetica —
    the PROPORTIONAL standard-14 case (§9.6.2.2): unlike Courier there is
    no constant to fall back on, the consumer must carry the real per-
    glyph AFM table (core.extract.HELVETICA_WIDTHS, public Adobe Core-14
    metrics), and the oracle replays it as a 95-element list literal."""
    return doc_id % 13 == 11 and not adv_is_cid(doc_id)


def adv_is_embedded(doc_id: int) -> bool:
    """Every 13th+5 non-CID doc has NO /Widths and no standard-14 name —
    its metrics live only INSIDE the embedded Type 1 program
    (/FontDescriptor /FontFile): the clear header's built-in /Encoding
    maps codes to /gNN glyphs, the eexec-encrypted /CharStrings carry
    each glyph's hsbw width (core/type1.py pair).  Width is PER-DOC
    (``adv_emb_width``), so a kernel skipping the decryption cannot fake
    the cursor; every other embedded doc serializes eexec in the spec's
    ASCII-hex alternate form."""
    return doc_id % 13 == 5 and not adv_is_cid(doc_id)


def adv_emb_width(doc_id: int, code: int) -> int:
    """Glyph width the embedded program declares for ``code``: doc-mixed
    so the only way to reproduce it is to read this document's font."""
    return 350 + ((code + doc_id) % 6) * 25


def adv_is_truetype(doc_id: int) -> bool:
    """Every 13th+7 non-CID doc embeds a TRUETYPE program
    (/FontDescriptor /FontFile2, core/truetype.py pair): widths come
    from the sfnt's own hmtx table through the cmap format-4 mapping,
    scaled by head.unitsPerEm — 500 here, so hmtx carries w/2 and the
    1000/upem scaling must be real (every family width is even)."""
    return doc_id % 13 == 7 and not adv_is_cid(doc_id)


def adv_tt_width(doc_id: int, code: int) -> int:
    """Text-space width (per mille) the TrueType variant declares —
    distinct formula from the Type 1 family, also doc-mixed."""
    return 400 + ((2 * code + doc_id) % 5) * 30


def adv_is_cff(doc_id: int) -> bool:
    """Every 13th+3 non-CID doc embeds a CFF program (/FontDescriptor
    /FontFile3 /Subtype /Type1C, core/cff.py pair): widths are Type 2
    charstring leading operands (nominalWidthX-relative), EXCEPT codes
    divisible by 16, whose charstrings omit the operand and ride the
    Private DICT's defaultWidthX — both width paths observable."""
    return doc_id % 13 == 3 and not adv_is_cid(doc_id)


CFF_DEFAULT_W = 480
CFF_NOMINAL_W = 107


def adv_cff_width(doc_id: int, code: int) -> int:
    """Width the CFF variant declares: the defaultWidthX constant for
    code%16==0, a doc-mixed formula otherwise."""
    if code % 16 == 0:
        return CFF_DEFAULT_W
    return 380 + ((3 * code + doc_id) % 7) * 20


def adv_rise_milli(doc_id: int) -> int:
    """Text rise (Ts, §9.3.7) applied to SEGMENT 1 only on every 19th+5
    doc: 0.25/0.5/0.75/1.0 pt (dyadic — float-exact in both engines)."""
    return 250 * (1 + doc_id % 4) if doc_id % 19 == 5 else 0


def adv_tr_mode(doc_id: int) -> int:
    """Render mode (Tr, §9.3.6) for SEGMENT 1 on every 17th+4 doc: mode 3
    (invisible — the OCR-text-layer convention).  The glyphs still
    advance the cursor and the span is still emitted; only the reported
    ``mode`` column observes it."""
    return 3 if doc_id % 17 == 4 else 0


def adv_eff_width(doc_id: int, code: int) -> int:
    """Effective per-mille text-space width of ``code`` under the doc's
    font kind (the value the kernel's folded lookup must produce)."""
    if adv_is_courier(doc_id):
        return 600
    if adv_is_helv(doc_id):
        from .core.extract import HELVETICA_WIDTHS

        return HELVETICA_WIDTHS[code - 32] if 32 <= code < 127 else 500
    if adv_is_embedded(doc_id):
        return adv_emb_width(doc_id, code)
    if adv_is_truetype(doc_id):
        return adv_tt_width(doc_id, code)
    if adv_is_cff(doc_id):
        return adv_cff_width(doc_id, code)
    return adv_width(code) * (2 if adv_is_type3(doc_id) else 1)


def advance_lines(doc_id: int, text: str) -> list[tuple[int, list[str]]]:
    """(line_idx, words) — ADV_WPL-word slices, capped at ADV_MAX_LINES
    (mirrors the oracle's ``len(w) > i*6`` guard)."""
    words = text.split(" ")
    out = []
    for i in range(ADV_MAX_LINES):
        base = i * ADV_WPL
        if len(words) > base:
            out.append((i, words[base : base + ADV_WPL]))
    return out


def advance_segments(lw: list[str]) -> list[str]:
    """A line's three shown segments: words 0-2 (Tj), word 3 and words 4-5
    (two TJ string elements separated by the kern).  Empty segments are
    not shown."""
    return [" ".join(lw[0:3]), " ".join(lw[3:4]), " ".join(lw[4:6])]


def _adv_seg_width_micro(doc_id: int, seg: str, fs: int, tc: int, tw: int, tz: int) -> int:
    """Advance of one shown string in micro-points (1e-5 pt): per glyph
    eff_w/1000 * fs * tz/100 points, plus Tc per glyph and Tw per
    space-32 (§9.3.2-9.3.3; Tz multiplies all horizontal displacements);
    the effective width folds in the doc's font kind (Type3 FontMatrix /
    Courier built-ins).  VERTICAL docs use the §9.4.4 ty formula instead:
    w1·fs + Tc per glyph, un-scaled by Tz, Tw never (2-byte codes)."""
    total = 0
    if adv_is_vert(doc_id):
        for ch in seg.encode("latin-1"):
            total += adv_w1(doc_id, ch) * fs * 100 + tc * 100
        return total
    for ch in seg.encode("latin-1"):
        total += adv_eff_width(doc_id, ch) * fs * tz + tc * tz + (tw * tz if ch == 32 else 0)
    return total


def expected_advance(
    doc_id: int, text: str
) -> list[tuple[int, int, int, float, float, int, str, int, int]]:
    """Analytic ground truth for ``extract_layout_advance``: (ord, page,
    line, x, y, ax_micro, text, size, mode) in stream order.  CID docs
    zero the EFFECTIVE word spacing (Tw is written but can never apply
    to 2-byte codes, §9.3.3).  Segment 1 rides at the doc's text rise
    (y + Ts) and carries the doc's render mode; rise and mode never
    touch the cursor (§9.3.6/§9.3.7 leave the displacement algebra
    alone)."""
    fs, tc, tw, tz = (
        adv_font_size(doc_id), adv_tc_milli(doc_id), adv_tw_milli(doc_id), adv_tz_pct(doc_id),
    )
    if adv_is_cid(doc_id):
        tw = 0
    k = adv_kern(doc_id)
    rise = adv_rise_milli(doc_id)
    mode = adv_tr_mode(doc_id)
    out = []
    for li, lw in advance_lines(doc_id, text):
        cursor = 0
        segs = advance_segments(lw)
        for si, seg in enumerate(segs):
            if si == 2 and seg:
                # the TJ kern precedes segment 2; Tz never scales the
                # vertical translation (§9.4.4)
                cursor -= k * fs * (100 if adv_is_vert(doc_id) else tz)
            if seg:
                out.append(
                    (
                        len(out), 0, li, 72.0,
                        720 - ADV_LINE_DY * li + (rise / 1000.0 if si == 1 else 0.0),
                        cursor, adv_cid_text(seg) if adv_is_cid(doc_id) else seg,
                        fs, mode if si == 1 else 0,
                    )
                )
            cursor += _adv_seg_width_micro(doc_id, seg, fs, tc, tw, tz)
    return out


def _milli_str(m: int) -> str:
    """Exact decimal for a milli-point value (250 -> '0.25'); the float
    parse of these strings is exact (dyadic fractions only)."""
    return f"{m // 1000}" if m % 1000 == 0 else f"{m / 1000:g}"


def _hex2(s: str) -> str:
    """2-byte big-endian hex string body for a composite-font show op
    (Identity-H: code == CID == the character's code point)."""
    return "".join(f"{ord(c):04X}" for c in s)


def _advance_content(doc_id: int, lines: list[tuple[int, list[str]]]) -> bytes:
    fs, tc, tw, tz = (
        adv_font_size(doc_id), adv_tc_milli(doc_id), adv_tw_milli(doc_id), adv_tz_pct(doc_id),
    )
    k = adv_kern(doc_id)
    cid = adv_is_cid(doc_id)
    rise = adv_rise_milli(doc_id)
    mode = adv_tr_mode(doc_id)
    show = (lambda s: f"<{_hex2(s)}>") if cid else (lambda s: f"({_pdf_escape(s)})")
    # Tw is written UNCONDITIONALLY — for CID docs it must be inert
    parts = [f"BT /F1 {fs} Tf {_milli_str(tc)} Tc {_milli_str(tw)} Tw {tz} Tz "]
    for li, lw in lines:
        s0, s1, s2 = advance_segments(lw)
        parts.append(f"1 0 0 1 72 {720 - ADV_LINE_DY * li} Tm ")
        if s0:
            parts.append(f"{show(s0)} Tj ")
        if (rise or mode) and s1:
            # Ts/Tr are operators, not TJ elements — the line splits into
            # two TJ arrays so segment 1 alone rides the rise / render
            # mode; Ts/Tr reset no positioning state (the cursor carries
            # straight across, which is exactly what the kernel must get
            # right) and the kern keeps preceding segment 2
            pre = (f"{_milli_str(rise)} Ts " if rise else "") + (f"{mode} Tr " if mode else "")
            post = ("0 Ts " if rise else "") + ("0 Tr " if mode else "")
            parts.append(f"{pre}[{show(s1)}] TJ {post}")
            if s2:
                parts.append(f"[{k} {show(s2)}] TJ ")
        else:
            tj = []
            if s1:
                tj.append(show(s1))
            if s2:
                # the kern ALWAYS precedes segment 2 (expected_advance mirror)
                tj.append(f"{k} {show(s2)}")
            if tj:
                parts.append("[" + " ".join(tj) + "] TJ ")
    parts.append("ET")
    return "".join(parts).encode("latin-1")


def build_document_advance(doc_id: int, text: str) -> dict:
    """Glyph-advance family: a clean one-page classic-xref document whose
    font carries a REAL /FirstChar//Widths table (w(c) = 300 + (c%8)*50)
    and whose lines are multi-segment shows under Tc/Tw/Tz and a TJ kern.
    Only ``extract_layout_advance`` (width-modeling layout kernel)
    observes this family."""
    lines = advance_lines(doc_id, text)
    cid = adv_is_cid(doc_id)
    t3 = adv_is_type3(doc_id)
    mono = adv_is_courier(doc_id)
    helv = adv_is_helv(doc_id)
    emb = adv_is_embedded(doc_id)
    ttf = adv_is_truetype(doc_id)
    cff = adv_is_cff(doc_id)
    b = _Builder()
    offsets: dict[int, int] = {}
    b.struct(f"%PDF-1.{4 + doc_id % 4}\n".encode("ascii"))
    CATALOG, PAGESROOT, FONT, PAGE, CONTENT, DESC, TOUNI = 1, 2, 3, 4, 5, 6, 7
    PROC = 6  # Type3 glyph-procedure stream (slot shared with DESC: disjoint kinds)
    FFILE = 7  # embedded Type1 program (slot shared with TOUNI: disjoint kinds)
    n_objs = 7 if (cid or emb or ttf or cff) else (6 if t3 else 5)
    offsets[CATALOG] = b.struct(
        f"{CATALOG} 0 obj << /Type /Catalog /Pages {PAGESROOT} 0 R >> endobj\n".encode("ascii")
    )
    offsets[PAGESROOT] = b.struct(
        f"{PAGESROOT} 0 obj << /Type /Pages /Kids [{PAGE} 0 R] /Count 1 >> endobj\n".encode("ascii")
    )
    widths = " ".join(str(adv_width(c)) for c in range(32, 127))
    if cid:
        # composite font (§9.7): Type0 -> descendant CIDFontType2 whose
        # /W table carries the SAME width values keyed by CID (= code
        # under Identity-H); /DW covers everything outside 32..126
        enc = "Identity-V" if adv_is_vert(doc_id) else "Identity-H"
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Synth "
                f"/Encoding /{enc} /DescendantFonts [{DESC} 0 R] "
                f"/ToUnicode {TOUNI} 0 R >> endobj\n"
            ).encode("ascii")
        )
    elif t3:
        # Type3 (§9.6.4): every code 32..126 maps to a /uniXXXX glyph name
        # (so the text decode genuinely goes through /Differences), every
        # glyph name maps to the one shared glyph procedure, and /Widths
        # are GLYPH-space values scaled by /FontMatrix [0.002 ...] — the
        # advance kernel must produce eff_w = 2 × the table value.
        names = " ".join(f"/uni{c:04X}" for c in range(32, 127))
        procs = " ".join(f"/uni{c:04X} {PROC} 0 R" for c in range(32, 127))
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type3 "
                f"/FontBBox [0 0 1000 1000] /FontMatrix [0.002 0 0 0.002 0 0] "
                f"/CharProcs << {procs} >> "
                f"/Encoding << /Type /Encoding /Differences [32 {names}] >> "
                f"/FirstChar 32 /LastChar 126 /Widths [{widths}] >> endobj\n"
            ).encode("ascii")
        )
    elif emb:
        # embedded program: NO /Widths, non-standard /BaseFont — the
        # metrics are reachable only through /FontDescriptor /FontFile
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type1 "
                f"/BaseFont /SYNF+EmbOne /FontDescriptor {DESC} 0 R >> endobj\n"
            ).encode("ascii")
        )
    elif ttf:
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /TrueType "
                f"/BaseFont /SYNF+EmbTwo /FontDescriptor {DESC} 0 R >> endobj\n"
            ).encode("ascii")
        )
    elif cff:
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type1 "
                f"/BaseFont /SYNF+EmbThree /FontDescriptor {DESC} 0 R >> endobj\n"
            ).encode("ascii")
        )
    elif mono:
        # standard-14: NO /Widths — the consumer must supply Courier's
        # built-in 600/1000-em monospace metrics (§9.6.2.2)
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type1 "
                f"/BaseFont /Courier >> endobj\n"
            ).encode("ascii")
        )
    elif helv:
        # proportional standard-14: NO /Widths — the consumer must supply
        # Helvetica's per-glyph AFM metrics (§9.6.2.2); a constant cannot
        # fake these, every glyph width is observable in the cursor
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type1 "
                f"/BaseFont /Helvetica >> endobj\n"
            ).encode("ascii")
        )
    else:
        offsets[FONT] = b.struct(
            (
                f"{FONT} 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Synth "
                f"/FirstChar 32 /LastChar 126 /Widths [{widths}] >> endobj\n"
            ).encode("ascii")
        )
    offsets[PAGE] = b.struct(
        (
            f"{PAGE} 0 obj << /Type /Page /Parent {PAGESROOT} 0 R "
            f"/Resources << /Font << /F1 {FONT} 0 R >> >> "
            f"/MediaBox [0 0 612 792] /Contents {CONTENT} 0 R >> endobj\n"
        ).encode("ascii")
    )
    body = _advance_content(doc_id, lines)
    offsets[CONTENT] = b.struct(
        f"{CONTENT} 0 obj << /Length {len(body)} >> stream\n".encode("ascii")
    )
    b.text_payload(body)
    b.struct(b"\nendstream endobj\n")
    if cid:
        # vertical docs carry the §9.7.4.3 vertical metrics: /DW2's w1y
        # default plus (every other one) a /W2 override table in BOTH
        # entry shapes — the a-z range form and the space-32 triplet form
        vm = ""
        if adv_is_vert(doc_id):
            vm = f" /DW2 [880 {adv_w1y(doc_id)}]"
            if adv_has_w2(doc_id):
                lo = adv_w1y(doc_id) + 200
                vm += f" /W2 [32 [{lo} 0 880] 97 122 {lo} 440 880]"
        offsets[DESC] = b.struct(
            (
                f"{DESC} 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
                f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> "
                f"/DW 1000 /W [32 [{widths}]]{vm} >> endobj\n"
            ).encode("ascii")
        )
        cm = (
            b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"1 beginbfrange\n<0020> <007E> <0020>\nendbfrange\n"
            # bfchar OVERRIDES (later entries win, §9.10.3): 'e' -> é and
            # 'o' -> U+1F600 (a UTF-16BE surrogate pair) — decode must be
            # genuinely Unicode, the cursor still keyed by original CID
            b"2 beginbfchar\n<0065> <00E9>\n<006F> <D83DDE00>\nendbfchar\nendcmap\n"
        )
        offsets[TOUNI] = b.struct(
            f"{TOUNI} 0 obj << /Length {len(cm)} >> stream\n".encode("ascii")
        )
        b.text_payload(cm)
        b.struct(b"\nendstream endobj\n")
    if emb:
        from .core import type1 as _t1

        prog = _t1.build_type1_font(
            "SYNF+EmbOne",
            {c: f"g{c}" for c in range(32, 127)},
            {f"g{c}": adv_emb_width(doc_id, c) for c in range(32, 127)},
            hex_form=(doc_id // 13) % 2 == 0,
        )
        # §9.9 Table 127 segment lengths: clear part through the eexec
        # keyword + its newline; the 512-zeros + cleartomark trailer
        l3 = 8 * 65 + len("cleartomark\n")
        l1 = prog.find(b"eexec") + 6
        l2 = len(prog) - l1 - l3
        offsets[DESC] = b.struct(
            (
                f"{DESC} 0 obj << /Type /FontDescriptor /FontName /SYNF+EmbOne "
                f"/Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                f"/Descent -200 /CapHeight 700 /StemV 80 "
                f"/FontFile {FFILE} 0 R >> endobj\n"
            ).encode("ascii")
        )
        offsets[FFILE] = b.struct(
            (
                f"{FFILE} 0 obj << /Length {len(prog)} /Length1 {l1} "
                f"/Length2 {l2} /Length3 {l3} >> stream\n"
            ).encode("ascii")
        )
        b.text_payload(prog)
        b.struct(b"\nendstream endobj\n")
    if ttf:
        from .core import truetype as _tt

        prog = _tt.build_truetype_font(
            {c: adv_tt_width(doc_id, c) // 2 for c in range(32, 127)}, upem=500
        )
        offsets[DESC] = b.struct(
            (
                f"{DESC} 0 obj << /Type /FontDescriptor /FontName /SYNF+EmbTwo "
                f"/Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                f"/Descent -200 /CapHeight 700 /StemV 80 "
                f"/FontFile2 {FFILE} 0 R >> endobj\n"
            ).encode("ascii")
        )
        offsets[FFILE] = b.struct(
            (
                f"{FFILE} 0 obj << /Length {len(prog)} /Length1 {len(prog)} "
                f">> stream\n"
            ).encode("ascii")
        )
        b.text_payload(prog)
        b.struct(b"\nendstream endobj\n")
    if cff:
        from .core import cff as _cff

        prog = _cff.build_cff_font(
            {c: adv_cff_width(doc_id, c) for c in range(32, 127)},
            default_w=CFF_DEFAULT_W,
            nominal_w=CFF_NOMINAL_W,
        )
        offsets[DESC] = b.struct(
            (
                f"{DESC} 0 obj << /Type /FontDescriptor /FontName /SYNF+EmbThree "
                f"/Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                f"/Descent -200 /CapHeight 700 /StemV 80 "
                f"/FontFile3 {FFILE} 0 R >> endobj\n"
            ).encode("ascii")
        )
        offsets[FFILE] = b.struct(
            (
                f"{FFILE} 0 obj << /Subtype /Type1C /Length {len(prog)} "
                f">> stream\n"
            ).encode("ascii")
        )
        b.text_payload(prog)
        b.struct(b"\nendstream endobj\n")
    if t3:
        # the shared glyph procedure: a bare d0 width declaration (§9.6.4
        # requires /CharProcs streams; extraction never executes them)
        proc = b"300 0 d0\n"
        offsets[PROC] = b.struct(
            f"{PROC} 0 obj << /Length {len(proc)} >> stream\n".encode("ascii")
        )
        b.text_payload(proc)
        b.struct(b"\nendstream endobj\n")
    xref_pos = b.pos
    b.struct(f"xref\n0 {n_objs + 1}\n".encode("ascii"))
    b.struct(b"0000000000 65535 f\r\n")
    for i in range(1, n_objs + 1):
        b.struct(f"{offsets[i]:010d} 00000 n\r\n".encode("ascii"))
    b.struct(
        (
            f"trailer << /Size {n_objs + 1} /Root {CATALOG} 0 R >>\nstartxref\n{xref_pos}\n%%EOF"
        ).encode("ascii")
    )
    return {"doc_id": doc_id, "bytes": b.finish(), "span_rows": b.span_rows()}


def reconstruct(span_rows: list[dict]) -> bytes:
    """Decode-stage step 0: reassemble document bytes from input spans
    (media markers are zero-width; text fields concatenate in offset
    order — offsets are validated as cumulative positions)."""
    out = bytearray()
    for row in sorted(span_rows, key=lambda s: (s["offset"], s["kind"] == "media")):
        t = row.get("text")
        if t is not None:
            out += t.encode("latin-1")
    return bytes(out)


# ---------------------------------------------------------------------------
# Tagged family: one page whose marked-content sequences are DRAWN in a
# rotated order; the structure tree (/StructTreeRoot, ISO 32000 §14.7)
# declares the logical order.  A byte-order extraction reads the page
# rotated; only a kernel that joins /MCID against the tree's depth-first
# leaf order reproduces the oracle.  Only extract_tagged_order observes
# this family.

TAG_WPL = 3  # words per logical line
TAG_MAX_LINES = 5
TAG_LINE_DY = 14  # baseline pitch: logical line i sits at y = 720 - 14*i
TAG_ARTIFACT_TEXT = "draft"  # the untagged footer's fixed text
TAG_ARTIFACT_Y = 36


def tagged_lines(doc_id: int, text: str) -> list[str]:
    """Logical lines: 3-word slices, up to 5; a line exists when the text
    has any word at its start index (the oracle's ``len(w) > i*3`` guard,
    same convention as the columns family)."""
    words = text.split(" ")
    return [
        " ".join(words[i * TAG_WPL : i * TAG_WPL + TAG_WPL])
        for i in range(TAG_MAX_LINES)
        if len(words) > i * TAG_WPL
    ]


def tagged_has_artifact(doc_id: int) -> bool:
    """Every 3rd doc draws an UNTAGGED footer (no /MCID): artifact content
    per §14.8.2.2, reported AFTER the tagged spans with NULL type."""
    return doc_id % 3 == 0


def tagged_mcid_of(doc_id: int, li: int, n: int) -> int:
    """MCID of logical line ``li``: sequences are numbered 0..n-1 in
    DRAWING order, and the j-th drawn sequence shows logical line
    (j + doc_id) % n — so logical i carries mcid (i - doc_id) mod n."""
    return (li - doc_id) % n


def build_document_tagged(doc_id: int, text: str) -> dict:
    """Tagged-PDF family: clean classic-xref, one page.  Drawing order is
    the logical order rotated by doc_id; each drawn line is wrapped in
    ``/P << /MCID j >> BDC .. EMC``.  The structure tree exercises every
    /K leaf shape (bare int with ancestor /Pg, one-element int array, and
    an explicit /Type /MCR dict) plus one level of recursion (odd docs
    split the lines across two /Sect elements).  Logical line 0 is an
    /H1 element, the rest /P."""
    lines = tagged_lines(doc_id, text)
    n = len(lines)
    use_sects = doc_id % 2 == 1 and n >= 2
    half = (n + 1) // 2

    CATALOG, PAGESROOT, FONT, PAGE, CONTENT, STROOT, DOCELEM = 1, 2, 3, 4, 5, 6, 7
    next_id = 8
    sect_ids: list[int] = []
    if use_sects:
        sect_ids = [8, 9]
        next_id = 10
    line_ids = {i: next_id + i for i in range(n)}
    n_objs = next_id - 1 + n

    # content: one BT, each drawn sequence absolute-positioned (Tm); the
    # j-th drawn sequence shows LOGICAL line (j + doc_id) % n at that
    # line's physical slot — the page LOOKS normal, only the stream order
    # (and therefore untagged extraction) is rotated
    parts = ["BT /F1 12 Tf "]
    for j in range(n):
        li = (j + doc_id) % n
        y = 720 - TAG_LINE_DY * li
        parts.append(
            f"/P << /MCID {j} >> BDC 1 0 0 1 72 {y} Tm "
            f"({_pdf_escape(lines[li])}) Tj EMC "
        )
    if tagged_has_artifact(doc_id) and n:
        parts.append(f"1 0 0 1 72 {TAG_ARTIFACT_Y} Tm ({TAG_ARTIFACT_TEXT}) Tj ")
    parts.append("ET")
    body = "".join(parts).encode("latin-1")

    def elem_k(li: int) -> str:
        m = tagged_mcid_of(doc_id, li, n)
        if li % 3 == 2:  # explicit marked-content reference with own /Pg
            return f"<< /Type /MCR /Pg {PAGE} 0 R /MCID {m} >>"
        if li % 4 == 3:  # one-element array of a bare MCID
            return f"[{m}]"
        return str(m)

    b = _Builder()
    offsets: dict[int, int] = {}
    b.struct(f"%PDF-1.{4 + doc_id % 4}\n".encode("ascii"))
    # declared language (§14.9.2): catalog /Lang cycles by doc%3; the H1
    # element OVERRIDES it on every 5th+2 doc (inheritance + override
    # both observable through the tagged oracle's lang column)
    doc_lang = TAG_LANGS[doc_id % 3]
    offsets[CATALOG] = b.struct(
        (
            f"{CATALOG} 0 obj << /Type /Catalog /Pages {PAGESROOT} 0 R "
            f"/StructTreeRoot {STROOT} 0 R /Lang ({doc_lang}) "
            f"/MarkInfo << /Marked true >> >> endobj\n"
        ).encode("ascii")
    )
    offsets[PAGESROOT] = b.struct(
        f"{PAGESROOT} 0 obj << /Type /Pages /Kids [{PAGE} 0 R] /Count 1 >> endobj\n".encode("ascii")
    )
    offsets[FONT] = b.struct(
        f"{FONT} 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n".encode("ascii")
    )
    offsets[PAGE] = b.struct(
        (
            f"{PAGE} 0 obj << /Type /Page /Parent {PAGESROOT} 0 R "
            f"/Resources << /Font << /F1 {FONT} 0 R >> >> "
            f"/StructParents 0 /Contents {CONTENT} 0 R >> endobj\n"
        ).encode("ascii")
    )
    offsets[CONTENT] = b.struct(
        f"{CONTENT} 0 obj << /Length {len(body)} >> stream\n".encode("ascii")
    )
    b.text_payload(body)
    b.struct(b"\nendstream endobj\n")
    # every 3rd+1 doc writes CUSTOM structure types (/Head1, /Para)
    # resolved through an inline /RoleMap (§14.7.3 — the Word-export
    # shape; /Head1 maps TRANSITIVELY via /Heading): extraction must
    # report the standard H1/P roles, so the tagged oracle is invariant
    # iff the role map is followed.  Zero new objects.
    use_rolemap = doc_id % 3 == 1
    rm = (
        " /RoleMap << /Head1 /Heading /Heading /H1 /Para /P >>"
        if use_rolemap
        else ""
    )
    offsets[STROOT] = b.struct(
        (
            f"{STROOT} 0 obj << /Type /StructTreeRoot /K {DOCELEM} 0 R{rm} >> endobj\n"
        ).encode("ascii")
    )
    if use_sects:
        doc_kids = f"[{sect_ids[0]} 0 R {sect_ids[1]} 0 R]"
    else:
        doc_kids = "[" + " ".join(f"{line_ids[i]} 0 R" for i in range(n)) + "]"
    offsets[DOCELEM] = b.struct(
        (
            f"{DOCELEM} 0 obj << /Type /StructElem /S /Document /P {STROOT} 0 R "
            f"/Pg {PAGE} 0 R /K {doc_kids} >> endobj\n"
        ).encode("ascii")
    )
    if use_sects:
        groups = (range(0, half), range(half, n))
        for si, grp in enumerate(groups):
            kids = "[" + " ".join(f"{line_ids[i]} 0 R" for i in grp) + "]"
            # NO /Pg on the sects: bare-int grandchildren resolve through
            # the Document element's /Pg (nearest-ancestor semantics)
            offsets[sect_ids[si]] = b.struct(
                (
                    f"{sect_ids[si]} 0 obj << /Type /StructElem /S /Sect "
                    f"/P {DOCELEM} 0 R /K {kids} >> endobj\n"
                ).encode("ascii")
            )
    for i in range(n):
        parent = sect_ids[0 if i < half else 1] if use_sects else DOCELEM
        if use_rolemap:
            stype = "Head1" if i == 0 else "Para"
        else:
            stype = "H1" if i == 0 else "P"
        lang_entry = (
            f"/Lang ({TAG_LANGS[(doc_id + 1) % 3]}) "
            if i == 0 and doc_id % 5 == 2
            else ""
        )
        offsets[line_ids[i]] = b.struct(
            (
                f"{line_ids[i]} 0 obj << /Type /StructElem /S /{stype} "
                f"{lang_entry}/P {parent} 0 R /K {elem_k(i)} >> endobj\n"
            ).encode("ascii")
        )
    xref_pos = b.pos
    b.struct(f"xref\n0 {n_objs + 1}\n".encode("ascii"))
    b.struct(b"0000000000 65535 f\r\n")
    for i in range(1, n_objs + 1):
        b.struct(f"{offsets[i]:010d} 00000 n\r\n".encode("ascii"))
    b.struct(
        (
            f"trailer << /Size {n_objs + 1} /Root {CATALOG} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF"
        ).encode("ascii")
    )
    return {"doc_id": doc_id, "bytes": b.finish(), "span_rows": b.span_rows()}


TAG_LANGS = ("en-US", "de-DE", "fr-FR")


def expected_tagged(doc_id: int, text: str) -> list[tuple[int, int, str | None, str, str]]:
    """Analytic ground truth for ``extract_tagged_order``: (ord, page_idx,
    struct_type, lang, text) — logical lines first (H1 then P), then the
    untagged artifact footer.  lang = catalog /Lang (doc%3), overridden
    on the H1 line when doc%5==2."""
    lines = tagged_lines(doc_id, text)
    base = TAG_LANGS[doc_id % 3]
    out = []
    for i, t in enumerate(lines):
        lg = TAG_LANGS[(doc_id + 1) % 3] if i == 0 and doc_id % 5 == 2 else base
        out.append((i, 0, "H1" if i == 0 else "P", lg, t))
    if tagged_has_artifact(doc_id) and lines:
        out.append((len(lines), 0, None, base, TAG_ARTIFACT_TEXT))
    return out


# ---------------------------------------------------------------------------
# Scanned family: one page, one bi-level image XObject compressed with
# CCITTFaxDecode (the dominant scanned-PDF shape).  The ink pattern is an
# integer formula both the kernel and the DuckDB oracle replay exactly;
# the per-doc /K, /EncodedByteAlign and /BlackIs1 variants make each
# ISO 32000 §7.4.6 knob individually observable (a kernel ignoring
# BlackIs1 decodes INVERTED ink on every 3rd doc).

def scanned_dims(doc_id: int) -> tuple[int, int]:
    return 24 + 8 * (doc_id % 4), 16 + 4 * (doc_id % 5)


def scanned_params(doc_id: int) -> dict:
    """CCITT parameter variants: G4 (/K -1) with every 7th+3 doc on 1-D
    Group 3 (/K 0); byte-aligned rows on even docs; /BlackIs1 on every
    3rd+1 doc.  Every 5th+2 doc is compressed as JBIG2 instead (T.88
    embedded organization): the even half (doc%10=2) is MQ-arithmetic
    with GBTEMPLATE cycling (doc//10)%4, and every SECOND arithmetic doc
    (doc%20=2) uses the SYMBOL-DICTIONARY + TEXT-REGION organization —
    the dominant real-scanner form (§6.4/§6.5) — instead of a bare
    generic region (doc%80=42 additionally routes the symbol dict
    through the SDREFAGG touch-up organization, §6.5.8.2); MMR on the
    odd half (doc%10=7).  doc%40=12 takes the
    REFINEMENT organization (§6.3, r04 item 4): an intermediate generic
    region carries a degraded approximation and an immediate refinement
    region restores the exact ink (GRTEMPLATE (doc//40)%2, TPGRON on
    (doc//80)%2=0).  doc%40=32 takes the HALFTONE organization (§6.6):
    a 4-pattern dictionary + per-pixel grid whose gray-coded bitplanes
    carry ink*2+checker (HTEMPLATE (doc//40)%4).  The ink oracle is
    compression-invariant, so one SQL proves every codec/template/
    organization."""
    return {
        "k": 0 if doc_id % 7 == 3 else -1,
        "byte_align": doc_id % 2 == 0,
        "black_is_1": doc_id % 3 == 1,
        "jbig2": doc_id % 5 == 2,
        "jbig2_arith": doc_id % 10 == 2,
        "jbig2_symbol": doc_id % 20 == 2,
        "jbig2_refine": doc_id % 40 == 12,
        "jbig2_halftone": doc_id % 40 == 32,
        "jbig2_symrefine": doc_id % 80 == 42,
        "jbig2_template": (doc_id // 10) % 4,
    }


def scanned_ink(doc_id: int):
    """The analytic ink mask: shifted block stripes — long runs with
    per-row phase motion (vertical-mode-heavy, horizontal at wraps)."""
    import numpy as np

    w, h = scanned_dims(doc_id)
    ph = 1 + doc_id % 3
    bw = 2 + doc_id % 4
    x = np.arange(w)
    y = np.arange(h)[:, None]
    return ((x + ((y * ph) % 5)) // bw) % 2 == 0


def build_document_scanned(doc_id: int, text: str) -> dict:
    """Scanned-page family: classic xref, one page whose only content is
    ``/Im1 Do``; the image stream is REAL CCITT-compressed data from the
    textops/ccitt.py encoder — except every 5th+2 doc, which is JBIG2
    (T.88 embedded organization, MMR generic region, textops/jbig2.py).
    ``text`` is unused (scans carry no text layer) — only
    extract_scanned_ccitt observes this family."""
    from .textops.ccitt import encode_ccitt

    w, h = scanned_dims(doc_id)
    p = scanned_params(doc_id)
    if p["jbig2"]:
        from .textops.jbig2 import (
            encode_jbig2_arith,
            encode_jbig2_mmr,
            encode_jbig2_refined,
            encode_jbig2_symbol_text,
        )

        if p["jbig2_symbol"]:
            # alternate the coded reference corner (TL / BOTTOM-left) so
            # both §6.4.5 anchoring arms decode on the corpus
            payload = encode_jbig2_symbol_text(
                scanned_ink(doc_id),
                template=p["jbig2_template"],
                refcorner=1 if (doc_id // 20) % 2 == 0 else 0,
                # doc%80==42: the touch-up organization — a base dict of
                # degraded tiles + an SDREFAGG=1 dict refining each back
                refine=p["jbig2_symrefine"],
                rtemplate=(doc_id // 80) % 2,
            )
        elif p["jbig2_refine"]:
            payload = encode_jbig2_refined(
                scanned_ink(doc_id),
                template=(doc_id // 40) % 2,
                tpgron=(doc_id // 80) % 2 == 0,
            )
        elif p["jbig2_halftone"]:
            from .textops.jbig2 import encode_jbig2_halftone

            payload = encode_jbig2_halftone(
                scanned_ink(doc_id), template=(doc_id // 40) % 4
            )
        elif p["jbig2_arith"]:
            payload = encode_jbig2_arith(
                scanned_ink(doc_id), template=p["jbig2_template"]
            )
        else:
            payload = encode_jbig2_mmr(scanned_ink(doc_id))
        filter_spec = "/Filter /JBIG2Decode"
    else:
        payload = encode_ccitt(
            scanned_ink(doc_id), k=p["k"], byte_align=p["byte_align"],
            black_is_1=p["black_is_1"],
        )
        parms = (
            f"/K {p['k']} /Columns {w} /Rows {h}"
            + (" /EncodedByteAlign true" if p["byte_align"] else "")
            + (" /BlackIs1 true" if p["black_is_1"] else "")
        )
        filter_spec = f"/Filter /CCITTFaxDecode /DecodeParms << {parms} >>"
    body = b"q /Im1 Do Q"

    b = _Builder()
    offsets: dict[int, int] = {}
    b.struct(f"%PDF-1.{4 + doc_id % 3}\n".encode("ascii"))
    CATALOG, PAGESROOT, PAGE, CONTENT, IMG = 1, 2, 3, 4, 5
    offsets[CATALOG] = b.struct(
        f"{CATALOG} 0 obj << /Type /Catalog /Pages {PAGESROOT} 0 R >> endobj\n".encode("ascii")
    )
    offsets[PAGESROOT] = b.struct(
        f"{PAGESROOT} 0 obj << /Type /Pages /Kids [{PAGE} 0 R] /Count 1 >> endobj\n".encode("ascii")
    )
    offsets[PAGE] = b.struct(
        (
            f"{PAGE} 0 obj << /Type /Page /Parent {PAGESROOT} 0 R "
            f"/Resources << /XObject << /Im1 {IMG} 0 R >> >> "
            f"/MediaBox [0 0 612 792] /Contents {CONTENT} 0 R >> endobj\n"
        ).encode("ascii")
    )
    offsets[CONTENT] = b.struct(
        f"{CONTENT} 0 obj << /Length {len(body)} >> stream\n".encode("ascii")
    )
    b.text_payload(body)
    b.struct(b"\nendstream endobj\n")
    b.media_marker("Im1")
    offsets[IMG] = b.struct(
        (
            f"{IMG} 0 obj << /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/BitsPerComponent 1 /ColorSpace /DeviceGray "
            f"{filter_spec} "
            f"/Length {len(payload)} >>\nstream\n"
        ).encode("ascii")
    )
    b.text_payload(payload)
    b.struct(b"\nendstream endobj\n")
    n_objs = 5
    xref_pos = b.pos
    b.struct(f"xref\n0 {n_objs + 1}\n".encode("ascii"))
    b.struct(b"0000000000 65535 f\r\n")
    for i in range(1, n_objs + 1):
        b.struct(f"{offsets[i]:010d} 00000 n\r\n".encode("ascii"))
    b.struct(
        (
            f"trailer << /Size {n_objs + 1} /Root {CATALOG} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF"
        ).encode("ascii")
    )
    return {"doc_id": doc_id, "bytes": b.finish(), "span_rows": b.span_rows()}


# ---------------------------------------------------------------------------
# /PageLabels rules for the armored family (ISO 32000 §12.4.2): an INLINE
# number tree in the catalog — no new objects, so the object_stats formula
# is untouched; observed only by extract_page_labels (doc_page_labels).

_LABEL_STYLES = ("D", "r", "R", "a", "A")
_ROMAN_L = ("i", "ii", "iii")
_ALPHA_L = ("a", "b", "c")


def page_label_rules(doc_id: int) -> dict | None:
    """None = no /PageLabels tree (every 9th+4 doc).  Otherwise the two
    ranges: page 0 styled/prefixed/started per doc, pages 1+ decimal
    with /St on even docs only (odd docs exercise the default-1 path)."""
    if doc_id % 9 == 4:
        return None
    return {
        "style0": _LABEL_STYLES[doc_id % 5],
        "prefix0": "fm-" if doc_id % 4 == 0 else "",
        "st0": 1 + doc_id % 3,
        "st1": 10 + doc_id % 7 if doc_id % 2 == 0 else None,
    }


def _page_labels_nums(doc_id: int) -> str:
    r = page_label_rules(doc_id)
    assert r is not None
    e0 = f"/S /{r['style0']} /St {r['st0']}"
    if r["prefix0"]:
        e0 += f" /P ({r['prefix0']})"
    out = f"0 << {e0} >>"
    if 1 + doc_id % 3 > 1:
        e1 = "/S /D" + (f" /St {r['st1']}" if r["st1"] is not None else "")
        out += f" 1 << {e1} >>"
    return out


def expected_page_labels(doc_id: int) -> list[tuple[int, str]]:
    """Analytic ground truth for ``doc_page_labels``."""
    n_pages = 1 + doc_id % 3
    r = page_label_rules(doc_id)
    out = []
    for p in range(n_pages):
        if r is None:
            out.append((p, str(p + 1)))
        elif p == 0:
            n = r["st0"]
            s = r["style0"]
            body = (
                str(n) if s == "D"
                else _ROMAN_L[n - 1] if s == "r"
                else _ROMAN_L[n - 1].upper() if s == "R"
                else _ALPHA_L[n - 1] if s == "a"
                else _ALPHA_L[n - 1].upper()
            )
            out.append((p, r["prefix0"] + body))
        else:
            out.append((p, str((r["st1"] or 1) + p - 1)))
    return out


# ---------------------------------------------------------------------------
# Signed family (ISO 32000 §12.8): every doc carries an /AcroForm signature
# field whose /V is a real signature dictionary — /ByteRange over the whole
# file minus the /Contents hex hole, /Contents a DER CMS SignedData
# (RFC 5652) signed RSASSA-PKCS1-v1_5 (RFC 8017) with the hardcoded
# deterministic corpus key below.  Variant cycle doc_id % 5:
#   0  valid, SHA-256                  -> all checks true
#   1  covered byte TAMPERED post-sign -> digest_ok False (sig over attrs ok)
#   2  bytes APPENDED post-sign        -> coverage_ok False (incremental-
#      update shape: the signature covers less than the current file)
#   3  signature octets corrupted      -> sig_ok False (digest still ok)
#   4  valid, SHA-1                    -> all true, digest_alg 'sha1'
# Signer CN cycles doc_id % 3.  Only extract_signatures observes this
# family; the reference's walk never reaches /AcroForm (doc_tree.rs:63-142).

# The deterministic corpus RSA keypair lives in core/pubsec.py (shared
# with the public-key encryption tier); the signature writer aliases it.
from .core.pubsec import CORPUS_D as SIG_D
from .core.pubsec import CORPUS_E as SIG_E
from .core.pubsec import CORPUS_N as SIG_N
from .core.pubsec import CORPUS_P as SIG_P
from .core.pubsec import CORPUS_Q as SIG_Q
_SIG_K = (SIG_N.bit_length() + 7) // 8

# Pre-encoded DER OIDs (tag 0x06 included)
_OID_SIGNED_DATA = bytes.fromhex("06092a864886f70d010702")
_OID_DATA = bytes.fromhex("06092a864886f70d010701")
_OID_CONTENT_TYPE = bytes.fromhex("06092a864886f70d010903")
_OID_MESSAGE_DIGEST = bytes.fromhex("06092a864886f70d010904")
_OID_RSA = bytes.fromhex("06092a864886f70d010101")
_OID_SHA256 = bytes.fromhex("0609608648016503040201")
_OID_SHA1 = bytes.fromhex("06052b0e03021a")
_OID_CN = bytes.fromhex("0603550403")

_SIG_HOLE_HEX = 2400  # hex chars reserved for /Contents (1200 bytes DER cap)


def _der(tag: int, content: bytes) -> bytes:
    n = len(content)
    if n < 0x80:
        return bytes((tag, n)) + content
    lb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes((tag, 0x80 | len(lb))) + lb + content


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 8) // 8, "big") if v else b"\x00"
    return _der(0x02, b)


def _der_name(cn: str) -> bytes:
    atv = _der(0x30, _OID_CN + _der(0x13, cn.encode("ascii")))
    return _der(0x30, _der(0x31, atv))


def _der_alg(oid: bytes) -> bytes:
    return _der(0x30, oid + b"\x05\x00")  # AlgorithmIdentifier + NULL param


def sig_signer_cn(doc_id: int) -> str:
    return f"Corpus Signer {doc_id % 3}"


# corpus EC signing key (P-256; arbitrary fixed scalar, public point
# derived once) — the ECDSA arm of the signed family
SIG_EC_D = 0x1F2D3C4B5A69788796A5B4C3D2E1F00F1E2D3C4B5A69788796A5B4C3D2E1F00F


@lru_cache(maxsize=1)
def _sig_ec_pub() -> tuple[int, int]:
    from .core import ecdsa as _ecdsa

    return _ecdsa.public_key(SIG_EC_D)


def sig_is_ecdsa(doc_id: int) -> bool:
    """Every 7th+2 signed doc signs ECDSA-P256 instead of RSA (composes
    with the %5 variant cycle, so EC also gets tampered/appended/corrupt
    arms and the sha1 digest arm = ecdsa-with-SHA1)."""
    return doc_id % 7 == 2


_OID_ECDSA_SHA256 = bytes.fromhex("06082a8648ce3d040302")
_OID_ECDSA_SHA1 = bytes.fromhex("06072a8648ce3d0401")
_OID_EC_PUBKEY = bytes.fromhex("06072a8648ce3d0201")
_OID_P256 = bytes.fromhex("06082a8648ce3d030107")


def _sig_cert_ec(cn: str, serial: int) -> bytes:
    """Minimal RFC 5280 certificate carrying the corpus P-256 key
    (uncompressed point; ECDSA AlgorithmIdentifiers carry NO NULL
    parameter, unlike RSA's)."""
    qx, qy = _sig_ec_pub()
    point = b"\x04" + qx.to_bytes(32, "big") + qy.to_bytes(32, "big")
    spki = _der(
        0x30,
        _der(0x30, _OID_EC_PUBKEY + _OID_P256) + _der(0x03, b"\x00" + point),
    )
    validity = _der(0x30, _der(0x17, b"200101000000Z") + _der(0x17, b"400101000000Z"))
    tbs = _der(
        0x30,
        _der(0xA0, _der_int(2))
        + _der_int(serial)
        + _der(0x30, _OID_ECDSA_SHA256)
        + _der_name("pdfspark test CA")
        + validity
        + _der_name(cn)
        + spki,
    )
    return _der(0x30, tbs + _der(0x30, _OID_ECDSA_SHA256) + _der(0x03, b"\x00\x00"))


def _sig_cert(cn: str, serial: int) -> bytes:
    """Minimal RFC 5280 certificate carrying the corpus RSA key.  The
    cert's own signature field is a zero bit string (chain validation is
    out of scope — see core/signature.py docstring)."""
    spki = _der(
        0x30,
        _der_alg(_OID_RSA)
        + _der(0x03, b"\x00" + _der(0x30, _der_int(SIG_N) + _der_int(SIG_E))),
    )
    validity = _der(0x30, _der(0x17, b"200101000000Z") + _der(0x17, b"400101000000Z"))
    tbs = _der(
        0x30,
        _der(0xA0, _der_int(2))
        + _der_int(serial)
        + _der_alg(_OID_RSA)
        + _der_name("pdfspark test CA")
        + validity
        + _der_name(cn)
        + spki,
    )
    return _der(0x30, tbs + _der_alg(_OID_RSA) + _der(0x03, b"\x00\x00"))


def _sig_cms(signed_bytes: bytes, doc_id: int) -> bytes:
    """Detached CMS SignedData over ``signed_bytes`` (RFC 5652 §5)."""
    import hashlib

    sha1 = doc_id % 5 == 4
    oid_h, hasher = (_OID_SHA1, hashlib.sha1) if sha1 else (_OID_SHA256, hashlib.sha256)
    digest = hasher(signed_bytes).digest()
    attrs = (
        _der(0x30, _OID_CONTENT_TYPE + _der(0x31, _OID_DATA))
        + _der(0x30, _OID_MESSAGE_DIGEST + _der(0x31, _der(0x04, digest)))
    )
    # RFC 5652 §5.4: the signature is over the attrs RETAGGED as SET OF
    ec = sig_is_ecdsa(doc_id)
    if ec:
        from .core import ecdsa as _ecdsa

        r_, s_ = _ecdsa.sign(SIG_EC_D, hasher(_der(0x31, attrs)).digest())
        sig = _ecdsa.sig_to_der(r_, s_)
        sig_alg = _der(0x30, _OID_ECDSA_SHA1 if sha1 else _OID_ECDSA_SHA256)
    else:
        em_t = (
            (
                bytes.fromhex("3021300906052b0e03021a05000414")
                if sha1
                else bytes.fromhex("3031300d060960864801650304020105000420")
            )
            + hasher(_der(0x31, attrs)).digest()
        )
        em = b"\x00\x01" + b"\xff" * (_SIG_K - len(em_t) - 3) + b"\x00" + em_t
        sig = pow(int.from_bytes(em, "big"), SIG_D, SIG_N).to_bytes(_SIG_K, "big")
        sig_alg = _der_alg(_OID_RSA)
    if doc_id % 5 == 3:
        sig = sig[:-1] + bytes((sig[-1] ^ 0xFF,))  # corrupt: DER shape intact
    serial = 1000 + doc_id % 3
    cn = sig_signer_cn(doc_id)
    si = _der(
        0x30,
        _der_int(1)
        + _der(0x30, _der_name("pdfspark test CA") + _der_int(serial))
        + _der_alg(oid_h)
        + _der(0xA0, attrs)
        + sig_alg
        + _der(0x04, sig),
    )
    sd = _der(
        0x30,
        _der_int(1)
        + _der(0x31, _der_alg(oid_h))
        + _der(0x30, _OID_DATA)
        + _der(0xA0, (_sig_cert_ec if ec else _sig_cert)(cn, serial))
        + _der(0x31, si),
    )
    return _der(0x30, _OID_SIGNED_DATA + _der(0xA0, sd))


def expected_signature(doc_id: int) -> tuple[str, str, str, str, bool, bool, bool]:
    """Analytic ground truth for ``doc_signatures``:
    (field, signer, digest_alg, key_alg, coverage_ok, digest_ok, sig_ok)."""
    v = doc_id % 5
    return (
        "Sig1",
        sig_signer_cn(doc_id),
        "sha1" if v == 4 else "sha256",
        "ec" if sig_is_ecdsa(doc_id) else "rsa",
        v != 2,
        v != 1,
        v != 3,
    )


def build_document_signed(doc_id: int, text: str) -> dict:
    """One-page signed PDF built placeholder-first: the file is laid out
    with a fixed-width /ByteRange and a zero-filled /Contents hex hole,
    the ranges are patched in place (same byte length), the range bytes
    are hashed and the CMS is injected — then the post-signing variant
    mutation (tamper/append) is applied.  Deterministic per doc_id."""
    words = (text or "").split()
    line = " ".join(words[:6]) or "signed document"
    content = f"BT /F1 12 Tf 72 720 Td ({_pdf_escape(line)}) Tj ET".encode("latin-1")
    tamper_off_marker = b"% tamper-slot X\n"

    objs: list[bytes] = []
    objs.append(
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R "
        b"/AcroForm << /Fields [6 0 R] /SigFlags 3 >> >>\nendobj\n"
    )
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    objs.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> "
        b"/Annots [6 0 R] >>\nendobj\n"
    )
    objs.append(
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(content), content)
    )
    objs.append(
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    )
    objs.append(
        b"6 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Sig /T (Sig1) "
        b"/Rect [0 0 0 0] /V 7 0 R /P 3 0 R >>\nendobj\n"
    )
    sig_obj = (
        b"7 0 obj\n<< /Type /Sig /Filter /Adobe.PPKLite "
        b"/SubFilter /adbe.pkcs7.detached "
        b"/ByteRange [0000000000 0000000000 0000000000 0000000000] "
        b"/Contents <" + b"0" * _SIG_HOLE_HEX + b"> >>\nendobj\n"
    )
    objs.append(sig_obj)

    buf = bytearray()
    buf += b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"
    buf += tamper_off_marker
    offsets = []
    for o in objs:
        offsets.append(len(buf))
        buf += o
    xref_off = len(buf)
    buf += b"xref\n0 8\n0000000000 65535 f \n"
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_off
    )

    data = bytearray(buf)
    lt = data.index(b"/Contents <") + len(b"/Contents ")
    gt = lt + 1 + _SIG_HOLE_HEX
    assert data[gt : gt + 1] == b">"
    hole_end = gt + 1
    br = (0, lt, hole_end, len(data) - hole_end)
    br_text = b"[%010d %010d %010d %010d]" % br
    br_at = bytes(data).index(b"/ByteRange [") + len(b"/ByteRange ")
    assert len(br_text) == 1 + 4 * 10 + 3 + 1
    data[br_at : br_at + len(br_text)] = br_text
    signed_bytes = bytes(data[: br[1]]) + bytes(data[br[2] :])
    cms = _sig_cms(signed_bytes, doc_id)
    hx = binascii.hexlify(cms)
    assert len(hx) <= _SIG_HOLE_HEX, "CMS overflows the /Contents hole"
    data[lt + 1 : lt + 1 + len(hx)] = hx

    v = doc_id % 5
    if v == 1:
        t = bytes(data).index(b"% tamper-slot X") + len(b"% tamper-slot ")
        data[t : t + 1] = b"Y"  # covered byte changed post-signing
    elif v == 2:
        data += b"% appended after signing\n"  # coverage now short of EOF

    out = bytes(data)
    # span rows: struct / content-text / struct (interleaved input shape)
    c_at = out.index(content)
    rows = [
        {"kind": "struct", "text": out[:c_at].decode("latin-1"), "media_ref": None, "offset": 0},
        {"kind": "text", "text": content.decode("latin-1"), "media_ref": None, "offset": c_at},
        {
            "kind": "struct",
            "text": out[c_at + len(content) :].decode("latin-1"),
            "media_ref": None,
            "offset": c_at + len(content),
        },
    ]
    return {"bytes": out, "span_rows": rows}


def expected_pubsec_span(doc_id: int, text: str) -> str:
    # single-space split, mirroring the oracle's string_split(text, ' ')
    words = (text or "").split(" ")
    return " ".join(words[:6]).strip() or "certificate encrypted"


def build_document_pubsec(doc_id: int, text: str) -> dict:
    """Certificate-encrypted family (ISO 32000 §7.6.4, /Adobe.PubSec
    /adbe.pkcs7.s5): one-page docs whose streams are AESV2-encrypted
    under a file key derived from a CMS EnvelopedData recipient blob —
    no password anywhere; the reader must RSA-open the key-transport
    envelope with the corpus private key, then derive the §7.6.4.3 SHA-1
    file key.  Every 4th doc carries TWO recipient blobs with the real
    envelope second (the walk-all-recipients path); every 3rd+1 doc sets
    /EncryptMetadata false (the 0xFFFFFFFF KDF suffix arm)."""
    import hashlib as _hl

    from .core import crypt as _crypt
    from .core import pubsec as _ps

    line = expected_pubsec_span(doc_id, text)
    content = f"BT /F1 12 Tf 72 720 Td ({_pdf_escape(line)}) Tj ET".encode("latin-1")

    seed = _hl.sha1(f"psseed{doc_id}".encode()).digest()
    cek = _hl.md5(f"pscek{doc_id}".encode()).digest()
    iv = _hl.md5(f"psiv{doc_id}".encode()).digest()
    ps_bytes = _hl.sha256(f"psps{doc_id}".encode()).digest() * 5
    real = _ps.build_recipient_cms(
        seed, 0xFFFFFFFC, _ps.CORPUS_N, _ps.CORPUS_E, cek, iv, ps_bytes,
        serial=100 + doc_id % 3,
    )
    recips = [real]
    if doc_id % 4 == 0:
        # a foreign recipient our key cannot open, FIRST in the array —
        # the reader must keep walking instead of failing on it (the
        # registry holds only (CORPUS_N, CORPUS_D); decrypting a p^2
        # modulus envelope with it yields a non-00-02 block -> skipped)
        other_n = _ps.CORPUS_P * _ps.CORPUS_P
        decoy = _ps.build_recipient_cms(
            seed, 0xFFFFFFFC, other_n, 3, cek, iv, ps_bytes, serial=9
        )
        recips = [decoy, real]
    encrypt_metadata = doc_id % 3 != 1
    fkey = _ps.file_key(seed, recips, 16, encrypt_metadata=encrypt_metadata)

    def enc_stream(raw: bytes, oid: int) -> bytes:
        eiv = _hl.md5(f"psoiv{doc_id}:{oid}".encode()).digest()
        return _crypt.aes_cbc_encrypt(
            _crypt.object_key(fkey, oid, 0, aes=True), raw, eiv
        )

    payload = enc_stream(content, 4)
    rec_hex = " ".join("<" + binascii.hexlify(r).decode() + ">" for r in recips)
    enc_dict = (
        "<< /Filter /Adobe.PubSec /SubFilter /adbe.pkcs7.s5 /V 4 /Length 128 "
        "/CF << /DefaultCryptFilter << /Type /CryptFilter /CFM /AESV2 "
        f"/AuthEvent /DocOpen /Recipients [{rec_hex}] /Length 128 >> >> "
        "/StmF /DefaultCryptFilter /StrF /DefaultCryptFilter"
        + (" /EncryptMetadata false" if not encrypt_metadata else "")
        + " >>"
    )

    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        (
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
        ),
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(payload), payload),
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n",
        b"6 0 obj\n%s\nendobj\n" % enc_dict.encode("ascii"),
    ]
    buf = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for o in objs:
        offsets.append(len(buf))
        buf += o
    xref_off = len(buf)
    buf += b"xref\n0 7\n0000000000 65535 f \n"
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    id_hex = _hl.md5(f"psid{doc_id}".encode()).hexdigest()
    buf += (
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R "
        b"/ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (id_hex.encode(), id_hex.encode(), xref_off)
    )
    out = bytes(buf)
    c_at = out.index(payload)
    rows = [
        {"kind": "struct", "text": out[:c_at].decode("latin-1"), "media_ref": None, "offset": 0},
        {"kind": "text", "text": payload.decode("latin-1"), "media_ref": None, "offset": c_at},
        {
            "kind": "struct",
            "text": out[c_at + len(payload) :].decode("latin-1"),
            "media_ref": None,
            "offset": c_at + len(payload),
        },
    ]
    return {"bytes": out, "span_rows": rows}


def xmp_expected(doc_id: int) -> tuple[str, str] | None:
    """(dc:title, xmp:CreatorTool) for XMP docs, None otherwise."""
    if doc_id % 16 != 9:
        return None
    return f"XMP {doc_id % 45} <&> done", f"pdfspark {doc_id % 5}"


def xmp_packet(doc_id: int) -> bytes:
    """A real XMP packet (ISO 16684-1 shape): xpacket wrapper, rdf:RDF,
    dc:title as an rdf:Alt language alternative, xmp:CreatorTool in
    ELEMENT form.  The title carries XML-escaped characters so entity
    decoding is observable."""
    title, tool = xmp_expected(doc_id)
    esc = title.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # begin="" (not the UTF-8 BOM): the ASCII-armored family is all-ASCII
    # by contract (the WARC record builder and the reconstruct seam rely
    # on it); ISO 16684-1 allows the empty begin for ASCII-safe packets
    return (
        '<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
        ' <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
        '  <rdf:Description rdf:about=""\n'
        '    xmlns:dc="http://purl.org/dc/elements/1.1/"\n'
        '    xmlns:xmp="http://ns.adobe.com/xap/1.0/">\n'
        "   <dc:title>\n"
        "    <rdf:Alt>\n"
        f'     <rdf:li xml:lang="x-default">{esc}</rdf:li>\n'
        "    </rdf:Alt>\n"
        "   </dc:title>\n"
        f"   <xmp:CreatorTool>{tool}</xmp:CreatorTool>\n"
        "  </rdf:Description>\n"
        " </rdf:RDF>\n"
        "</x:xmpmeta>\n"
        '<?xpacket end="w"?>'
    ).encode("ascii")
