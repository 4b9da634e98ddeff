"""Document skeleton: version sniff, trailer locate/parse, xref resolution.

Reference operators (SURVEY.md §2.1-2.2):
  S2 version sniff            — pdf_file.rs:118-158 (``%PDF-x.y`` header)
  L1 trailer locator          — pdf_file.rs:165-190 (reverse scan FSM)
  L2 trailer parser           — pdf_file.rs:192-224 (``PDFTrailer``)
  L3 classic xref tables      — pdf_file.rs:226-270 (subsections, f/n)
  L4 xref *streams*           — reference stub only (pdf_file.rs:707);
                                implemented here per ISO 32000 §7.5.8
                                (/W field widths, /Index, type 0/1/2)
plus object streams (ObjStm, §7.5.7) for type-2 entries, and /Prev chains
for incrementally-updated files.

The result is the object index ``(obj_id, gen) -> byte offset`` that the
reference keeps as ``HashMap<ObjectId, usize>`` (pdf_file.rs:226-270) — in
the pipeline it becomes the per-doc objects table (parse-all-then-join,
SURVEY.md §2.4 A1).
"""

from __future__ import annotations

import re

from .errors import ParsingError
from .filters import build_filter_chain, decode_chain
from .objects import Ref, Stream, resolve
from .tokenizer import Tokenizer, skip_ws

_VERSION_RE = re.compile(rb"%PDF-(\d\.\d)")
_VALID_VERSIONS = {"1.0", "1.1", "1.2", "1.3", "1.4", "1.5", "1.6", "1.7", "2.0"}


def sniff_version(data: bytes) -> str:
    """S2 (reference get_version pdf_file.rs:118-158).  The header must sit
    in the first 1 KiB (spec allows leading junk; the reference requires
    offset 0 — we are slightly lenient, which its tests never contradict)."""
    m = _VERSION_RE.search(data[:1024])
    if not m:
        raise ParsingError("missing %PDF-x.y header")
    v = m.group(1).decode("ascii")
    if v not in _VALID_VERSIONS:
        raise ParsingError(f"unknown PDF version {v}")
    return v


def find_startxref(data: bytes) -> int:
    """L1 analog: the reference reverse-scans for ``trailer``
    (pdf_file.rs:165-190); the spec-sanctioned anchor is the ``startxref``
    footer, which also covers xref-stream files that have no ``trailer``
    keyword.  Returns the byte offset of the xref section."""
    tail_at = data.rfind(b"startxref")
    if tail_at == -1:
        raise ParsingError("missing startxref")
    pos = skip_ws(data, tail_at + len(b"startxref"))
    end = pos
    while end < len(data) and data[end : end + 1].isdigit():
        end += 1
    if end == pos:
        raise ParsingError("startxref offset missing")
    return int(data[pos:end])


def _parse_classic_xref(data: bytes, pos: int, tok: Tokenizer):
    """L3 (reference process_xref_table pdf_file.rs:226-270): subsection
    headers ``start count``; 20-byte entries ``oooooooooo ggggg n|f``; free
    entries skipped (last-wins across /Prev handled by caller ordering).
    Returns (offsets, trailer_dict)."""
    pos = skip_ws(data, pos)
    if data[pos : pos + 4] != b"xref":
        raise ParsingError("expected 'xref'")
    pos = skip_ws(data, pos + 4)
    offsets: dict = {}
    while True:
        if data[pos : pos + 7] == b"trailer":
            pos = skip_ws(data, pos + 7)
            trailer, _ = tok.parse_value(pos)
            if not isinstance(trailer, dict):
                raise ParsingError("trailer is not a dictionary")
            return offsets, trailer
        # subsection header: start count
        m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 40])
        if not m:
            raise ParsingError(f"bad xref subsection header at {pos}")
        start, count = int(m.group(1)), int(m.group(2))
        pos = skip_ws(data, pos + m.end())
        for i in range(count):
            # spec says exactly 10-digit offset + 5-digit gen, but real
            # writers pad differently (the reference's own fixture
            # data/simple_pdf.pdf emits 11-digit offsets) — accept any
            # digit run, greedy, so the full offset is read
            em = re.match(rb"(\d{10,})\s+(\d{1,5})\s+([nf])", data[pos : pos + 26])
            if not em:
                raise ParsingError(f"bad xref entry at {pos}")
            if em.group(3) == b"n":
                key = (start + i, int(em.group(2)))
                offsets.setdefault(key, int(em.group(1)))
            pos = skip_ws(data, pos + em.end())


def _parse_xref_stream(data: bytes, pos: int, tok: Tokenizer):
    """L4 (ISO 32000 §7.5.8; reference has only the enum variant
    pdf_file.rs:707).  The xref stream is itself an indirect object whose
    decoded payload is fixed-width rows per /W; /Index gives (start, count)
    runs, default [0 /Size]."""
    ind, _ = tok.parse_indirect_at(pos)
    st = ind.value
    if not isinstance(st, Stream) or str(st.attrs.get("Type")) != "XRef":
        raise ParsingError("startxref does not point at an XRef stream")
    chain = build_filter_chain(st.attrs)
    payload = decode_chain(st.raw, chain)
    w = st.attrs.get("W")
    if not isinstance(w, list) or len(w) < 3:
        raise ParsingError("XRef stream missing /W")
    w = [int(x) for x in w[:3]]
    rowlen = sum(w)
    size = int(st.attrs.get("Size", 0))
    index = st.attrs.get("Index") or [0, size]
    runs = [(int(index[i]), int(index[i + 1])) for i in range(0, len(index) - 1, 2)]

    def field(row: bytes, k: int, default: int) -> int:
        a = sum(w[:k])
        b = a + w[k]
        if w[k] == 0:
            return default
        return int.from_bytes(row[a:b], "big")

    offsets: dict = {}
    compressed: dict = {}  # obj_id -> (objstm_id, index_in_stream)
    r = 0
    for start, count in runs:
        for i in range(count):
            row = payload[r * rowlen : (r + 1) * rowlen]
            r += 1
            if len(row) < rowlen:
                raise ParsingError("truncated XRef stream payload")
            typ = field(row, 0, 1)
            if typ == 1:
                offsets.setdefault((start + i, field(row, 2, 0)), field(row, 1, 0))
            elif typ == 2:
                compressed.setdefault(start + i, (field(row, 1, 0), field(row, 2, 0)))
            # type 0 = free: skipped (reference pdf_file.rs:248-249)
    return offsets, dict(st.attrs), compressed


_OBJ_HEADER_RE = re.compile(rb"(?:^|[\r\n])\s*(\d+)\s+(\d+)\s+obj\b")


def _recover_by_scan(data: bytes, tok: Tokenizer):
    """Damaged-footer recovery (the reference's reverse-scan spirit,
    pdf_file.rs:165-190, extended with scan-all-``obj``): when
    ``startxref`` is missing or points at garbage, rebuild the object
    index by scanning every ``N G obj`` header (last definition wins —
    incremental updates append), then recover the trailer: the LAST
    ``trailer`` keyword by reverse scan for CLASSIC layouts, or — the
    MODERN xref-stream layout carries no trailer keyword at all — a
    SYNTHESIZED trailer pointing at the newest scanned ``/Type
    /Catalog`` object.  Objects living in object streams are not
    recoverable this way; their dangling references degrade to lenient
    error rows."""
    trailer = None
    at = data.rfind(b"trailer")
    if at != -1:
        pos = skip_ws(data, at + len(b"trailer"))
        maybe, _ = tok.parse_value(pos)
        if isinstance(maybe, dict):
            trailer = maybe
    # collect ALL candidate offsets per (id, gen): a binary stream payload
    # can contain bytes that look like an object header, and naive
    # last-wins would let such a false match shadow the real object.
    # Validate candidates newest-first by actually parsing the header.
    candidates: dict = {}
    for m in _OBJ_HEADER_RE.finditer(data):
        candidates.setdefault((int(m.group(1)), int(m.group(2))), []).append(m.start(1))
    # Validation parses the full object (incl. stream body) — correct but
    # potentially quadratic if a large damaged file's binary streams are
    # riddled with false-positive header matches, so bound the number of
    # candidates tried per key (newest-first; real shadowing chains from
    # incremental updates are short).
    offsets: dict = {}
    catalog_key = None
    catalog_off = -1
    _MAX_CANDIDATES_PER_KEY = 4
    for key, offs in candidates.items():
        for off in list(reversed(offs))[:_MAX_CANDIDATES_PER_KEY]:
            # newest definition first (incremental updates)
            try:
                ind, _ = Tokenizer(data).parse_indirect_at(off)
            except ParsingError:
                continue
            if (ind.obj_id, ind.gen) == key:
                offsets[key] = off
                if (
                    isinstance(ind.value, dict)
                    and str(ind.value.get("Type")) == "Catalog"
                    and off > catalog_off
                ):
                    catalog_key, catalog_off = key, off
                break
    if not offsets:
        raise ParsingError("no indirect objects found during recovery scan")
    if trailer is None:
        if catalog_key is None:
            raise ParsingError(
                "missing startxref, no trailer keyword and no catalog object"
            )
        trailer = {
            "Root": Ref(catalog_key[0], catalog_key[1]),
            "Size": max(k[0] for k in offsets) + 1,
        }
    return offsets, trailer


def read_xref(data: bytes, max_prev: int = 64):
    """Follow the /Prev chain from ``startxref`` and merge sections
    (newest-first wins, matching incremental-update semantics); if the
    footer is damaged (no/corrupt ``startxref``), fall back to the
    reverse-trailer + scan-all-objects recovery.  Returns
    (offsets, trailer, compressed)."""
    tok = Tokenizer(data)
    try:
        at = find_startxref(data)
        return _read_xref_chain(data, at, tok, max_prev)
    except ParsingError as chain_err:
        try:
            offs, tr = _recover_by_scan(data, tok)
        except ParsingError as rec_err:
            # keep the original chain failure visible — it names the real
            # corruption; the scan error alone would hide it
            raise ParsingError(f"{rec_err} (after xref failure: {chain_err})") from chain_err
        return offs, tr, {}


def xref_sections(data: bytes, max_prev: int = 64) -> list:
    """The /Prev chain as a LIST of sections, newest-first:
    ``[(kind, offsets, compressed, trailer)]`` with kind ``'classic'`` /
    ``'stream'`` (a hybrid §7.5.8.4 section stays one 'classic' entry
    with its /XRefStm merged in).  Each section is one incremental-update
    REVISION of the document — the raw material for revision forensics
    (``extract_revisions``) as well as the merged view below."""
    tok = Tokenizer(data)
    at = find_startxref(data)
    sections: list = []
    seen: set = set()
    for _ in range(max_prev):
        if at in seen or at < 0 or at >= len(data):
            break
        seen.add(at)
        probe = skip_ws(data, at)
        if data[probe : probe + 4] == b"xref":
            kind = "classic"
            offs, tr = _parse_classic_xref(data, probe, tok)
            comp: dict = {}
            # hybrid-reference file (ISO 32000 §7.5.8.4): the classic
            # trailer's /XRefStm points at an xref stream carrying the
            # entries the classic table leaves free (objects living in
            # object streams).  Merge it before following /Prev.
            xstm = tr.get("XRefStm")
            if isinstance(xstm, int) and 0 <= xstm < len(data):
                try:
                    soffs, _str_tr, scomp = _parse_xref_stream(
                        data, skip_ws(data, xstm), tok
                    )
                    for k, v in soffs.items():
                        offs.setdefault(k, v)
                    for k, v in scomp.items():
                        comp.setdefault(k, v)
                except ParsingError:
                    pass  # lenient: hybrid stream unreadable -> classic only
        else:
            kind = "stream"
            offs, tr, comp = _parse_xref_stream(data, probe, tok)
        sections.append((kind, offs, comp, tr))
        prev = tr.get("Prev")
        if prev is None:
            break
        at = int(prev)
    if not sections:
        raise ParsingError("no trailer found")
    return sections


def _read_xref_chain(data: bytes, at: int, tok: Tokenizer, max_prev: int):
    del at  # the section walk re-derives the anchor from startxref
    offsets: dict = {}
    compressed: dict = {}
    trailer: dict = {}
    for _kind, offs, comp, tr in xref_sections(data, max_prev):
        for k, v in offs.items():
            offsets.setdefault(k, v)
        for k, v in comp.items():
            compressed.setdefault(k, v)
        for k, v in tr.items():
            trailer.setdefault(k, v)
    if not trailer:
        raise ParsingError("no trailer found")
    return offsets, trailer, compressed


def parse_all_objects(
    data: bytes,
    offsets: dict,
    compressed: dict,
    errors: list,
    decryptor=None,
    objstm_expanded: set | None = None,
):
    """Parse-all-then-join (SURVEY.md §2.4 A1): materialize every indexed
    object.  The reference parses lazily through a memo cache
    (pdf_file.rs:47-68); at cluster scale we parse each doc once and treat
    retrieval as dict/join lookup.  Indirect /Length is resolved against
    already-parsed objects or by direct offset parse (two-pass).

    ``decryptor`` (crypt.StandardDecryptor | None): in encrypted documents
    ObjStm containers must be decrypted BEFORE their payload is
    filter-decoded and expanded — the doc-wide decryption pass runs after
    parsing and would be too late for the objects inside.

    ``objstm_expanded``: if given, filled with the keys of objects that
    were ACTUALLY materialized out of an ObjStm (not merely listed in a —
    possibly stale — type-2 xref entry).  The decryption pass must skip
    exactly these: an object with a stale type-2 entry that was re-written
    as a direct object in a newer revision IS individually encrypted."""
    objects: dict = {}

    def length_resolver(ref: Ref):
        v = objects.get((ref.obj_id, ref.gen))
        if v is None:
            off = offsets.get((ref.obj_id, ref.gen))
            if off is None:
                return None
            try:
                ind, _ = Tokenizer(data).parse_indirect_at(off)
                objects[(ind.obj_id, ind.gen)] = ind.value
                v = ind.value
            except ParsingError:
                return None
        return v if isinstance(v, int) else None

    def _resync_header(obj_id: int, gen: int, off: int):
        """Offset-slop repair (broken real-world writers routinely emit
        xref offsets a few bytes off): look for the exact ``N G obj``
        header within +-64 bytes of the recorded offset."""
        pat = re.compile(rb"(?<![0-9])" + f"{obj_id} {gen} obj".encode("ascii"))
        lo = max(0, off - 64)
        m = pat.search(data, lo, min(len(data), off + 96))
        return m.start() if m is not None and m.start() != off else None

    tok = Tokenizer(data, length_resolver=length_resolver)
    for (obj_id, gen), off in sorted(offsets.items()):
        if (obj_id, gen) in objects:
            continue
        if off <= 0 or off >= len(data):
            errors.append(("ParsingError", "tokenize", f"offset {off} out of range for obj {obj_id}"))
            continue
        try:
            ind, _ = tok.parse_indirect_at(off)
            if ind.obj_id != obj_id:
                off2 = _resync_header(obj_id, gen, off)
                if off2 is not None:
                    try:
                        ind2, _ = tok.parse_indirect_at(off2)
                        if ind2.obj_id == obj_id:
                            objects[(ind2.obj_id, ind2.gen)] = ind2.value
                            errors.append((
                                "ParsingError", "tokenize",
                                f"obj {obj_id}: offset slop {off2 - off:+d} repaired",
                            ))
                            continue
                    except ParsingError:
                        pass
                errors.append(("ParsingError", "tokenize", f"xref points {obj_id} at object {ind.obj_id}"))
            objects[(ind.obj_id, ind.gen)] = ind.value
        except ParsingError as e:
            off2 = _resync_header(obj_id, gen, off)
            if off2 is not None:
                try:
                    ind, _ = tok.parse_indirect_at(off2)
                    if ind.obj_id == obj_id:
                        objects[(ind.obj_id, ind.gen)] = ind.value
                        errors.append((
                            "ParsingError", "tokenize",
                            f"obj {obj_id}: offset slop {off2 - off:+d} repaired",
                        ))
                        continue
                except ParsingError:
                    pass
            errors.append(("ParsingError", "tokenize", f"obj {obj_id}: {e}"))

    # Object streams (§7.5.7): type-2 entries live inside an ObjStm.
    for obj_id, (stm_id, _idx) in sorted(compressed.items()):
        if (obj_id, 0) in objects:
            continue
        container = resolve(Ref(stm_id, 0), objects)
        if not isinstance(container, Stream):
            errors.append(("ReferenceError", "tokenize", f"ObjStm {stm_id} missing for obj {obj_id}"))
            continue
        try:
            if container.data is None:
                if decryptor is not None and not container.decrypted:
                    container.raw = decryptor.decrypt_stream(stm_id, 0, container.raw)
                    container.decrypted = True
                container.data = decode_chain(container.raw, build_filter_chain(container.attrs, lambda v: resolve(v, objects)))
            payload = container.data
            n = int(resolve(container.attrs.get("N"), objects) or 0)
            first = int(resolve(container.attrs.get("First"), objects) or 0)
            itok = Tokenizer(payload)
            pairs = []
            p = 0
            for _ in range(n):
                onum, p = itok.parse_value(p)
                ooff, p = itok.parse_value(p)
                pairs.append((int(onum), int(ooff)))
            for onum, ooff in pairs:
                val, _ = Tokenizer(payload).parse_value(first + ooff)
                if (onum, 0) not in objects:
                    objects[(onum, 0)] = val
                    if objstm_expanded is not None:
                        objstm_expanded.add((onum, 0))
        except (ParsingError, ValueError, TypeError) as e:
            errors.append(("ParsingError", "tokenize", f"ObjStm {stm_id}: {e}"))
    return objects
