"""Property-based round-trip tests (hypothesis) for the parse kernel.

The reference's unit suites assert point examples (SURVEY.md §5); these
push the same operators through randomized round-trips: encode with an
independent reference encoder, decode with our kernel, require identity.
"""

from __future__ import annotations

import re
import zlib
from base64 import a85encode

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfparser_spark.core import filters
from pdfparser_spark.core.cmap import CMap
from pdfparser_spark.core.tokenizer import (
    Tokenizer,
    _parse_hex_string,
    _parse_literal_string,
    _parse_number,
)

BYTES = st.binary(min_size=0, max_size=300)
SETTINGS = dict(max_examples=120, deadline=None)


# --- filters ---------------------------------------------------------------


@given(data=BYTES, chunk=st.integers(1, 9), upper=st.booleans())
@settings(**SETTINGS)
def test_ascii_hex_roundtrip(data, chunk, upper):
    h = data.hex().upper() if upper else data.hex()
    # inject whitespace at chunk boundaries (spec allows arbitrary ws)
    spaced = "\n".join(h[i : i + chunk] for i in range(0, len(h), chunk))
    assert filters.ascii_hex_decode(spaced.encode() + b">") == data


@given(data=BYTES)
@settings(**SETTINGS)
def test_ascii85_roundtrip(data):
    assert filters.ascii85_decode(a85encode(data, adobe=False) + b"~>") == data


@given(data=BYTES, level=st.integers(0, 9))
@settings(**SETTINGS)
def test_flate_roundtrip(data, level):
    assert filters.flate_decode(zlib.compress(data, level)) == data


@given(data=st.binary(min_size=0, max_size=2000), early=st.integers(0, 1))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip(data, early):
    enc = filters.lzw_encode(data, early_change=early)
    assert filters.lzw_decode(enc, {"EarlyChange": early}) == data


@given(
    rows=st.integers(1, 12),
    cols=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_flate_png_predictor_roundtrip(rows, cols, seed):
    """Forward-encode with each PNG row filter (None/Sub/Up/Avg/Paeth chosen
    per row from the seed), flate-compress, then decode with Predictor=15."""
    import random

    rng = random.Random(seed)
    raw = bytes(rng.randrange(256) for _ in range(rows * cols))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    prev = bytes(cols)
    enc = bytearray()
    for r in range(rows):
        row = raw[r * cols : (r + 1) * cols]
        ft = rng.randrange(5)
        enc.append(ft)
        for i, x in enumerate(row):
            a = row[i - 1] if i > 0 else 0
            b = prev[i]
            c = prev[i - 1] if i > 0 else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = (x - a) & 0xFF
            elif ft == 2:
                v = (x - b) & 0xFF
            elif ft == 3:
                v = (x - (a + b) // 2) & 0xFF
            else:
                v = (x - paeth(a, b, c)) & 0xFF
            enc.append(v)
        prev = row
    parms = {"Predictor": 15, "Columns": cols, "Colors": 1, "BitsPerComponent": 8}
    assert filters.flate_decode(zlib.compress(bytes(enc)), parms) == raw


# --- tokenizer -------------------------------------------------------------


def _escape_literal(data: bytes) -> bytes:
    """Independent PDF literal-string writer: escape specials, octal-encode
    non-printables and EOL bytes (so the parser's EOL normalization never
    fires on payload bytes)."""
    out = bytearray(b"(")
    for b in data:
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([b])
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += ("\\%03o" % b).encode()
    out += b")"
    return bytes(out)


@given(data=BYTES)
@settings(**SETTINGS)
def test_literal_string_roundtrip(data):
    got, end = _parse_literal_string(_escape_literal(data), 0)
    assert got == data
    assert end == len(_escape_literal(data))


@given(data=BYTES, upper=st.booleans())
@settings(**SETTINGS)
def test_hex_string_roundtrip(data, upper):
    h = data.hex().upper() if upper else data.hex()
    got, _ = _parse_hex_string(("<" + h + ">").encode(), 0)
    assert got == data


@given(n=st.integers(-(2**31), 2**31 - 1))
@settings(**SETTINGS)
def test_integer_roundtrip(n):
    val, _ = _parse_number(str(n).encode(), 0)
    assert val == n and isinstance(val, int)


@given(n=st.floats(allow_nan=False, allow_infinity=False, width=32))
@settings(**SETTINGS)
def test_real_roundtrip(n):
    s = repr(float(n))
    if "e" in s or "E" in s:  # PDF reals have no exponent notation
        s = f"{float(n):.10f}"
    val, _ = _parse_number(s.encode(), 0)
    assert abs(val - float(s)) <= max(1e-6 * abs(float(s)), 1e-6)


@given(
    items=st.lists(
        st.one_of(
            st.integers(-1000, 1000),
            st.binary(min_size=0, max_size=12),
            st.booleans(),
        ),
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_array_roundtrip(items):
    parts = []
    for it in items:
        if isinstance(it, bool):
            parts.append(b"true" if it else b"false")
        elif isinstance(it, int):
            parts.append(str(it).encode())
        else:
            parts.append(_escape_literal(it))
    src = b"[ " + b" ".join(parts) + b" ]"
    val, _ = Tokenizer(src).parse_value(0)
    assert val == items


# --- CMap ------------------------------------------------------------------


@given(
    mapping=st.dictionaries(
        st.integers(0, 255),
        st.integers(0x20, 0xD700),  # BMP, below surrogates
        min_size=1,
        max_size=20,
    ),
    data=st.lists(st.integers(0, 255), max_size=40),
)
@settings(**SETTINGS)
def test_cmap_bfchar_roundtrip(mapping, data):
    entries = "\n".join(
        f"<{code:02X}> <{ord(ch):04X}>"
        for code, ch in ((c, chr(u)) for c, u in mapping.items())
    )
    cmap = (
        "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        f"{len(mapping)} beginbfchar\n{entries}\nendbfchar\nendcmap"
    ).encode()
    cm = CMap.parse(cmap)
    expected = "".join(chr(mapping[b]) if b in mapping else "�" for b in data)
    assert cm.decode(bytes(data)) == expected


@given(lo=st.integers(0, 200), span=st.integers(0, 55), base=st.integers(0x41, 0x2000))
@settings(**SETTINGS)
def test_cmap_bfrange_roundtrip(lo, span, base):
    hi = lo + span
    cmap = (
        "begincmap\n1 beginbfrange\n"
        f"<{lo:02X}> <{hi:02X}> <{base:04X}>\n"
        "endbfrange\nendcmap"
    ).encode()
    cm = CMap.parse(cmap)
    data = bytes(range(lo, min(hi + 1, 256)))
    expected = "".join(chr(base + i) for i in range(len(data)))
    assert cm.decode(data) == expected


# --- crash-safety fuzz -----------------------------------------------------
# Lenient ("stoic", reference pdf_file.rs:879-889) semantics: a corrupt
# document must produce error rows, never an exception — at cluster scale an
# exception is a task failure that kills the whole stage.

from pdfparser_spark.core.extract import extract_spans  # noqa: E402
from pdfparser_spark.synth import build_document  # noqa: E402


def _doc_payload(doc_id: int, text: str) -> bytes:
    d = build_document(doc_id, text)
    parts = sorted((s for s in d["span_rows"] if s["text"] is not None), key=lambda s: s["offset"])
    return "".join(s["text"] for s in parts).encode("latin-1")


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=150, deadline=None)
def test_extract_never_raises_on_garbage(data):
    res = extract_spans(data)
    assert isinstance(res["spans"], list)
    assert res["errors"]  # garbage must be *reported*, not silently empty


@given(
    doc_id=st.integers(0, 500),
    cut=st.floats(0.01, 0.99),
)
@settings(max_examples=60, deadline=None)
def test_extract_never_raises_on_truncation(doc_id, cut):
    payload = _doc_payload(doc_id, "the quick brown fox jumps over the lazy dog")
    res = extract_spans(payload[: int(len(payload) * cut)])
    assert isinstance(res["spans"], list)


@given(
    doc_id=st.integers(0, 500),
    flips=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 255)), min_size=1, max_size=8),
)
@settings(max_examples=60, deadline=None)
def test_extract_never_raises_on_byte_flips(doc_id, flips):
    payload = bytearray(_doc_payload(doc_id, "stream filter sort hash merge join window"))
    for pos, val in flips:
        payload[pos % len(payload)] = val
    res = extract_spans(bytes(payload))
    assert isinstance(res["spans"], list)
    assert isinstance(res["errors"], list)


# --- content-stream tokenizer property -------------------------------------

from pdfparser_spark.core.content import tokenize_content  # noqa: E402


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("Tj"), st.binary(min_size=0, max_size=20)),
            st.tuples(st.just("TJ"), st.lists(st.binary(min_size=1, max_size=8), min_size=1, max_size=4)),
            st.tuples(st.just("Tf"), st.sampled_from(["F1", "F2", "Helv"])),
            st.tuples(st.just("Do"), st.sampled_from(["Im1", "Im2"])),
            st.tuples(st.just("Td"), st.integers(-500, 500)),
        ),
        max_size=15,
    )
)
@settings(max_examples=100, deadline=None)
def test_content_tokenizer_event_sequence(ops):
    """Build a content stream from a random operator program with an
    independent writer; the tokenizer must recover exactly the text/media
    events in order, with the font state threaded correctly."""
    parts = [b"BT"]
    expected = []
    font = None
    for op, arg in ops:
        if op == "Tj":
            parts.append(_escape_literal(arg) + b" Tj")
            expected.append(("text", font, arg))
        elif op == "TJ":
            arr = b"[ " + b" ".join(_escape_literal(x) + b" -120" for x in arg) + b" ] TJ"
            parts.append(arr)
            expected.append(("textarr", font, list(arg)))
        elif op == "Tf":
            font = arg
            parts.append(f"/{arg} 12 Tf".encode())
        elif op == "Do":
            parts.append(f"/{arg} Do".encode())
            expected.append(("media", arg))
        else:  # Td: positioning only, no event
            parts.append(f"{arg} 0 Td".encode())
    parts.append(b"ET")
    stream = b"\n".join(parts)

    got = []
    for ev in tokenize_content(stream):
        if ev[0] == "text":
            got.append(("text", ev[2], ev[3]))
        elif ev[0] == "textarr":
            got.append(("textarr", ev[2], [x for x in ev[3] if isinstance(x, bytes)]))
        elif ev[0] == "media":
            got.append(("media", ev[2]))
    assert got == expected


# --- binary real-writer family (r2) ---------------------------------------

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=10)


@given(
    doc_id=st.integers(0, 10**9),
    words=st.lists(_WORD, min_size=1, max_size=40),
)
@settings(max_examples=80, deadline=None)
def test_binary_family_roundtrip_property(doc_id, words):
    """Any doc_id (any rule combination: RC4/AESV2/plain x classic/stream
    xref x media x inline) and any word list extracts span-for-span and
    reconstructs byte-for-byte from its span rows."""
    from pdfparser_spark.core.extract import extract_spans
    from pdfparser_spark.synth import build_document_binary, reconstruct

    text = " ".join(words)
    d = build_document_binary(doc_id, text)
    assert reconstruct(d["span_rows"]) == d["bytes"]
    res = extract_spans(d["bytes"], strict=True)
    assert res["errors"] == []
    assert res["spans"] == d["expected"]


@given(
    doc_id=st.integers(0, 10**6),
    words=st.lists(_WORD, min_size=1, max_size=30),
    cut_kind=st.sampled_from(["truncate", "corrupt"]),
)
@settings(max_examples=40, deadline=None)
def test_footer_recovery_property(doc_id, words, cut_kind):
    """Damaged-footer recovery holds for arbitrary classic-xref docs."""
    from pdfparser_spark.core.extract import extract_spans
    from pdfparser_spark.synth import build_document

    doc_id = doc_id * 2  # classic-xref family (even ids)
    d = build_document(doc_id, " ".join(words))
    raw = d["bytes"]
    if cut_kind == "truncate":
        raw = raw[: raw.rfind(b"startxref")]
    else:
        raw = re.sub(rb"startxref\n\d+", b"startxref\n999999999999", raw)
    res = extract_spans(raw, strict=False)
    assert res["spans"] == d["expected"]


@given(
    doc_id=st.integers(0, 10**4),
    seed=st.integers(0, 2**31),
    n_mutations=st.integers(1, 12),
)
@settings(max_examples=100, deadline=None)
def test_lenient_mode_never_raises_on_mutations(doc_id, seed, n_mutations):
    """Corruption robustness: arbitrary byte flips/deletions/insertions in a
    valid document must NEVER escape extract_spans as an exception in
    lenient mode — a poisoned document on a 1000-executor job must cost one
    error row, not the task."""
    import random

    from pdfparser_spark.core.extract import extract_spans
    from pdfparser_spark.synth import build_document, build_document_binary

    build = build_document_binary if doc_id % 2 else build_document
    raw = bytearray(build(doc_id, "some words here for pages one and two extra")["bytes"])
    rng = random.Random(seed)
    for _ in range(n_mutations):
        op = rng.randrange(3)
        pos = rng.randrange(len(raw))
        if op == 0:
            raw[pos] = rng.randrange(256)
        elif op == 1:
            del raw[pos]
        else:
            raw.insert(pos, rng.randrange(256))
    res = extract_spans(bytes(raw), strict=False)  # must not raise
    assert isinstance(res["spans"], list)


def test_every_prefix_parses_leniently():
    """EVERY byte-prefix of a document (any truncation point at all) must
    return error rows, never raise — the strongest truncation guarantee."""
    from pdfparser_spark.core.extract import extract_spans
    from pdfparser_spark.synth import build_document, build_document_binary

    for did, build in [(4, build_document), (15, build_document_binary)]:
        raw = build(did, "some words here for pages one and two")["bytes"]
        for cut in range(0, len(raw) + 1, 3):
            res = extract_spans(raw[:cut], strict=False)
            assert isinstance(res["spans"], list)


# --- media codecs (jpeg.py / png.py / audio.py): decode containment --------
# A decoder fed garbage, truncation, or bit flips must either succeed or
# raise ValueError — never hang, never leak IndexError/struct.error/
# zlib.error/KeyError (one corrupt payload must not kill a Spark task;
# extract_images_fused relies on this containment).


def _codec_samples():
    import numpy as np

    from pdfparser_spark.textops import audio, gif, jpeg, media, mp4, png, tiff

    img = media._gradient(32, 24)
    return [
        jpeg.encode_jpeg(media._block_pattern(32, 16)),
        jpeg.encode_jpeg(img, subsample=True, restart_interval=2),
        png.encode_png(img),
        audio.encode_wav(audio._waveform(200, 2), 16000),
        tiff.encode_tiff(img, packbits=True),
        tiff.encode_tiff(img[:, :, 0], big_endian=True),
        gif.encode_gif(*media._gif_pattern(24, 16)),
        mp4.encode_mp4_meta(4200, 64, 48, with_audio=True),
        mp4.encode_mp4_mjpeg(
            [jpeg.encode_jpeg(media._block_pattern(16, 16, 11 * f)) for f in range(3)], 16, 16
        ),
    ]


@given(idx=st.integers(0, 8), cut=st.integers(0, 400))
@settings(**SETTINGS)
def test_codec_decoders_contained_on_truncation(idx, cut):
    from pdfparser_spark.textops.media import sniff_decode

    payload = _codec_samples()[idx]
    truncated = payload[: min(cut, len(payload))]
    try:
        sniff_decode(truncated)
        from pdfparser_spark.textops import audio, mp4
        from pdfparser_spark.textops.media import decode_video_real

        if truncated[:4] == b"RIFF":
            audio.decode_wav(truncated)
        if truncated[4:8] == b"ftyp":
            mp4.decode_mp4_meta(truncated)
            decode_video_real(truncated)
    except ValueError:
        pass  # the documented failure mode


@given(idx=st.integers(0, 8), seed=st.integers(0, 2**31))
@settings(**SETTINGS)
def test_codec_decoders_contained_on_bit_flips(idx, seed):
    import random

    from pdfparser_spark.textops import audio, mp4
    from pdfparser_spark.textops.media import sniff_decode

    payload = bytearray(_codec_samples()[idx])
    rng = random.Random(seed)
    for _ in range(rng.randint(1, 8)):
        payload[rng.randrange(len(payload))] ^= 1 << rng.randrange(8)
    data = bytes(payload)
    try:
        sniff_decode(data)
        if data[:4] == b"RIFF":
            audio.decode_wav(data)
        if data[4:8] == b"ftyp":
            mp4.decode_mp4_meta(data)
            from pdfparser_spark.textops.media import decode_video_real

            decode_video_real(data)
    except ValueError:
        pass


@given(
    doc_id=st.integers(0, 40),
    seed=st.integers(0, 10_000),
    n_mutations=st.integers(1, 12),
)
@settings(max_examples=80, deadline=None)
def test_doc_meta_never_raises_on_mutations(doc_id, seed, n_mutations):
    """The metadata walker (/Info + /Outlines chain) is lenient like the
    span kernel: arbitrary mutations yield Nones/zero + error rows, never
    an exception (and never an unbounded outline loop — the walk is
    cycle-capped)."""
    import random

    from pdfparser_spark.core.extract import extract_doc_meta
    from pdfparser_spark.synth import build_document

    raw = bytearray(build_document(doc_id, "some words here for pages one and two")["bytes"])
    rng = random.Random(seed)
    for _ in range(n_mutations):
        op = rng.randrange(3)
        pos = rng.randrange(len(raw))
        if op == 0:
            raw[pos] = rng.randrange(256)
        elif op == 1:
            del raw[pos]
        else:
            raw.insert(pos, rng.randrange(256))
    m = extract_doc_meta(bytes(raw))
    assert 0 <= m["n_outlines"] <= 4096


@given(
    doc_id=st.integers(0, 40),
    seed=st.integers(0, 10_000),
    n_mutations=st.integers(1, 12),
)
@settings(max_examples=80, deadline=None)
def test_doc_graph_never_raises_on_mutations(doc_id, seed, n_mutations):
    """The interactive-tier walker (/Annots links + /AcroForm fields) is
    lenient like the span kernel: arbitrary mutations yield empty lists +
    error rows, never an exception."""
    import random

    from pdfparser_spark.core.extract import extract_doc_graph
    from pdfparser_spark.synth import build_document

    raw = bytearray(build_document(doc_id, "some words here for pages one and two")["bytes"])
    rng = random.Random(seed)
    for _ in range(n_mutations):
        op = rng.randrange(3)
        pos = rng.randrange(len(raw))
        if op == 0:
            raw[pos] = rng.randrange(256)
        elif op == 1:
            del raw[pos]
        else:
            raw.insert(pos, rng.randrange(256))
    g = extract_doc_graph(bytes(raw))
    assert isinstance(g["links"], list) and isinstance(g["fields"], list)


@given(
    doc_id=st.integers(0, 40),
    seed=st.integers(0, 10_000),
    n_mutations=st.integers(1, 12),
)
@settings(max_examples=80, deadline=None)
def test_attachments_never_raise_on_mutations(doc_id, seed, n_mutations):
    """The name-tree walker (/Names /EmbeddedFiles -> /Filespec -> /EF) is
    lenient like the span kernel: arbitrary mutations yield an empty list
    + error rows, never an exception (and the walk is depth-capped, so a
    mutated self-referencing /Kids cannot loop)."""
    import random

    from pdfparser_spark.core.extract import extract_attachments
    from pdfparser_spark.synth import build_document

    raw = bytearray(build_document(doc_id, "some words here for pages one and two")["bytes"])
    rng = random.Random(seed)
    for _ in range(n_mutations):
        op = rng.randrange(3)
        pos = rng.randrange(len(raw))
        if op == 0:
            raw[pos] = rng.randrange(256)
        elif op == 1:
            del raw[pos]
        else:
            raw.insert(pos, rng.randrange(256))
    g = extract_attachments(bytes(raw))
    assert isinstance(g["attachments"], list)


@given(
    words=st.lists(
        st.text(
            # printable latin-1 minus space (the word separator) and minus
            # CR/LF (literal-string EOL normalization changes the bytes on
            # purpose, ISO 32000 §7.3.4.2)
            alphabet=st.characters(
                min_codepoint=0x21, max_codepoint=0xFF, exclude_characters="\x7f\xad"
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=40,
    ),
    doc_id=st.integers(0, 50),
)
@settings(max_examples=60, deadline=None)
def test_columns_family_roundtrips_arbitrary_words(words, doc_id):
    """Arbitrary word content — unbalanced parens and backslashes
    included — round-trips through the columns builder's literal-string
    escaping and the layout kernel's kerning-aware TJ join."""
    from pdfparser_spark.core.extract import extract_layout_spans
    from pdfparser_spark.synth import build_document_columns, expected_columns

    text = " ".join(words)
    d = build_document_columns(doc_id, text)
    r = extract_layout_spans(d["bytes"])
    assert not r["errors"], r["errors"][:2]
    got = sorted(
        enumerate(r["spans"]),
        key=lambda e: (e[1][0], e[1][1] >= 200, -e[1][2], e[1][1], e[0]),
    )
    exp = expected_columns(doc_id, text)
    assert [(p, x, y, t) for _i, (p, x, y, t, _s) in got] == [
        (p, x, y, t) for (_o, p, _c, x, y, t) in exp
    ]


# --- advance kernel + marked content under mutation -------------------------

from pdfparser_spark.core.extract import extract_advance_spans  # noqa: E402
from pdfparser_spark.synth import build_document_advance  # noqa: E402


@given(
    doc_id=st.integers(0, 500),
    seed=st.integers(0, 10**6),
    n_mutations=st.integers(1, 10),
)
@settings(max_examples=60, deadline=None)
def test_advance_never_raises_on_mutations(doc_id, seed, n_mutations):
    """The glyph-advance kernel (width tables, Tc/Tw/Tz state, CID codes)
    stays lenient under arbitrary byte corruption — errors become metric
    rows, never task-killing exceptions."""
    import random

    d = build_document_advance(doc_id, "stream filter sort hash merge join window gap")
    payload = bytearray(d["bytes"])
    rng = random.Random(seed)
    for _ in range(n_mutations):
        payload[rng.randrange(len(payload))] = rng.randrange(256)
    res = extract_advance_spans(bytes(payload))
    assert isinstance(res["spans"], list)
    assert isinstance(res["errors"], list)
    for span in res["spans"]:
        assert isinstance(span[3], int)  # ax_micro stays integral


@given(
    doc_id=st.sampled_from([76, 214, 352, 40, 69, 127, 13, 44, 168]),
    seed=st.integers(0, 10**6),
    n_mutations=st.integers(1, 10),
)
@settings(max_examples=60, deadline=None)
def test_marked_content_docs_never_raise_on_mutations(doc_id, seed, n_mutations):
    """ActualText (76/214/352), hidden-OCG (40/69/127) and split-content
    (13/44/168) docs under corruption: BDC/EMC imbalance, a clipped
    /OCProperties or a broken /Contents array must all stay contained."""
    import random

    from pdfparser_spark.synth import build_document

    d = build_document(doc_id, "stream filter sort hash merge join window gap")
    payload = bytearray(d["bytes"])
    rng = random.Random(seed)
    for _ in range(n_mutations):
        payload[rng.randrange(len(payload))] = rng.randrange(256)
    res = extract_spans(bytes(payload))
    assert isinstance(res["spans"], list)
    assert isinstance(res["errors"], list)


# --- content tokenizer (all three modes) ------------------------------------


def test_unknown_operators_and_bx_ex_are_tolerated():
    """§7.8.2.2 compatibility: unknown operators — inside a BX..EX
    compatibility section or not — must be skipped without derailing
    the show stream (what real extended-feature PDFs rely on)."""
    from pdfparser_spark.core.content import tokenize_content

    evs = tokenize_content(b"BT (a) Tj BX /Foo 3 XYZ EX 1 0 ZZ (b) Tj ET")
    assert [e[3] for e in evs if e[0] == "text"] == [b"a", b"b"]


@given(data=BYTES)
@settings(**SETTINGS)
def test_tokenize_content_never_raises(data):
    """Arbitrary bytes through the content machine in every mode: the
    lenient contract is 'skip and resync', never an exception, and the
    advance-mode event tuples keep their 13-field shape."""
    from pdfparser_spark.core.content import tokenize_content

    for kw in ({}, {"layout": True}, {"advance": True}):
        evs = tokenize_content(data, **kw)
        for ev in evs:
            if ev[0] in ("text", "textarr", "atext") and kw.get("advance"):
                assert len(ev) == 13
                # Tc/Tw/rise milli-ints, Tz percent int, Tr mode int
                assert all(isinstance(v, int) for v in (ev[7], ev[8], ev[9], ev[11], ev[12]))


@given(
    ops=st.lists(
        st.sampled_from(
            [b"(x) Tj", b"1 2 Td", b"5 Ts", b"3 Tr", b"0 Tr", b"[(a) 3 (b)] TJ",
             b"2 Tc", b"1 Tw", b"50 Tz", b"BT", b"ET", b"T*", b"0.5 -0.5 Td"]
        ),
        max_size=24,
    )
)
@settings(**SETTINGS)
def test_tokenize_content_advance_state_machine(ops):
    """Random operator interleavings: rise/mode fields always reflect the
    most recent Ts/Tr, and seg resets exactly on positioning ops."""
    from pdfparser_spark.core.content import tokenize_content

    data = b" ".join(ops)
    rise = tr = 0
    seg = 0
    expected = []
    for op in ops:
        if op == b"5 Ts":
            rise = 5000
        elif op == b"3 Tr":
            tr = 3
        elif op == b"0 Tr":
            tr = 0
        elif op in (b"1 2 Td", b"BT", b"T*", b"0.5 -0.5 Td"):
            seg = 0
        elif op in (b"(x) Tj", b"[(a) 3 (b)] TJ"):
            expected.append((seg, rise, tr))
            seg += 1
    got = [
        (ev[10], ev[11], ev[12])
        for ev in tokenize_content(data, advance=True)
        if ev[0] in ("text", "textarr")
    ]
    assert got == expected


@given(
    doc_id=st.integers(0, 500),
    seed=st.integers(0, 10**6),
    n_mutations=st.integers(1, 10),
)
@settings(max_examples=60, deadline=None)
def test_tagged_never_raises_on_mutations(doc_id, seed, n_mutations):
    """Byte-mutated tagged documents (structure tree included) must
    degrade to error rows, never exceptions — same lenient contract as
    every other kernel entry point."""
    import random as _random

    from pdfparser_spark.core.extract import extract_tagged_spans
    from pdfparser_spark.synth import build_document_tagged

    data = bytearray(build_document_tagged(doc_id, "alpha beta gamma delta eps zeta")["bytes"])
    rng = _random.Random(seed)
    for _ in range(n_mutations):
        data[rng.randrange(len(data))] = rng.randrange(256)
    r = extract_tagged_spans(bytes(data))
    assert isinstance(r["spans"], list)
