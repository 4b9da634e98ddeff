"""Glyph-width advance layout kernel (core.extract.extract_advance_spans).

The advance family (synth.build_document_advance) shows each line as
multiple segments with no positioning operator between them; a segment's
x offset is recoverable only by folding the font's /FirstChar//Widths
table, Tc/Tw/Tz and TJ kerns into an exact integer cursor (ISO 32000
§9.3.2-9.3.4, §9.4.3-9.4.4).  The reference never reaches this tier
(content streams are stub types, pdf_file.rs:705).
"""

from pdfparser_spark.core.content import tokenize_content
from pdfparser_spark.core.extract import extract_advance_spans
from pdfparser_spark.synth import (
    adv_font_size,
    adv_kern,
    adv_tc_milli,
    adv_tw_milli,
    adv_tz_pct,
    build_document_advance,
    expected_advance,
)

TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi"


def _spans(doc_id: int, text: str = TEXT):
    d = build_document_advance(doc_id, text)
    res = extract_advance_spans(d["bytes"])
    assert res["errors"] == []
    return res["spans"]


def test_advance_matches_analytic_expectation():
    # every doc id residue class: fs x tc x tw x tz x kern all vary
    for doc_id in range(0, 420, 7):
        exp = [
            (p, 72.0, y, ax, t, float(fs), m)
            for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(doc_id, TEXT)
        ]
        assert _spans(doc_id) == exp, f"doc {doc_id}"


def test_advance_cursor_is_exact_integer_math():
    # doc 0: fs=12 tc=0 tw=0 tz=50 k=300 — hand-check the second segment:
    # seg0 'alpha beta gamma' advances sum(w(c))*12*50 micro
    spans = _spans(0)
    seg0 = spans[0]
    assert seg0[3] == 0 and seg0[4] == "alpha beta gamma"
    w = lambda ch: 300 + (ord(ch) % 8) * 50
    manual = sum(w(c) * 12 * 50 for c in "alpha beta gamma")
    assert spans[1][3] == manual and spans[1][4] == "delta"


def test_advance_kern_moves_cursor_both_directions():
    # k = 300 - (doc%7)*150: doc 10 -> -300 (moves RIGHT, cursor grows);
    # doc 7 -> +300 (moves LEFT).  Compare segment-2 cursor vs the
    # no-kern position (cursor after segment 1).
    for doc_id, sign in ((7, -1), (10, +1)):
        fs, tz = adv_font_size(doc_id), adv_tz_pct(doc_id)
        k = adv_kern(doc_id)
        spans = _spans(doc_id)
        tc, tw = adv_tc_milli(doc_id), adv_tw_milli(doc_id)
        from pdfparser_spark.synth import adv_eff_width

        # font-kind-aware widths (doc 7 is the embedded-TrueType variant)
        w = lambda ch: adv_eff_width(doc_id, ord(ch))
        seg1 = spans[1]
        after1 = seg1[3] + sum(
            w(c) * fs * tz + tc * tz + (tw * tz if c == " " else 0) for c in seg1[4]
        )
        assert spans[2][3] - after1 == -k * fs * tz
        assert (spans[2][3] - after1 > 0) == (sign > 0)


def test_quote_operator_sets_spacing_before_show():
    # aw ac string " sets Tw/Tc BEFORE showing (§9.4.3): the shown
    # string's own advance uses the new spacing
    evs = tokenize_content(b"BT /F1 10 Tf 2 1 (ab) \" ET", advance=True)
    assert len(evs) == 1
    kind, _at, _f, payload, _x, _y, fs, tc, tw, tz, seg, rise, tr = evs[0]
    assert (kind, payload, fs) == ("text", b"ab", 10.0)
    assert (tw, tc, tz, seg, rise, tr) == (2000, 1000, 100, 0, 0, 0)


def test_seg_counter_resets_on_positioning():
    evs = tokenize_content(
        b"BT (a) Tj (b) Tj 0 -10 Td (c) Tj T* (d) Tj ET", advance=True
    )
    assert [e[10] for e in evs] == [0, 1, 0, 0]


def test_missing_widths_defaults_to_500():
    # a font with no /Widths: every glyph advances 500/1000 * fs * tz
    from pdfparser_spark.core.extract import _font_widths

    lk, cw, apply_tw, _v = _font_widths({"Subtype": "Type1"}, {})
    assert lk(65) == 500 and lk(32) == 500
    assert cw == 1 and apply_tw is True


def test_cid_font_w_table_and_dw():
    # Type0 widths from the descendant's /W; both entry forms; /DW
    # covers unlisted CIDs; 2-byte codes; Tw inert (§9.3.3)
    from pdfparser_spark.core.extract import _font_widths

    font = {
        "Subtype": "Type0",
        "DescendantFonts": [
            {"Subtype": "CIDFontType2", "DW": 750, "W": [10, [100, 200], 20, 22, 333]}
        ],
    }
    lk, cw, apply_tw, _v = _font_widths(font, {})
    assert (lk(10), lk(11)) == (100, 200)  # c [w...] form
    assert lk(20) == lk(21) == lk(22) == 333  # c_first c_last w form
    assert lk(9999) == 750  # /DW default
    assert cw == 2 and apply_tw is False


def test_cid_tounicode_bfchar_overrides_are_unicode():
    # the CID CMap's bfchar entries override the bfrange identities
    # (§9.10.3, later wins) with non-ASCII targets: 'e' -> é and
    # 'o' -> U+1F600 (a surrogate pair) — decode is genuinely Unicode
    # while the cursor stays keyed by the ORIGINAL codes
    spans = _spans(6)
    joined = " ".join(s[4] for s in spans)
    assert "é" in joined and "\U0001f600" in joined
    assert "e" not in joined and "o" not in joined
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(6, TEXT)
    ]
    assert spans == exp  # cursors unchanged by the text mapping


def test_cid_advance_family_end_to_end():
    # doc 6 is the CID variant (doc%11==6): hex-string shows, /W widths,
    # ToUnicode bfrange decode, word spacing inert
    spans = _spans(6)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(6, TEXT)
    ]
    assert spans == exp
    assert adv_tw_milli(6) == 0 or True  # Tw may be nonzero in content...
    # ...but the cursor must NOT include it: recompute seg-1 offset with
    # tw excluded and assert equality.  Widths are keyed by the ORIGINAL
    # codes, so undo the ToUnicode bfchar mapping first.
    orig = spans[0][4].replace("é", "e").replace("\U0001f600", "o")
    w = lambda ch: 300 + (ord(ch) % 8) * 50
    fs, tz = adv_font_size(6), adv_tz_pct(6)
    tc = adv_tc_milli(6)
    manual = sum(w(c) * fs * tz + tc * tz for c in orig)
    assert spans[1][3] == manual


def test_type3_fontmatrix_scales_widths():
    # Type3 /Widths are glyph-space; text-space advance = w * FontMatrix[0]
    # (§9.6.4): folded into an effective per-mille width by the lookup
    from pdfparser_spark.core.extract import _font_widths

    font = {
        "Subtype": "Type3",
        "FontMatrix": [0.002, 0, 0, 0.002, 0, 0],
        "FirstChar": 65,
        "Widths": [400, 500],
    }
    lk, cw, apply_tw, _v = _font_widths(font, {})
    assert (lk(65), lk(66)) == (800, 1000)  # 2x the glyph-space value
    assert lk(64) == 0 and lk(67) == 0  # no glyph -> nothing painted -> 0
    assert cw == 1 and apply_tw is True
    # a Type3 with no /Widths at all advances nothing
    lk2, _, _, _v = _font_widths({"Subtype": "Type3", "FontMatrix": [0.01, 0, 0, 0.01, 0, 0]}, {})
    assert lk2(65) == 0


def test_courier_std14_builtin_metrics():
    # standard-14 fallback (§9.6.2.2): Courier family without /Widths is
    # monospace 600/1000 em; subset prefixes strip; proportional fonts
    # keep the conventional 500 default
    from pdfparser_spark.core.extract import _font_widths

    for base in ("Courier", "Courier-Bold", "Courier-BoldOblique"):
        lk, cw, tw, _v = _font_widths({"Subtype": "Type1", "BaseFont": base}, {})
        assert lk(32) == lk(65) == lk(126) == 600 and cw == 1 and tw is True
    lk, _, _, _v = _font_widths({"Subtype": "Type1", "BaseFont": "ABCDEF+Courier"}, {})
    assert lk(65) == 600
    lk, _, _, _v = _font_widths({"Subtype": "Type1", "BaseFont": "Times-Roman"}, {})
    assert lk(65) == 500


def test_helvetica_std14_builtin_metrics():
    # width-less /Helvetica resolves through the public Core-14 AFM table
    # (proportional — spot-check well-known values); Bold/Oblique faces
    # have different AFMs we don't carry, so they keep the 500 default
    from pdfparser_spark.core.extract import HELVETICA_WIDTHS, _font_widths

    lk, cw, tw, _v = _font_widths({"Subtype": "Type1", "BaseFont": "Helvetica"}, {})
    assert (lk(32), lk(ord("i")), lk(ord("m")), lk(ord("W"))) == (278, 222, 833, 944)
    assert lk(200) == 500 and cw == 1 and tw is True
    lk, _, _, _v = _font_widths({"Subtype": "Type1", "BaseFont": "GHIJKL+Helvetica"}, {})
    assert lk(ord("a")) == 556
    lk, _, _, _v = _font_widths({"Subtype": "Type1", "BaseFont": "Helvetica-Bold"}, {})
    assert lk(ord("a")) == 500
    assert len(HELVETICA_WIDTHS) == 95


def test_helvetica_advance_family_end_to_end():
    # doc 11 is the width-less Helvetica variant (doc%13==11, non-CID):
    # every glyph advance comes from the built-in proportional table
    from pdfparser_spark.core.extract import HELVETICA_WIDTHS

    spans = _spans(11)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(11, TEXT)
    ]
    assert spans == exp
    fs, tz = adv_font_size(11), adv_tz_pct(11)
    tc, tw = adv_tc_milli(11), adv_tw_milli(11)
    manual = sum(
        HELVETICA_WIDTHS[ord(c) - 32] * fs * tz + tc * tz + (tw * tz if c == " " else 0)
        for c in spans[0][4]
    )
    assert spans[1][3] == manual


def test_text_rise_displaces_segment_baseline():
    # doc 5 (doc%19==5): segment 1 rides at y + 0.5 pt ((1 + 5%4) * 0.25);
    # the rise never touches the cursor (§9.3.7)
    from pdfparser_spark.synth import adv_rise_milli

    assert adv_rise_milli(5) == 500
    spans = _spans(5)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(5, TEXT)
    ]
    assert spans == exp
    by_line = [s for s in spans if s[2] in (720.0, 720.5)]
    assert any(s[2] == 720.5 for s in by_line)  # the risen segment
    assert any(s[2] == 720.0 for s in by_line)  # its neighbors


def test_render_mode_reported_not_dropped():
    # doc 4 (doc%17==4): segment 1 is invisible ink (Tr 3) — the span is
    # still emitted, its glyphs still advance the cursor, and mode=3 is
    # reported (the OCR-text-layer convention)
    spans = _spans(4)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(4, TEXT)
    ]
    assert spans == exp
    modes = [s[6] for s in spans]
    assert 3 in modes and 0 in modes
    # segment 2's cursor includes the invisible segment's full advance
    texts = [s[4] for s in spans]
    assert all(t for t in texts)


def test_rise_and_mode_compose():
    # doc 157: 157%19==5 AND 157%17==4 — segment 1 is BOTH risen and
    # invisible; the split-TJ writer path must keep the cursor exact
    spans = _spans(157)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(157, TEXT)
    ]
    assert spans == exp
    # the risen+invisible segment: mode 3 and a fractional baseline
    assert any(s[6] == 3 and s[2] != int(s[2]) for s in spans)


def test_type3_advance_family_end_to_end():
    # doc 2 is the Type3 variant (doc%13==2, non-CID): text decodes
    # through /Encoding /Differences uniXXXX names, the cursor through
    # glyph-space /Widths x FontMatrix 0.002
    spans = _spans(2)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(2, TEXT)
    ]
    assert spans == exp
    # the doubled widths are observable: seg-1 offset is exactly the
    # doubled-glyph sum (plus unscaled Tc/Tw terms)
    w = lambda ch: (300 + (ord(ch) % 8) * 50) * 2
    fs, tz = adv_font_size(2), adv_tz_pct(2)
    tc, tw = adv_tc_milli(2), adv_tw_milli(2)
    manual = sum(
        w(c) * fs * tz + tc * tz + (tw * tz if c == " " else 0) for c in spans[0][4]
    )
    assert spans[1][3] == manual


def test_courier_advance_family_end_to_end():
    # doc 9 is the width-less Courier variant (doc%13==9, non-CID):
    # every glyph advances the built-in 600
    spans = _spans(9)
    exp = [
        (p, 72.0, y, ax, t, float(fs), m)
        for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(9, TEXT)
    ]
    assert spans == exp
    fs, tz = adv_font_size(9), adv_tz_pct(9)
    tc, tw = adv_tc_milli(9), adv_tw_milli(9)
    manual = sum(
        600 * fs * tz + tc * tz + (tw * tz if c == " " else 0) for c in spans[0][4]
    )
    assert spans[1][3] == manual


def test_vertical_identity_v_end_to_end():
    """Identity-V docs (§9.7.4.3): ax_micro is the NEGATIVE vertical
    cursor — w1·fs + Tc per glyph from /DW2, /W2 overriding a-z and the
    space at w1y+200 (both entry shapes), TJ kerns un-scaled by Tz."""
    from pdfparser_spark.synth import adv_has_w2, adv_is_vert, adv_w1, adv_w1y

    vert_ids = [d for d in range(0, 400) if adv_is_vert(d)]
    assert vert_ids and any(adv_has_w2(d) for d in vert_ids)
    for doc_id in vert_ids:
        spans = _spans(doc_id)
        exp = [
            (p, 72.0, y, ax, t, float(fs), m)
            for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(doc_id, TEXT)
        ]
        assert spans == exp, f"doc {doc_id}"
        # the second segment's cursor is strictly negative (glyphs drop)
        by_line = [s for s in spans if abs(s[2] - 720.0) <= 1.0]
        assert len(by_line) >= 2 and by_line[1][3] < 0
        fs = adv_font_size(doc_id)
        tc = adv_tc_milli(doc_id)
        manual = sum(
            adv_w1(doc_id, ord(c)) * fs * 100 + tc * 100 for c in "alpha beta gamma"
        )
        assert by_line[1][3] == manual


def test_vertical_w2_parser_both_forms():
    """/W2 triplet and range forms resolve; unlisted CIDs fall back to
    /DW2's w1y; a font with neither uses the spec default -1000."""
    from pdfparser_spark.core.extract import _parse_w2_array

    t = _parse_w2_array([40, [-700, 0, 880, -650, 0, 880], 97, 99, -600, 440, 880], {})
    assert t == {40: -700, 41: -650, 97: -600, 98: -600, 99: -600}
    # malformed tail resyncs without raising
    assert _parse_w2_array([97, 99], {}) == {}


def test_embedded_type1_advance_family_end_to_end():
    # doc 5 / doc 18 are the embedded-program variants (doc%13==5,
    # non-CID): NO /Widths anywhere in the PDF objects — the cursor is
    # right only if the kernel eexec-decrypts the /FontFile program and
    # reads each glyph's hsbw width (per-doc values, hex and binary
    # eexec serializations)
    from pdfparser_spark.synth import adv_emb_width, adv_is_embedded

    for d in (5, 18):
        assert adv_is_embedded(d)
        spans = _spans(d)
        exp = [
            (p, 72.0, y, ax, t, float(fs), m)
            for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(d, TEXT)
        ]
        assert spans == exp, d
        # widths really are doc-mixed: seg-1 offset equals the manual
        # per-glyph sum under this doc's program
        fs, tz = adv_font_size(d), adv_tz_pct(d)
        tc, tw = adv_tc_milli(d), adv_tw_milli(d)
        manual = sum(
            adv_emb_width(d, ord(c)) * fs * tz + tc * tz + (tw * tz if c == " " else 0)
            for c in spans[0][4]
        )
        assert spans[1][3] == manual, d


def test_truetype_advance_family_end_to_end():
    # doc 7 / doc 20 are the embedded-TrueType variants (doc%13==7,
    # non-CID): NO /Widths — the cursor is right only if the kernel reads
    # the sfnt's hmtx through its cmap and scales by unitsPerEm (500
    # here, so the raw hmtx value is HALF the text-space width)
    from pdfparser_spark.synth import adv_is_truetype, adv_tt_width

    for d in (7, 20):
        assert adv_is_truetype(d)
        spans = _spans(d)
        exp = [
            (p, 72.0, y, ax, t, float(fs), m)
            for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(d, TEXT)
        ]
        assert spans == exp, d
        fs, tz = adv_font_size(d), adv_tz_pct(d)
        tc, tw = adv_tc_milli(d), adv_tw_milli(d)
        manual = sum(
            adv_tt_width(d, ord(c)) * fs * tz + tc * tz + (tw * tz if c == " " else 0)
            for c in spans[0][4]
        )
        assert spans[1][3] == manual, d


def test_cff_advance_family_end_to_end():
    # doc 3 / doc 16 are the embedded-CFF variants (doc%13==3, non-CID):
    # widths come from Type 2 charstring leading operands, except
    # code%16==0 glyphs whose charstrings omit the operand (Private DICT
    # defaultWidthX path) — ' ' (32) and '`'/'p' (96/112) hit it
    from pdfparser_spark.synth import adv_cff_width, adv_is_cff

    for d in (3, 16):
        assert adv_is_cff(d)
        spans = _spans(d)
        exp = [
            (p, 72.0, y, ax, t, float(fs), m)
            for (_o, p, _li, _x, y, ax, t, fs, m) in expected_advance(d, TEXT)
        ]
        assert spans == exp, d
        fs, tz = adv_font_size(d), adv_tz_pct(d)
        tc, tw = adv_tc_milli(d), adv_tw_milli(d)
        manual = sum(
            adv_cff_width(d, ord(c)) * fs * tz + tc * tz + (tw * tz if c == " " else 0)
            for c in spans[0][4]
        )
        assert spans[1][3] == manual, d


def test_font_inventory_reports_programs():
    # the embedded-font trilogy is reported with PARSED glyph counts and
    # the program's own space width; unembedded variants say 'none'
    from pdfparser_spark.core.extract import extract_font_programs
    from pdfparser_spark.synth import (
        adv_emb_width,
        adv_tt_width,
        build_document_advance,
    )

    cases = {
        5: ("Type1", "type1", 95, adv_emb_width(5, 32)),
        7: ("TrueType", "truetype", 95, adv_tt_width(7, 32)),
        3: ("Type1", "cff", 95, 480),
        2: ("Type3", "none", 0, None),
        6: ("Type0", "none", 0, None),
        9: ("Type1", "none", 0, None),
    }
    for d, want in cases.items():
        out = extract_font_programs(build_document_advance(d, TEXT)["bytes"])
        assert out["errors"] == []
        assert out["fonts"] == [(0, "F1") + want], d
    # corrupt input: contained
    res = extract_font_programs(b"junk")
    assert res["fonts"] == [] and res["errors"]


def test_word_boxes_width_closes_the_cursor_algebra():
    # with_width=True: each span carries its OWN glyph advance; within a
    # line, ax(seg_{i+1}) = ax(seg_i) + w(seg_i) + kern-term (the TJ kern
    # sits only before segment 2), for every residue class incl. the
    # vertical CID docs (negative widths) and every embedded-font arm
    for doc_id in range(0, 460, 11):
        d = build_document_advance(doc_id, TEXT)
        wide = extract_advance_spans(d["bytes"], with_width=True)
        plain = extract_advance_spans(d["bytes"])
        assert wide["errors"] == []
        # strict superset: dropping w_micro reproduces the plain kernel
        assert [s[:4] + s[5:] for s in wide["spans"]] == plain["spans"], doc_id
        fs, tz = adv_font_size(doc_id), adv_tz_pct(doc_id)
        k = adv_kern(doc_id)
        vert = doc_id % 11 == 6 and (doc_id // 11) % 2 == 1
        kern_factor = 100 if vert else tz
        # group by line (same y baseline modulo rise: use page+index runs)
        by_line: dict = {}
        for s in wide["spans"]:
            by_line.setdefault(round(s[2] - (s[2] % 1)), []).append(s)
        segs = wide["spans"]
        for i in range(len(segs) - 1):
            a, b = segs[i], segs[i + 1]
            if b[3] == 0:  # new line: cursor reset
                continue
            kern = -k * fs * kern_factor if b[3] != a[3] + a[4] else 0
            assert b[3] == a[3] + a[4] + kern, (doc_id, i)


def test_word_boxes_manual_width_doc0():
    # doc 0: fs=12 tz=50 tc=tw=0 — seg0's width is the bare glyph sum
    d = build_document_advance(0, TEXT)
    spans = extract_advance_spans(d["bytes"], with_width=True)["spans"]
    w = lambda ch: 300 + (ord(ch) % 8) * 50
    assert spans[0][4] == sum(w(c) * 12 * 50 for c in "alpha beta gamma")


def test_hocr_roundtrip_is_exact():
    # word boxes -> hOCR (micro-point integer pixels, x_origin/x_size/
    # x_mode engine properties) -> the curation tier's lenient HTML
    # parser -> identical rows, across every residue class incl. the
    # vertical CID docs (negative advance kept raw) and Tr-3 spans
    from pdfparser_spark.core.hocr import hocr_to_words, words_to_hocr

    for doc_id in range(0, 180, 7):
        spans = extract_advance_spans(
            build_document_advance(doc_id, TEXT)["bytes"], with_width=True
        )["spans"]
        assert hocr_to_words(words_to_hocr(spans)) == [tuple(s) for s in spans], doc_id
    # escaping + leniency
    esc = [(0, 72.0, 700.0, 0, 100, "a < b & c > d", 12.0, 0)]
    assert hocr_to_words(words_to_hocr(esc)) == esc
    assert hocr_to_words("<div class='ocrx_word' title='bbox zzz'>x</div>") == []
    assert hocr_to_words("not html at <all") == []


def test_line_boxes_group_on_cursor_resets(spark):
    # lines = cursor-reset runs; extents orientation-safe (vertical CID
    # docs have negative advances); baseline is the reset span's y even
    # when later spans carry a text rise
    import pandas as pd

    from pdfparser_spark.stages import assemble_line_boxes

    rows = []
    for d in (0, 24, 21, 6, 17):  # plain, rise, Tr3, CID-H, CID-V
        spans = extract_advance_spans(
            build_document_advance(d, TEXT)["bytes"], with_width=True
        )["spans"]
        for ordn, (p, x, y, ax, w, t, fs, m) in enumerate(spans):
            rows.append((d, ordn, p, x, y, ax, w, t, fs, m))
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["doc_id", "ord", "page_idx", "x", "y", "ax_micro",
                     "w_micro", "text", "size", "mode"],
        )
    )
    out = {(r["doc_id"], r["line_idx"]): r for r in assemble_line_boxes(df).collect()}
    # doc 0 line 0: three segments, x_lo 0, x_hi = last cursor + width
    spans0 = [s for s in extract_advance_spans(
        build_document_advance(0, TEXT)["bytes"], with_width=True)["spans"]]
    line0 = [s for s in spans0 if s[2] == 720.0]
    r = out[(0, 0)]
    assert r["n_spans"] == len(line0) == 3
    assert r["x_lo_micro"] == 0 and r["x_hi_micro"] == max(s[3] + s[4] for s in line0)
    assert r["text"] == " ".join(s[5] for s in line0)
    # rise doc (d=95): baseline stays the reset span's y
    assert out[(24, 0)]["y"] == 720.0
    # vertical doc 77: negative extent, x_lo < 0 <= x_hi
    v = out[(17, 0)]
    assert v["x_lo_micro"] < 0 <= v["x_hi_micro"]
