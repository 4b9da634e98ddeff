"""Layout-aware extraction: positioning-operator interpretation + reading
order.

The layout machine (``tokenize_content(layout=True)``) interprets the text
positioning operators of ISO 32000 §9.4.2 — BT (reset), Td/TD (relative
translate; TD also sets leading), Tm (absolute translation), TL (leading),
T* (next line) and the implicit T* of ``'``/``"`` — and stamps each text
event with the text-line origin.  The non-layout event shape (4-tuples)
must be byte-identical to before, since every other caller depends on it.
"""

from __future__ import annotations

from pdfparser_spark.core.content import tokenize_content
from pdfparser_spark.core.extract import extract_layout_spans, extract_spans
from pdfparser_spark.synth import build_document, expected_spans

WORDS = " ".join(f"w{i:02d}" for i in range(24))


def _texts(evs):
    return [(e[3], e[4], e[5]) for e in evs if e[0] == "text"]


def test_layout_td_sets_origin():
    evs = tokenize_content(b"BT /F1 12 Tf 72 700 Td (a) Tj ET", layout=True)
    assert _texts(evs) == [(b"a", 72.0, 700.0)]


def test_layout_td_accumulates_relative():
    evs = tokenize_content(b"BT /F1 12 Tf 30 600 Td 42 100 Td (a) Tj ET", layout=True)
    assert _texts(evs) == [(b"a", 72.0, 700.0)]


def test_layout_tm_is_absolute():
    evs = tokenize_content(
        b"BT /F1 12 Tf 5 5 Td 1 0 0 1 72 700 Tm (a) Tj ET", layout=True
    )
    assert _texts(evs) == [(b"a", 72.0, 700.0)]


def test_layout_td_upper_sets_leading_then_tstar():
    # TD = Td + (leading := -ty); T* drops one leading
    evs = tokenize_content(b"BT /F1 12 Tf 72 714 Td 0 -14 TD (a) Tj T* (b) Tj ET", layout=True)
    assert _texts(evs) == [(b"a", 72.0, 700.0), (b"b", 72.0, 686.0)]


def test_layout_tl_and_quote_implicit_tstar():
    evs = tokenize_content(b"BT /F1 12 Tf 72 714 Td 14 TL (a) ' (b) ' ET", layout=True)
    assert _texts(evs) == [(b"a", 72.0, 700.0), (b"b", 72.0, 686.0)]


def test_layout_doublequote_implicit_tstar():
    evs = tokenize_content(b"BT /F1 12 Tf 72 714 Td 14 TL 2 1 (a) \" ET", layout=True)
    assert _texts(evs) == [(b"a", 72.0, 700.0)]


def test_layout_bt_resets_origin():
    evs = tokenize_content(
        b"BT /F1 12 Tf 72 700 Td (a) Tj ET BT 10 10 Td (b) Tj ET", layout=True
    )
    assert _texts(evs) == [(b"a", 72.0, 700.0), (b"b", 10.0, 10.0)]


def test_layout_textarr_carries_origin_and_size():
    evs = tokenize_content(b"BT /F1 12 Tf 72 700 Td [(A) -120 (B)] TJ ET", layout=True)
    assert evs[0][0] == "textarr" and evs[0][4:] == (72.0, 700.0, 12.0)


def test_non_layout_event_shape_unchanged():
    evs = tokenize_content(b"BT /F1 12 Tf 72 714 Td 14 TL (a) ' T* (b) Tj ET")
    assert all(len(e) == 4 for e in evs if e[0] in ("text", "textarr"))
    assert [e[3] for e in evs if e[0] == "text"] == [b"a", b"b"]


def test_synth_variants_all_land_on_analytic_origin():
    # (doc_id + page) % 5 walks all five positioning paths; every one must
    # land the line origin on (72, 720 - 14*p) and keep the plain span
    # extraction byte-identical to the analytic expectation.
    for doc_id in range(30):
        d = build_document(doc_id, WORDS)
        got = [(s[0], s[1], s[2]) for s in extract_spans(d["bytes"])["spans"]]
        assert got == expected_spans(doc_id, WORDS), doc_id
        lr = extract_layout_spans(d["bytes"])
        # the layout kernel resolves XObjects too (form execution) — it
        # reports the SAME dangling-reference metric as the plain kernel
        assert [e for e in lr["errors"] if "dangling XObject" not in e[2]] == []
        for p, x, y, _txt, _sz in lr["spans"]:
            assert (x, y) == (72.0, 720.0 - 14 * p), (doc_id, p, x, y)
        # layout text in page order == the text spans of the plain parse
        assert [t for _p, _x, _y, t, _s in sorted(lr["spans"])] == [
            t for k, t, _m in expected_spans(doc_id, WORDS) if k == "text"
        ]


def test_layout_is_lenient_on_garbage():
    r = extract_layout_spans(b"not a pdf at all")
    assert r["spans"] == [] and r["errors"]


def test_kerning_gap_is_word_break():
    # words kerned apart with NO space glyphs: -300 (>= threshold) breaks,
    # -120 (the armored family's intra-phrase kern) must NOT
    from pdfparser_spark.synth import build_document_columns

    d = build_document_columns(0, "alpha beta gamma")
    r = extract_layout_spans(d["bytes"])
    assert not r["errors"]
    assert [t for _p, _x, _y, t, _s in r["spans"]] == ["alpha beta gamma"]


def test_kern_threshold_leaves_small_kerns_alone():
    # the armored family's page-1 TJ is [(first) -120 ( rest)] — an
    # intra-phrase kern BELOW the word-break threshold with an explicit
    # space glyph; the layout kernel must not double-space it
    from pdfparser_spark.core.extract import KERN_SPACE_THRESHOLD
    from pdfparser_spark.synth import COLUMN_KERN, page_texts

    assert COLUMN_KERN <= KERN_SPACE_THRESHOLD < -120
    d = build_document(1, WORDS)  # doc 1: 2 pages -> page 1 takes the TJ path
    r = extract_layout_spans(d["bytes"])
    assert not r["errors"]
    assert [t for _p, _x, _y, t, _s in sorted(r["spans"])] == [
        t for t in page_texts(WORDS, 2) if t
    ]


def test_columns_stream_order_differs_from_reading_order():
    from pdfparser_spark.synth import build_document_columns, columns_lines, expected_columns

    text = " ".join(f"w{i:02d}" for i in range(36))  # 2 full pages for doc 1
    d = build_document_columns(1, text)
    r = extract_layout_spans(d["bytes"])
    assert not r["errors"]
    stream = [t for (_p, _r, _c, t) in columns_lines(1, text)]
    exp = expected_columns(1, text)
    reading = [t for (*_k, t) in exp]
    assert stream != reading  # row-major emit vs column-major reading
    # kernel spans re-ranked (page, col, -y) == analytic reading order
    got = sorted(
        enumerate(r["spans"]),
        key=lambda e: (e[1][0], e[1][1] >= 200, -e[1][2], e[1][1], e[0]),
    )
    assert [t for _i, (_p, _x, _y, t, _s) in got] == reading
    assert [(p, x, y) for _i, (p, x, y, _t, _s) in got] == [
        (p, x, y) for (_o, p, _c, x, y, _t) in exp
    ]


def test_extract_columns_fused_matches_expectation_and_plan(spark):
    import pandas as pd

    from pdfparser_spark.stages import extract_columns_fused, synthesize_corpus
    from pdfparser_spark.synth import expected_columns

    texts = {i: " ".join(f"t{i}w{j}" for j in range(1 + 5 * i)) for i in range(10)}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    df = extract_columns_fused(synthesize_corpus(docs, family="columns"))
    # zero-shuffle fused shape: no Exchange anywhere in the physical plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    out = df.toPandas().sort_values(["doc_id", "ord"])
    got = [
        (int(r.doc_id), int(r.ord), int(r.page_idx), int(r.col), r.x, r.y, r.text)
        for r in out.itertuples()
    ]
    exp = [
        (did, o, p, c, x, y, t)
        for did, text in texts.items()
        for (o, p, c, x, y, t) in expected_columns(did, text)
    ]
    assert got == sorted(exp)


def test_cluster_columns_gap_detection():
    from pdfparser_spark.stages.fused import _column_of, cluster_columns

    # three columns with intra-column jitter (indents under the gutter)
    xs = [72.0, 80.0, 306.0, 310.0, 540.0, 72.0]
    starts = cluster_columns(xs)
    assert starts == [72.0, 306.0, 540.0]
    assert [_column_of(x, starts) for x in (72.0, 85.0, 306.0, 540.0, 600.0)] == [0, 0, 1, 2, 2]
    # one column when every x is within the jitter band
    assert cluster_columns([72.0, 90.0, 110.0]) == [72.0]
    assert cluster_columns([]) == []


def test_columns_auto_detection_equals_fixed_split(spark):
    import pandas as pd

    from pdfparser_spark.stages import extract_columns_fused, synthesize_corpus

    texts = {i: " ".join(f"a{i}b{j}" for j in range(1 + 4 * i)) for i in range(8)}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    raw = synthesize_corpus(docs, family="columns")
    auto = sorted(tuple(r) for r in extract_columns_fused(raw).collect())
    fixed = sorted(tuple(r) for r in extract_columns_fused(raw, column_split_x=200.0).collect())
    assert auto == fixed and auto


def test_assemble_paragraphs_dehyphenation(spark):
    import pandas as pd

    from pdfparser_spark.stages import (
        assemble_paragraphs,
        extract_columns_fused,
        hyphenate_words,
        synthesize_corpus,
    )

    # doc 0 (1 page): 9 words -> left column rows 0-2 get words 0-2, 3-5,
    # 6-8; right column empty.  Words are chosen so hyphen pieces land at
    # a LINE END (merged), MID-LINE (kept), and the COLUMN END (kept).
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0],
                # j%5==2 & len>=6 splits: 'segment' (j=2, line-0 end) and
                # 'hyphens' (j=7 -> piece mid/line placement after shift)
                "text": ["alpha beta segment delta echo foxtrot golf hyphens india"],
            }
        )
    )
    hy = hyphenate_words(docs)
    assert hy.collect()[0].text == (
        "alpha beta seg- ment delta echo foxtrot golf hyp- hens india"
    )
    out = assemble_paragraphs(
        extract_columns_fused(synthesize_corpus(hy, family="columns"))
    )
    rows = {(r.doc_id, r.page_idx, r.col): r.para for r in out.collect()}
    # lines: [alpha beta seg-] [ment delta echo] | [foxtrot golf hyp-]
    #        [hens india] — rows 0/1 left+right interleave:
    # i=0 (r0,c0): alpha beta seg-   i=1 (r0,c1): ment delta echo
    # i=2 (r1,c0): foxtrot golf hyp- i=3 (r1,c1): hens india
    # left column fold: 'alpha beta seg-' + 'foxtrot...' -> hyphen MERGES
    assert rows[(0, 0, 0)] == "alpha beta segfoxtrot golf hyp-"
    assert rows[(0, 0, 1)] == "ment delta echo hens india"
    # plan: exactly ONE shuffle (the groupBy, partial+final collect_list)
    # on top of the two chained kernels.  The AQE string prints Final AND
    # Initial plans — count only the final section.
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "partial_collect_list" in final


def test_extract_layout_fused_reading_order(spark):
    import pandas as pd

    from pdfparser_spark.stages import extract_layout_fused, synthesize_corpus

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(12)), "text": [WORDS] * 12})
    )
    out = extract_layout_fused(synthesize_corpus(docs)).toPandas()
    assert list(out.columns) == ["doc_id", "ord", "page_idx", "x", "y", "text"]
    assert (out["x"] == 72.0).all()
    for _doc, g in out.groupby("doc_id"):
        g = g.sort_values("ord")
        # reading order: ord follows (page, -y)
        assert list(g["page_idx"]) == sorted(g["page_idx"])
        assert (g["y"].values == 720.0 - 14 * g["page_idx"].values).all()


def test_doc_headings_relative_rule(spark):
    import pandas as pd

    from pdfparser_spark.stages import extract_layout_sized_fused, synthesize_corpus
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                # doc 0: heading + body lines; doc 1: SINGLE line (all
                # heading-sized -> relative rule must yield nothing)
                "text": ["big title words body one two three four", "only title"],
            }
        )
    )
    sized = extract_layout_sized_fused(synthesize_corpus(docs, family="columns"))
    body = sized.groupBy("doc_id").agg(F.min("size").alias("body_size"))
    heads = (
        sized.join(body, "doc_id")
        .filter(F.col("size") >= 1.25 * F.col("body_size"))
        .collect()
    )
    assert [(r.doc_id, r.text, r.size) for r in heads] == [(0, "big title words", 18.0)]
