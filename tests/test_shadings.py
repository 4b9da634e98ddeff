"""Smooth shadings (§8.7.4.5): the /Shading resource walk + `sh` op
counter + colour-function endpoint evaluation (doc_shadings oracle is
the corpus arm; these pin the kernel pieces)."""

from __future__ import annotations

import math

from pdfparser_spark.core.content import shading_ops
from pdfparser_spark.core.extract import extract_shadings
from pdfparser_spark.synth import SHADING_PALETTE, build_document

TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_shading_ops_counter():
    data = b"q /Sh1 sh Q /Sh2 sh /Sh1 sh 1 0 0 1 0 0 cm sh BT ET"
    ops = shading_ops(data)
    assert ops == {"Sh1": 2, "Sh2": 1}  # the bare `sh` after cm is ignored


def test_shading_ops_skips_inline_images():
    data = b"BI /W 1 /H 1 /BPC 8 /CS /G ID \x00 EI /Sh1 sh"
    assert shading_ops(data) == {"Sh1": 1}


def _expected(doc_id):
    c0 = [int(math.floor(255.0 * float(v) + 0.5)) for v in SHADING_PALETTE[doc_id % 4]]
    c1 = [int(math.floor(255.0 * float(v) + 0.5))
          for v in SHADING_PALETTE[(doc_id + 1) % 4]]
    stype = 3 if (doc_id // 8) % 2 == 1 else 2
    cmax = (40 + (doc_id % 5) * 10) if stype == 3 else (100 + (doc_id % 7) * 20)
    return (0, "Sh1", stype, cmax, c0, c1, 1 + doc_id % 3)


def test_extract_shadings_corpus_rule():
    for doc_id in (5, 13, 21, 29, 37, 45):  # axial/radial alternating
        d = build_document(doc_id, TEXT)
        res = extract_shadings(d["bytes"])
        assert res["errors"] == []
        assert res["shadings"] == [_expected(doc_id)], doc_id
    # non-rule doc: no shadings
    assert extract_shadings(build_document(6, TEXT)["bytes"])["shadings"] == []


def test_extract_shadings_lenient_on_garbage():
    res = extract_shadings(b"%PDF-1.4 garbage")
    assert res["shadings"] == [] and res["errors"]
