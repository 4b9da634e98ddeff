"""Table detection: synth table family -> layout kernel -> detect_tables.

The detector (pdfparser_spark/tables.py) must recover exactly the grid
cells — title/footer prose, the doc%5==0 mismatched-grid trap lines, and
nothing else — as (table_idx, row_idx, col_idx) records, matching the
analytic ground truth synth.expected_table_cells.
"""

import pandas as pd
import pytest

from pdfparser_spark.core.extract import extract_layout_spans
from pdfparser_spark.synth import (
    build_document_table,
    expected_table_cells,
    table_lines,
    table_shape,
)
from pdfparser_spark.tables import detect_tables

WORDS = " ".join(f"cell{i:02d}" for i in range(40))


def test_table_family_parses_clean_and_layout_matches_lines():
    for doc_id in range(12):
        d = build_document_table(doc_id, WORDS)
        r = extract_layout_spans(d["bytes"])
        assert not r["errors"], (doc_id, r["errors"])
        got = sorted((p, x, y, t) for (p, x, y, t, _s) in r["spans"])
        exp = sorted((p, float(x), float(y), t) for (p, x, y, t) in table_lines(doc_id, WORDS))
        assert got == exp, doc_id


def test_table_shape_covers_all_grid_sizes():
    shapes = {table_shape(i) for i in range(18)}
    assert shapes == {(r, c) for r in (2, 3, 4) for c in (2, 3, 4)}


@pytest.fixture(scope="module")
def table_layout(spark):
    from pdfparser_spark.stages import extract_layout_fused, synthesize_corpus

    # cover: traps (0,5,10), second table (0,7,14), 2-page (odd), all shapes
    texts = {i: WORDS for i in range(18)}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ).repartition(4, "doc_id")
    return extract_layout_fused(synthesize_corpus(docs, family="table")).select(
        "doc_id", "page_idx", "x", "y", "text"
    )


def test_detect_tables_matches_analytic_cells(spark, table_layout):
    out = detect_tables(table_layout).toPandas()
    got = sorted(
        (int(r.doc_id), int(r.page_idx), int(r.table_idx), int(r.row_idx),
         int(r.col_idx), float(r.x), float(r.y), r.cell)
        for r in out.itertuples()
    )
    exp = sorted(
        (did, p, t, ri, c, x, y, cell)
        for did in range(18)
        for (p, t, ri, c, x, y, cell) in expected_table_cells(did, WORDS)
    )
    assert got == exp


def test_detect_tables_drops_traps_and_prose(spark, table_layout):
    out = detect_tables(table_layout).toPandas()
    cells = set(out["cell"])
    # trap-line cells (t00, t01, t10, t11) and prose must never appear
    assert not cells & {"t00", "t01", "t10", "t11", "Quarterly", "end"}
    # doc 5 has traps but no second table: exactly one table on page 0
    d5 = out[out.doc_id == 5]
    assert set(d5.table_idx) == {0}
    # doc 0 and 7 (doc%7==0) carry the second table below the first
    for did in (0, 7, 14):
        dd = out[(out.doc_id == did) & (out.page_idx == 0)]
        assert set(dd.table_idx) == {0, 1}, did
        assert dd[dd.table_idx == 1].row_idx.max() == 1  # 2-row second table


def test_detect_tables_single_shuffle(table_layout):
    # the detector's own explicit (doc_id, page_idx) repartition is its
    # ONLY exchange — it satisfies the (doc_id, page_idx, y) agg clustering
    # and every window, so Catalyst adds nothing on top.  Plan total = that
    # one + the test fixture's upstream repartition(4, doc_id).
    plan = detect_tables(table_layout)._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("+- Exchange")
    assert n_exchange == 2, plan


def test_min_rows_and_min_cols_knobs(spark):
    rows = [
        # a 3-line x-aligned block and a lone pair line far away
        (1, 0, 72.0, 700.0, "a"), (1, 0, 200.0, 700.0, "b"),
        (1, 0, 72.0, 682.0, "c"), (1, 0, 200.0, 682.0, "d"),
        (1, 0, 72.0, 664.0, "e"), (1, 0, 200.0, 664.0, "f"),
        (1, 0, 72.0, 300.0, "x"), (1, 0, 200.0, 300.0, "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page_idx int, x double, y double, text string")
    assert detect_tables(df).count() == 6  # lone pair dropped (min_rows=2)
    assert detect_tables(df, min_rows=1).count() == 8
    assert detect_tables(df, min_cols=3).count() == 0
    # widening row_gap merges nothing across the signature-identical but
    # 364-pt-distant block boundary only when gap allows it
    assert detect_tables(df, row_gap=400.0).count() == 8


def test_tables_to_markdown_renders_grid(spark, table_layout):
    from pdfparser_spark.tables import tables_to_markdown

    out = tables_to_markdown(detect_tables(table_layout)).toPandas()
    # doc 1: 2x3 main grid only, 2 pages, no second table (1 % 7 != 0)
    d1 = out[(out.doc_id == 1) & (out.page_idx == 0)]
    assert len(d1) == 1 and int(d1.n_rows.iloc[0]) == 2 and int(d1.n_cols.iloc[0]) == 3
    from pdfparser_spark.synth import table_cell_text

    words = WORDS.split(" ")
    hdr = [table_cell_text(words, 1, 0, 0, c) for c in range(3)]
    body = [table_cell_text(words, 1, 0, 1, c) for c in range(3)]
    exp = (
        "| " + " | ".join(hdr) + " |\n"
        "|" + " --- |" * 3 + "\n"
        "| " + " | ".join(body) + " |"
    )
    assert d1.md.iloc[0] == exp
    # every doc/page yields exactly one md per detected table
    cells = detect_tables(table_layout).toPandas()
    n_tables = len(cells.groupby(["doc_id", "page_idx", "table_idx"]))
    assert len(out) == n_tables


def test_tables_to_markdown_adds_no_exchange(table_layout):
    from pdfparser_spark.tables import tables_to_markdown

    plan = (
        tables_to_markdown(detect_tables(table_layout))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("+- Exchange") == 2  # detector's one + fixture's one


def test_x_quantum_tolerates_scanner_jitter(spark):
    # two rows whose column origins jitter by <1pt: exact signatures
    # differ (no table), a 2pt quantum snaps them to one grid
    rows = [
        (1, 0, 72.0, 700.0, "a"), (1, 0, 200.3, 700.0, "b"),
        (1, 0, 72.4, 682.0, "c"), (1, 0, 199.8, 682.0, "d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page_idx int, x double, y double, text string")
    assert detect_tables(df).count() == 0
    out = detect_tables(df, x_quantum=2.0).toPandas()
    assert len(out) == 4 and set(out.cell) == {"a", "b", "c", "d"}
    # raw x survives in the output (the quantum affects matching only)
    assert sorted(out.x) == [72.0, 72.4, 199.8, 200.3]


def test_table_column_profile_types(spark, table_layout):
    from pdfparser_spark.tables import table_column_profile

    cells = detect_tables(table_layout)
    out = table_column_profile(cells).toPandas()
    # the synth family's LAST column is numeric, every other column text
    for r in out.itertuples():
        nc = 2 + int(r.doc_id) % 3
        assert r.col_type == ("int" if r.col_idx == nc - 1 else "text"), r
        assert (r.n_numeric == r.n_cells) == (r.col_type == "int")
    # profile covers every detected (table, col)
    n_cols = len(cells.toPandas().groupby(["doc_id", "page_idx", "table_idx", "col_idx"]))
    assert len(out) == n_cols
