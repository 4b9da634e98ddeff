"""JSONL source: permissive read + corrupt-record rescue semantics."""

from __future__ import annotations

from pdfparser_spark.sources import jsonl


def test_rescue_rows_and_parsed_rows(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", f"text {i}") for i in range(50)],
        "doc_id long, lang string, text string",
    )
    out = str(tmp_path / "jsonl")
    res = jsonl.jsonl_ingest_rescue(spark, docs, out).collect()
    assert len(res) == 50  # every input line surfaces exactly once

    corrupt = [r for r in res if r.is_corrupt]
    parsed = [r for r in res if not r.is_corrupt]
    assert len(corrupt) == len([i for i in range(50) if i % 23 == 7])  # 7, 30
    # rescued rows: typed columns NULL, raw-line length matches the
    # 5-byte truncation of the canonical line
    for r in corrupt:
        assert r.doc_id is None and r.lang is None and r.n_chars is None
        assert r.corrupt_len is not None and r.corrupt_len > 0
    for i in (7, 30):
        want = len(jsonl.doc_json_line(i, "en" if i % 2 == 0 else "de", f"text {i}"))
        assert want in {r.corrupt_len for r in corrupt}
    # parsed rows: typed and exact
    byid = {r.doc_id: r for r in parsed}
    assert byid[4].lang == "en" and byid[4].n_chars == len("text 4")
    assert byid[9].lang == "de"


def test_jsonl_shards_are_splittable_text(spark, tmp_path):
    """The shard files are plain newline-delimited text (no per-record
    framing), so Spark can split one shard across tasks at scale."""
    docs = spark.createDataFrame(
        [(i, "en", f"t{i}") for i in range(10)], "doc_id long, lang string, text string"
    )
    out = str(tmp_path / "jsonl")
    manifest = jsonl.write_jsonl_shards(docs, out, n_shards=2).collect()
    assert sum(m.n_records for m in manifest) == 10
    for m in manifest:
        lines = open(m.path, encoding="utf-8").read().splitlines()
        assert len(lines) == m.n_records
        assert all(ln.startswith('{"doc_id":') for ln in lines)
