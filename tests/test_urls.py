"""URL canonicalization unit behaviors beyond the oracle's variant set."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdfparser_spark.textops import urls


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [
        r.c for r in df.select(urls.canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            "http://Host1.Example.org:80/doc/5?b=2&a=1#frag",  # case+port+frag+sort
            "https://host2.example.org:443/x?utm_source=f&z=9&gclid=abc",
            "https://host2.example.org:8443/x?z=9",  # NON-default port survives
            "HTTP://HOST3.EXAMPLE.ORG/doc/7",  # no query at all
            "http://h.example.org/p?fbclid=x&utm_medium=m",  # all params stripped
            "http://h.example.org/p?A=1&a=1",  # query case is significant
            "http://h.example.org",  # no path: canonical gains the root slash
            "http://H.example.org?b=2&a=1",  # query BEFORE any slash
            "https://h.example.org:443?utm_source=f&z=1#frag",  # all rules, no path
        ],
    )
    assert got == [
        "http://host1.example.org/doc/5?a=1&b=2",
        "https://host2.example.org/x?z=9",
        "https://host2.example.org:8443/x?z=9",
        "http://host3.example.org/doc/7",
        "http://h.example.org/p",
        "http://h.example.org/p?A=1&a=1",
        "http://h.example.org/",
        "http://h.example.org/?a=1&b=2",
        "https://h.example.org/?z=1",
    ]


def test_canonicalize_idempotent(spark):
    raw = [
        "http://Host1.Example.org:80/doc/5?b=2&a=1#frag",
        "https://host2.example.org:8443/x?z=9&utm_source=f",
    ]
    once = _canon(spark, raw)
    assert _canon(spark, once) == once


def test_url_dedup_collapses_all_variants(spark):
    docs = spark.createDataFrame([(i, "t") for i in range(40)], "doc_id long, text string")
    res = urls.url_dedup_canonical(docs).collect()
    assert len(res) == 40  # one canonical per doc
    assert all(r.n_raw == 4 and r.n_distinct_raw == 4 for r in res)


def test_url_dedup_plan_single_exchange(spark):
    """Canonicalize is stateless expression work inside the scan stage:
    the whole dedup plan carries exactly ONE shuffle (the canonical-key
    aggregate; countDistinct expands to a two-phase agg over the same
    exchange) and no Python UDF stages."""
    docs = spark.createDataFrame([(i, "t") for i in range(20)], "doc_id long, text string")
    df = urls.url_dedup_canonical(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial->final distinct-agg pair
