"""robots.txt gate: parser behavior + RFC 9309 longest-match semantics."""

from __future__ import annotations

from pdfparser_spark.textops import robots


def test_rules_parse_from_text(spark):
    rules = {
        (r.host, r.prefix): (r.is_allow, r.priority)
        for r in robots.robots_rules(spark).collect()
    }
    # comments / blank lines / User-agent lines never become rules
    assert all(p.startswith("/") for _, p in rules)
    # host5 carries the full block; host3 (odd) the doc/archive pair
    assert rules[("host5.example.org", "/")] == (0, 2)
    assert rules[("host3.example.org", "/doc/")] == (0, 10)
    assert rules[("host3.example.org", "/doc/archive/")] == (1, 27)
    # even, non-multiple-of-3, non-5 hosts have only /private/ (+/search on %4==2)
    assert {p for (h, p) in rules if h == "host4.example.org"} == {"/private/"}


def test_longest_match_and_defaults(spark):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(65)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in robots.crawl_gate(docs).collect()}
    assert len(got) == 65  # no doc vanishes, matched or not

    # /doc/archive/ on an odd host: Allow (len 13) beats Disallow /doc/ (len 5)
    assert got[33].path == "/doc/archive/33" and got[33].allowed
    assert got[33].rule == "/doc/archive/"
    # /private/ always blocked
    assert not got[1].allowed and got[1].rule == "/private/"
    # host5 full block: /doc/5 dies on Disallow:/doc/ (host5 is odd)
    assert not got[5].allowed
    # ... but its /search?q=31 (31 % 13 == 5, 31 % 5 == 1 -> /private/) blocked
    # host with no matching rule -> allowed with empty rule
    assert got[0].allowed and got[0].rule == ""
    # /tmp/ blocked only on h % 3 == 0 hosts (and on host5's full block)
    tmp_rows = [r for r in got.values() if r.path.startswith("/tmp/")]
    for r in tmp_rows:
        h = int(r.host.removeprefix("host").split(".")[0])
        assert r.allowed == (h % 3 != 0 and h != 5), r


def test_robots_plan_broadcast_and_no_url_shuffle_for_join(spark):
    """The rules side broadcasts (O(hosts) rows); the URL side's only
    exchange is the per-URL max_by aggregate — never a shuffle for the
    join itself, and no nested-loop fallback."""
    docs = spark.createDataFrame([(i, "t") for i in range(20)], "doc_id long, text string")
    df = robots.crawl_gate(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # the join never shuffles the URL side
