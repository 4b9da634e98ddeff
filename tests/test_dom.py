"""DOM-heuristic main-content extraction (textops/dom.py).

Covers the lenient HTML tree parser (nesting, attributes, void/raw
elements, entities, malformed-markup leniency, fuzz containment), the
Readability-style scorer (points propagation, link-density weighting,
exact integer comparison, decoys), and the Spark operator end to end
including the doc_id%9 winner flip.
"""

from __future__ import annotations

import random

from pdfparser_spark.textops.dom import (
    Elem,
    extract_main,
    node_text,
    parse_html,
)

WORDS = " ".join(f"w{i:02d}" for i in range(24))


def _find(root: Elem, tag: str, cls: str | None = None) -> Elem | None:
    stack = [root]
    while stack:
        nd = stack.pop()
        if isinstance(nd, Elem):
            if nd.tag == tag and (cls is None or nd.attrs.get("class") == cls):
                return nd
            stack.extend(c for c in nd.children if isinstance(c, Elem))
    return None


def test_parse_nesting_and_text():
    root = parse_html("<div><p>hello <b>world</b></p></div>")
    p = _find(root, "p")
    assert p is not None and node_text(p) == "hello world"
    assert _find(root, "b").parent is p


def test_parse_attributes_quoted_and_bare():
    root = parse_html('<a href="/x?a>b" class=nav data-k=\'v v\'>t</a>')
    a = _find(root, "a")
    assert a.attrs == {"href": "/x?a>b", "class": "nav", "data-k": "v v"}


def test_parse_void_and_self_closing():
    root = parse_html("<div><br><img src=x><p>a</p><hr/></div>")
    # br/img/hr must not swallow the following elements
    assert node_text(_find(root, "div")) == "a"
    assert _find(root, "p") is not None


def test_parse_script_style_excluded():
    root = parse_html("<div><script>var a = '<p>no</p>';</script><p>yes</p></div>")
    assert node_text(_find(root, "div")) == "yes"


def test_parse_comment_doctype_skipped():
    root = parse_html("<!DOCTYPE html><!-- <p>x</p> --><p>y</p>")
    assert node_text(root) == "y"


def test_parse_entities():
    root = parse_html("<p>a &amp; b &lt;c&gt;</p>")
    assert node_text(_find(root, "p")) == "a & b <c>"


def test_parse_misnested_close_is_lenient():
    root = parse_html("<div><p>a</b></p>b</div>after")
    assert node_text(_find(root, "div")) == "ab"
    assert node_text(root).endswith("after")


def test_parse_never_raises_fuzz():
    rng = random.Random(7)
    alphabet = "<>/=\"' abpdiv!-&;x\0\n"
    for _ in range(400):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        parse_html(s)  # must not raise on ANY input
    # deep nesting must not hit the recursion limit (iterative walks)
    big = "<div>" * 5000 + "x" + "</div>" * 5000
    assert node_text(parse_html(big)) == "x"


def test_metrics_link_text_counts_into_link_len():
    root = parse_html('<div><p>' + 'x' * 30 + '</p><a href=/>link text</a></div>')
    res = extract_main("<body>" + '<div><p>' + 'x' * 30 + '</p><a href=/>linky</a></div>' + "</body>")
    assert res is not None
    assert res["link_len"] == 5 and res["text_len"] == 35


def test_scorer_prefers_low_link_density():
    # two candidate divs with one qualifying <p> each (equal points);
    # the second has heavy link text -> first must win
    page = (
        "<body><div class=a><p>" + "q" * 40 + "</p></div>"
        "<div class=b><p>" + "q" * 40 + "</p><a href=/>" + "L" * 40 + "</a></div></body>"
    )
    assert extract_main(page)["winner"] == "a"


def test_scorer_comma_points_beat_plain():
    # same text length; commas add points (Readability rule)
    page = (
        "<body><div class=a><p>" + "x, " * 20 + "</p></div>"
        "<div class=b><p>" + "xxx" * 20 + "</p></div></body>"
    )
    assert extract_main(page)["winner"] == "a"


def test_scorer_short_paragraphs_contribute_nothing():
    page = "<body><div class=a><p>tiny</p></div></body>"
    assert extract_main(page) is None


def test_scorer_grandparent_gets_half():
    # single candidate chain: parent (full) must beat grandparent (half)
    page = "<body><div class=g><div class=par><p>" + "y" * 60 + "</p></div></div></body>"
    res = extract_main(page)
    assert res["winner"] == "par" and res["points2"] == 2


def test_scorer_tie_breaks_to_earlier_node():
    # identical sibling subtrees (each with its own grandparent wrapper so
    # no shared ancestor accumulates both) -> earliest candidate wins
    page = (
        "<body><div><div class=first><p>" + "z" * 40 + "</p></div></div>"
        "<div><div class=second><p>" + "z" * 40 + "</p></div></div></body>"
    )
    assert extract_main(page)["winner"] == "first"


def test_main_text_joins_direct_p_children_only():
    page = (
        "<body><div class=w><p>one one one one one one one</p>"
        "<div class=related><a href=/>more</a></div>"
        "<p>two two two two two two two two</p></div></body>"
    )
    res = extract_main(page)
    assert res["main_text"] == "one one one one one one one\ntwo two two two two two two two"
    assert res["p_count"] == 2


def test_dom_main_content_winner_flip(spark):
    import pandas as pd

    from pdfparser_spark.textops.dom import dom_main_content

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(20)), "text": [WORDS] * 20})
    )
    out = dom_main_content(docs).toPandas().set_index("doc_id")
    assert len(out) == 20
    for doc_id, row in out.iterrows():
        if doc_id % 9 == 0:
            assert row["winner"] == "comments" and row["link_len"] == 0
            assert row["path"] == "html/body/div/div"
            assert row["main_text"].startswith("nice post 0\nnice post 1")
            assert row["main_text"].endswith(WORDS.replace(" ", ", "))
            assert row["p_count"] == 3 + doc_id % 3
        else:
            assert row["winner"] == "article" and row["link_len"] == 18
            assert row["path"] == "html/body/div/div/div"
            ws = WORDS.split(" ")
            assert row["main_text"] == " ".join(ws[:12]) + "\n" + " ".join(ws[12:])
            assert row["p_count"] == 2


def test_page_html_matches_spark_template(spark, sf_dir):
    """dom.page_html (served as the WARC 200 body) must stay byte-equal
    to synthesize_dom's Spark expression — the chain oracle depends on it."""
    from pdfparser_spark.textops import dom

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    spark_pages = {r.doc_id: r.html for r in dom.synthesize_dom(docs).collect()}
    for r in docs.collect():
        assert spark_pages[r.doc_id] == dom.page_html(r.doc_id, r.text)


def test_text_content_cross_validated_against_stdlib_parser():
    """Independent-grammar agreement: the whitespace-normalized text
    content our lenient DOM parser recovers from the synth pages equals
    what Python's stdlib html.parser (a wholly separate implementation)
    extracts under the same script/style exclusion — the co-evolution
    insurance arm for the HTML tier (same standing as the JDK codec
    cross-validation)."""
    from html.parser import HTMLParser

    from pdfparser_spark.textops.dom import page_html, parse_html

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.skip = 0
            self.parts = []

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip:
                self.skip -= 1

        def handle_data(self, d):
            if not self.skip:
                self.parts.append(d)

    def dom_text(e, out):
        for c in e.children:
            if isinstance(c, str):
                out.append(c)
            elif c.tag not in ("script", "style"):
                dom_text(c, out)
        return out

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for d in range(30):
        src = page_html(d, words)
        ref = Ref()
        ref.feed(src)
        ours = " ".join("".join(dom_text(parse_html(src), [])).split())
        exp = " ".join("".join(ref.parts).split())
        assert ours == exp, d
