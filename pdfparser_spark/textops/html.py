"""HTML boilerplate strip / DOM-heuristic main-content extraction.

north_rule names "HTML boilerplate strip, ... DOM heuristics" as part of the
main-content extraction surface.  The corpus has no HTML, so we wrap each
document's text in a deterministic page template (nav + ad + article +
footer) and extract the main content back with a *generic* block-scoring
heuristic (the classic text-density / link-density rule used by
boilerplate-removal systems):

    score(block) = len(stripped_text) - LINK_PENALTY * n_links

The winning block's stripped text is the main content.  Everything is
JVM-side (``regexp_extract_all`` / ``regexp_replace`` / ``posexplode`` +
window) — no Python UDF; patterns avoid backreferences so the DuckDB (RE2)
oracle can run the identical regexes.

At 100 TB scale this is a pure narrow map (no shuffle except the final
argmax window, which is per-doc and pre-partitioned by the scan); predicate
pushdown and column pruning reach the parquet scan because the template
synthesis is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BLOCK_RE = r"<(?:nav|div|article|footer)>.*?</(?:nav|div|article|footer)>"
TAG_RE = r"<[^>]*>"
LINK_RE = r"<a href"
LINK_PENALTY = 20


def synthesize_html(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, html): deterministic page
    template; mirrored exactly by the DuckDB oracle."""
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body>"),
        F.lit("<nav><a href='/'>Home</a> <a href='/about'>About</a> <a href='/contact'>Contact</a></nav>"),
        F.lit("<div>AD: BUY NOW offer "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</div><article><p>"),
        F.col("text"),
        F.lit("</p></article><footer>Copyright 2026 <a href='/terms'>Terms</a></footer>"),
        F.lit("</body></html>"),
    )
    return documents.select("doc_id", html.alias("html"))


def main_content(html_df: DataFrame) -> DataFrame:
    """(doc_id, html) -> (doc_id, main_text, block_idx, score).

    Generic DOM-block heuristic: split the page into top-level blocks,
    score each by text length minus a link-density penalty, keep the
    arg-max block (ties -> earliest block).
    """
    blocks = html_df.select(
        "doc_id",
        F.posexplode(F.regexp_extract_all(F.col("html"), F.lit(BLOCK_RE), 0)).alias(
            "block_idx", "block"
        ),
    )
    scored = blocks.select(
        "doc_id",
        "block_idx",
        F.regexp_replace(F.col("block"), TAG_RE, "").alias("main_text"),
        (
            F.length(F.regexp_replace(F.col("block"), TAG_RE, ""))
            - F.lit(LINK_PENALTY) * F.size(F.regexp_extract_all(F.col("block"), F.lit(LINK_RE), 0))
        ).cast("int").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("block_idx"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", "main_text", "block_idx", "score")
    )


def html_main_content(documents: DataFrame) -> DataFrame:
    """End-to-end: wrap in the page template, then boilerplate-strip."""
    return main_content(synthesize_html(documents))
