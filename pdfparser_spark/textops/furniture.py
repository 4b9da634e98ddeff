"""Page-furniture removal (running headers/footers) over the layout
extraction — a document-corpus cleaning step LLM pipelines run before
text concatenation: a line repeated at the SAME origin on several pages
of one document is page furniture (header, footer, watermark text),
not content, and must not enter the training text once per page.

Detection is pure DataFrame algebra: ONE aggregate keyed (doc_id, x,
y, text) counting distinct pages, a threshold, and an anti-join back —
the decision needs ≥ ``min_pages`` distinct pages, so single-page
documents NEVER lose a line (no cross-page evidence).  Both the
aggregate and the join key lead with doc_id (the extraction's natural
partitioning), so at cluster scale this is one co-partitioned
shuffle; the furniture set itself is a per-doc handful of rows.

Reference parity: none — pure pipeline tier (the north-star cleaning
ops family, like textops/html.py boilerplate removal but geometric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def strip_page_furniture(layout: DataFrame, min_pages: int = 2) -> DataFrame:
    """Drop lines whose (text, x, y) repeats on >= ``min_pages`` distinct
    pages of the same document; surviving rows are renumbered in reading
    order (page, -y, x).  Input/output schema: (doc_id, ord, page_idx,
    x, y, text)."""
    key = ["doc_id", "x", "y", "text"]
    furniture = (
        layout.groupBy(*key)
        .agg(F.countDistinct("page_idx").alias("np"))
        .filter(F.col("np") >= min_pages)
        .select(*key)
    )
    kept = layout.join(furniture, key, "left_anti")
    w = Window.partitionBy("doc_id").orderBy(
        "page_idx", F.col("y").desc(), "x", "ord"
    )
    return kept.withColumn("ord", (F.row_number().over(w) - 1).cast("int"))
