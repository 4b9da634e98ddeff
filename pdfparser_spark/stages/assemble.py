"""Stage 4 — assemble.

Ordered span emission (reference B5, doc_tree.rs:134-142 preorder walk;
SURVEY.md §2.6).  The reading order key is ``(page_idx, seq, ev_idx)`` —
page order came from the tree walk in decode, ``seq`` is the content-stream
index within the page, ``ev_idx`` the operator's byte order in its stream.

Implementation note (scale): a window (`row_number` over doc_id) followed by
``collect_list`` would shuffle twice.  Instead we do ONE shuffle:
``groupBy(doc_id).agg(sort_array(collect_list(struct(ordkeys..., payload))))``
— partial aggregation is map-side, the sort is per-doc on the reduce side,
and ``transform`` strips the ordering keys while stamping the final
``offset`` = array position.  Documents with zero spans (family A) are
preserved via a left join from the doc universe (meta rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble(classified: DataFrame, decoded: DataFrame, strict: bool = False, metrics: DataFrame | None = None) -> DataFrame:
    """-> ``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``."""
    ordered = (
        classified.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("page_idx", "seq", "ev_idx", "kind", "text", "media_ref"))
            ).alias("raw")
        )
        .select(
            "doc_id",
            F.transform(
                "raw",
                lambda x, i: F.struct(
                    x["kind"].alias("kind"),
                    x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    universe = decoded.filter(F.col("rtype") == "meta").select("doc_id").distinct()
    out = (
        universe.join(ordered, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(
                "spans", F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>")
            ).alias("spans"),
        )
    )
    if strict and metrics is not None:
        errored = metrics.select("doc_id").distinct()
        out = (
            out.join(errored.withColumn("_err", F.lit(True)), on="doc_id", how="left")
            .withColumn("spans", F.when(F.col("_err").isNull(), F.col("spans")).otherwise(F.array().cast(out.schema["spans"].dataType)))
            .drop("_err")
        )
    return out


def flatten_spans(spans_df: DataFrame) -> DataFrame:
    """Exploded view ``(doc_id, ord, kind, text, media_ref)`` — the shape the
    driver's DuckDB oracle compares against."""
    return spans_df.select("doc_id", F.posexplode("spans").alias("ord", "s")).select(
        "doc_id",
        F.col("ord").cast("int").alias("ord"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
