"""Skew-aware document partitioning (SURVEY.md §4, north_rule).

Document corpora are heavy-tailed: a handful of giant documents can straggle
an entire mapInPandas stage because AQE's skew handling only re-splits
*shuffle* partitions at join/agg boundaries, not Python map stages.  Policy:

  1. compute each doc's payload weight (total span bytes) with built-in
     expressions (F.aggregate — JVM-side, no UDF);
  2. giant docs (weight > isolate_threshold) are spread round-robin over
     dedicated partitions, one-ish doc per partition;
  3. the remainder is hash-distributed on doc_id.

Both subsets use ``repartition`` with explicit partition counts, so the
downstream Arrow batches are bounded in bytes, not just rows.  At cluster
scale the same policy holds with larger constants; the threshold should sit
near (executor memory / arrow batch rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ISOLATE_THRESHOLD = 8 * 1024 * 1024  # bytes of span payload


def doc_weight(col: str = "spans"):
    """Total payload bytes per document, computed JVM-side."""
    return F.aggregate(
        F.col(col),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]).cast("long"), F.lit(0)),
    )


def repartition_docs(
    df: DataFrame,
    target_partitions: int,
    isolate_threshold: int = DEFAULT_ISOLATE_THRESHOLD,
    big_slots: int | None = None,
    weight_col=None,
) -> DataFrame:
    """Salted two-tier repartition of a document table.

    Entirely lazy — no driver-side action — so upstream synthesis/scan
    stages are never recomputed just to plan the partitioning.  Giant docs
    get salt keys from a disjoint key range so they spread across the extra
    ``big_slots`` instead of clumping with (or inside) the hash partitions
    of the small docs.
    """
    big_slots = big_slots or target_partitions
    w = weight_col if weight_col is not None else doc_weight()
    salt = F.when(
        w > isolate_threshold,
        F.pmod(F.hash("doc_id"), F.lit(big_slots)) + F.lit(target_partitions),
    ).otherwise(F.pmod(F.hash("doc_id"), F.lit(target_partitions)))
    return df.repartition(target_partitions + big_slots, salt)
