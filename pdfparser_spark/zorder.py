"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the file: both
the snapshot log here (`snapshots.py` manifest min/max stats) and real
table formats (Iceberg/Delta) prune files whose column ranges can't
match the predicate.  But stats only prune if the LAYOUT clusters the
filter columns — a randomly laid-out table has every file's range
spanning the whole domain, so nothing skips.  Z-ordering interleaves the
bits of several columns into one sort key so that files become tight
hyper-rectangles in ALL those dimensions at once (the standard
multi-dimension clustering recipe, e.g. Delta OPTIMIZE ZORDER BY).

``zorder_skipping_report`` makes that effect measurable and
oracle-checkable: it lays the corpus out twice — z-ordered on
(lang_bucket, len_bucket) vs hash-scattered (the unclustered baseline) —
computes each file's min/max stats exactly as a manifest would store
them, evaluates a representative point predicate against those stats,
and reports files/rows scanned per layout.  Everything is integer
arithmetic on deterministic hashes, so the DuckDB oracle reproduces the
exact report.

Morton code: two 4-bit dimensions interleaved into an 8-bit key,
  z = sum_i  bit_i(d1) * 2^(2i+1)  +  bit_i(d2) * 2^(2i)
with bit_i(x) = (x // 2^i) % 2 — pure integer ops on both engines.

Scale shape: per-doc z-codes are a projection (no shuffle); the stats
table is one (layout, file_id) aggregate (map-side combinable, tiny);
the report is a constant-size aggregate over the stats.  In production
the z-code feeds ``repartitionByRange(z).sortWithinPartitions(z)`` +
write — range partitioning by a 1-D key, the shuffle Spark is best at.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops.sketch import hash48, sql_hash48

DIM_BITS = 4  # bits per dimension -> 8-bit z-code, 256 cells
N_FILES = 16  # cells per file = 256 / 16
# representative point predicate (lang_bucket = 4, len_bucket = 8 — a
# populated cell on the synthetic corpus at every SF)
PRED_LANG = 4
PRED_LEN = 8


def _lang_bucket(col: Column) -> Column:
    return F.pmod(hash48(col), F.lit(1 << DIM_BITS).cast("long"))


def _len_bucket(col: Column) -> Column:
    # bit-length of n_chars, capped into the dimension range
    return F.least(
        F.length(F.bin(col)).cast("long"), F.lit((1 << DIM_BITS) - 1).cast("long")
    )


def _morton(d1: Column, d2: Column) -> Column:
    z = F.lit(0).cast("long")
    for i in range(DIM_BITS):
        b1 = F.pmod(F.floor(d1 / F.lit(1 << i)).cast("long"), F.lit(2).cast("long"))
        b2 = F.pmod(F.floor(d2 / F.lit(1 << i)).cast("long"), F.lit(2).cast("long"))
        z = z + b1 * F.lit(1 << (2 * i + 1)) + b2 * F.lit(1 << (2 * i))
    return z


def zorder_codes(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_bucket, len_bucket, zcode): the per-doc Morton key."""
    return documents.select(
        "doc_id",
        _lang_bucket(F.col("lang")).alias("lang_bucket"),
        _len_bucket(F.col("n_chars")).alias("len_bucket"),
    ).select(
        "doc_id",
        "lang_bucket",
        "len_bucket",
        _morton(F.col("lang_bucket"), F.col("len_bucket")).alias("zcode"),
    )


def zorder_skipping_report(documents: DataFrame) -> DataFrame:
    """(layout, n_files, files_scanned, rows_scanned, rows_matching):
    manifest-stat pruning simulated for the z-ordered layout vs the
    hash-scattered baseline on the same predicate."""
    codes = zorder_codes(documents)
    assigned = codes.select(
        "doc_id",
        "lang_bucket",
        "len_bucket",
        F.expr(f"zcode DIV {(1 << (2 * DIM_BITS)) // N_FILES}").alias("z_file"),
        F.pmod(hash48(F.col("doc_id").cast("string")), F.lit(N_FILES).cast("long")).alias(
            "h_file"
        ),
    )
    stacked = assigned.select(
        F.lit("zorder").alias("layout"),
        F.col("z_file").alias("file_id"),
        "lang_bucket",
        "len_bucket",
    ).unionByName(
        assigned.select(
            F.lit("scattered").alias("layout"),
            F.col("h_file").alias("file_id"),
            "lang_bucket",
            "len_bucket",
        )
    )
    match = (F.col("lang_bucket") == PRED_LANG) & (F.col("len_bucket") == PRED_LEN)
    stats = stacked.groupBy("layout", "file_id").agg(
        F.min("lang_bucket").alias("min_lang"),
        F.max("lang_bucket").alias("max_lang"),
        F.min("len_bucket").alias("min_len"),
        F.max("len_bucket").alias("max_len"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(match.cast("long")).alias("n_match"),
    )
    hit = (
        (F.col("min_lang") <= PRED_LANG)
        & (F.col("max_lang") >= PRED_LANG)
        & (F.col("min_len") <= PRED_LEN)
        & (F.col("max_len") >= PRED_LEN)
    )
    return stats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(hit.cast("long")).alias("files_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0).cast("long"))).alias(
            "rows_scanned"
        ),
        F.sum("n_match").alias("rows_matching"),
    )


def zorder_oracle_sql() -> str:
    """DuckDB mirror of :func:`zorder_skipping_report`."""
    lang_h = sql_hash48("lang")
    doc_h = sql_hash48("CAST(doc_id AS VARCHAR)")
    bits = " + ".join(
        f"((d1 // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        f" + ((d2 // {1 << i}) % 2) * {1 << (2 * i)}"
        for i in range(DIM_BITS)
    )
    cells = (1 << (2 * DIM_BITS)) // N_FILES
    return f"""
        WITH dims AS (
          SELECT doc_id,
                 {lang_h} % {1 << DIM_BITS} AS d1,
                 LEAST(CAST(len(bin(n_chars)) AS BIGINT), {(1 << DIM_BITS) - 1}) AS d2
          FROM documents
        ), coded AS (
          SELECT doc_id, d1 AS lang_bucket, d2 AS len_bucket,
                 ({bits}) AS zcode,
                 {doc_h} % {N_FILES} AS h_file
          FROM dims
        ), stacked AS (
          SELECT 'zorder' AS layout, zcode // {cells} AS file_id,
                 lang_bucket, len_bucket FROM coded
          UNION ALL
          SELECT 'scattered' AS layout, h_file AS file_id,
                 lang_bucket, len_bucket FROM coded
        ), stats AS (
          SELECT layout, file_id,
                 MIN(lang_bucket) AS min_lang, MAX(lang_bucket) AS max_lang,
                 MIN(len_bucket) AS min_len, MAX(len_bucket) AS max_len,
                 COUNT(*) AS n_rows,
                 COUNT(*) FILTER (lang_bucket = {PRED_LANG} AND len_bucket = {PRED_LEN}) AS n_match
          FROM stacked GROUP BY 1, 2
        )
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(COUNT(*) FILTER (min_lang <= {PRED_LANG} AND max_lang >= {PRED_LANG}
                     AND min_len <= {PRED_LEN} AND max_len >= {PRED_LEN}) AS BIGINT) AS files_scanned,
               CAST(SUM(CASE WHEN min_lang <= {PRED_LANG} AND max_lang >= {PRED_LANG}
                     AND min_len <= {PRED_LEN} AND max_len >= {PRED_LEN}
                    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
               CAST(SUM(n_match) AS BIGINT) AS rows_matching
        FROM stats GROUP BY 1
    """
