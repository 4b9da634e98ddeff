#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline.

Deployment shape per BASELINE.json: ``spark-submit --py-files
pdfparser_spark.zip scripts/run_pipeline.py --sf-dir ... --out ...``.
Resumable: re-running with the same ``--work-dir`` skips completed stages
(delete the dir or pass ``--force`` to recompute).

Prints one JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--work-dir", default="/tmp/pdfparser_spark_run")
    ap.add_argument("--out", default=None, help="output dir for spans/metrics/lineage parquet")
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("--force", action="store_true", help="invalidate checkpoints first")
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--mode",
        default="pdf",
        choices=("pdf", "warc"),
        help="pdf: staged extraction DAG over the documents table; "
        "warc: crawl ingestion (WARC shards -> parse -> DOM main content)",
    )
    args = ap.parse_args()

    # checkpoints/shards are only valid for the (input, mode, strictness)
    # they were built from — key the effective work dir on all three, so
    # rerunning with a different --sf-dir/--strict can never silently
    # resume the previous corpus' checkpoints under the same path
    import hashlib

    sf_key = (
        os.path.basename(os.path.normpath(args.sf_dir))
        + "_"
        + hashlib.md5(os.path.normpath(args.sf_dir).encode()).hexdigest()[:6]
    )
    args.work_dir = os.path.join(
        args.work_dir, f"{args.mode}_{sf_key}" + ("_strict" if args.strict else "")
    )

    # import after argparse so --help works without a JVM
    from pdfparser_spark.pipeline import run_extraction
    from pdfparser_spark.session import build_session

    spark = build_session(master=args.master)
    if args.force:  # BEFORE branching: --force must work in every mode
        import shutil

        shutil.rmtree(args.work_dir, ignore_errors=True)

    if args.mode == "warc":
        from pdfparser_spark.sources import warc
        from pdfparser_spark.textops import dom
        from pyspark.sql import functions as F

        shard_dir = os.path.join(args.work_dir, "warc_shards")
        docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        t0 = time.perf_counter()
        if not os.path.exists(os.path.join(shard_dir, "_SUCCESS")):  # resumable
            warc.write_warc_shards(docs, shard_dir, n_shards=8).count()
            open(os.path.join(shard_dir, "_SUCCESS"), "w").close()
        pages = (
            warc.read_warc(spark, shard_dir)
            .filter(F.col("status") == 200)
            .select(
                F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
                F.col("body").alias("html"),
            )
        )
        content = dom.dom_extract(pages)
        if args.out:
            content.write.mode("overwrite").parquet(os.path.join(args.out, "main_content"))
            n = spark.read.parquet(os.path.join(args.out, "main_content")).count()
        else:
            n = content.count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": "warc",
            "sf_dir": args.sf_dir,
            "docs": n,
            "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 2),
        }))
        spark.stop()
        return

    t0 = time.perf_counter()
    res = run_extraction(spark, args.sf_dir, work_dir=args.work_dir, strict=args.strict)
    n_docs = res["spans"].count()
    if args.out:
        res["spans_flat"].write.mode("overwrite").parquet(os.path.join(args.out, "spans_flat"))
        res["metrics"].write.mode("overwrite").parquet(os.path.join(args.out, "metrics"))
        res["lineage"].write.mode("overwrite").parquet(os.path.join(args.out, "lineage"))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "work_dir": args.work_dir,
        "docs": n_docs,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 2),
        "strict": args.strict,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
