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
    args = ap.parse_args()

    # import after argparse so --help works without a JVM
    from pdfparser_spark.pipeline import Pipeline, run_extraction
    from pdfparser_spark.session import build_session

    spark = build_session(master=args.master)
    if args.force:
        Pipeline(spark, work_dir=args.work_dir).invalidate()
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
