"""SparkSession construction tuned for the extraction workload.

Settings follow SURVEY.md §4: AQE on (skew-join splitting + partition
coalescing), Arrow exchange on with a bounded batch size (span payloads are
large — BASELINE.json's heavy-tailed corpus), shuffle partitions sized to
cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# bounded: rows carry whole-document payloads.  Overridable for thin-row
# workloads (the x96 scaling corpus docs are ~1 KB; bigger batches cut
# per-batch Python/Arrow overhead without memory risk there).
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "256"))


def build_session(
    master: str | None = None,
    app_name: str = "pdfparser_spark",
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(4, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.session.timeZone", "UTC")
        # checkpoint/sink parquet codec: lz4 beats the snappy default on
        # this workload (interleaved warm runs at sf0.1: 5.9-6.1 s vs
        # 6.3-6.4 s staged DAG; far bigger gap cold) — the stage tables
        # are write-once/read-once, so cheap compression wins
        .config("spark.sql.parquet.compression.codec", "lz4")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
