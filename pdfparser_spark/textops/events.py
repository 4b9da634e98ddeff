"""Windowed event aggregation — batch and Structured Streaming variants.

The reference is pure batch (SURVEY.md §2.9: streaming absent), but a
training-data platform ingests event streams; this module supplies the
streaming surface with tumbling-window semantics that are *identical* in
batch and stream, so one DuckDB oracle (`time_bucket`) verifies both:

  * ``tumbling_window`` — batch ``F.window`` aggregation (what a backfill
    runs over the same table);
  * ``stream_tumbling_window`` — a real Structured Streaming job over the
    same parquet via ``readStream`` + watermark + ``Trigger.AvailableNow``
    into a memory sink; parity with the batch result is asserted in tests.

At scale: the window agg shuffles once on (window, event_type) with
map-side partial aggregation; watermarking bounds state for late data.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


from ..rounding import r2 as _r2  # engine-portable half-up (one shared def)


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_window(events: DataFrame) -> DataFrame:
    """Batch tumbling 1-hour window: (window_start, event_type, n_events,
    sum_value)."""
    return _agg(events)


def sliding_window(events: DataFrame, size: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding (hopping) windows: every event lands in size/slide
    overlapping windows (Spark expands via its internal window generator;
    one shuffle on (window, event_type) with map-side partial agg).  The
    oracle reproduces the expansion with an explicit k in 0..size/slide-1
    LATERAL, both epoch-aligned."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_tumbling_window(spark: SparkSession, events_path: str) -> DataFrame:
    """Same aggregation as a genuine Structured Streaming job.

    Reads the parquet directory as a stream, applies a 2-hour watermark
    (late-data bound; with AvailableNow over static input it discards
    nothing, so the result equals the batch run), aggregates into a memory
    sink, and returns the completed result as a DataFrame.
    """
    schema = spark.read.parquet(events_path).schema
    # FileStreamSource requires a *directory*; if given a bare parquet file
    # (the shape of the small-SF test tables), expose it through a symlink
    # directory (content-addressed, so repeated calls reuse it).
    if os.path.isfile(events_path):
        d = os.path.join(
            tempfile.gettempdir(),
            "stream_src_" + hashlib.md5(events_path.encode()).hexdigest()[:12],
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "part-0000.parquet")
        if not os.path.exists(link):
            os.symlink(events_path, link)
        events_path = d
    stream = spark.readStream.schema(schema).parquet(events_path)
    # watermarks require TIMESTAMP (with zone); parquet may carry NTZ —
    # session tz is pinned UTC so the cast is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = _agg(stream.withWatermark("ts", "2 hours"))
    sink = f"events_window_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: events within ``gap`` of each other merge
    into one session (``F.session_window`` — Spark's native session
    aggregation, one shuffle on (user_id, window), map-side partial merge).
    Output: (user_id, session_start, n_events, sum_value)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def stream_user_totals(spark: SparkSession, events_path: str) -> DataFrame:
    """Custom STATEFUL streaming operator: per-user running totals via
    ``applyInPandasWithState`` (Arrow-batched state updates — the escape
    hatch for stateful logic Spark's built-in windows can't express).
    State = (n_events, sum_value) per user; each micro-batch folds its rows
    into the state and emits the user's current totals (update mode).

    Returns the final per-user totals after an ``availableNow`` pass over
    the (static) input — equal to the batch groupBy aggregation, which the
    DuckDB oracle checks.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        d = os.path.join(
            tempfile.gettempdir(),
            "stream_src_" + hashlib.md5(events_path.encode()).hexdigest()[:12],
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "part-0000.parquet")
        if not os.path.exists(link):
            os.symlink(events_path, link)
        events_path = d
    stream = spark.readStream.schema(schema).parquet(events_path)

    def update(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"user_totals_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per (user, micro-batch); the final state
    # is the row with the highest n_events per user
    t = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        t.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("user_id", "n_events", _r2(F.col("sum_value")).alias("sum_value"))
    )
