"""Relational operators beyond the inline query set: runtime join filters.

``bloom_semi_join`` demonstrates the optimization big engines apply to
selective joins at scale (Spark's runtime bloom-filter join, ORC/Iceberg
bloom indexes): instead of shuffling the full probe side to discover
that most rows have no match, build a tiny bit-set over the qualifying
build-side keys, broadcast it, and pre-filter the probe side at the
scan.  The exact join then runs over the survivors only.

Spark's built-in version (`spark.sql.optimizer.runtime.bloomFilter`) is
engine-private (xxhash + its own bit layout), so this module builds the
filter EXPLICITLY from the shared deterministic 48-bit md5 fold
(`sketch.hash48`) — which makes the whole thing oracle-checkable: the
DuckDB side regenerates the identical bloom and must agree on every
count, including the false positives.

Representation: a Bloom filter with K=2 hash functions over M bits is
exactly "both of the row's 2 positions appear in the build side's
position SET" — so the broadcast bit-array becomes a broadcast DISTINCT
position table (<= 2·|build| rows, tiny) and membership becomes two
broadcast LEFT SEMI joins.  Same semantics, pure DataFrame algebra, and
Catalyst keeps both probes in one whole-stage-codegen scan pass.

Guarantees (pytest-asserted): no false negatives — every true match
passes the bloom; false positives are counted, not hidden (the operator
reports n_bloom_pass vs n_true_match per group).

Scale shape: build side is one filter + projection (map-only), the
position table broadcasts at any corpus scale (M = 8192 caps it at 8k
rows even for 10^9 build keys — at that fill the filter degrades to
all-pass, which is the documented Bloom behavior, never wrong results);
probe side is scan + two broadcast semi probes + one partial+final agg.
No shuffle touches the unfiltered probe table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops.sketch import hash48, sql_hash48

BLOOM_M = 8192  # bits
PRICE_CUT = 460000.0  # high-value order threshold (~8% of orders)


def _pos(key, salt: int):
    return F.pmod(
        hash48(F.concat(key.cast("string"), F.lit(f"#{salt}"))),
        F.lit(BLOOM_M).cast("long"),
    )


def bloom_semi_join(
    lineitem: DataFrame, orders: DataFrame, cut: float = PRICE_CUT, m: int = BLOOM_M
) -> DataFrame:
    """(l_returnflag, n_bloom_pass, n_true_match, n_false_pos, sum_qty_true):
    lineitem pre-filtered by an explicit 2-hash Bloom filter built over
    high-value orders, with the exact semi-join run on the survivors and
    the false-positive overhead reported per group."""
    build = orders.filter(F.col("o_totalprice") >= cut).select("o_orderkey")
    positions = (
        build.select(
            F.explode(
                F.array(_pos(F.col("o_orderkey"), 0), _pos(F.col("o_orderkey"), 1))
            ).alias("pos")
        )
        .distinct()
    )
    probe = lineitem.select(
        "l_orderkey",
        "l_returnflag",
        "l_quantity",
        _pos(F.col("l_orderkey"), 0).alias("p0"),
        _pos(F.col("l_orderkey"), 1).alias("p1"),
    )
    passed = probe.join(
        F.broadcast(positions.withColumnRenamed("pos", "p0")), "p0", "left_semi"
    ).join(F.broadcast(positions.withColumnRenamed("pos", "p1")), "p1", "left_semi")
    # exact join over the bloom survivors only (the point of the filter)
    survivors_true = passed.join(
        F.broadcast(build),
        passed.l_orderkey == build.o_orderkey,
        "left_semi",
    )
    bloom_agg = passed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_bloom_pass")
    )
    true_agg = survivors_true.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_true_match"),
        (
            F.floor(F.sum("l_quantity") * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
        ).alias("sum_qty_true"),
    )
    return bloom_agg.join(true_agg, "l_returnflag").select(
        "l_returnflag",
        "n_bloom_pass",
        "n_true_match",
        (F.col("n_bloom_pass") - F.col("n_true_match")).alias("n_false_pos"),
        "sum_qty_true",
    )


N_BUCKETS = 8


def bucketed_colocated_join(
    lineitem: DataFrame, orders: DataFrame, path_root: str | None = None
) -> DataFrame:
    """Shuffle-free fact-to-fact join via BUCKETED tables — the layout
    trick that amortizes the big join's shuffle at 100 TB: write both
    sides hash-bucketed (and sorted) on the join key ONCE, and every
    subsequent join on that key reads co-located buckets with ZERO
    exchange on either side (Spark's SortMergeJoin consumes the bucket
    files directly; pytest asserts the single remaining exchange is the
    final aggregation's).

    Bucketing metadata lives in the session catalog (parquet itself
    can't carry it), so both sides are written as EXTERNAL bucketed
    tables under ``path_root`` via ``saveAsTable(option("path"=...))`` —
    nothing lands in the default warehouse.  Bucket count must match on
    both sides (8 here); the write itself costs one shuffle per table,
    paid once, not per downstream join.

    Returns revenue per return flag over the joined tables — same values
    as the plain join (the layout changes the plan, never the answer).
    """
    import tempfile
    import uuid as _uuid

    spark = lineitem.sparkSession
    if path_root is None:
        path_root = tempfile.mkdtemp(prefix="bucketed_")
    tag = _uuid.uuid4().hex[:8]
    lt, ot = f"lineitem_b_{tag}", f"orders_b_{tag}"
    (
        lineitem.select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{path_root}/{lt}")
        .format("parquet")
        .saveAsTable(lt)
    )
    (
        orders.select("o_orderkey", "o_orderpriority")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{path_root}/{ot}")
        .format("parquet")
        .saveAsTable(ot)
    )
    li, od = spark.table(lt), spark.table(ot)
    joined = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    return (
        joined.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.floor(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    * F.lit(100.0)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("revenue"),
        )
    )


BUCKETED_JOIN_ORACLE_SQL = """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
"""


def bloom_semi_join_oracle_sql(cut: float = PRICE_CUT, m: int = BLOOM_M) -> str:
    """DuckDB mirror: same hash fold, same position set, same counts."""
    def pos(key: str, salt: int) -> str:
        h = sql_hash48(f"CAST({key} AS VARCHAR) || '#{salt}'")
        return f"({h} % {m})"

    p = {"0": pos("l_orderkey", 0), "1": pos("l_orderkey", 1)}
    b0 = pos("o_orderkey", 0)
    b1 = pos("o_orderkey", 1)
    return f"""
        WITH build AS (SELECT o_orderkey FROM orders WHERE o_totalprice >= {cut}),
        positions AS MATERIALIZED (
          SELECT DISTINCT pos FROM (
            SELECT {b0} AS pos FROM build
            UNION ALL SELECT {b1} AS pos FROM build
          )
        ),
        probe AS (
          SELECT l_orderkey, l_returnflag, l_quantity,
                 {p["0"]} AS p0, {p["1"]} AS p1
          FROM lineitem
        ),
        passed AS (
          SELECT * FROM probe
          WHERE p0 IN (SELECT pos FROM positions)
            AND p1 IN (SELECT pos FROM positions)
        ),
        agg AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS BIGINT) AS n_bloom_pass,
                 CAST(COUNT(*) FILTER (l_orderkey IN (SELECT o_orderkey FROM build)) AS BIGINT) AS n_true_match,
                 FLOOR(SUM(l_quantity) FILTER (l_orderkey IN (SELECT o_orderkey FROM build)) * 100.0 + 0.5) / 100.0 AS sum_qty_true
          FROM passed GROUP BY 1
        )
        SELECT l_returnflag, n_bloom_pass, n_true_match,
               CAST(n_bloom_pass - n_true_match AS BIGINT) AS n_false_pos,
               sum_qty_true
        FROM agg
    """


# ---------------------------------------------------------------------------
# range join via bucket expansion
# ---------------------------------------------------------------------------

RANGE_W = 120  # bucket width in seconds == range length (each range spans <= 2 buckets)
BUSY_K = 2  # events/minute threshold that makes a minute "busy"


def range_bucket_join(events: DataFrame, k: int = BUSY_K) -> DataFrame:
    """Range join WITHOUT an equi key, made shuffle-bounded by bucket
    expansion: count events inside every "surge window" around a busy
    minute ([minute*60 - 30, minute*60 + 90), derived from the data
    itself — count >= k events in the minute).

    A naive plan for ``e.ts BETWEEN r.lo AND r.hi`` with no equality
    conjunct is a BroadcastNestedLoopJoin (fine only while the range
    table is small) or a cartesian product (never fine).  The standard
    scale fix: pick a bucket width W >= max range length, explode each
    range to the <= 2 buckets it overlaps, give each event its single
    bucket floor(sec/W), equi-join on the bucket, and re-check the exact
    range predicate on the survivors.  Both sides shuffle on a uniform
    integer key, so the join scales with executors no matter how many
    ranges exist (millions of busy minutes across years of a real event
    log); a surge bucket with many events is ordinary shuffle-join skew,
    which AQE's skew-split handles.  Overlapping windows are preserved —
    an event inside two surge windows counts in both.

    Emits (minute_id, n_events, n_users), one row per busy minute.
    Oracle: the same join as a plain inequality join in DuckDB
    (`range_bucket_join_oracle_sql`)."""
    ev = events.select(
        F.unix_timestamp("ts").cast("long").alias("e_sec"), "user_id"
    )
    busy = (
        ev.groupBy(F.floor(F.col("e_sec") / 60).cast("long").alias("minute_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= k)
        .select(
            "minute_id",
            (F.col("minute_id") * 60 - 30).alias("lo"),
            (F.col("minute_id") * 60 + 90).alias("hi"),
        )
    )
    ranges = busy.select(
        "minute_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / RANGE_W).cast("long"),
                F.floor((F.col("hi") - 1) / RANGE_W).cast("long"),
            )
        ).alias("bucket"),
    )
    probe = ev.withColumn("bucket", F.floor(F.col("e_sec") / RANGE_W).cast("long"))
    joined = probe.join(ranges, "bucket").filter(
        (F.col("e_sec") >= F.col("lo")) & (F.col("e_sec") < F.col("hi"))
    )
    return joined.groupBy("minute_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def range_bucket_join_oracle_sql(k: int = BUSY_K) -> str:
    """DuckDB mirror of range_bucket_join as a PLAIN inequality join —
    the oracle checks the bucket trick changes nothing semantically."""
    return f"""
        WITH e AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e_sec, user_id FROM events
        ), busy AS (
          SELECT e_sec // 60 AS minute_id FROM e GROUP BY 1 HAVING COUNT(*) >= {k}
        ), ranges AS (
          SELECT minute_id, minute_id * 60 - 30 AS lo, minute_id * 60 + 90 AS hi
          FROM busy
        )
        SELECT r.minute_id, COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM ranges r JOIN e ON e.e_sec >= r.lo AND e.e_sec < r.hi
        GROUP BY r.minute_id
    """


# ---------------------------------------------------------------------------
# Salted skew join
# ---------------------------------------------------------------------------

SKEW_SALTS = 8  # dim replicas; size >= the hot key's overload factor


def salted_skew_join(events: DataFrame, salts: int = SKEW_SALTS) -> DataFrame:
    """(grp, grp_owner, n_events, total_cents): a shuffle join whose key
    is deliberately SKEWED — ~70% of rows collapse onto one ``hot``
    group — repaired by explicit salting, the standard fix when the
    build side is too large to broadcast and one reducer would
    otherwise receive most of the probe table.

    Mechanics: every dim row is replicated ``salts`` times with a salt
    column (``explode(sequence(...))`` — dim grows by a constant
    factor, never by data volume), each fact row draws ONE deterministic
    salt from the full-entropy 48-bit md5 fold of its event_id, and the
    join runs on (grp, salt) — so the hot key's rows spread over
    ``salts`` reducers instead of one.  Each fact row still matches
    exactly one dim replica, which is why the result is bit-identical
    to the unsalted join (the oracle IS the unsalted join).  The
    ``merge`` hint pins a SortMergeJoin: a broadcast join would make
    the demo vacuous (broadcast is the right fix when the dim FITS —
    salting is for when it doesn't).

    At 100 TB: AQE's skew-join splitting handles *moderate* skew at
    runtime, but it only splits oversized partitions of a completed
    shuffle map stage; a single key holding most of the table still
    funnels through few reducers on the DIM side of the match.  Explicit
    salting bounds every reducer by construction and composes with AQE.
    Integer cents keep the rollup bit-exact cross-engine."""
    fact = events.select(
        "event_id",
        F.when(F.col("user_id") % 10 < 7, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        "user_id",
    )
    dim = fact.groupBy("grp").agg(F.min("user_id").alias("grp_owner"))
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    fact_salted = fact.withColumn(
        "salt",
        F.pmod(
            hash48(F.concat(F.col("event_id").cast("string"), F.lit("#skewsalt"))),
            F.lit(salts).cast("long"),
        ).cast("int"),
    )
    return (
        fact_salted.hint("merge")
        .join(dim_salted, ["grp", "salt"])
        .groupBy("grp", "grp_owner")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
    )


def salted_skew_join_oracle_sql() -> str:
    """DuckDB mirror as the PLAIN (unsalted) join — the oracle proves
    the salt replication changes nothing semantically."""
    return """
        WITH fact AS (
          SELECT event_id,
                 CASE WHEN user_id % 10 < 7 THEN 'hot'
                      ELSE 'u' || CAST(user_id AS VARCHAR) END AS grp,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                 user_id
          FROM events
        ), dim AS (
          SELECT grp, MIN(user_id) AS grp_owner FROM fact GROUP BY grp
        )
        SELECT f.grp, d.grp_owner, COUNT(*) AS n_events,
               CAST(SUM(f.cents) AS BIGINT) AS total_cents
        FROM fact f JOIN dim d ON f.grp = d.grp
        GROUP BY 1, 2
    """


def partition_pruned_rollup(spark, events_path: str, work_dir: str):
    """DYNAMIC PARTITION PRUNING demo — the time-partitioned-fact layout
    every 100 TB event store uses: the fact table is written
    ``PARTITIONED BY (day)`` (one directory per day; at scale, per
    hour), the dim side is a SELECTIVE set of days only known at
    runtime, and Spark's DPP turns the dim into a runtime partition
    filter on the fact scan — directories for unselected days are never
    listed or read (pytest asserts ``dynamicpruning`` in the plan).
    The partitioned copy is built once and cached under ``work_dir``
    (atomic rename, concurrent-builder safe).  The day sum is integer
    cents (floor(value*100) summed as BIGINT) so the aggregate is
    order-independent and bit-equal across engines."""
    import os
    import uuid

    from pyspark.sql import functions as F

    if not os.path.isdir(work_dir):
        tmp = f"{work_dir}.tmp-{uuid.uuid4().hex[:8]}"
        (
            spark.read.parquet(events_path)
            .withColumn("day", F.to_date("ts"))
            .write.partitionBy("day")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, work_dir)
        except OSError:  # lost the race: another builder already published
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    fact = spark.read.parquet(work_dir)
    dim = (
        spark.read.parquet(events_path)
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .filter(F.dayofmonth("day") % 7 == 3)
    )
    return (
        fact.join(dim, "day")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents_sum"),
        )
    )


def profile_table(df: DataFrame, columns: list | None = None) -> DataFrame:
    """ANALYZE-style one-pass column profiler (the warehouse ``ANALYZE
    TABLE`` / data-quality-report shape): for every requested column emit
    (column, n_rows, n_nonnull, n_distinct, min_s, max_s) — null-aware
    counts, EXACT distinct, and min/max serialized as strings so one
    long-format result covers heterogeneous column types.

    Plan: ONE aggregate over one scan computes every metric (a single
    partial+final HashAggregate — the scan is shared, not repeated per
    column); the wide 1-row result is then unpivoted driver-side into
    the long form, which is O(columns), never O(rows).  Exact
    ``count(distinct)`` over many columns expands the aggregate (Spark's
    expand operator, one pass per distinct column) — at 10^12 rows
    profile in column batches or swap in ``approx_count_distinct``; the
    exact form is the oracle-checkable default.  String serialization
    sticks to types both engines render identically (ints, dates,
    strings) — profile doubles with explicit rounding first."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {stack}) AS (column, n_nonnull, n_distinct, min_s, max_s)",
    ).select("column", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")
