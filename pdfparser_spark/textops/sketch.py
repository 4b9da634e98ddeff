"""Deterministic cardinality sketch + consistent sampling.

Two operators a large-scale curation pipeline leans on constantly, built
so the SAME arithmetic runs on both engines (the md5-hex fold below is
integer-exact, so even the sketch ESTIMATE is bit-identical and the
DuckDB oracle checks it as hard values, not tolerances):

  * ``kmv_distinct_shingles`` — KMV (k-minimum-values) distinct-count
    estimator (Bar-Yossef et al. 2002): hash every value to a uniform
    48-bit integer, keep the k smallest DISTINCT hashes per group, and
    estimate |D| = (k-1) / u_k where u_k is the kth smallest hash
    normalized to (0,1).  Unlike exact countDistinct — whose state is the
    whole value set — the sketch state is k numbers per group, mergeable
    by "union + keep k smallest", which is why engines ship HLL/KMV for
    10^12-row cardinality work.  (Spark's own approx_count_distinct is
    HLL++ with engine-private randomness — unverifiable cross-engine;
    KMV with an md5 hash gives the same scaling behavior AND a
    deterministic answer.)
  * ``consistent_sample`` — hash-threshold sampling: keep a row iff
    md5-fraction(doc_id) < rate.  Membership depends only on the row's
    key, never on partitioning, order, or corpus size — the property
    that makes eval holdouts stable as the corpus grows and lets two
    independent jobs agree on the sample without coordination (Spark's
    ``df.sample`` is seed+partition dependent and reshuffles membership
    when the layout changes).

At scale: the sketch is explode -> one (group, hash) distinct aggregate
(map-side combinable) -> per-group top-k window on k rows of state;
the sample is a pure filter — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TWO48 = 281474976710656.0  # 2^48 as double — the hash normalizer

KMV_K = 32


def hash48(col: Column) -> Column:
    """First 12 hex chars of md5 -> BIGINT in [0, 2^48): an explicit
    12-term positional fold (digit value x 16^pos) mirrored verbatim by
    :func:`sql_hash48`, so both engines produce the identical integer."""
    h = F.md5(col)
    out = None
    for i in range(12):
        c = F.ascii(F.substring(h, i + 1, 1))
        v = (c - F.when(c < 58, F.lit(48)).otherwise(F.lit(87))).cast("long")
        term = v * F.lit(16 ** (11 - i)).cast("long")
        out = term if out is None else out + term
    return out


def sql_hash48(expr: str) -> str:
    """The DuckDB mirror of :func:`hash48` (same md5, same 12-term fold)."""
    terms = []
    for i in range(12):
        c = f"ascii(substr(md5({expr}), {i + 1}, 1))"
        terms.append(
            f"CAST(({c} - CASE WHEN {c} < 58 THEN 48 ELSE 87 END) AS BIGINT)"
            f" * {16 ** (11 - i)}"
        )
    return "(" + " + ".join(terms) + ")"


def kmv_distinct_shingles(documents: DataFrame, k: int = KMV_K) -> DataFrame:
    """(lang, est_distinct_shingles): KMV estimate of the distinct
    3-gram-shingle count per language (thousands per language on the test
    corpus, so the estimator branch genuinely runs).  Groups with fewer
    than k distinct hashes report the exact count (the sketch IS exact
    below k — standard KMV behavior).  The estimate double is computed in
    one operand order ((k-1) / (hash / 2^48)) on both engines, so the
    oracle compares exactly."""
    from .dedup import shingles_expr

    sh = documents.select("lang", F.explode(shingles_expr()).alias("sh"))
    hashed = sh.select("lang", hash48(F.col("sh")).alias("hv")).distinct()
    w = Window.partitionBy("lang").orderBy("hv")
    ranked = hashed.select(
        "lang",
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") == F.least(F.lit(k), F.col("n")))
        .select(
            "lang",
            F.when(
                F.col("n") >= k,
                F.lit(float(k - 1)) / (F.col("hv").cast("double") / F.lit(TWO48)),
            )
            .otherwise(F.col("n").cast("double"))
            .alias("est_distinct_shingles"),
        )
    )


def doclen_histogram(documents: DataFrame) -> DataFrame:
    """(lang, n_docs, n_buckets, p50_bucket, p50_hi, p95_bucket): power-of-
    two histogram sketch of document length with quantiles read off the
    cumulative counts — the streaming-friendly stand-in for exact
    percentile_approx whose t-digest state is engine-private randomness.

    Bucket = bit-length of n_chars (``len(bin(n))`` on both engines — no
    floating log2, so boundaries are integer-exact); the p-th quantile is
    the smallest bucket whose cumulative count covers p of the total,
    stated integer-exactly (cum*2 >= total for p50, cum*20 >= 19*total
    for p95).  ``p50_hi`` is the bucket's inclusive upper bound 2^b - 1.

    Scale: corpus -> one tiny (lang, bucket) aggregate (map-side
    combinable, <=64 rows per group); every window/join below runs on
    that sketch table only — mergeable state, like HLL for quantiles."""
    b = documents.select("lang", F.length(F.bin(F.col("n_chars"))).cast("int").alias("bucket"))
    hist = b.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("n"))
    cum = F.sum("n").over(Window.partitionBy("lang").orderBy("bucket"))
    total = F.sum("n").over(Window.partitionBy("lang"))
    cd = hist.select("lang", "bucket", cum.alias("cum"), total.alias("total"))
    p50 = (
        cd.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("lang")
        .agg(F.min("bucket").alias("p50_bucket"))
    )
    p95 = (
        cd.filter(F.col("cum") * 20 >= F.col("total") * 19)
        .groupBy("lang")
        .agg(F.min("bucket").alias("p95_bucket"))
    )
    totals = hist.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    return (
        totals.join(p50, "lang")
        .join(p95, "lang")
        .select(
            "lang",
            "n_docs",
            "n_buckets",
            "p50_bucket",
            # column-valued shift amount needs the SQL form (the Python
            # wrapper only takes an int literal)
            (F.expr("shiftleft(CAST(1 AS BIGINT), p50_bucket)") - 1).alias("p50_hi"),
            "p95_bucket",
        )
    )


def stratified_sample(documents: DataFrame, per_group: int = 20) -> DataFrame:
    """(doc_id, lang): a deterministic FIXED-SIZE sample per language — the
    ``per_group`` smallest md5 hashes of each stratum.  Complements
    :func:`consistent_sample` (fixed RATE): eval sets usually need "exactly
    k per language" regardless of stratum skew.  Same consistency
    property: a document's inclusion can change only when smaller-hash
    documents enter its stratum, so the sample drifts minimally as the
    corpus grows (vs orderBy(rand()) resampling everything).

    One shuffle on lang; the rank limit compiles to WindowGroupLimit, so
    only ~per_group rows per partition cross the exchange."""
    u = hash48(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        documents.select("doc_id", "lang", u.alias("hv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_group)
        .select("doc_id", "lang")
    )


def consistent_sample(documents: DataFrame, rate: float = 0.125) -> DataFrame:
    """(doc_id, lang, sample_u): the deterministic hash-threshold sample —
    rows whose md5-fraction of ``'sample:' || doc_id`` falls below
    ``rate``.  A pure filter: no shuffle, no state, stable under corpus
    growth and any partitioning."""
    u = hash48(
        F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))
    ).cast("double") / F.lit(TWO48)
    return (
        documents.select("doc_id", "lang", u.alias("sample_u"))
        .filter(F.col("sample_u") < rate)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
CMS_TOPK = 20


def _token_counts(documents: DataFrame) -> DataFrame:
    toks = documents.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))


def _cms_keyed(df: DataFrame, d: int, w: int) -> DataFrame:
    return df.select(
        "tok", "cnt", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("d")
    ).withColumn(
        "bucket",
        F.pmod(
            hash48(F.concat(F.col("tok"), F.lit("#cms"), F.col("d").cast("string"))),
            F.lit(w).cast("long"),
        ),
    )


def cms_incremental_heavy_hitters(
    documents: DataFrame,
    log_root: str,
    d: int = CMS_D,
    w: int = CMS_W,
    topk: int = CMS_TOPK,
) -> DataFrame:
    """Incremental frequency maintenance, the additive twin of
    :func:`hll_incremental_distinct`: each ingest batch commits its OWN
    d x w counter grid to a snapshot-log table (d*w integers, never the
    vocabulary), and the corpus grid is the element-wise SUM of all
    committed grids at read time — exactly equal to the single-pass grid
    (integer addition is associative), so the unchanged full-corpus
    oracle checks the merged estimates.  Re-runs against the same log are
    idempotent: a parity already committed (summary-tagged) is skipped,
    so the SUM can never double-count.  Demo split: even / odd doc_ids."""
    from ..snapshots import SnapshotLog

    spark = documents.sparkSession
    log = SnapshotLog(log_root)
    done = {
        s["summary"].get("cms_batch_parity")
        for s in log.chain()
        if "cms_batch_parity" in s.get("summary", {})
    }
    for parity in (0, 1):
        if parity in done:
            continue  # redelivered batch: grid already committed, never SUM twice
        batch = documents.filter(F.col("doc_id") % 2 == parity)
        grid = _cms_keyed(_token_counts(batch), d, w).groupBy("d", "bucket").agg(
            F.sum("cnt").alias("cell")
        )
        dd = log.new_data_dir("cms_grid")
        grid.write.parquet(dd)
        log.commit(
            {"cms_grid": [dd]},
            operation="append",
            summary={"cms_batch_parity": parity},
            schemas={"cms_grid": spark.read.parquet(dd).schema.json()},
        )
    merged = (
        log.read(spark, "cms_grid")
        .groupBy("d", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    counts = _token_counts(documents)
    top = counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(topk)
    return (
        _cms_keyed(top, d, w)
        .join(merged, ["d", "bucket"])
        .groupBy("tok", "cnt")
        .agg(F.min("cell").alias("est_count"))
        .select(
            F.col("tok").alias("token"),
            F.col("cnt").alias("true_count"),
            "est_count",
        )
    )


def cms_heavy_hitters(
    documents: DataFrame, d: int = CMS_D, w: int = CMS_W, topk: int = CMS_TOPK
) -> DataFrame:
    """(token, true_count, est_count): Count-Min sketch (Cormode &
    Muthukrishnan 2005) estimates for the corpus' top-k tokens, next to
    the exact counts so the one-sided error (est >= true, overcount only)
    is checkable row by row.

    The sketch is a d x w counter grid: cell(r, b) = total count of every
    token whose r-th hash lands in bucket b; a token's estimate is the
    MIN over its d cells.  State is d*w integers regardless of vocabulary
    size, and cells merge across partitions/corpora by plain addition —
    the property that makes CMS the standard frequency sketch at
    10^12-token scale, where exact per-token counts are a full shuffle of
    the vocabulary but the sketch is a bounded-size partial aggregate.
    All hashing is the shared deterministic 48-bit md5 fold
    (:func:`hash48`), so the DuckDB oracle rebuilds the identical grid
    and the ESTIMATES compare exactly, not within tolerance.

    Plan shape: one token aggregate (map-side combinable) feeds both the
    grid (d small aggregates over the vocab table) and the exact top-k
    (TakeOrderedAndProject); the probe joins k*d rows against the grid —
    nothing rescans the corpus."""
    counts = _token_counts(documents)
    sketch = _cms_keyed(counts, d, w).groupBy("d", "bucket").agg(
        F.sum("cnt").alias("cell")
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(topk)
    return (
        _cms_keyed(top, d, w)
        .join(sketch, ["d", "bucket"])
        .groupBy("tok", "cnt")
        .agg(F.min("cell").alias("est_count"))
        .select(
            F.col("tok").alias("token"),
            F.col("cnt").alias("true_count"),
            "est_count",
        )
    )


def cms_heavy_hitters_oracle_sql(
    d: int = CMS_D, w: int = CMS_W, topk: int = CMS_TOPK
) -> str:
    """DuckDB mirror: rebuilds the identical d x w grid with sql_hash48
    and compares the min-cell estimates as hard integers."""
    h = sql_hash48("tok || '#cms' || CAST(d AS VARCHAR)")
    return f"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), counts AS MATERIALIZED (
          SELECT tok, COUNT(*) AS cnt FROM toks WHERE tok != '' GROUP BY tok
        ), keyed AS (
          SELECT tok, cnt, d, {h} % {w} AS bucket
          FROM counts, LATERAL unnest(generate_series(0, {d - 1})) AS t(d)
        ), sketch AS (
          SELECT d, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
          FROM keyed GROUP BY d, bucket
        ), top AS (
          SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT {topk}
        ), probe AS (
          SELECT tok, cnt, d, {h} % {w} AS bucket
          FROM top, LATERAL unnest(generate_series(0, {d - 1})) AS t(d)
        )
        SELECT p.tok AS token, p.cnt AS true_count,
               CAST(MIN(s.cell) AS BIGINT) AS est_count
        FROM probe p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
        GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# HyperLogLog distinct count
# ---------------------------------------------------------------------------

HLL_P = 8  # register-index bits
HLL_M = 1 << HLL_P  # 256 registers
HLL_WBITS = 40  # rank window: the 40 hash bits below the index


def hll_distinct_shingles(documents: DataFrame) -> DataFrame:
    """(lang, exact_distinct, n_zero_registers, est_distinct): HyperLogLog
    (Flajolet et al. 2007) distinct-shingle estimate per language, next
    to the exact count so the ~1.04/sqrt(m) error is checkable.

    The sketch state is m=256 registers per group, register j = max over
    its values of (leading-zero rank of the hash suffix) — mergeable by
    elementwise MAX, which is why HLL is the industry cardinality sketch
    at 10^12 rows: the full-value distinct set never shuffles, only the
    register grid does (a map-side-combinable max aggregate).  Spark's
    own approx_count_distinct IS HLL++ but with engine-private
    randomness; this one is built on the shared 48-bit md5 fold so the
    DuckDB oracle rebuilds the identical registers and the ESTIMATE
    compares bit-exactly:

      * rank = 41 - bit_length(hash mod 2^40) — `length(bin(w))` on both
        engines, no floating log2;
      * the harmonic sum adds reciprocal powers of two spanning < 53
        bits, so every partial sum is exact in a double → order- and
        partitioning-independent;
      * alpha_m and the final multiply/divide are written in ONE operand
        order on both sides.

    The small-range linear-counting correction (est <= 2.5m with empty
    registers) is deliberately omitted — ln() is not bit-portable across
    engines — and pytest asserts the corpus sits outside that regime
    (thousands of shingles per language vs the 640 cutoff)."""
    regs = hll_registers(documents)
    return _hll_report(regs, documents)


def hll_registers(documents: DataFrame) -> DataFrame:
    """The sketch state itself: (lang, idx, m_rank) — <= 256 rows per
    language regardless of corpus size, mergeable by elementwise MAX."""
    from .dedup import shingles_expr

    sh = documents.select("lang", F.explode(shingles_expr()).alias("sh"))
    h = hash48(F.col("sh"))
    w = F.pmod(h, F.lit(1 << HLL_WBITS).cast("long"))
    ranked = sh.select(
        "lang",
        F.shiftright(h, HLL_WBITS).alias("idx"),
        F.when(w == 0, F.lit(HLL_WBITS + 1))
        .otherwise(F.lit(HLL_WBITS + 1) - F.length(F.bin(w)))
        .cast("int")
        .alias("rank"),
    )
    return ranked.groupBy("lang", "idx").agg(F.max("rank").alias("m_rank"))


def _hll_report(regs: DataFrame, documents: DataFrame) -> DataFrame:
    """Fold a register table (possibly a MAX-merge of several) into the
    per-lang estimate, next to the exact count from ``documents``."""
    from .dedup import shingles_expr

    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    per_lang = regs.groupBy("lang").agg(
        (
            F.sum(
                F.lit(1.0)
                / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), m_rank) AS DOUBLE)")
            )
            + (F.lit(HLL_M) - F.count(F.lit(1))).cast("double")
        ).alias("s_harm"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("n_zero_registers"),
    )
    exact = documents.select("lang", F.explode(shingles_expr()).alias("sh")).groupBy(
        "lang"
    ).agg(F.countDistinct("sh").alias("exact_distinct"))
    return (
        per_lang.join(exact, "lang")
        .select(
            "lang",
            "exact_distinct",
            "n_zero_registers",
            (alpha * F.lit(float(HLL_M * HLL_M)) / F.col("s_harm")).alias(
                "est_distinct"
            ),
        )
    )


def hll_incremental_distinct(documents: DataFrame, log_root: str) -> DataFrame:
    """Incremental cardinality maintenance: each ingest batch commits its
    OWN 256-register grid to a snapshot-log table (tiny — the registers,
    never the values), and the corpus-wide estimate is read back as an
    elementwise MAX-merge of all committed grids.  No batch is ever
    re-shingled, yet the merged estimate is BIT-IDENTICAL to the
    single-pass sketch over the full corpus (max is associative; the
    harmonic fold's reciprocal powers of two are <53-bit exact, so
    summation order cannot change the double) — which is exactly why the
    oracle is the unchanged full-corpus HLL SQL.

    Demo split mirrors the other incremental ops: batch 1 = even doc_ids,
    batch 2 = odd."""
    from ..snapshots import SnapshotLog

    spark = documents.sparkSession
    log = SnapshotLog(log_root)
    done = {
        s["summary"].get("hll_batch_parity")
        for s in log.chain()
        if "hll_batch_parity" in s.get("summary", {})
    }
    for parity in (0, 1):
        if parity in done:
            # redelivered batch: MAX-merge would tolerate a duplicate grid,
            # but skipping keeps the chain length = batches ingested
            continue
        batch = documents.filter(F.col("doc_id") % 2 == parity)
        d = log.new_data_dir("hll_regs")
        hll_registers(batch).write.parquet(d)
        log.commit(
            {"hll_regs": [d]},
            operation="append",
            summary={"hll_batch_parity": parity},
            schemas={"hll_regs": spark.read.parquet(d).schema.json()},
        )
    merged = (
        log.read(spark, "hll_regs")
        .groupBy("lang", "idx")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    return _hll_report(merged, documents)


def hll_distinct_shingles_oracle_sql() -> str:
    """DuckDB mirror: identical registers from sql_hash48, identical
    operand order for the harmonic sum and the final estimate."""
    two_w = 1 << HLL_WBITS
    return f"""
        WITH w AS (
          SELECT lang, string_split(text, ' ') AS w FROM documents
        ), shingled AS (
          SELECT lang, array_to_string(w[i : i+2], ' ') AS sh
          FROM w, LATERAL unnest(generate_series(1, GREATEST(len(w) - 2, 1))) AS t(i)
          WHERE len(w) >= 3
        ), hv AS (
          SELECT lang, sh, {sql_hash48("sh")} AS hv FROM shingled
        ), ranked AS (
          SELECT lang, hv // {two_w} AS idx,
                 CASE WHEN hv % {two_w} = 0 THEN {HLL_WBITS + 1}
                      ELSE {HLL_WBITS + 1} - length(bin(hv % {two_w})) END AS rank
          FROM hv
        ), regs AS (
          SELECT lang, idx, MAX(rank) AS m_rank FROM ranked GROUP BY 1, 2
        ), per_lang AS (
          SELECT lang,
                 SUM(1.0 / CAST(CAST(1 AS BIGINT) << m_rank AS DOUBLE))
                   + CAST({HLL_M} - COUNT(*) AS DOUBLE) AS s_harm,
                 CAST({HLL_M} - COUNT(*) AS BIGINT) AS n_zero_registers
          FROM regs GROUP BY 1
        ), exact AS (
          SELECT lang, COUNT(DISTINCT sh) AS exact_distinct FROM hv GROUP BY 1
        )
        SELECT p.lang, e.exact_distinct, p.n_zero_registers,
               (0.7213 / (1.0 + 1.079 / {float(HLL_M)})) * {float(HLL_M * HLL_M)}
                 / p.s_harm AS est_distinct
        FROM per_lang p JOIN exact e ON e.lang = p.lang
    """


def corpus_drift(documents: DataFrame) -> DataFrame:
    """Distribution-drift monitor between two ingest slices (the
    yesterday/today check a production pipeline alerts on): per-language
    power-of-two length histograms of the even-doc_id slice (reference)
    vs the odd slice (candidate), compared bucket by bucket in PER-MILLE
    INTEGER shares — drift_num = sum((p_i - q_i)^2) over buckets, where
    p_i = floor(1000 * n_i / N).  Integer arithmetic end to end: no
    ln/log-ratio doubles to diverge between engines, and shares are
    normalized so the statistic is scale-free (works unchanged when one
    day is 100x the other).  Output: one row per (lang) with both totals
    and the drift numerator; downstream alerting thresholds it.

    Scale: corpus -> one (lang, slice, bucket) aggregate (map-side
    combinable, <=64 buckets x 2 slices per lang); everything after runs
    on that sketch table."""
    b = documents.select(
        "lang",
        (F.col("doc_id") % 2).alias("slice"),
        F.length(F.bin(F.col("n_chars"))).cast("int").alias("bucket"),
    )
    hist = b.groupBy("lang", "slice", "bucket").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("lang", "slice"))
    shares = hist.select(
        "lang",
        "slice",
        "bucket",
        F.floor(F.col("n") * 1000 / tot).cast("long").alias("pm"),
        F.col("n"),
    )
    ref = shares.filter(F.col("slice") == 0).select(
        "lang", "bucket", F.col("pm").alias("p"), F.col("n").alias("n_ref")
    )
    cand = shares.filter(F.col("slice") == 1).select(
        "lang", "bucket", F.col("pm").alias("q"), F.col("n").alias("n_cand")
    )
    joined = ref.join(cand, ["lang", "bucket"], "full_outer").select(
        "lang",
        F.coalesce("p", F.lit(0)).alias("p"),
        F.coalesce("q", F.lit(0)).alias("q"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
    )
    return joined.groupBy("lang").agg(
        F.sum("n_ref").alias("ref_docs"),
        F.sum("n_cand").alias("cand_docs"),
        F.sum((F.col("p") - F.col("q")) * (F.col("p") - F.col("q"))).alias(
            "drift_num"
        ),
    )
