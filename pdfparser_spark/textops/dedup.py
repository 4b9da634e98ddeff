"""Deduplication operators: exact, MinHash-LSH, n-gram Jaccard, SimHash.

Design notes for 100 TB scale:
  * exact dedup is a single hash aggregation with map-side partial combine —
    the cheapest possible shuffle (one md5 per doc, 16 bytes per key);
  * MinHash-LSH: shingle -> k md5-keyed min-hashes -> banded signatures;
    candidate pairs come from a self-equi-join on (band_idx, band_hash),
    which Spark executes as a shuffled hash join keyed by tiny hashes —
    never an O(n^2) cross join.  Lexicographic MIN over fixed-width md5 hex
    strings equals numeric min, so signatures stay portable strings (the
    DuckDB oracle computes the identical value);
  * SimHash: 16-bit sign-aggregated fingerprint, computed with explode +
    conditional sums (pure JVM expressions);
  * n-gram Jaccard uses array_intersect/array_union on distinct shingle
    sets — exact verification for near-dup candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import ann
from ..cache import register_persisted
from ..rounding import r4 as _r4  # engine-portable half-up (one shared def)

MINHASH_K = 8
LSH_BANDS = 4  # 2 rows per band
EMB_PLANES = 8  # hyperplane signs for embedding near-dup banding
EMB_BANDS = 4  # OR-amplification: candidate iff ANY 2-bit band matches
# Bucket-size guard for the LSH self-joins: a real crawl's boilerplate /
# mirror clusters can put thousands of docs into ONE (band_idx, band_hash)
# bucket, and a plain self-equi-join then EMITS O(m^2) pairs — output
# volume AQE skew-splitting cannot reduce.  Buckets larger than the cap
# are routed through a star topology instead (every member pairs with the
# bucket's min-id representative): O(m) edges, same connected components,
# so downstream clustering is unchanged while the blowup is bounded.
# The cap is far above the synthetic oracle corpora's max bucket size
# (verified in tests), so gate results are identical.
LSH_BUCKET_CAP = 64
# The embedding sign-LSH path needs its own (much larger) default: with
# EMB_PLANES/EMB_BANDS = 8/4 the band key is 2 bits, so bucket size is
# Θ(n/4) BY CONSTRUCTION — not a duplicate pathology.  Production sizing
# couples the two knobs: pick bits-per-band ≈ log2(n / cap) via the
# n_planes/n_bands parameters so benign buckets stay under the cap, and
# the cap then only fires on genuine "everything matches everything"
# degenerate clusters (which the star path summarizes).
EMB_BUCKET_CAP = 4096


def _capped_bucket_pairs(
    rows: DataFrame, bucket_keys: list, id_col: str, cap: int, observe_name: str
) -> DataFrame:
    """Self-join on ``bucket_keys`` with the oversize-bucket guard.

    One window pass over the bucket key (the SAME shuffle key as the join)
    computes each bucket's size and min-id representative; buckets <= cap
    take the normal self-equi-join (bounded at cap^2 pairs per bucket),
    larger ones emit only representative->member star edges.  An
    ``observe`` metric (rows in oversize buckets + oversize bucket count)
    surfaces what was capped in the Spark UI / event log — no silent
    truncation; ``lsh_bucket_stats`` is the queryable version.
    Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    w = Window.partitionBy(*bucket_keys)
    sized = register_persisted(
        rows.withColumn("bsz", F.count(F.lit(1)).over(w))
        .withColumn("rep", F.min(id_col).over(w))
        .persist()
    )
    sized = sized.observe(
        observe_name,
        F.sum(F.when(F.col("bsz") > cap, 1).otherwise(0)).alias("oversize_rows"),
        # one representative row per bucket -> a DISTINCT-free bucket count
        # (observe() rejects distinct aggregates)
        F.sum(
            F.when((F.col("bsz") > cap) & (F.col(id_col) == F.col("rep")), 1).otherwise(0)
        ).alias("oversize_buckets"),
    )
    small = sized.filter(F.col("bsz") <= cap)
    a = small.alias("a")
    b = small.alias("b")
    joined = (
        a.join(b, on=[str(k) for k in bucket_keys], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
    )
    star = (
        sized.filter((F.col("bsz") > cap) & (F.col(id_col) != F.col("rep")))
        .select(F.col("rep").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )
    return joined.union(star).distinct()


def lsh_bucket_stats(documents: DataFrame, cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Per-bucket population of the MinHash LSH index with the capped flag —
    the queryable 'what got routed through the representative path' log."""
    return (
        minhash_signatures(documents)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .withColumn("capped", F.col("bucket_size") > cap)
    )


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def shingles_expr(col: str = "text", n: int = 3):
    """Distinct word n-gram shingles as an array<string> (JVM-side)."""
    w = _words(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
    return F.array_distinct(F.when(F.size(w) >= n, sh).otherwise(F.array()))


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text."""
    return (
        documents.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def duplicate_ngram_spans(documents: DataFrame, n: int = 8) -> DataFrame:
    """Exact-substring dedup signal (C4 / The-Pile style, public): word
    n-gram windows that recur across >= 2 DISTINCT documents — the spans a
    cross-document substring-dedup pass would cut.  Emits (gram_md5,
    n_docs, min_doc_id).

    Plan: window explode (~n_words rows/doc, the same cost class as the
    MinHash shingle explode), per-doc DISTINCT folded into the gram
    aggregate, one (gram_md5) hash aggregation with map-side combine —
    no joins, no driver state; 100 TB-safe because the 16-byte gram hash
    is the only shuffle key."""
    w = F.split(F.col("text"), " ")
    # guarded window expression (shingles_expr's shape): short docs yield
    # an empty array rather than relying on predicate pushdown to keep a
    # negative-length sequence from ever evaluating
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
    windows = F.when(
        F.size(w) >= n,
        F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + 1, n)))),
    ).otherwise(F.array().cast("array<string>"))
    grams = documents.select("doc_id", F.explode(windows).alias("gram_md5"))
    return (
        grams.distinct()  # a doc repeating its own gram counts once
        .groupBy("gram_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") >= 2)
    )


def boilerplate_line_filter(spans_flat: DataFrame, min_df: int = 2) -> DataFrame:
    """Cross-document LINE dedup (CCNet's paragraph-hash dedup, Wenzek et
    al. 2020, public — the standard boilerplate strip for crawled text):
    a line whose exact text recurs in >= ``min_df`` DISTINCT documents is
    boilerplate (navigation, footers, cookie banners) and is dropped from
    ALL of them; document-unique lines survive.  Runs over the extraction
    kernel's output — the spans ARE the lines — so the pass chains parse
    and curation in one plan.  Emits the surviving (doc_id, ord, text)
    rows.

    Plan (100 TB shape): per-doc-distinct line hashes -> ONE (line_md5)
    hash aggregate with map-side combine for the document frequencies
    (16-byte shuffle key, uniform), then an equi-join of the line table
    against the under-threshold keys — no broadcast needed (the frequency
    table is corpus-scale), no O(n^2) pairs, AQE handles residual skew."""
    lines = spans_flat.filter(F.col("kind") == "text").select(
        "doc_id", "ord", "text", F.md5(F.col("text")).alias("line_md5")
    )
    dfreq = (
        lines.select("doc_id", "line_md5")
        .distinct()  # a doc repeating its own line counts once
        .groupBy("line_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        lines.join(dfreq.filter(F.col("n_docs") < min_df), "line_md5")
        .select("doc_id", "ord", "text")
    )


def remove_duplicate_spans(documents: DataFrame, n: int = 8) -> DataFrame:
    """Exact-substring dedup REMOVAL (the cut pass of Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", public):
    every word n-gram window that recurs in >= 2 distinct documents is
    removed from ALL of them; the surviving tokens keep their order.
    Emits (doc_id, n_tokens, n_removed, cleaned_md5) for every document.

    Plan (100 TB shape): window explode -> one (gram_md5) aggregate over
    per-doc-distinct grams (16-byte shuffle key, map-side combine) for the
    duplicate set; covered token positions come from an equi-join of the
    window table against that set (gram_md5-keyed, no broadcast needed —
    the dup set can be corpus-scale); the rebuild is a doc_id-keyed
    anti-join + one sort_array(collect_list) aggregate — the same
    single-shuffle reassembly as stages/assemble.py."""
    w = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
    windows = F.when(
        F.size(w) >= n,
        F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("start"),
                F.md5(F.concat_ws(" ", F.slice(w, i + 1, n))).alias("gram_md5"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,gram_md5:string>>"))
    grams = register_persisted(
        documents.select("doc_id", F.explode(windows).alias("g"))
        .select("doc_id", "g.start", "g.gram_md5")
        .persist()
    )
    dup = (
        grams.select("doc_id", "gram_md5")
        .distinct()
        .groupBy("gram_md5")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram_md5")
    )
    covered = (
        grams.join(dup, "gram_md5")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("pos"),
        )
        .distinct()
    )
    pos = documents.select("doc_id", F.posexplode(w).alias("pos", "word"))
    kept = pos.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "word"))),
                lambda s: s.word,
            ),
        ).alias("cleaned"),
    )
    return (
        documents.select("doc_id", F.size(w).alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.md5(F.coalesce(F.col("cleaned"), F.lit(""))).alias("cleaned_md5"),
        )
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash): banded MinHash signature rows.

    The 8 per-shingle hash values are disjoint 8-hex-char (32-bit) slices
    of md5(sh) || md5('x' || sh) — TWO md5 calls per shingle instead of
    eight (the md5 compute dominated the signature build: 4x fewer hashes
    cut the cold build from ~7.4s to ~2s at sf0.1).  Slices of one md5 are
    independent uniform bits, so each slice is a valid minhash family
    member; lexicographic MIN over fixed-width hex equals numeric min, so
    signatures stay portable strings (the DuckDB oracle computes the
    identical value).  minhash_k(doc) = MIN over shingles of slice_k;
    band_b = md5(mh_{2b} || mh_{2b+1}).
    """
    sh = documents.select("doc_id", F.explode(shingles_expr()).alias("sh"))
    h = F.concat(F.md5(F.col("sh")), F.md5(F.concat(F.lit("x"), F.col("sh"))))
    hashed = sh.select("doc_id", h.alias("h"))
    aggs = [
        F.min(F.substring("h", 8 * k + 1, 8)).alias(f"mh{k}") for k in range(MINHASH_K)
    ]
    sigs = hashed.groupBy("doc_id").agg(*aggs)
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))).alias("band_hash"),
        )
        for b in range(LSH_BANDS)
    ]
    return (
        sigs.select("doc_id", F.explode(F.array(*bands)).alias("band"))
        .select("doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))
    )


def lsh_candidate_pairs(documents: DataFrame, bucket_cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Near-dup candidates: docs sharing any LSH band bucket.

    The windowed signature table is persisted so the self-join's two sides
    share one computation (the signature build — shingle explode + 8
    MinHash aggs — is ~10x the join cost; at cluster scale this is a
    checkpointed table).  Oversize buckets (> bucket_cap members — mirror /
    boilerplate mega-clusters) are routed through the star-representative
    path instead of the quadratic self-join; see ``_capped_bucket_pairs``.
    """
    return _capped_bucket_pairs(
        minhash_signatures(documents),
        ["band_idx", "band_hash"],
        "doc_id",
        bucket_cap,
        "lsh_bucket_cap",
    )


def ngram_jaccard_neighbors(documents: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for adjacent doc_id pairs — the dense
    verification kernel LSH candidates would be fed through (adjacent pairs
    keep the check dense on a corpus with no organic dups)."""
    sh = documents.select("doc_id", shingles_expr().alias("sh"))
    a = sh.alias("a")
    b = sh.select((F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_b")).alias("b")
    return (
        a.join(b, on="doc_id", how="inner")
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
            _r4(
                F.size(F.array_intersect("sh", "sh_b"))
                / F.size(F.array_union("sh", "sh_b"))
            ).alias("jaccard"),
        )
    )


def embedding_lsh_bands(embeddings: DataFrame, n_planes: int = EMB_PLANES, n_bands: int = EMB_BANDS) -> DataFrame:
    """(vec_id, band_idx, band_key) — hyperplane sign bits grouped into
    bands (OR-amplification, same construction as the MinHash bands): two
    vectors are near-dup *candidates* iff any band's bit pattern matches.
    Sign bits come from ``ann.plane_signs`` (deterministic md5-derived
    planes, no driver action, dimension-agnostic)."""
    return ann.lsh_band_keys(embeddings, n_planes, n_bands)


def embedding_neardup(
    embeddings: DataFrame, tau: float = 0.35, bucket_cap: int = EMB_BUCKET_CAP
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos_sim) with
    cosine >= tau, vec_a < vec_b — the LSH-BUCKETED plan: candidates come
    from a self-equi-join on (band_idx, band_key) hyperplane-sign bands
    (never all-pairs; at 100 TB the band join is the only shuffle and bounds
    the candidate fan-out), then the exact cosine predicate runs per
    candidate.  ``embedding_neardup_allpairs`` is the exact baseline the
    recall test (tests/test_textops.py) compares against.

    The filter applies tau to the UNROUNDED cosine and the output rounds
    with the portable floor form, both mirrored exactly in the DuckDB
    oracle (identical operand order -> bit-identical doubles).

    Buckets over ``bucket_cap`` degrade to representative->member star
    candidates (see ``EMB_BUCKET_CAP`` note on sizing band bits vs cap):
    a documented approximation that bounds the join output on degenerate
    all-similar clusters; below the cap results are exact.
    """
    pairs = _capped_bucket_pairs(
        embedding_lsh_bands(embeddings),
        ["band_idx", "band_key"],
        "vec_id",
        bucket_cap,
        "emb_bucket_cap",
    ).select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
    va = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    vb = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = ann.cosine_expr(F.col("ea"), F.col("eb"))
    return (
        pairs.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= tau)
        .select("vec_a", "vec_b", _r4(F.col("cos_raw")).alias("cos_sim"))
    )


def embedding_neardup_allpairs(embeddings: DataFrame, tau: float = 0.35) -> DataFrame:
    """Exact all-pairs baseline (O(n^2) — small-n oracle/recall reference
    only; the registered operator is the bucketed ``embedding_neardup``)."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = ann.cosine_expr(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= tau)
        .select("vec_a", "vec_b", _r4(F.col("cos_raw")).alias("cos_sim"))
    )


def lsh_verified_dups(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """The standard two-stage near-dup pipeline: cheap LSH candidate
    generation, then EXACT shingle-set Jaccard on the candidates only —
    verification cost scales with candidate count, not corpus^2.  Returns
    (doc_a, doc_b, jaccard) for candidates with jaccard >= threshold."""
    pairs = lsh_candidate_pairs(documents)
    sh = documents.select("doc_id", shingles_expr().alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b"))
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_containment(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Asymmetric near-dup detection: exact shingle-set CONTAINMENT
    c(A in B) = |A intersect B| / |A| on the LSH candidates — the check
    that catches a SHORT document embedded in a LONG one (quoted posts,
    boilerplate inclusion, page-in-site), where symmetric Jaccard is
    bounded by |A|/|B| and silently stays under any useful threshold.
    Returns (doc_a, doc_b, cont_a_in_b, cont_b_in_a) for candidates whose
    larger direction clears ``threshold``.

    Same scale shape as lsh_verified_dups: candidate generation is the
    capped band join, exact set arithmetic runs on candidates only."""
    pairs = lsh_candidate_pairs(documents)
    sh = documents.select("doc_id", shingles_expr().alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))

    def r4c(x):
        return F.floor(x * 10000.0 + 0.5) / 10000.0

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            r4c(inter / F.size("sh_a")).alias("cont_a_in_b"),
            r4c(inter / F.size("sh_b")).alias("cont_b_in_a"),
        )
        .filter(F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold)
    )


def incremental_lsh_dedup(
    documents: DataFrame,
    log_root: str,
    threshold: float = 0.8,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Continuous-crawl near-dup dedup against a PERSISTED MinHash index.

    The historical corpus's banded signatures live in a snapshot-log table
    (``minhash_index``); each arriving batch computes signatures ONLY for
    its own documents, probes the index with one equi-join on the band
    key, verifies exact Jaccard on the candidates, and appends its own
    signatures as the next snapshot so the following batch probes
    old+new.  Steady-state cost is O(batch + candidates) — the historical
    corpus is never re-shingled; only candidate docs' shingle sets are
    (re)built for verification, which scales with candidate count.

    Demo split mirrors ``snapshots.extract_increment``: batch 1 = even
    doc_ids (indexed first), batch 2 = odd doc_ids (the arriving delta).
    Returns verified (doc_a, doc_b, jaccard) pairs touching >= 1 new doc
    — exactly the full-corpus ``lsh_verified_dups`` restricted to pairs
    with an odd member (the oracle states it that way).
    """
    from ..snapshots import SnapshotLog, _dir_stats

    spark = documents.sparkSession
    log = SnapshotLog(log_root)

    def _commit_sigs(sigs: DataFrame, summary_key: str) -> None:
        d = log.new_data_dir("minhash_index")
        sigs.write.parquet(d)
        back = spark.read.parquet(d)
        n, st = _dir_stats(back)
        log.commit(
            {"minhash_index": [d]},
            operation="append",
            summary={summary_key: n},
            schemas={"minhash_index": back.schema.json()},
            stats={"minhash_index": {d: st}},
        )

    if log.head_id() is None:  # bootstrap: index the historical corpus once
        _commit_sigs(
            minhash_signatures(documents.filter(F.col("doc_id") % 2 == 0)),
            "bootstrap_rows",
        )

    index = log.read(spark, "minhash_index")
    # at-least-once batch delivery: docs ALREADY in the index are not new
    # (same anti-join shape as snapshots.extract_increment; the seen side
    # is a column-pruned scan of the index) — a redelivered batch is a
    # no-op, never a self-pair factory
    seen = index.select("doc_id").distinct()
    batch = documents.filter(F.col("doc_id") % 2 == 1).join(seen, "doc_id", "left_anti")
    delta = register_persisted(minhash_signatures(batch).persist())
    if delta.limit(1).isEmpty():
        return (
            spark.createDataFrame([], "doc_a long, doc_b long, jaccard double")
        )
    # new-vs-old candidates: ONE probe join against the index, with the
    # SAME oversize-bucket guard as the self-join paths — a hot historical
    # bucket (B index docs x b delta docs) would otherwise emit B*b pairs;
    # over the cap, delta docs pair only with the bucket's min-id
    # representative (star topology, components preserved).  The index
    # side pre-aggregates to (bucket, size, rep) + its small-bucket rows.
    idx_stats = index.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("isz"), F.min("doc_id").alias("irep")
    )
    idx_stats = idx_stats.observe(
        "incr_probe_cap",
        F.sum(F.when(F.col("isz") > bucket_cap, 1).otherwise(0)).alias(
            "oversize_index_buckets"
        ),
    )
    small_idx = index.join(
        idx_stats.filter(F.col("isz") <= bucket_cap).select("band_idx", "band_hash"),
        ["band_idx", "band_hash"],
    )
    probe_small = (
        delta.alias("n")
        .join(small_idx.alias("o"), on=["band_idx", "band_hash"])
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_b"),
        )
    )
    probe_big = (
        delta.join(
            idx_stats.filter(F.col("isz") > bucket_cap), ["band_idx", "band_hash"]
        )
        .select(
            F.least(F.col("doc_id"), F.col("irep")).alias("doc_a"),
            F.greatest(F.col("doc_id"), F.col("irep")).alias("doc_b"),
        )
    )
    new_old = probe_small.union(probe_big)
    # new-vs-new: the capped self-join, within the delta only
    new_new = _capped_bucket_pairs(
        delta, ["band_idx", "band_hash"], "doc_id", bucket_cap, "incr_lsh_cap"
    )
    pairs = new_old.union(new_new).distinct()

    # exact-Jaccard verification on CANDIDATE docs only: semi-join the
    # corpus down to the pair members before shingling, so steady-state
    # cost stays O(batch + candidates) — the history is never re-shingled
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = documents.join(cand_ids, "doc_id", "left_semi")
    sh = cand_docs.select("doc_id", shingles_expr().alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = register_persisted(
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.floor(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b"))
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .persist()
    )
    # materialize the batch's dup report BEFORE committing the delta to
    # the index: commit-first would mean a crash between the two makes the
    # redelivered batch anti-join to empty and the report is lost forever
    verified.count()
    # append the delta's signatures: the NEXT batch probes old+new
    _commit_sigs(delta, "delta_rows")
    return verified


def dedup_clusters(documents: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over the LSH candidate-pair graph: documents
    reachable through shared band buckets form one duplicate cluster,
    labeled by the cluster's minimum doc_id.

    Iterative min-label propagation — the standard distributed
    connected-components pattern: each round every vertex takes the min of
    its own label and its neighbors' labels (one join + aggregate per
    round); converges in O(graph diameter) rounds, checked by a driver-side
    fixpoint test on a count (cheap: the label table is tiny relative to
    the corpus).  Returns (doc_id, cluster_id) for documents that appear in
    at least one candidate pair.
    """
    pairs = lsh_candidate_pairs(documents)
    edges = register_persisted(
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        ).persist()
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(edges.doc_a)
            .agg(F.min("cluster_id").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .persist()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
        if (it + 1) % 5 == 0:
            # lineage truncation (classic iterative-algorithm pitfall): the
            # plan tree otherwise grows one join+agg layer per round —
            # harmless at dup-cluster diameters (<~5) but a planner-time
            # blowup on adversarial long-chain graphs at scale
            labels = labels.localCheckpoint()
    return register_persisted(labels)


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — 16-bit sign-aggregated fingerprint as a '0'/'1'
    string (portable across engines; no 64-bit overflow semantics to match).
    Bit b is set iff sum over words of sign(md5 hex digit b's high bit) >= 0.
    """
    w = documents.select("doc_id", F.explode(_words()).alias("word"))
    w = w.withColumn("h", F.md5("word"))
    sums = [
        F.sum(
            F.when(F.substring("h", b + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = w.groupBy("doc_id").agg(*sums)
    bit_cols = [F.when(F.col(f"s{b}") >= 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)]
    return agg.select("doc_id", F.concat(*bit_cols).alias("simhash"))


def semantic_dedup(
    embeddings: DataFrame, tau: float = 0.30, n_lists: int = 8,
    cluster_cap: int = 4096,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication by
    clustering embeddings and comparing ONLY within clusters.  Each vector
    is assigned to its nearest centroid of the fixed deterministic
    codebook (the IVF assignment — `ann._list_scores`, bit-mirrored in
    SQL); a vector is dropped iff some LOWER-id vector in the same cluster
    has cosine >= tau with it ("dominated by an earlier keeper" — the
    deterministic rendering of the paper's keep-one-per-similar-group).
    tau applies to the UNROUNDED cosine on both engines.

    Emits (vec_id, list_id, kept) for every vector.

    Scale shape: the cluster equi-join bounds candidate pairs by cluster
    size (the whole point of SemDeDup — pairwise work is within-cluster
    only); the assignment is inlined in the scan project, and the
    dominated set is one distinct + one broadcast-able anti-join.  At
    10^12 rows the codebook comes from `ann.ivf_train_kmeans` and
    clusters shard the corpus.  ``cluster_cap`` is the same
    representative-star guard as `_capped_bucket_pairs`: a cluster above
    the cap compares members only against its min-id representative
    (bounding a degenerate everything-matches cluster at O(n) work
    instead of O(n²)); the window pass computing cluster sizes rides the
    SAME list_id shuffle as the pair join, so the guard adds no
    exchange.  The oracle mirrors the capped semantics exactly."""
    scores = ann._list_scores(F.col("embedding"), n_lists)
    assigned = register_persisted(
        embeddings.select(
            "vec_id",
            "embedding",
            F.array_position(scores, F.array_min(scores)).cast("int").alias("list_id"),
        )
    )
    w = Window.partitionBy("list_id")
    sized = register_persisted(
        assigned.withColumn("bsz", F.count(F.lit(1)).over(w))
        .withColumn("rep", F.min("vec_id").over(w))
        .persist()
    )
    small = sized.filter(F.col("bsz") <= cluster_cap)
    a = small.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), "list_id"
    )
    b = small.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), "list_id"
    )
    cos = ann.cosine_expr(F.col("ea"), F.col("eb"))
    dominated_small = (
        a.join(b, "list_id")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= tau)
        .select(F.col("vb").alias("vec_id"))
    )
    # oversized clusters: members vs the representative only (star)
    reps = sized.filter(
        (F.col("bsz") > cluster_cap) & (F.col("vec_id") == F.col("rep"))
    ).select("list_id", F.col("embedding").alias("ea"))
    dominated_big = (
        sized.filter((F.col("bsz") > cluster_cap) & (F.col("vec_id") != F.col("rep")))
        .select("list_id", F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
        .join(F.broadcast(reps), "list_id")
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= tau)
        .select(F.col("vb").alias("vec_id"))
    )
    dominated = dominated_small.union(dominated_big).distinct()
    return (
        sized.join(dominated.withColumn("dom", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "list_id",
            F.when(F.col("dom").isNull(), 1).otherwise(0).cast("int").alias("kept"),
        )
    )
