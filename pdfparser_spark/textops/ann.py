"""Similarity search over the embeddings table (array<float> column).

Two paths:
  * ``cosine_topk`` — exact brute force for a small query set: the query
    side is broadcast, the corpus side streams; dot products run JVM-side
    via ``F.zip_with`` + ``F.aggregate`` (no Python).  This is the
    correctness baseline the approximate path is judged against.
  * ``lsh_buckets`` / ``ann_lsh_topk`` — the 100 TB scale path: deterministic
    random-hyperplane LSH.  Plane p's coefficient for dimension d is derived
    from md5 (seeded, data-independent), each vector gets a sign-pattern
    bucket key, and candidate generation is an equi-join on the bucket —
    turning all-pairs O(n^2) into per-bucket work, the standard
    sharded-ANN layout (IVF-style: partition by bucket, search within).

Numeric discipline: every float is cast to double BEFORE multiplication,
folds run left-to-right over array order, and rounding uses the
engine-portable ``floor(x*10^4 + 0.5)/10^4`` form — so the DuckDB oracle
(identical operand order) computes bit-identical values and the hash gate
can check even the LSH path exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 8
# banded OR-amplification for the top-k path: a vector is a candidate iff
# ANY 5-bit band matches one of the query's MULTI-PROBE keys (the band
# itself plus every single-bit flip — 6 of the 32 possible keys per
# band).  Sized against the real embeddings table: recall@5 = 0.96 on
# its weakly-clustered vectors (vs 0.72 for the old 32-plane/4-bit
# single-probe), and the fan-out tightens as clustering strengthens —
# see tests/test_textops.py::test_ann_lsh_topk_recall_floor
TOPK_PLANES = 40
TOPK_BANDS = 8


from ..rounding import r4 as _r4  # engine-portable half-up (one shared def)


def _dot(a, b):
    """Left-fold dot product, doubles throughout (cast before multiply so
    the oracle's DOUBLE arithmetic sees identical operands)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for vec_id < n_queries.

    Returns (query_id, neighbor_id, cos_sim) with cos_sim floor-rounded to
    4dp; ranking uses the rounded score with neighbor_id tiebreak so the
    result is engine-portable.
    """
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _r4(cosine_expr(F.col("qv"), F.col("cv"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop("rnk")


def _plane_coeff_at(p: int, i):
    """Deterministic pseudo-random coefficient in [-0.5, 0.5) for plane p at
    runtime dimension index ``i`` (a column), via md5 char codes —
    engine-portable arithmetic, data-independent, and dimension-agnostic:
    no driver-side action is needed to learn the vector width (the old
    version ran ``.first()`` at plan-construction time)."""
    h = F.md5(F.concat(F.lit(f"plane{p}:dim"), i.cast("string")))
    mixed = (F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))) % 101
    return mixed.cast("double") / 101.0 - 0.5


def plane_signs(col, n_planes: int = N_PLANES) -> list[Column]:
    """Per-plane sign bits ('0'/'1' string columns) of the hyperplane
    projections of ``col`` (array<float>)."""
    idx = F.sequence(F.lit(0), F.size(col) - 1)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(col, idx, lambda x, i: x.cast("double") * _plane_coeff_at(p, i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return bits


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket) — sign pattern across the hyperplanes as a bit
    string.  Pure expressions over the row's own array: works for any
    (even per-row varying) dimensionality, no driver action."""
    bits = plane_signs(F.col("embedding"), n_planes)
    return embeddings.select("vec_id", F.concat(*bits).alias("bucket"))


def lsh_band_keys(
    embeddings: DataFrame, n_planes: int, n_bands: int, id_col: str = "vec_id"
) -> DataFrame:
    """(id, band_idx, band_key) — hyperplane sign bits grouped into bands
    (the OR-amplification construction, same shape as the MinHash bands):
    two vectors are candidates iff ANY band's bit pattern matches.  Shared
    by ``ann_lsh_topk`` and ``dedup.embedding_neardup``."""
    bits = plane_signs(F.col("embedding"), n_planes)
    per = n_planes // n_bands
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat(*bits[b * per : (b + 1) * per]).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return embeddings.select(F.col(id_col), F.explode(F.array(*bands)).alias("b")).select(
        id_col, F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )


def _probe_keys(key: Column, per: int) -> Column:
    """Multi-probe key set for one band: the key itself plus every
    single-bit flip.  Probing the Hamming-1 neighborhood recovers true
    neighbors that land one hyperplane away from the query's bucket —
    the standard multi-probe LSH trick (query-side only, so the corpus
    index stays one row per band)."""
    probes = [key]
    for i in range(per):
        flipped = F.when(F.substring(key, i + 1, 1) == "0", F.lit("1")).otherwise(F.lit("0"))
        probes.append(
            F.concat(F.substring(key, 1, i), flipped, F.substring(key, i + 2, per - i - 1))
        )
    return F.array(*probes)


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_planes: int = TOPK_PLANES,
    n_bands: int = TOPK_BANDS,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share ANY LSH band key with one of
    the query's multi-probe keys (banded OR-amplification + Hamming-1
    probing), then exact cosine over the candidates.  At cluster scale
    the band equi-join is the only shuffle and the bands bound the
    candidate fan-out — never all-pairs; multi-probe multiplies only the
    (broadcast) query side."""
    bands = lsh_band_keys(embeddings, n_planes, n_bands)
    per = n_planes // n_bands
    qb = bands.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "band_idx", "band_key"
    )
    if multi_probe:
        qb = qb.select(
            "query_id",
            "band_idx",
            F.explode(_probe_keys(F.col("band_key"), per)).alias("band_key"),
        )
    cb = bands.select(F.col("vec_id").alias("neighbor_id"), "band_idx", "band_key")
    cand = (
        F.broadcast(qb)
        .join(cb, on=["band_idx", "band_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _r4(cosine_expr(F.col("qv"), F.col("cv"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop("rnk")


# --- IVF (inverted-file) index ---------------------------------------------

N_LISTS = 8  # coarse-quantizer codebook size
N_PROBE = 2  # lists probed per query


def _centroid_coeff_at(j: int, i):
    """Deterministic centroid-j coefficient at runtime dimension ``i`` —
    the same md5 derivation family as ``_plane_coeff_at``, 'ivf' salt."""
    h = F.md5(F.concat(F.lit(f"ivf{j}:dim"), i.cast("string")))
    mixed = (F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))) % 101
    return mixed.cast("double") / 101.0 - 0.5


def _list_scores(col, n_lists: int = N_LISTS) -> Column:
    """array<double> of per-list assignment scores ||c_j||^2 - 2 v.c_j —
    the rank-equivalent part of the L2 distance to centroid j (||v||^2 is
    constant per vector and drops out of the argmin)."""
    idx = F.sequence(F.lit(0), F.size(col) - 1)
    scores = []
    for j in range(n_lists):
        dot = F.aggregate(
            F.zip_with(col, idx, lambda x, i: x.cast("double") * _centroid_coeff_at(j, i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        c2 = F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, i: acc + _centroid_coeff_at(j, i) * _centroid_coeff_at(j, i),
        )
        scores.append(c2 - 2.0 * dot)
    return F.array(*scores)


IVF_TRAIN_ITERS = 10  # fixed Lloyd iteration count (determinism + oracle)
_Q = 16777216.0  # 2^24: per-dim quantization for order-independent sums


def _codebook_init(dim: int, n_lists: int = N_LISTS) -> list[list[float]]:
    """Python mirror of ``_centroid_coeff_at`` (identical md5 rule and
    arithmetic) — the deterministic initial codebook Lloyd's starts from."""
    import hashlib

    cb = []
    for j in range(n_lists):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"ivf{j}:dim{d}".encode()).hexdigest()
            row.append(((ord(h[0]) * 31 + ord(h[1])) % 101) / 101.0 - 0.5)
        cb.append(row)
    return cb


def _literal_scores(col, codebook: list[list[float]]) -> Column:
    """array<double> of assignment scores ||c_j||^2 - 2 v.c_j against
    LITERAL centroid values — operand-for-operand the same arithmetic as
    ``_list_scores`` (c2 left-folded over dims, dot left-folded over the
    zipped arrays), so the DuckDB oracle reproduces every bit."""
    scores = []
    for c in codebook:
        c2 = 0.0
        for x in c:
            c2 = c2 + x * x
        arr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scores.append(F.lit(c2) - 2.0 * dot)
    return F.array(*scores)


def ivf_train_kmeans(
    embeddings: DataFrame,
    n_lists: int = N_LISTS,
    n_iters: int = IVF_TRAIN_ITERS,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embeddings table — the
    periodic training batch job that turns the fixed md5 codebook into a
    data-fitted one.  Each iteration is ONE Spark job: assign every vector
    to its nearest centroid (argmin over per-list scores, ties -> smaller
    list), then aggregate per-(list, dim) sums; only the n_lists x dim
    aggregate (the model artifact, a few KiB) is collected to the driver.

    Exactness discipline: the per-dim sums quantize each component to
    ``floor(v * 2^24)`` and sum as BIGINT — integer addition is
    order-independent, so the result is identical under ANY partitioning
    / shuffle order AND map-side combinable (a plain hash aggregate — the
    shape that scales to 10^12 rows).  Centroid = sum / (2^24 * count) in
    double, the same two operations the DuckDB oracle performs, making
    the whole training loop bit-reproducible across engines."""
    codebook: list[list[float]] | None = None
    for _ in range(n_iters):
        scores = (
            _list_scores(F.col("embedding"), n_lists)
            if codebook is None
            else _literal_scores(F.col("embedding"), codebook)
        )
        assigned = embeddings.select(
            F.array_position(scores, F.array_min(scores)).cast("int").alias("list_id"),
            "embedding",
        )
        rows = (
            assigned.select("list_id", F.posexplode("embedding").alias("d", "v"))
            .select(
                "list_id",
                "d",
                F.floor(F.col("v").cast("double") * F.lit(_Q)).cast("long").alias("q"),
            )
            .groupBy("list_id", "d")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        dim = max(r["d"] for r in rows) + 1
        prev = codebook if codebook is not None else _codebook_init(dim, n_lists)
        nxt = [list(prev[j]) for j in range(n_lists)]
        for r in rows:  # lists with no members keep their previous centroid
            nxt[r["list_id"] - 1][r["d"]] = r["s"] / (_Q * r["n"])
        codebook = nxt
    assert codebook is not None
    return codebook


def ivf_assign(embeddings: DataFrame, n_lists: int = N_LISTS) -> DataFrame:
    """(vec_id, list_id) — each vector's inverted list: the nearest
    centroid of a FIXED deterministic random codebook (the trained
    variant is ``ivf_train_kmeans`` + ``ann_ivf_trained``).  At
    cluster scale this is the partitioning column: each list is a
    co-located shard and queries only touch n_probe of them."""
    scores = _list_scores(F.col("embedding"), n_lists)
    return embeddings.select(
        "vec_id",
        F.array_position(scores, F.array_min(scores)).cast("int").alias("list_id"),
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in their nearest
    centroid's inverted list; a query probes its ``n_probe`` nearest lists
    and runs exact cosine only on those lists' members.  The list equi-join
    is the only shuffle — candidate fan-out is bounded by the probed
    lists' sizes, never all-pairs.  With ``codebook`` the index uses the
    given (e.g. k-means-trained) centroids instead of the fixed md5 ones."""
    scores = (
        _list_scores(F.col("embedding"), n_lists)
        if codebook is None
        else _literal_scores(F.col("embedding"), codebook)
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.array_position(scores, F.array_min(scores)).cast("int").alias("list_id"),
    )
    # the query's n_probe nearest lists: (score, lid) structs sorted
    # lexicographically (ties -> smaller lid, same on both engines)
    pairs = F.array_sort(
        F.zip_with(
            scores,
            F.sequence(F.lit(1), F.lit(n_lists)),
            lambda s, j: F.struct(s.alias("score"), j.alias("lid")),
        )
    )
    probe = F.transform(F.slice(pairs, 1, n_probe), lambda p: p["lid"].cast("int"))
    q = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.explode(probe).alias("list_id"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(corpus, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _r4(cosine_expr(F.col("qv"), F.col("cv"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop("rnk")


def ann_ivf_trained(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
    n_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """IVF top-k over a K-MEANS-TRAINED codebook: run the deterministic
    Lloyd training job (``ivf_train_kmeans``), then probe exactly like
    ``ann_ivf_topk`` with the trained centroids.  The training collects
    only the tiny model artifact per iteration; the query plan itself
    stays the bounded list equi-join.  Bit-exact against the DuckDB
    oracle, which replays all ``n_iters`` iterations in chained CTEs."""
    cb = ivf_train_kmeans(embeddings, n_lists, n_iters)
    return ann_ivf_topk(embeddings, n_queries, k, n_lists, n_probe, codebook=cb)


def incremental_ivf_index(
    spark,
    embeddings: DataFrame,
    base_dir: str,
    n_queries: int = 5,
    k: int = 5,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Continuous-crawl vector-index MAINTENANCE: IVF assignments live in
    a snapshot-log table PARTITIONED BY ``list_id`` (identity transform),
    each ingest batch one `snapshots.write_partitioned` commit — append
    new embeddings WITHOUT touching (or re-reading) the existing lists.
    Probe queries then read ONLY the probed lists' directories: the
    manifest partition metadata prunes at the planning layer before
    Spark ever lists a file (`log.read(..., where_eq=("list_id", lid))`),
    which is the Iceberg-shaped rendering of "a query touches n_probe
    shards of the index, never the corpus".

    Demo shape: batch 1 = vec_id % 3 != 0 (the initial build), batch 2 =
    vec_id % 3 == 0 (the crawl increment); the probe result is
    value-identical to `ann_ivf_topk` over the union — the shared oracle
    proves no vector was lost across commits, and the pruning pytest
    proves no unprobed list was read.  The probed-list collect is
    bounded driver metadata (<= n_lists ints, Spark-computed so the
    centroid fold stays bit-exact with the SQL replay)."""
    from .. import snapshots

    log = snapshots.SnapshotLog(base_dir)
    scores = _list_scores(F.col("embedding"), n_lists)
    assigned = embeddings.select(
        "vec_id",
        "embedding",
        F.array_position(scores, F.array_min(scores)).cast("int").alias("list_id"),
    )
    spec = {"col": "list_id", "transform": "identity", "spec_id": 0}
    if log.head_id() is None:
        for pred in (F.col("vec_id") % 3 != 0, F.col("vec_id") % 3 == 0):
            snapshots.write_partitioned(
                spark, log, assigned.filter(pred), "ivf", spec
            )
    pairs = F.array_sort(
        F.zip_with(
            scores,
            F.sequence(F.lit(1), F.lit(n_lists)),
            lambda s, j: F.struct(s.alias("score"), j.alias("lid")),
        )
    )
    probe = F.transform(F.slice(pairs, 1, n_probe), lambda p: p["lid"].cast("int"))
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(probe).alias("list_id"),
    )
    needed = sorted(r.list_id for r in q.select("list_id").distinct().collect())
    corpus = None
    for lid in needed:  # each read plans ONLY that list's directories
        part = log.read(spark, "ivf", where_eq=("list_id", lid)).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
            "list_id",
        )
        corpus = part if corpus is None else corpus.unionByName(part)
    scored = (
        F.broadcast(q)
        .join(corpus, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _r4(cosine_expr(F.col("qv"), F.col("cv"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    n_lists: int = N_LISTS,
    n_iters: int = IVF_TRAIN_ITERS,
    per_cluster: int = 20,
) -> DataFrame:
    """CLUSTER-BALANCED data selection (the semantic-diversity sampling
    step of curation pipelines — cap each embedding cluster's
    contribution so boilerplate-dense regions can't dominate the
    training mix): k-means-train the centroids (``ivf_train_kmeans``,
    bit-reproducible), hard-assign every vector, keep a deterministic
    md5-ranked sample of at most ``per_cluster`` vectors per cluster.
    Emits (vec_id, list_id, rk).

    Plan: assignment is a codegen'd argmin projection over the scan (the
    codebook is a literal), then ONE window over ``list_id`` with
    WindowGroupLimit pushing the top-K before the exchange — per-cluster
    state is K rows, no global sort, no driver collection beyond the
    KiB-scale codebook."""
    cb = ivf_train_kmeans(embeddings, n_lists, n_iters)
    scores = _literal_scores(F.col("embedding"), cb)
    assigned = embeddings.select(
        "vec_id",
        F.array_position(scores, F.array_min(scores)).cast("int").alias("list_id"),
    )
    w = Window.partitionBy("list_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        assigned.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= per_cluster)
        .select("vec_id", "list_id", "rk")
    )


# --- PQ (product quantization) index ---------------------------------------
# The memory-efficient ANN layout at 10^12-vector scale: each vector is
# stored as PQ_M small codes (here 8 bytes) instead of 64 floats, the
# candidate scan touches ONLY the compact code table (asymmetric distance
# computation against a per-query lookup table), and full embeddings are
# fetched just for the top-R re-rank candidates.  Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 (public).

PQ_M = 8       # subspaces (64-dim embeddings -> 8-dim subvectors)
PQ_K = 16      # centroids per subspace (4-bit codes)
PQ_RERANK = 32 # approx-distance candidates re-ranked exactly per query


def _pq_coeff_at(m: int, cK: int, i):
    """Deterministic PQ centroid coefficient at runtime LOCAL dim ``i``
    (0-based within the subspace) — md5 family, 'pq' salt."""
    h = F.md5(F.concat(F.lit(f"pq{m}:{cK}:dim"), i.cast("string")))
    mixed = (F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))) % 101
    return mixed.cast("double") / 101.0 - 0.5


def _pq_sub_scores(col, m: int, subdim: int) -> Column:
    """array<double> of the K assignment scores ||c||^2 - 2 sub.c for
    subspace ``m`` of vector ``col`` (rank-equivalent L2, as IVF)."""
    sub = F.slice(col, m * subdim + 1, subdim)
    idx = F.sequence(F.lit(0), F.lit(subdim - 1))
    scores = []
    for cK in range(PQ_K):
        dot = F.aggregate(
            F.zip_with(sub, idx, lambda x, i: x.cast("double") * _pq_coeff_at(m, cK, i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        c2 = F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, i: acc + _pq_coeff_at(m, cK, i) * _pq_coeff_at(m, cK, i),
        )
        scores.append(c2 - 2.0 * dot)
    return F.array(*scores)


def pq_encode(embeddings: DataFrame, m_sub: int = PQ_M, dim: int = 64, codebook=None) -> DataFrame:
    """(vec_id, codes array<int>) — each subspace's nearest deterministic
    centroid (1-based, ties -> smaller code, mirroring array_position /
    list_position).  This table is the PERSISTED index: PQ_M small ints
    per vector, ~1/32nd of the embedding bytes."""
    subdim = dim // m_sub
    codes = [
        F.array_position(s, F.array_min(s)).cast("int")
        for s in _pq_all_scores(F.col("embedding"), m_sub, subdim, codebook)
    ]
    return embeddings.select("vec_id", F.array(*codes).alias("codes"))


def _adc_rerank(approx: DataFrame, embeddings: DataFrame, k: int, rerank: int) -> DataFrame:
    """Shared PQ tail: cut to the top-``rerank`` candidates by ADC
    approximate distance (ties -> smaller neighbor), fetch their full
    embeddings (vec_id equi-join, R rows per query), exact-cosine
    re-rank to top-``k``.  ``approx`` carries (query_id, qv,
    neighbor_id, adist)."""
    wa = Window.partitionBy("query_id").orderBy(F.col("adist"), F.col("neighbor_id"))
    cand = (
        approx.withColumn("arnk", F.row_number().over(wa))
        .filter(F.col("arnk") <= rerank)
        .drop("arnk", "adist")
    )
    scored = cand.join(
        embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        _r4(cosine_expr(F.col("qv"), F.col("cv"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop("rnk")


def ann_pq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    m_sub: int = PQ_M,
    dim: int = 64,
    rerank: int = PQ_RERANK,
    codebook=None,
) -> DataFrame:
    """PQ top-k with exact re-rank: queries carry a per-query ADC lookup
    table (m_sub x PQ_K approximate-distance cells, built as plan
    expressions and BROADCAST); the corpus side is a scan of the compact
    code table only — approx distance is m_sub array lookups per
    candidate, no embedding bytes move.  The top-``rerank`` candidates
    per query then join back to the embeddings table (vec_id-keyed, R
    rows per query) for the exact cosine cut.  Deterministic end to end:
    the DuckDB oracle replays encoding, ADC, and re-rank bit-for-bit."""
    subdim = dim // m_sub
    codes = pq_encode(embeddings, m_sub, dim, codebook)
    dtab = F.array(*_pq_all_scores(F.col("embedding"), m_sub, subdim, codebook))
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        dtab.alias("dtab"),
    )
    approx = (
        F.broadcast(queries)
        .join(codes, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qv",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("dtab"), lambda c, row: F.element_at(row, c)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adist"),
        )
    )
    return _adc_rerank(approx, embeddings, k, rerank)


PQ_TRAIN_ITERS = 5  # fixed per-subspace Lloyd iterations (determinism + oracle)


def _pq_codebook_init(m_sub: int = PQ_M, n_k: int = PQ_K, subdim: int = 8):
    """Python mirror of ``_pq_coeff_at`` — the deterministic initial
    codebooks per subspace, cb[m][k][local_dim]."""
    import hashlib

    cb = []
    for m in range(m_sub):
        rows = []
        for cK in range(n_k):
            row = []
            for d in range(subdim):
                h = hashlib.md5(f"pq{m}:{cK}:dim{d}".encode()).hexdigest()
                row.append(((ord(h[0]) * 31 + ord(h[1])) % 101) / 101.0 - 0.5)
            rows.append(row)
        cb.append(rows)
    return cb


def _pq_literal_sub_scores(col, m: int, cb_m, subdim: int) -> Column:
    """``_pq_sub_scores`` against LITERAL centroids (c2 pre-folded in
    python with the same left-to-right order, dot left-folded over the
    zipped slice) — operand-for-operand the ``_literal_scores`` shape."""
    sub = F.slice(col, m * subdim + 1, subdim)
    scores = []
    for c in cb_m:
        c2 = 0.0
        for x in c:
            c2 = c2 + x * x
        arr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(sub, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scores.append(F.lit(c2) - 2.0 * dot)
    return F.array(*scores)


def _pq_all_scores(col, m_sub: int, subdim: int, codebook=None) -> list:
    return [
        _pq_sub_scores(col, m, subdim)
        if codebook is None
        else _pq_literal_sub_scores(col, m, codebook[m], subdim)
        for m in range(m_sub)
    ]


def pq_train_kmeans(
    embeddings: DataFrame,
    m_sub: int = PQ_M,
    n_k: int = PQ_K,
    dim: int = 64,
    n_iters: int = PQ_TRAIN_ITERS,
):
    """Per-subspace Lloyd's k-means — the PQ codebook training batch job.
    One Spark job per iteration: assign every subvector to its nearest
    centroid, aggregate per-(subspace, code, local-dim) sums; only the
    m_sub x n_k x subdim model artifact is collected.  Same exactness
    discipline as ``ivf_train_kmeans``: components quantize to
    ``floor(v * 2^24)`` and sum as BIGINT (order-independent, map-side
    combinable), centroid = sum / (2^24 * count) in double — the whole
    loop is bit-reproducible across engines and shuffle orders."""
    subdim = dim // m_sub
    cb = None
    for _ in range(n_iters):
        scores = _pq_all_scores(F.col("embedding"), m_sub, subdim, cb)
        codes_col = F.array(
            *[F.array_position(s, F.array_min(s)).cast("int") for s in scores]
        )
        rows = (
            embeddings.select(codes_col.alias("codes"), F.posexplode("embedding").alias("d", "v"))
            .select(
                (F.col("d") / subdim).cast("int").alias("m"),
                (F.col("d") % subdim).alias("ld"),
                F.element_at("codes", (F.col("d") / subdim).cast("int") + 1).alias("k"),
                F.floor(F.col("v").cast("double") * F.lit(_Q)).cast("long").alias("q"),
            )
            .groupBy("m", "k", "ld")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        prev = cb if cb is not None else _pq_codebook_init(m_sub, n_k, subdim)
        nxt = [[list(r) for r in cbm] for cbm in prev]
        for r in rows:  # empty cells keep their previous centroid
            nxt[r["m"]][r["k"] - 1][r["ld"]] = r["s"] / (_Q * r["n"])
        cb = nxt
    return cb


def ann_pq_trained(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    m_sub: int = PQ_M,
    dim: int = 64,
    rerank: int = PQ_RERANK,
    n_iters: int = PQ_TRAIN_ITERS,
) -> DataFrame:
    """PQ top-k over DATA-FITTED codebooks: train per-subspace k-means,
    then encode + ADC + exact re-rank exactly like ``ann_pq_topk`` with
    the literal trained centroids."""
    cb = pq_train_kmeans(embeddings, m_sub, PQ_K, dim, n_iters)
    return ann_pq_topk(embeddings, n_queries, k, m_sub, dim, rerank, codebook=cb)


def ann_ivfpq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_lists: int = N_LISTS,
    n_probe: int = N_PROBE,
    m_sub: int = PQ_M,
    dim: int = 64,
    rerank: int = PQ_RERANK,
) -> DataFrame:
    """IVF + PQ — the composed 10^12-scale index (FAISS IVFPQ layout,
    Jegou et al. 2011): the coarse quantizer shards vectors into
    inverted lists (list_id = the partitioning column, so each list is a
    co-located shard), each vector stores only its PQ codes, and a query
    (a) probes its n_probe nearest lists — SUBLINEAR: untouched lists
    cost nothing — then (b) ADC-scores just those lists' compact codes,
    and (c) exactly re-ranks the top-``rerank``.  The only corpus-side
    state is (list_id, codes): ~9 small ints per vector."""
    subdim = dim // m_sub
    lscores = _list_scores(F.col("embedding"), n_lists)
    # list assignment and PQ codes are both projections of the same row —
    # ONE select, no self-join, no shuffle to build the corpus index
    corpus = embeddings.select(
        "vec_id",
        F.array_position(lscores, F.array_min(lscores)).cast("int").alias("list_id"),
        F.array(
            *[
                F.array_position(s, F.array_min(s)).cast("int")
                for s in _pq_all_scores(F.col("embedding"), m_sub, subdim)
            ]
        ).alias("codes"),
    )
    pairs = F.array_sort(
        F.zip_with(
            lscores,
            F.sequence(F.lit(1), F.lit(n_lists)),
            lambda s, j: F.struct(s.alias("score"), j.alias("lid")),
        )
    )
    probe = F.transform(F.slice(pairs, 1, n_probe), lambda p: p["lid"].cast("int"))
    dtab = F.array(*_pq_all_scores(F.col("embedding"), m_sub, subdim))
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        dtab.alias("dtab"),
        F.explode(probe).alias("list_id"),
    )
    approx = (
        F.broadcast(q)
        .join(corpus, "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qv",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("dtab"), lambda c, row: F.element_at(row, c)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adist"),
        )
    )
    return _adc_rerank(approx, embeddings, k, rerank)
