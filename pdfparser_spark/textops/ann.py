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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for vec_id < n_queries.

    Returns (query_id, neighbor_id, cos_sim) with cos_sim rounded to 4dp;
    ranking uses the rounded score with neighbor_id tiebreak so the result
    is engine-portable.
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
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop("rnk")


def _plane_coeff(p: int, d: int):
    """Deterministic pseudo-random coefficient in [-0.5, 0.5) for plane p,
    dim d, via md5 char codes — engine-portable arithmetic (no base-16
    conversion builtins needed), data-independent."""
    h = F.md5(F.lit(f"plane{p}:dim{d}"))
    mixed = (F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))) % 101
    return mixed.cast("double") / 101.0 - 0.5


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket) — sign pattern across the hyperplanes as a bit
    string.  Coefficients fold into a closed-form projection per plane."""
    dims = embeddings.select(F.size("embedding").alias("d")).first()["d"]
    bits = []
    for p in range(n_planes):
        coeffs = F.array(*[_plane_coeff(p, d) for d in range(dims)])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), coeffs, lambda x, c: (x * c).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return embeddings.select("vec_id", F.concat(*bits).alias("bucket"))


def ann_lsh_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5, n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine within the bucket.  At cluster scale the bucket join is the
    only shuffle and buckets bound the candidate fan-out."""
    b = lsh_buckets(embeddings, n_planes)
    e = embeddings.join(b, "vec_id")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).drop("rnk")
