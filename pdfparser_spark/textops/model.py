"""Model-based filtering: an integer-exact nearest-centroid classifier
trained and applied inside one DataFrame plan.

Large-scale curation pipelines gate documents with a cheap learned
classifier (fastText-style quality filters — CCNet, GPT-3's
WebText-similarity filter).  This module implements the deterministic
core of that step: train a nearest-class-centroid model over
hashing-trick count features on a labeled split, then score the whole
corpus, all in BIGINT arithmetic so the DuckDB oracle verifies train AND
inference bit-for-bit (no floating-point model state, no engine RNG).

The supervised target is the quality tier derived from
``textqc.quality_scores`` (label = 'hi' iff quality >= QUALITY_CUT): the
only text-derived label the synthetic corpus admits — its ``lang``
column is assigned independently of the text, so no model can learn it
(measured: every featurization lands at the majority-class rate).  The
quality tier IS learnable, and the held-out docs (doc_id % 10 == 9,
never seen by training) verify generalization: ~96% held-out accuracy
at sf0.01 vs a ~51% majority baseline.

Math, kept exact:
  * features f[d,b]  = count of words of doc d hashing to bucket b
    (unsigned counts — the signed hashing-trick variant of
    ``textqc.hashed_features`` has zero mean by construction and carries
    no document-length signal, which dominates the quality score).
  * centroid mu[c,b] = floor(SCALE * W[c,b] / n_c) with W the class
    count sums and n_c the class size — fixed-point means via the
    engine-portable exact floor division
    (x - ((x % n + n) % n)) / n  (Java and DuckDB '%' both take the
    dividend's sign, so the pmod round-trip is identical).
  * score(d,c) = 2*SCALE*<f_d, mu_c> - ||mu_c||^2 — the monotonic form
    of -||f - mu_c||^2 (the f·f term is class-independent and drops).
    A plain dot-product argmax is degenerate: it always picks the
    larger-norm centroid (measured: collapses to majority class); the
    -||mu||^2 term is what makes it a real nearest-centroid rule.
  * prediction = argmax score, ties to the lexicographically smallest
    label, as ONE min-of-struct aggregate.

Scale shape: training is one (label, bucket) aggregate with map-side
combine; the model is n_classes x dims rows — broadcast-sized at any
corpus scale.  Inference joins the feature table to the broadcast model
on bucket and reduces per (doc_id, label): one shuffle keyed by doc_id.
Nothing iterative, nothing driver-resident but the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textqc

TRAIN_MOD = 10
TRAIN_REM = 9  # doc_id % 10 == 9 is the held-out split
QUALITY_CUT = 0.38  # ~median corpus quality -> balanced classes
SCALE = 65536  # fixed-point denominator for the centroid means


def _count_features(documents: DataFrame, dims: int) -> DataFrame:
    """Unsigned hashing-trick counts: (doc_id, bucket, weight) with the
    same md5 ascii-slice bucket rule as textqc.hashed_features."""
    w = F.explode(F.split(F.col("text"), " ")).alias("word")
    h = F.md5(F.col("word"))
    bucket = (
        (F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))) % dims
    ).alias("bucket")
    return (
        documents.select("doc_id", w)
        .select("doc_id", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _floor_div(x, n):
    """Exact floor(x/n) for BIGINT columns, identical on both engines:
    subtract the positive remainder, then the division is exact."""
    pm = F.pmod(x, n)
    return ((x - pm) / n).cast("long")


def centroid_classifier(documents: DataFrame, dims: int = 16) -> DataFrame:
    """(doc_id, label, pred, score, correct, heldout) for every document.
    ``label`` is the quality tier (the supervised target), ``pred`` the
    nearest-centroid class, ``score`` the winning integer score;
    ``correct``/``heldout`` are 0/1 ints so split accuracy is one
    aggregation away."""
    feats = _count_features(documents, dims)
    labels = textqc.quality_scores(documents).select(
        "doc_id",
        F.when(F.col("quality") >= QUALITY_CUT, "hi").otherwise("lo").alias("label"),
    )
    train = labels.filter(F.col("doc_id") % TRAIN_MOD != TRAIN_REM)
    class_sizes = train.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    sums = (
        feats.join(train, "doc_id")
        .groupBy("label", "bucket")
        .agg(F.sum("weight").alias("w"))
    )
    mu = sums.join(class_sizes, "label").select(
        "label",
        "bucket",
        _floor_div(F.col("w") * SCALE, F.col("n_docs")).alias("mu"),
    )
    norms = mu.groupBy("label").agg(F.sum(F.col("mu") * F.col("mu")).alias("mu2"))
    scored = (
        feats.join(F.broadcast(mu), "bucket")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("weight") * F.col("mu")).alias("dot"))
        .join(F.broadcast(norms), "label")
        .select(
            "doc_id",
            "label",
            (F.lit(2 * SCALE).cast("long") * F.col("dot") - F.col("mu2")).alias("score"),
        )
    )
    # argmax(score, tie -> smallest label) as ONE min-of-struct aggregate:
    # min(struct(-score, label)) orders exactly like (score DESC, label ASC)
    best = scored.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("score")).alias("neg"), F.col("label"))).alias("b")
    )
    preds = best.select(
        "doc_id",
        F.col("b.label").alias("pred"),
        (-F.col("b.neg")).cast("long").alias("score"),
    )
    return preds.join(labels, "doc_id").select(
        "doc_id",
        "label",
        "pred",
        "score",
        (F.col("pred") == F.col("label")).cast("int").alias("correct"),
        (F.col("doc_id") % TRAIN_MOD == TRAIN_REM).cast("int").alias("heldout"),
    )

