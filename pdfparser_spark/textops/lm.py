"""Language-model likelihood filtering (CCNet-style, Wenzek et al. 2020,
public): train a character-bigram LM on an in-domain source slice, score
every document by its average per-transition model probability, and gate
on a fixed threshold.  This is the deterministic core of the "train a
small LM on Wikipedia, keep crawl pages the LM likes" curation stage.

Everything is BIGINT fixed-point so the DuckDB oracle verifies training
AND scoring bit-for-bit:

  * model      q(c1c2) = floor(SCALE * cnt(c1c2) / cnt(c1·)) over the
    training slice only, via the engine-portable pmod floor division
    (see model.py — Java and DuckDB ``%`` agree on sign).
  * doc score  ll_sum  = sum over the doc's bigram occurrences of
    q(bigram), unseen bigrams backing off to 0.
  * ll_avg     = floor(ll_sum / n_pairs); in_domain = ll_avg >= CUT.

A probability *sum* (not log-prob sum) is used deliberately: logs are
transcendental and not bit-identical across engines; the quantized
conditional-probability sum is order-equivalent for the gate's purpose
and exactly reproducible.

Scale shape: the model is at most |alphabet|^2 rows regardless of corpus
size — broadcast-sized at 10^12 docs.  Training reads ONLY the in-domain
slice (the source filter sits directly on the scan, so partition/
predicate pushdown skips the rest of the corpus); scoring is one
(doc_id, bigram) hash aggregate with map-side combine, a broadcast join
to the model, and one doc_id-keyed reduce.  Nothing iterative, nothing
driver-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import _floor_div

TRAIN_SOURCE = "src0"  # plays the role of CCNet's Wikipedia slice
SCALE = 1_000_000  # fixed-point denominator for conditional probabilities
# ll_avg gate, placed mid-distribution (the synthetic corpus' char
# statistics barely vary by source/lang — measured ll_avg spans roughly
# 195k-312k at sf0.01 — so unlike a real crawl the gate can't isolate a
# junk tail here; 250k keeps ~half, exercising both branches).
CUT = 250_000


def _bigrams():
    """array<string> of adjacent character pairs of ``text`` (empty for
    texts shorter than 2 — Spark's sequence(1, 0) would count DOWN)."""
    return F.when(
        F.length("text") >= 2,
        F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"),
    ).otherwise(F.expr("array()").cast("array<string>"))


def lm_likelihood(documents: DataFrame, train_source: str = TRAIN_SOURCE) -> DataFrame:
    """(doc_id, n_pairs, ll_sum, ll_avg, in_domain) for every document.

    ``in_domain`` is the CCNet keep/drop gate; ``ll_avg`` the quantized
    average conditional probability under the char-bigram LM trained on
    ``train_source`` documents only.
    """
    # -- train: bigram and prefix counts over the in-domain slice only.
    #    The filter precedes the explode, so it reaches the parquet scan.
    train_bg = documents.filter(F.col("source") == train_source).select(
        F.explode(_bigrams()).alias("bg")
    )
    cnt = train_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = cnt.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("pcnt")
    )
    model = (
        cnt.withColumn("c1", F.substring("bg", 1, 1))
        .join(prefix, "c1")
        .select("bg", _floor_div(F.col("cnt") * SCALE, F.col("pcnt")).alias("q"))
    )

    # -- score: per-doc bigram counts -> broadcast join to the model.
    per_doc = (
        documents.select("doc_id", F.explode(_bigrams()).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        per_doc.join(F.broadcast(model), "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_pairs"),
            F.sum(F.col("n") * F.coalesce(F.col("q"), F.lit(0))).alias("ll_sum"),
        )
    )
    # left-join back so zero-pair docs still get a (0, 0, 0) row
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("ll_sum"), F.lit(0)).cast("long").alias("ll_sum"),
            F.when(
                F.coalesce(F.col("n_pairs"), F.lit(0)) > 0,
                _floor_div(F.coalesce(F.col("ll_sum"), F.lit(0)), F.col("n_pairs")),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("ll_avg"),
        )
        .withColumn("in_domain", (F.col("ll_avg") >= CUT).cast("int"))
    )
