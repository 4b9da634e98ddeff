"""Text analysis: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All pure JVM expressions (no Python in the hot path).  Formulas are
deterministic and mirrored 1:1 in the DuckDB oracle SQL (__spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOP_EN = ("the", "and", "of", "is", "to", "in")
STOP_ES = ("el", "la", "de", "que", "los", "un")
STOP_DE = ("der", "die", "und", "das", "ein", "zu")

FP_MOD = 1_000_000_007


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (ceil(chars/4) per
    word — the standard chars/4 token heuristic, exact-arithmetic so the
    oracle matches)."""
    w = _words()
    return documents.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.ceil(F.length(x) / F.lit(4.0))
        ).alias("n_subwords"),
    )


def _stop_count(w, stops):
    return F.size(F.filter(w, lambda x: x.isin(*stops)))


def quality_scores(documents: DataFrame) -> DataFrame:
    """Composite quality score from length, stopword density and mean word
    length — the classic cheap pre-filter for corpus curation."""
    w = _words()
    n_tok = F.size(w).cast("double")
    avg_len = (F.length("text") - F.size(w) + 1) / F.size(w)
    stop_ratio = _stop_count(w, STOP_EN) / n_tok

    from ..rounding import r4  # engine-portable half-up (one shared def)

    score = r4(
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + F.least(avg_len / 10.0, F.lit(1.0)) * 0.2
    )
    return documents.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        r4(avg_len).alias("avg_word_len"),
        r4(stop_ratio).alias("stop_ratio"),
        score.alias("quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-overlap language guess (deterministic argmax, ties broken
    en > es > de)."""
    w = _words()
    en, es, de = (_stop_count(w, s) for s in (STOP_EN, STOP_ES, STOP_DE))
    guess = (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("und")
    )
    return documents.select(
        "doc_id", en.alias("n_en"), es.alias("n_es"), de.alias("n_de"), guess.alias("lang_guess")
    )


def repetition_signals(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    fraction of the document covered by its most frequent word and most
    frequent word 2-gram, plus the distinct-word ratio.  Keyword-stuffed
    spam and boilerplate score high on the top-gram fractions and low on
    the distinct ratio, and get culled before training.

    Plan: two (doc_id, gram) hash aggregations with map-side partial
    combine, top-1 per doc via WindowGroupLimit (rank pushdown), joins
    back on doc_id.  Ties on count break to the lexicographically
    smallest gram (binary collation on both engines)."""
    from pyspark.sql.window import Window

    from ..rounding import r4

    withw = documents.select("doc_id", _words().alias("w"))
    base = withw.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("gram").asc())

    def top1(grams: DataFrame, name: str) -> DataFrame:
        counted = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
        return (
            counted.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select(
                "doc_id",
                F.col("gram").alias(f"top_{name}"),
                F.col("n").alias(f"top_{name}_n"),
            )
        )

    uni = top1(withw.select("doc_id", F.explode("w").alias("gram")), "word")
    bigrams = withw.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")
        ).alias("gram"),
    )
    bi = top1(bigrams, "bigram")

    out = base.join(uni, "doc_id").join(bi, "doc_id", "left")
    return out.select(
        "doc_id",
        "n_words",
        "n_distinct",
        r4(F.col("n_distinct").cast("double") / F.col("n_words")).alias("distinct_ratio"),
        "top_word",
        "top_word_n",
        r4(F.col("top_word_n").cast("double") / F.col("n_words")).alias("top_word_frac"),
        "top_bigram",
        "top_bigram_n",
        r4(F.col("top_bigram_n").cast("double") / (F.col("n_words") - 1)).alias(
            "top_bigram_frac"
        ),
    )


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_gate(documents: DataFrame) -> DataFrame:
    """The Gopher rule-based document filter (Rae et al. 2021 §A1.1,
    public): a document is kept only if it passes ALL of
      - word count in [50, 100000]
      - mean word length in [3, 10]
      - symbol-to-word ratio ('#' or ellipsis) <= 0.1
      - <= 90% of lines start with a bullet, <= 30% end with an ellipsis
      - >= 80% of words contain at least one alphabetic character
      - at least 2 of the 8 Gopher stopwords appear

    Every ratio threshold is evaluated as an INTEGER cross-multiply
    (e.g. mean-word-length in [3,10] is ``3·n_words <= Σlen <=
    10·n_words``), so the gate is bit-exact across engines — no float
    division anywhere.  All counters are emitted alongside the verdict,
    plus ``fail_mask`` — one bit per failed rule (bit0 word count, bit1
    mean length, bit2 symbols, bit3 bullets, bit4 ellipses, bit5 alpha
    words, bit6 stopwords) — so each rule's outcome is independently
    observable: at 100 TB you keep the per-rule counters (one narrow
    row per doc, map-only plan, no shuffle) and tune thresholds offline
    rather than re-reading the corpus.

    Plan: a single projection over the scan — no exchange at all."""
    t = F.coalesce(F.col("text"), F.lit(""))
    w = F.filter(F.split(t, " "), lambda x: x != "")
    ls = F.split(t, "\n")
    n_words = F.size(w).cast("long")
    sum_len = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    n_sym = (
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        + F.floor((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3)
        + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
    ).cast("long")
    n_lines = F.size(ls).cast("long")
    n_bullet = F.size(F.filter(ls, lambda l: l.rlike("^[-*•]"))).cast("long")
    n_ell = F.size(F.filter(ls, lambda l: l.rlike("(\\.\\.\\.|…)$"))).cast("long")
    n_stops = sum(
        (F.array_contains(w, s).cast("int") for s in GOPHER_STOPS), F.lit(0)
    ).cast("long")
    d = documents.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_len.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
        n_sym.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell.alias("n_ellipsis_lines"),
        n_stops.alias("n_stopword_kinds"),
    )
    c = F.col
    rules = [
        c("n_words").between(50, 100000),
        (3 * c("n_words") <= c("sum_word_len")) & (c("sum_word_len") <= 10 * c("n_words")),
        10 * c("n_symbols") <= c("n_words"),
        10 * c("n_bullet_lines") <= 9 * c("n_lines"),
        10 * c("n_ellipsis_lines") <= 3 * c("n_lines"),
        5 * c("n_alpha_words") >= 4 * c("n_words"),
        c("n_stopword_kinds") >= 2,
    ]
    fail_mask = sum(
        (F.when(r, 0).otherwise(1 << i) for i, r in enumerate(rules)), F.lit(0)
    )
    return d.withColumn("fail_mask", fail_mask.cast("int")).withColumn(
        "passes", (F.col("fail_mask") == 0).cast("int")
    )


def hashed_features(documents: DataFrame, dims: int = 16) -> DataFrame:
    """Feature-hashing embeddings (the 'hashing trick', Weinberger et al.
    2009, public): each word hashes to a bucket in [0, dims) with a
    +/-1 sign from a second hash bit; a document's sparse vector is the
    signed count per bucket (zero weights dropped).  Integer-exact, so
    the DuckDB oracle matches bit-for-bit; the md5-derived bucket/sign
    follow the same ascii-slice rule as ann._plane_coeff_at.

    Plan: one (doc_id, bucket) hash aggregation with map-side combine —
    the same shape at 100 TB, no driver-side state."""
    w = F.explode(_words()).alias("word")
    h = F.md5(F.col("word"))
    bucket = (
        (F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))) % dims
    ).alias("bucket")
    sgn = F.when(F.ascii(F.substring(h, 3, 1)) % 2 == 0, 1).otherwise(-1)
    return (
        documents.select("doc_id", w)
        .select("doc_id", bucket, sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("weight"))
        .filter(F.col("weight") != 0)
        .select("doc_id", F.col("bucket").cast("int").alias("bucket"), "weight")
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Rolling polynomial hash over the word stream (order-sensitive, unlike
    the shingle-set dedup hashes): fp = fold (acc*31 + len(w)*17 + ascii(w))
    mod 1e9+7, seeded 7."""
    w = _words()
    fp = F.aggregate(
        w,
        F.lit(7).cast("long"),
        lambda acc, x: (acc * 31 + F.length(x).cast("long") * 17 + F.ascii(x).cast("long")) % FP_MOD,
    )
    return documents.select("doc_id", fp.alias("fingerprint"))
