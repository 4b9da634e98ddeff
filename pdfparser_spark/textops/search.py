"""Term search: rarity-weighted (tf x idf-style) top-k retrieval.

The inverted-index query every corpus tool needs ("find the documents
most about these terms").  Classic BM25/tf-idf weights use floating
logarithms whose last-ulp behavior is engine-private, so the weight
here is the integer rarity ratio

    w(t) = SCALE // df(t)        score(d) = sum_t tf(t, d) * w(t)

— the same monotone rare-terms-win shape, in BIGINT arithmetic, which
makes the whole ranking (not just the hit set) bit-checkable against
the DuckDB oracle.  Ties break on doc_id, so top-k is a total order.

Scale shape: the probe filter (`word IN terms`) reaches the scan, so
only posting rows for the query's terms ever leave it — the DataFrame
rendering of an inverted-index lookup.  tf is one (doc_id, word)
partial+final aggregate over those rows; df reduces the tf table (one
row per posting); the weight table is |terms| rows, broadcast; top-k is
TakeOrderedAndProject (per-partition heads, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUERY_TERMS = ("spark", "merge", "window")
SCALE = 1_000_000
TOP_K = 10


def search_topk(
    documents: DataFrame, terms: tuple[str, ...] = QUERY_TERMS, k: int = TOP_K
) -> DataFrame:
    """(doc_id, score): the k highest rarity-weighted term-match scores,
    ties to the smallest doc_id."""
    words = (
        documents.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word").isin(*terms))
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    w = df_t.select("word", F.expr(f"CAST({SCALE} DIV df AS BIGINT)").alias("w"))
    return (
        tf.join(F.broadcast(w), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_topk_oracle_sql(
    terms: tuple[str, ...] = QUERY_TERMS, k: int = TOP_K
) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH words AS (
          SELECT doc_id, u AS word
          FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(u)
          WHERE u IN ({tl})
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2
        ), w AS (
          SELECT word, {SCALE} // COUNT(*) AS w FROM tf GROUP BY 1
        )
        SELECT doc_id, CAST(SUM(tf * w) AS BIGINT) AS score
        FROM tf JOIN w USING (word)
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT {k}
    """


def bm25_topk(
    documents: DataFrame, terms: tuple[str, ...] = QUERY_TERMS, k: int = TOP_K
) -> DataFrame:
    """BM25 top-k (Robertson/Sparck Jones; k1 = 1.2, b = 0.75) in EXACT
    integer arithmetic: the per-term contribution

        w(t) * tf * (k1+1) / (tf + k1*(1 - b + b*len_d/avg_len))

    is rendered as one BIGINT integer division by clearing denominators
    — with AL = total corpus words and N = docs,

        contrib = (w * tf * 2200 * AL) DIV (1000*AL*tf + 300*AL + 900*len_d*N)

    (k1+1 = 2.2 -> 2200/1000; k1*(1-b) = 0.3 -> 300/1000; k1*b = 0.9 ->
    900/1000), so the FULL ranking is bit-checkable against DuckDB's
    `//`.  w(t) is the integer rarity weight (SCALE // df) — BM25's log
    idf is float-private, the rarity ratio keeps the same rare-terms-win
    monotonicity.  Length normalization is live: equal tf in a shorter
    document scores higher.

    Scale: corpus stats (AL, N) are ONE tiny broadcast row; tf/df aggs
    as in search_topk; top-k is TakeOrderedAndProject.  BIGINT headroom
    bounds AL*w*tf*2200 — at 10^12-word corpora drop SCALE accordingly
    (documented trade; the division stays exact)."""
    lens = documents.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("len")
    )
    tot = lens.agg(
        F.sum("len").cast("long").alias("al"), F.count(F.lit(1)).alias("n")
    )
    words = (
        documents.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word").isin(*terms))
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    w = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df")).select(
        "word", F.expr(f"CAST({SCALE} DIV df AS BIGINT)").alias("w")
    )
    return (
        tf.join(F.broadcast(w), "word")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "contrib",
            F.expr(
                "w * tf * 2200 * al DIV "
                "(1000 * al * tf + 300 * al + 900 * len * n)"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk_oracle_sql(
    terms: tuple[str, ...] = QUERY_TERMS, k: int = TOP_K
) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH lens AS (
          SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents
        ), tot AS (
          SELECT CAST(SUM(len) AS BIGINT) AS al, COUNT(*) AS n FROM lens
        ), words AS (
          SELECT doc_id, u AS word
          FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(u)
          WHERE u IN ({tl})
        ), tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2
        ), w AS (
          SELECT word, {SCALE} // COUNT(*) AS w FROM tf GROUP BY 1
        )
        SELECT doc_id,
               CAST(SUM((w * tf * 2200 * al) //
                        (1000 * al * tf + 300 * al + 900 * len * n)) AS BIGINT)
                 AS score
        FROM tf JOIN w USING (word) JOIN lens USING (doc_id) CROSS JOIN tot
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT {k}
    """


def hybrid_rrf_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = 10,
    depth: int = 50,
    kconst: int = 60,
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack/Clarke/
    Buettcher 2009, public): the LEXICAL ranking (integer-exact BM25,
    :func:`bm25_topk` at ``depth``) and the DENSE ranking (exact cosine
    vs query vector 0, textops.ann.cosine_topk) are fused as

        rrf(d) = Σ_lists 1 / (kconst + rank_list(d))

    — the standard way production search stacks combine keyword and
    embedding retrieval without score calibration.  Ids are identified
    across modalities as ``vec_id == doc_id`` (the synthetic corpora
    share the key space).  Emits (doc_id, r_lex, r_dense, rrf) for the
    final top ``k``; a doc on one list only gets that list's term.

    Exactness: ranks are integers with deterministic tiebreaks, and the
    fusion is two IEEE divisions + one sum in a pinned operand order —
    DuckDB reproduces the doubles bit-for-bit, so even the fused score
    column hash-matches.  Scale: both input rankings are depth-bounded
    (the two top-``depth`` lists are driver-scale; the EXPENSIVE work —
    corpus BM25 aggs, broadcast dot products — is the distributed part),
    so the single-partition rank windows see ``depth`` rows, never the
    corpus."""
    from pyspark.sql import Window

    from .ann import cosine_topk

    lex = bm25_topk(documents, terms, k=depth)
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lexr = lex.select("doc_id", F.row_number().over(wl).alias("r_lex"))
    dense = cosine_topk(embeddings, n_queries=1, k=depth)
    wd = Window.orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    denr = dense.select(
        F.col("neighbor_id").alias("doc_id"), F.row_number().over(wd).alias("r_dense")
    )
    fused = (
        lexr.join(denr, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_dense",
            (
                F.coalesce(F.lit(1.0) / (F.lit(kconst) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(kconst) + F.col("r_dense")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(k)


def phrase_search(
    documents: DataFrame, phrase: str = "sort merge", k: int = 20
) -> DataFrame:
    """EXACT-phrase retrieval — the quoted-query arm of a search stack
    (term scoring can't distinguish "sort merge" from "merge ... sort").
    Occurrences are counted without regex or tokenization:

        n = (len(text) - len(replace(text, phrase, ''))) / len(phrase)

    — pure JVM string algebra, identical in DuckDB, and exact for
    non-overlapping matches (replace() consumes left-to-right exactly
    like a scanning matcher).  Emits the top ``k`` (doc_id, n_matches)
    by count with doc_id tiebreak; zero-match docs are filtered before
    the shuffle, so the TakeOrderedAndProject sees only matching rows.
    Scale: one scan + one top-k — the predicate and projection push to
    the parquet scan; no index is needed until latency (not throughput)
    is the requirement, at which point the inverted-index shape in
    ``search_topk`` is the companion."""
    plen = len(phrase)
    n = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(phrase), F.lit(""))))
        / plen
    ).cast("int")
    return (
        documents.select("doc_id", n.alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy(F.col("n_matches").desc(), F.col("doc_id"))
        .limit(k)
    )
