"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016, public)
as ONE lazy DataFrame plan — no driver-side state at all.

The classic scalable shape: BPE trains on the *distinct-word frequency
table*, not the corpus — explode words once, count, and every merge
iteration is an aggregation over that (small) vocabulary table.  Each
iteration k:

  1. adjacent symbol pairs, weighted by word frequency
     (zip_with over the symbol array — no string scanning),
  2. argmax pair by (total DESC, left ASC, right ASC) as a 1-row
     subplan,
  3. apply the merge with a stateless per-index array transform,
     attached via a broadcast cross-join of that 1-row argmax — the
     winning pair is never collected to the driver; the whole K-merge
     training is a single Catalyst plan (contrast dedup_clusters, which
     needs a driver fixpoint .count()).

The per-index merge rule (i merges forward iff s[i]=L and s[i+1]=R;
i is dropped iff it was consumed by i-1) is exact greedy left-to-right
BPE **when L != R** — for L != R, occurrences of (L, R) can never
overlap, so eligibility is stateless.  Self-pairs (L = R, e.g. merging
'aa' out of 'aaaa') have position-parity-dependent greedy semantics
that no per-index rule can express, so they are excluded from the
candidate argmax (documented trade: real tokenizers do merge
self-pairs; this trainer trades that corner for bit-exact cross-engine
verification — the DuckDB oracle replays all K merges from scratch in
chained CTEs).

Scale shape at 10^12 docs: one corpus-wide (word) hash aggregate with
map-side combine produces the vocab table; everything after touches
only the vocab (bounded by distinct words, not corpus rows).  Each
merge level is one small shuffle + a 1-row broadcast.  K is a plan-time
constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MERGES = 6

# per-index greedy merge of the 1-row (l, r) pair into the syms array;
# Spark SQL [] indexing is 0-based
_APPLY = """
flatten(transform(syms, (x, i) -> CASE
  WHEN i + 1 < size(syms) AND x = l AND syms[i + 1] = r
    THEN array(concat(x, syms[i + 1]))
  WHEN i > 0 AND syms[i - 1] = l AND x = r
    THEN array()
  ELSE array(x) END))
"""


def _vocab(documents: DataFrame) -> DataFrame:
    """(word, n, syms): distinct-word frequencies with char-symbol arrays."""
    return (
        documents.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split("word", ""))
    )


def _pair_totals(vocab: DataFrame) -> DataFrame:
    """(l, r, total): adjacent-pair counts weighted by word frequency,
    self-pairs excluded (see module docstring)."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1),"
                "         slice(syms, 2, size(syms) - 1),"
                "         (a, b) -> struct(a AS l, b AS r))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("n", "p.l", "p.r")
        .filter(F.col("l") != F.col("r"))
        .groupBy("l", "r")
        .agg(F.sum("n").alias("total"))
    )


def _best(vocab: DataFrame) -> DataFrame:
    """1-row argmax pair: (l, r, total), ties to the lexicographically
    smallest (l, r)."""
    return _pair_totals(vocab).orderBy(
        F.col("total").desc(), F.col("l").asc(), F.col("r").asc()
    ).limit(1)


def bpe_train(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(rank, lsym, rsym, merged, pair_n) — the learned merge table, one
    row per merge in training order, all inside one lazy plan."""
    vocab = _vocab(documents)
    out = None
    for k in range(1, n_merges + 1):
        best = _best(vocab)
        row = best.select(
            F.lit(k).alias("rank"),
            F.col("l").alias("lsym"),
            F.col("r").alias("rsym"),
            F.concat("l", "r").alias("merged"),
            F.col("total").cast("long").alias("pair_n"),
        )
        out = row if out is None else out.unionByName(row)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("l", "r")))
            .withColumn("syms", F.expr(_APPLY))
            .select("word", "n", "syms")
        )
    return out


def bpe_tokenize(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(doc_id, n_tokens_char, n_tokens_bpe): per-document token counts
    before/after applying the learned merges — the compression evidence.
    The merge chain is rebuilt lazily (same plan as bpe_train); docs join
    the final vocab on word, so the corpus-side cost is one explode +
    one broadcast join + one doc_id reduce."""
    vocab = _vocab(documents)
    for _ in range(n_merges):
        best = _best(vocab)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("l", "r")))
            .withColumn("syms", F.expr(_APPLY))
            .select("word", "n", "syms")
        )
    words = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    sized = vocab.select("word", F.size("syms").alias("n_bpe"), F.length("word").alias("n_char"))
    return (
        words.join(F.broadcast(sized), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_char").cast("long").alias("n_tokens_char"),
            F.sum("n_bpe").cast("long").alias("n_tokens_bpe"),
        )
    )


def _oracle_ctes(n_merges: int) -> list[str]:
    """Chained-CTE replay of the K merges (DuckDB list indexing is
    1-based; the comprehension mirrors _APPLY)."""
    ctes = [
        """vocab0 AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS n, string_split(word, '') AS syms
          FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          WHERE length(word) > 0 GROUP BY word
        )"""
    ]
    for k in range(1, n_merges + 1):
        v = f"vocab{k - 1}"
        ctes.append(
            f"""pairs{k} AS (
          SELECT l, r, CAST(SUM(n) AS BIGINT) AS total FROM (
            SELECT n,
                   unnest([syms[i] for i in generate_series(1, len(syms) - 1)]) AS l,
                   unnest([syms[i + 1] for i in generate_series(1, len(syms) - 1)]) AS r
            FROM {v}
          ) WHERE l != r GROUP BY 1, 2
        ), best{k} AS (
          SELECT l, r, total,
                 ROW_NUMBER() OVER (ORDER BY total DESC, l ASC, r ASC) AS rn
          FROM pairs{k} QUALIFY rn = 1
        ), vocab{k} AS (
          SELECT word, n,
                 flatten([CASE
                   WHEN i < len(syms) AND syms[i] = b.l AND syms[i + 1] = b.r
                     THEN [syms[i] || syms[i + 1]]
                   WHEN i > 1 AND syms[i - 1] = b.l AND syms[i] = b.r
                     THEN []
                   ELSE [syms[i]] END
                   for i in generate_series(1, len(syms))]) AS syms
          FROM {v}, best{k} b
        )"""
        )
    return ctes


def bpe_train_oracle_sql(n_merges: int = N_MERGES) -> str:
    ctes = _oracle_ctes(n_merges)
    selects = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, l AS lsym, r AS rsym, l || r AS merged, total AS pair_n FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


def bpe_tokenize_oracle_sql(n_merges: int = N_MERGES) -> str:
    ctes = _oracle_ctes(n_merges)
    ctes.append(
        f"""sized AS (
          SELECT word, CAST(length(word) AS INT) AS n_char,
                 CAST(len(syms) AS INT) AS n_bpe
          FROM vocab{n_merges}
        ), wx AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        )"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
        SELECT doc_id, CAST(SUM(n_char) AS BIGINT) AS n_tokens_char,
               CAST(SUM(n_bpe) AS BIGINT) AS n_tokens_bpe
        FROM wx JOIN sized USING (word)
        WHERE length(word) > 0 GROUP BY doc_id"""
    )
