"""Link analysis over the document graph: fixed-iteration PageRank.

Web-scale curation pipelines weight documents by link centrality
(PageRank / harmonic centrality over the crawl's host graph — the
quality prior CommonCrawl-derived corpora use alongside text filters).
This module implements the batch PageRank step the way a Spark engine
should: K unrolled join+aggregate rounds over an edge table, everything
map-side-combinable, no driver fixpoint (K is fixed, so the whole
computation is ONE declarative plan Catalyst can see end-to-end).

The synthetic link graph is a pure function of doc_id (the corpus
carries no real hyperlinks): every node emits OUT_DEGREE edges — edge 0
lands on one of HUBS hub nodes (engineered in-degree skew, the shape a
real host graph has) and the rest land uniformly via the shared 48-bit
md5 fold (`sketch.hash48`), so the DuckDB oracle regenerates the exact
same graph.

All arithmetic is BIGINT fixed point so ranks are bit-identical across
engines AND shuffle orders (integer sums are order-independent;
floating-point PageRank is not):

    r_0(v)     = SCALE // N
    contrib(e) = r_t(src) // OUT_DEGREE
    r_{t+1}(v) = (0.15 * SCALE) // N  +  (85 * sum(contribs_in)) // 100

Dangling mass: none by construction (every node has exactly OUT_DEGREE
out-edges), which keeps the recurrence exact without a global
redistribution term.

Scale shape: the edge table is 4x the corpus (a projection, no
shuffle to build); each round is one shuffle keyed by dst for the
contribution sum plus one left join back to nodes.  The hub skew is
absorbed by partial aggregation — SUM combines map-side, so a node with
10^9 in-links costs each mapper one row, not the reducer 10^9 rows.  At
a real 10^12-edge graph you would persist the edge table once and reuse
it across rounds (here it is a cheap re-projection of the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch import hash48, sql_hash48

SCALE = 1_000_000_000_000  # fixed-point denominator for ranks
OUT_DEGREE = 4
HUBS = 16
ITERS = 3


def _edges(nodes: DataFrame) -> DataFrame:
    """(src, dst) with OUT_DEGREE edges per node: edge 0 -> hub bucket,
    edges 1..D-1 -> uniform.  ``nodes`` must carry (doc_id, n)."""
    j = F.explode(F.array(*[F.lit(i) for i in range(OUT_DEGREE)])).alias("j")
    e = nodes.select("doc_id", "n", j)
    uniform = F.pmod(
        hash48(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("j").cast("string"))),
        F.col("n"),
    )
    hub = F.pmod(
        hash48(F.concat(F.col("doc_id").cast("string"), F.lit(":h"))),
        F.least(F.lit(HUBS).cast("long"), F.col("n")),
    )
    return e.select(
        F.col("doc_id").alias("src"),
        "n",
        F.when(F.col("j") == 0, hub).otherwise(uniform).alias("dst"),
    )


def pagerank(documents: DataFrame, iters: int = ITERS) -> DataFrame:
    """(doc_id, in_deg, rank): integer-exact PageRank after ``iters``
    unrolled rounds over the deterministic doc_id link graph."""
    n = documents.agg(F.count(F.lit(1)).alias("n"))
    nodes = documents.select("doc_id").crossJoin(F.broadcast(n))
    edges = _edges(nodes)
    base = F.expr(f"CAST({15 * SCALE // 100} DIV n AS BIGINT)")
    ranks = nodes.select("doc_id", "n", F.expr(f"CAST({SCALE} DIV n AS BIGINT)").alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(
                ranks.select(F.col("doc_id").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.expr(f"rank DIV {OUT_DEGREE}")).alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes.doc_id == contribs.dst, "left")
            .select(
                nodes.doc_id.alias("doc_id"),
                "n",
                (base + F.expr("CAST(85 * coalesce(s, CAST(0 AS BIGINT)) DIV 100 AS BIGINT)")).alias(
                    "rank"
                ),
            )
        )
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    return (
        ranks.join(in_deg, ranks.doc_id == in_deg.dst, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("d"), F.lit(0).cast("long")).alias("in_deg"),
            "rank",
        )
    )


def pagerank_oracle_sql(iters: int = ITERS) -> str:
    """DuckDB SQL replaying the identical graph + recurrence (chained
    CTEs, one per round) — bit-exact, not a tolerance check."""
    h_uniform = sql_hash48("CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
    h_hub = sql_hash48("CAST(doc_id AS VARCHAR) || ':h'")
    js = ", ".join(str(i) for i in range(OUT_DEGREE))
    parts = [
        f"""WITH cnt AS (SELECT COUNT(*) AS n FROM documents),
        nodes AS (SELECT doc_id, n FROM documents, cnt),
        edges AS MATERIALIZED (
          SELECT doc_id AS src,
                 CASE WHEN j = 0 THEN {h_hub} % LEAST({HUBS}, n)
                      ELSE {h_uniform} % n END AS dst
          FROM nodes, UNNEST([{js}]) AS t(j)
        ),
        r0 AS (SELECT doc_id, n, {SCALE} // n AS rank FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""c{t} AS (
          SELECT dst, SUM(rank // {OUT_DEGREE}) AS s
          FROM edges JOIN r{t - 1} ON src = doc_id GROUP BY dst
        ),
        r{t} AS (
          SELECT doc_id, n,
                 ({15 * SCALE // 100} // n)
                 + (85 * COALESCE(s, 0)) // 100 AS rank
          FROM nodes LEFT JOIN c{t} ON dst = doc_id
        )"""
        )
    body = ",\n".join(parts)
    return f"""{body},
        deg AS (SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst)
        SELECT r{iters}.doc_id,
               CAST(COALESCE(d, 0) AS BIGINT) AS in_deg,
               CAST(rank AS BIGINT) AS rank
        FROM r{iters} LEFT JOIN deg ON dst = r{iters}.doc_id"""
