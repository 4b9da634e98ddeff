"""URL canonicalization + canonical-URL dedup — the first curation pass a
web crawl runs (before any content dedup): the same page arrives under
uppercase hosts, default ports, fragments, tracking parameters and
shuffled query strings, and collapsing those variants is pure string
algebra — no reason to leave the JVM.

Everything here is built-in-expression only (split / filter / sort_array /
array_join — whole-stage-codegen friendly, no Python in the hot path), so
at 100 TB the canonicalize step fuses into the scan and the only shuffle
is the final canonical-key aggregate.

No reference analog (the reference never sees URLs); north-star operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never identify content (the classic strip list)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")

# vhost fan-out of the synthetic web model — shared by the WARC writer,
# the messy-URL variants and the robots rule set (one source of truth so
# host assignment can never desynchronize across the synth families)
N_HOSTS = 13


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    * scheme and host lowercased (path/query case is significant — kept);
    * default port stripped (``:80`` for http, ``:443`` for https);
    * fragment dropped;
    * tracking parameters (``utm_*``, ``fbclid``, ``gclid``) removed;
    * remaining query parameters sorted bytewise; ``?`` omitted if none.
    """
    # F.get (not getItem): absent parts become NULL instead of an ANSI
    # out-of-bounds error on port-less / query-less / path-less URLs
    no_frag = F.split(url, "#", 2).getItem(0)
    scheme = F.lower(F.split(no_frag, "://", 2).getItem(0))
    rest = F.coalesce(F.get(F.split(no_frag, "://", 2), 1), F.lit(""))
    # strip the query BEFORE splitting on '/': a URL like
    # http://h.example.org?a=1 has its query ahead of any slash, and
    # splitting on '/' first would fold '?a=1' into the host
    query = F.get(F.split(rest, r"\?", 2), 1)
    rest_nq = F.split(rest, r"\?", 2).getItem(0)
    hostport = F.split(rest_nq, "/", 2).getItem(0)
    # path, leading slash re-attached ('' when the URL ends at host)
    path = F.coalesce(F.get(F.split(rest_nq, "/", 2), 1), F.lit(""))
    host = F.lower(F.split(hostport, ":", 2).getItem(0))
    port = F.get(F.split(hostport, ":", 2), 1)
    default_port = (
        port.isNull()
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    hostpart = F.when(default_port, host).otherwise(F.concat(host, F.lit(":"), port))
    def _keep(p: Column) -> Column:
        tracked = p.startswith(TRACKING_PREFIXES[0])
        for pfx in TRACKING_PREFIXES[1:]:
            tracked = tracked | p.startswith(pfx)
        return (p != "") & ~tracked

    kept = F.array_join(
        F.sort_array(F.filter(F.split(F.coalesce(query, F.lit("")), "&"), _keep)),
        "&",
    )
    base = F.concat(scheme, F.lit("://"), hostpart, F.lit("/"), path)
    return F.when(kept == "", base).otherwise(F.concat(base, F.lit("?"), kept))


def messy_url_variants(documents: DataFrame, k: int = 4) -> DataFrame:
    """Deterministic synth: each doc's true URL dressed up ``k`` ways —
    variant classes (cycled from ``doc_id``): 0 plain with shuffled params,
    1 uppercase scheme+host with an explicit :80, 2 fragment appended,
    3 tracking params injected.  All k variants canonicalize to ONE url,
    so the downstream dedup must collapse exactly k -> 1.  Built as plan
    expressions (not a kernel) so the oracle can restate it in SQL."""
    did = F.col("doc_id")
    host = F.concat(F.lit("host"), (did % N_HOSTS).cast("string"), F.lit(".example.org"))
    path = F.concat(F.lit("/doc/"), did.cast("string"))
    qa = F.concat(F.lit("a="), (did % 7).cast("string"))
    qb = F.concat(F.lit("b="), (did % 5).cast("string"))
    raw_q = F.concat(qb, F.lit("&"), qa)  # deliberately unsorted
    variants = []
    for j in range(k):
        v = (did + j) % 4
        plain = F.concat(F.lit("http://"), host, path, F.lit("?"), raw_q)
        upper = F.concat(
            F.lit("HTTP://"), F.upper(host), F.lit(":80"), path, F.lit("?"), raw_q
        )
        frag = F.concat(plain, F.lit("#frag"), did.cast("string"))
        tracked = F.concat(
            F.lit("http://"),
            host,
            path,
            F.lit("?utm_source=feed&"),
            raw_q,
            F.lit("&utm_campaign=c"),
            did.cast("string"),
        )
        variants.append(
            F.when(v == 0, plain).when(v == 1, upper).when(v == 2, frag).otherwise(tracked)
        )
    return documents.select(
        "doc_id", F.explode(F.array(*variants)).alias("url")
    )


def url_dedup_canonical(documents: DataFrame, k: int = 4) -> DataFrame:
    """Canonical-URL dedup over the messy variant table: canonicalize each
    raw URL, then ONE hash aggregate per canonical key -> (canon_url,
    n_raw, n_distinct_raw).  The canonical strings themselves are what the
    oracle checks — every normalization rule is load-bearing."""
    raw = messy_url_variants(documents, k)
    return (
        raw.withColumn("canon_url", canonicalize_url(F.col("url")))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("url").alias("n_distinct_raw"),
        )
    )
