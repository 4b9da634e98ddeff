"""robots.txt crawl gate — parse per-host robots documents and decide
URL admissibility with Google-style longest-match semantics (RFC 9309):
among the rules whose path-prefix matches, the LONGEST prefix wins; on a
length tie Allow beats Disallow; no matching rule means allowed.

Everything is JVM expression work: the robots text parse is
split/filter/regexp_extract over the (host, robots_txt) dimension, the
gate is one broadcast join (the rules table is O(hosts) — tiny at any
corpus scale) plus one max_by aggregate per URL.  At 100 TB the URL side
never shuffles for the join, and the aggregate keys on the URL itself
(uniform).  No reference analog; north-star crawl-policy operator.

Synth side: each host's robots.txt derives deterministically from its
host index, and each doc's URL gets one of five path classes — the
oracle restates both formulas analytically, so the PARSER and the
MATCHER are what the value hash checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import N_HOSTS  # one source of truth for the synth vhost fan-out


def synth_robots_txt(h: int) -> str:
    """Deterministic robots.txt for host index ``h`` (single ``*`` group;
    comments and blank lines included so the parser earns its keep)."""
    lines = ["# synthetic robots for host%d" % h, "User-agent: *", ""]
    if h == 5:
        lines.append("Disallow: /")  # full host block
    lines.append("Disallow: /private/")
    if h % 3 == 0:
        lines.append("Disallow: /tmp/")
    if h % 2 == 1:
        # longest-match showcase: /doc/ blocked but /doc/archive/ re-allowed
        lines.append("Disallow: /doc/")
        lines.append("Allow: /doc/archive/")
    if h % 4 == 2:
        lines.append("Disallow: /search")
    return "\n".join(lines) + "\n"


def doc_path(doc_id_col):
    """Five deterministic path classes (plan expression, oracle-restatable)."""
    did = doc_id_col
    s = did.cast("string")
    cls = did % 5
    return (
        F.when(cls == 0, F.concat(F.lit("/doc/"), s))
        .when(cls == 1, F.concat(F.lit("/private/"), s))
        .when(cls == 2, F.concat(F.lit("/tmp/"), s))
        .when(cls == 3, F.concat(F.lit("/doc/archive/"), s))
        .otherwise(F.concat(F.lit("/search?q="), s))
    )


def robots_rules(spark) -> DataFrame:
    """(host, robots_txt) -> parsed rule table (host, prefix, is_allow,
    priority).  The parse is real: split lines, keep Allow:/Disallow:,
    extract the path prefix, drop empty-prefix rules (an empty Disallow
    means 'allow all' per RFC 9309 — contributes no rule).  priority =
    2*len(prefix) + is_allow encodes longest-match-then-allow-wins as a
    single integer max."""
    hosts = spark.createDataFrame(
        [(h, f"host{h}.example.org", synth_robots_txt(h)) for h in range(N_HOSTS)],
        "h long, host string, robots_txt string",
    )
    line = F.explode(F.split(F.col("robots_txt"), "\n")).alias("line")
    rules = (
        hosts.select("host", line)
        .filter(F.col("line").rlike(r"^(Allow|Disallow):"))
        .select(
            "host",
            F.regexp_extract("line", r"^(Allow|Disallow):\s*(\S*)", 2).alias("prefix"),
            (F.regexp_extract("line", r"^(Allow|Disallow):", 1) == "Allow")
            .cast("int")
            .alias("is_allow"),
        )
        .filter(F.col("prefix") != "")
    )
    return rules.withColumn(
        "priority", F.length("prefix") * 2 + F.col("is_allow")
    )


def crawl_gate(documents: DataFrame) -> DataFrame:
    """Per-document crawl admissibility: (doc_id, host, path, allowed,
    rule) where ``rule`` is the winning prefix ('' when no rule matched).
    One broadcast join URL×rules on host + prefix match, one max_by per
    doc; unmatched URLs default to allowed."""
    spark = documents.sparkSession
    did = F.col("doc_id")
    urls = documents.select(
        "doc_id",
        F.concat(F.lit("host"), (did % N_HOSTS).cast("string"), F.lit(".example.org")).alias(
            "host"
        ),
        doc_path(did).alias("path"),
    )
    rules = robots_rules(spark).withColumnRenamed("host", "rhost")
    # prefix match INSIDE the join condition: a URL with no matching rule
    # keeps exactly one all-NULL rule row (left join), never vanishes
    matched = urls.join(
        F.broadcast(rules),
        (urls["host"] == rules["rhost"])
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    return matched.groupBy("doc_id", "host", "path").agg(
        F.coalesce(
            F.max_by(F.col("is_allow") == 1, "priority"), F.lit(True)
        ).alias("allowed"),
        F.coalesce(F.max_by("prefix", "priority"), F.lit("")).alias("rule"),
    )
