"""Curation-pipeline operator tests: decontamination, PII scrub,
token chunking, canonical-document selection."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from pdfparser_spark.textops import curation


@pytest.fixture(scope="module")
def docs(spark):
    # doc 7 plays the eval set (doc_id % 10 == 7); doc 0 copies its text
    # verbatim (fully contaminated), doc 1 shares nothing, doc 2 shares a
    # suffix.  docs 3/4 are exact duplicates of each other (one LSH
    # cluster) with different doc_ids.
    rows = [
        Row(doc_id=0, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=1, text="one two three four five six seven"),
        Row(doc_id=2, text="unrelated words then delta epsilon zeta"),
        Row(doc_id=3, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=7, text="alpha beta gamma delta epsilon zeta"),
    ]
    return spark.createDataFrame(rows)


def test_decontaminate_counts(docs):
    res = {r.doc_id: r for r in curation.decontaminate(docs).collect()}
    assert 7 not in res  # eval docs are not scored
    # doc 0 == eval text: all 4 of its 3-grams overlap
    assert res[0].n_grams == 4 and res[0].n_overlap == 4
    assert res[0].contaminated is True and res[0].overlap_frac == 1.0
    # doc 1 shares nothing
    assert res[1].n_overlap == 0 and res[1].contaminated is False
    # doc 2 shares exactly the trailing 3-gram "delta epsilon zeta"
    assert res[2].n_overlap == 1
    # 1 of 4 grams = 25% >= 20% threshold
    assert res[2].contaminated is True


def test_pii_scrub_rules(docs):
    res = {r.doc_id: r for r in curation.pii_scrub(docs).collect()}
    for doc_id, r in res.items():
        assert r.n_emails == (1 if doc_id % 3 != 0 else 0)
        assert r.n_phones == (1 if doc_id % 4 == 1 else 0)
        assert r.n_ips == (1 if doc_id % 5 == 2 else 0)
        if r.n_emails + r.n_phones + r.n_ips == 0:
            assert r.n_chars_redacted == 0
        else:
            assert r.n_chars_redacted > 0


def test_pii_scrub_redacts(spark):
    doc = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    r = curation.pii_scrub(doc).collect()[0]
    # doc 1: email (1%3!=0) + phone (1%4==1), no ip (1%5!=2)
    assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 0)
    expect = "hello world contact <EMAIL> call <PHONE>"
    assert r.scrubbed_md5 == hashlib.md5(expect.encode()).hexdigest()


def test_token_chunks_windows(spark):
    forty = " ".join(f"w{i}" for i in range(40))
    ten = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([Row(doc_id=0, text=forty), Row(doc_id=1, text=ten)])
    rows = sorted(curation.token_chunks(df).collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.start_tok, r.n_tok) for r in by_doc[0]] == [(0, 32), (24, 16)]
    assert [(r.start_tok, r.n_tok) for r in by_doc[1]] == [(0, 10)]
    # overlapping window content is the exact token slice
    expect0 = " ".join(f"w{i}" for i in range(24, 40))
    assert by_doc[0][1].chunk_md5 == hashlib.md5(expect0.encode()).hexdigest()


def test_canonical_docs_cluster(docs):
    res = curation.canonical_docs(docs).collect()
    assert any(r.n_members >= 2 for r in res)
    for r in res:
        # quality ties inside an identical-text cluster break to min doc_id
        if r.cluster_id == 3:
            assert r.canonical_doc_id == 3 and r.n_members == 2


def test_domain_mix_fair_share(spark):
    rows = [Row(doc_id=i, text="x", lang=("A" if i < 6 else "B")) for i in range(8)]
    res = {r.domain: r for r in curation.domain_mix(spark.createDataFrame(rows)).collect()}
    # total 8, two domains -> fair share 4: B (2 docs) keeps everything,
    # A (6 docs) downsamples at rate 4/6
    assert res["B"].n_kept == res["B"].n_docs == 2
    assert res["B"].target_rate == 1.0
    assert res["A"].n_docs == 6 and res["A"].target_rate == 0.6667
    assert 0 <= res["A"].n_kept <= 6


def test_rarity_scores_rank_math(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a a b"), Row(doc_id=1, text="b c")]
    )
    res = {r.doc_id: r for r in curation.rarity_scores(df).collect()}
    # counts: a=2 b=2 c=1 -> ranks a=1, b=2 (tie to 'a'), c=3
    assert res[0].n_words == 3 and res[0].max_rank == 2
    assert res[0].mean_rank == 1.3333
    assert res[1].n_words == 2 and res[1].max_rank == 3
    assert res[1].mean_rank == 2.5


def test_token_pack_bins_greedy(spark):
    # capacity 8, docs laid end-to-end in doc_id order within (lang, shard):
    # n_tokens 4,5,3,6 -> cum_before 0,4,9,12 -> packs 0,0,1,1
    rows = [
        Row(doc_id=0, text="a b c d", lang="A"),
        Row(doc_id=1, text="a b c d e", lang="A"),
        Row(doc_id=2, text="a b c", lang="A"),
        Row(doc_id=3, text="a b c d e f", lang="A"),
        Row(doc_id=500, text="a b", lang="A"),  # new shard: cum resets
        Row(doc_id=4, text="a b c d e f g h i", lang="B"),  # own lang stream
    ]
    res = {
        r.doc_id: r
        for r in curation.token_pack_bins(
            spark.createDataFrame(rows), capacity=8, shard=100
        ).collect()
    }
    assert (res[0].pack_id, res[0].pack_offset) == (0, 0)
    assert (res[1].pack_id, res[1].pack_offset) == (0, 4)
    assert (res[2].pack_id, res[2].pack_offset) == (1, 1)
    assert (res[3].pack_id, res[3].pack_offset) == (1, 4)
    assert (res[500].pack_id, res[500].pack_offset) == (0, 0)
    assert res[500].shard_id == 5
    assert (res[4].pack_id, res[4].pack_offset) == (0, 0)


def test_doclen_histogram_quantiles(spark):
    from pdfparser_spark.textops import sketch

    # bit-length buckets: 5 -> 3, 12 -> 4, 300 -> 9; lang A has 3 docs in
    # bucket 3 and 1 in bucket 9 -> p50 = bucket 3 (cum 3 of 4), p95 = 9
    rows = [
        Row(doc_id=0, lang="A", n_chars=5),
        Row(doc_id=1, lang="A", n_chars=6),
        Row(doc_id=2, lang="A", n_chars=7),
        Row(doc_id=3, lang="A", n_chars=300),
        Row(doc_id=4, lang="B", n_chars=12),
    ]
    res = {r.lang: r for r in sketch.doclen_histogram(spark.createDataFrame(rows)).collect()}
    assert res["A"].n_docs == 4 and res["A"].n_buckets == 2
    assert res["A"].p50_bucket == 3 and res["A"].p50_hi == 7
    assert res["A"].p95_bucket == 9
    assert res["B"].p50_bucket == 4 and res["B"].p50_hi == 15


def test_model_classifier_generalizes(spark, sf_dir):
    """The nearest-centroid quality classifier must beat the majority-class
    baseline on documents it never trained on (doc_id % 10 == 9)."""
    import os

    from pdfparser_spark.textops import model

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = model.centroid_classifier(docs).collect()
    held = [r for r in rows if r.heldout == 1]
    assert held, "held-out split is empty"
    acc = sum(r.correct for r in held) / len(held)
    labels = [r.label for r in rows]
    majority = max(labels.count("hi"), labels.count("lo")) / len(labels)
    assert acc >= 0.8, f"held-out accuracy {acc:.2f} below floor"
    assert acc > majority + 0.1, f"no better than majority ({majority:.2f})"


def test_pagerank_invariants(spark, sf_dir):
    """Integer PageRank: rank mass conserved up to floor losses, every
    node keeps the teleport floor, hubs absorb the engineered skew."""
    import os

    from pdfparser_spark.textops import graph

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = graph.pagerank(docs).collect()
    n = len(rows)
    total = sum(r.rank for r in rows)
    # each round floors at most 1 unit per edge contribution + 1 per node
    assert graph.SCALE - n * (graph.OUT_DEGREE + 2) * (graph.ITERS + 1) < total <= graph.SCALE
    base = 15 * graph.SCALE // 100 // n
    assert all(r.rank >= base for r in rows)
    assert sum(r.in_deg for r in rows) == graph.OUT_DEGREE * n
    # hub nodes (doc_id < HUBS) receive ~N/HUBS extra in-links each
    hub_deg = sum(r.in_deg for r in rows if r.doc_id < graph.HUBS)
    assert hub_deg > n  # >= the whole hub-edge mass, far above uniform share


def test_bloom_semi_join_no_false_negatives(spark, sf_dir):
    """Every true match passes the bloom (superset guarantee); the plan
    probes via broadcast joins, never a shuffled exchange of lineitem."""
    import os

    from pdfparser_spark import relops

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    res = relops.bloom_semi_join(li, od).collect()
    assert res, "no groups returned"
    for r in res:
        assert r.n_false_pos >= 0  # bloom is a superset of truth
        assert r.n_bloom_pass == r.n_true_match + r.n_false_pos
    # truth check: exact semi-join counts must equal the operator's
    from pyspark.sql import functions as F

    exact = (
        li.join(
            od.filter(F.col("o_totalprice") >= relops.PRICE_CUT),
            li.l_orderkey == od.o_orderkey,
            "left_semi",
        )
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    exact_m = {r.l_returnflag: r["count"] for r in exact}
    for r in res:
        assert r.n_true_match == exact_m.get(r.l_returnflag, 0)
    plan = relops.bloom_semi_join(li, od)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_bucket_join_matches_bruteforce(spark, sf_dir):
    """The bucket-expanded range join equals a literal inequality join on
    the same input, and its physical plan contains no nested-loop or
    cartesian join — the point of the bucket trick."""
    import os

    from pyspark.sql import functions as F

    from pdfparser_spark import relops

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    df = relops.range_bucket_join(ev)
    got = {r.minute_id: (r.n_events, r.n_users) for r in df.collect()}
    assert got, "no busy minutes at this SF"

    # brute force: plain inequality join (tiny at test SF)
    e = ev.select(F.unix_timestamp("ts").cast("long").alias("e_sec"), "user_id")
    busy = (
        e.groupBy(F.floor(F.col("e_sec") / 60).cast("long").alias("minute_id"))
        .count()
        .filter(F.col("count") >= relops.BUSY_K)
        .select(
            "minute_id",
            (F.col("minute_id") * 60 - 30).alias("lo"),
            (F.col("minute_id") * 60 + 90).alias("hi"),
        )
    )
    brute = (
        e.join(
            busy,
            (F.col("e_sec") >= F.col("lo")) & (F.col("e_sec") < F.col("hi")),
        )
        .groupBy("minute_id")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("u"))
        .collect()
    )
    assert {r.minute_id: (r.n, r.u) for r in brute} == got

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_beats_scattered_layout(spark, sf_dir):
    """Z-order layout must prune strictly more files than the scattered
    baseline for the same predicate, without losing any matching rows."""
    import os

    from pdfparser_spark import zorder

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rep = {r.layout: r for r in zorder.zorder_skipping_report(docs).collect()}
    z, sc = rep["zorder"], rep["scattered"]
    assert z.rows_matching == sc.rows_matching  # pruning never drops matches
    assert z.rows_matching > 0  # predicate cell is populated
    assert z.files_scanned < sc.files_scanned
    assert z.rows_scanned < sc.rows_scanned
    # scattered layout degenerates to scan-everything
    assert sc.files_scanned == sc.n_files


def test_zorder_codes_cluster_on_disk(spark, tmp_path):
    """Writing the corpus partitioned by z-file yields a scan whose
    partition filter prunes directories (the manifest-skipping effect,
    realized by Spark's own partition pruning)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from pdfparser_spark import zorder

    rows = [
        Row(doc_id=i, lang=f"l{i % 5}", n_chars=50 + 37 * i, text="x")
        for i in range(200)
    ]
    codes = zorder.zorder_codes(spark.createDataFrame(rows))
    out = str(tmp_path / "ztab")
    cells = (1 << (2 * zorder.DIM_BITS)) // zorder.N_FILES
    codes.withColumn("z_file", F.expr(f"zcode DIV {cells}")).write.partitionBy(
        "z_file"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("z_file") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(z_file" in plan
    got = {r.doc_id for r in back.collect()}
    want = {
        r.doc_id for r in codes.collect() if r.zcode // cells == 1
    }
    assert got == want and want


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Both sides bucketed on the join key: the SortMergeJoin consumes
    bucket files directly — the only exchange left is the final agg's."""
    import os

    from pdfparser_spark import relops

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    df = relops.bucketed_colocated_join(li, od)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the aggregation only
    assert "SortMergeJoin" in plan
    res = {r.l_returnflag: r for r in df.collect()}
    # values equal the plain (shuffled) join — layout never changes answers
    from pyspark.sql import functions as F

    base = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    for r in base:
        assert res[r.l_returnflag].n_items == r["count"]


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from pdfparser_spark.textops import events

    stream_res = events.stream_static_enrichment(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(sf_dir, "customer.parquet"),
    )
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    batch = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .join(F.broadcast(cu), ev.user_id == cu.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "c_mktsegment", "n_events")
    )
    sr = stream_res.select("window_start", "c_mktsegment", "n_events")
    assert sr.exceptAll(batch).count() == 0
    assert batch.exceptAll(sr).count() == 0


def test_salted_skew_join_equals_plain_join_and_spreads_hot_key(spark, sf_dir):
    """The salted join's result equals the plain (unsalted) join, the
    pinned plan really is a SortMergeJoin (no broadcast — salting is the
    fix for a dim too big to broadcast), and the hot key's fact rows
    genuinely spread across multiple salt values."""
    import os

    from pyspark.sql import functions as F

    from pdfparser_spark import relops
    from pdfparser_spark.textops.sketch import hash48

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    salted = relops.salted_skew_join(ev)
    got = {r.grp: (r.grp_owner, r.n_events, r.total_cents) for r in salted.collect()}

    fact = ev.select(
        "event_id",
        F.when(F.col("user_id") % 10 < 7, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        "user_id",
    )
    dim = fact.groupBy("grp").agg(F.min("user_id").alias("grp_owner"))
    plain = (
        fact.join(dim, "grp")
        .groupBy("grp", "grp_owner")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("total_cents"))
    )
    want = {r.grp: (r.grp_owner, r.n_events, r.total_cents) for r in plain.collect()}
    assert got == want

    # the skew is real (hot group dominates) and the salt spreads it
    assert want["hot"][1] > 0.5 * sum(v[1] for v in want.values())
    n_salts = (
        fact.filter(F.col("grp") == "hot")
        .select(
            F.pmod(
                hash48(F.concat(F.col("event_id").cast("string"), F.lit("#skewsalt"))),
                F.lit(relops.SKEW_SALTS).cast("long"),
            ).alias("salt")
        )
        .distinct()
        .count()
    )
    assert n_salts >= relops.SKEW_SALTS // 2, n_salts

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_leakage_safe_splits_invariants(spark, sf_dir):
    """Every doc gets exactly one split; ~80/10/10; and the leakage
    guarantee: all members of a duplicate cluster share one split."""
    from pdfparser_spark.textops.curation import leakage_safe_splits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = leakage_safe_splits(docs).collect()
    assert len(rows) == docs.count()
    by_cluster: dict = {}
    counts = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        counts[r.split] += 1
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values()), "cluster straddles splits"
    n = len(rows)
    assert counts["train"] > 0.6 * n and counts["val"] > 0 and counts["test"] > 0
    # real multi-member clusters exist in the corpus (the guarantee bites)
    from pdfparser_spark.textops.dedup import dedup_clusters

    sizes = [r["count"] for r in dedup_clusters(docs).groupBy("cluster_id").count().collect()]
    assert any(sz >= 2 for sz in sizes)


def test_curation_pipeline_end_to_end(spark, sf_dir):
    """The composed extract->reassemble->gate->dedup chain: every doc's
    reassembled text equals its analytic truncation, short docs are
    gated out, the injected duplicates collapse to min-doc_id canonicals
    with n_copies > 1."""
    import duckdb

    from pyspark.sql import functions as F

    from __spark_entry__ import _curation_pipeline

    df = _curation_pipeline(spark, sf_dir)
    rows = {r.doc_id: r for r in df.collect()}
    multi = [r for r in rows.values() if r.n_copies > 1]
    assert multi, "duplicate injection must produce multi-copy clusters"
    # canonical ids are cluster minima.  True duplicate pairs are
    # (d-21, d) for d in {27, 34, 41}: the single-level remap gives doc d
    # the ORIGINAL text of d-21, and d-21 < 21 still carries it (sources
    # >= 21 are themselves remapped, so longer chains don't duplicate).
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    ids = {d for d, _t in docs}
    for d in (27, 34, 41):
        if d in ids and (d - 21) in rows:
            assert d not in rows  # collapsed into the earlier canonical
            assert rows[d - 21].n_copies >= 2
    # no canonical under the quality gate
    assert all(r.n_words >= 10 for r in rows.values())


def test_dpp_day_rollup_prunes_partitions(spark, sf_dir, tmp_path):
    """The fact scan must carry a runtime partition filter (DPP) derived
    from the day dim — whole unselected day directories never read."""
    import os

    from pdfparser_spark.relops import partition_pruned_rollup

    df = partition_pruned_rollup(
        spark, os.path.join(sf_dir, "events.parquet"), str(tmp_path / "dppev")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    rows = {r.day.isoformat(): r.n_events for r in df.collect()}
    assert rows and all(int(d[8:10]) % 7 == 3 for d in rows)


def test_dsir_select_fixed_point_replay(spark):
    """dsir_select must equal a pure-Python replay of the fixed-point
    algebra (rates -> delta -> per-doc sum) on a small mixed corpus."""
    import hashlib as _h

    from pyspark.sql import Row

    from pdfparser_spark.textops.curation import DSIR_DIMS, DSIR_SCALE, dsir_select

    rows = [
        Row(doc_id=0, lang="en", text="spark join filter window agg"),
        Row(doc_id=1, lang="en", text="join window window table scan"),
        Row(doc_id=2, lang="de", text="der die das join und oder"),
        Row(doc_id=3, lang="zh", text="der die das und oder oder"),
        Row(doc_id=4, lang="en", text="scan scan filter agg table"),
    ]

    def bucket(w):
        h = _h.md5(w.encode()).hexdigest()
        return (ord(h[0]) * 31 + ord(h[1])) % DSIR_DIMS

    toks = [(r.doc_id, r.lang, bucket(w)) for r in rows for w in r.text.split(" ")]

    def rates(sel):
        cnt = {}
        for _d, _l, b in sel:
            cnt[b] = cnt.get(b, 0) + 1
        total = sum(cnt.values())
        return {b: (c * DSIR_SCALE) // total for b, c in cnt.items()}

    q_raw = rates(toks)
    q_tgt = rates([t for t in toks if t[1] == "en"])
    exp = {}
    for d, _l, b in toks:
        nw, sc = exp.get(d, (0, 0))
        exp[d] = (nw + 1, sc + q_tgt.get(b, 0) - q_raw[b])

    got = {
        r.doc_id: (r.n_words, r.dsir_score, r.selected)
        for r in dsir_select(spark.createDataFrame(rows)).collect()
    }
    assert got == {d: (nw, sc, int(sc >= 0)) for d, (nw, sc) in exp.items()}
    # the en docs must gate in, the non-en must gate out on this corpus
    assert [got[d][2] for d in range(5)] == [1, 1, 0, 0, 1]


def test_dsir_select_separates_target_slice(spark, sf_dir):
    """On the real documents table the en slice must be enriched among the
    selected docs relative to its corpus share."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = curation.dsir_select(docs).join(docs.select("doc_id", "lang"), "doc_id")
    rows = res.groupBy((res.lang == "en").alias("is_en"), "selected").count().collect()
    c = {(r.is_en, r.selected): r["count"] for r in rows}
    en_rate = c.get((True, 1), 0) / max(c.get((True, 1), 0) + c.get((True, 0), 0), 1)
    other_rate = c.get((False, 1), 0) / max(c.get((False, 1), 0) + c.get((False, 0), 0), 1)
    assert en_rate > other_rate


def test_unicode_normalize_folds_combining_sequences(spark):
    from pdfparser_spark.textops.curation import unicode_normalize

    df = spark.createDataFrame(
        [
            (1, "café latte"),   # e + combining acute -> é
            (2, "plain ascii"),
            (3, None),
            (4, "öö"),          # two ö in NFD
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unicode_normalize(df).collect()}
    assert rows[1]["norm_text"] == "café latte" and rows[1]["n_folded"] == 1
    assert rows[1]["changed"] is True
    assert rows[2]["changed"] is False and rows[2]["n_folded"] == 0
    assert rows[3]["norm_text"] == "" and rows[3]["changed"] is False
    assert rows[4]["norm_text"] == "öö" and rows[4]["n_folded"] == 2
    import pytest

    with pytest.raises(ValueError):
        unicode_normalize(df, form="NFKC")
