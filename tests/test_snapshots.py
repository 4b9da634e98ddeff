"""Snapshot log (Iceberg-shaped commit protocol) + incremental extraction."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from pdfparser_spark.pipeline import Pipeline
from pdfparser_spark.snapshots import SnapshotLog, extract_increment
from pdfparser_spark.stages import flatten_spans, synthesize_corpus


def _docs(spark, n, start=0):
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [(i, " ".join(words[(i + k) % 10] for k in range(5))) for i in range(start, start + n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flat_sorted(spans_df):
    return sorted(map(tuple, flatten_spans(spans_df).collect()))


def test_incremental_extracts_only_delta_and_matches_full(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    first = extract_increment(spark, synthesize_corpus(_docs(spark, 6)), log)
    assert first["snapshot_id"] == 1 and first["added_docs"] == 6

    # second commit feeds the FULL corpus; only the 4 new docs may flow
    full = synthesize_corpus(_docs(spark, 10))
    second = extract_increment(spark, full, log)
    assert second["snapshot_id"] == 2
    assert second["added_docs"] == 4
    delta_ids = {r["doc_id"] for r in second["delta"].select("doc_id").collect()}
    assert delta_ids == {6, 7, 8, 9}

    # HEAD read == one-shot extraction of the full corpus
    oneshot = Pipeline(spark, work_dir=None).run(synthesize_corpus(_docs(spark, 10)))
    assert _flat_sorted(second["spans"]) == _flat_sorted(oneshot["spans"])


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 3)), log)
    t_between = time.time()
    extract_increment(spark, synthesize_corpus(_docs(spark, 5)), log)

    assert log.read(spark, "spans").count() == 5
    assert log.read(spark, "spans", snapshot_id=1).count() == 3
    assert log.read(spark, "spans", as_of_ts=t_between).count() == 3
    # snapshot entries chain oldest-first with correct parents
    chain = log.chain()
    assert [s["snapshot_id"] for s in chain] == [1, 2]
    assert [s["parent_id"] for s in chain] == [None, 1]
    assert chain[1]["summary"]["added_docs"] == 2


def test_reads_plan_from_manifests_not_listing(spark, tmp_path):
    """A stray orphan dir (crashed writer) must be invisible to readers."""
    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 3)), log)
    orphan = log.new_data_dir("spans")  # allocated but never committed
    _docs(spark, 2, start=100).write.parquet(orphan)
    assert os.path.isdir(orphan)
    assert log.read(spark, "spans").count() == 3  # orphan not served


def test_append_rejects_schema_change(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    d1 = log.new_data_dir("t")
    _docs(spark, 2).write.parquet(d1)
    log.commit({"t": [d1]}, schemas={"t": _docs(spark, 1).schema.json()})
    d2 = log.new_data_dir("t")
    widened = _docs(spark, 2).withColumn("extra", F.lit(1))
    widened.write.parquet(d2)
    with pytest.raises(ValueError, match="schema change"):
        log.commit({"t": [d2]}, schemas={"t": widened.schema.json()})


def test_compact_and_expire(spark, tmp_path):
    from pdfparser_spark.snapshots import compact, expire_snapshots

    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 3)), log)
    extract_increment(spark, synthesize_corpus(_docs(spark, 6)), log)
    before = _flat_sorted(log.read(spark, "spans"))
    assert len(log.files_for("spans")) == 2

    # expiry without a compaction boundary must refuse (retained reads
    # would depend on expired dirs)
    with pytest.raises(ValueError, match="compact"):
        expire_snapshots(log, keep_from=2)

    sid = compact(log, spark, "spans")
    assert sid == 3
    # reads at HEAD now plan from ONE dir and are value-identical
    assert len(log.files_for("spans")) == 1
    assert _flat_sorted(log.read(spark, "spans")) == before
    # time travel below the compaction point still works pre-expiry
    assert log.read(spark, "spans", snapshot_id=1).count() == 3

    old_dirs = set(log.files_for("spans", snapshot_id=2))
    removed = expire_snapshots(log, keep_from=3)
    assert set(removed) == old_dirs
    assert not any(os.path.isdir(d) for d in old_dirs)
    # retained read unchanged; expired history gone
    assert _flat_sorted(log.read(spark, "spans")) == before
    with pytest.raises(FileNotFoundError):
        log.snapshot(1)
    # a further incremental append on the compacted log still works
    res = extract_increment(spark, synthesize_corpus(_docs(spark, 8)), log)
    assert res["added_docs"] == 2
    assert res["spans"].count() == 8


def test_empty_delta_commits_cleanly(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 4)), log)
    again = extract_increment(spark, synthesize_corpus(_docs(spark, 4)), log)
    assert again["added_docs"] == 0
    assert again["spans"].count() == 4


def test_manifest_stats_prune_file_skipping(spark, tmp_path):
    """Two appends with disjoint doc_id ranges: a ranged read must plan
    only the matching directory (manifest min/max skip), and the pruned
    read must equal the unpruned read + filter."""
    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 4)), log)          # ids 0-3
    extract_increment(spark, synthesize_corpus(_docs(spark, 8)), log)          # ids 4-7 delta

    all_dirs = log.files_for("spans")
    assert len(all_dirs) == 2
    # stats were recorded for both commits
    stats = log.stats_for("spans")
    assert sorted(tuple(s["cols"]["doc_id"]) for s in stats.values()) == [(0, 3), (4, 7)]

    dirs, skipped = log.plan_files("spans", where=("doc_id", 5, 7))
    assert skipped == 1 and len(dirs) == 1

    pruned = log.read(spark, "spans", where=("doc_id", 5, 7))
    unpruned = log.read(spark, "spans").filter(F.col("doc_id").between(5, 7))
    assert _flat_sorted(pruned) == _flat_sorted(unpruned)

    # fully-out-of-range: everything pruned, empty result, schema intact
    empty = log.read(spark, "spans", where=("doc_id", 100, 200))
    assert empty.count() == 0
    assert empty.columns == log.read(spark, "spans").columns


def test_manifest_stats_survive_compaction(spark, tmp_path):
    from pdfparser_spark.snapshots import compact

    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 3)), log)
    extract_increment(spark, synthesize_corpus(_docs(spark, 6)), log)
    compact(log, spark)
    # post-compaction plan is ONE dir carrying merged-range stats
    dirs, skipped = log.plan_files("spans", where=("doc_id", 0, 1))
    assert len(dirs) == 1 and skipped == 0
    stats = log.stats_for("spans")
    assert stats[dirs[0]]["cols"]["doc_id"] == [0, 5]
    # and an impossible range prunes the single compacted dir too
    dirs2, skipped2 = log.plan_files("spans", where=("doc_id", 50, 60))
    assert dirs2 == [] and skipped2 == 1


def test_equality_delete_merge_on_read(spark, tmp_path):
    from pdfparser_spark.snapshots import compact, delete_docs

    log = SnapshotLog(str(tmp_path / "log"))
    extract_increment(spark, synthesize_corpus(_docs(spark, 6)), log)
    sid = delete_docs(log, spark, [1, 4])
    assert log.snapshot(sid)["operation"] == "delete"

    # merge-on-read: HEAD drops the tombstoned docs, history still has them
    head_ids = {r.doc_id for r in log.read(spark, "spans").select("doc_id").distinct().collect()}
    assert head_ids == {0, 2, 3, 5}
    old_ids = {r.doc_id for r in log.read(spark, "spans", snapshot_id=1).select("doc_id").distinct().collect()}
    assert old_ids == {0, 1, 2, 3, 4, 5}

    # GLOBAL tombstone: re-ingesting a deleted doc keeps it suppressed
    extract_increment(spark, synthesize_corpus(_docs(spark, 8)), log)
    ids2 = {r.doc_id for r in log.read(spark, "spans").select("doc_id").distinct().collect()}
    assert ids2 == {0, 2, 3, 5, 6, 7}

    # compaction materializes the deletes: delete files stop applying and
    # the read stays identical
    compact(log, spark)
    assert log.delete_files_for("spans") == []
    ids3 = {r.doc_id for r in log.read(spark, "spans").select("doc_id").distinct().collect()}
    assert ids3 == {0, 2, 3, 5, 6, 7}


def test_schema_evolution_additive_only(spark, tmp_path):
    log = SnapshotLog(str(tmp_path / "log"))
    d1 = log.new_data_dir("t")
    base = _docs(spark, 3)
    base.write.parquet(d1)
    log.commit({"t": [d1]}, schemas={"t": base.schema.json()})

    # additive evolution: commit a widened schema explicitly
    widened = _docs(spark, 2, start=10).withColumn("score", F.lit(1.5))
    d2 = log.new_data_dir("t")
    widened.write.parquet(d2)
    log.commit({"t": [d2]}, operation="evolve", schemas={"t": widened.schema.json()})

    head = log.read(spark, "t")
    assert set(head.columns) == {"doc_id", "text", "score"}
    rows = {r.doc_id: r for r in head.collect()}
    assert rows[0].score is None and rows[10].score == 1.5
    # time travel below the evolution sees the old shape
    assert set(log.read(spark, "t", snapshot_id=1).columns) == {"doc_id", "text"}

    # dropping or retyping a column is rejected
    dropped = widened.select("doc_id", "score")
    d3 = log.new_data_dir("t")
    dropped.write.parquet(d3)
    with pytest.raises(ValueError, match="drop columns"):
        log.commit({"t": [d3]}, operation="evolve", schemas={"t": dropped.schema.json()})
    retyped = widened.withColumn("text", F.lit(1))
    with pytest.raises(ValueError, match="retype"):
        log.commit({"t": [d3]}, operation="evolve", schemas={"t": retyped.schema.json()})


def test_stream_to_snapshot_log_idempotent(spark, sf_dir, tmp_path):
    """Streaming foreachBatch commits into the log exactly once per
    micro-batch: a re-run over the same checkpoint adds nothing, a
    manually replayed batch-id is skipped, and the table equals the
    parquet file-sink result."""
    from pdfparser_spark.textops import events

    src = os.path.join(sf_dir, "events.parquet")
    root = str(tmp_path / "slog")
    first = events.stream_window_to_snapshot_log(spark, src, root)
    n_first = first.count()
    assert n_first > 0
    log = SnapshotLog(os.path.join(root, "log"))
    n_snaps = len(log.chain())
    batch_ids = [s["summary"]["stream_batch_id"] for s in log.chain()]
    assert len(set(batch_ids)) == n_snaps  # one commit per micro-batch

    # re-run with the same checkpoint: stream replays nothing, log unchanged
    again = events.stream_window_to_snapshot_log(spark, src, root)
    assert again.count() == n_first
    assert len(log.chain()) == n_snaps

    # simulate a crash-replay: committing an already-seen batch_id is a no-op
    done = {s["summary"]["stream_batch_id"] for s in log.chain()}
    assert batch_ids[0] in done

    # contents equal the plain file-sink variant (same emitted set)
    fsink = events.stream_window_file_sink(spark, src)
    assert first.exceptAll(fsink).count() == 0
    assert fsink.exceptAll(first).count() == 0


def test_vacuum_removes_only_orphans(spark, tmp_path):
    """A crashed writer's uncommitted dir is reclaimed; every dir any
    snapshot references survives, and reads are unchanged."""
    from pdfparser_spark.snapshots import vacuum

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    d1 = log.new_data_dir("t")
    df.write.parquet(d1)
    log.commit({"t": [d1]})
    # crash between write and commit: orphan dir, never referenced
    orphan = log.new_data_dir("t")
    df.write.parquet(orphan)
    # second committed append (also must survive)
    d2 = log.new_data_dir("t")
    df.withColumn("doc_id", F.col("doc_id") + 10).write.parquet(d2)
    log.commit({"t": [d2]})

    before = {r.doc_id for r in log.read(spark, "t").collect()}
    removed = vacuum(log)
    assert removed == [os.path.normpath(orphan)]
    assert not os.path.isdir(orphan)
    assert os.path.isdir(d1) and os.path.isdir(d2)
    after = {r.doc_id for r in log.read(spark, "t").collect()}
    assert after == before == set(range(5)) | set(range(10, 15))
    # idempotent
    assert vacuum(log) == []


def test_merge_upsert_replaces_and_inserts(spark, tmp_path):
    """Copy-on-write MERGE: matched keys updated, new keys inserted, one
    atomic replace snapshot; time travel preserves the pre-merge state."""
    from pdfparser_spark.snapshots import merge_upsert

    log = SnapshotLog(str(tmp_path / "log"))
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "doc_id long, text string"
    )
    d1 = log.new_data_dir("t")
    base.write.parquet(d1)
    s1 = log.commit({"t": [d1]})

    updates = spark.createDataFrame(
        [(2, "UPDATED"), (7, "NEW")], "doc_id long, text string"
    )
    s2 = merge_upsert(log, spark, updates, table="t")
    head = {r.doc_id: r.text for r in log.read(spark, "t").collect()}
    assert head == {0: "v0", 1: "v1", 2: "UPDATED", 3: "v3", 4: "v4", 7: "NEW"}
    # time travel below the merge sees the original values
    old = {r.doc_id: r.text for r in log.read(spark, "t", snapshot_id=s1).collect()}
    assert old[2] == "v2" and 7 not in old
    # the replace snapshot carries manifest stats for ranged-read skipping
    assert log.snapshot(s2)["stats"]["t"]


def test_change_data_feed(spark, tmp_path):
    """changes(from, to) emits exactly the appended rows and deleted keys
    between two snapshots; compaction emits nothing."""
    from pdfparser_spark.snapshots import changes, compact, delete_docs

    log = SnapshotLog(str(tmp_path / "log"))
    df1 = spark.createDataFrame([(i, f"v{i}") for i in range(3)], "doc_id long, text string")
    d1 = log.new_data_dir("t")
    df1.write.parquet(d1)
    s1 = log.commit({"t": [d1]})

    df2 = spark.createDataFrame([(10, "a"), (11, "b")], "doc_id long, text string")
    d2 = log.new_data_dir("t")
    df2.write.parquet(d2)
    log.commit({"t": [d2]})
    delete_docs(log, spark, [1], table="t")

    ins, dels = changes(log, spark, from_snapshot=s1, table="t")
    assert {r.doc_id for r in ins.collect()} == {10, 11}
    assert {r.doc_id for r in dels.collect()} == {1}

    # a consumer fully caught up sees an empty feed
    head = log.head_id()
    ins2, dels2 = changes(log, spark, from_snapshot=head, table="t")
    assert ins2 is None and dels2 is None

    # compaction rewrites layout, not content: no change rows emitted
    compact(log, spark, table="t")
    ins3, dels3 = changes(log, spark, from_snapshot=head, table="t")
    assert ins3 is None and dels3 is None


def test_delete_docs_keys_dataframe_path(spark, tmp_path):
    """delete_docs_keys: tombstone keys arriving as a DataFrame (the
    deletion-request-pipeline shape, no driver round-trip) suppress reads
    and surface in the change feed exactly like the list-based path."""
    from pdfparser_spark.snapshots import changes, delete_docs_keys

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(6)], "doc_id long, text string")
    d1 = log.new_data_dir("t")
    df.write.parquet(d1)
    s1 = log.commit({"t": [d1]})

    keys = spark.createDataFrame([(1,), (4,), (4,)], "doc_id long")  # dup keys collapse
    delete_docs_keys(log, keys, table="t")
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 2, 3, 5}
    _ins, dels = changes(log, spark, from_snapshot=s1, table="t")
    assert {r.doc_id for r in dels.collect()} == {1, 4}


def test_rollback_restores_reads_and_keeps_history(spark, tmp_path):
    """rollback(to) is a NEW replace commit whose reads equal the target's;
    time travel across the rolled-back commits keeps working, and no data
    directory is copied or deleted."""
    import pytest as _pytest

    from pdfparser_spark.snapshots import delete_docs, rollback

    log = SnapshotLog(str(tmp_path / "log"))

    def add(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = log.new_data_dir("t")
        df.write.parquet(d)
        return log.commit({"t": [d]})

    s1 = add([(i, f"v{i}") for i in range(3)])
    s2 = add([(10, "a"), (11, "b")])
    delete_docs(log, spark, [1], table="t")  # s3: bad deletion request

    rid = rollback(log, s1)
    assert rid == 4 and log.head_id() == 4
    # HEAD reads == the target's state (row 1 restored, batch 2 gone)
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 1, 2}
    # history intact: the bad snapshots still time-travel
    assert {r.doc_id for r in log.read(spark, "t", snapshot_id=s2).collect()} == {0, 1, 2, 10, 11}
    # appends continue on top of the rollback
    add([(20, "z")])
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 1, 2, 20}
    # a table absent at the target refuses to roll back
    d = log.new_data_dir("u")
    spark.createDataFrame([(1, "x")], "doc_id long, text string").write.parquet(d)
    log.commit({"u": [d]})
    with _pytest.raises(ValueError, match="did not exist"):
        rollback(log, s1)


def test_rollback_carries_in_force_deletes(spark, tmp_path):
    """Rolling back to a point AFTER a delete keeps that delete in force."""
    from pdfparser_spark.snapshots import delete_docs, rollback

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(4)], "doc_id long, text string")
    d1 = log.new_data_dir("t")
    df.write.parquet(d1)
    log.commit({"t": [d1]})
    delete_docs(log, spark, [2], table="t")  # s2: a delete we KEEP
    s2 = log.head_id()
    d2 = log.new_data_dir("t")
    spark.createDataFrame([(9, "bad")], "doc_id long, text string").write.parquet(d2)
    log.commit({"t": [d2]})  # s3: the bad append

    rollback(log, s2)
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 1, 3}


def test_incremental_rollup_refresh(spark, tmp_path):
    """The materialized rollup refreshed from the change feed equals the
    full recompute after every refresh; deletes are rejected."""
    import pytest as _pytest

    from pdfparser_spark.snapshots import delete_docs, refresh_rollup

    log = SnapshotLog(str(tmp_path / "log"))

    def add(rows):
        df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
        d = log.new_data_dir("docs")
        df.write.parquet(d)
        log.commit({"docs": [d]})

    add([(0, "en", 10), (1, "en", 20), (2, "fr", 5)])
    refresh_rollup(log, spark, "docs", "doc_stats")
    add([(3, "en", 7), (4, "de", 3)])
    add([(5, "fr", 100)])
    refresh_rollup(log, spark, "docs", "doc_stats")

    got = {
        r.lang: (r.n_docs, r.total_chars)
        for r in log.read(spark, "doc_stats").collect()
    }
    full = {
        r.lang: (r.n_docs, r.total_chars)
        for r in log.read(spark, "docs")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .collect()
    }
    assert got == full == {"en": (3, 37), "fr": (2, 105), "de": (1, 3)}

    # caught up: refresh is a no-op (head unchanged)
    h = log.head_id()
    assert refresh_rollup(log, spark, "docs", "doc_stats") == h

    # equality deletes in the unprocessed range are maintained
    # incrementally too (session-9 extension): the tombstoned keys'
    # values subtract as negative partials
    delete_docs(log, spark, [0], table="docs")
    add([(6, "zh", 1)])
    refresh_rollup(log, spark, "docs", "doc_stats")
    got = {
        r.lang: (r.n_docs, r.total_chars)
        for r in log.read(spark, "doc_stats").collect()
    }
    assert got == {"en": (2, 27), "fr": (2, 105), "de": (1, 3), "zh": (1, 1)}


def test_rollup_rebuild_after_deletes(spark, tmp_path):
    """rebuild=True recomputes from the delete-applied source state and
    restarts the incremental chain cleanly."""
    from pdfparser_spark.snapshots import delete_docs, refresh_rollup

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.createDataFrame(
        [(0, "en", 10), (1, "en", 20), (2, "fr", 5)],
        "doc_id long, lang string, n_chars long",
    )
    d = log.new_data_dir("docs")
    df.write.parquet(d)
    log.commit({"docs": [d]})
    refresh_rollup(log, spark, "docs", "doc_stats")
    delete_docs(log, spark, [1], table="docs")
    refresh_rollup(log, spark, "docs", "doc_stats", rebuild=True)
    got = {
        r.lang: (r.n_docs, r.total_chars)
        for r in log.read(spark, "doc_stats").collect()
    }
    assert got == {"en": (1, 10), "fr": (1, 5)}
    # incremental refreshes resume from the rebuild point
    d2 = log.new_data_dir("docs")
    spark.createDataFrame([(9, "en", 2)], "doc_id long, lang string, n_chars long").write.parquet(d2)
    log.commit({"docs": [d2]})
    refresh_rollup(log, spark, "docs", "doc_stats")
    got = {
        r.lang: (r.n_docs, r.total_chars)
        for r in log.read(spark, "doc_stats").collect()
    }
    assert got == {"en": (2, 12), "fr": (1, 5)}


def test_extract_stream_to_log_matches_batch(spark, sf_dir, tmp_path):
    """Streaming extraction (fused kernel lifted onto a stream) must land
    exactly the batch spans, and a re-run over the same checkpoint + log
    must not double-append (batch-id-idempotent commits)."""
    from pdfparser_spark.stages import extract_fused, flatten_spans, synthesize_corpus
    from pdfparser_spark.streaming import extract_stream_to_log

    root = str(tmp_path / "stream_extract")
    got = extract_stream_to_log(spark, sf_dir, log_root=root)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batch = flatten_spans(extract_fused(synthesize_corpus(docs)))
    key = lambda r: (r.doc_id, r.ord)  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(batch.collect(), key=key)

    again = extract_stream_to_log(spark, sf_dir, log_root=root)
    assert again.count() == got.count()  # no new files -> no new rows


def test_manifest_bloom_point_lookup_skipping(spark, tmp_path):
    """Interleaved id ranges defeat min/max pruning (every dir's [min,
    max] straddles any probe), but the manifest Bloom still skips the
    non-containing directory on a point lookup; absent keys prune
    everything; results always equal scan+filter (no false negatives)."""
    from pdfparser_spark.snapshots import _dir_stats

    log = SnapshotLog(str(tmp_path / "log"))
    evens = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(0, 40, 2)], "doc_id long, text string"
    )
    odds = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 40, 2)], "doc_id long, text string"
    )
    dirs = []
    for df in (evens, odds):
        d = log.new_data_dir("docs")
        df.write.parquet(d)
        back = spark.read.parquet(d)
        _, stats = _dir_stats(back)
        log.commit(
            {"docs": [d]},
            schemas={"docs": back.schema.json()},
            stats={"docs": {d: stats}},
        )
        dirs.append(d)

    # min/max ranges overlap: a range plan for one key skips NOTHING
    planned, skipped = log.plan_files("docs", where=("doc_id", 6, 6))
    assert skipped == 0 and len(planned) == 2
    # ... but the bloom point-lookup plan skips the odd directory
    planned_eq, skipped_eq = log.plan_files("docs", where_eq=("doc_id", 6))
    assert skipped_eq >= 1, "bloom failed to skip the non-containing dir"
    assert dirs[0] in planned_eq
    got = log.read(spark, "docs", where_eq=("doc_id", 6)).collect()
    assert [(r.doc_id, r.text) for r in got] == [(6, "doc 6")]

    # an absent key: no false negatives means a possibly-empty plan, and
    # the read is a valid empty frame with the right schema
    empty = log.read(spark, "docs", where_eq=("doc_id", 99))
    assert empty.count() == 0 and empty.columns == ["doc_id", "text"]

    # every present key returns exactly its row (bloom has no false negatives)
    for probe in (0, 1, 17, 38, 39):
        rows = log.read(spark, "docs", where_eq=("doc_id", probe)).collect()
        assert [(r.doc_id, r.text) for r in rows] == [(probe, f"doc {probe}")]


def test_stream_backfill_bounded_batches(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger=1 over a multi-file backlog must land the SAME
    table as the unthrottled run, committed as MULTIPLE bounded
    micro-batches (one snapshot per batch) — the 100 TB backfill shape."""
    from pdfparser_spark.snapshots import SnapshotLog
    from pdfparser_spark.streaming import extract_stream_to_log

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    src_sf = tmp_path / "sf"
    src_sf.mkdir()
    # documents.parquet as a DIRECTORY of 4 part files = a 4-file backlog
    docs.repartition(4).write.parquet(str(src_sf / "documents.parquet"))

    root = str(tmp_path / "backfill")
    got = extract_stream_to_log(
        spark, str(src_sf), log_root=root, max_files_per_trigger=1
    )
    full = extract_stream_to_log(spark, str(src_sf), log_root=str(tmp_path / "one"))
    assert got.count() == full.count() > 0
    a = {tuple(r) for r in got.collect()}
    assert a == {tuple(r) for r in full.collect()}

    chain = SnapshotLog(os.path.join(root, "log")).chain()
    stream_commits = [s for s in chain if s.get("operation") == "stream-append"]
    assert len(stream_commits) >= 4  # one bounded commit per source file


def test_metadata_only_row_count(spark, tmp_path):
    """COUNT(*) from manifests alone: exact across commits and time
    travel, refuses (None) while tombstones are pending, exact again
    after compaction — and always equal to the scan count."""
    from pdfparser_spark.snapshots import SnapshotLog, _dir_stats, compact, delete_docs

    log = SnapshotLog(str(tmp_path / "log"))
    for lo, hi in ((0, 30), (30, 75)):
        df = spark.createDataFrame(
            [(i, f"d{i}") for i in range(lo, hi)], "doc_id long, text string"
        )
        d = log.new_data_dir("docs")
        df.write.parquet(d)
        back = spark.read.parquet(d)
        _, st = _dir_stats(back)
        log.commit(
            {"docs": [d]},
            schemas={"docs": back.schema.json()},
            stats={"docs": {d: st}},
        )

    assert log.row_count("docs") == 75 == log.read(spark, "docs").count()
    assert log.row_count("docs", snapshot_id=1) == 30  # time travel

    delete_docs(log, spark, [3, 40, 41], table="docs")
    assert log.row_count("docs") is None  # pending tombstones: refuse
    assert log.read(spark, "docs").count() == 72

    compact(log, spark, table="docs")
    assert log.row_count("docs") == 72 == log.read(spark, "docs").count()


def test_bloom_probe_renders_like_spark_cast(spark, tmp_path):
    """A float probe for an integral key must not false-negative: Python
    str(5.0)='5.0' vs Spark CAST's '5' — the renderer normalizes, so the
    matching directory survives pruning and the row is returned."""
    from pdfparser_spark.snapshots import SnapshotLog, _dir_stats

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "doc_id long, text string")
    d = log.new_data_dir("docs")
    df.write.parquet(d)
    back = spark.read.parquet(d)
    _, st = _dir_stats(back)
    log.commit({"docs": [d]}, schemas={"docs": back.schema.json()}, stats={"docs": {d: st}})

    rows = log.read(spark, "docs", where_eq=("doc_id", 5.0)).collect()
    assert [(r.doc_id, r.text) for r in rows] == [(5, "d5")]


def test_stream_log_inserts_picks_up_new_commits(spark, tmp_path):
    """The append stream sees exactly what's committed at each drain —
    new snapshot dirs appear atomically and delete files never match."""
    from pdfparser_spark.snapshots import delete_docs, stream_log_inserts

    log = SnapshotLog(str(tmp_path / "log"))

    def add(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = log.new_data_dir("t")
        df.write.parquet(d)
        log.commit({"t": [d]})

    add([(0, "a"), (1, "b")])
    assert {r.doc_id for r in stream_log_inserts(log, spark, "t").collect()} == {0, 1}
    add([(2, "c")])
    delete_docs(log, spark, [0], table="t")  # must NOT surface in the stream
    assert {r.doc_id for r in stream_log_inserts(log, spark, "t").collect()} == {0, 1, 2}
    # a compaction rewrite must NOT re-deliver rows (rew-* excluded):
    # every appended row appears exactly once in the drained feed
    from pdfparser_spark.snapshots import compact

    compact(log, spark, table="t")
    rows = [r.doc_id for r in stream_log_inserts(log, spark, "t").collect()]
    assert sorted(rows) == [0, 1, 2]


def test_concurrent_commits_never_lose_updates(tmp_path):
    """The commit critical section is serialized (advisory flock — the
    filesystem stand-in for the catalog's CAS): parallel committers each
    land their own snapshot with sequential parents, never a lost HEAD
    update."""
    import threading

    log = SnapshotLog(str(tmp_path / "log"))
    n_workers, n_commits = 6, 5

    def worker(w):
        for i in range(n_commits):
            log.commit({"t": [f"/fake/{w}-{i}"]}, summary={"w": w})

    ts = [threading.Thread(target=worker, args=(w,)) for w in range(n_workers)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    chain = log.chain()
    total = n_workers * n_commits
    assert log.head_id() == total and len(chain) == total
    assert [s["parent_id"] for s in chain] == [None] + list(range(1, total))
    dirs = [d for s in chain for d in s["tables"]["t"]]
    assert len(set(dirs)) == total  # every commit's dir survived


def test_refs_tag_branch_and_expire_guard(spark, tmp_path):
    """Named refs: a tag pins a snapshot immutably (re-pointing raises),
    a branch re-points freely, read(ref=) resolves through either, and
    expire_snapshots refuses to drop history a ref still pins."""
    from pdfparser_spark.snapshots import compact, expire_snapshots

    log = SnapshotLog(str(tmp_path / "log"))

    def add(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = log.new_data_dir("t")
        df.write.parquet(d)
        return log.commit({"t": [d]})

    s1 = add([(0, "a"), (1, "b")])
    assert log.set_ref("v1", kind="tag") == s1  # defaults to HEAD
    s2 = add([(2, "c")])
    log.set_ref("dev", s1, kind="branch")

    assert {r.doc_id for r in log.read(spark, "t", ref="v1").collect()} == {0, 1}
    assert log.ref("dev")["snapshot_id"] == s1
    log.set_ref("dev", s2, kind="branch")  # branches move
    assert {r.doc_id for r in log.read(spark, "t", ref="dev").collect()} == {0, 1, 2}
    with pytest.raises(ValueError, match="already points"):
        log.set_ref("v1", s2, kind="tag")  # tags do not
    with pytest.raises(ValueError, match="unknown ref"):
        log.read(spark, "t", ref="nope")
    with pytest.raises(ValueError, match="unknown ref kind"):
        log.set_ref("x", s1, kind="release")
    assert set(log.refs()) == {"v1", "dev"}

    # the v1 tag pins s1: expiring above it must refuse
    compact(log, spark, table="t")
    with pytest.raises(ValueError, match="pins snapshot"):
        expire_snapshots(log, log.head_id())


def test_position_deletes_scoped_to_files(spark, tmp_path):
    """delete_positions drops the exact (file, row_index) coordinates;
    a LATER append of the same logical row reappears (file-scoped Iceberg
    v2 semantics), and compact() materializes the deletes away."""
    from pdfparser_spark.snapshots import compact, delete_positions, positions_where

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(8)], "doc_id long, text string")
    d1 = log.new_data_dir("t")
    df.write.parquet(d1)
    log.commit({"t": [d1]})

    pos = positions_where(log, spark, "t", F.col("doc_id") % 2 == 1)
    delete_positions(log, pos, table="t")
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 2, 4, 6}

    # re-append doc 1: the coordinates name the OLD file only — it returns
    d2 = log.new_data_dir("t")
    spark.createDataFrame([(1, "v1-again")], "doc_id long, text string").write.parquet(d2)
    log.commit({"t": [d2]})
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 1, 2, 4, 6}

    # equality and position deletes compose on one table
    from pdfparser_spark.snapshots import delete_docs

    delete_docs(log, spark, [6], table="t")
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 1, 2, 4}

    # compaction materializes both kinds away; reads stay identical
    compact(log, spark, "t")
    assert log.delete_files_for("t") == []
    assert {r.doc_id for r in log.read(spark, "t").collect()} == {0, 1, 2, 4}


def test_refresh_rollup_incremental_with_deletes(spark, tmp_path):
    """Incrementally maintained rollup == from-scratch recompute through
    appends, an equality-delete commit (values materialized from the
    pre-delete snapshot), and a re-append of tombstoned keys (globally
    suppressed, so it must NOT re-enter the rollup)."""
    from pdfparser_spark.snapshots import delete_docs, refresh_rollup

    log = SnapshotLog(str(tmp_path / "log"))
    rows = [(i, ["en", "de", "fr"][i % 3], 100 + i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")

    def commit(pred):
        d = log.new_data_dir("docs")
        df.filter(pred).write.parquet(d)
        return log.commit({"docs": [d]})

    def rollup_state():
        return {
            r["lang"]: (r["n_docs"], r["total_chars"])
            for r in log.read(spark, "rollup").collect()
        }

    def recompute(live_pred):
        return {
            r["lang"]: (r["n"], r["s"])
            for r in df.filter(live_pred)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
            .collect()
        }

    commit(F.col("doc_id") < 10)
    refresh_rollup(log, spark, "docs", "rollup")
    assert rollup_state() == recompute(F.col("doc_id") < 10)

    # append-only refresh
    commit((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    refresh_rollup(log, spark, "docs", "rollup")
    assert rollup_state() == recompute(F.col("doc_id") < 20)

    # delete refresh: values come from the pre-delete snapshot
    delete_docs(log, spark, [0, 3, 6, 9, 12], table="docs")
    refresh_rollup(log, spark, "docs", "rollup")
    live = (F.col("doc_id") < 20) & (~F.col("doc_id").isin(0, 3, 6, 9, 12))
    assert rollup_state() == recompute(live)

    # re-append tombstoned keys + fresh keys: tombstones are GLOBAL, so
    # only the fresh keys enter the rollup
    commit(F.col("doc_id").isin(3, 6, 21, 22))
    refresh_rollup(log, spark, "docs", "rollup")
    live2 = (
        (F.col("doc_id") < 20) | F.col("doc_id").isin(21, 22)
    ) & (~F.col("doc_id").isin(0, 3, 6, 9, 12))
    assert rollup_state() == recompute(live2)
    # and the maintained state equals the current merge-on-read table
    assert rollup_state() == {
        r["lang"]: (r["n"], r["s"])
        for r in log.read(spark, "docs")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }


def test_refresh_rollup_rejects_position_deletes(spark, tmp_path):
    import pytest as _pytest

    from pdfparser_spark.snapshots import (
        delete_positions,
        positions_where,
        refresh_rollup,
    )

    log = SnapshotLog(str(tmp_path / "log"))
    df = spark.createDataFrame(
        [(i, "en", 10 + i) for i in range(8)], "doc_id long, lang string, n_chars long"
    )
    d = log.new_data_dir("docs")
    df.write.parquet(d)
    log.commit({"docs": [d]})
    refresh_rollup(log, spark, "docs", "rollup")
    delete_positions(log, positions_where(log, spark, "docs", F.col("doc_id") == 2), table="docs")
    with _pytest.raises(ValueError, match="POSITION deletes"):
        refresh_rollup(log, spark, "docs", "rollup")
    # rebuild recovers (reads the delete-applied current state)
    refresh_rollup(log, spark, "docs", "rollup", rebuild=True)
    total = sum(r["n_docs"] for r in log.read(spark, "rollup").collect())
    assert total == 7


def test_metadata_inspection_tables(spark):
    """snapshots_meta_df / files_meta_df answer history from manifests
    alone: per-snapshot op/dir/tombstone counts, commit-time volumes,
    the metadata COUNT(*) (NULL once tombstones are pending), and
    per-dir stats rows."""
    import tempfile

    from pdfparser_spark.snapshots import (
        SnapshotLog,
        _dir_stats,
        delete_docs_keys,
        files_meta_df,
        snapshots_meta_df,
    )
    from pyspark.sql import functions as F

    log = SnapshotLog(tempfile.mkdtemp(prefix="metadf_"))
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))

    def commit_stats(df):
        d = log.new_data_dir("docs")
        df.write.parquet(d)
        _n, st = _dir_stats(spark.read.parquet(d))
        return log.commit(
            {"docs": [d]}, schemas={"docs": df.schema.json()},
            stats={"docs": {d: st}},
        )

    commit_stats(docs.filter(F.col("doc_id") < 20))
    commit_stats(docs.filter(F.col("doc_id") >= 20))
    delete_docs_keys(log, docs.filter(F.col("doc_id") % 10 == 0), table="docs")

    snaps = {r["snapshot_id"]: r for r in snapshots_meta_df(log, spark, "docs").collect()}
    assert snaps[1]["operation"] == "append" and snaps[1]["committed_rows"] == 20
    assert snaps[1]["meta_row_count"] == 20 and snaps[1]["parent_id"] is None
    assert snaps[2]["committed_rows"] == 40 and snaps[2]["meta_row_count"] == 60
    assert snaps[3]["operation"] == "delete"
    assert snaps[3]["n_delete_files"] == 1 and snaps[3]["meta_row_count"] is None

    files = sorted(
        files_meta_df(log, spark, "docs").collect(), key=lambda r: r["added_snapshot_id"]
    )
    assert [(f["added_snapshot_id"], f["rows"], f["min_doc_id"], f["max_doc_id"]) for f in files] == [
        (1, 20, 0, 19), (2, 40, 20, 59),
    ]


def test_write_audit_publish(spark):
    """WAP: the staged batch is invisible to HEAD readers until publish;
    the ref serves it for audit; publish is a manifest-only replace."""
    import tempfile

    from pdfparser_spark.snapshots import SnapshotLog, publish, rollback
    from pyspark.sql import functions as F

    log = SnapshotLog(tempfile.mkdtemp(prefix="wap_"))
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))

    def commit(df):
        d = log.new_data_dir("docs")
        df.write.parquet(d)
        return log.commit({"docs": [d]}, schemas={"docs": df.schema.json()})

    s1 = commit(docs.filter(F.col("doc_id") < 10))
    s2 = commit(docs.filter(F.col("doc_id") >= 10))
    log.set_ref("audit", s2, kind="tag")
    rollback(log, s1)
    assert log.read(spark, "docs").count() == 10  # staged batch invisible
    assert log.read(spark, "docs", ref="audit").count() == 30
    publish(log, "audit")
    assert log.read(spark, "docs").count() == 30
    # the publish commit is a replace, history intact
    ops = [s["operation"] for s in log.chain()]
    assert ops == ["append", "append", "replace", "replace"]


def test_partition_transforms_match_both_sides():
    """partition_value (planner) and _partition_expr (writer) agree —
    the pruning contract depends on it."""
    from pdfparser_spark.snapshots import partition_value

    assert partition_value("identity", None, 7) == 7
    assert partition_value("bucket", 8, 203) == 3
    assert partition_value("bucket", 8, "alpha") == partition_value("bucket", 8, "alpha")
    assert partition_value("truncate", 20, 47) == 40
    assert partition_value("truncate", 3, "alphabet") == "alp"
    assert partition_value("day", None, 200000) == 2
    assert partition_value("identity", None, None) is None


def test_partition_spec_evolution_prunes_per_dir(spark):
    """Two commits under DIFFERENT specs coexist; the planner prunes each
    dir by its own layout: range probes keep only the covering truncate
    dirs, point probes keep exactly one bucket dir, and reads always
    equal the plain filter."""
    import tempfile

    from pdfparser_spark.snapshots import SnapshotLog, write_partitioned

    log = SnapshotLog(tempfile.mkdtemp(prefix="pspec_"))
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("v")
    )
    write_partitioned(
        spark, log, docs.filter(F.col("doc_id") < 200), "docs",
        {"spec_id": 1, "col": "doc_id", "transform": "truncate", "n": 20},
    )
    write_partitioned(
        spark, log, docs.filter(F.col("doc_id") >= 200), "docs",
        {"spec_id": 2, "col": "doc_id", "transform": "bucket", "n": 8},
    )
    n_dirs = len(log.files_for("docs"))
    assert n_dirs == 18  # 10 truncate-20 dirs + 8 bucket dirs
    assert log.read(spark, "docs").count() == 400
    # range probe: only the two truncate dirs covering [25, 44] survive
    dirs, skipped = log.plan_files("docs", where=("doc_id", 25, 44))
    assert len(dirs) == 2 and skipped == 16
    got = sorted(r.doc_id for r in log.read(spark, "docs", where=("doc_id", 25, 44)).collect())
    assert got == list(range(25, 45))
    # point probe in the bucket half: exactly one dir, by transform match
    dirs, skipped = log.plan_files("docs", where_eq=("doc_id", 203))
    assert len(dirs) == 1 and f"__pv={203 % 8}" in dirs[0]
    assert [r.v for r in log.read(spark, "docs", where_eq=("doc_id", 203)).collect()] == [609]
    # a probe matching nothing still returns an empty, well-typed frame
    assert log.read(spark, "docs", where_eq=("doc_id", 401)).count() == 0


def test_files_meta_surfaces_partition_specs(spark):
    """The files inspection table reports each directory's partition
    spec + value (NULL for unpartitioned dirs), straight from manifests."""
    import tempfile

    from pdfparser_spark.snapshots import SnapshotLog, files_meta_df, write_partitioned

    log = SnapshotLog(tempfile.mkdtemp(prefix="pmeta_"))
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    write_partitioned(
        spark, log, docs, "docs",
        {"spec_id": 1, "col": "doc_id", "transform": "bucket", "n": 4},
    )
    d = log.new_data_dir("docs")
    docs.write.parquet(d)
    log.commit({"docs": [d]}, schemas={"docs": docs.schema.json()})
    rows = files_meta_df(log, spark, "docs").collect()
    parts = [r for r in rows if r.partition_transform is not None]
    plain = [r for r in rows if r.partition_transform is None]
    assert len(parts) == 4 and len(plain) == 1
    assert {r.partition_transform for r in parts} == {"bucket(doc_id, 4)"}
    assert sorted(r.partition_value for r in parts) == ["0", "1", "2", "3"]
    assert all(r.spec_id == 1 for r in parts)


def test_compact_binpack_bounds_write_amplification(spark, tmp_path):
    from pdfparser_spark.snapshots import (
        SnapshotLog,
        _dir_stats,
        compact_binpack,
        delete_docs,
    )

    log = SnapshotLog(str(tmp_path / "bp"))
    df = spark.range(0, 1000).selectExpr("id AS doc_id", "id * 2 AS v")

    def commit_stats(part, with_stats=True):
        d = log.new_data_dir("t")
        part.write.parquet(d)
        st = {"t": {d: _dir_stats(spark.read.parquet(d))[1]}} if with_stats else None
        return log.commit({"t": [d]}, schemas={"t": part.schema.json()}, stats=st), d

    _, big_dir = commit_stats(df.filter("doc_id < 700"))  # bulk: 700 rows
    for lo in (700, 800, 900):
        commit_stats(df.filter(f"doc_id >= {lo} AND doc_id < {lo + 100}"))
    sid, rewritten, kept = compact_binpack(log, spark, "t", target_rows=500)
    # the three 100-row tails merged into ONE new dir; the bulk untouched
    assert (rewritten, kept) == (3, 1)
    dirs = log.files_for("t")
    assert big_dir in dirs and len(dirs) == 2
    got = {r["doc_id"]: r["v"] for r in log.read(spark, "t").collect()}
    assert got == {i: 2 * i for i in range(1000)}
    # the new dir carries manifest stats: metadata-only COUNT works
    assert log.row_count("t") == 1000
    # idempotent: a second run has nothing to merge (2 dirs, 1 small)
    sid2, rewritten2, _ = compact_binpack(log, spark, "t", target_rows=500)
    assert rewritten2 == 0 and log.head_id() == sid
    # stats-less dirs count as small and get merged (gaining stats)
    commit_stats(df.limit(0), with_stats=False)
    commit_stats(df.limit(0), with_stats=False)
    # pending tombstones refuse
    delete_docs(log, spark, [1], key="doc_id", table="t")
    import pytest

    with pytest.raises(ValueError, match="tombstones"):
        compact_binpack(log, spark, "t", target_rows=500)


def test_rewrite_manifests_consolidates_planning_state(spark, tmp_path):
    """rewrite_manifests is a metadata-only replace: reads identical, NO
    data copied, chain walk afterwards = one entry, per-dir stats carried
    forward so pruning survives expire_snapshots, deletes stay in force,
    and the change feed emits NOTHING for the rewrite."""
    import os

    from pdfparser_spark.snapshots import (
        changes,
        delete_docs,
        expire_snapshots,
        rewrite_manifests,
    )

    log = SnapshotLog(str(tmp_path / "log"))

    def add(lo, hi):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, hi)], "doc_id long, text string"
        )
        d = log.new_data_dir("t")
        df.repartition(1).write.parquet(d)
        return log.commit(
            {"t": [d]},
            stats={"t": {d: {"rows": hi - lo,
                             "cols": {"doc_id": [lo, hi - 1]}}}},
        )

    for k in range(5):
        add(10 * k, 10 * k + 10)
    delete_docs(log, spark, [3, 17], table="t")
    before = {(r.doc_id, r.text) for r in log.read(spark, "t").collect()}
    dirs_before = set(log.files_for("t"))
    pre_head = log.head_id()

    rid = rewrite_manifests(log)
    assert log.head_id() == rid
    # reads identical, deletes still applied merge-on-read
    after = {(r.doc_id, r.text) for r in log.read(spark, "t").collect()}
    assert after == before and not any(d for (d, _t) in after if d in (3, 17))
    # metadata-only: same data dirs, nothing copied
    assert set(log.files_for("t")) == dirs_before
    # planning is now ONE chain entry deep for the file list
    walked = 0
    for s in reversed(log.chain()):
        walked += 1
        if s["tables"].get("t") and s["operation"] == "replace":
            break
    assert walked == 1
    # the rewrite produced no feed events
    ins, dels = changes(log, spark, from_snapshot=pre_head, table="t")
    assert ins is None and dels is None
    # stats survive expiry of the pre-rewrite entries: pruning still skips
    expire_snapshots(log, keep_from=rid)
    dirs, skipped = log.plan_files("t", where=("doc_id", 42, 45))
    assert skipped == 4 and len(dirs) == 1
    assert os.path.basename(dirs[0]).startswith("snap-")
