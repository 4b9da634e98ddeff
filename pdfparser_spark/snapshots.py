"""Iceberg-shaped snapshot log over the parquet checkpoint seam:
append-only table commits, atomic HEAD swap, time travel, incremental
(only-new-documents) extraction.

north_rule asks for stages "checkpointed to Iceberg"; the container has
no Iceberg jars (documented in pipeline.py), so this module reproduces
the table-format *semantics* the pipeline needs from the format's public
design (the Iceberg spec's metadata/manifest/snapshot model), on plain
parquet + JSON:

  * every commit writes its data files into a fresh immutable directory
    ``data/<table>/snap-<id>/`` and appends a snapshot entry — id, parent
    id, operation, per-table file manifest, row counts, schema JSON — to
    the log;
  * readers plan from METADATA, never from directory listing: a read at
    snapshot S unions exactly the manifests of S and its ancestors
    (append semantics), so concurrent/failed writers leaving stray files
    cannot corrupt a read;
  * HEAD advances by writing ``head.json.tmp`` then ``os.replace`` — the
    same single-atomic-pointer-swap commit protocol as Iceberg's metadata
    pointer (crash before the swap = clean rollback, the orphan snapshot
    dir is unreferenced);
  * schema is recorded per snapshot and append commits must match the
    current schema exactly (evolution would bump a schema id; rejected
    here rather than silently widened).

``extract_increment`` is the production ingest shape on top: anti-join
the incoming corpus against the doc_ids already extracted (one shuffle
join keyed on doc_id; the DELTA side is usually the small one and the
join output is only the delta), run the extraction DAG on the delta
only, append the result as a new snapshot.  Reading HEAD then serves the
full corpus without ever re-extracting old documents — at 10^12 rows,
re-extraction is the cost that matters and this makes steady-state cost
O(new data).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _validate_evolution(old_json: str, new_json: str, table: str) -> None:
    """Additive-only schema evolution (the safe subset of Iceberg's rules):
    new columns may be added; existing columns may not be dropped or
    retyped — pre-evolution files then read cleanly under mergeSchema with
    NULLs in the added columns."""
    old_f = {f["name"]: f["type"] for f in json.loads(old_json)["fields"]}
    new_f = {f["name"]: f["type"] for f in json.loads(new_json)["fields"]}
    missing = sorted(set(old_f) - set(new_f))
    if missing:
        raise ValueError(
            f"schema evolution cannot drop columns {missing} of table {table!r}"
        )
    for name, typ in old_f.items():
        if new_f[name] != typ:
            raise ValueError(
                f"schema evolution cannot retype column {name!r} of table {table!r}"
            )


class SnapshotLog:
    """Append-only snapshot chain with an atomically-swapped HEAD pointer.

    Layout under ``root``:
      head.json                 -> {"snapshot_id": N}
      snapshots/<id>.json       -> one immutable snapshot entry each
      data/<table>/snap-<id>/   -> that commit's parquet files
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # -- reading the log -----------------------------------------------------
    def head_id(self) -> int | None:
        p = os.path.join(self.root, "head.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["snapshot_id"]

    def snapshot(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.root, "snapshots", f"{snapshot_id}.json")) as f:
            return json.load(f)

    def chain(self, snapshot_id: int | None = None) -> list[dict]:
        """The snapshot and its ancestors, oldest first (empty log -> []).
        Stops cleanly at expired history (a parent whose entry was removed
        by ``expire_snapshots``)."""
        sid = self.head_id() if snapshot_id is None else snapshot_id
        out: list[dict] = []
        while sid is not None:
            try:
                s = self.snapshot(sid)
            except FileNotFoundError:
                break  # expired: retention boundary reached
            out.append(s)
            sid = s["parent_id"]
        return list(reversed(out))

    def as_of(self, ts: float) -> int | None:
        """Latest snapshot committed at or before ``ts`` (time travel)."""
        best = None
        for s in self.chain():
            if s["ts"] <= ts:
                best = s["snapshot_id"]
        return best

    # -- named refs (Iceberg tags / branches) ---------------------------------
    def set_ref(self, name: str, snapshot_id: int | None = None, kind: str = "tag") -> int:
        """Pin ``name`` to a snapshot (HEAD when omitted).  ``tag`` refs are
        immutable — re-pointing one raises; ``branch`` refs move freely.
        Refs are tiny JSON files swapped atomically (the same catalog-side
        metadata shape as commit itself), so creating one costs O(1)
        regardless of table size — the release/audit-pin workflow at
        10^12 rows is a metadata write, never a data copy."""
        if kind not in ("tag", "branch"):
            raise ValueError(f"unknown ref kind {kind!r}")
        sid = self.head_id() if snapshot_id is None else snapshot_id
        if sid is None:
            raise ValueError("cannot create a ref on an empty log")
        self.snapshot(sid)  # must exist
        rdir = os.path.join(self.root, "refs")
        os.makedirs(rdir, exist_ok=True)
        rpath = os.path.join(rdir, f"{name}.json")
        if os.path.exists(rpath):
            with open(rpath) as f:
                cur = json.load(f)
            if cur["kind"] == "tag":
                raise ValueError(f"tag {name!r} already points at {cur['snapshot_id']}")
        with open(rpath + ".tmp", "w") as f:
            json.dump({"name": name, "snapshot_id": sid, "kind": kind, "ts": time.time()}, f)
        os.replace(rpath + ".tmp", rpath)
        return sid

    def ref(self, name: str) -> dict:
        try:
            with open(os.path.join(self.root, "refs", f"{name}.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(f"unknown ref {name!r}") from None

    def refs(self) -> dict[str, dict]:
        rdir = os.path.join(self.root, "refs")
        if not os.path.isdir(rdir):
            return {}
        out = {}
        for fn in sorted(os.listdir(rdir)):
            if fn.endswith(".json"):
                with open(os.path.join(rdir, fn)) as f:
                    r = json.load(f)
                out[r["name"]] = r
        return out

    def files_for(self, table: str, snapshot_id: int | None = None) -> list[str]:
        """The manifest-planned file list: walk newest -> oldest collecting
        each commit's dirs for the table, stopping at a ``replace``
        snapshot (whose manifest fully defines the table — compaction
        boundary)."""
        out: list[str] = []
        for s in reversed(self.chain(snapshot_id)):
            dirs = s["tables"].get(table, [])
            if dirs:
                out = dirs + out
                if s["operation"] == "replace":
                    break
        return out

    # -- writing -------------------------------------------------------------
    def new_data_dir(self, table: str, kind: str = "snap") -> str:
        """A fresh immutable directory for one commit's files.  Unreferenced
        until the snapshot entry + HEAD swap land, so a crashed writer
        leaves only orphans (safe to garbage-collect), never a bad read.

        ``kind='snap'`` (append commits) vs ``kind='rew'`` (replace
        rewrites: compaction, merge upsert): the prefixes keep the
        APPEND data stream (``stream_log_inserts``, glob ``snap-*``)
        from re-reading rows a rewrite re-materialized."""
        d = os.path.join(self.root, "data", table, f"{kind}-{uuid.uuid4().hex[:12]}")
        os.makedirs(os.path.dirname(d), exist_ok=True)
        return d

    def commit(
        self,
        tables: dict[str, list[str]],
        operation: str = "append",
        summary: dict | None = None,
        schemas: dict[str, str] | None = None,
        stats: dict[str, dict[str, dict]] | None = None,
        deletes: dict[str, list[str]] | None = None,
    ) -> int:
        """Append a snapshot referencing ``tables`` (name -> new dirs) and
        atomically advance HEAD.  Append commits must match the current
        schema exactly (no silent evolution).

        ``stats`` is the manifest-level column-statistics map
        ``{table: {dir: {"rows": n, "cols": {col: [min, max]}}}}`` —
        the Iceberg manifest-entry idea: store each data file's value
        ranges AT COMMIT TIME (one tiny agg over data already in memory)
        so later reads can skip whole directories without opening a
        single parquet footer.  Dirs without stats are simply never
        pruned, so the field is always correctness-optional.

        CONCURRENCY: the read-HEAD -> write-snapshot -> swap-HEAD
        critical section is serialized by an advisory ``flock`` on
        ``commit.lock`` — two concurrent committers each land their own
        snapshot (sequential parents), never a lost update.  This is the
        filesystem stand-in for an Iceberg catalog's atomic
        compare-and-swap (a conditional PUT on an object store); data
        files were written OUTSIDE the lock into immutable dirs, so the
        held section is a few metadata writes, not the job."""
        import fcntl

        lockpath = os.path.join(self.root, "commit.lock")
        with open(lockpath, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            return self._commit_locked(tables, operation, summary, schemas, stats, deletes)

    def _commit_locked(
        self,
        tables: dict[str, list[str]],
        operation: str,
        summary: dict | None,
        schemas: dict[str, str] | None,
        stats: dict[str, dict[str, dict]] | None,
        deletes: dict[str, list[str]] | None,
    ) -> int:
        parent = self.head_id()
        if parent is not None and schemas and operation != "evolve":
            cur = self.snapshot(parent).get("schemas", {})
            for t, sch in schemas.items():
                if t in cur and cur[t] != sch:
                    raise ValueError(
                        f"schema change on append for table {t!r}; "
                        "commit an explicit schema evolution instead"
                    )
        if parent is not None and schemas and operation == "evolve":
            cur = self.snapshot(parent).get("schemas", {})
            for t, sch in schemas.items():
                if t in cur and cur[t] != sch:
                    _validate_evolution(cur[t], sch, t)
        sid = (parent or 0) + 1
        entry = {
            "snapshot_id": sid,
            "parent_id": parent,
            "ts": time.time(),
            "operation": operation,
            "tables": tables,
            "summary": summary or {},
            "schemas": {
                **(self.snapshot(parent).get("schemas", {}) if parent else {}),
                **(schemas or {}),
            },
            "stats": stats or {},
            "deletes": deletes or {},
        }
        spath = os.path.join(self.root, "snapshots", f"{sid}.json")
        with open(spath + ".tmp", "w") as f:
            json.dump(entry, f)
        os.replace(spath + ".tmp", spath)
        hpath = os.path.join(self.root, "head.json")
        with open(hpath + ".tmp", "w") as f:
            json.dump({"snapshot_id": sid}, f)
        os.replace(hpath + ".tmp", hpath)  # THE commit point
        return sid

    def stats_for(self, table: str, snapshot_id: int | None = None) -> dict[str, dict]:
        """Per-directory column stats for the table's planned file list,
        collected from the snapshot entries that introduced each dir."""
        out: dict[str, dict] = {}
        for s in self.chain(snapshot_id):
            out.update(s.get("stats", {}).get(table, {}))
        return out

    def row_count(self, table: str, snapshot_id: int | None = None) -> int | None:
        """Metadata-only COUNT(*): answered purely from the manifests'
        per-directory row counts — zero data files touched (the Iceberg
        count-from-stats trick; at 10^12 rows a COUNT should never scan).
        Returns None when the count cannot be stated exactly from
        metadata: a data dir lacking stats, or pending equality-delete
        tombstones (merge-on-read counts depend on matching rows — run
        ``compact()`` to materialize them, after which counts are exact
        again)."""
        if self.delete_files_for(table, snapshot_id):
            return None
        stats = self.stats_for(table, snapshot_id)
        total = 0
        for d in self.files_for(table, snapshot_id):
            ds = stats.get(d)
            if ds is None or "rows" not in ds:
                return None
            total += int(ds["rows"])
        return total

    def plan_files(
        self,
        table: str,
        snapshot_id: int | None = None,
        where: tuple[str, object, object] | None = None,
        where_eq: tuple[str, object] | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-planned file list with min/max skip: given ``where =
        (col, lo, hi)``, drop every directory whose recorded [min, max]
        range for ``col`` cannot intersect [lo, hi] (None bound =
        unbounded).  ``where_eq=(col, v)`` is the point-lookup planner:
        it applies the [v, v] range check AND the per-directory Bloom
        filter (see :func:`_dir_stats`) — the case min/max cannot help,
        e.g. interleaved id ranges where every directory's [min, max]
        straddles the probe.  Directories lacking stats are kept —
        pruning is a pure optimization, never a correctness filter (the
        residual predicate still runs).  Returns (dirs, n_skipped)."""
        dirs = self.files_for(table, snapshot_id)
        if where is None and where_eq is None:
            return dirs, 0
        if where_eq is not None and where is not None:
            raise ValueError("pass where or where_eq, not both")
        if where_eq is not None:
            col, v = where_eq
            lo = hi = v
        else:
            col, lo, hi = where
        stats = self.stats_for(table, snapshot_id)
        probe_bits = (
            _bloom_positions(where_eq[1]) if where_eq is not None else None
        )
        sentinel = object()
        eq_v = where_eq[1] if where_eq is not None else sentinel
        kept = []
        for d in dirs:
            ds = stats.get(d, {})
            rng = ds.get("cols", {}).get(col)
            if rng is not None and (
                (hi is not None and rng[0] > hi) or (lo is not None and rng[1] < lo)
            ):
                continue
            # partition-layout pruning (spec evolution: each dir under
            # ITS OWN recorded spec — see write_partitioned)
            part = ds.get("partition")
            if part is not None and _part_skip(part, col, lo, hi, eq_v, sentinel):
                continue
            bloom = ds.get("bloom", {}).get(col) if probe_bits is not None else None
            if bloom is not None:
                bits = bytes.fromhex(bloom)
                if not all(bits[p // 8] & (1 << (p % 8)) for p in probe_bits):
                    continue  # definite miss: no false negatives by construction
            kept.append(d)
        return kept, len(dirs) - len(kept)

    def delete_files_for(self, table: str, snapshot_id: int | None = None) -> list[str]:
        """Directories of equality-delete keys in force at the snapshot:
        every ``deletes`` entry for the table from commits NEWER than the
        last ``replace`` (a replace materializes deletes away, so older
        delete files no longer apply)."""
        out: list[str] = []
        for s in reversed(self.chain(snapshot_id)):
            out = s.get("deletes", {}).get(table, []) + out
            if s["tables"].get(table) and s["operation"] == "replace":
                break
        return out

    # -- table reads ---------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        table: str,
        snapshot_id: int | None = None,
        as_of_ts: float | None = None,
        ref: str | None = None,
        where: tuple[str, object, object] | None = None,
        where_eq: tuple[str, object] | None = None,
    ) -> DataFrame:
        """Read a table at HEAD, at a snapshot id, as of a timestamp, or
        at a named ref (tag/branch) — planned strictly from the snapshot
        manifests.  ``where=(col, lo,
        hi)`` additionally skips non-matching directories via the manifest
        stats (file-level pruning BEFORE Spark ever lists them — at 10^12
        rows the read cost is dominated by how many files the plan
        touches) and applies the residual range filter to the survivors.
        ``where_eq=(col, v)`` is the point-lookup path: min/max AND the
        manifest Bloom filter prune, residual ``col == v`` runs after."""
        if ref is not None:
            if snapshot_id is not None or as_of_ts is not None:
                raise ValueError("ref is exclusive with snapshot_id/as_of_ts")
            snapshot_id = self.ref(ref)["snapshot_id"]
        if as_of_ts is not None:
            snapshot_id = self.as_of(as_of_ts)
            if snapshot_id is None:
                raise ValueError(f"no snapshot at or before ts {as_of_ts}")
        dirs, _skipped = self.plan_files(table, snapshot_id, where, where_eq)
        # schema evolution: if the chain recorded more than one schema for
        # the table, merge parquet footers so pre-evolution files surface
        # the added columns as NULL (additive-only, enforced at commit)
        seen_schemas = {
            s.get("schemas", {}).get(table)
            for s in self.chain(snapshot_id)
            if s.get("schemas", {}).get(table)
        }
        reader = spark.read
        if len(seen_schemas) > 1:
            reader = reader.option("mergeSchema", "true")
        if not dirs:
            if (where is not None or where_eq is not None) and self.files_for(
                table, snapshot_id
            ):
                # everything pruned: a valid empty result with the right schema
                all_dirs = self.files_for(table, snapshot_id)
                df = reader.parquet(*all_dirs).limit(0)
                return df
            raise ValueError(f"table {table!r} has no committed data")
        df = reader.parquet(*dirs)
        ddirs = self.delete_files_for(table, snapshot_id)
        # position-delete files (pdel-*) carry (file_path, row_index)
        # coordinates; equality-delete files (del-*) carry key values
        pdirs = [d for d in ddirs if os.path.basename(d).startswith("pdel-")]
        edirs = [d for d in ddirs if not os.path.basename(d).startswith("pdel-")]
        if pdirs:
            # the scan's hidden metadata columns must be attached directly
            # on the file-source relation, before any other operator
            df = df.withColumn("__pd_fp", F.col("_metadata.file_path")).withColumn(
                "__pd_ri", F.col("_metadata.row_index")
            )
        if where is not None:
            col, lo, hi = where
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
        if where_eq is not None:
            df = df.filter(F.col(where_eq[0]) == where_eq[1])
        if edirs:
            # merge-on-read: anti-join the accumulated equality-delete keys
            # (a tiny broadcast side — delete sets are rare keys, not data)
            dels = spark.read.parquet(*edirs)
            key = dels.columns[0]
            df = df.join(F.broadcast(dels.select(key).distinct()), key, "left_anti")
        if pdirs:
            # merge-on-read position deletes (Iceberg v2 shape): drop the
            # exact (file, row) coordinates — scoped to the files they
            # name, so unlike the global equality tombstones they do NOT
            # suppress a re-ingested copy of the same logical row
            pdels = (
                spark.read.parquet(*pdirs)
                .select(
                    F.col("file_path").alias("__pd_fp"),
                    F.col("row_index").alias("__pd_ri"),
                )
                .distinct()
            )
            df = df.join(F.broadcast(pdels), ["__pd_fp", "__pd_ri"], "left_anti").drop(
                "__pd_fp", "__pd_ri"
            )
        return df


def compact(log: SnapshotLog, spark: SparkSession, table: str = "spans") -> int:
    """Rewrite the table's HEAD state into ONE new directory and commit it
    as a ``replace`` snapshot whose manifest references only that
    directory.  This is the small-files maintenance job: a long chain of
    incremental appends otherwise makes every read union N directories
    (N file-listing RPCs and N× the parquet footers at 10^12 scale).
    History is preserved — older snapshots still reference the old dirs
    until ``expire_snapshots`` reclaims them."""
    replaced = len(log.files_for(table))
    current = log.read(spark, table)
    out = log.new_data_dir(table, kind="rew")
    current.write.parquet(out)
    n, stats = _dir_stats(spark.read.parquet(out))
    return log.commit(
        {table: [out]},
        operation="replace",
        summary={"compacted_rows": n, "replaced_dirs": replaced},
        stats={table: {out: stats}},
    )


def compact_binpack(
    log: SnapshotLog, spark: SparkSession, table: str = "spans", target_rows: int = 100_000
):
    """SMALL-FILE compaction with bounded write amplification (the
    Iceberg ``rewrite_data_files`` bin-pack strategy): the plan comes
    from MANIFESTS alone — directories whose stats put them at or above
    ``target_rows`` are kept untouched; the rest are packed greedily
    (first-fit decreasing on row count) into groups summing to at most
    ``target_rows`` and only multi-dir groups are rewritten, each into
    one new directory.  The ``replace`` commit references kept + new
    dirs, so a table with one huge historical dir and a tail of tiny
    incremental appends compacts the TAIL without ever re-copying the
    bulk — at 10^12 rows that difference is the whole job.  Dirs with
    no stats are treated as small (conservative: the rewrite gains them
    stats).  Refuses under pending equality/position tombstones — a raw
    dir-level rewrite would resurrect deleted rows; run :func:`compact`
    (which reads merge-on-read) first.  Returns
    ``(snapshot_id, n_rewritten_dirs, n_kept_dirs)``; no-ops (returns
    ``(head, 0, n)``) when nothing would be merged."""
    if log.delete_files_for(table):  # equality (del-*) AND position (pdel-*)
        raise ValueError("pending delete tombstones: run compact() first")
    dirs = log.files_for(table)
    stats = log.stats_for(table)
    small: list[tuple[str, int]] = []
    kept: list[str] = []
    for d in dirs:
        rows = stats.get(d, {}).get("rows")
        if rows is not None and int(rows) >= target_rows:
            kept.append(d)
        else:
            # weight unknown-stats dirs as 0 rows so stats-less tails can
            # actually share a bin and get rewritten (the rewrite gains
            # them stats); target_rows-1 made each one a near-full
            # singleton that was then kept unrewritten forever
            small.append((d, int(rows) if rows is not None else 0))
    bins: list[list[str]] = []
    loads: list[int] = []
    for d, r in sorted(small, key=lambda t: -t[1]):
        for i in range(len(bins)):
            if loads[i] + r <= target_rows:
                bins[i].append(d)
                loads[i] += r
                break
        else:
            bins.append([d])
            loads.append(r)
    new_dirs: list[str] = []
    new_stats: dict[str, dict] = {}
    rewritten = 0
    for group in bins:
        if len(group) < 2:  # a lone dir gains nothing from a re-copy
            kept.extend(group)
            continue
        df = spark.read.option("mergeSchema", "true").parquet(*group)
        out = log.new_data_dir(table, kind="rew")
        df.write.parquet(out)
        _, st = _dir_stats(spark.read.parquet(out))
        new_dirs.append(out)
        new_stats[out] = st
        rewritten += len(group)
    if not new_dirs:
        return log.head_id(), 0, len(kept)
    all_stats = {d: stats[d] for d in kept if d in stats}
    all_stats.update(new_stats)
    sid = log.commit(
        {table: kept + new_dirs},
        operation="replace",
        summary={"rewritten_dirs": rewritten, "kept_dirs": len(kept)},
        stats={table: all_stats},
    )
    return sid, rewritten, len(kept)


def expire_snapshots(log: SnapshotLog, keep_from: int) -> list[str]:
    """Drop history below snapshot ``keep_from`` and garbage-collect the
    data directories no retained read can reach.  Returns the removed
    directories.  Time travel below ``keep_from`` stops working, as with
    Iceberg's expire_snapshots; retained reads are bit-identical.

    Safety: refuses (ValueError) unless every table's manifest walk FROM
    ``keep_from`` terminates at or above it — i.e. a ``replace``
    (compaction) snapshot covers each table in the retained range.
    Checking the oldest retained snapshot suffices: any newer snapshot's
    walk traverses a suffix of the same chain and can only stop earlier.
    Run ``compact`` first when this trips."""
    import shutil

    head = log.head_id()
    if head is None or keep_from > head:
        return []
    # named refs RETAIN their snapshots (Iceberg semantics): refuse to
    # expire history a tag/branch still points into
    for r in log.refs().values():
        if r["snapshot_id"] < keep_from:
            raise ValueError(
                f"ref {r['name']!r} pins snapshot {r['snapshot_id']} below "
                f"keep_from {keep_from}; drop the ref first"
            )
    full = log.chain(keep_from)
    tables = {t for s in full for t in s["tables"]}
    for t in tables:
        depends_below = False
        for s in reversed(full):  # newest -> oldest, mirror files_for
            dirs = s["tables"].get(t, [])
            if dirs and s["snapshot_id"] < keep_from:
                depends_below = True
            if dirs and s["operation"] == "replace":
                break
        if depends_below:
            raise ValueError(
                f"snapshot {keep_from} still reads table {t!r} from expired "
                "history; run compact() first"
            )
    live: set[str] = set()
    for s in log.chain(head):
        if s["snapshot_id"] >= keep_from:
            for t in s["tables"]:
                live.update(log.files_for(t, s["snapshot_id"]))
                # delete files a retained read still applies are live
                # too: replace commits that CARRY tombstones forward
                # (rollback, rewrite_manifests) keep them reachable even
                # when the commit that introduced them expires
                live.update(log.delete_files_for(t, s["snapshot_id"]))
    removed = []
    for s in full:
        sid = s["snapshot_id"]
        if sid >= keep_from:
            continue
        # expired delete files are unreachable too: every retained read's
        # delete walk stops at the same replace the safety check required
        for dirs in list(s["tables"].values()) + list(s.get("deletes", {}).values()):
            for d in dirs:
                if d not in live and os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
        os.remove(os.path.join(log.root, "snapshots", f"{sid}.json"))
    return removed


def rollback(log: SnapshotLog, to_snapshot: int) -> int:
    """ROLLBACK as a new commit (Iceberg rollback semantics): HEAD moves
    FORWARD to a snapshot whose reads equal ``to_snapshot``'s — history is
    never rewritten, so audits and time travel across the bad commits keep
    working.  Manifest-only, no data copied: the new entry is an
    ``operation='replace'`` whose table dirs are the target's effective
    file lists (so older chain entries stop applying) and whose delete
    files are the ones in force at the target.  The schema map stays the
    latest (additive-only evolution keeps rolled-back data readable;
    post-target columns surface as NULL).  Refuses when a table at HEAD
    did not exist at the target — restoring "absence" would need explicit
    drop-table semantics the log doesn't model."""
    log.snapshot(to_snapshot)  # raises on unknown target
    head = log.head_id()
    all_tables = {t for s in log.chain(head) for t in s["tables"]}
    tables: dict[str, list[str]] = {}
    deletes: dict[str, list[str]] = {}
    for t in sorted(all_tables):
        dirs = log.files_for(t, to_snapshot)
        if not dirs:
            raise ValueError(
                f"table {t!r} did not exist at snapshot {to_snapshot}; "
                "rollback cannot restore its absence"
            )
        tables[t] = dirs
        ddirs = log.delete_files_for(t, to_snapshot)
        if ddirs:
            deletes[t] = ddirs
    return log.commit(
        tables,
        operation="replace",
        summary={"rollback_to": to_snapshot},
        deletes=deletes,
    )


def rewrite_manifests(log: SnapshotLog) -> int:
    """Iceberg's ``rewrite_manifests`` action: consolidate the PLANNING
    state into one snapshot entry — a metadata-only ``replace`` commit
    listing every table's current dirs, the delete files still in
    force, and the per-directory stats CARRIED FORWARD (so min/max +
    Bloom pruning survives a later ``expire_snapshots`` of the old
    entries).  No data moves and no feed events are produced; chain
    walks after this commit stop immediately, so planning cost drops
    from O(history) to O(1) snapshot entries no matter how many commits
    built the table — the long-lived-table hygiene action that closes
    the driver-side-manifest growth seam."""
    head = log.head_id()
    if head is None:
        raise ValueError("rewrite_manifests: empty log")
    all_tables = sorted({t for s in log.chain(head) for t in s["tables"]})
    tables: dict[str, list[str]] = {}
    deletes: dict[str, list[str]] = {}
    stats: dict[str, dict[str, dict]] = {}
    for t in all_tables:
        dirs = log.files_for(t, head)
        if not dirs:
            continue
        tables[t] = dirs
        ddirs = log.delete_files_for(t, head)
        if ddirs:
            deletes[t] = ddirs
        st = log.stats_for(t, head)
        kept = {d: st[d] for d in dirs + ddirs if d in st}
        if kept:
            stats[t] = kept
    if not tables:
        raise ValueError("rewrite_manifests: nothing to consolidate")
    return log.commit(
        tables,
        operation="replace",
        summary={"rewrite_manifests": head},
        deletes=deletes,
        stats=stats,
    )


def publish(log: SnapshotLog, ref: str) -> int:
    """PUBLISH half of write-audit-publish (Iceberg's WAP flow): make the
    audited staging ref's state the table's served state.  Staging =
    commit the candidate batch, pin a ref on it, then ``rollback`` HEAD
    to the pre-batch snapshot — readers keep serving the old state while
    audit queries read ``ref=...``; publish = one forward replace commit
    restoring the staged snapshot's reads (manifest-only, nothing
    copied, history intact).  An aborted audit simply never publishes —
    the staged snapshot ages out via ``expire_snapshots`` once the ref
    is dropped."""
    return rollback(log, int(log.ref(ref)["snapshot_id"]))


def merge_upsert(
    log: SnapshotLog,
    spark: SparkSession,
    updates: DataFrame,
    table: str = "spans",
    key: str = "doc_id",
) -> int:
    """MERGE (upsert): rows whose ``key`` appears in ``updates`` are
    replaced, new keys are inserted — one atomic ``replace`` snapshot
    (readers see the whole merge or none of it; time travel below it
    still sees the old values).

    This is the COPY-ON-WRITE merge (Delta's MERGE default): the kept
    side is HEAD anti-joined against the update keys (broadcast — update
    batches are small against the table), unioned with the updates and
    rewritten.  Copy-on-write is the right trade when merges are
    periodic batch jobs; the merge-on-read path exists separately as
    ``delete_docs`` + append, whose GLOBAL tombstones deliberately keep
    re-ingested keys suppressed (a deletion-request pipeline's contract)
    — which is exactly why upsert must NOT be spelled delete+append here
    and gets its own rewrite-based operation."""
    current = log.read(spark, table)
    keys = updates.select(key).distinct()
    kept = current.join(F.broadcast(keys), key, "left_anti")
    merged = kept.unionByName(updates)
    out = log.new_data_dir(table, kind="rew")
    merged.write.parquet(out)
    n, stats = _dir_stats(spark.read.parquet(out), key)
    return log.commit(
        {table: [out]},
        operation="replace",
        summary={"merged_rows": n},
        stats={table: {out: stats}},
    )


def changes(
    log: SnapshotLog,
    spark: SparkSession,
    from_snapshot: int,
    to_snapshot: int | None = None,
    table: str = "spans",
) -> tuple[DataFrame | None, DataFrame | None]:
    """CHANGE DATA FEED: what happened to ``table`` after
    ``from_snapshot`` (exclusive) up to ``to_snapshot`` (inclusive,
    default HEAD) — returns ``(inserted_rows, deleted_keys)``, either
    ``None`` when that side is empty.

    This is the incremental-consumer contract (Delta CDF / Iceberg
    incremental scan): a downstream job that processed snapshot N asks
    only for the delta, not a rescan — at 10^12 rows re-reading HEAD per
    refresh is the difference between a feed and a full-table job.  The
    plan comes straight from the manifests: inserted rows are the data
    dirs INTRODUCED by snapshots in (from, to] (append/upsert commits),
    deleted keys are the delete files introduced there.  ``replace``
    snapshots (compaction) rewrite layout, not content, and are
    deliberately NOT emitted as changes — consumers that processed the
    pre-compaction data already have those rows.
    """
    head = log.head_id()
    if head is None:
        return None, None
    to_snapshot = head if to_snapshot is None else to_snapshot
    new_dirs: list[str] = []
    del_dirs: list[str] = []
    for s in log.chain(to_snapshot):
        if s["snapshot_id"] <= from_snapshot:
            continue
        if s["operation"] != "replace":
            new_dirs.extend(s["tables"].get(table, []))
            del_dirs.extend(s.get("deletes", {}).get(table, []))
        # replace commits (compaction, rollback, rewrite_manifests) may
        # CARRY FORWARD delete files still in force — those keys were
        # already emitted when their own commits landed, so re-listing
        # them is layout, not content (same rule as the dirs above)
    inserted = spark.read.parquet(*new_dirs) if new_dirs else None
    deleted = spark.read.parquet(*del_dirs).distinct() if del_dirs else None
    return inserted, deleted


def refresh_rollup(
    log: SnapshotLog,
    spark: SparkSession,
    source_table: str,
    rollup_table: str,
    key: str = "lang",
    count_col: str = "n_docs",
    sum_col: str = "n_chars",
    sum_alias: str = "total_chars",
    rebuild: bool = False,
) -> int:
    """Incrementally maintained MATERIALIZED ROLLUP: keep a per-``key``
    (count, sum) aggregate of ``source_table`` as its own table in the
    same log, refreshed from the change feed — each refresh aggregates
    ONLY the rows appended since the last one and merges the partials
    (counts and sums are mergeable state), never rescanning the source.
    The view-maintenance pattern that turns a 10^12-row nightly rollup
    into a delta-sized job.

    The rollup commit's summary records ``refreshed_to`` (the source
    snapshot id it incorporates), which is where the next refresh resumes
    — state lives in the log, so any job can pick it up.

    EQUALITY-DELETE commits in the range are maintained incrementally
    too (the Iceberg-CDC pattern): the tombstoned keys join back to the
    source AS OF the last incorporated snapshot (time travel — the
    pre-delete rows still exist there) to materialize the deleted rows'
    VALUES, which subtract as negative partials; and because this log's
    equality tombstones are GLOBAL (delete_docs contract: re-ingesting a
    deleted key keeps it suppressed), newly inserted rows only count if
    their key is not tombstoned as of ``head``.  The fetch of deleted
    rows is delta-sized in practice — tombstone keys are rare, and the
    manifest min/max + Bloom stats bound which directories the semi-join
    scan touches.  POSITION-delete commits are rejected (file-scoped
    coordinates cannot be attributed to rollup keys without replaying
    the named files); compaction is fine (CDF skips replaces).  Rollup
    keys whose count reaches zero are dropped, so the maintained state
    is row-identical to a from-scratch recompute.  Returns the rollup
    table's new snapshot id."""
    head = log.head_id()
    if rebuild:
        # full recompute from the source's current state (post-compaction
        # deletes are already materialized there) — the recovery path the
        # deletes rejection below points at
        full = log.read(spark, source_table).groupBy(key).agg(
            F.count(F.lit(1)).alias(count_col), F.sum(sum_col).alias(sum_alias)
        )
        out = log.new_data_dir(rollup_table)
        full.write.parquet(out)
        return log.commit(
            {rollup_table: [out]},
            operation="replace",
            summary={"refreshed_to": head},
        )
    last = 0
    have_rollup = False
    for s in reversed(log.chain(head)):  # newest first
        if rollup_table in s["tables"] and s["summary"].get("refreshed_to") is not None:
            last = s["summary"]["refreshed_to"]
            have_rollup = True
            break
    # the range's delete files by kind: equality (del-*) vs position
    # (pdel-*); equality tombstones are also collected across the WHOLE
    # chain because they suppress re-ingested keys globally
    range_edirs: list[str] = []
    range_pdirs: list[str] = []
    all_edirs: list[str] = []
    for s in log.chain(head):
        for d in s.get("deletes", {}).get(source_table, []):
            if os.path.basename(d).startswith("pdel-"):
                if s["snapshot_id"] > last:
                    range_pdirs.append(d)
            else:
                all_edirs.append(d)
                if s["snapshot_id"] > last:
                    range_edirs.append(d)
    if range_pdirs:
        raise ValueError(
            f"source {source_table!r} has POSITION deletes after snapshot "
            f"{last}; file-scoped coordinates cannot be attributed to "
            "rollup keys — refresh_rollup(..., rebuild=True) recomputes "
            "from the source's current (delete-applied) state"
        )
    ins, _ = changes(log, spark, from_snapshot=last, to_snapshot=head, table=source_table)
    parts: list[DataFrame] = []
    if ins is not None:
        pos = ins
        if all_edirs:
            tombs = spark.read.parquet(*all_edirs)
            kcol = tombs.columns[0]
            pos = pos.join(
                F.broadcast(tombs.select(kcol).distinct()), kcol, "left_anti"
            )
        parts.append(
            pos.groupBy(key).agg(
                F.count(F.lit(1)).alias(count_col), F.sum(sum_col).alias(sum_alias)
            )
        )
    if range_edirs and have_rollup and log.files_for(source_table, last):
        # materialize the deleted rows' values from the pre-delete state
        # (rows at `last` are already cleared of earlier tombstones)
        tnew = spark.read.parquet(*range_edirs)
        kcol = tnew.columns[0]
        removed = log.read(spark, source_table, snapshot_id=last).join(
            F.broadcast(tnew.select(kcol).distinct()), kcol, "left_semi"
        )
        parts.append(
            removed.groupBy(key).agg(
                (-F.count(F.lit(1))).alias(count_col),
                (-F.sum(sum_col)).alias(sum_alias),
            )
        )
    if not parts:  # fully caught up: no-op, return current head
        return head
    partial = parts[0]
    for p in parts[1:]:
        partial = partial.unionByName(p)
    if have_rollup:
        partial = log.read(spark, rollup_table).unionByName(partial)
    merged = (
        partial.groupBy(key)
        .agg(F.sum(count_col).alias(count_col), F.sum(sum_alias).alias(sum_alias))
        .filter(F.col(count_col) != 0)
    )
    out = log.new_data_dir(rollup_table)
    merged.write.parquet(out)
    return log.commit(
        {rollup_table: [out]},
        operation="replace",
        summary={"refreshed_to": head},
    )


def vacuum(log: SnapshotLog) -> list[str]:
    """Remove ORPHAN data directories: dirs on disk under the log's data
    root that no snapshot in the live chain references.  Orphans are the
    debris the design deliberately tolerates — `new_data_dir` hands out a
    directory BEFORE the commit, so a writer that crashes between the
    parquet write and the HEAD swap leaves an unreferenced dir behind
    (never a torn read, because readers plan strictly from manifests).
    This is the matching janitor, Iceberg's `remove_orphan_files`.

    Safety: only deletes under ``<root>/data/<table>/`` and only dirs
    absent from EVERY snapshot's manifest (committed or not yet HEAD —
    the full chain is consulted, so a concurrent committed writer's dirs
    survive).  Returns the removed directories."""
    import shutil

    head = log.head_id()
    referenced: set[str] = set()
    for s in log.chain(head) if head else []:
        for dirs in list(s["tables"].values()) + list(s.get("deletes", {}).values()):
            referenced.update(os.path.normpath(d) for d in dirs)
    removed = []
    data_root = os.path.join(log.root, "data")
    if not os.path.isdir(data_root):
        return removed
    for table in sorted(os.listdir(data_root)):
        tdir = os.path.join(data_root, table)
        if not os.path.isdir(tdir):
            continue
        for snap_dir in sorted(os.listdir(tdir)):
            d = os.path.normpath(os.path.join(tdir, snap_dir))
            if d not in referenced:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
    return removed


def delete_docs(
    log: SnapshotLog,
    spark: SparkSession,
    doc_ids: list[int],
    table: str = "spans",
    key: str = "doc_id",
) -> int:
    """Row-level equality delete (the right-to-be-forgotten operation a
    training-data table must support): commit a small parquet file of keys
    whose rows every subsequent read drops via a broadcast anti-join —
    merge-on-read, no data rewritten at delete time (rewriting data files
    synchronously at 10^12 rows would make each deletion a full-table
    job).  ``compact()`` later materializes the deletes into a clean
    ``replace`` snapshot, after which the delete files no longer apply.

    Deviation from Iceberg v2 sequence-number scoping, documented on
    purpose: here the keys are GLOBAL tombstones until a compaction —
    re-ingesting a deleted key keeps it suppressed, which is the behavior
    a deletion-request pipeline wants (Iceberg equality deletes instead
    stop applying to data committed after the delete)."""
    ddir = os.path.join(log.root, "data", table, f"del-{uuid.uuid4().hex[:12]}")
    os.makedirs(os.path.dirname(ddir), exist_ok=True)
    spark.createDataFrame([(int(i),) for i in doc_ids], f"{key} long").coalesce(
        1
    ).write.parquet(ddir)
    return log.commit(
        {},
        operation="delete",
        summary={"deleted_keys": len(doc_ids)},
        deletes={table: [ddir]},
    )


def delete_docs_keys(
    log: SnapshotLog,
    keys: DataFrame,
    table: str = "spans",
    key: str = "doc_id",
) -> int:
    """``delete_docs`` with the key set as a DataFrame — the shape a
    deletion-request PIPELINE produces (requests land as a table, e.g. a
    GDPR queue), so the keys never round-trip through the driver.  Same
    merge-on-read tombstone semantics as ``delete_docs``."""
    ddir = os.path.join(log.root, "data", table, f"del-{uuid.uuid4().hex[:12]}")
    os.makedirs(os.path.dirname(ddir), exist_ok=True)
    keys.select(key).distinct().coalesce(1).write.parquet(ddir)
    return log.commit(
        {},
        operation="delete",
        summary={"delete_file": ddir},
        deletes={table: [ddir]},
    )


def positions_where(
    log: SnapshotLog, spark: SparkSession, table: str, condition
) -> DataFrame:
    """``(file_path, row_index)`` coordinates of the HEAD rows matching
    ``condition`` — the shape a position-delete request pipeline produces
    (e.g. a dedup pass marking each cluster's losing rows by file
    coordinates instead of by key).  Planned from the scan's hidden
    ``_metadata`` columns; no extra column needs to exist in the data."""
    dirs = log.files_for(table)
    if not dirs:
        raise ValueError(f"table {table!r} has no committed data")
    df = spark.read.parquet(*dirs)
    return df.filter(condition).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("row_index"),
    )


def delete_positions(
    log: SnapshotLog,
    positions: DataFrame,
    table: str = "spans",
) -> int:
    """Row-level POSITION delete (Iceberg v2 §position deletes): commit a
    small parquet file of ``(file_path, row_index)`` coordinates that
    every subsequent read drops via a broadcast positional anti-join on
    the scan's ``_metadata`` columns — merge-on-read, no data rewritten.

    Contrast with :func:`delete_docs` (equality deletes): position
    deletes are scoped to the exact files they name, so a LATER append of
    the same logical row is NOT suppressed — the Iceberg semantics, and
    the right primitive when the deletion is about specific physical rows
    (dedup losers, corrupt-batch excision) rather than a key-based
    forget-me request.  ``compact()`` materializes them away like any
    other delete file."""
    ddir = os.path.join(log.root, "data", table, f"pdel-{uuid.uuid4().hex[:12]}")
    os.makedirs(os.path.dirname(ddir), exist_ok=True)
    positions.select("file_path", "row_index").distinct().coalesce(1).write.parquet(ddir)
    return log.commit(
        {},
        operation="delete",
        summary={"position_delete_file": ddir},
        deletes={table: [ddir]},
    )


BLOOM_M = 4096  # bits per manifest Bloom filter (512-byte hex blob per dir)
BLOOM_K = 2  # hash functions


def _bloom_render(value) -> str:
    """Render a probe value the way Spark's CAST(col AS STRING) rendered
    the column when the bits were built — a mismatch (e.g. Python's
    ``str(5.0)`` = '5.0' vs Spark's '5' for a BIGINT column) would turn
    the 'no false negatives' guarantee into silently-dropped matches."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


def _bloom_positions(value) -> list[int]:
    """The probe value's BLOOM_K bit positions — the pure-Python mirror
    of the Spark-side derivation in :func:`_dir_stats` (same md5 fold:
    ``int(md5(s).hexdigest()[:12], 16)`` == ``sketch.hash48``)."""
    import hashlib

    s = _bloom_render(value)
    return [
        int(hashlib.md5(f"{s}#bloom{k}".encode()).hexdigest()[:12], 16) % BLOOM_M
        for k in range(BLOOM_K)
    ]


def snapshots_meta_df(log: SnapshotLog, spark: SparkSession, table: str) -> DataFrame:
    """Iceberg-style ``snapshots`` inspection table: one row per snapshot
    in the HEAD chain, answered from MANIFESTS alone (zero data files
    touched — at 10^12 rows, table history must never cost a scan).
    ``committed_rows`` is the snapshot's own new-data volume from its
    commit-time stats (NULL when a dir lacks stats); ``meta_row_count``
    is the metadata-only COUNT(*) of the whole table AS OF that snapshot
    (NULL while equality-delete tombstones are pending — merge-on-read
    counts need the data until ``compact()`` materializes them)."""
    rows = []
    for s in log.chain():
        dirs = s.get("tables", {}).get(table, []) or []
        st = s.get("stats", {}).get(table, {})
        committed: int | None = 0
        for d in dirs:
            ds = st.get(d)
            if ds is None or "rows" not in ds:
                committed = None
                break
            committed += int(ds["rows"])
        rows.append(
            (
                int(s["snapshot_id"]),
                int(s["parent_id"]) if s.get("parent_id") is not None else None,
                str(s["operation"]),
                len(dirs),
                len(s.get("deletes", {}).get(table, []) or []),
                committed,
                log.row_count(table, s["snapshot_id"]),
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "snapshot_id int, parent_id int, operation string, "
            "n_data_dirs int, n_delete_files int, committed_rows long, "
            "meta_row_count long"
        ),
    )


def files_meta_df(log: SnapshotLog, spark: SparkSession, table: str) -> DataFrame:
    """Iceberg-style ``files`` inspection table: one row per PLANNED data
    directory at HEAD — the snapshot that added it plus its manifest
    stats (row count and key range), again from metadata alone.  Paths
    carry run-local UUIDs, so consumers key on (added_snapshot_id,
    rows, key range) — the stable identity of a file set."""
    added: dict[str, int] = {}
    for s in log.chain():
        for d in s.get("tables", {}).get(table, []) or []:
            added.setdefault(d, int(s["snapshot_id"]))
    stats = log.stats_for(table)
    rows = []
    for d in log.files_for(table):
        ds = stats.get(d) or {}
        rng = (ds.get("cols") or {}).get("doc_id")
        part = ds.get("partition") or {}
        rows.append(
            (
                added.get(d),
                int(ds["rows"]) if "rows" in ds else None,
                int(rng[0]) if rng else None,
                int(rng[1]) if rng else None,
                int(part["spec_id"]) if "spec_id" in part else None,
                (
                    "%s(%s%s)"
                    % (
                        part["transform"],
                        part.get("col", ""),
                        f", {part['n']}" if part.get("n") is not None else "",
                    )
                    if "transform" in part
                    else None
                ),
                str(part["value"]) if "value" in part else None,
            )
        )
    return spark.createDataFrame(
        rows,
        schema=(
            "added_snapshot_id int, rows long, min_doc_id long, max_doc_id long, "
            "spec_id int, partition_transform string, partition_value string"
        ),
    )


def _dir_stats(df: DataFrame, col: str = "doc_id") -> tuple[int, dict]:
    """One combined aggregate -> (row_count, manifest stats entry): the
    count the caller needs anyway, the min/max the manifest wants, and
    the per-directory Bloom filter over the column's values — all from a
    single job over data just written.

    The Bloom is the point-lookup complement to min/max (Iceberg's
    parquet bloom / puffin idea): when directories hold interleaved id
    ranges, every [min, max] straddles the probe and range pruning skips
    nothing, but a 512-byte bitmap answers "definitely absent" exactly.
    Only the <= BLOOM_M distinct bit POSITIONS cross to the driver, never
    the values, so manifest size is constant per directory regardless of
    row count.  No false negatives (membership bits are set for every
    row's value); false positives only cost a wasted scan."""
    from .textops.sketch import hash48

    pos = [
        F.pmod(
            hash48(F.concat(F.col(col).cast("string"), F.lit(f"#bloom{k}"))),
            F.lit(BLOOM_M).cast("long"),
        )
        for k in range(BLOOM_K)
    ]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        *[F.collect_set(p).alias(f"pos{k}") for k, p in enumerate(pos)],
    ).collect()[0]
    stats: dict = {"rows": int(row["n"]), "cols": {}}
    if row["lo"] is not None:
        stats["cols"][col] = [int(row["lo"]), int(row["hi"])]
        bits = bytearray(BLOOM_M // 8)
        for k in range(BLOOM_K):
            for p in row[f"pos{k}"]:
                bits[p // 8] |= 1 << (p % 8)
        stats["bloom"] = {col: bytes(bits).hex()}
    return int(row["n"]), stats


# -- partition specs (Iceberg-style layout + spec evolution) ----------------
#
# A partition spec is {"spec_id": k, "col": c, "transform": t, "n": n}.
# The spec rides PER DIRECTORY in the manifest stats entry ("partition"),
# which is exactly how Iceberg survives spec evolution: every data file
# remembers the spec it was written under, and the planner prunes each
# file by ITS OWN spec — old-layout and new-layout dirs coexist in one
# table, no rewrite.  Transforms are the Iceberg set (identity / bucket /
# truncate / day) with an engine-local bucket function (v % n for ints,
# md5-derived for strings — deterministic, replayable planner-side;
# Iceberg's murmur3 is an implementation detail, not a semantic).


def partition_value(transform: str, n, v):
    """Planner-side transform: the partition value ``v`` lands in."""
    if v is None:
        return None
    if transform == "identity":
        return v
    if transform == "bucket":
        if isinstance(v, int):
            return v % int(n)
        import hashlib

        return int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16) % int(n)
    if transform == "truncate":
        if isinstance(v, int):
            return v - (v % int(n))
        return str(v)[: int(n)]
    if transform == "day":
        return int(v) // 86400
    raise ValueError(f"unknown partition transform {transform!r}")


def _partition_expr(df: DataFrame, spec: dict):
    """The SAME transform as a JVM column expression (writer side)."""
    from pyspark.sql import types as T

    t, col, n = spec["transform"], spec["col"], spec.get("n")
    c = F.col(col)
    is_str = isinstance(df.schema[col].dataType, T.StringType)
    if t == "identity":
        return c
    if t == "bucket":
        if is_str:
            return F.pmod(
                F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long"), F.lit(int(n))
            )
        return F.pmod(c.cast("long"), F.lit(int(n)))
    if t == "truncate":
        if is_str:
            return F.substring(c, 1, int(n))
        return c.cast("long") - F.pmod(c.cast("long"), F.lit(int(n)))
    if t == "day":
        return F.floor(c.cast("long") / 86400).cast("long")
    raise ValueError(f"unknown partition transform {t!r}")


def _part_skip(part: dict, col: str, lo, hi, eq_v, sentinel) -> bool:
    """True => this directory cannot contain matching rows.  Equality
    probes compare the probe's transform value against the dir's for ANY
    transform; range probes prune only ORDER-PRESERVING transforms
    (identity / int-truncate / day) — a bucket scatters ranges."""
    if part.get("col") != col:
        return False
    t, n, pv = part.get("transform"), part.get("n"), part.get("value")
    if eq_v is not sentinel:
        try:
            return partition_value(t, n, eq_v) != pv
        except (ValueError, TypeError):
            return False
    if t == "identity" and isinstance(pv, (int, float)):
        return (lo is not None and pv < lo) or (hi is not None and pv > hi)
    if t == "truncate" and isinstance(pv, int):
        return (hi is not None and pv > hi) or (
            lo is not None and pv + int(n) - 1 < lo
        )
    if t == "day" and isinstance(pv, int):
        return (hi is not None and pv * 86400 > hi) or (
            lo is not None and (pv + 1) * 86400 - 1 < lo
        )
    return False


def write_partitioned(
    spark: SparkSession,
    log: SnapshotLog,
    df: DataFrame,
    table: str,
    spec: dict,
    summary: dict | None = None,
) -> int:
    """Write ``df`` under ``spec``'s partition layout and commit: ONE
    write job (``partitionBy`` on the transform value — the partition
    column itself stays in the data files), ONE grouped aggregate for
    the per-partition manifest stats (rows + min/max + Bloom on the
    spec's source column), then a commit whose stats entries carry the
    per-dir ``partition`` metadata ``plan_files`` prunes by.  Different
    commits of the same table may use DIFFERENT specs (spec evolution)
    — each dir is planned under the spec it was written with."""
    from .textops.sketch import hash48

    col = spec["col"]
    base = log.new_data_dir(table, kind="part")
    with_pv = df.withColumn("__pv", _partition_expr(df, spec))
    with_pv.write.partitionBy("__pv").parquet(base)
    pos = [
        F.pmod(
            hash48(F.concat(F.col(col).cast("string"), F.lit(f"#bloom{k}"))),
            F.lit(BLOOM_M).cast("long"),
        )
        for k in range(BLOOM_K)
    ]
    grouped = (
        with_pv.groupBy("__pv")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            *[F.collect_set(p).alias(f"pos{k}") for k, p in enumerate(pos)],
        )
        .collect()
    )
    dirs, stats = [], {}
    meta = {
        "spec_id": spec.get("spec_id", 0),
        "col": col,
        "transform": spec["transform"],
        "n": spec.get("n"),
    }
    for row in grouped:
        pv = row["__pv"]
        d = os.path.join(base, f"__pv={pv}")
        if not os.path.isdir(d):  # defensive: naming drift = no pruning meta
            continue
        entry: dict = {"rows": int(row["n"]), "cols": {}}
        if row["lo"] is not None:
            entry["cols"][col] = [row["lo"], row["hi"]]
            bits = bytearray(BLOOM_M // 8)
            for k in range(BLOOM_K):
                for p in row[f"pos{k}"]:
                    bits[p // 8] |= 1 << (p % 8)
            entry["bloom"] = {col: bytes(bits).hex()}
        entry["partition"] = {**meta, "value": pv}
        dirs.append(d)
        stats[d] = entry
    return log.commit(
        {table: dirs},
        summary={**(summary or {}), "partition_spec": meta},
        schemas={table: df.schema.json()},
        stats={table: stats},
    )


def extract_increment(
    spark: SparkSession,
    documents_raw: DataFrame,
    log: SnapshotLog,
    strict: bool = False,
) -> dict:
    """Extract ONLY the documents not yet in the log's ``spans`` table and
    append them as a new snapshot.  Returns {"snapshot_id", "added_docs",
    "spans"(HEAD read), "delta"(this commit's rows)}.

    The new/old split is a left_anti join on doc_id: one shuffle keyed on
    the extraction's natural partitioning column.  The seen side is a
    column-pruned scan of the spans table (doc_id only — parquet reads one
    column), the delta side is the only data that flows into the DAG, so
    steady-state cost is O(new documents) + the anti-join.  First commit
    short-circuits the join entirely.

    Note: the seen side honors equality deletes, so a tombstoned doc_id
    that reappears in the input is re-extracted each increment (and still
    suppressed at read time) until a ``compact()`` materializes the
    tombstones — run compaction after processing deletion requests.
    """
    from .pipeline import Pipeline

    head = log.head_id()
    if head is None:
        delta_raw = documents_raw
    else:
        seen = log.read(spark, "spans").select("doc_id")
        delta_raw = documents_raw.join(seen, "doc_id", "left_anti")

    pipe = Pipeline(spark, work_dir=None, strict=strict)
    res = pipe.run(delta_raw)
    out_dir = log.new_data_dir("spans")
    res["spans"].write.parquet(out_dir)
    pipe.release()
    spans_delta = spark.read.parquet(out_dir)
    added, dstats = _dir_stats(spans_delta)
    sid = log.commit(
        {"spans": [out_dir]},
        operation="append",
        summary={"added_docs": added},
        schemas={"spans": spans_delta.schema.json()},
        stats={"spans": {out_dir: dstats}},
    )
    return {
        "snapshot_id": sid,
        "added_docs": added,
        "spans": log.read(spark, "spans"),
        "delta": spans_delta,
    }


def stream_log_inserts(log: SnapshotLog, spark: SparkSession, table: str = "docs") -> DataFrame:
    """CONTINUOUS consumption of the snapshot log's append stream: a
    Structured Streaming file source over the table's data-directory
    glob (``data/<table>/snap-*``).  Each commit's directory becomes
    visible atomically after the HEAD swap, so a running stream picks up
    exactly the newly committed files at its next micro-batch — the
    APPEND feed: insert-only by construction (delete files live under
    ``del-*`` and replace rewrites under ``rew-*``; neither matches the
    glob, so compaction never re-delivers rows the stream already saw —
    deletes and merged updates stay on the batch ``changes()`` feed).
    After ``expire_snapshots`` reclaims pre-compaction append dirs, a
    FRESH consumer should bootstrap from a batch read and stream from
    then on; a checkpointed consumer already processed them.  This drains
    everything committed so far via AvailableNow into a memory sink and
    returns it; the production shape swaps the sink for ``foreachBatch``
    with its own checkpoint, making consumption incremental across
    restarts."""
    import uuid as _uuid

    dirs = log.files_for(table)
    if not dirs:
        raise ValueError(f"table {table!r} has no committed data")
    schema = spark.read.parquet(dirs[0]).schema
    glob = os.path.join(log.root, "data", table, "snap-*")
    stream = spark.readStream.schema(schema).parquet(glob)
    sink = f"log_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
