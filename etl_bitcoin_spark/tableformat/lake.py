"""LakeTable — a native snapshot-committed Parquet table (Iceberg-style).

No Delta/Iceberg jars exist in this environment, so the lake layer is
built natively, which also satisfies the north rule's "core machinery is
built natively". Semantics provided:

- **Atomic commit**: a snapshot is a JSON manifest listing every data file
  per key-bucket. Writers stage data files first, then publish a new
  manifest via POSIX ``os.rename`` (atomic on one filesystem) of a
  ``_latest`` pointer. Readers resolve ``_latest`` -> manifest -> file
  list, so they always see a complete snapshot, never a partial write.
  This fixes the reference's non-atomic multi-file commit (a Go worker
  failing mid-``DBTx.Commit`` leaves tables inconsistent — reference
  database/csv/neo4j_csv/neo4j_csv.go:103-117 fans one message per table
  with no rollback).
- **Idempotent re-commit**: every commit carries a ``batch_id``; the
  manifest accumulates the set of applied batch ids, so replaying a
  micro-batch after a crash is a no-op (exactly-once sink, the analog of
  the reference's ``Committed()`` flag, loader/mock_types_test.go:137-145).
- **Resume watermark**: the manifest stores the applied-LSN high-water
  mark and per-bucket lineage (applied LSN ranges + row counts), an O(1)
  replacement for the reference's O(n) tail-scan ``LastBlockNumber()``
  (database/csv/neo4j_csv/neo4j_csv.go:62-79, csv_file.go:122-129).
- **Time travel**: ``read(version=k)`` reads any retained snapshot.
- **Key-bucketed layout**: rows are hash-bucketed on the primary key
  ``(conv_id, turn_idx)`` so a MERGE only rewrites affected buckets and a
  hot ``conv_id`` spreads across buckets (turn_idx participates in the
  hash — skew-free by construction). At 100 TB the bucket count is the
  rewrite granularity: buckets are independent units of work, one task
  each, so merge parallelism scales with the bucket count, not file count.

Layout::

    <root>/
      _manifests/v00000001.json ...   # immutable snapshots
      _manifests/_latest              # pointer file, atomically renamed
      data/commit-<v>/bucket=<k>/*.parquet

Single-writer per table (the streaming query's foreachBatch), many
readers — same model as Iceberg's optimistic single-committer fast path.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"
LSN_COL = "__lsn"
DELETED_COL = "__deleted"

# The manifest keeps only the most recent batch ids for the idempotent
# re-commit guard (crash-restart replays are always of a *recent* batch);
# anything older is still rejected by the lsn applied_ranges guard. An
# unbounded list would grow the manifest O(#micro-batches) forever —
# millions of entries over a long-running tail.
MAX_APPLIED_BATCH_IDS = 256


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


class CommitConflict(RuntimeError):
    pass


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifests")
        self.data_dir = os.path.join(root, "data")

    # ---------------------------------------------------------- create/load
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema_ddl: str,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> "LakeTable":
        t = cls(spark, root)
        os.makedirs(t.manifest_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        manifest = {
            "version": 1,
            "parent": None,
            "schema_ddl": schema_ddl,
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "batch_id": None,
            "applied_batch_ids": [],
            "committed_at": time.time(),
            "buckets": {},
            "lineage": {"hwm": -1, "applied_ranges": [], "rows_total": 0},
        }
        t._publish(manifest)
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "_manifests", "_latest"))

    # ------------------------------------------------------------ manifests
    def _publish(self, manifest: dict[str, Any]) -> None:
        name = f"v{manifest['version']:08d}.json"
        _atomic_write(
            os.path.join(self.manifest_dir, name),
            json.dumps(manifest, indent=1),
        )
        _atomic_write(os.path.join(self.manifest_dir, "_latest"), name)

    def _claim_version(self, manifest: dict[str, Any]) -> bool:
        """Multi-writer CAS: atomically create v{N}.json via os.link
        (create-if-absent on one filesystem). Returns False if another
        writer claimed version N first — the caller rebases and retries.
        ``_latest`` stays a best-effort hint; the authoritative latest is
        max(versions()) (see snapshot), so a stale hint can never roll a
        reader back."""
        name = f"v{manifest['version']:08d}.json"
        path = os.path.join(self.manifest_dir, name)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(json.dumps(manifest, indent=1))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.remove(tmp)
            return False
        os.remove(tmp)
        _atomic_write(os.path.join(self.manifest_dir, "_latest"), name)
        return True

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        if version is None:
            # Authoritative latest = highest committed version on disk.
            # (The _latest pointer is only a hint: under concurrent
            # writers it can briefly lag or regress.)
            vs = self.versions()
            if not vs:
                raise FileNotFoundError(f"no manifests under {self.manifest_dir}")
            name = f"v{vs[-1]:08d}.json"
        else:
            name = f"v{version:08d}.json"
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def versions(self) -> list[int]:
        out = []
        for n in os.listdir(self.manifest_dir):
            if n.startswith("v") and n.endswith(".json"):
                out.append(int(n[1:-5]))
        return sorted(out)

    # ----------------------------------------------------------------- read
    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        user_cols: bool = False,
    ) -> DataFrame:
        """Read a snapshot. ``buckets`` prunes to those buckets only —
        the MERGE's partition-pruning fast path (only touched buckets are
        scanned, the rest of the 100 TB is never read)."""
        m = self.snapshot(version)
        sel = m["buckets"]
        if buckets is not None:
            want = {str(b) for b in buckets}
            sel = {k: v for k, v in sel.items() if k in want}
        files = [os.path.join(self.root, f) for b in sel.values() for f in b["files"]]
        schema = f"{m['schema_ddl']}, {LSN_COL} long, {DELETED_COL} boolean"
        if not files:
            df = self.spark.createDataFrame([], schema=schema)
        else:
            # Old data files may predate an additive schema evolution:
            # the explicit read schema backfills missing columns as null.
            df = self.spark.read.schema(schema).parquet(*files)
        df = df.withColumn(DELETED_COL, F.coalesce(F.col(DELETED_COL), F.lit(False)))
        # BUCKET_COL is a pure function of the key columns — re-derive it
        # instead of parsing paths (robust to any directory layout).
        df = df.withColumn(
            BUCKET_COL, self.bucket_expr(m["n_buckets"], m["key_cols"])
        )
        if user_cols:
            df = df.filter(~F.col(DELETED_COL)).drop(
                LSN_COL, DELETED_COL, BUCKET_COL
            )
        return df

    # --------------------------------------------------------------- commit
    def bucket_expr(self, n_buckets: int, key_cols: list[str]):
        return F.pmod(F.hash(*key_cols), F.lit(n_buckets)).cast("int")

    def commit(
        self,
        new_content: DataFrame,
        replaced_buckets: list[int],
        batch_id: str,
        lsn_range: tuple[int, int] | None = None,
        metrics: dict[str, Any] | None = None,
        lsn_ranges: list[list[int]] | None = None,
        mode: str = "replace",
        base_version: int | None = None,
        max_retries: int = 5,
    ) -> bool:
        """Publish a new snapshot that replaces ``replaced_buckets`` with
        the rows of ``new_content`` (which must contain BUCKET_COL and
        LSN_COL and only rows belonging to those buckets). Returns False
        (no-op) if ``batch_id`` was already applied — the exactly-once
        guard. Untouched buckets carry their existing files forward
        (metadata-only, zero data movement).

        ``mode="append"`` is the Iceberg-style fast append: new files
        are ADDED to their buckets' file lists and nothing is replaced —
        pure metadata merge, the scalable path for append-mostly fan-out
        tables (event nodes, edges, lineage). ``replaced_buckets`` must
        be empty in append mode.

        **Multi-writer protocol** (Iceberg-style optimistic): data files
        stage once; the manifest publish is a CAS on the version number.
        Losing the race triggers a REBASE: if no bucket this commit
        touches changed since ``base_version`` (the snapshot the caller
        computed its content against — pass it for exactness; defaults
        to the snapshot at commit entry), the manifest is rebuilt on the
        winner's snapshot and re-claimed; otherwise ``CommitConflict``
        is raised and the caller must recompute its merge."""
        if mode == "append" and replaced_buckets:
            raise ValueError("append mode cannot replace buckets")
        prev = self.snapshot()
        if batch_id in prev["applied_batch_ids"]:
            return False
        # Staging dir is version-independent (unique suffix): a rebase
        # publishes the same files under a later version.
        out_dir = os.path.join(
            self.data_dir,
            f"commit-{prev['version'] + 1:08d}-{uuid.uuid4().hex[:8]}",
        )
        # Per-bucket row counts ride along with the write itself via
        # Observation metrics — no parquet-footer re-reads, no second
        # job. Above 128 buckets the N conditional sums get expensive
        # (measured: 1024 when-sums cost 4x the write itself), so large
        # tables use a DISTRIBUTED footer-stats job instead — flat in
        # bucket count, never a driver-side crawl.
        n_buckets = prev["n_buckets"]
        obs = None
        if n_buckets <= 128:
            from pyspark.sql import Observation

            obs = Observation()
            new_content = new_content.observe(
                obs,
                *[
                    F.sum(
                        F.when(F.col(BUCKET_COL) == b, 1).otherwise(0)
                    ).alias(f"b{b}")
                    for b in range(n_buckets)
                ],
            )
        (
            new_content.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        obs_rows: dict[str, int] | None = None
        if obs is not None:
            got = obs.get
            obs_rows = {
                str(b): int(got[f"b{b}"] or 0) for b in range(n_buckets)
            }
        rel = os.path.relpath(out_dir, self.root)
        work = []
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            for fn in os.listdir(os.path.join(out_dir, entry)):
                if fn.endswith(".parquet"):
                    work.append((b, entry, fn))
        per_bucket: dict[str, dict] = {}
        if obs_rows is not None:
            for b, entry, fn in work:
                info = per_bucket.setdefault(b, {"files": [], "rows": 0})
                info["files"].append(os.path.join(rel, entry, fn))
            for b, info in per_bucket.items():
                info["rows"] = obs_rows.get(b, 0)
        elif len(work) <= 64:
            # small commit: direct footer reads beat a job round-trip
            from concurrent.futures import ThreadPoolExecutor

            def _meta(item):
                b, entry, fn = item
                n = pq.read_metadata(os.path.join(out_dir, entry, fn)).num_rows
                return b, os.path.join(rel, entry, fn), n

            with ThreadPoolExecutor(max_workers=min(16, len(work))) as ex:
                for b, relpath, n in ex.map(_meta, work):
                    info = per_bucket.setdefault(b, {"files": [], "rows": 0})
                    info["files"].append(relpath)
                    info["rows"] += n
        else:
            # scale path: read footers ON THE EXECUTORS — one tiny job,
            # wall time flat in bucket count (a 4096-bucket commit reads
            # 4096 footers across the cluster, not serially on the
            # driver).
            meta_rows = self.spark.createDataFrame(
                [(b, os.path.join(out_dir, e, f), os.path.join(rel, e, f))
                 for b, e, f in work],
                "b string, abspath string, relpath string",
            )

            def _read_footers(batches):
                import pyarrow.parquet as _pq

                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["rows"] = [
                        _pq.read_metadata(p).num_rows for p in pdf["abspath"]
                    ]
                    yield pdf[["b", "relpath", "rows"]]

            stats = meta_rows.repartition(
                min(len(work), 2 * int(self.spark.sparkContext.defaultParallelism))
            ).mapInPandas(
                _read_footers, "b string, relpath string, rows long"
            ).collect()
            for r in stats:
                info = per_bucket.setdefault(r["b"], {"files": [], "rows": 0})
                info["files"].append(r["relpath"])
                info["rows"] += int(r["rows"])
        for info in per_bucket.values():
            info["files"].sort()

        # ----- optimistic publish: rebase-and-retry on lost CAS races.
        # ``base`` = the snapshot this commit's CONTENT was computed
        # against; any concurrent change to a bucket we touch since then
        # invalidates the content (conflict), disjoint changes rebase.
        base = prev if base_version is None else self.snapshot(base_version)
        touched = {str(b) for b in replaced_buckets} | set(per_bucket)
        for _attempt in range(max_retries):
            cur = self.snapshot()
            if batch_id in cur["applied_batch_ids"]:
                return False
            if cur["version"] != base["version"]:
                for b in touched:
                    if cur["buckets"].get(b) != base["buckets"].get(b):
                        raise CommitConflict(
                            f"bucket {b} changed concurrently "
                            f"(v{base['version']} -> v{cur['version']}); "
                            "recompute the merge against the new snapshot"
                        )
            buckets = dict(cur["buckets"])
            for b in replaced_buckets:
                buckets.pop(str(b), None)
            for b, info in per_bucket.items():
                if mode == "append":
                    if info["rows"] > 0:
                        prev_b = buckets.get(b, {"files": [], "rows": 0})
                        buckets[b] = {
                            "files": sorted(prev_b["files"] + info["files"]),
                            "rows": prev_b["rows"] + info["rows"],
                        }
                elif info["rows"] > 0:
                    buckets[b] = dict(info)
                elif b in buckets:
                    del buckets[b]
            lineage = dict(cur["lineage"])
            # Applied-lsn bookkeeping accepts either one dense span or
            # the exact sub-ranges of a sparse (late/out-of-order) batch
            # — recording a sparse batch as its (min,max) span would
            # mark the gap lsns applied and silently drop their later
            # delivery.
            new_ranges = [list(r) for r in (lsn_ranges or [])]
            if lsn_range is not None:
                new_ranges.append(list(lsn_range))
            if new_ranges:
                lineage["hwm"] = max(
                    lineage["hwm"], max(r[1] for r in new_ranges)
                )
                lineage["applied_ranges"] = _merge_ranges(
                    lineage["applied_ranges"] + new_ranges
                )
            lineage["rows_total"] = sum(b["rows"] for b in buckets.values())
            manifest = {
                "version": cur["version"] + 1,
                "parent": cur["version"],
                "schema_ddl": cur["schema_ddl"],
                "key_cols": cur["key_cols"],
                "n_buckets": cur["n_buckets"],
                "batch_id": batch_id,
                "applied_batch_ids": (cur["applied_batch_ids"] + [batch_id])[
                    -MAX_APPLIED_BATCH_IDS:
                ],
                "committed_at": time.time(),
                "buckets": buckets,
                "lineage": lineage,
                "metrics": metrics or {},
            }
            if self._claim_version(manifest):
                return True
        raise CommitConflict(
            f"lost {max_retries} CAS races publishing batch {batch_id}"
        )

    def evolve_schema(self, new_ddl: str, batch_id: str) -> bool:
        """Additive schema evolution: publish a metadata-only snapshot with
        the widened DDL. Existing files lack the new columns; ``read``
        backfills them as null via the explicit read schema. CAS-safe
        under concurrent writers (metadata-only, so a lost race simply
        rebases on the winner)."""
        for _attempt in range(8):
            prev = self.snapshot()
            if batch_id in prev["applied_batch_ids"]:
                return False
            m = dict(prev)
            m["version"] = prev["version"] + 1
            m["parent"] = prev["version"]
            m["schema_ddl"] = new_ddl
            m["batch_id"] = batch_id
            m["applied_batch_ids"] = (prev["applied_batch_ids"] + [batch_id])[
                -MAX_APPLIED_BATCH_IDS:
            ]
            m["committed_at"] = time.time()
            if self._claim_version(m):
                return True
        raise CommitConflict(f"lost 8 CAS races evolving schema ({batch_id})")

    def read_changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Change feed between two snapshots (a downstream-consumable CDC
        output, the analog of Delta's table_changes): one row per key
        whose state differs, with ``_change_type`` in
        {insert, update_postimage, delete}.

        Cost model: only buckets whose file lists CHANGED between the two
        manifests are read (metadata diff prunes the rest), then a full
        outer join on the key within those buckets."""
        m_new = self.snapshot(to_version)
        m_old = self.snapshot(from_version)
        changed = [
            int(b)
            for b in set(m_new["buckets"]) | set(m_old["buckets"])
            if m_new["buckets"].get(b) != m_old["buckets"].get(b)
        ]
        key = m_new["key_cols"]
        # Stored state intentionally keeps up to TWO rows per key after a
        # delete-then-reinsert (retained tombstone + live winner). Collapse
        # each side to one row per key — live winner beats tombstone,
        # newest lsn wins — before joining, or the full-outer join fans
        # out (winner_new x tomb_old) and emits phantom insert/delete
        # pairs for keys that did not change.
        from pyspark.sql import Window

        def _one_per_key(df: DataFrame) -> DataFrame:
            w = Window.partitionBy(*key).orderBy(
                F.col(DELETED_COL).asc(), F.col(LSN_COL).desc()
            )
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )

        old = _one_per_key(
            self.read(version=from_version, buckets=changed)
        ).select(
            *key, F.col(LSN_COL).alias("__old_lsn"),
            F.col(DELETED_COL).alias("__old_del"),
        )
        new = _one_per_key(self.read(version=to_version, buckets=changed))
        j = new.join(old, key, "full_outer")
        was_live = F.col("__old_del").isNotNull() & ~F.col("__old_del")
        is_live = F.col(DELETED_COL).isNotNull() & ~F.col(DELETED_COL)
        change = (
            F.when(~was_live.eqNullSafe(True) & is_live, F.lit("insert"))
            .when(
                was_live & is_live & (F.col(LSN_COL) != F.col("__old_lsn")),
                F.lit("update_postimage"),
            )
            .when(was_live & ~is_live.eqNullSafe(True), F.lit("delete"))
        )
        user_cols = [f.split(" ")[0] for f in m_new["schema_ddl"].split(", ")]
        return (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(*user_cols, "_change_type")
        )

    # ---------------------------------------------------------- maintenance
    def expire_snapshots(
        self,
        keep_last: int = 10,
        pinned_versions: set[int] | None = None,
    ) -> dict[str, int]:
        """Retire old snapshots and delete data files no retained
        snapshot references (Iceberg-style expire + orphan GC). The
        latest snapshot is never touched; the operation is metadata-first
        (manifests removed only after their exclusive files are gone), so
        a crash mid-expiry leaves a readable table and re-running
        completes the cleanup. ``pinned_versions`` (e.g. versions a
        LakeCatalog snapshot still references) always survive regardless
        of ``keep_last``."""
        versions = self.versions()
        keep = set(versions[-keep_last:]) | {
            v for v in (pinned_versions or set()) if v in versions
        }
        if len(versions) <= len(keep):
            return {"snapshots_removed": 0, "files_removed": 0}
        live_files: set[str] = set()
        for v in keep:
            m = self.snapshot(v)
            for b in m["buckets"].values():
                live_files.update(b["files"])
        files_removed = 0
        for v in versions:
            if v in keep:
                continue
            m = self.snapshot(v)
            for b in m["buckets"].values():
                for f in b["files"]:
                    if f not in live_files:
                        p = os.path.join(self.root, f)
                        if os.path.exists(p):
                            os.remove(p)
                            files_removed += 1
            os.remove(os.path.join(self.manifest_dir, f"v{v:08d}.json"))
        # prune now-empty commit dirs
        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            if os.path.isdir(full):
                for sub, _dirs, files in list(os.walk(full, topdown=False)):
                    if not os.listdir(sub):
                        os.rmdir(sub)
        return {
            "snapshots_removed": len(versions) - len(keep),
            "files_removed": files_removed,
        }

    def compact_bucket_tombstones(
        self, horizon_lsn: int, batch_id: str | None = None
    ) -> dict[str, int]:
        """Drop tombstones at or below a producer LSN horizon.

        Tombstones exist to defeat LATE re-deliveries of I/U events with
        lsns below a delete (merge.py LWW algebra). Once the producer
        guarantees no event with ``lsn <= horizon_lsn`` will ever arrive
        again (a low-watermark contract), those tombstones carry no
        information and can be compacted away. Duplicate REPLAYS of old
        events below the horizon remain harmless: they die at the exact
        applied-range guard (state.ExactlyOnceFilter), which compaction
        does not touch.

        Only buckets that actually hold compactable tombstones are
        rewritten (discovered by a pruned scan); the rest carry forward
        metadata-only."""
        snap = self.snapshot()
        n_buckets = snap["n_buckets"]
        victim = F.col(DELETED_COL) & (F.col(LSN_COL) <= F.lit(horizon_lsn))
        affected = [
            r[BUCKET_COL]
            for r in self.read()
            .filter(victim)
            .select(BUCKET_COL)
            .distinct()
            .collect()
        ]
        if not affected:
            return {"buckets_rewritten": 0, "applied": False}
        kept = self.read(buckets=affected).filter(~victim)
        ok = self.commit(
            kept.repartition(len(affected), *snap["key_cols"]),
            affected,
            batch_id or f"compact-tombstones-{horizon_lsn}",
            metrics={"compaction": True, "horizon_lsn": horizon_lsn},
        )
        return {"buckets_rewritten": len(affected) if ok else 0, "applied": ok}

    # -------------------------------------------------------------- lineage
    @property
    def hwm(self) -> int:
        """Applied-LSN high-water mark, O(1) from the manifest (the
        reference re-scans the whole CSV to find it: csv_file.go:122-129)."""
        return self.snapshot()["lineage"]["hwm"]

    def lineage(self) -> dict[str, Any]:
        return self.snapshot()["lineage"]


def _merge_ranges(ranges: list[list[int]]) -> list[list[int]]:
    """Coalesce applied LSN ranges: [[0,5],[6,9],[20,25]] -> [[0,9],[20,25]].
    Kept small so the manifest stays O(#gaps), not O(#batches)."""
    out: list[list[int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out
