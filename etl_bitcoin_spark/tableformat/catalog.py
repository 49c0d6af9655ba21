"""LakeCatalog — atomic multi-table transactions over LakeTables.

The reference's signature move is one buffered transaction fanning a
batch into 10 normalized tables with a single Commit() (reference
database/csv/neo4j_csv/neo4j_csv.go:103-117, tables declared at
neo4j_csv.go:13-29) — but its commit is NOT atomic across files (a
worker failing mid-commit leaves tables inconsistent, with no rollback).
This module supplies the engine-level equivalent with real atomicity:

- Tables are ordinary LakeTables under ``<root>/<name>/``.
- The catalog keeps its own manifest: a map ``table -> pinned manifest
  version`` published via atomic rename, exactly like a table manifest.
- ``commit_multi`` stages every table's snapshot first (per-table
  commits, idempotent on batch_id), then publishes ONE catalog manifest
  pointing at all the new versions. A crash anywhere before that final
  rename leaves the catalog pointing at the OLD version of every table —
  readers never observe a partial transaction.
- Replaying ``commit_multi`` after a crash is safe: tables that already
  applied the batch are recognized (batch_id guard) and their committed
  version is recovered from their manifest history, so the catalog
  publish completes the transaction instead of double-applying.

Reads through the catalog (``read``) resolve the pinned version, not the
table's own ``_latest`` pointer, so a half-landed transaction is
invisible. Single catalog writer, many readers — same model as the
table layer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .lake import LakeTable, _atomic_write


class LakeCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.catalog_dir = os.path.join(root, "_catalog")

    # ---------------------------------------------------------------- setup
    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "LakeCatalog":
        cat = cls(spark, root)
        os.makedirs(cat.catalog_dir, exist_ok=True)
        cat._publish(
            {
                "version": 1,
                "parent": None,
                "batch_id": None,
                "applied_batch_ids": [],
                "committed_at": time.time(),
                "tables": {},
            }
        )
        return cat

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "_catalog", "_latest"))

    def create_table(
        self,
        name: str,
        schema_ddl: str,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> LakeTable:
        t = LakeTable.create(
            self.spark, os.path.join(self.root, name), schema_ddl, key_cols,
            n_buckets,
        )
        m = self.snapshot()
        m["version"] += 1
        m["parent"] = m["version"] - 1
        m["tables"] = dict(m["tables"], **{name: 1})
        m["committed_at"] = time.time()
        self._publish(m)
        return t

    # ------------------------------------------------------------ manifests
    def _publish(self, manifest: dict[str, Any]) -> None:
        name = f"v{manifest['version']:08d}.json"
        _atomic_write(
            os.path.join(self.catalog_dir, name), json.dumps(manifest, indent=1)
        )
        _atomic_write(os.path.join(self.catalog_dir, "_latest"), name)

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        if version is None:
            with open(os.path.join(self.catalog_dir, "_latest")) as f:
                name = f.read().strip()
        else:
            name = f"v{version:08d}.json"
        with open(os.path.join(self.catalog_dir, name)) as f:
            return json.load(f)

    # ----------------------------------------------------------------- read
    def table(self, name: str) -> LakeTable:
        return LakeTable(self.spark, os.path.join(self.root, name))

    def read(
        self, name: str, catalog_version: int | None = None, **kw
    ) -> DataFrame:
        """Read a table AT ITS CATALOG-PINNED VERSION — the consistent
        multi-table snapshot, immune to half-landed transactions."""
        snap = self.snapshot(catalog_version)
        if name not in snap["tables"]:
            raise KeyError(f"table {name!r} not in catalog")
        return self.table(name).read(version=snap["tables"][name], **kw)

    # --------------------------------------------------------------- commit
    def commit_multi(
        self,
        writes: dict[str, dict[str, Any]],
        batch_id: str,
    ) -> bool:
        """Land one batch across several tables atomically (the engine
        analog of the reference's one-DBTx-many-tables Commit).

        ``writes``: table name -> kwargs for ``LakeTable.commit`` minus
        batch_id, i.e. ``{"new_content": df, "replaced_buckets": [...],
        "lsn_range": (lo, hi) | None, "metrics": {...}}``.

        Phase 1 stages each table's snapshot (data files + table
        manifest). Phase 2 publishes one catalog manifest pinning every
        new version. Crash before phase 2 => catalog still pins the old
        version of EVERY table; re-running with the same batch_id
        resumes (already-committed tables are recovered by batch_id) and
        completes the publish. Returns False if the whole transaction
        was already applied.
        """
        cat = self.snapshot()
        if batch_id in cat["applied_batch_ids"]:
            return False
        pinned = dict(cat["tables"])
        for name, kw in writes.items():
            table = self.table(name)
            applied = table.commit(batch_id=f"{batch_id}/{name}", **kw)
            if applied:
                pinned[name] = table.snapshot()["version"]
            else:
                # crash-resume path: this table landed the batch in a
                # previous attempt — pin the version that carries it.
                v = self._version_for_batch(table, f"{batch_id}/{name}")
                if v is None:
                    raise RuntimeError(
                        f"table {name}: batch {batch_id} recorded as applied "
                        "but no manifest carries it (history expired?)"
                    )
                pinned[name] = v
        manifest = {
            "version": cat["version"] + 1,
            "parent": cat["version"],
            "batch_id": batch_id,
            "applied_batch_ids": (cat["applied_batch_ids"] + [batch_id])[-256:],
            "committed_at": time.time(),
            "tables": pinned,
        }
        self._publish(manifest)
        return True

    @staticmethod
    def _version_for_batch(table: LakeTable, batch_id: str) -> int | None:
        for v in reversed(table.versions()):
            if table.snapshot(v).get("batch_id") == batch_id:
                return v
        return None

    # ----------------------------------------------------------- maintenance
    def versions(self) -> list[int]:
        out = []
        for n in os.listdir(self.catalog_dir):
            if n.startswith("v") and n.endswith(".json"):
                out.append(int(n[1:-5]))
        return sorted(out)

    def expire_snapshots(self, keep_last: int = 10) -> dict[str, Any]:
        """Catalog-coordinated expiry: trim catalog snapshots to the last
        ``keep_last``, then expire each member table while PINNING every
        table version any retained catalog snapshot still references —
        a consistent multi-table time-travel window survives, everything
        older is GC'd."""
        versions = self.versions()
        keep = versions[-keep_last:]
        removed = 0
        for v in versions:
            if v not in keep:
                os.remove(os.path.join(self.catalog_dir, f"v{v:08d}.json"))
                removed += 1
        pinned: dict[str, set[int]] = {}
        for v in keep:
            m = self.snapshot(v)
            for name, tv in m["tables"].items():
                pinned.setdefault(name, set()).add(tv)
        table_stats = {}
        for name, pins in pinned.items():
            table_stats[name] = self.table(name).expire_snapshots(
                keep_last=1, pinned_versions=pins
            )
        return {"catalog_snapshots_removed": removed, "tables": table_stats}
