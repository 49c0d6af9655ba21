"""Hierarchical manifest tree: commit metadata is O(changed buckets),
independent of the table's total file count; append commits rebase
instead of conflicting; batch idempotence survives inline-window
truncation; orphan sweep GCs failed-commit residue.
"""

import json
import os
import time


from pyspark.sql import functions as F

from etl_bitcoin_spark.operators.merge import KEY_COLS, TRANSCRIPTS_DDL
from etl_bitcoin_spark.tableformat import LakeTable
from etl_bitcoin_spark.tableformat.lake import (
    BUCKET_COL,
    LSN_COL,
    MAX_APPLIED_BATCH_IDS,
)


def _spread_content(spark, lake, n_buckets, n_rows, lsn0=0):
    """Rows spread over all buckets, co-partitioned so each task writes
    exactly one bucket file."""
    df = (
        spark.range(0, n_rows, 1, 8)
        .select(
            F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
            (F.col("id") % 50).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit("t").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
            (F.col("id") + lsn0).alias(LSN_COL),
        )
        .withColumn("__deleted", F.lit(False))
        .withColumn(BUCKET_COL, lake.bucket_expr(n_buckets, KEY_COLS))
        .repartition(n_buckets, *KEY_COLS)
    )
    return df


def _one_key_content(spark, lake, conv, text, lsn, n_buckets):
    from datetime import datetime

    df = spark.createDataFrame(
        [(conv, 0, "user", text, None, datetime(2024, 1, 1), lsn, False)],
        f"{TRANSCRIPTS_DDL}, {LSN_COL} long, __deleted boolean",
    )
    return df.withColumn(BUCKET_COL, lake.bucket_expr(n_buckets, KEY_COLS))


def _manifest_files(lake):
    """{relpath: size} of every manifest-tree file (ledger markers and
    the _latest hint excluded — they are O(1) per commit by construction)."""
    out = {}
    for sub, _d, files in os.walk(lake.manifest_dir):
        if os.path.basename(sub) == "batches" or "/batches/" in sub.replace(
            "\\", "/"
        ):
            continue
        for fn in files:
            if fn == "_latest":
                continue
            p = os.path.join(sub, fn)
            out[os.path.relpath(p, lake.manifest_dir)] = os.path.getsize(p)
    return out


def test_commit_metadata_independent_of_total_file_count(spark, tmp_path):
    """The 100x commit path: on a 4096-bucket table, a small commit's
    NEW manifest bytes must not grow when the table's total data-file
    count doubles — metadata is O(changed buckets) + O(#groups), never
    O(total files). Existing manifest nodes are immutable (nothing is
    rewritten in place)."""
    n_buckets = 4096
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, n_buckets
    )
    assert lake.commit(
        _spread_content(spark, lake, n_buckets, 20_000),
        list(range(n_buckets)),
        "bulk-1",
        (0, 19_999),
    )
    files_1x = sum(
        len(e["files"]) for e in lake.bucket_entries().values()
    )

    def small_commit(tag, lsn):
        before = _manifest_files(lake)
        content = _one_key_content(spark, lake, "c1", tag, lsn, n_buckets)
        b = content.select(BUCKET_COL).collect()[0][0]
        assert lake.commit(content, [b], tag, (lsn, lsn))
        after = _manifest_files(lake)
        # immutability: no pre-existing manifest file changed size
        for rel, size in before.items():
            assert after.get(rel) == size, f"manifest node {rel} mutated"
        new = {r: s for r, s in after.items() if r not in before}
        return new

    new1 = small_commit("small-1", 20_000)
    # doubling the table's file count (append mode adds a second file to
    # every bucket) must not change the small commit's metadata bytes
    assert lake.commit(
        _spread_content(spark, lake, n_buckets, 20_000, lsn0=30_000),
        [],
        "bulk-2",
        (30_000, 49_999),
        mode="append",
    )
    files_2x = sum(
        len(e["files"]) for e in lake.bucket_entries().values()
    )
    assert files_2x > 1.8 * files_1x  # file count really ~doubled
    new2 = small_commit("small-2", 20_001)

    def split(new):
        bm = sum(s for r, s in new.items() if r.startswith("bm"))
        gm = sum(s for r, s in new.items() if r.startswith("gm"))
        root = sum(s for r, s in new.items() if r.startswith("v"))
        n_bm = sum(1 for r in new if r.startswith("bm"))
        return bm, gm, root, n_bm

    bm1, gm1, root1, n_bm1 = split(new1)
    bm2, gm2, root2, n_bm2 = split(new2)
    # one bucket touched -> exactly one new bucket manifest, one group
    assert n_bm1 == n_bm2 == 1
    # metadata bytes independent of total file count (small tolerance:
    # the snapshot root's applied_batch_ids list grows by one id)
    total1, total2 = bm1 + gm1 + root1, bm2 + gm2 + root2
    assert total2 <= 1.15 * total1, (new1, new2)
    # and the snapshot root is O(#groups), nowhere near O(total files):
    # 64 groups x ~200B << 4096 buckets x file lists
    assert root2 < 64 * 400


def test_append_append_same_bucket_rebases(spark, tmp_path):
    """Two concurrent appends to the SAME bucket must both land (appends
    commute — the loser rebases and merges file lists), never
    CommitConflict. With hash bucketing two fast-appends almost always
    share a bucket, so conflicting here would make multi-writer append
    abort ~always."""
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    v0 = lake.snapshot()["version"]
    c1 = _one_key_content(spark, lake, "k", "w1", 1, 4)
    c2 = _one_key_content(spark, lake, "k", "w2", 2, 4)  # same bucket
    assert lake.commit(c1, [], "w1", (1, 1), mode="append", base_version=v0)
    # stale base, same bucket -> rebase, not conflict
    assert lake.commit(c2, [], "w2", (2, 2), mode="append", base_version=v0)
    b = str(c1.select(BUCKET_COL).collect()[0][0])
    entry = lake.bucket_entries()[b]
    assert len(entry["files"]) == 2 and entry["rows"] == 2
    assert lake.read().count() == 2


def test_append_batch_replay_rejected_beyond_inline_window(spark, tmp_path):
    """Append-mode commits write no applied_ranges, so their only replay
    guard is the batch id. The durable marker ledger must reject a
    replay even after the inline applied_batch_ids window truncated the
    id away (e.g. re-draining a WAL after checkpoint loss, hundreds of
    commits later) — silently double-appending rows is the failure
    mode."""
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    content = _one_key_content(spark, lake, "c1", "hi", 1, 2)
    assert lake.commit(content, [], "A", None, mode="append")
    ddl = lake.snapshot()["schema_ddl"]
    for i in range(MAX_APPLIED_BATCH_IDS + 5):
        lake.evolve_schema(ddl, f"churn-{i}")
    assert "A" not in lake.snapshot()["applied_batch_ids"]  # truncated away
    assert not lake.commit(content, [], "A", None, mode="append")
    assert lake.read().count() == 1, "replayed append must be a no-op"


def test_orphan_sweep_removes_failed_commit_residue(spark, tmp_path):
    """Staged data files from commits that lost all CAS retries or
    crashed pre-claim, and leaked manifest tmp files, are swept by
    expire_snapshots(orphan_grace_sec=...) — but only past the grace
    period, and never files a retained snapshot references."""
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    content = _one_key_content(spark, lake, "c1", "hi", 1, 2)
    assert lake.commit(content, [0, 1], "b1", (1, 1))
    # fabricate failed-commit residue
    orphan_dir = os.path.join(lake.data_dir, "commit-99999999-dead", "bucket=0")
    os.makedirs(orphan_dir)
    orphan_data = os.path.join(orphan_dir, "part-orphan.parquet")
    open(orphan_data, "w").write("junk")
    orphan_tmp = os.path.join(lake.manifest_dir, "v00000099.json.tmp.x")
    open(orphan_tmp, "w").write("junk")
    orphan_bm = os.path.join(lake.manifest_dir, "bm", "bm-orphan.json")
    open(orphan_bm, "w").write(json.dumps({"files": [], "rows": 0}))
    old = time.time() - 3600
    for p in (orphan_data, orphan_tmp, orphan_bm):
        os.utime(p, (old, old))
    # fresh residue (inside grace) must survive — could be an in-flight commit
    fresh = os.path.join(lake.data_dir, "commit-99999998-live", "bucket=1")
    os.makedirs(fresh)
    fresh_file = os.path.join(fresh, "part-inflight.parquet")
    open(fresh_file, "w").write("staging")

    res = lake.expire_snapshots(keep_last=10, orphan_grace_sec=600)
    assert res["orphans_removed"] == 3
    assert not os.path.exists(orphan_data)
    assert not os.path.exists(orphan_tmp)
    assert not os.path.exists(orphan_bm)
    assert os.path.exists(fresh_file), "in-grace staging must survive"
    assert lake.read(user_cols=True).count() == 1  # live data untouched
    # idempotent
    assert lake.expire_snapshots(keep_last=10, orphan_grace_sec=600)[
        "orphans_removed"
    ] == 0


def test_latest_resolution_survives_stale_or_missing_hint(spark, tmp_path):
    """_latest is a hint, not the truth: a stale hint walks forward to
    the real latest; a missing hint falls back to a listing."""
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    for i in range(3):
        content = _one_key_content(spark, lake, "c1", f"v{i}", i + 1, 2)
        assert lake.commit(content, [0, 1], f"b{i}", (i + 1, i + 1))
    v = lake.snapshot()["version"]
    latest_path = os.path.join(lake.manifest_dir, "_latest")
    open(latest_path, "w").write("v00000001.json")  # stale hint
    assert lake.snapshot()["version"] == v
    os.remove(latest_path)
    assert lake.snapshot()["version"] == v


def test_file_stats_enable_lsn_file_skipping(spark, tmp_path):
    """Per-file __lsn min/max recorded at commit time (from parquet
    footers) let lsn-bounded raw scans SKIP files at the manifest level
    — the Iceberg data-skipping pattern. Three commits at disjoint lsn
    ranges; a bounded read must open only the intersecting files and
    return exactly the rows a full scan + filter would."""
    from pyspark.sql import functions as F

    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    for i, lsn0 in enumerate((0, 1000, 2000)):
        rows = [
            _one_key_content(spark, lake, f"c{i}-{j}", f"t{j}", lsn0 + j, 2)
            for j in range(3)
        ]
        content = rows[0]
        for r in rows[1:]:
            content = content.unionByName(r)
        assert lake.commit(content, [], f"b{i}", (lsn0, lsn0 + 2),
                           mode="append")
    # stats recorded for every file
    entries = lake.bucket_entries()
    n_files = sum(len(e["files"]) for e in entries.values())
    n_stats = sum(len(e["file_stats"]) for e in entries.values())
    assert n_files == n_stats > 0
    full = lake.read(resolve_deltas=False)
    bounded = lake.read(lsn_range=(1000, 1002))
    assert len(bounded.inputFiles()) < len(full.inputFiles())
    got = sorted(r["conv_id"] for r in bounded.collect())
    want = sorted(
        r["conv_id"]
        for r in full.filter(
            (F.col("__lsn") >= 1000) & (F.col("__lsn") <= 1002)
        ).collect()
    )
    assert got == want and len(got) == 3
    # open-ended bound + compaction discovery path still correct
    assert lake.read(lsn_range=(None, 2)).count() == 3
