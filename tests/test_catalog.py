"""LakeCatalog: atomic multi-table transactions + one-pass fan-out.

Mirrors the reference's one-DBTx-many-tables Commit semantics
(database/csv/neo4j_csv/neo4j_csv.go:103-117) and fixes its known
weakness: a worker failing mid-commit must NOT leave readers a partial
transaction.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_bitcoin_spark.operators.fanout import (
    create_fanout_tables,
    fanout_batch,
)
from etl_bitcoin_spark.operators.merge import BINLOG_DDL
from etl_bitcoin_spark.tableformat.catalog import LakeCatalog
from etl_bitcoin_spark.tableformat.lake import BUCKET_COL, LSN_COL, LakeTable


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (l, op, c, t, None if op == "D" else "user",
             None if op == "D" else x, None, datetime(2024, 1, 1, 0, 0, s))
            for (l, op, c, t, x, s) in rows
        ],
        BINLOG_DDL,
    )


@pytest.fixture
def cat(spark, tmp_path):
    c = LakeCatalog.create(spark, str(tmp_path / "cat"))
    create_fanout_tables(c, n_buckets=4)
    return c


def test_fanout_one_pass_multi_table(spark, cat):
    ev = _events(spark, [
        (1, "I", "a", 0, "hi", 1),
        (2, "I", "a", 1, "there", 2),
        (3, "I", "b", 0, "yo", 3),
        (4, "U", "a", 0, "hi-v2", 4),
        (5, "D", "b", 0, None, 5),
    ])
    assert fanout_batch(cat, ev, "batch-1")["applied"]
    turns = cat.read("turns", user_cols=True)
    assert turns.count() == 5
    convs = {
        (r.conv_id, r.n_events)
        for r in cat.read("convs", user_cols=True).collect()
    }
    assert convs == {("a", 3), ("b", 2)}
    edges = {r.edge_id for r in cat.read("edges", user_cols=True).collect()}
    assert edges == {"a_0", "a_1", "b_0"}
    lin = cat.read("lineage", user_cols=True).collect()[0]
    assert (lin.events, lin.n_insert, lin.n_update, lin.n_delete) == (5, 3, 1, 1)
    assert (lin.lsn_lo, lin.lsn_hi) == (1, 5)
    # replay the same batch -> no-op
    assert not fanout_batch(cat, ev, "batch-1")["applied"]


def test_crash_between_tables_readers_see_old_snapshot(
    spark, cat, monkeypatch
):
    """Fail the transaction after SOME tables committed: the catalog
    must still serve the previous snapshot of every table; re-running
    the same batch completes the transaction exactly once."""
    ev1 = _events(spark, [(1, "I", "a", 0, "one", 1)])
    assert fanout_batch(cat, ev1, "b1")["applied"]
    before = {
        name: cat.read(name, user_cols=True).count()
        for name in ("turns", "convs", "edges", "lineage")
    }

    ev2 = _events(spark, [(2, "I", "c", 0, "two", 2),
                          (3, "I", "d", 0, "three", 3)])
    orig_commit = LakeTable.commit
    calls = {"n": 0}

    def exploding_commit(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # die after two tables landed
            raise RuntimeError("injected crash mid multi-table commit")
        return orig_commit(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "commit", exploding_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        fanout_batch(cat, ev2, "b2")
    monkeypatch.setattr(LakeTable, "commit", orig_commit)

    # catalog reads: ALL tables still at the pre-crash snapshot, even
    # though two tables physically committed new versions
    for name in ("turns", "convs", "edges", "lineage"):
        assert cat.read(name, user_cols=True).count() == before[name], name

    # resume: same batch id completes; already-committed tables are
    # recovered by batch_id, not double-applied
    assert fanout_batch(cat, ev2, "b2")["applied"]
    assert cat.read("turns", user_cols=True).count() == before["turns"] + 2
    assert cat.read("convs", user_cols=True).count() == before["convs"] + 2
    got = {r.conv_id for r in cat.read("convs", user_cols=True).collect()}
    assert got == {"a", "c", "d"}


def test_catalog_pinned_versions_are_stable(spark, cat):
    """A direct table write outside the catalog transaction must not
    leak into catalog reads (pinned-version isolation)."""
    ev = _events(spark, [(1, "I", "a", 0, "one", 1)])
    fanout_batch(cat, ev, "b1")
    n0 = cat.read("turns", user_cols=True).count()
    t = cat.table("turns")
    rogue = (
        _events(spark, [(99, "I", "z", 0, "rogue", 9)])
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts",
                F.col("lsn"), "op")
        .withColumn(LSN_COL, F.col("lsn"))
        .withColumn("__deleted", F.lit(False))
        .withColumn(BUCKET_COL, t.bucket_expr(4, ["conv_id", "turn_idx"]))
    )
    t.commit(rogue, list(range(4)), "rogue-commit")
    assert t.read(user_cols=True).count() == 1  # table head moved
    assert cat.read("turns", user_cols=True).count() == n0  # catalog stable


def test_streaming_fanout_tailer_exactly_once(spark, tmp_path):
    """Live multi-table fan-out: a WAL drained through FanoutTailer
    lands every event exactly once across all four tables, restart
    included (second drain over the same checkpoint is a no-op)."""
    from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, write_segments
    from etl_bitcoin_spark.operators.fanout import FanoutTailer

    pdf = generate_binlog(
        BinlogSpec(seed=5, n_convs=20, n_events=400, n_segments=4,
                   dup_rate=0.0)
    )
    wal = str(tmp_path / "wal")
    write_segments(pdf, wal)
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    create_fanout_tables(cat, n_buckets=4)
    tailer = FanoutTailer(spark, wal, cat, str(tmp_path / "ckpt"),
                          max_files_per_trigger=2)
    results = tailer.run_available()
    assert all(r["applied"] for r in results)

    turns = cat.read("turns", user_cols=True)
    assert turns.count() == 400
    assert turns.select("lsn").distinct().count() == 400
    lin = cat.read("lineage", user_cols=True).orderBy("lsn_lo").collect()
    assert sum(r.events for r in lin) == 400
    # per-batch conv nodes: dedup within batch only (reference semantics)
    n_convs_rows = cat.read("convs", user_cols=True).count()
    assert n_convs_rows >= 20

    # restart over the same checkpoint: nothing re-applied
    tailer2 = FanoutTailer(spark, wal, cat, str(tmp_path / "ckpt"),
                           max_files_per_trigger=2)
    tailer2.run_available()
    assert cat.read("turns", user_cols=True).count() == 400

    # redelivered batch under the same ids (crash-replay analog): no-op
    r = fanout_batch(
        cat,
        spark.read.parquet(wal),
        f"fanout-{tailer.ns}-0",
    )
    assert not r["applied"]
    assert cat.read("turns", user_cols=True).count() == 400


def test_catalog_expiry_pins_referenced_table_versions(spark, cat):
    """Catalog-coordinated GC: every table version a retained catalog
    snapshot references must survive table expiry; everything older is
    removed, and catalog time travel within the retained window still
    reads consistent multi-table states."""
    for i in range(5):
        ev = _events(spark, [(i + 1, "I", f"c{i}", 0, f"t{i}", i + 1)])
        assert fanout_batch(cat, ev, f"b{i}")["applied"]
    n_cat_versions = len(cat.versions())
    res = cat.expire_snapshots(keep_last=2)
    assert res["catalog_snapshots_removed"] == n_cat_versions - 2
    assert len(cat.versions()) == 2
    # latest catalog read intact
    assert cat.read("turns", user_cols=True).count() == 5
    # time travel to the OLDER retained catalog snapshot still works for
    # every table (their pinned versions survived table GC)
    v_old = cat.versions()[0]
    for name in ("turns", "convs", "edges", "lineage"):
        assert cat.read(name, catalog_version=v_old).count() >= 0
    assert cat.read("turns", catalog_version=v_old, user_cols=True).count() == 4
    # table manifests older than any pin are gone
    t = cat.table("turns")
    pins = {cat.snapshot(v)["tables"]["turns"] for v in cat.versions()}
    assert set(t.versions()) <= pins | {max(t.versions())}


def test_catalog_cas_threaded_two_writer_no_lost_pins(spark, tmp_path):
    """Two threads run commit_multi concurrently against the same
    catalog (disjoint batches, overlapping tables). The catalog publish
    is a CAS: the loser rebases on the winner's manifest, so BOTH
    transactions' pins survive — neither batch's rows are missing from
    catalog reads, and no catalog version was silently clobbered."""
    import threading

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    create_fanout_tables(cat, n_buckets=4)
    errs = []

    def run(lo, tag):
        try:
            ev = _events(
                spark,
                [(lo + i, "I", f"{tag}{i}", 0, f"t{i}", i % 60)
                 for i in range(15)],
            )
            assert fanout_batch(cat, ev, f"txn-{tag}")["applied"]
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=run, args=(0, "a"))
    t2 = threading.Thread(target=run, args=(100, "b"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    # both transactions visible through the catalog (no lost pin)
    turns = {r.conv_id for r in cat.read("turns", user_cols=True).collect()}
    assert turns == {f"a{i}" for i in range(15)} | {f"b{i}" for i in range(15)}
    assert cat.read("lineage", user_cols=True).count() == 2
    # linear catalog history: both batch ids recorded, distinct versions
    snap = cat.snapshot()
    assert {"txn-a", "txn-b"} <= set(snap["applied_batch_ids"])
    assert snap["version"] >= 4  # create + 4 create_table? (>=2 publishes)
    # replay of either txn is a no-op
    ev = _events(spark, [(999, "I", "zz", 0, "dup", 1)])
    from etl_bitcoin_spark.operators.fanout import fanout_batch as fb
    assert not fb(cat, ev, "txn-a")["applied"]


def test_fanout_single_scan_via_cached_batch(spark):
    """All four fan-out frames must read the micro-batch's cached
    InMemoryRelation, not re-scan the source: one input pass per batch
    instead of four."""
    from etl_bitcoin_spark.operators.fanout import cached_fanout_frames

    ev = _events(spark, [(1, "I", "a", 0, "hi", 1), (2, "I", "b", 0, "yo", 2)])
    cached, frames = cached_fanout_frames(ev, "b1")
    try:
        for name, df in frames.items():
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            assert "InMemoryRelation" in plan, (name, plan)
    finally:
        cached.unpersist()


def test_catalog_compact_files_advances_pins_safely(spark, cat):
    """Catalog-coordinated bin-packing: after many fan-out batches the
    append tables' buckets pack to one file each and catalog readers
    see the compacted layout (pins advanced); with a half-landed
    commit_multi in flight on a table, its pin must NOT advance past
    the unpublished commit."""
    for i in range(6):
        ev = _events(spark, [
            (10 * i + k, "I", f"c{k % 3}", k, f"x{i}-{k}", k)
            for k in range(6)
        ])
        assert fanout_batch(cat, ev, f"b-{i}")["applied"]
    before = sorted(
        (r.lsn, r.conv_id, r.turn_idx)
        for r in cat.read("turns", user_cols=True).collect()
    )
    t = cat.table("turns")
    grown = [
        b for b, e in t.bucket_entries().items() if len(e["files"]) > 2
    ]
    assert grown

    res = cat.compact_files(max_files_per_bucket=2, batch_id="cf-1")
    assert res["turns"]["applied"]
    # catalog READ sees the packed layout: pinned version advanced
    pin = cat.snapshot()["tables"]["turns"]
    assert pin == t.snapshot()["version"]
    ent = t.bucket_entries(version=pin)
    for b in grown:
        assert len(ent[b]["files"]) == 1
    after = sorted(
        (r.lsn, r.conv_id, r.turn_idx)
        for r in cat.read("turns", user_cols=True).collect()
    )
    assert after == before

    # --- half-landed txn: stage a table commit WITHOUT catalog publish
    for i in range(6, 12):
        ev = _events(spark, [
            (10 * i + k, "I", f"c{k % 3}", k, f"x{i}-{k}", k)
            for k in range(6)
        ])
        assert fanout_batch(cat, ev, f"b-{i}")["applied"]
    from etl_bitcoin_spark.operators.fanout import fanout_frames

    ev = _events(spark, [(500 + k, "I", f"c{k % 3}", k, "z", k)
                         for k in range(6)])
    fr = fanout_frames(ev, "staged")
    staged = fr["turns"].withColumn(
        BUCKET_COL, t.bucket_expr(4, ["conv_id", "turn_idx"])
    )
    assert t.commit(staged, [], "staged-tx/turns", mode="append")
    pin_before = cat.snapshot()["tables"]["turns"]
    assert t.snapshot()["version"] > pin_before  # pin lag

    res2 = cat.compact_files(max_files_per_bucket=2, batch_id="cf-2")
    assert res2["turns"] == {"applied": False, "reason": "pin lag"}
    # the pin did NOT move: the staged commit stays invisible
    assert cat.snapshot()["tables"]["turns"] == pin_before
    vis = cat.read("turns", user_cols=True).filter(
        F.col("lsn") >= 500
    ).count()
    assert vis == 0


def test_streaming_fanout_with_compaction_policy(spark, tmp_path):
    """FanoutTailer(compact_max_files=K): the live fan-out keeps every
    append bucket's file count bounded as batches stream in, with no
    row lost or duplicated."""
    from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, write_segments
    from etl_bitcoin_spark.operators.fanout import FanoutTailer

    pdf = generate_binlog(
        BinlogSpec(seed=6, n_convs=20, n_events=600, n_segments=12,
                   dup_rate=0.0)
    )
    wal = str(tmp_path / "wal")
    write_segments(pdf, wal)
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    create_fanout_tables(cat, n_buckets=4)
    tailer = FanoutTailer(spark, wal, cat, str(tmp_path / "ckpt"),
                          max_files_per_trigger=1, compact_max_files=3)
    results = tailer.run_available()
    assert all(r["applied"] for r in results)
    assert any("compacted" in r for r in results), results

    turns = cat.read("turns", user_cols=True)
    assert turns.count() == 600
    assert turns.select("lsn").distinct().count() == 600
    # the policy held: every bucket within (policy + 1 batch slack)
    t = cat.table("turns")
    pin = cat.snapshot()["tables"]["turns"]
    for b, e in t.bucket_entries(version=pin).items():
        assert len(e["files"]) <= 4, (b, e["files"])


def test_fanout_tailer_live_view_relay(spark, tmp_path):
    """views=[(table, down, spec)] on the FANOUT tailer: a maintained
    rollup over an append-mode catalog table (turns) ticks after every
    applied batch with mode="recompute" (append upstreams accumulate
    rows per key, so the per-key algebraic diff does not apply), stays
    equal to a from-scratch recompute, and survives a restart over the
    same checkpoint without double-counting."""
    from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, write_segments
    from etl_bitcoin_spark.operators.fanout import FanoutTailer
    from etl_bitcoin_spark.operators.views import (
        ViewSpec, create_view_table, full_compute,
    )

    pdf = generate_binlog(
        BinlogSpec(seed=11, n_convs=15, n_events=300, n_segments=3,
                   dup_rate=0.0)
    )
    wal = str(tmp_path / "wal")
    write_segments(pdf, wal)
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    create_fanout_tables(cat, n_buckets=4)
    spec = ViewSpec(
        "conv_rollup",
        "conv_id string",
        {
            "n_rows": ("count", "long"),
            "total_chars": ("sum", "length(coalesce(text, ''))", "long"),
            "max_lsn": ("max", "lsn", "long"),
        },
        key_is_upstream_key=True,
    )
    down = create_view_table(spark, str(tmp_path / "roll"), spec, 2)
    tailer = FanoutTailer(
        spark, wal, cat, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, views=[("turns", down, spec)],
    )
    results = tailer.run_available()
    assert all(r["applied"] for r in results)
    assert all(
        v["applied"] for r in results for v in r.get("views", [])
    ), results

    def states():
        got = {
            r.conv_id: (r.n_rows, r.total_chars, r.max_lsn)
            for r in down.read(user_cols=True).collect()
        }
        want = {
            r.conv_id: (r.n_rows, r.total_chars, r.max_lsn)
            for r in full_compute(
                spec, cat.table("turns").read(user_cols=True)
            ).collect()
        }
        return got, want

    got, want = states()
    assert got == want and sum(v[0] for v in got.values()) == 300

    # restart over the same checkpoint: fan-out batches absorb, view
    # cursor sees no new upstream version -> state unchanged
    t2 = FanoutTailer(
        spark, wal, cat, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, views=[("turns", down, spec)],
    )
    t2.run_available()
    got, want = states()
    assert got == want and sum(v[0] for v in got.values()) == 300
