"""Write-audit-publish branches: named heads over the shared version
space (lake.py branches section). Staged commits are invisible to main
until an ancestry-checked head CAS fast-forwards it; every interleaving
with concurrent main writers either publishes atomically or raises
CommitConflict — never a lost commit, never a torn read.
"""

from datetime import datetime

import pytest

from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
)
from etl_bitcoin_spark.tableformat import LakeTable
from etl_bitcoin_spark.tableformat.lake import CommitConflict


def _ev(spark, rows):
    rows = [
        (lsn, op, c, t, role, text, tool, datetime.fromisoformat(ts))
        for (lsn, op, c, t, role, text, tool, ts) in rows
    ]
    return spark.createDataFrame(rows, BINLOG_DDL)


def _mk(spark, tmp_path, name="lake", n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPTS_DDL, KEY_COLS,
        n_buckets=n_buckets,
    )


def _row(lsn, conv, text, ts="2024-01-01 00:00:01"):
    return (lsn, "I", conv, 0, "user", text, None, ts)


def _texts(lake, **kw):
    return {
        (r["conv_id"]): r["text"]
        for r in lake.read(user_cols=True, **kw).collect()
    }


def test_branch_commits_invisible_until_publish(spark, tmp_path):
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "base")]), "b0",
                assume_all_buckets=True)
    base_v = lake.snapshot()["version"]
    lake.create_branch("audit")
    apply_batch(lake, _ev(spark, [_row(2, "c2", "staged")]), "b1",
                merge_mode="read", ref="audit")
    # main readers see only the base; branch readers see the stage
    assert _texts(lake) == {"c1": "base"}
    assert _texts(lake, ref="audit") == {"c1": "base", "c2": "staged"}
    assert lake.snapshot()["version"] == base_v
    # audit passed -> publish fast-forwards main atomically
    v = lake.publish_branch("audit", drop=True)
    assert _texts(lake) == {"c1": "base", "c2": "staged"}
    assert lake.snapshot()["version"] == v
    assert lake.branches() == {}
    # time travel across the publish still works
    assert _texts(lake, version=base_v) == {"c1": "base"}


def test_branch_multi_batch_then_more_main_commits(spark, tmp_path):
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    lake.create_branch("wap")
    for i, (lsn, conv) in enumerate([(2, "c2"), (3, "c3"), (4, "c4")]):
        apply_batch(lake, _ev(spark, [_row(lsn, conv, f"s{i}")]),
                    f"s{i}", merge_mode="read", ref="wap")
    lake.publish_branch("wap", drop=True)
    # main continues committing normally after the publish
    apply_batch(lake, _ev(spark, [_row(5, "c5", "m2")]), "b1",
                merge_mode="read")
    assert set(_texts(lake)) == {"c1", "c2", "c3", "c4", "c5"}


def test_publish_conflicts_when_main_advanced(spark, tmp_path):
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    lake.create_branch("stale")
    apply_batch(lake, _ev(spark, [_row(2, "c2", "staged")]), "b1",
                merge_mode="read", ref="stale")
    # main moves past the fork point
    apply_batch(lake, _ev(spark, [_row(3, "c3", "m2")]), "b2",
                merge_mode="read")
    with pytest.raises(CommitConflict, match="advanced past"):
        lake.publish_branch("stale")
    # main never saw the staged row; the branch still has it
    assert "c2" not in _texts(lake)
    assert _texts(lake, ref="stale")["c2"] == "staged"
    # the WAP retry loop: re-fork, re-apply, publish
    lake.drop_branch("stale")
    lake.create_branch("retry")
    apply_batch(lake, _ev(spark, [_row(4, "c2", "staged2")]), "b3",
                merge_mode="read", ref="retry")
    lake.publish_branch("retry", drop=True)
    assert _texts(lake)["c2"] == "staged2"


def test_concurrent_main_and_branch_writers_no_lost_commits(
    spark, tmp_path
):
    """Main and branch commits interleave freely (they share the global
    version space but distinct heads): neither is lost, publish after
    the main commit raises diverged."""
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    lake.create_branch("w")
    # interleave: branch, main, branch, main
    apply_batch(lake, _ev(spark, [_row(2, "c2", "s1")]), "s1",
                merge_mode="read", ref="w")
    apply_batch(lake, _ev(spark, [_row(3, "c3", "m2")]), "m2",
                merge_mode="read")
    apply_batch(lake, _ev(spark, [_row(4, "c4", "s2")]), "s2",
                merge_mode="read", ref="w")
    apply_batch(lake, _ev(spark, [_row(5, "c5", "m3")]), "m3",
                merge_mode="read")
    assert set(_texts(lake)) == {"c1", "c3", "c5"}
    assert set(_texts(lake, ref="w")) == {"c1", "c2", "c4"}
    with pytest.raises(CommitConflict):
        lake.publish_branch("w")


def test_threaded_same_branch_writers_cas(spark, tmp_path):
    """Two threads committing disjoint-key delta batches to the SAME
    branch: head CAS serializes them; both land."""
    import threading

    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    lake.create_branch("t")
    errs = []

    def w(lsn, conv, bid):
        try:
            apply_batch(
                lake, _ev(spark, [_row(lsn, conv, f"v{lsn}")]), bid,
                merge_mode="read", ref="t",
            )
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errs.append(e)

    ts = [
        threading.Thread(target=w, args=(2, "c2", "t1")),
        threading.Thread(target=w, args=(3, "c3", "t2")),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert set(_texts(lake, ref="t")) == {"c1", "c2", "c3"}
    lake.publish_branch("t", drop=True)
    assert set(_texts(lake)) == {"c1", "c2", "c3"}


def test_expiry_keeps_branch_chains(spark, tmp_path):
    """A branch forked long ago retains its fork-chain versions through
    aggressive expiry; after publish + drop, expiry reclaims normally."""
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    lake.create_branch("old")
    apply_batch(lake, _ev(spark, [_row(2, "c2", "staged")]), "s0",
                merge_mode="read", ref="old")
    bh = lake.snapshot(ref="old")["version"]
    # push many main commits so keep_last=2 would otherwise expire the
    # branch head and its parents
    for i in range(8):
        apply_batch(lake, _ev(spark, [_row(10 + i, f"m{i}", "x")]),
                    f"m{i}", merge_mode="read")
    lake.expire_snapshots(keep_last=2)
    # branch still fully readable (its chain survived)
    assert _texts(lake, ref="old")["c2"] == "staged"
    assert bh in lake.versions()
    # main advanced -> publish refuses; drop instead, expiry reclaims
    with pytest.raises(CommitConflict):
        lake.publish_branch("old")
    lake.drop_branch("old")
    lake.expire_snapshots(keep_last=2)
    assert bh not in lake.versions()


def test_unbranched_tables_never_materialize_heads(spark, tmp_path):
    import os

    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    apply_batch(lake, _ev(spark, [_row(2, "c2", "m2")]), "b1",
                merge_mode="read")
    assert not os.path.isdir(os.path.join(lake.manifest_dir, "heads"))


def test_branch_name_validation_and_errors(spark, tmp_path):
    lake = _mk(spark, tmp_path)
    for bad in ("main", "", "a/b", ".hidden"):
        with pytest.raises(ValueError):
            lake.create_branch(bad)
    lake.create_branch("ok")
    with pytest.raises(ValueError, match="already exists"):
        lake.create_branch("ok")
    with pytest.raises(ValueError, match="no branch"):
        lake.snapshot(ref="nope")
    with pytest.raises(ValueError, match="cannot drop main"):
        lake.drop_branch("main")


def test_branch_delta_compaction(spark, tmp_path):
    """Staged MOR batches on a branch compact IN the branch (ref-aware
    maintenance): read amp bounded, state unchanged, main untouched
    until publish."""
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [_row(1, "c1", "m1")]), "b0",
                assume_all_buckets=True)
    lake.create_branch("stage")
    for i in range(4):
        apply_batch(
            lake, _ev(spark, [_row(2 + i, f"s{i}", f"v{i}")]), f"s{i}",
            merge_mode="read", ref="stage",
        )
    r = lake.compact_deltas(
        max_deltas_per_bucket=0, batch_id="bc", ref="stage"
    )
    assert r["applied"] and r["buckets_compacted"] > 0
    ent = lake.bucket_entries(
        version=lake.snapshot(ref="stage")["version"]
    )
    assert all(len(e["deltas"]) == 0 for e in ent.values())
    assert set(_texts(lake, ref="stage")) == {"c1", "s0", "s1", "s2", "s3"}
    assert set(_texts(lake)) == {"c1"}
    lake.publish_branch("stage", drop=True)
    assert set(_texts(lake)) == {"c1", "s0", "s1", "s2", "s3"}


def test_streaming_wap_tail_into_branch(spark, tmp_path):
    """A live tail can stage into a branch (streaming write-audit-
    publish): every merge and compaction commit lands on the branch,
    main is untouched until publish, and the published state equals
    the oracle replay."""
    from etl_bitcoin_spark.gen import (
        BinlogSpec, generate_binlog, oracle_replay, write_segments,
    )
    from etl_bitcoin_spark.streaming.tailer import BinlogTailer

    pdf = generate_binlog(BinlogSpec(seed=11, n_events=800, n_segments=4))
    write_segments(pdf, str(tmp_path / "wal"))
    lake = _mk(spark, tmp_path)
    base_v = lake.snapshot()["version"]
    lake.create_branch("stage")
    t = BinlogTailer(
        spark, str(tmp_path / "wal"), lake, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, merge_on_read=True,
        compact_max_deltas=1, ref="stage",
    )
    t.run_available()
    assert lake.snapshot()["version"] == base_v  # main untouched
    assert lake.read(user_cols=True).count() == 0
    got = (
        lake.read(user_cols=True, ref="stage")
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    want = oracle_replay(pdf)
    assert list(got["text"]) == list(want["text"])
    lake.publish_branch("stage", drop=True)
    got_main = (
        lake.read(user_cols=True).orderBy("conv_id", "turn_idx").toPandas()
    )
    assert list(got_main["text"]) == list(want["text"])


def test_streaming_wap_views_rejected(spark, tmp_path):
    from etl_bitcoin_spark.streaming.tailer import BinlogTailer

    lake = _mk(spark, tmp_path)
    lake.create_branch("b")
    with pytest.raises(ValueError, match="main-only"):
        BinlogTailer(
            spark, str(tmp_path / "wal"), lake, str(tmp_path / "ck"),
            ref="b", views=[("x",)],
        )


def test_branch_diff_is_the_publish_change_set(spark, tmp_path):
    """branch_diff = the audit step: exactly what publish would apply
    (insert/update_postimage/delete), ancestry-checked."""
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [
        _row(1, "keep", "same"), _row(2, "upd", "old"),
        _row(3, "gone", "x"),
    ]), "b0", assume_all_buckets=True)
    lake.create_branch("a")
    apply_batch(lake, _ev(spark, [
        _row(4, "upd", "new", ts="2024-01-01 00:00:02"),
        _row(5, "fresh", "ins"),
        (6, "D", "gone", 0, None, None, None, "2024-01-01 00:00:03"),
    ]), "b1", merge_mode="read", ref="a")
    d = {
        (r["conv_id"], r["_change_type"])
        for r in lake.branch_diff("a").collect()
    }
    assert d == {
        ("upd", "update_postimage"), ("fresh", "insert"),
        ("gone", "delete"),
    }
    # diverged main -> the diff refuses (it would mislead the audit)
    apply_batch(lake, _ev(spark, [_row(7, "m", "x")]), "b2",
                merge_mode="read")
    with pytest.raises(CommitConflict):
        lake.branch_diff("a")


def test_to_view_sql_over_resolved_state(spark, tmp_path):
    lake = _mk(spark, tmp_path)
    apply_batch(lake, _ev(spark, [
        _row(1, "c1", "alpha"), _row(2, "c2", "beta"),
        (3, "D", "c2", 0, None, None, None, "2024-01-01 00:00:02"),
    ]), "b0", assume_all_buckets=True)
    apply_batch(lake, _ev(spark, [_row(4, "c3", "gamma")]), "b1",
                merge_mode="read")
    lake.to_view("transcripts_v")
    got = {
        r["conv_id"]: r["text"]
        for r in spark.sql(
            "SELECT conv_id, text FROM transcripts_v ORDER BY conv_id"
        ).collect()
    }
    assert got == {"c1": "alpha", "c3": "gamma"}  # deltas resolved, D hidden


def test_catalog_multi_table_wap(spark, tmp_path):
    """Catalog-atomic WAP: stage a batch across two tables on branches
    (commit_multi with per-table ref), audit, then publish_branches —
    catalog readers flip from old pins to new pins in ONE catalog CAS;
    re-running the publish with the same batch_id is a no-op."""
    from pyspark.sql import functions as F

    from etl_bitcoin_spark.operators.merge import TRANSCRIPTS_DDL
    from etl_bitcoin_spark.tableformat.catalog import LakeCatalog
    from etl_bitcoin_spark.tableformat.lake import BUCKET_COL

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    for t in ("a", "b"):
        cat.create_table(t, TRANSCRIPTS_DDL, KEY_COLS, n_buckets=4)
        cat.table(t).create_branch("stage")

    def content(conv, text):
        return (
            _ev(spark, [_row(1, conv, text)])
            .select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts",
                F.col("lsn").alias("__lsn"),
                F.lit(False).alias("__deleted"),
            )
            .withColumn(
                BUCKET_COL,
                cat.table("a").bucket_expr(4, KEY_COLS),
            )
        )

    ok = cat.commit_multi(
        {
            "a": {"new_content": content("ca", "xa"),
                  "replaced_buckets": [], "mode": "append",
                  "ref": "stage"},
            "b": {"new_content": content("cb", "xb"),
                  "replaced_buckets": [], "mode": "append",
                  "ref": "stage"},
        },
        "wap-stage-1",
    )
    assert ok
    # staged rows invisible through the catalog AND through main heads
    assert cat.read("a", user_cols=True).count() == 0
    assert cat.table("a").read(user_cols=True).count() == 0
    assert cat.table("a").read(user_cols=True, ref="stage").count() == 1
    # audit each table's diff, then publish all-or-nothing
    d = cat.table("b").branch_diff("stage").collect()
    assert {r["_change_type"] for r in d} == {"insert"}
    assert cat.publish_branches(
        {"a": "stage", "b": "stage"}, "wap-pub-1", drop=True
    )
    assert cat.read("a", user_cols=True).count() == 1
    assert cat.read("b", user_cols=True).count() == 1
    assert cat.table("a").branches() == {}
    # idempotent resume: same batch_id no-ops
    assert cat.publish_branches(
        {"a": "stage", "b": "stage"}, "wap-pub-1"
    ) is False
