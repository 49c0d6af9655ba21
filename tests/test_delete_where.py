"""Predicate-based physical erasure (lake.delete_where): matching live
rows vanish by rewriting only their buckets; tombstones and
non-matching rows survive; pending deltas fold; the change feed shows
exactly the erased keys; idempotent + time-travel intact."""

from datetime import datetime

from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
)
from etl_bitcoin_spark.tableformat import LakeTable


def _ev(spark, rows):
    rows = [
        (lsn, op, c, t, role, text, tool, datetime.fromisoformat(ts))
        for (lsn, op, c, t, role, text, tool, ts) in rows
    ]
    return spark.createDataFrame(rows, BINLOG_DDL)


def _row(lsn, conv, role, text, ts="2024-01-01 00:00:01"):
    return (lsn, "I", conv, 0, role, text, None, ts)


def _seed(spark, tmp_path):
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    apply_batch(lake, _ev(spark, [
        _row(1, "keep1", "user", "a"),
        _row(2, "erase1", "pii", "secret"),
        _row(3, "keep2", "user", "b"),
        (4, "D", "tomb", 0, None, None, None, "2024-01-01 00:00:02"),
    ]), "b0", assume_all_buckets=True)
    # a pending MOR delta that also matches the predicate
    apply_batch(lake, _ev(spark, [
        _row(5, "erase2", "pii", "secret2", ts="2024-01-01 00:00:03"),
    ]), "b1", merge_mode="read")
    return lake


def test_delete_where_erases_only_matches(spark, tmp_path):
    lake = _seed(spark, tmp_path)
    v_before = lake.snapshot()["version"]
    r = lake.delete_where("role = 'pii'", "gdpr-1")
    assert r["applied"] and r["rows_deleted"] == 2
    got = {x["conv_id"] for x in lake.read(user_cols=True).collect()}
    assert got == {"keep1", "keep2"}
    # retained tombstone survives (it guards late low-lsn resurrection)
    raw = lake.read(user_cols=False)
    assert raw.filter("__deleted").count() == 1
    # time travel still shows the pre-erasure state (until expiry)
    pre = {
        x["conv_id"]
        for x in lake.read(version=v_before, user_cols=True).collect()
    }
    assert pre == {"keep1", "keep2", "erase1", "erase2"}
    # change feed between the two snapshots: exactly the erased keys
    d = {
        (x["conv_id"], x["_change_type"])
        for x in lake.read_changes(v_before).collect()
    }
    assert d == {("erase1", "delete"), ("erase2", "delete")}
    # idempotent replay
    assert lake.delete_where("role = 'pii'", "gdpr-1")["applied"] is False
    # nothing left matching -> no-op with a fresh id
    r2 = lake.delete_where("role = 'pii'", "gdpr-2")
    assert r2 == {"applied": False, "rows_deleted": 0, "buckets": []}


def test_delete_where_untouched_buckets_carry_forward(spark, tmp_path):
    lake = _seed(spark, tmp_path)
    before = lake.bucket_entries()
    r = lake.delete_where("text = 'secret'", "gdpr-3")
    assert r["rows_deleted"] == 1
    after = lake.bucket_entries()
    untouched = [
        b for b in after
        if int(b) not in r["buckets"]
    ]
    assert untouched  # the 4-bucket layout spreads the keys
    for b in untouched:
        assert after[b]["files"] == before[b]["files"]


def test_delete_where_on_branch(spark, tmp_path):
    lake = _seed(spark, tmp_path)
    lake.create_branch("scrub")
    r = lake.delete_where("role = 'pii'", "gdpr-b", ref="scrub")
    assert r["applied"] and r["rows_deleted"] == 2
    assert {
        x["conv_id"] for x in lake.read(user_cols=True).collect()
    } == {"keep1", "keep2", "erase1", "erase2"}  # main untouched
    lake.publish_branch("scrub", drop=True)
    assert {
        x["conv_id"] for x in lake.read(user_cols=True).collect()
    } == {"keep1", "keep2"}
