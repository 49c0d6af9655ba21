"""Bloom + HWM exactly-once state."""

import numpy as np

from etl_bitcoin_spark.state import ExactlyOnceFilter, LsnBloom


def test_bloom_membership_and_fpr():
    b = LsnBloom(n_bits=1 << 16, n_hashes=5)
    added = np.arange(0, 5000, dtype=np.int64)
    b.add_many(added)
    assert b.might_contain_many(added).all(), "no false negatives ever"
    probe = np.arange(100_000, 200_000, dtype=np.int64)
    fpr = b.might_contain_many(probe).mean()
    assert fpr < 0.05, f"false-positive rate too high: {fpr}"


def test_bloom_save_load_rebuild(tmp_path):
    b = LsnBloom(n_bits=1 << 12, n_hashes=3)
    b.add_many(np.array([1, 2, 3, 100], dtype=np.int64))
    p = str(tmp_path / "bloom.state")
    b.save(p)
    b2 = LsnBloom.load(p)
    assert (b2.bits == b.bits).all()
    b3 = LsnBloom.rebuild_from_ranges([[1, 3], [100, 100]], n_bits=1 << 12, n_hashes=3)
    assert (b3.bits == b.bits).all(), "rebuild from lineage is bit-identical"


def test_exactly_once_filter_drops_applied_keeps_new(spark):
    from etl_bitcoin_spark.operators.merge import BINLOG_DDL, reconcile_schema

    ev = reconcile_schema(
        spark.createDataFrame(
            [(int(i), "U", "c", 0) for i in [5, 10, 15, 20, 25]],
            "lsn long, op string, conv_id string, turn_idx int",
        ),
        BINLOG_DDL,
    )
    lineage = {"hwm": 22, "applied_ranges": [[0, 12], [18, 22]]}
    bloom = LsnBloom.rebuild_from_ranges(lineage["applied_ranges"], n_bits=1 << 14)
    out = ExactlyOnceFilter(lineage, bloom)(ev)
    kept = sorted(r.lsn for r in out.select("lsn").collect())
    assert kept == [15, 25], "15 is in a gap (new), 25 is above hwm (new)"


def test_exactly_once_filter_without_bloom(spark):
    from etl_bitcoin_spark.operators.merge import BINLOG_DDL, reconcile_schema

    ev = reconcile_schema(
        spark.createDataFrame(
            [(5, "U", "c", 0), (15, "U", "c", 1)],
            "lsn long, op string, conv_id string, turn_idx int",
        ),
        BINLOG_DDL,
    )
    out = ExactlyOnceFilter({"hwm": 12, "applied_ranges": [[0, 12]]}, None)(ev)
    assert [r.lsn for r in out.select("lsn").collect()] == [15]


def test_late_batch_is_applied_not_dropped(spark, tmp_path):
    """A batch whose lsns sit below the hwm but in a gap (segment
    delivered late / out of order) must be applied, not mistaken for a
    duplicate — regression for the mtime-collapsed file-order bug."""
    from datetime import datetime

    from etl_bitcoin_spark.operators.merge import (
        BINLOG_DDL, KEY_COLS, TRANSCRIPTS_DDL, apply_batch,
    )
    from etl_bitcoin_spark.tableformat import LakeTable

    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 4)

    def ev(rows):
        return spark.createDataFrame(
            [(l, "U", c, t, "user", x, None, datetime(2024, 1, 1, 0, 0, s))
             for (l, c, t, x, s) in rows],
            BINLOG_DDL,
        )

    # segment 2 (lsn 200..201) arrives FIRST
    guard = ExactlyOnceFilter(lake.lineage(), None)
    apply_batch(lake, ev([(200, "c1", 0, "late-loser", 10), (201, "c2", 0, "w2", 11)]),
                "b-seg2", already_applied_filter=guard)
    assert lake.hwm == 201
    # segment 1 (lsn 100..101) arrives late; 101 updates the same key
    # with an EARLIER ts -> stored row must win; 100 is a brand-new key
    guard = ExactlyOnceFilter(lake.lineage(), None)
    r = apply_batch(lake, ev([(100, "c3", 0, "new-key", 5), (101, "c1", 0, "older", 5)]),
                    "b-seg1", already_applied_filter=guard)
    assert r["events"] == 2, "late non-duplicate lsns must survive the guard"
    got = {(x.conv_id, x.text) for x in lake.read(user_cols=True).collect()}
    assert got == {("c1", "late-loser"), ("c2", "w2"), ("c3", "new-key")}
    # redeliver segment 1 verbatim -> exact guard drops both
    guard = ExactlyOnceFilter(lake.lineage(), None)
    r2 = apply_batch(lake, ev([(100, "c3", 0, "new-key", 5), (101, "c1", 0, "older", 5)]),
                     "b-seg1-again", already_applied_filter=guard)
    assert r2["events"] == 0
