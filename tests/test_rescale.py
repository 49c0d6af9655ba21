"""Bucket-count evolution (rescale_buckets): the growth path a 100 TB
table needs when it outruns its layout. The rescale must preserve the
EXACT physical state algebra (winners + retained tombstones, pending
merge-on-read deltas folded in), keep time travel working across the
boundary, stay idempotent, and fence out every commit computed against
the old hash layout."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, oracle_replay
from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
)
from etl_bitcoin_spark.tableformat import LakeTable
from etl_bitcoin_spark.tableformat.lake import (
    BUCKET_COL,
    DELETED_COL,
    LSN_COL,
    CommitConflict,
)


def _binlog(spark, seed=91, n=1500):
    pdf = generate_binlog(
        BinlogSpec(seed=seed, n_convs=30, max_turns=10, n_events=n,
                   delete_rate=0.15)
    )
    return pdf, spark.createDataFrame(
        pdf.drop(columns=["seg", "evolved"]), BINLOG_DDL
    )


def _physical(lake, version=None):
    rows = lake.read(version=version).select(
        *KEY_COLS, LSN_COL, DELETED_COL
    ).collect()
    return sorted(tuple(r) for r in rows)


def _user_state(lake):
    return (
        lake.read(user_cols=True)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_rescale_preserves_state_and_relayouts(spark, tmp_lake_dir):
    pdf, ev = _binlog(spark)
    lake = LakeTable.create(spark, tmp_lake_dir, TRANSCRIPTS_DDL, KEY_COLS, 4)
    apply_batch(lake, ev.filter(F.col("lsn") < 700), "b0",
                lsn_range_hint=(0, 699))
    apply_batch(lake, ev.filter((F.col("lsn") >= 700) & (F.col("lsn") < 1100)),
                "b1", lsn_range_hint=(700, 1099))
    # leave the tail as UNCOMPACTED merge-on-read deltas: the rescale
    # must fold them into the new base via the read-time resolution
    apply_batch(lake, ev.filter(F.col("lsn") >= 1100), "b2",
                lsn_range_hint=(1100, 1499), merge_mode="read")
    before = _physical(lake)
    want = oracle_replay(pdf)

    res = lake.rescale_buckets(16, "rescale-1")
    assert res["applied"] and res["n_buckets"] == [4, 16]
    snap = lake.snapshot()
    assert snap["n_buckets"] == 16 and snap["group_size"] == 16

    # physical state (winners + tombstones) is EXACTLY preserved
    assert _physical(lake) == before
    got = _user_state(lake)
    assert list(got["text"]) == list(want["text"])

    # deltas folded in; every surviving row landed in its new-hash bucket
    entries = lake.bucket_entries()
    assert all(not e["deltas"] for e in entries.values())
    mis = lake.read().filter(
        F.col(BUCKET_COL) != lake.bucket_expr(16, KEY_COLS)
    ).count()
    assert mis == 0
    # layout actually spread: more than the 4 old buckets now hold rows
    assert len([e for e in entries.values() if e["rows"] > 0]) > 4

    # point lookup prunes on the NEW layout
    k = lake.read(user_cols=True).limit(1).collect()[0]
    b = lake.read().filter(
        (F.col("conv_id") == k.conv_id) & (F.col("turn_idx") == k.turn_idx)
    ).select(BUCKET_COL).collect()[0][0]
    hit = lake.read(buckets=[b], user_cols=True).filter(
        (F.col("conv_id") == k.conv_id) & (F.col("turn_idx") == k.turn_idx)
    ).count()
    assert hit == 1

    # downscale works too and still matches the oracle
    assert lake.rescale_buckets(2, "rescale-2")["applied"]
    assert _physical(lake) == before
    got2 = _user_state(lake)
    assert list(got2["text"]) == list(want["text"])


def test_rescale_time_travel_and_idempotence(spark, tmp_lake_dir):
    pdf, ev = _binlog(spark, seed=92)
    lake = LakeTable.create(spark, tmp_lake_dir, TRANSCRIPTS_DDL, KEY_COLS, 4)
    apply_batch(lake, ev, "all", lsn_range_hint=(0, 1499))
    v_pre = lake.snapshot()["version"]
    pre = _physical(lake, version=v_pre)

    assert lake.rescale_buckets(8, "rs")["applied"]
    # the pre-rescale snapshot still reads under ITS OWN layout
    assert _physical(lake, version=v_pre) == pre
    old_snap = lake.snapshot(v_pre)
    assert old_snap["n_buckets"] == 4

    # idempotent replay of the rescale batch id is a no-op
    again = lake.rescale_buckets(8, "rs")
    assert again == {"applied": False, "reason": "duplicate batch_id"}
    assert lake.snapshot()["n_buckets"] == 8


def test_rescale_fences_stale_layout_commits(spark, tmp_lake_dir):
    pdf, ev = _binlog(spark, seed=93)
    lake = LakeTable.create(spark, tmp_lake_dir, TRANSCRIPTS_DDL, KEY_COLS, 4)
    apply_batch(lake, ev.filter(F.col("lsn") < 1000), "b0",
                lsn_range_hint=(0, 999))
    stale_version = lake.snapshot()["version"]

    assert lake.rescale_buckets(16, "rs")["applied"]

    # a DELTA commit staged against the old layout (commutative appends
    # would normally always rebase) must be fenced: its bucket ids mean
    # nothing under the new hash
    tail = ev.filter(F.col("lsn") >= 1000)
    from etl_bitcoin_spark.operators.merge import _resolve_union, events_as_rows

    content = _resolve_union(events_as_rows(tail), None).withColumn(
        BUCKET_COL, lake.bucket_expr(4, KEY_COLS)  # OLD layout
    )
    with pytest.raises(CommitConflict, match="rescaled"):
        lake.commit(content, [], "stale-delta", mode="delta",
                    base_version=stale_version)

    # a fresh merge computed against the NEW snapshot lands and the
    # converged state equals the oracle
    apply_batch(lake, tail, "b1", lsn_range_hint=(1000, 1499))
    got = _user_state(lake)
    want = oracle_replay(pdf)
    assert list(got["text"]) == list(want["text"])


def test_maintenance_ops_are_change_feed_invisible(spark, tmp_lake_dir):
    """Rescale, delta compaction, and file bin-packing rewrite buckets
    without changing state: the change feed across any of them must be
    EMPTY — a downstream consumer never reprocesses a maintenance op."""
    pdf, ev = _binlog(spark, seed=94, n=1200)
    lake = LakeTable.create(spark, tmp_lake_dir, TRANSCRIPTS_DDL, KEY_COLS, 4)
    apply_batch(lake, ev.filter(F.col("lsn") < 800), "b0",
                lsn_range_hint=(0, 799))
    apply_batch(lake, ev.filter(F.col("lsn") >= 800), "b1",
                lsn_range_hint=(800, 1199), merge_mode="read")
    v0 = lake.snapshot()["version"]

    assert lake.compact_deltas(max_deltas_per_bucket=0,
                               batch_id="m-cd")["applied"]
    v1 = lake.snapshot()["version"]
    assert lake.read_changes(v0, v1).count() == 0

    assert lake.rescale_buckets(16, "m-rs")["applied"]
    v2 = lake.snapshot()["version"]
    assert lake.read_changes(v1, v2).count() == 0
    assert lake.read_changes(
        v1, v2, include_preimages=True
    ).count() == 0
    # and across the whole maintenance window
    assert lake.read_changes(v0).count() == 0
