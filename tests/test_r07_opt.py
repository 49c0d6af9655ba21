"""Round-7 optimization internals: pinned behaviors.

Covers the operator-internal changes of the optimization round:
  * delta_plan="raw-scan" (exchange-free bulk raw append, shard_mod=1
    generation registration);
  * merge-on-write over UNRESOLVED stored reads (pending deltas fold
    inside the merge's own resolution);
  * replay(batch_plan="raw") == replay(batch_plan="write") final state;
  * compact_deltas full-table fold (key-column partitioning);
and the ADVICE correctness fixes (NULL-predicate delete_where,
int-keyed read(keys=...) fallback, patch-provenance hiding).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, oracle_replay
from etl_bitcoin_spark.operators.merge import (
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
    replay,
)
from etl_bitcoin_spark.tableformat import LakeTable
from etl_bitcoin_spark.tableformat.lake import (
    BUCKET_COL,
    DELETED_COL,
    LSN_COL,
)


def _binlog(spark, n_events=2400, seed=77):
    pdf = generate_binlog(
        BinlogSpec(seed=seed, n_events=n_events, n_segments=4)
    )
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ev = spark.createDataFrame(pdf[cols]).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    return pdf, ev


def _state(lake):
    return (
        lake.read()
        .orderBy("conv_id", "turn_idx", LSN_COL)
        .select("conv_id", "turn_idx", "text", LSN_COL, DELETED_COL)
        .toPandas()
        .reset_index(drop=True)
    )


def test_raw_scan_plan_state_and_generation(spark, tmp_path):
    """raw-scan appends register a shard_mod=1 generation (no exchange,
    one file per scan task), resolve to the oracle, and a redelivered
    batch no-ops."""
    pdf, ev = _binlog(spark)
    lake = LakeTable.create(
        spark, str(tmp_path / "l"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    r = apply_batch(
        lake, ev, "rs-0", merge_mode="read", delta_plan="raw-scan"
    )
    assert r["applied"] and r["delta_plan"] == "raw-scan"
    snap = lake.snapshot()
    gens = snap.get("shard_deltas", [])
    assert len(gens) == 1 and gens[0]["k"] == 1, gens
    got = (
        lake.read(user_cols=True)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .reset_index(drop=True)
    )
    want = oracle_replay(pdf)[["conv_id", "turn_idx", "text"]].reset_index(
        drop=True
    )
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # redelivery under a new batch_id dies at the guard
    r2 = apply_batch(
        lake, ev, "rs-0b", merge_mode="read", delta_plan="raw-scan"
    )
    assert r2.get("events", 0) == 0, r2


def test_mow_folds_pending_deltas_unresolved(spark, tmp_path):
    """A merge-on-write batch over a table carrying raw-scan AND summary
    deltas folds them in its own resolution: final state == oracle,
    no pending deltas remain."""
    pdf, ev = _binlog(spark, n_events=3000, seed=78)
    lake = LakeTable.create(
        spark, str(tmp_path / "l"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    third = 1000
    b0 = ev.filter(F.col("lsn") <= third)
    b1 = ev.filter((F.col("lsn") > third) & (F.col("lsn") <= 2 * third))
    b2 = ev.filter(F.col("lsn") > 2 * third)
    apply_batch(lake, b0, "m-0", merge_mode="read", delta_plan="raw-scan")
    apply_batch(lake, b1, "m-1", merge_mode="read", delta_plan="summary")
    r = apply_batch(lake, b2, "m-2", assume_all_buckets=True)
    assert r["applied"]
    snap = lake.snapshot()
    assert not snap.get("shard_deltas"), "generations must be folded"
    entries = lake.bucket_entries()
    assert all(not e["deltas"] for e in entries.values()), "deltas remain"
    got = (
        lake.read(user_cols=True)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .reset_index(drop=True)
    )
    want = oracle_replay(pdf)[["conv_id", "turn_idx", "text"]].reset_index(
        drop=True
    )
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_replay_raw_equals_write_plan(spark, tmp_path):
    """replay(batch_plan='raw') and replay(batch_plan='write') converge
    to identical physical state — winners AND retained tombstones."""
    pdf, ev = _binlog(spark, n_events=2600, seed=79)
    lraw = LakeTable.create(
        spark, str(tmp_path / "raw"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    lwr = LakeTable.create(
        spark, str(tmp_path / "wr"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    replay(lraw, ev, batch_lsn_width=700, batch_plan="raw")
    replay(lwr, ev, batch_lsn_width=700, batch_plan="write")
    pd.testing.assert_frame_equal(_state(lraw), _state(lwr))
    assert lraw.hwm == lwr.hwm
    assert not lraw.snapshot().get("shard_deltas")


def test_full_fold_one_file_per_bucket(spark, tmp_path):
    """compact_deltas full-table fold (key-column partitioning) writes
    exactly one file per non-empty bucket, rows exact."""
    pdf, ev = _binlog(spark, n_events=2000, seed=80)
    lake = LakeTable.create(
        spark, str(tmp_path / "l"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    apply_batch(lake, ev, "f-0", merge_mode="read", delta_plan="raw-scan")
    before = _state(lake)
    r = lake.compact_deltas(max_deltas_per_bucket=0, batch_id="fold-1")
    assert r["applied"] and r["buckets_compacted"] == 8
    entries = lake.bucket_entries()
    for b, e in entries.items():
        assert not e["deltas"], f"bucket {b} still has deltas"
        assert len(e["files"]) <= 1, (b, e["files"])
    pd.testing.assert_frame_equal(_state(lake), before)


def test_delete_where_null_predicate_keeps_null_rows(spark, tmp_path):
    """ADVICE high: a NULL-evaluating predicate must neither count nor
    erase the row (SQL DELETE three-valued logic)."""
    pdf, ev = _binlog(spark, n_events=1500, seed=81)
    lake = LakeTable.create(
        spark, str(tmp_path / "l"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    apply_batch(lake, ev, "d-0", assume_all_buckets=True)
    st0 = lake.read(user_cols=True).toPandas()
    vals = st0["tool"].dropna()
    assert len(vals) and st0["tool"].isna().sum() > 0, "fixture needs nulls"
    target = vals.iloc[0]
    n_match = int((st0["tool"] == target).sum())
    n_null = int(st0["tool"].isna().sum())
    r = lake.delete_where(f"tool = '{target}'", "dw-null-1")
    assert r["rows_deleted"] == n_match
    st1 = lake.read(user_cols=True).toPandas()
    assert int(st1["tool"].isna().sum()) == n_null
    assert len(st1) == len(st0) - n_match


def test_read_keys_int_key_falls_back_unpruned(spark, tmp_path):
    """ADVICE medium: an int-keyed single-key table must return exact
    rows from read(keys=...) (no string-hash bucket derivation)."""
    lake = LakeTable.create(
        spark, str(tmp_path / "l"), "ik int, v string", ["ik"], 8
    )
    rows = spark.range(0, 300).select(
        F.col("id").cast("int").alias("ik"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    content = (
        rows.withColumn(LSN_COL, F.lit(1).cast("long"))
        .withColumn(DELETED_COL, F.lit(False))
        .withColumn(BUCKET_COL, lake.bucket_expr(8, ["ik"]))
    )
    lake.commit(content, list(range(8)), "b1", lsn_range=(1, 1))
    got = sorted(
        r["ik"] for r in lake.read(keys=[3, 42, 250]).select("ik").collect()
    )
    assert got == [3, 42, 250], got


def test_user_cols_hides_patch_provenance(spark, tmp_path):
    """ADVICE low: user_cols=True must hide __pts_*/__plsn_* provenance
    columns on patch-column tables."""
    pdf, ev = _binlog(spark, n_events=800, seed=82)
    lake = LakeTable.create(
        spark, str(tmp_path / "l"), TRANSCRIPTS_DDL, KEY_COLS, 4,
        patch_cols=["role", "tool"],
    )
    apply_batch(lake, ev, "p-0", merge_mode="read", delta_plan="summary")
    cols = lake.read(user_cols=True).columns
    assert not any(
        c.startswith("__pts_") or c.startswith("__plsn_") for c in cols
    ), cols
