"""Incremental materialized-view maintenance (operators/incremental):
changed-keys-only refresh must equal a full recompute, propagate
deletes, touch only the affected downstream buckets, and stay
exactly-once across replayed ticks."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_bitcoin_spark.operators.incremental import (
    conv_summaries,
    create_conv_summary_table,
    refresh_conv_summaries,
)
from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
)
from etl_bitcoin_spark.tableformat import LakeTable


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (l, op, c, t, "user" if op != "D" else None,
             x, tool, datetime(2024, 1, 1, 0, 0, 0, l))
            for (l, op, c, t, x, tool) in rows
        ],
        BINLOG_DDL,
    )


def _down_state(down):
    return {
        r.conv_id: (r.n_turns, r.n_tool_turns, r.total_chars)
        for r in down.read(user_cols=True).collect()
    }


def _full_recompute(up):
    return {
        r.conv_id: (r.n_turns, r.n_tool_turns, r.total_chars)
        for r in conv_summaries(up.read(user_cols=True)).collect()
    }


def test_incremental_refresh_equals_full_and_prunes(spark, tmp_path):
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_conv_summary_table(
        spark, str(tmp_path / "down"), n_buckets=8
    )
    # batch 1: 20 convs -> bootstrap rebuild
    apply_batch(
        up,
        _ev(spark, [(c * 3 + t, "I", f"c{c}", t, f"x{c}{t}",
                     "tool" if t == 0 else None)
                    for c in range(20) for t in range(3)]),
        "b1", lsn_range_hint=(0, 59),
    )
    r1 = refresh_conv_summaries(up, down)
    assert r1["applied"] and r1["from"] == 0
    assert _down_state(down) == _full_recompute(up)

    # batch 2: touch ONLY convs c0 and c1 -> pruned tick
    apply_batch(
        up,
        _ev(spark, [(100, "U", "c0", 0, "longer-text", None),
                    (101, "I", "c1", 5, "new-turn", "tool"),
                    (102, "D", "c0", 2, None, None)]),
        "b2", lsn_range_hint=(100, 102),
    )
    r2 = refresh_conv_summaries(up, down)
    assert r2["applied"]
    assert r2["buckets"] < 8, r2  # only the changed convs' buckets
    assert _down_state(down) == _full_recompute(up)

    # batch 3: delete EVERY turn of c2 -> the summary row must vanish
    apply_batch(
        up,
        _ev(spark, [(200 + t, "D", "c2", t, None, None) for t in range(3)]),
        "b3", lsn_range_hint=(200, 202),
    )
    r3 = refresh_conv_summaries(up, down)
    assert r3["applied"]
    st = _down_state(down)
    assert "c2" not in st
    assert st == _full_recompute(up)

    # no new upstream commits -> no-op tick; cursor stable
    r4 = refresh_conv_summaries(up, down)
    assert r4 == {"applied": False, "reason": "up to date",
                  "cursor": r3["cursor"]}

    # crash-replay of the SAME span: the downstream batch id absorbs it
    r5 = refresh_conv_summaries(up, down, upto_version=r3["cursor"])
    assert not r5["applied"]


def test_incremental_cursor_survives_maintenance_commits(spark, tmp_path):
    """Downstream maintenance (compaction) between ticks must not lose
    the relay cursor (it walks parents to the last relay commit)."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    down = create_conv_summary_table(
        spark, str(tmp_path / "down"), n_buckets=2
    )
    apply_batch(
        up,
        _ev(spark, [(i, "I", f"c{i % 5}", i // 5, "x", None)
                    for i in range(20)]),
        "b1", lsn_range_hint=(0, 19),
    )
    r1 = refresh_conv_summaries(up, down)
    assert r1["applied"]
    # a maintenance commit lands on the downstream between ticks
    down.expire_snapshots(keep_last=10)
    apply_batch(
        up, _ev(spark, [(50, "I", "c0", 9, "y", None)]), "b2",
        lsn_range_hint=(50, 50),
    )
    r2 = refresh_conv_summaries(up, down)
    assert r2["applied"] and r2["from"] == r1["cursor"]
    assert _down_state(down) == _full_recompute(up)


def test_downstream_change_feed_has_no_phantom_updates(spark, tmp_path):
    """Relay chaining: a tick must not restamp unchanged co-bucketed
    rows, or the DOWNSTREAM's own change feed reports phantom updates
    and a chained consumer recomputes rows that never changed."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    # 2 downstream buckets -> changed and unchanged convs must collide
    down = create_conv_summary_table(
        spark, str(tmp_path / "down"), n_buckets=2
    )
    apply_batch(
        up,
        _ev(spark, [(c * 2 + t, "I", f"c{c}", t, "x", None)
                    for c in range(12) for t in range(2)]),
        "b1", lsn_range_hint=(0, 23),
    )
    assert refresh_conv_summaries(up, down)["applied"]
    v_down = down.snapshot()["version"]

    # touch exactly ONE conversation upstream
    apply_batch(
        up, _ev(spark, [(100, "U", "c3", 0, "xx", None)]), "b2",
        lsn_range_hint=(100, 100),
    )
    assert refresh_conv_summaries(up, down)["applied"]

    ch = down.read_changes(v_down).collect()
    assert {r.conv_id for r in ch} == {"c3"}, ch
    assert [r._change_type for r in ch] == ["update_postimage"]


def test_streaming_tail_with_live_relay(spark, tmp_path):
    """Bronze->silver live: a WAL drained through BinlogTailer with a
    relay tick after every micro-batch keeps the downstream rollup
    exactly equal to a full recompute of the converged upstream."""
    from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, write_segments
    from etl_bitcoin_spark.streaming import BinlogTailer

    pdf = generate_binlog(
        BinlogSpec(seed=41, n_convs=25, n_events=600, n_segments=6)
    )
    wal = str(tmp_path / "wal")
    write_segments(pdf, wal)
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_conv_summary_table(
        spark, str(tmp_path / "down"), n_buckets=4
    )
    tailer = BinlogTailer(spark, wal, up, str(tmp_path / "ckpt"),
                          max_files_per_trigger=2)
    ticks = []
    orig = tailer._apply

    def _apply_and_tick(batch_df, batch_id):
        orig(batch_df, batch_id)
        ticks.append(refresh_conv_summaries(up, down))

    tailer._apply = _apply_and_tick
    tailer.run_available()
    assert sum(1 for t in ticks if t["applied"]) >= 2
    assert _down_state(down) == _full_recompute(up)


def test_algebraic_mode_equals_recompute_and_oracle(spark, tmp_path):
    """mode="algebraic" (delta arithmetic from the preimage feed, no
    upstream scan except max-regression fallbacks) must converge to
    exactly the full recompute under an adversarial stream: deletes
    that remove the max-ts row, ts collisions, updates that lower ts,
    full-conversation deletions."""
    from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog

    pdf = generate_binlog(
        BinlogSpec(seed=55, n_convs=15, max_turns=6, n_events=1200,
                   delete_rate=0.25, ts_collision_rate=0.4)
    )
    ev_all = spark.createDataFrame(
        pdf.drop(columns=["seg", "evolved"]), BINLOG_DDL
    )
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_conv_summary_table(
        spark, str(tmp_path / "down"), n_buckets=4
    )
    for i in range(6):
        lo, hi = i * 200, i * 200 + 199
        apply_batch(up, ev_all.filter(
            (F.col("lsn") >= lo) & (F.col("lsn") <= hi)
        ), f"b{i}", lsn_range_hint=(lo, hi))
        r = refresh_conv_summaries(up, down, mode="algebraic")
        assert r["applied"], r
        # exact equality against full recompute after EVERY tick,
        # last_ts included
        got = {
            x.conv_id: (x.n_turns, x.n_tool_turns, x.last_ts,
                        x.total_chars)
            for x in down.read(user_cols=True).collect()
        }
        want = {
            x.conv_id: (x.n_turns, x.n_tool_turns, x.last_ts,
                        x.total_chars)
            for x in conv_summaries(up.read(user_cols=True)).collect()
        }
        assert got == want, f"tick {i} diverged"


def test_algebraic_fallback_on_max_regression(spark, tmp_path):
    """Deleting exactly the max-ts turn with nothing newer in the tick
    forces the fallback recompute, and last_ts regresses correctly."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    down = create_conv_summary_table(
        spark, str(tmp_path / "down"), n_buckets=2
    )
    # turn 2 holds the max ts (lsn 2 -> microsecond 9)
    apply_batch(up, spark.createDataFrame(
        [(0, "I", "cA", 0, "user", "a", None,
          datetime(2024, 1, 1, 0, 0, 0, 1)),
         (1, "I", "cA", 1, "user", "bb", None,
          datetime(2024, 1, 1, 0, 0, 0, 5)),
         (2, "I", "cA", 2, "user", "ccc", None,
          datetime(2024, 1, 1, 0, 0, 0, 9))], BINLOG_DDL),
        "b0", lsn_range_hint=(0, 2))
    assert refresh_conv_summaries(up, down, mode="algebraic")["applied"]

    apply_batch(up, spark.createDataFrame(
        [(3, "D", "cA", 2, None, None, None,
          datetime(2024, 1, 1, 0, 0, 0, 10))], BINLOG_DDL),
        "b1", lsn_range_hint=(3, 3))
    r = refresh_conv_summaries(up, down, mode="algebraic")
    assert r["applied"] and r["fallback_convs"] == 1, r
    row = down.read(user_cols=True).collect()[0]
    assert (row.n_turns, row.total_chars) == (2, 3)
    assert row.last_ts == datetime(2024, 1, 1, 0, 0, 0, 5)
