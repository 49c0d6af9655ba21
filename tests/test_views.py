"""Declarative incremental views (operators/views): a second ViewSpec
with a MUTABLE key column (role — not part of the upstream primary
key), so updates MOVE rows between groups: the preimage must decrement
the old group and the postimage increment the new one."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
)
from etl_bitcoin_spark.operators.views import (
    ViewSpec,
    create_view_table,
    full_compute,
    refresh_view,
)
from etl_bitcoin_spark.tableformat import LakeTable

ROLE_SPEC = ViewSpec(
    "role_stats",
    "role string",
    {
        "n_turns": ("count", "long"),
        "total_chars": ("sum", "length(coalesce(text, ''))", "long"),
        "last_ts": ("max", "ts", "timestamp"),
    },
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (l, op, c, t, role, x, None,
             datetime(2024, 1, 1, 0, 0, 0, l))
            for (l, op, c, t, role, x) in rows
        ],
        BINLOG_DDL,
    )


def _state(table, keys=("role",)):
    return {
        tuple(getattr(r, k) for k in keys):
        (r.n_turns, r.total_chars, r.last_ts)
        for r in table.read(user_cols=True).collect()
    }


def _full(spec, up):
    return {
        tuple(getattr(r, k) for k in spec.key):
        (r.n_turns, r.total_chars, r.last_ts)
        for r in full_compute(spec, up.read(user_cols=True)).collect()
    }


def test_mutable_key_view_moves_rows_between_groups(spark, tmp_path):
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_view_table(
        spark, str(tmp_path / "roles"), ROLE_SPEC, n_buckets=2
    )
    apply_batch(up, _ev(spark, [
        (0, "I", "c0", 0, "user", "aa"),
        (1, "I", "c0", 1, "assistant", "bbb"),
        (2, "I", "c1", 0, "user", "c"),
        (3, "I", "c1", 1, "system", "dddd"),
    ]), "b0", lsn_range_hint=(0, 3))
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    assert _state(down) == _full(ROLE_SPEC, up)

    # UPDATE flips c0/0 from user -> assistant: the user group loses a
    # row (and its chars), assistant gains — pure delta arithmetic,
    # no upstream scan, no fallback
    apply_batch(up, _ev(spark, [
        (10, "U", "c0", 0, "assistant", "aa2"),
    ]), "b1", lsn_range_hint=(10, 10))
    r = refresh_view(up, down, ROLE_SPEC)
    assert r["applied"] and r["fallback_groups"] == 0, r
    st = _state(down)
    assert st == _full(ROLE_SPEC, up)
    assert st[("user",)][0] == 1 and st[("assistant",)][0] == 2

    # delete the system group's only row: group vanishes
    apply_batch(up, _ev(spark, [
        (20, "D", "c1", 1, None, None),
    ]), "b2", lsn_range_hint=(20, 20))
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    st = _state(down)
    assert ("system",) not in st
    assert st == _full(ROLE_SPEC, up)

    # delete the row holding a group's max ts -> fallback recompute
    apply_batch(up, _ev(spark, [
        (30, "D", "c0", 0, None, None),  # assistant's max-ts row (lsn 10)
    ]), "b3", lsn_range_hint=(30, 30))
    r = refresh_view(up, down, ROLE_SPEC)
    assert r["applied"] and r["fallback_groups"] == 1, r
    assert _state(down) == _full(ROLE_SPEC, up)


def test_view_spec_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="count"):
        ViewSpec("x", "role string", {"s": ("sum", "1", "long")}).validate()
    with pytest.raises(ValueError, match="unknown agg"):
        ViewSpec("x", "role string", {
            "n": ("count", "long"), "a": ("avg", "ts", "double"),
        }).validate()


def test_multi_column_key_view(spark, tmp_path):
    """Composite grouping key (conv_id, role): deltas, liveness, and
    bucketing all operate on the key tuple."""
    spec = ViewSpec(
        "conv_role",
        "conv_id string, role string",
        {
            "n_turns": ("count", "long"),
            "total_chars": ("sum", "length(coalesce(text, ''))", "long"),
            "last_ts": ("max", "ts", "timestamp"),
        },
    )
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    down = create_view_table(spark, str(tmp_path / "cr"), spec, 4)
    apply_batch(up, _ev(spark, [
        (i, "I", f"c{i % 3}", i // 3, ["user", "assistant"][i % 2], "x" * (i + 1))
        for i in range(12)
    ]), "b0", lsn_range_hint=(0, 11))
    assert refresh_view(up, down, spec)["applied"]

    apply_batch(up, _ev(spark, [
        (20, "U", "c0", 0, "assistant", "moved"),
        (21, "D", "c1", 1, None, None),
    ]), "b1", lsn_range_hint=(20, 21))
    r = refresh_view(up, down, spec)
    assert r["applied"], r
    got = {
        (x.conv_id, x.role): (x.n_turns, x.total_chars)
        for x in down.read(user_cols=True).collect()
    }
    want = {
        (x.conv_id, x.role): (x.n_turns, x.total_chars)
        for x in full_compute(spec, up.read(user_cols=True)).collect()
    }
    assert got == want


def test_null_keyed_group_refreshes_without_duplication(spark, tmp_path):
    """A NULL view-key value is a legitimate group: the null-safe key
    joins must evict and refresh it (a plain name join never matches
    NULL = NULL, leaving a stale duplicate row behind)."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 2
    )
    down = create_view_table(
        spark, str(tmp_path / "roles"), ROLE_SPEC, n_buckets=2
    )
    apply_batch(up, _ev(spark, [
        (0, "I", "c0", 0, None, "nullrole"),   # NULL-role group
        (1, "I", "c0", 1, "user", "aa"),
    ]), "b0", lsn_range_hint=(0, 1))
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    assert _state(down) == _full(ROLE_SPEC, up)

    # touch the NULL group: must refresh in place, not duplicate
    apply_batch(up, _ev(spark, [
        (10, "U", "c0", 0, None, "nullrole-v2"),
    ]), "b1", lsn_range_hint=(10, 10))
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    rows = down.read(user_cols=True).filter(F.col("role").isNull()).collect()
    assert len(rows) == 1, rows
    assert rows[0].total_chars == len("nullrole-v2")
    assert _state(down) == _full(ROLE_SPEC, up)

    # recompute mode handles the NULL group too (mutable-key views use
    # the preimage feed for keys)
    apply_batch(up, _ev(spark, [
        (20, "U", "c0", 0, None, "v3"),
    ]), "b2", lsn_range_hint=(20, 20))
    assert refresh_view(up, down, ROLE_SPEC, mode="recompute")["applied"]
    assert _state(down) == _full(ROLE_SPEC, up)
