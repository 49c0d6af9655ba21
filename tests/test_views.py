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
            "n": ("count", "long"), "a": ("median", "ts", "double"),
        }).validate()
    with pytest.raises(ValueError, match="reserved"):
        ViewSpec("x", "role string", {
            "n": ("count", "long"), "__s": ("sum", "1", "long"),
        }).validate()
    with pytest.raises(ValueError, match="malformed key_ddl"):
        ViewSpec("x", "map<string,int> m", {
            "n": ("count", "long"),
        }).validate()
    # comma-bearing types parse to correct names, not bogus splits
    assert ViewSpec(
        "x", "a decimal(10,2), b map<string,int>",
        {"n": ("count", "long")},
    ).key == ["a", "b"]
    # avg is legal and expands to hidden invertible companions
    s = ViewSpec("x", "role string", {
        "n": ("count", "long"), "a": ("avg", "length(text)", "double"),
    })
    s.validate()
    assert s.hidden_cols == ["__a_sum", "__a_cnt"]
    assert "__a_sum double" in s.ddl and "__a_cnt long" in s.ddl


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


MINAVG_SPEC = ViewSpec(
    "role_minavg",
    "role string",
    {
        "n_turns": ("count", "long"),
        "first_ts": ("min", "ts", "timestamp"),
        "avg_chars": ("avg", "length(text)", "double"),
    },
)


def _minavg_state(table):
    return {
        r.role: (r.n_turns, r.first_ts, r.avg_chars)
        for r in table.read(user_cols=True)
        .select("role", "n_turns", "first_ts", "avg_chars")
        .collect()
    }


def _minavg_full(up):
    return {
        r.role: (r.n_turns, r.first_ts, r.avg_chars)
        for r in full_compute(MINAVG_SPEC, up.read(user_cols=True))
        .select("role", "n_turns", "first_ts", "avg_chars")
        .collect()
    }


def test_min_avg_view_maintenance(spark, tmp_path):
    """min is max's mirror (regression fallback fires on removing a
    group's minimum); avg maintains invertibly through hidden sum/cnt
    companions and must honor SQL null semantics (null expr rows are
    excluded from the average, all-null groups average to NULL)."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_view_table(
        spark, str(tmp_path / "ma"), MINAVG_SPEC, n_buckets=2
    )
    apply_batch(up, _ev(spark, [
        (0, "I", "c0", 0, "user", "aa"),        # len 2
        (1, "I", "c0", 1, "user", "bbbb"),      # len 4 -> avg 3.0
        (2, "I", "c1", 0, "assistant", None),   # null text: avg NULL
        (3, "I", "c1", 1, "system", "dddd"),
    ]), "b0", lsn_range_hint=(0, 3))
    assert refresh_view(up, down, MINAVG_SPEC)["applied"]
    st = _minavg_state(down)
    assert st == _minavg_full(up)
    assert st["user"][2] == 3.0
    assert st["assistant"][2] is None  # avg over only-null rows

    # new row EXTENDS user's average — pure delta arithmetic, and the
    # new ts is LATER than user's min so min cannot regress
    apply_batch(up, _ev(spark, [
        (10, "I", "c2", 0, "user", "cccccc"),        # len 6 -> avg 4.0
    ]), "b1", lsn_range_hint=(10, 10))
    r = refresh_view(up, down, MINAVG_SPEC)
    assert r["applied"] and r["fallback_groups"] == 0, r
    st = _minavg_state(down)
    assert st == _minavg_full(up)
    assert st["user"][2] == 4.0

    # update assistant's only row: its preimage held the group MIN, so
    # min may regress -> that one group falls back; avg NULL -> 8.0
    apply_batch(up, _ev(spark, [
        (11, "U", "c1", 0, "assistant", "eeeeeeee"), # len 8 -> avg 8.0
    ]), "b1b", lsn_range_hint=(11, 11))
    r = refresh_view(up, down, MINAVG_SPEC)
    assert r["applied"] and r["fallback_groups"] == 1, r
    st = _minavg_state(down)
    assert st == _minavg_full(up)
    assert st["assistant"][2] == 8.0

    # delete the row holding user's MIN ts (lsn 0) -> min may regress
    # upward -> fallback recompute for that one group
    apply_batch(up, _ev(spark, [
        (20, "D", "c0", 0, None, None),
    ]), "b2", lsn_range_hint=(20, 20))
    r = refresh_view(up, down, MINAVG_SPEC)
    assert r["applied"] and r["fallback_groups"] == 1, r
    assert _minavg_state(down) == _minavg_full(up)

    # delete a NON-min row: min cannot regress, no fallback; avg
    # shrinks by delta arithmetic
    apply_batch(up, _ev(spark, [
        (30, "D", "c2", 0, None, None),
    ]), "b3", lsn_range_hint=(30, 30))
    r = refresh_view(up, down, MINAVG_SPEC)
    assert r["applied"] and r["fallback_groups"] == 0, r
    assert _minavg_state(down) == _minavg_full(up)

    # recompute mode agrees on the same spec (shared full_compute)
    apply_batch(up, _ev(spark, [
        (40, "I", "c3", 0, "user", "zzz"),
    ]), "b4", lsn_range_hint=(40, 40))
    assert refresh_view(up, down, MINAVG_SPEC, mode="recompute")["applied"]
    assert _minavg_state(down) == _minavg_full(up)


def test_large_tick_never_collects_group_rows(spark, tmp_path, monkeypatch):
    """SCALE GUARD (round-3 verdict #1): a tick touching 10^5 groups
    must never materialize group rows on the driver — the only
    permitted collects are bucket-id lists (bounded by n_buckets) and
    scalar counts. DataFrame.collect is instrumented to fail on any
    oversized result; BROADCAST_KEYS_MAX is pinned below the tick size
    so the shuffle-join (non-broadcast) path is the one under test."""
    import etl_bitcoin_spark.operators.views as views_mod
    from pyspark.sql import DataFrame

    n = 100_000
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    spec = ViewSpec(
        "conv_rollup",
        "conv_id string",
        {
            "n_turns": ("count", "long"),
            "total_chars": ("sum", "length(coalesce(text, ''))", "long"),
            "last_ts": ("max", "ts", "timestamp"),
        },
        key_is_upstream_key=True,
    )
    down = create_view_table(spark, str(tmp_path / "big"), spec, 8)

    def _batch(first_lsn, op, text_prefix):
        return spark.range(n).select(
            (F.col("id") + first_lsn).alias("lsn"),
            F.lit(op).alias("op"),
            F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit(text_prefix), F.col("id")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.col("id") + first_lsn).alias("ts"),
        )

    apply_batch(up, _batch(0, "I", "x"), "big0",
                lsn_range_hint=(0, n - 1))
    assert refresh_view(up, down, spec)["applied"]  # bootstrap tick

    # every group changes in one tick
    apply_batch(up, _batch(n, "U", "longer-"), "big1",
                lsn_range_hint=(n, 2 * n - 1))

    monkeypatch.setattr(views_mod, "BROADCAST_KEYS_MAX", 10_000)
    orig_collect = DataFrame.collect

    def guarded(self):
        rows = orig_collect(self)
        assert len(rows) <= 20_000, (
            f"driver-side collect of {len(rows)} rows during view tick"
        )
        return rows

    monkeypatch.setattr(DataFrame, "collect", guarded)
    r = refresh_view(up, down, spec, mode="algebraic")
    monkeypatch.setattr(DataFrame, "collect", orig_collect)
    assert r["applied"] and r["fallback_groups"] == 0, r

    # distributed equality check (no driver materialization here either)
    got = down.read(user_cols=True).select(
        "conv_id", "n_turns", "total_chars", "last_ts"
    )
    want = full_compute(spec, up.read(user_cols=True)).select(
        "conv_id", "n_turns", "total_chars", "last_ts"
    )
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()
    assert got.count() == n


AD_SPEC = ViewSpec(
    "role_ad",
    "role string",
    {
        "n_turns": ("count", "long"),
        "n_convs": ("approx_distinct", "conv_id", "long"),
    },
)


def _ad_state(table):
    return {
        r.role: (r.n_turns, r.n_convs)
        for r in table.read(user_cols=True)
        .select("role", "n_turns", "n_convs").collect()
    }


def _ad_full(up):
    return {
        r.role: (r.n_turns, r.n_convs)
        for r in full_compute(AD_SPEC, up.read(user_cols=True))
        .select("role", "n_turns", "n_convs").collect()
    }


def test_approx_distinct_view_maintenance(spark, tmp_path):
    """("approx_distinct", expr, type): the engine's dense-HLL sketch.
    The register-map union is exact and representation-stable, so
    maintained state equals full recompute EXACTLY (the no-drift
    invariant survives approximation); small cardinalities estimate
    near-exact via linear counting; any removal of a non-null value
    falls back to recomputing that group."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_view_table(
        spark, str(tmp_path / "ad"), AD_SPEC, n_buckets=2
    )
    apply_batch(up, _ev(spark, [
        (0, "I", "c0", 0, "user", "a"),
        (1, "I", "c1", 0, "user", "b"),
        (2, "I", "c2", 0, "user", "c"),
        (3, "I", "c0", 1, "user", "d"),     # same conv again
        (4, "I", "c9", 0, "assistant", "e"),
    ]), "b0", lsn_range_hint=(0, 4))
    assert refresh_view(up, down, AD_SPEC)["applied"]
    st = _ad_state(down)
    assert st == _ad_full(up)
    assert st["user"] == (4, 3) and st["assistant"] == (1, 1)

    # pure inserts: sketch union only, no fallback, still == recompute
    apply_batch(up, _ev(spark, [
        (10, "I", "c3", 0, "user", "f"),
        (11, "I", "c4", 0, "user", "g"),
    ]), "b1", lsn_range_hint=(10, 11))
    r = refresh_view(up, down, AD_SPEC)
    assert r["applied"] and r["fallback_groups"] == 0, r
    st = _ad_state(down)
    assert st == _ad_full(up)
    assert st["user"] == (6, 5)

    # key-moving update: assistant's only row leaves -> the group dies
    # at the count-liveness filter BEFORE any sketch ambiguity (no
    # fallback needed); user's side is a pure addition (union)
    apply_batch(up, _ev(spark, [
        (20, "U", "c9", 0, "user", "moved"),  # assistant -> user
    ]), "b2", lsn_range_hint=(20, 20))
    r = refresh_view(up, down, AD_SPEC)
    assert r["applied"] and r["fallback_groups"] == 0, r
    st = _ad_state(down)
    assert st == _ad_full(up)
    assert ("assistant" not in st) and st["user"] == (7, 6)

    # same-group update: the preimage removes a non-null conv_id from a
    # SURVIVING group — grow-only registers cannot express removal ->
    # that group falls back to recompute
    apply_batch(up, _ev(spark, [
        (25, "U", "c1", 0, "user", "edited"),
    ]), "b2b", lsn_range_hint=(25, 25))
    r = refresh_view(up, down, AD_SPEC)
    assert r["applied"] and r["fallback_groups"] == 1, r
    st = _ad_state(down)
    assert st == _ad_full(up)
    assert st["user"] == (7, 6)

    # delete: fallback, group keeps counting the surviving conv rows
    apply_batch(up, _ev(spark, [
        (30, "D", "c0", 1, None, None),
    ]), "b3", lsn_range_hint=(30, 30))
    r = refresh_view(up, down, AD_SPEC)
    assert r["applied"] and r["fallback_groups"] == 1, r
    assert _ad_state(down) == _ad_full(up)


def test_approx_distinct_estimate_accuracy(spark, tmp_path):
    """500 distinct values in one group: the 1024-register sketch with
    linear counting estimates within a few percent, and the maintained
    estimate is IDENTICAL to the full recompute's (exact union)."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 8
    )
    down = create_view_table(
        spark, str(tmp_path / "ad"), AD_SPEC, n_buckets=2
    )
    ev = spark.range(500).select(
        F.col("id").alias("lsn"), F.lit("I").alias("op"),
        F.concat(F.lit("conv"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    apply_batch(up, ev, "big", lsn_range_hint=(0, 499))
    assert refresh_view(up, down, AD_SPEC)["applied"]
    st = _ad_state(down)
    assert st == _ad_full(up)
    est = st["user"][1]
    assert abs(est - 500) <= 50, est  # within 10% (typically ~2%)


def test_view_tick_plan_shape(spark, tmp_path, monkeypatch):
    """Plan audit for the distributed combine above the broadcast
    threshold: the delta-state join must be a hash/sort-merge join on
    the null-safe key equality — never a BroadcastNestedLoopJoin or
    CartesianProduct (eqNullSafe is a valid equi-join key; a regression
    here turns a 10^7-group tick into an O(n^2) plan)."""
    import io
    from contextlib import redirect_stdout

    import etl_bitcoin_spark.operators.views as views_mod
    from pyspark.sql import DataFrame

    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    down = create_view_table(
        spark, str(tmp_path / "roles"), ROLE_SPEC, n_buckets=2
    )
    apply_batch(up, _ev(spark, [
        (i, "I", f"c{i}", 0, f"r{i % 7}", "x") for i in range(40)
    ]), "b0", lsn_range_hint=(0, 39))
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    apply_batch(up, _ev(spark, [
        (100 + i, "U", f"c{i}", 0, f"r{(i + 1) % 7}", "y")
        for i in range(40)
    ]), "b1", lsn_range_hint=(100, 139))

    # force the non-broadcast (shuffle-join) path and capture every
    # plan the tick executes
    monkeypatch.setattr(views_mod, "BROADCAST_KEYS_MAX", 0)
    plans: list[str] = []
    orig = DataFrame.collect

    def spy(self):
        buf = io.StringIO()
        with redirect_stdout(buf):
            self.explain("formatted")
        plans.append(buf.getvalue())
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    # commit also executes the content plan; capture it via count spy?
    # collect covers the bucket-list and count paths; the content plan
    # is exercised through commit — probe it directly instead:
    r = refresh_view(up, down, ROLE_SPEC, mode="algebraic")
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert r["applied"], r
    joined = "\n".join(plans)
    assert "BroadcastNestedLoopJoin" not in joined, joined[-4000:]
    assert "CartesianProduct" not in joined, joined[-4000:]
    # and the final state is still exact
    assert _state(down) == _full(ROLE_SPEC, up)


def test_delete_heavy_tick_switches_to_single_recompute_plan(spark, tmp_path):
    """FALLBACK_RECOMPUTE_FRACTION: when most changed groups need the
    min/max/sketch regression fallback (a delete-heavy tick), the whole
    tick collapses to ONE recompute plan over the changed groups
    instead of algebraic + near-total fallback — and state still equals
    the full recompute exactly."""
    up = LakeTable.create(
        spark, str(tmp_path / "up"), TRANSCRIPTS_DDL, KEY_COLS, 4
    )
    spec = ViewSpec(
        "conv_ad",
        "role string",
        {
            "n_turns": ("count", "long"),
            "n_convs": ("approx_distinct", "conv_id", "long"),
        },
    )
    down = create_view_table(spark, str(tmp_path / "v"), spec, 2)
    # 4 roles x several convs each
    rows = []
    lsn = 0
    for g in range(4):
        for c in range(5):
            rows.append((lsn, "I", f"c{g}_{c}", 0, f"role{g}", "x"))
            lsn += 1
    apply_batch(up, _ev(spark, rows), "b0", lsn_range_hint=(0, lsn - 1))
    assert refresh_view(up, down, spec)["applied"]

    # delete one conv from 3 of the 4 groups, insert into the 4th:
    # 4 changed groups, 3 need the sketch-removal fallback (>= 50%)
    evs = [
        (100, "D", "c0_0", 0, None, None),
        (101, "D", "c1_0", 0, None, None),
        (102, "D", "c2_0", 0, None, None),
        (103, "I", "c3_9", 0, "role3", "y"),
    ]
    apply_batch(up, _ev(spark, evs), "b1", lsn_range_hint=(100, 103))
    r = refresh_view(up, down, spec)
    assert r["applied"]
    assert r["mode"] == "algebraic->recompute", r
    assert r["fallback_groups"] == 3, r
    got = {
        r_.role: (r_.n_turns, r_.n_convs)
        for r_ in down.read(user_cols=True)
        .select("role", "n_turns", "n_convs").collect()
    }
    want = {
        r_.role: (r_.n_turns, r_.n_convs)
        for r_ in full_compute(spec, up.read(user_cols=True))
        .select("role", "n_turns", "n_convs").collect()
    }
    assert got == want

    # insert-mostly tick: 1 fallback of 4 changed groups stays on the
    # two-plan algebraic path
    evs = [
        (200, "I", "c0_9", 0, "role0", "z"),
        (201, "I", "c1_9", 0, "role1", "z"),
        (202, "I", "c2_9", 0, "role2", "z"),
        (203, "D", "c3_0", 0, None, None),
    ]
    apply_batch(up, _ev(spark, evs), "b2", lsn_range_hint=(200, 203))
    r = refresh_view(up, down, spec)
    assert r["applied"] and r["mode"] == "algebraic", r
    assert r["fallback_groups"] == 1, r
    got = {
        r_.role: (r_.n_turns, r_.n_convs)
        for r_ in down.read(user_cols=True)
        .select("role", "n_turns", "n_convs").collect()
    }
    want = {
        r_.role: (r_.n_turns, r_.n_convs)
        for r_ in full_compute(spec, up.read(user_cols=True))
        .select("role", "n_turns", "n_convs").collect()
    }
    assert got == want


def test_view_over_patched_upstream(spark, tmp_path):
    """Composition: incremental views over a CELL-LWW upstream. Partial
    images (a U carrying only text, a U carrying only role) fold into
    the upstream state; the change feed emits FOLDED rows, so algebraic
    maintenance must equal full recompute after every tick — including
    a group MOVE caused by a role-only patch."""
    up = LakeTable.create(
        spark, str(tmp_path / "pup"), TRANSCRIPTS_DDL, KEY_COLS, 4,
        patch_cols=["role", "text", "tool"],
    )
    down = create_view_table(
        spark, str(tmp_path / "proles"), ROLE_SPEC, n_buckets=2
    )
    apply_batch(up, _ev(spark, [
        (0, "I", "c0", 0, "user", "aa"),
        (1, "I", "c0", 1, "assistant", "bbb"),
    ]), "b0", lsn_range_hint=(0, 1))
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    assert _state(down) == _full(ROLE_SPEC, up)

    # text-only patch: role inherited, chars change in place
    apply_batch(up, _ev(spark, [
        (10, "U", "c0", 0, None, "aaaa"),
    ]), "b1", lsn_range_hint=(10, 10), merge_mode="read")
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    st = _state(down)
    assert st == _full(ROLE_SPEC, up)
    assert st[("user",)][1] == 4  # folded text, inherited role

    # role-only patch: the row MOVES groups while text is inherited
    apply_batch(up, _ev(spark, [
        (20, "U", "c0", 0, "assistant", None),
    ]), "b2", lsn_range_hint=(20, 20), merge_mode="read",
        delta_plan="raw")
    assert refresh_view(up, down, ROLE_SPEC)["applied"]
    st = _state(down)
    assert st == _full(ROLE_SPEC, up)
    assert ("user",) not in st
    assert st[("assistant",)][0] == 2
    assert st[("assistant",)][1] == 3 + 4  # both folded texts
