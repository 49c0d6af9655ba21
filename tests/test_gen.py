"""Generator properties: the adversarial knobs FIXTURES.md §2 demands
must actually be present in the produced stream."""

import numpy as np

from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, oracle_replay


def test_generator_is_deterministic():
    a = generate_binlog(BinlogSpec(seed=9, n_events=500))
    b = generate_binlog(BinlogSpec(seed=9, n_events=500))
    assert a.equals(b)
    c = generate_binlog(BinlogSpec(seed=10, n_events=500))
    assert not a["conv_id"].equals(c["conv_id"])


def test_duplicates_within_and_across_segments():
    df = generate_binlog(BinlogSpec(seed=4, n_events=2000, dup_rate=0.05))
    dup_mask = df.duplicated(subset=["lsn"], keep=False)
    assert dup_mask.sum() > 0, "duplicate deliveries must exist"
    dups = df[df.duplicated(subset=["lsn"], keep="first")]
    seg_of_first = df.drop_duplicates("lsn").set_index("lsn")["seg"]
    cross = (dups["seg"].values != seg_of_first.loc[dups["lsn"]].values).sum()
    within = (dups["seg"].values == seg_of_first.loc[dups["lsn"]].values).sum()
    assert cross > 0 and within > 0, "dups must occur within AND across segments"


def test_out_of_order_within_segment_only():
    df = generate_binlog(BinlogSpec(seed=4, n_events=2000, n_segments=8))
    uniq = df.drop_duplicates("lsn")
    seg_width = 250
    # every unique lsn lives in its own segment (ooo bounded by segment)
    assert (uniq["lsn"] // seg_width == uniq["seg"]).all()
    # delivery order within a segment is genuinely shuffled
    first_seg = uniq[uniq["seg"] == 0]["lsn"].to_numpy()
    assert not np.all(np.diff(first_seg) > 0), "in-segment order must be shuffled"


def test_schema_evolution_point_and_payload_rules():
    spec = BinlogSpec(seed=4, n_events=1000, evolution_point=0.4)
    df = generate_binlog(spec)
    pre = df[df["lsn"] < 400]
    post = df[df["lsn"] >= 400]
    assert pre["tool"].isna().all(), "no tool values before the evolution point"
    assert post["tool"].notna().any()
    d = df[df["op"] == "D"]
    assert d["text"].isna().all() and d["role"].isna().all()


def test_hot_key_share():
    df = generate_binlog(
        BinlogSpec(seed=4, n_events=5000, hot_share=0.3, n_hot=1)
    )
    share = (df["conv_id"] == "conv_0").mean()
    assert 0.2 < share < 0.4


def test_ts_collisions_force_lsn_tiebreak():
    df = generate_binlog(BinlogSpec(seed=4, n_events=3000))
    uniq = df.drop_duplicates("lsn")
    per_key_ts = uniq.groupby(["conv_id", "turn_idx", "ts"]).size()
    assert (per_key_ts > 1).any(), "same-key same-ts conflicts must exist"


def test_oracle_replay_duplicate_is_noop():
    df = generate_binlog(BinlogSpec(seed=4, n_events=800))
    once = oracle_replay(df)
    twice = oracle_replay(
        df._append(df, ignore_index=True)
        if hasattr(df, "_append") else df
    )
    assert once.equals(twice)


def test_spark_generator_replays_to_oracle(spark, tmp_path):
    """The distributed generator's stream must replay (engine) to the
    same state as the sequential oracle over the identical events."""
    from etl_bitcoin_spark.gen.binlog_spark import spark_binlog
    from etl_bitcoin_spark.operators.merge import (
        KEY_COLS, TRANSCRIPTS_DDL, replay,
    )
    from etl_bitcoin_spark.tableformat import LakeTable
    import pandas as pd

    ev = spark_binlog(spark, 5000, seed=13, n_convs=200, max_turns=10)
    pdf = ev.toPandas()
    lake = LakeTable.create(spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS, 8)
    replay(lake, ev, batch_lsn_width=1500)
    got = (
        lake.read(user_cols=True)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas().reset_index(drop=True)
    )
    want = oracle_replay(pdf)[["conv_id", "turn_idx", "text"]].reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_spark_generator_determinism(spark):
    from etl_bitcoin_spark.gen.binlog_spark import spark_binlog

    a = spark_binlog(spark, 2000, seed=5).orderBy("lsn").toPandas()
    b = spark_binlog(spark, 2000, seed=5).orderBy("lsn").toPandas()
    assert a.equals(b)


def test_all_null_column_segment_stays_readable(spark, tmp_path):
    """A segment whose tool (or any) column is entirely null must still
    write with its CONTRACT type: pyarrow would otherwise infer the
    NULL type (parquet INT32) and the typed streaming reader fails hard
    with a column type mismatch instead of backfilling."""
    import pandas as pd

    from etl_bitcoin_spark.gen import write_segments
    from etl_bitcoin_spark.operators.merge import BINLOG_DDL

    pdf = pd.DataFrame({
        "lsn": [0, 1, 2],
        "op": ["I", "I", "U"],
        "conv_id": ["a", "b", "a"],
        "turn_idx": pd.array([0, 0, 0], dtype="int32"),
        "role": ["user"] * 3,
        "text": ["x", "y", "z"],
        "tool": pd.array([None, None, None], dtype=object),  # ALL null
        "ts": pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]"),
        "seg": [0, 0, 0],
        "evolved": [True, True, True],  # v2 schema: tool column present
    })
    write_segments(pdf, str(tmp_path / "wal"))
    got = (
        spark.read.schema(BINLOG_DDL)
        .parquet(str(tmp_path / "wal"))
        .collect()
    )
    assert len(got) == 3 and all(r.tool is None for r in got)
