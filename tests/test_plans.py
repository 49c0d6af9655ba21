"""Physical-plan regression guards: the optimizations the engine's scale
story rests on must be visible in the plan, not just asserted in prose."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    merge_batch_direct,
    replay,
)
from etl_bitcoin_spark.tableformat import LakeTable


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _mk_lake(spark, path):
    lake = LakeTable.create(spark, path, TRANSCRIPTS_DDL, KEY_COLS, 8)
    ev = spark.createDataFrame(
        [
            (i, "U", f"c{i % 5}", i % 3, "user", f"t{i}", None,
             datetime(2024, 1, 1, 0, 0, i % 60))
            for i in range(200)
        ],
        BINLOG_DDL,
    )
    replay(lake, ev, batch_lsn_width=None)
    return lake, ev


def test_merge_plan_has_single_exchange(spark, tmp_path):
    """The fused merge must shuffle exactly once (the co-partitioned
    key exchange); a second Exchange means the summary/merge fusion or
    the window partitioning reuse regressed."""
    lake, ev = _mk_lake(spark, str(tmp_path / "lake"))
    stored = lake.read(buckets=list(range(8)))
    merged = merge_batch_direct(stored, ev, 8)
    plan = _plan(merged)
    # formatted plans list each node once in the tree and once in the
    # details section; count the numbered detail headers
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 1, plan


def test_lake_read_pushdown_and_pruning(spark, tmp_path):
    """Filters must reach the parquet scan; projection must prune the
    read schema."""
    lake, _ = _mk_lake(spark, str(tmp_path / "lake"))
    q = (
        lake.read(user_cols=True)
        .filter(F.col("conv_id") == "c1")
        .select("conv_id", "text")
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,c1)]" in plan
    # only the needed columns (+ the tombstone flag) are read
    assert "text:string" in plan and "role" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_broadcast_join_for_small_dimension(spark):
    from etl_bitcoin_spark.plans.reference_ops import q_join_customer_orders

    plan = _plan(q_join_customer_orders(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_binlog_scan_prunes_lsn_ranges(spark, tmp_path):
    """Replay chunk filters must push lsn bounds into the WAL scan so
    row-group stats prune non-matching segments."""
    from etl_bitcoin_spark.gen import BinlogSpec, generate_binlog, write_segments

    wal = str(tmp_path / "wal")
    write_segments(generate_binlog(BinlogSpec(seed=2, n_events=400)), wal)
    binlog = spark.read.schema(BINLOG_DDL).parquet(wal)
    chunk = binlog.filter((F.col("lsn") >= 100) & (F.col("lsn") <= 199))
    plan = _plan(chunk)
    assert "GreaterThanOrEqual(lsn,100)" in plan and "LessThanOrEqual(lsn,199)" in plan
