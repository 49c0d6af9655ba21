"""Per-phase profiling of the two e2e bench paths (guide §1).

NOT the frozen bench — mirrors bench.py's replay and stream-tail
methodology exactly (same warmups, same WAL, same lake config) but
records per-batch / per-trigger walls and per-phase timers so the
optimization work knows where the seconds live.

Usage:
  python scripts/profile_e2e.py replay
  python scripts/profile_e2e.py stream
  python scripts/profile_e2e.py minhash     # per-job breakdown
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_bitcoin_spark.session import get_spark

N_EVENTS = int(os.environ.get("BENCH_EVENTS", "2000000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    return get_spark(
        "profile_e2e", cores=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )


def profile_replay() -> None:
    from pyspark.sql import functions as F

    import bench as bench_mod
    from etl_bitcoin_spark.operators import merge as merge_mod
    from etl_bitcoin_spark.operators.merge import (
        BINLOG_DDL, KEY_COLS, TRANSCRIPTS_DDL, replay,
    )
    from etl_bitcoin_spark.tableformat import LakeTable

    spark = _spark()
    wal = bench_mod._wal_dir(N_EVENTS, spark)
    base = "/dev/shm"

    # wrap apply_batch with a timer
    orig = merge_mod.apply_batch
    walls: list[dict] = []

    def timed(lake, events, batch_id, **kw):
        t0 = time.time()
        r = orig(lake, events, batch_id, **kw)
        walls.append({
            "batch": batch_id, "wall": round(time.time() - t0, 3),
            "mode": kw.get("merge_mode", "write"),
            "plan": kw.get("delta_plan", "-"),
            "commit": getattr(lake, "last_commit_stats", None),
        })
        return r

    merge_mod.apply_batch = timed
    try:
        binlog = spark.read.schema(BINLOG_DDL).parquet(f"{wal}/*.parquet")
        for rep in range(int(os.environ.get("PROFILE_REPS", "3"))):
            lake_dir = tempfile.mkdtemp(prefix="prof_lake_", dir=base)
            warm_dir = tempfile.mkdtemp(prefix="prof_warm_", dir=base)
            try:
                warm_lake = LakeTable.create(
                    spark, warm_dir, TRANSCRIPTS_DDL, KEY_COLS, 64
                )
                replay(warm_lake, binlog.filter(F.col("lsn") < 50000),
                       batch_lsn_width=None, batch_id_prefix="warm")
                walls.clear()
                lake = LakeTable.create(
                    spark, lake_dir, TRANSCRIPTS_DDL, KEY_COLS, 64
                )
                t0 = time.time()
                replay(lake, binlog, batch_lsn_width=(N_EVENTS + 3) // 4,
                       batch_id_prefix=f"p{rep}")
                total = round(time.time() - t0, 3)
                print(json.dumps({
                    "rep": rep, "total": total, "batches": walls,
                    "unattributed": round(
                        total - sum(w["wall"] for w in walls), 3),
                }))
            finally:
                shutil.rmtree(lake_dir, ignore_errors=True)
                shutil.rmtree(warm_dir, ignore_errors=True)
    finally:
        merge_mod.apply_batch = orig
    spark.stop()


def profile_stream() -> None:
    import bench as bench_mod
    from etl_bitcoin_spark.streaming import tailer as tailer_mod
    from etl_bitcoin_spark.streaming import BinlogTailer
    from etl_bitcoin_spark.operators.merge import KEY_COLS, TRANSCRIPTS_DDL
    from etl_bitcoin_spark.tableformat import LakeTable

    spark = _spark()
    n = min(N_EVENTS, 2_000_000)
    wal = bench_mod._wal_dir(n)
    base = "/dev/shm"

    # time the foreachBatch body vs the trigger wall
    applies: list[dict] = []
    orig_apply = BinlogTailer._apply_df

    def timed_apply(self, df, batch_id):
        t0 = time.time()
        r = orig_apply(self, df, batch_id)
        applies.append({"batch": batch_id,
                        "apply_wall": round(time.time() - t0, 3),
                        "commit": getattr(self.lake, "last_commit_stats",
                                          None)})
        return r

    BinlogTailer._apply_df = timed_apply
    try:
        for rep in range(int(os.environ.get("PROFILE_REPS", "3"))):
            warm_wal = bench_mod._wal_dir(50_000)
            dirs = [tempfile.mkdtemp(prefix=f"prof_s{i}_", dir=base)
                    for i in range(4)]
            try:
                warm_lake = LakeTable.create(
                    spark, dirs[0], TRANSCRIPTS_DDL, KEY_COLS, 64)
                BinlogTailer(spark, warm_wal, warm_lake, dirs[1],
                             max_files_per_trigger=8,
                             assume_all_buckets=True).run_available()
                applies.clear()
                lake = LakeTable.create(
                    spark, dirs[2], TRANSCRIPTS_DDL, KEY_COLS, 64)
                t0 = time.time()
                BinlogTailer(spark, wal, lake, dirs[3],
                             max_files_per_trigger=8,
                             assume_all_buckets=True).run_available()
                total = round(time.time() - t0, 3)
                print(json.dumps({
                    "rep": rep, "total": total, "applies": applies,
                    "ss_overhead": round(
                        total - sum(a["apply_wall"] for a in applies), 3),
                }))
            finally:
                for d in dirs:
                    shutil.rmtree(d, ignore_errors=True)
    finally:
        BinlogTailer._apply_df = orig_apply
    spark.stop()


def profile_minhash() -> None:
    from pyspark.sql import functions as F

    from etl_bitcoin_spark.plans import pipeline_queries as pq

    spark = _spark()
    for rep in range(int(os.environ.get("PROFILE_REPS", "3"))):
        spark.catalog.clearCache()
        out = {}
        d = pq._docs_with_mutated_copies(spark, SF_DIR)
        t0 = time.time()
        sh = pq._shingled(d).cache()
        sh.count()  # materialize cache (job 1)
        out["shingle_cache"] = round(time.time() - t0, 3)
        t0 = time.time()
        sigs_sz = pq._minhash_sigs(sh, with_sizes=True).cache()
        sigs_sz.count()  # job 2
        out["sig_cache"] = round(time.time() - t0, 3)
        t0 = time.time()
        # run the full query (builds its own caches — separate objects,
        # so this measures the uncached full pipeline):
        pq.q_dedup_minhash_lsh(spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
        out["full_query"] = round(time.time() - t0, 3)
        print(json.dumps({"rep": rep, **out}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "replay"
    {"replay": profile_replay, "stream": profile_stream,
     "minhash": profile_minhash}[mode]()
