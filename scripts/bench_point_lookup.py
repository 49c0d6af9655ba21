"""Point-lookup bench: read(keys=...) file skipping, bloom vs none.

Builds two identical UNcompacted transcripts tables (the worst case
for [min,max] key-range skipping: every append commit's file spans the
bucket's whole key space, so ranges prune nothing) — one committed
with ``key_bloom=True``, one without — then measures a batched point
lookup's opened-file count and wall time on both. This is the serving
query of a transcripts lake ("fetch conversation X") and the scale
story is file-count, not wall: at 100 TB a bucket accumulates hundreds
of commit files between compactions, and opened-files is the number of
scan tasks + footer reads the lookup pays.

Writes BENCH/point_lookup.json and BENCH/point_lookup.md.

Env: PL_CONVS (default 200_000 convs x 5 turns = 1M rows),
PL_COMMITS (default 16 append commits, interleaved key populations),
PL_BUCKETS (default 64), PL_LOOKUPS (default 8 batched keys).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("PL_CONVS", "200000"))
N_COMMITS = int(os.environ.get("PL_COMMITS", "16"))
N_BUCKETS = int(os.environ.get("PL_BUCKETS", "64"))
N_LOOKUPS = int(os.environ.get("PL_LOOKUPS", "8"))
TURNS = 5


def build(spark, root: str, key_bloom: bool):
    from pyspark.sql import functions as F

    from etl_bitcoin_spark.operators.merge import (
        KEY_COLS,
        TRANSCRIPTS_DDL,
    )
    from etl_bitcoin_spark.tableformat import LakeTable
    from etl_bitcoin_spark.tableformat.lake import BUCKET_COL, LSN_COL

    lake = LakeTable.create(spark, root, TRANSCRIPTS_DDL, KEY_COLS, N_BUCKETS)
    rows_per_commit = N_CONVS * TURNS // N_COMMITS
    walls = []
    for c in range(N_COMMITS):
        # commit c holds convs {i : i % N_COMMITS == c}: every file's
        # key range spans ~the full conv_ space (ranges prune nothing)
        df = (
            spark.range(rows_per_commit)
            .withColumn(
                "conv",
                (F.col("id") % F.lit(N_CONVS // N_COMMITS))
                * N_COMMITS + c,
            )
            .select(
                F.format_string("conv_%08d", F.col("conv")).alias("conv_id"),
                (F.col("id") / (N_CONVS // N_COMMITS))
                .cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.format_string("text-%d", F.col("id")).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
                (F.col("id") + c * rows_per_commit).alias(LSN_COL),
            )
            .withColumn(BUCKET_COL, lake.bucket_expr(N_BUCKETS, KEY_COLS))
            .repartition(8, *KEY_COLS)
        )
        t0 = time.perf_counter()
        assert lake.commit(
            df, [], f"a{c}", None, mode="append", key_bloom=key_bloom
        )
        walls.append(time.perf_counter() - t0)
    return lake, walls


def lookup(lake, keys: list[str]) -> tuple[float, int, int]:
    t0 = time.perf_counter()
    df = lake.read(user_cols=True, keys=keys)
    n = df.count()
    wall = time.perf_counter() - t0
    return wall, len(df.inputFiles()), n


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from etl_bitcoin_spark.session import get_spark

    spark = get_spark("bench-point-lookup", cores=8, shuffle_partitions=16)
    base = "/dev/shm/pl_bench"
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    report: dict = {
        "rows": N_CONVS * TURNS, "commits": N_COMMITS,
        "buckets": N_BUCKETS, "keys_per_lookup": N_LOOKUPS,
    }
    keys = [
        f"conv_{i * (N_CONVS // (N_LOOKUPS + 1)):08d}"
        for i in range(1, N_LOOKUPS + 1)
    ]
    for tag, kb in (("bloom", True), ("none", False)):
        lake, walls = build(spark, f"{base}/{tag}", kb)
        runs = [lookup(lake, keys) for _ in range(5)]
        want = N_LOOKUPS * TURNS
        assert all(n == want for _, _, n in runs), runs
        report[tag] = {
            "commit_wall_median_sec": round(statistics.median(walls), 3),
            "lookup_wall_sec_runs": [round(w, 3) for w, _, _ in runs],
            "lookup_wall_median_sec": round(
                statistics.median(w for w, _, _ in runs), 3
            ),
            "files_opened": runs[0][1],
            "rows_returned": want,
        }
        total_files = sum(
            len(e["files"]) for e in lake.bucket_entries().values()
        )
        report[tag]["table_files"] = total_files
        print(json.dumps({tag: report[tag]}), flush=True)
    b, n = report["bloom"], report["none"]
    report["files_opened_ratio"] = round(
        n["files_opened"] / max(1, b["files_opened"]), 1
    )
    report["wall_speedup"] = round(
        n["lookup_wall_median_sec"] / max(1e-9, b["lookup_wall_median_sec"]),
        2,
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "point_lookup.json"), "w") as f:
        json.dump(report, f, indent=1)
    md = f"""# Batched point lookup: read(keys=...) with per-file key Blooms

{report['rows']:,}-row transcripts table, {N_BUCKETS} buckets,
{N_COMMITS} interleaved append commits, UNCOMPACTED — the worst case
for [min,max] key-range skipping (every file's key range spans the
bucket's key space, ranges prune nothing). One batched lookup of
{N_LOOKUPS} conv_ids x {TURNS} turns, median of 5.

| variant | table files | files opened | lookup wall (s) | commit wall (s, median) |
|---|---|---|---|---|
| key_bloom=True | {b['table_files']} | {b['files_opened']} | {b['lookup_wall_median_sec']} | {b['commit_wall_median_sec']} |
| no blooms | {n['table_files']} | {n['files_opened']} | {n['lookup_wall_median_sec']} | {n['commit_wall_median_sec']} |

Files-opened ratio: **{report['files_opened_ratio']}x fewer** with
blooms; lookup wall {report['wall_speedup']}x. The scale story is the
file count: opened-files = scan tasks + footer reads, and at 100 TB a
bucket accumulates hundreds of commit files between compactions while
the lookup's bloom probes stay a driver-side manifest operation. The
commit-wall column is the write-side tax of building the blooms (one
key-column read per fresh file) — the reason ``key_bloom`` is opt-in.
Reproduce: `python scripts/bench_point_lookup.py` (env: PL_CONVS,
PL_COMMITS, PL_BUCKETS, PL_LOOKUPS).
"""
    with open(os.path.join(REPO, "BENCH", "point_lookup.md"), "w") as f:
        f.write(md)
    print(json.dumps({k: v for k, v in report.items()
                      if k in ("files_opened_ratio", "wall_speedup")}))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
