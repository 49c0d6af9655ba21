"""Commit-metadata cost probe for raw mod-shard delta appends.

Measures ``LakeTable.last_commit_stats`` phase walls while a 4096-bucket
table absorbs raw delta batches — the endurance shape where the r5
per-bucket registration paid 3.8-5.5 s of commit metadata per ~30 s
batch (every shared file registered in all 4096 member buckets' delta
lists, O(n_buckets) bm/gm writes per commit). The r6 shard-generation
registration is O(K): the K shard files land as one snapshot-level
generation entry, zero bm/gm writes.

Run against any repo tree (old or new) for an A/B:

    python scripts/bench_shard_meta.py [--repo PATH] [--buckets 4096]
        [--batches 12] [--rows 500000]

Prints one JSON line: {"meta_sec": {"p50":..., "p90":...},
"write_sec": {...}, "stats_sec": {...}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))
    ap.add_argument("--buckets", type=int, default=4096)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "8")
    ))
    args = ap.parse_args()
    sys.path.insert(0, args.repo)

    from etl_bitcoin_spark.gen.binlog_spark import derive_binlog_columns
    from etl_bitcoin_spark.operators.merge import (
        KEY_COLS, TRANSCRIPTS_DDL, apply_batch,
    )
    from etl_bitcoin_spark.session import get_spark
    from etl_bitcoin_spark.tableformat import LakeTable

    spark = get_spark(
        "bench_shard_meta", cores=args.cores,
        shuffle_partitions=2 * args.cores,
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="shard_meta_", dir=base)
    lake = LakeTable.create(
        spark, os.path.join(root, "lake"), TRANSCRIPTS_DDL, KEY_COLS,
        args.buckets,
    )
    walls: dict[str, list[float]] = {
        "write_sec": [], "stats_sec": [], "meta_sec": [], "total": [],
    }
    import time

    total = args.batches * args.rows
    for i in range(args.batches):
        lo = i * args.rows
        ev = derive_binlog_columns(
            spark.range(lo, lo + args.rows, 1, args.cores), total,
            seed=42, n_convs=max(1000, total // 20), max_turns=50,
            hot_share=0.2,
        )
        t0 = time.perf_counter()
        r = apply_batch(
            lake, ev, f"b{i}", merge_mode="read", delta_plan="raw",
            lsn_range_hint=(lo, lo + args.rows - 1),
        )
        wall = time.perf_counter() - t0
        assert r["applied"], r
        st = lake.last_commit_stats
        for k in ("write_sec", "stats_sec", "meta_sec"):
            walls[k].append(st[k])
        walls["total"].append(wall)

    def _pct(xs, q):
        xs = sorted(xs)
        return round(xs[min(len(xs) - 1, int(q * len(xs)))], 4)

    out = {
        "repo": args.repo,
        "buckets": args.buckets,
        "batches": args.batches,
        "rows_per_batch": args.rows,
        "gens_live": len(lake.snapshot().get("shard_deltas", [])),
    }
    for k, xs in walls.items():
        out[k] = {
            "p50": round(statistics.median(xs), 4),
            "p90": _pct(xs, 0.9),
            "max": round(max(xs), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
