"""Streaming micro-batch latency evidence (processingTime trigger).

Tails the cached 2M-event WAL with a live processingTime trigger (the
steady-state deployment shape, vs. availableNow used for drain
benchmarks) and reports per-batch latency percentiles from the
StreamingQuery progress records: triggerExecution (end-to-end batch
latency incl. merge + atomic commit), addBatch (the foreachBatch body),
and throughput.

Writes BENCH/latency.json and BENCH/latency.md.

Env: LAT_EVENTS (default 2_000_000), LAT_FILES_PER_TRIGGER (default 2),
SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_bitcoin_spark.session import get_spark  # noqa: E402

N_EVENTS = int(os.environ.get("LAT_EVENTS", "2000000"))
FILES_PER_TRIGGER = int(os.environ.get("LAT_FILES_PER_TRIGGER", "2"))


def pct(xs, q):
    xs = sorted(xs)
    if not xs:
        return None
    i = min(len(xs) - 1, int(round(q * (len(xs) - 1))))
    return xs[i]


def main() -> None:
    sys.path.insert(0, REPO)
    from bench import _wal_dir  # reuse the cached seeded WAL

    from etl_bitcoin_spark.operators.merge import KEY_COLS, TRANSCRIPTS_DDL
    from etl_bitcoin_spark.streaming import BinlogTailer
    from etl_bitcoin_spark.tableformat import LakeTable

    spark = get_spark(
        "bench-latency",
        cores=min(int(os.environ.get("SPARK_GRAFT_CPUS", "8")), 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    wal = _wal_dir(N_EVENTS, spark)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    lake_dir = tempfile.mkdtemp(prefix="lat_lake_", dir=base)
    ckpt = tempfile.mkdtemp(prefix="lat_ckpt_", dir=base)
    try:
        lake = LakeTable.create(
            spark, lake_dir, TRANSCRIPTS_DDL, KEY_COLS, 64
        )
        tailer = BinlogTailer(
            spark, wal, lake, ckpt, max_files_per_trigger=FILES_PER_TRIGGER
        )
        out = tailer.run_processing_time(
            interval="500 milliseconds",
            until_events=N_EVENTS,
            timeout_sec=600,
        )
        prog = [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in out["progress"]
        ]
        # keep batches that actually processed rows; the FIRST batch pays
        # JIT + codegen + parquet-reader warmup and is reported
        # separately, not inside the steady-state percentiles
        rows_batches = [p for p in prog if p.get("numInputRows", 0) > 0]
        all_trig = [
            p["durationMs"]["triggerExecution"] / 1000 for p in rows_batches
        ]
        cold = all_trig[0] if all_trig else None
        trig = all_trig[1:] if len(all_trig) > 1 else all_trig
        add = [
            p["durationMs"].get("addBatch", 0) / 1000 for p in rows_batches
        ][1:]
        applied = sum(r.get("events", 0) for r in out["batch_results"])
        report = {
            "events": N_EVENTS,
            "files_per_trigger": FILES_PER_TRIGGER,
            "micro_batches": len(rows_batches),
            "events_per_batch": N_EVENTS // max(1, len(rows_batches)),
            "applied": applied,
            "cold_first_batch_sec": cold,
            "batch_latency_sec": {
                "p50": pct(trig, 0.5),
                "p90": pct(trig, 0.9),
                "p99": pct(trig, 0.99),
                "max": max(trig) if trig else None,
            },
            "addBatch_sec": {
                "p50": pct(add, 0.5),
                "p90": pct(add, 0.9),
            },
            "sustained_events_per_sec": (
                round(
                    (applied - N_EVENTS // max(1, len(rows_batches)))
                    / sum(trig),
                    1,
                )
                if trig
                else None
            ),
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "latency.json"), "w") as f:
            json.dump(report, f, indent=1)
        lat = report["batch_latency_sec"]
        md = [
            "# Streaming micro-batch latency (processingTime trigger)",
            "",
            f"Live tail of the {N_EVENTS:,}-event seeded WAL "
            f"({FILES_PER_TRIGGER} segment files/trigger, 500ms trigger, "
            "64-bucket lake, full exactly-once guards + Bloom state). "
            "Latency = Spark progress `triggerExecution` per micro-batch "
            "(merge + atomic manifest commit included).",
            "",
            "| metric | value |",
            "|---|---|",
            f"| micro-batches | {report['micro_batches']} |",
            f"| events/batch | ~{report['events_per_batch']:,} |",
            f"| p50 batch latency | {lat['p50']:.2f} s |",
            f"| p90 batch latency | {lat['p90']:.2f} s |",
            f"| p99 batch latency | {lat['p99']:.2f} s |",
            f"| max batch latency | {lat['max']:.2f} s |",
            f"| cold first batch (JIT/codegen, excluded above) | "
            f"{report['cold_first_batch_sec']:.2f} s |",
            f"| sustained throughput (warm) | "
            f"{report['sustained_events_per_sec']:,.0f} events/s |",
            "",
            "Latency scales with events/batch (batch size is the pacing "
            "knob, `maxFilesPerTrigger`): the merge cost is per-event, the "
            "fixed per-batch floor is the guard pass + bucket-pruned read "
            "+ atomic commit (~1s on this host). Small live batches also "
            "pay the merge-on-write tax (the touched buckets' stored rows "
            "rewrite every batch) — that is the latency/throughput trade "
            "vs. the availableNow drain numbers in BENCH_r*.json, which "
            "amortize it over 500k-event batches.",
        ]
        with open(os.path.join(REPO, "BENCH", "latency.md"), "w") as f:
            f.write("\n".join(md) + "\n")
        print(json.dumps(report))
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
