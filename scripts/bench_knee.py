"""Thread-knee sweep (single JVM): where does local[N] replay throughput
peak on this host with the FIXED 16g heap?

Round-1 capped bench threads at 8 because local[32] was 3x slower —
round 2 root-caused that to G1 young-gen ballooning at a 96g heap and
fixed it (16g heap + single-sort merge). This sweep re-measures the knee
post-fix so BENCH_MAX_THREADS comes from data, not a stale workaround.

Each level runs bench.py (BENCH_REPLAY_ONLY=1, 2M events, cached WAL) R
times in a fresh process; best events/sec per level is kept (shared-host
noise rejection). Writes BENCH/knee.json.

Env: KNEE_EVENTS (default 2_000_000), KNEE_REPEATS (default 3),
KNEE_LEVELS (default "8,12,16,24,32").
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVENTS = int(os.environ.get("KNEE_EVENTS", "2000000"))
REPEATS = int(os.environ.get("KNEE_REPEATS", "3"))
LEVELS = [
    int(x) for x in os.environ.get("KNEE_LEVELS", "8,12,16,24,32").split(",")
]


def run_level(n: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=f"local[{n}]",
        SPARK_GRAFT_CPUS=str(n),
        SPARK_GRAFT_DRIVER_MEM="16g",
        BENCH_EVENTS=str(EVENTS),
        BENCH_REPLAY_ONLY="1",
    )
    runs = []
    for _ in range(REPEATS):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = r.stdout.strip().splitlines()[-1]
        runs.append(json.loads(line)["cdc"]["events_per_sec"])
    return {
        "threads": n,
        "best_events_per_sec": max(runs),
        "median_events_per_sec": statistics.median(runs),
        "all_events_per_sec": runs,
    }


def main() -> None:
    levels = [run_level(n) for n in LEVELS]
    best = max(levels, key=lambda x: x["best_events_per_sec"])
    report = {
        "events": EVENTS,
        "repeats": REPEATS,
        "heap": "16g",
        "levels": levels,
        "knee_threads": best["threads"],
        "knee_events_per_sec": best["best_events_per_sec"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "knee.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
