"""Paired A/B of two git trees on the sf0.1 bench (VERDICT r4 #2).

The round-4 driver bench recorded 45.2 s total vs round-3's 35.5 s on
unchanged-or-improved plans; three same-code builder runs landed at
35.8-39.3 s, pointing at shared-host noise. This harness settles it:
both trees run ALTERNATING in one session (A B B A per pair, canceling
linear drift), each run preceded by the 8-proc pure-CPU quiet-window
probe from bench_scaling.py, on the SAME cached WAL and testdata.

Usage:  python scripts/bench_ab.py <ref_a> <ref_b> [pairs]
Writes BENCH/ab_<a>_<b>.json with every run + paired deltas.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import _probe_once  # noqa: E402  (quiet-window probe)


def _worktree(ref: str) -> str:
    path = f"/tmp/ab_tree_{ref.replace('/', '_')}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, ref],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def _one_run(tree: str, sf_dir: str, events: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_EVENTS=str(events),
    )
    r = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, cwd=tree, capture_output=True, text=True, timeout=1800,
    )
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ref_a = sys.argv[1] if len(sys.argv) > 1 else "23a306f"
    ref_b = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    events = int(os.environ.get("BENCH_EVENTS", "2000000"))

    tree_a = _worktree(ref_a)
    tree_b = _worktree(ref_b) if ref_b != "HEAD" else REPO
    runs: list[dict] = []
    for i in range(pairs):
        # ABBA within each pair: linear host drift cancels in the mean
        order = [("a", tree_a), ("b", tree_b)]
        if i % 2 == 1:
            order.reverse()
        for side, tree in order:
            probe = min(_probe_once(8), _probe_once(8))
            t0 = time.time()
            r = _one_run(tree, sf_dir, events)
            runs.append({
                "pair": i, "side": side, "probe8_sec": round(probe, 3),
                "total_sec": r["value"], "queries": r["queries"],
                "replay_eps": r["cdc"]["events_per_sec"],
                "wall_sec": round(time.time() - t0, 1),
            })
            print(json.dumps(runs[-1]), flush=True)

    def side_stats(side: str) -> dict:
        rs = [r for r in runs if r["side"] == side]
        totals = [r["total_sec"] for r in rs]
        eps = [r["replay_eps"] for r in rs]
        best_probe = min(r["probe8_sec"] for r in runs)
        quiet = [r["total_sec"] for r in rs
                 if r["probe8_sec"] <= best_probe * 1.15]
        return {
            "n": len(rs),
            "total_sec_median": round(statistics.median(totals), 2),
            "total_sec_best": min(totals),
            "total_sec_all": totals,
            "replay_eps_median": round(statistics.median(eps), 1),
            "replay_eps_best": max(eps),
            "quiet_total_sec_median": (
                round(statistics.median(quiet), 2) if quiet else None
            ),
            "n_quiet": len(quiet),
        }

    a, b = side_stats("a"), side_stats("b")
    # per-pair delta (b - a) on the shared-query subset
    deltas = []
    for i in range(pairs):
        pa = next(r for r in runs if r["pair"] == i and r["side"] == "a")
        pb = next(r for r in runs if r["pair"] == i and r["side"] == "b")
        shared = set(pa["queries"]) & set(pb["queries"])
        deltas.append(round(
            sum(pb["queries"][q] for q in shared)
            - sum(pa["queries"][q] for q in shared), 2))
    report = {
        "ref_a": ref_a, "ref_b": ref_b, "pairs": pairs,
        "events": events, "sf_dir": sf_dir,
        "a": a, "b": b,
        "paired_shared_query_delta_sec_b_minus_a": deltas,
        "paired_delta_median": round(statistics.median(deltas), 2),
        "runs": runs,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", f"ab_{ref_a}_{ref_b}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("a", "b", "paired_shared_query_delta_sec_b_minus_a",
                       "paired_delta_median")}))


if __name__ == "__main__":
    main()
