"""Spike (ROADMAP #2 / round-2 verdict #8): hash-agg vs window merge
resolution under a HOT-KEY UPDATE STORM.

Round 1 measured the two-phase hash-agg formulation LOSING to the window
chain (3.48s vs 2.42s) at ~1 event/key, where partial aggregation has
nothing to combine. The calculus changes when one key receives thousands
of updates per batch (hot conversation, narrow lsn window): map-side
partial aggregation collapses the shuffle volume to ~1 row/key/task,
while the window must shuffle and sort EVERY event row.

Workload: n_events events, n_convs=100 (x <=50 turns => <=5000 keys),
n_hot=1 at hot_share=0.5 — the hot conversation's turns each see
~n_events*0.5/50 events. Both formulations produce the per-key
winner+tombstone set; equality is asserted per run.

Run: python scripts/spike_hotkey.py   (env: SPIKE_EVENTS, SPIKE_REPEATS)
Results land in stdout; adopt/record in ROADMAP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_bitcoin_spark.gen.binlog_spark import spark_binlog  # noqa: E402
from etl_bitcoin_spark.operators.merge import (  # noqa: E402
    KEY_COLS,
    VALUE_COLS,
    _resolve_union,
    events_as_rows,
)
from etl_bitcoin_spark.session import get_spark  # noqa: E402
from etl_bitcoin_spark.tableformat.lake import (  # noqa: E402
    DELETED_COL,
    LSN_COL,
)

N_EVENTS = int(os.environ.get("SPIKE_EVENTS", "5000000"))
REPEATS = int(os.environ.get("SPIKE_REPEATS", "3"))
N_BUCKETS = 64


def window_merge(rows):
    """The production path: single-sort window resolution."""
    return _resolve_union(rows, N_BUCKETS)


def agg_merge(rows):
    """Two-phase hash-agg: tombstone map from deletes only (partial agg),
    live filter via broadcast-join-free left join on the key, winner via
    max_by — all hash aggregates, no sort."""
    t = (
        rows.filter(F.col(DELETED_COL))
        .groupBy(*KEY_COLS)
        .agg(F.max(LSN_COL).alias("__t"))
    )
    live = (
        rows.filter(~F.col(DELETED_COL))
        .join(t, KEY_COLS, "left")
        .filter(F.col(LSN_COL) > F.coalesce(F.col("__t"), F.lit(-1)))
    )
    payload = F.struct(*VALUE_COLS, F.col(LSN_COL))
    order = F.struct(F.col("ts"), F.col(LSN_COL))
    winners = (
        live.groupBy(*KEY_COLS)
        .agg(F.max_by(payload, order).alias("w"))
        .select(
            *KEY_COLS,
            *[F.col(f"w.{c}").alias(c) for c in VALUE_COLS],
            F.col(f"w.{LSN_COL}").alias(LSN_COL),
            F.lit(False).alias(DELETED_COL),
        )
    )
    tombs = t.select(
        *KEY_COLS,
        *[F.lit(None).cast(d).alias(c) for c, d in
          [("role", "string"), ("text", "string"), ("tool", "string"),
           ("ts", "timestamp")]],
        F.col("__t").alias(LSN_COL),
        F.lit(True).alias(DELETED_COL),
    )
    return winners.unionByName(tombs)


def main() -> None:
    spark = get_spark(
        "spike-hotkey", cores=min(int(os.environ.get("SPARK_GRAFT_CPUS", "8")), 8)
    )
    ev = spark_binlog(
        spark, N_EVENTS, seed=11, n_convs=100, max_turns=50,
        n_hot=1, hot_share=0.5, dup_rate=0.0,
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    src = f"{base}/spike_hotkey_{N_EVENTS}"
    if not os.path.exists(f"{src}/_SUCCESS"):
        ev.write.mode("overwrite").parquet(src)
    raw = spark.read.parquet(src)
    rows = events_as_rows(raw)

    # equality check once (sorted winner sets)
    cols = [*KEY_COLS, LSN_COL, DELETED_COL]
    a = {tuple(r) for r in window_merge(rows).select(*cols).collect()}
    b = {tuple(r) for r in agg_merge(rows).select(*cols).collect()}
    assert a == b, f"formulations disagree: {len(a)} vs {len(b)} rows"

    results = {"window": [], "agg": []}
    for _ in range(REPEATS):
        for name, fn in (("window", window_merge), ("agg", agg_merge)):
            t0 = time.time()
            fn(rows).write.format("noop").mode("overwrite").save()
            results[name].append(round(time.time() - t0, 3))
    report = {
        "events": N_EVENTS,
        "keys": "<=5000 (100 convs x 50 turns), n_hot=1 hot_share=0.5",
        "window_sec": results["window"],
        "agg_sec": results["agg"],
        "window_best": min(results["window"]),
        "agg_best": min(results["agg"]),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
