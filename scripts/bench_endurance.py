"""Endurance replay toward the 10^10 north rule (VERDICT r4 #1).

Applies >=10^9 generated change events (distributed generator, no driver
materialization, no on-disk WAL — each batch is a spark.range slice
whose column derivation fuses into the apply job's scan) to a
4096-bucket LakeTable through the merge-on-read RAW delta plan — the
streaming steady-state path — with the full maintenance loop riding
along: policy compaction (deltas folded past 8/bucket), periodic
snapshot expiry + orphan GC (disk stays bounded), and batch-marker
ledger retention churn.

What it substantiates (the claims only small-scale tests had proven):
  * sustained events/sec at 10^9 scale on the executor ladder's high
    level (local-cluster[4,2]);
  * driver-memory flatness across hundreds of commits (RSS sampled
    every batch for the python driver and its JVM child);
  * manifest/commit wall-time flatness — the O(changed-buckets) commit
    claim (lake.py:15-30): per-batch apply wall and the manifest
    publish+pointer-merge segment (LakeTable.commit instrumented via a
    wrapper) compared batch 1 vs batch N while total table
    state/version count grows 64x.

Writes BENCH/endurance.json + BENCH/endurance.md.

Env: ENDUR_EVENTS (default 1_024_000_000), ENDUR_BATCH (16_000_000),
SPARK_GRAFT_MASTER (default local-cluster[4,2,8192]).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOTAL = int(os.environ.get("ENDUR_EVENTS", str(1_024_000_000)))
BATCH = int(os.environ.get("ENDUR_BATCH", str(16_000_000)))
N_BUCKETS = int(os.environ.get("ENDUR_BUCKETS", "4096"))
MAINT_EVERY = int(os.environ.get("ENDUR_MAINT_EVERY", "8"))
SEED = 42
# keyspace ~1e8 (2M convs x 50 turns): per-batch multiplicity ~1 (the
# raw plan's regime) while the RUN-level multiplicity is ~10 — cross-
# batch updates keep compaction honest (it actually folds).
N_CONVS = int(os.environ.get("ENDUR_CONVS", str(2_000_000)))
# ENDUR_PATCH=1 runs the CELL-LWW path: the table is created with
# patch_cols=['role','text','tool'], U events drop role when lsn%2==0
# and tool when lsn%3==0 (partial images), and the run ends with a
# per-key oracle probe: regenerate ALL events of a few sampled convs
# from the deterministic generator, cell-fold them in python, and
# compare against the lake's resolved rows — end-to-end correctness
# evidence at volume, not just throughput.
PATCH = os.environ.get("ENDUR_PATCH") == "1"


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return 0.0


def _jvm_children(pid: int) -> list[int]:
    out = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) == pid and "java" in parts[1]:
                out.append(int(p))
        except (OSError, IndexError, ValueError):
            continue
    return out


def _patch_probe(spark, lake, _patchify, derive_binlog_columns) -> dict:
    """Per-key oracle probe for PATCH runs: regenerate the sampled
    convs' full event histories and cell-fold them with an INDEPENDENT
    python fold — distributed per key via applyInPandas (a hot conv can
    carry 10^7+ events; collecting raw rows blew the driver's
    maxResultSize on the first 512M run), collecting only the ~10^2
    folded rows."""
    from pyspark.sql import functions as F

    some = [
        r["conv_id"]
        for r in lake.read(user_cols=True).select("conv_id")
        .distinct().orderBy("conv_id").limit(3).collect()
    ]
    evs = _patchify(derive_binlog_columns(
        spark.range(0, TOTAL, 1, 256), TOTAL, seed=SEED,
        n_convs=N_CONVS, max_turns=50, hot_share=0.2,
    )).filter(F.col("conv_id").isin(some))

    def _fold(pdf):
        import pandas as pd

        d = pdf.loc[pdf["op"] == "D", "lsn"].max()
        d = -1 if pd.isna(d) else int(d)
        live = pdf[(pdf["op"] != "D") & (pdf["lsn"] > d)]
        if live.empty:
            return pd.DataFrame(
                columns=["conv_id", "turn_idx", "role", "text", "tool"]
            )
        out = {"conv_id": pdf["conv_id"].iloc[0],
               "turn_idx": pdf["turn_idx"].iloc[0]}
        for c in ("role", "text", "tool"):
            w = live[(live["op"] == "I") | live[c].notna()]
            if w.empty:
                out[c] = None
            else:
                top = w.sort_values(["ts", "lsn"]).iloc[-1]
                out[c] = top[c] if pd.notna(top[c]) else None
        return pd.DataFrame([out])

    want_rows = evs.groupBy("conv_id", "turn_idx").applyInPandas(
        _fold,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string",
    ).collect()
    want = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in want_rows
    }
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in lake.read(user_cols=True)
        .filter(F.col("conv_id").isin(some)).collect()
    }
    return {
        "convs": some,
        "keys": len(want),
        "match": got == want,
        "mismatches": (
            [] if got == want else
            sorted(set(got.items()) ^ set(want.items()))[:6]
        ),
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_MASTER", "local-cluster[4,2,8192]")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

    from etl_bitcoin_spark.gen.binlog_spark import derive_binlog_columns
    from etl_bitcoin_spark.operators.merge import (
        KEY_COLS, TRANSCRIPTS_DDL, apply_batch,
    )
    from etl_bitcoin_spark.session import get_spark
    from etl_bitcoin_spark.tableformat import LakeTable

    # Shuffle partitions sized for MEMORY, not cores: the periodic
    # delta fold resolves a whole maintenance window (~128M rows,
    # ~30 GB of text) through one sort — at the 2x-cores default (16)
    # that is ~4 GB per sort task and the 8 GB executors OOM (observed:
    # exit 52 at the first fold). 256 partitions keep sort tasks at
    # ~500 MB; the raw apply path is unaffected (its shard width rides
    # defaultParallelism, not this conf).
    spark = get_spark(
        "endurance", cores=8,
        shuffle_partitions=int(os.environ.get("ENDUR_SHUFFLE", "256")),
    )
    lake_dir = os.environ.get("ENDUR_DIR", "/tmp/endurance_lake")
    import shutil

    shutil.rmtree(lake_dir, ignore_errors=True)
    lake = LakeTable.create(
        spark, lake_dir, TRANSCRIPTS_DDL, KEY_COLS, N_BUCKETS,
        patch_cols=(["role", "text", "tool"] if PATCH else None),
    )

    def _patchify(ev):
        from pyspark.sql import functions as F

        u = F.col("op") == F.lit("U")
        return ev.withColumn(
            "role",
            F.when(u & (F.col("lsn") % 2 == 0),
                   F.lit(None).cast("string")).otherwise(F.col("role")),
        ).withColumn(
            "tool",
            F.when(u & (F.col("lsn") % 3 == 0),
                   F.lit(None).cast("string")).otherwise(F.col("tool")),
        )

    me = os.getpid()
    n_batches = (TOTAL + BATCH - 1) // BATCH
    batches: list[dict] = []
    t_run0 = time.time()
    applied_total = 0
    stat = os.statvfs("/tmp")
    disk_free0 = stat.f_bavail * stat.f_frsize / 1e9

    for i in range(n_batches):
        lo, hi = i * BATCH, min((i + 1) * BATCH, TOTAL)
        ev = derive_binlog_columns(
            spark.range(lo, hi, 1, 32), TOTAL, seed=SEED,
            n_convs=N_CONVS, max_turns=50, hot_share=0.2,
        )
        if PATCH:
            ev = _patchify(ev)
        t0 = time.time()
        r = apply_batch(
            lake, ev, f"endur-{i:06d}",
            lsn_range_hint=(lo, hi - 1),
            merge_mode="read", delta_plan="raw",
        )
        t_apply = time.time() - t0
        applied_total += r.get("events", 0)
        rec = {
            "batch": i, "events": r.get("events", 0),
            "apply_sec": round(t_apply, 2),
            "eps": round(r.get("events", 0) / t_apply, 0),
            "commit": dict(getattr(lake, "last_commit_stats", {})),
            "rss_py_mb": _rss_mb(me),
            "rss_jvm_mb": max(
                [_rss_mb(p) for p in _jvm_children(me)] or [0]
            ),
            "version": lake.snapshot()["version"],
        }
        if (i + 1) % MAINT_EVERY == 0:
            t0 = time.time()
            # Bound 6 < MAINT_EVERY=8 on purpose: a bound EQUAL to the
            # cadence leaves every bucket exactly AT the policy each
            # pass (8 deltas > 8 is false), so the first fold silently
            # slips a full window and the next one folds a double-size
            # window (observed: 256M-row fold -> executor OOM).
            # ENDUR_COMPACT_BUCKETS caps each pass at the worst-N
            # victim buckets (nibble mode): per-cycle compaction wall
            # stays bounded as total state grows — the r6 endurance's
            # named cost center (uncapped full-table folds grew
            # 248→484 s with base size, 3,440 s of the 5,120 s wall).
            _cb = os.environ.get("ENDUR_COMPACT_BUCKETS")
            c = lake.compact_deltas(
                int(os.environ.get("ENDUR_COMPACT_DELTAS", "6")),
                max_buckets=int(_cb) if _cb else None,
            )
            rec["compact_sec"] = round(time.time() - t0, 2)
            rec["compacted_buckets"] = c.get("buckets_compacted", 0)
            t0 = time.time()
            e = lake.expire_snapshots(
                keep_last=2, orphan_grace_sec=600,
                batch_marker_retention_sec=3600,
            )
            rec["expire_sec"] = round(time.time() - t0, 2)
            rec["expired"] = e
            stat = os.statvfs("/tmp")
            rec["disk_used_gb"] = round(
                disk_free0 - stat.f_bavail * stat.f_frsize / 1e9, 1
            )
        batches.append(rec)
        print(json.dumps(rec), flush=True)

    wall = time.time() - t_run0
    lin = lake.lineage()

    patch_probe = None
    if PATCH:
        # end-of-run oracle probe (see PATCH note above): sampled convs,
        # full per-key event history regenerated from the deterministic
        # generator, python cell-LWW fold vs the lake's resolved rows
        from pyspark.sql import functions as F

        patch_probe = _patch_probe(
            spark, lake, _patchify, derive_binlog_columns
        )
        print(json.dumps({"patch_probe": patch_probe}), flush=True)
        assert patch_probe["match"], (
            "patched endurance state != python cell oracle"
        )
    apply_secs = [b["apply_sec"] for b in batches]
    meta_all = [b["commit"].get("meta_sec") for b in batches
                if b["commit"].get("meta_sec") is not None]
    k = max(4, n_batches // 8)
    head = meta_all[:k]
    tail = meta_all[-k:]

    def pct(xs, q):
        if not xs:
            return None
        xs = sorted(xs)
        return round(xs[min(len(xs) - 1, int(q * len(xs)))], 3)

    report = {
        "events_total": TOTAL,
        "events_applied": applied_total,
        "wall_sec": round(wall, 1),
        "sustained_eps": round(applied_total / wall, 0),
        "n_batches": n_batches,
        "n_buckets": N_BUCKETS,
        "patch": PATCH,
        "patch_probe": patch_probe,
        "master": os.environ["SPARK_GRAFT_MASTER"],
        "applied_ranges": lin["applied_ranges"],
        "rows_total": lin["rows_total"],
        "apply_sec_first4": apply_secs[:4],
        "apply_sec_last4": apply_secs[-4:],
        "commit_meta_sec_head": {
            "p50": pct(head, 0.5), "p99": pct(head, 0.99)},
        "commit_meta_sec_tail": {
            "p50": pct(tail, 0.5), "p99": pct(tail, 0.99)},
        "commit_meta_sec_all": {
            "p50": pct(meta_all, 0.5), "p99": pct(meta_all, 0.99)},
        "rss_py_mb_max": max(b["rss_py_mb"] for b in batches),
        "rss_jvm_mb_first": batches[0]["rss_jvm_mb"],
        "rss_jvm_mb_max": max(b["rss_jvm_mb"] for b in batches),
        "rss_py_mb_series_every8": [
            b["rss_py_mb"] for b in batches[::MAINT_EVERY]
        ],
        "rss_jvm_mb_series_every8": [
            b["rss_jvm_mb"] for b in batches[::MAINT_EVERY]
        ],
        "disk_used_gb_series": [
            b.get("disk_used_gb") for b in batches if "disk_used_gb" in b
        ],
        "compact_secs": [
            b["compact_sec"] for b in batches if "compact_sec" in b
        ],
        "expire_secs": [
            b["expire_sec"] for b in batches if "expire_sec" in b
        ],
        "batches": batches,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    suffix = "_patch" if PATCH else ""
    with open(
        os.path.join(REPO, "BENCH", f"endurance{suffix}.json"), "w"
    ) as f:
        json.dump(report, f, indent=1)

    apply_eps = [b["eps"] for b in batches]
    md = f"""# Endurance replay — {TOTAL:,} change events (north rule: 10^10)

{n_batches} ordered batches of {BATCH:,} generated change events (distributed
generator, no driver materialization) applied through the merge-on-read RAW
delta plan to a fresh {N_BUCKETS}-bucket LakeTable on `{report['master']}`
(the executor ladder's high level), with the full maintenance loop riding
along every {MAINT_EVERY} batches: policy delta compaction, snapshot expiry
(keep_last=2) + orphan GC, batch-marker ledger retention.

| metric | value |
|---|---|
| events applied (lineage-exact) | {applied_total:,} |
| applied_ranges | {lin['applied_ranges']} |
| final table rows | {lin['rows_total']:,} |
| wall (incl. maintenance) | {report['wall_sec']:,} s |
| sustained events/s (end-to-end) | {report['sustained_eps']:,} |
| apply events/s (median of batches) | {statistics.median(apply_eps):,.0f} |
| apply sec first 4 / last 4 batches | {report['apply_sec_first4']} / {report['apply_sec_last4']} |
| commit METADATA p50/p99, first {k} batches | {report['commit_meta_sec_head']['p50']} / {report['commit_meta_sec_head']['p99']} s |
| commit METADATA p50/p99, last {k} batches | {report['commit_meta_sec_tail']['p50']} / {report['commit_meta_sec_tail']['p99']} s |
| driver python RSS max | {report['rss_py_mb_max']} MB |
| driver JVM RSS first/max | {report['rss_jvm_mb_first']} / {report['rss_jvm_mb_max']} MB |
| compaction passes (sec) | {report['compact_secs']} |
| expiry passes (sec) | {report['expire_secs']} |
| disk used over run (GB, sampled) | {report['disk_used_gb_series']} |

Reading it: the O(changed-buckets) manifest claim (lake.py module
docstring) is the head-vs-tail commit-metadata row — the table's
version count and total state grow ~{max(1, n_batches)}x across the run while the
metadata phase per commit stays flat. Driver RSS flatness across the
full run bounds per-commit driver state (snapshot cache + ledger).
Lineage is exact: `applied_ranges` collapsing to one dense span is the
end-to-end exactly-once evidence at this scale. Reproduce:
`python scripts/bench_endurance.py` (env: ENDUR_EVENTS, ENDUR_BATCH,
ENDUR_BUCKETS, ENDUR_MAINT_EVERY, ENDUR_SHUFFLE, ENDUR_COMPACT_DELTAS,
SPARK_GRAFT_MASTER).
"""
    with open(
        os.path.join(REPO, "BENCH", f"endurance{suffix}.md"), "w"
    ) as f:
        f.write(md)
    print(json.dumps({k: v for k, v in report.items() if k != "batches"}))
    spark.stop()


if __name__ == "__main__":
    main()
