"""Incremental derived-table maintenance over the change feed.

The downstream half of the CDC story: a derived table (a per-
conversation rollup of the transcripts lake) kept current by
recomputing ONLY the keys the change feed names — the incremental
materialized-view pattern (Delta CDF -> MERGE propagation), built on
this engine's own primitives (``read_changes`` version diff +
bucket-pruned reads + idempotent replace commits).

At 100 TB the point is the asymmetry on the WRITE side: a tick that
touched 0.1% of the conversations reads the change feed (bucket-pruned
by manifest pointer diff) and rewrites only the downstream buckets
those keys hash to. The upstream recompute is a column-pruned scan
filtered by the broadcast key set — upstream buckets hash on
(conv_id, turn_idx), so conversation-level file pruning is not
available there (a conv-clustered layout would make it sublinear;
accepted tradeoff, the scan is projection-narrow and shuffle-free).

Exactly-once: the downstream commit's batch id is derived from the
upstream version span, so a crashed-and-replayed tick is a metadata
no-op, and the relay cursor (last propagated upstream version) rides
the downstream snapshot's metrics — no side state to lose.

Retention contract (the standard CDF constraint): the upstream's
``expire_snapshots`` keep-window must cover the relay lag — diffing
from an expired version raises; recover by re-bootstrapping the
downstream (drop + full rebuild tick).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tableformat.lake import BUCKET_COL, DELETED_COL, LSN_COL, LakeTable

CONV_SUMMARY_DDL = (
    "conv_id string, n_turns int, n_tool_turns int, last_ts timestamp, "
    "total_chars long"
)


def create_conv_summary_table(
    spark: SparkSession, root: str, n_buckets: int = 16
) -> LakeTable:
    return LakeTable.create(
        spark, root, CONV_SUMMARY_DDL, ["conv_id"], n_buckets
    )


def conv_summaries(transcripts: DataFrame) -> DataFrame:
    """The projection itself: per-conversation rollup of live turns.
    Pure — used identically by the full rebuild and the incremental
    path (one definition, so they cannot drift)."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").cast("int").alias("n_turns"),
        F.sum(F.col("tool").isNotNull().cast("int"))
        .cast("int")
        .alias("n_tool_turns"),
        F.max("ts").alias("last_ts"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("total_chars"),
    )


def _relay_cursor(downstream: LakeTable) -> int:
    """Last upstream version this downstream has absorbed (0 = never).
    Walks back from the latest snapshot to the most recent relay
    commit — bounded by the commits since (maintenance commits on the
    downstream are the only interleavers). If expiry removed the chain
    below the latest snapshot before reaching a relay commit, the
    cursor is lost — return 0 so the next tick re-bootstraps (full
    rebuild) instead of crashing."""
    v = downstream.snapshot()["version"]
    while v >= 1:
        try:
            m = downstream.snapshot(v)
        except FileNotFoundError:
            return 0
        got = (m.get("metrics") or {}).get("relay_upstream_version")
        if got is not None:
            return int(got)
        v = m.get("parent") or 0
    return 0


def refresh_conv_summaries(
    upstream: LakeTable,
    downstream: LakeTable,
    upto_version: int | None = None,
    mode: str = "recompute",
) -> dict[str, Any]:
    """One relay tick: diff the upstream snapshot against the cursor,
    refresh exactly the changed conversations, and replace only the
    downstream buckets those conversations hash to. Conversations whose
    last turn vanished upstream are dropped. Idempotent per
    upstream-version span; returns the tick summary.

    ``mode="recompute"`` rebuilds changed conversations from the
    upstream state (one filtered column-pruned upstream scan per tick).
    ``mode="algebraic"`` maintains the invertible aggregates (counts,
    sums) purely from the PREIMAGE change feed — delta arithmetic, NO
    upstream scan — and falls back to per-conversation recompute only
    where a removed row may have held the non-invertible max
    (``last_ts``): the sublinear path for the append-mostly norm, where
    fallbacks are empty and a tick never touches upstream data at all."""
    if mode not in ("recompute", "algebraic"):
        raise ValueError(f"unknown refresh mode {mode!r}")
    up_v = upto_version or upstream.snapshot()["version"]
    last_v = _relay_cursor(downstream)
    if up_v <= last_v:
        return {"applied": False, "reason": "up to date", "cursor": last_v}
    snap_d = downstream.snapshot()
    n_buckets = snap_d["n_buckets"]
    bucket_of = downstream.bucket_expr(n_buckets, ["conv_id"])
    spark = upstream.spark

    stamp = (
        lambda df: df.withColumn(LSN_COL, F.lit(up_v).cast("long"))
        .withColumn(DELETED_COL, F.lit(False))
        .withColumn(BUCKET_COL, bucket_of)
    )
    n_fallback = 0
    if last_v == 0:
        # bootstrap: full rebuild (first tick, or cursor lost to expiry)
        affected = list(range(n_buckets))
        content = stamp(
            conv_summaries(upstream.read(version=up_v, user_cols=True))
        )
    else:
        # Materialize the per-conversation tick deltas ONCE (one tick's
        # churn, small by construction — the collect also caps how much
        # work the joins below can fan out; the feed would otherwise be
        # recomputed by every downstream consumer of the frame).
        pre = F.col("_change_type").isin("update_preimage", "delete")
        post = F.col("_change_type").isin("update_postimage", "insert")
        sgn = F.when(post, 1).otherwise(-1)
        chars = F.length(F.coalesce(F.col("text"), F.lit("")))
        tool = F.col("tool").isNotNull().cast("int")
        deltas = {
            r["conv_id"]: r
            for r in upstream.read_changes(
                last_v, up_v, include_preimages=True
            )
            .groupBy("conv_id")
            .agg(
                F.sum(sgn).cast("int").alias("dn"),
                F.sum(sgn * chars).cast("long").alias("dc"),
                F.sum(sgn * tool).cast("int").alias("dt"),
                F.max(F.when(post, F.col("ts"))).alias("amax"),
                F.max(F.when(pre, F.col("ts"))).alias("rmax"),
            )
            .withColumn("b", bucket_of)
            .collect()
        }
        affected = sorted({int(r["b"]) for r in deltas.values()})
        keys = F.broadcast(
            spark.createDataFrame(
                [(c,) for c in deltas], "conv_id string"
            )
        )
        # Kept rows keep their ORIGINAL __lsn/__deleted (raw read, no
        # restamp): restamping every co-bucketed row at up_v would make
        # the DOWNSTREAM's own change feed report phantom updates for
        # conversations that never changed, breaking relay chaining.
        kept = downstream.read(
            version=snap_d["version"], buckets=affected
        ).join(keys, "conv_id", "anti")

        if mode == "recompute":
            live = upstream.read(version=up_v, user_cols=True)
            summaries = conv_summaries(live.join(keys, "conv_id", "semi"))
        else:
            cur = {
                r.conv_id: r
                for r in downstream.read(
                    version=snap_d["version"], buckets=affected,
                    user_cols=True,
                )
                .join(keys, "conv_id", "semi")
                .collect()
            }
            rows, fallback = [], []
            for c, d in deltas.items():
                old = cur.get(c)
                n = (old.n_turns if old else 0) + d["dn"]
                if n <= 0:
                    continue  # conversation fully deleted
                cur_last = old.last_ts if old else None
                amax, rmax = d["amax"], d["rmax"]
                if cur_last is None or (
                    amax is not None and amax >= cur_last
                ):
                    last = amax  # a new row holds (or ties) the max
                elif rmax is None or rmax < cur_last:
                    last = cur_last  # the max row was not removed
                else:
                    # a removed row tied the current max and nothing
                    # added reaches it: max may regress — recompute
                    fallback.append(c)
                    continue
                rows.append((
                    c, n,
                    (old.n_tool_turns if old else 0) + d["dt"],
                    last,
                    (old.total_chars if old else 0) + d["dc"],
                ))
            summaries = spark.createDataFrame(rows, CONV_SUMMARY_DDL)
            n_fallback = len(fallback)
            if fallback:
                fb = F.broadcast(
                    spark.createDataFrame(
                        [(c,) for c in fallback], "conv_id string"
                    )
                )
                live = upstream.read(version=up_v, user_cols=True)
                summaries = summaries.unionByName(
                    conv_summaries(live.join(fb, "conv_id", "semi"))
                )
        content = kept.unionByName(stamp(summaries))

    ok = downstream.commit(
        # partition on the bucket VALUE: one output file per replaced
        # bucket even when `affected` is a sparse subset
        content.repartition(max(1, len(affected)), F.col(BUCKET_COL)),
        affected,
        batch_id=f"relay-{last_v}-{up_v}",
        metrics={"relay_upstream_version": up_v,
                 "relay_from_version": last_v,
                 "relay_mode": mode},
        base_version=snap_d["version"],
    )
    return {
        "applied": ok,
        "cursor": up_v,
        "from": last_v,
        "buckets": len(affected),
        "fallback_convs": n_fallback,
    }
