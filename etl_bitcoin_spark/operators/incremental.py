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
) -> dict[str, Any]:
    """One relay tick: diff the upstream snapshot against the cursor,
    recompute summaries for exactly the changed conversations, and
    replace only the downstream buckets those conversations hash to.
    Conversations whose last turn vanished upstream are dropped.
    Idempotent per upstream-version span; returns the tick summary."""
    up_v = upto_version or upstream.snapshot()["version"]
    last_v = _relay_cursor(downstream)
    if up_v <= last_v:
        return {"applied": False, "reason": "up to date", "cursor": last_v}
    live = upstream.read(version=up_v, user_cols=True)
    snap_d = downstream.snapshot()
    n_buckets = snap_d["n_buckets"]
    bucket_of = downstream.bucket_expr(n_buckets, ["conv_id"])

    changed: list | None = None
    if last_v != 0:
        # Materialize the changed-key set ONCE (it is one tick's churn,
        # small by construction — the collect also caps how much work
        # the joins below can fan out). The change feed would otherwise
        # be recomputed by every consumer of the frame (bucket collect,
        # semi join, anti join).
        changed = [
            (r["conv_id"], int(r["b"]))
            for r in upstream.read_changes(last_v, up_v)
            .select("conv_id")
            .distinct()
            .select("conv_id", bucket_of.alias("b"))
            .collect()
        ]

    stamp = (
        lambda df: df.withColumn(LSN_COL, F.lit(up_v).cast("long"))
        .withColumn(DELETED_COL, F.lit(False))
        .withColumn(BUCKET_COL, bucket_of)
    )
    if changed is None:
        # bootstrap: full rebuild (first tick, or cursor lost to expiry)
        affected = list(range(n_buckets))
        content = stamp(conv_summaries(live))
    else:
        spark = upstream.spark
        keys = F.broadcast(
            spark.createDataFrame(
                [(c,) for c, _ in changed], "conv_id string"
            )
        )
        summaries = conv_summaries(live.join(keys, "conv_id", "semi"))
        affected = sorted({b for _, b in changed})
        # Kept rows keep their ORIGINAL __lsn/__deleted (raw read, no
        # restamp): restamping every co-bucketed row at up_v would make
        # the DOWNSTREAM's own change feed report phantom updates for
        # conversations that never changed, breaking relay chaining.
        kept = downstream.read(
            version=snap_d["version"], buckets=affected
        ).join(keys, "conv_id", "anti")
        content = kept.unionByName(stamp(summaries))

    ok = downstream.commit(
        # partition on the bucket VALUE: one output file per replaced
        # bucket even when `affected` is a sparse subset
        content.repartition(max(1, len(affected)), F.col(BUCKET_COL)),
        affected,
        batch_id=f"relay-{last_v}-{up_v}",
        metrics={"relay_upstream_version": up_v,
                 "relay_from_version": last_v},
        base_version=snap_d["version"],
    )
    return {
        "applied": ok,
        "cursor": up_v,
        "from": last_v,
        "buckets": len(affected),
    }
