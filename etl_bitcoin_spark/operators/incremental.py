"""Incremental derived-table maintenance over the change feed.

The downstream half of the CDC story: a derived table (here, a per-
conversation rollup of the transcripts lake) kept current by
recomputing ONLY the keys the change feed names — the incremental
materialized-view pattern (Delta CDF -> MERGE propagation), built on
this engine's own primitives (``read_changes`` version diff +
bucket-pruned reads + idempotent replace commits).

The general machinery lives in ``operators.views`` (declare a
``ViewSpec``, get full-recompute and algebraic maintenance derived from
the one definition); this module pins the conversation-summary instance
and its original API.

At 100 TB the point is the asymmetry on the WRITE side: a tick that
touched 0.1% of the conversations reads the change feed (bucket-pruned
by manifest pointer diff) and rewrites only the downstream buckets
those keys hash to. In ``mode="algebraic"`` the upstream is not
scanned at all except for max-regression fallbacks; in
``mode="recompute"`` the upstream recompute is a column-pruned scan
filtered by the broadcast key set — upstream buckets hash on
(conv_id, turn_idx), so conversation-level file pruning is not
available there (accepted tradeoff of the recompute mode).

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

from ..tableformat.lake import LakeTable
from .views import ViewSpec, create_view_table, full_compute, refresh_view

CONV_SUMMARY_SPEC = ViewSpec(
    "conv_summaries",
    "conv_id string",
    {
        "n_turns": ("count", "int"),
        "n_tool_turns": ("sum", "CAST(tool IS NOT NULL AS INT)", "int"),
        "last_ts": ("max", "ts", "timestamp"),
        "total_chars": ("sum", "length(coalesce(text, ''))", "long"),
    },
    key_is_upstream_key=True,
)

CONV_SUMMARY_DDL = CONV_SUMMARY_SPEC.ddl


def create_conv_summary_table(
    spark: SparkSession, root: str, n_buckets: int = 16
) -> LakeTable:
    return create_view_table(spark, root, CONV_SUMMARY_SPEC, n_buckets)


def conv_summaries(transcripts: DataFrame) -> DataFrame:
    """The projection itself: per-conversation rollup of live turns.
    Pure — used identically by the full rebuild and the incremental
    path (one definition, so they cannot drift)."""
    return full_compute(CONV_SUMMARY_SPEC, transcripts)


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
    """One relay tick of the conversation-summary view (see
    ``operators.views.refresh_view`` for the algebra and modes)."""
    res = refresh_view(
        upstream, downstream, CONV_SUMMARY_SPEC,
        upto_version=upto_version, mode=mode,
    )
    if "fallback_groups" in res:
        res["fallback_convs"] = res.pop("fallback_groups")
    return res
