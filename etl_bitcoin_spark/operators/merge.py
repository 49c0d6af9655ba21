"""CDC MERGE core: last-writer-wins keyed upsert with tombstones.

The oracle semantics (FIXTURES.md §3) are a sequential replay in ``lsn``
order: I/U upserts a key iff its ``(ts, lsn)`` >= the stored row's; D
always removes the key. Per key this folds to a closed form:

    final(key) = argmax_(ts, lsn) { e : e.op != 'D', e.lsn > last_d_lsn }

where ``last_d_lsn`` is the greatest lsn of any D for the key (-1 if
none). Proof sketch: after the last D the state is empty; among the
following I/U events the (ts,lsn)-max always satisfies the apply
condition when reached and nothing later can beat it.

This closed form composes incrementally across micro-batches **provided
batches are ordered, non-overlapping LSN ranges** (the tailer guarantees
this by consuming whole segments in order; out-of-order delivery within
a segment — the generator's ooo_window — is absorbed because the whole
segment lands in one batch). Under that invariant, merging the stored
winner with a batch summary is exact:

  - a D anywhere in the batch tombstones the stored row (its lsn exceeds
    every stored lsn);
  - the batch's own post-last-D winner then competes with any surviving
    stored row by (ts desc, lsn desc).

Everything below is pure DataFrame ops — two shuffles per batch (one
window over the batch keyed summary, one window over the
stored-union-winner frame), both on the primary key, never on conv_id
alone, so a hot conv_id cannot skew a partition (turn_idx participates
in every hash). Catalyst/AQE handle the physical plan.

Reference analogs: DBTx buffered apply (neo4j_csv.go:84-117), in-batch
dedup set (neo4j_csv.go:97), resume watermark (neo4j_csv.go:62-79).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tableformat.lake import BUCKET_COL, DELETED_COL, LSN_COL, LakeTable

KEY_COLS = ["conv_id", "turn_idx"]
TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
BINLOG_DDL = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
VALUE_COLS = ["role", "text", "tool", "ts"]


def reconcile_schema(df: DataFrame, ddl: str) -> DataFrame:
    """Additive schema reconciliation: project ``df`` onto the columns of
    ``ddl``, backfilling missing columns as typed nulls (the late-added
    ``tool`` column). Extra columns are dropped. Equivalent to
    ``unionByName(allowMissingColumns=True)`` against an empty frame but
    without the union node in the plan."""
    target = {f.name: f.dataType for f in df.sparkSession.createDataFrame([], ddl).schema}
    have = {f.name: f.dataType for f in df.schema}
    cols = []
    for name, dtype in target.items():
        if name in have:
            c = F.col(name)
            if have[name] != dtype:
                c = c.cast(dtype)
            cols.append(c.alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)


def lww_batch_summary(events: DataFrame) -> DataFrame:
    """Collapse a batch of change events to one row per touched key:

    ``d_lsn``     greatest lsn of a D for the key (null if none)
    ``win_*``     the post-last-D LWW winner's values (null if the key
                  ends the batch deleted)

    Single shuffle: both the tombstone max and the winner ranking run as
    windows over the same (conv_id, turn_idx) partitioning.
    """
    w = Window.partitionBy(*KEY_COLS)
    w_rank = w.orderBy(F.col("ts").desc(), F.col("lsn").desc())
    is_d = F.col("op") == F.lit("D")
    df = events.withColumn("d_lsn", F.max(F.when(is_d, F.col("lsn"))).over(w))
    live = ~is_d & (F.col("lsn") > F.coalesce(F.col("d_lsn"), F.lit(-1)))
    df = df.withColumn(
        "rn", F.row_number().over(w_rank.orderBy(
            live.desc(), F.col("ts").desc(), F.col("lsn").desc()))
    )
    # rn=1 per key is either the LWW winner among live rows, or (if no
    # live rows) an arbitrary dead row carrying d_lsn — both are needed.
    top = df.filter(F.col("rn") == 1)
    return top.select(
        *KEY_COLS,
        F.col("d_lsn"),
        *[F.when(live, F.col(c)).alias(f"win_{c}") for c in VALUE_COLS],
        F.when(live, F.col("lsn")).alias("win_lsn"),
    )


def merge_summary_into(stored: DataFrame, summary: DataFrame) -> DataFrame:
    """Merge a batch summary into the stored state of the affected
    buckets. Returns the new full content of those buckets (with LSN_COL
    and DELETED_COL).

    Deletes are the one order-sensitive part of LWW replay, so the lake
    **persists tombstones**: a deleted key keeps a row with
    ``__deleted=true`` and ``__lsn`` = the delete's lsn. A late I/U event
    (lower lsn delivered after the delete) then loses to the tombstone —
    without it, the key would wrongly resurrect. Resolution per key:

    1. ``t`` = max tombstone lsn (stored tombstone vs batch d_lsn);
    2. live candidates = non-deleted rows with lsn > t
       (stored winner + batch winner);
    3. LWW among candidates by (ts desc, lsn desc) — which is
       replay-order-independent for I/U events;
    4. emit the winner (if any) plus the tombstone row (kept so future
       late events keep losing).

    One union + one key-partitioned window: a single shuffle.
    """
    tombs = summary.filter(F.col("d_lsn").isNotNull()).select(
        *KEY_COLS,
        *[F.lit(None).cast(t).alias(c) for c, t in _value_types(stored)],
        F.col("d_lsn").alias(LSN_COL),
        F.lit(True).alias(DELETED_COL),
    )
    winners = summary.filter(F.col("win_lsn").isNotNull()).select(
        *KEY_COLS,
        *[F.col(f"win_{c}").alias(c) for c in VALUE_COLS],
        F.col("win_lsn").alias(LSN_COL),
        F.lit(False).alias(DELETED_COL),
    )
    cols = [*KEY_COLS, *VALUE_COLS, LSN_COL, DELETED_COL]
    unioned = (
        stored.select(*cols).unionByName(tombs.select(*cols)).unionByName(
            winners.select(*cols)
        )
    )
    w = Window.partitionBy(*KEY_COLS)
    t = F.max(F.when(F.col(DELETED_COL), F.col(LSN_COL))).over(w)
    df = unioned.withColumn("__t", t)
    live = ~F.col(DELETED_COL) & (
        F.col(LSN_COL) > F.coalesce(F.col("__t"), F.lit(-1))
    )
    w_rank = w.orderBy(
        live.desc(), F.col("ts").desc(), F.col(LSN_COL).desc()
    )
    df = df.withColumn("__rn", F.row_number().over(w_rank))
    keep_winner = live & (F.col("__rn") == 1)
    keep_tomb = F.col(DELETED_COL) & (F.col(LSN_COL) == F.col("__t"))
    # dedupe identical tombstones (stored + batch agreeing on the same t)
    w_tomb = w.orderBy(F.col(DELETED_COL).desc(), F.col(LSN_COL).desc())
    df = df.withColumn("__rt", F.row_number().over(w_tomb))
    keep_tomb = keep_tomb & (F.col("__rt") == 1)
    return df.filter(keep_winner | keep_tomb).drop("__t", "__rn", "__rt")


def _value_types(stored: DataFrame) -> list[tuple[str, str]]:
    by_name = {f.name: f.dataType.simpleString() for f in stored.schema}
    return [(c, by_name[c]) for c in VALUE_COLS]


def apply_batch(
    lake: LakeTable,
    events: DataFrame,
    batch_id: str,
    already_applied_filter=None,
) -> dict[str, Any]:
    """Apply one micro-batch of change events to the lake table.

    Steps: exactly-once guards (batch_id replay -> no-op; HWM + exact
    range dedup on lsn; in-batch duplicate drop), batch LWW summary,
    bucket-pruned read of affected stored state, tombstone+LWW merge,
    atomic bucket-replacing commit carrying lineage.
    """
    snap = lake.snapshot()
    if batch_id in snap["applied_batch_ids"]:
        return {"applied": False, "reason": "duplicate batch_id"}
    n_buckets = snap["n_buckets"]
    hwm = snap["lineage"]["hwm"]

    ev = reconcile_schema(events, BINLOG_DDL)
    if already_applied_filter is not None:
        # Exact guard (HWM fast-path + Bloom + applied-range membership):
        # late batches survive, true duplicates die.
        ev = already_applied_filter(ev)
    else:
        # Ordered-replay fast path: batches are guaranteed ordered LSN
        # ranges, so everything at or below the HWM is a duplicate.
        ev = ev.filter(F.col("lsn") > F.lit(hwm))
    ev = ev.dropDuplicates(["lsn"]).cache()
    try:
        rng = ev.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi"),
            F.count("*").alias("n"),
        ).collect()[0]
        if rng["n"] == 0:
            lake.commit(
                lake.read(buckets=[]).limit(0).withColumn(
                    BUCKET_COL, F.lit(0).cast("int")),
                [], batch_id, None, {"events": 0},
            )
            return {"applied": True, "events": 0}

        summary = ev.transform(lww_batch_summary).withColumn(
            BUCKET_COL, lake.bucket_expr(n_buckets, KEY_COLS)
        ).cache()
        affected = [
            r[BUCKET_COL]
            for r in summary.select(BUCKET_COL).distinct().collect()
        ]
        stored = lake.read(buckets=affected)
        merged = merge_summary_into(stored, summary).withColumn(
            BUCKET_COL, lake.bucket_expr(n_buckets, KEY_COLS)
        )
        ok = lake.commit(
            merged,
            affected,
            batch_id,
            lsn_range=(rng["lo"], rng["hi"]),
            metrics={"events": rng["n"], "buckets_touched": len(affected)},
        )
        return {
            "applied": ok,
            "events": rng["n"],
            "lsn_range": [rng["lo"], rng["hi"]],
            "buckets": affected,
        }
    finally:
        ev.unpersist()


def replay(
    lake: LakeTable,
    binlog: DataFrame,
    batch_lsn_width: int | None = None,
    batch_id_prefix: str = "replay",
) -> list[dict[str, Any]]:
    """Batch replay of a whole binlog: split into ordered LSN-range
    micro-batches and apply each. ``batch_lsn_width=None`` applies the
    whole log as one batch (the fastest path for backfills — one pair of
    shuffles total)."""
    results = []
    if batch_lsn_width is None:
        return [apply_batch(lake, binlog, f"{batch_id_prefix}-all")]
    bounds = binlog.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    lo, hi = bounds[0], bounds[1]
    if lo is None:
        return results
    start = lo
    i = 0
    while start <= hi:
        end = start + batch_lsn_width - 1
        chunk = binlog.filter(
            (F.col("lsn") >= start) & (F.col("lsn") <= end)
        )
        results.append(
            apply_batch(lake, chunk, f"{batch_id_prefix}-{i:06d}")
        )
        start = end + 1
        i += 1
    return results
