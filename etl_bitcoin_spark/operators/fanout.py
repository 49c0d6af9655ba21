"""One-pass multi-table fan-out pipeline (the reference's core dataflow).

The reference explodes each ingested batch into 4 node + 6 relationship
tables inside one DBTx (reference database/csv/neo4j_csv/neo4j_csv.go:
122-155: AddBlockHeader -> blocks/chain/coinbase rows, AddTransaction ->
transactions/outputs/addresses + include/in/out/locked edges), committed
together (neo4j_csv.go:103-117). This is the engine-level equivalent
over the transcripts domain: ONE pass over a change-event batch fans
into

- ``turns``   — event-level node rows (the payload table)
- ``convs``   — distinct conversation nodes (the in-batch dedup set,
                reference's address set, neo4j_csv.go:97)
- ``edges``   — conv -> turn edge list with a synthesized key
                (reference's outputID = txid+"_"+n, nodes.go:72; NB the
                reference's in-edge start key concatenates WITHOUT a
                separator, relationships.go:77 — a quirk this engine
                deliberately normalizes to the separator form, because
                the unseparated form is ambiguous: ("a_1", 2) and
                ("a", 12) collide)
- ``lineage`` — per-batch metrics rows (events, ops breakdown)

All four land in ONE LakeCatalog transaction: a crash between table
writes leaves readers on the previous snapshot of every table, which the
reference's per-file worker fan-out cannot guarantee.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tableformat.catalog import LakeCatalog
from ..tableformat.lake import BUCKET_COL, LSN_COL

TURNS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, lsn long, op string"
)
CONVS_DDL = "conv_id string, first_lsn long, n_events long"
EDGES_DDL = "edge_id string, conv_id string, turn_idx int, lsn long"
LINEAGE_DDL = (
    "batch_id string, events long, n_insert long, n_update long, "
    "n_delete long, lsn_lo long, lsn_hi long"
)


def create_fanout_tables(catalog: LakeCatalog, n_buckets: int = 8) -> None:
    catalog.create_table("turns", TURNS_DDL, ["conv_id", "turn_idx"], n_buckets)
    catalog.create_table("convs", CONVS_DDL, ["conv_id"], n_buckets)
    catalog.create_table("edges", EDGES_DDL, ["edge_id"], n_buckets)
    catalog.create_table("lineage", LINEAGE_DDL, ["batch_id"], 1)


def fanout_frames(events: DataFrame, batch_id: str) -> dict[str, DataFrame]:
    """The pure one-pass fan-out transforms (reference neo4j_csv.go:
    122-155: one input record -> rows in N normalized tables), shared by
    the catalog pipeline and the oracle-gated query. All four frames are
    deterministic (edge dedup via groupBy+min, never an arbitrary-row
    dropDuplicates)."""
    ev = events
    return {
        "turns": ev.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
            F.col("lsn"), "op",
        ),
        "convs": ev.groupBy("conv_id").agg(
            F.min("lsn").alias("first_lsn"), F.count("*").alias("n_events")
        ),
        "edges": ev.groupBy("conv_id", "turn_idx")
        .agg(F.min("lsn").alias("lsn"))
        .select(
            F.concat_ws(
                "_", "conv_id", F.col("turn_idx").cast("string")
            ).alias("edge_id"),
            "conv_id", "turn_idx", "lsn",
        ),
        "lineage": ev.agg(
            F.lit(batch_id).alias("batch_id"),
            F.count("*").alias("events"),
            F.sum((F.col("op") == "I").cast("long")).alias("n_insert"),
            F.sum((F.col("op") == "U").cast("long")).alias("n_update"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_delete"),
            F.min("lsn").alias("lsn_lo"),
            F.max("lsn").alias("lsn_hi"),
        ),
    }


def cached_fanout_frames(
    events: DataFrame, batch_id: str
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Reconcile + CACHE the batch, then build the four fan-out frames
    on the cached relation: the input is scanned ONCE (materialized into
    the block store by the first write), the other three table writes
    read the InMemoryRelation — an arbitrary foreachBatch DataFrame gets
    no file-source scan sharing otherwise, so without the cache each
    write re-scanned the batch (~4x input reads per micro-batch). The
    caller must unpersist the returned cached frame."""
    from .merge import BINLOG_DDL, reconcile_schema

    cached = reconcile_schema(events, BINLOG_DDL).cache()
    return cached, fanout_frames(cached, batch_id)


def fanout_batch(
    catalog: LakeCatalog, events: DataFrame, batch_id: str
) -> dict[str, Any]:
    """Fan one change-event batch into turns/convs/edges/lineage in one
    atomic catalog transaction, scanning the input ONCE (cached batch —
    see cached_fanout_frames); no driver-side materialization anywhere.
    Additive schema evolution applies here exactly as in the merge path:
    v1 events (pre-``tool``) are reconciled with null backfill."""
    events, frames = cached_fanout_frames(events, batch_id)
    turns, convs, edges, lineage = (
        frames["turns"], frames["convs"], frames["edges"], frames["lineage"]
    )

    def prep(name: str, df: DataFrame, key_cols: list[str]):
        t = catalog.table(name)
        n = t.snapshot()["n_buckets"]
        content = (
            df.withColumn(LSN_COL, F.col("lsn") if "lsn" in df.columns else F.lit(0).cast("long"))
            .withColumn("__deleted", F.lit(False))
            .withColumn(BUCKET_COL, t.bucket_expr(n, key_cols))
        )
        # Fast append (metadata-only file-list merge): fan-out tables are
        # append-mostly event logs, exactly like the reference's CSV
        # appends (csv_file.go:57-74) — dedup is in-batch only
        # (neo4j_csv.go:97), duplicates across batches are the consumer's
        # MERGE problem, faithfully preserved here.
        return {
            "new_content": content,
            "replaced_buckets": [],
            "lsn_range": None,
            "metrics": {"fanout": True},
            "mode": "append",
        }

    writes = {
        "turns": prep("turns", turns, ["conv_id", "turn_idx"]),
        "convs": prep(
            "convs",
            convs.withColumn("lsn", F.col("first_lsn")),
            ["conv_id"],
        ),
        "edges": prep("edges", edges, ["edge_id"]),
        "lineage": prep(
            "lineage", lineage.withColumn("lsn", F.col("lsn_hi")), ["batch_id"]
        ),
    }
    # drop the helper lsn column from frames where it is not part of the DDL
    writes["convs"]["new_content"] = writes["convs"]["new_content"].drop("lsn")
    writes["lineage"]["new_content"] = writes["lineage"]["new_content"].drop("lsn")
    try:
        applied = catalog.commit_multi(writes, batch_id)
    finally:
        events.unpersist()
    return {"applied": applied}


class FanoutTailer:
    """Streaming multi-table fan-out: tail a WAL and land each
    micro-batch across turns/convs/edges/lineage in ONE atomic catalog
    transaction per batch — the reference's full live pipeline (poll ->
    staged transforms -> one DBTx across N tables, loader/loader.go:48-87
    + neo4j_csv.go:103-117) with real cross-table atomicity and
    exactly-once per batch (catalog batch_id guard absorbs Spark's
    crash-replayed foreachBatch calls)."""

    def __init__(self, spark, binlog_dir: str, catalog: LakeCatalog,
                 checkpoint_dir: str, max_files_per_trigger: int = 1,
                 compact_max_files: int | None = None,
                 views: list | None = None):
        import hashlib

        self.spark = spark
        self.binlog_dir = binlog_dir
        self.catalog = catalog
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        # Small-file policy: append tables gain a file per bucket per
        # micro-batch; past this per-bucket count, the catalog packs
        # them (metadata-only victim check each batch, rewrite only
        # when victims exist — the OPTIMIZE-as-you-go loop).
        self.compact_max_files = compact_max_files
        # Live rollups over the fan-out CATALOG tables: each entry is
        # (upstream_table_name, downstream LakeTable, ViewSpec). Ticked
        # after every applied batch with mode="recompute" — the correct
        # mode for APPEND upstreams: the algebraic path's per-key diff
        # algebra assumes one stored row per key, while an append table
        # accumulates rows; recompute rebuilds changed groups from the
        # raw rows, and its changed-KEY discovery via the change feed is
        # complete because every append raises its key's max __lsn (the
        # WAL ordering invariant), so the collapsed per-key state always
        # changes. Exactly-once via the same relay cursor as the merge
        # tailer's views.
        self.views = list(views or [])
        self.ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
        self.batch_results: list[dict[str, Any]] = []

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        res = fanout_batch(
            self.catalog, batch_df, f"fanout-{self.ns}-{batch_id}"
        )
        if self.compact_max_files is not None and res.get("applied"):
            c = self.catalog.compact_files(
                self.compact_max_files,
                batch_id=f"cf-{self.ns}-{batch_id}",
            )
            packed = {
                n: r for n, r in c.items() if r.get("applied")
            }
            if packed:
                res = dict(res, compacted=sorted(packed))
        if res.get("applied") and self.views:
            from ..tableformat.lake import CommitConflict
            from .views import refresh_view

            ticked = []
            for up_name, down, spec in self.views:
                up = self.catalog.table(up_name)
                # same retry contract as BinlogTailer views: a racing
                # maintenance commit costs a recompute from the fresh
                # snapshot, never the stream; the relay cursor keeps a
                # re-tick exactly-once
                for attempt in range(3):
                    try:
                        r = refresh_view(up, down, spec, mode="recompute")
                        break
                    except CommitConflict:
                        if attempt == 2:
                            raise
                ticked.append({"view": spec.name, **r})
            res = dict(res, views=ticked)
        self.batch_results.append(res)

    def run_available(self) -> list[dict[str, Any]]:
        from ..operators.merge import BINLOG_DDL

        stream = (
            self.spark.readStream.schema(BINLOG_DDL)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .option("latestFirst", "false")
            .parquet(self.binlog_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.batch_results
