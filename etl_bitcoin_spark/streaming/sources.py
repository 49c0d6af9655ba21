"""Pull-based live CDC source (the reference's RPC-poll analog).

The reference tails a LIVE system by polling batched JSON-RPC
(reference client/rpc/rpcclient.go:31-101: async-batch GetBlockHashes /
GetBlocks over a block-number range). The file-WAL tailer covers the
replay/backfill shape; this module covers the PULL shape: a Structured
Streaming ``rate-micro-batch`` source emits a deterministic ordinal per
row (the analog of the block number), and the binlog event is derived
from that ordinal with the same seeded hash-mixing as the bulk
generator — so the stream is a live, paced, *reproducible* change feed
whose converged state can be checked against the single-threaded
oracle.

At deployment the rate source swaps for Kafka/Kinesis/object-store
listing; everything downstream (guards, merge, commit) is unchanged —
the same property the reference gets from its Client interface
(client/client.go:10-17).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..gen.binlog_spark import derive_binlog_columns
from ..operators.merge import apply_batch
from ..state import ExactlyOnceFilter
from ..tableformat.lake import LakeTable


def rate_binlog_stream(
    spark: SparkSession,
    rows_per_batch: int = 50_000,
    n_events: int = 10**9,
    seed: int = 42,
    **gen_kw: Any,
) -> DataFrame:
    """A live, deterministic change-event stream: ``rate-micro-batch``
    emits ``value`` = a dense monotonic ordinal; the event payload is a
    pure function of (value, seed)."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    ids = raw.select(F.col("value").alias("id"))
    return derive_binlog_columns(ids, n_events, seed=seed, **gen_kw)


class RateSourceTailer:
    """Tail the live rate-backed change feed into a LakeTable with the
    full exactly-once guard stack — the pull-based twin of
    ``BinlogTailer`` (same foreachBatch body, different source)."""

    def __init__(
        self,
        spark: SparkSession,
        lake: LakeTable,
        checkpoint_dir: str,
        rows_per_batch: int = 50_000,
        seed: int = 42,
        merge_on_read: bool = False,
        **gen_kw: Any,
    ):
        self.spark = spark
        self.lake = lake
        self.checkpoint_dir = checkpoint_dir
        self.rows_per_batch = rows_per_batch
        self.seed = seed
        # latency-mode parity with BinlogTailer: delta appends instead
        # of per-batch bucket rewrites (compaction stays a maintenance
        # action — scripts/maintain_job.py — on this pull-based path)
        self.merge_on_read = merge_on_read
        self.gen_kw = gen_kw
        import hashlib

        self.ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
        self.batch_results: list[dict[str, Any]] = []

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        guard = ExactlyOnceFilter(self.lake.lineage(), None)
        res = apply_batch(
            self.lake,
            batch_df,
            f"rate-{self.ns}-{batch_id}",
            already_applied_filter=guard,
            merge_mode="read" if self.merge_on_read else "write",
        )
        self.batch_results.append(res)

    def run(
        self, n_batches: int, timeout_sec: float = 300.0
    ) -> list[dict[str, Any]]:
        """Consume ``n_batches`` micro-batches from the live source, then
        stop. Restart-safe: the checkpoint pins the source offsets and
        the lake's batch_id guard absorbs the replayed trigger."""
        import time as _time

        stream = rate_binlog_stream(
            self.spark, self.rows_per_batch, seed=self.seed, **self.gen_kw
        )
        q = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        t0 = _time.monotonic()
        try:
            while (
                len(self.batch_results) < n_batches
                and _time.monotonic() - t0 < timeout_sec
            ):
                _time.sleep(0.1)
        finally:
            q.stop()
        return self.batch_results
