"""spark-submit entry point: lake/catalog maintenance (the table
services a long-running deployment schedules out-of-band)::

    spark-submit --py-files dist/engine.zip scripts/maintain_job.py \
        --lake /path/to/lake [actions...]
    spark-submit --py-files dist/engine.zip scripts/maintain_job.py \
        --catalog /path/to/cat [actions...]

Actions (any combination; executed in the order listed below):

  --compact-deltas K      fold merge-on-read deltas where a bucket
                          holds more than K delta files
  --compact-files K       bin-pack append buckets with more than K
                          base files (catalog mode: pin-safe variant)
  --compact-tombstones H  drop delete tombstones at/below producer
                          lsn horizon H (low-watermark contract)
  --rescale N             bucket-count evolution to N buckets
                          (lake mode only; fences stale-layout writers)
  --expire N              keep the last N snapshots, GC the rest
  --orphan-grace SEC      with --expire: also sweep failed-commit
                          staging residue older than SEC seconds

Each action is an independent idempotent commit; a crash mid-list
leaves earlier actions durable and later ones unrun — rerunning is
safe (batch ledger absorbs replays).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def build_session(args: argparse.Namespace) -> SparkSession:
    return (
        SparkSession.builder.appName("etl-bitcoin-spark-maintain")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    p = argparse.ArgumentParser()
    tgt = p.add_mutually_exclusive_group(required=True)
    tgt.add_argument("--lake")
    tgt.add_argument("--catalog")
    p.add_argument("--compact-deltas", type=int, default=None, metavar="K")
    p.add_argument("--compact-files", type=int, default=None, metavar="K")
    p.add_argument("--compact-records-per-file", type=int, default=None,
                   metavar="N",
                   help="with --compact-files: split each bucket's "
                        "key-sorted stream into key-disjoint files of "
                        "<=N records (enables key-range file skipping)")
    p.add_argument("--compact-tombstones", type=int, default=None,
                   metavar="HORIZON_LSN")
    p.add_argument("--rescale", type=int, default=None, metavar="N_BUCKETS")
    p.add_argument("--expire", type=int, default=None, metavar="KEEP_LAST")
    p.add_argument("--orphan-grace", type=float, default=None, metavar="SEC")
    p.add_argument("--marker-retention", type=float, default=None,
                   metavar="SEC",
                   help="with --expire: prune batch-ledger markers older "
                        "than SEC (replays beyond this window are no "
                        "longer absorbed)")
    p.add_argument("--shuffle-partitions", type=int, default=256)
    args = p.parse_args()

    spark = build_session(args)
    out: dict[str, object] = {}
    # uuid suffix: two runs in the same second (or after a clock step)
    # must not collide, or the batch ledger would silently absorb the
    # second run's actions as replays (idempotence is only needed for
    # crash replay of the SAME commit, which the per-action commit
    # protocol already provides)
    import uuid

    run_id = f"{int(time.time())}-{uuid.uuid4().hex[:8]}"

    if args.lake:
        from etl_bitcoin_spark.tableformat import LakeTable

        lake = LakeTable(spark, args.lake)
        if args.compact_deltas is not None:
            out["compact_deltas"] = lake.compact_deltas(
                args.compact_deltas, batch_id=f"maint-cd-{run_id}"
            )
        if args.compact_files is not None:
            out["compact_files"] = lake.compact_files(
                args.compact_files, batch_id=f"maint-cf-{run_id}",
                max_records_per_file=args.compact_records_per_file,
            )
        if args.compact_tombstones is not None:
            out["compact_tombstones"] = lake.compact_bucket_tombstones(
                args.compact_tombstones, batch_id=f"maint-ct-{run_id}"
            )
        if args.rescale is not None:
            # run_id in the batch id: rescaling back to a previously
            # used bucket count later must not be absorbed as a
            # duplicate by the durable batch ledger
            out["rescale"] = lake.rescale_buckets(
                args.rescale, batch_id=f"maint-rs-{args.rescale}-{run_id}"
            )
        if args.expire is not None:
            out["expire"] = lake.expire_snapshots(
                keep_last=args.expire, orphan_grace_sec=args.orphan_grace,
                batch_marker_retention_sec=args.marker_retention,
            )
        out["version"] = lake.snapshot()["version"]
        out["n_buckets"] = lake.snapshot()["n_buckets"]
    else:
        from etl_bitcoin_spark.tableformat.catalog import LakeCatalog

        cat = LakeCatalog(spark, args.catalog)
        if args.rescale is not None or args.compact_deltas is not None or (
            args.compact_tombstones is not None
        ):
            raise SystemExit(
                "catalog mode supports --compact-files/--expire; run "
                "rescale/delta/tombstone compaction per table via --lake"
            )
        if args.compact_files is not None:
            out["compact_files"] = cat.compact_files(
                args.compact_files, batch_id=f"maint-cf-{run_id}"
            )
        if args.expire is not None:
            out["expire"] = cat.expire_snapshots(
                keep_last=args.expire, orphan_grace_sec=args.orphan_grace,
                batch_marker_retention_sec=args.marker_retention,
            )
        out["version"] = cat.snapshot()["version"]

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
