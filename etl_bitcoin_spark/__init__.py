"""etl_bitcoin_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Re-expresses the ingest pattern of the reference repo
(IlliniBlockchain/etl-bitcoin: ordered change source -> staged pipeline ->
buffered transactional sink with a resume watermark) as an idiomatic Spark
engine:

- ``tableformat``  native snapshot-committed Parquet lake table ("LakeTable")
                   with atomic manifest commits, idempotent-by-batch_id
                   re-commit detection, time travel and per-bucket lineage
                   (analog of DBTx.Commit + LastBlockNumber,
                   reference database/csv/neo4j_csv/neo4j_csv.go:62-117).
- ``gen``          deterministic seeded synthetic transcripts + binlog
                   generator (analog of the reference's canned block
                   fixtures, loader/testdata/block_*.json).
- ``operators``    the relational core: CDC merge (LWW + tombstones),
                   dedup family (exact/minhash/simhash/jaccard/embedding),
                   similarity search, text analysis, skew handling.
- ``functions``    portable hashing + vectorized pandas UDF normalization.
- ``streaming``    Structured Streaming binlog tailer (foreachBatch,
                   checkpointed HWM — analog of loader.LoaderManager,
                   reference loader/loader.go:48-87).
- ``plans``        query definitions surfaced through __spark_entry__.
"""

__version__ = "0.1.0"
