"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns + typed metadata structs; the
Spark-side machinery (schemas, batching, partition sizing, Arrow
transfer through mapInPandas) is real and tested. The actual media
decode is STUBBED — this environment has no image/audio libraries — as
``NotImplementedError`` behind an import-try, with a deterministic fake
(byte-stats "features") exercising the identical dataflow.

Scale notes: media rows are large and variable — the repartition before
mapInPandas targets a bytes-per-partition budget (executor-memory
bound), not a row count; Arrow batch size is capped via
spark.sql.execution.arrow.maxRecordsPerBatch for the same reason.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, duration_ms int, codec string"
)
FEATURE_DIM = 16


def attach_media(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct —
    the ingestion shape a real media pipeline would carry."""
    return df.select(
        "*",
        F.encode(F.col(payload_col), "UTF-8").alias("media_bytes"),
        F.struct(
            F.lit("image/png").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("media_meta"),
    )


def _decode_image(blob: bytes) -> np.ndarray:
    """Real decode path — stubbed: no PIL/cv2 in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/cv2 (absent in this environment); "
            "use deterministic_features for the tested dataflow"
        ) from e
    raise NotImplementedError("unreachable in this environment")


def deterministic_features(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: byte-histogram
    moments. Keeps the exact UDF signature/batch shape of the real
    path."""
    a = np.frombuffer(blob, dtype=np.uint8)
    if len(a) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(a >> 4, minlength=FEATURE_DIM)[:FEATURE_DIM]
    return (hist / max(1, len(a))).astype(np.float32)


def extract_features(
    df: DataFrame,
    bytes_col: str = "media_bytes",
    target_partition_mb: int = 64,
    n_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Partition count is sized by a bytes-per-partition budget (media rows
    are fat, executor memory bounds the batch). Pass ``n_partitions``
    when the caller knows the payload volume (e.g. from table lineage —
    the usual case in a pipeline); otherwise a single sampling job
    estimates it (sample and count fused into ONE aggregation, not a
    count() plus a limit().collect() pair). Each Arrow batch is
    processed vectorized, one numpy pass per batch.
    """
    if n_partitions is None:
        # one job: row count + avg payload size in the SAME aggregate
        # (length() of a binary column is O(1) metadata per row); the
        # previous count() + limit(1000).collect() pair cost two jobs
        row = df.select(
            F.count(F.lit(1)).alias("total"),
            F.avg(F.length(bytes_col)).alias("avg_n"),
        ).collect()[0]
        total, est = row["total"], row["avg_n"] or 1.0
        total_mb = total * est / 1e6
        n_partitions = max(1, int(total_mb / target_partition_mb))

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema]
        + [f"features array<float>"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                deterministic_features(b).tolist() for b in pdf[bytes_col]
            ]
            yield pdf

    return df.repartition(n_partitions).mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, meta_col: str = "media_meta"
) -> DataFrame:
    """Video frame-sampling *plan*: explode one row per target frame
    timestamp from metadata (decode of the frame itself is the stubbed
    step). Pure builtin ops — the explode happens JVM-side."""
    n_frames = (
        F.coalesce(F.col(f"{meta_col}.duration_ms"), F.lit(0)) / every_ms
    ).cast("int")
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.when(
                n_frames > 0, F.sequence(F.lit(0), n_frames * every_ms, F.lit(every_ms))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
