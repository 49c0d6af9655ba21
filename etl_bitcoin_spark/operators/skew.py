"""Hot-key skew handling: salted hash partitioner + skew diagnosis.

The reference's only parallelism knob is a fixed worker pool
(database/csv/csv.go:56-59); a hot key simply serializes behind one
file mutex. Spark-native replacements:

- the PRIMARY defense is structural: every engine shuffle partitions on
  the FULL primary key (conv_id, turn_idx), so a hot conv_id spreads
  across partitions by turn_idx for free;
- for aggregations that genuinely need conv_id granularity (per-conv
  rollups), ``salted_agg`` does the classic two-phase
  salt -> partial-agg -> final-agg;
- ``diagnose_skew`` samples the key histogram to pick a salt factor;
- AQE skew-join splitting stays enabled in the session defaults as the
  runtime complement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Append a deterministic salt derived from the row's own content
    (never rand(): replay must be reproducible). Uses a secondary column
    when present (turn_idx, lsn), else a hash of all columns."""
    for c in ("turn_idx", "lsn"):
        if c in df.columns:
            return df.withColumn(
                salt_col, F.pmod(F.col(c).cast("long"), F.lit(salt_buckets)).cast("int")
            )
    return df.withColumn(
        salt_col, F.pmod(F.hash(*df.columns), F.lit(salt_buckets)).cast("int")
    )


def salted_repartition(
    df: DataFrame, key: str, n_partitions: int, salt_buckets: int = 8
) -> DataFrame:
    """Repartition on (key, salt) so one hot key occupies up to
    ``salt_buckets`` partitions instead of one."""
    salted = with_salt(df, salt_buckets)
    return salted.repartition(n_partitions, F.col(key), F.col("__salt")).drop(
        "__salt"
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial aggregate on
    (key, salt) — map-side combine already shrinks each partition —
    then final aggregate on key over at most ``salt_buckets`` rows per
    key. Supports sum/count/min/max-style re-aggregable expressions:
    ``aggs`` maps output name -> (partial_expr, final_fn_name).

    Example::

        salted_agg(df, "conv_id",
                   {"n": (F.count("*"), "sum"),
                    "max_lsn": (F.max("lsn"), "max")})
    """
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    finals = [
        getattr(F, fn)(F.col(f"__p_{name}")).alias(name)
        for name, (_, fn) in aggs.items()
    ]
    return partial.groupBy(key).agg(*finals)


def diagnose_skew(
    df: DataFrame, key: str, sample_fraction: float = 0.01, top: int = 10
) -> list[dict]:
    """Sampled key histogram: returns the heaviest keys with their
    estimated share. Use the share to size salt_buckets
    (share * n_partitions rounded up).

    ONE Spark job: the per-key sample histogram is aggregated once and
    feeds BOTH the top-k branch and the sample-size scalar (broadcast
    cross join) — the shuffle is shared via ReusedExchange, so the
    input is scanned once instead of the former three passes
    (count + sample count + histogram)."""
    sampled = df.sample(fraction=min(1.0, sample_fraction), seed=42)
    hist = sampled.groupBy(key).agg(F.count("*").alias("n"))
    top_rows = hist.orderBy(F.col("n").desc()).limit(top)
    n_total = hist.agg(F.sum("n").alias("__n_sampled"))
    rows = top_rows.crossJoin(F.broadcast(n_total)).collect()
    if not rows:
        # sample came back empty: truly empty input -> [], otherwise
        # diagnose the full frame (rare small-input path)
        if min(1.0, sample_fraction) >= 1.0 or df.isEmpty():
            return []
        return diagnose_skew(df, key, 1.0, top)
    n_sampled = rows[0]["__n_sampled"]
    return [
        {"key": r[key], "est_share": round(r["n"] / n_sampled, 4)}
        for r in rows
    ]
