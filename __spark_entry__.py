"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC query (full-replay LWW apply) on
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md §2 (reference-parity ops, the CDC merge-engine surface, and
the training-data pipeline operators); ``oracle_sql()`` holds the
DuckDB-equivalent SQL for each, built on cross-engine bit-identical
primitives (md5-derived 48-bit hashes, epoch-millis timestamps,
left-to-right double folds).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from etl_bitcoin_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged transcript state after full CDC replay of the
    binlog derived from sf0.001 events."""
    from etl_bitcoin_spark.plans.cdc_queries import q_cdc_lww_apply

    return q_cdc_lww_apply(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
