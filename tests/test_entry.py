"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row counts and order-insensitive values.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif str(df[c].dtype) in ("int32", "int8", "int16", "uint32", "bool"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_every_query_has_oracle():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(q) - set(o)
    assert not missing, f"queries without oracle SQL: {missing}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check
        return
    con = _duck()
    want = con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    g, w = _normalize(got), _normalize(want)
    assert len(g) == len(w), f"{name}: row count {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=1e-9)


def test_gate_registry_budget_is_exactly_50():
    """The 50-slot gate budget is load-bearing (SURVEY §8: the driver
    caps recorded gates; composites exist precisely to keep every
    registered query correctness-gated). A new gate must REPLACE or
    COMPOSE, never silently push a tail gate past the cap."""
    from etl_bitcoin_spark.plans import all_oracles, all_queries

    q, o = all_queries(), all_oracles()
    assert len(q) == 50, (
        f"{len(q)} registered queries — the driver records exactly 50;"
        " fold the new gate into a composite (see SURVEY §8)"
    )
    assert set(q) == set(o), set(q) ^ set(o)
