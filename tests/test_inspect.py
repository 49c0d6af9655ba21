"""Observability surfaces: the .files metadata table and the verify()
fsck (manifest-tree + file-existence + lineage invariants, deep footer
audit)."""

import os
from datetime import datetime

from etl_bitcoin_spark.operators.merge import (
    BINLOG_DDL,
    KEY_COLS,
    TRANSCRIPTS_DDL,
    apply_batch,
)
from etl_bitcoin_spark.tableformat import LakeTable


def _ev(spark, rows):
    rows = [
        (lsn, op, c, t, role, text, tool, datetime.fromisoformat(ts))
        for (lsn, op, c, t, role, text, tool, ts) in rows
    ]
    return spark.createDataFrame(rows, BINLOG_DDL)


def _seed(spark, tmp_path, n_buckets=4):
    lake = LakeTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_DDL, KEY_COLS,
        n_buckets=n_buckets,
    )
    rows = [
        (i, "I", f"c{i % 5}", i % 3, "user", f"t{i}", None,
         "2024-01-01 00:00:01")
        for i in range(1, 21)
    ]
    apply_batch(lake, _ev(spark, rows), "b0", assume_all_buckets=True,
                key_bloom=True)
    # summary delta + a raw mod-shard delta so all three kinds exist
    apply_batch(lake, _ev(spark, [
        (21, "U", "c1", 1, "user", "upd", None, "2024-01-01 00:00:02"),
    ]), "b1", merge_mode="read", delta_plan="summary")
    apply_batch(lake, _ev(spark, [
        (22, "U", "c2", 2, "user", "upd2", None, "2024-01-01 00:00:03"),
    ]), "b2", merge_mode="read", delta_plan="raw",
        lsn_range_hint=(22, 22))
    return lake


def test_files_metadata_table(spark, tmp_path):
    lake = _seed(spark, tmp_path)
    f = lake.files().toPandas()
    kinds = set(f["kind"])
    assert kinds == {"base", "delta", "shard"}
    # every file exists and is non-empty -> sizes recorded
    assert (f["size_bytes"] > 0).all()
    # base files carry key Blooms (key_bloom=True on the seed commit)
    assert f[f["kind"] == "base"]["has_key_bloom"].all()
    # base lsn stats bound the stored winners (resolved rows, so the
    # min is the smallest WINNING lsn, not the smallest event lsn)
    base = f[f["kind"] == "base"]
    assert base["lsn_min"].min() >= 1 and base["lsn_max"].max() == 20
    # shard rows carry their generation tag, others don't
    assert f[f["kind"] == "shard"]["gen_k"].notna().all()
    assert (f["bucket"] == -1).equals(f["kind"] == "shard")
    # bucket filter bounds the listing
    some_bucket = int(base["bucket"].iloc[0])
    sub = lake.files(buckets=[some_bucket]).toPandas()
    assert set(sub[sub["kind"] == "base"]["bucket"]) == {some_bucket}


def test_verify_clean_and_deep(spark, tmp_path):
    lake = _seed(spark, tmp_path)
    rep = lake.verify()
    assert rep["ok"], rep["errors"]
    assert rep["files_checked"] > 0
    deep = lake.verify(deep=True)
    assert deep["ok"], deep["errors"]


def test_verify_detects_missing_and_empty_files(spark, tmp_path):
    lake = _seed(spark, tmp_path)
    f = lake.files().toPandas()
    victim = f[f["kind"] == "base"]["path"].iloc[0]
    victim2 = f[f["kind"] == "delta"]["path"].iloc[0]
    os.remove(os.path.join(lake.root, victim))
    open(os.path.join(lake.root, victim2), "w").close()  # truncate
    rep = lake.verify()
    assert not rep["ok"]
    assert any("missing file" in e and victim in e for e in rep["errors"])
    assert any("empty file" in e and victim2 in e for e in rep["errors"])


def test_verify_deep_detects_row_count_drift(spark, tmp_path):
    """Swap a base file for another bucket's file: existence checks
    pass, the DEEP footer audit flags the physical-vs-manifest row
    drift (and possibly lsn-range escape)."""
    import shutil

    lake = _seed(spark, tmp_path)
    f = lake.files().toPandas()
    base = f[f["kind"] == "base"].reset_index(drop=True)
    a, b = base["path"].iloc[0], base["path"].iloc[1]
    shutil.copyfile(
        os.path.join(lake.root, b), os.path.join(lake.root, a)
    )
    assert lake.verify()["ok"]  # shallow cannot see it
    deep = lake.verify(deep=True)
    assert not deep["ok"]
    assert any("physical base rows" in e or "footer lsn" in e
               for e in deep["errors"])


def test_catalog_verify(spark, tmp_path):
    """Catalog fsck aggregates per-table verify at the PINNED versions
    and flags pins referencing expired snapshots."""
    import os

    from etl_bitcoin_spark.operators.merge import TRANSCRIPTS_DDL
    from etl_bitcoin_spark.tableformat.catalog import LakeCatalog
    from etl_bitcoin_spark.tableformat.lake import BUCKET_COL
    from pyspark.sql import functions as F

    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("t1", TRANSCRIPTS_DDL, KEY_COLS, n_buckets=4)
    content = (
        _ev(spark, [(1, "I", "c1", 0, "user", "x", None,
                     "2024-01-01 00:00:01")])
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts",
                F.col("lsn").alias("__lsn"),
                F.lit(False).alias("__deleted"))
        .withColumn(BUCKET_COL, cat.table("t1").bucket_expr(4, KEY_COLS))
    )
    cat.commit_multi(
        {"t1": {"new_content": content, "replaced_buckets": [],
                "mode": "append"}}, "b1",
    )
    rep = cat.verify(deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["tables"]["t1"]["ok"]
    # break a pinned file -> the catalog report carries the finding
    f = cat.table("t1").files().toPandas()
    os.remove(os.path.join(cat.table("t1").root, f["path"].iloc[0]))
    rep2 = cat.verify()
    assert not rep2["ok"]
    assert any("t1" in e and "missing file" in e for e in rep2["errors"])
