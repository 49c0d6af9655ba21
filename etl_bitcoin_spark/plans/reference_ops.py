"""Reference-operator parity queries (SURVEY.md §2), re-expressed as
declarative Spark plans over the driver's TPC-H-ish tables.

Each query names the reference operator it re-expresses (file:line in
/root/reference). These are deliberately Catalyst-friendly: filters and
projections push to the parquet scan, small sides broadcast, windows
partition on selective keys.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S1: range scan (client/rpc/rpcclient.go:31-59) ------------------------
def q_s1_range_scan(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") <= 2000))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


# --- S2/S3: batched point lookup (rpcclient.go:62-101) ---------------------
def q_s2_point_lookup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    keys = [3, 7, 42, 101, 500, 999, 1500, 4200]
    return (
        li.filter(F.col("l_orderkey").isin(keys))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


# --- S6: tail read, negative offset (csv_file.go:122-129) -------------------
def q_s6_tail_read(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("event_id").desc())
        .limit(5)
        .select("event_id", "event_type", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"))
    )


# --- T3: explode/flatten (loader.go:194-203, block -> header + txs) --------
def q_t3_explode_flatten(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("n")).filter(
        F.col("n") > 50
    )


# --- T4: explode + conditional routing (neo4j_csv.go:139-145, coinbase) ----
def q_t4_conditional_routing(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "route",
            F.when(F.col("event_type") == "signup", F.lit("node")).otherwise(
                F.lit("edge")
            ),
        )
        .withColumn(
            "edge_start",
            F.when(
                F.col("event_type") == "signup",
                F.concat(F.col("user_id").cast("string"), F.lit("_genesis")),
            ).otherwise(
                F.concat(F.col("user_id").cast("string"), F.lit("_"),
                         F.col("event_type"))
            ),
        )
        .groupBy("route", "edge_start")
        .agg(F.count("*").alias("n"))
    )


# --- T5: two-level nested explode (neo4j_csv.go:147-154, vout->addresses) --
def q_t5_nested_explode(spark, sf_dir):
    """Documents -> words -> characters-of-word: the tx -> vout ->
    addresses double unnesting, with per-level keys preserved."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("word_idx", "word"),
    ).filter(F.col("word_idx") < 5)
    chars = words.select(
        "doc_id", "word_idx",
        F.explode(F.split(F.col("word"), "")).alias("ch"),
    )
    return chars.groupBy("ch").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# --- T6: projection + synthesized keys (nodes.go:70-76, outputID) ----------
def q_t6_synth_key_projection(spark, sf_dir):
    """T6: projection with synthesized keys (reference nodes.go:72
    outputID = txid+"_"+n). DECISION on the reference quirk at
    relationships.go:77 (in-edge start key concatenates txid+itoa(vout)
    with NO separator): this engine uses the separator form uniformly.
    The unseparated form is ambiguous — ("a_1", 2) and ("a", 12) both
    yield "a_12"-style collisions — so preserving it would propagate a
    latent key-collision bug into a keyed lake table. Documented here
    and in operators/fanout.py (which synthesizes edge ids the same
    way)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 200).select(
        F.concat(
            F.col("l_orderkey").cast("string"), F.lit("_"),
            F.col("l_linenumber").cast("string"),
        ).alias("output_id"),
        F.col("l_partkey"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
    )


# --- T7: derived scalar, halving schedule (types/block.go:106-109) ----------
def q_t7_derived_reward(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "reward",
            F.lit(50.0) / F.pow(F.lit(2.0), F.floor(F.col("o_orderkey") / 2100)),
        )
        .groupBy("reward")
        .agg(F.count("*").alias("n"))
    )


# --- T8: in-batch dedup via set (neo4j_csv.go:97) ---------------------------
def q_t8_dedup_set(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").dropDuplicates()


# --- T9: filter guard (neo4j_csv.go:124-127, genesis) ------------------------
def q_t9_filter_guard(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") > 1)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


# --- gap-analysis ops the reference lacks (SURVEY §2.4): join/agg/window ----
def q_agg_orders_by_status(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("o_totalprice") * 100)).cast("bigint").alias(
            "total_cents"
        ),
    )


def q_join_customer_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
    )


def q_window_topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "rk")
    )


QUERIES = {
    "s1_range_scan": q_s1_range_scan,
    "s2_point_lookup": q_s2_point_lookup,
    "s6_tail_read": q_s6_tail_read,
    "t3_explode_flatten": q_t3_explode_flatten,
    "t4_conditional_routing": q_t4_conditional_routing,
    "t5_nested_explode": q_t5_nested_explode,
    "t6_synth_key_projection": q_t6_synth_key_projection,
    "t7_derived_reward": q_t7_derived_reward,
    "t8_dedup_set": q_t8_dedup_set,
    "t9_filter_guard": q_t9_filter_guard,
    "agg_orders_by_status": q_agg_orders_by_status,
    "join_customer_orders": q_join_customer_orders,
    "window_topk_orders": q_window_topk_orders,
}

ORACLES = {
    "s1_range_scan": """
SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
WHERE o_orderkey BETWEEN 1000 AND 2000
""",
    "s2_point_lookup": """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
WHERE l_orderkey IN (3, 7, 42, 101, 500, 999, 1500, 4200)
""",
    "s6_tail_read": """
SELECT event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str FROM events
ORDER BY event_id DESC LIMIT 5
""",
    "t3_explode_flatten": """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word HAVING count(*) > 50
""",
    "t4_conditional_routing": """
SELECT CASE WHEN event_type = 'signup' THEN 'node' ELSE 'edge' END AS route,
       CASE WHEN event_type = 'signup'
            THEN CAST(user_id AS VARCHAR) || '_genesis'
            ELSE CAST(user_id AS VARCHAR) || '_' || event_type
       END AS edge_start,
       count(*) AS n
FROM events GROUP BY route, edge_start
""",
    "t5_nested_explode": """
WITH words AS (
  SELECT doc_id, word_idx, word FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS word_idx
    FROM documents)
  WHERE word_idx < 5
),
chars AS (
  SELECT doc_id, word_idx, unnest(string_split(word, '')) AS ch FROM words
)
SELECT ch, count(*) AS n, count(DISTINCT doc_id) AS n_docs
FROM chars GROUP BY ch
""",
    "t6_synth_key_projection": """
SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
         AS output_id,
       l_partkey,
       CAST(l_extendedprice AS VARCHAR) AS price_str
FROM lineitem WHERE l_orderkey <= 200
""",
    "t7_derived_reward": """
SELECT 50.0 / power(2.0, floor(o_orderkey / 2100)) AS reward, count(*) AS n
FROM orders GROUP BY reward
""",
    "t8_dedup_set": """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
""",
    "t9_filter_guard": """
SELECT l_returnflag, count(*) AS n FROM lineitem
WHERE l_linenumber > 1 GROUP BY l_returnflag
""",
    "agg_orders_by_status": """
SELECT o_orderstatus, count(*) AS n,
       CAST(round(sum(o_totalprice * 100)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderstatus
""",
    "join_customer_orders": """
SELECT n_name, c_mktsegment, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
""",
    "window_topk_orders": """
SELECT o_custkey, o_orderkey, rk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 2
""",
}
