"""Second-wave reference-parity + OLAP-pattern queries.

S4 (typed JSON ingestion), T10 (validation routing), sessionization
(the gap-based pattern the reference's block-range batching hints at),
and a TPC-H-Q1-shaped pricing rollup for agg parity.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S4: JSON decode / typed ingestion (types/block.go:139-153) -------------
def q_s4_json_decode(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# --- T10: validation predicates + quarantine routing (rpcclient.go:32-39) ---
def q_t10_validation_routing(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    verdict = F.when(
        (F.col("value") <= 0) | F.col("value").isNull(), F.lit("invalid")
    ).when(F.col("value") > 19, F.lit("quarantine")).otherwise(F.lit("ok"))
    return ev.withColumn("verdict", verdict).groupBy("verdict").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value") * 100)).cast("bigint").alias("value_cents"),
    )


# --- sessionization: gap > 30 min starts a new session ----------------------
def q_sessionize_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # interval arithmetic (not epoch casts): TIMESTAMP_NTZ-safe in both
    # engines and timezone-independent
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# --- TPC-H Q1-shaped pricing rollup -----------------------------------------
def q_agg_lineitem_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1997-01-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity")).cast("bigint").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * 100)).cast("bigint").alias(
                "price_cents"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                )
            ).cast("bigint").alias("disc_price_cents"),
            F.count("*").alias("count_order"),
        )
    )


# --- exact percentiles ------------------------------------------------------
def q_stats_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


# --- ROLLUP grouping sets ----------------------------------------------------
def q_rollup_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice") * 100)).cast("bigint").alias(
                "cents"
            ),
        )
    )


# --- pivot (portable conditional-aggregation form) ---------------------------
def q_pivot_events_by_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return ev.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(
                f"n_{t}"
            )
            for t in types
        ]
    )


# --- running aggregates (cumulative window frame) ----------------------------
def q_window_running_totals(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = (
        ev.filter(F.col("user_id") < 20)
        .withColumn("running_n", F.count("*").over(cum))
        .withColumn(
            "running_cents",
            F.round(F.sum(F.col("value") * 100).over(cum)).cast("bigint"),
        )
        .withColumn("prev_event", F.lag("event_id").over(w))
    )
    return out.select(
        "user_id", "event_id", "running_n", "running_cents", "prev_event"
    )


QUERIES = {
    "window_running_totals": q_window_running_totals,
    "stats_percentiles": q_stats_percentiles,
    "rollup_orders": q_rollup_orders,
    "pivot_events_by_type": q_pivot_events_by_type,
    "s4_json_decode": q_s4_json_decode,
    "t10_validation_routing": q_t10_validation_routing,
    "sessionize_events": q_sessionize_events,
    "agg_lineitem_pricing": q_agg_lineitem_pricing,
}

ORACLES = {
    "window_running_totals": """
SELECT user_id, event_id,
       count(*) OVER cum AS running_n,
       CAST(round(sum(value * 100) OVER cum) AS BIGINT) AS running_cents,
       lag(event_id) OVER w AS prev_event
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
       cum AS (PARTITION BY user_id ORDER BY event_id
               ROWS UNBOUNDED PRECEDING)
""",
    "stats_percentiles": """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY event_type
""",
    "rollup_orders": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(round(sum(o_totalprice * 100)) AS BIGINT) AS cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "pivot_events_by_type": """
SELECT user_id % 10 AS cohort,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY cohort
""",
    "s4_json_decode": """
SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events)
GROUP BY event_type
""",
    "t10_validation_routing": """
SELECT CASE WHEN value <= 0 OR value IS NULL THEN 'invalid'
            WHEN value > 19 THEN 'quarantine'
            ELSE 'ok' END AS verdict,
       count(*) AS n,
       CAST(round(sum(value * 100)) AS BIGINT) AS value_cents
FROM events GROUP BY verdict
""",
    "sessionize_events": """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id
""",
    "agg_lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
       CAST(round(sum(l_extendedprice * 100)) AS BIGINT) AS price_cents,
       CAST(round(sum(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT)
         AS disc_price_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag, l_linestatus
""",
}
