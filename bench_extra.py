"""Extra measurement harness for the optimization rounds (guide §1).

NOT the frozen driver bench — bench.py stays untouched. This file:
  * times individual declared queries with the noop sink (guide §1.4),
    repeated N times, reporting all samples + min;
  * dumps .explain("formatted") per query to plans/<tag>/<query>.txt;
  * labels jobs (guide §1.5) so the UI/event logs are readable.

Usage:
  python bench_extra.py q1 q2 ...          # time + explain named queries
  BENCH_EXTRA_REPS=3 python bench_extra.py --all-headline
  BENCH_EXTRA_PLANS=plans/r07 python bench_extra.py --explain-only q1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_bitcoin_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
PLANS_DIR = os.environ.get("BENCH_EXTRA_PLANS", "")
SUFFIX = os.environ.get("BENCH_EXTRA_SUFFIX", "")

HEADLINE = [
    "cdc_lww_apply",
    "cdc_binlog_derive",
    "cdc_dedup_lsn",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "text_doc_profile",
    "join_customer_orders",
    "window_topk_orders",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    names = list(HEADLINE) if "--all-headline" in flags else args

    cores = min(default_parallelism(), 32)
    spark = get_spark(
        "bench_extra",
        cores=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    from etl_bitcoin_spark.plans import all_queries

    qs = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLANS_DIR, f"{name}{SUFFIX}.txt"), "w") as f:
                f.write(plan)
        if "--explain-only" in flags:
            continue
        samples = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"samples": samples, "min": min(samples)}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "queries": out}))


if __name__ == "__main__":
    main()
