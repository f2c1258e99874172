#!/usr/bin/env python
"""10× scale-up probe for the round-6b mining suite (PERFORMANCE.md
"Measured 10× scale-up"): replicate the sf0.1 tables with shifted,
disjoint ids into a synthetic sf_dir, then run the REAL registered query
functions against 1× and N× — no reimplementation, the exact plans the
driver runs.

Replication keeps per-entity density unchanged (tokens/doc, events/user,
lines/order), so a well-shaped plan should scale ~linearly in the scan
and stay bounded in the aggregate/output stages.

Usage: python examples/scale_mining.py [sf_dir] [n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_recommendation_system_spark.plans import (
    llm_pipeline_queries,
    mining_queries,
)
from flink_recommendation_system_spark.session import (
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)

SHIFTS = {
    # per-table id columns to shift per replica (disjoint id spaces)
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "documents": {"doc_id": 10_000_000},
}

QUERIES = [
    ("phrase_search", llm_pipeline_queries.q_phrase_search),
    ("basket_lift", mining_queries.q_basket_lift),
    ("touch_attribution", mining_queries.q_touch_attribution),
    ("snapshot_diff", mining_queries.q_snapshot_diff),
    ("weighted_median", mining_queries.q_weighted_median),
    ("activity_streaks", mining_queries.q_activity_streaks),
    ("lead_time_histogram", mining_queries.q_lead_time_histogram),
    ("bounce_rate_daily", mining_queries.q_bounce_rate_daily),
    ("new_vs_returning", mining_queries.q_new_vs_returning),
]


def replicate_dir(spark, sf_dir: str, out_dir: str, n: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for table, shifts in SHIFTS.items():
        src = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        parts = [df]
        for i in range(1, n):
            rep = df
            for col, step in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    big_dir = f"/tmp/mining_scale{n}"
    spark = get_spark("scale-mining", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"replicating {sf_dir} x{n} -> {big_dir}")
    t0 = time.time()
    replicate_dir(spark, sf_dir, big_dir, n)
    print(f"  replicated in {time.time() - t0:.1f}s")
    for name, fn in QUERIES:
        t0 = time.time()
        n1 = fn(spark, sf_dir).count()
        t1 = time.time() - t0
        t0 = time.time()
        nn = fn(spark, big_dir).count()
        tn = time.time() - t0
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | {n}x {tn:.2f}s ({nn} rows)"
            f" | ratio {tn / t1:.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
