#!/usr/bin/env python
"""End-to-end event-analytics walkthrough over the `events` table: the
product-analytics suite (funnel → retention → robust outliers → pivot →
exact heavy-hitters → table profile) composed the way an analyst would
run it. Every step is a registered, oracle-checked query; this example
shows them as one narrative.

Usage: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.events import (
    funnel_stages,
    retention_cohorts,
)
from flink_recommendation_system_spark.operators.sketches import (
    heavy_hitters_exact,
)
from flink_recommendation_system_spark.session import (
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)
from flink_recommendation_system_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events").localCheckpoint()

    # 1. conversion funnel with a 7-day window
    funnel = funnel_stages(
        events, ["view", "click", "purchase"], max_span_sec=7 * 86400
    )
    stages = {
        r.stage: r.n
        for r in funnel.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }

    # 2. daily retention cohorts: how long do users stay active?
    cohorts = retention_cohorts(events, bucket_sec=86400)
    day0 = cohorts.filter(F.col("period_offset") == 0).agg(
        F.sum("n_users")
    ).collect()[0][0]
    day7 = cohorts.filter(F.col("period_offset") == 7).agg(
        F.sum("n_users")
    ).collect()[0][0]

    # 3. the power users: exact heavy-hitters at 0.75% of all events
    heavy = heavy_hitters_exact(events, "user_id", 3, 400)
    n_heavy = heavy.count()

    # 4. value outliers (|value - median| > 3 MAD per event type)
    from flink_recommendation_system_spark.plans.analytics_queries import (
        q_table_profile,
        q_value_outliers,
    )

    n_outliers = q_value_outliers(spark, sf_dir).count()

    # 5. data-quality profile of the orders table
    profile = q_table_profile(spark, sf_dir).collect()

    print(f"events                {events.count()}")
    print(f"funnel stages         {dict(sorted(stages.items()))}")
    print(f"cohort day-0 users    {day0}")
    print(f"active on day 7       {day7}")
    print(f"heavy users (≥0.75%)  {n_heavy}")
    print(f"value outliers        {n_outliers}")
    print("orders profile        " + ", ".join(
        f"{r.column_name}:{r.n_distinct}d/{r.n_nulls}n" for r in profile
    ))
    spark.stop()


if __name__ == "__main__":
    main()
