#!/usr/bin/env python
"""End-to-end demo of the full lambda architecture — the three reference
pipelines (SURVEY.md §3) run against the driver testdata:

1. batch layer A: top products  → publishes `top_products`
2. batch layer B: LPA collaborative filtering → publishes `user_recommendations`
3. speed layer: replay the review stream, enrich per user with fallback,
   emit wire-format JSON + maintain the `user_ratings` table idempotently

Usage: python examples/run_lambda_architecture.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_recommendation_system_spark.plans.recommendations import (
    publish_user_recommendations,
    user_recommendations,
)
from flink_recommendation_system_spark.plans.top_products import (
    publish_top_products,
    top_products,
)
from flink_recommendation_system_spark.session import (
    LOCAL_SF_MAX_PARTITION_BYTES,
    get_spark,
)
from flink_recommendation_system_spark.sources.tables import reviews_from_events
from flink_recommendation_system_spark.streaming.pipeline import (
    read_review_stream_json,
    start_speed_layer,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="lambda-")
    spark = get_spark("lambda-demo", max_partition_bytes=LOCAL_SF_MAX_PARTITION_BYTES)
    spark.sparkContext.setLogLevel("ERROR")

    reviews = reviews_from_events(spark, sf_dir)

    # --- batch layer A ---
    top = top_products(reviews)
    publish_top_products(top.select("product_id"), f"{out}/top_products")
    print(f"[batch A] top products published: {top.count()} rows")

    # --- batch layer B ---
    recs = user_recommendations(reviews)
    publish_user_recommendations(recs, f"{out}/user_recommendations")
    print(f"[batch B] user recommendations published: {recs.count()} rows")

    # --- speed layer: replay the reviews as a JSON wire stream ---
    stream_in = f"{out}/stream_in"
    os.makedirs(stream_in, exist_ok=True)
    rows = reviews.limit(500).collect()
    for i in range(3):
        with open(f"{stream_in}/part-{i}.json", "w") as f:
            for r in rows[i::3]:
                f.write(
                    json.dumps(
                        {
                            "userId": r["user_id"],
                            "productId": r["product_id"],
                            "review": r["rating"],
                            "timestamp": r["ts"],
                        }
                    )
                    + "\n"
                )
    q = start_speed_layer(
        read_review_stream_json(spark, stream_in),
        f"{out}/user_recommendations",
        f"{out}/top_products",
        f"{out}/user_ratings",
        f"{out}/output",
        f"{out}/ckpt",
    )
    q.processAllAvailable()
    q.stop()
    served = spark.read.parquet(f"{out}/output")
    ratings = spark.read.parquet(f"{out}/user_ratings")
    n_served = served.count()
    print(f"[speed] served {n_served} recommendation messages; "
          f"{ratings.count()} distinct ratings persisted")
    print(f"[speed] sample output: {served.first()['value'][:100]}")

    # --- retention maintenance (round 13): the output sink grows one
    # batch=N directory per trigger for crash-replay idempotence; fold
    # the committed ones while the stream is stopped. Passing the
    # stream's checkpoint makes this safe at ANY stopped boundary —
    # only batches Structured Streaming will never replay are folded.
    # (re-read the table after the swap: `served`'s pre-compaction file
    # listing is stale once the directories are rewritten)
    from flink_recommendation_system_spark.streaming.pipeline import (
        compact_output_sink,
    )

    n_folded = compact_output_sink(spark, f"{out}/output", f"{out}/ckpt")
    served = spark.read.parquet(f"{out}/output")
    assert served.count() == n_served
    print(f"[maintenance] output sink compacted: {n_folded} rows folded, "
          f"{served.count()} still served")

    # --- S10 visualization relay: replay the served output through the
    # SSE service (the reference's Kafka→WebSocket→browser display;
    # open http://127.0.0.1:<port>/ during a live run to watch) ---
    from flink_recommendation_system_spark.streaming.viz_service import (
        RecommendationVizService,
        start_recommendation_viz,
    )

    svc = RecommendationVizService(port=0)
    port = svc.start()
    # the speed layer persists wire JSON; re-derive the enriched shape
    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.schemas import OUTPUT_SCHEMA

    enriched_dir = f"{out}/enriched"
    (
        served.select(F.from_json("value", OUTPUT_SCHEMA).alias("o"))
        .select(
            F.col("o.userId").alias("user_id"),
            F.col("o.recommendedProducts").alias("recommended_products"),
        )
        .write.mode("overwrite")
        .parquet(enriched_dir)
    )
    viz_stream = spark.readStream.schema(
        "user_id long, recommended_products array<string>"
    ).parquet(enriched_dir)
    vq = start_recommendation_viz(viz_stream, svc, f"{out}/viz_ckpt")
    vq.processAllAvailable()
    vq.stop()
    print(f"[viz] SSE relay served on port {port} "
          "(display-bounded foreachBatch broadcast)")
    svc.stop()

    print(f"artifacts in {out}")
    spark.stop()


if __name__ == "__main__":
    main()
