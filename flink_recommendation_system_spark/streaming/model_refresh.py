"""Continuous model refresh — batch layer A as a streaming aggregation.

The reference refreshes `topProducts` only when someone re-runs the batch
job (ProductReviewAggregation.java:24-61). Structured Streaming can keep
the same model continuously fresh: a streaming groupBy maintains per-product
sum/count state, and every micro-batch republishes the current top-k via
``foreachBatch`` overwrite — the speed layer (which re-reads the model per
batch, streaming/pipeline.py) then serves it immediately.

Scale notes: state is (product → sum, count) — bounded by product
cardinality, not stream length; the top-k is computed from the aggregated
state (tiny) each batch, and overwrite-on-publish keeps readers atomic
(same contract as S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.top_products import MIN_REVIEWS, TOP_PRODUCTS_K


def start_top_products_refresh(
    reviews_stream: DataFrame,
    model_path: str,
    checkpoint_dir: str,
    k: int = TOP_PRODUCTS_K,
    min_reviews: int = MIN_REVIEWS,
):
    """Continuously maintain the `top_products` model from a review stream.

    Uses a complete-mode streaming aggregation (running sum/count per
    product) and republishes the current top-k parquet model every
    micro-batch. Returns the StreamingQuery.
    """
    agg = reviews_stream.groupBy("product_id").agg(
        F.sum("rating").alias("rating_sum"),
        F.count(F.lit(1)).alias("review_cnt"),
    )

    def publish(batch: DataFrame, batch_id: int) -> None:
        top = (
            batch.filter(F.col("review_cnt") > min_reviews)
            .select(
                "product_id",
                F.round(F.col("rating_sum") / F.col("review_cnt"), 6).alias(
                    "avg_rating"
                ),
                "review_cnt",
            )
            .orderBy(F.col("avg_rating").desc(), F.col("product_id").asc())
            .limit(k)
        )
        top.write.mode("overwrite").parquet(model_path)

    return (
        agg.writeStream.outputMode("complete")
        .foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
