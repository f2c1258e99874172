"""ALS-based collaborative filtering — the MLlib-native counterpart of the
reference's community-detection recommender (Recommendations.java:22-81).

The reference derives recommendations from label-propagation communities;
matrix factorization is the canonical Spark-first way to compute the same
artifact (per-user product recommendations from the ratings matrix) and is
what a production PySpark recommender would use. Kept alongside — not
replacing — the LPA pipeline, which is the parity implementation.

Scale notes: ALS is the distributed-by-construction factorizer (block-wise
alternating least squares); `recommendForAllUsers` is a blocked cross
product with per-block top-k, not a full materialized user×item matrix.
Seeded for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .recommendations import publish_user_recommendations  # noqa: F401 (re-export)

MAX_RECOMMENDATIONS = 20  # same cap as the reference, RealTimeRecommendations.java:35


def als_user_recommendations(
    reviews: DataFrame,
    k: int = MAX_RECOMMENDATIONS,
    rank: int = 10,
    max_iter: int = 5,
    reg: float = 0.1,
    exclude_seen: bool = True,
) -> DataFrame:
    """Train ALS on (user_id, product_id, rating) and emit up to ``k``
    recommendations per user: (user_id, product_id, score). Items the user
    already rated are anti-joined away (matching the reference's "minus own
    products" semantics, Recommendations.java:74)."""
    from pyspark.ml.recommendation import ALS

    # MLlib ALS hard-raises on NULL/NaN ratings and NULL ids (round 15):
    # unusable interaction rows are quarantined at ingest — the same rows
    # every other consumer of the review fact drops
    ratings = reviews.filter(
        F.col("user_id").isNotNull()
        & F.col("product_id").isNotNull()
        & F.col("rating").isNotNull()
    ).select(
        F.col("user_id").cast("int").alias("user"),
        F.col("product_id").cast("int").alias("item"),
        F.col("rating").cast("float").alias("rating"),
    )
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        seed=42,
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = (
        model.recommendForAllUsers(k * 2 if exclude_seen else k)
        .select(
            F.col("user").alias("user_id"),
            F.explode("recommendations").alias("rec"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("rec.item").cast("long").alias("product_id"),
            F.round(F.col("rec.rating").cast("double"), 6).alias("score"),
        )
    )
    if exclude_seen:
        seen = reviews.select("user_id", "product_id").distinct()
        recs = recs.join(seen, ["user_id", "product_id"], "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("product_id").asc()
    )
    return (
        recs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
