"""Batch layer B — collaborative filtering via community detection.

Reference: Recommendations.java:22-81 — good ratings → user-user co-review
graph → Gelly LabelPropagation(5) → for each user, products liked by their
community that they have not liked themselves → Redis
`UserRecommendations:{u}`.

Spark-first design (SURVEY.md §3.2): the reference collects everything to the
driver and expands recommendations in triple-nested Java loops
(Recommendations.java:40-77). Here the whole pipeline stays in DataFrames:

    liked = good_reviews(reviews)                     # F1, F2
    edges = co_review_edges(liked)                    # A3 (skew-capped)
    labels = label_propagation(undirected(edges), 5)  # G3
    recs   = community expansion (J4) − own (J3 anti-join)

Scale notes (100 TB): only the 5 superstep barriers touch the driver (loop
control, not data). The community-expansion join `labels ⨝ labels on label`
can blow up on a giant community; ``max_community_fanout`` (on by default)
caps the contributing side the same way co_review_edges caps reviewers,
bounding the join at |C|·cap instead of |C|². The anti-join is a shuffle on
(user_id, product_id) — co-partitioned with the candidate join's output so
AQE can reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.graph import (
    LPA_ITERATIONS,
    MAX_REVIEWERS_PER_PRODUCT,
    co_review_edges,
    good_reviews,
    label_propagation,
    undirected,
)

# Default fan-out guard for the community-expansion self-join: each user draws
# candidates from at most this many community members (lowest ids first, for
# determinism). Like MAX_REVIEWERS_PER_PRODUCT it is sized above the
# reference's user cutoff (communities can't exceed 1000 members under
# reference semantics), so oracles stay pinned while a mega-community at
# 100 TB can't produce an unbounded |C|² join. Pass None to uncap.
MAX_COMMUNITY_FANOUT = 1024


def user_recommendations(
    reviews: DataFrame,
    iterations: int = LPA_ITERATIONS,
    max_reviewers_per_product: int | None = MAX_REVIEWERS_PER_PRODUCT,
    max_community_fanout: int | None = MAX_COMMUNITY_FANOUT,
) -> DataFrame:
    """Full batch-B pipeline: returns ``(user_id, product_id)`` — products
    liked by the user's community minus the user's own liked products
    (Recommendations.java:68-77; anti-join semantics at :74).
    """
    # `liked` feeds three consumers (edge build, candidate expansion, the
    # anti-join); materialize once instead of re-running scan+filter+distinct
    # per consumer. At warehouse scale this would be a persisted intermediate
    # table; localCheckpoint is the in-session equivalent.
    liked = good_reviews(reviews).localCheckpoint()
    edges = co_review_edges(liked, max_reviewers_per_product)
    labels = label_propagation(undirected(edges), iterations)

    contributors = labels
    if max_community_fanout is not None:
        w = Window.partitionBy("label").orderBy(F.col("id").asc())
        contributors = (
            labels.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_community_fanout)
            .drop("_rn")
        )
    # Aggregate-then-expand (round 7): build each community's DISTINCT
    # product set first, THEN join users to it. The old expand-then-
    # distinct shape materialized |C|² member pairs × liked-per-member
    # rows before deduping — at sf0.1 the graph converges to ONE
    # 1000-user community, so that was ~22M rows collapsing to 77k; the
    # community product-set relation is bounded by |communities| ×
    # |catalog| instead, and the user join emits each (user, product)
    # exactly once (no distinct needed: a user has one label, the set is
    # distinct). Same semantics — "products liked by ≥1 (capped)
    # community member" — and the reduction grows with community size,
    # exactly the regime that hurts at 100 TB.
    label_products = (
        contributors.select(F.col("id").alias("member_id"), "label")
        .join(
            liked.select(F.col("user_id").alias("member_id"), "product_id"),
            "member_id",
        )
        .select("label", "product_id")
        .distinct()
    )
    candidates = (
        labels.select(F.col("id").alias("user_id"), "label")
        .join(label_products, "label")
        .select("user_id", "product_id")
    )
    return candidates.join(liked, ["user_id", "product_id"], "left_anti")


def publish_user_recommendations(df: DataFrame, path: str) -> None:
    """Overwrite-on-publish ≡ the reference's delete-then-SADD Redis MULTI
    (Recommendations.java:58-77; SURVEY.md §2.1 S7).
    """
    df.write.mode("overwrite").parquet(path)
