"""Item-based co-occurrence collaborative filtering — the value-checkable
recommender twin.

The engine ships two community-based recommenders (LPA pipeline,
``plans.recommendations``; MLlib ALS, ``plans.als_recommendations``). ALS is
iterative factorization and can never be value-checked by a SQL oracle
(rows-only in the driver gate). This plan adds the classic *item
neighborhood* recommender (co-visitation counting — the Amazon-style
item-to-item shape) whose scores are pure INTEGER path counts, so the DuckDB
oracle reproduces them bit-for-bit: the collaborative-filtering capability
gets a full value check, not just LPA's.

Scoring: ``score(u, i) = Σ_{j ∈ liked(u)} cooc(j, i)`` — the number of
(liked item j, co-reviewer) paths from u to i — over items u has NOT liked;
top-N per user, ties to the smaller product id.

Scale design (100 TB): this is a two-hop sparse matrix product expressed as
two shuffle joins with partial aggregation — no driver data, no Python.
The item-item co-occurrence self-join on user_id is the skew hazard (a user
who likes k items emits k² pairs), bounded by ``max_items_per_user`` (top-N
by product id, deterministic), the same default-on guard pattern as
``co_review_edges``; AQE splits residual skew. The cooc matrix is bounded
by (items/user cap)² · users and is typically broadcastable after the
HAVING-style min-count prune a production deployment would add.

Reference semantics anchor: Recommendations.java:68-77 (recommend what
related users liked, minus own likes) — same contract, item-pivoted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.graph import good_reviews

# Same rationale as MAX_REVIEWERS_PER_PRODUCT: at most this many liked items
# per user enter the co-occurrence build (lowest product ids, deterministic).
# Far above the sf-testdata cardinalities so oracles stay pinned; bounds the
# per-user pair fan-out to cap² at scale. Pass None to uncap.
MAX_ITEMS_PER_USER = 1024

TOP_N = 10


def item_cooccurrence(
    liked: DataFrame, max_items_per_user: int | None = MAX_ITEMS_PER_USER
) -> DataFrame:
    """Item-item co-occurrence counts over the distinct ``liked``
    (user_id, product_id) relation: for each ordered pair of distinct items
    (i, j), the number of users who liked both. Returns (i, j, cooc)."""
    if max_items_per_user is not None:
        w = Window.partitionBy("user_id").orderBy(F.col("product_id").asc())
        liked = (
            liked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_items_per_user)
            .drop("_rn")
        )
    a = liked.alias("a")
    b = liked.alias("b")
    return (
        a.join(b, "user_id")
        .filter(F.col("a.product_id") != F.col("b.product_id"))
        .groupBy(
            F.col("a.product_id").alias("i"),
            F.col("b.product_id").alias("j"),
        )
        .agg(F.count(F.lit(1)).alias("cooc"))
    )


def itemcf_recommendations(
    reviews: DataFrame,
    top_n: int = TOP_N,
    max_items_per_user: int | None = MAX_ITEMS_PER_USER,
) -> DataFrame:
    """Top-``top_n`` item-neighborhood recommendations per user:
    (user_id, product_id, score, rank) with integer path-count scores,
    rank 1..top_n by (score DESC, product_id ASC)."""
    liked = good_reviews(reviews).localCheckpoint()
    cooc = item_cooccurrence(liked, max_items_per_user)

    scores = (
        liked.join(cooc, liked["product_id"] == cooc["i"])
        .groupBy(F.col("user_id"), F.col("j").alias("rec_product"))
        .agg(F.sum("cooc").alias("score"))
        .select(
            "user_id",
            F.col("rec_product").alias("product_id"),
            "score",
        )
    )
    fresh = scores.join(liked, ["user_id", "product_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("product_id").asc()
    )
    return (
        fresh.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
    )


def q_itemcf_recommendations(spark, sf_dir: str) -> DataFrame:
    from ..sources.tables import reviews_from_events

    return itemcf_recommendations(reviews_from_events(spark, sf_dir))


ITEMCF_RECOMMENDATIONS_SQL = """
WITH reviews AS (
    SELECT
        CAST(user_id AS BIGINT) AS user_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS product_id,
        CAST(CAST(floor(value) AS BIGINT) % 5 + 1.0 AS DOUBLE) AS rating,
        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts
    FROM events
),
liked AS (
    SELECT DISTINCT user_id, product_id
    FROM reviews
    WHERE user_id < 1000 AND rating > 3.0
),
-- mirror of MAX_ITEMS_PER_USER: only the capped relation enters the
-- co-occurrence build (the Spark side caps inside item_cooccurrence), so
-- oracle parity no longer rests on the cap never binding at larger SFs
liked_capped AS (
    SELECT user_id, product_id FROM (
        SELECT user_id, product_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY product_id ASC
               ) AS _rn
        FROM liked
    ) WHERE _rn <= 1024
),
cooc AS (
    SELECT a.product_id AS i, b.product_id AS j, COUNT(*) AS cooc
    FROM liked_capped a
    JOIN liked_capped b
      ON a.user_id = b.user_id AND a.product_id <> b.product_id
    GROUP BY 1, 2
),
scores AS (
    SELECT l.user_id, c.j AS product_id, CAST(SUM(c.cooc) AS BIGINT) AS score
    FROM liked l JOIN cooc c ON l.product_id = c.i
    GROUP BY 1, 2
),
fresh AS (
    SELECT s.* FROM scores s
    WHERE NOT EXISTS (
        SELECT 1 FROM liked o
        WHERE o.user_id = s.user_id AND o.product_id = s.product_id
    )
)
SELECT user_id, product_id, score, rank FROM (
    SELECT user_id, product_id, score,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY score DESC, product_id ASC
           ) AS rank
    FROM fresh
) WHERE rank <= 10
"""

QUERIES: dict[str, tuple] = {
    "itemcf_recommendations": (
        q_itemcf_recommendations,
        ITEMCF_RECOMMENDATIONS_SQL,
    ),
}
