"""Item-based co-occurrence CF (plans/itemcf.py): hand-computed fixture
scores, the never-recommend-own-likes contract, and the default cap's
semantics-preserving invariant. The sf0.01 value check runs in the driver
gate (full DuckDB oracle — integer path-count scores are engine-exact)."""

from __future__ import annotations

from flink_recommendation_system_spark.plans.itemcf import (
    item_cooccurrence,
    itemcf_recommendations,
)
from flink_recommendation_system_spark.operators.graph import good_reviews


def _reviews_df(spark, rows):
    return spark.createDataFrame(
        [(u, p, r, 0) for (u, p, r) in rows],
        ["user_id", "product_id", "rating", "ts"],
    )


def test_itemcf_hand_computed_scores(spark):
    """Users 1,2 like {10,11}; user 3 likes {10}. cooc(10,11) = 2, so user
    3's only recommendation is 11 with score 2 (two users connect 10→11)."""
    reviews = _reviews_df(
        spark,
        [(1, 10, 5.0), (1, 11, 5.0), (2, 10, 4.0), (2, 11, 4.0), (3, 10, 5.0)],
    )
    cooc = {
        (r["i"], r["j"]): r["cooc"]
        for r in item_cooccurrence(good_reviews(reviews)).collect()
    }
    assert cooc == {(10, 11): 2, (11, 10): 2}

    recs = itemcf_recommendations(reviews).collect()
    by_user = {(r["user_id"], r["product_id"]): (r["score"], r["rank"]) for r in recs}
    assert by_user[(3, 11)] == (2, 1)
    # users 1 and 2 already like both items → nothing fresh to recommend
    assert set(by_user) == {(3, 11)}


def test_itemcf_never_recommends_own_likes(spark):
    rows = [(u % 7, p % 5 + 1, 5.0) for u in range(40) for p in range(u % 3 + 1)]
    reviews = _reviews_df(spark, rows)
    liked = {
        (r["user_id"], r["product_id"])
        for r in good_reviews(reviews).collect()
    }
    for r in itemcf_recommendations(reviews).collect():
        assert (r["user_id"], r["product_id"]) not in liked


def test_itemcf_default_cap_never_binds_under_reference_semantics(spark):
    rows = [(u % 11, p, 4.5) for u in range(50) for p in (1, 2, 3, 4)]
    reviews = _reviews_df(spark, rows)
    assert sorted(
        tuple(r) for r in itemcf_recommendations(reviews).collect()
    ) == sorted(
        tuple(r)
        for r in itemcf_recommendations(
            reviews, max_items_per_user=None
        ).collect()
    )


def test_itemcf_cap_bounds_pair_fanout(spark):
    """One user liking 30 items with cap 5: only the 5 lowest item ids
    enter the co-occurrence build → at most 5·4 ordered pairs."""
    reviews = _reviews_df(spark, [(1, p, 5.0) for p in range(1, 31)])
    cooc = item_cooccurrence(good_reviews(reviews), max_items_per_user=5)
    rows = cooc.collect()
    assert len(rows) == 20
    assert {r["i"] for r in rows} == set(range(1, 6))
