"""Supervised training-set construction operators (operators.training)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.training import (
    conversion_labels,
    negative_sampled_pairs,
)


def _pairs(spark):
    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 12)], ["user_id", "product_id"]
    )
    items = spark.createDataFrame(
        [(i,) for i in range(10, 18)], ["product_id"]
    )
    return pos, items


def test_negative_sampling_counts_and_disjointness(spark):
    pos, items = _pairs(spark)
    got = negative_sampled_pairs(pos, items).collect()
    by_label = {}
    for r in got:
        by_label.setdefault((r["user_id"], r["label"]), set()).add(
            r["product_id"]
        )
    # positives deduped; per-user negative count == positive count (ratio 1)
    assert by_label[(1, 1)] == {10, 11} and len(by_label[(1, 0)]) == 2
    assert by_label[(2, 1)] == {12} and len(by_label[(2, 0)]) == 1
    # negatives never overlap the user's positives
    assert not (by_label[(1, 0)] & by_label[(1, 1)])
    assert not (by_label[(2, 0)] & by_label[(2, 1)])


def test_negative_sampling_deterministic_and_ratio(spark):
    pos, items = _pairs(spark)
    a = sorted(map(tuple, negative_sampled_pairs(pos, items).collect()))
    b = sorted(map(tuple, negative_sampled_pairs(pos, items).collect()))
    assert a == b
    tripled = negative_sampled_pairs(pos, items, ratio=3).collect()
    negs_u1 = [r for r in tripled if r["user_id"] == 1 and r["label"] == 0]
    assert len(negs_u1) == 6
    # a different salt draws a different sample
    other = sorted(
        map(tuple, negative_sampled_pairs(pos, items, salt="x").collect())
    )
    assert other != a


def test_negative_sampling_capped_by_candidate_pool(spark):
    # user 1 liked 3 of 4 items: only 1 candidate negative exists
    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], ["user_id", "product_id"]
    )
    items = spark.createDataFrame([(i,) for i in (10, 11, 12, 13)],
                                  ["product_id"])
    negs = [
        r
        for r in negative_sampled_pairs(pos, items).collect()
        if r["label"] == 0
    ]
    assert [(r["user_id"], r["product_id"]) for r in negs] == [(1, 13)]


def test_conversion_labels_window_semantics(spark):
    rows = [
        # (event_id, user, type, s)
        (1, 7, "click", 1000),
        (2, 7, "purchase", 1000),     # same second: converted (inclusive
                                      # start — sub-second conversions
                                      # truncate to the click's second)
        (3, 7, "click", 2000),
        (4, 7, "purchase", 5600),     # exactly +3600: converted (inclusive)
        (5, 8, "click", 100),         # other user's purchase must not leak
        (6, 9, "purchase", 150),
        (7, 8, "click", 7000),
        (8, 8, "purchase", 7001),     # next-bucket crossing (7000→7001 ok)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "s"]
    )
    got = {r["event_id"]: r["converted"] for r in conversion_labels(ev).collect()}
    assert got == {1: True, 3: True, 5: False, 7: True}


def test_conversion_labels_one_row_per_trigger(spark):
    rows = [
        (1, 7, "click", 0),
        (2, 7, "purchase", 10),
        (3, 7, "purchase", 20),
        (4, 7, "purchase", 3600),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "s"]
    )
    got = conversion_labels(ev).collect()
    assert len(got) == 1 and got[0]["converted"] is True


def test_conversion_labels_plan_is_equi_join(spark):
    rows = [(1, 7, "click", 0), (2, 7, "purchase", 10)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "s"]
    )
    plan = (
        conversion_labels(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
