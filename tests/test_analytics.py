"""Invariants for the sketch + iterative-graph analytics."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators import graph as G
from flink_recommendation_system_spark.sources.tables import (
    load_table,
    reviews_from_events,
)
from tests.conftest import SF0001


def test_approx_count_distinct_within_rsd(spark):
    part = load_table(spark, SF0001, "part")
    li = load_table(spark, SF0001, "lineitem")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    exact = {
        r["p_brand"]: r["n"]
        for r in j.groupBy("p_brand")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r["p_brand"]: r["a"]
        for r in j.groupBy("p_brand")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a"))
        .collect()
    }
    for brand, n in exact.items():
        assert abs(approx[brand] - n) <= max(3, 0.1 * n), (brand, n, approx[brand])


def test_connected_components_invariants(spark):
    """Components form a partition; every edge's endpoints share a
    component; component id is the min member id; a planted isolated pair
    forms its own component."""
    liked = G.good_reviews(reviews_from_events(spark, SF0001))
    extra = spark.createDataFrame(
        [(900001, 42424242), (900002, 42424242)], ["user_id", "product_id"]
    )
    edges = G.undirected(G.co_review_edges(liked.union(extra)))
    comp = G.connected_components(edges)
    rows = {r["id"]: r["component"] for r in comp.collect()}
    # every edge endpoint pair shares a component
    for e in edges.collect():
        assert rows[e["src"]] == rows[e["dst"]]
    # component label = min id within the component
    by_comp: dict = {}
    for vid, c in rows.items():
        by_comp.setdefault(c, []).append(vid)
    for c, members in by_comp.items():
        assert c == min(members)
    # the planted pair is its own two-vertex component
    assert rows[900001] == rows[900002] == 900001
