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


def test_activity_similarity_matches_dense_bruteforce(spark):
    """The sparse-join distance must equal the dense per-bucket
    subtraction on a small crafted input (incl. a user pair with NO
    shared bucket — the left-join fallback path)."""
    from flink_recommendation_system_spark.operators.events import (
        activity_similarity_topk,
    )

    NS = 1_000_000_000
    rows = []
    # u1: buckets 0,0,1  u2: buckets 0,2  u3: bucket 5 (disjoint from u1)
    for uid, buckets in [(1, [0, 0, 1]), (2, [0, 2]), (3, [5])]:
        for b in buckets:
            rows.append((uid, b * 3600 * NS))
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    got = {
        (r["user_id"], r["neighbor_id"]): r["dist2"]
        for r in activity_similarity_topk(ev, 3600, k=2).collect()
    }
    # series: u1 = {0:2, 1:1}, u2 = {0:1, 2:1}, u3 = {5:1}
    assert got[(1, 2)] == (2 - 1) ** 2 + 1 + 1  # 3
    assert got[(1, 3)] == (4 + 1) + 1  # no shared bucket: n1+n3 = 6
    assert got[(2, 3)] == 2 + 1
    assert got[(2, 1)] == got[(1, 2)] and got[(3, 1)] == got[(1, 3)]


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile's arithmetic bucket recovery must equal Spark's own
    ntile() window at every (N, n_buckets) shape that exercises the
    bucket law: N % n == 0, N % n != 0, N < n (every row its own
    bucket), and N == 1 — on shuffled input with a unique tie-break."""
    from pyspark.sql import Window

    from flink_recommendation_system_spark.operators.relational import (
        global_ntile,
    )

    for n_rows, n_buckets in ((40, 10), (47, 10), (7, 10), (1, 10), (23, 4)):
        # values with heavy ties so the unique-key tie-break matters
        rows = [(i, (i * 7919) % 5) for i in range(n_rows)]
        df = spark.createDataFrame(rows, ["k", "v"]).repartition(8)
        order = [F.col("v").desc(), F.col("k").asc()]
        got = {
            r["k"]: r["bucket"]
            for r in global_ntile(df, n_buckets, order).collect()
        }
        w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
        want = {
            r["k"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(n_buckets).over(w).cast("long")
            ).collect()
        }
        assert got == want, (n_rows, n_buckets)
