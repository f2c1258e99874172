"""interval_overlap_join: exact closed-interval semantics, emit-once (no
duplicate pairs from shared grid cells), key blocking, and equivalence with
the brute-force theta-join on random intervals."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.rangejoin import (
    interval_overlap_join,
)


def _pairs(df):
    return {
        (r["a_id"], r["b_id"])
        for r in df.select("a_id", "b_id").collect()
    }


def test_overlap_edge_semantics(spark):
    a = spark.createDataFrame(
        [(1, 0, 10), (2, 100, 200), (3, 5, 6)], ["id", "start", "end"]
    )
    b = spark.createDataFrame(
        [
            (10, 10, 20),   # touches a1 at the closed endpoint -> overlap
            (11, 11, 20),   # starts after a1 ends -> none
            (12, 0, 1000),  # spans everything
            (13, 5, 5),     # point interval inside a1 and a3
        ],
        ["id", "start", "end"],
    )
    got = _pairs(interval_overlap_join(a, b, grid=7))
    want = {
        (1, 10), (1, 12), (1, 13),
        (2, 12),
        (3, 12), (3, 13),
    }
    assert got == want


def test_overlap_emit_once_long_intervals(spark):
    # both intervals span many grid cells; the pair must appear exactly once
    a = spark.createDataFrame([(1, 0, 1000)], ["id", "start", "end"])
    b = spark.createDataFrame([(2, 500, 2000)], ["id", "start", "end"])
    rows = interval_overlap_join(a, b, grid=10).collect()
    assert len(rows) == 1


def test_overlap_key_blocking(spark):
    a = spark.createDataFrame(
        [("x", 1, 0, 10), ("y", 2, 0, 10)], ["k", "id", "start", "end"]
    )
    b = spark.createDataFrame(
        [("x", 3, 5, 15), ("y", 4, 50, 60)], ["k", "id", "start", "end"]
    )
    got = _pairs(interval_overlap_join(a, b, grid=8, keys=["k"]))
    assert got == {(1, 3)}  # cross-key candidates never pair


def test_overlap_matches_bruteforce_random(spark):
    rng = random.Random(7)
    rows_a, rows_b = [], []
    for i in range(120):
        s = rng.randint(-50, 400)
        rows_a.append((i, s, s + rng.randint(0, 60)))
        s = rng.randint(-50, 400)
        rows_b.append((1000 + i, s, s + rng.randint(0, 60)))
    a = spark.createDataFrame(rows_a, ["id", "start", "end"])
    b = spark.createDataFrame(rows_b, ["id", "start", "end"])
    got = _pairs(interval_overlap_join(a, b, grid=37))
    aj, bj = a.alias("a"), b.alias("b")
    brute = (
        aj.crossJoin(bj)
        .filter(
            (F.col("a.start") <= F.col("b.end"))
            & (F.col("b.start") <= F.col("a.end"))
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
    )
    want = _pairs(brute)
    assert got == want and want


def test_overlap_exact_at_nanosecond_magnitudes(spark):
    """Cell ids must come from exact integer division: double division
    rounds above 2^53, which can shift a cell by one at epoch-nanosecond
    magnitudes and silently drop pairs at the emit-once check."""
    base = 1_700_000_000_000_000_000  # epoch ns
    g = 3_600_000_000_000  # 1h in ns
    a = spark.createDataFrame(
        [(1, base + 1, base + 2 * g)], ["id", "start", "end"]
    )
    b = spark.createDataFrame(
        [(2, base + g, base + 3 * g)], ["id", "start", "end"]
    )
    assert len(interval_overlap_join(a, b, grid=g).collect()) == 1


def test_inverted_interval_is_empty(spark):
    """end < start denotes the EMPTY interval: it overlaps nothing and is
    dropped before blocking (ADVICE r04 — sequence() would otherwise
    auto-step descending and still explode it to cells)."""
    a = spark.createDataFrame([(1, 20, 10)], ["id", "start", "end"])
    b = spark.createDataFrame([(2, 0, 100)], ["id", "start", "end"])
    assert interval_overlap_join(a, b, grid=8).collect() == []
    assert interval_overlap_join(b, a, grid=8).collect() == []
    # a degenerate-but-valid point interval still pairs
    p = spark.createDataFrame([(3, 15, 15)], ["id", "start", "end"])
    assert len(interval_overlap_join(p, b, grid=8).collect()) == 1
