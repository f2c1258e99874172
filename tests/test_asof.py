"""Hand-built as-of join semantics (the oracle pins it against DuckDB's
native ASOF JOIN; these cases document the edge rules)."""

from __future__ import annotations

from flink_recommendation_system_spark.operators.asof import asof_join


def test_asof_join_edge_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 100, 5), (4, 200, 50)],
        ["event_id", "key", "t"],
    )
    right = spark.createDataFrame(
        [(100, 10, 1.0), (100, 15, 2.0), (300, 1, 9.0)],
        ["key", "t", "v"],
    )
    out = {
        r["event_id"]: (r["v_asof"], r["t_asof"])
        for r in asof_join(
            left, right, key="key", left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }
    assert out[1] == (1.0, 10)   # equal ts is inclusive (<=)
    assert out[2] == (2.0, 15)   # latest prior, not first
    assert out[3] == (None, None)  # no prior right row → nulls
    assert out[4] == (None, None)  # key absent from right entirely
    assert len(out) == 4         # every left row survives (LEFT semantics)


def test_asof_null_value_column_comes_from_matched_row(spark):
    """Regression: when the matched (latest-prior) right row has a NULL
    value column, the as-of output must carry that NULL — not fall back to
    an older row's non-null value while the timestamp comes from the newer
    row (DuckDB ASOF JOIN semantics: the whole row is carried together)."""
    left = spark.createDataFrame([(1, 100, 20)], ["event_id", "key", "t"])
    right = spark.createDataFrame(
        [(100, 10, 1.0, "a"), (100, 15, None, "b")],
        ["key", "t", "v", "s"],
    )
    row = asof_join(
        left, right, key="key", left_ts="t", right_ts="t",
        value_cols=["v", "s"],
    ).collect()[0]
    assert row["t_asof"] == 15
    assert row["s_asof"] == "b"
    assert row["v_asof"] is None  # NOT 1.0 from the t=10 row
