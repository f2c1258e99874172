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
