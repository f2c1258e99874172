"""Hand-built as-of join semantics (the oracle pins it against DuckDB's
native ASOF JOIN; these cases document the edge rules, and a hypothesis
property test checks arbitrary inputs against a naive per-row reference)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20)),  # (key, t)
        min_size=1, max_size=12,
    ),
    right=st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(0, 20),
            st.one_of(st.none(), st.integers(-5, 5)),  # nullable value
        ),
        min_size=0, max_size=12,
        unique_by=lambda r: (r[0], r[1]),  # unique per (key, ts) contract
    ),
)
def test_asof_matches_naive_reference(spark, left, right):
    """For arbitrary small inputs: every left row carries exactly the
    latest right row with right.t <= left.t for its key (whole row,
    including NULL values), or all-NULL when none exists."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        ["event_id", "key", "t"],
    )
    rdf = spark.createDataFrame(
        right, schema="key int, t int, v int"
    )

    got = {
        r["event_id"]: (r["v_asof"], r["t_asof"])
        for r in asof_join(
            ldf, rdf, key="key", left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        prior = [r for r in right if r[0] == k and r[1] <= t]
        if prior:
            best = max(prior, key=lambda r: r[1])
            assert got[i] == (best[2], best[1])
        else:
            assert got[i] == (None, None)
    assert len(got) == len(left)


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
