"""Range join — the second time-series join Spark lacks natively
(alongside the as-of join): pairs of rows whose timestamps fall within a
bounded difference of each other.

A naive formulation is a theta-join (`|a.ts - b.ts| <= delta`) which Spark
executes as a nested-loop — quadratic. The distributed shape used here is
**bucketing**: assign each row to a coarse time bucket of width ``delta``,
explode each left row into its bucket and the two adjacent ones, equi-join
on (key, bucket) — Catalyst plans a hash join — then apply the exact bound
as a post-filter. Candidates are only the ±1-bucket neighborhood, so work
scales with actual temporal density instead of the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, delta: int) -> Column:
    # exact integer bucketing (float division could truncate wrong at
    # exact multiples of delta)
    return ((ts - ts % delta) / delta).cast("long")


def bounded_diff_self_join(
    rows: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    delta: int,
) -> DataFrame:
    """All pairs (a, b) with the same ``key``, ``a.id < b.id``, and
    ``|a.ts - b.ts| <= delta``. Output: (key, a_id, b_id, a_ts, b_ts).
    """
    a_bucket = _bucket(F.col("a_ts"), delta)
    a = rows.select(
        F.col(key),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
    ).withColumn(
        "bucket",
        F.explode(F.array(a_bucket - 1, a_bucket, a_bucket + 1)),
    )
    b = rows.select(
        F.col(key),
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        _bucket(F.col(ts_col), delta).alias("bucket"),
    )
    return (
        a.join(b, [key, "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.abs(F.col("a_ts") - F.col("b_ts")) <= delta)
        .select(key, "a_id", "b_id", "a_ts", "b_ts")
        .distinct()
    )
