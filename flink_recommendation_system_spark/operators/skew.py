"""Skew-mitigation utilities (SURVEY.md §4 "Skew"; M5 scale hardening).

AQE's skew-join splitting handles most runtime skew; these are the explicit
tools for the cases AQE can't fix:

- ``salted_aggregate``: two-stage aggregation for a groupBy whose key
  distribution is pathological (one key ≫ others). Stage 1 aggregates on
  (key, salt) — spreading the hot key over N reducers — stage 2 combines
  the partials. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_broadcast_left``: replicate-and-salt pattern for joining a
  skewed fact against a dim too big to broadcast: the dim is exploded
  N× with salt, the fact picks a deterministic salt per row, so each hot
  key's rows spread across N reducer partitions.
- ``cap_group_fanout``: bound per-group output before a pair-generating
  expansion (the A3 all-pairs hazard: one product with 10⁴ reviewers would
  emit 5×10⁷ pairs in one group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: str,
    agg: str = "sum",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: returns (key, <agg>_<col>).

    The salt is `spark_partition_id() % salt_buckets` — no Python RNG,
    stable within a task, and already uniform over a hot key's rows
    because they arrive spread across input partitions (r14 review: the
    docstring previously described a row-hash salt this function never
    had). Combinable aggregates only.
    """
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[agg]
    second = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}[agg]
    out_name = f"{agg}_{agg_col}"
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(first(agg_col).alias("_p"))
    return partial.groupBy(key).agg(second("_p").alias(out_name))


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: dim replicated ``salt_buckets``× with a salt
    column; fact rows pick a salt from a hash of a per-row expression, so a
    hot join key spreads over ``salt_buckets`` partitions instead of one.

    Result = fact ⨝ dim on (key, salt) — identical rows to the plain join.
    """
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salted = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    return fact_salted.join(dim_rep, [on, "_salt"]).drop("_salt")


def cap_group_fanout(
    df: DataFrame, group_col: str, order_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group (deterministic order) — bounds
    the output of any downstream per-group pair expansion to C(cap, 2)."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
